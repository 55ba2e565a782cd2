package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase 4 of the iterative-graph profile: does DESTINATION
  * partitioning make the per-round aggregate exchange-free?
  *
  * The shipped [[graft.operators.Relational.GraphLoop]] persists the
  * bidirectional edge list partitioned on `u` — but every consumer
  * joins the |V|-row rank/label table on `u` (AQE broadcasts it while
  * it fits) and then aggregates `groupBy("v")`, which re-shuffles the
  * 2·|E| joined rows on `v` EVERY round. A broadcast join preserves
  * the streamed side's partitioning, so persisting the list
  * hash-partitioned on `v` instead should satisfy the aggregate's
  * ClusteredDistribution with no exchange at all: k rounds = k cached
  * scans, zero shuffles (while the rank table broadcasts; at
  * billion-vertex |V| AQE degrades to the shuffled join and the
  * exchange returns — exactly today's plan, no worse).
  *
  * Folding the |V| self-loop rows (v, v) INTO the persisted list
  * keeps min-label propagation on the same exchange-free path (the
  * per-round `unionAll(selfLoops)` voids the partitioning today);
  * PageRank recovers the pure edge set with a partitioning-preserving
  * `u =!= v` filter (canonical edges have a < b, so no real row is a
  * self-loop).
  *
  * Measures q72/q74/q77 shapes on both layouts (same child-session
  * clamp as the library), asserts bit-identical outputs (long sums /
  * mins are order-independent), and counts Exchange nodes in the
  * executed plans.
  */
object GraphLoopProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIMER $label%-34s $s%.2f s"); s
    }
    def best3(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map(_ => time(label)(f))
      println(f"BEST  $label%-34s ${ts.min}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators.Relational.{canonicalEdges, orientEdges}

    val pairs = graft.Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(array_sort(array_distinct(collect_list("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y ->
               struct(x AS p1, y AS p2))))""")).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders")).persist()
    pairs.count()
    val canon = canonicalEdges(pairs, "p1", "p2")
    val oriented = orientEdges(canon).persist()
    val ne = oriented.count()
    val deg = oriented.select(col("src").as("v"))
      .unionAll(oriented.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d")).persist()
    val nv = deg.count()
    println(s"  |E|=$ne |V|=$nv")

    // ---- both layouts, library-identical child-session mechanics ----
    val origParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = math.max(1L,
      math.min(origParts.toLong, 2L * ne / 1000000L + 1L)).toInt
    println(s"  clamp parts=$parts")

    case class Ctx(s: SparkSession, bi: DataFrame, deg: DataFrame,
        selfLoops: DataFrame)

    def build(byV: Boolean): Ctx = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      def cross(df: DataFrame) = s.createDataFrame(df.rdd, df.schema)
      def mat(df: DataFrame): DataFrame = { val p = df.persist(); p.count(); p }
      val degLoop = mat(cross(deg.select(col("v").as("u"), col("d")))
        .repartition(parts, col("u")))
      val biRaw = oriented.select(col("src").as("u"), col("dst").as("v"))
        .unionAll(oriented.select(col("dst").as("u"), col("src").as("v")))
      if (byV) {
        // self-loops folded in, partitioned on the AGGREGATION key
        val biPlus = mat(cross(biRaw).unionAll(
            degLoop.select(col("u"), col("u").as("v")))
          .repartition(parts, col("v")))
        Ctx(s, biPlus, degLoop, null)
      } else {
        val bi = mat(cross(biRaw).repartition(parts, col("u")))
        val slParts = math.max(1L,
          math.min(parts.toLong, nv / 1000000L + 1L)).toInt
        val selfLoops = mat(degLoop
          .select(col("u").as("u"), col("u").as("v")).repartition(slParts))
        Ctx(s, bi, degLoop, selfLoops)
      }
    }

    def prIter(c: Ctx, byV: Boolean, k: Int,
        hint: Boolean = false): DataFrame = {
      val edges = if (byV) c.bi.where(col("u") =!= col("v")) else c.bi
      var r = c.deg.select(col("u").as("v"), (lit(1.0) / lit(nv)).as("rank"))
      for (_ <- 1 to k) {
        val contrib0 = r.select(col("v").as("u"), col("rank"))
          .join(c.deg, Seq("u"))
          .select(col("u"),
            round(col("rank") * lit(1e12) / col("d")).cast("long").as("c"))
        val contrib = if (hint) broadcast(contrib0) else contrib0
        r = edges.join(contrib, Seq("u"))
          .groupBy("v").agg(sum("c").as("s"))
          .select(col("v"),
            (lit(0.15) / lit(nv) +
              lit(0.85) * (col("s").cast("double") / lit(1e12))).as("rank"))
      }
      r
    }
    def prStep(c: Ctx, byV: Boolean): DataFrame = {
      val edges = if (byV) c.bi.where(col("u") =!= col("v")) else c.bi
      edges.join(
          c.deg.select(col("u"),
            round(lit(1e12) / col("d")).cast("long").as("c")), Seq("u"))
        .groupBy("v").agg(sum("c").as("s"))
    }
    def mlRounds(c: Ctx, byV: Boolean, k: Int,
        hint: Boolean = false): DataFrame = {
      val biPlus = if (byV) c.bi else c.bi.unionAll(c.selfLoops)
      var lab = c.deg.select(col("u").as("v"), col("u").as("label"))
      for (_ <- 1 to k) {
        val side0 = lab.select(col("v").as("u"), col("label"))
        val side = if (hint) broadcast(side0) else side0
        lab = biPlus.join(side, Seq("u"))
          .groupBy("v").agg(min("label").as("label"))
      }
      lab
    }

    val ctxU = build(byV = false)
    val ctxV = build(byV = true)

    // bit-identity check (order-independent long sums / mins)
    def sig(df: DataFrame): String =
      df.agg(sum(hash(df.columns.map(col): _*)).as("h")).collect()(0).toString
    val checks = Seq[(String, Ctx => DataFrame)](
      ("q74 pr3", c => prIter(c, c eq ctxV, 3)
        .select(col("v"), round(col("rank") * 1e9).cast("long").as("r"))),
      ("q72 step", c => prStep(c, c eq ctxV)),
      ("q77 ml3", c => mlRounds(c, c eq ctxV, 3)))
    checks.foreach { case (n, f) =>
      val (a, b) = (sig(f(ctxU)), sig(f(ctxV)))
      println(s"CHECK $n ${if (a == b) "IDENTICAL" else s"DIVERGED $a vs $b"}")
    }

    // exchange count in the executed physical plan
    def exch(df: DataFrame, label: String): Unit = {
      noop(df)
      val p = df.queryExecution.executedPlan.toString
      val n = "(?i)exchange".r.findAllIn(p).length
      println(s"EXCH  $label: $n exchange nodes")
    }
    exch(prIter(ctxU, byV = false, 3), "u-part pr3")
    exch(prIter(ctxV, byV = true, 3), "v-part pr3")
    exch(prIter(ctxV, byV = true, 3, hint = true), "v-part+hint pr3")
    exch(mlRounds(ctxU, byV = false, 3), "u-part ml3")
    exch(mlRounds(ctxV, byV = true, 3), "v-part ml3")
    exch(mlRounds(ctxV, byV = true, 3, hint = true), "v-part+hint ml3")
    // hinted variants must stay bit-identical too
    Seq[(String, DataFrame, DataFrame)](
      ("pr3 hint", prIter(ctxU, byV = false, 3), prIter(ctxV, byV = true, 3, hint = true)),
      ("ml3 hint", mlRounds(ctxU, byV = false, 3), mlRounds(ctxV, byV = true, 3, hint = true))
    ).foreach { case (n, a, b) =>
      val (x, y) = (sig(a), sig(b))
      println(s"CHECK $n ${if (x == y) "IDENTICAL" else s"DIVERGED $x vs $y"}")
    }

    // timings, interleaved best-of-3
    for ((name, fU, fV, fH) <- Seq[(String, () => DataFrame, () => DataFrame, () => DataFrame)](
        ("pr3", () => prIter(ctxU, false, 3), () => prIter(ctxV, true, 3),
          () => prIter(ctxV, true, 3, hint = true)),
        ("step", () => prStep(ctxU, false), () => prStep(ctxV, true),
          () => prStep(ctxV, true)),
        ("ml3", () => mlRounds(ctxU, false, 3), () => mlRounds(ctxV, true, 3),
          () => mlRounds(ctxV, true, 3, hint = true)))) {
      best3(s"u-part $name")(noop(fU()))
      best3(s"v-part $name")(noop(fV()))
      best3(s"v-part+hint $name")(noop(fH()))
    }
    spark.stop()
  }
}
