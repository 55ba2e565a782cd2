package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profile of the iterative-graph tail (VERDICT r9 items
  * 1-2): q74_pagerank_k, q77_min_label_k, q75_pagerank_weighted — the
  * three slowest queries in BENCH_r09 (4.43 + 4.36 + 3.15 s at sf0.1,
  * local[32]). The plans are scale-correct (vertex-keyed equi-joins,
  * cached degree, |V| literal); the local cost is k chained shuffle
  * rounds scheduling 32 mostly-empty tasks each. Measures, per
  * operator:
  *
  *  - V0: the shipped lazy chained plan;
  *  - V1: connectedComponents-style clamp (child session, shuffle
  *    parallelism sized to the materialized graph, localCheckpoint per
  *    round) at 100k rows/task (the connectedComponents constant);
  *  - V2: the same clamp at 1M rows/task (AQE-like byte sizing: the
  *    2.4M-row bidirectional list is ~40 MB);
  *  - V3: per-round checkpoint WITHOUT the clamp — separates the
  *    materialization effect from the parallelism effect;
  *  - q75: shipped (per-plan weighted degree + 1-row cross-join) vs
  *    cached wdeg + |V| literal (the q72 registration shape).
  *
  * All variants cross-check to identical aggregate sums (the grid
  * arithmetic is order-independent, so equality is exact).
  */
object GraphLoopProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators.Relational.{canonicalEdges, orientEdges,
      pagerankIterate, minLabelPropagate, weightedPagerankStep}

    // Same artifact build as orientedCooccurGraph
    val pairs = graft.Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(array_sort(array_distinct(collect_list("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y ->
               struct(x AS p1, y AS p2))))""")).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders")).persist()
    time("pairs build")(pairs.count())
    val canon = canonicalEdges(pairs, "p1", "p2")
    val oriented = orientEdges(canon).persist()
    val ne = time("oriented build")(oriented.count())
    val deg = oriented.select(col("src").as("v"))
      .unionAll(oriented.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d")).persist()
    val nv = time("deg build")(deg.count())
    println(s"  |E|=$ne |V|=$nv")

    // ---- clamped variants (candidate library shapes) ----
    def clampedSession(src: DataFrame, rowsPerTask: Long, nbi: Long)
        : (SparkSession, Int) = {
      val s = src.sparkSession.newSession()
      val origParts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val loopParts = math.max(1L,
        math.min(origParts.toLong, nbi / rowsPerTask + 1L)).toInt
      s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
      (s, loopParts)
    }
    def pagerankClamped(k: Int, rowsPerTask: Long): DataFrame = {
      val (s, loopParts) = clampedSession(oriented, rowsPerTask, ne * 2)
      def cross(df: DataFrame) = s.createDataFrame(df.rdd, df.schema)
      val biP = oriented.select(col("src").as("u"), col("dst").as("v"))
        .unionAll(oriented.select(col("dst").as("u"), col("src").as("v")))
      val bi = cross(biP).repartition(loopParts, col("u")).localCheckpoint()
      val degC = cross(deg.select(col("v").as("u"), col("d"))).localCheckpoint()
      var r = degC.select(col("u").as("v"),
        (lit(1.0) / lit(nv)).as("rank")).localCheckpoint()
      for (_ <- 1 to k) {
        val nxt = bi.join(r.select(col("v").as("u"), col("rank")), Seq("u"))
          .join(degC, Seq("u"))
          .select(col("v"),
            round(col("rank") * lit(1e12) / col("d")).cast("long").as("c"))
          .groupBy("v").agg(sum("c").as("s"))
          .select(col("v"),
            (lit(0.15) / lit(nv) +
              lit(0.85) * (col("s").cast("double") / lit(1e12))).as("rank"))
          .localCheckpoint()
        r.unpersist(); r = nxt
      }
      bi.unpersist(); degC.unpersist()
      r
    }
    def minLabelClamped(k: Int, rowsPerTask: Long): DataFrame = {
      val (s, loopParts) = clampedSession(oriented, rowsPerTask, ne * 2 + nv)
      def cross(df: DataFrame) = s.createDataFrame(df.rdd, df.schema)
      val biP = oriented.select(col("src").as("u"), col("dst").as("v"))
        .unionAll(oriented.select(col("dst").as("u"), col("src").as("v")))
        .unionAll(deg.select(col("v").as("u"), col("v")))
      val bi = cross(biP).repartition(loopParts, col("u")).localCheckpoint()
      var lab = cross(deg.select(col("v"), col("v").as("label"))).localCheckpoint()
      for (_ <- 1 to k) {
        val nxt = bi.join(lab.select(col("v").as("u"), col("label")), Seq("u"))
          .groupBy("v").agg(min("label").as("label"))
          .localCheckpoint()
        lab.unpersist(); lab = nxt
      }
      bi.unpersist()
      lab
    }
    // q75 candidate: cached weighted degree + |V| literal
    val wdeg = pairs.select(col("p1").as("v"), col("n_orders").as("wd"))
      .unionAll(pairs.select(col("p2").as("v"), col("n_orders").as("wd")))
      .groupBy("v").agg(sum("wd").as("wd")).persist()
    val wnv = time("wdeg build")(wdeg.count())
    println(s"  |Vw|=$wnv (== |V|: ${wnv == nv})")
    def weightedStepCached(): DataFrame = {
      val bi = pairs.select(col("p1").as("u"), col("p2").as("v"), col("n_orders").as("w"))
        .unionAll(pairs.select(col("p2").as("u"), col("p1").as("v"), col("n_orders").as("w")))
      bi.join(wdeg.select(col("v").as("u"), col("wd")), "u")
        .select(col("v"),
          round(lit(1e12) * col("w") / col("wd")).cast("long").as("c"))
        .groupBy("v").agg(sum("c").as("s"))
        .select(col("v"), col("s"),
          (lit(0.15) / lit(nv) +
            lit(0.85) * ((col("s").cast("double") / lit(1e12)) / lit(nv)))
            .as("rank"))
    }

    def bench(label: String)(f: => DataFrame): Unit = {
      // warm + 2 timed, mirror Bench's noop sink
      noop(f)
      time(label)(noop(f)); time(label + " (2nd)")(noop(f))
    }

    bench("q74 V0 shipped")(
      pagerankIterate(oriented, 3, "src", "dst", Some(deg), Some(nv))
        .orderBy("v"))
    bench("q74 V1 clamp 100k")(pagerankClamped(3, 100000L).orderBy("v"))
    bench("q74 V2 clamp 1M")(pagerankClamped(3, 1000000L).orderBy("v"))
    bench("q74 V3 ckpt no-clamp")(pagerankClamped(3, Long.MaxValue).orderBy("v"))

    bench("q77 V0 shipped")(
      minLabelPropagate(oriented, 3, "src", "dst", Some(deg)).orderBy("v"))
    bench("q77 V1 clamp 100k")(minLabelClamped(3, 100000L).orderBy("v"))
    bench("q77 V2 clamp 1M")(minLabelClamped(3, 1000000L).orderBy("v"))

    bench("q75 V0 shipped")(
      weightedPagerankStep(pairs, "p1", "p2", "n_orders").orderBy("v"))
    bench("q75 cached wdeg+nv")(weightedStepCached().orderBy("v"))

    // cross-checks: exact (long sums; rank is a fixed fn of exact ints)
    def rsum(df: DataFrame) = df.agg(sum(col("rank"))).head().getDouble(0)
    def lsum(df: DataFrame) = df.agg(sum(col("label"))).head().getLong(0)
    def ssum(df: DataFrame) = df.agg(sum(col("s"))).head().getLong(0)
    val pr0 = rsum(pagerankIterate(oriented, 3, "src", "dst", Some(deg), Some(nv)))
    val pr1 = rsum(pagerankClamped(3, 1000000L))
    println(s"  CROSS-CHECK q74 rank-sum: shipped=$pr0 clamped=$pr1 match=${pr0 == pr1}")
    val ml0 = lsum(minLabelPropagate(oriented, 3, "src", "dst", Some(deg)))
    val ml1 = lsum(minLabelClamped(3, 1000000L))
    println(s"  CROSS-CHECK q77 label-sum: shipped=$ml0 clamped=$ml1 match=${ml0 == ml1}")
    val w0 = ssum(weightedPagerankStep(pairs, "p1", "p2", "n_orders"))
    val w1 = ssum(weightedStepCached())
    println(s"  CROSS-CHECK q75 s-sum: shipped=$w0 cached=$w1 match=${w0 == w1}")
    spark.stop()
  }
}
