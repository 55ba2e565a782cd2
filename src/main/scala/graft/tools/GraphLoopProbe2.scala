package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase 2 of the iterative-graph profile (see [[GraphLoopProbe]]):
  * GraphLoopProbe showed the connectedComponents-style per-run clamp
  * is NOT the fix for q74/q77 — per-run localCheckpoint of the 2.4M-row
  * bidirectional list costs more than the 32-wide scheduling it saves
  * (V3 ckpt-no-clamp 8.5 s vs shipped 3.7 s). This probe separates the
  * per-run loop cost from graph prep by PREBUILDING the bidirectional
  * list (an ingest artifact, like oriented/adj/deg) and then measuring
  * the k rounds alone under each loop structure:
  *
  *  - lazy chained rounds (shipped shape) at 32 parts vs clamped 3;
  *  - explicit broadcast(r) hint per round (skip AQE's materialize-
  *    then-convert wait) at both widths;
  *  - AQE off entirely in the loop session (static 3-part shuffles);
  *  - per-round localCheckpoint on the prebuilt list.
  */
object GraphLoopProbe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
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

    // Loop-session factory: child session with conf overrides; inputs
    // crossed over and PREBUILT (persisted, not timed) — the ingest-
    // artifact story.
    case class Ctx(s: SparkSession, bi: DataFrame, degC: DataFrame)
    def mkCtx(parts: Option[Int], aqe: Boolean): Ctx = {
      val s = spark.newSession()
      parts.foreach(p => s.conf.set("spark.sql.shuffle.partitions", p.toString))
      if (!aqe) s.conf.set("spark.sql.adaptive.enabled", "false")
      def cross(df: DataFrame) = s.createDataFrame(df.rdd, df.schema)
      val biP = oriented.select(col("src").as("u"), col("dst").as("v"))
        .unionAll(oriented.select(col("dst").as("u"), col("src").as("v")))
      val p = parts.getOrElse(cpus.toInt)
      val bi = cross(biP).repartition(p, col("u")).persist()
      bi.count()
      val degC = cross(deg.select(col("v").as("u"), col("d"))).persist()
      degC.count()
      Ctx(s, bi, degC)
    }
    def prRounds(ctx: Ctx, k: Int, bc: Boolean, ckpt: Boolean): DataFrame = {
      var r = ctx.degC.select(col("u").as("v"), (lit(1.0) / lit(nv)).as("rank"))
      for (_ <- 1 to k) {
        val rin = r.select(col("v").as("u"), col("rank"))
        val nxt = ctx.bi.join(if (bc) broadcast(rin) else rin, Seq("u"))
          .join(if (bc) broadcast(ctx.degC) else ctx.degC, Seq("u"))
          .select(col("v"),
            round(col("rank") * lit(1e12) / col("d")).cast("long").as("c"))
          .groupBy("v").agg(sum("c").as("s"))
          .select(col("v"),
            (lit(0.15) / lit(nv) +
              lit(0.85) * (col("s").cast("double") / lit(1e12))).as("rank"))
        r = if (ckpt) nxt.localCheckpoint() else nxt
      }
      r
    }
    def mlCtx(parts: Option[Int], aqe: Boolean): Ctx = {
      val s = spark.newSession()
      parts.foreach(p => s.conf.set("spark.sql.shuffle.partitions", p.toString))
      if (!aqe) s.conf.set("spark.sql.adaptive.enabled", "false")
      def cross(df: DataFrame) = s.createDataFrame(df.rdd, df.schema)
      val biP = oriented.select(col("src").as("u"), col("dst").as("v"))
        .unionAll(oriented.select(col("dst").as("u"), col("src").as("v")))
        .unionAll(deg.select(col("v").as("u"), col("v")))
      val p = parts.getOrElse(cpus.toInt)
      val bi = cross(biP).repartition(p, col("u")).persist()
      bi.count()
      val degC = cross(deg.select(col("v"))).persist()
      degC.count()
      Ctx(s, bi, degC)
    }
    def mlRounds(ctx: Ctx, k: Int, bc: Boolean, ckpt: Boolean): DataFrame = {
      var lab = ctx.degC.select(col("v"), col("v").as("label"))
      for (_ <- 1 to k) {
        val lin = lab.select(col("v").as("u"), col("label"))
        val nxt = ctx.bi.join(if (bc) broadcast(lin) else lin, Seq("u"))
          .groupBy("v").agg(min("label").as("label"))
        lab = if (ckpt) nxt.localCheckpoint() else nxt
      }
      lab
    }

    def bench(label: String)(f: => DataFrame): Unit = {
      noop(f); time(label)(noop(f)); time(label + " (2nd)")(noop(f))
    }

    val c32 = mkCtx(None, aqe = true)
    val c3 = mkCtx(Some(3), aqe = true)
    val c3na = mkCtx(Some(3), aqe = false)
    bench("q74 lazy 32 prebuilt")(prRounds(c32, 3, bc = false, ckpt = false).orderBy("v"))
    bench("q74 lazy 32 bc")(prRounds(c32, 3, bc = true, ckpt = false).orderBy("v"))
    bench("q74 lazy 3 prebuilt")(prRounds(c3, 3, bc = false, ckpt = false).orderBy("v"))
    bench("q74 lazy 3 bc")(prRounds(c3, 3, bc = true, ckpt = false).orderBy("v"))
    bench("q74 lazy 3 bc noAQE")(prRounds(c3na, 3, bc = true, ckpt = false).orderBy("v"))
    bench("q74 ckpt 3 bc")(prRounds(c3, 3, bc = true, ckpt = true).orderBy("v"))

    val m32 = mlCtx(None, aqe = true)
    val m3 = mlCtx(Some(3), aqe = true)
    val m3na = mlCtx(Some(3), aqe = false)
    bench("q77 lazy 32 prebuilt")(mlRounds(m32, 3, bc = false, ckpt = false).orderBy("v"))
    bench("q77 lazy 32 bc")(mlRounds(m32, 3, bc = true, ckpt = false).orderBy("v"))
    bench("q77 lazy 3 prebuilt")(mlRounds(m3, 3, bc = false, ckpt = false).orderBy("v"))
    bench("q77 lazy 3 bc")(mlRounds(m3, 3, bc = true, ckpt = false).orderBy("v"))
    bench("q77 lazy 3 bc noAQE")(mlRounds(m3na, 3, bc = true, ckpt = false).orderBy("v"))

    // exact cross-check: per-row equality against the shipped operators
    import graft.operators.Relational.{pagerankIterate, minLabelPropagate}
    val prRef = pagerankIterate(oriented, 3, "src", "dst", Some(deg), Some(nv))
    val prNew = prRounds(c3, 3, bc = true, ckpt = false)
    val prDiff = prRef.join(prNew.withColumnRenamed("rank", "rank2"), Seq("v"))
      .filter(col("rank") =!= col("rank2")).count()
    println(s"  CROSS-CHECK q74 per-row rank diffs: $prDiff (rows=${prNew.count()})")
    val mlRef = minLabelPropagate(oriented, 3, "src", "dst", Some(deg))
    val mlNew = mlRounds(m3, 3, bc = true, ckpt = false)
    val mlDiff = mlRef.join(mlNew.withColumnRenamed("label", "label2"), Seq("v"))
      .filter(col("label") =!= col("label2")).count()
    println(s"  CROSS-CHECK q77 per-row label diffs: $mlDiff (rows=${mlNew.count()})")
    spark.stop()
  }
}
