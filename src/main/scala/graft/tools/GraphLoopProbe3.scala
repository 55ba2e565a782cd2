package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase 3 of the iterative-graph profile (see [[GraphLoopProbe]] /
  * [[GraphLoopProbe2]]): probe2 showed prebuilding the bidirectional
  * list dominates and a 3-partition clamp helps — but it measured the
  * rounds in a CHILD session (isolated conf + cross-session Row
  * conversion). The library's artifact lives in the CALLER's session,
  * so this probe measures the loop in the parent session (32 shuffle
  * partitions, AQE on) over a bi artifact persisted at clamped vs full
  * partitioning, no broadcast hint (a hard hint would OOM at
  * billion-vertex |V|; AQE picks broadcast while |V| fits):
  * the candidate SHIPPING shape.
  */
object GraphLoopProbe3 {
  def main(args: Array[String]): Unit = {
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

    def mkBi(parts: Int): DataFrame = {
      val bi = oriented.select(col("src").as("u"), col("dst").as("v"))
        .unionAll(oriented.select(col("dst").as("u"), col("src").as("v")))
        .repartition(parts, col("u")).persist()
      bi.count(); bi
    }
    val bi3 = mkBi(3)
    val bi32 = mkBi(32)
    val degU = deg.select(col("v").as("u"), col("d"))

    def prRounds(bi: DataFrame, k: Int): DataFrame = {
      var r = degU.select(col("u").as("v"), (lit(1.0) / lit(nv)).as("rank"))
      for (_ <- 1 to k) {
        r = bi.join(r.select(col("v").as("u"), col("rank")), Seq("u"))
          .join(degU, Seq("u"))
          .select(col("v"),
            round(col("rank") * lit(1e12) / col("d")).cast("long").as("c"))
          .groupBy("v").agg(sum("c").as("s"))
          .select(col("v"),
            (lit(0.15) / lit(nv) +
              lit(0.85) * (col("s").cast("double") / lit(1e12))).as("rank"))
      }
      r
    }
    def mlRounds(bi: DataFrame, k: Int, selfLoopParts: Int): DataFrame = {
      val biPlus = bi.unionAll(
        deg.select(col("v").as("u"), col("v")).repartition(selfLoopParts))
      var lab = deg.select(col("v"), col("v").as("label"))
      for (_ <- 1 to k) {
        lab = biPlus.join(lab.select(col("v").as("u"), col("label")), Seq("u"))
          .groupBy("v").agg(min("label").as("label"))
      }
      lab
    }
    def prStep(bi: DataFrame): DataFrame =
      bi.join(degU, Seq("u"))
        .select(col("v"), round(lit(1e12) / col("d")).cast("long").as("c"))
        .groupBy("v").agg(sum("c").as("s"))
        .select(col("v"), col("s"),
          (lit(0.15) / lit(nv) +
            lit(0.85) * ((col("s").cast("double") / lit(1e12)) / lit(nv)))
            .as("rank"))

    def bench(label: String)(f: => DataFrame): Unit = {
      noop(f); time(label)(noop(f)); time(label + " (2nd)")(noop(f))
    }

    bench("q74 parent bi@3")(prRounds(bi3, 3).orderBy("v"))
    bench("q74 parent bi@32")(prRounds(bi32, 3).orderBy("v"))
    bench("q77 parent bi@3 sl@1")(mlRounds(bi3, 3, 1).orderBy("v"))
    bench("q77 parent bi@3 sl@3")(mlRounds(bi3, 3, 3).orderBy("v"))
    bench("q77 parent bi@32 sl@1")(mlRounds(bi32, 3, 1).orderBy("v"))
    bench("q72 step bi@3")(prStep(bi3).orderBy("v"))
    bench("q72 step bi@32")(prStep(bi32).orderBy("v"))

    import graft.operators.Relational.{pagerankIterate, minLabelPropagate, pagerankStep}
    bench("q72 shipped")(
      pagerankStep(oriented, "src", "dst", Some(deg), Some(nv)).orderBy("v"))
    val prRef = pagerankIterate(oriented, 3, "src", "dst", Some(deg), Some(nv))
    val prDiff = prRef.join(prRounds(bi3, 3).withColumnRenamed("rank", "rank2"), Seq("v"))
      .filter(col("rank") =!= col("rank2")).count()
    println(s"  CROSS-CHECK q74 per-row rank diffs: $prDiff")
    val mlRef = minLabelPropagate(oriented, 3, "src", "dst", Some(deg))
    val mlDiff = mlRef.join(mlRounds(bi3, 3, 1).withColumnRenamed("label", "label2"), Seq("v"))
      .filter(col("label") =!= col("label2")).count()
    println(s"  CROSS-CHECK q77 per-row label diffs: $mlDiff")
    val s0 = pagerankStep(oriented, "src", "dst", Some(deg), Some(nv))
      .agg(sum("s")).head().getLong(0)
    val s1 = prStep(bi3).agg(sum("s")).head().getLong(0)
    println(s"  CROSS-CHECK q72 s-sum: $s0 vs $s1 match=${s0 == s1}")
    spark.stop()
  }
}
