package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the q76 alternative the r10 audit left open: per-edge
  * common-neighbor counts via in-row intersection of FULL
  * (bidirectional) adjacency arrays — no triangle-credit explode, no
  * count aggregate — against the shipped credit-explode form. The full
  * adjacency is built once and persisted here to simulate an ingest
  * artifact (the loop context's bidirectional list already exists; the
  * grouped array form would be a fifth artifact member).
  */
object Q76Probe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.operators.Relational.{canonicalEdges, orientEdges, linkJaccard}
    // same co-occurrence derivation as the cached artifact (see
    // TriangleProbe) — built locally so the probe measures the two
    // QUERY shapes over identical persisted inputs
    val pairs = graft.Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(array_sort(array_distinct(collect_list("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y ->
               struct(x AS p1, y AS p2))))""")).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
    val canon = canonicalEdges(pairs, "p1", "p2")
    val oriented = orientEdges(canon).persist()
    time("oriented build+materialize")(oriented.count())
    val adj = oriented.groupBy(col("src"))
      .agg(array_sort(collect_list(col("dst"))).as("ns")).persist()
    time("adj build+materialize")(adj.count())
    val deg = oriented.select(col("src").as("v"))
      .unionAll(oriented.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d")).persist()
    time("deg build+materialize")(deg.count())

    // candidate: full adjacency as a cached table (ingest-time build)
    val fullAdj = oriented
      .select(col("src").as("u"), col("dst").as("v"))
      .unionAll(oriented.select(col("dst").as("u"), col("src").as("v")))
      .groupBy("u").agg(array_sort(collect_list(col("v"))).as("ns"))
      .persist()
    time("fullAdj build+materialize")(fullAdj.count())

    def inRow() = oriented
      .join(fullAdj.select(col("u").as("__u"), col("ns").as("nu")),
        col("src") === col("__u"))
      .join(fullAdj.select(col("u").as("__v"), col("ns").as("nv")),
        col("dst") === col("__v"))
      // id-canonical endpoints (oriented is DEGREE-ordered, the
      // registered output is id-ordered)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
        size(array_intersect(col("nu"), col("nv"))).cast("long").as("common"))
      .filter(col("common") > 0)
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        (col("common").cast("double") /
          (col("da") + col("db") - col("common"))).as("jaccard"))

    def shipped() = linkJaccard(oriented, Some(adj), Some(deg))

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm
    noop(shipped()); noop(inRow())
    for (i <- 1 to 3) time(s"shipped run$i")(noop(shipped()))
    for (i <- 1 to 3) time(s"inRow   run$i")(noop(inRow()))

    // equality (the registered q76 takes top-200, compare the full sets)
    val a = shipped().selectExpr("a", "b", "common",
      "cast(round(jaccard * 1e12) as long) as j").orderBy("a", "b")
    val b = inRow().selectExpr("a", "b", "common",
      "cast(round(jaccard * 1e12) as long) as j").orderBy("a", "b")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"EQUAL rows=${a.count()} diff=$diff")
    spark.stop()
  }
}
