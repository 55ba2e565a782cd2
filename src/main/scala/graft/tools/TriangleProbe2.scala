package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposes the q70/q76 cost at sf1 into (adj joins + in-row
  * intersect) vs (triangle-credit explode + aggregate), then measures
  * reduced-explode variants:
  *
  *  - q70: the src/dst credits of an oriented edge are both
  *    `size(intersect)` — computable IN-ROW, so only the w-credits
  *    (one per triangle) need exploding: aggregate input drops from
  *    3·|T| rows to |T| + 2·|edges-in-triangles|.
  *  - q76: the (src,dst) edge's own credit is `size(intersect)`
  *    in-row; the two w-edges still explode: 2·|T| + |triE| vs 3·|T|.
  *
  * Outputs must stay hash-identical (counts are sums either way).
  */
object TriangleProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/repo/target/sf1")
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIMER $label%-30s $s%.2f s"); s
    }
    def best3(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map(_ => time(label)(f))
      println(f"BEST  $label%-30s ${ts.min}%.2f s")
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
    val canon = canonicalEdges(pairs, "p1", "p2")
    val oriented = orientEdges(canon).persist()
    val ne = oriented.count()
    val adj = oriented.groupBy(col("src"))
      .agg(array_sort(collect_list(col("dst"))).as("ns")).persist()
    adj.count()
    val deg = oriented.select(col("src").as("v"))
      .unionAll(oriented.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d")).persist()
    deg.count()
    println(s"  |E|=$ne")

    graft.functions.SortedIntersect.register(spark)
    val adjB = broadcast(adj)
    def withIGen(ix: String): DataFrame = oriented
      .join(adjB.select(col("src").as("__u"), col("ns").as("nu")),
        col("src") === col("__u"))
      .join(adjB.select(col("src").as("__v"), col("ns").as("nv")),
        col("dst") === col("__v"))
      .select(col("src"), col("dst"), expr(ix).as("i"))
    def withI: DataFrame = withIGen("array_intersect(nu, nv)")
    def withIN: DataFrame = withIGen("sorted_intersect(nu, nv)")

    // sorted-merge must agree with array_intersect element for element
    val diff = withI.select(col("src"), col("dst"), col("i"))
      .join(withIN.select(col("src"), col("dst"), col("i").as("i2")),
        Seq("src", "dst"))
      .where(not(col("i") <=> col("i2"))).count()
    println(s"CHECK sorted_intersect ${if (diff == 0) "IDENTICAL"
      else s"DIVERGED on $diff edges"}")

    // ---- floor: joins + intersect only, one scalar out ----
    best3("floor joins+intersect")(
      noop(withI.select(size(col("i")).as("c")).agg(sum("c"))))
    best3("floor joins+sorted-merge")(
      noop(withIN.select(size(col("i")).as("c")).agg(sum("c"))))
    // join-only control: how much of the floor is the joins themselves
    best3("floor joins only")(
      noop(withIGen("size(nu) + size(nv)").agg(sum("i"))))

    // ---- q70 shipped vs reduced-explode ----
    def q70Of(base: DataFrame): DataFrame = base
      .select(col("src"), col("dst"), explode(col("i")).as("w"))
      .select(explode(array(col("src"), col("dst"), col("w"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_tri"))
    def q70New: DataFrame = {
      val base = withI.where(size(col("i")) > 0)
      base.select(explode(array(
          struct(col("src").as("part"), size(col("i")).cast("long").as("n")),
          struct(col("dst").as("part"), size(col("i")).cast("long").as("n"))))
          .as("e"))
        .select(col("e.part").as("part"), col("e.n").as("n"))
        .unionAll(base.select(explode(col("i")).as("part"), lit(1L).as("n")))
        .groupBy("part").agg(sum("n").as("n_tri"))
    }
    def sig(df: DataFrame): String =
      df.agg(sum(hash(df.columns.map(col): _*))).collect()(0).toString
    def q70Old: DataFrame = q70Of(withI)
    println(s"CHECK q70 ${if (sig(q70Old) == sig(q70New)) "IDENTICAL"
      else "DIVERGED"}")
    println(s"CHECK q70n ${if (sig(q70Old) == sig(q70Of(withIN))) "IDENTICAL"
      else "DIVERGED"}")
    best3("q70 shipped")(noop(q70Old))
    best3("q70 sorted-merge")(noop(q70Of(withIN)))
    best3("q70 reduced-explode")(noop(q70New))

    // ---- q76 shipped vs reduced-explode ----
    def q76Counts(tri: DataFrame): DataFrame = tri
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        (col("common").cast("double") /
          (col("da") + col("db") - col("common"))).as("jaccard"))
    def q76Of(base: DataFrame): DataFrame = q76Counts(base
      .select(col("src"), col("dst"), explode(col("i")).as("w"))
      .select(explode(array(
        struct(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")),
        struct(least(col("src"), col("w")).as("a"),
          greatest(col("src"), col("w")).as("b")),
        struct(least(col("dst"), col("w")).as("a"),
          greatest(col("dst"), col("w")).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common")))
    def q76New: DataFrame = {
      val base = withI.where(size(col("i")) > 0)
      val own = base.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
        size(col("i")).cast("long").as("n"))
      val wEdges = base
        .select(col("src"), col("dst"), explode(col("i")).as("w"))
        .select(explode(array(
          struct(least(col("src"), col("w")).as("a"),
            greatest(col("src"), col("w")).as("b")),
          struct(least(col("dst"), col("w")).as("a"),
            greatest(col("dst"), col("w")).as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"), lit(1L).as("n"))
      q76Counts(own.unionAll(wEdges)
        .groupBy("a", "b").agg(sum("n").as("common")))
    }
    def q76Old: DataFrame = q76Of(withI)
    println(s"CHECK q76 ${if (sig(q76Old) == sig(q76New)) "IDENTICAL"
      else "DIVERGED"}")
    println(s"CHECK q76n ${if (sig(q76Old) == sig(q76Of(withIN))) "IDENTICAL"
      else "DIVERGED"}")
    best3("q76 shipped")(noop(q76Old))
    best3("q76 sorted-merge")(noop(q76Of(withIN)))
    best3("q76 reduced-explode")(noop(q76New))
    spark.stop()
  }
}
