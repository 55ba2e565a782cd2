package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf5 triangle-plan decision probe (r14): above the adjacency
  * broadcast bound (8·|E| + 48·|V| > 256 MB — the sf5 co-occurrence
  * graph is the first fixture to cross it), the shipped
  * intersect-path falls back to sort-merge joins whose SECOND join
  * shuffles the (src, dst, nu) intermediate — 60M rows each carrying
  * an avg-~60-long adjacency array (~29 GB) — and q70/q76 measured
  * 45×/28× at 5× data. Candidates measured here, all on the same
  * derived sf5 graph, all asserted to produce the identical triple
  * count:
  *
  *   A. shipped: two SMJ array-attach joins + sorted_intersect
  *   B. same joins with SHUFFLE_HASH hints (kills the sorts, keeps
  *      the fat intermediate shuffle)
  *   C. WEDGE path: in-row ordered pair explode from each out-list
  *      (Σ C(d,2) skinny rows — printed first) joined against the
  *      id-canonicalized edge set — no array ever crosses a shuffle
  *
  * Usage: runMain graft.tools.TriangleProbe3 <sfDir>
  */
object TriangleProbe3 {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: TriangleProbe3 <sfDir>")
    val dir = args(0)
    val spark = ProbeSession()
    graft.functions.SortedIntersect.register(spark)

    import graft.operators.Relational.{canonicalEdges, orientEdges}
    val pairs = graft.Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(array_sort(array_distinct(collect_list("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y ->
               struct(x AS p1, y AS p2))))""")).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .distinct()
    val oriented = orientEdges(canonicalEdges(pairs, "p1", "p2")).persist()
    val ne = oriented.count()
    val adj = oriented.groupBy(col("src"))
      .agg(array_sort(collect_list(col("dst"))).as("ns")).persist()
    val nv = adj.count()
    val stats = adj.select(
      sum(expr("size(ns)")).as("sum_d"),
      sum(expr("CAST(size(ns) AS BIGINT) * (size(ns) - 1) / 2")).as("wedges"),
      max(expr("size(ns)")).as("max_d")).head()
    println(s"GRAPH |E|=$ne |V|=$nv sum_d=${stats.get(0)} " +
      s"wedges=${stats.get(1)} max_outdeg=${stats.get(2)} " +
      s"arrayMB=${8L * ne / 1000000} boundMB=${(8L * ne + 48L * nv) / 1000000}")

    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime(); val n = f
      println(f"TRI3 $label%-22s triples=$n%d  ${(System.nanoTime() - t0) / 1e9}%.1f s")
      n
    }

    def intersectTriples(hint: Option[String]): Long = {
      val h = hint.map {
        case "broadcast" => broadcast(adj)
        case other => adj.hint(other)
      }.getOrElse(adj)
      oriented
        .join(h.select(col("src").as("__u"), col("ns").as("nu")),
          col("src") === col("__u"))
        .join(h.select(col("src").as("__v"), col("ns").as("nv")),
          col("dst") === col("__v"))
        .select(explode(expr("sorted_intersect(nu, nv)")).as("w"))
        .count()
    }
    // wedge path: ns is sorted ascending, so in-row pairs (x, y) are
    // id-ordered; the edge between them sits in oriented in ONE
    // degree-ordered direction, so join on the id-canonical form.
    // ecHint: hint the skinny closing-edge side (shuffle_hash kills
    // the 2e9-row wedge sort a merge join would need).
    def wedgeTriples(ecHint: Option[String]): Long = {
      val ec0 = oriented.select(least(col("src"), col("dst")).as("wa"),
        greatest(col("src"), col("dst")).as("wb"))
      val ec = ecHint.map(ec0.hint(_)).getOrElse(ec0)
      adj.select(col("src").as("u"), explode(expr(
          """flatten(transform(ns, (x, i) ->
               transform(slice(ns, i + 2, size(ns)), y ->
                 struct(x AS a, y AS b))))""")).as("p"))
        .select(col("u"), col("p.a").as("wa"), col("p.b").as("wb"))
        .join(ec, Seq("wa", "wb"))
        .count()
    }

    // r14 second pass: the first (contended) capture showed unhinted
    // wedge 8x WORSE than the shipped SMJ; this sweep adds the two
    // unmeasured candidates — wedge with a shuffle-hash closing join,
    // and the intersect path with the 526 MB adjacency FORCE-broadcast
    // (is the 256 MB bound below the real crossover?).
    val tA = time("shipped_smj")(intersectTriples(None))
    val tB = time("shuffle_hash")(intersectTriples(Some("shuffle_hash")))
    val tBc = time("broadcast_526mb")(intersectTriples(Some("broadcast")))
    val tW = time("wedge_hash")(wedgeTriples(Some("shuffle_hash")))
    require(tA == tB && tB == tBc && tBc == tW,
      s"triple counts diverged: $tA $tB $tBc $tW")
    // repeat for steady-state (page cache, JIT)
    time("shipped_smj_2")(intersectTriples(None))
    time("shuffle_hash_2")(intersectTriples(Some("shuffle_hash")))
    time("broadcast_526mb_2")(intersectTriples(Some("broadcast")))
    time("wedge_hash_2")(wedgeTriples(Some("shuffle_hash")))
    spark.stop()
  }
}
