package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Exercises the GraphLoop `vMode` layout flip with REAL data (r13
  * VERDICT item 2). Two experiments, each A/B-ing the hinted
  * v-layout (exchange-free per-round aggregates, |V|-row broadcast)
  * against the flipped u-layout (exchange-free rank attach, no hint,
  * AQE-planned join):
  *
  *  1. the sf5 co-occurrence graph (|V|≈1M real vertices — 48·|V| ≈
  *     48 MB, still under the 256 MB bound, so the u-branch is forced
  *     via the documented owner-session override), and
  *  2. a synthetic graph sized PAST the flip point (|V| = 6M →
  *     48·|V| = 288 MB > 256 MB), where the u-layout engages with the
  *     bound UN-overridden — the natural-flip exercise the
  *     bound-override specs can't provide — and the v-branch is the
  *     override.
  *
  * For each branch: pagerankIterateLoop(k=5) and
  * minLabelPropagateLoop(k=3) wall time, plus an order-free checksum
  * asserting the two layouts return IDENTICAL results.
  *
  * Usage: runMain graft.tools.GraphLoopProbe5 <sf5Dir>
  */
object GraphLoopProbe5 {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: GraphLoopProbe5 <sf5Dir>")
    val dir = args(0)
    val spark = ProbeSession()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // order-free exact checksums: counts + xor of per-row hashes
    def prSum(df: DataFrame): (Long, Long) = {
      val r = df.select(count(lit(1)),
        expr("bit_xor(xxhash64(v, CAST(round(rank * 1e9) AS BIGINT)))")).head()
      (r.getLong(0), r.getLong(1))
    }
    def mlSum(df: DataFrame): (Long, Long) = {
      val r = df.select(count(lit(1)), expr("bit_xor(xxhash64(v, label))")).head()
      (r.getLong(0), r.getLong(1))
    }

    def ab(tag: String, edges: DataFrame, flipBytes: Option[String],
        naturalIsU: Boolean): Unit = {
      // branch A: bound as configured (natural); branch B: override
      def build(over: Option[String]): Relational.GraphLoop = {
        over.foreach(b =>
          spark.conf.set("graft.loop.vertexBroadcastMaxBytes", b))
        try Relational.buildGraphLoop(edges)
        finally if (over.isDefined)
          spark.conf.unset("graft.loop.vertexBroadcastMaxBytes")
      }
      val natural = build(None)
      val flipped = build(flipBytes)
      require(natural.vMode != flipped.vMode,
        s"$tag: override did not flip the layout")
      require(natural.vMode == !naturalIsU, s"$tag: unexpected natural layout")
      try {
        Seq(natural, flipped).foreach { l =>  // warm both cached tables
          Relational.pagerankIterateLoop(l, 1).write.format("noop")
            .mode("overwrite").save()
        }
        def run(l: Relational.GraphLoop): ((Long, Long), Double, (Long, Long), Double) = {
          val (pr, tPr) = time(prSum(Relational.pagerankIterateLoop(l, 5)))
          val (ml, tMl) = time(mlSum(Relational.minLabelPropagateLoop(l, 3)))
          (pr, tPr, ml, tMl)
        }
        val (prN, tPrN, mlN, tMlN) = run(natural)
        val (prF, tPrF, mlF, tMlF) = run(flipped)
        val (prN2, tPrN2, mlN2, tMlN2) = run(natural) // best-of-2
        val (prF2, tPrF2, mlF2, tMlF2) = run(flipped)
        require(prN == prF && prN == prN2 && prF == prF2,
          s"$tag: pagerank diverged across layouts: $prN vs $prF")
        require(mlN == mlF && mlN == mlN2 && mlF == mlF2,
          s"$tag: minlabel diverged across layouts: $mlN vs $mlF")
        def lay(l: Relational.GraphLoop) = if (l.vMode) "vLayout" else "uLayout"
        println(f"$tag nv=${natural.nv} parts=${natural.parts} " +
          f"${lay(natural)}(natural): pr5=${math.min(tPrN, tPrN2)}%.2fs " +
          f"ml3=${math.min(tMlN, tMlN2)}%.2fs | ${lay(flipped)}(override): " +
          f"pr5=${math.min(tPrF, tPrF2)}%.2fs ml3=${math.min(tMlF, tMlF2)}%.2fs " +
          f"IDENTICAL")
      } finally {
        Relational.releaseGraphLoop(natural)
        Relational.releaseGraphLoop(flipped)
      }
    }

    // 1) REAL sf5 co-occurrence edges (|V|≈1M): natural v-layout,
    //    u-layout forced with a proportionally lowered bound (16 MB <
    //    48 MB estimate — the same ratio a 256 MB bound has to a
    //    ~5.3M-vertex graph). Pairs derived inline the same in-row
    //    way the library's ingest artifact does (GraphLoopProbe4).
    val pairs = graft.Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(array_sort(array_distinct(collect_list("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y ->
               struct(x AS p1, y AS p2))))""")).as("pr"))
      .select(col("pr.p1").as("a"), col("pr.p2").as("b"))
      .distinct().persist()
    println(s"sf5-cooccur edges=${pairs.count()}")
    ab("sf5-cooccur", pairs, Some((16L << 20).toString), naturalIsU = false)
    pairs.unpersist()

    // 2) SYNTHETIC 6M-vertex graph: 48·6M = 288 MB > 256 MB — the
    //    u-layout engages with the bound UN-overridden (the natural
    //    flip); v-layout forced by raising the bound. ~18M random
    //    edges over 6M vertices (supercritical: one giant component
    //    plus fringe — real label-propagation work).
    val nV = 6L * 1000 * 1000
    val nE = 18L * 1000 * 1000
    val syn = spark.range(nE).select(
      (xxhash64(col("id"), lit(1)) % nV).as("a"),
      (xxhash64(col("id"), lit(2)) % nV).as("b"))
      .select(abs(col("a")).as("a"), abs(col("b")).as("b"))
    ab("synthetic-6M", syn, Some((2048L << 20).toString), naturalIsU = true)

    spark.stop()
  }
}
