package graft.operators
// (lives under tools/ with the other probes; package graft.operators for
// access to the private[operators] pair builders / index caches)

import org.apache.spark.sql.functions._

/** Growth decomposition for the output-bound families (r15 VERDICT
  * item 5): the sf1→sf5 captures show the s07 family / d05 growing
  * ≥8× for 5× data. This probe separates the three growth terms by
  * running the same pair pipelines on [[graft.tools.MakeSfN]]'s
  * clique fixtures AND [[graft.tools.MakeSfNDistinct]]'s non-clique
  * fixtures at the same scales, at TWO thresholds:
  *
  *  - t = 0.35 (the registered queries' grazing threshold): on
  *    near-isotropic 64-d embeddings the chance tail P(cos > 0.35) =
  *    P(z > 2.8) ≈ 0.26% makes the qualifying-pair relation
  *    intrinsically ~C(n,2)·0.0026 — quadratic REGARDLESS of fixture.
  *    The probe's measured counts test that closed-form bound.
  *  - t = 0.8 (an operational near-dup threshold, 6.4σ): the chance
  *    term is ~10⁻¹⁰ per pair, so qualifying pairs are TRUE
  *    duplicates only — quadratic in replicas on the clique fixture
  *    (every row is in an N-clique of exact twins), ~linear in
  *    replicas on the non-clique fixture. The pair of measurements is
  *    the fixture-artifact vs genuine-growth split.
  *
  * Blocking is the SIZED cell rule (sizedCellsOf ≈ √n) for the
  * semantic family and the sized LSH rule for s03 — the scale-safe
  * production forms — so the probe itself stays runnable at sf5.
  *
  * Per dir prints: n, semantic pairs at both thresholds, d05 SimHash
  * pairs, s03 sized-LSH pairs (t = 0.35), with build seconds.
  *
  * Usage: tools/run.sh graft.operators.GrowthProbe <dir> [<dir> ...]
  */
object GrowthProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GrowthProbe <sfDir> [<sfDir> ...]")
    val spark = graft.tools.ProbeSession(logLevel = "ERROR")
    println("dir,n_vec,sem35_pairs,sem35_sec,sem80_pairs,sem80_sec," +
      "d05_pairs,d05_sec,s03_pairs,s03_sec")
    args.foreach { dir =>
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      def timed(label: String)(f: => Long): (Long, Double) = {
        System.err.println(s"GROWTH $dir $label ...")
        val t0 = System.nanoTime()
        val c = f
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"GROWTH $dir $label: $c pairs, $dt%.1f s")
        try { System.gc(); Thread.sleep(500) } catch { case _: InterruptedException => () }
        (c, dt)
      }
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cells = Similarity.sizedCellsOf(n)
      val cents = corpus.filter(col("vec_id") < cells)
        .select(col("vec_id").cast("int").as("cell"), col("v").as("cv"))
      val (s35, t35) = timed("sem t=0.35")(
        Similarity.cellBlockedPairs(corpus, cents, 0.35, nAssign = 4).count())
      val (s80, t80) = timed("sem t=0.80")(
        Similarity.cellBlockedPairs(corpus, cents, 0.80, nAssign = 4).count())
      val (d05, d05Sec) = timed("d05 simhash")(
        graft.SparkEntry.queries("d05_dedup_simhash")(spark, dir).count())
      val (s03, s03Sec) = timed("s03 sized-lsh")(
        graft.SparkEntry.queries("s03_embed_neardup")(spark, dir).count())
      println(f"$dir,$n,$s35,$t35%.1f,$s80,$t80%.1f,$d05,$d05Sec%.1f,$s03,$s03Sec%.1f")
      Similarity.releaseIndex(spark, dir)
    }
    spark.stop()
  }
}
