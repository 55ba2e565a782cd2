package graft.operators
// (lives under tools/ with the other probes; package graft.operators for
// access to the private[operators] semPairs / index caches)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth decomposition for the output-bound families (r15 VERDICT
  * item 5): the sf1→sf5 captures show s07-family/d05 growing ≥8× for
  * 5× data, explained as "the 50-replica clique grows the
  * qualifying-pair relation ~27×" — this probe MEASURES that
  * explanation by running the same pair pipelines on [[MakeSfN]]'s
  * clique fixtures AND [[MakeSfNDistinct]]'s non-clique fixtures at
  * the same scales. On non-clique data the pair relation should grow
  * ~linearly in replicas (each replica carries its own sf0.1 pair
  * structure and contributes no cross-replica pairs), pinning the
  * superlinear residue on the fixture, not the plan.
  *
  * Per dir prints: corpus n, s06/s07 qualifying semantic pairs +
  * build seconds, d05 simhash near-dup pairs + seconds, s03 sized
  * LSH qualifying pairs + seconds.
  *
  * Usage: runMain graft.tools... actually:
  *   tools/run.sh graft.operators.GrowthProbe <dir> [<dir> ...]
  */
object GrowthProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GrowthProbe <sfDir> [<sfDir> ...]")
    val spark = graft.tools.ProbeSession(logLevel = "ERROR")
    println("dir,n_vec,sem_pairs,sem_sec,d05_pairs,d05_sec,s03_pairs,s03_sec")
    args.foreach { dir =>
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      def timed(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime()
        val c = f
        (c, (System.nanoTime() - t0) / 1e9)
      }
      val (sem, semSec) = timed(Similarity.semPairs(spark, dir).count())
      val (d05, d05Sec) = timed(
        graft.SparkEntry.queries("d05_dedup_simhash")(spark, dir).count())
      val (s03, s03Sec) = timed(
        graft.SparkEntry.queries("s03_embed_neardup")(spark, dir).count())
      println(f"$dir,$n,$sem,$semSec%.1f,$d05,$d05Sec%.1f,$s03,$s03Sec%.1f")
      Similarity.releaseIndex(spark, dir)
    }
    spark.stop()
  }
}
