package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the s03-vs-s03c index-sizing claim (r13 VERDICT item 4):
  * candidate-pair volume (distinct colliding pairs surviving the
  * first-collision dedup, BEFORE the cosine filter) under the
  * gate-pinned 4-bit blocking vs the build-time-sized blocking, at
  * each fixture scale passed on the command line. A correctly sized
  * index holds candidates-per-vector ~flat as n grows; pinned buckets
  * let it grow linearly in n (quadratically in pairs).
  *
  * Usage: runMain graft.tools.CandVolumeProbe <sfDir> [<sfDir> ...]
  * Prints one line per (dir, family): corpus n, bits/table chosen,
  * candidate pairs, candidates per vector, and the qualifying-pair
  * count after the cosine gate (the output-bound floor no blocking
  * can beat).
  */
object CandVolumeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CandVolumeProbe <sfDir> [<sfDir> ...]")
    val spark = ProbeSession()
    // join-materialization guard: above this pre-dedup volume the
    // distinct-pair/qualifying counts are not computed (the join's
    // shuffle is exactly what exhausts local disk — the finding)
    val JoinGuard = 500L * 1000 * 1000
    println("dir,family,n,bits,join_pairs,join_per_vec,dedup_cand_pairs,qualifying_pairs")
    args.foreach { dir =>
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      Seq("pinned4" -> false, "sized" -> true).foreach { case (fam, sized) =>
        val jv = graft.operators.Similarity.candJoinVolume(spark, dir, sized)
        val (cand, qual) =
          if (jv <= JoinGuard) {
            val (c, q) = graft.operators.Similarity.candVolume(spark, dir, sized)
            (c.toString, q.toString)
          } else ("DNF(join-guard)", "DNF(join-guard)")
        println(f"$dir,$fam,$n,${graft.operators.Similarity.probeBits(spark, dir, sized)},$jv,${jv.toDouble / n}%.2f,$cand,$qual")
      }
      graft.operators.Similarity.releaseIndex(spark, dir)
    }
    spark.stop()
  }
}
