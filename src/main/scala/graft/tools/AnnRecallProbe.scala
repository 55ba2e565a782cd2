package graft.operators
// (lives under tools/ with the other probes; package graft.operators for
// access to the private[operators] index caches)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the ANN recall of s04/s08/s09 vs exact top-5 at each
  * fixture sf — the numbers that size the certification floors in
  * `certifyAnnTopK` (a floor must hold deterministically at every
  * gate scale, or the flag hash-fails the driver gate).
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.tools.ProbeSession.fixedCores(16, logLevel = "ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = graft.Tables.embeddings(spark, dir)
      val probes = e.filter(col("vec_id") < 10)
      val exact = Similarity.cosineTopK(e, probes, k = 5)
        .select("qid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val got = df.select("qid", "cid").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val hits = got.count(exact.contains)
        println(f"RECALL $sf $name%-4s $hits/${got.length} = ${hits.toDouble / got.length}%.3f")
      }
      recall("s04", Similarity.ivfTopK(Similarity.ivfIndex(spark, dir),
        probes.select("vec_id"), k = 5, nProbe = Similarity.IvfNProbe))
      recall("s08", Similarity.pqRerankTopK(Similarity.pqIndex(spark, dir),
        e, probes, k = 5, shortlist = 50))
      recall("s09", Similarity.ivfPqTopK(Similarity.ivfIndex(spark, dir),
        Similarity.pqIndex(spark, dir), probes, k = 5,
        nProbe = Similarity.IvfNProbe, shortlist = 50))
    }
    spark.stop()
  }
}
