package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage isolation for SizedBitsProbe's 12-vs-13-bit cliff: the full
  * pair pipeline read 33× slower at 12 bits while join volume dropped
  * only 20% — neither volume nor bucket skew explains that, so this
  * probe times each stage separately:
  *   - bucket self-join + first-collision dedup → candidate COUNT
  *     (no vector fetch, no cosine)
  *   - the full pipeline (for reference, same as SizedBitsProbe)
  * and prints the candidate count — if candidates at 12 bits dwarf
  * 13's, the cliff is real pair volume the joinVol/24 floor hid; if
  * counts are close, the cliff is a plan-strategy flip downstream and
  * the explain dump will show it.
  */
object SizedBitsProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/repo/target/sf5")
    val bitsList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(12, 13)
    import graft.operators.Similarity.{probeBucketsAtBits, probeCandsOfBuckets}

    bitsList.foreach { bits =>
      val bk = probeBucketsAtBits(spark, dir, bits)
      bk.count() // bucket build outside the timed stages
      val t0 = System.nanoTime()
      val nCands = probeCandsOfBuckets(bk).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      println(f"SIZEDBITS2 bits=$bits%2d candidates=$nCands%,d candStage=$tCand%7.2fs")
    }
    spark.stop()
  }
}
