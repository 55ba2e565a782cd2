package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure whether raising the sized-LSH clamp (SizedMaxBits = 12)
  * pays at sf5 — the r14 CandVolumeProbe residual: the sizing rule
  * (smallest b with 2^b·16 ≥ n) wants 13 bits at n = 100k but the
  * clamp stops at 12, so sf5's per-vector candidate volume ticked up
  * 273 → 1,026. For bits ∈ {12, 13, 14} over the same 24-table
  * scheme this probe reports:
  *   - pre-dedup bucket-join volume Σ c·(c−1)/2 (exact, from sizes)
  *   - distinct colliding candidates + qualifying (≥0.35) pairs
  *   - the timed pair pipeline (cold + 2 steady, noop sink)
  * The recall column is the qualifying count: tighter buckets lose
  * grazing-threshold pairs — the documented trade the decision must
  * weigh against the volume/runtime win.
  *
  * Usage: SF_DIR=/root/repo/target/sf5 tools/run.sh graft.tools.SizedBitsProbe
  */
object SizedBitsProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/repo/target/sf5")
    val bitsList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(12, 13, 14)
    import graft.operators.Similarity.{probeBucketsAtBits, probePairsOfBuckets}

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    bitsList.foreach { bits =>
      val bk = probeBucketsAtBits(spark, dir, bits)
      val stats = bk.groupBy("tbl", "bucket").agg(count(lit(1)).as("c"))
        .agg(sum(expr("(c * (c - 1)) DIV 2")).cast("long").as("vol"),
          max(col("c")).as("cmax"),
          expr("percentile_approx(c, 0.99)").as("c99"),
          // the largest single bucket's self-join emits c²/2 pairs into
          // ONE task — the skew diagnostic joinVol alone hides
          max(expr("(c * (c - 1)) DIV 2")).cast("long").as("volmax"))
        .head()
      val vol = stats.getLong(0)
      val cmax = stats.getLong(1)
      val volmax = stats.getLong(3)
      val n = bk.select(countDistinct(col("vec_id"))).head().getLong(0)
      val t0 = System.nanoTime()
      val pairs = probePairsOfBuckets(spark, dir, bk)
      val nPairs = pairs.count()
      val cold = (System.nanoTime() - t0) / 1e9
      val steady = (1 to 2).map { _ =>
        val t = System.nanoTime(); noop(probePairsOfBuckets(spark, dir, bk))
        (System.nanoTime() - t) / 1e9
      }.min
      println(f"SIZEDBITS bits=$bits%2d n=$n%d joinVol=$vol%,d (${vol / n}%,d/vec) maxBucket=$cmax%,d maxBucketPairs=$volmax%,d qualifying=$nPairs%,d cold=$cold%7.2fs steady=$steady%7.2fs")
    }
    spark.stop()
  }
}
