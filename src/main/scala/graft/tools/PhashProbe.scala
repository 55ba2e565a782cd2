package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** m06 component breakdown: is the cost the 8×8 grid derivation
  * (64 conv(hex(substring)) samples per asset via transform-HOF), the
  * aHash band aggregate, or the band-blocked self-join?
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators.Multimodal
    // the m06 input (imgs + shifted copies), as registered
    val base = graft.SparkEntry.queries("m06_phash_neardup")
    def full() = base(spark, dir)
    // grid+hash only (no join)
    def hashOnly() = {
      val imgs = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      Multimodal.perceptualHash(imgs, srcWidth = 16)
    }
    Seq(("hashOnly", () => noop(hashOnly())),
        ("full m06", () => noop(full()))).foreach { case (label, f) =>
      f()
      (1 to 3).foreach(i => time(s"$label run$i")(f()))
    }
    spark.stop()
  }
}
