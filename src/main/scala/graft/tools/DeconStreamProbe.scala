package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
object DeconStreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession.fixedCores(4)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("deconprobe").toString
    val withTs = corpus.select(col("doc_id"), col("text"))
      .withColumn("event_ts", to_timestamp(lit("2026-01-01 00:00:00")))
    withTs.write.mode("overwrite").parquet(tmp)
    for (h <- Seq(1, 2)) {
      Thread.sleep(100)
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(-900L - h, "watermark sentinel",
          java.sql.Timestamp.valueOf(s"2026-01-01 0$h:00:00"))), withTs.schema)
        .write.mode("append").parquet(tmp)
    }
    val streamed = spark.readStream.schema(withTs.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val screened = graft.streaming.StreamOps.decontaminateStream(
      streamed, bench, tsCol = "event_ts", watermark = "10 minutes")
    val q = screened.writeStream.format("memory").queryName("probe")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      println(s"BATCH ${p.batchId} rows=${p.numInputRows} watermark=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}")
    }
    println("RESULT " + spark.sql("SELECT * FROM probe").count())
    q.stop(); spark.stop()
  }
}
