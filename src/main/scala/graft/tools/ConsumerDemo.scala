package graft.tools

import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming._

/** End-to-end demo of the consumer facade on a file-replay stream —
  * the library-usage equivalent of the reference's README example
  * (README.md:33-59): option → handler → saver → run → shutdown.
  */
object ConsumerDemo {
  val processed = new java.util.concurrent.atomic.AtomicLong(0)
  val deadLettered = new java.util.concurrent.atomic.AtomicLong(0)

  def main(args: Array[String]): Unit = {
    val spark = ProbeSession.fixedCores(4, logLevel = "ERROR")

    // Stage: events table → Kinesis record envelope, 4 shards.
    val stage = java.nio.file.Files.createTempDirectory("replay").toString
    graft.Tables.events(spark, "/root/testdata/sf0.001").select(
      col("props").cast("binary").as("data"),
      col("user_id").cast("string").as("partitionKey"),
      lpad(col("event_id").cast("string"), 12, "0").as("sequenceNumber"),
      col("ts").as("approximateArrivalTimestamp"),
      lit("replay-stream").as("streamName"),
      concat(lit("shardId-"), (col("user_id") % 4).cast("string")).as("shardId"))
      .write.mode("overwrite").parquet(stage)
    println("STAGED_ROWS=" + spark.read.parquet(stage).count())

    val src = spark.readStream.schema(KinesisRecord.schema).parquet(stage)
    val saver = new FileSequenceSaver(
      java.nio.file.Files.createTempDirectory("saver").toString)
    val consumer = GraftConsumer(GraftOption().withStreamName("replay-stream"))
      .sleepLimit(200.millis)
      .setSaver(new RetryingSaver(saver))
      .errorPolicy(ErrorPolicy.SkipAndLog)
      .onError((_, _) => ConsumerDemo.deadLettered.incrementAndGet())
      .handle { r =>
        if (new String(r.data, "UTF-8").contains("\"k\": 13")) sys.error("poison record")
        processed.incrementAndGet()
      }
    val q = consumer.run(src)
    q.processAllAvailable()
    println("PROCESSED=" + processed.get())
    println("SKIPPED=" + consumer.errorCount)
    println("DEAD_LETTERED=" + deadLettered.get())
    (0 until 4).foreach(i =>
      println(s"CKPT shardId-$i = " + saver.get("replay-stream", s"shardId-$i")))
    println("CLEAN_SHUTDOWN=" + consumer.shutdown(30.seconds))
    println("SHUTDOWN_TWICE=" + consumer.shutdown(5.seconds))
    spark.stop()
  }
}
