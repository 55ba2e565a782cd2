package graft.tools

import org.apache.spark.sql.streaming.Trigger

import graft.sources.kinesis._
import graft.streaming._

/** Drives StreamOps.intervalJoin end-to-end over two kinesis-graft
  * streams (clicks joined to purchases within 30s, same key).
  */
object IntervalJoinDemo {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession.fixedCores(4, logLevel = "ERROR")
    FakeKinesisService.createStream("clicks", 1)
    FakeKinesisService.createStream("buys", 1)
    KinesisRegistry.clients.put("ij", new FakeKinesisClient())
    val t0 = 1700000000000L
    // clicks at +0s (k1), +5s (k2); purchases at +20s (k1, within),
    // +120s (k2, outside)
    FakeKinesisService.push("clicks", "shardId-000000000000", "k1", "c1".getBytes, t0)
    FakeKinesisService.push("clicks", "shardId-000000000000", "k2", "c2".getBytes, t0 + 5000)
    FakeKinesisService.push("buys", "shardId-000000000000", "k1", "b1".getBytes, t0 + 20000)
    FakeKinesisService.push("buys", "shardId-000000000000", "k2", "b2".getBytes, t0 + 120000)
    def src(name: String) = spark.readStream.format("kinesis-graft")
      .option("streamName", name).option("clientName", "ij").load()
    val joined = StreamOps.intervalJoin(src("clicks"), src("buys"),
      "partitionKey", "approximateArrivalTimestamp",
      within = "30 seconds", watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .trigger(Trigger.ProcessingTime(50)).start()
    q.processAllAvailable()
    spark.sql("SELECT l_partitionKey AS k, l_sequenceNumber AS ls, r_sequenceNumber AS rs FROM ij_out ORDER BY k").collect()
      .foreach(r => println(s"JOINED ${r.getString(0)} ${r.getString(1)} -> ${r.getString(2)}"))
    println("N_JOINED=" + spark.sql("SELECT count(*) FROM ij_out").head.getLong(0))
    q.stop()
    spark.stop()
  }
}
