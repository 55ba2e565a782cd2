package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.kinesis.{FakeKinesisClient, FakeKinesisService, KinesisRegistry}

/** Throughput capture for the STREAMING half of the engine (r11
  * VERDICT item 7): rows/s through the kinesis-graft DSv2 source at a
  * 10⁵-record fixture, measured over Trigger.AvailableNow drains
  * (fixed work, self-terminating — wall time is comparable across
  * runs):
  *
  *  1. `raw drain` — source → counting foreachBatch (the floor: pure
  *     source+planner throughput, per-shard slices read in parallel);
  *  2. `kmv twin` — source → [[graft.streaming.StreamOps
  *     .dailyDistinctKmvStream]] (bounded ≤ k-long state/day);
  *  3. `cms twin` — source → `dailyFreqCmsStream` (dense d×w counter
  *     state/day).
  *
  * Prints one STREAMBENCH line per path: records, seconds (median of
  * 3 fresh-stream drains), rows/s. Numbers land in SCALE.md next to
  * the batch table.
  */
object StreamBench {
  private val Records = 100000
  private val Shards = 8

  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    KinesisRegistry.clients.put("bench", new FakeKinesisClient())

    var streamNo = 0
    def freshLoadedStream(): String = {
      streamNo += 1
      val name = s"bench$streamNo"
      FakeKinesisService.createStream(name, Shards)
      val payload = ("x" * 100).getBytes
      var i = 0
      while (i < Records) {
        FakeKinesisService.push(name, f"shardId-${i % Shards}%012d",
          s"pk${i % 997}", payload)
        i += 1
      }
      name
    }

    // Admission cap per trigger — the batch-size lever: the sketch
    // twins' cost is per-micro-batch fixed overhead (measured — the
    // 32-day state spread recovered only ~12%), so throughput should
    // scale with records-per-batch until state work dominates.
    val fetch = sys.env.getOrElse("SPARK_GRAFT_STREAM_FETCH", "10000")
    def source(name: String) = spark.readStream.format("kinesis-graft")
      .option("streamName", name)
      .option("clientName", "bench")
      .option("maxRecordsPerFetch", fetch)
      .load()

    def timeDrain(label: String)(mk: String => org.apache.spark.sql.DataFrame,
        sinkToMemory: Boolean): Unit = {
      val times = (1 to 3).map { _ =>
        val name = freshLoadedStream()
        val df = mk(name)
        val t0 = System.nanoTime()
        val q =
          if (sinkToMemory)
            df.writeStream.format("memory").queryName(s"sb_$streamNo")
              .outputMode("append")
              .trigger(Trigger.AvailableNow()).start()
          else
            df.writeStream
              .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
                b.write.format("noop").mode("overwrite").save()
              }
              .trigger(Trigger.AvailableNow()).start()
        require(q.awaitTermination(300000), s"$label did not drain")
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val sec = times(1) // median of 3
      println(f"STREAMBENCH $label%-10s records=$Records sec=$sec%.2f " +
        f"rows_per_sec=${Records / sec}%.0f (runs=${times.map(t => f"$t%.2f").mkString(",")})")
    }

    // 1. raw drain: source → noop-writing foreachBatch
    timeDrain("raw")(name => source(name), sinkToMemory = false)

    // 2. KMV sketch twin: per-day bottom-k distinct of partition keys
    timeDrain("kmv_twin")(name =>
      graft.streaming.StreamOps.dailyDistinctKmvStream(
        source(name).select(
          col("approximateArrivalTimestamp").as("ts"),
          col("partitionKey").as("user_id"))),
      sinkToMemory = true)

    // 3. CMS sketch twin: per-day key-frequency counters
    timeDrain("cms_twin")(name =>
      graft.streaming.StreamOps.dailyFreqCmsStream(
        source(name).select(
          col("approximateArrivalTimestamp").as("ts"),
          col("partitionKey").as("event_type"))),
      sinkToMemory = true)

    // 4. KMV twin with a synthetic 32-day spread: every record lands
    // on one of 32 event-time days, so the flatMapGroupsWithState
    // state updates fan out over 32 keys instead of serializing
    // through one — the state-key-cardinality scaling axis the
    // single-day capture deliberately pins at its worst case.
    timeDrain("kmv_32day")(name =>
      graft.streaming.StreamOps.dailyDistinctKmvStream(
        source(name).select(
          expr("timestampadd(DAY, CAST(pmod(xxhash64(partitionKey), 32) AS INT), " +
            "approximateArrivalTimestamp)").as("ts"),
          col("partitionKey").as("user_id"))),
      sinkToMemory = true)

    // 5./6. The micro-batch FIXED-OVERHEAD lever (r13 VERDICT item 8):
    // the r12 sweep showed the sketch twins bounded by per-batch fixed
    // cost, and part of that cost is state-store checkpointing — the
    // HDFS-backed default snapshots the store every batch, while the
    // RocksDB provider with CHANGELOG checkpointing uploads only the
    // batch's delta and compacts snapshots in the background. Measure
    // the kmv twin on RocksDB without, then with, the changelog knob —
    // the verdict (either direction) lands in SCALE.md.
    def kmvTwin(name: String) =
      graft.streaming.StreamOps.dailyDistinctKmvStream(
        source(name).select(
          col("approximateArrivalTimestamp").as("ts"),
          col("partitionKey").as("user_id")))
    def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
    }
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    withConf("spark.sql.streaming.stateStore.providerClass" -> rocks) {
      timeDrain("kmv_rocks")(kmvTwin, sinkToMemory = true)
    }
    withConf(
      "spark.sql.streaming.stateStore.providerClass" -> rocks,
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        -> "true") {
      timeDrain("kmv_rocks_cl")(kmvTwin, sinkToMemory = true)
    }

    spark.stop()
  }
}
