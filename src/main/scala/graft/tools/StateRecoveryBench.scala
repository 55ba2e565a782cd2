package graft.tools

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.kinesis.{FakeKinesisClient, FakeKinesisService, KinesisRegistry}

/** Streaming STATE-RECOVERY cost capture (r12 VERDICT item 6): the
  * crash-recovery e2e (KinesisSourceSpec) proves restart SEMANTICS —
  * a WAL-written-but-uncommitted batch replays identically; this
  * measures restart COST at state volume:
  *
  *  1. build phase — drain a ~10⁶-record stream through
  *     [[graft.streaming.StreamOps.ewmaStream]] with ~10⁶ DISTINCT
  *     keys (per-key (acc, n) state — the state-volume worst case:
  *     store size grows with key cardinality, unlike the sketch twins
  *     whose per-day state is bounded), checkpointed;
  *  2. stop, push a small tail, RESTART from the checkpoint: the
  *     restart's first micro-batch must first RESTORE the ~10⁶-key
  *     store, so (restart → drained) ≈ restore latency + one small
  *     batch;
  *  3. repeat per state-store provider — the file-backed default
  *     (HDFSBackedStateStoreProvider) vs RocksDB — and, as the
  *     bounded-state contrast, the KMV sketch twin
  *     ([[graft.streaming.StreamOps.dailyDistinctKmvStream]], 32
  *     event-time days → 32 state keys regardless of record count).
  *
  * Prints one STATERECOVERY line per (path, provider): build-drain
  * seconds, checkpoint state bytes on disk, restart-to-drained
  * seconds for the tail. Numbers land in SCALE.md beside the
  * throughput table.
  */
object StateRecoveryBench {
  private val Records = sys.env.getOrElse("SPARK_GRAFT_SRB_RECORDS", "1000000").toInt
  private val TailRecords = 10000
  private val Shards = 8

  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    KinesisRegistry.clients.put("srb", new FakeKinesisClient())

    val payload = ("x" * 64).getBytes
    var streamNo = 0
    def freshStream(): String = {
      streamNo += 1
      val name = s"srb$streamNo"
      FakeKinesisService.createStream(name, Shards)
      name
    }
    def push(name: String, n: Int, keyOffset: Int): Unit = {
      var i = 0
      while (i < n) {
        // distinct partition keys -> distinct EWMA state keys
        FakeKinesisService.push(name, f"shardId-${i % Shards}%012d",
          (keyOffset + i).toString, payload)
        i += 1
      }
    }

    def source(name: String) = spark.readStream.format("kinesis-graft")
      .option("streamName", name)
      .option("clientName", "srb")
      .option("maxRecordsPerFetch", "50000")
      .load()

    // (ts, user_id, event_id, value) for ewmaStream; value derived
    // in-plan so the fixture needs no payload decode.
    def ewmaInput(name: String): DataFrame =
      graft.streaming.StreamOps.ewmaStream(
        source(name).select(
          col("approximateArrivalTimestamp").as("ts"),
          col("partitionKey").cast("long").as("user_id"),
          col("sequenceNumber").cast("long").as("event_id"),
          (pmod(xxhash64(col("partitionKey")), lit(1000)) / 100.0).as("value")),
        alpha = 0.2)

    def kmvInput(name: String): DataFrame =
      graft.streaming.StreamOps.dailyDistinctKmvStream(
        source(name).select(
          expr("timestampadd(DAY, CAST(pmod(xxhash64(partitionKey), 32) AS INT), " +
            "approximateArrivalTimestamp)").as("ts"),
          col("partitionKey").as("user_id")))

    def dirSize(p: Path): Long = {
      if (!Files.exists(p)) return 0L
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }

    def drain(df: DataFrame, ckpt: String, tag: String): Double = {
      val t0 = System.nanoTime()
      // foreachBatch sink: the memory sink refuses to RECOVER from an
      // existing checkpoint, and recovery is the whole measurement
      val q = df.writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) => { b.write.format("noop").mode("overwrite").save(); () })
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      // 600 s covers the 1M default; the 10M-key run (r13 item 6)
      // needs build time proportional to records
      require(q.awaitTermination(math.max(600000L, Records * 2L)),
        s"$tag did not drain")
      (System.nanoTime() - t0) / 1e9
    }

    def scenario(label: String, mk: String => DataFrame, provider: String): Unit = {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      val name = freshStream()
      push(name, Records, 0)
      val ckpt = Files.createTempDirectory(s"srb_$label").toString
      val buildSec = drain(mk(name), ckpt, s"srb_b_$streamNo")
      val stateBytes = dirSize(java.nio.file.Paths.get(ckpt, "state"))
      // tail: NEW records only; the restart must restore the full
      // store before its first (small) batch commits
      push(name, TailRecords, Records)
      val restartSec = drain(mk(name), ckpt, s"srb_r_$streamNo")
      println(f"STATERECOVERY path=$label%-9s provider=${provider.split('.').last}%-32s " +
        f"records=$Records build_sec=$buildSec%.2f state_mb=${stateBytes / 1e6}%.1f " +
        f"tail=$TailRecords restart_sec=$restartSec%.2f")
    }

    val FileProvider =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val RocksProvider =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

    // scenario filter for the big-cardinality runs (r13 VERDICT item
    // 6: 10M keys on RocksDB) — running all four at 10M records would
    // mostly measure the in-memory fixture service, not the store
    val only = sys.env.get("SPARK_GRAFT_SRB_SCENARIOS")
      .map(_.split(",").map(_.trim).toSet)
    def want(k: String): Boolean = only.forall(_.contains(k))
    if (want("ewma_file")) scenario("ewma", ewmaInput, FileProvider)
    if (want("ewma_rocks")) scenario("ewma", ewmaInput, RocksProvider)
    if (want("kmv32_file")) scenario("kmv32", kmvInput, FileProvider)
    if (want("kmv32_rocks")) scenario("kmv32", kmvInput, RocksProvider)

    spark.stop()
  }
}
