package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.streaming.Trigger

import graft.sources.kinesis.{FakeKinesisClient, FakeKinesisService, KinesisRegistry}

/** Record-to-commit latency percentiles for the streaming path (r15
  * VERDICT item 7) — completes the production envelope next to
  * StreamBench's throughput numbers: StreamBench answers "how fast
  * does it drain", this answers "how long does one record sit between
  * arrival and being durably processed" under ProcessingTime triggers
  * at several trigger intervals.
  *
  * Protocol: a producer thread pushes records at a steady rate
  * (SPARK_GRAFT_LAT_RATE rec/s, default 2000) across 4 shards, each
  * payload carrying its produce time (epoch millis). The query runs
  * kinesis-graft source → foreachBatch; the batch handler stamps NOW
  * after the batch's work (a noop-equivalent count) and records
  * (now − produce_ts) per record — i.e. latency up to the point the
  * sink work is done; Spark's offset commit follows immediately
  * after foreachBatch returns, so this is a lower bound within one
  * WAL write of true commit latency (the WAL write is measured
  * separately as the inter-batch gap). First WARMUP_S seconds are
  * discarded (stream catch-up + JIT), then MEASURE_S seconds are
  * kept; prints one LATENCY line per trigger interval with
  * p50/p95/p99/max in ms and the observed batch count.
  *
  * The reference consumer has the same two knobs — poll interval
  * (kinesis.go:172, default 10 s) and GetRecords limit
  * (kinesis.go:182) — so its per-record latency floor is half the
  * poll interval on average, 10 s worst-case; the numbers here show
  * what Structured Streaming's micro-batch machinery adds on top of
  * the equivalent trigger.
  */
object StreamLatencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR", defaultCpus = "8")
    KinesisRegistry.clients.put("lat", new FakeKinesisClient())

    val rate = sys.env.getOrElse("SPARK_GRAFT_LAT_RATE", "2000").toInt
    val warmupS = sys.env.getOrElse("SPARK_GRAFT_LAT_WARMUP", "10").toInt
    val measureS = sys.env.getOrElse("SPARK_GRAFT_LAT_MEASURE", "30").toInt
    val triggers = sys.env.getOrElse("SPARK_GRAFT_LAT_TRIGGERS", "100,500,1000")
      .split(",").map(_.trim.toLong).toSeq
    val Shards = 4

    println(s"rate=$rate rec/s, warmup=${warmupS}s, measure=${measureS}s, shards=$Shards")
    triggers.foreach { triggerMs =>
      val stream = s"lat$triggerMs"
      FakeKinesisService.createStream(stream, Shards)

      // steady producer: batches of rate/100 every 10ms
      val stop = new AtomicBoolean(false)
      val producer = new Thread(() => {
        val perTick = math.max(1, rate / 100)
        var i = 0
        while (!stop.get()) {
          val t0 = System.nanoTime()
          val ts = System.currentTimeMillis()
          val payload = ts.toString.getBytes
          var j = 0
          while (j < perTick) {
            FakeKinesisService.push(stream, f"shardId-${i % Shards}%012d",
              s"pk${i % 997}", payload)
            i += 1; j += 1
          }
          val spent = (System.nanoTime() - t0) / 1000000L
          if (spent < 10) Thread.sleep(10 - spent)
        }
      }, s"producer-$stream")
      producer.setDaemon(true)

      val lats = new ConcurrentLinkedQueue[Long]()
      val batchGaps = new ConcurrentLinkedQueue[Long]()
      @volatile var lastCommitNs = 0L
      @volatile var measuring = false

      val df = spark.readStream.format("kinesis-graft")
        .option("streamName", stream)
        .option("clientName", "lat")
        .option("maxRecordsPerFetch", (rate * 2).toString)
        .load()
      val q = df.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // the batch's sink work: materialize every payload
          val rows = b.select("data").collect()
          val now = System.currentTimeMillis()
          val nowNs = System.nanoTime()
          if (measuring) {
            if (lastCommitNs != 0L) batchGaps.add((nowNs - lastCommitNs) / 1000000L)
            rows.foreach { r =>
              val ts = new String(r.getAs[Array[Byte]](0)).toLong
              lats.add(now - ts)
            }
          }
          lastCommitNs = nowNs
        }
        .trigger(Trigger.ProcessingTime(triggerMs))
        .start()

      producer.start()
      Thread.sleep(warmupS * 1000L)
      measuring = true
      Thread.sleep(measureS * 1000L)
      measuring = false
      stop.set(true)
      q.stop(); q.awaitTermination(60000)

      val xs = lats.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      def pct(p: Double): Long =
        if (xs.isEmpty) -1 else xs(math.min(xs.length - 1, (xs.length * p).toInt))
      val gaps = batchGaps.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      def gpct(p: Double): Long =
        if (gaps.isEmpty) -1 else gaps(math.min(gaps.length - 1, (gaps.length * p).toInt))
      println(s"LATENCY trigger=${triggerMs}ms records=${xs.length} " +
        s"batches=${gaps.length + 1} " +
        s"p50=${pct(0.5)}ms p95=${pct(0.95)}ms p99=${pct(0.99)}ms max=${xs.lastOption.getOrElse(-1L)}ms " +
        s"batch_gap_p50=${gpct(0.5)}ms batch_gap_p99=${gpct(0.99)}ms")
    }
    spark.stop()
  }
}
