package graft.tools

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession

import graft.streaming.{ErrorPolicy, GraftConsumer, GraftOption, InMemorySequenceSaver, RetryingSaver, SequenceSaver}
import graft.sources.kinesis.{FakeKinesisClient, FakeKinesisService, KinesisRegistry}

/** Consumer SOAK (r12 VERDICT item 8): a compressed-clock long-run of
  * [[GraftConsumer]] — the batch count of a 30-minute production tail
  * (10 s triggers ≈ 180+ batches) compressed to 100 ms triggers —
  * under continuous load with PERIODIC RESHARDS and INJECTED FAILURES,
  * asserting at the end what a long-lived deploy needs:
  *
  *  - delivery: every pushed record handled EXACTLY once (the
  *    concurrent seen-set also catches duplicates), across every
  *    split/merge generation (O9);
  *  - checkpoint progress: per-(stream, shard) saver sequences are
  *    MONOTONE — no write ever regresses a shard's checkpoint — while
  *    the saver injects transient faults every Nth set that
  *    [[RetryingSaver]] must ride out (O6), and the handler itself
  *    fails every Mth record under SkipAndLog (O4);
  *  - stability: used heap (after System.gc()) sampled across the run
  *    must not trend upward beyond slack — the artifact/listener-leak
  *    canary — and the shard count grows with each reshard generation
  *    while spark.streams.active stays at exactly 1;
  *  - shutdown: graceful within timeout (O12).
  *
  * Prints SOAK lines (per-phase + final verdict); numbers land in
  * SCALE.md. Env knobs: SPARK_GRAFT_SOAK_BATCHES (default 200),
  * SPARK_GRAFT_SOAK_RPB records/batch-tick (default 500).
  */
object SoakConsumer {

  /** Saver wrapper: injects a transient failure every Nth set() (the
    * retry must absorb it) and asserts monotone per-shard sequences
    * on the writes that land.
    */
  private class FlakyMonotoneSaver(underlying: SequenceSaver, failEvery: Int)
      extends SequenceSaver {
    val sets = new AtomicLong(0)
    val injected = new AtomicLong(0)
    val regressions = new AtomicLong(0)
    private val last = new ConcurrentHashMap[(String, String), String]()
    private def numLe(a: String, b: String): Boolean =
      a.length < b.length || (a.length == b.length && a <= b)
    override def get(s: String, sh: String): Option[String] = underlying.get(s, sh)
    override def set(s: String, sh: String, seq: String): Unit = {
      if (sets.incrementAndGet() % failEvery == 0) {
        injected.incrementAndGet()
        throw new RuntimeException(s"soak: injected saver fault #${injected.get}")
      }
      last.compute((s, sh), (_, prev) => {
        if (prev != null && !numLe(prev, seq)) regressions.incrementAndGet()
        seq
      })
      underlying.set(s, sh, seq)
    }
    override def del(s: String, sh: String): Unit = underlying.del(s, sh)
    def shardsSeen: Int = last.size
  }

  // handler-side counters (local[…]: executors share the JVM). The
  // seen-set stores 64-bit hashes of the (unique, fake-service-issued)
  // sequence strings, not the strings — the harness's own memory
  // footprint must stay small enough not to pollute the heap canary.
  private val handled = new AtomicLong(0)
  private val dupes = new AtomicLong(0)
  private val seen = ConcurrentHashMap.newKeySet[Long]()
  private def seqHash(s: String): Long = {
    // FNV-1a 64; sequences are distinct zero-padded digit strings, so
    // collisions at ~10^6 scale are ~1e-7 — and a collision would only
    // FALSE-FAIL (as a duplicate), never hide a real dupe
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  def main(args: Array[String]): Unit = {
    val batches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "200").toInt
    val rpb = sys.env.getOrElse("SPARK_GRAFT_SOAK_RPB", "500").toInt
    val spark = ProbeSession(logLevel = "ERROR", defaultCpus = "8")

    val stream = "soak"
    val client = new FakeKinesisClient()
    KinesisRegistry.clients.put("soak", client)
    FakeKinesisService.createStream(stream, 4)

    val inner = new InMemorySequenceSaver
    val flaky = new FlakyMonotoneSaver(inner, failEvery = 7)
    val saver = new RetryingSaver(flaky, retries = 3)

    val payload = ("s" * 64).getBytes
    val pushed = new AtomicLong(0)
    @volatile var producing = true
    @volatile var reshards = 0
    @volatile var lastSplitChildren: Option[(String, String)] = None

    // producer thread: each tick pushes rpb records round-robin over
    // the OPEN shards of the CURRENT generation; every 25 ticks
    // reshards (alternating split / merge-of-last-split)
    // bound total volume so the tail drain stays proportionate to the
    // batch target (the soak signal is batches × reshards × faults,
    // not raw record count)
    val pushCap = batches.toLong * rpb * 10
    val producer = new Thread(() => {
      var tick = 0
      while (producing && pushed.get < pushCap) {
        val open = client.listShards(stream).filter(!_.closed)
        var i = 0
        while (i < rpb && producing) {
          val sh = open((i + tick) % open.size)
          FakeKinesisService.push(stream, sh.shardId,
            s"pk${pushed.get % 1013}", payload)
          pushed.incrementAndGet()
          i += 1
        }
        tick += 1
        if (tick % 25 == 0) {
          // reshard storm beat: split an open shard, or merge the two
          // children of the previous split (keeps adjacency valid)
          lastSplitChildren match {
            case Some((a, b)) if tick % 50 == 0 =>
              FakeKinesisService.mergeShards(stream, a, b)
              lastSplitChildren = None
              reshards += 1
            case _ =>
              val victim = client.listShards(stream).filter(!_.closed).head
              lastSplitChildren = Some(FakeKinesisService.splitShard(stream, victim.shardId))
              reshards += 1
          }
        }
        Thread.sleep(20)
      }
    }, "soak-producer")

    val consumer = GraftConsumer(GraftOption().withStreamName(stream))
      .sleepLimit(100.millis)
      .errorPolicy(ErrorPolicy.SkipAndLog)
      .setSaver(saver)
      .handle { rec =>
        if (!seen.add(seqHash(rec.sequenceNumber))) dupes.incrementAndGet()
        handled.incrementAndGet()
        // O4 soak: every 997th record's handler throws (skip-and-log)
        if (handled.get % 997 == 0)
          throw new RuntimeException("soak: injected handler fault")
      }

    def usedHeapMb(): Double = {
      System.gc(); Thread.sleep(100); System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / 1e6
    }

    val heap0 = usedHeapMb()
    println(f"SOAK start heap_mb=$heap0%.0f target_batches=$batches")
    val t0 = System.nanoTime()
    producer.start()
    val q = consumer.start(spark, Map(
      "clientName" -> "soak", "maxRecordsPerFetch" -> "2000"))

    val heapSamples = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    while (q.isActive && progressCount(q) < batches) {
      Thread.sleep(1000)
      val n = progressCount(q)
      if (heapSamples.isEmpty || n >= heapSamples.last._1 + 25) {
        val h = usedHeapMb()
        heapSamples += ((n, h))
        println(f"SOAK tick batches=$n pushed=${pushed.get} handled=${handled.get} " +
          f"reshards=$reshards shards=${client.listShards(stream).size} heap_mb=$h%.0f " +
          f"saver_sets=${flaky.sets.get} saver_faults=${flaky.injected.get} " +
          f"handler_errors=${consumer.errorCount}")
      }
    }
    if (!q.isActive)
      sys.error(s"SOAK query died mid-run: ${q.exception}")

    // stop producing, let the consumer drain the tail, then shut down
    producing = false
    producer.join()
    Thread.sleep(3000)
    var stable = 0
    while (stable < 3) { // drained = handled stops moving for 3 s
      val before = handled.get
      Thread.sleep(1000)
      if (handled.get == before) stable += 1 else stable = 0
    }
    val cleanStop = consumer.shutdown(60.seconds)
    val wallSec = (System.nanoTime() - t0) / 1e9
    val heap1 = usedHeapMb()

    val totalBatches = progressCount(q)
    val lost = pushed.get - seen.size
    println(f"SOAK done batches=$totalBatches wall_sec=$wallSec%.1f " +
      f"pushed=${pushed.get} handled=${handled.get} distinct=${seen.size} " +
      f"dupes=${dupes.get} lost=$lost reshards=$reshards " +
      f"final_shards=${client.listShards(stream).size} " +
      f"saver_sets=${flaky.sets.get} saver_faults_injected=${flaky.injected.get} " +
      f"saver_regressions=${flaky.regressions.get} shards_checkpointed=${flaky.shardsSeen} " +
      f"handler_errors=${consumer.errorCount} " +
      f"heap_mb_start=$heap0%.0f heap_mb_end=$heap1%.0f clean_shutdown=$cleanStop")

    def check(name: String, ok: Boolean): Unit =
      println(s"SOAK check $name: ${if (ok) "PASS" else "FAIL"}")
    check("exactly_once_delivery", lost == 0 && dupes.get == 0)
    check("monotone_checkpoints", flaky.regressions.get == 0)
    check("saver_faults_ridden_out", flaky.injected.get > 0)
    check("handler_faults_skipped", consumer.errorCount > 0)
    check("reshards_survived", reshards >= 5)
    // heap bound: fixed slack + the harness's own seen-set (~48 B per
    // boxed-Long CHM entry) — growth beyond that is an engine leak
    val heapBound = 300.0 + seen.size * 64e-6
    check("heap_stable", heap1 - heap0 < heapBound)
    check("clean_shutdown", cleanStop)
    val failed = Seq(lost == 0 && dupes.get == 0, flaky.regressions.get == 0,
      flaky.injected.get > 0, consumer.errorCount > 0, reshards >= 5,
      heap1 - heap0 < heapBound, cleanStop).count(!_)
    println(s"SOAK verdict: ${if (failed == 0) "ALL PASS" else s"$failed FAILED"}")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  private def progressCount(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    // lastProgress batchId is the monotone batch counter (recentProgress
    // is a bounded ring, its length saturates)
    Option(q.lastProgress).map(_.batchId).getOrElse(-1L) + 1
}
