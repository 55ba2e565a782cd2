package graft.streaming

import scala.concurrent.duration._

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.LongAccumulator

/** Connection/config options — mirror of the reference's `Option`
  * builder (option.go:10-34): stream name, region, STS toggle.
  */
case class GraftOption(streamName: String = "", region: String = "", sts: Boolean = false) {
  def withStreamName(n: String): GraftOption = copy(streamName = n) // option.go:27-30
  def withRegion(r: String): GraftOption = copy(region = r)         // option.go:22-25
  def withSts(b: Boolean): GraftOption = copy(sts = b)              // option.go:17-20
}

/** What to do when the user handler throws — SURVEY.md §2.1: the
  * reference logs and *continues past* a failing record, advancing the
  * checkpoint anyway (kinesis.go:194-201). That is weaker than Spark's
  * default (fail the query), so the policy is explicit here.
  */
sealed trait ErrorPolicy
object ErrorPolicy {
  /** Reference behavior: count + log, keep going (kinesis.go:194-197). */
  case object SkipAndLog extends ErrorPolicy
  /** Spark-native behavior: task failure → query failure. */
  case object Fail extends ErrorPolicy
}

/** The consumer facade — the Spark re-expression of the reference's
  * `Iterator` lifecycle (`NewIteratorWithOpt → Handle → SetSaver →
  * SetSleepLimit → Run → Shutdown`, kinesis.go:252-263, 143-154,
  * 242-250, 221-236; usage in README.md:33-59).
  *
  * Built on Structured Streaming: the poll ticker (kinesis.go:172-179)
  * is `Trigger.ProcessingTime(sleepLimit)`; the goroutine-per-shard
  * loop (kinesis.go:131-139) is the per-partition task; per-shard
  * in-order delivery (kinesis.go:173-212) is reproduced by
  * repartition-by-shard + sort-within-partition; batch-granularity
  * checkpointing (kinesis.go:198-201) is the per-batch saver write of
  * each shard's max sequence.
  *
  * Run it on any streaming DataFrame with the [[KinesisRecord.schema]]
  * envelope — the DSv2 source (graft.sources), a file-replay stream,
  * or a MemoryStream in tests.
  */
class GraftConsumer(val option: GraftOption) {

  private var sleep: FiniteDuration = 10.seconds // default, kinesis.go:257
  private var saverOpt: Option[SequenceSaver] = None
  private var handlerOpt: Option[KinesisRecord => Unit] = None
  private var policy: ErrorPolicy = ErrorPolicy.SkipAndLog
  private var checkpointLoc: Option[String] = None
  private var onErrorOpt: Option[(KinesisRecord, Throwable) => Unit] = None
  @volatile private var queryOpt: Option[StreamingQuery] = None
  @volatile private var errorsAcc: LongAccumulator = _

  /** ≈ SetSleepLimit (kinesis.go:247-250). */
  def sleepLimit(d: FiniteDuration): this.type = { sleep = d; this }
  /** Backfill mode: drain everything available at start, then stop
    * (Trigger.AvailableNow) — batches still honor the admission cap.
    * Beyond the reference's surface (its loop only tails forever).
    */
  def availableNow(): this.type = { availNow = true; this }
  private var availNow = false
  /** ≈ Handle (kinesis.go:143-145). */
  def handle(h: KinesisRecord => Unit): this.type = { handlerOpt = Some(h); this }
  /** ≈ SetSaver (kinesis.go:242-245). */
  def setSaver(s: SequenceSaver): this.type = { saverOpt = Some(s); this }
  def errorPolicy(p: ErrorPolicy): this.type = { policy = p; this }
  /** Dead-letter hook under SkipAndLog: sees each skipped record and
    * its error (e.g. route to a DLQ sink). Runs on executors — must be
    * serializable; its own failures are swallowed so it cannot block
    * progress (the property SkipAndLog exists to guarantee).
    */
  def onError(f: (KinesisRecord, Throwable) => Unit): this.type = { onErrorOpt = Some(f); this }
  def checkpointLocation(path: String): this.type = { checkpointLoc = Some(path); this }

  /** Handler errors skipped so far (only counts under SkipAndLog) —
    * the observability the reference only gets via its Logger
    * (kinesis.go:195-196).
    */
  def errorCount: Long = Option(errorsAcc).map(_.value.longValue()).getOrElse(0L)

  def query: Option[StreamingQuery] = queryOpt

  /** Build the kinesis-graft streaming source for this consumer's
    * options: streamName AND region/sts all reach the DSv2 client
    * factory (option.go:36-43 feeding NewClient, kinesis.go:45-52 — a
    * [[graft.sources.kinesis.ConfigurableKinesisClient]] receives them
    * via `configure` before first use).
    */
  def source(spark: org.apache.spark.sql.SparkSession,
      extra: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.readStream.format("kinesis-graft")
      .option("streamName", option.streamName)
      .option("region", option.region)
      .option("sts", option.sts.toString)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  /** ≈ Run() with no arguments (kinesis.go:147-154): builds the
    * kinesis-graft source from this consumer's own options and starts
    * consuming — the closest shape to the reference's
    * `NewIteratorWithOpt(opt).Handle(h).Run()` usage (README.md:33-59).
    * `extra` passes source options (clientName/clientClass, saverName,
    * maxRecordsPerFetch).
    */
  def start(spark: org.apache.spark.sql.SparkSession,
      extra: Map[String, String] = Map.empty): StreamingQuery =
    run(source(spark, extra))

  /** ≈ Run (kinesis.go:147-154): validates the handler (the reference
    * errors with HandlerIsNil, kinesis.go:148-150) and starts the
    * streaming query.
    */
  def run(stream: DataFrame): StreamingQuery = {
    val h = handlerOpt.getOrElse(
      throw new IllegalStateException("handler is nil")) // kinesis.go:148-150
    val spark = stream.sparkSession
    val acc = spark.sparkContext.longAccumulator("graft.handler.errors")
    errorsAcc = acc
    val pol = policy
    val saver = saverOpt
    val onErr = onErrorOpt
    val streamName = option.streamName

    import spark.implicits._
    val runBatch: DataFrame => Unit = { batch =>
      val ds: Dataset[KinesisRecord] = batch
        .select(KinesisRecord.schema.fieldNames.map(col).toSeq: _*)
        .as[KinesisRecord]
      // Per-shard order: hash all of a shard's records into one
      // partition, sort by sequence inside it (kinesis.go:173-212
      // guarantees the same via one goroutine per shard).
      ds.repartition(col("shardId"))
        .sortWithinPartitions(col("shardId"), length(col("sequenceNumber")), col("sequenceNumber"))
        .foreachPartition { (it: Iterator[KinesisRecord]) =>
          it.foreach { rec =>
            try h(rec)
            catch {
              case e: Throwable => pol match {
                case ErrorPolicy.SkipAndLog => // kinesis.go:194-197
                  acc.add(1)
                  onErr.foreach(f => try f(rec, e) catch { case _: Throwable => () })
                case ErrorPolicy.Fail => throw e
              }
            }
          }
        }
      // Batch-granularity checkpoint (kinesis.go:198-201): one write
      // per shard with the batch's last sequence. (length, value)
      // ordering = numeric order for digit-string sequences.
      saver.foreach { sv =>
        batch.groupBy("streamName", "shardId")
          .agg(max(struct(length(col("sequenceNumber")).as("l"),
            col("sequenceNumber").as("s"))).as("m"))
          .select(col("streamName"), col("shardId"), col("m.s").as("seq"))
          .collect()
          .foreach(r => sv.set(r.getString(0), r.getString(1), r.getString(2)))
      }
    }
    val writer = stream.writeStream
      .queryName(s"graft-consumer-$streamName")
      .trigger(if (availNow) Trigger.AvailableNow() else Trigger.ProcessingTime(sleep.toMillis))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Two actions follow (handler pass + checkpoint aggregation):
        // persist so the micro-batch is fetched from the source once,
        // not re-planned per action (a real service would otherwise
        // see double the GetRecords traffic).
        batch.persist()
        try runBatch(batch)
        finally batch.unpersist()
      }
    checkpointLoc.foreach(writer.option("checkpointLocation", _))
    val q = writer.start()
    queryOpt = Some(q)
    q
  }

  /** ≈ Shutdown(timeout) (kinesis.go:221-236): stop, then wait up to
    * `timeout`. Returns true on clean termination, false if the wait
    * timed out (the reference returns an error in that case).
    */
  def shutdown(timeout: FiniteDuration): Boolean = queryOpt match {
    case None => true
    case Some(q) =>
      q.stop()
      try q.awaitTermination(timeout.toMillis)
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
  }
}

object GraftConsumer {
  /** ≈ NewIteratorWithOpt (kinesis.go:252-263). */
  def apply(option: GraftOption): GraftConsumer = new GraftConsumer(option)
}
