// API-shaped stub of the AWS SDK for Java v2 Kinesis surface, for
// testing graft.sources.kinesis.AwsKinesisClient's reflective binding
// in this offline build. Class/method names and shapes mirror the
// PUBLIC SDK v2 API (software.amazon.awssdk:kinesis) — the same API the
// Go reference drives via aws-sdk-go-v2 (kinesis.go:45-52) — and the
// behavior delegates to FakeKinesisService, so the adapter is exercised
// end-to-end: builder chains, ListShards pagination, response mapping,
// expired-iterator translation, and throughput backoff. Scala objects
// emit static forwarders, which is exactly what the adapter's
// Class.forName + static-method reflection resolves.
//
// Test-only: nothing in src/main references these classes.

package software.amazon.awssdk.core {
  class SdkBytes private (private val bytes: Array[Byte]) {
    def asByteArray(): Array[Byte] = bytes
  }
  object SdkBytes {
    def fromByteArray(b: Array[Byte]): SdkBytes = new SdkBytes(b.clone())
  }
}

package software.amazon.awssdk.regions {
  class Region private (val id: String) { override def toString: String = id }
  object Region { def of(s: String): Region = new Region(s) }
}

package software.amazon.awssdk.auth.credentials {
  class ProfileCredentialsProvider private (val profile: String)
  object ProfileCredentialsProvider {
    def create(profile: String): ProfileCredentialsProvider =
      new ProfileCredentialsProvider(profile)
  }
}

package software.amazon.awssdk.services.kinesis {

  import java.util.concurrent.atomic.AtomicInteger

  import software.amazon.awssdk.core.SdkBytes
  import graft.sources.kinesis.{FakeKinesisClient, FakeKinesisService}

  /** Static knobs + counters the spec flips per scenario. */
  object StubSdk {
    val builds = new AtomicInteger(0)
    /** >0: next N getRecords calls throw ProvisionedThroughputExceededException. */
    val throttleNext = new AtomicInteger(0)
    /** Passed to the backing FakeKinesisClient (expire every Nth getRecords). */
    @volatile var expireEvery: Int = 0
    /** ListShards page size (exercises nextToken pagination). */
    @volatile var listShardsPageSize: Int = 2
    /** >0: the next putRecords call fails its first N entries with a
      * per-record throttle code (partial failure, AWS semantics) —
      * consumed by that one call.
      */
    val failFirstEntriesNext = new AtomicInteger(0)
    /** RPC counter for batch-shape assertions. */
    val putRecordsCalls = new AtomicInteger(0)
    def reset(): Unit = {
      builds.set(0); throttleNext.set(0); expireEvery = 0; listShardsPageSize = 2
      failFirstEntriesNext.set(0); putRecordsCalls.set(0)
    }
  }

  object KinesisClient {
    def builder(): KinesisClientBuilder = new KinesisClientBuilder
  }

  final class KinesisClientBuilder {
    var regionId: String = _
    var endpoint: java.net.URI = _
    var creds: AnyRef = _
    def region(r: software.amazon.awssdk.regions.Region): KinesisClientBuilder = {
      regionId = r.id; this
    }
    def endpointOverride(u: java.net.URI): KinesisClientBuilder = { endpoint = u; this }
    def credentialsProvider(p: AnyRef): KinesisClientBuilder = { creds = p; this }
    def build(): StubKinesisClient = {
      StubSdk.builds.incrementAndGet()
      new StubKinesisClient(Option(regionId), Option(endpoint), Option(creds))
    }
  }

  /** The SDK-shaped client; RPC behavior comes from FakeKinesisService
    * through a FakeKinesisClient (so iterator tokens, closed-drain and
    * reshard semantics match the rest of the test suite).
    */
  final class StubKinesisClient(
      val region: Option[String],
      val endpoint: Option[java.net.URI],
      val creds: Option[AnyRef]) {
    import model._

    private def fake = new FakeKinesisClient(StubSdk.expireEvery)

    def listShards(req: ListShardsRequest): ListShardsResponse = {
      val (stream, from) =
        if (req.nextTokenV != null) {
          val Array(s, o) = req.nextTokenV.split('@'); (s, o.toInt)
        } else (req.streamNameV, 0)
      val all = fake.listShards(stream)
      val page = all.slice(from, from + StubSdk.listShardsPageSize)
      val next =
        if (from + StubSdk.listShardsPageSize < all.size)
          s"$stream@${from + StubSdk.listShardsPageSize}"
        else null
      new ListShardsResponse(page.map { s =>
        new Shard(s.shardId, s.parentShardId.orNull,
          new SequenceNumberRange(if (s.closed) "999" else null),
          s.adjacentParentShardId.orNull)
      }, next)
    }

    def describeStreamSummary(req: DescribeStreamSummaryRequest): DescribeStreamSummaryResponse =
      new DescribeStreamSummaryResponse(
        new StreamDescriptionSummary(fake.streamStatus(req.streamNameV)))

    def getShardIterator(req: GetShardIteratorRequest): GetShardIteratorResponse = {
      val after = req.shardIteratorTypeV match {
        case "TRIM_HORIZON" => None
        case "AFTER_SEQUENCE_NUMBER" => Some(req.startingSequenceNumberV)
        case t => throw new IllegalArgumentException(s"stub: unsupported iterator type $t")
      }
      new GetShardIteratorResponse(
        fake.getShardIterator(req.streamNameV, req.shardIdV, after))
    }

    def getRecords(req: GetRecordsRequest): GetRecordsResponse = {
      if (StubSdk.throttleNext.getAndUpdate(n => math.max(0, n - 1)) > 0)
        throw new ProvisionedThroughputExceededException("stub throttle")
      val res =
        try fake.getRecords(req.shardIteratorV, req.limitV)
        catch {
          case e: graft.sources.kinesis.ExpiredIteratorException =>
            throw new ExpiredIteratorException(e.getMessage)
        }
      new GetRecordsResponse(
        res.records.map(r => new Record(SdkBytes.fromByteArray(r.data),
          r.partitionKey, r.sequenceNumber, r.arrival.toInstant)),
        res.nextIterator.orNull,
        if (res.records.isEmpty) 0L else 1L)
    }

    def putRecord(req: PutRecordRequest): PutRecordResponse =
      new PutRecordResponse(
        fake.putRecord(req.streamNameV, req.partitionKeyV, req.dataV.asByteArray()))

    def putRecords(req: PutRecordsRequest): PutRecordsResponse = {
      StubSdk.putRecordsCalls.incrementAndGet()
      val nFail = StubSdk.failFirstEntriesNext.getAndSet(0)
      val out = new java.util.ArrayList[PutRecordsResultEntry]()
      var i = 0
      req.recordsV.forEach { e =>
        if (i < nFail)
          out.add(new PutRecordsResultEntry(null,
            "ProvisionedThroughputExceededException"))
        else
          out.add(new PutRecordsResultEntry(
            fake.putRecord(req.streamNameV, e.partitionKeyV,
              e.dataV.asByteArray()), null))
        i += 1
      }
      new PutRecordsResponse(out)
    }
  }
}

package software.amazon.awssdk.services.kinesis.model {

  import software.amazon.awssdk.core.SdkBytes

  class ExpiredIteratorException(msg: String) extends RuntimeException(msg)
  class ProvisionedThroughputExceededException(msg: String) extends RuntimeException(msg)

  // ---- requests (builder-pattern, like the SDK) ----

  final class ListShardsRequest(val streamNameV: String, val nextTokenV: String)
  object ListShardsRequest { def builder(): B = new B
    final class B {
      private var s: String = _; private var t: String = _
      def streamName(v: String): B = { s = v; this }
      def nextToken(v: String): B = { t = v; this }
      def build(): ListShardsRequest = new ListShardsRequest(s, t)
    }
  }

  final class DescribeStreamSummaryRequest(val streamNameV: String)
  object DescribeStreamSummaryRequest { def builder(): B = new B
    final class B {
      private var s: String = _
      def streamName(v: String): B = { s = v; this }
      def build(): DescribeStreamSummaryRequest = new DescribeStreamSummaryRequest(s)
    }
  }

  final class GetShardIteratorRequest(val streamNameV: String, val shardIdV: String,
      val shardIteratorTypeV: String, val startingSequenceNumberV: String)
  object GetShardIteratorRequest { def builder(): B = new B
    final class B {
      private var s: String = _; private var sh: String = _
      private var ty: String = _; private var seq: String = _
      def streamName(v: String): B = { s = v; this }
      def shardId(v: String): B = { sh = v; this }
      def shardIteratorType(v: String): B = { ty = v; this }
      def startingSequenceNumber(v: String): B = { seq = v; this }
      def build(): GetShardIteratorRequest = new GetShardIteratorRequest(s, sh, ty, seq)
    }
  }

  final class GetRecordsRequest(val shardIteratorV: String, val limitV: Int)
  object GetRecordsRequest { def builder(): B = new B
    final class B {
      private var it: String = _; private var lim: java.lang.Integer = 10000
      def shardIterator(v: String): B = { it = v; this }
      def limit(v: java.lang.Integer): B = { lim = v; this }
      def build(): GetRecordsRequest = new GetRecordsRequest(it, lim.intValue())
    }
  }

  final class PutRecordRequest(val streamNameV: String, val partitionKeyV: String,
      val dataV: SdkBytes)
  object PutRecordRequest { def builder(): B = new B
    final class B {
      private var s: String = _; private var k: String = _; private var d: SdkBytes = _
      def streamName(v: String): B = { s = v; this }
      def partitionKey(v: String): B = { k = v; this }
      def data(v: SdkBytes): B = { d = v; this }
      def build(): PutRecordRequest = new PutRecordRequest(s, k, d)
    }
  }

  // ---- responses ----

  final class SequenceNumberRange(ending: String) {
    def endingSequenceNumber(): String = ending
  }
  final class Shard(id: String, parent: String, range: SequenceNumberRange,
      adjacent: String = null) {
    def shardId(): String = id
    def parentShardId(): String = parent
    def sequenceNumberRange(): SequenceNumberRange = range
    def adjacentParentShardId(): String = adjacent
  }
  final class ListShardsResponse(sh: Seq[Shard], token: String) {
    def shards(): java.util.List[Shard] = {
      val l = new java.util.ArrayList[Shard](); sh.foreach(l.add); l
    }
    def nextToken(): String = token
  }

  final class StreamDescriptionSummary(status: String) {
    def streamStatusAsString(): String = status
  }
  final class DescribeStreamSummaryResponse(s: StreamDescriptionSummary) {
    def streamDescriptionSummary(): StreamDescriptionSummary = s
  }

  final class GetShardIteratorResponse(it: String) {
    def shardIterator(): String = it
  }

  final class Record(d: SdkBytes, pk: String, seq: String, ts: java.time.Instant) {
    def data(): SdkBytes = d
    def partitionKey(): String = pk
    def sequenceNumber(): String = seq
    def approximateArrivalTimestamp(): java.time.Instant = ts
  }
  final class GetRecordsResponse(rs: Seq[Record], next: String, behind: Long) {
    def records(): java.util.List[Record] = {
      val l = new java.util.ArrayList[Record](); rs.foreach(l.add); l
    }
    def nextShardIterator(): String = next
    def millisBehindLatest(): java.lang.Long = java.lang.Long.valueOf(behind)
  }

  final class PutRecordResponse(seq: String) {
    def sequenceNumber(): String = seq
  }

  final class PutRecordsRequestEntry(val partitionKeyV: String, val dataV: SdkBytes)
  object PutRecordsRequestEntry { def builder(): B = new B
    final class B {
      private var k: String = _; private var d: SdkBytes = _
      def partitionKey(v: String): B = { k = v; this }
      def data(v: SdkBytes): B = { d = v; this }
      def build(): PutRecordsRequestEntry = new PutRecordsRequestEntry(k, d)
    }
  }
  final class PutRecordsRequest(val streamNameV: String,
      val recordsV: java.util.List[PutRecordsRequestEntry])
  object PutRecordsRequest { def builder(): B = new B
    final class B {
      private var s: String = _
      private var rs: java.util.List[PutRecordsRequestEntry] = _
      def streamName(v: String): B = { s = v; this }
      def records(v: java.util.List[PutRecordsRequestEntry]): B = { rs = v; this }
      def build(): PutRecordsRequest = new PutRecordsRequest(s, rs)
    }
  }
  final class PutRecordsResultEntry(seq: String, err: String) {
    def sequenceNumber(): String = seq
    def errorCode(): String = err
  }
  final class PutRecordsResponse(rs: java.util.List[PutRecordsResultEntry]) {
    def records(): java.util.List[PutRecordsResultEntry] = rs
    def failedRecordCount(): java.lang.Integer = {
      var n = 0; rs.forEach(e => if (e.errorCode() != null) n += 1); Integer.valueOf(n)
    }
  }
}
