// SDK version-skew mutation matrix (r12 VERDICT item 5): five
// API-shaped stub packages, each a COMPLETE SDK surface with exactly
// one mutation class applied, so AwsKinesisClientSpec can assert that
// AwsKinesisClient.validate() reports the complete, minimal problem
// list per mutation — one renamed RPC must produce exactly one
// diagnostic, not a cascade, and a benign extra overload must produce
// none. Mutations modeled on what SDK minor versions actually do:
//
//   graft.skew.renamedrpc    — client RPC renamed (listShards → listShardsV2)
//   graft.skew.missingacc    — response accessor removed
//                              (Record.approximateArrivalTimestamp)
//   graft.skew.renamedsetter — builder setter renamed
//                              (GetRecordsRequest.builder().limit → recordLimit)
//   graft.skew.rettype       — accessor return type changed
//                              (millisBehindLatest(): Long → String)
//   graft.skew.extraoverload — EXTRA overloads added everywhere the
//                              adapter binds (benign: must validate clean)
//   graft.skew.multi         — two mutations at once (renamed RPC +
//                              missing accessor): both must be reported
//
// Shape-only: validate() resolves classes/builders/accessors and builds
// the client, but never invokes an RPC, so methods return null. The
// shared shapes live in graft.skew.base; each mutation package is a
// one-liner per class except its mutated member.

package graft.skew.base {

  // ---- request builders (name+arity is what validate checks) ----
  final class LsrB { def streamName(v: AnyRef): LsrB = this
    def nextToken(v: AnyRef): LsrB = this; def build(): AnyRef = "r" }
  final class DssrB { def streamName(v: AnyRef): DssrB = this
    def build(): AnyRef = "r" }
  final class GsiB { def streamName(v: AnyRef): GsiB = this
    def shardId(v: AnyRef): GsiB = this
    def shardIteratorType(v: AnyRef): GsiB = this
    def startingSequenceNumber(v: AnyRef): GsiB = this
    def build(): AnyRef = "r" }
  class GrrBNoLimit { def shardIterator(v: AnyRef): GrrBNoLimit = this
    def build(): AnyRef = "r" }
  final class GrrB extends GrrBNoLimit {
    def limit(v: java.lang.Integer): GrrB = this }
  /** The renamed-setter mutation: `limit` became `recordLimit`. */
  final class GrrBRenamed extends GrrBNoLimit {
    def recordLimit(v: java.lang.Integer): GrrBRenamed = this }
  /** The extra-overload variant: both the bound Integer form and a
    * hypothetical builder-consumer overload the adapter never calls.
    */
  final class GrrBOverload extends GrrBNoLimit {
    def limit(v: java.lang.Integer): GrrBOverload = this
    def limit(v: String): GrrBOverload = this }
  final class PrB { def streamName(v: AnyRef): PrB = this
    def partitionKey(v: AnyRef): PrB = this
    def data(v: AnyRef): PrB = this; def build(): AnyRef = "r" }
  final class PrreB { def partitionKey(v: AnyRef): PrreB = this
    def data(v: AnyRef): PrreB = this; def build(): AnyRef = "r" }
  final class PrsB { def streamName(v: AnyRef): PrsB = this
    def records(v: AnyRef): PrsB = this; def build(): AnyRef = "r" }

  // ---- client builder + RPC bodies ----
  final class ClientBuilder(result: AnyRef) {
    def region(v: AnyRef): ClientBuilder = this
    def endpointOverride(v: AnyRef): ClientBuilder = this
    def credentialsProvider(v: AnyRef): ClientBuilder = this
    def build(): AnyRef = result }
  /** The five RPCs no mutation touches. */
  trait Rpcs5 { def describeStreamSummary(r: AnyRef): AnyRef = null
    def getShardIterator(r: AnyRef): AnyRef = null
    def getRecords(r: AnyRef): AnyRef = null
    def putRecord(r: AnyRef): AnyRef = null
    def putRecords(r: AnyRef): AnyRef = null }
  class FullClient extends Rpcs5 { def listShards(r: AnyRef): AnyRef = null }

  // ---- response shapes, SDK-typed (validate checks return types).
  // Class names deliberately equal the SDK's so the declared return
  // types' SIMPLE names satisfy responseAccessorTypes from any
  // mutation package that extends these. ----
  class SequenceNumberRange { def endingSequenceNumber(): String = null }
  class Shard { def shardId(): String = null
    def parentShardId(): String = null
    def sequenceNumberRange(): SequenceNumberRange = null
    def adjacentParentShardId(): String = null }
  class ListShardsResponse { def shards(): java.util.List[AnyRef] = null
    def nextToken(): String = null }
  class StreamDescriptionSummary { def streamStatusAsString(): String = null }
  class DescribeStreamSummaryResponse {
    def streamDescriptionSummary(): StreamDescriptionSummary = null }
  class GetShardIteratorResponse { def shardIterator(): String = null }
  class RecordNoTs { def data(): software.amazon.awssdk.core.SdkBytes = null
    def partitionKey(): String = null
    def sequenceNumber(): String = null }
  class Record extends RecordNoTs {
    def approximateArrivalTimestamp(): java.time.Instant = null }
  class GetRecordsResponseNoMillis {
    def records(): java.util.List[AnyRef] = null
    def nextShardIterator(): String = null }
  class GetRecordsResponse extends GetRecordsResponseNoMillis {
    def millisBehindLatest(): java.lang.Long = null }
  /** The changed-return-type mutation. */
  class GetRecordsResponseStringMillis extends GetRecordsResponseNoMillis {
    def millisBehindLatest(): String = null }
  class PutRecordResponse { def sequenceNumber(): String = null }
  class PutRecordsResultEntry { def sequenceNumber(): String = null
    def errorCode(): String = null }
  class PutRecordsResponse { def records(): java.util.List[AnyRef] = null }
}

package graft.skew.renamedrpc {
  object KinesisClient { def builder(): graft.skew.base.ClientBuilder =
    new graft.skew.base.ClientBuilder(new Client) }
  /** The mutation: listShards renamed. */
  final class Client extends graft.skew.base.Rpcs5 {
    def listShardsV2(r: AnyRef): AnyRef = null }
  package model {
    import graft.skew.base
    object ListShardsRequest { def builder(): base.LsrB = new base.LsrB }
    object DescribeStreamSummaryRequest { def builder(): base.DssrB = new base.DssrB }
    object GetShardIteratorRequest { def builder(): base.GsiB = new base.GsiB }
    object GetRecordsRequest { def builder(): base.GrrB = new base.GrrB }
    object PutRecordRequest { def builder(): base.PrB = new base.PrB }
    object PutRecordsRequestEntry { def builder(): base.PrreB = new base.PrreB }
    object PutRecordsRequest { def builder(): base.PrsB = new base.PrsB }
    final class ListShardsResponse extends base.ListShardsResponse
    final class Shard extends base.Shard
    final class SequenceNumberRange extends base.SequenceNumberRange
    final class DescribeStreamSummaryResponse extends base.DescribeStreamSummaryResponse
    final class StreamDescriptionSummary extends base.StreamDescriptionSummary
    final class GetShardIteratorResponse extends base.GetShardIteratorResponse
    final class GetRecordsResponse extends base.GetRecordsResponse
    final class Record extends base.Record
    final class PutRecordResponse extends base.PutRecordResponse
    final class PutRecordsResponse extends base.PutRecordsResponse
    final class PutRecordsResultEntry extends base.PutRecordsResultEntry
  }
}

package graft.skew.missingacc {
  object KinesisClient { def builder(): graft.skew.base.ClientBuilder =
    new graft.skew.base.ClientBuilder(new Client) }
  final class Client extends graft.skew.base.FullClient
  package model {
    import graft.skew.base
    object ListShardsRequest { def builder(): base.LsrB = new base.LsrB }
    object DescribeStreamSummaryRequest { def builder(): base.DssrB = new base.DssrB }
    object GetShardIteratorRequest { def builder(): base.GsiB = new base.GsiB }
    object GetRecordsRequest { def builder(): base.GrrB = new base.GrrB }
    object PutRecordRequest { def builder(): base.PrB = new base.PrB }
    object PutRecordsRequestEntry { def builder(): base.PrreB = new base.PrreB }
    object PutRecordsRequest { def builder(): base.PrsB = new base.PrsB }
    final class ListShardsResponse extends base.ListShardsResponse
    final class Shard extends base.Shard
    final class SequenceNumberRange extends base.SequenceNumberRange
    final class DescribeStreamSummaryResponse extends base.DescribeStreamSummaryResponse
    final class StreamDescriptionSummary extends base.StreamDescriptionSummary
    final class GetShardIteratorResponse extends base.GetShardIteratorResponse
    final class GetRecordsResponse extends base.GetRecordsResponse
    /** The mutation: approximateArrivalTimestamp removed. */
    final class Record extends base.RecordNoTs
    final class PutRecordResponse extends base.PutRecordResponse
    final class PutRecordsResponse extends base.PutRecordsResponse
    final class PutRecordsResultEntry extends base.PutRecordsResultEntry
  }
}

package graft.skew.renamedsetter {
  object KinesisClient { def builder(): graft.skew.base.ClientBuilder =
    new graft.skew.base.ClientBuilder(new Client) }
  final class Client extends graft.skew.base.FullClient
  package model {
    import graft.skew.base
    object ListShardsRequest { def builder(): base.LsrB = new base.LsrB }
    object DescribeStreamSummaryRequest { def builder(): base.DssrB = new base.DssrB }
    object GetShardIteratorRequest { def builder(): base.GsiB = new base.GsiB }
    /** The mutation: limit renamed to recordLimit. */
    object GetRecordsRequest { def builder(): base.GrrBRenamed = new base.GrrBRenamed }
    object PutRecordRequest { def builder(): base.PrB = new base.PrB }
    object PutRecordsRequestEntry { def builder(): base.PrreB = new base.PrreB }
    object PutRecordsRequest { def builder(): base.PrsB = new base.PrsB }
    final class ListShardsResponse extends base.ListShardsResponse
    final class Shard extends base.Shard
    final class SequenceNumberRange extends base.SequenceNumberRange
    final class DescribeStreamSummaryResponse extends base.DescribeStreamSummaryResponse
    final class StreamDescriptionSummary extends base.StreamDescriptionSummary
    final class GetShardIteratorResponse extends base.GetShardIteratorResponse
    final class GetRecordsResponse extends base.GetRecordsResponse
    final class Record extends base.Record
    final class PutRecordResponse extends base.PutRecordResponse
    final class PutRecordsResponse extends base.PutRecordsResponse
    final class PutRecordsResultEntry extends base.PutRecordsResultEntry
  }
}

package graft.skew.rettype {
  object KinesisClient { def builder(): graft.skew.base.ClientBuilder =
    new graft.skew.base.ClientBuilder(new Client) }
  final class Client extends graft.skew.base.FullClient
  package model {
    import graft.skew.base
    object ListShardsRequest { def builder(): base.LsrB = new base.LsrB }
    object DescribeStreamSummaryRequest { def builder(): base.DssrB = new base.DssrB }
    object GetShardIteratorRequest { def builder(): base.GsiB = new base.GsiB }
    object GetRecordsRequest { def builder(): base.GrrB = new base.GrrB }
    object PutRecordRequest { def builder(): base.PrB = new base.PrB }
    object PutRecordsRequestEntry { def builder(): base.PrreB = new base.PrreB }
    object PutRecordsRequest { def builder(): base.PrsB = new base.PrsB }
    final class ListShardsResponse extends base.ListShardsResponse
    final class Shard extends base.Shard
    final class SequenceNumberRange extends base.SequenceNumberRange
    final class DescribeStreamSummaryResponse extends base.DescribeStreamSummaryResponse
    final class StreamDescriptionSummary extends base.StreamDescriptionSummary
    final class GetShardIteratorResponse extends base.GetShardIteratorResponse
    /** The mutation: millisBehindLatest(): Long → String. */
    final class GetRecordsResponse extends base.GetRecordsResponseStringMillis
    final class Record extends base.Record
    final class PutRecordResponse extends base.PutRecordResponse
    final class PutRecordsResponse extends base.PutRecordsResponse
    final class PutRecordsResultEntry extends base.PutRecordsResultEntry
  }
}

package graft.skew.extraoverload {
  object KinesisClient { def builder(): graft.skew.base.ClientBuilder =
    new graft.skew.base.ClientBuilder(new Client) }
  /** The benign mutation: 2-arg overloads beside every bound RPC (the
    * SDK's consumer-builder convenience overloads) — must NOT trip
    * validate, and the 1-arg binding must still resolve.
    */
  final class Client extends graft.skew.base.FullClient {
    def listShards(r: AnyRef, opts: AnyRef): AnyRef = null
    def getRecords(r: AnyRef, opts: AnyRef): AnyRef = null }
  package model {
    import graft.skew.base
    object ListShardsRequest { def builder(): base.LsrB = new base.LsrB }
    object DescribeStreamSummaryRequest { def builder(): base.DssrB = new base.DssrB }
    object GetShardIteratorRequest { def builder(): base.GsiB = new base.GsiB }
    /** Extra String overload of limit beside the Integer one. */
    object GetRecordsRequest { def builder(): base.GrrBOverload = new base.GrrBOverload }
    object PutRecordRequest { def builder(): base.PrB = new base.PrB }
    object PutRecordsRequestEntry { def builder(): base.PrreB = new base.PrreB }
    object PutRecordsRequest { def builder(): base.PrsB = new base.PrsB }
    final class ListShardsResponse extends base.ListShardsResponse
    final class Shard extends base.Shard
    final class SequenceNumberRange extends base.SequenceNumberRange
    final class DescribeStreamSummaryResponse extends base.DescribeStreamSummaryResponse
    final class StreamDescriptionSummary extends base.StreamDescriptionSummary
    final class GetShardIteratorResponse extends base.GetShardIteratorResponse
    final class GetRecordsResponse extends base.GetRecordsResponse
    final class Record extends base.Record
    final class PutRecordResponse extends base.PutRecordResponse
    final class PutRecordsResponse extends base.PutRecordsResponse
    final class PutRecordsResultEntry extends base.PutRecordsResultEntry
  }
}

package graft.skew.multi {
  object KinesisClient { def builder(): graft.skew.base.ClientBuilder =
    new graft.skew.base.ClientBuilder(new Client) }
  /** Mutation 1: listShards renamed. */
  final class Client extends graft.skew.base.Rpcs5 {
    def listShardsV2(r: AnyRef): AnyRef = null }
  package model {
    import graft.skew.base
    object ListShardsRequest { def builder(): base.LsrB = new base.LsrB }
    object DescribeStreamSummaryRequest { def builder(): base.DssrB = new base.DssrB }
    object GetShardIteratorRequest { def builder(): base.GsiB = new base.GsiB }
    object GetRecordsRequest { def builder(): base.GrrB = new base.GrrB }
    object PutRecordRequest { def builder(): base.PrB = new base.PrB }
    object PutRecordsRequestEntry { def builder(): base.PrreB = new base.PrreB }
    object PutRecordsRequest { def builder(): base.PrsB = new base.PrsB }
    final class ListShardsResponse extends base.ListShardsResponse
    final class Shard extends base.Shard
    final class SequenceNumberRange extends base.SequenceNumberRange
    final class DescribeStreamSummaryResponse extends base.DescribeStreamSummaryResponse
    final class StreamDescriptionSummary extends base.StreamDescriptionSummary
    final class GetShardIteratorResponse extends base.GetShardIteratorResponse
    final class GetRecordsResponse extends base.GetRecordsResponse
    /** Mutation 2: approximateArrivalTimestamp removed. */
    final class Record extends base.RecordNoTs
    final class PutRecordResponse extends base.PutRecordResponse
    final class PutRecordsResponse extends base.PutRecordsResponse
    final class PutRecordsResultEntry extends base.PutRecordsResultEntry
  }
}
