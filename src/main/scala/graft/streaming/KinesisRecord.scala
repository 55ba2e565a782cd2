package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The record envelope — the Spark mapping of the AWS `types.Record`
  * fields the reference touches (handler at kinesis.go:34, sequence at
  * kinesis.go:199, data at kinesis_test.go:22) plus stream/shard
  * context (kinesis.go:110-112, sequence.go:13-14). See SURVEY.md §1.2.
  *
  * `data` stays an opaque byte payload — schema-on-read, exactly like
  * the reference (it never inspects payload bytes).
  */
case class KinesisRecord(
    data: Array[Byte],
    partitionKey: String,
    sequenceNumber: String,
    approximateArrivalTimestamp: Timestamp,
    streamName: String,
    shardId: String)

object KinesisRecord {
  /** Envelope schema as a DataFrame StructType (matches the case class
    * field order; also the schema of the DSv2 source in graft.sources).
    */
  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType),
    StructField("streamName", StringType),
    StructField("shardId", StringType)))
}
