package graft.sources.kinesis

import org.apache.spark.sql.{ForeachWriter, Row}

/** Write-back side: a ForeachWriter pushing rows into a Kinesis-style
  * stream (the producer twin of the source — the reference library is
  * consume-only, so this extends its surface the way a Spark user
  * expects: `df.writeStream.foreach(new KinesisSink(...)).start()`).
  *
  * Rows need `data: binary` and `partitionKey: string` columns; the
  * client routes each record to a shard by partition key (PutRecord
  * semantics). Delivery is at-least-once, per Spark's foreach
  * contract.
  */
class KinesisSink(streamName: String, clientName: String)
  extends ForeachWriter[Row] {

  @transient private var client: KinesisLikeClient = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    client = KinesisRegistry.clients.getOrElse(clientName,
      throw new IllegalArgumentException(s"no client registered as '$clientName'"))
    true
  }

  override def process(row: Row): Unit =
    client.putRecord(streamName,
      row.getAs[String]("partitionKey"), row.getAs[Array[Byte]]("data"))

  override def close(errorOrNull: Throwable): Unit = ()
}
