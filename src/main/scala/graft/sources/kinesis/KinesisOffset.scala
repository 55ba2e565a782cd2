package graft.sources.kinesis

import org.apache.spark.sql.connector.read.streaming.Offset

/** Streaming offset: shardId → last consumed sequence number ("" = not
  * yet consumed, i.e. TRIM_HORIZON). The Spark form of what the
  * reference persists one key at a time through its SequenceSaver
  * (sequence.go:46-49); here the whole map is one WAL entry per batch,
  * which is exactly the reference's batch-granularity checkpoint
  * (kinesis.go:198-201) across all shards at once.
  */
case class KinesisOffset(positions: Map[String, String]) extends Offset {
  // Deterministic JSON (sorted keys); values are opaque sequences.
  override def json(): String =
    positions.toSeq.sorted
      .map { case (k, v) => s"${KinesisOffset.q(k)}:${KinesisOffset.q(v)}" }
      .mkString("{", ",", "}")
}

object KinesisOffset {
  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Parses the flat string→string JSON object emitted by
    * [[KinesisOffset.json]]. This is the checkpoint-recovery path
    * (`deserializeOffset`), so it must accept every serializable offset —
    * including empty-string positions ("" = TRIM_HORIZON) at any key
    * position — hence a real JSON parser (json4s, already on Spark's
    * classpath) rather than string splitting.
    */
  def fromJson(json: String): KinesisOffset = {
    import org.json4s._
    jackson.JsonMethods.parse(json) match {
      case JObject(fields) =>
        KinesisOffset(fields.map {
          case (k, JString(v)) => k -> v
          case (k, other) =>
            throw new IllegalArgumentException(
              s"KinesisOffset: shard '$k' has non-string position $other in: $json")
        }.toMap)
      case other =>
        throw new IllegalArgumentException(s"KinesisOffset: not a JSON object: $json")
    }
  }
}
