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

  /** Minimal parser for the flat string→string JSON object emitted by
    * [[KinesisOffset.json]] (shard ids and sequences never need full
    * JSON generality).
    */
  def fromJson(json: String): KinesisOffset = {
    val s = json.trim.stripPrefix("{").stripSuffix("}")
    if (s.isEmpty) return KinesisOffset(Map.empty)
    val pairs = s.split("\",\"").map(_.stripPrefix("\"").stripSuffix("\""))
    val m = pairs.map { p =>
      val i = p.indexOf("\":\"")
      val k = p.substring(0, i)
      val v = p.substring(i + 3)
      unq(k) -> unq(v)
    }.toMap
    KinesisOffset(m)
  }

  private def unq(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
