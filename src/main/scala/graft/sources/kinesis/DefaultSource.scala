package graft.sources.kinesis

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.KinesisRecord

/** DataSource V2 provider: `spark.readStream.format("kinesis-graft")`.
  *
  * Options:
  *  - `streamName` (required) — option.go:13
  *  - `maxRecordsPerFetch` (default 1000) — kinesis.go:182's Limit
  *  - `clientName` — a [[KinesisRegistry.clients]] key (tests/DI), or
  *  - `clientClass` — FQCN with a no-arg constructor
  *  - `saverName` — a [[KinesisRegistry.savers]] key; optional: without
  *    a saver every fresh start reads from TRIM_HORIZON, matching the
  *    reference without a SequenceSaver (sequence.go:27-29)
  */
class DefaultSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kinesis-graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisRecord.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KinesisTable(new CaseInsensitiveStringMap(properties))
}

class KinesisTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val streamName = {
    val n = options.get("streamName")
    require(n != null && n.nonEmpty, "option 'streamName' is required")
    n
  }

  override def name(): String = s"kinesis-graft:$streamName"
  override def schema(): StructType = KinesisRecord.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KinesisRecord.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
          val client: KinesisLikeClient =
            Option(options.get("clientName")).map { n =>
              KinesisRegistry.clients.getOrElse(n,
                throw new IllegalArgumentException(s"no client registered as '$n'"))
            }.orElse(Option(options.get("clientClass")).map { c =>
              Class.forName(c).getDeclaredConstructor()
                .newInstance().asInstanceOf[KinesisLikeClient]
            }).getOrElse(throw new IllegalArgumentException(
              "set option 'clientName' (registry) or 'clientClass' (FQCN); " +
                "production default: clientClass=graft.sources.kinesis" +
                ".AwsKinesisClient with the AWS SDK v2 kinesis jar on " +
                "the classpath (see AwsKinesisAdapter for the mapping)"))
          // Config plumb-through (option.go:36-43 → kinesis.go:45-52):
          // region/sts/etc. reach the client before first use.
          client match {
            case c: ConfigurableKinesisClient =>
              c.configure(options.asCaseSensitiveMap().asScala.toMap
                .map { case (k, v) => k.toLowerCase -> v })
            case _ => ()
          }
          val saver = Option(options.get("saverName")).map { n =>
            KinesisRegistry.savers.getOrElse(n,
              throw new IllegalArgumentException(s"no saver registered as '$n'"))
          }
          val maxFetch = Option(options.get("maxRecordsPerFetch"))
            .map(_.toInt).getOrElse(1000) // kinesis.go:182
          new KinesisMicroBatchStream(streamName, client, saver, maxFetch)
        }
      }
    }
}
