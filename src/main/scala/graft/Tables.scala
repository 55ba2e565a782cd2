package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated testdata
  * (TESTDATA.md / FIXTURES.md). All operators read through here so a
  * future source swap (e.g. the DSv2 stream source in graft.sources)
  * is a one-line change.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame  = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = t(s, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 won't map to
    * TimestampType. Read nanos as long (legacy conf) and truncate to
    * micros — the same ns→µs floor DuckDB applies, so oracle parity
    * holds.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
