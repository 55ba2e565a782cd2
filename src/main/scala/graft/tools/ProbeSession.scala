package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared SparkSession setup for the probe/demo mains (r15 ADVICE):
  * one place for the harness-wide session protocol — SPARK_GRAFT_CPUS
  * core count with shuffle partitions pinned to it, UTC session time
  * zone, UI off — so a future protocol change (like the r15
  * -Xms/AlwaysPreTouch heap pin, which lives at the JVM layer in
  * tools/run.sh) lands in every probe at once instead of 40 copies.
  */
object ProbeSession {
  def cpus(default: String = "32"): String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", default)

  /** Env-driven session: local[SPARK_GRAFT_CPUS], the repo standard. */
  def apply(logLevel: String = "WARN", defaultCpus: String = "32",
      extra: Map[String, String] = Map.empty): SparkSession =
    build(cpus(defaultCpus), logLevel, extra)

  /** Core-pinned session for demos whose measurements or fixtures
    * assume a specific parallelism (e.g. the 4-core streaming demos'
    * micro-batch task counts) — deliberately NOT env-overridable. */
  def fixedCores(n: Int, logLevel: String = "WARN",
      extra: Map[String, String] = Map.empty): SparkSession =
    build(n.toString, logLevel, extra)

  private def build(c: String, logLevel: String,
      extra: Map[String, String]): SparkSession = {
    val b = SparkSession.builder().master(s"local[$c]")
      .config("spark.sql.shuffle.partitions", c)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
