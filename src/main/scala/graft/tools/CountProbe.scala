package graft.tools

import org.apache.spark.sql.SparkSession

/** Output-cardinality probe: COUNT(*) of named SparkEntry queries at
  * one fixture. Exists to ATTRIBUTE superlinear runtime ratios in the
  * scale matrix — a pair-emitting query (d04/d05/q76/s07b) whose
  * OUTPUT grows ~quadratically with the replica-clique corpus is
  * output-bound (runtime per emitted row is the scale-honest metric),
  * while flat output with superlinear runtime means a plan defect.
  *
  * Usage: SF_DIR=target/sf5 tools/run.sh graft.tools.CountProbe d04_dedup_minhash ...
  */
object CountProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CountProbe <queryName>...")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    val spark = ProbeSession(logLevel = "ERROR")
    args.foreach { name =>
      val q = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val n = q(spark, dir).count()
      println(f"COUNT $name%-34s $dir%-16s $n%,d")
    }
    spark.stop()
  }
}
