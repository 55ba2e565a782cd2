package graft.tools
import org.apache.spark.sql.SparkSession

/** Time individual registered queries under Bench's exact conditions
  * (local[SPARK_GRAFT_CPUS], shuffle partitions = cpus, noop sink,
  * warm pass + repeats): `runMain graft.tools.Profile q74_pagerank_k`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = ProbeSession(logLevel = "ERROR", defaultCpus = "8")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // Same ingest-artifact warm-up as Bench (untimed)
    graft.operators.Similarity.prepareIndex(spark, dir)
    graft.operators.Dedup.prepareShingles(spark, dir)
    graft.operators.Relational.prepareStats(spark, dir)
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      // timed construction + noop write, mirroring Bench.runOnce;
      // one untimed warm run, then 3 timed
      def once(): Unit =
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      once()
      for (i <- 1 to 3) time(s"$name run$i")(once())
    }
    spark.stop()
  }
}
