package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B of d04's signature-fetch join strategy at a derived
  * sf (the r15 sigHint decision): shuffle plan (bound overridden to 0)
  * vs sized broadcast hint (default), over the SAME persisted md5
  * signature artifact — isolates the join shape from artifact-build
  * and session noise, the CcProbe protocol.
  *
  * Usage: SF_DIR=/root/repo/target/sf5 tools/run.sh graft.tools.D04Probe
  */
object D04Probe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/repo/target/sf5")
    val q = graft.SparkEntry.queries("d04_dedup_minhash")
    // artifact build + JIT warm, untimed
    q(spark, dir).write.format("noop").mode("overwrite").save()
    def run(tag: String, bcMax: Option[String]): Unit = {
      bcMax match {
        case Some(v) => spark.conf.set("graft.dedup.sigBroadcastMaxBytes", v)
        case None => spark.conf.unset("graft.dedup.sigBroadcastMaxBytes")
      }
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"D04PROBE $tag%-8s runs=${times.map(t => f"$t%.2f").mkString(",")}s")
    }
    run("shuffle", Some("0"))
    run("bcast", None)
    run("shuffle2", Some("0"))
    spark.stop()
  }
}
