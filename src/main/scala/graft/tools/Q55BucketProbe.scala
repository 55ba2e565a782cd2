package graft.tools

import org.apache.spark.sql.{DataFrame, functions => F}

/** Interleaved A/B over exactPercentileSelect's bucket count — a pure
  * performance knob: the selected values are rank-exact for ANY bucket
  * count (the bucket grid only decides how many rows pass 2 keeps per
  * targeted rank), so the only question is where pass-1's partial-agg
  * hash size vs pass-2's targeted-bucket width balances.
  * Run: SF_DIR=... SPARK_DRIVER_MEM=48g tools/run.sh graft.tools.Q55BucketProbe
  */
object Q55BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    val li = graft.Tables.lineitem(spark, dir)
    def run(buckets: Int): DataFrame =
      graft.operators.Relational.exactPercentileSelect(
        li, "l_returnflag", "l_extendedprice",
        Seq("p50" -> 0.5, "p90" -> 0.9), buckets = buckets,
        keyCount = Some(3L)).orderBy("l_returnflag")
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cands = Seq(65536, 16384, 4096, 1024)
    cands.foreach(b => time(run(b))) // warm
    val acc = cands.map(b => b -> collection.mutable.ArrayBuffer.empty[Double]).toMap
    (1 to 3).foreach { _ =>
      cands.foreach { b => acc(b) += time(run(b)) }
      System.gc(); Thread.sleep(500)
    }
    cands.foreach { b =>
      val xs = acc(b)
      println(f"Q55BUCKETS $b%6d best=${xs.min}%6.3f runs=${xs.map(t => f"$t%.3f").mkString(",")}")
    }
    // sanity: identical outputs across bucket counts
    val ref = run(65536).collect().toSeq
    cands.tail.foreach { b =>
      val got = run(b).collect().toSeq
      require(got == ref, s"bucket count $b changed the result!")
    }
    println("Q55BUCKETS outputs identical across bucket counts")
    spark.stop()
  }
}
