package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the Datasketches union-vs-direct estimator divergence that
  * sized q37's `merge_within_*` certification band: once sketches
  * leave sparse mode, `hll_union_agg` flags the result out-of-order
  * and estimates with a different estimator than a directly-built
  * sketch — this prints the per-region deltas at each fixture sf.
  */
object Q37Probe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession.fixedCores(8, logLevel = "ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val c = graft.Tables.customer(spark, dir)
      val n = graft.Tables.nation(spark, dir)
      val cn = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      val merged = cn.groupBy("n_regionkey", "n_nationkey")
        .agg(expr("hll_sketch_agg(c_custkey)").as("sk"))
        .groupBy("n_regionkey")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("m"))
      val direct = cn.groupBy("n_regionkey")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(c_custkey))").as("d"),
          countDistinct("c_custkey").as("x"))
      merged.join(direct, "n_regionkey").orderBy("n_regionkey").collect()
        .foreach { r =>
          val (m, d, x) = (r.getLong(1), r.getLong(2), r.getLong(3))
          println(f"PROBE $sf region=${r.get(0)} merged=$m direct=$d exact=$x " +
            f"md_rel=${math.abs(m - d).toDouble / d}%.4f " +
            f"mx_rel=${math.abs(m - x).toDouble / x}%.4f")
        }
    }
    spark.stop()
  }
}
