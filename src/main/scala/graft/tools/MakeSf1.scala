package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an sf1-scale fixture (~6M lineitem) from the driver's sf0.1
  * parquet by 10× KEY-STRIDED replication: each replica i shifts every
  * key column by i·stride (strides are powers of ten above the key
  * range), so the copies are disjoint in key space and every FK join
  * (lineitem↔orders↔customer, lineitem↔part/supplier) lands inside
  * its own replica — 10 disjoint sub-databases, the exact shape a 10×
  * TPC-H load has. region/nation stay fixed (they are fixed-size at
  * every TPC-H sf). Content columns are byte-identical to sf0.1, so
  * the fixture is valid for PLAN-SHAPE and SCALING measurements (and
  * for sf1 oracle checks, since DuckDB reads the same derived
  * parquet); content-duplicate-sensitive families (dedup d*) are
  * excluded from the sf1 capture — their pair structure would be the
  * artifact of replication, not data.
  *
  * Output: /root/repo/target/sf1/<table>.parquet (inside the repo;
  * /root/testdata is read-only).
  */
object MakeSf1 {
  private val Replicas = 10

  def main(args: Array[String]): Unit = {
    val spark = ProbeSession()
    val src = "/root/testdata/sf0.1"
    val dst = sys.env.getOrElse("SF1_DIR", "/root/repo/target/sf1")

    // key → stride; every stride clears its key's sf0.1 range by ≥ 10×
    val strides: Map[String, Long] = Map(
      "o_orderkey" -> 10000000L, "l_orderkey" -> 10000000L,
      "o_custkey" -> 1000000L, "c_custkey" -> 1000000L,
      "l_partkey" -> 1000000L, "p_partkey" -> 1000000L,
      "l_suppkey" -> 100000L, "s_suppkey" -> 100000L,
      // doc/vec strides are 10M, NOT 1M: several queries inject
      // derived ids in-query (m06 copies at doc_id+999999, d09
      // passages at doc_id+1000000), and a 1M stride made those
      // collide with replica-1's id space — duplicate doc_ids with
      // DIFFERENT content, whose pair identity is ambiguous (the
      // m06 rowcount divergence that exposed this). 10M keeps every
      // in-query injection inside its replica's id space.
      "event_id" -> 10000000L, "user_id" -> 10000000L,
      "doc_id" -> 10000000L, "vec_id" -> 10000000L)

    def replicate(name: String, files: Int): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val keyCols = base.columns.filter(strides.contains)
      // sanity: strides must clear the actual key range
      val maxes = if (keyCols.nonEmpty)
        base.select(keyCols.map(c => max(col(c)).as(c)).toSeq: _*).head() else null
      keyCols.zipWithIndex.foreach { case (c, i) =>
        require(maxes.getLong(i) < strides(c),
          s"$name.$c max ${maxes.getLong(i)} >= stride ${strides(c)}")
      }
      val out = (0 until Replicas).map { i =>
        keyCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i.toLong * strides(c)))
        }
      }.reduce(_ unionByName _)
      out.repartition(files).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"SF1 $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    Seq(("lineitem", 16), ("orders", 8), ("customer", 4), ("supplier", 1),
      ("part", 2), ("events", 8), ("documents", 4), ("embeddings", 2))
      .foreach { case (n, f) => replicate(n, f) }
    // fixed-size dimensions: straight copies
    Seq("region", "nation").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"SF1 $n: copied")
    }
    spark.stop()
  }
}
