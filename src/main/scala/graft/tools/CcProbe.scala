package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** A/B the distributed connected-components loop's per-round join
  * strategy at the r14 sf5 survivor volume (VERDICT/SCALE: s07/s07b/
  * s07c were the top three sf5 outliers, dominated by the min-label
  * fallback over 8–12M pairs). The loop's label table is checkpointed
  * — a stats-blind LogicalRDD — so without a sized hint every
  * propagate round shuffles the full edge list against a label side
  * of a few MB. This probe builds a synthetic clique graph with the
  * same shape as the replica-clique survivor relation (100k nodes,
  * ~12M undirected pairs in 250-cliques), forces the distributed path
  * (driverMaxEdges = 0), and times three variants:
  *
  *   shuffle  — hint disabled via graft.cc.labelBroadcastMaxBytes=0
  *              (the pre-r15 plan)
  *   bcast    — the shipped sized hint (labels ≤ 256 MB → broadcast)
  *   driver   — the driver union-find branch, for reference (this
  *              volume is past the default 4M-edge guard in prod)
  *
  * Output labels are identity-checked across variants by an
  * order-free checksum before any timing is reported.
  *
  * Usage: tools/run.sh graft.tools.CcProbe [nNodes] [cliqueSize]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val c = if (args.length > 1) args(1).toInt else 250
    val spark = ProbeSession()

    // clique graph: node ids are bit-mixed so neither cliques nor the
    // min labels follow data order; every pair within a clique is an
    // edge — the s07b relation's shape (replica cliques) exactly
    val nodes = spark.range(0, n)
      .select((xxhash64(col("id")).bitwiseAND(lit(Long.MaxValue)))
          .as("nid"),
        (col("id") / c).cast("long").as("g"))
    val a = nodes.select(col("g"), col("nid").as("a"))
    val b = nodes.select(col("g").as("g2"), col("nid").as("b"))
    val pairs = a.join(b, col("g") === col("g2") && col("a") < col("b"))
      .select("a", "b").persist()
    val ne = pairs.count()
    println(s"CCPROBE graph: n=$n cliques of $c, undirected pairs=$ne")

    def checksum(df: DataFrame): Long =
      df.agg(expr("bit_xor(xxhash64(id, label))")).head().getLong(0)

    def run(tag: String, bcMaxBytes: Option[Long], dme: Long): Long = {
      bcMaxBytes match {
        case Some(v) => spark.conf.set("graft.cc.labelBroadcastMaxBytes",
          v.toString)
        case None => spark.conf.unset("graft.cc.labelBroadcastMaxBytes")
      }
      // cold + steady: the second run reuses nothing across calls (the
      // loop checkpoints internally) but reports scheduler-warm time
      var cs = 0L
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val out = Dedup.connectedComponents(pairs, driverMaxEdges = dme)
        cs = checksum(out)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"CCPROBE $tag%-8s cold=${times.head}%7.2fs steady=${times.last}%7.2fs checksum=$cs%d")
      cs
    }

    val c1 = run("shuffle", Some(0L), 0L)
    val c2 = run("bcast", None, 0L)
    val c3 = run("driver", None, Long.MaxValue)
    require(c1 == c2 && c2 == c3, s"label mismatch: $c1 $c2 $c3")
    println("CCPROBE identical labels across all variants")
    spark.stop()
  }
}
