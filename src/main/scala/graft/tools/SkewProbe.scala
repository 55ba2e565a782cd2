package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Skewed-fixture capture (r12 VERDICT item 4): MakeSf1's key-strided
  * replication has ZERO cross-replica skew — the one 100 TB hazard the
  * sf1 capture cannot see is a hot key concentrating a shuffle
  * partition. This derives skewed lineitem variants from target/sf1
  * (one hot l_orderkey at 10/20/30% of total mass — every selected
  * row's key rewritten to the minimum orderkey) plus a hot-l_partkey
  * variant (10%) for the graph family, then measures, per variant:
  *
  *   - plain shuffled inner join lineitem⋈orders, AQE skew-join OFF —
  *     the unmitigated control: ONE task reads the hot key's entire
  *     mass;
  *   - plain join with AQE skew-join ON (Spark's own runtime
  *     mitigation — the sort-merge-only path);
  *   - [[Joins.saltedInnerJoin]] (8 salts) — the engine's explicit
  *     two-phase mitigation, which also covers plans AQE skew
  *     handling can't touch;
  *   - the q48 left-join shape at 20% mass, salted vs plain;
  *   - q70 triangles over the hot-part variant (degree orientation is
  *     the graph family's skew answer).
  *
  * Metric per run: wall seconds + LARGEST-TASK shuffle-read rows (a
  * SparkListener max over task shuffle-read records — the direct
  * measure of "did one task eat the hot key"). Prints SKEWPROBE
  * lines; table lands in SCALE.md.
  */
object SkewProbe {
  private val maxTaskRows = new AtomicLong(0)

  def main(args: Array[String]): Unit = {
    val spark = ProbeSession()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          var cur = maxTaskRows.get
          while (r > cur && !maxTaskRows.compareAndSet(cur, r)) cur = maxTaskRows.get
        }
      }
    })

    val sf1 = sys.env.getOrElse("SF1_DIR", "/root/repo/target/sf1")
    val out = "/root/repo/target/skew"
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
    val hotOrder = li.agg(min("l_orderkey")).head().getLong(0)
    val hotPart = li.agg(min("l_partkey")).head().getLong(0)

    // ---- derive fixtures (deterministic row selection by row hash) ----
    def derive(path: String, keyCol: String, hotKey: Long, pct: Int): Unit = {
      if (new java.io.File(path).exists()) return
      li.withColumn(keyCol,
          when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(100))
            < pct, lit(hotKey)).otherwise(col(keyCol)))
        .repartition(16).write.mode("overwrite").parquet(path)
    }
    Seq(10, 20, 30).foreach(p =>
      derive(s"$out/m$p/lineitem.parquet", "l_orderkey", hotOrder, p))
    derive(s"$out/part10/lineitem.parquet", "l_partkey", hotPart, 10)
    // the graph/table readers want the full table set: link the rest
    for (v <- Seq("m10", "m20", "m30", "part10");
         t <- Seq("region", "nation", "customer", "supplier", "part",
           "orders", "events", "documents", "embeddings")) {
      val l = java.nio.file.Paths.get(s"$out/$v/$t.parquet")
      if (!java.nio.file.Files.exists(l, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        java.nio.file.Files.createSymbolicLink(l,
          java.nio.file.Paths.get(s"$sf1/$t.parquet"))
    }

    def timed(label: String)(f: => DataFrame): Unit = {
      maxTaskRows.set(0)
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      println(f"SKEWPROBE $label%-34s sec=$sec%7.2f max_task_shuffle_rows=${maxTaskRows.get}%,d")
    }

    def joinAgg(l: DataFrame, o: DataFrame, salted: Boolean, leftJoin: Boolean = false): DataFrame = {
      val joined =
        if (salted && leftJoin)
          Joins.saltedLeftJoin(l, o, Seq("l_orderkey"), salts = 8,
            saltSource = col("l_linenumber"), hotKeyThreshold = 100000L)
        else if (salted)
          Joins.saltedInnerJoin(l, o, Seq("l_orderkey"), salts = 8,
            saltSource = col("l_linenumber"), hotKeyThreshold = 100000L)
        else l.join(o, Seq("l_orderkey"), if (leftJoin) "left" else "inner")
      joined.groupBy(coalesce(col("o_orderstatus"), lit("_")).as("st"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
    }

    def orders(dir: String): DataFrame =
      spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        // defeat broadcast: at 100 TB the dim here is a fact too — force
        // the SHUFFLED join path the skew question is about
        .hint("shuffle_hash")

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    def runJoinMatrix(dir: String, tag: String): Unit = {
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_linenumber")
      conf("spark.sql.adaptive.enabled", "false")
      timed(s"$tag plain join (AQE off)")(joinAgg(l, orders(dir), salted = false))
      conf("spark.sql.adaptive.enabled", "true")
      conf("spark.sql.adaptive.skewJoin.enabled", "true")
      timed(s"$tag plain join (AQE skew on)")(joinAgg(l, orders(dir), salted = false))
      timed(s"$tag salted join (8 salts)")(joinAgg(l, orders(dir), salted = true))
    }

    runJoinMatrix(sf1, "sf1-unskewed")
    Seq(10, 20, 30).foreach(p => runJoinMatrix(s"$out/m$p", s"m$p"))

    // q48 left-join shape at the 20% mass
    val l20 = spark.read.parquet(s"$out/m20/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_linenumber")
    val oF = spark.read.parquet(s"$out/m20/orders.parquet")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      .hint("shuffle_hash")
    conf("spark.sql.adaptive.enabled", "false")
    timed("m20 plain LEFT join (AQE off)")(joinAgg(l20, oF, salted = false, leftJoin = true))
    conf("spark.sql.adaptive.enabled", "true")
    timed("m20 salted LEFT join (8 salts)")(joinAgg(l20, oF, salted = true, leftJoin = true))

    // AQE skew-join with thresholds scaled to the fixture: at sf1 the
    // hot partition is ~tens of MB — far below the 256 MB default
    // threshold, so the rows above show AQE (correctly) NOT engaging.
    // At 100 TB the same 30%-mass partition is ~30 TB and AQE's
    // defaults DO fire; lowering the thresholds to fixture scale
    // demonstrates the engaged path and its largest-task bound.
    val l30 = spark.read.parquet(s"$out/m30/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_linenumber")
    conf("spark.sql.adaptive.enabled", "true")
    conf("spark.sql.adaptive.skewJoin.enabled", "true")
    conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    timed("m30 plain join (AQE tuned)")(joinAgg(l30, orders(s"$out/m30"), salted = false))
    conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m")
    conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5")
    conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")

    // graph family under a hot vertex: q70 triangles on the hot-part
    // variant (one part in ~10% of all lineitems) vs unskewed sf1 —
    // degree orientation must keep the largest task bounded
    val q70 = graft.SparkEntry.queries("q70_triangles")
    timed("q70 triangles sf1-unskewed")(q70(spark, sf1))
    timed("q70 triangles hot-part-10pct")(q70(spark, s"$out/part10"))

    spark.stop()
  }
}
