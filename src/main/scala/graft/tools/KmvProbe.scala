package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component breakdown of q27b (bottom-k distinct sketch over
  * lineitem): is the cost the sketch pipeline (distinct + two
  * windows), the exact-count witness, or the join? Also measures a
  * candidate cheaper sketch shape (single-level window, no salt) to
  * quantify what the salt level costs at THIS scale vs what it buys at
  * 100 TB (bounded per-task sorts).
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators.Sketch
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_partkey").cast("string").as("pk"))

    def sketchOnly() = Sketch.kmvSketch(li, Seq("l_returnflag"), "pk")
    def estOnly() = Sketch.kmvEstimate(sketchOnly())
      .select(col("l_returnflag"), col("est").as("approx_parts"))
    def exactOnly() = li.groupBy("l_returnflag")
      .agg(countDistinct("pk").as("exact_parts"))
    def full() = graft.SparkEntry.queries("q27b_kmv_distinct")(spark, dir)
    // candidate: single-level bottom-k (no salt window) — the shape we
    // deliberately did NOT ship (one task sorts a whole group's
    // distinct-hash set at scale)
    def singleLevel() = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag").orderBy("h")
      li.select(col("l_returnflag"), Sketch.kmvHashColumn(col("pk")).as("h"))
        .distinct()
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 256).drop("__rn")
        .groupBy("l_returnflag").agg(sort_array(collect_list("h")).as("ks"))
    }

    // candidate: fold the distinct INTO the salt-level window — equal
    // h always lands in the same salt bucket (salt = h mod 64), so a
    // lag-dedup + dense_rank<=k in ONE window pass selects the k
    // smallest distinct h per bucket with one exchange instead of two
    def fusedSketch() = {
      import org.apache.spark.sql.expressions.Window
      val w1 = Window
        .partitionBy(col("l_returnflag"), pmod(col("h"), lit(64)))
        .orderBy("h")
      val w2 = Window.partitionBy("l_returnflag").orderBy("h")
      li.select(col("l_returnflag"), Sketch.kmvHashColumn(col("pk")).as("h"))
        .withColumn("__prev", lag("h", 1).over(w1))
        .withColumn("__dr", dense_rank().over(w1))
        .filter(col("__dr") <= 256 &&
          (col("__prev").isNull || col("__prev") =!= col("h")))
        .drop("__prev", "__dr")
        .withColumn("__rn", row_number().over(w2))
        .filter(col("__rn") <= 256).drop("__rn")
        .groupBy("l_returnflag").agg(sort_array(collect_list("h")).as("ks"))
    }

    Seq(("sketchOnly", () => noop(sketchOnly())),
        ("estOnly", () => noop(estOnly())),
        ("exactOnly", () => noop(exactOnly())),
        ("singleLevel", () => noop(singleLevel())),
        ("fusedSketch", () => noop(fusedSketch())),
        ("full q27b", () => noop(full()))).foreach { case (label, f) =>
      f() // warm
      (1 to 3).foreach(i => time(s"$label run$i")(f()))
    }

    // equality of the fused shape against the shipped sketch
    val a = sketchOnly().selectExpr("l_returnflag", "cast(ks as string) s")
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val b = fusedSketch().selectExpr("l_returnflag", "cast(ks as string) s")
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    println(s"EQUAL ${a == b}")
    spark.stop()
  }
}
