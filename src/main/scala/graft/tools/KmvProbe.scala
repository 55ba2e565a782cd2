package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component breakdown of q27b (bottom-k distinct sketch over
  * lineitem) across the candidate sketch-build shapes:
  *
  *  - `aggShape` — the SHIPPED r12 form: one ObjectHashAggregate over
  *    [[graft.functions.KmvBottomK]] (bounded ≤ k-long partials).
  *  - `windowShape` — the r11 form it replaced: global distinct + two
  *    salted row_number windows (three exchanges, sorts every
  *    distinct hash).
  *  - `singleLevel` — one unsalted window (rejected r11: a single
  *    task sorts a whole group's distinct-hash set at scale).
  *
  * Plus the est/exact/join components of the full q27b. Prints TIMER
  * lines and an EQUAL line proving agg ≡ window bit-for-bit.
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
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

    def aggShape() = Sketch.kmvSketch(li, Seq("l_returnflag"), "pk")
    def estOnly() = Sketch.kmvEstimate(aggShape())
      .select(col("l_returnflag"), col("est").as("approx_parts"))
    def exactOnly() = li.groupBy("l_returnflag")
      .agg(countDistinct("pk").as("exact_parts"))
    def full() = graft.SparkEntry.queries("q27b_kmv_distinct")(spark, dir)

    // the r11 shipped shape: distinct + salted two-level windows
    def windowShape() = {
      import org.apache.spark.sql.expressions.Window
      val lvl1 = Window
        .partitionBy(col("l_returnflag"), pmod(col("h"), lit(64)))
        .orderBy("h")
      val lvl2 = Window.partitionBy("l_returnflag").orderBy("h")
      li.select(col("l_returnflag"), Sketch.kmvHashColumn(col("pk")).as("h"))
        .distinct()
        .withColumn("__rn", row_number().over(lvl1))
        .filter(col("__rn") <= 256).drop("__rn")
        .withColumn("__rn", row_number().over(lvl2))
        .filter(col("__rn") <= 256).drop("__rn")
        .groupBy("l_returnflag").agg(sort_array(collect_list("h")).as("ks"))
    }

    // rejected r11: single unsalted window
    def singleLevel() = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag").orderBy("h")
      li.select(col("l_returnflag"), Sketch.kmvHashColumn(col("pk")).as("h"))
        .distinct()
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 256).drop("__rn")
        .groupBy("l_returnflag").agg(sort_array(collect_list("h")).as("ks"))
    }

    Seq(("aggShape", () => noop(aggShape())),
        ("windowShape", () => noop(windowShape())),
        ("singleLevel", () => noop(singleLevel())),
        ("estOnly", () => noop(estOnly())),
        ("exactOnly", () => noop(exactOnly())),
        ("full q27b", () => noop(full()))).foreach { case (label, f) =>
      f() // warm
      (1 to 3).foreach(i => time(s"$label run$i")(f()))
    }

    // bit-for-bit equality of the shipped aggregate vs the window form
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("l_returnflag", "cast(ks as string) s")
        .orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
    println(s"EQUAL ${canon(aggShape()) == canon(windowShape())}")
    spark.stop()
  }
}
