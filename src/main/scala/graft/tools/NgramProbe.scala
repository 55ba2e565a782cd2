package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession.fixedCores(8, logLevel = "ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(s"TIMER $label run$i: ${(System.nanoTime() - t0) / 1e9} (rows=$n)")
      }
    val n = 3
    def parts = col("toks").as("g0") +:
      (1 until n).map(i => expr(s"slice(toks, ${i + 1}, size(toks))").as(s"g$i"))
    val base = docs.select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
    time("dropDup") {
      base.select(col("doc_id"), explode(arrays_zip(parts: _*)).as("z"))
        .filter(col(s"z.g${n - 1}").isNotNull)
        .select(col("doc_id"), xxhash64((0 until n).map(i => col(s"z.g$i")): _*).as("h"))
        .dropDuplicates("doc_id", "h").count()
    }
    time("inRowDistinct") {
      base.select(col("doc_id"), explode(array_distinct(arrays_zip(parts: _*))).as("z"))
        .filter(col(s"z.g${n - 1}").isNotNull)
        .select(col("doc_id"), xxhash64((0 until n).map(i => col(s"z.g$i")): _*).as("h"))
        .count()
    }
    // sanity: identical sets
    val a = base.select(col("doc_id"), explode(arrays_zip(parts: _*)).as("z"))
      .filter(col(s"z.g${n - 1}").isNotNull)
      .select(col("doc_id"), xxhash64((0 until n).map(i => col(s"z.g$i")): _*).as("h"))
      .dropDuplicates("doc_id", "h")
    val b = base.select(col("doc_id"), explode(array_distinct(arrays_zip(parts: _*))).as("z"))
      .filter(col(s"z.g${n - 1}").isNotNull)
      .select(col("doc_id"), xxhash64((0 until n).map(i => col(s"z.g$i")): _*).as("h"))
    println("exceptAB=" + a.except(b).count() + " exceptBA=" + b.except(a).count())
    spark.stop()
  }
}
