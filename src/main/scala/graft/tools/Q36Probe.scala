package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q36Probe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession.fixedCores(8, logLevel = "ERROR")
    val dir = "/root/testdata/sf0.1"
    val l = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity", "l_linenumber")
    val o = graft.Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(s"TIMER $label run$i: ${(System.nanoTime() - t0) / 1e9} (rows=$n)")
      }
    }
    time("plain") { l.join(o, Seq("l_orderkey")).groupBy("o_orderstatus").count().count() }
    for (th <- Seq(5L, 7L, 1000L)) {
      println(s"hot keys at threshold $th: " +
        graft.operators.Joins.hotKeys(l, Seq("l_orderkey"), th).count())
      time(s"twophase_th$th") {
        graft.operators.Joins.saltedInnerJoin(l, o, Seq("l_orderkey"), 8,
          col("l_linenumber"), th).groupBy("o_orderstatus").count().count()
      }
    }
    spark.stop()
  }
}
