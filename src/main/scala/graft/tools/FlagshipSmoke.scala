package graft.tools
object FlagshipSmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"FLAGSHIP_ROWS=${graft.SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
