package graft.tools
object FlagshipSmoke {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession.fixedCores(8, logLevel = "ERROR")
    println(s"FLAGSHIP_ROWS=${graft.SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
