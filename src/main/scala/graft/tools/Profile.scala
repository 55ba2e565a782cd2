package graft.tools
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"TIMER $label: ${(System.nanoTime() - t0) / 1e9}"); r
    }
    for (name <- args) {
      // time construction too: iterative operators (d06) run driver-
      // coordinated actions while the query is being built
      time(name) { graft.SparkEntry.queries(name)(spark, dir).count() }
    }
    spark.stop()
  }
}
