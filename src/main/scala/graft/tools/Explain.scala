package graft.tools
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession.fixedCores(8, logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      println(s"===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
