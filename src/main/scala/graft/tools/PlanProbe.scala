package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession.fixedCores(4, logLevel = "ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- args) {
      val p = graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(FormattedMode)
      println(s"===== $n =====")
      println("Window count: " + "\\(\\d+\\) Window".r.findAllIn(p).size)
      println("Exchange count: " + "\\(\\d+\\) Exchange".r.findAllIn(p).size)
      println("BHJ: " + p.contains("BroadcastHashJoin") + "  SMJ: " + p.contains("SortMergeJoin") +
        "  BNLJ: " + p.contains("BroadcastNestedLoopJoin") + "  Cartesian: " + p.contains("CartesianProduct"))
      println("Scan count: " + "Scan parquet".r.findAllIn(p).size)
    }
    spark.stop()
  }
}
