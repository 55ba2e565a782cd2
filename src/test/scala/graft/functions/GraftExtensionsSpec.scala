package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("vector_dot is available in SQL via spark.sql.extensions") {
    // getOrCreate returns any active session (ignoring extensions), so
    // detach first; the underlying SparkContext is reused either way.
    val prior = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val got = spark.sql(
        "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(got == 11.0)
      // byte_histogram: 256 buckets, unsigned indexing, exact counts
      val hist = spark.sql(
        "SELECT byte_histogram(CAST('aab' AS BINARY)) AS h")
        .collect().head.getSeq[Long](0)
      assert(hist.length == 256 && hist('a'.toInt) == 2 && hist('b'.toInt) == 1
        && hist.sum == 3)
      // high bytes index unsigned (a signed byte would go negative)
      val hi = spark.sql("SELECT byte_histogram(unhex('FF00FF')) AS h")
        .collect().head.getSeq[Long](0)
      assert(hi(255) == 2 && hi(0) == 1 && hi.sum == 3)
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
