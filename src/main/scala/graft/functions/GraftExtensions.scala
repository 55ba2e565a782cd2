package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point — the idiomatic way to ship the
  * engine's custom Catalyst functions to every session in a cluster:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * Queries can also call [[VectorDot.register]] per-session; this class
  * makes the functions available cluster-wide without user code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getCanonicalName, "vector_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[VectorCosine].getCanonicalName, "vector_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorCosine(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("byte_histogram"),
      new ExpressionInfo(classOf[ByteHistogram].getCanonicalName, "byte_histogram"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ByteHistogram(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("quiet_runs"),
      new ExpressionInfo(classOf[QuietRuns].getCanonicalName, "quiet_runs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuietRuns(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("resize_grid"),
      new ExpressionInfo(classOf[ResizeGrid].getCanonicalName, "resize_grid"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ResizeGrid(exprs(0), exprs(1), exprs(2), exprs(3))))
    e.injectFunction((
      FunctionIdentifier("prefix_distinct"),
      new ExpressionInfo(classOf[PrefixDistinct].getCanonicalName, "prefix_distinct"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PrefixDistinct(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("char_class_count"),
      new ExpressionInfo(classOf[CharClassCount].getCanonicalName, "char_class_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CharClassCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("word_list_count"),
      new ExpressionInfo(classOf[WordListCount].getCanonicalName, "word_list_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordListCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("alpha_tokens"),
      new ExpressionInfo(classOf[AlphaTokens].getCanonicalName, "alpha_tokens"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AlphaTokens(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersect].getCanonicalName, "sorted_intersect"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersect(exprs(0), exprs(1))))
  }
}
