package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * Replaces `aggregate(zip_with(a, b, ...), ...)`: the HOF pipeline
  * allocates an intermediate array and boxes every element per row,
  * which dominated the all-pairs similarity benchmarks. This expression
  * generates a tight primitive loop inside whole-stage codegen.
  *
  * Accumulation is a sequential left-to-right fold — bitwise-identical
  * to both the HOF formulation and DuckDB's `list_dot_product` on
  * DOUBLE[], which the correctness oracle relies on.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects two array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Register `vector_dot` in the session's function registry so it is
    * usable from `expr(...)` / SQL. Idempotent AND quiet: replacing an
    * existing entry logs a registry WARN per call, so skip when already
    * registered (query builders call this once per query construction).
    */
  def register(s: SparkSession): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot")
    if (!s.sessionState.functionRegistry.functionExists(id)) {
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    }
  }
}
