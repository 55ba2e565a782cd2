package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable aggregation buffer: running element-wise sum + row count. */
case class VecBuf(sum: Array[Double], n: Long)

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): element-wise mean of
  * vectors — the centroid of an embedding group. Demonstrates the
  * user-defined-aggregate surface of the engine; partial aggregation
  * (reduce) runs map-side, merge combines partials, so only
  * dim-length buffers cross the shuffle.
  */
object VectorAvg extends Aggregator[Array[Double], VecBuf, Array[Double]] {

  override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecBuf, v: Array[Double]): VecBuf =
    if (b.n == 0L) VecBuf(v.clone(), 1L)
    else {
      var i = 0
      while (i < b.sum.length && i < v.length) { b.sum(i) += v(i); i += 1 }
      VecBuf(b.sum, b.n + 1)
    }

  override def merge(a: VecBuf, b: VecBuf): VecBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      var i = 0
      while (i < a.sum.length && i < b.sum.length) { a.sum(i) += b.sum(i); i += 1 }
      VecBuf(a.sum, a.n + b.n)
    }

  override def finish(r: VecBuf): Array[Double] =
    if (r.n == 0L) r.sum else r.sum.map(_ / r.n)

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
