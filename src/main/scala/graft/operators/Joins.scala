package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skew that AQE can't always fix (e.g. one hot key
  * dominating a shuffle partition when the small side is too big to
  * broadcast outright).
  */
object Joins {

  /** Salted equi-join: explodes the hot-key space on the left by
    * appending a random-but-deterministic salt in [0, salts), and
    * replicates every right-side row once per salt value, so one hot
    * key spreads across `salts` shuffle partitions instead of one.
    *
    * Results are identical to `left.join(right, keys, "inner")`; cost
    * is `salts`× replication of the right side — use when the right
    * side is modest and the left is skewed. Salt is derived from
    * stable left-side columns (xxhash64), keeping the plan
    * deterministic and replay-safe.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, saltSource: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val r = right.withColumn("__salt",
      explode(expr(s"sequence(CAST(0 AS BIGINT), CAST(${salts - 1} AS BIGINT))")))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
