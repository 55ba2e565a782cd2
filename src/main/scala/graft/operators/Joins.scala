package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skew that AQE can't always fix (e.g. one hot key
  * dominating a shuffle partition when the small side is too big to
  * broadcast outright).
  */
object Joins {

  /** Keys whose left-side row count reaches `threshold` — the keys that
    * would overwhelm a single shuffle partition. One count aggregate
    * with map-side partial combine: the shuffle carries one row per
    * distinct key per input partition, not the fact rows, so detection
    * stays cheap at any fact size. The full (not sampled) count keeps
    * the plan deterministic and replay-safe. At 100 TB this is the kind
    * of key-frequency stat an ingest pipeline materializes once and
    * reuses — compute it ahead of time and pass it to the
    * [[saltedInnerJoin]] overload that accepts it.
    */
  def hotKeys(left: DataFrame, keys: Seq[String], threshold: Long): DataFrame =
    left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= threshold)
      .select(keys.map(col): _*)

  /** The right side with its per-row salt fan-out: rows with a hot key
    * are replicated once per salt value; every other row rides salt 0
    * alone. Total size is |right| + |hot right rows| × (salts − 1) —
    * O(hot keys × salts) overhead, never O(|right| × salts). Exposed
    * for the JoinsSpec replication-accounting test.
    */
  private[operators] def saltedRight(right: DataFrame, keys: Seq[String],
      salts: Int, hot: DataFrame): DataFrame =
    right.join(broadcast(hot.withColumn("__hot", lit(true))), keys, "left")
      .withColumn("__salt", explode(
        when(col("__hot"),
          expr(s"sequence(CAST(0 AS BIGINT), CAST(${salts - 1} AS BIGINT))"))
          .otherwise(array(lit(0L)))))
      .drop("__hot")

  /** Two-phase skew-aware equi-join: identical results to
    * `left.join(right, keys, "inner")`, but each detected hot key is
    * spread over `salts` shuffle partitions instead of landing on one.
    *
    * Phase 1 detects hot keys (left-side row count ≥ `hotKeyThreshold`,
    * see [[hotKeys]]). Phase 2 is ONE shuffled join on (keys, salt):
    * left rows with a hot key get a deterministic salt in [0, salts)
    * from `saltSource` (xxhash64 — stable across retries/replays) while
    * cold rows ride salt 0; on the right, ONLY hot-key rows are
    * replicated across all salt values ([[saltedRight]]), cold rows
    * stay single. The hot-key set is broadcast to both sides (it is
    * small by definition — keys above a count threshold), so the whole
    * thing costs the plain join plus one count aggregate, one
    * broadcast, and O(hot right rows × salts) replication. With no hot
    * keys it degenerates to exactly the plain join.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, saltSource: Column, hotKeyThreshold: Long): DataFrame = {
    require(hotKeyThreshold > 0, "hotKeyThreshold must be positive")
    saltedInnerJoin(left, right, keys, salts, saltSource,
      hotKeys(left, keys, hotKeyThreshold))
  }

  /** [[saltedInnerJoin]] with a precomputed hot-key set — the 100 TB
    * form, where key-frequency stats are an ingest artifact (like the
    * dedup family's shingle/signature tables) rather than a per-query
    * scan. `hot` must contain exactly the `keys` columns.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, saltSource: Column, hot: DataFrame): DataFrame = {
    require(salts > 0, "salts must be positive")
    val hotFlag = broadcast(hot.withColumn("__hot", lit(true)))
    val l = left.join(hotFlag, keys, "left")
      .withColumn("__salt",
        when(col("__hot"), pmod(xxhash64(saltSource), lit(salts.toLong)))
          .otherwise(lit(0L)))
      .drop("__hot")
    l.join(saltedRight(right, keys, salts, hot), keys :+ "__salt")
      .drop("__salt")
  }
}
