package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine re-expresses the capability surface of
  * `luanruisong/kinesis_iterator` (a Kinesis shard-consumer library,
  * /root/reference/kinesis.go) Spark-first: streaming ingestion is
  * Structured Streaming (graft.streaming / graft.sources), and the
  * query surface the reference leaves to its `Handler` callback is the
  * Catalyst-backed operator inventory below (SURVEY.md §2.2).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The event-stream analog of the reference's consume loop
    * (kinesis.go:193-197): read the stream table, decode the opaque
    * payload (`props` ≈ `types.Record.Data`) with an explicit schema,
    * then aggregate per event type.
    */
  def entry(spark: SparkSession): DataFrame = {
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("payload", from_json(col("props"), propsSchema))
      .filter(col("payload.k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 3).as("sum_value"),
        round(avg("payload.k"), 3).as("avg_k"))
      .orderBy("event_type")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.TextOps.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Pipeline.queries ++
      operators.Sketch.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.TextOps.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.Multimodal.oracles ++
      operators.Pipeline.oracles ++
      operators.Sketch.oracles

  /** The rows-only policy, machine-readable: every registered query
    * WITHOUT an [[oracleSql]] entry maps to (a) the named ScalaTest
    * invariant that stands in for the hash gate and (b) its
    * hash-checked deterministic twin query where one exists (""
    * otherwise). [[Verify]] emits this as `rows_only.json` next to
    * `oracle_sql.json` and fails loudly if the two drift, so the
    * correctness gate can mechanically confirm that no query is
    * merely rows-counted without a named green test backing it.
    */
  def rowsOnlyInvariants: Map[String, (String, String)] = Map(
    // (q27/q37/q65 HLL forms graduated to oracled in r12: their
    // registered outputs carry exact references + deterministic
    // accuracy/algebra flags the DuckDB oracle bound-checks, so the
    // driver file itself shows hash-green for them now.)
    "s04_sim_ivf" -> (("DedupSimilaritySpec: ivf finds mostly the same " +
      "neighbors as brute force (recall sanity)", "s04b_ivf_route")),
    "s06_semantic_neardup" -> (("DedupSimilaritySpec: s06 cluster-blocked " +
      "near-dup: exact subset of ground truth with >=85% recall",
      "s06b_semantic_neardup")),
    "s07_semantic_survivors" -> (("DedupSimilaritySpec: s07 semantic " +
      "survivors: one representative per near-dup cluster, all unpaired " +
      "kept", "s07b_semantic_survivors")),
    "s08_pq_ann" -> (("DedupSimilaritySpec: s08 PQ+rerank: exact scores, " +
      "decent recall, deterministic codebooks", "s08b_pq_encode")),
    "s09_ivf_pq_ann" -> (("DedupSimilaritySpec: s09 composed IVF→PQ" +
      "→rerank: exact scores, recall, and strictly less scan work " +
      "than PQ-alone or IVF-alone", "s09b_ivf_pq_rerank")))
}
