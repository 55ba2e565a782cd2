package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Count-min sketch: mergeable fixed-size frequency estimation — the
  * third member of the deterministic-sketch family (q37 HLL counts
  * distincts, q38 histograms answer quantiles, q50 CMS answers "how
  * often does key k occur" with `d × w` counters regardless of key
  * cardinality).
  *
  * 100 TB story: the sketch is ONE map-side-combinable aggregate whose
  * state is at most d×w longs per partition (here 4×1024 = 32 KB);
  * partial sketches MERGE by adding counters (associative, proven in
  * SketchAndFormatSpec), so per-shard/per-day sketches roll up without
  * rescanning anything — the q37/q38 pre-aggregate-then-merge pattern.
  * Estimates never undercount (min over d rows of an overcounted
  * bucket), overcount by at most the collisions in the lightest row.
  *
  * Determinism/oracle: rows hash with the d04 affine family over the
  * cross-engine 60-bit md5 hash ([[Dedup.sharedHash60]]) — the (a, b)
  * literals embed in the DuckDB oracle, which rebuilds the identical
  * counters and estimates, so the registered q50 is hash-checked
  * end-to-end even though it is a sketch.
  */
object Sketch {

  private val P = 2147483647L // 2^31 − 1, products stay < 2^62 (ANSI-safe)
  private[operators] val CmsRows = 4
  private[operators] val CmsWidth = 1024

  // One affine map (a·h31 + b) mod P per CMS row — universal hashing,
  // seeded independently of d04's permutation family.
  private[operators] val cmsSeeds: Seq[(Long, Long)] = {
    val r = new scala.util.Random(20260850L)
    Seq.fill(CmsRows)(
      (1L + r.nextInt(Int.MaxValue - 1).toLong, r.nextInt(Int.MaxValue).toLong))
  }

  // ONE definition of the cross-engine hash: Dedup.sharedHash60 is the
  // single Scala twin of the oracle's '0x'||substr(md5(x),1,15) cast —
  // re-implementing it here would let the two silently desync.
  private def h31(c: org.apache.spark.sql.Column) =
    Dedup.sharedHash60(c) % P

  private def bucketExpr(row: Int) = {
    val (a, b) = cmsSeeds(row)
    ((col("__h") * a + b) % P) % CmsWidth
  }

  /** Build a count-min sketch over `items(keyCol)`: one row per
    * non-empty (row, bucket) with its counter. ONE hash aggregate with
    * map-side combine; ≤ d×w output rows total. Merge two sketches by
    * unioning and summing `cnt` on (row, bucket) — see [[cmsMerge]].
    */
  def cmsBuild(items: DataFrame, keyCol: String): DataFrame = {
    val rows = (0 until CmsRows).map { i =>
      struct(lit(i).as("row"), bucketExpr(i).as("bucket"))
    }
    items.select(h31(col(keyCol)).as("__h"))
      .select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge partial sketches (counters add — the mergeable-rollup path:
    * per-shard/per-day partials combine without touching raw data).
    */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "cmsMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
  }

  /** Point estimates for each distinct key in `keys(keyCol)`: min over
    * the d rows of that key's counter. The sketch is tiny (≤ d×w rows)
    * and broadcast onto the key stream; the only exchange is the final
    * per-key min aggregate (map-side combined — duplicate keys collapse
    * before the shuffle). CMS guarantee: estimate ≥ true count, always.
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val rows = (0 until CmsRows).map { i =>
      struct(lit(i).as("row"), bucketExpr(i).as("bucket"))
    }
    keys.select(col(keyCol).as("key"))
      .withColumn("__h", h31(col("key")))
      .select(col("key"), explode(array(rows: _*)).as("rb"))
      .select(col("key"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Heavy hitters over the corpus token stream: CMS estimates joined
    // with the exact counts (top 20 by estimate). Hash-checked — the
    // oracle rebuilds the same counters from the shared affine
    // literals; the exact column doubles as an in-gate proof that the
    // estimate never undercounts.
    "q50_freq_sketch" -> ((s, dir) => {
      val toks = documents(s, dir)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
      val sketch = cmsBuild(toks, "tok")
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      // probe with the already-aggregated vocabulary, not the raw
      // token stream — the third scan+tokenize of documents would
      // otherwise re-execute (Spark doesn't materialize common
      // subplans; the measured shingle-table pitfall)
      cmsEstimate(sketch, exact.select("tok"), "tok")
        .withColumnRenamed("key", "tok")
        .join(exact, "tok")
        .orderBy(col("est").desc, col("tok"))
        .limit(20)
        .select("tok", "est", "exact")
    })
  )

  def oracles: Map[String, String] = {
    val seedVals = cmsSeeds.zipWithIndex
      .map { case ((a, b), i) => s"($i, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
      .mkString(", ")
    Map(
      "q50_freq_sketch" ->
        s"""WITH seeds(r, a, b) AS (VALUES $seedVals),
           toks AS (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
                    FROM documents),
           t AS (SELECT tok,
                   ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2147483647 AS h
                 FROM toks WHERE tok != ''),
           cells AS (SELECT s.r AS row, ((t.h * s.a + s.b) % 2147483647) % $CmsWidth AS bucket
                     FROM t CROSS JOIN seeds s),
           sketch AS (SELECT row, bucket, COUNT(*) AS cnt
                      FROM cells GROUP BY 1, 2),
           est AS (SELECT t.tok,
                     MIN(sk.cnt) AS est
                   FROM (SELECT DISTINCT tok, h FROM t) t
                   CROSS JOIN seeds s
                   JOIN sketch sk
                     ON sk.row = s.r
                    AND sk.bucket = ((t.h * s.a + s.b) % 2147483647) % $CmsWidth
                   GROUP BY t.tok),
           exact AS (SELECT tok, COUNT(*) AS exact FROM t GROUP BY tok)
           SELECT e.tok, CAST(e.est AS BIGINT) AS est,
             CAST(x.exact AS BIGINT) AS exact
           FROM est e JOIN exact x USING (tok)
           ORDER BY est DESC, tok LIMIT 20"""
    )
  }
}
