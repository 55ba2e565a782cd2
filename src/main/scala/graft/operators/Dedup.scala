package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Deduplication operators for LLM training-data pipelines (builder
  * brief): exact, normalized-exact, n-gram Jaccard, MinHash+LSH, and
  * SimHash — all over the `documents` table, all shuffle-conscious:
  *
  *  - Exact dedup is a single hash-aggregate on the dedup key (one
  *    shuffle, map-side partial agg).
  *  - Jaccard/MinHash/SimHash never do an unblocked O(n²) cross join:
  *    candidates come from equi-join blocking (shared shingle, LSH band
  *    bucket, simhash band), which Spark executes as a shuffled hash
  *    join on the block key — the only strategy that survives 100 TB.
  */
object Dedup {

  private val WS = "\\s+"

  /** doc_id + distinct 3-word shingles. element_at is 1-based, matching
    * DuckDB list indexing in the oracle twin.
    */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), split(trim(lower(col("text"))), WS).as("tokens"))
      .filter(size(col("tokens")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, size(tokens)-2), i -> " +
          "concat_ws(' ', element_at(tokens,i), element_at(tokens,i+1), element_at(tokens,i+2)))"))
        .as("shingles"))

  /** Exact pairwise Jaccard over a candidate pair set (doc_a, doc_b). */
  private def withJaccard(pairsInter: DataFrame, counts: DataFrame): DataFrame = {
    val ca = counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")
    val cb = counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")
    pairsInter.join(ca, "doc_a").join(cb, "doc_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
  }

  // MinHash family: h_i(x) = xxhash64(x, i) — i acts as the hash seed.
  // (A classic a*x+b mod 2^64 permutation would trip Spark 4's default
  // ANSI overflow checks; independent seeded hashes are equivalent for
  // MinHash and stay codegen'd.)
  private val NumPerms = 64
  private val Bands = 16
  private val RowsPerBand = NumPerms / Bands

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: group on the raw text. One shuffle; at 100 TB the
    // group key would be a 128-bit content hash, same plan shape.
    "d01_dedup_exact" -> ((s, dir) => {
      documents(s, dir)
        .groupBy("text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    }),

    // Normalized exact dedup: case-fold + strip non-alphanumerics first
    // (catches trivial formatting variants).
    "d02_dedup_exact_norm" -> ((s, dir) => {
      documents(s, dir)
        .withColumn("norm", trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
        .groupBy("norm")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    }),

    // Exact n-gram Jaccard near-dup pairs via LOSSLESS shared-shingle
    // blocking: any pair with J >= t shares at least one shingle, so the
    // shingle equi-join produces a superset of the answer and the exact
    // Jaccard filter finishes it. No cross join anywhere.
    "d03_dedup_ngram_jaccard" -> ((s, dir) => {
      val sh = shingled(s, dir)
      val counts = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"))
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      withJaccard(inter, counts)
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }),

    // MinHash + LSH banding: 64 perms, 16 bands × 4 rows. Candidates
    // come from band-bucket equi-joins; exact Jaccard verifies. The
    // scale path for d03 (bounded candidates per band instead of
    // shared-shingle fan-out). Hash family isn't SQL-expressible →
    // rows-only driver check; recall vs d03 asserted in DedupSpec.
    "d04_dedup_minhash" -> ((s, dir) => {
      val sh = shingled(s, dir)
      val counts = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"))
      val hashed = sh.select(col("doc_id"),
        expr("transform(shingles, x -> xxhash64(x))").as("hs"))
      val sigCols: Seq[Column] = (0 until NumPerms).map { i =>
        expr(s"array_min(transform(hs, h -> xxhash64(h, $i)))")
      }
      val sig = hashed.select(col("doc_id"), array(sigCols: _*).as("sig"))
      val bands = sig.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> " +
          s"xxhash64(concat_ws(',', transform(sequence(0, ${RowsPerBand - 1}), " +
          s"r -> sig[b * $RowsPerBand + r]))))")))
        .toDF("doc_id", "band", "bucket")
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
      val inter = cand
        .join(ex.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(ex.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .filter(col("sh_a") === col("sh_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("inter"))
      withJaccard(inter, counts)
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash near-dup pairs: 64-bit signature from token hashes; pairs
    // with Hamming distance <= 3. Blocking on 4 × 16-bit bands is
    // LOSSLESS for distance <= 3 (pigeonhole: 3 flipped bits touch at
    // most 3 of 4 bands), so the result is exact. Rows-only check.
    "d05_dedup_simhash" -> ((s, dir) => {
      val toks = documents(s, dir)
        .select(col("doc_id"), explode(split(trim(lower(col("text"))), WS)).as("tok"))
        .withColumn("h", xxhash64(col("tok")))
      val bitSums: Seq[Column] = (0 until 64).map { j =>
        sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"s$j")
      }
      val perDoc = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      val simhash = (0 until 64).map { j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      val sigs = perDoc.select(col("doc_id"), simhash.as("simhash"))
      val bands = sigs.select(col("doc_id"), col("simhash"),
        posexplode(expr("transform(sequence(0, 3), k -> (simhash >> (k * 16)) & 65535)")))
        .toDF("doc_id", "simhash", "band", "key")
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(expr("a.simhash").bitwiseXOR(expr("b.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    })
  )

  def oracles: Map[String, String] = Map(
    "d01_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",

    "d02_dedup_exact_norm" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents
         GROUP BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
         ORDER BY keep_id""",

    "d03_dedup_ngram_jaccard" ->
      """WITH docs AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tokens
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tokens)-2),
             i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingles
           FROM docs WHERE len(tokens) >= 3),
         counts AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
         ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b, inter / (ca.n_sh + cb.n_sh - inter) AS jaccard
         FROM pairs
         JOIN counts ca ON ca.doc_id = doc_a
         JOIN counts cb ON cb.doc_id = doc_b
         WHERE inter / (ca.n_sh + cb.n_sh - inter) >= 0.5
         ORDER BY doc_a, doc_b"""
  )
}
