package graft.tools

import org.apache.spark.sql.functions._

/** Derive a NON-CLIQUE scaled fixture for the output-bound similarity/
  * dedup families (r15 VERDICT item 5): [[MakeSfN]]'s byte-identical
  * replication turns every row into an N-clique of exact twins, so
  * threshold pair queries (SemDeDup s06/s07, SimHash d05) measure the
  * replication artifact on top of any genuine growth. This generator
  * replicates only the two tables those families read (documents,
  * embeddings) with a deterministic per-replica content perturbation
  * that preserves WITHIN-replica similarity structure exactly and
  * destroys CROSS-replica exact/near duplication:
  *
  *  - embeddings: per-(replica, dimension) SIGN FLIP, the parity of
  *    xxhash64(rep·64 + dim). Flipping both sides of a within-replica
  *    pair multiplies each product a_i·b_i by s_i² = 1, so every
  *    within-replica cosine is BIT-IDENTICAL to sf0.1's; a
  *    cross-replica pair sees independent ±1 products, collapsing to
  *    the isotropic background N(0, 1/64). (v1 of this tool used a
  *    circular shift — measured insufficient: the fixture embeddings
  *    carry enough autocorrelation that shifted copies stayed
  *    0.35-correlated. Sign flips decorrelate regardless of spectrum.)
  *  - documents: append "_r<rep>" to every whitespace token. Token
  *    equality within a replica is preserved exactly (every token
  *    carries the same suffix), so shingle/token/SimHash relations
  *    match sf0.1's; across replicas NO token is shared. (v1 rotated
  *    the word order — measured a no-op for d05: unigram SimHash is
  *    order-invariant, so rotated replicas kept identical signatures.)
  *
  * No RNG anywhere (both perturbations are pure functions of replica
  * index), so the fixture is reproducible and DuckDB-readable. The
  * CHANCE tail is deliberately untouched: at a grazing threshold t,
  * isotropic 64-d cosines exceed t with probability P(z > t·8) (σ =
  * 1/√64), so the qualifying-pair relation has an irreducible
  * ~C(n,2)·P term no fixture design can remove — the probe's point is
  * to measure that term separately from the clique term.
  *
  * Usage: runMain graft.tools.MakeSfNDistinct <replicas> <dstDir>
  */
object MakeSfNDistinct {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: MakeSfNDistinct <replicas> <dstDir>")
    val replicas = args(0).toInt
    val dst = args(1)
    val spark = ProbeSession()
    val src = "/root/testdata/sf0.1"
    val stride = 10000000L

    val idx = spark.range(0, replicas.toLong).select(col("id").as("__rep"))

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val embN = emb.crossJoin(idx)
      .withColumn("vec_id", col("vec_id") + col("__rep") * lit(stride))
      .withColumn("embedding", expr(
        s"transform(sequence(0, $dim - 1), i -> element_at(embedding, i + 1) * " +
          s"CAST(1 - 2 * pmod(xxhash64(__rep * $dim + i), 2) AS DOUBLE))"))
      .drop("__rep")
    embN.repartition(math.max(2, replicas / 5)).write.mode("overwrite")
      .parquet(s"$dst/embeddings.parquet")
    println(s"SFND embeddings: ${spark.read.parquet(s"$dst/embeddings.parquet").count()} rows")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docsN = docs.crossJoin(idx)
      .withColumn("doc_id", col("doc_id") + col("__rep") * lit(stride))
      .withColumn("text", concat_ws(" ", expr(
        "transform(split(text, ' '), w -> concat(w, '_r', CAST(__rep AS STRING)))")))
      .drop("__rep")
    docsN.repartition(math.max(2, replicas / 5)).write.mode("overwrite")
      .parquet(s"$dst/documents.parquet")
    println(s"SFND documents: ${spark.read.parquet(s"$dst/documents.parquet").count()} rows")
  }
}
