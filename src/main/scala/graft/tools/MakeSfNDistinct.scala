package graft.tools

import org.apache.spark.sql.functions._

/** Derive a NON-CLIQUE scaled fixture for the output-bound similarity/
  * dedup families (r15 VERDICT item 5): [[MakeSfN]]'s byte-identical
  * replication turns every self-similar row into an N-clique, so the
  * qualifying-pair relation of threshold queries (s07-family SemDeDup,
  * d05 SimHash) grows ~quadratically in N — a FIXTURE artifact, not
  * engine behavior. This generator replicates only the two tables
  * those families read (documents, embeddings) with a deterministic
  * per-replica content perturbation that preserves WITHIN-replica
  * similarity structure exactly and destroys CROSS-replica similarity:
  *
  *  - embeddings: circular-shift the 64-dim vector by (rep mod 64)
  *    positions. A shift is an orthonormal permutation, so norms and
  *    all within-replica cosines are bit-identical to sf0.1's, while
  *    a shifted vs differently-shifted pair decorrelates to the
  *    corpus's near-isotropic background (measured < the 0.35/0.8
  *    thresholds for all but chance pairs).
  *  - documents: rotate the word sequence by (rep mod n_words) words.
  *    Within a replica every doc pair keeps its exact shingle/token
  *    relation; across replicas the k-shingle sets shift out of
  *    alignment, collapsing Jaccard/SimHash agreement.
  *
  * No RNG anywhere (the perturbation is a pure function of replica
  * index), so the fixture is reproducible and DuckDB-readable for
  * oracle checks. True growth at N replicas is then ~N× pairs
  * (each replica contributes its own sf0.1 pair structure) — the
  * linear yardstick the clique fixture can't provide.
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
        s"transform(sequence(0, $dim - 1), " +
          s"i -> element_at(embedding, CAST((i + __rep % $dim) % $dim AS INT) + 1))"))
      .drop("__rep")
    embN.repartition(math.max(2, replicas / 5)).write.mode("overwrite")
      .parquet(s"$dst/embeddings.parquet")
    println(s"SFND embeddings: ${spark.read.parquet(s"$dst/embeddings.parquet").count()} rows")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docsN = docs.crossJoin(idx)
      .withColumn("doc_id", col("doc_id") + col("__rep") * lit(stride))
      .withColumn("__w", split(col("text"), " "))
      .withColumn("__r", (col("__rep") % greatest(size(col("__w")), lit(1))).cast("int"))
      .withColumn("text", concat_ws(" ", flatten(array(
        expr("slice(__w, __r + 1, size(__w) - __r)"),
        expr("slice(__w, 1, __r)")))))
      .drop("__rep", "__w", "__r")
    docsN.repartition(math.max(2, replicas / 5)).write.mode("overwrite")
      .parquet(s"$dst/documents.parquet")
    println(s"SFND documents: ${spark.read.parquet(s"$dst/documents.parquet").count()} rows")
  }
}
