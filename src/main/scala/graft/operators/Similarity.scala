package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Embedding similarity search over the `embeddings` table
  * (64-dim unit-normalized float vectors → cosine == dot product).
  *
  * All dot products are computed after casting to array<double> with a
  * sequential left fold (`aggregate(zip_with(...))`), which matches
  * DuckDB's `list_dot_product` on DOUBLE[] element order exactly —
  * required for bitwise oracle parity.
  *
  * Scale story (100 TB): s01/s03 are the exact baselines (quadratic in
  * candidates but blocked per query / per threshold); s02 is the scale
  * path — sign-LSH bucketing turns the all-pairs problem into an
  * equi-join on bucket ids, the same plan shape MinHash gives Dedup.
  */
object Similarity {

  private def dot(a: String, b: String): Column = expr(s"vector_dot($a, $b)")

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorDot.register(s)
    embeddings(s, dir).select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
  }

  // Sign-LSH: 8 tables × 8 seeded ±1 hyperplanes over 64 dims. Multiple
  // short codes trade precision for recall — one 16-bit code almost
  // never collides on near-random vectors.
  private val LshTables = 8
  private val BitsPerTable = 8
  private val Dim = 64
  // IVF: 16 cells, probe the 4 nearest (unit vectors → max dot = nearest).
  private val IvfCells = 16
  private val IvfNProbe = 4
  private val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(LshTables * BitsPerTable)(
      Seq.fill(Dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force exact cosine top-k: 10 probe vectors × all candidates.
    // The probe side is tiny → broadcast; no shuffle of the corpus.
    "s01_sim_bruteforce_topk" -> ((s, dir) => {
      val e = vecs(s, dir)
      val q = e.select(col("vec_id").as("qid"), col("v").as("qv")).filter(col("qid") < 10)
      val c = e.select(col("vec_id").as("cid"), col("v").as("cv"))
      val scored = c.crossJoin(broadcast(q))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), dot("qv", "cv").as("score"))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("qid", "cid", "rnk", "score")
        .orderBy("qid", "rnk")
    }),

    // Approximate NN via sign-LSH bucketing: probes only compare against
    // candidates landing in the same 16-bit bucket. Recall vs s01 is
    // asserted in SimilaritySpec; hash family isn't SQL-expressible →
    // rows-only driver check.
    "s02_sim_ann_lsh" -> ((s, dir) => {
      val planesCol = typedLit(planes)
      // One row per (vector, table): bucket = that table's 8-bit code.
      val e = vecs(s, dir).withColumn("planes", planesCol)
        .withColumn("bits", expr(
          "transform(planes, p -> CASE WHEN vector_dot(p, v) > 0D THEN 1 ELSE 0 END)"))
        .withColumn("tbl", explode(expr(s"sequence(0, ${LshTables - 1})")))
        .withColumn("bucket", expr(
          s"aggregate(slice(bits, tbl * $BitsPerTable + 1, $BitsPerTable), 0, (acc, b) -> acc * 2 + b)"))
        .select(col("vec_id"), col("v"), col("tbl"), col("bucket"))
      val q = e.select(col("vec_id").as("qid"), col("v").as("qv"),
        col("tbl"), col("bucket")).filter(col("qid") < 10)
      val c = e.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("tbl"), col("bucket"))
      val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
        .filter(col("qid") =!= col("cid"))
        .dropDuplicates("qid", "cid")
        .select(col("qid"), col("cid"), dot("qv", "cv").as("score"))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("qid", "cid", "rnk", "score")
        .orderBy("qid", "rnk")
    }),

    // IVF (inverted-file) ANN: KMeans coarse quantizer (seeded,
    // deterministic), vectors bucketed by nearest centroid, probes
    // search only their nprobe closest cells. The clustered-partition
    // scale path complementing s02's hash-bucket path: at 100 TB the
    // cell assignment is a write-time partition key, so a probe reads
    // nprobe partitions instead of the corpus. Rows-only driver check;
    // recall vs s01 asserted in DedupSimilaritySpec.
    "s04_sim_ivf" -> ((s, dir) => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val e = vecs(s, dir).withColumn("fv", array_to_vector(col("v")))
      // few iterations: the quantizer only needs rough cells, and
      // training cost is per-query here
      val model = new KMeans().setK(IvfCells).setSeed(42).setMaxIter(5)
        .setFeaturesCol("fv").setPredictionCol("cell").fit(e)
      val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.toSeq)
      }.toSeq
      val cents = s.createDataFrame(centroids).toDF("cell", "cv")
        .withColumn("cv", col("cv").cast("array<double>"))
      val assigned = model.transform(e).select(col("vec_id"), col("v"), col("cell"))
      // each probe ranks centroids and keeps its nprobe closest cells
      val q = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val wCell = Window.partitionBy(col("qid")).orderBy(col("cdist").desc, col("cell"))
      val probeCells = q.crossJoin(broadcast(cents))
        .withColumn("cdist", dot("qv", "cv"))
        .withColumn("crk", row_number().over(wCell))
        .filter(col("crk") <= IvfNProbe)
        .select(col("qid"), col("qv"), col("cell"))
      val scored = assigned.join(broadcast(probeCells), Seq("cell"))
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("cid"), dot("qv", "v").as("score"))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("qid", "cid", "rnk", "score")
        .orderBy("qid", "rnk")
    }),

    // Per-label centroid via the typed VectorAvg Aggregator (UDAF
    // surface); long-form output for the oracle.
    "s05_label_centroid" -> ((s, dir) => labelCentroid(s, dir)),

    // Embedding-cosine near-duplicate pairs above a threshold — the
    // embedding-space variant of Dedup. Exact all-pairs here (correct
    // baseline); at scale the LSH bucket join of s02 prunes candidates.
    "s03_embed_neardup" -> ((s, dir) => {
      val e = vecs(s, dir)
      val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), dot("va", "vb").as("cosine"))
        .filter(col("cosine") >= 0.35)
        .orderBy("id_a", "id_b")
    })
  )

  /** queries entry: per-label centroid via the typed [[graft.functions.VectorAvg]]
    * Aggregator (UDAF surface), emitted long-form for the oracle.
    */
  private def labelCentroid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir).select(col("label"), col("v")).as[(Int, Array[Double])]
    e.groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.VectorAvg.toColumn)
      .toDF("label", "centroid")
      .select(col("label"), posexplode(col("centroid")))
      .select(col("label"), (col("pos") + 1).as("dim"),
        round(col("col"), 6).as("cval"))
      .orderBy("label", "dim")
  }

  def oracles: Map[String, String] = Map(
    "s01_sim_bruteforce_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
         d AS (SELECT qid, cid, list_dot_product(qv, cv) AS score
               FROM c, q WHERE qid != cid),
         r AS (SELECT qid, cid, score,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk
               FROM d)
         SELECT qid, cid, rnk, score FROM r WHERE rnk <= 5 ORDER BY qid, rnk""",

    "s05_label_centroid" ->
      """SELECT label, CAST(dim AS INTEGER) AS dim, ROUND(AVG(v), 6) AS cval
         FROM (SELECT label,
                 unnest(embedding::DOUBLE[]) AS v,
                 generate_subscripts(embedding, 1) AS dim
               FROM embeddings) x
         GROUP BY label, dim ORDER BY label, dim""",

    "s03_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.v, b.v) AS cosine
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_dot_product(a.v, b.v) >= 0.35
         ORDER BY id_a, id_b"""
  )
}
