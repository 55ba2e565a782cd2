package graft.tools

import org.apache.spark.sql.functions._

/** End-to-end LLM training-data pipeline over the public df-in/df-out
  * operator surface — the composition a user of the library actually
  * runs, chained from raw corpus to packed training sequences:
  *
  *   quality screen → near-dup dedup (keep one per cluster) →
  *   benchmark decontamination → stratified mixture sampling →
  *   train/val/test split → per-stratum sequence packing
  *
  * Every stage is a DataFrame transformation from the operator
  * families the gate verifies individually (p05, d03+d08, d07, p02,
  * p04, p01); this main proves they compose — schemas line up, counts
  * fall monotonically through the filters, and the whole chain runs
  * in one Spark job graph. Run:
  *
  *   sbt "runMain graft.tools.PipelineDemo [sfDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = ProbeSession.fixedCores(8, logLevel = "ERROR")
    import graft.operators.{Dedup, Pipeline}

    // Each stage is persisted before its count: the funnel runs seven
    // actions, and without pinning, stage k's lineage (quality join,
    // shingle self-join, components, anti joins) would re-execute in
    // every later action — the demo would measure recomputation, not
    // the pipeline.
    def pin(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      df.persist(); df
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val n0 = docs.count()

    // 1. Quality screen (p05): rule-based keep flags, then filter.
    val quality = Pipeline.qualityFilter(docs)
    val kept = pin(docs.join(quality.filter(col("keep")).select("doc_id"), "doc_id"))
    val n1 = kept.count()

    // 2. Near-dup dedup (d03 pairs → d08 survivors): one representative
    //    per exact-Jaccard cluster.
    val pairs = Dedup.nearDupPairs(kept, "doc_id", "text")
      .select("doc_a", "doc_b")
    val deduped = pin(Dedup.keepRepresentatives(kept, pairs))
    val n2 = deduped.count()

    // 3. Benchmark decontamination (d07): screen against a held-out
    //    "eval suite" (every 10th doc here) and drop high overlap.
    val benchmark = docs.filter(col("doc_id") % 10 === 0)
    val corpus = deduped.filter(col("doc_id") % 10 =!= 0)
    val contam = Dedup.decontaminate(corpus, benchmark)
      .filter(col("contamination") > 0.5).select("doc_id")
    val clean = pin(corpus.join(contam, Seq("doc_id"), "left_anti"))
    val n3 = clean.count()

    // 4. Mixture sampling (p02): downweight the dominant language.
    val sampled = pin(clean.join(
      Pipeline.sampleStratified(clean, rates = Map("en" -> 49152),
        defaultRate = 65536, strataCol = "lang").select("doc_id"), "doc_id"))
    val n4 = sampled.count()

    // 5. Split assignment (p04): content-hash train/val/test.
    val splits = Pipeline.splitAssign(sampled, testRate = 3277, valRate = 3277)
    val train = pin(sampled.join(
      splits.filter(col("split") === "train").select("doc_id"), "doc_id"))
    val n5 = train.count()

    // 6. Sequence packing (p01): per-language token-budget bins.
    val packed = Pipeline.packSequences(train, budget = 512, strataCol = "lang")
    val nBins = packed.select("lang", "bin").distinct().count()

    println(s"PIPELINE corpus=$n0 quality=$n1 deduped=$n2 decontaminated=$n3 " +
      s"sampled=$n4 train=$n5 packs=$nBins")
    val ok = n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4 && n4 >= n5 &&
      n5 > 0 && nBins > 0
    println(s"PIPELINE_OK=$ok")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
