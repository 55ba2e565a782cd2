package graft.tools

/** Measures the cost of a trailing global orderBy on scan-rooted
  * pipelines: RangePartitioning's bounds sampling executes the child
  * once BEFORE the shuffle write executes it again, so any expensive
  * per-row projection below the sort runs twice. For each family
  * representative this times the two shapes IN THE SAME SESSION,
  * interleaved (drift-immune A/B — the box's whole-run slow modes
  * documented in SCALE.md make cross-process comparisons useless):
  *   sortAfter  = op(docs).orderBy(id)   (the pre-r16 registration)
  *   sortBelow  = op(docs.orderBy(id))   (the r16 registration)
  * Identical rows, identical order; only the sampling pass's work
  * differs.
  */
object OrderCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.{DataFrame, functions => F}
    import F.col

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both shapes once, then alternate A,B,A,B,A,B and report
    // per-shape best — interleaving means any slow window hits both
    def ab(tag: String)(before: => DataFrame)(after: => DataFrame): Unit = {
      time(before); time(after)
      val bs = collection.mutable.ArrayBuffer.empty[Double]
      val as = collection.mutable.ArrayBuffer.empty[Double]
      (1 to 3).foreach { _ => bs += time(before); as += time(after) }
      println(f"ORDERCOST $tag%-22s before=${bs.min}%6.3f after=${as.min}%6.3f " +
        f"(runs b=${bs.map(t => f"$t%.3f").mkString(",")} a=${as.map(t => f"$t%.3f").mkString(",")})")
      System.gc(); Thread.sleep(500)
    }

    val docs = graft.Tables.documents(spark, dir)
    // Multimodal.assets is private; the synthetic mapping is one line
    val assets = docs.select(col("doc_id"),
      col("text").cast("binary").as("content"))
    import graft.operators.TextOps

    ab("t01_tokenStats") { TextOps.tokenStats(docs).orderBy("doc_id") } {
      TextOps.tokenStats(docs.orderBy("doc_id")) }
    ab("t04_fingerprint") {
      TextOps.fingerprint(docs, hashExpr = "md5(sh)").orderBy("doc_id") } {
      TextOps.fingerprint(docs.orderBy("doc_id"), hashExpr = "md5(sh)") }
    val injected = docs.withColumn("text",
      F.when(F.pmod(col("doc_id"), F.lit(3)) === 0,
        F.concat(col("text"), F.lit(" contact user"),
          col("doc_id").cast("string"),
          F.lit("@example.com or +1 555 123 4567 at 10.0.0."),
          F.pmod(col("doc_id"), F.lit(256)).cast("string")))
        .otherwise(col("text")))
    ab("t08_redactPii") { TextOps.redactPii(injected).orderBy("doc_id") } {
      TextOps.redactPii(docs.orderBy("doc_id").withColumn("text",
        F.when(F.pmod(col("doc_id"), F.lit(3)) === 0,
          F.concat(col("text"), F.lit(" contact user"),
            col("doc_id").cast("string"),
            F.lit("@example.com or +1 555 123 4567 at 10.0.0."),
            F.pmod(col("doc_id"), F.lit(256)).cast("string")))
          .otherwise(col("text")))) }
    ab("m07_byteEntropy") {
      graft.operators.Multimodal.byteEntropy(assets).orderBy("doc_id") } {
      graft.operators.Multimodal.byteEntropy(assets.orderBy("doc_id")) }
    // Batch-2 A/Bs (same drift-immune interleaving): the pre-r16 shape
    // is inlined as `before`, the registered operator is `after`.
    // t13 NEGATIVE result, kept as the measurement record: `before` is
    // the single-tokenize (pr, doc_id) pre-aggregate re-plan that was
    // tried and REJECTED (1.78 two-pass vs 2.04 pre-agg — the saved
    // tokenize pass costs less than the two exchanges the pre-agg
    // adds); `after` is the registered two-pass shape that stays.
    ab("t13_bigram") {
      val pairs = docs
        .withColumn("__toks", F.split(F.trim(F.lower(col("text"))), "\\s+"))
        .select(col("doc_id"), F.explode(F.expr(
          """zip_with(slice(__toks, 1, size(__toks) - 1),
                      slice(__toks, 2, size(__toks) - 1),
                      (a, b) -> concat(a, ' ', b))""")).as("pr"))
      val pd = pairs.groupBy("pr", "doc_id").agg(F.count(F.lit(1)).as("c"))
      val pc = pd.groupBy("pr").agg(F.sum("c").as("cp"))
      val cc = pc.withColumn("w1", F.substring_index(col("pr"), " ", 1))
        .groupBy("w1").agg(F.sum("cp").as("cw"))
      val model = pc.withColumn("w1", F.substring_index(col("pr"), " ", 1))
        .join(cc, "w1")
        .withColumn("st", F.expr(
          """CAST(round(ln(cw) * 1000000) AS BIGINT)
             - CAST(round(ln(cp) * 1000000) AS BIGINT)"""))
        .select("pr", "st")
      pd.join(F.broadcast(model), "pr")
        .groupBy("doc_id")
        .agg(F.sum("c").as("n_bigrams"),
          F.sum(col("st") * col("c")).as("sum_st"))
        .withColumn("avg_surprisal",
          col("sum_st").cast("double") / col("n_bigrams") / F.lit(1000000.0))
        .select("doc_id", "n_bigrams", "sum_st", "avg_surprisal")
    } { TextOps.bigramSurprisal(docs) }
    // t06: per-branch pruning of `tf` made the two tf subtrees
    // non-identical (no exchange reuse) — tokenize ran twice.
    ab("t06_tfidf") {
      graft.functions.AlphaTokens.register(spark)
      val toks = docs.select(col("doc_id"),
        F.explode(F.expr("alpha_tokens(lower(text), 4)")).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).as("tf"))
      val dfTab = tf.groupBy("tok").agg(F.count(F.lit(1)).as("df"))
      val nDocs = docs.agg(F.count(F.lit(1)).as("n_docs"))
      tf.join(dfTab, "tok")
        .crossJoin(F.broadcast(nDocs))
        .withColumn("idf", F.round(
          F.log((col("n_docs") + F.lit(1.0)) / (col("df") + F.lit(1.0))), 6))
        .withColumn("score", F.round(col("tf").cast("double") * col("idf"), 4))
        .withColumn("rnk", F.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy(col("score").desc, col("tok"))))
        .filter(col("rnk") <= 3)
        .select("doc_id", "tok", "tf", "df", "score", "rnk")
    } { TextOps.tfidfTopTerms(docs) }
    ab("q42_regex") {
      docs.withColumn("s_words",
          F.expr("regexp_extract_all(text, '\\\\bs[a-z]+', 0)"))
        .withColumn("n_s_words", F.size(col("s_words")).cast("long"))
        .withColumn("n_distinct_s", F.size(F.array_distinct(col("s_words"))).cast("long"))
        .withColumn("first_st", F.regexp_extract(col("text"), "\\b(st[a-z]+)", 1))
        .filter(col("n_s_words") >= 3)
        .select("doc_id", "n_s_words", "n_distinct_s", "first_st")
        .orderBy("doc_id") } {
      docs.orderBy("doc_id")
        .withColumn("s_words",
          F.expr("regexp_extract_all(text, '\\\\bs[a-z]+', 0)"))
        .withColumn("n_s_words", F.size(col("s_words")).cast("long"))
        .withColumn("n_distinct_s", F.size(F.array_distinct(col("s_words"))).cast("long"))
        .withColumn("first_st", F.regexp_extract(col("text"), "\\b(st[a-z]+)", 1))
        .filter(col("n_s_words") >= 3)
        .select("doc_id", "n_s_words", "n_distinct_s", "first_st") }
    spark.stop()
  }
}
