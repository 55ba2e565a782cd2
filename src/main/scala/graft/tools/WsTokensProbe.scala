package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sizes the `split(trim(lower(text)), "\\s+")` regex cost on the
  * documents corpus — the tokenization step under 21 call sites
  * (t04/t05/t07/t13, the shingle pipeline, p01…) — against the native
  * byte-scan floor, to decide whether a native ws tokenizer is worth
  * its subtle Java-split edge semantics (leading empty token after a
  * non-space-ws head, trailing empties dropped, [""] for empty).
  *
  * VERDICT: measured and REJECTED at sf1 — the full-corpus split pass
  * is 0.29 s vs the 0.21 s allocation-free native-count floor, so the
  * regex engine costs ~0.08 s across the whole corpus here (a simple
  * one-class pattern stays in Pattern's fast path, unlike the
  * alternation-heavy extract-all patterns that motivated
  * char_class_count / alpha_tokens). Nothing to win.
  */
object WsTokensProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/repo/target/sf1")
    def best3(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"BEST  $label%-34s ${ts.min}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    graft.functions.CharClassCount.register(spark)
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
      .persist()
    docs.count()
    // scan floor: native counter (no alloc)
    best3("floor native count")(
      noop(docs.select(expr("char_class_count(text, 'alpha_runs')").as("c"))
        .agg(sum("c"))))
    // the split itself, result size only (array still materializes)
    best3("split size only")(
      noop(docs.select(size(split(trim(lower(col("text"))), "\\s+")).as("c"))
        .agg(sum("c"))))
    docs.unpersist()
    spark.stop()
  }
}
