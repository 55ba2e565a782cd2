package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage breakdown for t13 (bigram surprisal), the r12 VERDICT item-3
  * suspect: its sf1 ratio (5.4× at 10× data) is the steepest of the
  * text family and its cost model was documented at sf0.1 only. The
  * probe times each sub-plan of [[graft.operators.TextOps
  * .bigramSurprisal]] in isolation under Bench's conditions, so the
  * 5.4× attributes to a named stage rather than a guess:
  *
  *   pairs     — normalize + split + zip_with explode (the corpus
  *               scan; one row per bigram occurrence);
  *   pc        — pairs → groupBy(pr).count (bigram LM counts);
  *   model     — pc → w1 extract + context join (tiny on the fixture:
  *               vocabulary ~31 tokens → ≤961 distinct bigrams);
  *   full      — the registered query end-to-end;
  *   full-hint — end-to-end with an explicit broadcast hint on the
  *               model side of the per-occurrence join, to measure
  *               whether AQE already makes that choice at runtime.
  *
  * Also prints the formatted plan of the final join so the chosen
  * strategy (broadcast vs sort-merge) is pinned, not inferred.
  */
object T13Probe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/repo/target/sf1")
    import graft.operators.TextOps

    def docs: DataFrame = graft.Tables.documents(spark, dir)
    val WS = "\\s+"
    def pairs: DataFrame = docs
      .withColumn("__toks", split(trim(lower(col("text"))), WS))
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(__toks, 1, size(__toks) - 1),
                    slice(__toks, 2, size(__toks) - 1),
                    (a, b) -> concat(a, ' ', b))""")).as("pr"))
    def pc: DataFrame = pairs.groupBy("pr").agg(count(lit(1)).as("cp"))
    def cc: DataFrame = pc.withColumn("w1", substring_index(col("pr"), " ", 1))
      .groupBy("w1").agg(sum("cp").as("cw"))
    def model: DataFrame = pc.withColumn("w1", substring_index(col("pr"), " ", 1))
      .join(cc, "w1")
      .withColumn("st", expr(
        """CAST(round(ln(cw) * 1000000) AS BIGINT)
           - CAST(round(ln(cp) * 1000000) AS BIGINT)"""))
      .select("pr", "st")
    def fullOf(m: DataFrame): DataFrame = pairs.join(m, "pr")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("st").as("sum_st"))
      .withColumn("avg_surprisal",
        col("sum_st").cast("double") / col("n_bigrams") / lit(1000000.0))
      .select("doc_id", "n_bigrams", "sum_st", "avg_surprisal")
    def fullHint: DataFrame = fullOf(broadcast(model))
    def fullNoHint: DataFrame = fullOf(model)

    def timed(label: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"T13PROBE $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    println(s"T13PROBE corpus rows=${docs.count()} " +
      s"bigram_occurrences=${pairs.count()} distinct_bigrams=${pc.count()}")
    timed("pairs")(pairs)
    timed("pc")(pc)
    timed("model")(model)
    timed("full")(TextOps.queries("t13_bigram_surprisal")(spark, dir))
    timed("full-nohint")(fullNoHint)
    timed("full-hint")(fullHint)
    timed("full-sorted")(fullHint.orderBy("doc_id"))
    TextOps.queries("t13_bigram_surprisal")(spark, dir).explain("formatted")
    spark.stop()
  }
}
