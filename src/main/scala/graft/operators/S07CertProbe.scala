package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import F.{broadcast, coalesce, col, count, lit, sum, when}

/** Drift-immune same-session A/B for the s07 certification re-plan
  * (OrderCostProbe's interleaving, specialized to the operator's
  * package-private pair artifact): `before` is the r16 first-cut
  * full_outer phantom join (no broadcast plan exists for full outer,
  * so the corpus rides a SortMergeJoin exchange + sort), `after` is
  * the registered two-left-join + |drops| − |drops ∩ corpus| form.
  * Run: SF_DIR=... tools/run.sh graft.operators.S07CertProbe
  */
object S07CertProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.tools.ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def fullOuterForm(): DataFrame = {
      val pairs = Similarity.semPairs(spark, dir).select(col("id_a"), col("id_b"))
      val drops = Dedup.connectedComponents(pairs)
        .filter(col("label") < col("id"))
        .select(col("id").as("vec_id")).withColumn("__d", lit(1))
      val all = graft.Tables.embeddings(spark, dir).select("vec_id")
      val paired = pairs.select(col("id_a").as("vec_id"))
        .unionByName(pairs.select(col("id_b").as("vec_id"))).distinct()
        .withColumn("__p", lit(1))
      val annotated = all.withColumn("__a", lit(1))
        .join(paired, Seq("vec_id"), "left")
        .join(drops, Seq("vec_id"), "full_outer")
      val pairBothKept = pairs
        .join(drops.toDF("id_a", "__da"), Seq("id_a"), "left")
        .join(drops.toDF("id_b", "__db"), Seq("id_b"), "left")
        .agg(coalesce(sum(when(col("__da").isNull && col("__db").isNull, 1)
          .otherwise(0)), lit(0L)).as("n_pairs_fully_kept"))
      annotated.agg(
          coalesce(sum(when(col("__a").isNotNull, 1).otherwise(0)), lit(0L))
            .as("n_vectors"),
          coalesce(sum(when(col("__p").isNull && col("__d").isNotNull, 1)
            .otherwise(0)), lit(0L)).as("n_unpaired_dropped"),
          coalesce(sum(when(col("__a").isNull, 1).otherwise(0)), lit(0L))
            .as("n_phantom"))
        .crossJoin(pairBothKept)
        .select(col("n_vectors"),
          (col("n_pairs_fully_kept") === 0).as("no_pair_fully_kept"),
          (col("n_unpaired_dropped") === 0).as("unpaired_all_kept"),
          (col("n_phantom") === 0).as("survivors_subset_of_corpus"))
    }
    def registered(): DataFrame =
      Similarity.queries("s07_semantic_survivors")(spark, dir)

    // r15 shape (third reference point): survivor-relation anti-join
    // referenced three times.
    def r15Form(): DataFrame = {
      val pairs = Similarity.semPairs(spark, dir).select(col("id_a"), col("id_b"))
      val surv = Dedup.keepRepresentatives(
          graft.Tables.embeddings(spark, dir).select("vec_id", "label"),
          pairs, idCol = "vec_id")
        .select(col("vec_id")).withColumn("__s", lit(1))
      val all = graft.Tables.embeddings(spark, dir).select("vec_id")
      val paired = pairs.select(col("id_a").as("vec_id"))
        .unionByName(pairs.select(col("id_b").as("vec_id"))).distinct()
        .withColumn("__p", lit(1))
      val annotated = all
        .join(paired, Seq("vec_id"), "left")
        .join(surv, Seq("vec_id"), "left")
      val pairBothKept = pairs
        .join(surv.withColumnRenamed("vec_id", "id_a"), Seq("id_a"))
        .join(surv.toDF("id_b", "__s2"), Seq("id_b"))
        .agg(count(lit(1)).as("n_pairs_fully_kept"))
      val phantom = surv.join(all.withColumn("__a", lit(1)), Seq("vec_id"), "left")
        .agg(coalesce(sum(when(col("__a").isNull, 1).otherwise(0)), lit(0L))
          .as("n_phantom"))
      annotated.agg(
          count(lit(1)).as("n_vectors"),
          coalesce(sum(when(col("__p").isNull && col("__s").isNull, 1)
            .otherwise(0)), lit(0L)).as("n_unpaired_dropped"))
        .crossJoin(pairBothKept).crossJoin(phantom)
        .select(col("n_vectors"),
          (col("n_pairs_fully_kept") === 0).as("no_pair_fully_kept"),
          (col("n_unpaired_dropped") === 0).as("unpaired_all_kept"),
          (col("n_phantom") === 0).as("survivors_subset_of_corpus"))
    }

    // v4: the left-join form with NO count-gate job and NO manual
    // hints — AQE runtime-broadcasts the tiny sides the same way it
    // does for the r15 anti-join references.
    def plainLeftForm(): DataFrame = {
      val pairs = Similarity.semPairs(spark, dir).select(col("id_a"), col("id_b"))
      val drops = Dedup.connectedComponents(pairs)
        .filter(col("label") < col("id"))
        .select(col("id").as("vec_id")).withColumn("__d", lit(1))
      val all = graft.Tables.embeddings(spark, dir).select("vec_id")
      val paired = pairs.select(col("id_a").as("vec_id"))
        .unionByName(pairs.select(col("id_b").as("vec_id"))).distinct()
        .withColumn("__p", lit(1))
      val annotated = all
        .join(paired, Seq("vec_id"), "left")
        .join(drops, Seq("vec_id"), "left")
      val pairBothKept = pairs
        .join(drops.toDF("id_a", "__da"), Seq("id_a"), "left")
        .join(drops.toDF("id_b", "__db"), Seq("id_b"), "left")
        .agg(coalesce(sum(when(col("__da").isNull && col("__db").isNull, 1)
          .otherwise(0)), lit(0L)).as("n_pairs_fully_kept"))
      val nDrops = drops.agg(count(lit(1)).as("n_drops"))
      annotated.agg(
          count(lit(1)).as("n_vectors"),
          coalesce(sum(when(col("__p").isNull && col("__d").isNotNull, 1)
            .otherwise(0)), lit(0L)).as("n_unpaired_dropped"),
          coalesce(sum(when(col("__d").isNotNull, 1).otherwise(0)), lit(0L))
            .as("n_drops_in_corpus"))
        .crossJoin(pairBothKept)
        .crossJoin(broadcast(nDrops))
        .select(col("n_vectors"),
          (col("n_pairs_fully_kept") === 0).as("no_pair_fully_kept"),
          (col("n_unpaired_dropped") === 0).as("unpaired_all_kept"),
          (col("n_drops") === col("n_drops_in_corpus"))
            .as("survivors_subset_of_corpus"))
    }

    // warm all four, then interleave
    time(fullOuterForm()); time(r15Form()); time(registered()); time(plainLeftForm())
    val fo = collection.mutable.ArrayBuffer.empty[Double]
    val r15 = collection.mutable.ArrayBuffer.empty[Double]
    val reg = collection.mutable.ArrayBuffer.empty[Double]
    val pl = collection.mutable.ArrayBuffer.empty[Double]
    (1 to 3).foreach { _ =>
      fo += time(fullOuterForm()); r15 += time(r15Form())
      reg += time(registered()); pl += time(plainLeftForm())
      System.gc(); Thread.sleep(500)
    }
    def f(xs: Seq[Double]) = xs.map(t => f"$t%.3f").mkString(",")
    println(f"S07AB full_outer=${fo.min}%6.3f r15_antijoin=${r15.min}%6.3f registered=${reg.min}%6.3f plain_left=${pl.min}%6.3f " +
      f"(runs fo=${f(fo.toSeq)} r15=${f(r15.toSeq)} reg=${f(reg.toSeq)} pl=${f(pl.toSeq)})")
    spark.stop()
  }
}
