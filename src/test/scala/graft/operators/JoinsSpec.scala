package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class JoinsSpec extends SparkSuite {

  test("salted join returns exactly the plain join's rows on a skewed key") {
    // events.user_id is the join key; synthesize skew by folding most
    // keys onto one hot key.
    val ev = Tables.events(spark, sf("sf0.001"))
      .withColumn("k", when(col("user_id") % 4 === 0, 0L).otherwise(col("user_id")))
      .select("event_id", "k", "value")
    val dim = ev.select(col("k")).distinct()
      .withColumn("tag", concat(lit("dim-"), col("k")))

    val plain = ev.join(dim, Seq("k"))
      .select("event_id", "k", "tag").orderBy("event_id").collect().toSeq
    val salted = Joins.saltedInnerJoin(ev, dim, Seq("k"), salts = 8,
        saltSource = col("event_id"))
      .select("event_id", "k", "tag").orderBy("event_id").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salt column does not leak into the output schema") {
    val ev = Tables.events(spark, sf("sf0.001")).select("event_id", "user_id")
    val dim = ev.select(col("user_id")).distinct().withColumn("t", lit(1))
    val out = Joins.saltedInnerJoin(ev, dim, Seq("user_id"), 4, col("event_id"))
    assert(!out.columns.contains("__salt"))
  }
}
