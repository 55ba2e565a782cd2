package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a named subset of SparkEntry.queries WITHOUT Bench's full warm
  * phase (prepareIndex/prepareShingles/prepareStats rebuild EVERY
  * ingest artifact — ~45 min at sf5 — which drowns a 3-query A/B).
  * Each query still pays its own artifact build on the cold run, so
  * report both: cold ≈ build + query, steady ≈ the bench's warm-phase
  * number. Noop sink, same as Bench.
  *
  * Usage: SF_DIR=... tools/run.sh graft.tools.QueryTimer q1 q2 ...
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTimer <queryName>...")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    val spark = ProbeSession(logLevel = "ERROR")
    args.foreach { name =>
      val q = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIMER $name%-36s cold=${times.head}%8.2fs steady=${times.tail.min}%8.2fs")
      // Reap the finished query's dead state before the next one runs:
      // Spark's ContextCleaner only releases unreferenced broadcasts /
      // shuffle files / accumulators AFTER a driver GC, and a 96g heap
      // left alone may not GC for many queries — the backlog then
      // taxes later queries (measured: q76 steady 5.0 s clean vs 84 s
      // run after d04 in the same JVM). Same hygiene as Bench's
      // inter-query reap.
      System.gc()
      Thread.sleep(2000)
    }
    spark.stop()
  }
}
