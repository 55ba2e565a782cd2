package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for every registered query (or a named
  * subset) to one file per query, plus a one-line-per-query summary of
  * plan shape: Exchange count, join strategies, scan count. The r16
  * optimization round's before/after plan evidence
  * (plans/r16/<query>_{before,after}.txt) is captured with this.
  *
  * Usage: tools/run.sh graft.tools.PlanDump <outDir> [name ...]
  * Env:   SF_DIR (default /root/testdata/sf0.01)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [queryName ...]")
    val outDir = Paths.get(args.head)
    Files.createDirectories(outDir)
    val spark = ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    // build the ingest artifacts once so artifact-backed plans resolve
    graft.operators.Similarity.prepareIndex(spark, dir)
    graft.operators.Dedup.prepareShingles(spark, dir)
    graft.operators.Relational.prepareStats(spark, dir)
    // PLAN_EXEC=1: run each query through the noop sink first and dump
    // the POST-execution plan — under AQE the initial plan neither
    // shows exchange reuse (ReusedExchange dedup of repeated subtrees)
    // nor final join strategies, so pre-execution Exchange/scan counts
    // overstate what actually runs.
    val exec = sys.env.get("PLAN_EXEC").contains("1")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val plan =
        try {
          val df = fn(spark, dir)
          // collect(), not a noop write: the write wraps the query in
          // its own QueryExecution, leaving df.queryExecution (what we
          // print) unexecuted — the adaptive plan would still be the
          // initial one. Probe-only; results at the probe SF are small.
          if (exec) { val _ = df.collect() }
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"PLAN-ERROR: $e" }
      Files.write(outDir.resolve(s"$name.txt"), plan.getBytes("UTF-8"))
      val ex = "Exchange".r.findAllIn(plan).length -
        "AQEShuffleRead".r.findAllIn(plan).length.min(0)
      def cnt(p: String) = p.r.findAllIn(plan).length
      println(f"PLAN $name%-34s exch=${cnt("\\bExchange\\b")}%2d " +
        f"smj=${cnt("SortMergeJoin")}%2d bhj=${cnt("BroadcastHashJoin")}%2d " +
        f"shj=${cnt("ShuffledHashJoin")}%2d bnl=${cnt("BroadcastNestedLoop")}%2d " +
        f"sort=${cnt("\\bSort\\b")}%2d win=${cnt("Window")}%2d " +
        f"scan=${cnt("Scan parquet")}%2d agg=${cnt("HashAggregate")}%2d " +
        f"obj=${cnt("ObjectHashAggregate")}%2d sortagg=${cnt("SortAggregate")}%2d reuse=${cnt("ReusedExchange")}%2d")
      val _ = ex
    }
    spark.stop()
  }
}
