package graft.operators // private[operators] artifact access; lives with the tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage attribution for the two steepest graph scalers at sf1
  * (VERDICT r12 item 3: q70 5.2×, q76 4.7× at 10× data). Both ride
  * the same oriented-adjacency intersection; this probe times each
  * cumulative sub-plan over the CACHED sf1 graph artifact (prepared
  * untimed, exactly like Bench) so the 6.5/8.3 s totals attribute to
  * named stages:
  *
  *   join2      — oriented ⋈ adj ⋈ adj (the two vertex-keyed hash
  *                joins attaching both endpoint adjacency arrays);
  *   closures   — + array_intersect + explode (the wedge-closure
  *                enumeration: one row per (edge, common neighbor) —
  *                3× #triangles rows);
  *   q70 full   — + per-vertex credit explode + count aggregate;
  *   q76 credit — closures + 3-edge credit explode + (a,b) count
  *                aggregate (the common-neighbor table);
  *   q76 full   — + two degree joins + top-200.
  *
  * Also prints |V|, |E|, max out-degree, and the closure count — the
  * inputs to the O(m^1.5) bound the scaladocs pin.
  */
object GraphStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.tools.ProbeSession(logLevel = "ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/repo/target/sf1")

    val g = Relational.orientedCooccurGraph(spark, dir) // cached, untimed below
    g.oriented.count(); g.adj.count(); g.deg.count()    // materialize artifact

    val adjU = g.adj.select(col("src").as("__u"), col("ns").as("nu"))
    val adjV = g.adj.select(col("src").as("__v"), col("ns").as("nv"))
    def join2: DataFrame = g.oriented
      .join(adjU, col("src") === col("__u"))
      .join(adjV, col("dst") === col("__v"))
      .select(col("src"), col("dst"), col("nu"), col("nv"))
    def closures: DataFrame = join2
      .select(col("src"), col("dst"),
        explode(array_intersect(col("nu"), col("nv"))).as("w"))
    def q76credit: DataFrame = closures
      .select(explode(array(
        struct(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")),
        struct(least(col("src"), col("w")).as("a"),
          greatest(col("src"), col("w")).as("b")),
        struct(least(col("dst"), col("w")).as("a"),
          greatest(col("dst"), col("w")).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))

    def timed(label: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"GRAPHSTAGE $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val nv = g.deg.count()
    val ne = g.oriented.count()
    val maxOut = g.adj.select(max(size(col("ns")))).head().getInt(0)
    val nClosures = closures.count()
    println(s"GRAPHSTAGE |V|=$nv |E|=$ne max_out_degree=$maxOut " +
      s"closures=$nClosures sqrt_E=${math.sqrt(ne.toDouble).toInt}")
    timed("join2")(join2)
    def join2B: DataFrame = g.oriented
      .join(broadcast(adjU), col("src") === col("__u"))
      .join(broadcast(adjV), col("dst") === col("__v"))
      .select(col("src"), col("dst"), col("nu"), col("nv"))
    timed("join2-bhint")(join2B)
    timed("closures")(closures)
    timed("closures-b")(join2B.select(col("src"), col("dst"),
      explode(array_intersect(col("nu"), col("nv"))).as("w")))
    println("GRAPHSTAGE join2 strategies: " +
      join2.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("Join")).map(_.trim.take(90)).mkString(" | "))
    timed("q70-full")(graft.SparkEntry.queries("q70_triangles")(spark, dir))
    timed("q76-credit")(q76credit)
    timed("q76-full")(graft.SparkEntry.queries("q76_link_jaccard")(spark, dir))
    spark.stop()
  }
}
