package graft

import graft.ops.Graphs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only evidence run: Catalyst-native graph algorithms vs their
  * GraphX/Pregel twins on the sf0.1 graphs (same session config as
  * Bench; best-of-2 after a warm-up). The DataFrame forms are the wired
  * defaults — this main keeps the "why" measured rather than asserted
  * (BASELINE.md records the numbers per round).
  */
object BenchGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          Tables.adaptiveShufflePartitions(sfDir, cpus.toInt).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.warmParallel(spark, sfDir, cpus.toInt)

    val copart = Graphs.copartEdges(spark, sfDir).localCheckpoint()
    val seed = copart.agg(min(col("src"))).head().getLong(0)
    val supply = Graphs.supplyEdges(spark, sfDir)
      .select("src", "dst").localCheckpoint()

    def time(label: String)(f: => Long): Unit = {
      def once: Double = {
        val t0 = System.nanoTime(); val n = f
        require(n > 0, s"$label returned empty"); (System.nanoTime() - t0) / 1e9
      }
      once // warm-up
      println(f"[benchgraph] $label: ${math.min(once, once)}%.2f s")
    }

    time("bfs depth<=4      DataFrame")(
      Graphs.bfsDepthsDF(spark, copart, seed, 4).count())
    time("bfs depth<=4      Pregel   ")(
      Graphs.bfsDepths(spark, copart, seed, 4).count())
    time("connected comps   DataFrame")(
      Graphs.connectedComponentsDF(spark, copart).count())
    time("connected comps   GraphX   ")(
      Graphs.connectedComponents(spark, copart).count())
    time("pagerank 10 iters DataFrame")(
      Graphs.pageRankDF(spark, supply, 10).count())
    time("pagerank 10 iters GraphX   ")(
      Graphs.pageRank(spark, supply, 10).count())
    // engine-only (no GraphX twin): tracks the lazy-norm change — the
    // only driver actions are the per-half-step lineage cuts
    time("hits 8 iters      DataFrame")(
      Graphs.hitsDF(spark, supply, 8).count())
    spark.stop()
  }
}
