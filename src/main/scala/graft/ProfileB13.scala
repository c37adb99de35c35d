package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only (r19): stage-by-stage timing of the b13 capped-LSH near-dup
  * pipeline under Bench's session config. Each stage is materialized
  * through the noop sink, timed over 3 runs (median), with upstream
  * stages re-run inside the timed region exactly as in Bench — the
  * deltas between cumulative stages isolate each stage's cost.
  */
object ProfileB13 {
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
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.warmParallel(spark, sfDir, cpus.toInt)
    graft.functions.VecFunctions.ensureRegistered(spark)

    val d = Tables.load(spark, sfDir, "documents")
    val sh = graft.ops.Text.shingles(d, 3).cache()
    val sigs = graft.ops.Similarity.minHashSignatures(sh, 32).cache()
    sh.count(); sigs.count() // warm, as in Bench

    def cands() = graft.ops.Similarity.lshCandidates(sigs, 32, 16, maxBucket = 64)
    def likely() = graft.ops.Similarity.estimateJaccard(cands(), sigs)
      .filter(col("est_jaccard") >= 0.42).select("a_id", "b_id")
    def full() = graft.ops.Similarity.exactJaccardCompact(sh, likely())
      .filter(col("jaccard") > 0.6)
    // variants to isolate exactJaccardCompact's adaptive machinery
    def fullBcast() = graft.ops.Similarity.exactJaccardCompact(sh, likely(),
      broadcastSets = Some(true)).filter(col("jaccard") > 0.6)
    def bandsOnly() = graft.ops.Similarity.minHashBands(sigs, 32, 16)

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "1_bands" -> (() => bandsOnly()),
      "2_cands" -> (() => cands()),
      "3_likely" -> (() => likely()),
      "4_full" -> (() => full()),
      "4b_full_bcast_true" -> (() => fullBcast()))

    def once(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    stages.foreach { case (name, mk) =>
      once(mk)
      val runs = Seq(once(mk), once(mk), once(mk)).sorted
      println(f"[profile] $name median=${runs(1)}%.4f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
