package graft

import org.apache.spark.sql.SparkSession

/** Dev-only (r19 optimization round): dump `.explain("formatted")` for every
  * Bench query under the SAME session config Bench uses (cached tables,
  * shuffle partitions = cores, AQE per SPARK_GRAFT_AQE), so plan claims in
  * OPTIMIZATION_r19.md are reproducible from the repo.
  *
  * Usage: runMain graft.BenchPlans <outDir> [suffix]
  *   writes <outDir>/<bench_id>_<suffix>.txt (suffix defaults to "before").
  */
object BenchPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          Tables.adaptiveShufflePartitions(sfDir, cpus.toInt).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-bench-warehouse")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.warmParallel(spark, sfDir, cpus.toInt)

    // Same b11/b12/b13 setup as Bench (untimed index/bucket state).
    import graft.ops.{AsOfJoin, Bucketing, SimIndex}
    import org.apache.spark.sql.functions.col
    val ev = Tables.load(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    Seq("graft_bench_asof_l", "graft_bench_asof_r").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      Bucketing.dropStaleLocation(spark, t)
    }
    Bucketing.writeBucketed(purchases, "graft_bench_asof_l", "user_id",
      cpus.toInt, sortCols = Seq("user_id", "ts"))
    Bucketing.writeBucketed(clicks, "graft_bench_asof_r", "user_id",
      cpus.toInt, sortCols = Seq("user_id", "ts", "click_id"))
    val asofL = spark.table("graft_bench_asof_l")
    val asofR = spark.table("graft_bench_asof_r")
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val pqPrefix = "graft_bench_ivfpq"
    if (!SimIndex.isUsable(spark, pqPrefix, vecs,
        Seq("_centroids", "_pq_codebooks", "_pq_codes"))) {
      Seq("_centroids", "_pq_codebooks", "_pq_codes", "_meta").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $pqPrefix$t")
        Bucketing.dropStaleLocation(spark, pqPrefix + t)
      }
      SimIndex.writeIvfPqIndex(vecs, pqPrefix, nCentroids = 8, m = 8,
        dims = 64, k = 32, buckets = 8)
    }
    val pqQuery = vecs.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)

    val signature: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "b11_asof_merge" -> (() =>
        AsOfJoin.merge(asofL, asofR, Seq("user_id"), "ts", "ts",
          Seq("click_id"), "click_id")),
      "b12_ivfpq_search" -> (() =>
        SimIndex.ivfPqSearch(spark, pqPrefix, pqQuery, nprobe = 2,
          topk = 10)),
      "b13_lsh_capped_neardup" -> (() => {
        graft.functions.VecFunctions.ensureRegistered(spark)
        val d = Tables.load(spark, sfDir, "documents")
        val sh = graft.ops.Text.shingles(d, 3).cache()
        val sigs = graft.ops.Similarity.minHashSignatures(sh, 32).cache()
        val cands = graft.ops.Similarity.lshCandidates(sigs, 32, 16,
          maxBucket = 64)
        val likely = graft.ops.Similarity.estimateJaccard(cands, sigs)
          .filter(col("est_jaccard") >= 0.42).select("a_id", "b_id")
        graft.ops.Similarity.exactJaccardCompact(sh, likely)
          .filter(col("jaccard") > 0.6)
      }),
      "b14_pagerank" -> (() => {
        val e = graft.ops.Graphs.supplyEdges(spark, sfDir)
          .select("src", "dst").cache()
        graft.ops.Graphs.pageRankDF(spark, e, 10, materialize = false)
      }))

    val benchables: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
      Bench.headline.map { case (bid, key) =>
        bid -> (() => SparkEntry.queries(key)(spark, sfDir))
      } ++ signature

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    benchables.foreach { case (bid, mk) =>
      try {
        val df = mk()
        // r20 (ADVICE r19): actually EXECUTE through the noop sink before
        // printing, so with AQE on the dumped plan reflects runtime
        // decisions (with AQE off — the bench default — static == executed,
        // but the dump is now honest either way).
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${bid}_$suffix.txt"), plan)
        println(s"[plans] wrote $outDir/${bid}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[plans] $bid FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
