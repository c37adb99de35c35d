package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer: same session config + warm-cache method as
  * Bench, but for one query key, N repetitions, printing each run's wall
  * time (Bench reports only best-of, which hides cache/persist effects
  * between repetitions).
  *
  * Usage: runMain graft.BenchOne <queryKey> [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.getOrElse("g03_khop").split(',').toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
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
    keys.foreach { key =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(key)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[benchone] $key run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
