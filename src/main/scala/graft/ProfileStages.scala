package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Dev-only (r19): per-stage/job breakdown of one bench query under
  * Bench's config, to locate the fixed per-query floor (scheduling,
  * stage count, task count) vs real compute.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("q02_pricing_summary")
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

    case class St(id: Int, name: String, tasks: Int, wallMs: Long,
      taskMs: Long, gcMs: Long, cpuMs: Long, deserMs: Long,
      shuffleFetchMs: Long, shuffleWriteMs: Long)
    val stages = ArrayBuffer[St]()
    val jobs = ArrayBuffer[(Int, Long)]()
    val jobStart = scala.collection.mutable.Map[Int, Long]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(60),
          i.numTasks,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.taskMetrics.executorRunTime, i.taskMetrics.jvmGCTime,
          i.taskMetrics.executorCpuTime / 1000000,
          i.taskMetrics.executorDeserializeTime,
          i.taskMetrics.shuffleReadMetrics.fetchWaitTime,
          i.taskMetrics.shuffleWriteMetrics.writeTime / 1000000)
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs += ((j.jobId, j.time - jobStart.getOrElse(j.jobId, j.time)))
    }

    val mk = () => SparkEntry.queries(key)(spark, sfDir)
    // warm
    mk().write.format("noop").mode("overwrite").save()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    mk().write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    println(f"[stages] $key wall=$wall%.4f s")
    jobs.foreach { case (id, ms) => println(s"[stages] job $id: ${ms} ms") }
    stages.foreach { s =>
      println(f"[stages] stage ${s.id} tasks=${s.tasks} wall=${s.wallMs}ms " +
        f"taskSum=${s.taskMs}ms cpu=${s.cpuMs}ms gc=${s.gcMs}ms " +
        f"deser=${s.deserMs}ms fetchWait=${s.shuffleFetchMs}ms " +
        f"shufWrite=${s.shuffleWriteMs}ms  ${s.name}")
    }
    val stageWall = stages.map(_.wallMs).sum
    println(f"[stages] stageWallSum=${stageWall}ms vs wall=${(wall * 1000).toLong}ms " +
      f"(gap=${(wall * 1000).toLong - stageWall}ms = driver/planning/commit)")
    spark.stop()
  }
}
