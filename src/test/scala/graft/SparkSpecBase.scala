package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM per sbt test run). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  /** Physical tree with the AQE wrapper unwrapped. AdaptiveSparkPlanExec
    * is a LEAF node: a `collect` over the raw executedPlan of an
    * AQE-wrapped query traverses nothing, so a "no Exchange in the plan"
    * assertion would pass VACUOUSLY exactly when the plan regressed to
    * shuffling (which is what gets it AQE-wrapped). Every plan-shape
    * assertion must go through here.
    */
  def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  /** Evaluate `f` with auto-broadcast disabled: the fixtures are tiny, so
    * Catalyst would broadcast one side of a bucketed join and the plan
    * assertion would never exercise the bucket-locality property it
    * claims (at 100 TB neither side broadcasts). Build AND plan the
    * DataFrame inside `f` — planning is lazy, so a frame planned outside
    * the scope keeps the broadcast plan.
    */
  def withoutAutoBroadcast[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, prev)
  }
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
    // STATIC conf (read at context creation by the ContextCleaner): lets
    // GC'd reliable checkpoints delete their files mid-application — the
    // production setting for long iterative loops (Checkpoints scaladoc);
    // GraphOpsSpec asserts the reaping actually happens.
    .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    .getOrCreate()

  override def afterAll(): Unit = {
    // Shared across suites — do not stop.
    super.afterAll()
  }
}
