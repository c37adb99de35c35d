package graft

import graft.ops.{AsOfJoin, Bucketing}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev timing evidence for ROADMAP item 1 / VERDICT follow-up: the custom
  * sort-merge as-of operator vs the union+window library form, over plain
  * parquet inputs AND over bucketed+sorted tables (where the merge plans
  * exchange-free — BucketingSpec asserts the plan shape; this main
  * records the wall time).
  *
  * Shapes match q10/q10b (purchase events as-of last click per user) at
  * SPARK_GRAFT_SF_DIR scale. Prints per-variant best-of-3 wall times.
  */
object BenchAsOf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-asof-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.load(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))

    Seq("asof_l", "asof_r").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a crashed prior run can leave the managed location without the
      // catalog entry — saveAsTable then fails LOCATION_ALREADY_EXISTS
      val dir = new java.io.File(s"/tmp/graft-asof-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      if (dir.exists()) rm(dir)
    }
    Bucketing.writeBucketed(purchases, "asof_l", "user_id", cpus.toInt,
      sortCols = Seq("user_id", "ts"))
    Bucketing.writeBucketed(clicks, "asof_r", "user_id", cpus.toInt,
      sortCols = Seq("user_id", "ts", "click_id"))
    val lB = spark.table("asof_l")
    val rB = spark.table("asof_r")

    def time(tag: String, mk: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val best = math.min(once(), once())
      println(f"[asofbench] $tag: $best%.3f s")
      best
    }

    time("window over parquet",
      AsOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"), "click_id"))
    time("merge  over parquet",
      AsOfJoin.merge(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"), "click_id"))
    time("window over bucketed",
      AsOfJoin(lB, rB, Seq("user_id"), "ts", "ts",
        Seq("click_id"), "click_id"))
    time("merge  over bucketed (exchange-free)",
      AsOfJoin.merge(lB, rB, Seq("user_id"), "ts", "ts",
        Seq("click_id"), "click_id"))
    spark.stop()
  }
}
