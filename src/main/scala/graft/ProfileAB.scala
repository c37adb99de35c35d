package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only (r19): interleaved A/B timing of a query's terminal-sort form
  * under Bench's session config — the global `orderBy` (range exchange:
  * sampling pass + N-task sort) vs the one-task `coalesce(1).
  * sortWithinPartitions` enum-sort. Interleaving A,B,A,B,… within one JVM
  * cancels the cross-JVM variance the plain Bench medians cannot.
  */
object ProfileAB {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 7
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

    def q02base(s: SparkSession) = {
      val d = Tables.load(s, sfDir, "lineitem")
      d.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(graft.Det.cents(col("l_quantity"))).as("sum_qty_cents"))
    }
    def q20base(s: SparkSession) = {
      Tables.load(s, sfDir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("cnt_k"))
    }
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q02ish",
        () => q02base(spark).orderBy("l_returnflag", "l_linestatus"),
        () => q02base(spark).coalesce(1)
          .sortWithinPartitions("l_returnflag", "l_linestatus")),
      ("q20ish",
        () => q20base(spark).orderBy("event_type"),
        () => q20base(spark).coalesce(1).sortWithinPartitions("event_type")))

    def once(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    cases.foreach { case (name, a, b) =>
      once(a); once(b) // warm both
      val (ra, rb) = (Array.newBuilder[Double], Array.newBuilder[Double])
      (1 to reps).foreach { _ => ra += once(a); rb += once(b) }
      def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
      val (sa, sb) = (ra.result(), rb.result())
      println(f"[ab] $name orderBy=${med(sa)}%.4f enumSort=${med(sb)}%.4f " +
        f"(raw A=${sa.map(x => f"$x%.3f").mkString(",")} B=${sb.map(x => f"$x%.3f").mkString(",")})")
    }
    spark.stop()
  }
}
