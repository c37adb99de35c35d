package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only (r20): interleaved A/B/C timing of candidate plan shapes for
  * the b5/b6 terminal-sort work under Bench's session config. Interleaving
  * within one JVM cancels cross-JVM variance (the ProfileAB discipline).
  *
  * Variants:
  *   t06  A: current (hash exchange for the window + terminal range sort
  *           whose sampling re-executes the window+agg stage)
  *        B: repartitionByRange(user_id) up front — window clusters on the
  *           range partitioning, and the terminal orderBy(user_id, …) is
  *           satisfied by the prefix rule: ONE exchange, no sampling
  *           re-execution (guide §2.4)
  *        C: current + Checkpoints.cut before the orderBy (materialize the
  *           small agg output so sampling scans it, not the window)
  *   q09  A: current        B: cut before orderBy
  */
object ProfileR20 {
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

    def ev(s: SparkSession) = Tables.load(s, sfDir, "events")
      .select("event_id", "ts", "user_id")

    def sessAgg(base: DataFrame): DataFrame =
      graft.ops.Temporal.sessionize(base, entity = "user_id", ts = "ts",
          tieBreak = "event_id", gapSeconds = 1800)
        .groupBy("user_id", "session_id")
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .select("user_id", "session_start", "session_end", "n_events")

    def q09base(s: SparkSession): DataFrame = {
      val e = ev(s)
      val a = e.select(col("event_id").as("a_id"), col("user_id"),
        col("ts").as("a_ts"))
      val b = e.select(col("event_id").as("b_id"),
        col("user_id").as("user_id"), col("ts").as("b_ts"))
      graft.ops.RangeJoin.banded(a, b, key = "user_id",
          aTs = "a_ts", bTs = "b_ts", lowerUs = 0L, upperUs = 300000000L)
        .select(col("user_id"), col("a_id"), col("b_id"),
          (graft.Det.epochUs(col("b_ts")) - graft.Det.epochUs(col("a_ts"))).as("gap_us"))
    }

    val cases: Seq[(String, () => DataFrame)] = Seq(
      ("t06_A_current", () =>
        sessAgg(ev(spark)).orderBy("user_id", "session_start")),
      ("t06_B_rangefirst", () =>
        sessAgg(ev(spark).repartitionByRange(col("user_id")))
          .orderBy("user_id", "session_start")),
      ("t06_C_cut", () =>
        sessAgg(ev(spark)).transform(graft.ops.Checkpoints.cut)
          .orderBy("user_id", "session_start")),
      ("q09_A_current", () =>
        q09base(spark).orderBy("user_id", "a_id", "b_id")),
      ("q09_B_cut", () =>
        q09base(spark).transform(graft.ops.Checkpoints.cut)
          .orderBy("user_id", "a_id", "b_id")),
      // flipped banding: the PROBE side explodes into the two candidate
      // buckets and the build/broadcast side stays 1 row per event —
      // halves the broadcast relation (guide §3.1: broadcast cost is
      // driver + executor memory and build time)
      ("q09_C_flip", () => {
        val e = ev(spark)
        val w = 300000000L
        val aB = e.select(col("event_id").as("a_id"), col("user_id"),
            col("ts").as("a_ts"))
          .withColumn("__bucket",
            floor((graft.Det.epochUs(col("a_ts")) + 0L) / w))
        val bExp = e.select(col("event_id").as("b_id"),
            col("user_id").as("__bkey"), col("ts").as("b_ts"))
          .withColumn("__bbucket", explode(array_distinct(array(
            floor(graft.Det.epochUs(col("b_ts")) / w) - 1,
            floor(graft.Det.epochUs(col("b_ts")) / w)))))
        aB.join(bExp,
            col("user_id") === col("__bkey") &&
            col("__bucket") === col("__bbucket") &&
            graft.Det.epochUs(col("b_ts")) > graft.Det.epochUs(col("a_ts")) &&
            graft.Det.epochUs(col("b_ts")) <= graft.Det.epochUs(col("a_ts")) + w)
          .select(col("user_id"), col("a_id"), col("b_id"),
            (graft.Det.epochUs(col("b_ts")) - graft.Det.epochUs(col("a_ts"))).as("gap_us"))
          .orderBy("user_id", "a_id", "b_id")
      }),
      ("q11_A_current", () => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
        Tables.load(spark, sfDir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_orderdate")
          .orderBy("o_custkey", "rn")
      }),
      ("q11_B_rangefirst", () => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
        Tables.load(spark, sfDir, "orders")
          .repartitionByRange(col("o_custkey"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_orderdate")
          .orderBy("o_custkey", "rn")
      }))

    def once(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm all
    cases.foreach { case (_, mk) => once(mk) }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, mk) <- cases)
      times(name) = times(name) :+ once(mk)
    cases.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"[r20ab] $name%-18s median=${ts(ts.length / 2)}%.4f " +
        s"runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // plan shapes for the winners
    Seq("t06_B_rangefirst", "t06_A_current").foreach { n =>
      val df = cases.find(_._1 == n).get._2()
      val ex = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      println(s"[r20ab] $n shuffle exchanges = ${ex.length}")
    }
    spark.stop()
  }
}
