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

    lazy val prEdges = {
      val e = graft.ops.Graphs.supplyEdges(spark, sfDir)
        .select("src", "dst").cache()
      e.count()
      e
    }
    def prCadence(c: Int): DataFrame = {
      import graft.ops.Checkpoints
      val e = prEdges
      val verts = e.select(col("src").as("id"))
        .unionAll(e.select(col("dst").as("id"))).distinct()
        .transform(Checkpoints.cut)
      val weighted = e
        .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
        .transform(Checkpoints.cut)
      var ranks = verts.withColumn("rank", lit(1.0))
      val iters = 10
      for (i <- 1 to iters) {
        val contribs = weighted
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
          .groupBy("id").agg(sum("c").as("msum"))
        ranks = verts.join(contribs, Seq("id"), "left_outer")
          .select(col("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("msum"), lit(0.0)))
              .as("rank"))
        if (i % c == 0 || i == iters) ranks = ranks.transform(Checkpoints.cut)
      }
      val st = ranks.agg(
        (count(lit(1)).cast("double") / sum(col("rank"))).as("__scale"))
      ranks.crossJoin(broadcast(st))
        .select(col("id"), (col("rank") * col("__scale")).as("rank"))
    }

    // --- s27 quotient-CC fold, old (shuffle-join) vs new (broadcast
    // probe) form, on the stress-expanded copart edges (factor 10) ---
    lazy val ccCop = {
      import graft.ops.{Checkpoints, Graphs}
      val factor = 10
      val cop0 = Graphs.copartEdges(spark, sfDir).transform(Checkpoints.cut)
      val minV = cop0.agg(min(col("src"))).head().getLong(0)
      val kCol = pmod(xxhash64(col("src"), col("dst")), lit(factor)).as("k")
      cop0.select(col("src"), col("dst"), kCol)
        .select((col("src") * factor + col("k")).as("src"),
          (col("dst") * factor + col("k")).as("dst"))
        .unionAll(spark.range(1, factor.toLong)
          .select((lit(minV) * factor + col("id")).as("src"),
            (lit(minV) * factor + col("id") - 1).as("dst")))
        .transform(Checkpoints.cut)
    }
    def ccOldApply(labels0: DataFrame, edges: DataFrame): DataFrame = {
      import graft.ops.Checkpoints
      val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .filter(col("src") =!= col("dst"))
      val nodes = e.select(col("src").as("id"))
        .unionAll(e.select(col("dst").as("id"))).distinct()
      val lab = nodes.join(labels0, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("component"))
      val superEdges = e
        .join(lab.select(col("id").as("src"), col("component").as("c1")), "src")
        .join(lab.select(col("id").as("dst"), col("component").as("c2")), "dst")
        .select(col("c1").as("src"), col("c2").as("dst"))
        .filter(col("src") =!= col("dst"))
      val remap =
        if (superEdges.isEmpty) null
        else graft.ops.Graphs.connectedComponentsDF(spark, superEdges)
          .filter(col("id") =!= col("component"))
          .select(col("id").as("component"), col("component").as("__new"))
      val all = labels0.unionByName(
        lab.join(labels0.select("id"), Seq("id"), "left_anti"))
      val out = if (remap == null) all
        else all.join(broadcast(remap), Seq("component"), "left")
          .select(col("id"),
            coalesce(col("__new"), col("component")).as("component"))
      out.transform(Checkpoints.cut)
    }
    def ccFold(useOld: Boolean): DataFrame = {
      import spark.implicits._
      def slice(i: Int) =
        ccCop.filter(pmod(xxhash64(col("src"), col("dst")), lit(3)) === i)
      var labels = ccCop.select(col("src").cast("long").as("id"),
        col("src").cast("long").as("component")).limit(0)
      (0 to 2).foreach { i =>
        labels =
          if (useOld) ccOldApply(labels, slice(i))
          else graft.streaming.Streams.ccApplyBatch(spark, labels, slice(i))
      }
      labels
    }

    val cases: Seq[(String, () => DataFrame)] = Seq(
      ("cc_A_old", () => ccFold(useOld = true)),
      ("cc_B_new", () => ccFold(useOld = false)),
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
      ("edges_A_3distinct", () => {
        val orders = Tables.load(spark, sfDir, "orders")
        val li = Tables.load(spark, sfDir, "lineitem")
        val (cu, or, pa, su) = (graft.ops.Graphs.CUST, graft.ops.Graphs.ORD,
          graft.ops.Graphs.PART, graft.ops.Graphs.SUPP)
        orders.select((col("o_custkey") + cu).as("src"),
            (col("o_orderkey") + or).as("dst"), lit("cust_order").as("etype"))
          .unionAll(li.select(col("l_orderkey"), col("l_partkey")).distinct()
            .select((col("l_orderkey") + or).as("src"),
              (col("l_partkey") + pa).as("dst"), lit("order_part").as("etype")))
          .unionAll(li.select(col("l_orderkey"), col("l_suppkey")).distinct()
            .select((col("l_orderkey") + or).as("src"),
              (col("l_suppkey") + su).as("dst"), lit("order_supp").as("etype")))
          .unionAll(li.select(col("l_suppkey"), col("l_partkey")).distinct()
            .select((col("l_suppkey") + su).as("src"),
              (col("l_partkey") + pa).as("dst"), lit("supp_part").as("etype")))
      }),
      ("edges_B_explode", () => graft.ops.Graphs.supplyEdges(spark, sfDir)),
      // pageRankDF checkpoint cadence sweep (bitwise-identical results —
      // only the materialization boundaries move)
      ("pr_cadence2", () => prCadence(2)),
      ("pr_cadence3", () => prCadence(3)),
      ("pr_cadence5", () => prCadence(5)),
      ("pr_cadence10", () => prCadence(10)),
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
