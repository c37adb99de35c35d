package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan regression guard for the headline (BENCH B1–B10) paths:
  * the properties that make these plans survive a 100× scale-up —
  * pushdown reaching the scan, small sides broadcast, no quadratic join
  * strategies, top-k without a global sort — asserted as PRESENCE
  * requirements, so a planner change that silently drops one fails the
  * suite instead of showing up as a bench regression a round later.
  */
class PlanShapeSpec extends SparkSpecBase {

  private def all(df: DataFrame): Seq[SparkPlan] = {
    val root = physical(df)
    root.collect { case p => p } ++ root.subqueries.flatMap(s =>
      s.collect { case p => p })
  }

  test("q01 scan: filter and projection reach the parquet scan") {
    val q = SparkEntry.queries("q01_scan_filter")(spark, sfDir)
    val scans = all(q).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // the range predicate is pushed (not evaluated post-scan only)
    assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(f => f.contains("GreaterThanOrEqual") || f.contains("IsNotNull"))),
      scans.map(_.metadata.get("PushedFilters")).mkString(";"))
    // column pruning: the lineitem scan reads a strict subset of the table
    val li = Tables.load(spark, sfDir, "lineitem")
    assert(scans.exists(_.output.length <= 5) &&
      scans.forall(_.output.length < li.columns.length))
  }

  test("q05 broadcast join: the dim side is broadcast, never shuffled") {
    val q = SparkEntry.queries("q05_broadcast_join")(spark, sfDir)
    val p = all(q)
    assert(p.exists(_.isInstanceOf[BroadcastHashJoinExec]))
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]) &&
      !p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }

  test("q04 multi-join: dims broadcast, at most one fact shuffle pre-agg") {
    val q = SparkEntry.queries("q04_multi_join")(spark, sfDir)
    val p = all(q)
    assert(p.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
      s"expected >=2 broadcast joins: ${p.map(_.nodeName).distinct}")
    // fact-side shuffles: the final agg exchange (+ sort's range exchange);
    // the join tree itself must not shuffle the fact table repeatedly
    val shuffles = p.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles <= 2, s"expected <=2 shuffles, found $shuffles")
  }

  test("q09 range join: banded equi join, no quadratic strategy") {
    val q = SparkEntry.queries("q09_range_join")(spark, sfDir)
    val p = all(q)
    assert(p.exists(n => n.nodeName.contains("Join")), "no join in plan")
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]) &&
      !p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "range join fell back to a quadratic strategy")
  }

  test("q17 top-k: TakeOrdered, not a global sort") {
    val q = SparkEntry.queries("q17_topk")(spark, sfDir)
    assert(all(q).exists(_.nodeName.contains("TakeOrderedAndProject")))
  }

  test("q10 as-of: no nested-loop fallback on the inequality condition") {
    val q = SparkEntry.queries("q10_asof_join")(spark, sfDir)
    val p = all(q)
    assert(!p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
      !p.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("l03 cosine top-k: block kernel, no cartesian pair materialization") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    val q = SparkEntry.queries("l03_cosine_topk")(spark, sfDir)
    val p = all(q)
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]) &&
      !p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    assert(p.exists(_.nodeName.contains("TakeOrderedAndProject")),
      "top-k must be a bounded-heap TakeOrdered, not a global sort")
  }

  test("l10b bloom decontamination: probe in plan, before the exact join") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    val q = SparkEntry.queries("l10b_decontaminate_bloom")(spark, sfDir)
    val p = all(q)
    // the codegen'd bloom probe must actually be in the executed tree —
    // without it the query silently degrades to the unfiltered L10 join
    // (BloomFilterMightContain prints as its prettyName, might_contain)
    assert(p.exists(_.toString.contains("might_contain")),
      "bloom prefilter missing from the physical plan")
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]) &&
      !p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }

  test("t07 scd2 merge: one join, no quadratic strategy, no window") {
    val q = SparkEntry.queries("t07_scd2_merge")(spark, sfDir)
    val p = all(q)
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]) &&
      !p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    // the merge itself is join + explode — WindowExec nodes belong only
    // to the snapshot inputs (history-seed, current, new snapshot = 3;
    // WindowGroupLimit pushdown nodes excluded by the exact name match)
    val windows = p.count(_.nodeName == "Window")
    assert(windows <= 3, s"scd2 merge grew a window: $windows")
  }

  test("s13 stream-stream twin in batch: equi+range hash join, no NLJ") {
    val q = SparkEntry.queries("s13_stream_stream_join")(spark, sfDir)
    val p = all(q)
    assert(p.exists(n => n.nodeName.contains("Join")), "no join in plan")
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]) &&
      !p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "time-bounded join fell back to a quadratic strategy")
  }

  test("q08b NOT IN: plans as a null-aware broadcast hash anti join") {
    val q = SparkEntry.queries("q08b_not_in")(spark, sfDir)
    val naaj = physical(q).collect {
      case b: BroadcastHashJoinExec if b.isNullAwareAntiJoin => b
    }
    assert(naaj.nonEmpty, "expected a null-aware anti join in the plan")
    // the semantics depth the operator exists for: one NULL in the NOT IN
    // set poisons the whole predicate (no rows), while NOT EXISTS / anti
    // join simply ignores it
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val l = Seq(1L, 2L).toDF("x")
    val r = Seq(Some(1L), None).toDF("y")
    assert(l.join(r, col("x") === col("y"), "left_anti").count() == 1L)
    l.createOrReplaceTempView("guard_l"); r.createOrReplaceTempView("guard_r")
    assert(spark.sql(
      "SELECT * FROM guard_l WHERE x NOT IN (SELECT y FROM guard_r)")
      .count() == 0L)
  }

  test("nested-loop guard: rejects theta joins, allows equi/hinted/cross") {
    import graft.plans.NestedLoopGuard
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    NestedLoopGuard.install(spark) // end-of-optimizer, the production path
    val a = Seq(1L, 2L).toDF("x")
    val b = Seq(2L, 3L).toDF("y")
    spark.conf.set(NestedLoopGuard.CONF, "true")
    try {
      val e = intercept[Exception] {
        a.join(b, col("x") < col("y")).collect()
      }
      assert(e.getMessage.contains(NestedLoopGuard.CONF))
      // explicit opt-ins and safe shapes pass
      assert(a.join(org.apache.spark.sql.functions.broadcast(b),
        col("x") < col("y")).count() == 3L)
      assert(a.crossJoin(b).count() == 4L)
      assert(a.join(b, col("x") === col("y"), "inner").count() == 1L)
      // NOT IN's null-aware pattern is exempt
      a.createOrReplaceTempView("guard_a"); b.createOrReplaceTempView("guard_b")
      assert(spark.sql(
        "SELECT * FROM guard_a WHERE x NOT IN (SELECT y FROM guard_b)")
        .count() == 1L)
    } finally spark.conf.set(NestedLoopGuard.CONF, "false")
    // disabled: the theta join runs (slow but permitted)
    assert(a.join(b, col("x") < col("y")).count() == 3L)
  }

  test("nested-loop guard sweep: every registry query plans clean") {
    // The engine linted by its own guard: install at end-of-optimizer,
    // enable rejection, then PLAN (not execute) every contract query.
    // Today this proves no registry entry hides an O(n·m) join shape
    // (l03c used to — the blocked threshold kernel fixed it); tomorrow it
    // catches any regression into the nested-loop cliff the moment it is
    // introduced. Builders that run driver-side actions (kmeans fit,
    // index builds, codebook collects) execute under the guard too, so
    // their internal plans are linted as a side effect.
    import graft.plans.NestedLoopGuard
    graft.plans.NestedLoopGuard.install(spark)
    graft.functions.VecFunctions.ensureRegistered(spark)
    def guardTrip(e: Throwable): Option[String] =
      if (e == null) None
      else if (e.getMessage != null && e.getMessage.contains(NestedLoopGuard.CONF))
        Some(e.getMessage.linesIterator.next())
      else guardTrip(e.getCause)
    spark.conf.set(NestedLoopGuard.CONF, "true")
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try {
            // optimizedPlan forces the full optimizer (where the guard
            // runs) without executing the query
            fn(spark, sfDir).queryExecution.optimizedPlan
            None
          } catch {
            case e: Throwable => guardTrip(e) match {
              case Some(msg) => Some(s"$name: $msg")
              case None => throw e // non-guard failures propagate as-is
            }
          }
      }
      assert(failures.isEmpty,
        s"guard-rejected plans:\n${failures.mkString("\n")}")
    } finally spark.conf.set(NestedLoopGuard.CONF, "false")
  }

  test("l03c threshold near-dup: blocked kernel, no quadratic pair join") {
    val q = SparkEntry.queries("l03c_cosine_neardup")(spark, sfDir)
    val p = all(q)
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]) &&
      !p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "l03c regressed to an all-pairs quadratic join")
  }

  test("stats-driven broadcast: catalog stats pick q04's dim broadcasts without hints") {
    // The q04 contract query hand-hints nation/region (safe under any
    // stats regime). This proves the hints are BELT-AND-SUSPENDERS, not
    // load-bearing: the same join tree planned from ANALYZEd catalog
    // tables — sizes from statistics, not file-listing guesses — gets
    // its dim broadcasts from the optimizer alone. At 100 TB this is
    // the operating mode: a maintained catalog + CBO, not per-query
    // hand-hints.
    import org.apache.spark.sql.functions._
    val names = Seq("lineitem", "orders", "customer", "nation", "region")
    names.foreach { n =>
      val tbl = s"graft_cbo_$n"
      if (!spark.catalog.tableExists(tbl)) {
        graft.ops.Bucketing.dropStaleLocation(spark, tbl)
        Tables.load(spark, sfDir, n).write.mode("overwrite").saveAsTable(tbl)
      }
      spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS")
    }
    val prevCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val q = spark.table("graft_cbo_lineitem")
        .join(spark.table("graft_cbo_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(spark.table("graft_cbo_customer"),
          col("o_custkey") === col("c_custkey"))
        .join(spark.table("graft_cbo_nation"), // NO broadcast() hint
          col("c_nationkey") === col("n_nationkey"))
        .join(spark.table("graft_cbo_region")
            .filter(col("r_name") === "ASIA"), // NO hint either
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(graft.Det.sumCents(
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue_cents"))
      val p = all(q)
      assert(p.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
        s"stats did not drive >=2 broadcasts: ${p.map(_.nodeName).distinct}")
      assert(!p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
        !p.exists(_.isInstanceOf[CartesianProductExec]))
    } finally prevCbo match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("t16 static partition pruning: the day window prunes the events scan") {
    val q = SparkEntry.queries("t16_pruned_timerange")(spark, sfDir)
    val scans = all(q).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no file scan in t16's plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "day predicate did not become a partition filter")
    // exactly the 5 requested day directories are read; the table holds
    // a month of them
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 5, s"expected 5 pruned-in partitions, got $selected")
    val total = spark.sql(
      s"SHOW PARTITIONS graft_events_day_" +
        sfDir.replaceAll("[^A-Za-z0-9]", "_")).count()
    assert(total >= 29, s"expected ~30 day partitions, got $total")
  }

  test("t16b dynamic partition pruning: the dim filter prunes the fact scan at runtime") {
    val q = SparkEntry.queries("t16b_dpp_day_join")(spark, sfDir)
    q.collect() // DPP instantiates during execution
    // the events scan must carry a dynamicpruning partition filter fed
    // by the dim side — the partitioned-fact analog of pushdown: which
    // directories to read is decided by the dim's rows, not a literal
    val scans = all(q).collect { case s: FileSourceScanExec => s }
      .filter(_.partitionFilters.nonEmpty)
    assert(scans.nonEmpty, "no partitioned scan in t16b's plan")
    assert(scans.exists(_.partitionFilters.exists(
        _.find(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery])
          .isDefined) ||
        scans.exists(_.partitionFilters.mkString.contains("dynamicpruning"))),
      s"no dynamic pruning filter on the events scan: " +
        scans.map(_.partitionFilters.mkString(",")).mkString(" | "))
  }

  test("t19 coalesce: the island groupBy reuses the window shuffle") {
    // ONE data exchange (the entity shuffle feeding the windows); the
    // groupBy on (entity, island) must NOT add a second — hash
    // partitioning on user_id already clusters every (user_id, island)
    // group. The only other exchange is the output sort's range
    // partitioning.
    val q = SparkEntry.queries("t19_coalesce_intervals")(spark, sfDir)
    val ex = all(q).collect { case e: ShuffleExchangeExec => e }
    val hashEx = ex.filterNot(
      _.outputPartitioning.toString.contains("rangepartitioning"))
    assert(hashEx.length == 1,
      s"expected exactly 1 hash exchange, got: ${ex.map(_.outputPartitioning)}")
  }

  test("t33 attribution: one entity shuffle, join-free credit pass") {
    // touches and purchases share the event stream, so the credit pass
    // is ONE hash exchange (user_id feeding the window) + the tiny
    // channel rollup — a planner change reintroducing a per-purchase
    // join here would be the inequality-join cliff the oracle pays
    val q = SparkEntry.queries("t33_attribution")(spark, sfDir)
    assert(!all(q).exists(_.nodeName.contains("Join")),
      s"expected a join-free plan: ${all(q).map(_.nodeName).distinct}")
    val hashEx = all(q).collect { case e: ShuffleExchangeExec => e }
      .filterNot(_.outputPartitioning.toString.contains("rangepartitioning"))
    // entity window + the 5-row channel rollup's exchange, nothing more
    assert(hashEx.length <= 2,
      s"expected <=2 hash exchanges: ${hashEx.map(_.outputPartitioning)}")
  }

  test("g42 temporal motif: banded equi join, no quadratic strategy") {
    // the per-part pair generation must ride the (part, time-band)
    // equi keys — a planner falling back to BNLJ/cartesian on the
    // inequality residual is the per-part quadratic cliff the banding
    // exists to avoid
    val q = SparkEntry.queries("g42_temporal_coship")(spark, sfDir)
    val p = all(q)
    assert(!p.exists(x => x.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      x.isInstanceOf[CartesianProductExec]),
      s"quadratic join in g42: ${p.map(_.nodeName).distinct}")
    assert(p.exists(_.nodeName.contains("Join")))
  }

  test("q57f re-anchoring: one entity shuffle feeding the linear fold") {
    // the parallel-anchor machine is still the partition-sort-scan
    // shape: exactly one hash exchange (the entity repartition) before
    // the mapPartitions fold; no join, no window
    val q = SparkEntry.queries("q57f_pattern_reanchor")(spark, sfDir)
    val p = all(q)
    assert(!p.exists(_.nodeName.contains("Join")),
      s"unexpected join: ${p.map(_.nodeName).distinct}")
    val hashEx = p.collect { case e: ShuffleExchangeExec => e }
      .filterNot(_.outputPartitioning.toString.contains("rangepartitioning"))
    assert(hashEx.length == 1,
      s"expected exactly 1 hash exchange: ${hashEx.map(_.outputPartitioning)}")
  }

  test("t36 rolling trend: all five statistics share one window frame") {
    // five window sums over the same (type-partitioned, day-ordered)
    // frame must plan as ONE Window operator — five separate window
    // operators would be five passes over the spine at scale
    val q = SparkEntry.queries("t36_rolling_trend")(spark, sfDir)
    val windows = all(q).filter(_.nodeName.contains("Window"))
    assert(windows.length == 1, // arithmetic x keeps all five sums fused
      s"expected the stats to share ONE Window op: ${windows.length}")
  }

  test("q38 rolling distinct: only the 1-row max-day dim nested-loops") {
    // the contribution-explode plan may cross-join ONLY the broadcast
    // 1-row clip dim; any other nested loop would be the quadratic cliff
    val q = SparkEntry.queries("q38_rolling_distinct")(spark, sfDir)
    val nlj = all(q).collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(nlj.length == 1)
    assert(!all(q).exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("t25 interpolating resample: as-of directions, no join operator") {
    // both as-of passes are the union+window shape — a planner change
    // that reintroduces a real join here would be the O(n·m) range-join
    // cliff at scale
    val q = SparkEntry.queries("t25_resample_interp")(spark, sfDir)
    val p = all(q)
    assert(!p.exists(_.nodeName.contains("Join")),
      s"expected a join-free union+window plan: ${p.map(_.nodeName).distinct}")
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("q45/q47 concentration curves: 1-row total broadcast, no cartesian") {
    for (name <- Seq("q45_pareto", "q47_decile_stats")) {
      val q = SparkEntry.queries(name)(spark, sfDir)
      val p = all(q)
      // the only nested loop is the broadcast 1-row total dim
      val nlj = p.collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(nlj.length == 1, s"$name: ${p.map(_.nodeName).distinct}")
      assert(!p.exists(_.isInstanceOf[CartesianProductExec]), name)
    }
  }

  test("l37 collocations: marginal joins are not nested loops") {
    val q = SparkEntry.queries("l37_collocations")(spark, sfDir)
    val p = all(q)
    // cx/cy marginals join by key (hash or broadcast-hash); only the
    // 1-row N total may nested-loop
    assert(p.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 1)
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("l29 importance weights: bucket scores broadcast onto the stream") {
    // the <=B-row score table must come back as a broadcast join — a
    // shuffled join here would re-shuffle the whole exploded corpus
    val q = SparkEntry.queries("l29_importance_weights")(spark, sfDir)
    val p = all(q)
    assert(p.exists(_.isInstanceOf[BroadcastHashJoinExec]))
    assert(!p.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("whole-stage codegen covers the hot aggregation path (q02)") {
    val q = SparkEntry.queries("q02_pricing_summary")(spark, sfDir)
    q.collect() // codegen collapse happens per-stage at execution under AQE
    // AQE buries each stage's codegen'd tree inside QueryStageExec leaf
    // nodes — a flat collect sees none of it; descend through the stage
    // boundaries explicitly.
    def deep(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case _ => p.children
      }
      p +: inner.flatMap(deep)
    }
    val wscg = deep(q.queryExecution.executedPlan)
      .count(_.nodeName.contains("WholeStageCodegen"))
    assert(wscg >= 2, s"expected >=2 codegen regions, found $wscg")
  }

  test("AQE skew-join rewrite fires on the unsalted hot-key join") {
    // The q35 fixture shape WITHOUT the salt: half of all events on key
    // 0, sort-merge-joined against the distinct-key dim. At sf0.001 no
    // partition reaches the production 256 MB skew threshold, so the
    // thresholds are scaled down to the fixture — the point is to PROVE
    // the runtime skew path executes end-to-end (split hot partition,
    // replicated build side, correct result), which at 100 TB fires with
    // the defaults. Skew.saltedJoin (ApiSpec, q35) covers the keys AQE
    // can't split; this covers the ones it can.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // repartition(8) gives the join's map side 8 tasks: AQE splits a
      // skewed reduce partition at MAP-BLOCK granularity, so a
      // single-file scan (one mapper) is unsplittable no matter how hot
      // the key — exactly why at 100 TB (thousands of mappers) the
      // rewrite fires with default thresholds
      val ev = Tables.load(spark, sfDir, "events")
        .repartition(8)
        .select(when(col("user_id") % 2 === 0, lit(0L))
            .otherwise(col("user_id")).as("k"),
          graft.Det.cents(col("value")).as("v_cents"))
      // the dim is MATERIALIZED (as a real dim table would be on disk):
      // OptimizeSkewedJoin only matches Sort(ShuffleQueryStage) join
      // children, so a dim whose final distinct-aggregate runs
      // post-shuffle (between the Sort and the stage) is structurally
      // unsplittable — the same reason to stage dims rather than derive
      // them inline under a skewed join in production
      val dim = ev.select(col("k")).distinct()
        .withColumn("grp", pmod(col("k"), lit(7L)))
        .localCheckpoint()
      val joined = ev.join(dim, "k")
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("sum_cents"))
      val rows = joined.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // correctness: equal to the salted contract query on the same data
      val salted = SparkEntry.queries("q35_salted_skew_join")(spark, sfDir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(rows == salted && rows.nonEmpty)
      // evidence: the final adaptive plan marks the join skew-handled
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert("skew=true|isSkewJoin=true".r
          .findFirstIn(finalPlan.toString).isDefined,
        s"AQE skew rewrite did not fire:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("exactJaccardCompact: the a/b set builds collapse to one exchange " +
      "(ReuseExchange) on every decision path") {
    // r19: the adaptive path no longer localCheckpoints the compact set
    // table; correctness of that change rests on Spark planning the
    // (alias-renamed but canonically equal) a-side and b-side set builds
    // as ONE exchange + a ReusedExchange. Pin it for all three decision
    // paths so a planner/canonicalization change that silently doubles
    // the set build fails here, not as a bench regression.
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false") // ReuseExchange is a physical rule; AQE
    // defers reuse to runtime stage-matching, invisible in initialPlan
    try {
      graft.functions.VecFunctions.ensureRegistered(spark)
      import org.apache.spark.sql.functions.col
      val sh = graft.ops.Text.shingles(
        Tables.load(spark, sfDir, "documents"), 3)
      val ids = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id")).limit(6)
      val pairs = ids.select(col("doc_id").as("a_id"))
        .crossJoin(ids.select(col("doc_id").as("b_id")))
        .filter(col("a_id") < col("b_id"))
      for (mode <- Seq(Some(true), Some(false), None)) {
        val q = graft.ops.Similarity.exactJaccardCompact(sh, pairs, mode)
        val reused = physical(q).collect {
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
        }
        assert(reused.nonEmpty,
          s"set build planned twice (no ReusedExchange) for broadcastSets=$mode")
      }
    } finally spark.conf.set(key, prev)
  }
}
