package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions.col

/** As-of join edge cases + property test: the union+window implementation
  * must equal a per-row linear scan (SURVEY.md §5.2 items 3-4). Randomized
  * cases use a fixed seed (no scalatestplus bridge in the offline cache).
  */
class AsOfJoinSpec extends SparkSpecBase {

  private def runAsOf(
      left: Seq[(Long, Long, Long)], // (id, key, ts)
      right: Seq[(Long, Long, Long)], // (rid, key, ts)
      strict: Boolean): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("id", "k", "ts")
    val r = right.toDF("rid", "k", "ts")
    val out = AsOfJoin(l, r, on = Seq("k"), leftTs = "ts", rightTs = "ts",
      payload = Seq("rid"), tieBreak = "rid", strict = strict)
    out.collect().map { row =>
      row.getLong(0) -> Option(row.get(3)).map(_.asInstanceOf[Long])
    }.toMap
  }

  private def oracle(
      left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)],
      strict: Boolean): Map[Long, Option[Long]] =
    left.map { case (id, k, ts) =>
      val cands = right.filter { case (_, rk, rts) =>
        rk == k && (if (strict) rts < ts else rts <= ts)
      }
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy { case (rid, _, rts) => (rts, rid) }._1))
    }.toMap

  test("empty right side -> all null payloads") {
    val res = runAsOf(Seq((1L, 1L, 10L), (2L, 2L, 20L)), Seq.empty, strict = false)
    assert(res == Map(1L -> None, 2L -> None))
  }

  test("equal timestamps visible when non-strict, hidden when strict") {
    val left = Seq((1L, 1L, 10L))
    val right = Seq((100L, 1L, 10L))
    assert(runAsOf(left, right, strict = false) == Map(1L -> Some(100L)))
    assert(runAsOf(left, right, strict = true) == Map(1L -> None))
  }

  test("tie on right ts -> max tieBreak wins") {
    val left = Seq((1L, 1L, 10L))
    val right = Seq((100L, 1L, 5L), (200L, 1L, 5L), (50L, 1L, 5L))
    assert(runAsOf(left, right, strict = false) == Map(1L -> Some(200L)))
  }

  test("keys do not leak across groups") {
    val left = Seq((1L, 1L, 10L), (2L, 2L, 10L))
    val right = Seq((100L, 1L, 5L))
    assert(runAsOf(left, right, strict = false) ==
      Map(1L -> Some(100L), 2L -> None))
  }

  test("multi-key as-of: matches require EVERY key equal, window and merge agree") {
    import spark.implicits._
    // (entity, prop_key) change-point shape — the reference's
    // getTemporalProperty(key, t) store. Rows share user 1 but differ on
    // the property key: a single-key join on user would cross-match them.
    val l = Seq((1L, 1L, "color", 10L), (2L, 1L, "size", 10L),
        (3L, 2L, "color", 10L))
      .toDF("id", "user", "prop", "ts")
    val r = Seq((100L, 1L, "color", 5L), (200L, 1L, "size", 7L),
        (300L, 2L, "size", 3L), (400L, 1L, "color", 9L))
      .toDF("rid", "user", "prop", "ts")
    def resultOf(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.collect().map { row =>
        row.getLong(0) -> Option(row.get(row.length - 1))
          .map(_.asInstanceOf[Long])
      }.toMap
    val expect = Map(
      1L -> Some(400L), // latest color change of user 1 (9 > 5)
      2L -> Some(200L), // size change of user 1 — NOT the color ones
      3L -> None)       // user 2 has only a size change; color finds none
    val win = AsOfJoin(l, r, on = Seq("user", "prop"), leftTs = "ts",
      rightTs = "ts", payload = Seq("rid"), tieBreak = "rid")
    val mrg = AsOfJoin.merge(l, r, on = Seq("user", "prop"), leftTs = "ts",
      rightTs = "ts", payload = Seq("rid"), tieBreak = "rid")
    assert(resultOf(win) == expect, "union+window form")
    assert(resultOf(mrg) == expect, "custom merge operator")
  }

  test("NULL payload field in the matched right row is honored, not skipped") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("id", "k", "ts")
    val right = Seq(
      (100L, 1L, 5L, Option(5.0), Option.empty[Double]),
      (200L, 1L, 8L, Option.empty[Double], Option(2.0)))
      .toDF("rid", "k", "ts", "v", "w")
    val out = AsOfJoin(left, right, Seq("k"), "ts", "ts",
      payload = Seq("v", "w"), tieBreak = "rid").collect()(0)
    // the as-of match is the ts=8 row: v must be NULL (not the older 5.0)
    // and w must be 2.0 — never a mix of the two right rows
    assert(out.isNullAt(3) && out.getDouble(4) == 2.0)
  }

  test("reserved working columns in either input fail fast") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L)).toDF("id", "k", "ts")
    val lBad = l.withColumn("__ts", col("ts"))
    val r = Seq((7L, 1L, 5L)).toDF("rid", "k", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin(lBad, r, on = Seq("k"), leftTs = "ts", rightTs = "ts",
        payload = Seq("rid"), tieBreak = "rid")
    }
    assert(e.getMessage.contains("__ts"))
    val rBad = r.withColumn("__tie", col("rid"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin(l, rBad, on = Seq("k"), leftTs = "ts", rightTs = "ts",
        payload = Seq("rid"), tieBreak = "rid")
    }
    assert(e2.getMessage.contains("__tie"))
  }

  test("non-long tieBreak types work (timestamp)") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("id", "k", "sec")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds(org.apache.spark.sql.functions.col("sec")))
      .drop("sec")
    val right = Seq((7L, 1L, 50L), (9L, 1L, 60L))
      .toDF("rid", "k", "sec")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds(org.apache.spark.sql.functions.col("sec")))
      .drop("sec")
      .withColumn("tie_ts", org.apache.spark.sql.functions.col("ts"))
    val out = AsOfJoin(left, right, Seq("k"), "ts", "ts",
      payload = Seq("rid"), tieBreak = "tie_ts").collect()(0)
    assert(out.getLong(out.length - 1) == 9L)
  }

  test("tolerance: stale-but-newest match nulls out, no fallback to older") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_seconds
    // key 1: clicks rid 1 @ 0s, rid 2 @ 100s. Probe @ 150s: newest is
    // rid 2, 50s old -> fresh under a 60s tolerance. Probe @ 200s:
    // newest is STILL rid 2 but 100s old -> null, and rid 1 must NOT be
    // picked instead (pandas discards, it does not fall back). Key 2 has
    // no clicks at all -> null.
    val l = Seq((10L, 1L, 150L), (11L, 1L, 200L), (12L, 2L, 50L))
      .toDF("id", "k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val r = Seq((1L, 1L, 0L), (2L, 1L, 100L))
      .toDF("rid", "k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = AsOfJoin.tolerance(l, r, on = Seq("k"), leftTs = "ts",
      rightTs = "ts", payload = Seq("rid"), tieBreak = "rid",
      toleranceUs = 60L * 1000000L)
    assert(out.columns.toSeq == Seq("id", "k", "ts", "rid_asof"))
    val got = out.collect().map(row =>
      row.getLong(0) -> Option(row.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(got == Map(10L -> Some(2L), 11L -> None, 12L -> None))
  }

  test("property: asofJoin == per-row linear scan on random tables") {
    val rnd = new scala.util.Random(42)
    for (iter <- 1 to 8) {
      val strict = iter % 2 == 0
      def rows(n: Int): Seq[(Long, Long, Long)] =
        (0 until n).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
      val left = rows(30)
      val right = rows(30)
      assert(runAsOf(left, right, strict) == oracle(left, right, strict),
        s"mismatch at iter $iter (strict=$strict)")
    }
  }

  private def runForward(
      left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)],
      strict: Boolean): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("id", "k", "ts")
    val r = right.toDF("rid", "k", "ts")
    AsOfJoin.forward(l, r, Seq("k"), "ts", "ts", Seq("rid"), "rid", strict)
      .collect().map { row =>
        row.getLong(0) -> Option(row.get(3)).map(_.asInstanceOf[Long])
      }.toMap
  }

  test("property: forward asofJoin == per-row linear scan on random tables") {
    val rnd = new scala.util.Random(43)
    for (iter <- 1 to 8) {
      val strict = iter % 2 == 0
      def rows(n: Int): Seq[(Long, Long, Long)] =
        (0 until n).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
      val left = rows(30)
      val right = rows(30)
      val want = left.map { case (id, k, ts) =>
        val cands = right.filter { case (_, rk, rts) =>
          rk == k && (if (strict) rts > ts else rts >= ts)
        }
        id -> (if (cands.isEmpty) None
               else Some(cands.minBy { case (rid, _, rts) => (rts, rid) }._1))
      }.toMap
      assert(runForward(left, right, strict) == want,
        s"mismatch at iter $iter (strict=$strict)")
    }
  }

  test("property: nearest asofJoin == linear scan, exact ties go backward") {
    import spark.implicits._
    val rnd = new scala.util.Random(44)
    for (iter <- 1 to 6) {
      def rows(n: Int): Seq[(Long, Long, Long)] =
        (0 until n).map(i => (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(40).toLong))
      val left = rows(25)
      val right = rows(25)
      val l = left.toDF("id", "k", "ts")
      val r = right.toDF("rid", "k", "ts")
      val got = AsOfJoin.nearest(l, r, Seq("k"), "ts", "ts", Seq("rid"), "rid")
        .collect().map { row =>
          row.getLong(0) -> Option(row.get(3)).map(_.asInstanceOf[Long])
        }.toMap
      val want = left.map { case (id, k, ts) =>
        val back = right.filter { case (_, rk, rts) => rk == k && rts <= ts }
          .sortBy { case (rid, _, rts) => (-rts, -rid) }.headOption
        val fwd = right.filter { case (_, rk, rts) => rk == k && rts > ts }
          .sortBy { case (rid, _, rts) => (rts, rid) }.headOption
        id -> ((back, fwd) match {
          case (None, None) => None
          case (Some((rid, _, _)), None) => Some(rid)
          case (None, Some((rid, _, _))) => Some(rid)
          case (Some((bid, _, bts)), Some((fid, _, fts))) =>
            if (ts - bts <= fts - ts) Some(bid) else Some(fid)
        })
      }.toMap
      assert(got == want, s"mismatch at iter $iter")
    }
  }

  // ---- custom Catalyst sort-merge operator (AsOfMergeJoinExec) ----

  private def runMerge(
      left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)],
      strict: Boolean): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("id", "k", "ts")
    val r = right.toDF("rid", "k", "ts")
    AsOfJoin.merge(l, r, Seq("k"), "ts", "ts", Seq("rid"), "rid", strict)
      .collect().map { row =>
        row.getLong(0) -> Option(row.get(3)).map(_.asInstanceOf[Long])
      }.toMap
  }

  test("merge operator == linear-scan oracle on random tables (incl. self-join shape)") {
    val rnd = new scala.util.Random(7)
    for (iter <- 1 to 8) {
      val strict = iter % 2 == 0
      def rows(n: Int): Seq[(Long, Long, Long)] =
        (0 until n).map(i => (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(40).toLong))
      val left = rows(40)
      val right = rows(40)
      assert(runMerge(left, right, strict) == oracle(left, right, strict),
        s"merge mismatch at iter $iter (strict=$strict)")
    }
    // self-join (same plan on both sides) must not collide expr ids
    import spark.implicits._
    val e = Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("rid", "k", "ts")
    val out = AsOfJoin.merge(
      e.select(col("rid").as("id"), col("k"), col("ts")), e,
      Seq("k"), "ts", "ts", Seq("rid"), "rid")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }

  test("merge operator plans as AsOfMergeJoinExec, never a nested loop") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L)).toDF("id", "k", "ts")
    val r = Seq((9L, 1L, 5L)).toDF("rid", "k", "ts")
    val df = AsOfJoin.merge(l, r, Seq("k"), "ts", "ts", Seq("rid"), "rid")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(df.collect()(0).getLong(3) == 9L)
  }

  test("merge operator honors NULL payload fields of the matched row") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L)).toDF("id", "k", "ts")
    val r = Seq(
      (100L, 1L, 5L, Option(5.0)),
      (200L, 1L, 8L, Option.empty[Double])).toDF("rid", "k", "ts", "v")
    val out = AsOfJoin.merge(l, r, Seq("k"), "ts", "ts", Seq("v"), "rid")
      .collect()(0)
    assert(out.isNullAt(3)) // latest match (ts=8) has v = NULL; 5.0 is stale
  }

  test("asof_join TVF: pure SQL text == Scala API, all three directions") {
    import spark.implicits._
    graft.functions.TableFunctions.ensureRegistered(spark)
    val l = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 10L))
      .toDF("id", "k", "ts")
    val r = Seq((100L, 1L, 5L), (200L, 1L, 15L), (300L, 2L, 30L))
      .toDF("rid", "k", "rts")
    l.createOrReplaceTempView("tvf_l"); r.createOrReplaceTempView("tvf_r")
    def viaSql(dir: String) = spark.sql(
      s"SELECT * FROM asof_join('tvf_l', 'tvf_r', 'k', 'ts', 'rts', " +
        s"'rid', 'rid', '$dir')").collect().map(_.toSeq).toSet
    assert(viaSql("backward") ==
      AsOfJoin.merge(l, r, Seq("k"), "ts", "rts", Seq("rid"), "rid")
        .collect().map(_.toSeq).toSet)
    assert(viaSql("forward") ==
      AsOfJoin.forward(l, r, Seq("k"), "ts", "rts", Seq("rid"), "rid")
        .collect().map(_.toSeq).toSet)
    assert(viaSql("nearest") ==
      AsOfJoin.nearest(l, r, Seq("k"), "ts", "rts", Seq("rid"), "rid")
        .collect().map(_.toSeq).toSet)
    // the SQL path plans the SAME custom operator
    val plan = spark.sql(
      "SELECT * FROM asof_join('tvf_l', 'tvf_r', 'k', 'ts', 'rts', " +
        "'rid', 'rid')").queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    // non-literal / bad-direction arguments fail fast at analysis
    assertThrows[Exception](spark.sql(
      "SELECT * FROM asof_join('tvf_l', 'tvf_r', 'k', 'ts', 'rts', " +
        "'rid', 'rid', 'sideways')").collect())
  }

  test("snapshot TVF: pure SQL text == Temporal.snapshot") {
    import spark.implicits._
    graft.functions.TableFunctions.ensureRegistered(spark)
    val changes = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), 10L, 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-14 00:00:00"), 11L, 2.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-16 00:00:00"), 12L, 3.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 20L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    changes.createOrReplaceTempView("tvf_props")
    val viaSql = spark.sql(
      "SELECT user_id, value FROM snapshot('tvf_props', 'user_id', 'ts', " +
        "'2024-01-15 00:00:00', 'event_id') ORDER BY user_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // as of Jan 15: user 1 -> the Jan 14 change (2.0), user 2 -> 9.0
    assert(viaSql == Map(1L -> 2.0, 2L -> 9.0))

    // multi-key: the entity argument is a CSV key list — per
    // (user_id, prop) the read partitions on BOTH columns
    val mk = Seq(
      (1L, "color", java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), 1L, 5.0),
      (1L, "color", java.sql.Timestamp.valueOf("2024-01-14 00:00:00"), 2L, 6.0),
      (1L, "size", java.sql.Timestamp.valueOf("2024-01-12 00:00:00"), 3L, 7.0))
      .toDF("user_id", "prop", "ts", "event_id", "value")
    mk.createOrReplaceTempView("tvf_props_mk")
    val viaMk = spark.sql(
      "SELECT user_id, prop, value FROM snapshot('tvf_props_mk', " +
        "'user_id,prop', 'ts', '2024-01-15 00:00:00', 'event_id') " +
        "ORDER BY user_id, prop")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(viaMk == Map((1L, "color") -> 6.0, (1L, "size") -> 7.0))
  }
}
