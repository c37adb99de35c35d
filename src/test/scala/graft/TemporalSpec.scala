package graft

import graft.ops.Temporal
import org.apache.spark.sql.functions._

/** Temporal-operator invariants (SURVEY.md §5.2): snapshot ≡ filter+last,
  * interval-view adjacency, sessionization gap laws (incl. the exact
  * 30-min boundary rule), randomized with a fixed seed.
  */
class TemporalSpec extends SparkSpecBase {

  private def changeDf(rows: Seq[(Long, Long, Long)]) = { // (id, entity, tsSec)
    import spark.implicits._
    rows.toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .drop("sec")
  }

  test("snapshot == per-entity last change at-or-before t (randomized)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val rows = (0 until 40).map(i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(100).toLong))
      val t = rnd.nextInt(100).toLong
      val got = Temporal.snapshot(changeDf(rows), "user_id", "ts",
          timestamp_seconds(lit(t)), "event_id")
        .select("user_id", "event_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.filter(_._3 <= t).groupBy(_._2).map { case (u, rs) =>
        u -> rs.maxBy(r => (r._3, r._1))._1
      }
      assert(got == want)
    }
  }

  test("multi-key reads == single-key reads over the composite key (randomized)") {
    // The Seq-keyed snapshot / intervalView / sessionize must partition
    // by (entity, prop_key) exactly as the single-key forms partition by
    // a pre-concatenated composite — the reference's (entity_id, key,
    // ts, value) store read both ways.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 60).map(i => (i.toLong, rnd.nextInt(3).toLong,
      s"p${rnd.nextInt(3)}", rnd.nextInt(50).toLong))
    val df = rows.toDF("event_id", "user_id", "prop", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val composite = df.withColumn("__ck",
      concat_ws("", col("user_id"), col("prop")))
    def keyed(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2))
    val snapMulti = Temporal.snapshot(df, Seq("user_id", "prop"), "ts",
        timestamp_seconds(lit(25)), "event_id")
      .select("user_id", "prop", "event_id").collect().map(keyed).toSet
    val snapSingle = Temporal.snapshot(composite, "__ck", "ts",
        timestamp_seconds(lit(25)), "event_id")
      .select("user_id", "prop", "event_id").collect().map(keyed).toSet
    assert(snapMulti == snapSingle && snapMulti.nonEmpty)
    val ivMulti = Temporal.intervalView(df, Seq("user_id", "prop"), "ts",
        "event_id")
      .select("user_id", "prop", "event_id", "valid_from", "valid_to")
      .collect().map(_.toSeq).toSet
    val ivSingle = Temporal.intervalView(composite, "__ck", "ts", "event_id")
      .select("user_id", "prop", "event_id", "valid_from", "valid_to")
      .collect().map(_.toSeq).toSet
    assert(ivMulti == ivSingle)
    val sessMulti = Temporal.sessionize(df, Seq("user_id", "prop"), "ts",
        "event_id", gapSeconds = 10)
      .select("user_id", "prop", "event_id", "session_id")
      .collect().map(_.toSeq).toSet
    val sessSingle = Temporal.sessionize(composite, "__ck", "ts",
        "event_id", gapSeconds = 10)
      .select("user_id", "prop", "event_id", "session_id")
      .collect().map(_.toSeq).toSet
    assert(sessMulti == sessSingle)
  }

  test("bitemporal snapshot: late knowledge excluded, tTx=inf == snapshot") {
    import spark.implicits._
    // user 1's value changes at valid times 10 and 20, but the change at
    // 20 is only RECORDED at tx 35 (late backfill) while the change at
    // 10 was recorded immediately (tx 10)
    val rows = Seq(
      (1L, 1L, 10L, 10L, 100.0), // (event_id, user, valid, tx, value)
      (2L, 1L, 20L, 35L, 200.0),
      (3L, 2L, 5L, 5L, 900.0))
      .toDF("event_id", "user_id", "sec", "tx_sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    def read(tValidSec: Long, tTxSec: Long): Map[Long, Double] =
      Temporal.bitemporalSnapshot(rows, "user_id", "ts", "tx_sec",
          timestamp_seconds(lit(tValidSec)), lit(tTxSec), "event_id")
        .select("user_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // asking at (valid 25, tx 30): the valid-20 change EXISTS on the
    // valid axis but was not yet known — the answer is the valid-10 value
    assert(read(25L, 30L) == Map(1L -> 100.0, 2L -> 900.0))
    // the same valid-time question after the backfill landed (tx 40)
    assert(read(25L, 40L) == Map(1L -> 200.0, 2L -> 900.0))
    // valid-time cutoff still applies independently of tx
    assert(read(15L, 40L) == Map(1L -> 100.0, 2L -> 900.0))
    // tTx = +inf degenerates to the plain snapshot
    val snap = Temporal.snapshot(rows, "user_id", "ts",
        timestamp_seconds(lit(25L)), "event_id")
      .select("user_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(read(25L, Long.MaxValue) == snap)
  }

  test("bitemporal snapshot == brute-force two-axis scan (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 5) {
      val rows = (0 until 50).map { i =>
        val valid = rnd.nextInt(80).toLong
        // tx at or after valid (records never predate the fact), with a
        // random lag so late knowledge genuinely interleaves
        (i.toLong, rnd.nextInt(4).toLong, valid,
          valid + rnd.nextInt(30).toLong, rnd.nextInt(1000) / 10.0)
      }
      val df = rows.toDF("event_id", "user_id", "vsec", "tx_sec", "value")
        .withColumn("ts", timestamp_seconds(col("vsec"))).drop("vsec")
      val (tv, tt) = (rnd.nextInt(90).toLong, rnd.nextInt(110).toLong)
      val got = Temporal.bitemporalSnapshot(df, "user_id", "ts", "tx_sec",
          timestamp_seconds(lit(tv)), lit(tt), "event_id")
        .select("user_id", "event_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.filter(r => r._3 <= tv && r._4 <= tt)
        .groupBy(_._2).map { case (u, rs) =>
          u -> rs.maxBy(r => (r._3, r._1))._1
        }
      assert(got == want, s"tValid=$tv tTx=$tt")
    }
  }

  test("scd2 merge: keep / close+reopen / delete-close / insert-open") {
    import spark.implicits._
    // entity 1 unchanged; 2 deleted; 3 changed (and has a prior closed
    // row that must pass through untouched); 4 newly inserted
    val hist = Seq[(Long, Long, Long, java.lang.Long)](
      (1L, 10L, 100L, null), (2L, 20L, 100L, null),
      (3L, 30L, 50L, 100L), (3L, 31L, 100L, null))
      .toDF("id", "v", "valid_from_us", "valid_to_us")
    val snap = Seq((1L, 10L), (3L, 32L), (4L, 40L)).toDF("id", "v")
    val out = Temporal.scd2Merge(hist, snap, "id", Seq("v"), atUs = 200L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out == Set(
      (3L, 30L, 50L, 100L),   // already closed: untouched
      (1L, 10L, 100L, -1L),   // unchanged: kept open with original from
      (2L, 20L, 100L, 200L),  // deleted: closed at merge time
      (3L, 31L, 100L, 200L),  // changed: old closed ...
      (3L, 32L, 200L, -1L),   // ... new opened
      (4L, 40L, 200L, -1L)))  // inserted: opened
    // idempotence: re-merging the same snapshot changes nothing
    val again = Temporal.scd2Merge(
        Temporal.scd2Merge(hist, snap, "id", Seq("v"), 200L),
        snap, "id", Seq("v"), 300L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(again == out)
  }

  test("interval view: per-entity intervals are adjacent and cover once") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong))
    val iv = Temporal.intervalView(changeDf(rows), "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("valid_from")).as("f"),
        unix_micros(col("valid_to")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    iv.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.toSeq.sortBy(r => (r._3, r._2))
      // exactly one open interval per entity, and it is the last one
      assert(sorted.count(_._4.isEmpty) == 1)
      assert(sorted.last._4.isEmpty)
      // each valid_to equals the next valid_from
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
    }
  }

  test("sessionize: exact 30-min gap stays in session, 30min+1us splits") {
    import spark.implicits._
    val base = 1700000000000000L // epoch micros
    val gap30 = 1800L * 1000000L
    val rows = Seq(
      (1L, 1L, base),
      (2L, 1L, base + gap30), // exactly 30 min -> same session
      (3L, 1L, base + gap30 + gap30 + 1) // 30 min + 1 us -> new session
    ).toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = Temporal.sessionize(rows, "user_id", "ts", "event_id", 1800)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("sessionize invariants: gaps within <= gap < gaps between (randomized)") {
    val rnd = new scala.util.Random(13)
    val gapSec = 100L
    val rows = (0 until 60).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong))
    val out = Temporal.sessionize(changeDf(rows), "user_id", "ts", "event_id",
        gapSec)
      .select(col("user_id"), col("session_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.toSeq.sortBy(r => (r._3, r._4))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          val gapUs = b._3 - a._3
          if (b._2 == a._2) assert(gapUs <= gapSec * 1000000L)
          else {
            assert(b._2 == a._2 + 1)
            assert(gapUs > gapSec * 1000000L)
          }
        case _ =>
      }
    }
  }

  test("gaps is the dual of sessionize: breaks align, boundary excluded (randomized)") {
    // Same lag, two views: sessionize's session increments happen exactly
    // at the silences gaps() reports, so per entity
    // n_gaps == max(session_id), and each reported (gap_start, gap_end)
    // must be a consecutive cross-session pair. Exact-threshold rule
    // shares sessionize's: == gap is NOT a gap.
    val rnd = new scala.util.Random(29)
    val gapSec = 100L
    val rows = (0 until 80).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong))
    val df = changeDf(rows)
    val sessions = Temporal.sessionize(df, "user_id", "ts", "event_id", gapSec)
      .groupBy("user_id").agg(max(col("session_id")).as("n_breaks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gaps = Temporal.gaps(df, "user_id", "ts", "event_id", gapSec)
      .select(col("user_id"), unix_micros(col("gap_start")).as("f"),
        unix_micros(col("gap_end")).as("t"), col("gap_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byEntity = gaps.groupBy(_._1)
    (0L to 2L).foreach { u =>
      assert(byEntity.getOrElse(u, Array.empty).length ==
        sessions.getOrElse(u, 0L), s"entity $u")
    }
    gaps.foreach { case (_, f, t, us) =>
      assert(us == t - f && us > gapSec * 1000000L)
    }

    // boundary: exactly-threshold silence is not reported, +1us is
    val base = 1700000000000000L
    import spark.implicits._
    val edge = Seq((1L, 1L, base), (2L, 1L, base + gapSec * 1000000L),
        (3L, 1L, base + 2 * gapSec * 1000000L + 1))
      .toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = Temporal.gaps(edge, "user_id", "ts", "event_id", gapSec)
      .select("gap_us").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(gapSec * 1000000L + 1))
  }

  test("compaction == linear-scan oracle, null-safe, idempotent (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 3) {
      // small value domain so runs occur; value 2 mapped to null to
      // exercise the null-safe (<=>) comparison
      val rows = (0 until 80).map(i =>
        (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(300).toLong,
          rnd.nextInt(3).toLong))
      val df = rows.toDF("event_id", "user_id", "sec", "rawv")
        .withColumn("ts", timestamp_seconds(col("sec")))
        .withColumn("v", when(col("rawv") === 2, lit(null)).otherwise(col("rawv")))
        .drop("sec", "rawv")
      val compact = Temporal.compactChangePoints(
        df, "user_id", "ts", "event_id", col("v"))
      val got = compact.select("event_id").collect().map(_.getLong(0)).toSet
      // oracle: per entity in (ts, event_id) order, keep rows whose value
      // differs (Option-equality) from the previous kept-or-not row
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => (r._3, r._1))
        val vals = sorted.map(r => if (r._4 == 2) None else Some(r._4))
        sorted.zip(None +: vals.init.map(Some(_))).collect {
          case ((id, _, _, v), prev)
            if !prev.contains(if (v == 2) None else Some(v)) => id
        }
      }.toSet
      assert(got == want)
      // idempotent: compacting the compacted table changes nothing
      val again = Temporal.compactChangePoints(
          compact, "user_id", "ts", "event_id", col("v"))
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(again == got)
      // snapshot values at random probe times agree with the raw table
      for (_ <- 1 to 3) {
        val t = timestamp_seconds(lit(rnd.nextInt(300)))
        def snapVals(d: org.apache.spark.sql.DataFrame) =
          Temporal.snapshot(d, "user_id", "ts", t, "event_id")
            .select("user_id", "v").collect()
            .map(r => r.getLong(0) ->
              (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
        assert(snapVals(compact) == snapVals(df))
      }
    }
  }

  test("temporal join == brute-force interval intersection (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 3) {
      def mkIntervals(n: Int, tag: String): (Seq[(Long, Long, Long, Option[Long])], org.apache.spark.sql.DataFrame) = {
        val rows = (0 until n).map(i =>
          (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(200).toLong))
        val df = rows.toDF("event_id", "user_id", "sec")
          .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
        val iv = Temporal.intervalView(df, "user_id", "ts", "event_id")
          .select(col("user_id"),
            col("valid_from"), col("valid_to"),
            col("event_id").as(s"${tag}_id"))
        // linear-scan intervals: (id, user, from, Option(to))
        val flat = rows.groupBy(_._2).toSeq.flatMap { case (u, rs) =>
          val sorted = rs.sortBy(r => (r._3, r._1))
          sorted.zip(sorted.drop(1).map(n => Some(n._3 * 1000000L)) :+ None)
            .map { case ((id, _, sec), to) => (id, u, sec * 1000000L, to) }
        }
        (flat, iv)
      }
      val (aFlat, aIv) = mkIntervals(20, "a")
      val (bFlat, bIv) = mkIntervals(15, "b")
      val got = Temporal.temporalJoin(aIv, bIv, "user_id")
        .select(col("user_id"), unix_micros(col("valid_from")).as("f"),
          unix_micros(col("valid_to")).as("t"), col("a_id"), col("b_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getLong(3), r.getLong(4))).toSet
      val want = (for {
        (aid, au, af, at) <- aFlat
        (bid, bu, bf, bt) <- bFlat
        if au == bu
        f = math.max(af, bf)
        t = (at, bt) match {
          case (Some(x), Some(y)) => Some(math.min(x, y))
          case (x, y) => x.orElse(y)
        }
        if t.forall(f < _)
      } yield (au, f, t, aid, bid)).toSet
      assert(got == want)
    }
  }

  test("time-weighted aggregation: clipping, open intervals, late starters") {
    import spark.implicits._
    val changes = Seq(
      (1L, 1L, 0L, 100L),   // user 1: 100 cents on [0,10), 300 on [10,inf)
      (2L, 1L, 10L, 300L),
      (3L, 2L, 8L, 50L))    // user 2 starts inside the window
      .toDF("event_id", "user_id", "sec", "c")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = Temporal.timeWeighted(changes, "user_id", "ts", "event_id",
        valueCents = col("c"),
        t1 = timestamp_seconds(lit(5)), t2 = timestamp_seconds(lit(20)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // user 1: 100·[5,10) + 300·[10,20) = 100·5e6 + 300·10e6 = 3.5e9 over 15e6 µs
    // user 2: 50·[8,20) = 50·12e6 = 6e8 over 12e6 µs
    assert(got == Map(
      1L -> (3500000000L, 15000000L),
      2L -> (600000000L, 12000000L)))
  }

  test("aggregation index: reagg from daily rollup == direct aggregation") {
    val ev = Tables.load(spark, sfDir, "events")
    val daily = Temporal.rollupDaily(ev, "user_id", "ts",
      Det.cents(col("value")))
    for (days <- Seq(2, 7)) {
      val fromIndex = Temporal.reaggDaily(daily, "user_id", "2024-01-01", days)
        .orderBy("user_id", "bucket")
      val direct = ev
        .groupBy(col("user_id"),
          floor(datediff(date_trunc("day", col("ts")), lit("2024-01-01")
            .cast("date")) / lit(days.toDouble)).cast("long").as("bucket"))
        .agg(
          min(Det.cents(col("value"))).as("min_cents"),
          max(Det.cents(col("value"))).as("max_cents"),
          sum(Det.cents(col("value"))).as("sum_cents"),
          count(lit(1)).as("cnt"))
        .orderBy("user_id", "bucket")
      assert(fromIndex.collect().toSeq == direct.collect().toSeq)
    }
  }

  test("aggregation index: pre-origin days floor to negative buckets") {
    import spark.implicits._
    // 2023-12-31 is day -1 from the origin: floor(-1/7) = -1, the bucket
    // DuckDB's // computes — truncating `div` would merge it into bucket
    // 0 with the first post-origin week
    val changes = Seq(
      (1L, 1L, "2023-12-31 12:00:00", 100L),
      (2L, 1L, "2024-01-02 12:00:00", 200L))
      .toDF("event_id", "user_id", "t", "c")
      .withColumn("ts", col("t").cast("timestamp")).drop("t")
    val daily = Temporal.rollupDaily(changes, "user_id", "ts", col("c"))
    val got = Temporal.reaggDaily(daily, "user_id", "2024-01-01", 7)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(got == Map(-1L -> 100L, 0L -> 200L))
  }

  test("resampleDaily: gaps forward-fill, same-day ties take max tieBreak") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val changes = Seq(
      // user 1: Jan 1 (two same-ts rows — id 11 must win), gap, Jan 4
      (1L, t("2024-01-01 10:00:00"), 10L, 1.0),
      (1L, t("2024-01-01 10:00:00"), 11L, 2.0),
      (1L, t("2024-01-04 09:00:00"), 12L, 5.0),
      // user 2: single day
      (2L, t("2024-02-10 00:00:00"), 20L, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Temporal.resampleDaily(changes, "user_id", "ts", "value",
        "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) -> r.getDouble(2))
      .toMap
    assert(got == Map(
      (1L, "2024-01-01 00:00:00.0") -> 2.0, // tie -> event_id 11
      (1L, "2024-01-02 00:00:00.0") -> 2.0, // gap day: carried forward
      (1L, "2024-01-03 00:00:00.0") -> 2.0,
      (1L, "2024-01-04 00:00:00.0") -> 5.0,
      (2L, "2024-02-10 00:00:00.0") -> 7.0))
  }

  test("temporal TVFs: interval_view / time_range / sessionize SQL == Scala API") {
    import spark.implicits._
    graft.functions.TableFunctions.ensureRegistered(spark)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val changes = Seq(
      (1L, t("2024-01-10 00:00:00"), 10L, 1.0),
      (1L, t("2024-01-11 12:00:00"), 11L, 2.0),
      (1L, t("2024-01-13 00:00:00"), 12L, 3.0),
      (2L, t("2024-01-01 00:00:00"), 20L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    changes.createOrReplaceTempView("tvf_changes")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(spark.sql(
        "SELECT * FROM interval_view('tvf_changes', 'user_id', 'ts', 'event_id')")) ==
      rows(Temporal.intervalView(changes, "user_id", "ts", "event_id")))
    assert(rows(spark.sql(
        "SELECT * FROM time_range('tvf_changes', 'user_id', 'ts', 'event_id', " +
          "'2024-01-11 00:00:00', '2024-01-12 00:00:00')")) ==
      rows(Temporal.timeRange(changes, "user_id", "ts", "event_id",
        lit("2024-01-11 00:00:00").cast("timestamp"),
        lit("2024-01-12 00:00:00").cast("timestamp"))))
    assert(rows(spark.sql(
        "SELECT * FROM sessionize('tvf_changes', 'user_id', 'ts', 'event_id', 86400)")) ==
      rows(Temporal.sessionize(changes, "user_id", "ts", "event_id", 86400)))
    val holds = changes.select(col("user_id"), col("event_id"),
      col("ts").as("h_start"),
      (col("ts") + expr("interval 2 days")).as("h_end"))
    holds.createOrReplaceTempView("tvf_holds")
    assert(rows(spark.sql(
        "SELECT * FROM coalesce_intervals('tvf_holds', 'user_id', " +
          "'h_start', 'h_end', 'event_id')")) ==
      rows(Temporal.coalesceIntervals(holds, Seq("user_id"),
        "h_start", "h_end", "event_id")))
    // non-integer gap argument fails fast
    assertThrows[Exception](spark.sql(
      "SELECT * FROM sessionize('tvf_changes', 'user_id', 'ts', 'event_id', 'soon')")
      .collect())
    // bitemporal TVF == Scala API, both t_tx conventions: numeric µs
    // against a numeric tx column, timestamp string against a timestamp
    // tx column
    val bi = changes.withColumn("tx_us",
      unix_micros(col("ts")) + col("event_id") % 3 * lit(86400000000L))
    bi.createOrReplaceTempView("tvf_bi")
    assert(rows(spark.sql(
        "SELECT * FROM bitemporal_snapshot('tvf_bi', 'user_id', 'ts', " +
          "'tx_us', '2024-01-12 00:00:00', 1705017600000000, 'event_id')")) ==
      rows(Temporal.bitemporalSnapshot(bi, "user_id", "ts", "tx_us",
        lit("2024-01-12 00:00:00").cast("timestamp"),
        lit(1705017600000000L), "event_id")))
    val bi2 = changes.withColumn("tx_ts", col("ts"))
    bi2.createOrReplaceTempView("tvf_bi2")
    assert(rows(spark.sql(
        "SELECT * FROM bitemporal_snapshot('tvf_bi2', 'user_id', 'ts', " +
          "'tx_ts', '2024-01-12 00:00:00', '2024-01-11 00:00:00', 'event_id')")) ==
      rows(Temporal.bitemporalSnapshot(bi2, "user_id", "ts", "tx_ts",
        lit("2024-01-12 00:00:00").cast("timestamp"),
        lit("2024-01-11 00:00:00").cast("timestamp"), "event_id")))
  }

  test("snapshotDiff: insert / update / unchanged / null-value semantics") {
    import spark.implicits._
    val ch = Seq(
      // user 1: 10 at day 1, updated to 20 at day 3  -> update
      (1L, "2024-01-01 00:00:00", 1L, Some(10L)),
      (1L, "2024-01-03 00:00:00", 2L, Some(20L)),
      // user 2: unchanged between t1 and t2          -> omitted
      (2L, "2024-01-01 00:00:00", 3L, Some(5L)),
      // user 3: first appears at day 3               -> insert
      (3L, "2024-01-03 00:00:00", 4L, Some(7L)),
      // user 4: NULL at t1, NULL at t2 (same change point) -> omitted;
      // null value must NOT read as absence
      (4L, "2024-01-01 00:00:00", 5L, None),
      // user 5: NULL at t1, 9 at t2 -> update (null-safe comparison)
      (5L, "2024-01-01 00:00:00", 6L, None),
      (5L, "2024-01-03 00:00:00", 7L, Some(9L)),
      // user 6: appears AFTER t2 -> not in the diff at all
      (6L, "2024-01-09 00:00:00", 8L, Some(1L)))
      .toDF("user_id", "ts_s", "event_id", "v")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("event_id"), col("v"))
    val got = Temporal.snapshotDiff(ch, Seq("user_id"), "ts",
        t1 = lit("2024-01-02 00:00:00").cast("timestamp"),
        t2 = lit("2024-01-05 00:00:00").cast("timestamp"),
        tieBreak = "event_id", valueCols = Seq("v"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (1L, "update", Some(20L), Some(10L)),
      (3L, "insert", Some(7L), None),
      (5L, "update", Some(9L), None)))
  }

  test("temporalAlign: outer segments, stale gaps, mutual gaps dropped") {
    import spark.implicits._
    def iv(rows: Seq[(Long, Long, Long, Long, Long)], pay: String) =
      rows.toDF("user_id", "f", "t", "id", pay)
        .withColumn("valid_from", timestamp_seconds(col("f")))
        .withColumn("valid_to", timestamp_seconds(col("t")))
        .drop("f", "t")
    // user 1: A covers [0,10) and [20,30); B covers [5,25) and [40,50).
    // Expected segments: [0,5) A-only, [5,10) both, [10,20) B-only,
    // [20,25) both, [25,30) A-only, [40,50) B-only; [30,40) is the
    // mutual gap and must NOT appear.
    val a = iv(Seq((1L, 0L, 10L, 101L, 7L), (1L, 20L, 30L, 102L, 8L)), "va")
      .withColumnRenamed("id", "a_id")
    val b = iv(Seq((1L, 5L, 25L, 201L, 1L), (1L, 40L, 50L, 202L, 2L)), "vb")
      .withColumnRenamed("id", "b_id")
    val got = Temporal.temporalAlign(a, b, "user_id", "a_id", "b_id")
      .select(unix_seconds(col("seg_from")), unix_seconds(col("seg_to")),
        col("a_id"), col("b_id"))
      .orderBy("seg_from").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSeq
    assert(got == Seq(
      (0L, 5L, Some(101L), None),
      (5L, 10L, Some(101L), Some(201L)),
      (10L, 20L, None, Some(201L)),
      (20L, 25L, Some(102L), Some(201L)),
      (25L, 30L, Some(102L), None),
      (40L, 50L, None, Some(202L))))
  }

  test("coalesceIntervals: nesting, touching merges, strict gap splits") {
    import spark.implicits._
    // The lag(end) trap: [0,100) swallows [10,20); [10,20)'s own end must
    // NOT re-open a span when [90,110) arrives (frontier is 100, not 20).
    // [110,120) touches 110 -> merges; [121,130) is a strict gap -> splits.
    val iv = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 90L, 110L),
      (1L, 4L, 110L, 120L), (1L, 5L, 121L, 130L),
      (2L, 6L, 5L, 6L))
      .toDF("user_id", "event_id", "s_sec", "e_sec")
      .withColumn("ivl_start", timestamp_seconds(col("s_sec")))
      .withColumn("ivl_end", timestamp_seconds(col("e_sec")))
    val got = Temporal.coalesceIntervals(iv, Seq("user_id"),
        "ivl_start", "ivl_end", "event_id")
      .select(col("user_id"), unix_timestamp(col("span_start")).as("f"),
        unix_timestamp(col("span_end")).as("t"), col("n_intervals"))
      .orderBy("user_id", "f")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 120L, 4L), (1L, 121L, 130L, 1L), (2L, 5L, 6L, 1L)))
  }

  test("peakConcurrency: touching not concurrent, nesting stacks, sweep is linear") {
    import spark.implicits._
    // user 1: [0,100) ∪ nested [10,20) ∪ [15,30) -> three open at t=15..20
    // (peak 3); [100,110) TOUCHES the first's end -> the -1 sorts before
    // the +1 at t=100, so the count never reads 2 there.
    // user 2: disjoint intervals only -> peak 1.
    val iv = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 15L, 30L),
      (1L, 4L, 100L, 110L),
      (2L, 5L, 0L, 5L), (2L, 6L, 7L, 9L))
      .toDF("user_id", "event_id", "s_sec", "e_sec")
      .withColumn("ivl_start", timestamp_seconds(col("s_sec")))
      .withColumn("ivl_end", timestamp_seconds(col("e_sec")))
    val got = Temporal.peakConcurrency(iv, Seq("user_id"),
        "ivl_start", "ivl_end", "event_id")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 4L, 3L), (2L, 2L, 1L)))
  }

  test("peakConcurrency == brute-force max overlap at starts (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val iv = (1 to 300).map { i =>
      val s = rnd.nextInt(500).toLong
      (rnd.nextInt(5).toLong + 1, i.toLong, s, s + 1 + rnd.nextInt(60))
    }
    val df = iv.toDF("user_id", "event_id", "s_sec", "e_sec")
      .withColumn("ivl_start", timestamp_seconds(col("s_sec")))
      .withColumn("ivl_end", timestamp_seconds(col("e_sec")))
    val got = Temporal.peakConcurrency(df, Seq("user_id"),
        "ivl_start", "ivl_end", "event_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // peak concurrency is attained at some interval's start point, so
    // brute force = for each interval, count its user's intervals
    // covering [its start, its start+1)
    val brute = iv.groupBy(_._1).map { case (u, ivs) =>
      u -> (ivs.size.toLong,
        ivs.map(a => ivs.count(b => b._3 <= a._3 && a._3 < b._4).toLong).max)
    }
    assert(got == brute)
  }

  test("overlapAudit: touching legal, nested caught once, scd2 history clean") {
    import spark.implicits._
    // user 1: [0,10) then [10,20) touch -> legal; [15,30) overlaps the
    // frontier (20) -> ONE violation [15,20); [18,19) nested inside the
    // new frontier (30) -> violation [18,19) (own end < frontier).
    val iv = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 10L, 20L), (1L, 3L, 15L, 30L),
      (1L, 4L, 18L, 19L),
      (2L, 5L, 0L, 5L), (2L, 6L, 7L, 9L)) // clean user
      .toDF("user_id", "event_id", "s_sec", "e_sec")
      .withColumn("ivl_start", timestamp_seconds(col("s_sec")))
      .withColumn("ivl_end", timestamp_seconds(col("e_sec")))
    val got = Temporal.overlapAudit(iv, Seq("user_id"),
        "ivl_start", "ivl_end", "event_id")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ov_from")).as("f"),
        unix_timestamp(col("ov_to")).as("t"), col("ov_us"))
      .orderBy("user_id", "f")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 15L, 20L, 5000000L), (1L, 4L, 18L, 19L, 1000000L)))

    // an SCD2 history produced by the engine's own merge must be
    // audit-CLEAN: closed rows tile, one open row per entity
    val s1 = Seq((1L, 10L), (2L, 20L)).toDF("user_id", "v")
    val s2 = Seq((1L, 11L), (3L, 30L)).toDF("user_id", "v")
    val hist = Temporal.scd2Merge(Temporal.scd2Init(s1, 100L), s2,
        "user_id", Seq("v"), 200L)
      .withColumn("vf", timestamp_micros(col("valid_from_us")))
      // open rows audit with an effectively-infinite end
      .withColumn("vt", timestamp_micros(
        coalesce(col("valid_to_us"), lit(Long.MaxValue / 2))))
    assert(Temporal.overlapAudit(hist, Seq("user_id"), "vf", "vt", "v")
      .isEmpty)
  }

  test("intervalComplement: head/between/tail gaps, clipping, full coverage empty") {
    import spark.implicits._
    // window [100, 200). user 1: spans [110,120) and [150,160) -> gaps
    // [100,110) [120,150) [160,200). user 2: one span [90,210) crossing
    // both bounds -> fully covered, NO gaps. user 3: span [50,60) wholly
    // before the window -> filtered out, NO rows (absent != uncovered).
    val iv = Seq(
      (1L, 1L, 110L, 120L), (1L, 2L, 150L, 160L),
      (2L, 3L, 90L, 210L),
      (3L, 4L, 50L, 60L))
      .toDF("user_id", "event_id", "s_sec", "e_sec")
      .withColumn("ivl_start", timestamp_seconds(col("s_sec")))
      .withColumn("ivl_end", timestamp_seconds(col("e_sec")))
    val got = Temporal.intervalComplement(iv, Seq("user_id"),
        "ivl_start", "ivl_end", "event_id",
        lo = timestamp_seconds(lit(100)), hi = timestamp_seconds(lit(200)))
      .select(col("user_id"), unix_timestamp(col("gap_start")).as("f"),
        unix_timestamp(col("gap_end")).as("t"))
      .orderBy("user_id", "f")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 100L, 110L), (1L, 120L, 150L), (1L, 160L, 200L)))
  }

  test("resampleInterpolate: hand interpolation, exact-at-grid and " +
      "last-point degenerate to the event value") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: 100 cents at 01-01 00:00, 400 cents at 01-03 12:00
    //   grid 01-01 (exact hit) -> 100; 01-02 -> 24h/60h of +300 = 220;
    //   01-03 -> 48h/60h -> 340. user 2: one midnight event -> itself.
    val e = Seq(
      (1L, t("2024-01-01 00:00:00"), 10L, 1.00),
      (1L, t("2024-01-03 12:00:00"), 11L, 4.00),
      (2L, t("2024-02-10 00:00:00"), 20L, 7.00))
      .toDF("user_id", "ts", "event_id", "value")
    val got = graft.ops.Temporal.resampleInterpolate(e, "user_id", "ts",
        "event_id", graft.Det.cents(col("value")))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(got == Set(
      (1L, "2024-01-01 00:00:00.0", 100L),
      (1L, "2024-01-02 00:00:00.0", 220L),
      (1L, "2024-01-03 00:00:00.0", 340L),
      (2L, "2024-02-10 00:00:00.0", 700L)))
  }

  test("intervalComplement + clipped coverage partition the window (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val (lo, hi) = (100L, 300L)
    for (_ <- 1 to 3) {
      val rows = (0 until 60).map { i =>
        val s = rnd.nextInt(350).toLong
        (rnd.nextInt(3).toLong, i.toLong, s, s + 1 + rnd.nextInt(40).toLong)
      }
      val df = rows.toDF("user_id", "event_id", "s_sec", "e_sec")
        .withColumn("ivl_start", timestamp_seconds(col("s_sec")))
        .withColumn("ivl_end", timestamp_seconds(col("e_sec")))
      val gaps = Temporal.intervalComplement(df, Seq("user_id"),
          "ivl_start", "ivl_end", "event_id",
          lo = timestamp_seconds(lit(lo)), hi = timestamp_seconds(lit(hi)))
        .select(col("user_id"), unix_timestamp(col("gap_start")).as("f"),
          unix_timestamp(col("gap_end")).as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // per entity WITH in-window coverage: gap seconds + clipped
      // covered seconds == window width, and gaps never overlap spans
      val covered = rows.groupBy(_._1).map { case (u, rs) =>
        val secs = rs.flatMap { case (_, _, s, e) =>
          (math.max(s, lo) until math.min(e, hi)) }.toSet
        u -> secs
      }
      gaps.groupBy(_._1).foreach { case (u, gs) =>
        val gapSecs = gs.flatMap { case (_, f, t) => f until t }.toSet
        assert(gapSecs.intersect(covered(u)).isEmpty)
        assert(gapSecs.size + covered(u).size == (hi - lo))
      }
      // entities with some in-window interval but full coverage appear
      // with zero gaps — and none of the reported entities lack coverage
      gaps.foreach { case (u, _, _) => assert(covered(u).nonEmpty) }
    }
  }

  test("coalesceIntervals == linear-sweep oracle; spans disjoint (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 5) {
      val rows = (0 until 80).map { i =>
        val s = rnd.nextInt(200).toLong
        (rnd.nextInt(4).toLong, i.toLong, s, s + 1 + rnd.nextInt(30).toLong)
      }
      val df = rows.toDF("user_id", "event_id", "s_sec", "e_sec")
        .withColumn("ivl_start", timestamp_seconds(col("s_sec")))
        .withColumn("ivl_end", timestamp_seconds(col("e_sec")))
      val got = Temporal.coalesceIntervals(df, Seq("user_id"),
          "ivl_start", "ivl_end", "event_id")
        .select(col("user_id"), unix_timestamp(col("span_start")).as("f"),
          unix_timestamp(col("span_end")).as("t"), col("n_intervals"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val sorted = rs.sortBy(r => (r._3, r._2))
        val spans = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long)] // (start, end, n)
        sorted.foreach { case (_, _, s, e) =>
          if (spans.nonEmpty && s <= spans.last._2) {
            val (f0, t0, n0) = spans.last
            spans(spans.length - 1) = (f0, math.max(t0, e), n0 + 1)
          } else spans += ((s, e, 1L))
        }
        spans.map { case (f, t, n) => (u, f, t, n) }
      }.toSet
      assert(got == want)
      // spans per entity are pairwise disjoint and strictly separated
      want.groupBy(_._1).values.foreach { spans =>
        val sorted = spans.toSeq.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Seq((_, _, t1, _), (_, f2, _, _)) => assert(t1 < f2)
          case _ =>
        }
      }
    }
  }

  test("t32 point-in-time features are STRICTLY before (randomized, " +
      "forced ts collisions)") {
    // The leakage guarantee under test: a probe at ts T must see events
    // with ts < T and NOTHING at ts == T. Events and probes land on the
    // same coarse hour grid, so probe/event and event/event collisions
    // are guaranteed — the exact cases the probes-before-events tie
    // order exists for. Runs the REGISTRY entry end-to-end (temp parquet
    // fixture through Tables.load) against a brute-force per-probe scan.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val dir = java.nio.file.Files.createTempDirectory("graft-t32").toFile
    dir.deleteOnExit()
    val base = 1704067200000000L // 2024-01-01T00:00:00Z
    val hourUs = 3600000000L
    val events = (1 to 120).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        base + rnd.nextInt(40) * hourUs,
        Seq("click", "view", "purchase")(rnd.nextInt(3)),
        // negative values exercise the HALF_UP cents rounding
        rnd.nextDouble() * 50 - 5)
    }
    events.toDF("event_id", "user_id", "ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val orders = (1 to 60).map { i =>
      val u = rnd.nextInt(5).toLong
      // o_custkey ≡ user (mod 50) — the query's probe-key convention
      (1000L + i, u + 50, base + rnd.nextInt(40) * hourUs)
    }
    orders.toDF("o_orderkey", "o_custkey", "ts_us")
      .withColumn("o_orderdate", timestamp_micros(col("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("t32_pit_features")(spark, dir.getAbsolutePath)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val want = orders.map { case (ok, ck, tUs) =>
      val prior = events.filter(e => e._2 == ck % 50 && e._3 < tUs)
      val cents = prior.map(e => Det.centsJvm(e._5)).sum
      val lastType =
        if (prior.isEmpty) "none"
        else prior.maxBy(e => (e._3, e._1))._4
      ok -> ((prior.size.toLong, cents, lastType))
    }.toMap
    assert(got == want)
    // collisions actually occurred (the test would be vacuous otherwise)
    val eventTs = events.map(e => (e._2, e._3)).toSet
    assert(orders.exists(o => eventTs.contains((o._2 % 50, o._3))),
      "no probe landed on an event timestamp — tighten the grid")
  }
}
