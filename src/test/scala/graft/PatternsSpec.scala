package graft

import graft.ops.Patterns
import org.apache.spark.sql.functions._

/** Q57 — the parameterized sequence-pattern machine: contiguous (KMP)
  * mode vs a string-replace oracle, subsequence mode vs a hand fold,
  * repeated-symbol patterns where a naive reset machine undercounts.
  */
class PatternsSpec extends SparkSpecBase {

  /** Events for one user at minute offsets with the given type codes. */
  private def evDF(userSyms: (Long, Seq[String])*) = {
    import spark.implicits._
    userSyms.flatMap { case (u, syms) =>
      syms.zipWithIndex.map { case (sym, i) =>
        (u, i.toLong + 1L,
          new java.sql.Timestamp(1700006400000L + i * 60000L), sym)
      }
    }.toDF("user_id", "event_id", "ts", "event_type")
  }

  private def run(df: org.apache.spark.sql.DataFrame, pat: Seq[String],
      contiguous: Boolean): Map[Long, (Long, Long)] =
    Patterns.matchCounts(df, "user_id", "ts", "event_id", "event_type",
        pat, contiguous)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  /** Non-overlapping greedy contiguous count — the replace-trick oracle
    * (each symbol one char).
    */
  private def replaceCount(syms: Seq[String], pat: Seq[String]): Long = {
    val s = syms.map(_.head).mkString
    val p = pat.map(_.head).mkString
    ((s.length - s.replace(p, "").length) / p.length).toLong
  }

  /** Greedy subsequence count — the straightforward reference fold. */
  private def subseqCount(syms: Seq[String], pat: Seq[String]): Long = {
    var stage = 0; var cnt = 0L
    syms.foreach { sym =>
      if (sym == pat(stage)) {
        stage += 1
        if (stage == pat.length) { cnt += 1; stage = 0 }
      }
    }
    cnt
  }

  test("contiguous mode: repeated-symbol pattern needs the KMP fallback") {
    // a,a,a,b contains ONE contiguous a,a,b — a naive reset machine
    // (drop to stage 0 on mismatch) finds none
    val df = evDF(1L -> Seq("a", "a", "a", "b"))
    assert(run(df, Seq("a", "a", "b"), contiguous = true) ==
      Map(1L -> ((4L, 1L))))
    // overlap is NOT allowed: a,b,a,b,a,b has one a,b,a,b (chars 1-4),
    // the second needs chars 3-6 but 3-4 are consumed
    val df2 = evDF(2L -> Seq("a", "b", "a", "b", "a", "b"))
    assert(run(df2, Seq("a", "b", "a", "b"), contiguous = true) ==
      Map(2L -> ((6L, 1L))))
  }

  test("both modes == their reference folds on random streams (100 cases)") {
    val rnd = new scala.util.Random(57)
    val alphabet = Vector("a", "b", "c")
    val cases = (1L to 100L).map { u =>
      u -> Seq.fill(3 + rnd.nextInt(40))(alphabet(rnd.nextInt(3)))
    }
    val df = evDF(cases: _*)
    for (pat <- Seq(Seq("a", "b"), Seq("a", "a", "b"), Seq("a", "b", "a"),
        Seq("a", "b", "c", "a"))) {
      val cont = run(df, pat, contiguous = true)
      val sub = run(df, pat, contiguous = false)
      cases.foreach { case (u, syms) =>
        assert(cont(u) == ((syms.length.toLong, replaceCount(syms, pat))),
          s"contiguous user $u pat $pat syms $syms got ${cont(u)}")
        assert(sub(u) == ((syms.length.toLong, subseqCount(syms, pat))),
          s"subseq user $u pat $pat syms $syms got ${sub(u)}")
      }
    }
  }

  private def runWithin(df: org.apache.spark.sql.DataFrame,
      pat: Seq[String], contiguous: Boolean,
      within: Long): Map[Long, (Long, Long)] =
    Patterns.matchCounts(df, "user_id", "ts", "event_id", "event_type",
        pat, contiguous, withinUs = Some(within))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  /** Bounded subsequence reference: same greedy fold, anchor stamped on
    * the 0→1 transition, hit counts iff span ≤ within. Timestamps are
    * the evDF minute grid (event i at i minutes).
    */
  private def subseqCountWithin(syms: Seq[String], pat: Seq[String],
      withinMin: Long): Long = {
    var stage = 0; var cnt = 0L; var anchor = 0L
    syms.zipWithIndex.foreach { case (sym, i) =>
      if (sym == pat(stage)) {
        if (stage == 0) anchor = i.toLong
        stage += 1
        if (stage == pat.length) {
          if (i.toLong - anchor <= withinMin) cnt += 1
          stage = 0
        }
      }
    }
    cnt
  }

  /** Bounded contiguous reference: leftmost non-overlapping occurrences
    * via indexOf (independent of the KMP fold); each occupies |pat|
    * CONSECUTIVE events so its span is |pat|−1 minutes — the bound
    * either admits every match or none, which the test exploits.
    */
  private def contCountWithin(syms: Seq[String], pat: Seq[String],
      withinMin: Long): Long = {
    val s = syms.map(_.head).mkString
    val p = pat.map(_.head).mkString
    var from = 0; var cnt = 0L
    var i = s.indexOf(p, from)
    while (i >= 0) {
      if ((p.length - 1).toLong <= withinMin) cnt += 1
      from = i + p.length
      i = s.indexOf(p, from)
    }
    cnt
  }

  test("withinUs gates counting only; None reproduces the unbounded fold") {
    val rnd = new scala.util.Random(571)
    val alphabet = Vector("a", "b", "c")
    val cases = (1L to 80L).map { u =>
      u -> Seq.fill(3 + rnd.nextInt(40))(alphabet(rnd.nextInt(3)))
    }
    val df = evDF(cases: _*)
    for (pat <- Seq(Seq("a", "b"), Seq("a", "a", "b"), Seq("a", "b", "a"));
        withinMin <- Seq(0L, 1L, 2L, 5L)) {
      val sub = runWithin(df, pat, contiguous = false,
        within = withinMin * 60000000L)
      val cont = runWithin(df, pat, contiguous = true,
        within = withinMin * 60000000L)
      cases.foreach { case (u, syms) =>
        assert(sub(u) ==
          ((syms.length.toLong, subseqCountWithin(syms, pat, withinMin))),
          s"subseq user $u pat $pat within $withinMin syms $syms")
        assert(cont(u) ==
          ((syms.length.toLong, contCountWithin(syms, pat, withinMin))),
          s"cont user $u pat $pat within $withinMin syms $syms")
      }
    }
    // a huge bound == unbounded, both modes
    for (pat <- Seq(Seq("a", "b", "a"))) {
      assert(runWithin(df, pat, contiguous = false, within = Long.MaxValue)
        == run(df, pat, contiguous = false))
      assert(runWithin(df, pat, contiguous = true, within = Long.MaxValue)
        == run(df, pat, contiguous = true))
    }
  }

  test("q57c: bound excludes the slow funnel, keeps the fast one") {
    // user 1: v..c..v..p inside 3 minutes → counts at within=3min;
    // user 2: same shape but the purchase lands 10 minutes after the
    // anchor view → structural match, excluded by the bound
    val df = evDF(
      1L -> Seq("view", "click", "view", "purchase"),
      2L -> Seq("view", "click", "view", "x", "x", "x", "x", "x", "x",
        "x", "purchase"))
    val got = runWithin(df, Seq("view", "click", "view", "purchase"),
      contiguous = false, within = 3L * 60000000L)
    assert(got == Map(1L -> ((4L, 1L)), 2L -> ((11L, 0L))))
  }

  // ---- quantified stages (q57d) ----

  private def runQ(df: org.apache.spark.sql.DataFrame,
      stages: Seq[(String, Int, Int)]): Map[Long, (Long, Long)] =
    Patterns.quantifiedCounts(df, "user_id", "ts", "event_id",
        "event_type", stages)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  /** Independent reference for `A B+ C`-class patterns via regex over
    * the one-char symbol string: greedy intermediate / lazy final /
    * naive restart over DISTINCT-adjacent symbols is exactly leftmost
    * non-overlapping regex matching with a reluctant final quantifier.
    */
  private def regexCount(syms: Seq[String], re: String): Long =
    re.r.findAllIn(syms.map(_.head).mkString).length.toLong

  test("quantified: A B+ C greedy/lazy/restart semantics") {
    // basic: a bb c = one match; clicks absorbed greedily
    assert(runQ(evDF(1L -> Seq("a", "b", "b", "c")),
      Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1)))
      == Map(1L -> ((4L, 1L))))
    // zero clicks = no match (min 1)
    assert(runQ(evDF(1L -> Seq("a", "c")),
      Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1)))
      == Map(1L -> ((2L, 0L))))
    // min 0 middle stage may be skipped entirely
    assert(runQ(evDF(1L -> Seq("a", "c")),
      Seq(("a", 1, 1), ("b", 0, Int.MaxValue), ("c", 1, 1)))
      == Map(1L -> ((2L, 1L))))
    // naive restart: a b a b c — the dead first attempt's trailing `a`
    // re-anchors, so the second attempt still lands
    assert(runQ(evDF(1L -> Seq("a", "b", "a", "b", "c")),
      Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1)))
      == Map(1L -> ((5L, 1L))))
    // bounded max: a b b b c with b{1,2} — third b overflows, restart
    // finds no second attempt
    assert(runQ(evDF(1L -> Seq("a", "b", "b", "b", "c")),
      Seq(("a", 1, 1), ("b", 1, 2), ("c", 1, 1)))
      == Map(1L -> ((5L, 0L))))
    // lazy final: with C{1,2} the match closes at the FIRST c; the
    // second c cannot extend a closed match, and no new match starts
    assert(runQ(evDF(1L -> Seq("a", "b", "c", "c")),
      Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 2)))
      == Map(1L -> ((4L, 1L))))
    // non-overlapping: two back-to-back full runs both count
    assert(runQ(evDF(1L -> Seq("a", "b", "c", "a", "b", "b", "c")),
      Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1)))
      == Map(1L -> ((7L, 2L))))
  }

  test("quantified == regex reference on random streams (80 cases)") {
    val rnd = new scala.util.Random(5757)
    val alphabet = Vector("a", "b", "c", "x")
    val cases = (1L to 80L).map { u =>
      u -> Seq.fill(3 + rnd.nextInt(40))(alphabet(rnd.nextInt(4)))
    }
    val df = evDF(cases: _*)
    val got = runQ(df,
      Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1)))
    cases.foreach { case (u, syms) =>
      assert(got(u) == ((syms.length.toLong, regexCount(syms, "ab+?c"))),
        s"user $u syms $syms got ${got(u)} want ${regexCount(syms, "ab+?c")}")
    }
  }

  // ---- quantified stages + WITHIN (q57e) ----

  private def runQW(df: org.apache.spark.sql.DataFrame,
      stages: Seq[(String, Int, Int)], within: Long): Map[Long, (Long, Long)] =
    Patterns.quantifiedCounts(df, "user_id", "ts", "event_id",
        "event_type", stages, withinUs = Some(within))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("quantified WITHIN: re-anchoring view restarts the clock; " +
      "slow runs excluded; None == unbounded") {
    val st = Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1))
    // fast run (a b c in 2 minutes) counts at within=2min
    assert(runQW(evDF(1L -> Seq("a", "b", "c")), st, 2L * 60000000L)
      == Map(1L -> ((3L, 1L))))
    // greedy clicks stretch the span past the bound → structural match,
    // excluded (a b b b b c spans 5 minutes, bound 2)
    assert(runQW(evDF(1L -> Seq("a", "b", "b", "b", "b", "c")), st,
      2L * 60000000L) == Map(1L -> ((6L, 0L))))
    // the naive-restart re-anchor RESTARTS the clock: a b a b c — the
    // first attempt dies at minute 2's `a`, which anchors the second
    // attempt; its span (minutes 2→4) fits a 2-minute bound even though
    // the stream's full span (0→4) doesn't
    assert(runQW(evDF(1L -> Seq("a", "b", "a", "b", "c")), st,
      2L * 60000000L) == Map(1L -> ((5L, 1L))))
    // huge bound == unbounded fold, on a random stream
    val rnd = new scala.util.Random(575)
    val cases = (1L to 40L).map { u =>
      u -> Seq.fill(3 + rnd.nextInt(40))(
        Vector("a", "b", "c", "x")(rnd.nextInt(4)))
    }
    val df = evDF(cases: _*)
    assert(runQW(df, st, Long.MaxValue) == runQ(df, st))
  }

  // ---- alternation stages (q58) ----

  private def runQA(df: org.apache.spark.sql.DataFrame,
      stages: Seq[(Set[String], Int, Int)]): Map[Long, (Long, Long)] =
    Patterns.quantifiedCountsAlt(df, "user_id", "ts", "event_id",
        "event_type", stages)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("alternation: A (B|X)+ C semantics, disjointness require, " +
      "singleton == string form, regex equivalence (60 cases)") {
    val st = Seq((Set("a"), 1, 1), (Set("b", "x"), 1, Int.MaxValue),
      (Set("c"), 1, 1))
    // the x path keeps the attempt alive where the b-only machine dies
    assert(runQA(evDF(1L -> Seq("a", "x", "c")), st)
      == Map(1L -> ((3L, 1L))))
    assert(runQA(evDF(1L -> Seq("a", "b", "x", "b", "c")), st)
      == Map(1L -> ((5L, 1L))))
    // singleton sets == the string form bit-for-bit
    val strSt = Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1))
    val dfs = evDF(1L -> Seq("a", "b", "a", "b", "c", "x", "a", "b", "c"))
    assert(runQA(dfs, strSt.map { case (s, mn, mx) => (Set(s), mn, mx) })
      == runQ(dfs, strSt))
    // adjacent sets must be DISJOINT (overlap makes stay-vs-advance
    // ambiguous)
    intercept[IllegalArgumentException] {
      runQA(evDF(1L -> Seq("a")),
        Seq((Set("a"), 1, 1), (Set("a", "b"), 1, 2)))
    }
    // randomized equivalence vs the regex reference a[bx]+?c
    val rnd = new scala.util.Random(5858)
    val alphabet = Vector("a", "b", "c", "x")
    val cases = (1L to 60L).map { u =>
      u -> Seq.fill(3 + rnd.nextInt(40))(alphabet(rnd.nextInt(4)))
    }
    val got = runQA(evDF(cases: _*), st)
    cases.foreach { case (u, syms) =>
      assert(got(u) == ((syms.length.toLong, regexCount(syms, "a[bx]+?c"))),
        s"user $u syms $syms")
    }
  }

  // ---- q57f: re-anchoring WITHIN (MATCH_RECOGNIZE parity) ----

  /** Events for one user at explicit SECOND offsets. */
  private def evSec(userEvs: (Long, Seq[(Long, String)])*) = {
    import spark.implicits._
    userEvs.flatMap { case (u, evs) =>
      evs.zipWithIndex.map { case ((sec, sym), i) =>
        (u, i.toLong + 1L,
          new java.sql.Timestamp(1700006400000L + sec * 1000L), sym)
      }
    }.toDF("user_id", "event_id", "ts", "event_type")
  }

  private def runRe(df: org.apache.spark.sql.DataFrame, pat: Seq[String],
      w: Long): Map[Long, (Long, Long)] =
    Patterns.reanchoredCounts(df, "user_id", "ts", "event_id",
        "event_type", pat, w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  /** The operational re-anchoring semantics, brute force: smallest
    * anchor ≥ pos whose greedy-earliest completion is in bound counts;
    * resume after its completing event (SKIP PAST LAST ROW). evs =
    * (ts_us, sym) in stream order.
    */
  private def bruteReanchored(evs: IndexedSeq[(Long, String)],
      pat: Seq[String], w: Long): Long = {
    val n = evs.length
    var pos = 0; var cnt = 0L; var more = true
    while (more) {
      var a = pos; var end = -1
      while (a < n && end < 0) {
        if (evs(a)._2 == pat(0)) {
          if (pat.length == 1) end = a
          else {
            var i = a + 1; var stage = 1; var done = false
            while (i < n && !done) {
              if (evs(i)._2 == pat(stage)) {
                stage += 1
                if (stage == pat.length) {
                  done = true
                  if (evs(i)._1 - evs(a)._1 <= w) end = i
                }
              }
              i += 1
            }
          }
        }
        if (end < 0) a += 1
      }
      if (end >= 0) { cnt += 1; pos = end + 1 } else more = false
    }
    cnt
  }

  test("q57f re-anchoring WITHIN: ADVICE example counts 1 where the " +
      "greedy anchor counts 0") {
    // view@t0, view@t5m, click@t5m30s, within = 1 minute
    val adv = evSec(1L -> Seq((0L, "view"), (300L, "view"),
      (330L, "click")))
    assert(runRe(adv, Seq("view", "click"), 60L * 1000000L) ==
      Map(1L -> ((3L, 1L))))
    val greedy = Patterns.matchCounts(adv, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click"), contiguous = false,
        withinUs = Some(60L * 1000000L))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(greedy == ((3L, 0L)))
  }

  test("q57f == brute-force re-anchoring replay on random streams; " +
      "unbounded == the greedy subsequence fold") {
    val rnd = new scala.util.Random(5714)
    val alphabet = Vector("a", "b", "c", "x")
    val cases = (1L to 60L).map { u =>
      var t = 0L
      u -> Seq.fill(3 + rnd.nextInt(40)) {
        t += 1L + rnd.nextInt(5)
        (t, alphabet(rnd.nextInt(4)))
      }
    }
    val df = evSec(cases: _*)
    for (pat <- Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "b", "a"),
          Seq("a", "a", "b"));
        wSec <- Seq(3L, 7L, 20L)) {
      val w = wSec * 1000000L
      val got = runRe(df, pat, w)
      cases.foreach { case (u, evs) =>
        val ref = bruteReanchored(
          evs.map { case (s, sym) => (s * 1000000L, sym) }.toIndexedSeq,
          pat, w)
        assert(got(u) == ((evs.length.toLong, ref)),
          s"user $u pat $pat w=$wSec evs $evs got ${got(u)} want $ref")
      }
    }
    // bound off => every attempt stays live => the earliest anchor wins
    // every completion => exactly the greedy subsequence machine
    val un = runRe(df, Seq("a", "b", "c"), Long.MaxValue / 2)
    val greedy = run(df, Seq("a", "b", "c"), contiguous = false)
    assert(un == greedy)
  }

  // ---- the SQL door (q58b) ----

  test("match_pattern TVF over a TABLE() subquery == Scala API on the " +
      "filtered frame; decorations rejected") {
    graft.functions.TableFunctions.ensureRegistered(spark)
    // with x filtered out by the SUBQUERY, user 1's a..b..c becomes one
    // contiguous a b+ c match that the unfiltered stream does NOT have
    // (x kills the quantified attempt) — proving the subquery actually
    // feeds the machine
    val df = evDF(1L -> Seq("a", "x", "b", "c"), 2L -> Seq("a", "b", "c"))
    df.createOrReplaceTempView("tvf_tblarg_events")
    val viaSql = spark.sql(
      """SELECT entity, n_events, n_matches FROM match_pattern(
        |  TABLE(SELECT * FROM tvf_tblarg_events WHERE event_type <> 'x'),
        |  'user_id', 'ts', 'event_id', 'event_type', 'a b+ c', 0)
        |ORDER BY entity""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql == Seq((1L, 3L, 1L), (2L, 3L, 1L)))
    val viaApi = Patterns.quantifiedCounts(
        df.filter(col("event_type") =!= "x"),
        "user_id", "ts", "event_id", "event_type",
        Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1)))
      .orderBy("entity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaApi == viaSql)
    // unfiltered control: user 1 has NO match (x breaks contiguity)
    val ctl = spark.sql(
      """SELECT n_matches FROM match_pattern('tvf_tblarg_events',
        |  'user_id', 'ts', 'event_id', 'event_type', 'a b+ c', 0)
        |WHERE entity = 1""".stripMargin).collect()
    assert(ctl.head.getLong(0) == 0L)
    // PARTITION BY / ORDER BY decorations on the table argument clash
    // with the operator's own partitioning — rejected, not ignored
    val ex = intercept[Exception] {
      spark.sql(
        """SELECT * FROM match_pattern(
          |  TABLE(SELECT * FROM tvf_tblarg_events)
          |    PARTITION BY user_id ORDER BY ts,
          |  'user_id', 'ts', 'event_id', 'event_type', 'a b+ c', 0)"""
          .stripMargin).collect()
    }
    assert(ex.getMessage.contains("PARTITION BY") ||
      String.valueOf(ex.getCause).contains("PARTITION BY"))
    // TABLE() also reaches the other doors: asof_join over subqueries
    val trades = evDF(1L -> Seq("t", "t"))
    val quotes = evDF(1L -> Seq("q"))
    trades.createOrReplaceTempView("tvf_tblarg_trades")
    quotes.createOrReplaceTempView("tvf_tblarg_quotes")
    val aj = spark.sql(
      """SELECT count(*) FROM asof_join(
        |  TABLE(SELECT user_id, ts, event_id FROM tvf_tblarg_trades),
        |  TABLE(SELECT user_id, ts AS qts, event_id AS qid
        |        FROM tvf_tblarg_quotes),
        |  'user_id', 'ts', 'qts', 'qid', 'qid')""".stripMargin)
      .collect()
    assert(aj.head.getLong(0) == 2L)
  }

  test("parsePattern rejects unbalanced parens and bare alternation") {
    import graft.ops.Patterns.parsePattern
    assert(parsePattern("view (click|error)+ purchase") ==
      Seq((Set("view"), 1, 1), (Set("click", "error"), 1, Int.MaxValue),
        (Set("purchase"), 1, 1)))
    // ADVICE r13: these parsed silently before — now they must fail
    Seq("(a|b", "a|b)", "a|b", "(a|b+", "()", "(|)").foreach { bad =>
      intercept[IllegalArgumentException] { parsePattern(s"$bad c") }
    }
  }

  test("match_pattern TVF: SQL == Scala API for alternation, '+', " +
      "bare stages, and the within bound") {
    graft.functions.TableFunctions.ensureRegistered(spark)
    val df = evDF(1L -> Seq("a", "x", "b", "c", "a", "b", "c"),
      2L -> Seq("a", "c"))
    df.createOrReplaceTempView("tvf_pat_events")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    assert(rows(spark.sql(
        "SELECT * FROM match_pattern('tvf_pat_events', 'user_id', 'ts', " +
          "'event_id', 'event_type', 'a (b|x)+ c', 0)")) ==
      rows(Patterns.quantifiedCountsAlt(df, "user_id", "ts", "event_id",
        "event_type", Seq((Set("a"), 1, 1),
          (Set("b", "x"), 1, Int.MaxValue), (Set("c"), 1, 1)))))
    assert(rows(spark.sql(
        "SELECT * FROM match_pattern('tvf_pat_events', 'user_id', 'ts', " +
          s"'event_id', 'event_type', 'a b c', ${3L * 60000000L})")) ==
      rows(Patterns.quantifiedCountsAlt(df, "user_id", "ts", "event_id",
        "event_type",
        Seq((Set("a"), 1, 1), (Set("b"), 1, 1), (Set("c"), 1, 1)),
        withinUs = Some(3L * 60000000L))))
  }

  // ---- per-match emission (q59) ----

  test("per-match rows: anchors/ends on the evDF minute grid, bound " +
      "filters, row count == match count on random streams") {
    val st = Seq((Set("a"), 1, 1), (Set("b"), 1, Int.MaxValue),
      (Set("c"), 1, 1))
    def rows(df: org.apache.spark.sql.DataFrame, within: Option[Long]) =
      Patterns.quantifiedMatchesAlt(df, "user_id", "ts", "event_id",
          "event_type", st, within)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toList.sorted
    // two runs: a b c | a b b c — anchors at minutes 0 and 3, ends at
    // minutes 2 and 6 (evDF places event k at minute k)
    val df = evDF(1L -> Seq("a", "b", "c", "a", "b", "b", "c"))
    val min = 60000000L
    val base = rows(df, None).map(t => (t._1, t._2,
      (t._3 - rows(df, None).head._3) / min,
      (t._4 - rows(df, None).head._3) / min))
    assert(base == List((1L, 1L, 0L, 2L), (1L, 2L, 3L, 6L)))
    // a 2-minute bound keeps only the first (span 2 ≤ 2; span 3 > 2)
    assert(rows(df, Some(2L * min)).map(_._2) == List(1L))
    // random streams: per-user row count == quantifiedCounts' n_matches
    val rnd = new scala.util.Random(5959)
    val cases = (1L to 50L).map { u =>
      u -> Seq.fill(3 + rnd.nextInt(40))(
        Vector("a", "b", "c", "x")(rnd.nextInt(4)))
    }
    val rdf = evDF(cases: _*)
    val counts = runQ(rdf,
      Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1)))
    val perUser = rows(rdf, None).groupBy(_._1).view.mapValues(_.size.toLong)
    cases.foreach { case (u, _) =>
      assert(perUser.getOrElse(u, 0L) == counts(u)._2, s"user $u")
    }
  }

  test("quantified WITHIN == bounded regex reference on random streams (80 cases)") {
    // the completing attempt's consumed events are CONSECUTIVE, so its
    // anchor is the regex match start and the span is (end-1 − start)
    // minutes on the evDF grid — bounded count = regex matches whose
    // span fits the bound (leftmost non-overlapping, reluctant final)
    val rnd = new scala.util.Random(57575)
    val alphabet = Vector("a", "b", "c", "x")
    val cases = (1L to 80L).map { u =>
      u -> Seq.fill(3 + rnd.nextInt(40))(alphabet(rnd.nextInt(4)))
    }
    val df = evDF(cases: _*)
    val st = Seq(("a", 1, 1), ("b", 1, Int.MaxValue), ("c", 1, 1))
    for (withinMin <- Seq(2L, 4L, 8L)) {
      val got = runQW(df, st, withinMin * 60000000L)
      cases.foreach { case (u, syms) =>
        val want = "ab+?c".r.findAllMatchIn(syms.map(_.head).mkString)
          .count(m => (m.end - 1 - m.start).toLong <= withinMin).toLong
        assert(got(u) == ((syms.length.toLong, want)),
          s"user $u within $withinMin syms $syms got ${got(u)} want $want")
      }
    }
  }

  test("per-match MEASURES: accumulators reseed on re-anchor, include " +
      "the completing event, min-0 skipped stages leave no timestamp, " +
      "rows == q59 surface + measures") {
    import spark.implicits._
    // events at minute i (0-based), value = i+1 dollars -> (i+1)*100 c
    def evDFv(userSyms: (Long, Seq[String])*) =
      userSyms.flatMap { case (u, syms) =>
        syms.zipWithIndex.map { case (sym, i) =>
          (u, i.toLong + 1L,
            new java.sql.Timestamp(1700006400000L + i * 60000L), sym,
            (i + 1).toDouble)
        }
      }.toDF("user_id", "event_id", "ts", "event_type", "value")
    val baseUs = 1700006400000000L
    def tMin(i: Int): Long = baseUs + i * 60000000L
    val st = Seq((Set("a"), 1, 1), (Set("b"), 1, Int.MaxValue),
      (Set("c"), 1, 1))
    def measured(df: org.apache.spark.sql.DataFrame,
        stages: Seq[(Set[String], Int, Int)],
        within: Option[Long] = None) =
      Patterns.quantifiedMatchMeasuresAlt(df, "user_id", "ts", "event_id",
          "event_type", "value", stages, within)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5),
          r.getSeq[Long](6).toList)).toList.sortBy(t => (t._1, t._2))
    // a b c | a a b b c | x a c: run1 = events 0,1,2; the second 'a'
    // (idx 4) RE-ANCHORS and must reseed the accumulators (idx 3's
    // event drops out); trailing a,c never completes
    val df = evDFv(1L -> Seq("a", "b", "c", "a", "a", "b", "b", "c",
      "x", "a", "c"))
    assert(measured(df, st) == List(
      (1L, 1L, tMin(0), tMin(2), 3L, 600L,
        List(tMin(0), tMin(1), tMin(2))),
      (1L, 2L, tMin(4), tMin(7), 4L, 2600L,
        List(tMin(4), tMin(5), tMin(7)))))
    // a skipped min-0 middle stage leaves ANCHOR_NONE in its slot
    val st0 = Seq((Set("a"), 1, 1), (Set("b"), 0, 2), (Set("c"), 1, 1))
    assert(measured(evDFv(2L -> Seq("a", "c")), st0) == List(
      (2L, 1L, tMin(0), tMin(1), 2L, 300L,
        List(tMin(0), Patterns.ANCHOR_NONE, tMin(1)))))
    // the WITHIN gate filters measures rows exactly like q59's rows
    val dfb = evDFv(3L -> Seq("a", "b", "c", "a", "b", "b", "c"))
    assert(measured(dfb, st, Some(2L * 60000000L)).map(_._2) == List(1L))
    // random streams: (entity, match_no, anchor, end) == the q59
    // surface row-for-row — the machine/count/anchor evolution is
    // shared, so the measures surface can never diverge
    val rnd = new scala.util.Random(5960)
    val cases = (1L to 40L).map { u =>
      u -> Seq.fill(3 + rnd.nextInt(40))(
        Vector("a", "b", "c", "x")(rnd.nextInt(4)))
    }
    val rdf = evDFv(cases: _*)
    val q59rows = Patterns.quantifiedMatchesAlt(rdf, "user_id", "ts",
        "event_id", "event_type", st, Some(3L * 60000000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val mrows = measured(rdf, st, Some(3L * 60000000L))
      .map(t => (t._1, t._2, t._3, t._4)).toSet
    assert(mrows == q59rows && q59rows.nonEmpty)
  }

  test("q57c at withinUs=None == q57 on the fixture") {
    val q57 = SparkEntry.queries("q57_pattern_funnel")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val unbounded = Patterns.matchCounts(
        graft.Tables.load(spark, sfDir, "events"),
        "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "view", "purchase"), contiguous = false,
        withinUs = None)
      .filter(col("n_matches") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(unbounded == q57 && q57.nonEmpty)
  }

  test("q57b contiguous machine == q42 replace trick on the fixture") {
    val q42 = SparkEntry.queries("q42_seq_pattern")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val q57b = SparkEntry.queries("q57b_pattern_contiguous")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(q57b == q42 && q42.nonEmpty)
  }
}
