package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q57 — parameterized sequence-pattern matching over event streams, the
  * MATCH_RECOGNIZE-lite surface q42's fixed view→click→purchase motif
  * generalizes to: the pattern is an ARGUMENT (a sequence of event-type
  * symbols), matched per entity in (ts, tieBreak) order by a state-machine
  * fold — the sessionStep/asofBatch shape, so the scan is one pass with
  * O(1) state per entity and the sequence never leaves its partition.
  *
  * Two matching modes, both greedy left-to-right and non-overlapping
  * (count++ then reset — a matched event is never reused):
  *
  *  - `contiguous = true`: the pattern must occupy CONSECUTIVE events —
  *    exactly the semantics of q42's `replace(seq, 'vcp', '')` string
  *    trick. Mismatch recovery uses a KMP failure table over the pattern
  *    symbols: a naive reset-to-zero undercounts patterns with repeated
  *    symbols (stream a,a,a,b contains one "a,a,b" — the naive machine
  *    finds none; PatternsSpec pins this).
  *  - `contiguous = false`: events may intervene between stages — the
  *    funnel/subsequence semantics real conversion analysis wants.
  *
  * At 100 TB: one entity-keyed shuffle + linear scan, the exact plan of
  * the other per-entity folds (sessionize, asofBatch); at the reference's
  * scale MATCH_RECOGNIZE engines do the same partition-sort-scan. The
  * per-partition output buffer is one row per entity (the result itself),
  * not per event.
  */
object Patterns {

  case class PatEv(entity: Long, ts_us: Long, tie: Long, sym: String)
  case class PatCount(entity: Long, n_events: Long, n_matches: Long)

  /** KMP failure table over pattern symbols: fail(k) = length of the
    * longest proper prefix of pattern[0,k) that is also its suffix.
    */
  private[ops] def failure(p: Seq[String]): Array[Int] = {
    val f = new Array[Int](p.length + 1)
    var k = 0
    for (i <- 1 until p.length) {
      while (k > 0 && p(i) != p(k)) k = f(k)
      if (p(i) == p(k)) k += 1
      f(i + 1) = k
    }
    f
  }

  /** One machine step, shared by both modes (the sessionStep discipline:
    * one function, so a future streaming twin cannot diverge). Returns
    * (newStage, matchedNow).
    */
  private[ops] def step(pat: Array[String], fail: Array[Int],
      contiguous: Boolean, stage0: Int, sym: String): (Int, Boolean) = {
    var stage = stage0
    if (contiguous) {
      while (stage > 0 && sym != pat(stage)) stage = fail(stage)
      if (sym == pat(stage)) stage += 1
    } else if (sym == pat(stage)) stage += 1
    if (stage == pat.length) (0, true) else (stage, false)
  }

  /** Per-entity (n_events, n_matches) for `pattern` over the stream
    * ordered by (ts, tieBreak). Every entity with at least one event
    * appears (callers filter n_matches > 0 when they only want hits).
    *
    * Q57c — `withinUs`: a time bound on the MATCH in the spirit of
    * `WITHIN <duration>` ("view→click→purchase within 7 days") — with
    * ONE deliberate semantic narrowing (ADVICE r12): the bound FILTERS
    * the greedy machine's completed matches, anchored at the FIRST
    * stage-0 symbol of each attempt. It does NOT re-try later anchors
    * the way SQL MATCH_RECOGNIZE's WITHIN does, so a stream whose
    * greedy anchor is stale but which contains a later bounded match
    * (view@t0, view@t5m, click@t5m30s, within=1min) counts 0 here
    * where a re-anchoring matcher counts 1 — greedy-anchor WITHIN can
    * UNDERCOUNT vs MATCH_RECOGNIZE. The oracle replays exactly this
    * greedy-anchor semantics bit-for-bit; callers who need re-anchoring
    * parity need a per-anchor machine (O(|pattern|) parallel states),
    * not this O(1) fold. The structural machine is UNCHANGED — events
    * advance stages and are consumed exactly as in the unbounded fold
    * (so withinUs=None reproduces q57 bit-for-bit); the bound only
    * gates whether a completed match COUNTS: it counts iff
    * ts(last stage) − ts(first stage) ≤ withinUs. State cost: one
    * anchor timestamp (subsequence — stamped on the 0→1 transition) or
    * a |pattern|−1 ring of recent timestamps (contiguous — a completed
    * KMP match is always the last |pattern| consecutive events, so the
    * run start is the event |pattern|−1 steps back). Still O(1) per
    * entity, still one entity-keyed shuffle + linear scan.
    */
  def matchCounts(events: DataFrame, entity: String, ts: String,
      tieBreak: String, typeCol: String, pattern: Seq[String],
      contiguous: Boolean, withinUs: Option[Long] = None): DataFrame = {
    require(pattern.nonEmpty, "empty pattern")
    require(withinUs.forall(_ >= 0L), "negative withinUs")
    val spark = events.sparkSession
    import spark.implicits._
    val pat = pattern.toArray
    val fail = failure(pattern)
    val within = withinUs.getOrElse(Long.MaxValue)
    val span = pat.length - 1
    events.select(col(entity).cast("long").as("entity"),
        graft.Det.epochUs(col(ts)).as("ts_us"),
        col(tieBreak).cast("long").as("tie"),
        col(typeCol).cast("string").as("sym"))
      .as[PatEv]
      .repartition(col("entity"))
      .sortWithinPartitions("entity", "ts_us", "tie")
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[PatCount]
        var cur = 0L
        var started = false
        var stage = 0
        var cnt = 0L
        var n = 0L
        var anchor = 0L
        val ring = new Array[Long](math.max(span, 1))
        it.foreach { e =>
          if (!started) { started = true; cur = e.entity }
          else if (e.entity != cur) {
            out += PatCount(cur, n, cnt)
            cur = e.entity; stage = 0; cnt = 0L; n = 0L
          }
          // run-start bookkeeping — read by the counting gate only; the
          // structural step below never sees it. A contiguous hit at
          // per-entity index n spans events [n-span, n], whose start ts
          // sits at ring(n % span) (written span events ago, same
          // entity because a hit needs ≥ span prior events).
          val runStart =
            if (span == 0) e.ts_us
            else if (contiguous) ring((n % span).toInt)
            else {
              if (stage == 0 && e.sym == pat(0)) anchor = e.ts_us
              anchor
            }
          val (s2, hit) = step(pat, fail, contiguous, stage, e.sym)
          stage = s2
          if (hit && e.ts_us - runStart <= within) cnt += 1
          if (span > 0) ring((n % span).toInt) = e.ts_us
          n += 1
        }
        if (started) out += PatCount(cur, n, cnt)
        out.iterator
      }
      .toDF()
  }

  /** Q57d — quantified stages: the MATCH_RECOGNIZE `A B+ C` form. Each
    * stage is (symbol, minReps, maxReps) with maxReps=Int.MaxValue for
    * unbounded; matching is CONTIGUOUS and non-overlapping with these
    * pinned semantics (QuantSpec in PatternsSpec tests them explicitly):
    *
    *  - intermediate stages are GREEDY: while the event matches the
    *    current stage's symbol and reps < max, it extends that stage;
    *    the machine only advances on an event the stage cannot absorb
    *    (adjacent stages must use distinct symbols — required — so
    *    extend-vs-advance is never ambiguous and no backtracking
    *    arises);
    *  - advancing from a stage requires reps ≥ min; stages with min=0
    *    may be skipped entirely;
    *  - the FINAL stage is LAZY: the match completes (count++, reset)
    *    as soon as its min reps are reached — greedy-final would hold
    *    the match open speculatively, which a one-pass non-overlapping
    *    counter cannot do without lookahead;
    *  - on failure the machine resets and RE-TRIES the failing event
    *    from the start state (naive restart — the KMP table does not
    *    generalize to quantified stages; PatternsSpec pins this
    *    restart, e.g. in-flight `view` after a dead funnel starts the
    *    next attempt). The restart re-tries ONLY the single failing
    *    event, so a first stage with min > 1 could miss matches a
    *    backtracking matcher finds (stream a,a,a,b under (a,2,2),(b,1,1)
    *    has a match starting at the SECOND a, which a one-event restart
    *    never re-anchors to) — hence the `min == 1` anchor require
    *    below (ADVICE r12).
    *
    * Q57e — `withinUs`: the same greedy-anchor WITHIN filter as
    * [[matchCounts]] (see the q57c caveat there — it FILTERS completed
    * matches against the anchor of the attempt that produced them and
    * does not re-try later anchors, so it can undercount vs
    * MATCH_RECOGNIZE's re-anchoring WITHIN). The anchor is the event
    * that begins an attempt: the stage-0 consumption out of the reset
    * state, including the naive-restart re-try (a re-anchoring `view`
    * in the funnel instance restarts the clock, exactly what a live
    * funnel wants). withinUs=None reproduces the unbounded fold
    * bit-for-bit. Same state cost: one anchor long.
    *
    * Same 100 TB plan as matchCounts: one entity shuffle, linear scan,
    * O(#stages) state.
    */
  def quantifiedCounts(events: DataFrame, entity: String, ts: String,
      tieBreak: String, typeCol: String,
      stages: Seq[(String, Int, Int)],
      withinUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "empty stage list")
    require(withinUs.forall(_ >= 0L), "negative withinUs")
    require(stages.forall { case (_, mn, mx) => mn >= 0 && mx >= 1 && mx >= mn },
      "each stage needs 0 <= min <= max, max >= 1")
    require(stages.last._2 >= 1,
      "last stage needs min >= 1 (else the match has no final anchor)")
    require(stages.head._2 == 1,
      "first stage needs min == 1: the naive restart re-tries only the " +
        "single failing event, so a multi-rep anchor stage would miss " +
        "matches a backtracking matcher finds")
    require(stages.sliding(2).forall(w => w.length < 2 || w(0)._1 != w(1)._1),
      "adjacent stages must use distinct symbols")
    val spark = events.sparkSession
    import spark.implicits._
    val st = stages.toArray
    val within = withinUs.getOrElse(Long.MaxValue)
    events.select(col(entity).cast("long").as("entity"),
        graft.Det.epochUs(col(ts)).as("ts_us"),
        col(tieBreak).cast("long").as("tie"),
        col(typeCol).cast("string").as("sym"))
      .as[PatEv]
      .repartition(col("entity"))
      .sortWithinPartitions("entity", "ts_us", "tie")
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[PatCount]
        var cur = 0L
        var started = false
        var stage = 0
        var reps = 0
        var cnt = 0L
        var n = 0L
        var anchor = 0L
        it.foreach { e =>
          if (!started) { started = true; cur = e.entity }
          else if (e.entity != cur) {
            out += PatCount(cur, n, cnt)
            cur = e.entity; stage = 0; reps = 0; cnt = 0L; n = 0L
          }
          val (s2, r2, hit, anchored) = qstep(st, stage, reps, e.sym)
          stage = s2; reps = r2
          if (anchored) anchor = e.ts_us
          if (hit && e.ts_us - anchor <= within) cnt += 1
          n += 1
        }
        if (started) out += PatCount(cur, n, cnt)
        out.iterator
      }
      .toDF()
  }

  /** One quantified-machine step: returns (stage, reps, matchedNow,
    * anchoredNow) — anchoredNow = this event was consumed as the FIRST
    * event of a fresh attempt (stage-0 consumption out of the reset
    * state, directly or via the naive restart; with the head-stage
    * `min == 1` require an attempt's first consumption is always at
    * stage 0, so the flag is exactly "the WITHIN clock starts here").
    * Shared between the batch fold and any future streaming twin (the
    * sessionStep discipline).
    */
  private[ops] def qstep(st: Array[(String, Int, Int)], s0: Int, r0: Int,
      sym: String): (Int, Int, Boolean, Boolean) = {
    // attempt: consume sym at stage s (reps r so far), advancing through
    // min-satisfied / min-0 stages; Nothing = this attempt dies.
    @annotation.tailrec
    def attempt(s: Int, r: Int): (Int, Int, Boolean) = {
      val (sSym, sMin, sMax) = st(s)
      if (sym == sSym && r < sMax) {
        val r2 = r + 1
        if (s == st.length - 1 && r2 >= sMin) (0, 0, true) // lazy final
        else (s, r2, false)
      } else if (r >= sMin && s + 1 < st.length) attempt(s + 1, 0)
      else (-1, -1, false)
    }
    val fresh = s0 == 0 && r0 == 0
    val a = attempt(s0, r0)
    if (a._1 >= 0) (a._1, a._2, a._3, fresh)
    else if (fresh) (0, 0, false, false)
    else { // naive restart: the failing event may begin the next attempt
      val b = attempt(0, 0)
      if (b._1 >= 0) (b._1, b._2, b._3, true) else (0, 0, false, false)
    }
  }
}
