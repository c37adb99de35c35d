package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
          val r = boundedStep(pat, fail, contiguous, within, span,
            stage, n, cnt, anchor, ring, e.ts_us, e.sym)
          stage = r._1; n = r._2; cnt = r._3; anchor = r._4
        }
        if (started) out += PatCount(cur, n, cnt)
        out.iterator
      }
      .toDF()
  }

  /** The COMPLETE per-event transition both twins share (the sessionStep
    * discipline one level up from [[step]]): structural machine step +
    * WITHIN bookkeeping (anchor stamp / contiguous run-start ring) +
    * counting gate, so the batch fold and the streaming twin cannot
    * diverge even in the bookkeeping. Mutates `ring` in place (the
    * caller owns it — the batch fold reuses one array per task, the
    * streaming twin clones state-in and stores state-out); returns
    * (stage, n, cnt, anchor).
    *
    * Run-start bookkeeping — read by the counting gate only; the
    * structural step never sees it. A contiguous hit at per-entity
    * index n spans events [n−span, n], whose start ts sits at
    * ring(n % span) (written span events ago, same entity because a
    * hit needs ≥ span prior events).
    */
  private[graft] def boundedStep(pat: Array[String], fail: Array[Int],
      contiguous: Boolean, within: Long, span: Int,
      stage0: Int, n0: Long, cnt0: Long, anchor0: Long, ring: Array[Long],
      tsUs: Long, sym: String): (Int, Long, Long, Long) = {
    var anchor = anchor0
    val runStart =
      if (span == 0) tsUs
      else if (contiguous) ring((n0 % span).toInt)
      else {
        if (stage0 == 0 && sym == pat(0)) anchor = tsUs
        anchor
      }
    val (s2, hit) = step(pat, fail, contiguous, stage0, sym)
    val cnt = if (hit && tsUs - runStart <= within) cnt0 + 1L else cnt0
    if (span > 0) ring((n0 % span).toInt) = tsUs
    (s2, n0 + 1L, cnt, anchor)
  }

  /** Cross-batch streaming state: the machine's full O(1) residue —
    * stage, per-entity event index, running match count, WITHIN anchor,
    * the |pattern|−1 run-start ring, plus the in-order guard's residue
    * (maxTs/maxTie = the last folded event's (ts, tie); nLate = dropped
    * out-of-order rows so far).
    */
  case class PatState(stage: Int, n: Long, cnt: Long, anchor: Long,
      ring: Array[Long], maxTs: Long, maxTie: Long, nLate: Long)

  private val log =
    org.apache.logging.log4j.LogManager.getLogger(getClass)

  /** The in-order-across-batches runtime guard (ADVICE r13): the
    * unbuffered streaming twins require event-time order ACROSS
    * micro-batches; a late row folded at its arrival position would
    * silently corrupt counts and anchors from then on. The guard DROPS
    * rows at-or-before the last folded (ts, tie), counts them in state
    * (nLate) and logs — the watermark philosophy without the buffer; the
    * buffered [[BufferedPatternProcessor]] twins fold late rows
    * losslessly instead.
    */
  private def isLate(maxTs: Long, maxTie: Long, tsUs: Long,
      tie: Long): Boolean =
    tsUs < maxTs || (tsUs == maxTs && tie <= maxTie)

  private def isLate(maxTs: Long, maxTie: Long, e: PatEv): Boolean =
    isLate(maxTs, maxTie, e.ts_us, e.tie)

  private def warnLate(ent: Long, dropped: Long, total: Long): Unit =
    if (dropped > 0) log.warn(
      s"pattern stream: dropped $dropped out-of-order row(s) for entity " +
        s"$ent ($total dropped so far); use the buffered twin for " +
        "out-of-order feeds")

  /** S36 — STREAMING pattern matching: live funnel counting, the
    * continuous form of [[matchCounts]]. Per entity the machine's O(1)
    * residue (stage, n, cnt, anchor, run-start ring) persists across
    * micro-batches in GroupState; each batch folds its slice in
    * (ts, tie) order through the SAME [[boundedStep]] as the batch
    * fold and emits one running (entity, n_events, n_matches) snapshot
    * row in UPDATE mode (each emission supersedes the entity's previous
    * row — since r14 the declared output mode matches that semantics,
    * ADVICE r13; the final emission equals the batch fold exactly,
    * which is what StreamingSpec asserts, cross-batch ring and anchor
    * included).
    *
    * Same caveat as [[graft.streaming.Streams.asofStream]]: rows must
    * arrive in event-time order ACROSS micro-batches (within a batch
    * the sort handles it). Since r14 the caveat is GUARDED, not silent:
    * a row at-or-before the last folded (ts, tie) is dropped, counted
    * in state and logged (see [[isLate]]) rather than folded at its
    * arrival position. Feeds that need late rows folded losslessly use
    * the watermark-buffered [[bufferedQuantifiedCountsStream]] /
    * [[bufferedQuantifiedMatchesStream]] twins.
    *
    * At 100 TB (continuous form): state is ~|pattern| longs per ACTIVE
    * entity in RocksDB, the per-batch work is one shuffle of the batch
    * delta keyed by entity — the sessionStep scale shape.
    */
  def matchCountsStream(events: Dataset[PatEv], pattern: Seq[String],
      contiguous: Boolean, withinUs: Option[Long] = None)
      : Dataset[PatCount] = {
    require(pattern.nonEmpty, "empty pattern")
    require(withinUs.forall(_ >= 0L), "negative withinUs")
    import events.sparkSession.implicits._
    val pat = pattern.toArray
    val fl = failure(pattern)
    val within = withinUs.getOrElse(Long.MaxValue)
    val span = pat.length - 1
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[PatState, PatCount](OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (ent: Long, rows: Iterator[PatEv], state: GroupState[PatState]) =>
          val st0 = state.getOption.getOrElse(
            PatState(0, 0L, 0L, 0L, new Array[Long](math.max(span, 1)),
              Long.MinValue, Long.MinValue, 0L))
          var stage = st0.stage; var n = st0.n
          var cnt = st0.cnt; var anchor = st0.anchor
          var maxTs = st0.maxTs; var maxTie = st0.maxTie
          var late = 0L
          val ring = st0.ring.clone()
          // sorts ONE entity's slice of ONE micro-batch — bounded by
          // the trigger interval, not history (state carries the rest)
          rows.toSeq.sortBy(e => (e.ts_us, e.tie)).foreach { e =>
            if (isLate(maxTs, maxTie, e)) late += 1L
            else {
              val r = boundedStep(pat, fl, contiguous, within, span,
                stage, n, cnt, anchor, ring, e.ts_us, e.sym)
              stage = r._1; n = r._2; cnt = r._3; anchor = r._4
              maxTs = e.ts_us; maxTie = e.tie
            }
          }
          warnLate(ent, late, st0.nLate + late)
          state.update(PatState(stage, n, cnt, anchor, ring,
            maxTs, maxTie, st0.nLate + late))
          Iterator.single(PatCount(ent, n, cnt))
      }
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
      withinUs: Option[Long] = None): DataFrame =
    quantifiedCountsAlt(events, entity, ts, tieBreak, typeCol,
      stages.map { case (s, mn, mx) => (Set(s), mn, mx) }, withinUs)

  /** Q58 — ALTERNATION: each stage matches a SET of symbols
    * (`view (click|error)+ purchase`-style patterns). The machine is
    * [[quantifiedCounts]]'s with set membership in place of symbol
    * equality — every caveat there (greedy anchor, lazy final, naive
    * restart, the head-stage min == 1 require) carries over verbatim;
    * adjacent stages must use DISJOINT sets (the set generalization of
    * "distinct symbols" — an overlapping symbol would make the
    * stay-vs-advance choice ambiguous).
    */
  def quantifiedCountsAlt(events: DataFrame, entity: String, ts: String,
      tieBreak: String, typeCol: String,
      stages: Seq[(Set[String], Int, Int)],
      withinUs: Option[Long] = None): DataFrame = {
    validateStageSets(stages, withinUs)
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
          val r = qboundedStep(st, within, stage, reps, n, cnt, anchor,
            e.ts_us, e.sym)
          stage = r._1; reps = r._2; n = r._3; cnt = r._4; anchor = r._5
        }
        if (started) out += PatCount(cur, n, cnt)
        out.iterator
      }
      .toDF()
  }

  case class PatMatch(entity: Long, match_no: Long, anchor_us: Long,
    end_us: Long)

  /** Q59 — PER-MATCH EMISSION (MATCH_RECOGNIZE's ONE ROW PER MATCH):
    * the same quantified/alternation machine, but instead of one
    * count-snapshot per entity it emits one row PER COMPLETED MATCH —
    * (entity, match_no, anchor_us, end_us), the surface a user joins
    * back to events ("show me each converting funnel run with its
    * anchor and completion times"). anchor_us is the attempt's first
    * consumed event (the WITHIN clock start — see quantifiedCounts'
    * greedy-anchor caveat), end_us the completing event; match_no
    * numbers an entity's matches in stream order from 1. Under a
    * `withinUs` bound only bounded matches emit (the same gate that
    * counts).
    *
    * Same 100 TB plan: one entity shuffle, linear scan — output is one
    * row per MATCH (not per entity), still radically smaller than the
    * input and never buffered (each hit appends as the scan passes it).
    */
  def quantifiedMatchesAlt(events: DataFrame, entity: String, ts: String,
      tieBreak: String, typeCol: String,
      stages: Seq[(Set[String], Int, Int)],
      withinUs: Option[Long] = None): DataFrame = {
    validateStageSets(stages, withinUs)
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
        val out = scala.collection.mutable.ArrayBuffer.empty[PatMatch]
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
            cur = e.entity; stage = 0; reps = 0; cnt = 0L; n = 0L
            anchor = 0L
          }
          val r = qboundedStep(st, within, stage, reps, n, cnt, anchor,
            e.ts_us, e.sym)
          // the count advanced => THIS event completed a bounded match;
          // r's anchor is the completing attempt's (stamped before the
          // gate reads it, incl. the anchor==end single-stage case)
          if (r._4 > cnt) out += PatMatch(cur, r._4, r._5, e.ts_us)
          stage = r._1; reps = r._2; n = r._3; cnt = r._4; anchor = r._5
        }
        out.iterator
      }
      .toDF()
  }

  /** S39 — LIVE per-match emission: the q59 surface as a continuous
    * query (streaming MATCH_RECOGNIZE). Each micro-batch folds its
    * slice in (ts, tie) order through the same [[qboundedStep]]; every
    * match COMPLETED in the batch emits one [[PatMatch]] row — Append-
    * mode clean, because a completed match is FINAL (the one-pass
    * machine never retracts or extends it), so the stream of emitted
    * rows equals the batch fold's row set exactly. match_no continues
    * across batches from the GroupState count. Same guarded in-order-
    * across-batches caveat as S36 (late rows dropped + counted +
    * logged; the buffered twin folds them losslessly).
    */
  def quantifiedMatchesStream(events: Dataset[PatEv],
      stages: Seq[(Set[String], Int, Int)], withinUs: Option[Long] = None)
      : Dataset[PatMatch] = {
    validateStageSets(stages, withinUs)
    import events.sparkSession.implicits._
    val st = stages.toArray
    val within = withinUs.getOrElse(Long.MaxValue)
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[QPatState, PatMatch](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (ent: Long, rows: Iterator[PatEv], state: GroupState[QPatState]) =>
          val st0 = state.getOption.getOrElse(qPatState0)
          var stage = st0.stage; var reps = st0.reps; var n = st0.n
          var cnt = st0.cnt; var anchor = st0.anchor
          var maxTs = st0.maxTs; var maxTie = st0.maxTie
          var late = 0L
          val out = scala.collection.mutable.ArrayBuffer.empty[PatMatch]
          rows.toSeq.sortBy(e => (e.ts_us, e.tie)).foreach { e =>
            if (isLate(maxTs, maxTie, e)) late += 1L
            else {
              val r = qboundedStep(st, within, stage, reps, n, cnt, anchor,
                e.ts_us, e.sym)
              if (r._4 > cnt) out += PatMatch(ent, r._4, r._5, e.ts_us)
              stage = r._1; reps = r._2; n = r._3; cnt = r._4; anchor = r._5
              maxTs = e.ts_us; maxTie = e.tie
            }
          }
          warnLate(ent, late, st0.nLate + late)
          state.update(QPatState(stage, reps, n, cnt, anchor,
            maxTs, maxTie, st0.nLate + late))
          out.iterator
      }
  }

  /** Parse the compact TVF pattern spec: whitespace-separated stages,
    * each `sym`, `(a|b)`, or either with a trailing `+` (one-or-more
    * reps) — `view (click|error)+ purchase`. Quantifier richness beyond
    * `+` stays on the Scala API (explicit (min,max) tuples); the SQL
    * door covers the funnel shapes users actually type.
    */
  private[graft] def parsePattern(p: String): Seq[(Set[String], Int, Int)] =
    p.trim.split("\\s+").toSeq.map { tok =>
      require(tok.nonEmpty, "empty pattern stage")
      val (body, mn, mx) =
        if (tok.endsWith("+")) (tok.dropRight(1), 1, Int.MaxValue)
        else (tok, 1, 1)
      // parens must be balanced — '(a|b' / 'a|b)' are malformed, and a
      // bare '|' needs the parens (ADVICE r13: stripPrefix/stripSuffix
      // silently accepted both)
      val wrapped = body.startsWith("(") && body.endsWith(")")
      require(wrapped || (!body.startsWith("(") && !body.endsWith(")")),
        s"unbalanced parentheses in pattern stage '$tok'")
      val inner = if (wrapped) body.drop(1).dropRight(1) else body
      require(wrapped || !inner.contains("|"),
        s"alternation needs parentheses in pattern stage '$tok'")
      val syms = inner.split("\\|", -1).map(_.trim).toSet
      require(syms.nonEmpty && syms.forall(s =>
          s.nonEmpty && s.forall(c => c != '(' && c != ')' && c != '|')),
        s"bad pattern stage '$tok'")
      (syms, mn, mx)
    }

  /** The quantified-machine preconditions, shared by all twins (the
    * string-form entry points delegate through the Set-based Alt
    * variants, so this is the single gate).
    */
  private def validateStageSets(stages: Seq[(Set[String], Int, Int)],
      withinUs: Option[Long]): Unit = {
    require(stages.nonEmpty, "empty stage list")
    require(stages.forall(_._1.nonEmpty), "empty stage symbol set")
    require(withinUs.forall(_ >= 0L), "negative withinUs")
    require(stages.forall { case (_, mn, mx) => mn >= 0 && mx >= 1 && mx >= mn },
      "each stage needs 0 <= min <= max, max >= 1")
    require(stages.last._2 >= 1,
      "last stage needs min >= 1 (else the match has no final anchor)")
    require(stages.head._2 == 1,
      "first stage needs min == 1: the naive restart re-tries only the " +
        "single failing event, so a multi-rep anchor stage would miss " +
        "matches a backtracking matcher finds")
    require(stages.sliding(2).forall(w =>
        w.length < 2 || w(0)._1.intersect(w(1)._1).isEmpty),
      "adjacent stages must use disjoint symbol sets")
  }

  /** The complete quantified per-event transition both twins share
    * (structural [[qstep]] + anchor stamp + WITHIN counting gate);
    * returns (stage, reps, n, cnt, anchor).
    */
  private[graft] def qboundedStep(st: Array[(Set[String], Int, Int)],
      within: Long, stage0: Int, reps0: Int, n0: Long, cnt0: Long,
      anchor0: Long, tsUs: Long, sym: String)
      : (Int, Int, Long, Long, Long) = {
    val (s2, r2, hit, anchored) = qstep(st, stage0, reps0, sym)
    val anchor = if (anchored) tsUs else anchor0
    val cnt = if (hit && tsUs - anchor <= within) cnt0 + 1L else cnt0
    (s2, r2, n0 + 1L, cnt, anchor)
  }

  /** Cross-batch streaming state for the quantified machine (plus the
    * [[isLate]] guard residue).
    */
  case class QPatState(stage: Int, reps: Int, n: Long, cnt: Long,
      anchor: Long, maxTs: Long, maxTie: Long, nLate: Long)

  private val qPatState0 =
    QPatState(0, 0, 0L, 0L, 0L, Long.MinValue, Long.MinValue, 0L)

  /** S36's quantified sibling — [[quantifiedCounts]] as a continuous
    * query: the same GroupState discipline as [[matchCountsStream]]
    * (per-batch (ts, tie) sort, fold through the shared
    * [[qboundedStep]], one running snapshot row per entity per batch).
    * Same guarded in-order-across-batches caveat; state is five scalars per
    * active entity.
    */
  def quantifiedCountsStream(events: Dataset[PatEv],
      stages: Seq[(String, Int, Int)], withinUs: Option[Long] = None)
      : Dataset[PatCount] =
    quantifiedCountsStreamAlt(events,
      stages.map { case (s, mn, mx) => (Set(s), mn, mx) }, withinUs)

  /** The alternation form of the streaming twin (see
    * [[quantifiedCountsAlt]]); same GroupState residue.
    */
  def quantifiedCountsStreamAlt(events: Dataset[PatEv],
      stages: Seq[(Set[String], Int, Int)], withinUs: Option[Long] = None)
      : Dataset[PatCount] = {
    validateStageSets(stages, withinUs)
    import events.sparkSession.implicits._
    val st = stages.toArray
    val within = withinUs.getOrElse(Long.MaxValue)
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[QPatState, PatCount](OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (ent: Long, rows: Iterator[PatEv], state: GroupState[QPatState]) =>
          val st0 = state.getOption.getOrElse(qPatState0)
          var stage = st0.stage; var reps = st0.reps; var n = st0.n
          var cnt = st0.cnt; var anchor = st0.anchor
          var maxTs = st0.maxTs; var maxTie = st0.maxTie
          var late = 0L
          rows.toSeq.sortBy(e => (e.ts_us, e.tie)).foreach { e =>
            if (isLate(maxTs, maxTie, e)) late += 1L
            else {
              val r = qboundedStep(st, within, stage, reps, n, cnt, anchor,
                e.ts_us, e.sym)
              stage = r._1; reps = r._2; n = r._3; cnt = r._4; anchor = r._5
              maxTs = e.ts_us; maxTie = e.tie
            }
          }
          warnLate(ent, late, st0.nLate + late)
          state.update(QPatState(stage, reps, n, cnt, anchor,
            maxTs, maxTie, st0.nLate + late))
          Iterator.single(PatCount(ent, n, cnt))
      }
  }

  /** Q57f — RE-ANCHORING WITHIN (MATCH_RECOGNIZE parity for the
    * subsequence funnel): where [[matchCounts]]' greedy-anchor WITHIN
    * can undercount (its one attempt stays welded to a stale anchor —
    * view@t0, view@t5m, click@t5m30s, within=1min counts 0 there), this
    * machine counts a match iff SOME anchor yields a bounded completion,
    * with SKIP PAST LAST ROW non-overlap: after a counted match nothing
    * at-or-before its completing event is reused.
    *
    * The trick that keeps state O(|pattern|) instead of O(#anchors):
    * run ALL anchored attempts in parallel, but keep only the LATEST
    * live anchor per stage. Sound because (a) same-stage attempts
    * advance identically forever after, so they complete at the same
    * event; (b) the bound gate passes the latest anchor whenever it
    * passes any (latest ⇒ smallest elapsed); (c) liveness pruning
    * (ts − anchor > within ⇒ the attempt can never complete in bound)
    * kills exactly the attempts a re-anchoring matcher abandons. The
    * COUNT therefore equals the operational semantics "find the
    * smallest anchor ≥ pos whose greedy completion is in bound; count;
    * resume after its completing event" — PatternsSpec asserts the
    * equivalence against that brute-force replay on random streams.
    * (Which anchor produced a match is NOT tracked — the earliest
    * qualifying anchor may differ from the surviving latest one — so
    * this is a counts surface; per-match anchors stay on q59's greedy
    * machine.)
    *
    * Per-event transition (anchors(s) = latest live anchor of an
    * attempt that has matched pat(0..s-1), NONE = MinValue):
    *  1. prune every anchor with ts − anchor > within;
    *  2. if anchors(len−1) is live and sym = pat(len−1): count++,
    *     clear all anchors (skip past last row);
    *  3. else, for s = len−2 down to 1: sym = pat(s) advances the
    *     stage-s attempt — anchors(s+1) = max(anchors(s+1), anchors(s)),
    *     anchors(s) = NONE (descending order: one event never advances
    *     the same attempt twice);
    *  4. and sym = pat(0) opens a fresh attempt: anchors(1) = ts.
    *
    * Same plan as every per-entity fold here: one entity-keyed shuffle,
    * linear scan, O(|pattern|) longs of state.
    */
  def reanchoredCounts(events: DataFrame, entity: String, ts: String,
      tieBreak: String, typeCol: String, pattern: Seq[String],
      withinUs: Long): DataFrame = {
    require(pattern.nonEmpty, "empty pattern")
    require(withinUs >= 0L, "negative withinUs")
    val spark = events.sparkSession
    import spark.implicits._
    val pat = pattern.toArray
    events.select(col(entity).cast("long").as("entity"),
        graft.Det.epochUs(col(ts)).as("ts_us"),
        col(tieBreak).cast("long").as("tie"),
        col(typeCol).cast("string").as("sym"))
      .as[PatEv]
      .repartition(col("entity"))
      .sortWithinPartitions("entity", "ts_us", "tie")
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[PatCount]
        val len = pat.length
        val anchors = Array.fill(len)(ANCHOR_NONE) // slot 0 unused
        var cur = 0L
        var started = false
        var cnt = 0L
        var n = 0L
        it.foreach { e =>
          if (!started) { started = true; cur = e.entity }
          else if (e.entity != cur) {
            out += PatCount(cur, n, cnt)
            cur = e.entity; cnt = 0L; n = 0L
            java.util.Arrays.fill(anchors, ANCHOR_NONE)
          }
          cnt = reanchorStep(pat, withinUs, anchors, cnt, e.ts_us, e.sym)
          n += 1L
        }
        if (started) out += PatCount(cur, n, cnt)
        out.iterator
      }
      .toDF()
  }

  private[graft] val ANCHOR_NONE = Long.MinValue

  /** The re-anchoring machine's per-event transition, shared by the
    * batch fold and the streaming twin (the sessionStep discipline).
    * Mutates `anchors` in place (slot s = latest live anchor at stage
    * s, [[ANCHOR_NONE]] = none, slot 0 unused); returns the new count.
    */
  private[graft] def reanchorStep(pat: Array[String], within: Long,
      anchors: Array[Long], cnt0: Long, tsUs: Long, sym: String): Long = {
    val len = pat.length
    var s = 1
    while (s < len) {
      if (anchors(s) != ANCHOR_NONE && tsUs - anchors(s) > within)
        anchors(s) = ANCHOR_NONE
      s += 1
    }
    if (len == 1) { if (sym == pat(0)) cnt0 + 1L else cnt0 }
    else if (anchors(len - 1) != ANCHOR_NONE && sym == pat(len - 1)) {
      java.util.Arrays.fill(anchors, ANCHOR_NONE)
      cnt0 + 1L
    } else {
      s = len - 2
      while (s >= 1) {
        if (sym == pat(s) && anchors(s) != ANCHOR_NONE) {
          if (anchors(s) > anchors(s + 1)) anchors(s + 1) = anchors(s)
          anchors(s) = ANCHOR_NONE
        }
        s -= 1
      }
      if (sym == pat(0)) anchors(1) = tsUs
      cnt0
    }
  }

  /** Cross-batch state for the re-anchoring streaming twin: the live
    * anchor array + counters + the [[isLate]] guard residue.
    */
  case class RePatState(anchors: Array[Long], n: Long, cnt: Long,
      maxTs: Long, maxTie: Long, nLate: Long)

  /** S36f — q57f's re-anchoring WITHIN machine LIVE: the same
    * O(|pattern|) anchor array persists in GroupState across
    * micro-batches; each batch folds its slice in (ts, tie) order
    * through the shared [[reanchorStep]] and emits one running
    * (entity, n_events, n_matches) snapshot in Update mode. Same
    * guarded in-order-across-batches caveat as S36.
    */
  def reanchoredCountsStream(events: Dataset[PatEv], pattern: Seq[String],
      withinUs: Long): Dataset[PatCount] = {
    require(pattern.nonEmpty, "empty pattern")
    require(withinUs >= 0L, "negative withinUs")
    import events.sparkSession.implicits._
    val pat = pattern.toArray
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[RePatState, PatCount](OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (ent: Long, rows: Iterator[PatEv], state: GroupState[RePatState]) =>
          val st0 = state.getOption.getOrElse(RePatState(
            Array.fill(pat.length)(ANCHOR_NONE), 0L, 0L,
            Long.MinValue, Long.MinValue, 0L))
          val anchors = st0.anchors.clone()
          var n = st0.n; var cnt = st0.cnt
          var maxTs = st0.maxTs; var maxTie = st0.maxTie
          var late = 0L
          rows.toSeq.sortBy(e => (e.ts_us, e.tie)).foreach { e =>
            if (isLate(maxTs, maxTie, e)) late += 1L
            else {
              cnt = reanchorStep(pat, withinUs, anchors, cnt, e.ts_us, e.sym)
              n += 1L
              maxTs = e.ts_us; maxTie = e.tie
            }
          }
          warnLate(ent, late, st0.nLate + late)
          state.update(RePatState(anchors, n, cnt, maxTs, maxTie,
            st0.nLate + late))
          Iterator.single(PatCount(ent, n, cnt))
      }
  }

  /** Event row for the BUFFERED streaming twins: a real timestamp column
    * (the watermark anchor — callers `.withWatermark("ts", delay)`
    * before grouping) in place of the pre-computed epoch micros.
    */
  case class PatEvT(entity: Long, ts: java.time.Instant, tie: Long,
      sym: String)

  private def tsUs(t: java.time.Instant): Long =
    t.getEpochSecond * 1000000L + t.getNano / 1000L

  /** One watermark-triggered fold shared by both buffered processors:
    * split the buffer at the watermark, fold the ripe slice in
    * (ts, tie) order through [[qboundedStep]] from the carried machine
    * residue, return (new residue, surviving buffer, matches completed
    * this fold). The guard drop can only fire if a row below the last
    * fold boundary somehow reached the buffer (Spark's watermark
    * eviction makes that unreachable; counted defensively).
    */
  private def foldRipe(st: Array[(Set[String], Int, Int)], within: Long,
      st0: QPatState, buffered: Array[PatEv], wmUs: Long)
      : (QPatState, Array[PatEv], Vector[PatMatch]) = {
    val (ripe, pending) = buffered.partition(_.ts_us < wmUs)
    var stage = st0.stage; var reps = st0.reps; var n = st0.n
    var cnt = st0.cnt; var anchor = st0.anchor
    var maxTs = st0.maxTs; var maxTie = st0.maxTie
    var late = 0L
    val out = Vector.newBuilder[PatMatch]
    ripe.sortBy(e => (e.ts_us, e.tie)).foreach { e =>
      if (isLate(maxTs, maxTie, e)) late += 1L
      else {
        val r = qboundedStep(st, within, stage, reps, n, cnt, anchor,
          e.ts_us, e.sym)
        if (r._4 > cnt) out += PatMatch(e.entity, r._4, r._5, e.ts_us)
        stage = r._1; reps = r._2; n = r._3; cnt = r._4; anchor = r._5
        maxTs = e.ts_us; maxTie = e.tie
      }
    }
    (QPatState(stage, reps, n, cnt, anchor, maxTs, maxTie,
      st0.nLate + late), pending, out.result())
  }

  /** S36c/S39b — OUT-OF-ORDER-TOLERANT streaming pattern matching: the
    * S34 watermark-buffer discipline ([[graft.streaming.Streams
    * .BufferedAsofProcessor]]) composed with the quantified machine. A
    * late event landing batches after its successors still folds at its
    * EVENT-TIME position: rows buffer in ListState until the watermark
    * passes them; an event-time timer (earliest buffered row + 1 ms,
    * re-armed each visit — exactly one live timer per key) fires the
    * fold, which advances the machine residue over the now-immutable
    * below-watermark slice in (ts, tie) order. Stream == the batch fold
    * on the undropped rows REGARDLESS of arrival order — StreamingSpec
    * asserts it on a bit-reversal-shuffled fixture (the S34 gate,
    * applied to patterns).
    *
    * At 100 TB: state per active entity = the O(#stages) machine
    * residue + the in-flight window of events still above the
    * watermark (bounded by the watermark delay × the entity's rate,
    * the same bound every stream-stream join buffer carries), all in
    * RocksDB; the per-batch work is one shuffle of the batch delta.
    */
  class BufferedPatternProcessor(stages: Seq[(Set[String], Int, Int)],
      withinUs: Option[Long], emitMatches: Boolean)
      extends StatefulProcessor[Long, PatEvT, PatWire] {
    private val st = stages.toArray
    private val within = withinUs.getOrElse(Long.MaxValue)
    @transient private var buf: ListState[PatEv] = _
    @transient private var mach: ValueState[QPatState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[PatEv]("buf",
        Encoders.product[PatEv], TTLConfig.NONE)
      mach = getHandle.getValueState[QPatState]("mach",
        Encoders.product[QPatState], TTLConfig.NONE)
    }

    // Exactly one live timer per key: earliest buffered row, rounded UP
    // to the ms timer grain, + 1 (the BufferedAsofProcessor rule — the
    // watermark must be strictly past the row's microsecond ts).
    private def rearm(): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      val it = buf.get()
      if (it.hasNext) {
        val earliest = it.map(_.ts_us).min
        getHandle.registerTimer((earliest + 999L) / 1000L + 1L)
      }
    }

    override def handleInputRows(key: Long, rows: Iterator[PatEvT],
        timerValues: TimerValues): Iterator[PatWire] = {
      rows.foreach(e => buf.appendValue(PatEv(key, tsUs(e.ts), e.tie, e.sym)))
      rearm()
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[PatWire] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      val st0 = if (mach.exists()) mach.get() else qPatState0
      val (st1, pending, hits) = foldRipe(st, within, st0,
        buf.get().toArray, wmUs)
      mach.update(st1)
      buf.clear(); pending.foreach(buf.appendValue)
      rearm()
      if (emitMatches)
        hits.iterator.map(h =>
          PatWire(h.entity, h.match_no, h.anchor_us, h.end_us))
      else if (st1.n > st0.n) // snapshot only when the fold advanced
        Iterator.single(PatWire(key, st1.n, st1.cnt, -1L))
      else Iterator.empty
    }
  }

  /** The buffered processors' wire row — [[PatMatch]]'s shape
    * (a=match_no, b=anchor_us, c=end_us), doubling as a
    * (entity, a=n_events, b=n_matches, c=-1) snapshot for the counts
    * twin (one output encoder per processor class keeps the state-store
    * schema stable across both twins; the public entry points remap to
    * the typed rows immediately).
    */
  case class PatWire(entity: Long, a: Long, b: Long, c: Long)

  /** S39b entry — q59's per-match surface, out-of-order tolerant: every
    * completed match emits once with its event-time anchor/end, no
    * matter how arrival order scrambled the events (Append-clean: a
    * below-watermark match is final). Callers watermark `ts` first.
    */
  def bufferedQuantifiedMatchesStream(events: Dataset[PatEvT],
      stages: Seq[(Set[String], Int, Int)], withinUs: Option[Long] = None)
      : Dataset[PatMatch] = {
    validateStageSets(stages, withinUs)
    import events.sparkSession.implicits._
    events.groupByKey(_.entity)
      .transformWithState(
        new BufferedPatternProcessor(stages, withinUs, emitMatches = true),
        TimeMode.EventTime(), OutputMode.Append())
      .map(r => PatMatch(r.entity, r.a, r.b, r.c))
  }

  /** S36c entry — the counts surface of [[bufferedQuantifiedMatchesStream]]:
    * one (entity, n_events, n_matches) snapshot per fold that advanced
    * the machine (Update semantics — each supersedes the last).
    */
  def bufferedQuantifiedCountsStream(events: Dataset[PatEvT],
      stages: Seq[(Set[String], Int, Int)], withinUs: Option[Long] = None)
      : Dataset[PatCount] = {
    validateStageSets(stages, withinUs)
    import events.sparkSession.implicits._
    events.groupByKey(_.entity)
      .transformWithState(
        new BufferedPatternProcessor(stages, withinUs, emitMatches = false),
        TimeMode.EventTime(), OutputMode.Update())
      .map(r => PatCount(r.entity, r.a, r.b))
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
  private[ops] def qstep(st: Array[(Set[String], Int, Int)], s0: Int,
      r0: Int, sym: String): (Int, Int, Boolean, Boolean) = {
    val f = qstepFull(st, s0, r0, sym)
    (f._1, f._2, f._3, f._4)
  }

  /** [[qstep]] plus the CONSUMING stage (-1 = the event was not consumed
    * and the machine reset/stayed fresh) — the extra observability the
    * MEASURES surface needs to know which stage an event fed. One
    * machine: qstep delegates here, so the twins cannot diverge.
    */
  private[ops] def qstepFull(st: Array[(Set[String], Int, Int)], s0: Int,
      r0: Int, sym: String): (Int, Int, Boolean, Boolean, Int) = {
    // attempt: consume sym at stage s (reps r so far), advancing through
    // min-satisfied / min-0 stages; consume-stage -1 = this attempt dies.
    @annotation.tailrec
    def attempt(s: Int, r: Int): (Int, Int, Boolean, Int) = {
      val (sSym, sMin, sMax) = st(s)
      if (sSym(sym) && r < sMax) {
        val r2 = r + 1
        if (s == st.length - 1 && r2 >= sMin) (0, 0, true, s) // lazy final
        else (s, r2, false, s)
      } else if (r >= sMin && s + 1 < st.length) attempt(s + 1, 0)
      else (-1, -1, false, -1)
    }
    val fresh = s0 == 0 && r0 == 0
    val a = attempt(s0, r0)
    if (a._4 >= 0) (a._1, a._2, a._3, fresh, a._4)
    else if (fresh) (0, 0, false, false, -1)
    else { // naive restart: the failing event may begin the next attempt
      val b = attempt(0, 0)
      if (b._4 >= 0) (b._1, b._2, b._3, true, b._4)
      else (0, 0, false, false, -1)
    }
  }

  /** Event row for the MEASURES surfaces: [[PatEv]] + the per-event
    * measure payload (cents — the established exact-integer money
    * convention).
    */
  case class PatEvM(entity: Long, ts_us: Long, tie: Long, sym: String,
      cents: Long)

  /** Q59c's row: [[PatMatch]] + the per-match MEASURES — events consumed
    * by the matching run, their cents sum, and each stage's FIRST
    * consumed event's epoch-µs ([[ANCHOR_NONE]] for min-0 stages the run
    * skipped). MATCH_RECOGNIZE's MEASURES clause on the one-pass
    * machine: all state is O(#stages), accumulated as the scan passes —
    * never a buffer of the match's events.
    */
  case class PatMatchM(entity: Long, match_no: Long, anchor_us: Long,
      end_us: Long, m_events: Long, m_cents: Long, stage_first_us: Seq[Long])

  /** Post-step result of [[qmeasuredStep]]: the machine residue (stage,
    * reps, n, cnt, anchor — IDENTICAL evolution to [[qboundedStep]], so
    * counts can never diverge from q57/q58/q59), the accumulator residue
    * (mEv, mCents — stageTs mutates in the caller-owned array), and the
    * completed bounded match's measures when this event finished one.
    */
  private[graft] final case class QMeasured(stage: Int, reps: Int, n: Long,
      cnt: Long, anchor: Long, mEv: Long, mCents: Long,
      emit: Option[(Long, Long, Vector[Long])])

  /** The MEASURES transition both twins share ([[qboundedStep]] + the
    * bounded per-match accumulators). `stageTs` is caller-owned and
    * mutated in place, `#stages` slots: slot s = first consumed event's
    * ts at stage s in the CURRENT attempt ([[ANCHOR_NONE]] = none yet).
    * An event that begins a fresh attempt (the anchored flag, incl. the
    * naive restart) RESEEDS the accumulators with itself; an event the
    * machine could not consume clears them (the attempt died); a
    * completed match emits its measures INCLUDING the completing event,
    * then clears. The emission fires only for BOUNDED matches — the
    * same gate that counts, so emitted rows == q59's row set with
    * measures appended.
    */
  private[graft] def qmeasuredStep(st: Array[(Set[String], Int, Int)],
      within: Long, stage0: Int, reps0: Int, n0: Long, cnt0: Long,
      anchor0: Long, mEv0: Long, mCents0: Long, stageTs: Array[Long],
      tsUs: Long, sym: String, cents: Long): QMeasured = {
    val (s2, r2, hit, anchored, cStage) = qstepFull(st, stage0, reps0, sym)
    var anchor = anchor0; var mEv = mEv0; var mCents = mCents0
    if (cStage >= 0) {
      if (anchored) {
        anchor = tsUs
        mEv = 0L; mCents = 0L
        java.util.Arrays.fill(stageTs, ANCHOR_NONE)
      }
      mEv += 1L; mCents += cents
      if (stageTs(cStage) == ANCHOR_NONE) stageTs(cStage) = tsUs
    } else if (!hit) {
      // not consumed → the machine reset (or stayed fresh): no attempt
      // is in flight, so no accumulators either
      mEv = 0L; mCents = 0L
      java.util.Arrays.fill(stageTs, ANCHOR_NONE)
    }
    val counted = hit && tsUs - anchor <= within
    val emit = if (counted) Some((mEv, mCents, stageTs.toVector)) else None
    if (hit) { // completion (counted or out-of-bound) resets the attempt
      mEv = 0L; mCents = 0L
      java.util.Arrays.fill(stageTs, ANCHOR_NONE)
    }
    QMeasured(s2, r2, n0 + 1L, if (counted) cnt0 + 1L else cnt0, anchor,
      mEv, mCents, emit)
  }

  /** Q59c — PER-MATCH MEASURES (MATCH_RECOGNIZE's MEASURES clause on
    * the q59 surface): one row per completed bounded match carrying its
    * aggregates — events consumed, cents sum, per-stage first-event
    * timestamps — accumulated in O(#stages) state as the scan passes
    * (the machine, counts, anchors, and WITHIN gate are bit-identical
    * to q59's: [[qmeasuredStep]] wraps the same [[qstepFull]]).
    * `valueCol` is a double money column; measures use the exact
    * round(×100) cents convention. Same 100 TB plan as every per-entity
    * fold here: one entity-keyed shuffle, linear scan.
    */
  def quantifiedMatchMeasuresAlt(events: DataFrame, entity: String,
      ts: String, tieBreak: String, typeCol: String, valueCol: String,
      stages: Seq[(Set[String], Int, Int)],
      withinUs: Option[Long] = None): DataFrame = {
    validateStageSets(stages, withinUs)
    val spark = events.sparkSession
    import spark.implicits._
    val st = stages.toArray
    val within = withinUs.getOrElse(Long.MaxValue)
    val nStages = st.length
    events.select(col(entity).cast("long").as("entity"),
        graft.Det.epochUs(col(ts)).as("ts_us"),
        col(tieBreak).cast("long").as("tie"),
        col(typeCol).cast("string").as("sym"),
        round(col(valueCol) * 100).cast("long").as("cents"))
      .as[PatEvM]
      .repartition(col("entity"))
      .sortWithinPartitions("entity", "ts_us", "tie")
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[PatMatchM]
        var cur = 0L
        var started = false
        var stage = 0; var reps = 0
        var cnt = 0L; var n = 0L; var anchor = 0L
        var mEv = 0L; var mCents = 0L
        val stageTs = Array.fill(nStages)(ANCHOR_NONE)
        it.foreach { e =>
          if (!started) { started = true; cur = e.entity }
          else if (e.entity != cur) {
            cur = e.entity; stage = 0; reps = 0; cnt = 0L; n = 0L
            anchor = 0L; mEv = 0L; mCents = 0L
            java.util.Arrays.fill(stageTs, ANCHOR_NONE)
          }
          val r = qmeasuredStep(st, within, stage, reps, n, cnt, anchor,
            mEv, mCents, stageTs, e.ts_us, e.sym, e.cents)
          r.emit.foreach { case (ev, cts, sts) =>
            out += PatMatchM(cur, r.cnt, r.anchor, e.ts_us, ev, cts, sts)
          }
          stage = r.stage; reps = r.reps; n = r.n; cnt = r.cnt
          anchor = r.anchor; mEv = r.mEv; mCents = r.mCents
        }
        out.iterator
      }
      .toDF()
  }

  /** Cross-batch streaming state for the MEASURES twin: the counting
    * residue + the accumulator residue + the [[isLate]] guard residue.
    */
  case class QPatStateM(stage: Int, reps: Int, n: Long, cnt: Long,
      anchor: Long, mEv: Long, mCents: Long, stageTs: Array[Long],
      maxTs: Long, maxTie: Long, nLate: Long)

  /** S39c — LIVE per-match MEASURES: q59c as a continuous query. The
    * accumulator residue (mEv/mCents/stageTs) persists in GroupState, so
    * a match whose stages SPAN micro-batches still emits with its full
    * measures — Append-clean like S39 (a completed match is final).
    * Same guarded in-order-across-batches caveat as S36/S39.
    */
  def quantifiedMatchMeasuresStream(events: Dataset[PatEvM],
      stages: Seq[(Set[String], Int, Int)], withinUs: Option[Long] = None)
      : Dataset[PatMatchM] = {
    validateStageSets(stages, withinUs)
    import events.sparkSession.implicits._
    val st = stages.toArray
    val within = withinUs.getOrElse(Long.MaxValue)
    val nStages = st.length
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[QPatStateM, PatMatchM](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (ent: Long, rows: Iterator[PatEvM], state: GroupState[QPatStateM]) =>
          val st0 = state.getOption.getOrElse(QPatStateM(0, 0, 0L, 0L, 0L,
            0L, 0L, Array.fill(nStages)(ANCHOR_NONE),
            Long.MinValue, Long.MinValue, 0L))
          var stage = st0.stage; var reps = st0.reps; var n = st0.n
          var cnt = st0.cnt; var anchor = st0.anchor
          var mEv = st0.mEv; var mCents = st0.mCents
          val stageTs = st0.stageTs.clone()
          var maxTs = st0.maxTs; var maxTie = st0.maxTie
          var late = 0L
          val out = scala.collection.mutable.ArrayBuffer.empty[PatMatchM]
          rows.toSeq.sortBy(e => (e.ts_us, e.tie)).foreach { e =>
            if (isLate(maxTs, maxTie, e.ts_us, e.tie)) late += 1L
            else {
              val r = qmeasuredStep(st, within, stage, reps, n, cnt,
                anchor, mEv, mCents, stageTs, e.ts_us, e.sym, e.cents)
              r.emit.foreach { case (ev, cts, sts) =>
                out += PatMatchM(ent, r.cnt, r.anchor, e.ts_us, ev, cts, sts)
              }
              stage = r.stage; reps = r.reps; n = r.n; cnt = r.cnt
              anchor = r.anchor; mEv = r.mEv; mCents = r.mCents
              maxTs = e.ts_us; maxTie = e.tie
            }
          }
          warnLate(ent, late, st0.nLate + late)
          state.update(QPatStateM(stage, reps, n, cnt, anchor, mEv, mCents,
            stageTs, maxTs, maxTie, st0.nLate + late))
          out.iterator
      }
  }
}
