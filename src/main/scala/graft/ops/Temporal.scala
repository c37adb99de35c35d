package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-property operators over change-point tables (SURVEY.md §1.2,
  * §2.3). A temporal property is a piecewise-constant function of time,
  * stored as change points `(entity, ts, value)`; these operators derive
  * the reference's read surface — time-point (snapshot), time-range
  * (interval view) — plus sessionization, as single-shuffle window plans.
  *
  * Entity keys are MULTI-COLUMN first-class (the reference's store is
  * `(entity_id, key, ts, value)` — SURVEY §1.2 — so a per-property read
  * partitions by (entity_id, prop_key), not by a hand-concatenated
  * composite): every read takes `entity: Seq[String]`, with
  * single-String overloads for the common one-key case.
  */
object Temporal {

  /** Time-point read for every entity: the latest change point at-or-before
    * `t`. One shuffle on the entity key(s); the `ts <= t` filter is pushed
    * to the scan before the shuffle, so at 100 TB only the history up to
    * `t` moves. Tie at equal ts broken by greatest `tieBreak`.
    */
  def snapshot(
      changes: DataFrame,
      entity: Seq[String],
      ts: String,
      t: Column,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*)
      .orderBy(col(ts).desc, col(tieBreak).desc)
    changes.filter(col(ts) <= t)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  def snapshot(changes: DataFrame, entity: String, ts: String, t: Column,
      tieBreak: String): DataFrame =
    snapshot(changes, Seq(entity), ts, t, tieBreak)

  /** T18 — snapshot DIFF: the entity-level delta between the state at
    * `t1` and at `t2` (t1 < t2) — `insert` (entity first appears in
    * (t1, t2]) or `update` (its value columns changed); unchanged
    * entities are omitted. This is the delta feed an incremental
    * downstream applies instead of re-reading the full snapshot — the
    * classic temporal-store "what changed since" read. Presence is
    * tracked by a marker column, NOT by value nullness (a legitimately
    * NULL value at t1 is not an insert), and value comparison is
    * null-safe. Plan: two window snapshots (one shuffle each on the
    * entity key) + one entity-keyed join — at 100 TB both snapshots
    * prune to `ts <= t2` at the scan and co-locate under entity
    * bucketing.
    */
  def snapshotDiff(changes: DataFrame, entity: Seq[String], ts: String,
      t1: Column, t2: Column, tieBreak: String,
      valueCols: Seq[String]): DataFrame = {
    val olds = valueCols.map(c => col(c).as(s"old_$c"))
    val s1 = snapshot(changes, entity, ts, t1, tieBreak)
      .select(entity.map(col) ++ olds :+ lit(1).as("__was"): _*)
    val s2 = snapshot(changes, entity, ts, t2, tieBreak)
    s2.join(s1, entity, "left_outer")
      .withColumn("change_kind",
        when(col("__was").isNull, lit("insert"))
          .when(valueCols.map(c => !(col(c) <=> col(s"old_$c")))
            .reduce(_ || _), lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("change_kind") =!= "unchanged")
      .select(entity.map(col) ++ Seq(col("change_kind")) ++
        valueCols.map(col) ++ valueCols.map(c => col(s"old_$c")): _*)
  }

  /** BITEMPORAL time-point read: the latest change point at-or-before
    * `tValid` on the VALID-time axis, among only the change points the
    * store had RECORDED by `tTx` on the transaction-time axis
    * (`txTs <= tTx` — late-arriving knowledge is excluded, so a replay
    * of yesterday's query returns yesterday's answer even after
    * backfills land). `txTs` may be a timestamp or numeric (µs) column;
    * `tTx` must compare against it. With `tTx = +∞` this degenerates to
    * [[snapshot]] (asserted in TemporalSpec). Same single-shuffle window
    * plan — the tx filter is a pushed scan predicate.
    */
  def bitemporalSnapshot(
      changes: DataFrame,
      entity: Seq[String],
      validTs: String,
      txTs: String,
      tValid: Column,
      tTx: Column,
      tieBreak: String): DataFrame =
    snapshot(changes.filter(col(txTs) <= tTx), entity, validTs, tValid,
      tieBreak)

  def bitemporalSnapshot(changes: DataFrame, entity: String, validTs: String,
      txTs: String, tValid: Column, tTx: Column, tieBreak: String): DataFrame =
    bitemporalSnapshot(changes, Seq(entity), validTs, txTs, tValid, tTx,
      tieBreak)

  /** Interval view: each change point becomes a row valid on
    * `[ts, next ts)`; the final change point is open (`valid_to` null).
    */
  def intervalView(
      changes: DataFrame,
      entity: Seq[String],
      ts: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*)
      .orderBy(col(ts).asc, col(tieBreak).asc)
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
  }

  def intervalView(changes: DataFrame, entity: String, ts: String,
      tieBreak: String): DataFrame =
    intervalView(changes, Seq(entity), ts, tieBreak)

  /** Time-range read: intervals overlapping `[t1, t2)`. */
  def timeRange(
      changes: DataFrame,
      entity: Seq[String],
      ts: String,
      tieBreak: String,
      t1: Column,
      t2: Column): DataFrame =
    intervalView(changes, entity, ts, tieBreak)
      .filter(col("valid_from") < t2 &&
        (col("valid_to").isNull || col("valid_to") > t1))

  def timeRange(changes: DataFrame, entity: String, ts: String,
      tieBreak: String, t1: Column, t2: Column): DataFrame =
    timeRange(changes, Seq(entity), ts, tieBreak, t1, t2)

  /** T07 — seed an SCD2 (slowly-changing-dimension type 2) history from a
    * first full snapshot: every row opens at `atUs`, none are closed.
    * Expected snapshot shape: entity key + attribute columns.
    */
  def scd2Init(snapshot: DataFrame, atUs: Long): DataFrame =
    snapshot
      .withColumn("valid_from_us", lit(atUs))
      .withColumn("valid_to_us", lit(null).cast("long"))

  /** T07 — SCD2 apply-changes: merge a full snapshot taken at `atUs` into
    * a `valid_from_us`/`valid_to_us` history. Per entity:
    *   - in both, attrs equal     → current row kept open, untouched
    *   - in both, attrs changed   → current row closed at `atUs`, new row
    *                                opened at `atUs`
    *   - only in history (delete) → current row closed at `atUs`
    *   - only in snapshot (insert)→ new row opened at `atUs`
    * Already-closed rows pass through untouched.
    *
    * Plan shape: ONE full-outer shuffle join on the entity key, then the
    * 0/1/2 output rows per entity come from a conditional array explode —
    * no second pass over the join, no window. At 100 TB both sides
    * hash-partition on the entity and the merge is a single exchange
    * (or zero, when history and snapshot are bucketed on the key).
    * Null-safe attr comparison: a null attribute equals null (no churn).
    */
  def scd2Merge(history: DataFrame, snapshot: DataFrame, entity: String,
      attrs: Seq[String], atUs: Long): DataFrame = {
    val closed = history.filter(col("valid_to_us").isNotNull)
    val cur = history.filter(col("valid_to_us").isNull)
    val cSide = cur.select((entity +: attrs).map(a => col(a).as(s"c_$a"))
      :+ col("valid_from_us").as("c_from"): _*)
    val sSide = snapshot.select(
      (entity +: attrs).map(a => col(a).as(s"s_$a")): _*)
    val j = cSide.join(sSide,
      col(s"c_$entity") === col(s"s_$entity"), "full_outer")
    val inC = col(s"c_$entity").isNotNull
    val inS = col(s"s_$entity").isNotNull
    val changed = attrs.map(a => !(col(s"c_$a") <=> col(s"s_$a")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def row(pfx: String, from: Column, to: Column): Column =
      struct(col(s"${pfx}_$entity").as(entity)
        +: attrs.map(a => col(s"${pfx}_$a").as(a))
        :+ from.as("valid_from_us") :+ to.as("valid_to_us"): _*)
    val keep = row("c", col("c_from"), lit(null).cast("long"))
    val close = row("c", col("c_from"), lit(atUs))
    val open = row("s", lit(atUs), lit(null).cast("long"))
    val emitted =
      when(inC && inS && !changed, array(keep))
        .when(inC && inS && changed, array(close, open))
        .when(inC && !inS, array(close))
        .otherwise(array(open))
    closed.unionByName(
      j.select(explode(emitted).as("__r")).select(col("__r.*")))
  }

  /** T08 — change-point compaction: drop change points whose value equals
    * the entity's previous change point (null-safe), i.e. rows that do not
    * change the piecewise-constant function at all. The reference's
    * temporal store performs exactly this dedup when flushing/compacting
    * its time-ordered files; here it is one window over the entity-key
    * shuffle, so at 100 TB it is a single exchange over the change-point
    * table (or zero over an entity-bucketed table). The compacted table
    * answers every snapshot / time-range / as-of read identically
    * (asserted in TemporalSpec), with the interval view emerging
    * maximally coalesced — no two consecutive intervals share a value.
    */
  def compactChangePoints(
      changes: DataFrame,
      entity: Seq[String],
      ts: String,
      tieBreak: String,
      value: Column): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*)
      .orderBy(col(ts).asc, col(tieBreak).asc)
    changes
      .withColumn("__prev_v", lag(value, 1).over(w))
      .filter(!(col("__prev_v") <=> value))
      .drop("__prev_v")
  }

  def compactChangePoints(changes: DataFrame, entity: String, ts: String,
      tieBreak: String, value: Column): DataFrame =
    compactChangePoints(changes, Seq(entity), ts, tieBreak, value)

  /** T09 — temporal aggregation index (the paper's "aggregation index for
    * window min/max/sum" re-expressed Spark-first): a per-entity per-day
    * rollup of decomposable partials (min/max/sum/count over integer
    * cents). Persist this once; every coarser tumbling window is then
    * answered from the rollup by [[reaggDaily]] without rescanning the
    * raw table — at 100 TB the rollup is ~1/raw_rows_per_entity_day the
    * size of the fact table, so the index query touches GBs, not TBs.
    */
  def rollupDaily(
      events: DataFrame,
      entity: String,
      ts: String,
      valueCents: Column): DataFrame =
    events
      .groupBy(col(entity), date_trunc("day", col(ts)).as("day"))
      .agg(
        min(valueCents).as("min_cents"),
        max(valueCents).as("max_cents"),
        sum(valueCents).as("sum_cents"),
        count(lit(1)).as("cnt"))

  /** Answer a `days`-day tumbling aggregate FROM the daily rollup by
    * re-aggregating partials (min of mins, max of maxes, sum of
    * sums/counts) — the decomposability that makes the aggregation index
    * sound. Buckets are indexed by whole days since `origin`
    * (a date literal, e.g. "2024-01-01") FLOOR-divided by `days`: floor,
    * not `div`, because SQL `div` truncates toward zero and would merge
    * the week before the origin into the week after it (DuckDB's `//`
    * floors, so the engines would silently disagree on pre-origin data).
    */
  def reaggDaily(
      daily: DataFrame,
      entity: String,
      origin: String,
      days: Int): DataFrame =
    daily
      .groupBy(col(entity),
        floor(datediff(col("day"), lit(origin).cast("date")) /
          lit(days.toDouble)).cast("long")
          .as("bucket"))
      .agg(
        min("min_cents").as("min_cents"),
        max("max_cents").as("max_cents"),
        sum("sum_cents").as("sum_cents"),
        sum("cnt").as("cnt"))

  /** T38 — MERGEABLE percentile index, build side: per (entity, day,
    * bucket) integer histogram counts with q44's width_bucket scheme
    * (`nb` equal buckets over `[lo, hi)` cents; 0 = underflow,
    * nb+1 = overflow). Counts are ADDITIVE — the q16b/t09 move applied
    * to quantiles: the raw table is scanned once at build time, and any
    * date range is answered by summing day partials, never rescanning —
    * which is the only way "p99 over an arbitrary range" works at
    * 100 TB (q28's exact percentile is a full re-sort per range;
    * q28b's sketch is one-shot, not maintained).
    */
  def histogramDaily(
      events: DataFrame,
      entity: String,
      ts: String,
      valueCents: Column,
      loCents: Long,
      hiCents: Long,
      nBuckets: Int): DataFrame = {
    // nBuckets must divide the range exactly: the read side reconstructs
    // integer edges as lo + bucket·((hi-lo)/nb), which drifts from
    // width_bucket's double-based boundaries on a non-dividing scheme and
    // silently breaks the containment contract (ADVICE r11).
    require((hiCents - loCents) % nBuckets == 0,
      s"nBuckets=$nBuckets must divide hiCents-loCents=${hiCents - loCents}")
    events
      .groupBy(col(entity), date_trunc("day", col(ts)).as("day"),
        width_bucket(valueCents, lit(loCents), lit(hiCents), lit(nBuckets))
          .as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** T38 — read side: bounded-error percentiles from re-aggregated
    * histogram partials. For each percentile p (integer percent) the
    * answer is the bucket holding the rank-⌈p·n/100⌉ order statistic —
    * min bucket whose cumulative count reaches the rank — emitted with
    * its `[lo_cents, hi_cents)` edges, so the error bound IS the bucket
    * width and every output is an exact integer (hash-matchable, unlike
    * a sketch). ToleranceSpec pins the containment: the exact rank-r
    * order statistic lies inside the returned bucket by construction.
    *
    * Plan: one partial re-agg (entity, bucket), one ≤nb-row-per-entity
    * cumulative window, and a broadcast percentile explode — nothing
    * touches the raw table. Underflow rows (bucket 0) still count
    * toward n and the cumulative walk; their edges are the scheme's
    * ARITHMETIC EXTENSION — `[lo − width, lo)` — i.e. the rail buckets
    * really denote open intervals and containment is only as tight as
    * one width beyond `[lo, hi)` (see the inline comment at the edge
    * emission).
    */
  def percentilesFromHistogram(
      partials: DataFrame,
      entity: String,
      percents: Seq[Int],
      loCents: Long,
      hiCents: Long,
      nBuckets: Int): DataFrame = {
    require((hiCents - loCents) % nBuckets == 0,
      s"nBuckets=$nBuckets must divide hiCents-loCents=${hiCents - loCents}")
    val width = (hiCents - loCents) / nBuckets
    val hist = partials.groupBy(col(entity), col("bucket"))
      .agg(sum("n").as("n"))
    val w = Window.partitionBy(entity).orderBy("bucket")
    val cum = hist
      .withColumn("cum", sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("n").over(
        Window.partitionBy(entity)))
    val ps = partials.sparkSession
      .createDataFrame(percents.map(Tuple1(_))).toDF("p")
    cum.crossJoin(broadcast(ps))
      // rank r = ceil(p*n/100) in pure integer arithmetic
      .withColumn("r", expr("(total * p + 99) div 100"))
      .filter(col("cum") >= col("r"))
      .groupBy(col(entity), col("p"), col("total").as("n"))
      .agg(min("bucket").as("bucket"))
      // edges are the scheme's arithmetic extension — the rails
      // (bucket 0 / nb+1) are really open intervals, so containment is
      // only as tight as one width beyond [lo, hi); callers whose data
      // honors the scheme bounds never see a rail bucket.
      .select(col(entity), col("p"), col("n"), col("bucket"),
        (lit(loCents) + (col("bucket") - 1) * width).as("lo_cents"),
        (lit(loCents) + col("bucket") * width).as("hi_cents"))
  }

  /** T39 — linear-interpolation resampling, the other half of T31's
    * forward-fill: each entity's irregular value series read out on the
    * daily UTC-midnight grid between its first and last event, each
    * grid point EXACTLY interpolated between its bracketing events in
    * pure integer arithmetic — v = (v0·(t1−t) + v1·(t−t0)) div (t1−t0)
    * over µs and cents, decimal(38,0) products (cents × a month of µs
    * overflows 2^63), truncation toward zero on both engines. The
    * degenerate cases fall out of the formula: an event exactly at the
    * grid point makes t0 = t and the quotient collapse to v0 exactly;
    * a grid point at the series' last event (no later event) reads v0.
    *
    * Plan: one entity-keyed groupBy for the bounds, one
    * explode(sequence) grid, then a SINGLE entity shuffle+sort shared
    * by the two frames (events and grid points interleaved; grid rows
    * carry null values so IGNORE NULLS last/first pick the bracketing
    * events) — no per-grid-point join, no as-of probe storm. At 100 TB
    * the grid is bounded by entities × days, tiny next to the events.
    */
  def resampleInterpolate(events: DataFrame, entity: String, ts: String,
      tieBreak: String, valueCents: Column): DataFrame = {
    val e = events.select(col(entity).as("__ent"), col(ts).as("__ts"),
      col(tieBreak).cast("long").as("__tie"),
      valueCents.cast("long").as("__v"))
    val grid = e.groupBy("__ent")
      .agg(min("__ts").as("mn"), max("__ts").as("mx"))
      .select(col("__ent"), col("mn"),
        explode(sequence(date_trunc("day", col("mn")), col("mx"),
          expr("interval 1 day"))).as("__ts"))
      .filter(col("__ts") >= col("mn"))
      .select(col("__ent"), col("__ts"), lit(1).as("__isg"),
        lit(Long.MaxValue).as("__tie"), lit(null).cast("long").as("__v"))
    val u = e.withColumn("__isg", lit(0))
      .select("__ent", "__ts", "__isg", "__tie", "__v")
      .unionByName(grid)
      .withColumn("__us", graft.Det.epochUs(col("__ts")))
      .withColumn("__evus", when(col("__isg") === 0, col("__us")))
    val w = Window.partitionBy("__ent")
      .orderBy(col("__ts"), col("__isg"), col("__tie"))
    val pw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nw = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.withColumn("v0", last("__v", ignoreNulls = true).over(pw))
      .withColumn("t0", last("__evus", ignoreNulls = true).over(pw))
      .withColumn("v1", first("__v", ignoreNulls = true).over(nw))
      .withColumn("t1", first("__evus", ignoreNulls = true).over(nw))
      .filter(col("__isg") === 1)
      .select(col("__ent").as(entity), col("__ts").as("day"),
        when(col("t1").isNull || col("t1") === col("t0"), col("v0"))
          .otherwise(expr(
            """CAST((CAST(v0 AS DECIMAL(38,0)) * (t1 - __us) +
              |      CAST(v1 AS DECIMAL(38,0)) * (__us - t0))
              |     div (t1 - t0) AS BIGINT)""".stripMargin))
          .as("v_cents"))
  }

  /** S37 — population-stability-index drift between two day-ranges of
    * the SAME maintained histogram (the monitoring read a training-data
    * pipeline runs continuously: "has this feed's value distribution
    * moved since the reference period?"). PSI = Σ_b (p_b − q_b)·
    * ln(p_b/q_b) over the FULL bucket domain 0..nb+1 (width_bucket's
    * under/overflow rails included) with add-one smoothing — p_b =
    * (c_ref_b+1)/(n_ref+B), q_b = (c_live_b+1)/(n_live+B), B = nb+2 —
    * so empty buckets carry their smoothed mass and PSI is finite for
    * any pair of periods, including an entity absent from one side.
    * Output (entity, n_ref, n_live, psi_r4); the conventional read:
    * <0.1 stable, 0.1–0.25 drifting, >0.25 shifted.
    *
    * Plan: two filtered re-aggs of the (tiny) histogram, a dense
    * entity×bucket domain built by explode(sequence) — ≤ |entities|·B
    * rows — and one ≤B-row-per-entity sum. Nothing touches raw events:
    * at 100 TB this reads the maintained partials only, which is the
    * point of maintaining them. Floats appear in the final
    * (p−q)·ln(p/q) only; the oracle mirrors the exact expression
    * order and round(4) on the ≤B-term sum absorbs ULP noise.
    */
  def psiFromHistogram(
      hist: DataFrame,
      entity: String,
      refFrom: Column, refTo: Column,
      liveFrom: Column, liveTo: Column,
      nBuckets: Int): DataFrame = {
    val b = nBuckets + 2
    def period(from: Column, to: Column, name: String) =
      hist.filter(col("day").between(from, to))
        .groupBy(col(entity), col("bucket")).agg(sum("n").as(name))
    val ref = period(refFrom, refTo, "c_ref")
    val live = period(liveFrom, liveTo, "c_live")
    val ents = ref.select(col(entity))
      .unionAll(live.select(col(entity))).distinct()
    val domain = ents.select(col(entity),
      explode(sequence(lit(0), lit(nBuckets + 1))).as("bucket"))
    val counts = domain
      .join(ref, Seq(entity, "bucket"), "left")
      .join(live, Seq(entity, "bucket"), "left")
      .select(col(entity), col("bucket"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_live"), lit(0L)).as("c_live"))
    val totals = counts.groupBy(col(entity))
      .agg(sum("c_ref").as("n_ref"), sum("c_live").as("n_live"))
    counts.join(broadcast(totals), entity)
      .withColumn("p",
        (col("c_ref") + 1).cast("double") / (col("n_ref") + b))
      .withColumn("q",
        (col("c_live") + 1).cast("double") / (col("n_live") + b))
      .groupBy(col(entity))
      .agg(max("n_ref").as("n_ref"), max("n_live").as("n_live"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 4)
          .as("psi_r4"))
  }

  /** T12 — time-weighted temporal aggregation over `[t1, t2)`: each value
    * interval clipped to the window contributes `value × clipped-duration`
    * — the genuinely temporal mean/sum (a value held for 2 days weighs
    * 48× one held for an hour), vs T03's per-row aggregation. Output per
    * entity: the weighted numerator (cents·µs) and covered µs, both
    * exact integers — the caller divides (keeping the hash contract
    * division-free). One window + one agg shuffle on the entity.
    * Overflow-safe to cents·window products under 2^63 (a 10^6-cent
    * value over a year is ~3×10^19... so bound the window, or pre-scale
    * to cents·seconds for multi-year windows).
    */
  def timeWeighted(
      changes: DataFrame,
      entity: Seq[String],
      ts: String,
      tieBreak: String,
      valueCents: Column,
      t1: Column,
      t2: Column): DataFrame =
    timeRange(changes, entity, ts, tieBreak, t1, t2)
      .select(entity.map(col) :+ valueCents.as("__c") :+
        graft.Det.epochUs(greatest(col("valid_from"), t1)).as("__f") :+
        graft.Det.epochUs(least(coalesce(col("valid_to"), t2), t2)).as("__t"): _*)
      .groupBy(entity.map(col): _*)
      .agg(sum(expr("__c * (__t - __f)")).as("weighted_cents_us"),
        sum(expr("__t - __f")).as("covered_us"))

  def timeWeighted(changes: DataFrame, entity: String, ts: String,
      tieBreak: String, valueCents: Column, t1: Column, t2: Column): DataFrame =
    timeWeighted(changes, Seq(entity), ts, tieBreak, valueCents, t1, t2)

  /** T11 — temporal (interval-intersection) join, the temporal-algebra
    * inner join: two interval views of the same entity joined where
    * their validity overlaps; each output row is valid on the
    * intersection `[max(from_a, from_b), min(to_a, to_b))` (null = open,
    * propagated correctly through the min). Both inputs carry
    * `valid_from`/`valid_to` plus payload columns (caller keeps names
    * disjoint). Equi join on the entity with an overlap post-filter —
    * a hash join, never a nested loop; at 100 TB both sides bucket on
    * the entity and the join is exchange-free.
    */
  def temporalJoin(a: DataFrame, b: DataFrame, entity: String): DataFrame = {
    val bPay = b.columns.filterNot(
      Set(entity, "valid_from", "valid_to").contains)
    val b2 = b.select(col(entity).as("__e2") +:
      col("valid_from").as("__f2") +: col("valid_to").as("__t2") +:
      bPay.map(col).toSeq: _*)
    val aPay = a.columns.filterNot(
      Set(entity, "valid_from", "valid_to").contains)
    val interTo =
      when(col("valid_to").isNull, col("__t2"))
        .when(col("__t2").isNull, col("valid_to"))
        .otherwise(least(col("valid_to"), col("__t2")))
    a.join(b2, col(entity) === col("__e2") &&
        (col("__t2").isNull || col("valid_from") < col("__t2")) &&
        (col("valid_to").isNull || col("__f2") < col("valid_to")))
      .select(col(entity) +:
        greatest(col("valid_from"), col("__f2")).as("valid_from") +:
        interTo.as("valid_to") +:
        (aPay ++ bPay).map(col): _*)
      // a zero-length input interval (change points tied on ts) passes
      // the overlap predicate when strictly inside a partner interval but
      // carries no time — drop the empty intersections it produces
      .filter(col("valid_to").isNull || col("valid_from") < col("valid_to"))
  }

  /** T27 — temporal ALIGN (the full-outer member of the interval
    * algebra, completing [[temporalJoin]]'s inner intersection): both
    * inputs' validity intervals re-segmented on the UNION of their
    * breakpoints, each segment carrying the covering payload from each
    * side or null where that side has a coverage gap — "value is stale
    * but the state machine still holds" is a fact only the outer form
    * can state. Inputs: per-entity DISJOINT, closed intervals
    * (`valid_from`/`valid_to` half-open), payload column names disjoint
    * across the two inputs.
    *
    * Spark-first shape: NO inequality join. Per side, the covering
    * interval of a segment `[sf, st)` is the unique one with
    * `vf ≤ sf` (disjointness) — an AS-OF pick (union+window, one
    * entity-keyed shuffle) gated by `vt ≥ st`. `tieBreak` matters
    * exactly when zero-length intervals `[t, t)` tie with a real
    * interval starting at `t` (duplicate change timestamps): backward
    * as-of keeps the GREATEST tie, and interval-view construction gives
    * the last tied row the real (non-degenerate) interval, so the
    * coverable candidate wins deterministically. Segments covered by
    * neither side are dropped (they are the mutual gap).
    */
  def temporalAlign(a: DataFrame, b: DataFrame, entity: String,
      aTie: String, bTie: String): DataFrame = {
    val meta = Set(entity, "valid_from", "valid_to")
    val aPay = a.columns.filterNot(meta.contains).toSeq
    val bPay = b.columns.filterNot(meta.contains).toSeq
    require(aPay.intersect(bPay).isEmpty,
      s"align payload name clash: ${aPay.intersect(bPay).mkString(",")}")
    val bps = a.select(col(entity), col("valid_from").as("bp"))
      .unionAll(a.select(col(entity), col("valid_to")))
      .unionAll(b.select(col(entity), col("valid_from")))
      .unionAll(b.select(col(entity), col("valid_to")))
      .distinct()
    val w = Window.partitionBy(entity).orderBy("bp")
    val segs = bps.withColumn("__st", lead("bp", 1).over(w))
      .filter(col("__st").isNotNull)
      .select(col(entity), col("bp").as("seg_from"), col("__st").as("seg_to"))
    def side(left: DataFrame, in: DataFrame, pay: Seq[String],
        tie: String, covFlag: String): DataFrame = {
      val j = AsOfJoin(left, in, on = Seq(entity), leftTs = "seg_from",
        rightTs = "valid_from", payload = "valid_to" +: pay, tieBreak = tie)
      j.withColumn(covFlag, col("valid_to_asof").isNotNull &&
          col("valid_to_asof") >= col("seg_to"))
        .select(left.columns.map(col) ++ Seq(col(covFlag)) ++
          pay.map(p => when(col(covFlag), col(p + "_asof")).as(p)): _*)
    }
    val withA = side(segs, a, aPay, aTie, "__a_cov")
    side(withA, b, bPay, bTie, "__b_cov")
      .filter(col("__a_cov") || col("__b_cov"))
      .select(Seq(col(entity), col("seg_from"), col("seg_to")) ++
        (aPay ++ bPay).map(col): _*)
  }

  /** Gaps-and-islands sessionization: a new session starts when the gap to
    * the previous row of the same entity is STRICTLY greater than
    * `gapSeconds` (FIXTURES.md: a gap of exactly the threshold does NOT
    * split). Two windows over one shuffle on the entity key.
    * Returns the input plus a `session_id` column (0-based per entity).
    */
  def sessionize(
      df: DataFrame,
      entity: String,
      ts: String,
      tieBreak: String,
      gapSeconds: Long): DataFrame =
    sessionize(df, Seq(entity), ts, tieBreak, gapSeconds)

  def sessionize(
      df: DataFrame,
      entity: Seq[String],
      ts: String,
      tieBreak: String,
      gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(entity.map(col): _*)
      .orderBy(col(ts).asc, col(tieBreak).asc)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(ts), 1).over(order))
      .withColumn("__brk",
        when(col("__prev").isNull, lit(0))
          .when(graft.Det.epochUs(col(ts)) - graft.Det.epochUs(col("__prev")) >
            lit(gapSeconds * 1000000L), lit(1))
          .otherwise(lit(0)))
      .withColumn("session_id", sum(col("__brk")).over(run))
      .drop("__prev", "__brk")
  }

  /** T13 — forward-fill resample onto a daily grid (gap-fill): one row
    * per (entity, day) across each entity's own [first, last] event span,
    * carrying the latest value at-or-before the END of that day — the
    * piecewise-constant temporal read evaluated on a regular grid, the
    * shape every time-series feature pipeline needs.
    *
    * Built ON the as-of join (grid spine = left, change points = right):
    * the spine is one narrow groupBy + sequence-explode, then the same
    * single-shuffle union+window as-of plan — no non-equi join, no
    * per-day subqueries. At 100 TB the spine is |entities| × days rows,
    * tiny next to the event log it summarizes. Tie at equal ts broken by
    * greatest `tieBreak`, matching the other temporal reads. Output:
    * (entity, day, <value>_ff).
    */
  def resampleDaily(
      changes: DataFrame,
      entity: Seq[String],
      ts: String,
      value: String,
      tieBreak: String): DataFrame = {
    val spine = changes.groupBy(entity.map(col): _*)
      .agg(date_trunc("DAY", min(col(ts))).as("__d0"),
        date_trunc("DAY", max(col(ts))).as("__d1"))
      .select(entity.map(col) :+
        explode(sequence(col("__d0"), col("__d1"),
          expr("interval 1 day"))).as("day"): _*)
      // as-of probe at the LAST microsecond of the day: at-or-before
      // day end == strictly-before next day start
      .withColumn("__day_end",
        col("day") + expr("interval 1 day") - expr("interval 1 microsecond"))
    AsOfJoin(spine,
        changes.select((entity :+ ts :+ tieBreak :+ value).map(col): _*),
        on = entity, leftTs = "__day_end", rightTs = ts,
        payload = Seq(value), tieBreak = tieBreak)
      .select(entity.map(col) :+ col("day") :+
        col(value + "_asof").as(value + "_ff"): _*)
  }

  def resampleDaily(changes: DataFrame, entity: String, ts: String,
      value: String, tieBreak: String): DataFrame =
    resampleDaily(changes, Seq(entity), ts, value, tieBreak)

  /** T25 — daily resample with LINEAR interpolation: each midnight grid
    * point gets the value interpolated between its entity's last
    * observation at-or-before and first at-or-after — the resample a
    * continuously-varying signal (sensor, price, utilization) wants
    * where [[resampleDaily]]'s step-hold is wrong. Exact integer
    * arithmetic in cents × epoch micros, in the BARYCENTRIC form
    * `(v0·(t1−g) + v1·(g−t0)) div (t1−t0)`: both weights are
    * non-negative, so with a non-negative value domain the numerator is
    * non-negative and Spark's truncating `div` equals DuckDB's flooring
    * `//` — the subtraction form `v0 + (Δv·(g−t0)) div Δt` breaks
    * cross-engine exactly when Δv < 0. (Caveats: negative values would
    * reopen the trunc-vs-floor gap, and |v|·span_us must stay under
    * 2^63 — cents ≤ 5·10^4 × a 30-day span ≈ 1.3·10^17 here; a wider
    * domain wants the product in decimal(38,0).) Head grid points
    * before the first observation back-fill from it; a grid point ON an
    * observation returns that value exactly (g = t0 ⇒ the v0 term
    * alone). Plan: the two as-of directions over the same spine — two
    * entity-keyed window shuffles, no self-join, same shape at 100 TB.
    */
  def resampleInterpolatedDaily(changes: DataFrame, entity: Seq[String],
      ts: String, value: String, tieBreak: String): DataFrame = {
    val spine = changes.groupBy(entity.map(col): _*)
      .agg(date_trunc("DAY", min(col(ts))).as("__d0"),
        date_trunc("DAY", max(col(ts))).as("__d1"))
      .select(entity.map(col) :+
        explode(sequence(col("__d0"), col("__d1"),
          expr("interval 1 day"))).as("day"): _*)
    val obs = changes.select((entity :+ ts :+ tieBreak :+ value).map(col): _*)
    val back = AsOfJoin(spine, obs, on = entity, leftTs = "day",
      rightTs = ts, payload = Seq(ts, value), tieBreak = tieBreak)
    val both = AsOfJoin.forward(back, obs, on = entity, leftTs = "day",
      rightTs = ts, payload = Seq(ts, value), tieBreak = tieBreak)
    both
      .withColumn("__gu", graft.Det.epochUs(col("day")))
      .withColumn("__t0", graft.Det.epochUs(col(s"${ts}_asof")))
      .withColumn("__t1", graft.Det.epochUs(col(s"${ts}_fwd")))
      .withColumn("__v0", graft.Det.cents(col(s"${value}_asof")))
      .withColumn("__v1", graft.Det.cents(col(s"${value}_fwd")))
      .withColumn("interp_cents", expr(
        """CASE WHEN __t0 IS NULL THEN __v1
          |     WHEN __t1 IS NULL OR __t1 <= __t0 THEN __v0
          |     ELSE (__v0 * (__t1 - __gu) + __v1 * (__gu - __t0))
          |          div (__t1 - __t0) END""".stripMargin))
      .select(entity.map(col) :+ col("day") :+ col("interp_cents"): _*)
  }

  /** T17 — gap detection (the dual of [[sessionize]]): per entity, emit
    * every silence STRICTLY longer than `minGapSeconds` between
    * consecutive change points as an interval
    * `(entity…, gap_start, gap_end, gap_us)` — the downtime/outage view
    * a monitoring or data-freshness pipeline reads, where sessionize's
    * islands are the uptime view of the very same lag. Consistent with
    * sessionize's boundary rule: a gap of exactly the threshold is NOT
    * reported.
    *
    * One shuffle on the entity key(s) and a single lag window — no
    * self-join. At 100 TB the window's per-key state is one row (the
    * previous timestamp), and the output is bounded by the event count,
    * in practice a tiny fraction of it. Ordering ties at equal ts break
    * by `tieBreak` so duplicate timestamps pair deterministically (their
    * internal gap is 0 and never reported).
    */
  def gaps(
      df: DataFrame,
      entity: Seq[String],
      ts: String,
      tieBreak: String,
      minGapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(entity.map(col): _*)
      .orderBy(col(ts).asc, col(tieBreak).asc)
    df.withColumn("__prev", lag(col(ts), 1).over(order))
      .withColumn("gap_us",
        graft.Det.epochUs(col(ts)) - graft.Det.epochUs(col("__prev")))
      .filter(col("__prev").isNotNull &&
        col("gap_us") > lit(minGapSeconds * 1000000L))
      .select(entity.map(col) :+ col("__prev").as("gap_start") :+
        col(ts).as("gap_end") :+ col("gap_us"): _*)
  }

  def gaps(df: DataFrame, entity: String, ts: String, tieBreak: String,
      minGapSeconds: Long): DataFrame =
    gaps(df, Seq(entity), ts, tieBreak, minGapSeconds)

  /** T19 — interval coalescing (temporal-algebra COALESCE / PACK): merge
    * each entity's overlapping-or-touching intervals into their maximal
    * covered spans — the normalization every interval algebra needs
    * before set operations (an SCD2 history with churned attributes,
    * per-shard uptime windows, lease/hold ranges all coalesce to "when
    * was the entity covered at all"). Touching intervals
    * (`end == next start`) merge; only a strict gap splits, consistent
    * with [[sessionize]]'s boundary rule.
    *
    * Gaps-and-islands in ONE shuffle on the entity key(s): a running
    * `max(end)` over preceding rows marks span breaks (`start` strictly
    * past everything seen), a running sum numbers the islands, and the
    * final groupBy on (entity, island) reuses the window's hash
    * partitioning — Catalyst plans zero additional Exchanges. The
    * running max, NOT `lag(end)`, is what makes nesting correct: an
    * interval wholly inside an earlier long one must not re-open a span
    * when its own end precedes the covered frontier. At 100 TB the
    * window state is one value per key and the output is bounded by the
    * input row count. Output: entity…, `span_start`, `span_end`,
    * `n_intervals` (merged-input count per span).
    */
  def coalesceIntervals(
      df: DataFrame,
      entity: Seq[String],
      start: String,
      end: String,
      tieBreak: String): DataFrame = {
    val order = Window.partitionBy(entity.map(col): _*)
      .orderBy(col(start).asc, col(tieBreak).asc)
    val frontier = order.rowsBetween(Window.unboundedPreceding, -1)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__frontier", max(col(end)).over(frontier))
      .withColumn("__brk",
        when(col("__frontier").isNull, lit(0))
          .when(col(start) > col("__frontier"), lit(1))
          .otherwise(lit(0)))
      .withColumn("__island", sum(col("__brk")).over(run))
      .groupBy((entity :+ "__island").map(col): _*)
      .agg(min(col(start)).as("span_start"), max(col(end)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .select(entity.map(col) :+ col("span_start") :+ col("span_end") :+
        col("n_intervals"): _*)
  }

  def coalesceIntervals(df: DataFrame, entity: String, start: String,
      end: String, tieBreak: String): DataFrame =
    coalesceIntervals(df, Seq(entity), start, end, tieBreak)

  /** T29 — peak concurrency by SWEEP LINE: per entity, the maximum
    * number of simultaneously-open intervals — the capacity question
    * ("how many leases/sessions/connections at once") that
    * [[coalesceIntervals]]' spans deliberately erase. Each interval
    * contributes a +1 boundary at `start` and a −1 at `end`; the
    * running sum over the boundary stream is the live count, and ends
    * sort BEFORE starts at equal time so the half-open convention
    * holds: touching intervals never overlap (the same boundary rule
    * as the whole interval algebra). One entity shuffle, one
    * running-sum window, a groupBy reusing the window's partitioning —
    * linear where an all-pairs overlap count is quadratic; per-key
    * window state is a single counter at any scale. Output:
    * (entity…, n_intervals, peak).
    */
  def peakConcurrency(
      df: DataFrame,
      entity: Seq[String],
      start: String,
      end: String,
      tieBreak: String): DataFrame = {
    val ec = entity.map(col)
    val b = df.select(ec :+ graft.Det.epochUs(col(start)).as("__t") :+
        lit(1).as("__d") :+ col(tieBreak).as("__tb"): _*)
      .unionAll(df.select(ec :+ graft.Det.epochUs(col(end)).as("__t") :+
        lit(-1).as("__d") :+ col(tieBreak).as("__tb"): _*))
    val w = Window.partitionBy(ec: _*)
      .orderBy(col("__t").asc, col("__d").asc, col("__tb").asc)
    b.withColumn("__conc", sum(col("__d")).over(w))
      .groupBy(ec: _*)
      .agg(expr("count(1) div 2").as("n_intervals"),
        max(col("__conc")).cast("long").as("peak"))
  }

  def peakConcurrency(df: DataFrame, entity: String, start: String,
      end: String, tieBreak: String): DataFrame =
    peakConcurrency(df, Seq(entity), start, end, tieBreak)

  /** T21 — interval OVERLAP AUDIT: per entity, every interval that
    * begins STRICTLY before the coverage frontier of the rows sorted
    * before it — the integrity read over any validity-interval table
    * (two open SCD2 rows, double-booked leases, conflicting holds),
    * where a clean table returns ZERO rows. Touching (`start ==
    * frontier`) is legal, consistent with [[coalesceIntervals]]'
    * merge rule. Each offending row is reported ONCE against the
    * frontier (not once per overlapping partner — the all-pairs
    * listing is quadratic on pathological tables; the frontier form is
    * linear and names every violator): (entity…, tieBreak, `ov_from`,
    * `ov_to`, `ov_us`). Timestamp bounds (ov_us is exact integer
    * microseconds). Same single entity-shuffle window as the other
    * interval ops.
    */
  def overlapAudit(
      df: DataFrame,
      entity: Seq[String],
      start: String,
      end: String,
      tieBreak: String): DataFrame = {
    val order = Window.partitionBy(entity.map(col): _*)
      .orderBy(col(start).asc, col(tieBreak).asc)
    val frontier = order.rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__f", max(col(end)).over(frontier))
      .filter(col("__f").isNotNull && col(start) < col("__f"))
      .select(entity.map(col) :+ col(tieBreak) :+
        col(start).as("ov_from") :+
        least(col(end), col("__f")).as("ov_to") :+
        (graft.Det.epochUs(least(col(end), col("__f"))) -
          graft.Det.epochUs(col(start))).as("ov_us"): _*)
  }

  /** T20 — interval COMPLEMENT over a reporting range: per entity, the
    * sub-ranges of `[lo, hi)` NOT covered by any input interval — the
    * uncovered dual of [[coalesceIntervals]] (SLA downtime inside the
    * audit window, un-leased capacity, unmonitored spans). Built ON the
    * coalesce: merge to maximal spans, clip to the range, then each
    * uncovered stretch is (previous clipped end, next clipped start)
    * via one lag over the SAME entity shuffle — plus the head gap
    * `[lo, first start)` and the tail gap `[last end, hi)`, emitted by
    * the boundary rows themselves (no union, no second pass). Entities
    * with NO interval in range produce nothing — the caller decides
    * whether absent means "fully uncovered" (join the entity dim and
    * union `[lo, hi)` rows) or "out of scope"; baking either in would
    * be wrong for the other.
    */
  def intervalComplement(
      df: DataFrame,
      entity: Seq[String],
      start: String,
      end: String,
      tieBreak: String,
      lo: Column,
      hi: Column): DataFrame = {
    val spans = coalesceIntervals(df, entity, start, end, tieBreak)
      .filter(col("span_end") > lo && col("span_start") < hi)
      .select(entity.map(col) :+
        greatest(col("span_start"), lo).as("__s") :+
        least(col("span_end"), hi).as("__e"): _*)
    val order = Window.partitionBy(entity.map(col): _*).orderBy(col("__s"))
    val wAll = Window.partitionBy(entity.map(col): _*)
    // spans are disjoint and strictly separated, so lag(end) IS the
    // coverage frontier here (unlike the raw-interval case)
    // Each clipped span row emits 0..3 gap structs (null when its
    // condition fails, filtered before the explode) — type-agnostic
    // like coalesceIntervals, no hard-coded bound type anywhere.
    val candidates = array(
      // head gap before the first span
      when(col("__rn") === 1 && col("__s") > lo,
        struct(lo.as("gap_start"), col("__s").as("gap_end"))),
      // gap between this span and the previous one
      when(col("__prev_e").isNotNull && col("__s") > col("__prev_e"),
        struct(col("__prev_e").as("gap_start"), col("__s").as("gap_end"))),
      // tail gap after the LAST span (emitted by the max-end row)
      when(col("__e") === col("__max_e") && col("__e") < hi,
        struct(col("__e").as("gap_start"), hi.as("gap_end"))))
    spans
      .withColumn("__prev_e", lag(col("__e"), 1).over(order))
      .withColumn("__rn", row_number().over(order))
      .withColumn("__max_e", max(col("__e")).over(wAll))
      .select(entity.map(col) :+
        explode(filter(candidates, g => g.isNotNull)).as("__g"): _*)
      .select(entity.map(col) :+ col("__g.gap_start") :+
        col("__g.gap_end"): _*)
  }
}
