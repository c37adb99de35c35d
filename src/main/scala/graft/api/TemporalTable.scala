package graft.api

import graft.ops.{AsOfJoin, Temporal}
import org.apache.spark.sql.{Column, DataFrame}

/** The engine's user-facing temporal-property surface — the reference's
  * `getTemporalProperty(key, t)` / range-read API re-expressed over a
  * change-point DataFrame (SURVEY.md §1.2). All methods are lazy plan
  * builders; nothing executes until an action.
  *
  * {{{
  * val tt = TemporalTable(events, entity = "user_id", ts = "ts",
  *   tieBreak = "event_id")
  * tt.snapshot(lit("2024-01-15").cast("timestamp"))   // state at t
  * tt.timeRange(t1, t2)                               // intervals in [t1,t2)
  * tt.asOfJoin(probes, "p_ts", Seq("value"))          // latest state per probe
  * }}}
  */
case class TemporalTable(
    changes: DataFrame,
    entity: String,
    ts: String,
    tieBreak: String) {

  /** Time-point read for every entity: latest change at-or-before `t`. */
  def snapshot(t: Column): DataFrame =
    Temporal.snapshot(changes, entity, ts, t, tieBreak)

  /** Piecewise-constant interval view ([ts, next ts), last open). */
  def intervalView: DataFrame =
    Temporal.intervalView(changes, entity, ts, tieBreak)

  /** Time-range read: intervals overlapping [t1, t2). */
  def timeRange(t1: Column, t2: Column): DataFrame =
    Temporal.timeRange(changes, entity, ts, tieBreak, t1, t2)

  /** Gaps-and-islands sessionization (strictly-greater split rule). */
  def sessionize(gapSeconds: Long): DataFrame =
    Temporal.sessionize(changes, entity, ts, tieBreak, gapSeconds)

  /** T41 — per-session summary: (start, end, duration, n_events) plus
    * the idle gap since the entity's previous session (-1 for the
    * first).
    */
  def sessionStats(gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sess = sessionize(gapSeconds)
      .groupBy(entity, "session_id")
      .agg(graft.Det.epochUs(min(col(ts))).as("start_us"),
        graft.Det.epochUs(max(col(ts))).as("end_us"),
        count(lit(1)).as("n_events"))
    sess
      .withColumn("prev_end", lag("end_us", 1).over(
        Window.partitionBy(entity).orderBy("session_id")))
      .select(col(entity), col("session_id"), col("start_us"),
        col("end_us"), (col("end_us") - col("start_us")).as("duration_us"),
        col("n_events"),
        coalesce(col("start_us") - col("prev_end"), lit(-1L)).as("idle_us"))
  }

  /** Q57-family — sequence-pattern counting over this table's
    * (entity, ts, tieBreak) order; `typeCol` names the symbol column.
    * See [[graft.ops.Patterns.matchCounts]] for the semantics matrix.
    */
  def matchPattern(typeCol: String, pattern: Seq[String],
      contiguous: Boolean = false,
      withinUs: Option[Long] = None): DataFrame =
    graft.ops.Patterns.matchCounts(changes, entity, ts, tieBreak,
      typeCol, pattern, contiguous, withinUs)

  /** Q57f — the re-anchoring WITHIN counter (MATCH_RECOGNIZE-parity
    * bound); see [[graft.ops.Patterns.reanchoredCounts]].
    */
  def matchReanchored(typeCol: String, pattern: Seq[String],
      withinUs: Long): DataFrame =
    graft.ops.Patterns.reanchoredCounts(changes, entity, ts, tieBreak,
      typeCol, pattern, withinUs)

  /** For each probe row, the latest change payload at-or-before its
    * timestamp (`strict` = strictly-before). Probes join on this table's
    * entity column name.
    */
  def asOfJoin(
      probes: DataFrame,
      probeTs: String,
      payload: Seq[String],
      strict: Boolean = false): DataFrame =
    AsOfJoin(probes, changes, on = Seq(entity), leftTs = probeTs,
      rightTs = ts, payload = payload, tieBreak = tieBreak, strict = strict)

  /** Forward as-of: earliest change at-or-after each probe (`strict` =
    * strictly-after); payload columns come back suffixed `_fwd`.
    */
  def asOfJoinForward(
      probes: DataFrame,
      probeTs: String,
      payload: Seq[String],
      strict: Boolean = false): DataFrame =
    AsOfJoin.forward(probes, changes, on = Seq(entity), leftTs = probeTs,
      rightTs = ts, payload = payload, tieBreak = tieBreak, strict = strict)

  /** Nearest as-of: the closer of the backward/forward candidates, exact
    * ties going backward; payload columns come back suffixed `_near`.
    */
  def asOfJoinNearest(
      probes: DataFrame,
      probeTs: String,
      payload: Seq[String]): DataFrame =
    AsOfJoin.nearest(probes, changes, on = Seq(entity), leftTs = probeTs,
      rightTs = ts, payload = payload, tieBreak = tieBreak)

  /** Change-point compaction over `value`: rows whose value (null-safe)
    * equals the entity's previous change point are dropped — every
    * snapshot/timeRange/asOfJoin read is preserved (TemporalSpec).
    */
  def compact(value: Column): TemporalTable =
    copy(changes = Temporal.compactChangePoints(
      changes, entity, ts, tieBreak, value))

  /** Per-entity daily rollup of decomposable partials over `valueCents`
    * (the aggregation index); answer coarser tumbling windows with
    * [[reaggregate]] without rescanning `changes`.
    */
  def rollupDaily(valueCents: Column): DataFrame =
    Temporal.rollupDaily(changes, entity, ts, valueCents)

  /** Re-aggregate a [[rollupDaily]] table to `days`-wide buckets indexed
    * from `origin` (a date literal).
    */
  def reaggregate(daily: DataFrame, origin: String, days: Int): DataFrame =
    Temporal.reaggDaily(daily, entity, origin, days)
}
