package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-property operators over change-point tables (SURVEY.md §1.2,
  * §2.3). A temporal property is a piecewise-constant function of time,
  * stored as change points `(entity, ts, value)`; these operators derive
  * the reference's read surface — time-point (snapshot), time-range
  * (interval view) — plus sessionization, as single-shuffle window plans.
  */
object Temporal {

  /** Time-point read for every entity: the latest change point at-or-before
    * `t`. One shuffle on the entity key; the `ts <= t` filter is pushed to
    * the scan before the shuffle, so at 100 TB only the history up to `t`
    * moves. Tie at equal ts broken by greatest `tieBreak`.
    */
  def snapshot(
      changes: DataFrame,
      entity: String,
      ts: String,
      t: Column,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(entity)
      .orderBy(col(ts).desc, col(tieBreak).desc)
    changes.filter(col(ts) <= t)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Interval view: each change point becomes a row valid on
    * `[ts, next ts)`; the final change point is open (`valid_to` null).
    */
  def intervalView(
      changes: DataFrame,
      entity: String,
      ts: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(entity).orderBy(col(ts).asc, col(tieBreak).asc)
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
  }

  /** Time-range read: intervals overlapping `[t1, t2)`. */
  def timeRange(
      changes: DataFrame,
      entity: String,
      ts: String,
      tieBreak: String,
      t1: Column,
      t2: Column): DataFrame =
    intervalView(changes, entity, ts, tieBreak)
      .filter(col("valid_from") < t2 &&
        (col("valid_to").isNull || col("valid_to") > t1))

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
      gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(entity).orderBy(col(ts).asc, col(tieBreak).asc)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(ts), 1).over(order))
      .withColumn("__brk",
        when(col("__prev").isNull, lit(0))
          .when(unix_micros(col(ts)) - unix_micros(col("__prev")) >
            lit(gapSeconds * 1000000L), lit(1))
          .otherwise(lit(0)))
      .withColumn("session_id", sum(col("__brk")).over(run))
      .drop("__prev", "__brk")
  }
}
