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
