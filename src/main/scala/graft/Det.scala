package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers (SURVEY.md §2.0): cross-engine hash-matching against
  * the DuckDB oracle requires integer-cents money aggregates, 4-decimal
  * rounded ratios, and a total ORDER BY on every declared query.
  */
object Det {
  /** `CAST(round(sum(x*100)) AS BIGINT)` — money/measure sums in cents. */
  def sumCents(c: Column): Column = round(sum(c * lit(100))).cast("long")

  /** Per-row cents value (for running sums that must stay integral). */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Ratios/averages rounded to 4 decimals. */
  def round4(c: Column): Column = round(c, 4)
}
