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

  /** JVM-side twin of [[cents]] for typed/stateful operators: identical
    * HALF_UP away-from-zero semantics to Spark's `round` (which goes
    * through `BigDecimal.valueOf`), so e.g. -12.5 cents rounds to -13 —
    * `math.round` would give -12 (floor(x+0.5), toward +∞ on .5 ties).
    */
  def centsJvm(v: Double): Long =
    BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Ratios/averages rounded to 4 decimals. */
  def round4(c: Column): Column = round(c, 4)
}
