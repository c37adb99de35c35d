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

  /** Epoch microseconds of a timestamp of EITHER flavor. `unix_micros`
    * rejects TIMESTAMP_NTZ at analysis time; casting first makes every
    * temporal operator accept both TIMESTAMP and TIMESTAMP_NTZ inputs
    * (a real lakehouse mixes them). With the session TZ pinned UTC the
    * cast relabels the same micros value — a no-op on TimestampType, so
    * plans/hashes for already-normalized inputs are unchanged.
    */
  def epochUs(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Engine-portable 60-bit hash: the first 15 hex chars of md5, parsed
    * as an integer. Spark's `md5` and DuckDB's `md5` emit identical
    * lowercase hex for identical bytes (the same property behind
    * Text.stableSplit), and 15 hex digits stay under 2^60 — no signed
    * overflow on either engine. This is the determinism primitive for
    * operators whose "randomness" must replay in the oracle (hash walks,
    * fingerprints, fake media features): `xxhash64` has no DuckDB twin,
    * `md5Long` does ([[duckMd5Long]]). Cost note: md5 is a
    * cryptographic hash (~3-5× an xxhash64 call) — keep `xxhash64` for
    * pure-engine hot paths (LSH banding, shingle keys, salting) where
    * cross-engine replay is not required; these seeded-decision sites
    * are frontier-/token-scale, where determinism is worth the cycles.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL twin of [[md5Long]] over expression text `x`: hex parse
    * via a char-wise fold (DuckDB cannot cast hex strings to integers).
    * Seeding list_reduce with the first element is exactly the fold from
    * 0 (0*16 + d0 = d0).
    */
  def duckMd5Long(x: String): String =
    s"list_reduce(list_transform(regexp_extract_all(substr(md5($x), 1, 15)" +
      ", '.'), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))" +
      ", (a, b) -> a * 16 + b)"
}
