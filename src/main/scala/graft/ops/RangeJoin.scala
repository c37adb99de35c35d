package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs (a, b) with the same key and
  * `b.ts - a.ts ∈ (lowerUs, upperUs]`.
  *
  * A plain equi join on the key with a post-filter is correct but
  * quadratic per key group (at sf0.1 the events table has only 150 users —
  * 66M candidate pairs). Banding fixes the asymptotics: both sides are
  * bucketed into windows of width `upperUs − lowerUs`, the left side
  * duplicated into the (at most two) buckets its matches can fall in, and
  * the join key becomes (key, bucket) — candidates are only rows within
  * one band of each other, then the exact range predicate filters. This is
  * the standard distributed interval-join scheme: one shuffle on
  * (key, bucket), no per-key quadratic, skew bounded by band population.
  */
object RangeJoin {
  def banded(
      a: DataFrame,
      b: DataFrame,
      key: String,
      aTs: String,
      bTs: String,
      lowerUs: Long,
      upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, "empty range")
    val w = upperUs - lowerUs
    val aExp = a
      .withColumn("__bucket", explode(array_distinct(array(
        floor((graft.Det.epochUs(col(aTs)) + lowerUs) / w),
        floor((graft.Det.epochUs(col(aTs)) + upperUs) / w)))))
    val bExp = b
      .withColumn("__bkey", col(key))
      .withColumn("__bbucket", floor(graft.Det.epochUs(col(bTs)) / w))
      .drop(key)
    aExp.join(bExp,
        col(key) === col("__bkey") && col("__bucket") === col("__bbucket") &&
        graft.Det.epochUs(col(bTs)) > graft.Det.epochUs(col(aTs)) + lowerUs &&
        graft.Det.epochUs(col(bTs)) <= graft.Det.epochUs(col(aTs)) + upperUs)
      .drop("__bucket", "__bbucket", "__bkey")
  }
}
