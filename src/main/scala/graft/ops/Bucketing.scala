package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers (SURVEY.md §6 / 100 TB story): persisting the
  * big fact tables bucketed+sorted on their join key makes every
  * subsequent equi join / aggregation on that key Exchange-free — the
  * shuffle is paid ONCE at write time instead of per query. On a cluster
  * this is the difference between re-shuffling 100 TB per join and
  * reading co-located buckets.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * Readers joining two tables bucketed on the same key with the same
    * bucket count get a SortMergeJoin with zero Exchange (asserted in
    * BucketingSpec).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
