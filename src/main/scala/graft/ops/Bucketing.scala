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

  /** Drop a stale managed-table location left by a PREVIOUS process. The
    * default in-memory catalog forgets table metadata when the session
    * ends, but the warehouse directory persists — a later process that
    * rebuilds the table would hit LOCATION_ALREADY_EXISTS. Call before
    * rebuilding a build-once table whose absence from the catalog means
    * "this process never built it".
    */
  def dropStaleLocation(s: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    // managed-table locations use the LOWER-CASED identifier — a
    // mixed-case caller name would probe a path saveAsTable never writes
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * Readers joining two tables bucketed on the same key with the same
    * bucket count get a SortMergeJoin with zero Exchange (asserted in
    * BucketingSpec).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit =
    writeBucketedMulti(df, table, Seq(key), buckets, sortCols)

  /** Multi-column bucketing key (e.g. LSH (band, band_sig)): equi joins on
    * exactly this key set between tables with the same bucket count are
    * Exchange-free.
    */
  def writeBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val sorts = if (sortCols.nonEmpty) sortCols else keys
    df.repartition(buckets,
        keys.map(org.apache.spark.sql.functions.col): _*)
      .write
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Write an event-style table hive-partitioned by the day of `tsCol`
    * (SURVEY.md §7 phase 6: "partition events by day"). Time-range
    * predicates then prune whole directories at planning time — at 100 TB
    * the difference between scanning 30 files and 30,000.
    */
  def writePartitionedByDay(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("p_day",
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col(tsCol)))
      .write
      .partitionBy("p_day")
      .mode("overwrite")
      .parquet(path)

  /** Build-once lifecycle for a day-partitioned MANAGED table (the same
    * per-(session, name) pattern as Graphs.supplyEdgeTable): `build` runs
    * only if the catalog doesn't know the table yet, adding a `p_day`
    * partition column derived from `tsCol`. Readers get static partition
    * pruning for `p_day` predicates and dynamic partition pruning for
    * joins on `p_day` against a filtered dim — both plan-asserted in
    * PlanShapeSpec. At 100 TB this IS the events table layout (SURVEY §7
    * phase 6): a day predicate prunes directories before any IO.
    */
  def dayPartitionedTable(s: org.apache.spark.sql.SparkSession, name: String,
      tsCol: String)(build: => DataFrame): DataFrame = {
    if (!s.catalog.tableExists(name)) {
      dropStaleLocation(s, name)
      build.withColumn("p_day",
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col(tsCol)))
        .write
        .format("parquet")
        .partitionBy("p_day")
        .mode("overwrite")
        .saveAsTable(name)
    }
    s.table(name)
  }
}
