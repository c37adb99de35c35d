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
    val path = tableLocation(s, table)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Warehouse location of a managed table — the LOWER-CASED identifier;
    * a mixed-case caller name would probe a path saveAsTable never
    * writes.
    */
  private def tableLocation(s: org.apache.spark.sql.SparkSession,
      table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)

  /** Everything a LATER PROCESS needs to reattach this table without
    * rebuilding, written as `_graft_table.props` inside the table
    * location (underscore prefix → invisible to parquet readers, like
    * _SUCCESS): schema DDL, bucketing spec, partition column. The
    * default in-memory catalog forgets table metadata at session end
    * while the warehouse files persist — before this descriptor existed,
    * a new process had to delete-and-rebuild derived state that was
    * perfectly good ([[reattach]] is the read side). At 100 TB this is
    * the difference between re-deriving edge tables / LSH indexes per
    * session and re-registering them in milliseconds.
    */
  private val DescriptorFile = "_graft_table.props"

  def writeDescriptor(s: org.apache.spark.sql.SparkSession, table: String,
      keys: Seq[String] = Seq.empty, buckets: Int = 0,
      sortCols: Seq[String] = Seq.empty, partitionCol: String = ""): Unit = {
    val p = new java.util.Properties()
    p.setProperty("schema", s.table(table).schema.toDDL)
    if (keys.nonEmpty) {
      p.setProperty("keys", keys.mkString(","))
      p.setProperty("buckets", buckets.toString)
      p.setProperty("sorts",
        (if (sortCols.nonEmpty) sortCols else keys).mkString(","))
    }
    if (partitionCol.nonEmpty) p.setProperty("partition", partitionCol)
    val loc = tableLocation(s, table)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(loc, DescriptorFile), true)
    try p.store(out, "graft reattachable table descriptor") finally out.close()
  }

  /** Re-register a table a PREVIOUS process built (descriptor present at
    * the warehouse location) as an external table over the existing
    * files — bucketing and sort metadata restored from the descriptor,
    * partitions recovered — instead of delete-and-rebuild. Returns true
    * iff the table is usable in this session's catalog afterwards.
    * Bucketed reattachment is exact: Spark encodes the bucket id in the
    * data file names, so the CLUSTERED BY spec re-applies to the same
    * layout and joins stay Exchange-free (gated in BucketingSpec).
    */
  /** The descriptor at `table`'s warehouse location, if one was written. */
  def readDescriptor(s: org.apache.spark.sql.SparkSession,
      table: String): Option[java.util.Properties] = {
    val loc = tableLocation(s, table)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    val descPath = new org.apache.hadoop.fs.Path(loc, DescriptorFile)
    if (!fs.exists(descPath)) None
    else {
      val p = new java.util.Properties()
      val in = fs.open(descPath)
      try p.load(in) finally in.close()
      Some(p)
    }
  }

  def reattach(s: org.apache.spark.sql.SparkSession, table: String): Boolean = {
    if (s.catalog.tableExists(table)) return true
    val loc = tableLocation(s, table)
    val p = readDescriptor(s, table).getOrElse(return false)
    def quoted(csv: String) = csv.split(',').map(c => s"`$c`").mkString(", ")
    val clustered = Option(p.getProperty("keys")).fold("") { ks =>
      s"CLUSTERED BY (${quoted(ks)}) SORTED BY (${quoted(p.getProperty("sorts"))}) " +
        s"INTO ${p.getProperty("buckets")} BUCKETS "
    }
    val partitioned = Option(p.getProperty("partition"))
      .fold("")(c => s"PARTITIONED BY (`$c`) ")
    s.sql(s"CREATE TABLE `$table` (${p.getProperty("schema")}) USING PARQUET " +
      partitioned + clustered + s"LOCATION '${loc.toString}'")
    if (p.getProperty("partition") != null)
      s.sql(s"MSCK REPAIR TABLE `$table`")
    true
  }

  /** Recover a stranded `<table>__vacuum` shadow (ADVICE r18): the
    * shadow-then-swap rewrite has a metadata-only window between
    * DROP TABLE and RENAME where the survivors exist only under the
    * shadow name — a crash there leaves no live table at `table`. If
    * `table` is genuinely gone (no catalog entry, no descriptor at its
    * location) but a COMPLETED shadow exists (its descriptor is the
    * last thing writeBucketedMulti writes, so descriptor-present means
    * data-complete), finish the interrupted swap: publish the shadow at
    * the table's own name/location and reattach. Returns true iff
    * `table` is usable afterwards. Any tombstones the interrupted
    * vacuum had not yet cleared re-apply as a no-op anti-join (the ids
    * are already physically gone) and the next vacuum clears them.
    */
  def recoverShadow(s: org.apache.spark.sql.SparkSession,
      table: String): Boolean = {
    val shadow = table + "__vacuum"
    if (readDescriptor(s, table).isDefined) return reattach(s, table)
    if (s.catalog.tableExists(shadow)) {
      // same-session window: the shadow is still a catalog (managed)
      // table — never DROP it (that purges its files); rename moves the
      // managed location to the table's own.
      dropStaleLocation(s, table)
      s.sql(s"ALTER TABLE `$shadow` RENAME TO `$table`")
      return true
    }
    if (readDescriptor(s, shadow).isEmpty) return false
    val from = tableLocation(s, shadow)
    val to = tableLocation(s, table)
    val fs = to.getFileSystem(s.sparkContext.hadoopConfiguration)
    val aside = new org.apache.hadoop.fs.Path(to.toString + "__displaced")
    def hasDesc(p: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(p, DescriptorFile))
    var displaced = false
    if (fs.exists(to)) {
      // a descriptor at the target means ANOTHER session finished this
      // same recovery between our top-of-function check and here — take
      // its result, touch nothing
      if (readDescriptor(s, table).isDefined) return reattach(s, table)
      // DISPLACE descriptor-less leftovers instead of deleting them: if
      // the TOCTOU window fires anyway (a concurrent recovery publishes
      // between the check above and this rename), the published table is
      // MOVED, not destroyed, and the restore branch below puts it back.
      // Data is only ever DELETED when the descriptor file is absent —
      // a published table always carries one.
      if (fs.exists(aside) && !hasDesc(aside)) fs.delete(aside, true)
      if (!fs.rename(to, aside)) return false // aside blocked: hands off
      displaced = true
    }
    if (!fs.rename(from, to)) {
      // lost a concurrent-recovery race: the shadow moved under us. If
      // we displaced the winner's just-published table, restore it
      // before reporting their result.
      if (displaced && hasDesc(aside) && !fs.exists(to))
        fs.rename(aside, to)
      return reattach(s, table)
    }
    if (displaced && !hasDesc(aside)) fs.delete(aside, true) // true junk
    reattach(s, table)
  }

  /** Compact a bucketed table grown by [[appendBucketedMulti]]: each
    * append lays down its own file set, so a year of daily intakes
    * reads ~365 small sorted runs per bucket. One rewrite (read through
    * the catalog, write a shadow table with the descriptor's own
    * bucket/sort spec, swap by rename) restores one sorted run per
    * bucket — O(table) paid once, amortized over every later read. The
    * standard maintenance pass any append-grown 100 TB layout schedules.
    */
  def compactBucketed(s: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    val p = readDescriptor(s, table).getOrElse(throw
      new IllegalArgumentException(s"no descriptor for '$table' — only " +
        "tables written by writeBucketedMulti/appendBucketedMulti compact"))
    require(p.getProperty("keys") != null, s"'$table' is not bucketed")
    val keys = p.getProperty("keys").split(',').toSeq
    val sorts = p.getProperty("sorts").split(',').toSeq
    val buckets = p.getProperty("buckets").toInt
    val tmp = table + "__compact"
    s.sql(s"DROP TABLE IF EXISTS `$tmp`")
    dropStaleLocation(s, tmp)
    // Land-mine dodged here: the planner ELIMINATES the rewrite's
    // repartition (the source table's bucketing already "provides" that
    // partitioning) while DisableUnnecessaryBucketedScan SEPARATELY
    // un-buckets the scan — leaving arbitrary size-packed file splits
    // feeding the writer, which then emits one file per (task, bucket):
    // MORE fragmentation, not less. Pinning the bucketed scan on makes
    // the task set = the bucket set, so the rewrite is a SHUFFLE-FREE
    // per-bucket merge emitting exactly one sorted file per bucket.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try writeBucketedMulti(s.table(table), tmp, keys, buckets, sorts)
    finally s.conf.set(key, prev)
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    dropStaleLocation(s, table) // external (reattached) drops keep files
    s.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  /** Build-once lifecycle for a bucketed table: reuse the session
    * catalog's copy, else reattach a previous process's build, else
    * build + record the descriptor. The canonical entry point for
    * derived bucketed state that must outlive the session.
    */
  def bucketedTable(s: org.apache.spark.sql.SparkSession, table: String,
      keys: Seq[String], buckets: Int, sortCols: Seq[String] = Seq.empty)(
      build: => DataFrame): DataFrame = {
    if (!s.catalog.tableExists(table) && !reattach(s, table)) {
      dropStaleLocation(s, table)
      writeBucketedMulti(build, table, keys, buckets, sortCols)
    }
    s.table(table)
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
    writeDescriptor(df.sparkSession, table, keys, buckets, sorts)
  }

  /** APPEND to an existing bucketed table (same keys/bucket count —
    * Spark enforces the spec matches): each append lays down its own
    * per-bucket files and readers merge them per bucket, so growing a
    * 100 TB derived table costs O(new data), never a rewrite. Sort
    * order within a bucket holds per-file; operators needing a global
    * per-bucket sort (the as-of merge) get a cheap merge of sorted runs
    * rather than a full sort.
    */
  def appendBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val sorts = if (sortCols.nonEmpty) sortCols else keys
    df.repartition(buckets,
        keys.map(org.apache.spark.sql.functions.col): _*)
      .write
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .mode("append")
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
    if (!s.catalog.tableExists(name) && !reattach(s, name)) {
      dropStaleLocation(s, name)
      build.withColumn("p_day",
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col(tsCol)))
        .write
        .format("parquet")
        .partitionBy("p_day")
        .mode("overwrite")
        .saveAsTable(name)
      writeDescriptor(s, name, partitionCol = "p_day")
    }
    s.table(name)
  }
}
