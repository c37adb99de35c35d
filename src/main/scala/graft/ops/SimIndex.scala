package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted similarity indexes (ROADMAP item 6 / VERDICT r2 missing #3):
  * MinHash/LSH and IVF state is expensive to derive (shingling, signature
  * aggregation, k-means) and is query-invariant, so a real pipeline builds
  * it ONCE and stores it bucketed on the lookup key. Every subsequent
  * near-dedup / ANN query is then a pure bucket-local equi join — the
  * shuffle is paid at index-build time, never per query. At 100 TB this is
  * the difference between re-shuffling the corpus per dedup run and
  * reading co-located buckets.
  *
  * Tables written (managed parquet, bucketed):
  *   `<prefix>_bands`   (doc_id, band, band_sig)        bucketed (band, band_sig)
  *   `<prefix>_sigs`    (doc_id, sig)                   bucketed (doc_id)
  *   `<prefix>_centroids` (cid, centroid)               tiny, unbucketed
  *   `<prefix>_vectors` (vec_id, embedding, nrm, bucket) bucketed (bucket)
  *   `<prefix>_tombstones` (id)                         small, append-only
  *
  * DELETES (r17 — the s27b/s43b retraction discipline applied to the
  * persisted indexes): a document/vector delete (GDPR erasure, corpus
  * curation) appends the id to `_tombstones` and RETRACTS the additive
  * freshness signature — (count, sum-of-hashes mod 2^64) subtracts
  * exactly, so requireFresh against the SURVIVING base passes and the
  * pre-delete base goes loudly stale. Readers anti-join the tombstone
  * set (skipped entirely when no deletes ever happened), so a delete
  * costs O(batch) — never a rewrite of the 100 TB index; [[vacuumIndex]]
  * is the scheduled compaction that folds tombstones into the physical
  * tables, and a drift-triggered rebuild vacuums for free.
  *
  * SIGNATURE CONTRACT for the vector indexes (IVF / IVF-PQ): the
  * recorded signature covers the INDEXABLE (norm > 0) subset of the
  * ingested rows — zero-norm vectors have no direction, are never
  * stored, and therefore never count (write, append, delete, and the
  * drift rebuild all agree; the vector readers filter `verifyAgainst`
  * the same way, so callers pass the raw base). Text indexes (LSH /
  * shingle) sign the full ingested row set.
  *
  * ROW-UNIQUENESS CONTRACT (r18): an indexed base carries ONE row per
  * id — enforced loudly at write/append time ([[requireUniqueIds]]).
  * The delete lifecycle depends on it: a tombstone hides EVERY copy of
  * an id while the additive signature retracts per ROW IMAGE (deletes
  * `distinct()` their batch so an at-least-once CDC replay retracts
  * once) — a base with duplicate identical rows could therefore never
  * retract exactly, leaving the index permanently stale against its
  * survivors. One O(batch) aggregate per write/append buys the exact
  * retraction guarantee.
  */
object SimIndex {

  /** The indexable subset of a vector base: rows whose embedding has a
    * direction. THE signature domain for IVF/IVF-PQ indexes (see the
    * contract above) — every write/append/delete/verify path routes
    * through this one definition so they can never disagree.
    */
  private def indexableVecs(vecs: DataFrame): DataFrame = {
    graft.functions.VecFunctions.ensureRegistered(vecs.sparkSession)
    vecs.filter(Similarity.norm(col("embedding")) > 0.0)
  }

  /** Order-insensitive content signature of an indexed base table:
    * (row count, wrapping SUM of per-row xxhash64 over every column).
    * Sum, not bit_xor: xor self-cancels on duplicate-row PAIRS, so a
    * mutated base whose changes happen to come in duplicated rows (e.g.
    * {r1,r1,r2} vs {r2,r3,r3}) would read as fresh under xor; a mod-2^64
    * sum only collides under deliberate construction. A plain
    * `sum(hash)` would overflow BIGINT under ANSI mode, so the sum runs
    * in decimal(38,0) (room for ~10^19 rows of |hash| ≤ 2^63) and wraps
    * to the signature long mod 2^64 on the driver. Recorded at build
    * time into `<prefix>_meta`; re-derived from the live base table by
    * [[requireFresh]]. One narrow scan of the base table buys failing
    * FAST on silent staleness (index built from different data than the
    * caller now holds) instead of silently serving wrong candidates.
    */
  def signature(df: DataFrame): (Long, Long) = {
    val h = xxhash64(df.columns.map(col).toSeq: _*)
    val row = df.agg(count(lit(1)),
      coalesce(sum(h.cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")))
      .head()
    val sig = row.getDecimal(1).toBigInteger.longValue() // wraps mod 2^64
    (row.getLong(0), sig)
  }

  /** Record the build signature plus the BUILD PARAMETERS (append-path
    * callers re-derive shingles/signatures with them — parameter drift
    * between build and append would silently corrupt the index).
    * `precomputed` carries an already-combined (count, sig) for the
    * additive append bump.
    */
  private def writeSignature(prefix: String, base: DataFrame,
      params: Seq[(String, Long)] = Nil,
      precomputed: Option[(Long, Long)] = None): Unit = {
    val spark = base.sparkSession
    val (n, sig) = precomputed.getOrElse(signature(base))
    val cols = (Seq("n_rows" -> n, "content_sig" -> sig) ++ params)
      .map { case (k, v) => lit(v).as(k) }
    Bucketing.dropStaleLocation(spark, s"${prefix}_meta")
    spark.range(1).select(cols: _*)
      .write.mode("overwrite").saveAsTable(s"${prefix}_meta")
    Bucketing.writeDescriptor(spark, s"${prefix}_meta")
  }

  /** Every table an index build may persist under `prefix`. */
  private val Suffixes = Seq("_meta", "_bands", "_sigs", "_centroids",
    "_vectors", "_pq_codebooks", "_pq_codes", "_shingles", "_docs",
    "_applied", "_res_hist", "_tombstones")

  /** Loud guard for the row-uniqueness contract (see the object doc):
    * duplicate ids in an indexed base would make delete retraction
    * inexact forever (the tombstone hides all copies; the signature
    * subtracts one) and, for the LSH flavor, silently disagree with the
    * signature table (minHashSignatures collapses ids). One aggregate
    * over the batch, paid on the rare write/append path.
    */
  private def requireUniqueIds(df: DataFrame, idCol: String,
      prefix: String): Unit = {
    val dup = df.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).head(1)
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"index '$prefix': base has duplicate $idCol=${dup.head.get(0)} — " +
        "indexed bases must carry ONE row per id (the delete-retraction " +
        "contract: a tombstone hides every copy while the additive " +
        "signature subtracts per row, so duplicates can never retract " +
        "exactly)")
  }

  /** The live tombstone set at `prefix` — None when no delete ever
    * happened (the common case: readers then skip the anti-join and the
    * plan is byte-identical to the pre-delete one).
    */
  private def tombstones(spark: SparkSession, prefix: String)
      : Option[DataFrame] = {
    val t = s"${prefix}_tombstones"
    Bucketing.reattach(spark, t)
    if (spark.catalog.tableExists(t)) Some(spark.table(t)) else None
  }

  /** Tombstone sets START delete-batch-sized but ACCUMULATE across every
    * delete until a vacuum folds them in — on a delete-heavy 100 TB index
    * an unconditional broadcast would eventually exceed driver/executor
    * memory. Broadcast only while the set is provably small.
    */
  private val TombstoneBroadcastRows = 4L * 1000 * 1000 // ~32 MB of ids

  /** Tombstone row count memoized per (table, file set): the broadcast
    * decision needs the count, but readers construct the anti-join plan
    * on EVERY index read — an eager count() there was one extra Spark
    * job per read even for a tiny unchanged set (ADVICE r18). The file
    * set changes exactly when the table does (appendTombstones adds
    * files, dropTombstones/vacuum removes the table), so it keys the
    * cache without scanning content, and listing it is driver-side
    * metadata — no job. Bounded: cleared wholesale if it ever grows
    * past a few hundred (prefix, delete-epoch) keys.
    */
  private val tombstoneCounts =
    scala.collection.concurrent.TrieMap.empty[(String, Seq[String]), Long]

  private def tombstoneCount(name: String, t: DataFrame): Long = {
    if (tombstoneCounts.size > 512) tombstoneCounts.clear()
    tombstoneCounts.getOrElseUpdate(
      (name, t.inputFiles.sorted.toSeq), t.count())
  }

  /** Drop tombstoned rows from `df` (by `idCol`); identity when no
    * tombstones exist. Small tombstone sets (the common, recently-
    * vacuumed case) broadcast so the anti-join never reshuffles the
    * index scan; past [[TombstoneBroadcastRows]] the anti-join falls
    * back to a shuffled plan — slower, but it completes, and the real
    * remedy (vacuumIndex) is an operator the pipeline already schedules.
    * The count probe is memoized per table version ([[tombstoneCount]]),
    * so steady-state reads add zero extra jobs.
    */
  private def antiTombstones(spark: SparkSession, prefix: String,
      df: DataFrame, idCol: String): DataFrame =
    tombstones(spark, prefix).fold(df) { t =>
      val name = s"${prefix}_tombstones"
      val ts = t.select(col("id").as(idCol))
      val probe =
        if (tombstoneCount(name, t) <= TombstoneBroadcastRows) broadcast(ts)
        else ts
      df.join(probe, Seq(idCol), "left_anti")
    }

  /** Append newly-deleted ids to the tombstone table (created on first
    * delete).
    */
  private def appendTombstones(spark: SparkSession, prefix: String,
      ids: DataFrame): Unit = {
    val t = s"${prefix}_tombstones"
    val fresh = !spark.catalog.tableExists(t)
    if (fresh) Bucketing.dropStaleLocation(spark, t)
    ids.select(col(ids.columns.head).cast("long").as("id"))
      .write.mode("append").saveAsTable(t)
    if (fresh) Bucketing.writeDescriptor(spark, t)
  }

  /** Clear the tombstone set — every full (re)build path starts from
    * zero deletes (the rebuild reads only surviving rows), and vacuum
    * ends here after folding the tombstones into the physical tables.
    */
  private def dropTombstones(spark: SparkSession, prefix: String): Unit = {
    val t = s"${prefix}_tombstones"
    Bucketing.reattach(spark, t)
    if (spark.catalog.tableExists(t)) spark.sql(s"DROP TABLE `$t`")
    Bucketing.dropStaleLocation(spark, t)
  }

  /** Loud guard for the append paths: re-ingesting a tombstoned id
    * would be silently invisible to every reader until a vacuum — fail
    * fast instead. (Resurrection = vacuum first, then append.)
    */
  private def requireNotTombstoned(spark: SparkSession, prefix: String,
      ids: DataFrame, idCol: String): Unit =
    tombstones(spark, prefix).foreach { t =>
      val hit = ids.join(broadcast(t.select(col("id").as(idCol))),
        Seq(idCol), "left_semi").limit(1).count()
      if (hit > 0) throw new IllegalStateException(
        s"append to index '$prefix' includes tombstoned ids — run " +
          "vacuumIndex (or a drift rebuild) before re-ingesting a " +
          "deleted id")
    }

  /** Retract `(dn, dsig)` from the recorded signature, preserving every
    * recorded build parameter: the exact inverse of the append bump
    * (count subtracts, the mod-2^64 hash sum subtracts).
    */
  private def retractSignature(spark: SparkSession, prefix: String,
      dn: Long, dsig: Long): Unit = {
    val meta = spark.table(s"${prefix}_meta")
    val schema = meta.columns
    val r = meta.head()
    val params = schema.drop(2).toSeq.map(c =>
      c -> r.getLong(schema.indexOf(c)))
    writeSignature(prefix, spark.range(0).toDF(), params,
      precomputed = Some((r.getLong(0) - dn, r.getLong(1) - dsig)))
  }

  /** Reattach every piece of the index a PREVIOUS process left in the
    * warehouse (no-op for pieces this index flavor never wrote, and for
    * tables already in the catalog). Readers and the freshness check
    * route through here, so a new session reuses a persisted index —
    * signature-checked via requireFresh — instead of rebuilding it.
    */
  private def reattachAll(spark: SparkSession, prefix: String): Unit =
    Suffixes.foreach { sfx =>
      val t = prefix + sfx
      // a table neither in the catalog nor reattachable may be a vacuum
      // swap interrupted in its metadata-only window — finish the swap
      // (no-op when no shadow exists, i.e. the suffix was never written)
      if (!Bucketing.reattach(spark, t)) Bucketing.recoverShadow(spark, t)
    }

  /** Make THIS session observe appends/deletes ANOTHER session applied
    * to the index at `prefix` — a writer process, a foreachBatch micro-
    * batch clone (each micro-batch runs in a cloned session, so even a
    * single-JVM streaming maintainer hits this). Spark caches a table's
    * data-file listing per session: correct and fast single-session,
    * but a long-lived reader session over a writer-maintained index
    * would otherwise read the file set as of its FIRST listing forever
    * (the SQL-surface twin is REFRESH TABLE). Drops each suffix
    * table's cached relation; the next read re-lists once. Call it at
    * the top of a maintenance fold or before a read that must observe
    * cross-session appends — NOT on every single-session read, where
    * the listing cache is exactly what you want at 100 TB.
    */
  def refreshIndex(spark: SparkSession, prefix: String): Unit =
    Suffixes.foreach { sfx =>
      val t = prefix + sfx
      if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
    }

  /** True iff the index at `prefix` recorded a build signature and it
    * matches `base`'s CURRENT content (same column set as at build).
    */
  def isFresh(spark: SparkSession, prefix: String, base: DataFrame): Boolean = {
    reattachAll(spark, prefix)
    spark.catalog.tableExists(s"${prefix}_meta") && {
      val r = spark.table(s"${prefix}_meta").head()
      (r.getLong(0), r.getLong(1)) == signature(base)
    }
  }

  /** [[isFresh]] AND the index's data tables are actually present —
    * build-once lifecycles must gate on THIS, not on isFresh alone: a
    * meta table whose data tables were dropped (or only partially
    * reattached) would otherwise skip the rebuild and crash at read
    * time with TABLE_NOT_FOUND instead of rebuilding.
    */
  def isUsable(spark: SparkSession, prefix: String, base: DataFrame,
      dataSuffixes: Seq[String]): Boolean =
    isFresh(spark, prefix, base) &&
      dataSuffixes.forall(sfx => spark.catalog.tableExists(prefix + sfx))

  /** Fail fast (with a rebuild hint) when the persisted index no longer
    * matches the base table the caller is querying against. Every reader
    * below takes an optional `verifyAgainst` that routes through here —
    * opt-in because the check costs one scan of the base table.
    */
  def requireFresh(spark: SparkSession, prefix: String,
      base: DataFrame): Unit =
    if (!isFresh(spark, prefix, base)) throw new IllegalStateException(
      s"similarity index '$prefix' is STALE: its recorded build signature " +
        s"(${prefix}_meta) does not match the current base table. " +
        s"Rebuild with the matching SimIndex.write*Index call.")

  /** Build + persist the MinHash/LSH index over `documents`-shaped input:
    * band table bucketed on the candidate-join key (band, band_sig) and
    * the signature table bucketed on doc_id (for the estimate-prune join).
    */
  def writeLshIndex(docs: DataFrame, prefix: String, numHashes: Int,
      bands: Int, buckets: Int, shingleLen: Int = 3): Unit = {
    requireUniqueIds(docs, "doc_id", prefix)
    val sh = Text.shingles(docs, shingleLen)
    val sigs = Similarity.minHashSignatures(sh, numHashes).cache()
    Bucketing.writeBucketedMulti(
      Similarity.minHashBands(sigs, numHashes, bands),
      s"${prefix}_bands", Seq("band", "band_sig"), buckets,
      sortCols = Seq("band", "band_sig", "doc_id"))
    Bucketing.writeBucketed(sigs, s"${prefix}_sigs", "doc_id", buckets)
    sigs.unpersist()
    dropTombstones(docs.sparkSession, prefix)
    writeSignature(prefix, docs, params = Seq(
      "num_hashes" -> numHashes.toLong, "bands" -> bands.toLong,
      "shingle_len" -> shingleLen.toLong, "buckets" -> buckets.toLong))
  }

  /** INCREMENTAL LSH maintenance: index only the NEW documents and
    * append their band/signature rows to the persisted tables — at
    * 100 TB the corpus grows daily and a from-scratch rebuild per
    * intake is the difference between minutes and a day. Build
    * parameters come from the meta table (recorded at build time), so
    * an append can never use a different shingle length or band count
    * than the original build. The freshness signature is bumped
    * ADDITIVELY: (count, sum-of-hashes mod 2^64) is commutative over
    * disjoint row sets, so meta' = meta + signature(newDocs) equals
    * signature(old base ∪ newDocs) exactly — requireFresh against the
    * full corpus still decides validity, and appending a row that was
    * already indexed makes the signature diverge from the deduped base
    * (a loud staleness error, not silent double-counting).
    */
  def appendLshIndex(newDocs: DataFrame, prefix: String): Unit = {
    val spark = newDocs.sparkSession
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_meta"),
      s"no LSH index at '$prefix' to append to — build with writeLshIndex")
    val metaDf = spark.table(s"${prefix}_meta")
    val schema = metaDf.columns
    require(schema.contains("num_hashes"),
      s"index '$prefix' predates recorded build params — rebuild once " +
        "with writeLshIndex to enable appends")
    val meta = metaDf.head()
    def p(name: String): Int = meta.getLong(schema.indexOf(name)).toInt
    val (numHashes, bands, shingleLen, buckets) =
      (p("num_hashes"), p("bands"), p("shingle_len"), p("buckets"))
    requireUniqueIds(newDocs, "doc_id", prefix)
    requireNotTombstoned(spark, prefix,
      newDocs.select("doc_id").distinct(), "doc_id")
    val sh = Text.shingles(newDocs, shingleLen)
    val sigs = Similarity.minHashSignatures(sh, numHashes).cache()
    Bucketing.appendBucketedMulti(
      Similarity.minHashBands(sigs, numHashes, bands),
      s"${prefix}_bands", Seq("band", "band_sig"), buckets,
      sortCols = Seq("band", "band_sig", "doc_id"))
    Bucketing.appendBucketedMulti(sigs, s"${prefix}_sigs", Seq("doc_id"),
      buckets)
    sigs.unpersist()
    val (dn, dsig) = signature(newDocs)
    writeSignature(prefix, newDocs, params = Seq(
      "num_hashes" -> numHashes.toLong, "bands" -> bands.toLong,
      "shingle_len" -> shingleLen.toLong, "buckets" -> buckets.toLong),
      precomputed = Some((meta.getLong(0) + dn, meta.getLong(1) + dsig)))
  }

  /** Delete documents from the persisted LSH index (r17 retraction):
    * tombstone the doc_ids and RETRACT their contribution from the
    * additive freshness signature. `delDocs` must carry the FULL rows
    * as originally ingested (a CDC delete carries the row image) — the
    * signature is content-based, so only the true deleted rows subtract
    * exactly. Replay-idempotent: ids already tombstoned (and ids the
    * index never held) contribute nothing on a second application.
    * O(|batch|): one semi/anti membership probe + a tombstone append —
    * never a rewrite of the bucketed tables; [[vacuumIndex]] compacts.
    */
  def deleteFromLshIndex(delDocs: DataFrame, prefix: String): Unit = {
    val spark = delDocs.sparkSession
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_meta"),
      s"no LSH index at '$prefix' to delete from")
    // newly-deleted = present in the index, not already tombstoned
    val ids = delDocs.select("doc_id").distinct()
      .join(spark.table(s"${prefix}_sigs").select("doc_id"), Seq("doc_id"),
        "left_semi")
    val newIds = antiTombstones(spark, prefix, ids, "doc_id")
      .transform(Checkpoints.cut) // read 3×: signature, append, and by
                                  // the tombstone probe it invalidates
    // distinct() on the row images: a CDC batch that repeats the same
    // delete row (at-least-once upstream) must retract once, not twice
    val (dn, dsig) = signature(
      delDocs.distinct().join(newIds, Seq("doc_id"), "left_semi"))
    if (dn > 0) {
      appendTombstones(spark, prefix, newIds)
      retractSignature(spark, prefix, dn, dsig)
    }
  }

  /** LSH candidate pairs from the persisted band table: a self equi join
    * on the bucketing key — plans with zero Exchange (asserted in
    * SimIndexSpec), so candidate generation is bucket-local reads.
    * `verifyAgainst` (the live base table) opts into the staleness check.
    * `maxBucket > 0` bounds hot-bucket expansion with the star topology
    * (see [[Similarity.bandedCandidates]]) — the connectivity-consumer
    * mode; 0 keeps the exact pair-set contract.
    */
  def lshCandidatesFromIndex(spark: SparkSession, prefix: String,
      verifyAgainst: Option[DataFrame] = None,
      maxBucket: Int = 0): DataFrame = {
    reattachAll(spark, prefix)
    verifyAgainst.foreach(requireFresh(spark, prefix, _))
    Similarity.bandedCandidates(
      antiTombstones(spark, prefix, spark.table(s"${prefix}_bands"),
        "doc_id"),
      maxBucket)
  }

  /** Build + persist the IVF index: seeded k-means centroids (tiny) plus
    * the bucket-resident vectors (id, embedding, precomputed norm,
    * bucket), bucketed on `bucket` so within-bucket rerank is co-located.
    */
  def writeIvfIndex(vecs: DataFrame, prefix: String, k: Int, nprobe: Int,
      buckets: Int): Unit = {
    // Library entry point: register vec_dot here rather than relying on
    // every caller having done it (Similarity.dot/norm resolve it).
    graft.functions.VecFunctions.ensureRegistered(vecs.sparkSession)
    // zero-norm vectors have no direction: unassignable (ivfAssign's
    // cosine divides by the norm — ANSI-throws) and unsearchable — keep
    // them out of the INDEXED set; the freshness signature covers this
    // same indexable subset (the r17 contract — a drift rebuild from
    // the stored vectors then re-records an identical signature, where
    // a full-input signature would silently drop the historical
    // zero-norm rows' contribution and read stale forever).
    val indexable = indexableVecs(vecs)
    requireUniqueIds(indexable, "vec_id", prefix)
    val centroids = Similarity.kmeansCentroids(indexable, k, maxIter = 10)
    Bucketing.dropStaleLocation(vecs.sparkSession, s"${prefix}_centroids")
    centroids.write.mode("overwrite").saveAsTable(s"${prefix}_centroids")
    Bucketing.writeDescriptor(vecs.sparkSession, s"${prefix}_centroids")
    val assigned = Similarity.ivfAssign(indexable, centroids, nprobe)
    val bucketVecs = indexable.join(assigned, "vec_id")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"), col("bucket"))
    Bucketing.writeBucketed(bucketVecs, s"${prefix}_vectors", "bucket",
      buckets, sortCols = Seq("bucket", "vec_id"))
    // Reference residual-distance histogram (drift baseline): how far the
    // BUILD corpus sits from its own centroids. Intake batches compare
    // their histogram against this via PSI — the drift observable that
    // triggers a codebook rebuild (appendIvfIndexWithRefresh).
    val resHist = residualHistogram(indexable, centroids)
    Bucketing.dropStaleLocation(vecs.sparkSession, s"${prefix}_res_hist")
    resHist.write.mode("overwrite").saveAsTable(s"${prefix}_res_hist")
    Bucketing.writeDescriptor(vecs.sparkSession, s"${prefix}_res_hist")
    // a full (re)build starts with an empty tombstone set — writeIvfIndex
    // is also the drift-rebuild swap target, which folds deletes in
    dropTombstones(vecs.sparkSession, prefix)
    writeSignature(prefix, indexable, params = Seq(
      "k" -> k.toLong, "nprobe" -> nprobe.toLong,
      "buckets" -> buckets.toLong))
  }

  /** Drift-monitoring buckets over the residual cosine DISTANCE
    * `1 − cos(v, nearest centroid)` ∈ [0, 2]: 20 equal buckets on [0, 1]
    * plus bucket 20 for the ≥ 1 tail (anti-aligned residuals). Fixed and
    * bounded, so the histogram is a ≤ 21-row aggregate no matter the
    * corpus size — the s35/s37 bounded-dimension discipline.
    */
  private val ResBuckets = 20

  private def residualHistogram(vecs0: DataFrame,
      centroids: DataFrame): DataFrame = {
    graft.functions.VecFunctions.ensureRegistered(vecs0.sparkSession)
    // zero-norm vectors have no direction, no coarse assignment, and no
    // residual distance — EXCLUDE them up front (the PQ path's norm > 0
    // rule, and BEFORE ivfAssign, whose cosine divides by the norm and
    // throws under ANSI). Without the filter an all-zero batch would
    // either crash or read as maximal drift in the overflow bucket
    // instead of no evidence (r16 review fix — the residualPsi
    // empty-histogram guard relies on this).
    val vecs = vecs0.filter(Similarity.norm(col("embedding")) > 0.0)
    val near = Similarity.ivfAssign(vecs, centroids, nprobe = 1)
    val c = centroids.select(col("cid").as("bucket"),
      transform(col("centroid"), _.cast("float")).as("cvec"))
    vecs.join(near, "vec_id").join(broadcast(c), "bucket")
      .select((lit(1.0) - Similarity.dot(col("embedding"), col("cvec")) /
        (Similarity.norm(col("embedding")) * Similarity.norm(col("cvec"))))
        .as("res"))
      .select(least(floor(col("res") * ResBuckets).cast("long"),
        lit(ResBuckets.toLong)).as("rbucket"))
      .groupBy("rbucket").agg(count(lit(1)).as("n"))
  }

  /** PSI between the recorded reference residual histogram and a live
    * batch's. Floor-epsilon on the PROPORTIONS (p,q = max(share, 1e-4)),
    * not add-one on the counts: an intake batch is SMALL relative to the
    * 21-bucket domain, and add-one smoothing would manufacture PSI out
    * of the empty buckets whenever the two totals differ (a 20-row
    * in-distribution batch vs a 120-row reference would "drift" by the
    * smoothing alone). With the floor, buckets empty on BOTH sides
    * contribute exactly 0, and genuine drift — live mass in buckets the
    * reference never occupied — contributes ~ln(1/ε) per unit of mass,
    * dominating as it should. Both inputs are ≤ 21 rows; the scalar
    * comes back to the driver as the rebuild decision (bounded, like
    * the probed-bucket fetch in ivfPqSearch).
    */
  private def residualPsi(ref: DataFrame, live: DataFrame): Double = {
    val spark = ref.sparkSession
    // An EMPTY live histogram (empty intake micro-batch, or a batch of
    // all zero-norm vectors whose null residual rows the histogram's
    // domain join drops) is NO EVIDENCE, not drift: with n_live = 0
    // every live share would floor to eps and the PSI would read
    // ≈ ln(1/eps) — an empty foreachBatch invocation spuriously firing
    // a full k-means rebuild. Short-circuit to "no drift".
    val nLive = live.agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
    if (nLive == 0L) return 0.0
    val domain = spark.range(0, ResBuckets + 1)
      .select(col("id").as("rbucket"))
    val eps = 1e-4
    val counts = domain
      .join(ref.withColumnRenamed("n", "c_ref"), Seq("rbucket"), "left")
      .join(live.withColumnRenamed("n", "c_live"), Seq("rbucket"), "left")
      .select(coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_live"), lit(0L)).as("c_live"))
    val r = counts
      .withColumn("n_ref", sum("c_ref").over())
      .withColumn("n_live", sum("c_live").over())
      .withColumn("p", greatest(col("c_ref").cast("double") / col("n_ref"),
        lit(eps)))
      .withColumn("q", greatest(col("c_live").cast("double") / col("n_live"),
        lit(eps)))
      .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
      .head()
    r.getDouble(0)
  }

  /** Drift-triggered IVF maintenance (r15 — closes the "s19/s23 append,
    * s37 detects, nothing composes them" gap): one micro-batch of vector
    * intake that REBUILDS the coarse codebook when the batch's residual
    * distances no longer resemble the build corpus's.
    *
    * Decision: PSI(reference residual histogram recorded at build, this
    * batch's) > `psiThreshold` (0.25 = the classic "significant shift"
    * PSI rule of thumb; both histograms are bounded 21-bucket aggregates,
    * the comparison is one scalar). Below threshold → the standard
    * [[appendIvfIndex]] insert (centroids stay, one bucketed append). At
    * or above → the full corpus (persisted vectors ∪ batch) is
    * MATERIALIZED first (localCheckpoint — the rebuild overwrites the
    * very tables it reads), then [[writeIvfIndex]] retrains centroids,
    * re-assigns everything, rewrites the bucketed vectors and the NEW
    * reference histogram, and bumps the signature — the reader-facing
    * tables swap wholesale, the s21 SCD2 overwrite discipline (a
    * transactional table format makes the swap atomic at deployment).
    * Returns true iff the rebuild fired.
    *
    * At 100 TB the rebuild is the expensive rare path by construction:
    * the PSI gate fires on distribution change, not on volume, and the
    * k-means retrain is the same bounded-iteration job the original
    * build paid. SimIndexSpec pins: in-distribution batches append
    * (gate false, centroids untouched), a deterministically drifted
    * batch fires the gate, the refreshed index equals the one-shot
    * rebuild on the post-drift corpus, and recall@10 on drifted queries
    * RECOVERS vs the stale-append path.
    */
  def appendIvfIndexWithRefresh(newVecs: DataFrame, prefix: String,
      psiThreshold: Double = 0.25): Boolean = {
    val spark = newVecs.sparkSession
    graft.functions.VecFunctions.ensureRegistered(spark)
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_res_hist"),
      s"index '$prefix' predates drift monitoring — rebuild once with " +
        "writeIvfIndex to record the reference residual histogram")
    val meta = spark.table(s"${prefix}_meta")
    val schema = meta.columns
    val m = meta.head()
    def p(name: String): Int = m.getLong(schema.indexOf(name)).toInt
    val live = residualHistogram(newVecs,
      spark.table(s"${prefix}_centroids"))
    val psi = residualPsi(spark.table(s"${prefix}_res_hist"), live)
    if (psi < psiThreshold) {
      appendIvfIndex(newVecs, prefix)
      false
    } else {
      // `_vectors` holds one row per PROBED bucket — nprobe copies per
      // vector. The rebuild corpus must be the TRUE corpus (one row per
      // vec_id): without the dedup an nprobe > 1 index would retrain
      // k-means on a weight-skewed multiset, re-assign over duplicated
      // rows (losing probe diversity, multiplying rows up to nprobe²),
      // and record a signature over the duplicated corpus that silently
      // breaks isFresh against the real base. Tombstoned vectors stay
      // OUT of the rebuild corpus (their signature was retracted at
      // delete time) — the rebuild doubles as a vacuum.
      val full = antiTombstones(spark, prefix,
          spark.table(s"${prefix}_vectors")
            .select(col("vec_id"), col("embedding"))
            .dropDuplicates("vec_id"), "vec_id")
        .unionByName(newVecs.select(col("vec_id"), col("embedding")))
        .transform(Checkpoints.cut) // materialize BEFORE the overwrite
      writeIvfIndex(full, prefix, p("k"), p("nprobe"), p("buckets"))
      true
    }
  }

  /** S42/S44 bootstrap-or-refresh: the per-batch entry point a vector
    * intake stream's foreachBatch calls. The FIRST batch builds the
    * index with the stream's parameters (the s19 bootstrap discipline);
    * every later batch runs the drift-gated append
    * ([[appendIvfIndexWithRefresh]] — PSI below threshold appends to
    * the frozen centroids, at/above retrains wholesale). Returns true
    * iff a drift rebuild fired (the bootstrap build returns false — it
    * is the reference, not a drift event).
    */
  def ivfIntakeBatch(newVecs: DataFrame, prefix: String, k: Int,
      nprobe: Int, buckets: Int, psiThreshold: Double = 0.25): Boolean = {
    val spark = newVecs.sparkSession
    reattachAll(spark, prefix)
    if (!spark.catalog.tableExists(s"${prefix}_meta")) {
      writeIvfIndex(newVecs, prefix, k, nprobe, buckets)
      false
    } else appendIvfIndexWithRefresh(newVecs, prefix, psiThreshold)
  }

  /** S19 — one micro-batch of corpus intake into the LSH index, guarded
    * by an applied-batch ledger: [[appendLshIndex]] is additive, so a
    * REPLAYED foreachBatch invocation (restart mid-epoch) must be
    * skipped, not re-applied. Ledger check + append + ledger record;
    * the crash window between append and record is the classic
    * two-phase gap — on replay after exactly that crash the signature
    * check goes loudly stale (double-appended rows diverge from the
    * corpus) rather than silently double-counting; a transactional
    * table format closes the gap at deployment.
    */
  def appendLshIndexBatch(batch: DataFrame, prefix: String, batchId: Long,
      numHashes: Int, bands: Int, buckets: Int,
      shingleLen: Int = 3): Unit = {
    val spark = batch.sparkSession
    val ledger = s"${prefix}_applied"
    Bucketing.reattach(spark, ledger)
    val seen = spark.catalog.tableExists(ledger) &&
      spark.table(ledger).filter(col("batch_id") === batchId)
        .head(1).nonEmpty
    if (!seen) {
      reattachAll(spark, prefix)
      if (spark.catalog.tableExists(s"${prefix}_meta"))
        appendLshIndex(batch, prefix)
      else // first intake bootstraps the index with the stream's params
        writeLshIndex(batch, prefix, numHashes, bands, buckets, shingleLen)
      val fresh = !spark.catalog.tableExists(ledger)
      spark.range(1).select(lit(batchId).as("batch_id"))
        .write.mode("append").saveAsTable(ledger)
      if (fresh) Bucketing.writeDescriptor(spark, ledger)
    }
  }

  /** Incremental IVF maintenance: assign the NEW vectors to the
    * EXISTING coarse centroids (the standard IVF insert — centroids are
    * trained once; drift is a periodic re-train decision, not a
    * per-intake cost) and append them to the bucketed vector table.
    * Same additive signature bump as [[appendLshIndex]].
    */
  def appendIvfIndex(newVecs: DataFrame, prefix: String): Unit = {
    val spark = newVecs.sparkSession
    graft.functions.VecFunctions.ensureRegistered(spark)
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_meta"),
      s"no IVF index at '$prefix' to append to — build with writeIvfIndex")
    val metaDf = spark.table(s"${prefix}_meta")
    val schema = metaDf.columns
    require(schema.contains("nprobe"),
      s"index '$prefix' predates recorded build params — rebuild once " +
        "with writeIvfIndex to enable appends")
    val meta = metaDf.head()
    def p(name: String): Int = meta.getLong(schema.indexOf(name)).toInt
    // zero-norm vectors stay out of the indexed set (writeIvfIndex's
    // rule); the additive signature bump below covers the SAME
    // indexable subset (the r17 contract)
    val indexable = indexableVecs(newVecs)
    requireUniqueIds(indexable, "vec_id", prefix)
    requireNotTombstoned(spark, prefix,
      indexable.select("vec_id").distinct(), "vec_id")
    val assigned = Similarity.ivfAssign(indexable,
      spark.table(s"${prefix}_centroids"), p("nprobe"))
    val bucketVecs = indexable.join(assigned, "vec_id")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"), col("bucket"))
    Bucketing.appendBucketedMulti(bucketVecs, s"${prefix}_vectors",
      Seq("bucket"), p("buckets"), sortCols = Seq("bucket", "vec_id"))
    val (dn, dsig) = signature(indexable)
    writeSignature(prefix, newVecs, params = Seq(
      "k" -> p("k").toLong, "nprobe" -> p("nprobe").toLong,
      "buckets" -> p("buckets").toLong),
      precomputed = Some((meta.getLong(0) + dn, meta.getLong(1) + dsig)))
  }

  /** Delete vectors from the persisted IVF index: [[deleteFromLshIndex]]
    * for the vector side — tombstone + signature retraction over the
    * INDEXABLE (norm > 0) subset of the deleted rows, matching the
    * vector-index signature contract (zero-norm rows never counted, so
    * deleting them must not retract). Replay-idempotent; O(|batch|).
    */
  def deleteFromIvfIndex(delVecs: DataFrame, prefix: String): Unit = {
    val spark = delVecs.sparkSession
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_meta"),
      s"no IVF index at '$prefix' to delete from")
    val del = indexableVecs(delVecs).distinct() // once per row image
    val ids = del.select("vec_id").distinct()
      .join(spark.table(s"${prefix}_vectors").select("vec_id"),
        Seq("vec_id"), "left_semi")
    val newIds = antiTombstones(spark, prefix, ids, "vec_id")
      .transform(Checkpoints.cut)
    val (dn, dsig) = signature(del.join(newIds, Seq("vec_id"), "left_semi"))
    if (dn > 0) {
      appendTombstones(spark, prefix, newIds)
      retractSignature(spark, prefix, dn, dsig)
    }
  }

  /** Drop EVERY table of the index at `prefix` — catalog entries, stale
    * external locations, and any stranded vacuum shadows — the clean
    * slate a rebuild-from-scratch (or a fold that BUILDS its own index,
    * s47) starts from.
    */
  def dropIndex(spark: SparkSession, prefix: String): Unit =
    Suffixes.foreach { sfx =>
      Seq(prefix + sfx, prefix + sfx + "__vacuum").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        Bucketing.dropStaleLocation(spark, t)
      }
    }

  /** True iff an IVF index exists at `prefix` (append/read-ready). */
  def hasIvfIndex(spark: SparkSession, prefix: String): Boolean = {
    reattachAll(spark, prefix)
    spark.catalog.tableExists(s"${prefix}_meta")
  }

  /** vec_ids PRESENT in the IVF vector table — tombstoned rows INCLUDED
    * until vacuumed, and an id may repeat (one row per probed bucket
    * under nprobe > 1): a deliberately UN-deduplicated projection,
    * because the only sound uses are membership probes (anti/semi
    * joins), where a distinct() would add one full-index shuffle per
    * call for zero semantic difference (review r19). This is the
    * seen-set an intake fold dedups against: an at-least-once replay
    * drops out, and an ERASED id stays erased (re-ingesting it would
    * silently resurrect deleted data; after a vacuum physically removes
    * the rows, re-ingest becomes possible again — the operator's
    * explicit reset).
    */
  def ivfSeenIds(spark: SparkSession, prefix: String): DataFrame = {
    reattachAll(spark, prefix)
    spark.table(s"${prefix}_vectors").select("vec_id")
  }

  /** The INCREMENTAL slice of [[ivfPairsFromIndex]]: within-bucket
    * cosine pairs with at least one endpoint in `newIds` — what one
    * intake batch adds to the pair set. The index side stays the
    * bucketed table (zero Exchange); the new side is batch-sized and
    * broadcasts. Union over batches == the one-shot pair set exactly:
    * coarse assignment is deterministic given the stored centroids, so
    * a pair is discovered in the batch its LATER endpoint arrives and
    * never again (the s45/s46 exactly-once discovery discipline).
    */
  def ivfPairsForIds(spark: SparkSession, prefix: String,
      newIds: DataFrame): DataFrame = {
    reattachAll(spark, prefix)
    graft.functions.VecFunctions.ensureRegistered(spark)
    val v = antiTombstones(spark, prefix,
      spark.table(s"${prefix}_vectors"), "vec_id")
    // adaptive hint (the tombstone-broadcast discipline): batch-sized id
    // sets broadcast; a backfill-sized set falls back to the shuffled
    // semi join instead of OOMing the driver
    val ids = newIds.select("vec_id").distinct()
    val probe = if (ids.count() <= graft.ops.Graphs.FrontierBroadcastRows)
      broadcast(ids) else ids
    val n = v.join(probe, Seq("vec_id"), "left_semi")
    val a = n.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      col("nrm").as("a_nrm"), col("bucket"))
    val b = v.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
      col("nrm").as("b_nrm"), col("bucket").as("b_bucket"))
    a.join(b, col("bucket") === col("b_bucket") && col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("p_a"),
        greatest(col("a_id"), col("b_id")).as("p_b"),
        round(Similarity.dot(col("a_emb"), col("b_emb")) /
          (col("a_nrm") * col("b_nrm")), 4).as("cos_sim"))
      .select(col("p_a").as("a_id"), col("p_b").as("b_id"), col("cos_sim"))
      .dropDuplicates("a_id", "b_id")
  }

  /** Within-bucket cosine pairs from the persisted IVF vectors: self equi
    * join on the bucketing key — zero Exchange on the join (asserted in
    * SimIndexSpec). Multi-probe duplicates are collapsed downstream.
    */
  def ivfPairsFromIndex(spark: SparkSession, prefix: String,
      verifyAgainst: Option[DataFrame] = None): DataFrame = {
    reattachAll(spark, prefix)
    graft.functions.VecFunctions.ensureRegistered(spark)
    // the vector-index signature covers the indexable subset — filter
    // the caller's raw base the same way before comparing
    verifyAgainst.foreach(b => requireFresh(spark, prefix, indexableVecs(b)))
    val v = antiTombstones(spark, prefix,
      spark.table(s"${prefix}_vectors"), "vec_id")
    val a = v.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      col("nrm").as("a_nrm"), col("bucket"))
    val b = v.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
      col("nrm").as("b_nrm"), col("bucket").as("b_bucket"))
    a.join(b, col("bucket") === col("b_bucket") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(Similarity.dot(col("a_emb"), col("b_emb")) /
          (col("a_nrm") * col("b_nrm")), 4).as("cos_sim"))
      .dropDuplicates("a_id", "b_id")
  }

  /** Build + persist the composed IVF-PQ index (ROADMAP 9): a COSINE
    * index. Vectors are L2-normalized first — the coarse quantizer is
    * trained and assigned in the SAME unit-norm space ([[Similarity
    * .kmeansCentroids]] trains on normalized features), so the residual
    * x_unit − centroid[bucket] is genuinely small and isotropic (the
    * classic IVF-PQ residual benefit; on raw vectors of varying norm the
    * "residual" would mostly encode the norm). PQ codebooks are trained
    * on those residuals; each vector stores as m codes, bucketed on the
    * coarse bucket. Probing ranks buckets by cosine and scoring
    * approximates dot(q, x_unit) = |q|·cos(q, x) — probe metric and
    * score are the SAME metric, so scores are comparable across buckets.
    * The index holds ~m bytes + a bucket id per vector — at 100 TB,
    * codes for 10^11 vectors fit a few TB of bucketed parquet and a
    * query reads only its probed buckets.
    *
    * Tables: `<prefix>_centroids` (cid, centroid),
    * `<prefix>_pq_codebooks` (subspace, cid, centroid),
    * `<prefix>_pq_codes` (vec_id, bucket, codes) bucketed (bucket).
    */
  def writeIvfPqIndex(vecs: DataFrame, prefix: String, nCentroids: Int,
      m: Int, dims: Int, k: Int, buckets: Int): Unit = {
    graft.functions.VecFunctions.ensureRegistered(vecs.sparkSession)
    // unit-norm copy (float, so every downstream op sees the usual
    // embedding type); zero vectors have no direction — excluded
    val unit = vecs
      .filter(Similarity.norm(col("embedding")) > 0.0)
      .select(col("vec_id"),
        transform(Similarity.l2normalize(col("embedding")),
          _.cast("float")).as("embedding"))
    requireUniqueIds(unit, "vec_id", prefix)
    val centroids = Similarity.kmeansCentroids(unit, nCentroids, maxIter = 10)
    Bucketing.dropStaleLocation(vecs.sparkSession, s"${prefix}_centroids")
    centroids.write.mode("overwrite").saveAsTable(s"${prefix}_centroids")
    Bucketing.writeDescriptor(vecs.sparkSession, s"${prefix}_centroids")
    val assigned = Similarity.ivfAssign(unit, centroids, nprobe = 1)
    // cached: pqTrain re-scans it m times (one kmeans fit per subspace)
    // and the encode + bucket join read it twice more
    val resid = unit.join(assigned, "vec_id")
      .join(broadcast(centroids.select(col("cid").as("bucket"),
        col("centroid"))), "bucket")
      .select(col("vec_id"), col("bucket"),
        zip_with(col("embedding"), col("centroid"),
          (x, c) => x.cast("double") - c).as("embedding"))
      .cache()
    val codebooks = Similarity.pqTrain(resid, m, dims, k)
    Bucketing.dropStaleLocation(vecs.sparkSession, s"${prefix}_pq_codebooks")
    codebooks.write.mode("overwrite").saveAsTable(s"${prefix}_pq_codebooks")
    Bucketing.writeDescriptor(vecs.sparkSession, s"${prefix}_pq_codebooks")
    val codes = Similarity.pqEncode(resid, codebooks, m, dims)
      .join(resid.select("vec_id", "bucket"), "vec_id")
      .select("vec_id", "bucket", "codes")
    Bucketing.writeBucketed(codes, s"${prefix}_pq_codes", "bucket",
      buckets, sortCols = Seq("bucket", "vec_id"))
    resid.unpersist()
    // drift baseline (r15): coarse residual distances of the build
    // corpus — intake batches PSI-compare against this, exactly like the
    // plain-IVF index (appendIvfIndexWithRefresh's gate).
    val resHist = residualHistogram(unit, centroids)
    Bucketing.dropStaleLocation(vecs.sparkSession, s"${prefix}_res_hist")
    resHist.write.mode("overwrite").saveAsTable(s"${prefix}_res_hist")
    Bucketing.writeDescriptor(vecs.sparkSession, s"${prefix}_res_hist")
    dropTombstones(vecs.sparkSession, prefix)
    // signature over the indexable subset of the RAW rows (the r17
    // vector-index contract; `unit` is the normalized copy — signing it
    // would never match any base the caller holds)
    writeSignature(prefix, indexableVecs(vecs), params = Seq(
      "n_centroids" -> nCentroids.toLong, "m" -> m.toLong,
      "dims" -> dims.toLong, "k" -> k.toLong, "buckets" -> buckets.toLong))
  }

  /** Incremental IVF-PQ maintenance (r15): the standard PQ insert —
    * unit-normalize the new vectors, assign to the EXISTING coarse
    * centroids, encode their residuals with the EXISTING codebooks,
    * append the codes bucket-locally, bump the signature additively.
    * Centroids and codebooks are frozen per intake (drift is the
    * periodic [[appendIvfPqIndexWithRefresh]] decision, not a per-batch
    * cost), mirroring [[appendIvfIndex]]'s contract for plain IVF.
    */
  def appendIvfPqIndex(newVecs: DataFrame, prefix: String): Unit = {
    val spark = newVecs.sparkSession
    graft.functions.VecFunctions.ensureRegistered(spark)
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_meta"),
      s"no IVF-PQ index at '$prefix' to append to — build with " +
        "writeIvfPqIndex")
    val metaDf = spark.table(s"${prefix}_meta")
    val schema = metaDf.columns
    require(schema.contains("m"),
      s"index '$prefix' predates recorded build params — rebuild once " +
        "with writeIvfPqIndex to enable appends")
    val meta = metaDf.head()
    def p(name: String): Int = meta.getLong(schema.indexOf(name)).toInt
    val centroids = spark.table(s"${prefix}_centroids")
    val indexable = indexableVecs(newVecs)
    requireUniqueIds(indexable, "vec_id", prefix)
    requireNotTombstoned(spark, prefix,
      indexable.select("vec_id").distinct(), "vec_id")
    val unit = indexable
      .select(col("vec_id"),
        transform(Similarity.l2normalize(col("embedding")),
          _.cast("float")).as("embedding"))
    val assigned = Similarity.ivfAssign(unit, centroids, nprobe = 1)
    val resid = unit.join(assigned, "vec_id")
      .join(broadcast(centroids.select(col("cid").as("bucket"),
        col("centroid"))), "bucket")
      .select(col("vec_id"), col("bucket"),
        zip_with(col("embedding"), col("centroid"),
          (x, c) => x.cast("double") - c).as("embedding"))
      .cache()
    val codes = Similarity.pqEncode(resid,
        spark.table(s"${prefix}_pq_codebooks"), p("m"), p("dims"))
      .join(resid.select("vec_id", "bucket"), "vec_id")
      .select("vec_id", "bucket", "codes")
    Bucketing.appendBucketedMulti(codes, s"${prefix}_pq_codes",
      Seq("bucket"), p("buckets"), sortCols = Seq("bucket", "vec_id"))
    resid.unpersist()
    val (dn, dsig) = signature(indexable)
    writeSignature(prefix, newVecs, params = Seq(
      "n_centroids" -> p("n_centroids").toLong, "m" -> p("m").toLong,
      "dims" -> p("dims").toLong, "k" -> p("k").toLong,
      "buckets" -> p("buckets").toLong),
      precomputed = Some((meta.getLong(0) + dn, meta.getLong(1) + dsig)))
  }

  /** Drift-triggered IVF-PQ maintenance (r15): [[appendIvfPqIndex]]
    * guarded by the same residual-PSI gate as the plain-IVF refresh —
    * with one honest difference: PQ codes are LOSSY, so the index
    * cannot rebuild itself from its own tables; the caller supplies the
    * full post-intake corpus (`corpus` — the base table the pipeline
    * already owns, typically what the signature is checked against) and
    * past the threshold the index retrains WHOLESALE through
    * [[writeIvfPqIndex]] (fresh coarse centroids, fresh residual
    * codebooks, fresh reference histogram — the SCD2 overwrite swap).
    * Returns true iff the rebuild fired.
    */
  def appendIvfPqIndexWithRefresh(newVecs: DataFrame, prefix: String,
      corpus: DataFrame, psiThreshold: Double = 0.25): Boolean = {
    val spark = newVecs.sparkSession
    graft.functions.VecFunctions.ensureRegistered(spark)
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_res_hist"),
      s"index '$prefix' predates drift monitoring — rebuild once with " +
        "writeIvfPqIndex to record the reference residual histogram")
    val meta = spark.table(s"${prefix}_meta")
    val schema = meta.columns
    val mRow = meta.head()
    def p(name: String): Int = mRow.getLong(schema.indexOf(name)).toInt
    val unit = newVecs
      .filter(Similarity.norm(col("embedding")) > 0.0)
      .select(col("vec_id"),
        transform(Similarity.l2normalize(col("embedding")),
          _.cast("float")).as("embedding"))
    val live = residualHistogram(unit,
      spark.table(s"${prefix}_centroids"))
    val psi = residualPsi(spark.table(s"${prefix}_res_hist"), live)
    if (psi < psiThreshold) {
      appendIvfPqIndex(newVecs, prefix)
      false
    } else {
      writeIvfPqIndex(corpus.transform(Checkpoints.cut), prefix,
        p("n_centroids"), p("m"), p("dims"), p("k"), p("buckets"))
      true
    }
  }

  /** ADC search over the persisted IVF-PQ index: probe the `nprobe`
    * coarse centroids nearest the query (by cosine, matching the
    * assignment metric), then score each vector in the probed buckets as
    * dot(q, centroid_b) + ADC(residual codes) — EXACTLY
    * dot(q, centroid_b + reconstruction) by linearity of the dot product
    * (PqSpec asserts the identity). Since the index stores UNIT-norm
    * vectors ([[writeIvfPqIndex]]), the score approximates
    * dot(q, x_unit) = |q|·cos(q, x): ranking is by cosine, the same
    * metric the probe uses, so scores compare across buckets. The residual codebooks are shared
    * across buckets, so ONE m×k ADC table (driver-built from the tiny
    * codebook table, broadcast) serves every probed bucket; only the
    * scalar dot(q, centroid_b) differs per bucket. The codes scan is
    * pruned to the probed buckets by the bucket filter.
    */
  def ivfPqSearch(spark: SparkSession, prefix: String, query: Seq[Float],
      nprobe: Int, topk: Int,
      verifyAgainst: Option[DataFrame] = None): DataFrame = {
    reattachAll(spark, prefix)
    verifyAgainst.foreach(b => requireFresh(spark, prefix, indexableVecs(b)))
    import spark.implicits._
    val q = query.map(_.toDouble)
    // centroids and codebooks are a handful of rows by construction —
    // driver-side math on them is the permitted-scalar pattern
    val cents = spark.table(s"${prefix}_centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
    val qn = math.sqrt(q.map(x => x * x).sum)
    val probed = cents.map { case (cid, c) =>
      val dot = c.indices.map(i => q(i) * c(i)).sum
      val cn = math.sqrt(c.map(x => x * x).sum)
      (cid, dot, dot / (qn * cn))
    }.sortBy { case (cid, _, cos) => (-cos, cid) }.take(nprobe)
    // r20 (guide §2.4/§1.2 — remove shuffles outright, then per-task
    // work): the ADC table is m×k driver-side doubles (256 here), so the
    // per-vector score needs NO explode (was m× the rows), NO broadcast
    // join against the table, NO groupBy exchange to re-assemble the m
    // partial dots, and NO second join for the bucket constant. Fold the
    // table into a literal-array lookup expression — m codegen'd
    // element_at calls summed in ascending-subspace order, the SAME
    // left-to-right order the old hash aggregate accumulated posexplode
    // output in, so scores are bitwise identical (SimIndexSpec pins the
    // equality against the join/agg form). Plan: scan → project →
    // TakeOrderedAndProject; zero Exchange.
    val lut = Similarity.adcLut(spark.table(s"${prefix}_pq_codebooks"), query)
    val adcExpr = lut.indices.map { j =>
      element_at(typedLit(lut(j).toSeq),
        col("codes").getItem(j).cast("int") + lit(1))
    }.reduce(_ + _)
    val cdotExpr = element_at(
      map(probed.flatMap { case (cid, dot, _) =>
        Seq(lit(cid), lit(dot)) }.toSeq: _*), col("bucket"))
    antiTombstones(spark, prefix, spark.table(s"${prefix}_pq_codes"),
        "vec_id")
      .filter(col("bucket").isin(probed.map(_._1): _*))
      .select(col("vec_id"), (adcExpr + cdotExpr).as("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(topk)
  }

  /** Delete vectors from the persisted IVF-PQ index: tombstone +
    * retraction over the indexable subset, exactly [[deleteFromIvfIndex]]
    * with membership probed against the codes table.
    */
  def deleteFromIvfPqIndex(delVecs: DataFrame, prefix: String): Unit = {
    val spark = delVecs.sparkSession
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_meta"),
      s"no IVF-PQ index at '$prefix' to delete from")
    val del = indexableVecs(delVecs).distinct() // once per row image
    val ids = del.select("vec_id").distinct()
      .join(spark.table(s"${prefix}_pq_codes").select("vec_id"),
        Seq("vec_id"), "left_semi")
    val newIds = antiTombstones(spark, prefix, ids, "vec_id")
      .transform(Checkpoints.cut)
    val (dn, dsig) = signature(del.join(newIds, Seq("vec_id"), "left_semi"))
    if (dn > 0) {
      appendTombstones(spark, prefix, newIds)
      retractSignature(spark, prefix, dn, dsig)
    }
  }

  /** Rewrite `table` as the shadow-then-swap the compactBucketed
    * discipline uses: the survivors land in `<table>__vacuum` FIRST and
    * only a durable shadow replaces the original (drop + rename). The
    * original table stays intact through the ENTIRE data rewrite — an
    * executor loss or failure there leaves the index untouched (the r17
    * drop-then-rewrite ordering lost the table permanently on exactly
    * that failure, since Checkpoints.cut's localCheckpoint fallback is
    * not fault-tolerant). What remains is a metadata-only window
    * between the DROP and the RENAME where neither name is live; a
    * crash there strands the survivors under the shadow name, and
    * [[Bucketing.recoverShadow]] (wired into reattachAll) finishes the
    * swap on the next read — the parquet stand-in for a transactional
    * catalog's atomic swap.
    */
  private def rewriteSwap(spark: SparkSession, table: String,
      survivors: DataFrame, keys: Seq[String], buckets: Int,
      sorts: Seq[String]): Unit = {
    val tmp = table + "__vacuum"
    spark.sql(s"DROP TABLE IF EXISTS `$tmp`")
    Bucketing.dropStaleLocation(spark, tmp)
    // pin the bucketed scan on for the rewrite (compactBucketed's
    // land-mine: plan-eliminated repartition + un-bucketed scan would
    // fragment the shadow into one file per (task, bucket))
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try Bucketing.writeBucketedMulti(survivors, tmp, keys, buckets, sorts)
    finally spark.conf.set(key, prev)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    Bucketing.dropStaleLocation(spark, table) // reattached drops keep files
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  /** Scheduled compaction for a deleted-from index: physically drop the
    * tombstoned rows from every per-id data table under `prefix` (each
    * rewritten with its descriptor's own bucket/sort spec via a shadow
    * table + rename swap — the [[Bucketing.compactBucketed]] discipline,
    * so a failure mid-vacuum leaves every original table intact), then
    * clear the tombstone set. The signature is untouched — it was
    * retracted at delete time. O(table) paid once on an operator's
    * schedule, amortized over every read that no longer carries the
    * anti-join; the portable-parquet stand-in for a transactional
    * format's DELETE + OPTIMIZE.
    */
  def vacuumIndex(spark: SparkSession, prefix: String): Unit = {
    reattachAll(spark, prefix)
    tombstones(spark, prefix) match {
      case None => ()
      case Some(t) =>
        val ts = broadcast(t.select(col("id")))
        Seq("_bands" -> "doc_id", "_sigs" -> "doc_id",
          "_docs" -> "doc_id",
          "_vectors" -> "vec_id", "_pq_codes" -> "vec_id").foreach {
          case (sfx, idCol) =>
            val table = prefix + sfx
            if (spark.catalog.tableExists(table)) {
              val desc = Bucketing.readDescriptor(spark, table)
              val keys = desc.flatMap(p => Option(p.getProperty("keys")))
                .map(_.split(',').toSeq).getOrElse(Seq(idCol))
              val sorts = desc.flatMap(p => Option(p.getProperty("sorts")))
                .map(_.split(',').toSeq).getOrElse(keys)
              val buckets = desc.flatMap(p => Option(p.getProperty("buckets")))
                .map(_.toInt).getOrElse(1)
              val survivors = spark.table(table)
                .join(ts.select(col("id").as(idCol)), Seq(idCol), "left_anti")
              rewriteSwap(spark, table, survivors, keys, buckets, sorts)
            }
        }
        // the shingle table has no per-id rows — its compaction folds
        // the log-structured deltas to one net-positive row per hash
        val shTable = s"${prefix}_shingles"
        if (spark.catalog.tableExists(shTable)) {
          val buckets = Bucketing.readDescriptor(spark, shTable)
            .flatMap(p => Option(p.getProperty("buckets"))).map(_.toInt)
            .getOrElse(1)
          val nets = spark.table(shTable)
            .groupBy("sh_hash").agg(sum("nd").as("nd"))
          // a hash netting NEGATIVE is evidence of a bad delete (a
          // drifted row image slipped past the membership guard, or a
          // pre-guard index) — fail LOUDLY instead of compacting the
          // corruption into a permanently-wrong live set
          val bad = nets.filter(col("nd") < 0).limit(1).head(1)
          if (bad.nonEmpty) throw new IllegalStateException(
            s"shingle index '$prefix' has a hash with NEGATIVE net count " +
              s"(${bad.head.getLong(0)}) — a delete retracted shingles its " +
              "docs never contributed (drifted row image?); rebuild with " +
              "writeShingleIndex from the surviving corpus")
          rewriteSwap(spark, shTable, nets.filter(col("nd") > 0),
            Seq("sh_hash"), buckets, Seq("sh_hash"))
        }
        dropTombstones(spark, prefix)
    }
  }

  /** Per-hash contribution counts of a benchmark slice: one row per
    * distinct n-shingle hash with the number of (doc, shingle) pairs
    * contributing it. THE shingle-index delta unit — build, append, and
    * delete all derive rows through here, so a delete's negated counts
    * cancel its docs' earlier contribution EXACTLY.
    */
  private def shingleCounts(docs: DataFrame, n: Int): DataFrame =
    Text.shingles(docs, n)
      .select(xxhash64(col("shingle")).as("sh_hash"))
      .groupBy("sh_hash").agg(count(lit(1)).as("nd"))

  /** Build + persist the benchmark shingle set for decontamination sweeps
    * (ROADMAP 4): n-char shingles of the held-out corpus as 8-byte
    * xxhash64 keys, stored LOG-STRUCTURED as (sh_hash, nd) contribution
    * counts, bucketed+sorted on the hash. The benchmark set changes
    * rarely; training corpora arrive continuously — so the shingling of
    * the benchmark side is paid once, and every sweep joins against
    * co-located buckets (no Exchange on the index side, asserted in
    * SimIndexSpec; the net-count aggregate is bucket-local too).
    * Appends lay down positive deltas, deletes negative ones —
    * [[liveShingles]] nets them per hash, so a fully-deleted shingle
    * disappears without any rewrite.
    */
  def writeShingleIndex(bench: DataFrame, prefix: String, n: Int,
      buckets: Int): Unit = {
    val spark = bench.sparkSession
    requireUniqueIds(bench, "doc_id", prefix)
    Bucketing.writeBucketed(shingleCounts(bench, n), s"${prefix}_shingles",
      "sh_hash", buckets, sortCols = Seq("sh_hash"))
    // doc-membership sidecar (r18 — the ADVICE membership guard): the
    // shingle table itself has no per-doc rows, so without this a delete
    // of a never-ingested doc (or a drifted row image) would append
    // bogus negative deltas that can push SHARED shingles out of the
    // net-positive set — silently weakening decontamination for readers
    // that skip verifyAgainst. One (doc_id) row per ingested doc gives
    // deletes the same semi-join membership probe the other flavors get.
    spark.sql(s"DROP TABLE IF EXISTS `${prefix}_docs`")
    Bucketing.dropStaleLocation(spark, s"${prefix}_docs")
    Bucketing.writeBucketed(bench.select("doc_id"), s"${prefix}_docs",
      "doc_id", buckets, sortCols = Seq("doc_id"))
    dropTombstones(spark, prefix)
    writeSignature(prefix, bench, params = Seq(
      "shingle_len" -> n.toLong, "buckets" -> buckets.toLong))
  }

  /** Incremental shingle-index maintenance: shingle only the NEW
    * benchmark docs, append their positive contribution deltas, bump the
    * signature additively. O(new docs) — the existing rows are never
    * read.
    */
  def appendShingleIndex(newBench: DataFrame, prefix: String): Unit = {
    val spark = newBench.sparkSession
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_meta"),
      s"no shingle index at '$prefix' to append to — build with " +
        "writeShingleIndex")
    val metaDf = spark.table(s"${prefix}_meta")
    val schema = metaDf.columns
    require(schema.contains("shingle_len"),
      s"index '$prefix' predates recorded build params — rebuild once " +
        "with writeShingleIndex to enable appends")
    val meta = metaDf.head()
    def p(name: String): Int = meta.getLong(schema.indexOf(name)).toInt
    requireUniqueIds(newBench, "doc_id", prefix)
    requireNotTombstoned(spark, prefix,
      newBench.select("doc_id").distinct(), "doc_id")
    Bucketing.appendBucketedMulti(shingleCounts(newBench, p("shingle_len")),
      s"${prefix}_shingles", Seq("sh_hash"), p("buckets"),
      sortCols = Seq("sh_hash"))
    if (spark.catalog.tableExists(s"${prefix}_docs"))
      Bucketing.appendBucketedMulti(newBench.select("doc_id"),
        s"${prefix}_docs", Seq("doc_id"), p("buckets"),
        sortCols = Seq("doc_id"))
    val (dn, dsig) = signature(newBench)
    writeSignature(prefix, newBench, params = Seq(
      "shingle_len" -> p("shingle_len").toLong,
      "buckets" -> p("buckets").toLong),
      precomputed = Some((meta.getLong(0) + dn, meta.getLong(1) + dsig)))
  }

  /** Delete benchmark documents from the persisted shingle index: append
    * their NEGATED contribution counts (the log-structured retraction —
    * [[liveShingles]]' net sum then drops fully-deleted shingles while
    * shingles shared with surviving docs stay positive), tombstone the
    * doc_ids for replay idempotence, and retract the signature. `delBench`
    * must carry the full rows as originally ingested (the CDC row-image
    * rule) — counts and signature both cancel exactly only then.
    * O(|batch|): shingling the deleted docs + two appends.
    */
  def deleteFromShingleIndex(delBench: DataFrame, prefix: String): Unit = {
    val spark = delBench.sparkSession
    reattachAll(spark, prefix)
    require(spark.catalog.tableExists(s"${prefix}_meta"),
      s"no shingle index at '$prefix' to delete from")
    require(spark.catalog.tableExists(s"${prefix}_docs"),
      s"index '$prefix' predates the doc-membership sidecar — rebuild " +
        "once with writeShingleIndex to enable membership-checked deletes")
    val metaDf = spark.table(s"${prefix}_meta")
    val schema = metaDf.columns
    val meta = metaDf.head()
    def p(name: String): Int = meta.getLong(schema.indexOf(name)).toInt
    // membership guard (the other flavors' semi-join, via the _docs
    // sidecar): a never-ingested doc_id must retract NOTHING — its
    // negative deltas would otherwise corrupt shared shingles' net counts
    val newIds = antiTombstones(spark, prefix,
        delBench.select("doc_id").distinct()
          .join(spark.table(s"${prefix}_docs"), Seq("doc_id"), "left_semi"),
        "doc_id")
      .transform(Checkpoints.cut)
    // distinct() on the row images: a repeated delete row would double
    // BOTH the negative count deltas and the signature retraction
    val newDel = delBench.distinct()
      .join(newIds, Seq("doc_id"), "left_semi")
      .transform(Checkpoints.cut) // shingled AND signed below
    val (dn, dsig) = signature(newDel)
    if (dn > 0) {
      Bucketing.appendBucketedMulti(
        shingleCounts(newDel, p("shingle_len"))
          .select(col("sh_hash"), (-col("nd")).as("nd")),
        s"${prefix}_shingles", Seq("sh_hash"), p("buckets"),
        sortCols = Seq("sh_hash"))
      appendTombstones(spark, prefix, newIds)
      retractSignature(spark, prefix, dn, dsig)
    }
  }

  /** The live (net-positive) shingle hash set: per-hash sum of the
    * log-structured deltas, keeping hashes some surviving doc still
    * contributes. The table is bucketed on sh_hash, so the aggregate is
    * Exchange-free — readers pay one bucket-local fold, never a shuffle.
    */
  private def liveShingles(spark: SparkSession, prefix: String): DataFrame =
    spark.table(s"${prefix}_shingles")
      .groupBy("sh_hash").agg(sum("nd").as("net"))
      .filter(col("net") > 0).select("sh_hash")

  /** Decontaminate `train` against a persisted shingle index: anti-join
    * away every doc sharing any n-shingle (by 64-bit hash) with the
    * benchmark corpus. The train side shingles+shuffles per sweep
    * (inherent — it is the new data); the index side is bucket-local.
    * `verifyAgainst` = the live BENCHMARK corpus (the indexed side).
    */
  def decontaminateFromIndex(spark: SparkSession, train: DataFrame,
      prefix: String, n: Int,
      verifyAgainst: Option[DataFrame] = None): DataFrame = {
    reattachAll(spark, prefix)
    verifyAgainst.foreach(requireFresh(spark, prefix, _))
    val bench = liveShingles(spark, prefix)
    val contaminated = Text.shingleStream(train, n)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_hash"))
      .join(bench, "sh_hash")
      .select("doc_id").distinct()
    train.join(contaminated, Seq("doc_id"), "left_anti")
  }
}
