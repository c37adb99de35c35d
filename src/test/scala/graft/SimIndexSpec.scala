package graft

import graft.ops.{SimIndex, Similarity, Text}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeExec}

/** Persisted similarity indexes (ROADMAP 6): building the MinHash/LSH and
  * IVF state once as bucketed tables must (a) make the per-query candidate
  * joins Exchange-free and (b) reproduce exactly what the from-scratch
  * operators compute.
  */
class SimIndexSpec extends SparkSpecBase {

  private def dropIdx(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // Derive the warehouse path from the session config (single source of
    // truth: SparkSpecBase) — a hardcoded copy silently stops cleaning if
    // the base config moves, leaving stale bucketed files to shadow
    // rewritten tables.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val dir = new java.io.File(s"$wh/$t")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("LSH index: candidate self-join is Exchange-free and matches fresh candidates") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("lshidx_bands", "lshidx_sigs")
    val docs = Tables.load(spark, sfDir, "documents")
    SimIndex.writeLshIndex(docs, "lshidx", numHashes = 32, bands = 16,
      buckets = 4)

    // the candidate join itself (pre-distinct) must not shuffle (and must
    // not escape through a tiny-table broadcast — disabled in scope)
    withoutAutoBroadcast {
      val b1 = spark.table("lshidx_bands")
      val b2 = b1.select(col("doc_id").as("b_id"), col("band"), col("band_sig"))
      val joined = b1.join(b2, Seq("band", "band_sig"))
      val exchanges = physical(joined).collect {
        case e: Exchange => e
      }
      assert(exchanges.isEmpty,
        s"expected exchange-free band join, found ${exchanges.map(_.nodeName)}")
    }

    // and the index reproduces the from-scratch candidate set
    val fromIdx = SimIndex.lshCandidatesFromIndex(spark, "lshidx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Similarity.minHashSignatures(Text.shingles(docs, 3), 32)
    val fresh = Similarity.lshCandidates(sigs, 32, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIdx == fresh && fromIdx.nonEmpty)
  }

  test("capped candidate read over the bucketed index: the bucket-sizing " +
      "window is Exchange-free (bucket-local), and the capped set == " +
      "the from-scratch capped kernel") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("lshcap_bands", "lshcap_sigs", "lshcap_meta")
    val docs = Tables.load(spark, sfDir, "documents")
    SimIndex.writeLshIndex(docs, "lshcap", numHashes = 32, bands = 16,
      buckets = 4)
    withoutAutoBroadcast {
      val capped = SimIndex.lshCandidatesFromIndex(spark, "lshcap",
        maxBucket = 4)
      val wins = physical(capped).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, "capped mode must plan the sizing window")
      wins.foreach { w =>
        val ex = w.collect { case e: Exchange => e }
        assert(ex.isEmpty,
          s"the sizing window must consume the bucketed scan directly, " +
            s"found ${ex.map(_.nodeName)}")
      }
    }
    // and the index read reproduces the from-scratch capped candidates
    val fromIdx = SimIndex.lshCandidatesFromIndex(spark, "lshcap",
        maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Similarity.minHashSignatures(Text.shingles(docs, 3), 32)
    val fresh = Similarity.lshCandidates(sigs, 32, 16, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIdx == fresh && fromIdx.nonEmpty)
  }

  test("LSH append: incremental intake == full rebuild, signature stays additive") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("lshapp_bands", "lshapp_sigs", "lshapp_meta",
      "lshfull_bands", "lshfull_sigs", "lshfull_meta")
    val docs = Tables.load(spark, sfDir, "documents")
    val old = docs.filter(col("doc_id") % 2 === 0)
    val incoming = docs.filter(col("doc_id") % 2 =!= 0)

    SimIndex.writeLshIndex(old, "lshapp", numHashes = 32, bands = 16,
      buckets = 4)
    assert(SimIndex.isFresh(spark, "lshapp", old))
    assert(!SimIndex.isFresh(spark, "lshapp", docs))
    // incremental intake: index ONLY the new docs, append, bump signature
    SimIndex.appendLshIndex(incoming, "lshapp")
    // the additive signature equals the full corpus's — requireFresh on
    // the union passes, on the old slice alone fails
    assert(SimIndex.isFresh(spark, "lshapp", docs))
    assert(!SimIndex.isFresh(spark, "lshapp", old))

    // appended index == a from-scratch build over the full corpus
    SimIndex.writeLshIndex(docs, "lshfull", numHashes = 32, bands = 16,
      buckets = 4)
    val viaAppend = SimIndex.lshCandidatesFromIndex(spark, "lshapp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaFull = SimIndex.lshCandidatesFromIndex(spark, "lshfull")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaAppend == viaFull && viaAppend.nonEmpty)
    // cross-slice pairs exist — the append genuinely joins old x new
    assert(viaAppend.exists { case (a, b) => (a + b) % 2 == 1 },
      "expected at least one old-new candidate pair")

    // bucket locality survives appends: candidate join still Exchange-free
    withoutAutoBroadcast {
      val b1 = spark.table("lshapp_bands")
      val b2 = b1.select(col("doc_id").as("b_id"), col("band"),
        col("band_sig"))
      val exchanges = physical(b1.join(b2, Seq("band", "band_sig")))
        .collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"append broke bucket locality: ${exchanges.map(_.nodeName)}")
    }
  }

  test("IVF + shingle appends: existing-centroid inserts and exact-distinct growth") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("ivfapp_centroids", "ivfapp_vectors", "ivfapp_meta",
      "shapp_shingles", "shapp_meta")
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val oldV = vecs.filter(col("vec_id") % 2 === 0)
    val newV = vecs.filter(col("vec_id") % 2 =!= 0)
    SimIndex.writeIvfIndex(oldV, "ivfapp", k = 4, nprobe = 2, buckets = 4)
    SimIndex.appendIvfIndex(newV, "ivfapp")
    assert(SimIndex.isFresh(spark, "ivfapp", vecs))
    assert(!SimIndex.isFresh(spark, "ivfapp", oldV))
    // appended vectors = the full set assigned to the ORIGINAL centroids
    // (IVF insert semantics — centroids are not retrained per intake)
    val expect = Similarity.ivfAssign(vecs,
        spark.table("ivfapp_centroids"), nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = spark.table("ivfapp_vectors")
      .select("vec_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expect && got.size > oldV.count())

    val docs = Tables.load(spark, sfDir, "documents")
    val oldB = docs.filter(col("doc_id") % 2 === 0)
    val newB = docs.filter(col("doc_id") % 2 =!= 0)
    SimIndex.writeShingleIndex(oldB, "shapp", n = 20, buckets = 4)
    SimIndex.appendShingleIndex(newB, "shapp")
    assert(SimIndex.isFresh(spark, "shapp", docs))
    // the log-structured delta rows net to the true contribution count
    // per hash — every hash strictly positive after two positive appends
    val stored = spark.table("shapp_shingles")
      .groupBy("sh_hash").agg(sum("nd").as("net"))
    assert(stored.filter(col("net") <= 0).count() == 0)
    // decontamination through the appended index == the exact string pass
    val train = docs.filter(col("doc_id") % 5 === 3)
    val viaIdx = SimIndex.decontaminateFromIndex(spark, train, "shapp",
        n = 20, verifyAgainst = Some(docs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = {
      val benchSh = Text.shingles(docs, 20).select("shingle").distinct()
      train.join(
        Text.shingleStream(train, 20).join(benchSh, Seq("shingle"))
          .select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(viaIdx == exact)
  }

  test("drift-triggered IVF refresh: in-distribution batch appends, " +
      "drifted batch rebuilds, recall recovers vs the stale-append path") {
    import spark.implicits._
    graft.functions.VecFunctions.ensureRegistered(spark)
    val prefixes = Seq("ivfdrift", "ivfstale", "ivfone")
    dropIdx(prefixes.flatMap(p => Seq(s"${p}_centroids", s"${p}_vectors",
      s"${p}_meta", s"${p}_res_hist")): _*)

    // Deterministic clustered corpus, dim 8: build-time clusters on axes
    // 0/1/2; the DRIFT clusters live on axes 5/6 — orthogonal to every
    // build centroid, so stale assignment scatters them across buckets.
    val dim = 8
    def cluster(axis: Int, n: Int, idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(dim)(0f)
        v(axis) = 1f
        (0 until dim).foreach(d =>
          v(d) += (((idBase + i) * 31 + d * 7) % 11 - 5) * 0.01f)
        (idBase + i, v.toSeq)
      }
    val corpusA = cluster(0, 40, 0L) ++ cluster(1, 40, 100L) ++
      cluster(2, 40, 200L)
    val batchA2 = cluster(0, 10, 300L) ++ cluster(1, 10, 400L)
    val batchB = cluster(5, 30, 500L) ++ cluster(6, 30, 600L)
    val queries = cluster(5, 3, 700L) ++ cluster(6, 3, 800L)
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    val full = corpusA ++ batchA2 ++ batchB

    def topkFromIndex(prefix: String, q: Seq[Float], k: Int): Set[Long] = {
      val cents = spark.table(s"${prefix}_centroids")
      val qdf = df(Seq((0L, q)))
      val bucket = Similarity.ivfAssign(qdf, cents, nprobe = 1)
        .head().getInt(1)
      spark.table(s"${prefix}_vectors")
        .filter(col("bucket") === bucket)
        .withColumn("cos", Similarity.dot(col("embedding"), typedLit(q)) /
          (col("nrm") * Similarity.norm(typedLit(q))))
        .orderBy(desc("cos"), col("vec_id"))
        .limit(k).collect().map(_.getLong(0)).toSet
    }
    def bruteTopk(q: Seq[Float], k: Int): Set[Long] =
      df(full)
        .withColumn("cos", Similarity.dot(col("embedding"), typedLit(q)) /
          (Similarity.norm(col("embedding")) * Similarity.norm(typedLit(q))))
        .orderBy(desc("cos"), col("vec_id"))
        .limit(k).collect().map(_.getLong(0)).toSet
    def recall(prefix: String): Double = {
      val per = queries.map { case (_, q) =>
        val bf = bruteTopk(q, 10)
        (topkFromIndex(prefix, q, 10) & bf).size.toDouble / bf.size
      }
      per.sum / per.size
    }

    // maintained path: in-distribution batch APPENDS (gate false,
    // centroids untouched), drifted batch FIRES the rebuild
    SimIndex.writeIvfIndex(df(corpusA), "ivfdrift", k = 5, nprobe = 1,
      buckets = 4)
    val centsBefore = spark.table("ivfdrift_centroids").collect().toSet
    assert(!SimIndex.appendIvfIndexWithRefresh(df(batchA2), "ivfdrift"))
    assert(spark.table("ivfdrift_centroids").collect().toSet == centsBefore)
    assert(SimIndex.appendIvfIndexWithRefresh(df(batchB), "ivfdrift"))
    assert(spark.table("ivfdrift_centroids").collect().toSet != centsBefore)
    assert(SimIndex.isFresh(spark, "ivfdrift", df(full)))

    // stale counterfactual: same intake, append-only — no rebuild
    SimIndex.writeIvfIndex(df(corpusA), "ivfstale", k = 5, nprobe = 1,
      buckets = 4)
    SimIndex.appendIvfIndex(df(batchA2), "ivfstale")
    SimIndex.appendIvfIndex(df(batchB), "ivfstale")

    // recall on drifted queries RECOVERS: the refreshed index answers
    // like a from-scratch build; the stale one scatters the drift
    // clusters across old buckets
    val (rFresh, rStale) = (recall("ivfdrift"), recall("ivfstale"))
    assert(rFresh >= 0.9, s"refreshed recall $rFresh < 0.9")
    assert(rFresh > rStale,
      s"refresh did not improve recall (fresh $rFresh <= stale $rStale)")

    // maintained == one-shot on the post-drift corpus: the bucket
    // PARTITION of vec_ids (as a set of sets — centroid ids may
    // permute) matches a writeIvfIndex built from scratch on A∪A2∪B
    SimIndex.writeIvfIndex(df(full), "ivfone", k = 5, nprobe = 1,
      buckets = 4)
    def partition(prefix: String): Set[Set[Long]] =
      spark.table(s"${prefix}_vectors").select("vec_id", "bucket")
        .collect().groupBy(_.getInt(1)).values
        .map(_.map(_.getLong(0)).toSet).toSet
    assert(partition("ivfdrift") == partition("ivfone"))

    // the reference histogram moved with the rebuild: a SECOND batch
    // from the post-drift distribution now appends without firing
    assert(!SimIndex.appendIvfIndexWithRefresh(
      df(cluster(5, 5, 900L)), "ivfdrift"))
  }

  test("drift refresh at nprobe=2: rebuild dedups the probed-copy rows " +
      "(no corpus inflation, signature fresh); empty batch is a no-drift no-op") {
    import spark.implicits._
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx(Seq("ivfnp2", "ivfnp2one").flatMap(p => Seq(s"${p}_centroids",
      s"${p}_vectors", s"${p}_meta", s"${p}_res_hist")): _*)
    val dim = 8
    def cluster(axis: Int, n: Int, idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(dim)(0f)
        v(axis) = 1f
        (0 until dim).foreach(d =>
          v(d) += (((idBase + i) * 31 + d * 7) % 11 - 5) * 0.01f)
        (idBase + i, v.toSeq)
      }
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    val corpusA = cluster(0, 40, 0L) ++ cluster(1, 40, 100L) ++
      cluster(2, 40, 200L)
    val batchB = cluster(5, 30, 500L) ++ cluster(6, 30, 600L)
    val full = corpusA ++ batchB

    SimIndex.writeIvfIndex(df(corpusA), "ivfnp2", k = 5, nprobe = 2,
      buckets = 4)
    // _vectors carries nprobe copies per vec by design
    val copies = spark.table("ivfnp2_vectors").count()
    assert(copies == 2L * corpusA.size, s"expected nprobe copies, got $copies")

    // EMPTY intake batch: the PSI gate must short-circuit (no evidence
    // != drift) — no rebuild, centroids untouched.
    val centsBefore = spark.table("ivfnp2_centroids").collect().toSet
    assert(!SimIndex.appendIvfIndexWithRefresh(df(corpusA).limit(0), "ivfnp2"))
    assert(spark.table("ivfnp2_centroids").collect().toSet == centsBefore)
    assert(SimIndex.isFresh(spark, "ivfnp2", df(corpusA)))

    // drifted batch fires the rebuild; the retrain corpus must be the
    // TRUE corpus (deduped), so row count is exactly nprobe × |A ∪ B|,
    // each vec_id appears exactly nprobe times, and the signature is
    // fresh against the real base (not the probed-copy multiset).
    assert(SimIndex.appendIvfIndexWithRefresh(df(batchB), "ivfnp2"))
    val v = spark.table("ivfnp2_vectors")
    assert(v.count() == 2L * full.size,
      "rebuild inflated the corpus by probed copies")
    assert(v.groupBy("vec_id").count().filter(col("count") =!= 2L).count() == 0L)
    assert(SimIndex.isFresh(spark, "ivfnp2", df(full)))

    // maintained == one-shot nprobe=2 build on the post-drift corpus
    SimIndex.writeIvfIndex(df(full), "ivfnp2one", k = 5, nprobe = 2,
      buckets = 4)
    def partition(prefix: String): Set[Set[Long]] =
      spark.table(s"${prefix}_vectors").select("vec_id", "bucket")
        .collect().groupBy(_.getInt(1)).values
        .map(_.map(_.getLong(0)).toSet).toSet
    assert(partition("ivfnp2") == partition("ivfnp2one"))

    // an all-ZERO-NORM batch is no evidence either (r16 review fix):
    // the residual histogram excludes direction-less vectors, so the
    // live histogram is empty and the PSI guard short-circuits instead
    // of reading the overflow bucket as maximal drift
    val centsAfter = spark.table("ivfnp2_centroids").collect().toSet
    val zeros = (0 until 5).map(i => (5000L + i, Seq.fill(dim)(0f)))
    assert(!SimIndex.appendIvfIndexWithRefresh(df(zeros), "ivfnp2"))
    assert(spark.table("ivfnp2_centroids").collect().toSet == centsAfter)
  }

  test("IVF index: within-bucket join is Exchange-free and matches fresh assignment") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("ivfidx_centroids", "ivfidx_vectors")
    val vecs = Tables.load(spark, sfDir, "embeddings")
    SimIndex.writeIvfIndex(vecs, "ivfidx", k = 4, nprobe = 2, buckets = 4)

    withoutAutoBroadcast {
      val v = spark.table("ivfidx_vectors")
      val a = v.select(col("vec_id").as("a_id"), col("bucket"))
      val b = v.select(col("vec_id").as("b_id"), col("bucket").as("b_bucket"))
      val joined = a.join(b,
        col("bucket") === col("b_bucket") && col("a_id") < col("b_id"))
      val exchanges = physical(joined).collect {
        case e: Exchange => e
      }
      assert(exchanges.isEmpty,
        s"expected exchange-free bucket join, found ${exchanges.map(_.nodeName)}")
    }

    // pair set from the index == pair set from a fresh seeded build
    val fromIdx = SimIndex.ivfPairsFromIndex(spark, "ivfidx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val centroids = Similarity.kmeansCentroids(vecs, 4, maxIter = 10)
    val assigned = Similarity.ivfAssign(vecs, centroids, nprobe = 2)
    val ab = vecs.join(assigned, "vec_id")
      .select(col("vec_id"), col("bucket"))
    val fresh = ab.select(col("vec_id").as("a_id"), col("bucket"))
      .join(ab.select(col("vec_id").as("b_id"), col("bucket").as("bb")),
        col("bucket") === col("bb") && col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIdx == fresh && fromIdx.nonEmpty)
  }

  test("l02c indexed LSH near-dedup equals the from-scratch l02b pipeline") {
    val prefix = "graft_lsh_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    dropIdx(s"${prefix}_bands", s"${prefix}_sigs")
    val fromIdx = SparkEntry.queries("l02c_lsh_indexed")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val fresh = SparkEntry.queries("l02b_lsh_near_dedup")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(fromIdx == fresh && fromIdx.nonEmpty)
  }

  test("staleness signature: mutated base table fails fast, fresh base passes") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("staleidx_bands", "staleidx_sigs", "staleidx_meta")
    val docs = Tables.load(spark, sfDir, "documents")
    SimIndex.writeLshIndex(docs, "staleidx", numHashes = 16, bands = 8,
      buckets = 2)
    // fresh base: the verified read succeeds and returns candidates
    assert(SimIndex.isFresh(spark, "staleidx", docs))
    assert(SimIndex.lshCandidatesFromIndex(spark, "staleidx",
      verifyAgainst = Some(docs)).count() > 0)
    // the SAME base re-derived (new DataFrame, same content) still passes
    // — the signature is content-based, not object-identity-based
    assert(SimIndex.isFresh(spark, "staleidx",
      Tables.load(spark, sfDir, "documents")))
    // mutated base (one doc dropped — e.g. a regenerated fixture): the
    // verified read must fail FAST with a rebuild hint, not silently
    // serve candidates built from the old corpus
    val mutated = docs.filter(col("doc_id") =!= 0L)
    assert(!SimIndex.isFresh(spark, "staleidx", mutated))
    val e = intercept[IllegalStateException] {
      SimIndex.lshCandidatesFromIndex(spark, "staleidx",
        verifyAgainst = Some(mutated))
    }
    assert(e.getMessage.contains("STALE") && e.getMessage.contains("Rebuild"))
    // unverified reads stay permitted (the check is opt-in — it costs a
    // base-table scan)
    assert(SimIndex.lshCandidatesFromIndex(spark, "staleidx").count() > 0)
    // a missing meta table (pre-signature index) reads as stale, not fresh
    spark.sql("DROP TABLE IF EXISTS staleidx_meta")
    assert(!SimIndex.isFresh(spark, "staleidx", docs))
  }

  test("staleness signature is not xor-blind: duplicate-row-pair mutations detected") {
    import spark.implicits._
    // under the old bit_xor signature these two bases collide exactly:
    // xor self-cancels each duplicated row, leaving h(r2) for both.
    // Same row count, same column set — only the content sum tells them
    // apart.
    val a = Seq(("r1", 1L), ("r1", 1L), ("r2", 2L)).toDF("k", "v")
    val b = Seq(("r2", 2L), ("r3", 3L), ("r3", 3L)).toDF("k", "v")
    val (na, siga) = SimIndex.signature(a)
    val (nb, sigb) = SimIndex.signature(b)
    assert(na == nb, "fixture must hold row count equal")
    assert(siga != sigb, "duplicate-pair mutation must change the signature")
    // and the signature stays order-insensitive: a reshuffled copy matches
    val (nc, sigc) = SimIndex.signature(a.orderBy(desc("v")).repartition(3))
    assert((na, siga) == ((nc, sigc)))
  }

  test("shingle index: decontamination matches the string-keyed pass, index side Exchange-free") {
    dropIdx("deconidx_shingles")
    val d = Tables.load(spark, sfDir, "documents")
    val bench = d.filter(col("doc_id") % 20 === 0)
    val train = d.filter(col("doc_id") % 20 =!= 0)
    SimIndex.writeShingleIndex(bench, "deconidx", n = 20, buckets = 4)

    // survivors via the persisted hashed index == survivors via the
    // from-scratch string-keyed semi join (l10's path)
    val fromIdx = SimIndex.decontaminateFromIndex(spark, train, "deconidx", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val benchSh = Text.shingles(bench, 20).select("shingle").distinct()
    val contaminated = Text.shingles(train, 20)
      .join(benchSh, "shingle").select("doc_id").distinct()
    val fresh = train.join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fromIdx == fresh && fromIdx.nonEmpty && fromIdx.size < 475)

    // plan shape: the contamination join shuffles ONLY the train side —
    // the bucketed index side must come in without an Exchange. Pinning
    // the exchange KIND and SIDE matters: a BroadcastExchange of the
    // index side would also pass a bare "<= 1 Exchange" count while
    // silently bypassing the bucket locality this index exists for.
    withoutAutoBroadcast {
      val trainSh = Text.shingles(train, 20)
        .select(col("doc_id"), org.apache.spark.sql.functions
          .xxhash64(col("shingle")).as("sh_hash"))
      val joined = trainSh.join(spark.table("deconidx_shingles"), "sh_hash")
      val exchanges = physical(joined).collect {
        case e: Exchange => e
      }
      // two train-side shuffles are inherent (the shingle dedup inside
      // Text.shingles + the join routing); what the index buys is that
      // NEITHER is a broadcast and the bucketed scan sits under none
      assert(exchanges.size <= 2 &&
          exchanges.forall(_.isInstanceOf[ShuffleExchangeExec]),
        s"expected only train-side ShuffleExchanges, " +
          s"found ${exchanges.map(_.nodeName)}")
      assert(!exchanges.exists(_.toString.contains("deconidx_shingles")),
        "the bucketed index scan must not sit under any Exchange")
    }
  }

  test("LSH delete: tombstone + signature retraction — candidates == " +
      "fresh build on survivors, replay idempotent, vacuum preserves, " +
      "tombstoned re-append is loud") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx(Seq("lshdel", "lshdelref").flatMap(p => Seq(s"${p}_bands",
      s"${p}_sigs", s"${p}_meta", s"${p}_tombstones")): _*)
    val docs = Tables.load(spark, sfDir, "documents")
    val deleted = docs.filter(col("doc_id") % 7 === 3)
    val surviving = docs.filter(col("doc_id") % 7 =!= 3)
    SimIndex.writeLshIndex(docs, "lshdel", numHashes = 32, bands = 16,
      buckets = 4)
    // the delete batch REPEATS every row (at-least-once CDC upstream):
    // the retraction must fire once per row image, not per occurrence
    SimIndex.deleteFromLshIndex(deleted.unionAll(deleted), "lshdel")
    // signature: retracted to exactly the surviving corpus
    assert(SimIndex.isFresh(spark, "lshdel", surviving))
    assert(!SimIndex.isFresh(spark, "lshdel", docs))
    // maintained-after-delete == from-scratch on the surviving corpus
    def pairs(prefix: String) =
      SimIndex.lshCandidatesFromIndex(spark, prefix)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    SimIndex.writeLshIndex(surviving, "lshdelref", numHashes = 32,
      bands = 16, buckets = 4)
    val got = pairs("lshdel")
    assert(got == pairs("lshdelref") && got.nonEmpty)
    // replay idempotence: re-applying the same delete changes nothing,
    // and deleting never-indexed ids is a no-op
    SimIndex.deleteFromLshIndex(deleted, "lshdel")
    SimIndex.deleteFromLshIndex(
      deleted.withColumn("doc_id", col("doc_id") + 1000000L), "lshdel")
    assert(SimIndex.isFresh(spark, "lshdel", surviving))
    assert(pairs("lshdel") == got)
    // re-appending a tombstoned doc must fail fast (vacuum first)
    intercept[IllegalStateException] {
      SimIndex.appendLshIndex(deleted.limit(1), "lshdel")
    }
    // vacuum: physical rows drop, semantics unchanged
    SimIndex.vacuumIndex(spark, "lshdel")
    assert(!spark.catalog.tableExists("lshdel_tombstones"))
    val delIds = deleted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(spark.table("lshdel_bands")
      .filter(col("doc_id").isInCollection(delIds)).count() == 0)
    assert(pairs("lshdel") == got)
    assert(SimIndex.isFresh(spark, "lshdel", surviving))
  }

  test("IVF delete: pairs drop the deleted ids (centroids frozen), " +
      "zero-norm deletes retract nothing, drift rebuild excludes " +
      "tombstones and clears them") {
    import spark.implicits._
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("ivfdel_centroids", "ivfdel_vectors", "ivfdel_meta",
      "ivfdel_res_hist", "ivfdel_tombstones")
    val dim = 8
    def cluster(axis: Int, n: Int, idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(dim)(0f)
        v(axis) = 1f
        (0 until dim).foreach(d =>
          v(d) += (((idBase + i) * 31 + d * 7) % 11 - 5) * 0.01f)
        (idBase + i, v.toSeq)
      }
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    val corpus = cluster(0, 30, 0L) ++ cluster(1, 30, 100L)
    val delRows = corpus.filter(_._1 % 5 == 2)
    val surv = corpus.filterNot(_._1 % 5 == 2)
    SimIndex.writeIvfIndex(df(corpus), "ivfdel", k = 4, nprobe = 1,
      buckets = 4)
    val before = SimIndex.ivfPairsFromIndex(spark, "ivfdel")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    SimIndex.deleteFromIvfIndex(df(delRows), "ivfdel")
    // frozen-centroid delete semantics: exactly the pre-delete pairs
    // with any deleted endpoint dropped
    val delIds = delRows.map(_._1).toSet
    val after = SimIndex.ivfPairsFromIndex(spark, "ivfdel",
        verifyAgainst = Some(df(surv)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before.filterNot(p =>
      delIds(p._1) || delIds(p._2)) && after.nonEmpty)
    assert(SimIndex.isFresh(spark, "ivfdel", df(surv)))
    // a zero-norm delete batch retracts nothing (it never counted)
    val zeros = (0 until 3).map(i => (9000L + i, Seq.fill(dim)(0f)))
    SimIndex.deleteFromIvfIndex(df(zeros), "ivfdel")
    assert(SimIndex.isFresh(spark, "ivfdel", df(surv)))
    // and the signature contract holds THROUGH a drift rebuild: drifted
    // batch fires, the rebuild corpus is survivors ∪ batch (tombstoned
    // rows stay out), tombstones clear, signature fresh vs that corpus
    val drift = cluster(5, 25, 500L) ++ cluster(6, 25, 600L)
    assert(SimIndex.appendIvfIndexWithRefresh(df(drift), "ivfdel"))
    assert(!spark.catalog.tableExists("ivfdel_tombstones"))
    val post = surv ++ drift
    assert(SimIndex.isFresh(spark, "ivfdel", df(post)))
    val ids = spark.table("ivfdel_vectors").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == post.map(_._1).toSet)
  }

  test("s47 maintained semantic clusters through the persisted IVF index: " +
      "foreachBatch fold == one-shot clusters over the index's own pair " +
      "set after EVERY batch; replay no-op; retraction == survivors") {
    import spark.implicits._
    graft.functions.VecFunctions.ensureRegistered(spark)
    SimIndex.dropIndex(spark, "s47t")
    val dim = 8
    def cluster(axis: Int, n: Int, idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(dim)(0f)
        v(axis) = 1f
        (0 until dim).foreach(d =>
          v(d) += (((idBase + i) * 31 + d * 7) % 11 - 5) * 0.01f)
        (idBase + i, v.toSeq)
      }
    val corpus = cluster(0, 24, 0L) ++ cluster(1, 24, 100L)
    def oneShot(): Map[Long, Long] = {
      val pairs = SimIndex.ivfPairsFromIndex(spark, "s47t")
        .filter(col("cos_sim") > 0.4)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      graft.ops.Graphs.connectedComponentsDF(spark, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    var st = graft.streaming.Streams.vecDupInit(spark)
    def snap() = st.labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    implicit val sq = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val q = source.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        st = graft.streaming.Streams.vecDupApplyBatch(spark, st, batch,
          "s47t", threshold = 0.4, k = 4, nprobe = 1, buckets = 4)
        ()
      }.start()
    try {
      corpus.grouped(16).foreach { g =>
        source.addData(g); q.processAllAvailable()
        // the batch-0 fold BUILT the index; later folds appended — and
        // after every fold the maintained labels equal the one-shot CC
        // over the index's OWN filtered pair set
        assert(snap() == oneShot())
      }
    } finally q.stop()
    assert(snap().nonEmpty && snap().values.toSet.size >= 2,
      "both clusters must appear")
    // replaying the last slice: seen ids anti-join away — a no-op
    val last = corpus.takeRight(16).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    st = graft.streaming.Streams.vecDupApplyBatch(spark, st, last,
      "s47t", 0.4, 4, 1, 4)
    assert(snap() == oneShot())
    // crash-retry atomicity (review r19): an append that LANDED whose
    // fold didn't — the at-least-once window between the index write
    // and the state fold — must still fold on retry, because the
    // seen-set gate is IN-STATE, not index-derived; the index side
    // skips the re-append idempotently
    val extra = cluster(2, 6, 200L)
    val extraDf = extra.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    SimIndex.appendIvfIndex(extraDf, "s47t") // the "crashed" half-fold
    st = graft.streaming.Streams.vecDupApplyBatch(spark, st, extraDf,
      "s47t", 0.4, 4, 1, 4) // the retry
    assert(snap() == oneShot())
    assert(snap().keySet.exists(_ >= 200L),
      "the retried batch's vectors must reach the maintained labels")
    // conflicting intra-batch content for one id fails loudly (exact
    // duplicate rows collapse silently)
    val conflict = Seq((9100L, Seq.fill(dim)(1f)), (9100L, Seq.fill(dim)(2f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    assertThrows[IllegalArgumentException] {
      graft.streaming.Streams.vecDupApplyBatch(spark, st, conflict,
        "s47t", 0.4, 4, 1, 4)
    }
    // retraction by row image: tombstoned endpoints leave the pair set
    // (ivfPairsFromIndex anti-joins the same tombstones), incident edges
    // re-color, and the maintained labels track — twice, idempotently
    val dels = (corpus ++ extra).filter(_._1 % 5 == 2)
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    (1 to 2).foreach { _ =>
      st = graft.streaming.Streams.vecDupApplyDelete(spark, st, dels, "s47t")
      assert(snap() == oneShot())
    }
    assert(snap().nonEmpty &&
      snap().keySet.forall(id => id % 5 != 2), "erased ids must drop out")
    // plan shape, bound to the REAL reader: ivfPairsForIds' only
    // ShuffleExchanges are the two semantic ones (the probe-side
    // distinct and the multi-probe dropDuplicates, both bounded by
    // batch/pair volume) — an index-side reshuffle of the bucket join
    // would show up as a third
    withoutAutoBroadcast {
      val someIds = corpus.take(3).map(_._1).toDF("vec_id")
      val shuffles = physical(
        SimIndex.ivfPairsForIds(spark, "s47t", someIds)).collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.length <= 2,
        s"expected at most the 2 semantic shuffles (probe distinct + " +
          s"pair dedup), found ${shuffles.length}")
    }
    // and the structural property behind it: a broadcast id-probe semi
    // join PRESERVES the bucketed scan's output partitioning into the
    // bucket-local self join
    withoutAutoBroadcast {
      val v = spark.table("s47t_vectors")
      val someIds = corpus.take(3).map(_._1).toDF("vec_id")
      val n = v.join(broadcast(someIds), Seq("vec_id"), "left_semi")
      val a = n.select(col("vec_id").as("a_id"), col("bucket"))
      val b = v.select(col("vec_id").as("b_id"),
        col("bucket").as("b_bucket"))
      val joined = a.join(b,
        col("bucket") === col("b_bucket") && col("a_id") =!= col("b_id"))
      val exchanges = physical(joined).collect { case e: Exchange => e }
      assert(exchanges.forall(_.isInstanceOf[
          org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]),
        s"expected only the id-probe broadcast, found " +
          s"${exchanges.map(_.nodeName)}")
    }
  }

  test("IVF vacuum under the shadow-swap discipline: vacuumed pairs == " +
      "tombstone-filtered pairs row-for-row, physical rows drop, the " +
      "vacuumed plan carries no tombstone anti-join, signature intact") {
    import spark.implicits._
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("ivfvac_centroids", "ivfvac_vectors", "ivfvac_meta",
      "ivfvac_res_hist", "ivfvac_tombstones")
    val dim = 8
    def cluster(axis: Int, n: Int, idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(dim)(0f)
        v(axis) = 1f
        (0 until dim).foreach(d =>
          v(d) += (((idBase + i) * 31 + d * 7) % 11 - 5) * 0.01f)
        (idBase + i, v.toSeq)
      }
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    val corpus = cluster(0, 30, 0L) ++ cluster(1, 30, 100L)
    val delRows = corpus.filter(_._1 % 5 == 2)
    val surv = corpus.filterNot(_._1 % 5 == 2)
    SimIndex.writeIvfIndex(df(corpus), "ivfvac", k = 4, nprobe = 1,
      buckets = 4)
    SimIndex.deleteFromIvfIndex(df(delRows), "ivfvac")
    def pairs() = SimIndex.ivfPairsFromIndex(spark, "ivfvac")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = pairs() // tombstone-filtered read
    assert(filtered.nonEmpty)
    // vacuum: the vector table rewrites shadow-then-swap; the read is
    // unchanged while the tombstone anti-join disappears from the plan
    SimIndex.vacuumIndex(spark, "ivfvac")
    assert(!spark.catalog.tableExists("ivfvac_tombstones"))
    val delIds = delRows.map(_._1).toSet
    assert(spark.table("ivfvac_vectors")
      .filter(col("vec_id").isInCollection(delIds)).count() == 0)
    assert(pairs() == filtered)
    assert(SimIndex.isFresh(spark, "ivfvac", df(surv)))
    val plan = SimIndex.ivfPairsFromIndex(spark, "ivfvac")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("anti"),
      "vacuumed IVF read still carries a tombstone anti-join")
  }

  test("IVF signature contract: zero-norm rows never count — write and " +
      "append with zero-norm rows stay fresh vs the indexable subset, " +
      "and a drift rebuild does not go spuriously stale") {
    import spark.implicits._
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("ivfzn_centroids", "ivfzn_vectors", "ivfzn_meta",
      "ivfzn_res_hist", "ivfzn_tombstones")
    val dim = 8
    def cluster(axis: Int, n: Int, idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(dim)(0f)
        v(axis) = 1f
        (0 until dim).foreach(d =>
          v(d) += (((idBase + i) * 31 + d * 7) % 11 - 5) * 0.01f)
        (idBase + i, v.toSeq)
      }
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    val good = cluster(0, 25, 0L) ++ cluster(1, 25, 100L)
    val zeros = (0 until 4).map(i => (8000L + i, Seq.fill(dim)(0f)))
    SimIndex.writeIvfIndex(df(good ++ zeros), "ivfzn", k = 4, nprobe = 1,
      buckets = 4)
    // the signature covers the indexable subset: fresh vs good alone,
    // and the readers filter verifyAgainst the same way, so the RAW
    // base (zero-norm rows included) also passes through the reader
    assert(SimIndex.isFresh(spark, "ivfzn", df(good)))
    SimIndex.ivfPairsFromIndex(spark, "ivfzn",
      verifyAgainst = Some(df(good ++ zeros))).head(1)
    // append with more zero-norm rows: bump covers only the indexable
    val more = cluster(2, 20, 200L)
    val zeros2 = (0 until 3).map(i => (8100L + i, Seq.fill(dim)(0f)))
    SimIndex.appendIvfIndex(df(more ++ zeros2), "ivfzn")
    assert(SimIndex.isFresh(spark, "ivfzn", df(good ++ more)))
    // drifted batch fires a rebuild from the STORED vectors (which never
    // held the zero-norm rows) — with the subset signature the rebuilt
    // index is still fresh vs the indexable base, not stale forever
    val drift = cluster(5, 25, 500L)
    assert(SimIndex.appendIvfIndexWithRefresh(df(drift), "ivfzn"))
    assert(SimIndex.isFresh(spark, "ivfzn", df(good ++ more ++ drift)))
    SimIndex.ivfPairsFromIndex(spark, "ivfzn",
      verifyAgainst = Some(df(good ++ more ++ drift ++ zeros))).head(1)
  }

  test("shingle delete: negative deltas cancel exactly — decontamination " +
      "== string pass vs surviving bench, shared shingles survive, " +
      "vacuum compacts to net-positive rows") {
    dropIdx("shdel_shingles", "shdel_meta", "shdel_tombstones")
    val d = Tables.load(spark, sfDir, "documents")
    val bench = d.filter(col("doc_id") % 20 === 0)
    val delBench = bench.filter(col("doc_id") % 40 === 0)
    val survBench = bench.filter(col("doc_id") % 40 =!= 0)
    val train = d.filter(col("doc_id") % 20 =!= 0)
    SimIndex.writeShingleIndex(bench, "shdel", n = 20, buckets = 4)
    SimIndex.deleteFromShingleIndex(delBench, "shdel")
    assert(SimIndex.isFresh(spark, "shdel", survBench))
    assert(!SimIndex.isFresh(spark, "shdel", bench))
    def survivors(): Set[Long] =
      SimIndex.decontaminateFromIndex(spark, train, "shdel", 20)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // == the from-scratch string-keyed pass against the SURVIVING bench:
    // shingles only the deleted docs contributed stop contaminating,
    // shingles shared with surviving docs still do
    val benchSh = Text.shingles(survBench, 20).select("shingle").distinct()
    val contaminated = Text.shingleStream(train, 20)
      .join(benchSh, "shingle").select("doc_id").distinct()
    val exact = train.join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = survivors()
    assert(got == exact && got.nonEmpty)
    // replay idempotence
    SimIndex.deleteFromShingleIndex(delBench, "shdel")
    assert(SimIndex.isFresh(spark, "shdel", survBench))
    assert(survivors() == got)
    // membership guard (r18): deleting a NEVER-ingested doc retracts
    // nothing — without the _docs sidecar its negative deltas would push
    // shared shingles' net counts down, silently weakening
    // decontamination for readers that skip verifyAgainst
    SimIndex.deleteFromShingleIndex(
      delBench.withColumn("doc_id", col("doc_id") + 5000000L), "shdel")
    assert(SimIndex.isFresh(spark, "shdel", survBench))
    assert(survivors() == got)
    // vacuum: one net-positive row per live hash, same result
    SimIndex.vacuumIndex(spark, "shdel")
    val compacted = spark.table("shdel_shingles")
    assert(compacted.count() ==
      compacted.select("sh_hash").distinct().count())
    assert(compacted.filter(col("nd") <= 0).count() == 0)
    assert(survivors() == got)
    assert(SimIndex.isFresh(spark, "shdel", survBench))
  }

  test("registry l02h (vacuumed read) == l02e (tombstone-filtered " +
      "read) row-for-row, and the vacuumed candidate plan carries no " +
      "anti-join") {
    // fresh state for both prefixes — the registry builders are
    // idempotent per (session, dir) but a half-done leftover from an
    // aborted run must not leak in
    Seq("graft_lshdel_", "graft_lshvac_").foreach { p =>
      val prefix = p + sfDir.replaceAll("[^A-Za-z0-9]", "_")
      dropIdx(Seq("_bands", "_sigs", "_meta", "_tombstones")
        .map(prefix + _): _*)
    }
    val a = SparkEntry.queries("l02e_lsh_deleted")(spark, sfDir)
      .collect().toSeq
    val b = SparkEntry.queries("l02h_lsh_vacuumed")(spark, sfDir)
      .collect().toSeq
    assert(a.nonEmpty && a == b, "vacuumed read != tombstone read")
    // the vacuumed index has no tombstone table, so its candidate read
    // plans WITHOUT the anti-join (the cost the vacuum buys back)
    val vacPrefix = "graft_lshvac_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    assert(!spark.catalog.tableExists(s"${vacPrefix}_tombstones"))
    val plan = SimIndex.lshCandidatesFromIndex(spark, vacPrefix)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"),
      "vacuumed candidate plan still carries a tombstone anti-join")
  }

  test("row-uniqueness contract: duplicate ids are rejected loudly at " +
      "write and append time (the delete-retraction precondition)") {
    import spark.implicits._
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("uniq_bands", "uniq_sigs", "uniq_meta", "uniq_shingles",
      "uniq_docs", "uniqv_centroids", "uniqv_vectors", "uniqv_meta",
      "uniqv_res_hist")
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val duped = docs.unionAll(docs.limit(5))
    intercept[IllegalArgumentException] {
      SimIndex.writeLshIndex(duped, "uniq", numHashes = 32, bands = 16,
        buckets = 2)
    }
    intercept[IllegalArgumentException] {
      SimIndex.writeShingleIndex(duped, "uniq", n = 20, buckets = 2)
    }
    // append path: a clean build, then a duplicated batch is rejected
    SimIndex.writeLshIndex(docs, "uniq", numHashes = 32, bands = 16,
      buckets = 2)
    val more = docs.limit(5).withColumn("doc_id", col("doc_id") + 100000L)
    intercept[IllegalArgumentException] {
      SimIndex.appendLshIndex(more.unionAll(more), "uniq")
    }
    // vector flavor: duplicate vec_ids rejected at write
    val dim = 8
    val rows = (0 until 10).map { i =>
      val v = Array.fill(dim)(0f); v(i % dim) = 1f; (i.toLong, v.toSeq)
    }
    val vdf = (rows ++ rows.take(2)).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    intercept[IllegalArgumentException] {
      SimIndex.writeIvfIndex(vdf, "uniqv", k = 2, nprobe = 1, buckets = 2)
    }
  }

  test("IVF-PQ delete: search drops deleted ids, signature retracts to " +
      "the surviving indexable corpus") {
    import spark.implicits._
    graft.functions.VecFunctions.ensureRegistered(spark)
    dropIdx("pqdel_centroids", "pqdel_pq_codebooks", "pqdel_pq_codes",
      "pqdel_meta", "pqdel_res_hist", "pqdel_tombstones")
    val dim = 8
    def cluster(axis: Int, n: Int, idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(dim)(0f)
        v(axis) = 1f
        (0 until dim).foreach(d =>
          v(d) += (((idBase + i) * 31 + d * 7) % 11 - 5) * 0.01f)
        (idBase + i, v.toSeq)
      }
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    val corpus = cluster(0, 30, 0L) ++ cluster(1, 30, 100L)
    SimIndex.writeIvfPqIndex(df(corpus), "pqdel", nCentroids = 4, m = 4,
      dims = dim, k = 8, buckets = 4)
    val q = {
      val v = Array.fill(dim)(0f); v(0) = 1f; v.toSeq
    }
    val before = SimIndex.ivfPqSearch(spark, "pqdel", q, nprobe = 2,
      topk = 10).collect().map(_.getLong(0))
    val delRows = corpus.filter(r => before.take(3).contains(r._1))
    SimIndex.deleteFromIvfPqIndex(df(delRows), "pqdel")
    val surv = corpus.filterNot(r => delRows.map(_._1).contains(r._1))
    assert(SimIndex.isFresh(spark, "pqdel", df(surv)))
    val after = SimIndex.ivfPqSearch(spark, "pqdel", q, nprobe = 2,
      topk = 10, verifyAgainst = Some(df(surv)))
      .collect().map(_.getLong(0)).toSet
    assert(delRows.map(_._1).forall(id => !after(id)) && after.nonEmpty)
    // vacuum drops the code rows physically, search unchanged
    SimIndex.vacuumIndex(spark, "pqdel")
    assert(spark.table("pqdel_pq_codes")
      .filter(col("vec_id").isInCollection(delRows.map(_._1))).count() == 0)
    assert(SimIndex.ivfPqSearch(spark, "pqdel", q, nprobe = 2, topk = 10)
      .collect().map(_.getLong(0)).toSet == after)
  }

  test("vacuum crash recovery: a swap interrupted in its metadata-only " +
      "window (shadow stranded, original gone) is finished on the next " +
      "read — same-session and cross-session shapes") {
    import graft.ops.Bucketing
    dropIdx("lshcrash_bands", "lshcrash_sigs", "lshcrash_meta",
      "lshcrash_tombstones", "lshcrash_bands__vacuum")
    val docs = Tables.load(spark, sfDir, "documents")
    SimIndex.writeLshIndex(docs, "lshcrash", numHashes = 32, bands = 16,
      buckets = 4)
    def pairs() = SimIndex.lshCandidatesFromIndex(spark, "lshcrash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pairs()
    assert(want.nonEmpty)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")

    // --- same-session shape: shadow still a catalog (managed) table,
    // original dropped — exactly the state after rewriteSwap's DROP and
    // before its RENAME, with the crashing process still alive.
    val desc = Bucketing.readDescriptor(spark, "lshcrash_bands").get
    val keys = desc.getProperty("keys").split(',').toSeq
    val sorts = desc.getProperty("sorts").split(',').toSeq
    val buckets = desc.getProperty("buckets").toInt
    spark.sql("DROP TABLE IF EXISTS lshcrash_bands__vacuum")
    Bucketing.dropStaleLocation(spark, "lshcrash_bands__vacuum")
    Bucketing.writeBucketedMulti(spark.table("lshcrash_bands"),
      "lshcrash_bands__vacuum", keys, buckets, sorts)
    spark.sql("DROP TABLE lshcrash_bands")
    Bucketing.dropStaleLocation(spark, "lshcrash_bands")
    assert(pairs() == want) // reattachAll finished the swap
    assert(spark.catalog.tableExists("lshcrash_bands"))
    assert(!spark.catalog.tableExists("lshcrash_bands__vacuum"))

    // --- cross-session shape: the crashed process is gone, so the new
    // session's catalog knows NEITHER name; only the shadow's files +
    // descriptor survive in the warehouse. Simulate by moving the live
    // table's directory to the shadow name and purging the catalog
    // entry (its recorded location no longer exists, so the managed
    // drop deletes nothing).
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loc = new org.apache.hadoop.fs.Path(wh, "lshcrash_bands")
    val shadowLoc = new org.apache.hadoop.fs.Path(wh,
      "lshcrash_bands__vacuum")
    if (fs.exists(shadowLoc)) fs.delete(shadowLoc, true)
    assert(fs.rename(loc, shadowLoc))
    spark.sql("DROP TABLE IF EXISTS lshcrash_bands")
    assert(!fs.exists(loc) && fs.exists(shadowLoc))
    assert(pairs() == want) // recoverShadow moved the files back
    assert(fs.exists(loc) && !fs.exists(shadowLoc))
    dropIdx("lshcrash_bands", "lshcrash_sigs", "lshcrash_meta")
  }
}
