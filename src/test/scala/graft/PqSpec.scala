package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization gates (SURVEY L21): the ADC linearity identity
  * (ADC dot == dot(query, reconstruction) — exact by construction, so
  * it's an equality assert, not a tolerance), code-shape invariants, and
  * measured recall against the exact dot scan on the fixture embeddings.
  */
class PqSpec extends SparkSpecBase {

  private val (m, dims, k) = (8, 64, 32)

  test("ADC identity: adc_dot == dot(query, reconstructed codes) exactly") {
    import spark.implicits._
    val vecs = graft.Tables.load(spark, sfDir, "embeddings").limit(50)
    val cb = Similarity.pqTrain(vecs, m, dims, k)
    val codes = Similarity.pqEncode(vecs, cb, m, dims)
    val q = vecs.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val adc = Similarity.pqAdcKnn(codes, cb, q, m, dims, k = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reconstruct each vector from its codes and dot with q in exact
    // double arithmetic (same per-subspace partial sums the table uses)
    val book = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val sub = dims / m
    val qd = q.map(_.toDouble)
    val codeRows = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codeRows.foreach { case (id, cs) =>
      assert(cs.length == m && cs.forall(c => c >= 0 && c < k))
      val recon = (0 until m).flatMap(j => book((j, cs(j))))
      val exact = (0 until m).map(j =>
        (0 until sub).map(i => qd(j * sub + i) * recon(j * sub + i)).sum).sum
      assert(math.abs(adc(id) - exact) < 1e-9,
        s"vec $id: adc=${adc(id)} recon-dot=$exact")
    }
  }

  test("PQ recall vs the exact dot scan, and determinism across runs") {
    graft.functions.VecFunctions.ensureRegistered(spark)
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
    val q = vecs.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val qCol = array(q.map(v => lit(v)): _*)
    val exactTop = vecs.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Similarity.dot(col("embedding"), qCol).as("d"))
      .orderBy(desc("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    // The production shape is shortlist-then-rerank: ADC proposes a
    // candidate set, the exact metric reranks it. Gate the SHORTLIST
    // recall (exact top-10 inside the ADC top-50 of 500 — random
    // shortlisting would catch 10%), plus direct top-10 overlap well
    // above chance (chance = 10/500 = 2%). The fixture embeddings are
    // near-random — PQ's hardest case — so these floors are conservative.
    def run(n: Int): Seq[Long] = {
      val cb = Similarity.pqTrain(vecs, m, dims, k)
      val codes = Similarity.pqEncode(vecs, cb, m, dims)
      Similarity.pqAdcKnn(codes.filter(col("vec_id") =!= 0), cb, q,
        m, dims, k = n).collect().map(_.getLong(0)).toSeq
    }
    val shortlist = run(50)
    val shortRecall = shortlist.toSet.intersect(exactTop).size / 10.0
    val top10 = run(10)
    val directRecall = top10.toSet.intersect(exactTop).size / 10.0
    info(f"PQ(m=$m, k=$k) shortlist-50 recall = $shortRecall%.2f, " +
      f"direct recall@10 = $directRecall%.2f")
    assert(shortRecall >= 0.5, s"PQ shortlist recall $shortRecall")
    assert(directRecall >= 0.1, s"PQ direct recall $directRecall")
    assert(run(10) == top10, "seeded PQ must reproduce exactly")
  }

  test("IVF-PQ append + drift refresh: frozen-codebook insert == full-corpus " +
      "re-encode; drifted batch rebuilds from the supplied corpus; recall recovers") {
    import spark.implicits._
    import graft.ops.{Bucketing, SimIndex}
    graft.functions.VecFunctions.ensureRegistered(spark)
    val pfx = Seq("pqdrift", "pqstale")
    pfx.foreach(p => Seq("_centroids", "_pq_codebooks", "_pq_codes",
      "_meta", "_res_hist").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $p$t")
      Bucketing.dropStaleLocation(spark, p + t)
    })
    // the SimIndexSpec drift fixture: clusters on axes 0/1/2 at build,
    // drift clusters on 5/6, deterministic jitter
    val d8 = 8
    def cluster(axis: Int, n: Int, idBase: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(d8)(0f)
        v(axis) = 1f
        (0 until d8).foreach(d =>
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

    SimIndex.writeIvfPqIndex(df(corpusA), "pqdrift", nCentroids = 5,
      m = 2, dims = d8, k = 4, buckets = 4)
    // frozen-codebook insert: append == re-encoding the FULL corpus
    // against the ORIGINAL centroids + codebooks (the IVF-append
    // discipline, lifted to codes)
    val centsA = spark.table("pqdrift_centroids").collect().toSet
    val booksA = spark.table("pqdrift_pq_codebooks").collect().toSet
    SimIndex.appendIvfPqIndex(df(batchA2), "pqdrift")
    assert(SimIndex.isFresh(spark, "pqdrift", df(corpusA ++ batchA2)))
    assert(spark.table("pqdrift_centroids").collect().toSet == centsA)
    assert(spark.table("pqdrift_pq_codebooks").collect().toSet == booksA)
    val gotCodes = spark.table("pqdrift_pq_codes").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    val unitFull = df(corpusA ++ batchA2)
      .select(col("vec_id"), transform(
        Similarity.l2normalize(col("embedding")), _.cast("float"))
        .as("embedding"))
    val assignedAll = Similarity.ivfAssign(unitFull,
      spark.table("pqdrift_centroids"), nprobe = 1)
    val residAll = unitFull.join(assignedAll, "vec_id")
      .join(spark.table("pqdrift_centroids")
        .select(col("cid").as("bucket"), col("centroid")), "bucket")
      .select(col("vec_id"), col("bucket"),
        zip_with(col("embedding"), col("centroid"),
          (x, c) => x.cast("double") - c).as("embedding"))
    val wantCodes = Similarity.pqEncode(residAll,
        spark.table("pqdrift_pq_codebooks"), 2, d8)
      .join(residAll.select("vec_id", "bucket"), "vec_id")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("bucket"), r.getAs[scala.collection.Seq[Int]]("codes").toSeq)))
      .toMap
      .map { case (k2, (b, cs)) => k2 -> ((b, cs: Seq[Int])) }
    assert(gotCodes.size == wantCodes.size && gotCodes.keySet.forall(k2 =>
      gotCodes(k2)._1 == wantCodes(k2)._1 &&
        gotCodes(k2)._2.toSeq == wantCodes(k2)._2.toSeq))

    // drift gate: in-distribution batch appends quietly; the orthogonal
    // batch fires a WHOLESALE rebuild from the supplied corpus (PQ codes
    // are lossy — the index cannot rebuild itself)
    assert(!SimIndex.appendIvfPqIndexWithRefresh(
      df(cluster(2, 5, 900L)), "pqdrift",
      df(corpusA ++ batchA2 ++ cluster(2, 5, 900L))))
    val fullWith900 = corpusA ++ batchA2 ++ cluster(2, 5, 900L) ++ batchB
    assert(SimIndex.appendIvfPqIndexWithRefresh(df(batchB), "pqdrift",
      df(fullWith900)))
    assert(spark.table("pqdrift_centroids").collect().toSet != centsA)
    assert(SimIndex.isFresh(spark, "pqdrift", df(fullWith900)))

    // stale counterfactual: append-only intake of the same batches
    SimIndex.writeIvfPqIndex(df(corpusA), "pqstale", nCentroids = 5,
      m = 2, dims = d8, k = 4, buckets = 4)
    SimIndex.appendIvfPqIndex(df(batchA2), "pqstale")
    SimIndex.appendIvfPqIndex(df(cluster(2, 5, 900L)), "pqstale")
    SimIndex.appendIvfPqIndex(df(batchB), "pqstale")

    // shortlist-30 vs exact top-10 (the suite's PQ-recall discipline:
    // the shortlist absorbs quantization near-tie swaps; what's
    // measured is whether the right BUCKET holds the answers)
    def recall(prefix: String): Double = {
      val per = queries.map { case (_, q) =>
        val got = SimIndex.ivfPqSearch(spark, prefix, q, nprobe = 1,
          topk = 30).collect().map(_.getLong(0)).toSet
        val qCol = array(q.map(v => lit(v)): _*)
        val exact = df(fullWith900)
          .select(col("vec_id"),
            Similarity.cosine(col("embedding"), qCol).as("d"))
          .orderBy(desc("d"), col("vec_id")).limit(10)
          .collect().map(_.getLong(0)).toSet
        (got & exact).size.toDouble / exact.size
      }
      per.sum / per.size
    }
    val (rFresh, rStale) = (recall("pqdrift"), recall("pqstale"))
    info(f"IVF-PQ drift recall: refreshed $rFresh%.2f vs stale $rStale%.2f")
    assert(rFresh >= 0.9, s"refreshed IVF-PQ recall $rFresh < 0.9")
    assert(rFresh > rStale,
      s"refresh did not improve recall ($rFresh <= $rStale)")
    // the reference histogram moved with the rebuild: a second
    // post-drift batch appends quietly
    assert(!SimIndex.appendIvfPqIndexWithRefresh(
      df(cluster(5, 5, 950L)), "pqdrift",
      df(fullWith900 ++ cluster(5, 5, 950L))))
  }

  test("r20 LUT scoring: exactly equal to the join/agg ADC form, zero Exchange") {
    import graft.ops.{Bucketing, SimIndex}
    val vecs = graft.Tables.load(spark, sfDir, "embeddings").limit(100)
    val cb = Similarity.pqTrain(vecs, m, dims, k)
    val codes = Similarity.pqEncode(vecs, cb, m, dims)
    val q = vecs.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    // (a) pqAdcKnn's literal-lookup scores == the r19 posexplode +
    // broadcast-join + groupBy form, bitwise (same left-to-right
    // subspace accumulation order)
    val neu = Similarity.pqAdcKnn(codes, cb, q, m, dims, k = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val old = codes.select(col("vec_id"),
        posexplode(col("codes")).as(Seq("subspace", "cid")))
      .join(broadcast(Similarity.adcTable(cb, q)), Seq("subspace", "cid"))
      .groupBy("vec_id").agg(sum(col("pdot")).as("adc_dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(neu.keySet == old.keySet)
    neu.foreach { case (id, s) =>
      assert(s == old(id), s"vec $id: lut=$s joinAgg=${old(id)}") }
    // (b) the probe plan is Exchange-free: scan -> project ->
    // TakeOrderedAndProject (the whole point of the r20 rewrite)
    val prefix = "graft_test_ivfpq_lut"
    Seq("_centroids", "_pq_codebooks", "_pq_codes", "_meta").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $prefix$t")
      Bucketing.dropStaleLocation(spark, prefix + t)
    }
    SimIndex.writeIvfPqIndex(vecs, prefix, nCentroids = 4, m = m,
      dims = dims, k = k, buckets = 4)
    val probe = SimIndex.ivfPqSearch(spark, prefix, q, nprobe = 2, topk = 10)
    probe.write.format("noop").mode("overwrite").save()
    val exchanges = probe.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"ivfPqSearch probe should be Exchange-free, found:\n$exchanges")
  }

  test("IVF-PQ persisted index: score identity incl. coarse term, self-match, recall") {
    import graft.ops.{Bucketing, SimIndex}
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
    val prefix = "graft_test_ivfpq"
    Seq("_centroids", "_pq_codebooks", "_pq_codes", "_meta").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $prefix$t")
      Bucketing.dropStaleLocation(spark, prefix + t)
    }
    SimIndex.writeIvfPqIndex(vecs, prefix, nCentroids = 8, m = m,
      dims = dims, k = k, buckets = 4)
    val q = vecs.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val qd = q.map(_.toDouble)
    val res = SimIndex.ivfPqSearch(spark, prefix, q, nprobe = 2, topk = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(res.length == 50)
    // the query vector is in the corpus: when its bucket is probed (it
    // is — the nearest centroid to q IS its home), q must rank FIRST
    // (its reconstruction is the best quantization of itself)
    assert(res.head._1 == 0L, s"self-match not first: ${res.take(3).toSeq}")
    // identity: score == dot(q, centroid_bucket) + dot(q, recon(codes))
    val cents = spark.table(s"${prefix}_centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val book = spark.table(s"${prefix}_pq_codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val codeRows = spark.table(s"${prefix}_pq_codes").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    val sub = dims / m
    res.foreach { case (id, score) =>
      val (bucket, cs) = codeRows(id)
      val c = cents(bucket)
      val coarse = (0 until dims).map(i => qd(i) * c(i)).sum
      val adc = (0 until m).map { j =>
        val cw = book((j, cs(j)))
        (0 until sub).map(i => qd(j * sub + i) * cw(i)).sum
      }.sum
      assert(math.abs(score - (coarse + adc)) < 1e-9,
        s"vec $id: score=$score recomputed=${coarse + adc}")
    }
    // shortlist recall vs the exact COSINE scan — the index stores
    // unit-norm vectors, so cosine is its metric (residual PQ + 2-probe
    // over 8 buckets: candidates outside probed buckets are unreachable,
    // so this measures the IVF pruning AND the quantization together)
    graft.functions.VecFunctions.ensureRegistered(spark)
    val qCol = array(q.map(v => lit(v)): _*)
    val exactTop = vecs.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        graft.ops.Similarity.cosine(col("embedding"), qCol).as("d"))
      .orderBy(desc("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = res.map(_._1).toSet.intersect(exactTop).size / 10.0
    info(f"IVF-PQ(nprobe=2/8, m=$m, k=$k) shortlist-50 recall = $recall%.2f")
    assert(recall >= 0.3, s"IVF-PQ shortlist recall $recall")
  }
}
