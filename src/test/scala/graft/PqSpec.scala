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
