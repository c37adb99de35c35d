package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity / dedup operators (SURVEY.md §2.5). Exact forms are the
  * correctness contract at test scale; the LSH variants are the 100 TB
  * path (candidate generation via banding/bucketing joins so the
  * all-pairs cross join never materializes).
  */
object Similarity {

  /** Estimated compact-set payload above which [[exactJaccardCompact]]'s
    * adaptive default stops broadcasting the per-doc hash sets and plans
    * shuffled hash joins instead — same role as
    * [[Graphs.FrontierBroadcastRows]] for traversal frontiers.
    */
  val BroadcastSetBytes: Long = 64L << 20

  /** Sequential-fold dot product of two float-array columns in double
    * precision via the native codegen'd [[graft.functions.FloatVecDot]]
    * expression (identical fold order to the interpreted HOF form and the
    * DuckDB oracle — bit-for-bit). Requires
    * `VecFunctions.ensureRegistered(spark)` in the session.
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Interpreted HOF twin of [[dot]] — no registration needed; kept as the
    * reference implementation (property tests assert dot == dotHof).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy of a vector (double elements). The norm is
    * materialized once per row via array_repeat — a naive
    * `transform(a, _ / norm(a))` re-folds the whole array per element
    * (O(d²); HOFs get no common-subexpression elimination).
    */
  def l2normalize(a: Column): Column =
    zip_with(a, array_repeat(norm(a), size(a)),
      (x, n) => x.cast("double") / n)

  /** Exact all-pairs cosine over an embeddings table (vec_id, embedding),
    * restricted to a_id < b_id. Norms are computed ONCE per vector before
    * the join (cheap pre-projection) rather than per pair. Zero-norm
    * vectors are excluded up front: cosine is undefined for them, and a
    * NaN cos_sim is a trap for Column-form callers (Spark orders NaN
    * GREATER than every value, so `cos_sim > t` silently passes NaN) —
    * dropping them matches the blocked kernels' explicit NaN skip.
    * Quadratic — test-scale / within-LSH-bucket use only.
    */
  def allPairsCosine(vecs: DataFrame): DataFrame = {
    val withNorm = vecs.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0.0)
    val a = withNorm.select(col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = withNorm.select(col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
          .as("cos_sim"))
  }

  /** Exact top-k cosine pairs, fully distributed — no driver-side collect
    * of the vector table and no all-pairs join materialization.
    *
    * Block-partitioned pair enumeration: each vector belongs to block
    * `vec_id % blocks`; every unordered block pair (lo, hi) is one group,
    * and each vector is replicated to the `blocks` groups it participates
    * in. One shuffle of `blocks × n` narrow rows, then each group runs a
    * primitive-array dot kernel over its (at most two) blocks with a
    * bounded top-k heap, emitting ≤ k rows; `TakeOrdered` merges the
    * `blocks·(blocks+1)/2 × k` survivors. O(n²d) compute spread over
    * `blocks²/2` independent tasks, per-task memory O(n·d/blocks) — size
    * `blocks` so two blocks fit an executor and the same plan runs at
    * 100 TB (the quadratic is inherent to EXACT top-k; L03b's IVF path is
    * the sub-quadratic approximate variant).
    *
    * Selection order is (cosine rounded to 4 decimals DESC, a_id, b_id) —
    * the same total order the DuckDB oracle sorts by, so the returned set
    * is deterministic even under rounded ties. The dot/norm folds run in
    * dimension order in double precision, the exact op order of the column
    * form and the DuckDB oracle — bit-identical before rounding.
    */
  /** Block id for a vector id: a 64-bit avalanche mix (splitmix64
    * finalizer) before the residue, so blocks stay balanced for ANY id
    * distribution. Raw `id % blocks` collapses strided/sharded id schemes
    * (e.g. all ids multiples of 16) into one block — reverting the
    * block-partitioned kernel to a single quadratic task.
    */
  private def blockOf(id: Long, nb: Int): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    java.lang.Math.floorMod(z ^ (z >>> 31), nb.toLong).toInt
  }

  /** A vector parsed for the pair kernels: (id, double elements, norm).
    * Raw doubles + separately-computed norms, NOT pre-normalized: cos must
    * be dot/(sqrt(nsq_a)*sqrt(nsq_b)) with sequential dimension-order
    * folds so the values match the Column form and the DuckDB oracle
    * bit-for-bit.
    */
  private def parseVec(id: Long, emb: Array[Float]): (Long, Array[Double], Double) = {
    val v = new Array[Double](emb.length)
    var i = 0
    var nsq = 0.0
    while (i < emb.length) { v(i) = emb(i).toDouble; nsq += v(i) * v(i); i += 1 }
    (id, v, math.sqrt(nsq))
  }

  /** Replicate each vector to every block-pair group it participates in:
    * one shuffle of `nb × n` narrow rows keyed by the unordered block
    * pair (lo, hi) encoded as lo*nb + hi. Shared by the top-k and
    * threshold kernels.
    */
  private def replicateToBlockPairs(vecs: DataFrame, nb: Int) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        val b = blockOf(id, nb)
        (0 until nb).map { o =>
          val lo = math.min(b, o)
          val hi = math.max(b, o)
          (lo * nb + hi, id, emb)
        }
      }
  }

  /** Enumerate each unordered pair of a block-pair group exactly once
    * (i<j within a diagonal block; full cross between distinct blocks)
    * and invoke `consider` on it.
    */
  private def forEachGroupPair(key: Int, nb: Int,
      rows: Array[(Long, Array[Double], Double)])(
      consider: ((Long, Array[Double], Double),
        (Long, Array[Double], Double)) => Unit): Unit = {
    val lo = key / nb
    val hi = key % nb
    if (lo == hi) {
      var i = 0
      while (i < rows.length) {
        var j = i + 1
        while (j < rows.length) { consider(rows(i), rows(j)); j += 1 }
        i += 1
      }
    } else {
      val loRows = rows.filter(r => blockOf(r._1, nb) == lo)
      val hiRows = rows.filter(r => blockOf(r._1, nb) == hi)
      var i = 0
      while (i < loRows.length) {
        var j = 0
        while (j < hiRows.length) { consider(loRows(i), hiRows(j)); j += 1 }
        i += 1
      }
    }
  }

  def topKCosinePairs(vecs: DataFrame, k: Int, blocks: Int = 16): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val nb = blocks
    // Max-heap whose head is the WORST kept entry under the total order
    // (cos4 DESC, a_id ASC, b_id ASC): "worse" = greater (-cos4, a, b).
    val worstFirst = Ordering.by[(Double, Long, Long), (Double, Long, Long)] {
      case (c4, a, b) => (-c4, a, b)
    }
    val survivors = replicateToBlockPairs(vecs, nb)
      .groupByKey(_._1).flatMapGroups {
      (key: Int, it: Iterator[(Int, Long, Array[Float])]) =>
        val rows = it.map { case (_, id, emb) => parseVec(id, emb) }.toArray
        val heap = scala.collection.mutable.PriorityQueue
          .empty[(Double, Long, Long)](worstFirst)
        forEachGroupPair(key, nb, rows) { (x, y) =>
          val aId = math.min(x._1, y._1)
          val bId = math.max(x._1, y._1)
          val (av, an) = (x._2, x._3)
          val (bv, bn) = (y._2, y._3)
          var s = 0.0
          var d = 0
          while (d < av.length) { s += av(d) * bv(d); d += 1 }
          val den = an * bn
          val raw = s / den
          // zero-norm vectors have undefined cosine — skip, don't crash
          // (BigDecimal(NaN) throws). Cheap pre-check: when the heap is
          // full, a raw cosine a full 1e-4 below the worst kept rounded
          // value can't round into contention — skip the BigDecimal
          // (HALF_UP, Spark round()'s exact semantics) for ~all pairs.
          if (den != 0.0 && !raw.isNaN &&
              !(heap.size == k && raw < heap.head._1 - 1e-4)) {
            val c4 = BigDecimal(raw)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            val cand = (c4, aId, bId)
            if (heap.size < k) heap.enqueue(cand)
            else if (worstFirst.lt(cand, heap.head)) {
              heap.dequeue(); heap.enqueue(cand)
            }
          }
        }
        heap.iterator.map { case (c, a, b) => (a, b, c) }
    }
    survivors.toDF("a_id", "b_id", "cos_sim")
      .orderBy(desc("cos_sim"), col("a_id"), col("b_id"))
      .limit(k)
  }

  /** All cosine pairs strictly above `threshold` — the dedup-decision form
    * of the blocked kernel ([[topKCosinePairs]]'s block scheme with a
    * threshold filter instead of a heap). Same replication shuffle, same
    * per-task memory bound O(n·d/blocks), same sequential fold order (the
    * emitted cos_sim is the RAW double; callers round, so the
    * filter-then-round order matches a SQL oracle exactly). Unlike
    * [[allPairsCosine]] this never plans a BroadcastNestedLoopJoin: output
    * volume is data-dependent but the candidate enumeration is spread over
    * blocks²/2 independent tasks — the shape that survives 100× vectors.
    */
  def thresholdCosinePairs(vecs: DataFrame, threshold: Double,
      blocks: Int = 16): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val nb = blocks
    val survivors = replicateToBlockPairs(vecs, nb)
      .groupByKey(_._1).flatMapGroups {
      (key: Int, it: Iterator[(Int, Long, Array[Float])]) =>
        val rows = it.map { case (_, id, emb) => parseVec(id, emb) }.toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        forEachGroupPair(key, nb, rows) { (x, y) =>
          val (av, an) = (x._2, x._3)
          val (bv, bn) = (y._2, y._3)
          var s = 0.0
          var d = 0
          while (d < av.length) { s += av(d) * bv(d); d += 1 }
          val den = an * bn
          if (den != 0.0) {
            val raw = s / den
            if (!raw.isNaN && raw > threshold)
              out += ((math.min(x._1, y._1), math.max(x._1, y._1), raw))
          }
        }
        out.iterator
    }
    survivors.toDF("a_id", "b_id", "cos_sim")
  }

  /** L48 — SemDeDup-style SEMANTIC dedup keep-list over clustered
    * embeddings, with an EXACT INTEGER decision layer so the whole
    * operator hash-matches cross-engine (unlike the k-means path, whose
    * seeded mllib clusters are engine-private and tolerance-gated).
    *
    * Clusters are the embedding table's `label` column (at 100 TB:
    * whatever partitioner produced them — k-means cids via [[ivfAssign]]
    * plug in identically). Per cluster the centroid is the member MEAN;
    * a member is a semantic duplicate ("close") when its
    * cosine-to-centroid exceeds tauNum/tauDen, and of each cluster's
    * close set only the min-id member keeps (l33's canonical-pick
    * discipline).
    *
    * Exactness: embeddings quantize to integers (round(x·scale)); the
    * centroid is used UN-normalized (c_num = Σx_int — the 1/n cancels in
    * cosine), and the threshold compares squares:
    *   cos > τ  ⇔  dot > 0  ∧  tauDen²·dot² > tauNum²·nx·nc
    * — decimal(38,0) products (dot² alone crosses 2^63), no float
    * anywhere in a DECISION, so the DuckDB replay agrees bit-for-bit;
    * the quantization error vs float cosine is gated in ToleranceSpec.
    *
    * Scale shape: everything keys on (label, d) or vec_id — the centroid
    * table is |labels|×dims (broadcast), per-member scores one exploded
    * groupBy; no pairwise anything (SemDeDup's point: cluster-then-
    * centroid replaces the quadratic).
    */
  def semanticDedupKeep(vecs: DataFrame, scale: Long = 1000L,
      tauNum: Long = 3L, tauDen: Long = 10L): DataFrame = {
    val x = vecs.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("d", "e")))
      .select(col("vec_id"), col("label"), col("d"),
        expr(s"CAST(round(CAST(e AS DOUBLE) * $scale) AS BIGINT)").as("xi"))
    val c = x.groupBy("label", "d").agg(sum("xi").as("cn"))
    val nc = c.groupBy("label")
      .agg(sum(expr("CAST(cn AS DECIMAL(38,0)) * cn")).as("nc"))
    // xi·cn widened BEFORE the sum: cn grows with cluster size, so at
    // the 100 TB design point the raw long product wraps silently while
    // the DuckDB replay widens to HUGEINT (ADVICE r11 — the q51/q52
    // discipline; xi² is safe at this scale but widened for symmetry).
    // HEADROOM BOUND (ADVICE r12): the widening is exact only while the
    // downstream tauDen²·dot·dot product stays under decimal(38,0)'s 38
    // digits — i.e. |dot| must stay below ~1e18 for tauDen=10 (1e38/100
    // square-rooted). DuckDB's HUGEINT holds ~1.7e38 and ERRORS on
    // overflow while Spark's decimal NULLs silently (making `close`
    // false), so past that bound the engines diverge rather than both
    // failing loudly. With scale=1000, dims=64: |dot| <= 64·1000·|cn|,
    // so clusters are safe up to ~1.5e13 members·avg|coord| — far past
    // any real cluster, but a caller raising `scale` or dims must
    // re-check. ToleranceSpec's adversarial-magnitude case pins the
    // in-bounds side.
    // Sharper in-envelope guarantee (r13): whenever BOTH decision
    // products fit decimal(38,0) (tauDen²·dot² and tauNum²·nx·nc under
    // 1e38), Cauchy–Schwarz bounds every xi·cn term AND partial sum by
    // Σ_d|xi_d||cn_d| ≤ √(nx·nc) ≤ √(1.1e37) < 3.4e18 < 2^63 — inside
    // the valid envelope the unwidened long sum could not have wrapped;
    // the widening buys deterministic behavior (NULL, not garbage) for
    // out-of-envelope callers rather than in-envelope correctness.
    val m = x.join(broadcast(c), Seq("label", "d"))
      .groupBy("vec_id", "label")
      .agg(sum(expr("CAST(xi AS DECIMAL(38,0)) * cn")).as("dot"),
        sum(expr("CAST(xi AS DECIMAL(38,0)) * xi")).as("nx"))
    val scored = m.join(broadcast(nc), "label")
      .withColumn("close", expr(
        s"""dot > 0 AND
           |${tauDen * tauDen} * CAST(dot AS DECIMAL(38,0)) * dot >
           |${tauNum * tauNum} * CAST(nx AS DECIMAL(38,0)) * nc"""
          .stripMargin))
    val keepId = scored.filter(col("close"))
      .groupBy("label").agg(min("vec_id").as("keep_id"))
    scored.join(broadcast(keepId), Seq("label"), "left_outer")
      .select(col("vec_id"), col("label"), col("close"),
        (!col("close") || col("vec_id") === col("keep_id")).as("keep"))
  }

  /** L48b — deterministic EXACT-INTEGER Lloyd k-means assignment, the
    * clustering front half SemDeDup needs when no label column exists.
    * Unlike [[kmeansCentroids]] (seeded mllib — engine-private float
    * iterations, tolerance-gated only), every step here is integer
    * arithmetic both engines compute bit-identically, so the WHOLE
    * l48b pipeline (cluster → centroid → cosine gate → keep) is one
    * hash-matched query against an unrolled DuckDB replay:
    *
    *   - quantize: xi = round(coord·scale) — the [[semanticDedupKeep]]
    *     discipline, shared scale.
    *   - seed: the k smallest vec_ids' quantized vectors become
    *     centroids 0..k−1 (data-derived and replayable — no RNG).
    *   - iterate `iters`×: assign each vector to the centroid minimizing
    *     the integer squared L2 distance Σ(xi−c)² (tie → min cid), then
    *     re-quantize each centroid as the member-wise floor mean
    *     `sum(xi) div n` (both engines truncate integer division toward
    *     zero, so the re-quantized centroids agree exactly). A cluster
    *     that loses all members drops out of the candidate set — the
    *     remaining assignments stay total and deterministic.
    *   - final label = assignment against the last centroids.
    *
    * Overflow bound: per-dim (xi−c)² ≤ (2·scale·max|coord|)², summed
    * over dims — with scale=1000, dims=64, |coord|≤2 that is ~1e9, nine
    * orders under 2^63; a caller raising scale past ~1e7 must re-check.
    *
    * Scale shape: the per-iteration cost is one broadcast join of the
    * k×dims centroid table against the exploded vectors (n·dims·k rows
    * pre-aggregation, map-side combined into n·k distance rows) plus a
    * vec-keyed argmin window and a (cid,d)-keyed mean — linear in
    * n·dims·k with no pairwise term, exactly how an IVF coarse
    * quantizer trains at 100 TB. Lloyd quality vs mllib's float k-means
    * is gated in ToleranceSpec (planted-blob recovery).
    */
  def kmeansExactAssign(vecs: DataFrame, k: Int, iters: Int,
      scale: Long = 1000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val x = vecs
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "e")))
      .select(col("vec_id"), col("d"),
        expr(s"CAST(round(CAST(e AS DOUBLE) * $scale) AS BIGINT)").as("xi"))
      .transform(Checkpoints.cut) // read 2·iters+1 times across the loop
    val seeds = vecs.select("vec_id").orderBy("vec_id").limit(k)
      .withColumn("cid",
        row_number().over(w.orderBy("vec_id")).cast("long") - 1L)
    def assignTo(c: DataFrame): DataFrame =
      x.join(broadcast(c), "d")
        .groupBy("vec_id", "cid")
        .agg(sum((col("xi") - col("c")) * (col("xi") - col("c")))
          .as("dist"))
        .withColumn("__rn", row_number().over(w.partitionBy("vec_id")
          .orderBy(col("dist").asc, col("cid").asc)))
        .filter(col("__rn") === 1)
        .select(col("vec_id"), col("cid"))
    var c = x.join(seeds, "vec_id")
      .select(col("cid"), col("d"), col("xi").as("c"))
      .transform(Checkpoints.cut)
    for (_ <- 1 to iters) {
      c = assignTo(c).join(x, "vec_id").groupBy("cid", "d")
        .agg(expr("sum(xi) div count(1)").as("c"))
        .transform(Checkpoints.cut)
    }
    assignTo(c).select(col("vec_id"), col("cid").as("label"))
  }

  /** IVF coarse quantizer: k-means (mllib, seeded) over L2-normalized
    * vectors. Returns a small (cid, centroid: array<double>) DataFrame.
    */
  def kmeansCentroids(vecs: DataFrame, k: Int, maxIter: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = vecs.select(col("vec_id"),
      array_to_vector(l2normalize(col("embedding"))).as("features"))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(maxIter)
      .fit(feats)
    val rows = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.toSeq)
    }.toSeq
    vecs.sparkSession.createDataFrame(rows).toDF("cid", "centroid")
  }

  /** IVF multi-probe assignment: each vector -> its `nprobe` nearest
    * centroids by cosine. Centroids (a handful) are broadcast; assignment
    * is one narrow pass + a top-nprobe window over n_centroids scored rows
    * per vector. At scale this is the partitioner that turns all-pairs
    * similarity into per-bucket work; nprobe > 1 trades candidate volume
    * for recall across bucket boundaries.
    */
  def ivfAssign(vecs: DataFrame, centroids: DataFrame, nprobe: Int = 1): DataFrame = {
    val c = centroids.select(col("cid"),
      transform(col("centroid"), _.cast("float")).as("cvec"))
    val scored = vecs.crossJoin(broadcast(c))
      .withColumn("score",
        dot(col("embedding"), col("cvec")) /
          (norm(col("embedding")) * norm(col("cvec"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id")
      .orderBy(desc("score"), col("cid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nprobe)
      .select(col("vec_id"), col("cid").as("bucket"))
  }

  /** IVF-bucketed approximate top-k cosine pairs: seeded k-means coarse
    * quantizer -> `nprobe`-probe bucket assignment ([[ivfAssign]]) ->
    * exact rerank only WITHIN buckets (equi join on bucket replaces the
    * all-pairs quadratic) -> global top-k. `nprobe` is the recall/cost
    * knob: each extra probe multiplies candidate volume by ~nprobe while
    * recovering pairs whose members quantize to different buckets
    * (ToleranceSpec tabulates recall at nprobe = 1/2/4 against the exact
    * kernel so the tradeoff is measured, not asserted).
    */
  def ivfTopKPairs(vecs: DataFrame, k: Int, nCentroids: Int,
      nprobe: Int): DataFrame = {
    val centroids = kmeansCentroids(vecs, k = nCentroids, maxIter = 10)
    val assigned = ivfAssign(vecs, centroids, nprobe)
    // zero-norm exclusion: cosine is undefined and Spark's NaN ordering
    // (greater than everything) would sneak NaN pairs past > filters
    val withB = vecs.join(assigned, "vec_id")
      .select(col("vec_id"), col("embedding"), col("bucket"),
        norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0.0)
    val a = withB.select(col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("bucket"), col("nrm").as("a_nrm"))
    val b = withB.select(col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("bucket").as("b_bucket"),
      col("nrm").as("b_nrm"))
    a.join(b, col("bucket") === col("b_bucket") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dot(col("a_emb"), col("b_emb")) /
          (col("a_nrm") * col("b_nrm")), 4).as("cos_sim"))
      // multi-probe can surface the same pair from two shared buckets
      .dropDuplicates("a_id", "b_id")
      .orderBy(desc("cos_sim"), col("a_id"), col("b_id"))
      .limit(k)
  }

  /** IVF-bucketed APPROXIMATE threshold pairs: the sub-quadratic scale
    * path for [[thresholdCosinePairs]], exactly as [[ivfTopKPairs]] is
    * for [[topKCosinePairs]] — seeded k-means buckets + multi-probe
    * assignment turn the pair enumeration into a bucket-local equi join,
    * then the exact cosine filter keeps only true pairs. Precision is
    * 1.0 by construction (every emitted pair passed the exact check);
    * recall misses only pairs whose members quantize to disjoint probe
    * sets — ToleranceSpec measures it against the exact kernel. At
    * 100 TB candidates are bounded by bucket sizes × nprobe, never n².
    */
  def ivfThresholdPairs(vecs: DataFrame, threshold: Double,
      nCentroids: Int, nprobe: Int): DataFrame = {
    val centroids = kmeansCentroids(vecs, k = nCentroids, maxIter = 10)
    val assigned = ivfAssign(vecs, centroids, nprobe)
    // zero-norm exclusion up front — without it cos_sim = 0/0 = NaN and
    // NaN > threshold is TRUE under Spark's NaN-greatest ordering, which
    // would break the precision-1.0 contract documented above
    val withB = vecs.join(assigned, "vec_id")
      .select(col("vec_id"), col("embedding"), col("bucket"),
        norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0.0)
    val a = withB.select(col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("bucket"), col("nrm").as("a_nrm"))
    val b = withB.select(col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("bucket").as("b_bucket"),
      col("nrm").as("b_nrm"))
    a.join(b, col("bucket") === col("b_bucket") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_emb"), col("b_emb")) /
          (col("a_nrm") * col("b_nrm"))).as("cos_sim"))
      .filter(col("cos_sim") > threshold)
      // multi-probe can surface the same pair from two shared buckets
      .dropDuplicates("a_id", "b_id")
  }

  /** k-NN of one query vector: broadcast-as-literal scan, one pass. */
  def knn(vecs: DataFrame, query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    vecs.select(col("vec_id"),
        round(cosine(col("embedding"), q), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(k)
  }

  /** L21 — product quantization (PQ) training: the codebook compression
    * behind billion-scale ANN indexes (IVF-PQ). The `dims`-dim space
    * splits into `m` subspaces of dims/m; each subspace gets its own
    * seeded-kmeans codebook of `k` codewords, so a vector stores as m
    * small codes (m bytes at k <= 256 — 32× smaller than float32 at
    * d=64, m=8) and query distances become m table lookups ([[pqAdcKnn]]).
    * m small fits over dims/m-dim subvectors — the training set is
    * sampled/bounded in practice; codebooks are a handful of rows and
    * always broadcast. Returns (subspace, cid, centroid).
    */
  def pqTrain(vecs: DataFrame, m: Int, dims: Int, k: Int,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val sub = dims / m
    val spark = vecs.sparkSession
    import spark.implicits._
    val rows = (0 until m).flatMap { j =>
      val feats = vecs.select(array_to_vector(
        transform(slice(col("embedding"), j * sub + 1, sub),
          _.cast("double"))).as("features"))
      val model = new KMeans().setK(k).setSeed(seed + j).setMaxIter(10)
        .fit(feats)
      model.clusterCenters.zipWithIndex.map { case (c, cid) =>
        (j, cid, c.toArray.toSeq)
      }
    }
    rows.toDF("subspace", "cid", "centroid")
  }

  /** PQ encoding: each subvector -> the id of its nearest codeword
    * (L2). One narrow explode to (vec, subspace) rows, a broadcast join
    * against the m×k codebook, a per-(vec, subspace) argmin window, and
    * a re-assembly into the codes array (ordered by subspace). Returns
    * (vec_id, codes: array<int>).
    */
  def pqEncode(vecs: DataFrame, codebooks: DataFrame, m: Int,
      dims: Int): DataFrame = {
    val sub = dims / m
    val exploded = vecs.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("subspace"),
        col("embedding"))
      .select(col("vec_id"), col("subspace"),
        slice(col("embedding"), col("subspace") * sub + 1, lit(sub))
          .as("subvec"))
    val scored = exploded.join(broadcast(codebooks), "subspace")
      .withColumn("l2sq", aggregate(
        zip_with(col("subvec"), col("centroid"),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, v) => acc + v))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "subspace")
      .orderBy(col("l2sq").asc, col("cid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(
        struct(col("subspace"), col("cid")))), _.getField("cid"))
        .as("codes"))
  }

  /** The per-(subspace, codeword) partial-dot table ADC search runs on:
    * m×k rows built driver-side from the (tiny by construction) codebook
    * table and broadcast to every scoring join. Shared by [[pqAdcKnn]]
    * and [[SimIndex.ivfPqSearch]] so the two stay in lockstep.
    */
  def adcTable(codebooks: DataFrame, query: Seq[Float]): DataFrame = {
    val spark = codebooks.sparkSession
    import spark.implicits._
    val q = query.map(_.toDouble)
    val book = codebooks.collect()
    val m = book.map(_.getInt(0)).max + 1
    val sub = q.length / m
    book.map { r =>
      val j = r.getInt(0)
      val cid = r.getInt(1)
      val c = r.getSeq[Double](2)
      (j, cid, (0 until sub).map(i => q(j * sub + i) * c(i)).sum)
    }.toSeq.toDF("subspace", "cid", "pdot")
  }

  /** The [[adcTable]] contents as a dense driver-side array
    * (lut(subspace)(cid) = pdot): m×k doubles — 256 at the engine's
    * m=8/k=32 — small enough to fold into a literal lookup EXPRESSION
    * instead of a broadcast join (r20, guide §2.4: the explode + join +
    * groupBy re-assembly was three operators and one Exchange for what
    * is m array lookups per row). Codewords absent from the codebook
    * table score 0.0, matching the inner join's dropped-term semantics
    * for codes that can never be assigned.
    */
  def adcLut(codebooks: DataFrame, query: Seq[Float]): Array[Array[Double]] = {
    val q = query.map(_.toDouble)
    val book = codebooks.collect()
    val m = book.map(_.getInt(0)).max + 1
    val k = book.map(_.getInt(1)).max + 1
    val sub = q.length / m
    val lut = Array.fill(m)(Array.fill(k)(0.0))
    book.foreach { r =>
      val j = r.getInt(0)
      val cid = r.getInt(1)
      val c = r.getSeq[Double](2)
      lut(j)(cid) = (0 until sub).map(i => q(j * sub + i) * c(i)).sum
    }
    lut
  }

  /** Asymmetric-distance (ADC) k-NN over PQ codes: the query stays
    * full-precision; per (subspace, codeword) partial dot products are
    * precomputed into the [[adcLut]] (m×k driver-side doubles), so each
    * database vector's approximate dot is m literal-array lookups + a
    * sum — dot(query, reconstruction(codes)) EXACTLY, by linearity of
    * the dot product over concatenated subspaces (PqSpec asserts the
    * identity). r20: the lookups are a codegen'd expression summed in
    * ascending-subspace order — the same left-to-right order the old
    * posexplode + broadcast-join + groupBy form accumulated in, so
    * scores are bitwise identical with zero joins and zero Exchanges.
    */
  def pqAdcKnn(codes: DataFrame, codebooks: DataFrame, query: Seq[Float],
      m: Int, dims: Int, k: Int): DataFrame = {
    val lut = adcLut(codebooks, query)
    val adcExpr = lut.indices.map { j =>
      element_at(typedLit(lut(j).toSeq),
        col("codes").getItem(j).cast("int") + lit(1))
    }.reduce(_ + _)
    codes.select(col("vec_id"), adcExpr.as("adc_dot"))
      .orderBy(desc("adc_dot"), col("vec_id"))
      .limit(k)
  }

  /** L20 — binary (sign-bit) embeddings: the 64-dim float vector
    * collapses to two 32-bit sign words — a 32× shrink that turns
    * similarity into Hamming distance over machine words
    * (`bit_count(xor)`), the cheapest candidate-generation metric there
    * is. Packing is a per-row fold (left-to-right, first dim = MSB of
    * its word; exact integer arithmetic, so the packed words hash-match
    * a SQL oracle). At 100 TB: 8 bytes/vector means ~10^10 vectors fit
    * one executor's memory for brute-force rerank candidate scans.
    */
  def signPack(vecs: DataFrame): DataFrame = {
    def word(from: Int): Column =
      aggregate(
        transform(slice(col("embedding"), from, 32),
          x => when(x >= 0, lit(1L)).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc * 2 + b)
    vecs.select(col("vec_id"), word(1).as("w0"), word(33).as("w1"))
  }

  /** Hamming k-NN over [[signPack]]ed vectors: one codegen'd scan —
    * xor + popcount per row — then top-k. The brute-force baseline a
    * binary-embedding index (IVF over sign buckets) would rerank into.
    */
  def hammingKnn(packed: DataFrame, qw0: Long, qw1: Long, k: Int): DataFrame =
    packed.select(col("vec_id"),
        expr(s"CAST(bit_count(w0 ^ ${qw0}L) + bit_count(w1 ^ ${qw1}L) AS BIGINT)")
          .as("hamming"))
      .orderBy("hamming", "vec_id")
      .limit(k)

  /** L13 — scalar int8 quantization of an embedding column: per-vector
    * symmetric scale `s = max|v| / 127`, codes `c_i = round(v_i / s)` in
    * [-127, 127]. One byte per dimension plus one float scale — a 4×
    * shrink of the vector working set, which at 100 TB is the difference
    * between a search index that fits executor memory and one that
    * doesn't. Pure per-row HOFs (array_max/transform), no shuffle, no
    * UDF. Zero vectors get scale 1 (all-zero codes). Reconstruction
    * error is bounded by s/2 per element (ToleranceSpec).
    */
  def quantizeInt8(vecs: DataFrame): DataFrame = {
    val keep = vecs.columns.filterNot(_ == "embedding").map(col).toSeq
    vecs
      .withColumn("__ma",
        array_max(transform(col("embedding"), x => abs(x))).cast("double"))
      .withColumn("scale",
        when(col("__ma") === 0.0, lit(1.0)).otherwise(col("__ma") / 127.0))
      .select(keep :+ col("scale") :+
        transform(col("embedding"),
          x => round(x.cast("double") / col("scale")).cast("tinyint"))
          .as("codes"): _*)
  }

  /** Inverse of [[quantizeInt8]]: reconstruct a float embedding from
    * (scale, codes) — `s · c_i`. The dequantized table plugs into the
    * SAME search kernels ([[topKCosinePairs]], [[knn]]): quantization is
    * a storage/bandwidth optimization, not a different algorithm.
    */
  def dequantizeInt8(q: DataFrame): DataFrame =
    q.withColumn("embedding",
        transform(col("codes"),
          c => (c.cast("double") * col("scale")).cast("float")))
      .drop("codes", "scale")

  /** MinHash signatures over shingle sets: `numHashes` permutations
    * h_i(x) = (a_i * x + b_i) mod p over xxhash64 shingle hashes. One row
    * per doc: (doc_id, sig: array<long>). Deterministic (seeded params).
    */
  def minHashSignatures(shingled: DataFrame, numHashes: Int): DataFrame = {
    // h(x) = (a*x + b) mod p with p the largest 32-bit prime; a < 2^31 and
    // x < 2^32 keep a*x + b under 2^63 — no ANSI-mode long overflow.
    val p = 4294967291L
    val rnd = new scala.util.Random(42)
    val params = Seq.fill(numHashes)(
      (rnd.nextInt(Int.MaxValue - 1).toLong + 1, math.abs(rnd.nextLong()) % p))
    val h = col("__h")
    val sigCols = params.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(h * lit(a) + lit(b), lit(p))).as(s"mh_$i")
    }
    shingled
      .withColumn("__h", pmod(xxhash64(col("shingle")), lit(p)))
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** LSH banding over precomputed signatures: (doc_id, band, band_sig)
    * rows; candidate pairs are an equi join on (band, band_sig) — no
    * all-pairs join.
    */
  def minHashBands(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { bd =>
      struct(lit(bd).as("band"),
        xxhash64((bd * rowsPerBand until (bd + 1) * rowsPerBand)
          .map(i => element_at(col("sig"), i + 1)): _*).as("band_sig"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.band_sig").as("band_sig"))
  }

  /** Estimated Jaccard of candidate pairs from their signatures: the
    * fraction of agreeing MinHash positions. One row per doc per side —
    * on a corpus with a dense mass of mid-similarity pairs (this one),
    * estimating BEFORE the exact shingle re-check cuts the re-check input
    * by an order of magnitude (the estimate join touches 1 signature row
    * per doc instead of ~hundreds of shingle rows).
    */
  def estimateJaccard(pairs: DataFrame, sigs: DataFrame): DataFrame = {
    val a = sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig"))
    val b = sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig"))
    pairs.join(a, "a_id").join(b, "b_id")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("a_sig"), col("b_sig"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / size(col("a_sig")))
      .select(col("a_id"), col("b_id"), col("est_jaccard"))
  }

  /** LSH near-dup candidates: pairs sharing at least one band signature.
    * `maxBucket` bounds hot-bucket expansion — see [[bandedCandidates]];
    * 0 (the default) keeps the exact all-pairs-within-bucket contract.
    */
  def lshCandidates(sigs: DataFrame, numHashes: Int, bands: Int,
      maxBucket: Int = 0): DataFrame =
    bandedCandidates(minHashBands(sigs, numHashes, bands), maxBucket)

  /** Candidate pairs from a (doc_id, band, band_sig) band table — THE
    * shared kernel under [[lshCandidates]] and the persisted-index
    * reader (SimIndex.lshCandidatesFromIndex).
    *
    * `maxBucket = 0` (default): all pairs within each (band, band_sig)
    * bucket — the exact LSH candidate contract, but one hot bucket of d
    * docs (a boilerplate family: identical license headers, templated
    * pages) expands to d²/2 rows inside a SINGLE join-key partition
    * before any downstream prune runs. At 100 TB that one skewed key is
    * a scale-killer no executor count fixes (the r17 corrected stress
    * run OOM'd exactly here).
    *
    * `maxBucket > 0` (the r18 bounded mode): buckets at or under the cap
    * keep all-pairs; a HOT bucket emits a STAR instead — every member
    * paired with the bucket's minimum doc_id — O(d) rows per bucket, so
    * the worst bucket costs what an average one does. Within every
    * bucket the candidate graph stays CONNECTED (the star's hub reaches
    * all members), so over the CANDIDATE graph the components are
    * IDENTICAL to uncapped (gated in TextOpsSpec); the pair SET is
    * deliberately smaller — use the default for the pair-set contract
    * (l02b/l02f), the cap for cluster pipelines.
    *
    * The honest post-FILTER contract (measured r18, not hand-waved):
    * after a downstream exact-Jaccard edge filter, capped pairs are a
    * SUBSET of uncapped pairs, so capped clusters are a REFINEMENT of
    * uncapped clusters — a capped cluster can never merge docs uncapped
    * kept apart (no false dedup merges, the dangerous direction), but a
    * CHAINED component (A~B~C where A and C aren't direct near-dups —
    * the organic-corpus shape, observed on the sf0.001 fixture) can
    * split when the hub isn't a direct near-dup of every member. When a
    * hot bucket IS a genuine near-dup clique — the boilerplate-family
    * shape (identical license headers, templated pages) that actually
    * CREATES hot buckets at 100 TB — every star edge survives the
    * filter and the labels are exactly uncapped's. TextOpsSpec gates
    * all three: candidate-component equality, post-filter refinement on
    * the organic corpus, exact label equality on a synthetic clique
    * family. For a keep-list consumer a split is conservative (an extra
    * canonical survives); a merge would delete non-duplicates.
    *
    * Sizing runs as window aggregates over the join key — on the
    * persisted index the band table is bucketed on (band, band_sig), so
    * the window (like the join) is Exchange-free; the buffered window
    * partition is O(d) rows, never O(d²).
    */
  private[graft] def bandedCandidates(bandTable: DataFrame,
      maxBucket: Int): DataFrame = {
    val b2 = bandTable.select(col("doc_id").as("b_id"), col("band"),
      col("band_sig"))
    if (maxBucket <= 0) {
      bandTable.join(b2, Seq("band", "band_sig"))
        .filter(col("doc_id") < col("b_id"))
        .select(col("doc_id").as("a_id"), col("b_id")).distinct()
    } else {
      // r19 (optimization round): one window evaluation, one join, no
      // union. The r18 shape forked `sized` three ways (small×2 + star),
      // so the Sort+Window subtree ran 3× per query (the Exchange was
      // reused, the sort/window work was not) and the two branches met in
      // a Union before the distinct. Equivalent single-consumer form:
      //   left  = sized rows that may ANCHOR a pair — every row of a
      //           small bucket, only the hub row of a hot bucket;
      //   right = the RAW band table (no window at all);
      //   pair  = same bucket && doc_id < b_id.
      // Small buckets: all a<b pairs (left unrestricted, right = whole
      // bucket). Hot buckets: left is the hub only and hub = min(doc_id),
      // so hub < m for every other member — exactly the hub star. The
      // pair set is IDENTICAL to the r18 form (TextOpsSpec gates all
      // three capped-mode properties). CPU stays Σ_small d² + Σ_hot d:
      // a hot bucket contributes ONE probe row on the left, so the join
      // never enumerates d² combinations for it.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("band", "band_sig")
      val anchors = bandTable
        .withColumn("__n", count(lit(1)).over(w))
        .withColumn("__hub", min("doc_id").over(w))
        .filter(col("__n") <= maxBucket || col("doc_id") === col("__hub"))
        .select(col("doc_id").as("a_id"), col("band"), col("band_sig"))
      anchors.join(b2, Seq("band", "band_sig"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id")).distinct()
    }
  }

  /** Exact n-gram Jaccard over all intersecting pairs, or (re-check pass)
    * only over supplied candidate pairs.
    *
    * The two paths have fundamentally different asymptotics: the full form
    * joins on the shingle key — one hot shingle shared by d docs alone
    * yields d²/2 rows, so it is quadratic by construction (test-scale /
    * final-dedup-within-cluster use). The candidate path NEVER builds that
    * intersection: candidates are joined to the a-side shingle lists first
    * (|cands| × |shingles(a)| rows) and matched against the b-side on
    * (b_id, shingle) — linear in candidate volume, which is what makes
    * LSH + re-check the 100 TB path.
    */
  def exactJaccard(shingled: DataFrame, pairs: Option[DataFrame] = None): DataFrame = {
    val sizes = shingled.groupBy("doc_id")
      .agg(count(lit(1)).as("sz"))
    val inter = pairs match {
      case Some(p) =>
        p.join(shingled.select(col("doc_id").as("a_id"), col("shingle")), "a_id")
          .join(shingled.select(col("doc_id").as("b_id"), col("shingle")),
            Seq("b_id", "shingle"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
      case None =>
        val s1 = shingled.select(col("doc_id").as("a_id"), col("shingle"))
        val s2 = shingled.select(col("doc_id").as("b_id"), col("shingle"))
        s1.join(s2, Seq("shingle"))
          .filter(col("a_id") < col("b_id"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    }
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("sz", "a_sz"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("sz", "b_sz"), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter"))).as("jaccard"))
  }

  /** Exact Jaccard re-check over candidate pairs via compact per-doc
    * sorted hashed-shingle arrays and the codegen'd merge-intersect
    * expression — O(|a|+|b|) per pair over a BROADCAST of the doc sets
    * (5k docs × ~150 shingles ≈ 6 MB), zero shuffle. The only
    * approximation vs. raw-string sets is 64-bit shingle-hash collisions
    * (~1e-8 at 10^6 distinct shingles). Requires
    * `VecFunctions.ensureRegistered`.
    *
    * `broadcastSets = Some(true)` ships the compact set table to every
    * task — zero shuffle on the probe side. `Some(false)` is the 100 TB
    * form: the same joins plan as shuffled hash joins partitioned on
    * a_id/b_id, linear in candidate volume with no driver-memory ceiling
    * (candidates arrive bucketed from LSH, so the shuffle is the
    * co-location step). The default `None` decides ADAPTIVELY, like the
    * BFS frontier switch (Graphs.FrontierBroadcastRows): broadcast only
    * if a safe UPPER BOUND on the compact set payload fits
    * [[BroadcastSetBytes]]. r19: the bound is computed from the SHINGLE
    * INPUT (one cheap agg — `Σ|hset| ≤ rows(shingled)` since collect_set
    * only removes duplicates, and docs ≤ rows) instead of materializing
    * the whole set table through localCheckpoint and re-scanning it. The
    * a/b sides canonicalize equal and Spark's ReuseExchange collapses
    * their (broadcast or shuffle) EXCHANGE to one — asserted in
    * PlanShapeSpec — so the shuffle/partial-agg work is shared; the
    * post-exchange final collect_set/sort_array merge still runs once
    * per join side (the old checkpoint materialized it exactly once —
    * that final-merge re-run is the price of dropping two whole jobs,
    * and it is the cheap, pipelined part of the set build). The bound
    * overestimates, so a borderline corpus now
    * takes the shuffle path — the safe direction. All paths are the same
    * plan shape otherwise; ToleranceSpec asserts identical output on all
    * three.
    */
  def exactJaccardCompact(shingled: DataFrame, pairs: DataFrame,
      broadcastSets: Option[Boolean] = None): DataFrame = {
    val sets0 = shingled
      .groupBy("doc_id")
      .agg(sort_array(collect_set(xxhash64(col("shingle")))).as("hset"))
      .select(col("doc_id"), col("hset"), size(col("hset")).as("sz"))
    val useBroadcast = broadcastSets.getOrElse {
      val st = shingled
        .agg(count(lit(1)), approx_count_distinct(col("doc_id"))).head()
      // 8 B per hash (≤ one per input row) + ~24 B row overhead per doc
      // (approx distinct padded 1.2× against HLL underestimation).
      (st.getLong(1) * 12L / 10L) * 24L + st.getLong(0) * 8L <=
        BroadcastSetBytes
    }
    val sets = sets0
    val a = sets.select(col("doc_id").as("a_id"), col("hset").as("a_set"),
      col("sz").as("a_sz"))
    val b = sets.select(col("doc_id").as("b_id"), col("hset").as("b_set"),
      col("sz").as("b_sz"))
    val (aj, bj) = if (useBroadcast) (broadcast(a), broadcast(b)) else (a, b)
    pairs.join(aj, "a_id").join(bj, "b_id")
      .withColumn("inter",
        call_function("sorted_intersect_count", col("a_set"), col("b_set")))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter"))).as("jaccard"))
  }

  /** SimHash (64-bit) of the token stream: sign-sum of per-token hashes
    * weighted into bit positions. Near-dups have small Hamming distance.
    * Single-pass native expression (requires VecFunctions.ensureRegistered).
    */
  def simHash(text: Column): Column =
    call_function("simhash64",
      regexp_extract_all(text, lit(s"[^${Text.GopherWhitespace}]+"), lit(0)))

  /** Pure-Column reference twin of [[simHash]] (64 aggregate folds —
    * correct but ~20× slower; kept for the equivalence test). Token hash
    * and tokenizer match the native expression: Det.md5Long over the
    * explicit whitespace class, the engine-portable pair.
    */
  def simHashHof(text: Column): Column = {
    val tokens = regexp_extract_all(text,
      lit(s"[^${Text.GopherWhitespace}]+"), lit(0))
    val hashes = transform(tokens, t => graft.Det.md5Long(t))
    (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }
}
