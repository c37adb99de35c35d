package graft.queries

import graft.Tables
import graft.ops.{Bucketing, Graphs, SimIndex, Similarity, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data-pipeline operators (SURVEY.md §2.5 L01–L06): dedup
  * (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
  * multimodal binary plumbing, and text analysis over `documents` /
  * `embeddings`.
  */
object LlmQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Synthetic P6 payloads for the media pipeline (l09/l09b): each doc's
    * UTF-8 bytes become a 32-wide RGB raster, zero-padded to whole rows
    * — deterministic binaries exercising the REAL codec end-to-end.
    */
  private def ppmSrc(s: SparkSession, dir: String): DataFrame = {
    val w = 32
    val rowBytes = w * 3
    docs(s, dir)
      .withColumn("body", encode(col("text"), "UTF-8"))
      .withColumn("h", greatest(lit(1),
        ceil(octet_length(col("body")) / lit(rowBytes.toDouble))
          .cast("int")))
      .withColumn("payload", concat(
        encode(concat(lit(s"P6\n$w "), col("h").cast("string"),
          lit("\n255\n")), "UTF-8"),
        concat(col("body"), lit(Array.fill[Byte](rowBytes)(0)))
          .substr(lit(1), col("h") * rowBytes)))
      .drop("body")
  }

  /** L53b/L53c substrate: per-doc image EMBEDDINGS through the real PPM
    * encode→parse round trip (the l53 codec path composed into the
    * dedup/ANN machinery). Each doc's 8×8 RGB image derives from a
    * CONTENT key (doc_id % 50 — ten docs share each base image, so
    * near-dup pairs exist by construction) with 6 of the 192 channel
    * values carrying per-doc md5 noise; the decoded pixels centered at
    * 128 become the Array[Float] embedding. Every value is
    * md5-grid-deterministic, so the DuckDB oracle replays
    * pixels → embedding → cosine exactly. Returns (vec_id, embedding).
    */
  private def imageEmbeddings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = 8 * 8 * 3
    val pix = docs(s, dir).select(col("doc_id"))
      .withColumn("p", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("v", when(col("p") < 6,
          graft.Det.md5Long(concat(col("doc_id"), lit("#"), col("p"))) % 256)
        .otherwise(graft.Det.md5Long(
          concat(col("doc_id") % 50, lit("_"), col("p"))) % 256)
        .cast("int"))
    val ppms = pix.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("p"), col("v")))).as("ps"))
      .as[(Long, Seq[(Int, Int)])]
      .map { case (id, ps) =>
        (id, graft.ops.Media.encodePpm(8, 8, 255,
          ps.map(_._2.toByte).toArray))
      }
      .toDF("doc_id", "payload")
    graft.ops.Media.decodeImagePixels(ppms, "payload")
      .select(col("doc_id").as("vec_id"),
        transform(col("pixels"), x => (x - 128).cast("float"))
          .as("embedding"))
  }

  /** L58 substrate: a deterministic "video" per doc — four REAL P6
    * frames of DIFFERENT sizes (frame k is (4+k)×2 RGB, channel values
    * from the md5 grid) concatenated into one binary payload. Variable
    * frame sizes make equal-byte-range slicing impossible: a demuxer
    * must parse each frame's own header to find the next offset (the
    * ffmpeg-shape byte walk [[graft.ops.Media.splitPpmFrames]] does).
    * Returns (doc_id, payload).
    */
  private def videoSrc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id"))
      .withColumn("k", explode(sequence(lit(0), lit(3))))
      .withColumn("p", explode(sequence(lit(0), (lit(4) + col("k")) * 6 - 1)))
      .withColumn("v", (graft.Det.md5Long(concat(col("doc_id"), lit("f"),
        col("k"), lit("_"), col("p"))) % 256).cast("int"))
      .groupBy("doc_id", "k")
      .agg(sort_array(collect_list(struct(col("p"), col("v")))).as("ps"))
      .as[(Long, Int, Seq[(Int, Int)])]
      .map { case (id, k, ps) =>
        (id, k, graft.ops.Media.encodePpm(4 + k, 2, 255,
          ps.map(_._2.toByte).toArray))
      }
      .toDF("doc_id", "k", "frame")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("k"), col("frame")))).as("fs"))
      .as[(Long, Seq[(Int, Array[Byte])])]
      .map { case (id, fs) => (id, fs.map(_._2).reduce(_ ++ _)) }
      .toDF("doc_id", "payload")
  }

  /** L59 substrate: per-VIDEO pooled frame embeddings through the REAL
    * demux + decode path (r18 — l58's demuxer composed with the l53
    * embedding discipline). Each doc's video is four 8×2 RGB P6 frames
    * concatenated into one payload; frame content derives from a
    * CONTENT key (doc_id % 50 — ten videos share each base, so
    * near-dup VIDEO pairs exist by construction) with the first 3
    * channel values of FRAME 0 carrying per-doc md5 noise (noise on one
    * frame only keeps every family pair safely above the 0.8 gate —
    * the pooled noise positions stay ¾ base-shared). The
    * pipeline is the one a video-corpus dedup runs: demux the byte
    * stream (frame headers, not byte ranges), decode each frame's
    * raster, SUM-POOL the centered pixels per position across frames
    * (sum, not mean — cosine is scale-invariant and integer sums stay
    * exactly replayable cross-engine), and emit the pooled vector as
    * the video's embedding. Returns (vec_id, embedding: array<float>).
    */
  private def videoPayloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perFrame = 8 * 2 * 3 // 48 channel values per frame
    val pix = docs(s, dir).select(col("doc_id"))
      .withColumn("k", explode(sequence(lit(0), lit(3))))
      .withColumn("p", explode(sequence(lit(0), lit(perFrame - 1))))
      .withColumn("v", when(col("p") < 3 && col("k") === 0,
          graft.Det.md5Long(concat(col("doc_id"), lit("#"), col("k"),
            lit("_"), col("p"))) % 256)
        .otherwise(graft.Det.md5Long(concat(col("doc_id") % 50, lit("f"),
          col("k"), lit("_"), col("p"))) % 256)
        .cast("int"))
    pix.groupBy("doc_id", "k")
      .agg(sort_array(collect_list(struct(col("p"), col("v")))).as("ps"))
      .as[(Long, Int, Seq[(Int, Int)])]
      .map { case (id, k, ps) =>
        (id, k, graft.ops.Media.encodePpm(8, 2, 255,
          ps.map(_._2.toByte).toArray))
      }
      .toDF("doc_id", "k", "frame")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("k"), col("frame")))).as("fs"))
      .as[(Long, Seq[(Int, Array[Byte])])]
      .map { case (id, fs) => (id, fs.map(_._2).reduce(_ ++ _)) }
      .toDF("doc_id", "payload")
  }

  private def videoEmbeddings(s: SparkSession, dir: String): DataFrame =
    // demux → decode → sum-pool, the shared Media kernel (also behind
    // the pooled_frame_embeddings TVF — l59c composes it from SQL)
    graft.ops.Media.pooledFrameEmbeddings(videoPayloads(s, dir))

  /** L60 substrate (r19 — the l59 move on the audio side): each doc's
    * "clip" is 2048 deterministic PCM16 samples encoded into a REAL
    * WAV container (Media.encodeWav — the codec round trip is in the
    * hash-matched path). Sample content derives from a CONTENT key
    * (doc_id % 50 — forty clips share each base at sf0.01, so near-dup
    * CLIP pairs exist by construction) with the first 3 samples
    * carrying per-doc md5 noise; samples stay in ±128
    * (md5Long % 256 − 128) so every pooled feature is an exact small
    * integer — float storage exact, double cosine bit-replayable in
    * DuckDB (the l59 noise-on-one-frame discipline: 3 noisy samples
    * move one window's sum by ≤ ~765 against a ~3300 vector norm, so
    * every family pair stays safely above the 0.8 gate while
    * cross-family cosines concentrate at 0 ± 1/√128).
    */
  private def audioClipPayloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = 2048
    val smp = docs(s, dir).select(col("doc_id"))
      .withColumn("i", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("smp",
        (when(col("i") < 3,
            graft.Det.md5Long(concat(col("doc_id"), lit("#"), col("i"))))
          .otherwise(graft.Det.md5Long(concat(col("doc_id") % 50, lit("a"),
            col("i"))))
          % 256 - 128).cast("int"))
    smp.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("i"), col("smp")))).as("ss"))
      .as[(Long, Seq[(Int, Int)])]
      .map { case (id, ss) =>
        (id, graft.ops.Media.encodeWav(16000, ss.map(_._2.toShort).toArray))
      }
      .toDF("doc_id", "payload")
  }

  private def audioFeatureVecs(s: SparkSession, dir: String): DataFrame =
    // codec parse-back → windowed (crossings, sum) features, the shared
    // Media kernel (also behind the pooled_audio_features TVF — l60c
    // composes it from SQL); 16-sample windows → 128 windows → 256 dims
    graft.ops.Media.pooledAudioFeatures(audioClipPayloads(s, dir), 16)

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    * local fingerprinting scheme) shared by l44/l45: hash every word
    * 3-gram (40-bit md5 prefix — cross-engine replayable, [[graft.Det]]
    * md5Long's discipline at a width that leaves room for the position
    * encoding), then in every window of W=4 consecutive gram hashes
    * select the RIGHTMOST minimum. The guarantee that makes it the
    * standard near-dup primitive: any shared run of ≥ k+W-1 tokens
    * yields at least one shared fingerprint, while only ~2/W of grams
    * are kept. The rightmost-min pick is ONE window MIN over
    * v = h·2^20 + (2^20−1−pos) (min h, then max pos; pos < 2^20 —
    * documents are chunk-grained, l14 bounds real corpora), and
    * adjacent windows re-selecting the same gram dedup on the decode —
    * no self-join, no per-window explode. Output: the selected
    * (doc_id, pos, fp) set.
    */
  /** Positional word 3-grams per document — the unit of winnowing
    * (l44/l45) and of exact containment (l46): (doc_id, pos, gram).
    */
  private def grams3(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs(s, dir).select(col("doc_id"),
      posexplode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as(Seq("pos", "token")))
    val wn = Window.partitionBy("doc_id").orderBy("pos")
    tok
      .withColumn("t2", lead("token", 1).over(wn))
      .withColumn("t3", lead("token", 2).over(wn))
      .filter(col("t3").isNotNull)
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("token"), col("t2"), col("t3")).as("gram"))
  }

  private def winnowed(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val W = 4
    val maxP = (1L << 20) - 1
    val wn = Window.partitionBy("doc_id").orderBy("pos")
    grams3(s, dir)
      .withColumn("h",
        conv(substring(md5(col("gram")), 1, 10), 16, 10).cast("long"))
      .withColumn("v",
        col("h") * lit(maxP + 1) + (lit(maxP) - col("pos")))
      .withColumn("mv", min("v").over(wn.rowsBetween(-(W - 1), 0)))
      .filter(col("pos") >= W - 1)
      .select(col("doc_id"),
        (lit(maxP) - col("mv") % lit(maxP + 1)).as("pos"),
        expr(s"mv div ${maxP + 1}").as("fp"))
      .distinct()
  }

  // Shared oracle snippet: the l15 near-dup clustering replay (3-char
  // shingle Jaccard > 0.6 pairs, min-label closure over the recursive
  // CTE) — reused by l15 and the l33 keep-list.
  /** Shared DuckDB replay of the >0.6-Jaccard near-dup CLUSTERS, ending
    * in `cl(doc_id, cluster_id)`. Rewritten for the sf0.1 dual-scale
    * sweep (VERDICT r10 "next" #3): the old single recursive label walk
    * enumerated Σ|cluster|² (member, label) rows — ~30 min at sf0.1 on
    * the 1.65M-edge dup graph. The replay now runs TWO min-contraction
    * rounds (the engine's own star-contraction CC move) to shrink the
    * graph 1.65M → 5734 → 136 edges, then the SAME exact recursive walk
    * on the tiny quotient — always exact, no convergence assumption
    * (the walk is the backstop), verified identical to the old replay
    * at sf0.001/sf0.01 and ~34 s at sf0.1.
    *
    * DuckDB 1.0 planner notes, all measured: (a) the shingle subquery
    * is INLINED at each use — plain subqueries parallelize far better
    * than materialized-CTE probes (12 s vs 144 s for the pair join);
    * (b) the heavy CTEs are MATERIALIZED — plain CTEs re-expand
    * per reference and the round chain multiplies references
    * (5^rounds copies of the pair join = 25 GiB spills); (c) chains
    * beyond ~12 materialized CTEs hit a planner cliff (even when the
    * extra CTEs are empty), which is why contraction stops at 2 and
    * the exact walk — not more unrolling — finishes the job; (d) each
    * round's vertex map is built over ALL prior labels (not just
    * edge sources), so the inner-join label composition is total.
    */
  /** The l15 dedup-cluster replay, optionally with EXTRA canonical
    * (a_id < b_id) pair rows unioned into the edge set before the
    * contraction+walk — the l61 ensemble oracle reuses the whole chain
    * with the embedding-cosine pairs added; `extraPairs` empty yields
    * the original CTE byte-for-byte (the grow-only contract).
    */
  private def clusterCteOver(extraPairs: String): String = {
    val sh = "(SELECT DISTINCT doc_id, substr(text, CAST(gs AS INT), 3)" +
      " AS shingle FROM (SELECT doc_id, text," +
      " unnest(generate_series(1, n_chars - 2)) AS gs" +
      " FROM documents WHERE n_chars >= 3))"
    // ONE round: it already shrinks the walk substrate 1.65M → 5734
    // edges at sf0.1 (the walk's Σ|cluster|² blowup dies with the first
    // contraction), and l43's combined query — this CTE + the semantic
    // CTE + the langid/quality stages — sits close enough to the
    // planner cliff (note c) that the second round's two extra
    // materialized CTEs pushed it over.
    val rounds = 1
    val roundCtes = (1 to rounds).map { k =>
      val prev = s"e${k - 1}"
      val vsrc =
        if (k == 1) "(SELECT DISTINCT src AS id FROM e0)"
        else s"(SELECT DISTINCT l AS id FROM m${k - 1})"
      s"""m$k AS MATERIALIZED (SELECT v.id,
         |    least(v.id, coalesce(min(e.dst), v.id)) AS l
         |  FROM $vsrc v
         |  LEFT JOIN $prev e ON e.src = v.id GROUP BY v.id),
         |e$k AS MATERIALIZED (SELECT DISTINCT a.l AS src, b.l AS dst
         |  FROM $prev e JOIN m$k a ON a.id = e.src
         |  JOIN m$k b ON b.id = e.dst WHERE a.l <> b.l)""".stripMargin
    }.mkString(",\n")
    val comp = (2 to rounds)
      .map(k => s"JOIN m$k ON m$k.id = m${k - 1}.l").mkString(" ")
    s"""WITH RECURSIVE i AS MATERIALIZED (SELECT a.doc_id AS a_id,
       |    b.doc_id AS b_id, count(*) AS n
       |  FROM $sh a JOIN $sh b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sz AS (SELECT doc_id, count(*) AS sz FROM $sh GROUP BY 1),
       |pairs AS MATERIALIZED (SELECT a_id, b_id FROM i
       |  JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
       |  WHERE n * 1.0 / (sa.sz + sb.sz - n) > 0.6${
         if (extraPairs.isEmpty) "" else s"\n  UNION $extraPairs"}),
       |e0 AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |$roundCtes,
       |lp(id, lbl) AS (SELECT DISTINCT l AS id, l FROM m$rounds
       |  UNION SELECT e$rounds.dst, lp.lbl FROM lp
       |  JOIN e$rounds ON e$rounds.src = lp.id),
       |ql AS (SELECT id, min(lbl) AS ql FROM lp GROUP BY 1),
       |cl AS (SELECT m1.id AS doc_id, CAST(ql.ql AS BIGINT) AS cluster_id
       |  FROM m1 $comp JOIN ql ON ql.id = m$rounds.l)""".stripMargin
  }

  private val dedupClusterCte: String = clusterCteOver("")

  /** Shared by l33/l43: per-doc near-dup cluster id + keep flag (largest
    * doc of each >0.6-Jaccard cluster wins, ties to min doc_id).
    */
  private def dedupKeep(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Similarity.exactJaccard(Text.shingles(d, 3))
      .filter(col("jaccard") > 0.6)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val clusters = Graphs.connectedComponentsDF(s, pairs)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(desc("n_chars"), col("doc_id").asc)
    clusters.join(d.select("doc_id", "n_chars"), "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "keep")
  }

  /** L43b's dedup stage: EXACT dedup — keep the lowest doc_id of each
    * byte-identical text group. The shuffle key is sha2(text) rather
    * than the text itself so a 100 TB run moves 32-byte digests, not
    * document bodies, through the exchange (collisions are beyond
    * reach for 2^128-strength digests; the oracle groups by raw text,
    * which is the same partition).
    */
  private def exactDedupKeep(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col("text"), 256))
    docs(s, dir).select(col("doc_id"),
      (col("doc_id") === min("doc_id").over(w)).as("keep"))
  }

  /** L43/L43b — the PIPELINE MANIFEST: the whole curation funnel as one
    * attrition table — every doc pushed through language gate (l04c's
    * n-gram guesser, keep 'en'), quality gate (l19's Gopher flags),
    * the given dedup keep-list (l33's LSH clusters for l43, exact-hash
    * for l43b), and the given semantic keep-list (l48's fixture-labeled
    * form or l48b's k-means-derived form), with surviving (n_docs,
    * n_chars) after each stage. The number a data lead actually signs
    * off on ("how much training data is left, and which gate ate
    * what") — and because every component is individually
    * hash-matched, the COMPOSITION is too. One pass computes all
    * per-doc gate bits; the stage rows are five aggregates over that
    * table, the dedup join is the only non-doc-local work.
    */
  private def manifestDf(s: SparkSession, dir: String,
      dupKeep: DataFrame, semKeep: DataFrame): DataFrame = {
    val d = docs(s, dir)
    val bits = d
      .withColumn("lang_ok", Text.langIdGuess(col("text")) === "en")
      .join(Text.gopherFlags(d).select(col("doc_id"),
        col("keep").as("q_ok")), "doc_id")
      .join(dupKeep.select(col("doc_id"),
        col("keep").as("dup_keep")), Seq("doc_id"), "left")
      // stage 4: the semantic keep-list (vec_id IS the doc bridge);
      // docs without an embedding pass through, like the dedup stage
      .join(semKeep
        .select(col("vec_id").as("doc_id"), col("keep").as("sem_keep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"), col("lang_ok"), col("q_ok"),
        coalesce(col("dup_keep"), lit(true)).as("dup_ok"),
        coalesce(col("sem_keep"), lit(true)).as("sem_ok"))
    def stage(name: String, cond: org.apache.spark.sql.Column) =
      bits.filter(cond).agg(lit(name).as("stage"),
        count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    stage("0_all", lit(true))
      .unionAll(stage("1_lang", col("lang_ok")))
      .unionAll(stage("2_quality", col("lang_ok") && col("q_ok")))
      .unionAll(stage("3_dedup",
        col("lang_ok") && col("q_ok") && col("dup_ok")))
      .unionAll(stage("4_semantic",
        col("lang_ok") && col("q_ok") && col("dup_ok") && col("sem_ok")))
      .orderBy("stage")
  }

  /** l59/l59c shared DuckDB replay (see the oracles map). */
  private lazy val l59OracleSql: String = {
    val hNoise = graft.Det.duckMd5Long("doc_id || '#' || k || '_' || p")
    val hBase = graft.Det.duckMd5Long("(doc_id % 50) || 'f' || k || '_' || p")
    val dotAB = duckDot.format("a.e", "b.e")
    val nA = duckNormSq.format("a.e")
    val nB = duckNormSq.format("b.e")
    s"""WITH px AS (SELECT doc_id, k, p,
      |    CAST(CASE WHEN p < 3 AND k = 0 THEN ($hNoise) % 256
      |         ELSE ($hBase) % 256 END AS BIGINT) AS v
      |  FROM (SELECT doc_id, k, unnest(range(0, 48)) AS p
      |        FROM (SELECT doc_id, unnest(range(0, 4)) AS k
      |              FROM documents))),
      |pool AS (SELECT doc_id, p, CAST(sum(v) - 512 AS BIGINT) AS pv
      |  FROM px GROUP BY 1, 2),
      |v AS (SELECT doc_id, list(pv ORDER BY p) AS e FROM pool GROUP BY 1)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  round($dotAB / (sqrt($nA) * sqrt($nB)), 4) AS cos_sim
      |FROM v a JOIN v b ON a.doc_id < b.doc_id
      |WHERE $dotAB / (sqrt($nA) * sqrt($nB)) > 0.8
      |ORDER BY a_id, b_id""".stripMargin
  }

  /** l60/l60c shared DuckDB replay: md5 sample stream → lag window →
    * per-16-sample (crossings, sum) features → interleaved double
    * vector → cosine pairs above 0.8. Every feature is an exact small
    * integer and the Spark kernel accumulates the dot in double, so
    * the match is bit-for-bit (the l59 precedent).
    */
  private lazy val l60OracleSql: String = {
    val hNoise = graft.Det.duckMd5Long("doc_id || '#' || i")
    val hBase = graft.Det.duckMd5Long("(doc_id % 50) || 'a' || i")
    val dotAB = duckDot.format("a.e", "b.e")
    val nA = duckNormSq.format("a.e")
    val nB = duckNormSq.format("b.e")
    s"""WITH smp AS (SELECT doc_id, i,
      |    CAST((CASE WHEN i < 3 THEN ($hNoise) ELSE ($hBase) END)
      |         % 256 - 128 AS BIGINT) AS smp
      |  FROM (SELECT doc_id, unnest(range(0, 2048)) AS i
      |        FROM documents)),
      |p AS (SELECT doc_id, i, smp,
      |    lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |  FROM smp),
      |wf AS (SELECT doc_id, CAST(i // 16 AS BIGINT) AS win,
      |    sum(CASE WHEN i % 16 <> 0 AND prev * smp < 0
      |        THEN 1 ELSE 0 END) AS crossings,
      |    sum(smp) AS ssum
      |  FROM p GROUP BY 1, 2),
      |v AS (SELECT doc_id,
      |    flatten(list([CAST(crossings AS DOUBLE), CAST(ssum AS DOUBLE)]
      |                 ORDER BY win)) AS e
      |  FROM wf GROUP BY 1)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  round($dotAB / (sqrt($nA) * sqrt($nB)), 4) AS cos_sim
      |FROM v a JOIN v b ON a.doc_id < b.doc_id
      |WHERE $dotAB / (sqrt($nA) * sqrt($nB)) > 0.8
      |ORDER BY a_id, b_id""".stripMargin
  }

  // Manual double-precision cosine pieces for the DuckDB oracle — same
  // sequential fold order as the Spark HOFs, then round(4) absorbs any
  // residual ULP difference.
  private val duckDot =
    "list_sum(list_transform(list_zip(%s, %s), " +
      "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  private val duckNormSq =
    "list_sum(list_transform(%s, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L01 — exact dedup: group by content hash (sha2-256 at scale; the
    // oracle groups by the text itself — identical absent collisions).
    "l01_exact_dedup" -> ((s, dir) => {
      docs(s, dir)
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_copies"))
        .select("canonical_id", "n_copies")
        .orderBy("canonical_id")
    }),

    // L02 — near-dedup: exact 3-gram Jaccard > 0.6 (all intersecting
    // pairs; test-scale exact form — L02b is the LSH scale path).
    "l02_near_dedup" -> ((s, dir) => {
      Similarity.exactJaccard(Text.shingles(docs(s, dir), 3))
        .filter(col("jaccard") > 0.6)
        .select(col("a_id"), col("b_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    // L02b — MinHash-LSH near-dup, the 100 TB path: signatures -> banding
    // candidates -> signature-estimate prune (est >= 0.42, ~2σ below the
    // 0.6 target for the 32-hash estimator) -> exact shingle re-check.
    // Every reported pair is exactly verified; only recall is approximate.
    // Engine-only (seeded MinHash has no cross-engine oracle); ScalaTest
    // gates recall vs the exact L02 at >= 95%.
    "l02b_lsh_near_dedup" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      val sh = Text.shingles(docs(s, dir), 3).cache()
      val sigs = Similarity.minHashSignatures(sh, numHashes = 32).cache()
      val cands = Similarity.lshCandidates(sigs, numHashes = 32, bands = 16)
      val likely = Similarity.estimateJaccard(cands, sigs)
        .filter(col("est_jaccard") >= 0.42)
        .select("a_id", "b_id")
      Similarity.exactJaccardCompact(sh, likely)
        .filter(col("jaccard") > 0.6)
        .select(col("a_id"), col("b_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    // L02c — LSH near-dup over the PERSISTED index (SimIndex): the band
    // and signature tables are built ONCE per (session, sf dir) as
    // bucketed managed tables; candidate generation is then an
    // Exchange-free bucket-local self join (plan shape asserted in
    // SimIndexSpec) and only the exact re-check touches the corpus
    // shingles. Same pipeline parameters as l02b, so the output is
    // IDENTICAL (asserted in SimIndexSpec); engine-only for the driver
    // (seeded MinHash), rows-checked. This is the 100 TB operating mode:
    // the corpus-wide shuffle is paid at index-build time, every dedup
    // run after that reads co-located buckets.
    "l02c_lsh_indexed" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      val prefix = "graft_lsh_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      // cache validity = the recorded BUILD SIGNATURE matching the live
      // corpus, not mere table existence — a regenerated fixture under
      // the same dir invalidates and rebuilds instead of silently
      // serving candidates from the old data
      if (!SimIndex.isUsable(s, prefix, docs(s, dir),
          Seq("_bands", "_sigs"))) {
        Seq("_bands", "_sigs", "_meta").foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $prefix$t")
          Bucketing.dropStaleLocation(s, prefix + t)
        }
        SimIndex.writeLshIndex(docs(s, dir), prefix, numHashes = 32,
          bands = 16, buckets = 8)
      }
      val cands = SimIndex.lshCandidatesFromIndex(s, prefix,
        verifyAgainst = Some(docs(s, dir)))
      val likely = Similarity
        .estimateJaccard(cands, s.table(s"${prefix}_sigs"))
        .filter(col("est_jaccard") >= 0.42)
        .select("a_id", "b_id")
      Similarity.exactJaccardCompact(Text.shingles(docs(s, dir), 3), likely)
        .filter(col("jaccard") > 0.6)
        .select(col("a_id"), col("b_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    // L02e — near-dedup over the POST-DELETE persisted LSH index (r17
    // retraction): the l02c index with doc_id % 7 == 3 ERASED through
    // deleteFromLshIndex — a tombstone append + additive-signature
    // retraction, O(|delete batch|), never an index rewrite — then the
    // same candidate → estimate-prune → exact-re-check pipeline over
    // the surviving corpus. requireFresh passes against the SURVIVORS
    // (the retracted signature equals theirs), and SimIndexSpec gates
    // the post-delete candidate set row-for-row == a fresh build on
    // the survivors. Engine-only for the driver (seeded MinHash),
    // rows-checked, like l02b/l02c.
    "l02e_lsh_deleted" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      val prefix = "graft_lshdel_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val all = docs(s, dir)
      val erased = all.filter(col("doc_id") % 7 === 3)
      val surviving = all.filter(col("doc_id") % 7 =!= 3)
      // idempotent per (session, dir): usable == the POST-delete state
      // (retracted signature matches the surviving corpus) is already
      // in the warehouse; anything else rebuilds from scratch
      if (!SimIndex.isUsable(s, prefix, surviving,
          Seq("_bands", "_sigs"))) {
        Seq("_bands", "_sigs", "_meta", "_tombstones").foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $prefix$t")
          Bucketing.dropStaleLocation(s, prefix + t)
        }
        SimIndex.writeLshIndex(all, prefix, numHashes = 32,
          bands = 16, buckets = 8)
        SimIndex.deleteFromLshIndex(erased, prefix)
      }
      val cands = SimIndex.lshCandidatesFromIndex(s, prefix,
        verifyAgainst = Some(surviving))
      val likely = Similarity
        .estimateJaccard(cands, s.table(s"${prefix}_sigs"))
        .filter(col("est_jaccard") >= 0.42)
        .select("a_id", "b_id")
      Similarity.exactJaccardCompact(Text.shingles(surviving, 3), likely)
        .filter(col("jaccard") > 0.6)
        .select(col("a_id"), col("b_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    // L02h (r18) — near-dedup over the VACUUMED post-delete index: the
    // l02e state after [[SimIndex.vacuumIndex]] physically folds the
    // tombstones in (per-table shadow write + rename swap — the
    // compactBucketed discipline, so a failure mid-vacuum leaves the
    // pre-vacuum index intact). The read pipeline is l02e's verbatim,
    // but the candidate plan carries NO tombstone anti-join (the
    // tombstone table is gone) — the registry twin certifying the
    // compaction preserves the read exactly while making it strictly
    // cheaper (the stress harness records the cost side). Engine-only
    // (seeded MinHash), rows-checked; SimIndexSpec pins l02h == l02e
    // row-for-row.
    "l02h_lsh_vacuumed" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      val prefix = "graft_lshvac_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val all = docs(s, dir)
      val erased = all.filter(col("doc_id") % 7 === 3)
      val surviving = all.filter(col("doc_id") % 7 =!= 3)
      // usable == the post-VACUUM state: signature matches the
      // survivors AND no tombstone table remains (a deleted-but-not-
      // vacuumed leftover has the same signature — rebuild in that case
      // so this query always reads a physically-compacted index)
      if (!(SimIndex.isUsable(s, prefix, surviving, Seq("_bands", "_sigs"))
          && !s.catalog.tableExists(s"${prefix}_tombstones"))) {
        Seq("_bands", "_sigs", "_meta", "_tombstones").foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $prefix$t")
          Bucketing.dropStaleLocation(s, prefix + t)
        }
        SimIndex.writeLshIndex(all, prefix, numHashes = 32,
          bands = 16, buckets = 8)
        SimIndex.deleteFromLshIndex(erased, prefix)
        SimIndex.vacuumIndex(s, prefix)
      }
      val cands = SimIndex.lshCandidatesFromIndex(s, prefix,
        verifyAgainst = Some(surviving))
      val likely = Similarity
        .estimateJaccard(cands, s.table(s"${prefix}_sigs"))
        .filter(col("est_jaccard") >= 0.42)
        .select("a_id", "b_id")
      Similarity.exactJaccardCompact(Text.shingles(surviving, 3), likely)
        .filter(col("jaccard") > 0.6)
        .select(col("a_id"), col("b_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    // L15 — near-dup cluster resolution, the step AFTER pair finding in
    // a real dedup pipeline: the exact-Jaccard pair set (L02's edges)
    // becomes an undirected graph; connected components assign each doc
    // its cluster, labeled by the component's min doc_id — the canonical
    // survivor everything else in the cluster dedups against. Pairless
    // docs are trivially their own cluster and are omitted. Reuses the
    // star-contraction CC (O(log n) rounds) — at 100 TB the pair list
    // comes from the LSH path (L02b) and the same contraction runs.
    "l15_dedup_clusters" -> ((s, dir) => {
      val pairs = Similarity.exactJaccard(Text.shingles(docs(s, dir), 3))
        .filter(col("jaccard") > 0.6)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      Graphs.connectedComponentsDF(s, pairs)
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
        .orderBy("doc_id")
    }),

    // L34 — deterministic text canonicalization: the cleaning pass the
    // hash-keyed pipeline assumes (lowercase, control chars stripped,
    // whitespace collapsed, trimmed), with the canonical md5 as the
    // engine-portable corpus key plus the shrinkage it bought. Pure
    // codegen regex chain; every rule replays in DuckDB.
    "l34_text_canonical" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("raw_bytes"),
          octet_length(Text.canonicalText(col("text"))).cast("long")
            .as("canon_bytes"),
          md5(Text.canonicalText(col("text"))).as("canon_md5"))
        .orderBy("doc_id")),

    // L33 — the dedup KEEP-LIST, the actionable output of the near-dup
    // pipeline: within each l15 cluster the canonical doc (longest,
    // tie → min id) keeps, every other member is the drop list a
    // training pipeline deletes. One window over the cluster key on
    // top of the l15 components; hash-matched against the shared
    // cluster replay + canonical pick.
    "l33_dedup_keeplist" -> ((s, dir) =>
      dedupKeep(s, dir)
        .select("doc_id", "cluster_id", "keep")
        .orderBy("doc_id")),

    // L48 — SEMANTIC dedup keep-list (SemDeDup): per embedding cluster,
    // members whose cosine-to-centroid clears 0.3 are semantic
    // duplicates; the min-id one keeps. The decision layer is exact
    // integer (quantized embeddings, squared-cosine comparison in
    // decimal — see Similarity.semanticDedupKeep), so the lexical
    // stack's hash-match discipline extends to embedding space;
    // quantization fidelity vs float cosine is gated in ToleranceSpec.
    "l48_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedupKeep(vecs(s, dir))
        .select("vec_id", "label", "close", "keep")
        .orderBy("vec_id")),

    // L48b — SemDeDup with the clustering DERIVED, not read (NEW r13):
    // the fixture's label column is replaced by a deterministic
    // exact-integer Lloyd k-means (k=8, 2 iterations, min-id seeds —
    // Similarity.kmeansExactAssign), then the same integer cosine gate
    // and min-id keep as l48. Because the clustering itself is integer
    // arithmetic, the ENTIRE pipeline — cluster assignment included —
    // hash-matches an unrolled DuckDB Lloyd replay; this is the full
    // SemDeDup shape (embed → cluster → per-cluster centroid dedup)
    // with no engine-private state anywhere.
    "l48b_semantic_dedup_kmeans" -> ((s, dir) => {
      val v = vecs(s, dir)
      val lab = Similarity.kmeansExactAssign(v, k = 8, iters = 2)
      Similarity.semanticDedupKeep(
          v.select("vec_id", "embedding").join(lab, "vec_id"))
        .select("vec_id", "label", "close", "keep")
        .orderBy("vec_id")
    }),

    // L43 — the PIPELINE MANIFEST: the whole curation funnel as one
    // attrition table — every doc pushed through language gate (l04c's
    // n-gram guesser, keep 'en'), quality gate (l19's Gopher flags),
    // and near-dup gate (l33's keep-list), with surviving (n_docs,
    // n_chars) after each stage. The number a data lead actually signs
    // off on ("how much training data is left, and which gate ate
    // what") — and because every component is individually
    // hash-matched, the COMPOSITION is too. One pass computes all
    // per-doc gate bits; the stage rows are four aggregates over that
    // table, the dedup join is the only non-doc-local work (exactly
    // l33's).
    "l43_pipeline_manifest" -> ((s, dir) =>
      manifestDf(s, dir, dedupKeep(s, dir),
        Similarity.semanticDedupKeep(vecs(s, dir)))),

    // L43b — the manifest with BOTH data-derived gates: exact-hash
    // dedup (the realistic first dedup pass — identical bytes, keep
    // min doc_id) and a semantic stage consuming l48b's DERIVED
    // clusters (exact-integer Lloyd k-means) instead of the fixture's
    // label column: the funnel, clustering included, is
    // engine-computable and hash-matches its unrolled replay. The LSH
    // stage stays l43's: composing the recursive LSH replay with the
    // k-means replay in ONE DuckDB 1.0 statement triggers an unbounded
    // parallel-spill pathology (bisected r13: either chain alone, or
    // both without the manifest join, completes in seconds; joined
    // through `staged` the engine spills >79 GB of temp and never
    // finishes — single-threaded it completes, so it is a scheduler
    // artifact, not a plan-shape issue).
    "l43b_manifest_derived_clusters" -> ((s, dir) => {
      val v = vecs(s, dir)
      val lab = Similarity.kmeansExactAssign(v, k = 8, iters = 2)
      manifestDf(s, dir, exactDedupKeep(s, dir),
        Similarity.semanticDedupKeep(
          v.select("vec_id", "embedding").join(lab, "vec_id")))
    }),

    // L17 — blocked fuzzy join (entity resolution): part-name pairs at
    // edit distance <= 2 WITHIN a brand block — the block key turns the
    // all-pairs quadratic into per-block work (the same bounding move as
    // the banded range join), and levenshtein has identical unit-cost
    // semantics in both engines, so the result hash-matches.
    "l17_fuzzy_join" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .select("p_partkey", "p_brand", "p_name")
      val a = p.select(col("p_brand"), col("p_partkey").as("a_id"),
        col("p_name").as("a_name"))
      val b = p.select(col("p_brand").as("b_brand"),
        col("p_partkey").as("b_id"), col("p_name").as("b_name"))
      a.join(b, col("p_brand") === col("b_brand") && col("a_id") < col("b_id"))
        .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
        .filter(col("dist") <= 2)
        .select("a_id", "b_id", "dist")
        .orderBy("a_id", "b_id")
    }),

    // L22 — vocabulary build + OOV coverage: global top-1000 tokens
    // (deterministic boundary: count desc, token asc) then per-doc
    // out-of-vocabulary rate — the metric that sizes a tokenizer vocab.
    "l22_vocab_coverage" -> ((s, dir) =>
      Text.vocabCoverage(docs(s, dir), vocabSize = 1000).orderBy("doc_id")),

    // L18 — deterministic content-hash train/val/test split: the holdout
    // assignment every training pipeline needs, stable across runs AND
    // engines (md5-hex prefix vs fraction boundaries — no
    // engine-private hash) and leakage-safe (identical text always lands
    // in the same split). Hash-matched per-split counts.
    "l18_stable_split" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("split", Text.stableSplit(col("text"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars_total"))
        .orderBy("split")
    }),

    // L19 — Gopher-style quality gate: per-doc word-count / mean-word-
    // length / stopword-fraction rules plus the conjunctive keep
    // decision, all in exact integer factors with single divisions so
    // the full per-doc table hash-matches.
    "l19_gopher_flags" -> ((s, dir) =>
      Text.gopherFlags(docs(s, dir)).orderBy("doc_id")),

    // L23 — per-source document cap (domain balancing): keep the top-10
    // docs of each source by (n_chars desc, doc_id) — the per-domain
    // quota every web-scale corpus applies so no single domain dominates
    // training. A model quality score slots into the ORDER BY in
    // production; the deterministic proxy keeps the contract
    // hash-matched. One window shuffle on source; at 100 TB source is
    // the natural partition key and the cap never materializes more
    // than N rows per key past the rank filter.
    "l23_source_cap" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("n_chars"), col("doc_id"))
      docs(s, dir)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 10)
        .select("source", "rk", "doc_id", "n_chars")
        .orderBy("source", "rk")
    }),

    // L31 — proportional corpus sample by LARGEST-REMAINDER
    // apportionment (Hamilton's method): a fixed budget of 100 docs
    // split across sources exactly proportionally — floor(K·n_i/N)
    // seats each, the K − Σfloor leftovers to the largest integer
    // remainders (K·n_i mod N, ties → source asc). Every quantity is
    // integer, so the allocation replays bit-for-bit cross-engine —
    // unlike float-quota rounding, it can neither over- nor
    // under-allocate. Docs picked per source by the q36 md5 sort key
    // (rerun- and engine-stable). The apportionment windows run on the
    // SOURCE DIMENSION (|sources| rows), not the corpus — the global
    // window is dimension-sized by construction.
    "l31_proportional_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val alloc = Text.apportion(
        d.groupBy("source").agg(count(lit(1)).as("n")), "source",
        budget = 100)
      val wPick = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      d.join(broadcast(alloc), "source")
        .withColumn("sel_rank", row_number().over(wPick).cast("long"))
        .filter(col("sel_rank") <= col("alloc"))
        .select("source", "sel_rank", "doc_id")
        .orderBy("source", "sel_rank")
    }),

    // L24 — mixture weights over the quality-gated corpus (α = 1/2
    // temperature): per-source sampling weight ∝ sqrt(survivor count),
    // the standard low-resource-upweighting rule for multi-corpus
    // training mixes. Cross-engine exactness via QUANTIZE-THEN-SUM:
    // each source's sqrt is rounded to 1e-6 FIRST (IEEE sqrt + round —
    // bit-identical on both engines), and the normalizing denominator
    // is the integer sum of those quanta — order-free, unlike a float
    // Σsqrt whose partial-sum order could flip a rounded digit. The
    // same quantization is what makes the weights reproducible across
    // cluster topologies at 100 TB.
    "l24_mixture_weights" -> ((s, dir) => {
      val d = docs(s, dir)
      val kept = Text.gopherFlags(d).filter(col("keep"))
        .select("doc_id")
        .join(d.select("doc_id", "source"), "doc_id")
      val counts = kept.groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("q", round(sqrt(col("n_docs")) * lit(1e6)).cast("long"))
      val total = counts.agg(sum(col("q")).as("q_total"))
      counts.crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"),
          round(col("q") / col("q_total"), 6).as("weight"))
        .orderBy("source")
    }),

    // L25 — PII redaction: emails / dashed phone numbers / long digit
    // runs scrubbed to typed placeholder tokens, with per-doc match
    // counts — the scrub every web-scale corpus runs before training.
    // The synthetic corpus carries no PII, so a deterministic contact
    // trailer derived from doc_id is appended IDENTICALLY on both
    // engines first (variable shape: every doc one email + one phone,
    // every 3rd a second email, every 5th an account number) — the
    // redaction itself is genuinely exercised, not a no-op. Patterns are
    // restricted to Java-regex/RE2-identical syntax (Text.EmailRe etc.);
    // output carries md5(redacted) so the full scrubbed string is
    // hash-matched without shipping it. Pure per-row projection work —
    // pipelines inside scan codegen, no shuffle.
    "l25_pii_redact" -> ((s, dir) => {
      val full = concat(
        col("text"),
        lit(" Contact doc"), col("doc_id").cast("string"),
        lit("@example.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" or doc"), col("doc_id").cast("string"),
            lit(".alt@mail"), (col("doc_id") % 7).cast("string"),
            lit(".example.org"))).otherwise(lit("")),
        lit(" call +"), (col("doc_id") % 89 + 1).cast("string"),
        lit("-"), (col("doc_id") % 900 + 100).cast("string"),
        lit("-"), (col("doc_id") % 9000 + 1000).cast("string"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" acct "),
            (col("doc_id") * 97 + 123456789L).cast("string")))
          .otherwise(lit("")))
      docs(s, dir)
        .select(col("doc_id") +: Text.piiRedact(full): _*)
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          col("n_ids"), md5(col("redacted")).as("red_md5"))
        .orderBy("doc_id")
    }),

    // L26 — hashed-feature linear quality scorer (fasttext shape):
    // lowercase bigrams -> md5Long feature hashing into 4096 buckets ->
    // integer weight lookup -> per-doc score + keep decision. The
    // deterministic fixture weights (fid % 201 - 100) stand in for a
    // trained table; every step of the scoring path replays exactly in
    // DuckDB (md5 fold twin), so the full per-doc score column
    // hash-matches.
    "l26_quality_score" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id") +:
          Text.hashedLinearScore(col("text"), buckets = 4096): _*)
        .orderBy("doc_id")),

    // L54 — TOKEN-BUDGET corpus selection (NEW r14): the "best docs
    // until the budget runs out" pass every training run makes —
    // greedy by integer quality (alpha-density score_e6 = 10^6·n_alpha
    // div n_chars), doc_id tiebreak, budget = ⌊total tokens / 5⌋,
    // reported per source. The SELECTION RULE is the global
    // (score desc, doc_id) prefix under the budget, but the PLAN is
    // two-pass threshold, never a global single-partition cumsum: (1)
    // cumulate tokens over the SCORE-BUCKET dimension (≤ 10^6+1 rows —
    // a bounded dimension table, so its order-by window is fine) to
    // find the boundary score; (2) whole buckets above it semi-join in;
    // the ONE boundary bucket takes a doc_id-ordered prefix of its
    // remaining budget (window over that bucket's population only). At
    // 100 TB pass 1 is a broadcast-size aggregate and pass 2 is
    // map-side — the oracle pays the global cumsum instead.
    "l54_budget_select" -> ((s, dir) =>
      Text.budgetSelect(docs(s, dir), budgetDenom = 5L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_selected"),
          sum("n_toks").as("sel_tokens"))
        .orderBy("source")),

    // L55 — SELECT-THEN-PACK (NEW r14): the l54 budget selection
    // composed with l11's greedy sequence packing — the two adjacent
    // stages every pretraining data pipeline runs back to back ("pick
    // the best docs under the token budget, then pack them into
    // context windows"). Pack stats per (bucket, pack): the packer
    // folds ONLY the selected docs, so pack ids/fills differ from
    // l11's whole-corpus run wherever the selection dropped a doc —
    // the composition is genuinely exercised. Oracle = the l54 global-
    // cumsum selection feeding l11's recursive pack replay.
    "l55_select_pack" -> ((s, dir) =>
      Text.packGreedy(Text.budgetSelect(docs(s, dir), budgetDenom = 5L),
          cap = 256L, buckets = 8)
        .groupBy("bucket", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("sum_tokens"))
        .orderBy("bucket", "pack_id")),

    // L57 — PACK MATERIALIZATION (NEW r14): l11 assigns docs to packs;
    // this EMITS the packed training sequences — per (bucket, pack),
    // the member texts concatenated in doc_id order with an <eos>
    // separator plus the exact token accounting, i.e. the artifact a
    // trainer memory-maps. Deterministic order => the concatenated
    // STRING hash-matches cross-engine, certifying byte-level
    // equivalence of the materialized sequence, not just its stats.
    "l57_pack_emit" -> ((s, dir) =>
      Text.packGreedy(docs(s, dir), cap = 256L, buckets = 8)
        .join(docs(s, dir).select("doc_id", "text"), "doc_id")
        .groupBy("bucket", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("sum_tokens"),
          array_join(transform(
            sort_array(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")), "<eos>").as("packed"))
        .orderBy("bucket", "pack_id")),

    // L27 — BPE merge training over the documents vocabulary: the first
    // 8 learned merges (round, pair, weighted count). Exact integer
    // counts + deterministic tie-breaks; hash-matched against an
    // unrolled 8-round DuckDB replay of the same count→pick→fold cycle.
    "l27_bpe_merges" -> ((s, dir) =>
      Text.bpeTrain(docs(s, dir), vocabWords = 500, merges = 8)
        .orderBy("round")),

    // L28 — BPE encoding with the merges L27 just learned: per-doc
    // (n_words, n_subtokens) after applying all 8 merges in training
    // order — the compression-ratio metric a tokenizer build is judged
    // by. The 8-row merge table is a driver fetch (codebook pattern);
    // hash-matched against the unrolled replay (train chain + 8 apply
    // folds over each doc's words).
    "l28_bpe_encode" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = Text.bpeTrain(d, vocabWords = 500, merges = 8)
        .orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Text.bpeSubtokenCounts(d, merges).orderBy("doc_id")
    }),

    // L49 — unigram-style (SentencePiece-companion) tokenizer TRAINING:
    // candidate substring pieces of the frequent-word vocabulary pruned
    // over 3 bounded rounds by MaxMatch usage (least-used multi-char
    // pieces drop, singles never do) — the top-down mirror of l27's
    // bottom-up BPE merges. Deterministic integers end-to-end
    // (longest-match argmax is unique; prune order usage asc, piece
    // asc), so the surviving vocabulary + final usage hash-match an
    // unrolled DuckDB replay of the same segment→count→prune rounds.
    "l49_unigram_vocab" -> ((s, dir) =>
      Text.unigramTrain(docs(s, dir), vocabWords = 200, maxPieceLen = 4,
          candidates = 150, rounds = 3, prunePerRound = 30)
        .orderBy("piece")),

    // L42 — tokenizer FERTILITY by language: subtokens-per-word of the
    // trained BPE (l27's merges applied by l28's encoder), aggregated
    // per lang as an exact scaled integer (fert_e4 = 10^4·Σsub div
    // Σwords) — the canonical "is the tokenizer fair to this
    // language" audit (high fertility = more compute per word, worse
    // effective context for that slice of the corpus). Same tiny
    // merge-table collect as l28 (codebook pattern), one extra
    // broadcast lang join and a ≤|langs|-row aggregate on top.
    "l42_bpe_fertility" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = Text.bpeTrain(d, vocabWords = 500, merges = 8)
        .orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Text.bpeSubtokenCounts(d, merges)
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(sum("n_words").as("n_words"),
          sum("n_subtokens").as("n_subtokens"))
        .filter(col("n_words") > 0)
        .withColumn("fert_e4", expr("10000 * n_subtokens div n_words"))
        .transform(Relational.enumSort(_, "lang")) // r20: bounded key domain
    }),

    // L29 — DSIR-style hashed-bigram importance weights: target = the
    // English subset, raw = the full pool; per-bucket Laplace-smoothed
    // likelihood ratios in exact integer e6 scale, summed per doc. The
    // data-selection score a curated-corpus resample draws against;
    // every step (tokenize, hash, smooth, ratio, sum) replays in DuckDB.
    "l29_importance_weights" -> ((s, dir) =>
      Text.importanceWeights(docs(s, dir), isTarget = col("lang") === "en",
          buckets = 4096)
        .orderBy("doc_id")),

    // L50 — bigram-LM cross-entropy scoring (the CCNet-style quality
    // filter): add-one-smoothed word-bigram model trained on the
    // doc_id%5==0 reference slice, every doc scored by mean -ln p of
    // its bigrams. The model tables broadcast; scoring is map-side.
    "l50_bigram_xent" -> ((s, dir) =>
      Text.bigramXent(docs(s, dir), isRef = col("doc_id") % 5 === 0)
        .orderBy("doc_id")),

    // L20 — binary (sign-bit) embeddings: 64 float dims -> two 32-bit
    // sign words (32x working-set shrink); exact integer fold, so the
    // packed words hash-match the SQL oracle.
    "l20_sign_pack" -> ((s, dir) =>
      Similarity.signPack(vecs(s, dir)).orderBy("vec_id")),

    // L20b — Hamming k-NN over the packed sign bits: xor + popcount scan
    // for vec 0's 20 nearest neighbors, the cheapest candidate metric a
    // binary-embedding index reranks into. Total order (hamming, vec_id).
    "l20b_hamming_knn" -> ((s, dir) => {
      val packed = Similarity.signPack(vecs(s, dir))
      val q = packed.filter(col("vec_id") === 0).head()
      Similarity.hammingKnn(packed.filter(col("vec_id") =!= 0),
        q.getLong(1), q.getLong(2), 20)
    }),

    // L21 — product-quantization ANN (the IVF-PQ codebook layer):
    // per-subspace seeded-kmeans codebooks -> m-code encoding (32x
    // compression) -> asymmetric-distance (ADC) top-10 for vec 0's
    // query, where each database dot is m table lookups. Engine-only
    // (seeded kmeans); PqSpec gates the ADC linearity identity and
    // recall vs the exact dot scan.
    "l21_pq_knn" -> ((s, dir) => {
      val v = vecs(s, dir)
      val cb = Similarity.pqTrain(v, m = 8, dims = 64, k = 32)
      val codes = Similarity.pqEncode(v, cb, m = 8, dims = 64)
      val q = v.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      Similarity.pqAdcKnn(codes.filter(col("vec_id") =!= 0), cb, q,
          m = 8, dims = 64, k = 10)
        .withColumn("adc_dot", round(col("adc_dot"), 4))
    }),

    // L21b — composed IVF-PQ search over the PERSISTED index: coarse
    // centroids + residual PQ codebooks + bucketed codes built ONCE per
    // (session, sf dir); the query probes 2 coarse buckets and scores
    // m-code vectors via one broadcast ADC table — the billion-scale
    // index layout (codes are ~m bytes/vector; the scan is pruned to
    // probed buckets). vec 0 ranking itself first is the built-in sanity
    // signal. Engine-only (seeded kmeans); PqSpec gates identity/recall.
    "l21b_ivfpq_knn" -> ((s, dir) => {
      val prefix = "graft_ivfpq_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      // cache validity = build signature vs the live embeddings table
      // (not table existence): a regenerated fixture rebuilds the index
      // instead of silently probing codes from the old vectors
      if (!SimIndex.isUsable(s, prefix, vecs(s, dir),
          Seq("_centroids", "_pq_codebooks", "_pq_codes"))) {
        Seq("_centroids", "_pq_codebooks", "_pq_codes", "_meta").foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $prefix$t")
          Bucketing.dropStaleLocation(s, prefix + t)
        }
        SimIndex.writeIvfPqIndex(vecs(s, dir), prefix, nCentroids = 8,
          m = 8, dims = 64, k = 32, buckets = 8)
      }
      val q = vecs(s, dir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      SimIndex.ivfPqSearch(s, prefix, q, nprobe = 2, topk = 10,
          verifyAgainst = Some(vecs(s, dir)))
        .withColumn("score", round(col("score"), 4))
    }),

    // L03 — embedding similarity: exact top-20 cosine pairs via the
    // broadcast-block kernel (no all-pairs join materialization).
    "l03_cosine_topk" -> ((s, dir) => {
      Similarity.topKCosinePairs(vecs(s, dir), 20)
        .orderBy(desc("cos_sim"), col("a_id"), col("b_id"))
    }),

    // L32 — Matryoshka-truncated top-k (the MRL practice): the SAME
    // exact blocked kernel over the embeddings' first 16 of 64 dims —
    // cosine self-normalizes the prefix, so truncation is a pure
    // `slice` and the 4x-smaller working set reuses every downstream
    // path unchanged (the coarse pass of a truncate-then-rerank
    // funnel). Hash-matched against the l03 oracle on sliced lists;
    // ToleranceSpec pins the full-width-slice identity. (No recall
    // gate: the fixture embeddings are RANDOM, so a 16-dim prefix is
    // uncorrelated with full-64 cosine by construction — measured 0/20
    // at sf0.001 — where trained matryoshka prefixes would correlate.)
    "l32_matryoshka_topk" -> ((s, dir) => {
      val trunc = vecs(s, dir).select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"), col("label"))
      Similarity.topKCosinePairs(trunc, 20)
        .orderBy(desc("cos_sim"), col("a_id"), col("b_id"))
    }),

    // L03b — IVF-bucketed ANN: seeded k-means coarse quantizer ->
    // multi-probe (nprobe=2) bucket assignment -> exact rerank only WITHIN
    // buckets (equi join on bucket replaces the all-pairs quadratic).
    // Engine-only; ToleranceSpec gates recall vs the exact L03.
    "l03b_ivf_ann" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      Similarity.ivfTopKPairs(vecs(s, dir), k = 20, nCentroids = 8,
          nprobe = 2)
        .orderBy(desc("cos_sim"), col("a_id"), col("b_id"))
    }),

    // L08 — per-label vector centroids via the typed Aggregator UDAF
    // (SURVEY §2.6 surface), exploded to (label, dim) for the oracle.
    "l08_centroids" -> ((s, dir) => {
      val centroidUdaf = udaf(graft.functions.VecCentroid)
      vecs(s, dir)
        .groupBy("label")
        .agg(centroidUdaf(col("embedding")).as("centroid"))
        .select(col("label"), posexplode(col("centroid"))
          .as(Seq("dim_idx", "cval")))
        .select(col("label"), col("dim_idx"),
          round(col("cval"), 4).as("c4"))
        .orderBy("label", "dim_idx")
    }),

    // L03c — embedding-cosine near-dup: all pairs above a similarity
    // threshold (the dedup-decision form of L03; exact, hash-checked).
    // Routed through the blocked-replication kernel — no
    // BroadcastNestedLoopJoin (the engine's own NestedLoopGuard passes;
    // PlanShapeSpec sweeps it with every other registry query).
    "l03c_cosine_neardup" -> ((s, dir) => {
      Similarity.thresholdCosinePairs(vecs(s, dir), threshold = 0.4)
        .select(col("a_id"), col("b_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // L03d — IVF-bucketed threshold near-dup: the sub-quadratic scale
    // path for l03c (bucket-local equi join + exact cosine filter, as
    // l03b is for l03). Engine-only (seeded kmeans); ToleranceSpec gates
    // precision == 1.0 and measured recall vs the exact l03c pairs.
    "l03d_ivf_neardup" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      Similarity.ivfThresholdPairs(vecs(s, dir), threshold = 0.4,
          nCentroids = 8, nprobe = 2)
        .select(col("a_id"), col("b_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // L13 — int8-quantized vector search: the exact top-k kernel run over
    // dequantized (scale · codes) vectors — 4× smaller search working
    // set. Engine-only; ToleranceSpec gates the reconstruction-error
    // bound and recall vs the exact L03 pairs.
    "l13_quantized_topk" -> ((s, dir) => {
      Similarity.topKCosinePairs(
          Similarity.dequantizeInt8(Similarity.quantizeInt8(vecs(s, dir))), 20)
        .orderBy(desc("cos_sim"), col("a_id"), col("b_id"))
    }),

    // L04 — text analysis: per-language token/char statistics.
    "l04_text_stats" -> ((s, dir) => {
      docs(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(Text.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(Text.bpeishTokenCount(col("text")).cast("long"))
            .as("n_bpe_tokens"),
          sum(col("n_chars")).as("sum_chars"))
        // integer HALF_UP to 4 decimals (n_chars is integral) — see T03
        .withColumn("avg_chars",
          expr("(20000 * sum_chars + n_docs) div (2 * n_docs)") / lit(10000.0))
        .transform(Relational.enumSort(_, "lang")) // r20: bounded key domain
    }),

    // L04b — per-document quality features.
    "l04b_quality" -> ((s, dir) =>
      Text.qualityFeatures(docs(s, dir)).orderBy("doc_id")),

    // L04c — language-ID heuristic vs. the labeled lang column.
    // Hash-matched since r7: the heuristic is scalar SQL (word-list hit
    // counts + CJK density), so the oracle replays it exactly; the
    // ScalaTest accuracy gate stays on top.
    "l04c_langid" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("guess", Text.langIdGuess(col("text")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("guess") === col("lang"), 1L).otherwise(0L))
            .as("n_correct"))
        .transform(Relational.enumSort(_, "lang")) // r20: bounded key domain
    }),

    // L04d — order-sensitive rolling fingerprint of the token stream.
    // Hash-matched since r7: the per-token hash is Det.md5Long (md5 is
    // the one hash both engines compute identically), so the exact fold
    // replays in the oracle.
    "l04d_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // L04e — intra-doc repetition metrics (Gopher-style quality rules):
    // duplicate-token and duplicate-bigram permille, integer arithmetic,
    // hash-checked against a DuckDB list-HOF twin.
    "l04e_repetition" -> ((s, dir) =>
      Text.repetitionFeatures(docs(s, dir)).orderBy("doc_id")),

    // L14 — overlapping document chunking: 200-char windows every 150
    // chars (50-char overlap), the RAG/context-window prep step. Full
    // chunk text is part of the hash oracle.
    "l14_chunks" -> ((s, dir) =>
      Text.chunk(docs(s, dir), size = 200, stride = 150)
        .orderBy("doc_id", "chunk_id")),

    // L05 — multimodal/array columns: parquet round-trip of float vectors,
    // norm and L2-normalization via HOFs.
    "l05_embeddings" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      vecs(s, dir)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("dim"),
          round(Similarity.norm(col("embedding")), 4).as("nrm"),
          round(element_at(Similarity.l2normalize(col("embedding")), 1), 4)
            .as("n0"))
        .orderBy("vec_id")
    }),

    // L05b — multimodal binary plumbing: text -> UTF-8 binary payload,
    // byte length (schema + partitioning path for opaque media columns).
    "l05b_binary" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), octet_length(col("text")).as("n_bytes"))
        .orderBy("doc_id")
    }),

    // L05c — stubbed media feature-extraction over the binary payload:
    // deterministic fake decode (md5-derived integer of the BYTES)
    // standing in for an image/audio decoder. Hash-matched: the payload
    // is exactly the UTF-8 encoding of `text`, so DuckDB's md5(text)
    // (which hashes the string's UTF-8 bytes) replays the same feature.
    "l05c_binary_features" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          graft.Det.md5Long(col("payload")).as("feature"))
        .orderBy("doc_id")
    }),

    // L09 — multimodal pipeline, REAL codec path: each doc's text bytes
    // are wrapped into a VALID PPM (P6) container (fixed width 32,
    // height sized to the payload, zero-padded raster), decoded by the
    // dependency-free PPM codec (ops.Media.decodePpm — header parse +
    // exact per-channel means) through the mapPartitions batch shape,
    // then lazily resized, frame-sampled, and reduced to per-doc stats.
    // Engine-only, rows-only check; MediaSpec asserts exact decoded
    // dimensions/stats on synthesized binaries round-tripped through
    // parquet.
    "l09_media_pipeline" -> ((s, dir) => {
      val decoded = graft.ops.Media.decodeImages(ppmSrc(s, dir), "payload")
        .withColumn("meta_small",
          graft.ops.Media.resizeMeta(col("image_meta"), 64, 64))
      graft.ops.Media.frameSample(decoded, "payload", 4)
        .groupBy(col("doc_id"), col("image_meta.width").as("w"),
          col("image_meta.height").as("h"),
          col("meta_small.width").as("w_small"),
          round(col("image_meta.mean_r"), 4).as("mean_r"))
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame_payload"))).as("frame_bytes"))
        .orderBy("doc_id")
    }),

    // L09b — MATERIALIZED thumbnails: the same payloads resized eagerly
    // to 8×8 by the real nearest-neighbor raster kernel (Media
    // .resizePpm — l09's resizeMeta is the lazy half), then re-decoded;
    // the thumb md5 fingerprints every byte of the re-encoded raster.
    // Engine-only (rows-only check); MediaSpec pins exact pixel
    // mappings (duplication, identity, top-left pick, malformed→null).
    "l09b_media_resize" -> ((s, dir) => {
      val resized = graft.ops.Media.resizeImages(ppmSrc(s, dir),
        "payload", 8, 8)
      graft.ops.Media.decodeImages(resized, "resized_payload", "thumb_meta")
        .select(col("doc_id"), col("thumb_meta.width").as("w"),
          col("thumb_meta.height").as("h"),
          round(col("thumb_meta.mean_r"), 4).as("mean_r"),
          md5(col("resized_payload")).as("thumb_md5"))
        .orderBy("doc_id")
    }),

    // L51 — audio FEATURE EXTRACTION through the real codec: each doc
    // gets a deterministic PCM16 "recording" (sample_i =
    // md5Long(doc_id||'_'||i) % 65536 − 32768 — engine-portable, so
    // DuckDB replays the exact stream arithmetically), ENCODED into a
    // real WAV container, PARSED BACK by the byte-level codec
    // (Media.wavSamples — the container round-trip is genuinely
    // exercised), then reduced to per-64-sample-window exact integer
    // features: energy (Σ s²) and zero crossings (sign flips). The
    // windowed-feature shape every audio curation pipeline runs; at
    // 100 TB the decode is the same mapPartitions batch a native codec
    // binding uses and the features are one lag + one groupBy.
    "l51_audio_features" -> ((s, dir) => {
      import s.implicits._
      val n = 256
      val smp = docs(s, dir).select(col("doc_id"))
        .withColumn("i", explode(sequence(lit(0), lit(n - 1))))
        .withColumn("smp",
          (graft.Det.md5Long(concat(col("doc_id"), lit("_"), col("i")))
            % 65536 - 32768).cast("int"))
      val wavs = smp.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("i"), col("smp"))))
          .as("ss"))
        .as[(Long, Seq[(Int, Int)])]
        .map { case (id, ss) =>
          (id, graft.ops.Media.encodeWav(16000,
            ss.map(_._2.toShort).toArray))
        }
        .toDF("doc_id", "payload")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("i")
      graft.ops.Media.decodeAudioSamples(wavs, "payload")
        .select(col("doc_id"),
          posexplode(col("samples")).as(Seq("i", "smp")))
        .withColumn("prev", lag("smp", 1).over(w))
        .groupBy(col("doc_id"), expr("CAST(i div 64 AS BIGINT)").as("win"))
        .agg(count(lit(1)).as("n"),
          sum(col("smp").cast("long") * col("smp")).as("energy"),
          sum(when(col("i") % 64 =!= 0 &&
              col("prev").cast("long") * col("smp") < 0, 1L)
            .otherwise(0L)).as("crossings"))
        .orderBy("doc_id", "win")
    }),

    // L53 — IMAGE channel features through a REAL PPM encode→parse
    // round trip (NEW r14, the image twin of l51's WAV gate): one
    // deterministic 8×8 RGB image per doc (channel values from the
    // md5Long grid both engines can compute), encoded to real P6 bytes
    // (Media.encodePpm), parsed back by the real raster parser
    // (Media.decodeImagePixels), then per-(doc, channel) exact-integer
    // moments + a 4-bucket intensity histogram — the embedding-input
    // statistics a multimodal curation pass runs. The oracle computes
    // the same features from the md5 grid directly, so the hash match
    // certifies the codec round trip end to end. Plan: the encode and
    // parse are one mapPartitions each (the codec batch shape); the
    // feature agg is one hash aggregate over the exploded raster —
    // at 100 TB the raster explode stays inside the partition.
    "l53_image_features" -> ((s, dir) => {
      import s.implicits._
      val n = 8 * 8 * 3
      val pix = docs(s, dir).select(col("doc_id"))
        .withColumn("p", explode(sequence(lit(0), lit(n - 1))))
        .withColumn("v",
          (graft.Det.md5Long(concat(col("doc_id"), lit("_"), col("p")))
            % 256).cast("int"))
      val ppms = pix.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("p"), col("v"))))
          .as("ps"))
        .as[(Long, Seq[(Int, Int)])]
        .map { case (id, ps) =>
          (id, graft.ops.Media.encodePpm(8, 8, 255,
            ps.map(_._2.toByte).toArray))
        }
        .toDF("doc_id", "payload")
      graft.ops.Media.decodeImagePixels(ppms, "payload")
        .select(col("doc_id"), posexplode(col("pixels")).as(Seq("i", "v")))
        .groupBy(col("doc_id"), (col("i") % 3).cast("long").as("channel"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("long")).as("sum_v"),
          sum(col("v").cast("long") * col("v")).as("sum_sq"),
          sum(when(col("v") < 64, 1L).otherwise(0L)).as("h0"),
          sum(when(col("v") >= 64 && col("v") < 128, 1L).otherwise(0L))
            .as("h1"),
          sum(when(col("v") >= 128 && col("v") < 192, 1L).otherwise(0L))
            .as("h2"),
          sum(when(col("v") >= 192, 1L).otherwise(0L)).as("h3"))
        .orderBy("doc_id", "channel")
    }),

    // L53b — multimodal (IMAGE) near-dup, exact form (r16 — closes the
    // "image features don't feed the ANN path" gap): the l53 codec
    // pipeline composed into the dedup path. Real P6 bytes per doc
    // (content keyed by doc_id % 50 + per-doc noise channels), decoded
    // by the raster parser, centered pixels as the embedding column,
    // near-dup IMAGE pairs from the blocked threshold-cosine kernel —
    // the l03c discipline on image features. Hash-matched: the oracle
    // replays pixels → embedding → cosine from the md5 grid, so the
    // match certifies codec + embedding + pair kernel end to end.
    "l53b_image_neardup" -> ((s, dir) => {
      Similarity.thresholdCosinePairs(imageEmbeddings(s, dir),
          threshold = 0.8)
        .select(col("a_id"), col("b_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // L53c — the IVF-bucketed scale path for l53b (bucket-local equi
    // join + exact cosine filter — the l03d discipline): image
    // embeddings feed the SAME ANN machinery as text embeddings.
    // Engine-only (seeded kmeans); ToleranceSpec gates precision == 1.0
    // and recall vs the exact l53b pairs, plus the keyed ground truth.
    "l53c_image_neardup_ivf" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      Similarity.ivfThresholdPairs(imageEmbeddings(s, dir),
          threshold = 0.8, nCentroids = 8, nprobe = 2)
        .select(col("a_id"), col("b_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // L02d/L03e/L10c (r16) — the LLM-pipeline SQL door: dedup,
    // similarity search, and decontamination from pure SQL via the
    // near_dup_pairs / cosine_topk / decontaminate TVFs (before these
    // the whole domain was Scala-API-only). Each twin splices the same
    // kernel as its Scala sibling and is held to the sibling's oracle
    // verbatim.
    "l02d_near_dedup_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      docs(s, dir).createOrReplaceTempView("graft_l02d_docs")
      s.sql("""SELECT a_id, b_id, round(jaccard, 4) AS jaccard
        |FROM near_dup_pairs('graft_l02d_docs', 'doc_id', 'text', 3, 60)
        |ORDER BY a_id, b_id""".stripMargin)
    }),

    // L02f (r17) — the SCALE near-dup path behind the SQL door: the
    // l02b banded-LSH + estimate-prune + exact-re-check pipeline as the
    // near_dup_pairs_lsh TVF, so the SQL door's near-dup entry is no
    // longer only the exact quadratic kernel (l02d — correct but
    // output-sensitive; ~minutes at sf0.1 where this path is seconds).
    // Same parameters as l02b, so row-for-row IDENTICAL (TextOpsSpec
    // gates it); engine-only for the driver (seeded MinHash),
    // rows-checked like l02b/l02c.
    "l02f_lsh_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      docs(s, dir).createOrReplaceTempView("graft_l02f_docs")
      s.sql("""SELECT a_id, b_id, round(jaccard, 4) AS jaccard
        |FROM near_dup_pairs_lsh('graft_l02f_docs', 'doc_id', 'text',
        |                        3, 60, 32, 16, 42)
        |ORDER BY a_id, b_id""".stripMargin)
    }),

    // L02g (r18) — the BOUNDED-BUCKET dedup-cluster path: the l02b
    // pipeline with hot (band, band_sig) buckets capped at 64 docs —
    // buckets over the cap emit a hub STAR (each member paired with the
    // bucket's min doc_id, O(d) rows) instead of all d²/2 pairs
    // (Similarity.bandedCandidates). This is the CONNECTIVITY-consumer
    // operating mode: at 100 TB a boilerplate family (identical license
    // headers, templated pages) lands thousands of docs in ONE
    // (band, band_sig) join partition, and the uncapped expansion is
    // quadratic inside a single key no executor count can split (the
    // r17 ×10 stress OOM'd exactly there); the cluster consumers
    // (l15/l33/l52) only need CONNECTIVITY, which the star preserves
    // within every bucket. Output = cluster labels (CC over the
    // exactly-verified capped pairs). The honest contract (measured,
    // spec-pinned in TextOpsSpec): a REFINEMENT of the uncapped
    // pipeline's labels — never a false merge; chained (non-clique)
    // components may split, genuine boilerplate cliques label exactly
    // equal. Engine-only for the driver (seeded MinHash), rows-checked
    // like l02b.
    "l02g_lsh_capped_clusters" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      val sh = Text.shingles(docs(s, dir), 3).cache()
      val sigs = Similarity.minHashSignatures(sh, numHashes = 32).cache()
      val cands = Similarity.lshCandidates(sigs, numHashes = 32,
        bands = 16, maxBucket = 64)
      val likely = Similarity.estimateJaccard(cands, sigs)
        .filter(col("est_jaccard") >= 0.42)
        .select("a_id", "b_id")
      val pairs = Similarity.exactJaccardCompact(sh, likely)
        .filter(col("jaccard") > 0.6)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      Graphs.connectedComponentsDF(s, pairs)
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
        .orderBy("doc_id")
    }),

    // L02i (r18, third wave) — the BOUNDED dedup-cluster pipeline from
    // PURE SQL: near_dup_pairs_lsh with max_bucket=64 (the capped
    // candidate mode) composed into connected_components through a
    // TABLE() argument — the l02g read a SQL-only session writes for
    // 100 TB dedup clustering. Pinned row-for-row == l02g in
    // TextOpsSpec; engine-only (seeded MinHash), rows-checked.
    "l02i_lsh_clusters_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      docs(s, dir).createOrReplaceTempView("graft_l02i_docs")
      s.sql("""SELECT id AS doc_id, component AS cluster_id
        |FROM connected_components(
        |  TABLE(SELECT a_id AS src, b_id AS dst
        |        FROM near_dup_pairs_lsh('graft_l02i_docs', 'doc_id',
        |                                'text', 3, 60, 32, 16, 42, 64)),
        |  'src', 'dst')
        |ORDER BY doc_id""".stripMargin)
    }),

    "l03e_cosine_topk_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      vecs(s, dir).createOrReplaceTempView("graft_l03e_vecs")
      s.sql("""SELECT a_id, b_id, cos_sim
        |FROM cosine_topk('graft_l03e_vecs', 'vec_id', 'embedding', 20)
        |ORDER BY cos_sim DESC, a_id, b_id""".stripMargin)
    }),

    // L03f (r17) — the IVF-bucketed SCALE path for embedding near-dup
    // behind the SQL door (the l02f theme on the vector side): the l03d
    // kernel through the cosine_pairs_ivf TVF, same parameters, so the
    // output is row-for-row IDENTICAL (TextOpsSpec gates it).
    // Engine-only (seeded kmeans), rows-checked like l03b/l03d.
    "l03f_ivf_neardup_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      vecs(s, dir).createOrReplaceTempView("graft_l03f_vecs")
      s.sql("""SELECT a_id, b_id, round(cos_sim, 4) AS cos_sim
        |FROM cosine_pairs_ivf('graft_l03f_vecs', 'vec_id', 'embedding',
        |                      40, 8, 2)
        |ORDER BY a_id, b_id""".stripMargin)
    }),

    "l10c_decontaminate_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      val d = docs(s, dir)
      d.filter(col("doc_id") % 20 =!= 0)
        .createOrReplaceTempView("graft_l10c_train")
      d.filter(col("doc_id") % 20 === 0)
        .createOrReplaceTempView("graft_l10c_bench")
      s.sql("""SELECT source, count(*) AS n_clean,
        |  sum(n_chars) AS clean_chars
        |FROM decontaminate('graft_l10c_train', 'graft_l10c_bench',
        |                   'doc_id', 'text', 20)
        |GROUP BY source ORDER BY source""".stripMargin)
    }),

    // L10e (r18) — the BLOOM-prefilter decontamination SCALE path
    // behind the SQL door (closing the r17 verdict's missing #4: l10b's
    // 100 TB shape — bloom over the bench shingle hashes prunes the
    // train stream before any join — was Scala-only). The exact
    // semi-join re-check makes the output IDENTICAL to the exact TVF,
    // so the same DuckDB replay (l10's) is the oracle; TextOpsSpec
    // additionally pins it row-for-row == l10b.
    "l10e_decontaminate_bloom_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      graft.functions.VecFunctions.ensureRegistered(s)
      val d = docs(s, dir)
      d.filter(col("doc_id") % 20 =!= 0)
        .createOrReplaceTempView("graft_l10e_train")
      d.filter(col("doc_id") % 20 === 0)
        .createOrReplaceTempView("graft_l10e_bench")
      s.sql("""SELECT source, count(*) AS n_clean,
        |  sum(n_chars) AS clean_chars
        |FROM decontaminate_bloom('graft_l10e_train', 'graft_l10e_bench',
        |                         'doc_id', 'text', 20)
        |GROUP BY source ORDER BY source""".stripMargin)
    }),

    // L58 — VIDEO frame demux + sampling (r16 — the frame-sample member
    // of the multimodal set done with a REAL demuxer): each doc's
    // "video" is four concatenated P6 frames of DIFFERENT sizes, so the
    // demux must walk the byte stream parsing each frame's own header
    // to find the next offset (Media.splitPpmFrames — equal-byte-range
    // slicing cannot demux this stream); every 2nd frame is SAMPLED
    // (the keyframe-stride read a video curation pass runs), each
    // sampled frame decoded by the raster parser and reduced to
    // exact-integer moments. The oracle replays the md5 grid for the
    // sampled frames directly, so the hash match certifies
    // concat → demux → decode → sample end to end.
    "l58_video_frames" -> ((s, dir) => {
      val frames = graft.ops.Media.demuxPpmFrames(videoSrc(s, dir),
        "payload")
      val sampled = frames.filter(col("frame_idx") % 2 === 0)
      graft.ops.Media.decodeImagePixels(sampled, "frame_payload")
        .select(col("doc_id"), col("frame_idx"),
          posexplode(col("pixels")).as(Seq("p", "v")))
        .groupBy("doc_id", "frame_idx")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("long")).as("sum_v"),
          sum(col("v").cast("long") * col("v")).as("sum_sq"))
        .orderBy("doc_id", "frame_idx")
    }),

    // L59 — VIDEO near-dup, exact pooled form (r18 — the read an actual
    // video-corpus dedup needs, closing the "l58 demuxes and l53b
    // dedups images but nothing answers which VIDEOS are near-dups"
    // gap): the l58 demux composed with the l53 embedding + ANN
    // kernels. Payload → frame demux → raster decode → per-position
    // SUM-POOL across frames → pooled embedding → blocked
    // threshold-cosine pairs. HASH-MATCHED: the oracle replays
    // md5 grid → pooled integers → cosine, so the match certifies
    // concat → demux → decode → pool → pair kernel end to end.
    "l59_video_neardup" -> ((s, dir) => {
      Similarity.thresholdCosinePairs(videoEmbeddings(s, dir),
          threshold = 0.8)
        .select(col("a_id"), col("b_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // L59b — the IVF-bucketed scale path for l59 (the l53c discipline
    // on pooled video embeddings): bucket-local equi join + exact
    // cosine filter, never all-pairs. Engine-only (seeded kmeans);
    // ToleranceSpec gates precision 1.0, recall vs l59, and the keyed
    // ground truth (videos sharing doc_id % 50 are the true clusters).
    "l59b_video_neardup_ivf" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      Similarity.ivfThresholdPairs(videoEmbeddings(s, dir),
          threshold = 0.8, nCentroids = 8, nprobe = 2)
        .select(col("a_id"), col("b_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // L59c (r18, second wave) — VIDEO near-dup from PURE SQL: the
    // multimodal door. Two TVFs composed in one statement —
    // pooled_frame_embeddings (demux → decode → sum-pool, the l59
    // kernel verbatim) feeding cosine_pairs (the exact blocked
    // threshold kernel) through a TABLE(SELECT ...) argument. Before
    // this the multimodal pipeline was Scala-API-only; now a SQL
    // session runs video dedup end to end. Held to l59's oracle
    // verbatim (hash).
    "l59c_video_neardup_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      videoPayloads(s, dir).createOrReplaceTempView("graft_l59c_videos")
      s.sql("""SELECT a_id, b_id, round(cos_sim, 4) AS cos_sim
        |FROM cosine_pairs(
        |  TABLE(SELECT vec_id, embedding
        |        FROM pooled_frame_embeddings('graft_l59c_videos',
        |                                     'doc_id', 'payload')),
        |  'vec_id', 'embedding', 80)
        |ORDER BY a_id, b_id""".stripMargin)
    }),

    // L60 — AUDIO near-dup, exact pooled form (r19 — the l59 move on
    // l51's WAV feature kernel, completing the multimodal near-dup
    // matrix: text l02, image l53b, video l59, audio here): WAV encode
    // → codec parse-back → per-window exact integer (crossings, sum)
    // features → per-clip feature vector → blocked threshold-cosine
    // pairs. HASH-MATCHED: the oracle replays md5 stream → windowed
    // features → double cosine, so the match certifies encode → decode
    // → window fold → pair kernel end to end.
    "l60_audio_neardup" -> ((s, dir) => {
      Similarity.thresholdCosinePairs(audioFeatureVecs(s, dir),
          threshold = 0.8)
        .select(col("a_id"), col("b_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // L60b — the IVF-bucketed scale path for l60 (the l59b discipline
    // on audio feature vectors): bucket-local equi join + exact cosine
    // filter, never all-pairs. Engine-only (seeded kmeans);
    // ToleranceSpec gates precision 1.0, recall vs l60, and the keyed
    // ground truth (clips sharing doc_id % 50 are the true clusters).
    "l60b_audio_neardup_ivf" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      Similarity.ivfThresholdPairs(audioFeatureVecs(s, dir),
          threshold = 0.8, nCentroids = 8, nprobe = 2)
        .select(col("a_id"), col("b_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // L60c — AUDIO near-dup from PURE SQL (the l59c discipline): two
    // TVFs composed in one statement — pooled_audio_features (codec
    // parse-back → windowed features, the l60 kernel verbatim) feeding
    // cosine_pairs through a TABLE(SELECT ...) argument. Held to l60's
    // oracle verbatim (hash).
    "l60c_audio_neardup_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      audioClipPayloads(s, dir).createOrReplaceTempView("graft_l60c_clips")
      s.sql("""SELECT a_id, b_id, round(cos_sim, 4) AS cos_sim
        |FROM cosine_pairs(
        |  TABLE(SELECT vec_id, embedding
        |        FROM pooled_audio_features('graft_l60c_clips',
        |                                   'doc_id', 'payload', 16)),
        |  'vec_id', 'embedding', 80)
        |ORDER BY a_id, b_id""".stripMargin)
    }),

    // L61 — ENSEMBLE (multi-signal) dedup clusters (r19): the fusion a
    // production pipeline actually ships — LEXICAL near-dup pairs
    // (>0.6 n-gram Jaccard, the l02/l15 signal) unioned with SEMANTIC
    // near-dup pairs (>0.4 embedding cosine, the l03c signal) before
    // clustering, so a paraphrase the shingle signal misses still
    // merges via its embedding and a verbatim copy with a degenerate
    // embedding still merges via its text. One CC over the union edge
    // set; HASH-MATCHED — both pair kernels already hash individually
    // (l02/l03c) and the cluster replay is the l15 walk over the
    // unioned edge list.
    "l61_ensemble_dedup" -> ((s, dir) => {
      val textPairs = Similarity.exactJaccard(Text.shingles(docs(s, dir), 3))
        .filter(col("jaccard") > 0.6)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val vecPairs = Similarity.thresholdCosinePairs(vecs(s, dir),
          threshold = 0.4)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      Graphs.connectedComponentsDF(s,
          textPairs.unionByName(vecPairs).distinct())
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
        .orderBy("doc_id")
    }),

    // L61b — the SCALE path for the ensemble: capped banded-LSH pairs
    // (the l02g bounded pipeline) unioned with IVF-bucketed cosine
    // pairs (the l03d kernel) — both sides sub-quadratic, both sides
    // exact-RE-CHECKED, so every emitted edge is a true l61 edge and
    // the ensemble clusters are a REFINEMENT of l61's (gated in
    // ToleranceSpec with measured recall). Engine-only (seeded MinHash
    // + seeded kmeans), rows-checked.
    "l61b_ensemble_scale" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      val sh = Text.shingles(docs(s, dir), 3).cache()
      val sigs = Similarity.minHashSignatures(sh, numHashes = 32).cache()
      val cands = Similarity.lshCandidates(sigs, numHashes = 32,
        bands = 16, maxBucket = 64)
      val likely = Similarity.estimateJaccard(cands, sigs)
        .filter(col("est_jaccard") >= 0.42)
        .select("a_id", "b_id")
      val textPairs = Similarity.exactJaccardCompact(sh, likely)
        .filter(col("jaccard") > 0.6)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val vecPairs = Similarity.ivfThresholdPairs(vecs(s, dir),
          threshold = 0.4, nCentroids = 8, nprobe = 2)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      Graphs.connectedComponentsDF(s,
          textPairs.unionByName(vecPairs).distinct())
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
        .orderBy("doc_id")
    }),

    // L61c — the ensemble from PURE SQL: the bounded lexical TVF and
    // the IVF semantic TVF unioned inside ONE TABLE() argument feeding
    // connected_components — three operators, one statement, the
    // multi-signal sibling of l02i. Pinned row-for-row == l61b in
    // TextOpsSpec (same kernels, same parameters); engine-only,
    // rows-checked.
    "l61c_ensemble_sql" -> ((s, dir) => {
      graft.functions.TableFunctions.ensureRegistered(s)
      docs(s, dir).createOrReplaceTempView("graft_l61c_docs")
      vecs(s, dir).createOrReplaceTempView("graft_l61c_vecs")
      s.sql("""SELECT id AS doc_id, component AS cluster_id
        |FROM connected_components(
        |  TABLE(SELECT a_id AS src, b_id AS dst
        |        FROM near_dup_pairs_lsh('graft_l61c_docs', 'doc_id',
        |                                'text', 3, 60, 32, 16, 42, 64)
        |        UNION
        |        SELECT a_id, b_id
        |        FROM cosine_pairs_ivf('graft_l61c_vecs', 'vec_id',
        |                              'embedding', 40, 8, 2)),
        |  'src', 'dst')
        |ORDER BY doc_id""".stripMargin)
    }),

    // L06 — top-k similarity search: 10-NN of vec_id 0's embedding.
    "l06_knn" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      val v = vecs(s, dir)
      val query = v.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      Similarity.knn(v.filter(col("vec_id") =!= 0), query, 10)
    }),

    // L07 — SimHash signatures (engine-only; ScalaTest asserts near-dup
    // pairs from L02 have small Hamming distance).
    "l07_simhash" -> ((s, dir) => {
      graft.functions.VecFunctions.ensureRegistered(s)
      docs(s, dir)
        .select(col("doc_id"), Similarity.simHash(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),

    // L10 — benchmark decontamination: drop training docs sharing any
    // 20-char shingle with the held-out slice (doc_id % 20 == 0), report
    // the surviving corpus per source. Candidate generation is a
    // shingle-keyed semi join — the standard n-gram-overlap decontam
    // pass, linear in shingle volume (at 100 TB the join key would be
    // xxhash64(shingle), shrinking shuffle width to 8 bytes; the string
    // key here keeps the DuckDB oracle exact).
    "l10_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 20 === 0)
      val train = d.filter(col("doc_id") % 20 =!= 0)
      // probe side uses the non-distinct shingle stream: the explode stays
      // narrow and pipelines straight into the broadcast join — the only
      // shuffles are the tiny contaminated-id distinct and the final agg
      val benchSh = Text.shingles(bench, 20).select("shingle").distinct()
      val contaminated = Text.shingleStream(train, 20)
        .join(benchSh, "shingle")
        .select("doc_id").distinct()
      train.join(contaminated, Seq("doc_id"), "left_anti")
        .groupBy("source")
        .agg(count(lit(1)).as("n_clean"),
          sum(col("n_chars")).as("clean_chars"))
        .orderBy("source")
    }),

    // L10d — decontamination through the POST-DELETE shingle index (r17
    // retraction): half the benchmark (doc_id % 40 == 0) is erased from
    // the persisted index by appending NEGATED contribution counts
    // (deleteFromShingleIndex — the log-structured retraction); the
    // reader's bucket-local net-sum then drops shingles only the erased
    // docs carried while shingles shared with the surviving half keep
    // contaminating. HASH-MATCHED: the DuckDB oracle recomputes the
    // whole pass from scratch against the surviving benchmark slice, so
    // the match certifies the negative deltas cancel EXACTLY.
    "l10d_decontaminate_deleted" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 20 === 0)
      val erased = bench.filter(col("doc_id") % 40 === 0)
      val survB = bench.filter(col("doc_id") % 40 =!= 0)
      val train = d.filter(col("doc_id") % 20 =!= 0)
      val prefix = "graft_shdel_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      if (!SimIndex.isUsable(s, prefix, survB, Seq("_shingles"))) {
        Seq("_shingles", "_docs", "_meta", "_tombstones").foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $prefix$t")
          Bucketing.dropStaleLocation(s, prefix + t)
        }
        SimIndex.writeShingleIndex(bench, prefix, n = 20, buckets = 8)
        SimIndex.deleteFromShingleIndex(erased, prefix)
      }
      SimIndex.decontaminateFromIndex(s, train, prefix, 20,
          verifyAgainst = Some(survB))
        .groupBy("source")
        .agg(count(lit(1)).as("n_clean"),
          sum(col("n_chars")).as("clean_chars"))
        .orderBy("source")
    }),

    // L16 — span-level decontamination: the exact (doc, position) spans
    // of train docs whose 20-char shingle appears in the held-out slice —
    // the redaction map a pipeline applies when it wants to CLEAN
    // contaminated docs instead of dropping them (L10's doc-level form).
    "l16_contaminated_spans" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 20 === 0)
      val train = d.filter(col("doc_id") % 20 =!= 0)
      val benchSh = Text.shingles(bench, 20).select("shingle").distinct()
      Text.shingleStreamPos(train, 20)
        .join(benchSh, "shingle")
        .select("doc_id", "pos")
        .orderBy("doc_id", "pos")
    }),

    // L30 — cross-document duplicated-span mining (the exact-substring
    // dedup read, Lee et al. 2022): 20-char shingles occurring in >= 2
    // distinct docs mark duplicated text; each doc's hit positions
    // merge into maximal spans [pos, pos+20) via the T19
    // interval-coalescing operator — the temporal-algebra op reused on
    // character offsets (the generic-column payoff of keeping it
    // type-agnostic). Unlike l16 (decontamination vs an external
    // benchmark), this is intra-corpus: the spans a training pipeline
    // cuts before packing. Plan: shingle explode, one shingle-keyed
    // distinct+count to find cross-doc shingles, a semi join back, and
    // the single-shuffle island merge per doc.
    "l30_dup_spans" -> ((s, dir) => {
      val sh = Text.shingleStreamPos(docs(s, dir), 20)
      val dup = sh.select("doc_id", "shingle").distinct()
        .groupBy("shingle").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select("shingle")
      val iv = sh.join(dup, Seq("shingle"), "left_semi")
        .select(col("doc_id"), col("pos").as("dup_s"),
          (col("pos") + 20).as("dup_e"))
      graft.ops.Temporal.coalesceIntervals(iv, Seq("doc_id"),
          "dup_s", "dup_e", "dup_s")
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("n_intervals").as("n_shingles"))
        .orderBy("doc_id", "span_start")
    }),

    // L52 — SPAN-CUT dedup stage (NEW r14, the substring-level ACTION
    // on l30's read): per document, the kept-text accounting after
    // cutting every cross-document duplicated span — (n_spans_cut,
    // chars_cut, kept_chars) — the Lee-et-al-style dedup a 100 TB
    // curation pass applies instead of dropping whole documents. Spans
    // are l30's maximal islands (20-char cross-doc shingles coalesced
    // on character offsets); every document appears (zero spans ->
    // kept_chars = n_chars), so the output IS the post-cut manifest.
    // Plan: l30's pipeline + one doc-keyed agg + a left join back to
    // the corpus — nothing beyond the l30 shuffles.
    "l52_span_cut" -> ((s, dir) => {
      val d = docs(s, dir)
      val dup = Text.shingleStreamPos(d, 20)
        .select("doc_id", "shingle").distinct()
        .groupBy("shingle").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select("shingle")
      Text.spanCutStats(d, dup).orderBy("doc_id")
    }),

    // L56 — CONTAMINATION-SAFE SPLIT (NEW r14): l18's leakage-safe
    // stable split with the l10 decontamination gate composed in —
    // training docs sharing any 20-char shingle with the held-out
    // slice land in a QUARANTINE split instead of train/val/test, so
    // no benchmark-overlapping text can reach any training-run split
    // by hash accident. Clean docs split by the same content-hash rule
    // as l18 (dup content still co-locates).
    "l56_contamination_safe_split" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 20 === 0)
      val train = d.filter(col("doc_id") % 20 =!= 0)
      val benchSh = Text.shingles(bench, 20).select("shingle").distinct()
      val contaminated = Text.shingleStream(train, 20)
        .join(benchSh, "shingle")
        .select("doc_id").distinct()
        .withColumn("q", lit(1))
      train.join(contaminated, Seq("doc_id"), "left_outer")
        .withColumn("split", when(col("q").isNotNull, lit("quarantine"))
          .otherwise(Text.stableSplit(col("text"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars_total"))
        .orderBy("split")
    }),

    // L10b — same decontamination result through the bloom-filter
    // runtime prefilter (Text.bloomContaminated): the compact filter
    // prunes the shingle stream before the exact semi join, so the
    // join's shuffle is the contaminated sliver, not the corpus. The
    // result is identical to L10 by construction — same hash oracle.
    "l10b_decontaminate_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 20 === 0)
      val train = d.filter(col("doc_id") % 20 =!= 0)
      val contaminated = Text.bloomContaminated(train, bench, 20)
      train.join(contaminated, Seq("doc_id"), "left_anti")
        .groupBy("source")
        .agg(count(lit(1)).as("n_clean"),
          sum(col("n_chars")).as("clean_chars"))
        .orderBy("source")
    }),

    // L12 — salient-term extraction: top-3 tokens per document by
    // TF-IDF-style weight. The idf is RATIONAL, not logarithmic —
    // score = tf * N * 10000 div df, all integer — because log() is the
    // one function whose last-ulp behavior differs across engines (the
    // t03 lesson); the rational form preserves the tf/df ranking within
    // a document exactly and hash-matches DuckDB. Plan: tf agg + df agg
    // + one join on the (small) token dimension + per-doc window top-3.
    "l12_salient_terms" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val n = d.count()
      val tok = d.select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+"), lit(0))).as("token"))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfc = tok.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("token").asc)
      tf.join(dfc, "token")
        .withColumn("score", expr(s"tf * ${n}L * 10000 div df"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("doc_id", "rn", "token", "score")
        .orderBy("doc_id", "rn")
    }),

    // L35 — bigram familiarity: a corpus-level language-model quality
    // signal without a trained LM — each document scored by how common
    // its word bigrams are in the WHOLE corpus (boilerplate and fluent
    // text score high, gibberish and OCR noise score low; the cheap
    // stand-in for LM perplexity filtering). Counts stay integer and the
    // mean is ONE integer division (fam_e4 = 10^4·Σcnt div n) — log-prob
    // would be the t03 float trap. Plan: doc-partitioned lead() builds
    // the bigram stream, one bigram-keyed count agg, one bigram-keyed
    // join back, one doc agg — every shuffle keys on doc or bigram, the
    // two natural partitions; docs with <2 tokens have no bigrams and
    // yield no row.
    "l35_bigram_familiarity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tok = docs(s, dir).select(col("doc_id"),
        posexplode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+"), lit(0))).as(Seq("pos", "token")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val big = tok.withColumn("nxt", lead("token", 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", col("token"), col("nxt")).as("bigram"))
      val cnt = big.groupBy("bigram").agg(count(lit(1)).as("cnt"))
      big.join(cnt, "bigram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("cnt").as("fam_sum"))
        .withColumn("fam_e4", expr("10000 * fam_sum div n_bigrams"))
        .orderBy("doc_id")
    }),

    // L36 — readability surface statistics: the Flesch-Kincaid family's
    // inputs (words, sentence runs, vowel-group "syllables") as exact
    // counts + the two ratios that drive every readability formula —
    // words-per-sentence and syllables-per-word — each ONE integer
    // division ×10^4. The formula's float constants stay with the
    // caller: the per-doc ratios are the engine-portable part, the
    // affine map isn't worth a hash mismatch. Sentence count is a
    // terminator-run count ([.!?]+), floored at 1 so a fragment doc
    // divides cleanly on both engines. Pure codegen regex counts, one
    // scan, no shuffle at all until the output sort.
    "l36_readability" -> ((s, dir) => {
      val txt = col("text")
      val nWords = size(regexp_extract_all(txt, lit("[A-Za-z]+"), lit(0)))
        .cast("long")
      val nSent = greatest(lit(1L),
        size(regexp_extract_all(txt, lit("[.!?]+"), lit(0))).cast("long"))
      val nSyl = size(regexp_extract_all(lower(txt), lit("[aeiouy]+"),
        lit(0))).cast("long")
      docs(s, dir)
        .select(col("doc_id"), nWords.as("n_words"), nSent.as("n_sents"),
          nSyl.as("n_syls"))
        .filter(col("n_words") > 0)
        .withColumn("wps_e4", expr("10000 * n_words div n_sents"))
        .withColumn("spw_e4", expr("10000 * n_syls div n_words"))
        .orderBy("doc_id")
    }),

    // L37 — collocation mining: the top-50 adjacent word pairs by PMI
    // (pointwise mutual information) with support ≥ 5 — the
    // association-strength read behind multiword-expression detection
    // and tokenizer-merge seeding, sharing l35's bigram stream. PMI's
    // log is monotone, so ranking by the RATIONAL inside it is the same
    // ranking without the float: score_e6 = 10^6·c_xy·N div (c_x·c_y),
    // with c_x/c_y the left/right marginals. One bigram-keyed count,
    // two broadcast-size marginal joins, a top-k sort.
    "l37_collocations" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tok = docs(s, dir).select(col("doc_id"),
        posexplode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+"), lit(0))).as(Seq("pos", "token")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val big = tok.withColumn("nxt", lead("token", 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("token").as("w1"), col("nxt").as("w2"))
      val cxy = big.groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
      val cx = big.groupBy("w1").agg(count(lit(1)).as("cx"))
      val cy = big.groupBy("w2").agg(count(lit(1)).as("cy"))
      val n = big.agg(count(lit(1)).as("n"))
      cxy.filter(col("cxy") >= 5)
        .join(cx, "w1").join(cy, "w2")
        .crossJoin(broadcast(n))
        .withColumn("score_e6",
          expr("1000000 * cxy * n div (cx * cy)"))
        .select("w1", "w2", "cxy", "score_e6")
        .orderBy(col("score_e6").desc, col("w1").asc, col("w2").asc)
        .limit(50)
    }),

    // L38 — vocabulary growth curve (Heaps' law empirics): cumulative
    // (tokens seen, distinct tokens seen) in doc_id order — the curve
    // that predicts vocab size at corpus scale and flags drift when a
    // new ingest bends it. Scale shape: a token's first occurrence is
    // simply its MIN doc_id (token-keyed agg — the heavy lifting), so
    // per-doc new-token counts come from one groupBy and the running
    // sums run over the |docs|-row table, never the token stream; the
    // global-order window is over that small side only.
    "l38_vocab_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir).select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))
          .as("toks"))
      val perDoc = d.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"))
      val firsts = d.select(col("doc_id"), explode(col("toks")).as("token"))
        .groupBy("token").agg(min("doc_id").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDoc.join(firsts, Seq("doc_id"), "left")
        .withColumn("cum_tokens", sum("n_toks").over(w))
        .withColumn("cum_vocab",
          sum(coalesce(col("n_new"), lit(0L))).over(w))
        .select("doc_id", "cum_tokens", "cum_vocab")
        .orderBy("doc_id")
    }),

    // L39 — per-document n-gram NOVELTY: the fraction of a doc's
    // distinct word bigrams whose corpus-wide FIRST occurrence (min
    // doc_id) is this doc — the marginal-diversity signal dedup-aware
    // data curation ranks by ("does this doc add anything the corpus
    // hasn't seen"), the per-doc dual of l38's corpus growth curve.
    // Exact scaled integers (novelty_e6 = 1e6·n_new div n_distinct).
    // Scale shape: first-occurrence is a bigram-keyed min — one agg
    // over the bigram stream, joined back bigram-keyed; nothing is
    // ever quadratic in docs and no per-doc state exceeds its own
    // bigram set. Zero-bigram docs (≤ 1 token) drop: novelty of an
    // empty set is undefined, not zero.
    "l39_ngram_novelty" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tok = docs(s, dir).select(col("doc_id"),
        posexplode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+"), lit(0))).as(Seq("pos", "token")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val big = tok.withColumn("nxt", lead("token", 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", col("token"), col("nxt")).as("bg"))
        .distinct()
      val firsts = big.groupBy("bg").agg(min("doc_id").as("first_doc"))
      big.join(firsts, "bg")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_distinct"),
          sum(when(col("first_doc") === col("doc_id"), 1L)
            .otherwise(0L)).as("n_new"))
        .withColumn("novelty_e6",
          expr("1000000 * n_new div n_distinct"))
        .select("doc_id", "n_distinct", "n_new", "novelty_e6")
        .orderBy("doc_id")
    }),

    // L44 — the winnowed fingerprint set itself (see [[winnowed]]):
    // per document, which (position, 40-bit fingerprint) survived the
    // rightmost-min-per-window selection. Hash-matched against a full
    // DuckDB replay of the hash/encode/window-min pipeline.
    "l44_winnow" -> ((s, dir) =>
      winnowed(s, dir).orderBy("doc_id", "pos")),

    // L45 — MOSS-style overlap report on the winnowed fingerprints:
    // document pairs ranked by how many fingerprints they share. The
    // two standard scale guards are part of the operator, not tuning:
    // fingerprints present in > 50 documents are dropped (boilerplate
    // — shared-by-everyone n-grams carry no pair signal but drive the
    // join fan-out quadratic), and pairs need ≥ 3 shared prints (one
    // window-sized accident is noise). What remains is a fingerprint-
    // keyed self-join over rare keys — bounded fan-out per key by the
    // df cap, exactly the l02/LSH candidate-join shape.
    "l45_winnow_overlap" -> ((s, dir) => {
      val fps = winnowed(s, dir).select("doc_id", "fp").distinct()
      val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50)
      val f = fps.join(rare.select("fp"), "fp")
      f.as("a").join(f.as("b"), "fp")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3)
        .orderBy(col("shared").desc, col("d1").asc, col("d2").asc)
        .limit(50)
    }),

    // L46 — asymmetric CONTAINMENT on the winnow candidates: for every
    // pair with ≥ 3 shared fingerprints, the exact 3-gram containment
    // in BOTH directions (cont12 = |A∩B|/|A|, cont21 = |A∩B|/|B|, as
    // exact e6 integers). Jaccard misses subset duplication — a doc
    // quoted whole inside a longer one scores low symmetric similarity
    // but containment ≈ 1 on the short side; this is the dedup read
    // that catches it. Scale shape: the sketch (winnowing) proposes,
    // the exact measure disposes, and the exact gram joins run ONLY
    // over the candidate pair set — never all-pairs; the l02/LSH
    // verify-stage discipline with containment instead of Jaccard.
    "l46_containment" -> ((s, dir) => {
      val fps = winnowed(s, dir).select("doc_id", "fp").distinct()
      val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50)
      val f = fps.join(rare.select("fp"), "fp")
      val cand = f.as("a").join(f.as("b"), "fp")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3)
        .select("d1", "d2")
      val sh = grams3(s, dir).select("doc_id", "gram").distinct()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      cand
        .join(sh.select(col("doc_id").as("d1"), col("gram")), "d1")
        .join(sh.select(col("doc_id").as("d2"), col("gram")),
          Seq("d2", "gram"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
        .select(col("d1"), col("d2"), col("inter"),
          expr("1000000 * inter div sz1").as("cont12_e6"),
          expr("1000000 * inter div sz2").as("cont21_e6"))
        .orderBy("d1", "d2")
    }),

    // L47 — per-source REDUNDANCY: 1 − distinct/total over each
    // source's word 3-grams, as an exact e6 integer — the
    // compression-ratio proxy behind source capping (a boilerplate-
    // heavy source repeats its n-grams; a diverse one doesn't), read
    // per source so l23's caps can be set from evidence rather than
    // folklore. Two gram-keyed aggregates (total + distinct), nothing
    // leaves the (source, gram) key space until the ≤|sources|-row
    // result.
    "l47_redundancy" -> ((s, dir) => {
      val gr = grams3(s, dir)
        .join(docs(s, dir).select("doc_id", "source"), "doc_id")
      val tot = gr.groupBy("source").agg(count(lit(1)).as("n_grams"))
      val dist = gr.select("source", "gram").distinct()
        .groupBy("source").agg(count(lit(1)).as("n_distinct"))
      tot.join(dist, "source")
        .withColumn("redundancy_e6",
          expr("1000000 * (n_grams - n_distinct) div n_grams"))
        .select("source", "n_grams", "n_distinct", "redundancy_e6")
        .orderBy("source")
    }),

    // L40 — per-source term LIFT: each source's top-10 over-represented
    // words vs the whole corpus (lift_e6 = 10^6·tf_s·N_c div
    // (tf_c·N_s), support ≥ 20) — the domain-mix audit behind mixture
    // weighting: what vocabulary a source actually contributes, read
    // as an exact integer ratio (the log in PMI/KL is monotone — same
    // ranking, no float; the l37 move applied to source mix). Token-
    // keyed aggs + two broadcast-size marginal joins; the rank window
    // runs on the filtered (source, token) aggregate, never the token
    // stream.
    "l40_source_lift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tok = docs(s, dir).select(col("source"),
        explode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+"), lit(0))).as("token"))
      val tfs = tok.groupBy("source", "token").agg(count(lit(1)).as("tf_s"))
      val tfc = tok.groupBy("token").agg(count(lit(1)).as("tf_c"))
      val ns = tok.groupBy("source").agg(count(lit(1)).as("n_s"))
      val nc = tok.agg(count(lit(1)).as("n_c"))
      val w = Window.partitionBy("source")
        .orderBy(col("lift_e6").desc, col("token").asc)
      tfs.filter(col("tf_s") >= 20)
        .join(tfc, "token")
        .join(broadcast(ns), "source")
        .crossJoin(broadcast(nc))
        // e6·tf_s·N_c wraps past 2^63 at corpus scale — decimal(38,0)
        // like q51/q52 (ADVICE r10); div stays IntegralDivide → BIGINT.
        .withColumn("lift_e6", expr("CAST(1000000 AS DECIMAL(38,0)) *" +
          " tf_s * n_c div (CAST(tf_c AS DECIMAL(38,0)) * n_s)"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("source", "rn", "token", "tf_s", "lift_e6")
        .orderBy("source", "rn")
    }),

    // L41 — cluster COHESION audit: per label, how tightly the member
    // embeddings sit around their own centroid (count, mean and worst
    // cosine-to-centroid, rounded 4dp like every float in the suite) —
    // the embedding-space quality read before trusting labels for
    // semantic dedup or stratified sampling: a low min flags mislabeled
    // outliers, a low avg a label that isn't a cluster at all. Scale
    // shape: everything is keyed by (label, dim) or (vec_id) — the
    // centroid table is |labels|×|dims| (broadcast), the per-vector
    // sums one exploded groupBy; no pairwise anything.
    "l41_cluster_cohesion" -> ((s, dir) => {
      val v = vecs(s, dir).select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("d", "x")))
        .withColumn("x", col("x").cast("double"))
      val cent = v.groupBy("label", "d").agg(avg("x").as("c"))
      val cn = cent.groupBy("label").agg(sum(col("c") * col("c")).as("nc"))
      v.join(broadcast(cent), Seq("label", "d"))
        .groupBy("vec_id", "label")
        .agg(sum(col("x") * col("c")).as("dot"),
          sum(col("x") * col("x")).as("nx"))
        .join(broadcast(cn), "label")
        .withColumn("cos", col("dot") / (sqrt(col("nx")) * sqrt(col("nc"))))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("cos"), 4).as("avg_cos4"),
          round(min("cos"), 4).as("min_cos4"))
        .orderBy("label")
    }),

    // L11 — greedy sequence packing to a 256-token budget across 8
    // independent bucket streams (Text.packGreedy — the training-batch
    // assembly op); result is the per-pack occupancy, hash-checked
    // against a DuckDB recursive-CTE replay of the same greedy fold.
    "l11_pack_greedy" -> ((s, dir) => {
      Text.packGreedy(docs(s, dir), cap = 256L, buckets = 8)
        .groupBy("bucket", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("sum_tokens"))
        .orderBy("bucket", "pack_id")
    })
  )

  /** Shared DuckDB replay of [[Similarity.semanticDedupKeep]]'s integer
    * pipeline (l48 + l43 stage 4): quantize → centroid sums → squared-
    * cosine threshold in HUGEINT → min-id keep. generate_subscripts is
    * 1-based vs posexplode's 0-based `d` — both internal join keys only.
    */
  /** The l48 semantic-keep oracle chain over any labeled-embedding
    * source relation (must expose vec_id, label, embedding) — l48 reads
    * the fixture table directly, l48b feeds the k-means-derived labels.
    */
  private def semCteFrom(src: String): String =
    s"""semx AS (SELECT vec_id, label,
      |    CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT) AS xi, d
      |  FROM (SELECT vec_id, label, unnest(embedding) AS e,
      |          generate_subscripts(embedding, 1) AS d
      |        FROM $src)),
      |semc AS (SELECT label, d, sum(xi) AS cn FROM semx GROUP BY 1, 2),
      |semnc AS (SELECT label, sum(CAST(cn AS HUGEINT) * cn) AS nc
      |          FROM semc GROUP BY 1),
      |semm AS (SELECT x.vec_id, x.label,
      |      sum(CAST(x.xi AS HUGEINT) * c.cn) AS dot,
      |      sum(CAST(x.xi AS HUGEINT) * x.xi) AS nx
      |    FROM semx x JOIN semc c ON c.label = x.label AND c.d = x.d
      |    GROUP BY 1, 2),
      |semsc AS (SELECT m.vec_id, m.label,
      |    (m.dot > 0 AND 100 * CAST(m.dot AS HUGEINT) * m.dot >
      |     9 * CAST(m.nx AS HUGEINT) * nc.nc) AS close
      |  FROM semm m JOIN semnc nc ON nc.label = m.label),
      |semk AS (SELECT label, min(vec_id) AS keep_id FROM semsc
      |         WHERE close GROUP BY 1),
      |semkeep AS (SELECT s.vec_id, s.label, s.close,
      |    (NOT s.close OR s.vec_id = k.keep_id) AS keep
      |  FROM semsc s LEFT JOIN semk k ON k.label = s.label)""".stripMargin

  private val semCte: String = semCteFrom("embeddings")

  /** Unrolled exact-integer Lloyd replay (l48b's oracle, mirror of
    * [[graft.ops.Similarity.kmeansExactAssign]] with k=8, iters=2,
    * scale=1000): kx = quantized coords, ks/kc0 = min-id seed
    * centroids, then per iteration a distance agg + per-vector argmin
    * (kd/ka) and a floor-mean centroid rebuild (kc — DuckDB `//` and
    * Spark `div` both truncate toward zero). Only kx (5 references)
    * and the final ka3 (feeds the multiply-referenced semx) are
    * MATERIALIZED: the intermediate chain is linear single-reference,
    * so plain CTEs expand exactly once — and DuckDB 1.0 hits a
    * serialize-and-spill cliff at ~12+ materialized CTEs in one
    * statement (BASELINE.md r11 notes). This chain must also never
    * share a statement with dedupClusterCte's recursive replay — see
    * the l43b registry comment for the parallel-spill pathology. */
  private val kmeansCte: String = {
    def assign(i: Int, cPrev: String): String = {
      val mat = if (i == 3) " MATERIALIZED" else ""
      s"""kd$i AS (SELECT x.vec_id, c.cid,
         |    sum((x.xi - c.c) * (x.xi - c.c)) AS dist
         |  FROM kx x JOIN $cPrev c ON c.d = x.d GROUP BY 1, 2),
         |ka$i AS$mat (SELECT vec_id, cid FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, cid ASC) AS rn FROM kd$i) WHERE rn = 1)"""
        .stripMargin
    }
    def update(i: Int): String =
      s"""kc$i AS (SELECT a.cid, x.d,
         |    sum(x.xi) // count(*) AS c
         |  FROM ka$i a JOIN kx x USING (vec_id) GROUP BY 1, 2)"""
        .stripMargin
    s"""kx AS MATERIALIZED (SELECT vec_id, d,
       |    CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT) AS xi
       |  FROM (SELECT vec_id, unnest(embedding) AS e,
       |          generate_subscripts(embedding, 1) AS d
       |        FROM embeddings)),
       |ks AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1
       |    AS cid
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
       |kc0 AS (SELECT s.cid, x.d, x.xi AS c
       |  FROM ks s JOIN kx x USING (vec_id)),
       |${assign(1, "kc0")},
       |${update(1)},
       |${assign(2, "kc1")},
       |${update(2)},
       |${assign(3, "kc2")}""".stripMargin
  }

  // shared by l10 and l10b: the bloom pass returns the identical result
  // (the prefilter is conservative, the exact re-check removes its false
  // positives), so both hash-match the same exact-SQL oracle; l10d
  // swaps in the post-delete benchmark predicate (the oracle recomputes
  // from scratch what the index maintains by negative count deltas)
  private def decontamSqlFor(benchPred: String): String =
    s"""WITH bench AS (SELECT DISTINCT substr(text, CAST(gs AS INT), 20) AS sh
        |  FROM (SELECT text, unnest(generate_series(1, n_chars - 19)) AS gs
        |        FROM documents WHERE ($benchPred) AND n_chars >= 20)),
        |contaminated AS (SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, substr(text, CAST(gs AS INT), 20) AS sh
        |        FROM (SELECT doc_id, text,
        |                unnest(generate_series(1, n_chars - 19)) AS gs
        |              FROM documents WHERE doc_id % 20 != 0 AND n_chars >= 20))
        |  WHERE sh IN (SELECT sh FROM bench))
        |SELECT source, count(*) AS n_clean,
        |  CAST(sum(n_chars) AS BIGINT) AS clean_chars
        |FROM documents
        |WHERE doc_id % 20 != 0
        |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        |GROUP BY 1 ORDER BY 1""".stripMargin

  private val decontamSql: String = decontamSqlFor("doc_id % 20 = 0")

  /** Shared DuckDB replay of [[graft.ops.Text.bpeTrain]]'s
    * count→pick→merge cycle, unrolled: WITH-clause prefix `tok/wf/w0`
    * plus one `c$i/m$i/w$i` step per round (same vocab, same tie-break,
    * same greedy fold as list_reduce over single-element lists). l27
    * selects the m$i rows; l28 chains apply-folds on top.
    */
  private def bpeChainSql(rounds: Int): (String, Seq[String]) = {
    val ws = graft.ops.Text.GopherWhitespace
    val head =
      s"""WITH tok AS (SELECT unnest(regexp_extract_all(lower(text),
        |    '[^$ws]+')) AS w FROM documents),
        |wf AS (SELECT w, count(*) AS freq FROM tok
        |       WHERE regexp_full_match(w, '[a-z]+')
        |       GROUP BY w ORDER BY freq DESC, w LIMIT 500),
        |w0 AS (SELECT w, freq, regexp_extract_all(w, '.') AS l FROM wf)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""c$i AS (SELECT pr[1] AS p1, pr[2] AS p2,
        |    CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM (SELECT freq, unnest(list_transform(range(1, len(l)),
        |          j -> [l[j], l[j + 1]])) AS pr
        |        FROM w${i - 1})
        |  GROUP BY 1, 2),
        |m$i AS (SELECT p1, p2, cnt FROM c$i
        |        ORDER BY cnt DESC, p1, p2 LIMIT 1),
        |w$i AS (SELECT w.w, w.freq,
        |    list_reduce(list_transform(w.l, x -> [x]),
        |      (acc, x) -> CASE
        |        WHEN acc[-1] = m.p1 AND x[1] = m.p2
        |        THEN list_append(acc[1:len(acc)-1], m.p1 || m.p2)
        |        ELSE list_append(acc, x[1]) END) AS l
        |  FROM w${i - 1} w CROSS JOIN m$i m)""".stripMargin
    }
    (head, steps)
  }

  /** DuckDB replay of [[graft.ops.Text.unigramTrain]], rounds unrolled:
    * candidate substrings of the top-word vocabulary, then per round a
    * recursive MaxMatch segmentation (the longest-match pick is a
    * unique `max_by(p, strlen(p))` — equal-length matches at one
    * position are the same string), usage aggregation, and the
    * (usage asc, piece asc) prune of `prunePerRound` multi-char pieces.
    * One extra segmentation pass recomputes usage for the final set.
    */
  private def unigramChainSql(vocabWords: Int, maxPieceLen: Int,
      candidates: Int, rounds: Int, prunePerRound: Int): String = {
    val ws = graft.ops.Text.GopherWhitespace
    val head =
      s"""WITH RECURSIVE tok AS (SELECT unnest(regexp_extract_all(
        |    lower(text), '[^$ws]+')) AS w FROM documents),
        |wf AS (SELECT w, count(*) AS freq FROM tok
        |       WHERE regexp_full_match(w, '[a-z]+')
        |       GROUP BY w ORDER BY freq DESC, w LIMIT $vocabWords),
        |subs AS (SELECT substr(w, CAST(i AS INT), CAST(l AS INT)) AS p,
        |    sum(freq) AS cnt
        |  FROM (SELECT w, freq,
        |          unnest(generate_series(1, strlen(w))) AS i FROM wf)
        |  CROSS JOIN (SELECT unnest(generate_series(2,
        |          $maxPieceLen)) AS l)
        |  WHERE i + l - 1 <= strlen(w) GROUP BY 1),
        |m0 AS (SELECT p FROM subs ORDER BY cnt DESC, p
        |       LIMIT $candidates),
        |sing AS (SELECT DISTINCT unnest(regexp_extract_all(w, '.')) AS p
        |         FROM wf)""".stripMargin
    // round r segments with m{r-1} ∪ sing; r = rounds+1 is the final
    // usage pass (no prune)
    val steps = (1 to rounds + 1).map { r =>
      val prune =
        if (r <= rounds)
          s""",
             |m$r AS (SELECT p FROM (
             |  SELECT m.p, row_number() OVER (
             |      ORDER BY coalesce(u.usage, 0), m.p) AS rn
             |  FROM m${r - 1} m LEFT JOIN u$r u ON u.piece = m.p)
             |  WHERE rn > $prunePerRound)""".stripMargin
        else ""
      s"""vv$r AS (SELECT p FROM m${r - 1}
         |        UNION ALL SELECT p FROM sing),
         |seg$r(w, freq, pos, piece) AS (
         |  SELECT w, freq, CAST(1 AS BIGINT), CAST(NULL AS VARCHAR)
         |  FROM wf
         |  UNION ALL
         |  SELECT s.w, s.freq, s.pos + strlen(s.pc), s.pc FROM (
         |    SELECT w, freq, pos,
         |      (SELECT max_by(vv.p, strlen(vv.p)) FROM vv$r vv
         |       WHERE substr(seg$r.w, CAST(seg$r.pos AS INT),
         |               strlen(vv.p)) = vv.p) AS pc
         |    FROM seg$r WHERE pos <= strlen(w)) s),
         |u$r AS (SELECT piece, sum(freq) AS usage FROM seg$r
         |        WHERE piece IS NOT NULL GROUP BY 1)$prune""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT piece, is_single, CAST(usage AS BIGINT) AS usage FROM (
       |  SELECT m.p AS piece, false AS is_single,
       |    coalesce(u.usage, 0) AS usage
       |  FROM m$rounds m
       |  LEFT JOIN u${rounds + 1} u ON u.piece = m.p
       |  UNION ALL
       |  SELECT s.p, true, coalesce(u.usage, 0)
       |  FROM sing s LEFT JOIN u${rounds + 1} u ON u.piece = s.p)
       |ORDER BY piece""".stripMargin
  }

  /** Shared DuckDB replay of [[winnowed]]: positional 3-grams via
    * generate_series, the 10-hex md5 fold (the [[graft.Det.duckMd5Long]]
    * move at 40 bits), the same v-encoding, one window MIN, decode.
    */
  private val winnowCte: String =
    """d AS (SELECT doc_id,
      |    regexp_extract_all(lower(text), '[a-z]+') AS toks
      |  FROM documents),
      |g AS (SELECT doc_id, CAST(gs AS BIGINT) - 1 AS gpos,
      |    toks[CAST(gs AS INT)] || ' ' || toks[CAST(gs AS INT) + 1] ||
      |      ' ' || toks[CAST(gs AS INT) + 2] AS gram
      |  FROM (SELECT doc_id, toks,
      |          unnest(generate_series(1, len(toks) - 2)) AS gs
      |        FROM d)),
      |hv AS (SELECT doc_id, gpos,
      |    list_reduce(list_transform(
      |        regexp_extract_all(substr(md5(gram), 1, 10), '.'),
      |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (a, b) -> a * 16 + b) * 1048576 + (1048575 - gpos) AS v
      |  FROM g),
      |mw AS (SELECT doc_id, gpos,
      |    min(v) OVER (PARTITION BY doc_id ORDER BY gpos
      |                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mv
      |  FROM hv),
      |sel AS (SELECT DISTINCT doc_id,
      |    1048575 - (mv % 1048576) AS pos, mv // 1048576 AS fp
      |  FROM mw WHERE gpos >= 3)""".stripMargin

  private lazy val oraclesBase0: Map[String, String] = Map(
    "l44_winnow" ->
      s"""WITH $winnowCte
        |SELECT doc_id, pos, fp FROM sel
        |ORDER BY doc_id, pos""".stripMargin,

    "l45_winnow_overlap" ->
      s"""WITH $winnowCte,
        |fps AS (SELECT DISTINCT doc_id, fp FROM sel),
        |rare AS (SELECT fp FROM fps GROUP BY 1 HAVING count(*) <= 50),
        |f AS (SELECT fps.doc_id, fps.fp FROM fps JOIN rare USING (fp))
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(count(*) AS BIGINT) AS shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY shared DESC, d1, d2 LIMIT 50""".stripMargin,

    "l46_containment" ->
      s"""WITH $winnowCte,
        |fps AS (SELECT DISTINCT doc_id, fp FROM sel),
        |rare AS (SELECT fp FROM fps GROUP BY 1 HAVING count(*) <= 50),
        |f AS (SELECT fps.doc_id, fps.fp FROM fps JOIN rare USING (fp)),
        |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |sh AS (SELECT DISTINCT doc_id, gram FROM g),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |i AS (SELECT c.d1, c.d2, count(*) AS inter
        |  FROM cand c JOIN sh a ON a.doc_id = c.d1
        |  JOIN sh b ON b.doc_id = c.d2 AND b.gram = a.gram
        |  GROUP BY 1, 2)
        |SELECT i.d1, i.d2, i.inter,
        |  CAST(1000000 * i.inter // s1.sz AS BIGINT) AS cont12_e6,
        |  CAST(1000000 * i.inter // s2.sz AS BIGINT) AS cont21_e6
        |FROM i JOIN sizes s1 ON s1.doc_id = i.d1
        |JOIN sizes s2 ON s2.doc_id = i.d2
        |ORDER BY i.d1, i.d2""".stripMargin,

    "l47_redundancy" ->
      """WITH d AS (SELECT doc_id, source,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents),
        |g AS (SELECT source,
        |    toks[CAST(gs AS INT)] || ' ' || toks[CAST(gs AS INT) + 1] ||
        |      ' ' || toks[CAST(gs AS INT) + 2] AS gram
        |  FROM (SELECT source, toks,
        |          unnest(generate_series(1, len(toks) - 2)) AS gs
        |        FROM d)),
        |tot AS (SELECT source, count(*) AS n_grams FROM g GROUP BY 1),
        |dist AS (SELECT source, count(*) AS n_distinct
        |  FROM (SELECT DISTINCT source, gram FROM g) GROUP BY 1)
        |SELECT t.source, t.n_grams, dist.n_distinct,
        |  CAST(1000000 * (t.n_grams - dist.n_distinct) // t.n_grams
        |    AS BIGINT) AS redundancy_e6
        |FROM tot t JOIN dist USING (source) ORDER BY source""".stripMargin,

    "l10_decontaminate" -> decontamSql,
    "l10b_decontaminate_bloom" -> decontamSql,
    "l10e_decontaminate_bloom_sql" -> decontamSql,
    "l10d_decontaminate_deleted" ->
      decontamSqlFor("doc_id % 20 = 0 AND doc_id % 40 != 0"),

    // l56: the l10 contamination CTE + the l18 hash-split CASE, with
    // quarantine overriding the hash.
    "l56_contamination_safe_split" ->
      """WITH bench AS (SELECT DISTINCT substr(text, CAST(gs AS INT), 20) AS sh
        |  FROM (SELECT text, unnest(generate_series(1, n_chars - 19)) AS gs
        |        FROM documents WHERE doc_id % 20 = 0 AND n_chars >= 20)),
        |contaminated AS (SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, substr(text, CAST(gs AS INT), 20) AS sh
        |        FROM (SELECT doc_id, text,
        |                unnest(generate_series(1, n_chars - 19)) AS gs
        |              FROM documents WHERE doc_id % 20 != 0 AND n_chars >= 20))
        |  WHERE sh IN (SELECT sh FROM bench)),
        |s AS (SELECT
        |    CASE WHEN doc_id IN (SELECT doc_id FROM contaminated)
        |         THEN 'quarantine'
        |         WHEN substr(md5(text), 1, 4) < 'cccd' THEN 'train'
        |         WHEN substr(md5(text), 1, 4) < 'e666' THEN 'val'
        |         ELSE 'test' END AS split, n_chars
        |  FROM documents WHERE doc_id % 20 != 0)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "l16_contaminated_spans" ->
      """WITH bs AS (SELECT DISTINCT substr(text, CAST(gs AS INT), 20) AS shingle
        |  FROM (SELECT text, unnest(generate_series(1, n_chars - 19)) AS gs
        |        FROM documents WHERE doc_id % 20 = 0 AND n_chars >= 20)),
        |tr AS (SELECT doc_id, CAST(gs AS BIGINT) AS pos,
        |         substr(text, CAST(gs AS INT), 20) AS shingle
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, n_chars - 19)) AS gs
        |        FROM documents WHERE doc_id % 20 != 0 AND n_chars >= 20))
        |SELECT tr.doc_id, tr.pos FROM tr JOIN bs ON tr.shingle = bs.shingle
        |ORDER BY tr.doc_id, tr.pos""".stripMargin,

    // L30 replay: shingle explode, cross-doc shingle set, then the same
    // frontier/island merge as the t19 oracle on [pos, pos+20).
    "l30_dup_spans" ->
      """WITH sh AS (SELECT doc_id, CAST(gs AS BIGINT) AS pos,
        |    substr(text, CAST(gs AS INT), 20) AS shingle
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, n_chars - 19)) AS gs
        |        FROM documents WHERE n_chars >= 20)),
        |dup AS (SELECT shingle FROM
        |  (SELECT shingle, count(DISTINCT doc_id) AS nd FROM sh GROUP BY 1)
        |  WHERE nd >= 2),
        |iv AS (SELECT doc_id, pos AS s, pos + 20 AS e FROM sh
        |       WHERE shingle IN (SELECT shingle FROM dup)),
        |m AS (SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS frontier
        |  FROM iv),
        |b AS (SELECT doc_id, s, e,
        |    CASE WHEN frontier IS NULL OR s <= frontier THEN 0 ELSE 1 END
        |      AS brk
        |  FROM m),
        |g AS (SELECT doc_id, s, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s
        |                   ROWS UNBOUNDED PRECEDING) AS island
        |  FROM b)
        |SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
        |  count(*) AS n_shingles
        |FROM g GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    // L55 replay: the l54 selection prefix feeding l11's recursive pack
    // fold — rn re-numbered over the SELECTED docs per bucket.
    "l55_select_pack" -> {
      val ws = graft.ops.Text.GopherWhitespace
      s"""WITH RECURSIVE d AS (SELECT doc_id, text,
        |    CAST(len(regexp_extract_all(lower(text), '[^$ws]+'))
        |      AS BIGINT) AS n_toks,
        |    1000000 * CAST(len(regexp_extract_all(text, '[A-Za-z]'))
        |      AS BIGINT) // greatest(n_chars, 1) AS score
        |  FROM documents),
        |tot AS (SELECT CAST(sum(n_toks) // 5 AS BIGINT) AS budget FROM d),
        |c AS (SELECT *, sum(n_toks) OVER (ORDER BY score DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM d),
        |sel AS (SELECT doc_id, text FROM c CROSS JOIN tot
        |        WHERE cum <= budget),
        |t AS (
        |  SELECT doc_id % 8 AS bucket, doc_id,
        |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tc,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
        |      AS rn
        |  FROM sel),
        |rec AS (
        |  SELECT bucket, rn, doc_id, tc, CAST(0 AS BIGINT) AS pack_id,
        |    tc AS fill
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.bucket, t.rn, t.doc_id, t.tc,
        |    CASE WHEN rec.fill + t.tc > 256 THEN rec.pack_id + 1
        |         ELSE rec.pack_id END,
        |    CASE WHEN rec.fill + t.tc > 256 THEN t.tc
        |         ELSE rec.fill + t.tc END
        |  FROM rec JOIN t ON t.bucket = rec.bucket AND t.rn = rec.rn + 1)
        |SELECT bucket, pack_id, count(*) AS n_docs,
        |  CAST(sum(tc) AS BIGINT) AS sum_tokens
        |FROM rec GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // L54 replay: the straightforward global cumsum prefix the two-pass
    // engine plan is provably equal to.
    "l54_budget_select" -> {
      val ws = graft.ops.Text.GopherWhitespace
      s"""WITH d AS (SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(lower(text), '[^$ws]+'))
        |      AS BIGINT) AS n_toks,
        |    1000000 * CAST(len(regexp_extract_all(text, '[A-Za-z]'))
        |      AS BIGINT) // greatest(n_chars, 1) AS score
        |  FROM documents),
        |tot AS (SELECT CAST(sum(n_toks) // 5 AS BIGINT) AS budget FROM d),
        |c AS (SELECT *, sum(n_toks) OVER (ORDER BY score DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM d)
        |SELECT source, count(*) AS n_selected,
        |  CAST(sum(n_toks) AS BIGINT) AS sel_tokens
        |FROM c CROSS JOIN tot WHERE cum <= budget
        |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // L52 replay: the l30 island merge, aggregated per doc and joined
    // back to the full corpus (zero-span docs keep everything).
    "l52_span_cut" ->
      """WITH sh AS (SELECT doc_id, CAST(gs AS BIGINT) AS pos,
        |    substr(text, CAST(gs AS INT), 20) AS shingle
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, n_chars - 19)) AS gs
        |        FROM documents WHERE n_chars >= 20)),
        |dup AS (SELECT shingle FROM
        |  (SELECT shingle, count(DISTINCT doc_id) AS nd FROM sh GROUP BY 1)
        |  WHERE nd >= 2),
        |iv AS (SELECT doc_id, pos AS s, pos + 20 AS e FROM sh
        |       WHERE shingle IN (SELECT shingle FROM dup)),
        |m AS (SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS frontier
        |  FROM iv),
        |b AS (SELECT doc_id, s, e,
        |    CASE WHEN frontier IS NULL OR s <= frontier THEN 0 ELSE 1 END
        |      AS brk
        |  FROM m),
        |g AS (SELECT doc_id, s, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s
        |                   ROWS UNBOUNDED PRECEDING) AS island
        |  FROM b),
        |spans AS (SELECT doc_id, min(s) AS ss, max(e) AS se
        |  FROM g GROUP BY doc_id, island),
        |agg AS (SELECT doc_id, count(*) AS n_spans_cut,
        |    CAST(sum(se - ss) AS BIGINT) AS chars_cut
        |  FROM spans GROUP BY 1)
        |SELECT d.doc_id, d.n_chars,
        |  CAST(coalesce(a.n_spans_cut, 0) AS BIGINT) AS n_spans_cut,
        |  CAST(coalesce(a.chars_cut, 0) AS BIGINT) AS chars_cut,
        |  CAST(d.n_chars - coalesce(a.chars_cut, 0) AS BIGINT)
        |    AS kept_chars
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "l12_salient_terms" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (SELECT tf.doc_id, tf.token,
        |    CAST(tf.tf * n.n * 10000 // df.df AS BIGINT) AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * n.n * 10000 // df.df DESC, tf.token) AS rn
        |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
        |SELECT doc_id, rn, token, score FROM scored WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,

    "l35_bigram_familiarity" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents),
        |big AS (SELECT doc_id,
        |    toks[CAST(gs AS INT)] || ' ' || toks[CAST(gs AS INT) + 1]
        |      AS bigram
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS gs
        |        FROM d)),
        |cnt AS (SELECT bigram, count(*) AS cnt FROM big GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(cnt.cnt) AS BIGINT) AS fam_sum,
        |  CAST(10000 * CAST(sum(cnt.cnt) AS BIGINT) // count(*)
        |    AS BIGINT) AS fam_e4
        |FROM big JOIN cnt USING (bigram)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "l38_vocab_growth" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents),
        |pd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM d),
        |fo AS (SELECT min(doc_id) AS doc_id
        |       FROM (SELECT doc_id, unnest(toks) AS token FROM d)
        |       GROUP BY token),
        |nn AS (SELECT doc_id, count(*) AS n_new FROM fo GROUP BY 1)
        |SELECT pd.doc_id,
        |  CAST(sum(pd.n_toks) OVER (ORDER BY pd.doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(nn.n_new, 0)) OVER (ORDER BY pd.doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
        |FROM pd LEFT JOIN nn USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "l41_cluster_cohesion" ->
      """WITH v AS (SELECT vec_id, label, gs AS d,
        |    CAST(embedding[CAST(gs AS INT)] AS DOUBLE) AS x
        |  FROM (SELECT vec_id, label, embedding,
        |          unnest(generate_series(1, len(embedding))) AS gs
        |        FROM embeddings)),
        |cent AS (SELECT label, d, avg(x) AS c FROM v GROUP BY 1, 2),
        |cn AS (SELECT label, sum(c*c) AS nc FROM cent GROUP BY 1),
        |per AS (SELECT v.vec_id, v.label,
        |    sum(v.x * cent.c) AS dot, sum(v.x * v.x) AS nx
        |  FROM v JOIN cent ON cent.label = v.label AND cent.d = v.d
        |  GROUP BY 1, 2),
        |cs AS (SELECT per.label,
        |    per.dot / (sqrt(per.nx) * sqrt(cn.nc)) AS cos
        |  FROM per JOIN cn ON cn.label = per.label)
        |SELECT label, count(*) AS n, round(avg(cos), 4) AS avg_cos4,
        |  round(min(cos), 4) AS min_cos4
        |FROM cs GROUP BY label ORDER BY label""".stripMargin,

    "l40_source_lift" ->
      """WITH tok AS (SELECT source,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
        |  FROM documents),
        |tfs AS (SELECT source, token, count(*) AS tf_s
        |        FROM tok GROUP BY 1, 2),
        |tfc AS (SELECT token, count(*) AS tf_c FROM tok GROUP BY 1),
        |ns AS (SELECT source, count(*) AS n_s FROM tok GROUP BY 1),
        |nc AS (SELECT count(*) AS n_c FROM tok),
        |x AS (SELECT tfs.source, tfs.token, tfs.tf_s,
        |    CAST(CAST(1000000 AS HUGEINT) * tfs.tf_s * nc.n_c
        |         // (CAST(tfc.tf_c AS HUGEINT) * ns.n_s) AS BIGINT)
        |      AS lift_e6
        |  FROM tfs JOIN tfc USING (token) JOIN ns USING (source)
        |  CROSS JOIN nc WHERE tfs.tf_s >= 20),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY lift_e6 DESC, token) AS rn FROM x)
        |SELECT source, rn, token, tf_s, lift_e6
        |FROM r WHERE rn <= 10 ORDER BY source, rn""".stripMargin,

    "l39_ngram_novelty" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents),
        |big AS (SELECT DISTINCT doc_id,
        |    toks[CAST(gs AS INT)] || ' ' || toks[CAST(gs AS INT) + 1] AS bg
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS gs
        |        FROM d)),
        |firsts AS (SELECT bg, min(doc_id) AS first_doc FROM big GROUP BY 1)
        |SELECT big.doc_id, count(*) AS n_distinct,
        |  CAST(sum(CASE WHEN firsts.first_doc = big.doc_id
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(1000000 * sum(CASE WHEN firsts.first_doc = big.doc_id
        |                          THEN 1 ELSE 0 END) // count(*)
        |    AS BIGINT) AS novelty_e6
        |FROM big JOIN firsts USING (bg)
        |GROUP BY big.doc_id ORDER BY big.doc_id""".stripMargin,

    "l37_collocations" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents),
        |big AS (SELECT toks[CAST(gs AS INT)] AS w1,
        |               toks[CAST(gs AS INT) + 1] AS w2
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS gs
        |        FROM d)),
        |cxy AS (SELECT w1, w2, count(*) AS cxy FROM big GROUP BY 1, 2),
        |cx AS (SELECT w1, count(*) AS cx FROM big GROUP BY 1),
        |cy AS (SELECT w2, count(*) AS cy FROM big GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM big)
        |SELECT cxy.w1, cxy.w2, cxy.cxy,
        |  CAST(1000000 * cxy.cxy * n.n // (cx.cx * cy.cy) AS BIGINT)
        |    AS score_e6
        |FROM cxy JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN n
        |WHERE cxy.cxy >= 5
        |ORDER BY score_e6 DESC, w1, w2 LIMIT 50""".stripMargin,

    "l36_readability" ->
      """WITH c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
        |      AS n_words,
        |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT)) AS n_sents,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syls
        |  FROM documents)
        |SELECT doc_id, n_words, n_sents, n_syls,
        |  10000 * n_words // n_sents AS wps_e4,
        |  10000 * n_syls // n_words AS spw_e4
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,

    "l11_pack_greedy" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id % 8 AS bucket, doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tc,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |rec AS (
        |  SELECT bucket, rn, doc_id, tc, CAST(0 AS BIGINT) AS pack_id,
        |    tc AS fill
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.bucket, t.rn, t.doc_id, t.tc,
        |    CASE WHEN rec.fill + t.tc > 256 THEN rec.pack_id + 1
        |         ELSE rec.pack_id END,
        |    CASE WHEN rec.fill + t.tc > 256 THEN t.tc
        |         ELSE rec.fill + t.tc END
        |  FROM rec JOIN t ON t.bucket = rec.bucket AND t.rn = rec.rn + 1)
        |SELECT bucket, pack_id, count(*) AS n_docs,
        |  CAST(sum(tc) AS BIGINT) AS sum_tokens
        |FROM rec GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // l57: the l11 recursive pack fold + an ordered string_agg of the
    // member texts.
    "l57_pack_emit" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id % 8 AS bucket, doc_id, text,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tc,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |rec AS (
        |  SELECT bucket, rn, doc_id, text, tc, CAST(0 AS BIGINT) AS pack_id,
        |    tc AS fill
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.bucket, t.rn, t.doc_id, t.text, t.tc,
        |    CASE WHEN rec.fill + t.tc > 256 THEN rec.pack_id + 1
        |         ELSE rec.pack_id END,
        |    CASE WHEN rec.fill + t.tc > 256 THEN t.tc
        |         ELSE rec.fill + t.tc END
        |  FROM rec JOIN t ON t.bucket = rec.bucket AND t.rn = rec.rn + 1)
        |SELECT bucket, pack_id, count(*) AS n_docs,
        |  CAST(sum(tc) AS BIGINT) AS sum_tokens,
        |  string_agg(text, '<eos>' ORDER BY doc_id) AS packed
        |FROM rec GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "l01_exact_dedup" ->
      """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY canonical_id""".stripMargin,

    "l02_near_dedup" ->
      """WITH g AS (SELECT doc_id, text,
        |    unnest(generate_series(1, n_chars - 2)) AS gs
        |  FROM documents WHERE n_chars >= 3),
        | sh AS (SELECT DISTINCT doc_id,
        |    substr(text, CAST(gs AS INT), 3) AS shingle FROM g),
        | sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        | i AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n
        |       FROM sh a JOIN sh b
        |         ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |  round(n * 1.0 / (sa.sz + sb.sz - n), 4) AS jaccard
        |FROM i
        |JOIN sz sa ON sa.doc_id = a_id
        |JOIN sz sb ON sb.doc_id = b_id
        |WHERE n * 1.0 / (sa.sz + sb.sz - n) > 0.6
        |ORDER BY a_id, b_id""".stripMargin,

    "l15_dedup_clusters" ->
      s"""$dedupClusterCte
        |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin,

    // l61: the l15 cluster replay with the embedding-cosine pairs
    // (l03c's kernel, same double fold + threshold) unioned into the
    // edge set before the contraction+walk.
    "l61_ensemble_dedup" -> {
      val dotAB = duckDot.format("a.embedding", "b.embedding")
      val nA = duckNormSq.format("a.embedding")
      val nB = duckNormSq.format("b.embedding")
      s"""${clusterCteOver(
            s"SELECT a.vec_id AS a_id, b.vec_id AS b_id" +
            s" FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id" +
            s" WHERE $dotAB / (sqrt($nA) * sqrt($nB)) > 0.4")}
        |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin
    },

    // l34: the same canonicalization chain in DuckDB regex syntax; the
    // GopherWhitespace class literal is shared with the engine.
    "l34_text_canonical" -> {
      val ws = graft.ops.Text.GopherWhitespace
      s"""SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS raw_bytes,
        |  CAST(strlen(trim(regexp_replace(
        |    regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'),
        |    '[$ws]+', ' ', 'g'))) AS BIGINT) AS canon_bytes,
        |  md5(trim(regexp_replace(
        |    regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'),
        |    '[$ws]+', ' ', 'g'))) AS canon_md5
        |FROM documents ORDER BY doc_id""".stripMargin
    },

    // l33: the l15 cluster replay + the canonical pick per cluster.
    "l33_dedup_keeplist" ->
      s"""$dedupClusterCte
        |SELECT cl.doc_id, cl.cluster_id,
        |  row_number() OVER (PARTITION BY cl.cluster_id
        |    ORDER BY d.n_chars DESC, cl.doc_id ASC) = 1 AS keep
        |FROM cl JOIN documents d ON d.doc_id = cl.doc_id
        |ORDER BY cl.doc_id""".stripMargin,

    "l48_semantic_dedup" ->
      s"""WITH $semCte
        |SELECT vec_id, label, close, keep FROM semkeep
        |ORDER BY vec_id""".stripMargin,

    // l48b: the Lloyd replay feeds the same semantic-keep chain — the
    // labeled source is the k-means assignment joined back to the
    // embeddings instead of the fixture's label column.
    "l48b_semantic_dedup_kmeans" ->
      s"""WITH $kmeansCte,
        |${semCteFrom("(SELECT e.vec_id, a.cid AS label, e.embedding" +
          " FROM embeddings e JOIN ka3 a USING (vec_id))")}
        |SELECT vec_id, label, close, keep FROM semkeep
        |ORDER BY vec_id""".stripMargin,

    // The composed funnel: dedup-cluster CTE + per-doc langid + per-doc
    // gopher flags + the l48 semantic CTE, staged. Fresh CTE names
    // (lh/lg/gm/gf) because the shared dedup CTE already owns `g`.
    // keepl/staged are MATERIALIZED: the five stage aggregates each
    // reference `staged`, and DuckDB inlines plain CTEs per reference —
    // five re-expansions of the whole dedup+semantic chain spilled
    // 20 GiB at sf0.1; materialized, the query runs in ~14 s.
    "l43_pipeline_manifest" -> manifestOracle(
      s"""$dedupClusterCte,
        |$semCte,
        |keepl AS MATERIALIZED (SELECT cl.doc_id,
        |    row_number() OVER (PARTITION BY cl.cluster_id
        |      ORDER BY d.n_chars DESC, cl.doc_id ASC) = 1 AS dup_keep
        |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id)""".stripMargin),

    // l43b: the manifest replay with exact-hash dedup (group by raw
    // text — sha2 is the engine's shuffle key, same partition) and the
    // semantic chain fed by the unrolled Lloyd k-means labels instead
    // of the fixture column. Recursion-free on purpose: see the l43b
    // registry comment.
    "l43b_manifest_derived_clusters" -> manifestOracle(
      s"""WITH $kmeansCte,
        |${semCteFrom("(SELECT e.vec_id, a.cid AS label, e.embedding" +
          " FROM embeddings e JOIN ka3 a USING (vec_id))")},
        |keepl AS (SELECT doc_id,
        |    doc_id = min(doc_id) OVER (PARTITION BY text) AS dup_keep
        |  FROM documents)""".stripMargin),
  ) ++ oraclesTail

  /** The r16 LLM SQL-door twins reuse their Scala siblings' oracles
    * VERBATIM — the TVFs splice the same kernels, so the same DuckDB
    * replays are the gates.
    */
  val oracles: Map[String, String] = oraclesBase0 ++ Map(
    "l02d_near_dedup_sql" -> oraclesBase0("l02_near_dedup"),
    "l03e_cosine_topk_sql" -> oraclesBase0("l03_cosine_topk"),
    "l10c_decontaminate_sql" -> oraclesBase0("l10_decontaminate"))

  /** The manifest oracle over any CTE preamble that defines
    * `keepl(doc_id, dup_keep)` and `semkeep(vec_id, keep)`. The caller
    * supplies the whole `WITH ...` prefix (l43's starts WITH RECURSIVE
    * via dedupClusterCte; l43b's is recursion-free by design — see the
    * l43b registry comment for the DuckDB 1.0 parallel-spill pathology
    * that forbids combining the two replay chains in one statement).
    * Fresh CTE names (lh/lg/gm/gf) because the shared dedup CTE
    * already owns `g`.
    */
  private def manifestOracle(preamble: String): String =
      s"""$preamble,
        |lh AS (SELECT doc_id, text,
        |    len(regexp_extract_all(lower(text),
        |      '\\b(der|die|das|und|ist|nicht|mit|ein)\\b')) AS de,
        |    len(regexp_extract_all(lower(text),
        |      '\\b(the|and|is|of|to|in|that|with)\\b')) AS en,
        |    len(regexp_extract_all(lower(text),
        |      '\\b(el|la|los|las|es|y|que|una)\\b')) AS es,
        |    len(regexp_extract_all(lower(text),
        |      '\\b(le|la|les|est|et|que|une|dans)\\b')) AS fr
        |  FROM documents),
        |lg AS (SELECT doc_id,
        |    CASE
        |      WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) * 4
        |           > len(text) THEN 'zh'
        |      WHEN de >= en AND de >= es AND de >= fr THEN 'de'
        |      WHEN en >= es AND en >= fr THEN 'en'
        |      WHEN es >= fr THEN 'es'
        |      ELSE 'fr' END AS guess
        |  FROM lh),
        |gm AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[^ \\t\\n\\x0B\\f\\r]+'))
        |      AS BIGINT) AS n_words,
        |    len(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS wc,
        |    CAST(len(list_filter(regexp_extract_all(text,
        |      '[^ \\t\\n\\x0B\\f\\r]+'),
        |      w -> list_contains(['the','a','an','and','of','to','in','is',
        |                          'that','for','on','with','as'], lower(w))))
        |      AS BIGINT) AS n_stop
        |  FROM documents),
        |gf AS (SELECT doc_id,
        |    (n_words BETWEEN 5 AND 100000)
        |      AND COALESCE(round(CAST(wc AS DOUBLE) / nullif(n_words, 0), 4)
        |            BETWEEN 2.0 AND 12.0, false)
        |      AND COALESCE(round(CAST(n_stop AS DOUBLE) / nullif(n_words, 0),
        |            4) >= 0.01, false) AS q_ok
        |  FROM gm),
        |staged AS MATERIALIZED (SELECT d.doc_id, d.n_chars,
        |    lg.guess = 'en' AS lang_ok, gf.q_ok,
        |    coalesce(k.dup_keep, true) AS dup_ok,
        |    coalesce(sk.keep, true) AS sem_ok
        |  FROM documents d
        |  JOIN lg ON lg.doc_id = d.doc_id
        |  JOIN gf ON gf.doc_id = d.doc_id
        |  LEFT JOIN keepl k ON k.doc_id = d.doc_id
        |  LEFT JOIN semkeep sk ON sk.vec_id = d.doc_id)
        |SELECT * FROM (
        |  SELECT '0_all' AS stage, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars FROM staged
        |  UNION ALL SELECT '1_lang', count(*),
        |    CAST(sum(n_chars) AS BIGINT) FROM staged WHERE lang_ok
        |  UNION ALL SELECT '2_quality', count(*),
        |    CAST(sum(n_chars) AS BIGINT) FROM staged
        |    WHERE lang_ok AND q_ok
        |  UNION ALL SELECT '3_dedup', count(*),
        |    CAST(sum(n_chars) AS BIGINT) FROM staged
        |    WHERE lang_ok AND q_ok AND dup_ok
        |  UNION ALL SELECT '4_semantic', count(*),
        |    CAST(sum(n_chars) AS BIGINT) FROM staged
        |    WHERE lang_ok AND q_ok AND dup_ok AND sem_ok)
        |ORDER BY stage""".stripMargin

  private lazy val oraclesTail: Map[String, String] = Map(
    "l17_fuzzy_join" ->
      """SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a_id, b_id""".stripMargin,

    "l03_cosine_topk" -> {
      val dotAB = duckDot.format("a.embedding", "b.embedding")
      val nA = duckNormSq.format("a.embedding")
      val nB = duckNormSq.format("b.embedding")
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round($dotAB / (sqrt($nA) * sqrt($nB)), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY cos_sim DESC, a_id, b_id LIMIT 20""".stripMargin
    },

    // l32: the l03 replay on 16-element list slices.
    "l32_matryoshka_topk" -> {
      val dotAB = duckDot.format("a.embedding[1:16]", "b.embedding[1:16]")
      val nA = duckNormSq.format("a.embedding[1:16]")
      val nB = duckNormSq.format("b.embedding[1:16]")
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round($dotAB / (sqrt($nA) * sqrt($nB)), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY cos_sim DESC, a_id, b_id LIMIT 20""".stripMargin
    },

    // SimHash replay: per-token 60-bit md5 hash (Det.duckMd5Long — the
    // exact engine hash), then per bit b the sign vote resolves to
    // "strictly more than half the tokens have bit b set" (ones·2 > t ⟺
    // votes > 0); 60 CASE terms summed assemble the fingerprint. Bits
    // 60–63 are structurally 0 on both engines (60-bit token hash).
    // Tokenizer is the explicit GopherWhitespace class on both sides.
    "l07_simhash" -> {
      val tokHash = graft.Det.duckMd5Long("t")
      val ws = graft.ops.Text.GopherWhitespace
      val bitTerms = (0 until 60).map { b =>
        s"CASE WHEN 2 * len(list_filter(hs, h -> ((h >> $b) & 1) = 1)) " +
          s"> len(hs) THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END"
      }.mkString("\n    + ")
      s"""WITH toks AS (SELECT doc_id,
        |    list_transform(regexp_extract_all(text, '[^$ws]+'),
        |      t -> $tokHash) AS hs
        |  FROM documents)
        |SELECT doc_id,
        |  CAST($bitTerms AS BIGINT) AS simhash
        |FROM toks ORDER BY doc_id""".stripMargin
    },

    "l08_centroids" ->
      """WITH g AS (SELECT label, embedding,
        |    unnest(generate_series(1, len(embedding))) AS gs
        |  FROM embeddings)
        |SELECT label, CAST(gs - 1 AS INT) AS dim_idx,
        |  round(avg(CAST(embedding[gs] AS DOUBLE)), 4) AS c4
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "l03c_cosine_neardup" -> {
      val dotAB = duckDot.format("a.embedding", "b.embedding")
      val nA = duckNormSq.format("a.embedding")
      val nB = duckNormSq.format("b.embedding")
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round($dotAB / (sqrt($nA) * sqrt($nB)), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE $dotAB / (sqrt($nA) * sqrt($nB)) > 0.4
        |ORDER BY a_id, b_id""".stripMargin
    },

    "l04_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |    AS n_tokens,
        |  CAST(sum(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_bpe_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST((20000 * sum(n_chars) + count(*)) // (2 * count(*))
        |       AS BIGINT) / 10000.0 AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "l04b_quality" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
        |  round(len(regexp_extract_all(text, '[.,!?;:]')) * 1.0 / n_chars, 4)
        |    AS punct_ratio,
        |  round(len(regexp_extract_all(text, '\s')) * 1.0 / n_chars, 4)
        |    AS space_ratio,
        |  round(len(regexp_extract_all(text, '[A-Z]')) * 1.0 / n_chars, 4)
        |    AS upper_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The langid heuristic is plain scalar SQL — word-list hit counts +
    // a CJK density test — so it replays exactly (RE2 spells the CJK
    // range \x{...} where Java spells it \u...; same code points).
    "l04c_langid" ->
      """WITH h AS (SELECT lang, text,
        |    len(regexp_extract_all(lower(text),
        |      '\b(der|die|das|und|ist|nicht|mit|ein)\b')) AS de,
        |    len(regexp_extract_all(lower(text),
        |      '\b(the|and|is|of|to|in|that|with)\b')) AS en,
        |    len(regexp_extract_all(lower(text),
        |      '\b(el|la|los|las|es|y|que|una)\b')) AS es,
        |    len(regexp_extract_all(lower(text),
        |      '\b(le|la|les|est|et|que|une|dans)\b')) AS fr
        |  FROM documents),
        |g AS (SELECT lang,
        |    CASE
        |      WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) * 4
        |           > len(text) THEN 'zh'
        |      WHEN de >= en AND de >= es AND de >= fr THEN 'de'
        |      WHEN en >= es AND en >= fr THEN 'en'
        |      WHEN es >= fr THEN 'es'
        |      ELSE 'fr' END AS guess
        |  FROM h)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN guess = lang THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // L26 replay: same lowercase-bigram hashing-trick pipeline —
    // md5Long(bigram) mod 4096 buckets, fixture weight fid % 201 − 100,
    // integer sum. Tokenizer is the explicit GopherWhitespace class on
    // BOTH engines; empty/1-token docs produce an empty bigram list →
    // list_sum NULL coalesced to the engine's fold seed 0 (keep = true).
    "l26_quality_score" -> {
      val gHash = graft.Det.duckMd5Long("g")
      val ws = graft.ops.Text.GopherWhitespace
      s"""WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[^$ws]+') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id,
        |    CASE WHEN len(toks) >= 2 THEN
        |      list_transform(range(1, len(toks)),
        |                     i -> toks[i] || '_' || toks[i + 1])
        |    ELSE CAST([] AS VARCHAR[]) END AS bg
        |  FROM t),
        |s AS (SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
        |    CAST(coalesce(list_sum(list_transform(bg,
        |        g -> ($gHash % 4096) % 201 - 100)), 0) AS BIGINT)
        |      AS score_sum
        |  FROM b)
        |SELECT doc_id, n_bigrams, score_sum, score_sum >= 0 AS keep
        |FROM s ORDER BY doc_id""".stripMargin
    },

    // L29 replay: same bigram→md5-bucket pipeline as the l26 twin, then
    // bucket stats, re-aggregated totals, the exact integer ratio
    // (HUGEINT-safe in DuckDB, // = floor = Spark's div on positives),
    // and the per-doc sum — LEFT-joined onto the doc spine so
    // feature-less docs keep (0, 0).
    "l29_importance_weights" -> {
      val gHash = graft.Det.duckMd5Long("g")
      val ws = graft.ops.Text.GopherWhitespace
      s"""WITH t AS (SELECT doc_id, lang,
        |    regexp_extract_all(lower(text), '[^$ws]+') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, lang,
        |    CASE WHEN len(toks) >= 2 THEN
        |      list_transform(range(1, len(toks)),
        |                     i -> toks[i] || '_' || toks[i + 1])
        |    ELSE CAST([] AS VARCHAR[]) END AS bg
        |  FROM t),
        |f AS (SELECT doc_id, lang = 'en' AS tgt, ($gHash) % 4096 AS fid
        |  FROM (SELECT doc_id, lang, unnest(bg) AS g FROM b)),
        |st AS (SELECT fid, count(*) AS cnt_r,
        |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
        |  FROM f GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt_r) AS BIGINT) AS n_r,
        |    CAST(sum(cnt_t) AS BIGINT) AS n_t FROM st),
        |sc AS (SELECT fid,
        |    CAST(1000000 * (cnt_t + 1) * (n_r + 4096)
        |         // ((cnt_r + 1) * (n_t + 4096)) AS BIGINT) AS score_e6
        |  FROM st CROSS JOIN tot),
        |pd AS (SELECT f.doc_id, count(*) AS n_feats,
        |    CAST(sum(sc.score_e6) AS BIGINT) AS w_e6
        |  FROM f JOIN sc USING (fid) GROUP BY 1)
        |SELECT d.doc_id, coalesce(pd.n_feats, 0) AS n_feats,
        |  coalesce(pd.w_e6, 0) AS w_e6
        |FROM documents d LEFT JOIN pd USING (doc_id)
        |ORDER BY doc_id""".stripMargin
    },

    "l49_unigram_vocab" -> unigramChainSql(vocabWords = 200,
      maxPieceLen = 4, candidates = 150, rounds = 3, prunePerRound = 30),

    // l51: the WAV round-trip is engine-side; the oracle replays the
    // deterministic sample stream arithmetically (same md5 formula)
    // and the exact integer window features.
    // L53 replay: the same md5 channel grid, features computed directly
    // (no codec) — a hash match therefore certifies the engine's
    // encode→parse round trip byte-for-byte.
    "l53_image_features" -> {
      val h = graft.Det.duckMd5Long("doc_id || '_' || p")
      s"""WITH px AS (SELECT doc_id, p,
        |    CAST(($h) % 256 AS BIGINT) AS v
        |  FROM (SELECT doc_id, unnest(range(0, 192)) AS p
        |        FROM documents))
        |SELECT doc_id, CAST(p % 3 AS BIGINT) AS channel,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_v,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |  CAST(sum(CASE WHEN v < 64 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
        |  CAST(sum(CASE WHEN v >= 64 AND v < 128 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS h1,
        |  CAST(sum(CASE WHEN v >= 128 AND v < 192 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS h2,
        |  CAST(sum(CASE WHEN v >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS h3
        |FROM px GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // l53b: the pixels → centered embedding → pairwise cosine replay.
    // Dots and squared norms are exact integers (centered uint8 values,
    // sums < 2^22), so sqrt/division/round are bit-identical to the
    // engine's double fold; the 0.8 threshold compares equal doubles.
    "l53b_image_neardup" -> {
      val hNoise = graft.Det.duckMd5Long("doc_id || '#' || p")
      val hBase = graft.Det.duckMd5Long("(doc_id % 50) || '_' || p")
      val dotAB = duckDot.format("a.e", "b.e")
      val nA = duckNormSq.format("a.e")
      val nB = duckNormSq.format("b.e")
      s"""WITH px AS (SELECT doc_id, p,
        |    CAST(CASE WHEN p < 6 THEN ($hNoise) % 256
        |         ELSE ($hBase) % 256 END AS BIGINT) - 128 AS v
        |  FROM (SELECT doc_id, unnest(range(0, 192)) AS p
        |        FROM documents)),
        |v AS (SELECT doc_id, list(v ORDER BY p) AS e FROM px GROUP BY 1)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round($dotAB / (sqrt($nA) * sqrt($nB)), 4) AS cos_sim
        |FROM v a JOIN v b ON a.doc_id < b.doc_id
        |WHERE $dotAB / (sqrt($nA) * sqrt($nB)) > 0.8
        |ORDER BY a_id, b_id""".stripMargin
    },

    // l58: the sampled frames' md5 grids replayed arithmetically —
    // frame k has 6·(4+k) channel values; sampling keeps k ∈ {0, 2}.
    "l58_video_frames" -> {
      val h = graft.Det.duckMd5Long("doc_id || 'f' || k || '_' || p")
      s"""WITH px AS (SELECT doc_id, k,
        |    CAST(($h) % 256 AS BIGINT) AS v
        |  FROM (SELECT doc_id, k, unnest(range(0, 6 * (4 + k))) AS p
        |        FROM (SELECT doc_id, unnest([0, 2]) AS k
        |              FROM documents)))
        |SELECT doc_id, CAST(k AS INT) AS frame_idx,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_v,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq
        |FROM px GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // l59: the pooled-video replay — per-frame md5 grids summed per
    // position (exact integers: 4 centered uint8 sums, |v| <= 512, dots
    // < 48·512² < 2^24), then the l53b pairwise-cosine replay. A hash
    // match certifies demux + decode + pool + pair kernel end to end.
    // l59c (the two-door SQL composition) reproduces the same result,
    // so it holds the same oracle verbatim.
    "l59_video_neardup" -> l59OracleSql,
    "l59c_video_neardup_sql" -> l59OracleSql,
    "l60_audio_neardup" -> l60OracleSql,
    "l60c_audio_neardup_sql" -> l60OracleSql,

    "l51_audio_features" -> {
      val h = graft.Det.duckMd5Long("doc_id || '_' || i")
      s"""WITH s AS (SELECT doc_id, i,
        |    CAST(($h) % 65536 - 32768 AS BIGINT) AS smp
        |  FROM (SELECT doc_id, unnest(range(0, 256)) AS i
        |        FROM documents)),
        |p AS (SELECT doc_id, i, smp,
        |    lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM s)
        |SELECT doc_id, CAST(i // 64 AS BIGINT) AS win,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(smp * smp) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN i % 64 <> 0 AND prev * smp < 0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS crossings
        |FROM p GROUP BY 1, 2 ORDER BY doc_id, win""".stripMargin
    },

    // l50: the bigram-model replay — parallel unnests zip the slice
    // pair exactly like Spark's zip_with(slice, slice); DuckDB ln and
    // JVM Math.log agree to <1 ulp per term and round(4) on the mean
    // absorbs the fold-order residue (l03's cosine precedent).
    "l50_bigram_xent" ->
      """WITH t AS (SELECT doc_id, doc_id % 5 = 0 AS ref,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents),
        |p AS (SELECT doc_id, ref,
        |    unnest(toks[1:len(toks)-1]) AS w1,
        |    unnest(toks[2:len(toks)]) AS w2
        |  FROM t WHERE len(toks) >= 2),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM p WHERE ref
        |  GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM p WHERE ref GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(toks) AS tok FROM t WHERE ref)),
        |nll AS (SELECT p.doc_id,
        |    ln(coalesce(c1.c1, 0) + v.v) - ln(coalesce(c2.c2, 0) + 1)
        |      AS nll
        |  FROM p LEFT JOIN c2 ON c2.w1 = p.w1 AND c2.w2 = p.w2
        |         LEFT JOIN c1 ON c1.w1 = p.w1
        |         CROSS JOIN v),
        |sc AS (SELECT doc_id, count(*) AS n_bigrams,
        |    round(avg(nll), 4) AS xent_r4 FROM nll GROUP BY 1)
        |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
        |  sc.xent_r4
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // L27 replay: the engine's count→pick→merge cycle unrolled for 8
    // rounds. Same vocab (top-500 alphabetic words by freq desc, word
    // asc), same pair counting (adjacent symbols weighted by word freq),
    // same tie-break (cnt DESC, p1, p2 LIMIT 1), and the SAME greedy
    // left-to-right fold — list_reduce over single-element lists (the
    // seed is the first symbol's singleton, matching the engine's
    // empty-accumulator CASE), so "aaa" merges to [aa, a] on both sides.
    "l27_bpe_merges" -> {
      val (head, steps) = bpeChainSql(8)
      val tail = (1 to 8)
        .map(i => s"SELECT $i AS round, p1, p2, cnt FROM m$i")
        .mkString("\n", "\nUNION ALL\n", "\nORDER BY round")
      (head +: steps).mkString(",\n") + tail
    },

    // L28 replay: the l27 train chain for m1..m8, then the SAME greedy
    // fold applied per merge to every doc's alphabetic words (a0..a8),
    // summed per doc; zero-token docs survive the LEFT JOIN with zeros.
    "l28_bpe_encode" -> {
      val (head, steps) = bpeChainSql(8)
      val ws = graft.ops.Text.GopherWhitespace
      val a0 =
        s"""a0 AS (SELECT doc_id,
          |    unnest(list_filter(regexp_extract_all(lower(text),
          |      '[^$ws]+'), w -> regexp_full_match(w, '[a-z]+'))) AS w
          |  FROM documents),
          |b0 AS (SELECT doc_id, regexp_extract_all(w, '.') AS l FROM a0)""".stripMargin
      val applies = (1 to 8).map { i =>
        s"""b$i AS (SELECT b.doc_id,
          |    list_reduce(list_transform(b.l, x -> [x]),
          |      (acc, x) -> CASE
          |        WHEN acc[-1] = m.p1 AND x[1] = m.p2
          |        THEN list_append(acc[1:len(acc)-1], m.p1 || m.p2)
          |        ELSE list_append(acc, x[1]) END) AS l
          |  FROM b${i - 1} b CROSS JOIN m$i m)""".stripMargin
      }
      val agg =
        """agg AS (SELECT doc_id, count(*) AS n_words,
          |    CAST(sum(len(l)) AS BIGINT) AS n_subtokens
          |  FROM b8 GROUP BY doc_id)""".stripMargin
      val tail =
        """
          |SELECT d.doc_id,
          |  CAST(coalesce(agg.n_words, 0) AS BIGINT) AS n_words,
          |  CAST(coalesce(agg.n_subtokens, 0) AS BIGINT) AS n_subtokens
          |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
          |ORDER BY d.doc_id""".stripMargin
      (head +: (steps ++ Seq(a0) ++ applies ++ Seq(agg))).mkString(",\n") + tail
    },

    // The same trained-BPE encode chain, aggregated per language.
    "l42_bpe_fertility" -> {
      val (head, steps) = bpeChainSql(8)
      val ws = graft.ops.Text.GopherWhitespace
      val a0 =
        s"""a0 AS (SELECT doc_id,
          |    unnest(list_filter(regexp_extract_all(lower(text),
          |      '[^$ws]+'), w -> regexp_full_match(w, '[a-z]+'))) AS w
          |  FROM documents),
          |b0 AS (SELECT doc_id, regexp_extract_all(w, '.') AS l FROM a0)""".stripMargin
      val applies = (1 to 8).map { i =>
        s"""b$i AS (SELECT b.doc_id,
          |    list_reduce(list_transform(b.l, x -> [x]),
          |      (acc, x) -> CASE
          |        WHEN acc[-1] = m.p1 AND x[1] = m.p2
          |        THEN list_append(acc[1:len(acc)-1], m.p1 || m.p2)
          |        ELSE list_append(acc, x[1]) END) AS l
          |  FROM b${i - 1} b CROSS JOIN m$i m)""".stripMargin
      }
      val agg =
        """agg AS (SELECT doc_id, count(*) AS n_words,
          |    CAST(sum(len(l)) AS BIGINT) AS n_subtokens
          |  FROM b8 GROUP BY doc_id)""".stripMargin
      val tail =
        """
          |SELECT d.lang,
          |  CAST(sum(coalesce(agg.n_words, 0)) AS BIGINT) AS n_words,
          |  CAST(sum(coalesce(agg.n_subtokens, 0)) AS BIGINT)
          |    AS n_subtokens,
          |  CAST(10000 * sum(coalesce(agg.n_subtokens, 0))
          |       // sum(coalesce(agg.n_words, 0)) AS BIGINT) AS fert_e4
          |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
          |GROUP BY d.lang HAVING sum(coalesce(agg.n_words, 0)) > 0
          |ORDER BY d.lang""".stripMargin
      (head +: (steps ++ Seq(a0) ++ applies ++ Seq(agg))).mkString(",\n") + tail
    },

    // Rolling fingerprint replay: same fold, same per-token md5-derived
    // hash (Det.duckMd5Long), seed 0 via list_prepend (list_reduce seeds
    // with the first element). Tokenizer is the explicit GopherWhitespace
    // class on BOTH engines — Java \s and RE2 \s disagree on U+000B.
    "l04d_fingerprint" -> {
      val tokHash = graft.Det.duckMd5Long("t")
      val ws = graft.ops.Text.GopherWhitespace
      s"""SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(regexp_extract_all(text, '[^$ws]+'),
        |      t -> $tokHash % 2147483648)),
        |    (x, y) -> (x * 31 + y) % 2147483648) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
    },

    // The fake media feature is md5 over the payload BYTES; the payload
    // is exactly text's UTF-8 encoding, and DuckDB's md5(VARCHAR) hashes
    // the string's UTF-8 bytes — identical input, identical hex.
    "l05c_binary_features" -> {
      val feat = graft.Det.duckMd5Long("text")
      s"""SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  $feat AS feature
        |FROM documents ORDER BY doc_id""".stripMargin
    },

    "l04e_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        |           FROM documents),
        |b AS (SELECT doc_id, toks, len(toks) AS nt,
        |        CASE WHEN len(toks) >= 2 THEN
        |          list_transform(range(1, len(toks)),
        |                         i -> toks[i] || ' ' || toks[i + 1])
        |        ELSE CAST([] AS VARCHAR[]) END AS bg
        |      FROM t)
        |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN nt = 0 THEN 0
        |       ELSE ((nt - len(list_distinct(toks))) * 1000) // nt
        |       END AS BIGINT) AS dup_tok_permille,
        |  CAST(CASE WHEN nt < 2 THEN 0
        |       ELSE ((len(bg) - len(list_distinct(bg))) * 1000) // len(bg)
        |       END AS BIGINT) AS dup_bigram_permille
        |FROM b ORDER BY doc_id""".stripMargin,

    "l14_chunks" ->
      """SELECT doc_id,
        |  CAST((pos - 1) // 150 AS BIGINT) AS chunk_id,
        |  CAST(pos AS BIGINT) AS pos,
        |  substring(text, CAST(pos AS INT), 200) AS chunk
        |FROM (SELECT doc_id, text,
        |        unnest(range(1, n_chars + 1, 150)) AS pos
        |      FROM documents WHERE n_chars >= 1)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "l05_embeddings" -> {
      val n = duckNormSq.format("embedding")
      s"""SELECT vec_id, label, len(embedding) AS dim,
        |  round(sqrt($n), 4) AS nrm,
        |  round(CAST(embedding[1] AS DOUBLE) / sqrt($n), 4) AS n0
        |FROM embeddings ORDER BY vec_id""".stripMargin
    },

    "l05b_binary" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "l06_knn" -> {
      val dotQ = duckDot.format("e.embedding", "q.qe")
      val nE = duckNormSq.format("e.embedding")
      val nQ = duckNormSq.format("q.qe")
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round($dotQ / (sqrt($nE) * sqrt($nQ)), 4) AS cos_sim
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin
    },

    "l22_vocab_coverage" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
        |  FROM documents),
        |vocab AS (SELECT token FROM (
        |  SELECT token, count(*) AS cnt FROM toks GROUP BY 1
        |  ORDER BY cnt DESC, token LIMIT 1000)),
        |m AS (SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN token IN (SELECT token FROM vocab)
        |             THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
        |  FROM toks GROUP BY 1)
        |SELECT doc_id, n_tokens, n_oov,
        |  round(CAST(n_oov AS DOUBLE) / n_tokens, 4) AS oov_rate
        |FROM m ORDER BY doc_id""".stripMargin,

    // boundaries = Text.splitBoundsHex(0.8/0.1/0.1): 'cccd', 'e666'
    "l18_stable_split" ->
      """WITH s AS (SELECT
        |    CASE WHEN substr(md5(text), 1, 4) < 'cccd' THEN 'train'
        |         WHEN substr(md5(text), 1, 4) < 'e666' THEN 'val'
        |         ELSE 'test' END AS split, n_chars
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // word class spelled explicitly on both engines — RE2's \S differs
    // from Java's on U+000B (see Text.GopherWhitespace)
    "l19_gopher_flags" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'))
        |      AS BIGINT) AS n_words,
        |    len(regexp_replace(text, '[ \t\n\x0B\f\r]', '', 'g')) AS wc,
        |    CAST(len(list_filter(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'),
        |      w -> list_contains(['the','a','an','and','of','to','in','is',
        |                          'that','for','on','with','as'], lower(w))))
        |      AS BIGINT) AS n_stop
        |  FROM documents),
        |f AS (SELECT doc_id, n_words,
        |    CASE WHEN n_words > 0
        |      THEN round(CAST(wc AS DOUBLE) / n_words, 4) END AS mean_word_len,
        |    CASE WHEN n_words > 0
        |      THEN round(CAST(n_stop AS DOUBLE) / n_words, 4) END AS stop_frac
        |  FROM m)
        |SELECT doc_id, n_words, mean_word_len, stop_frac,
        |  n_words BETWEEN 5 AND 100000 AS ok_words,
        |  COALESCE(mean_word_len BETWEEN 2.0 AND 12.0, false) AS ok_word_len,
        |  COALESCE(stop_frac >= 0.01, false) AS ok_stop,
        |  (n_words BETWEEN 5 AND 100000)
        |    AND COALESCE(mean_word_len BETWEEN 2.0 AND 12.0, false)
        |    AND COALESCE(stop_frac >= 0.01, false) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "l23_source_cap" ->
      """SELECT source, rk, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin,

    // l31 replays the largest-remainder apportionment (all integers) and
    // the md5-keyed per-source pick.
    "l31_proportional_sample" ->
      """WITH counts AS (SELECT source, count(*) AS n FROM documents
        |               GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM counts),
        |q AS (SELECT source, n,
        |    CAST(100 * n // big_n AS BIGINT) AS floor_alloc,
        |    CAST((100 * n) % big_n AS BIGINT) AS rem
        |  FROM counts CROSS JOIN tot),
        |a AS (SELECT source, floor_alloc, rem,
        |    100 - sum(floor_alloc) OVER () AS extra_seats,
        |    row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
        |  FROM q),
        |alloc AS (SELECT source,
        |    floor_alloc + CASE WHEN rk <= extra_seats THEN 1 ELSE 0 END
        |      AS alloc
        |  FROM a),
        |picked AS (SELECT d.source, d.doc_id,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
        |      AS sel_rank
        |  FROM documents d)
        |SELECT p.source, CAST(p.sel_rank AS BIGINT) AS sel_rank, p.doc_id
        |FROM picked p JOIN alloc ON p.source = alloc.source
        |WHERE p.sel_rank <= alloc.alloc
        |ORDER BY p.source, p.sel_rank""".stripMargin,

    // l24 replays the l19 gate, then the quantize-then-sum weights: each
    // source's sqrt rounded to 1e-6 first, integer-summed denominator.
    "l24_mixture_weights" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'))
        |      AS BIGINT) AS n_words,
        |    len(regexp_replace(text, '[ \t\n\x0B\f\r]', '', 'g')) AS wc,
        |    CAST(len(list_filter(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'),
        |      w -> list_contains(['the','a','an','and','of','to','in','is',
        |                          'that','for','on','with','as'], lower(w))))
        |      AS BIGINT) AS n_stop
        |  FROM documents),
        |f AS (SELECT doc_id, n_words,
        |    CASE WHEN n_words > 0
        |      THEN round(CAST(wc AS DOUBLE) / n_words, 4) END AS mean_word_len,
        |    CASE WHEN n_words > 0
        |      THEN round(CAST(n_stop AS DOUBLE) / n_words, 4) END AS stop_frac
        |  FROM m),
        |kept AS (SELECT d.source FROM documents d JOIN f ON f.doc_id = d.doc_id
        |  WHERE (f.n_words BETWEEN 5 AND 100000)
        |    AND COALESCE(f.mean_word_len BETWEEN 2.0 AND 12.0, false)
        |    AND COALESCE(f.stop_frac >= 0.01, false)),
        |counts AS (SELECT source, count(*) AS n_docs,
        |    CAST(round(sqrt(count(*)) * 1000000) AS BIGINT) AS q
        |  FROM kept GROUP BY 1),
        |tot AS (SELECT CAST(sum(q) AS BIGINT) AS q_total FROM counts)
        |SELECT source, n_docs,
        |  round(CAST(q AS DOUBLE) / q_total, 6) AS weight
        |FROM counts, tot ORDER BY source""".stripMargin,

    // l25 rebuilds the same contact trailer, then replays the same
    // 3-pattern scrub; md5 agrees byte-for-byte across engines.
    "l25_pii_redact" ->
      """WITH f AS (SELECT doc_id,
        |    text || ' Contact doc' || CAST(doc_id AS VARCHAR)
        |      || '@example.com'
        |      || CASE WHEN doc_id % 3 = 0
        |           THEN ' or doc' || CAST(doc_id AS VARCHAR) || '.alt@mail'
        |             || CAST(doc_id % 7 AS VARCHAR) || '.example.org'
        |           ELSE '' END
        |      || ' call +' || CAST(doc_id % 89 + 1 AS VARCHAR)
        |      || '-' || CAST(doc_id % 900 + 100 AS VARCHAR)
        |      || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
        |      || CASE WHEN doc_id % 5 = 0
        |           THEN ' acct ' || CAST(doc_id * 97 + 123456789 AS VARCHAR)
        |           ELSE '' END AS doctext
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(doctext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(doctext,
        |    '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(doctext, '[0-9]{9,}')) AS BIGINT)
        |    AS n_ids,
        |  md5(regexp_replace(regexp_replace(regexp_replace(doctext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '[0-9]{9,}', '<ID>', 'g')) AS red_md5
        |FROM f ORDER BY doc_id""".stripMargin,

    "l20_sign_pack" -> signPackSql("SELECT vec_id, w0, w1 FROM packed ORDER BY vec_id"),

    "l20b_hamming_knn" -> signPackSql(
      """SELECT p.vec_id,
        |  CAST(bit_count(xor(p.w0, q.qw0)) + bit_count(xor(p.w1, q.qw1))
        |    AS BIGINT) AS hamming
        |FROM packed p,
        |  (SELECT w0 AS qw0, w1 AS qw1 FROM packed WHERE vec_id = 0) q
        |WHERE p.vec_id <> 0
        |ORDER BY hamming, p.vec_id LIMIT 20""".stripMargin)
  )

  // Shared sign-bit packing CTE for the l20 oracles: left-to-right fold,
  // first dim = MSB, BIGINT accumulator (an INT32 fold would overflow).
  private def signPackSql(body: String): String = {
    def word(lo: Int, hi: Int) =
      s"CAST(list_reduce(list_transform(embedding[$lo:$hi], " +
        "x -> CASE WHEN x >= 0 THEN 1::BIGINT ELSE 0::BIGINT END), " +
        "(acc, b) -> acc * 2 + b) AS BIGINT)"
    s"""WITH packed AS (SELECT vec_id, ${word(1, 32)} AS w0,
      |    ${word(33, 64)} AS w1 FROM embeddings)
      |$body""".stripMargin
  }
}
