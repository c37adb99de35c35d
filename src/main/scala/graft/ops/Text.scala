package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §2.5):
  * shingling, tokenization, quality scoring, language-ID heuristic, and
  * document fingerprinting. All are built from codegen'd built-in
  * functions — no UDFs — so they stay inside whole-stage codegen and
  * scale linearly with the scan.
  */
object Text {

  /** Distinct character n-gram shingles, exploded one row per shingle
    * (FIXTURES.md: positions 1..n_chars-n+1). Docs shorter than n yield
    * no rows.
    */
  def shingles(docs: DataFrame, n: Int): DataFrame =
    shingleStream(docs, n).distinct()

  /** [[shingles]] WITHOUT the per-doc dedup — a narrow explode, no
    * shuffle. Use when downstream only needs existence (e.g. the
    * decontamination semi join): skipping the distinct keeps the whole
    * probe side pipelined into the join.
    */
  def shingleStream(docs: DataFrame, n: Int): DataFrame =
    shingleStreamPos(docs, n).select("doc_id", "shingle")

  /** [[shingleStream]] with the 1-based start position retained — feeds
    * span-level queries (L16's redaction map).
    */
  def shingleStreamPos(docs: DataFrame, n: Int): DataFrame =
    docs.filter(col("n_chars") >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1), (col("n_chars") - (n - 1)).cast("int")))
          .as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        expr(s"substring(text, pos, $n)").as("shingle"))

  /** Whitespace-delimited token count (regexp `\S+` matches — identical
    * semantics in Spark and the DuckDB oracle, unlike split()'s trailing-
    * empty handling).
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish token count: words, digits runs, and single punctuation each
    * count as one token (a cheap proxy for subword tokenizers).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Deterministic content-hash dataset split (train/val/test — the
    * holdout assignment every training pipeline needs): the first 4 hex
    * chars of md5(content) are compared LEXICOGRAPHICALLY against
    * fraction boundaries (fixed-width lowercase hex, so string order ==
    * numeric order). Stable across runs, partitionings AND engines — no
    * engine-private hash — and leakage-safe: byte-identical content
    * always lands in the same split regardless of which row carries it.
    * 65536 hash buckets bound the boundary rounding at 1/65536 per split.
    */
  def stableSplit(content: Column,
      fractions: Seq[(String, Double)]): Column = {
    require(fractions.size >= 2 &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val bounds = splitBoundsHex(fractions)
    val h = substring(md5(content), 1, 4)
    fractions.init.zip(bounds).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), bound), rest) =>
      when(h < lit(bound), name).otherwise(rest)
    }
  }

  /** The hex boundaries [[stableSplit]] compares against (exposed so a
    * SQL oracle can embed the same literals): cumulative fractions
    * rounded onto the 65536-bucket grid, one boundary per split except
    * the last (which takes the remainder).
    */
  def splitBoundsHex(fractions: Seq[(String, Double)]): Seq[String] =
    fractions.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(f => f"${math.min(65535L, math.round(f * 65536))}%04x")

  /** Gopher-style quality gate (the Rae et al. 2021 document filters,
    * restricted to the deterministic cross-engine subset): word count
    * bounds, mean word length bounds, minimum stopword fraction. Words
    * are `\S+` runs ([[tokenCount]] semantics); mean word length uses
    * the exact identity sum(len(word)) == len(text with whitespace
    * removed), so both factors are integral and the single division is
    * deterministic. Returns per-doc metrics, one boolean per rule, and
    * the conjunctive keep decision.
    */
  val GopherStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "that", "for",
    "on", "with", "as")

  /** The whitespace set [[gopherFlags]] tokenizes on, spelled as an
    * EXPLICIT character class: Java regex `\s` includes U+000B vertical
    * tab while the DuckDB oracle's RE2 `\s` does not, so a doc containing
    * one would silently hash-diverge between engine and oracle if either
    * side used the shorthand. Both sides embed this exact class.
    */
  val GopherWhitespace: String = " \\t\\n\\x0B\\f\\r"

  def gopherFlags(docs: DataFrame,
      minWords: Int = 5, maxWords: Int = 100000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
      minStopFrac: Double = 0.01): DataFrame = {
    val words = regexp_extract_all(col("text"),
      lit(s"[^$GopherWhitespace]+"), lit(0))
    val stops = array(GopherStopwords.map(lit): _*)
    docs
      .withColumn("n_words", size(words).cast("long"))
      .withColumn("__word_chars",
        length(regexp_replace(col("text"), s"[$GopherWhitespace]", "")))
      .withColumn("n_stop", size(filter(words,
        w => array_contains(stops, lower(w)))).cast("long"))
      // ratios are NULL for zero-word docs (declared so on BOTH engines —
      // Spark's x/0 double division yields NULL while DuckDB's yields
      // inf, so an unguarded division would hash-diverge on an empty or
      // all-whitespace doc) and their flags coalesce to false: an empty
      // doc is dropped, not crashed on
      .withColumn("mean_word_len", when(col("n_words") > 0,
        round(col("__word_chars").cast("double") / col("n_words"), 4)))
      .withColumn("stop_frac", when(col("n_words") > 0,
        round(col("n_stop").cast("double") / col("n_words"), 4)))
      .withColumn("ok_words",
        col("n_words").between(minWords, maxWords))
      .withColumn("ok_word_len", coalesce(
        col("mean_word_len").between(minMeanWordLen, maxMeanWordLen),
        lit(false)))
      .withColumn("ok_stop",
        coalesce(col("stop_frac") >= minStopFrac, lit(false)))
      .withColumn("keep",
        col("ok_words") && col("ok_word_len") && col("ok_stop"))
      .select("doc_id", "n_words", "mean_word_len", "stop_frac",
        "ok_words", "ok_word_len", "ok_stop", "keep")
  }

  /** Vocabulary build + out-of-vocabulary coverage (tokenizer prep): the
    * top-`vocabSize` tokens by global count (ties broken by token, so
    * the vocab boundary is deterministic cross-engine), then per-doc
    * (n_tokens, n_oov, oov_rate) against that vocab — the coverage
    * metric that decides a vocab size before training a tokenizer.
    * Docs with zero tokens yield no row (they have no coverage to
    * measure). One token-count aggregation + a broadcast semi-ish join
    * of the token stream against the tiny vocab; at 100 TB the vocab is
    * the only state that crosses executors.
    */
  def vocabCoverage(docs: DataFrame, vocabSize: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
        .as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("token")).limit(vocabSize)
      .select(col("token"), lit(1).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
  }

  /** Quality-score features: length, punctuation ratio, whitespace ratio,
    * uppercase ratio — rounded to 4 decimals per determinism rules.
    */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val len = col("n_chars").cast("double")
    docs.select(
      col("doc_id"),
      col("n_chars"),
      tokenCount(col("text")).as("n_tokens"),
      round(size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
        .cast("double") / len, 4).as("punct_ratio"),
      round(size(regexp_extract_all(col("text"), lit("\\s"), lit(0)))
        .cast("double") / len, 4).as("space_ratio"),
      round(size(regexp_extract_all(col("text"), lit("[A-Z]"), lit(0)))
        .cast("double") / len, 4).as("upper_ratio"))
  }

  /** N-gram/script language-ID heuristic over {de,en,es,fr,zh}: CJK chars
    * dominate -> zh; otherwise scored by language-marker stopwords and
    * diacritics. Deterministic, engine-only (heuristics have no SQL oracle).
    */
  def langIdGuess(text: Column): Column = {
    val lower = org.apache.spark.sql.functions.lower(text)
    val cjk = size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))
    def hits(words: Seq[String]): Column =
      size(regexp_extract_all(lower,
        lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))
    val de = hits(Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"))
    val en = hits(Seq("the", "and", "is", "of", "to", "in", "that", "with"))
    val es = hits(Seq("el", "la", "los", "las", "es", "y", "que", "una"))
    val fr = hits(Seq("le", "la", "les", "est", "et", "que", "une", "dans"))
    when(cjk * 4 > length(text), lit("zh"))
      .when(de >= en && de >= es && de >= fr, lit("de"))
      .when(en >= es && en >= fr, lit("en"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Greedy sequence packing for training-data assembly: assign documents
    * to token-budget packs of size `cap`, processed in doc_id order within
    * `buckets` independent streams (bucket = doc_id % buckets). A doc
    * opens a new pack when it would overflow the current one; an oversized
    * doc gets a pack of its own. Returns (bucket, doc_id, tc, pack_id).
    *
    * Greedy packing is a sequential fold, so it is parallelized ACROSS
    * buckets and serial within: hash-repartition on the bucket, secondary
    * sort on (bucket, doc_id), then one O(1)-state streaming pass per
    * partition (same pattern as Streams.sessionEdgesBatch — a bucket's
    * docs flow through the iterator, never materialized). At 100 TB,
    * `buckets` scales with the cluster (one task each) and the pass is a
    * single shuffle of (id, token-count) pairs — the text itself never
    * moves.
    */
  def packGreedy(docs: DataFrame, cap: Long, buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        (col("doc_id") % buckets).as("bucket"),
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("tc"))
      .as[(Long, Long, Long)]
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "doc_id")
      .mapPartitions { it =>
        var curB = 0L
        var started = false
        var pack = 0L
        var fill = 0L
        it.map { case (b, id, tc) =>
          if (!started || b != curB) {
            curB = b; started = true; pack = 0L; fill = tc
          } else if (fill + tc > cap) {
            pack += 1L; fill = tc
          } else fill += tc
          (b, id, tc, pack)
        }
      }
      .toDF("bucket", "doc_id", "tc", "pack_id")
  }

  /** L10b — contaminated-doc detection with a bloom-filter runtime
    * prefilter. The held-out shingle set is folded into a compact bloom
    * filter (~1.2 bytes/shingle at 1% fpp vs. the full string set),
    * embedded as a binary literal into a codegen'd `BloomFilterMightContain`
    * probe on the train side's shingle stream; only the ~fpp false
    * positives plus true hits reach the exact string-keyed semi join that
    * removes false positives. The result is EXACTLY the exact pass (L10) —
    * the bloom stage is a pure prefilter, the same pattern Catalyst's
    * `InjectRuntimeFilter` uses for join pruning — so the join's shuffle
    * volume drops from every train shingle to the contaminated sliver.
    * At 100 TB: a 1e8-shingle benchmark set is a ~140 MB filter at 1% fpp
    * — broadcast-sized; beyond that, raise fpp (the exact re-check keeps
    * the result identical regardless).
    *
    * Returns the distinct contaminated `doc_id`s.
    */
  def bloomContaminated(train: DataFrame, bench: DataFrame, n: Int,
      fpp: Double = 0.01): DataFrame = {
    graft.functions.VecFunctions.ensureRegistered(train.sparkSession)
    val benchSh = shingles(bench, n).select("shingle")
    // expectedNumItems upper bound = total bench chars (≥ shingle count);
    // a scalar from the small side, permitted by the scale contract
    val expected = math.max(1L,
      bench.agg(coalesce(sum(col("n_chars")), lit(0L))).head().getLong(0))
    val bf = benchSh.select(xxhash64(col("shingle")).as("h"))
      .stat.bloomFilter("h", expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    shingleStream(train, n)
      .filter(call_function("bloom_might_contain",
        lit(bos.toByteArray), xxhash64(col("shingle"))))
      .join(benchSh.distinct(), Seq("shingle"), "left_semi")
      .select("doc_id").distinct()
  }

  /** L04e — intra-document repetition metrics (the Gopher-style quality
    * rules real pretraining pipelines filter on): duplicate-token and
    * duplicate-bigram fractions, in integer permille so the result is
    * cross-engine hash-stable. Pure per-row HOF work — no shuffle, no
    * UDF; stays inside whole-stage codegen and scales with the scan.
    * Tokens are raw `\S+` runs (NOT lowercased: unicode case folding is
    * the one place Spark and DuckDB may disagree).
    */
  def repetitionFeatures(docs: DataFrame): DataFrame =
    docs
      .withColumn("__toks",
        regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
      .withColumn("__nt", size(col("__toks")).cast("long"))
      .withColumn("__bg", when(col("__nt") >= 2,
          expr("transform(sequence(1, cast(__nt as int) - 1), " +
            "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"))
        .otherwise(expr("cast(array() as array<string>)")))
      .select(
        col("doc_id"),
        col("__nt").as("n_tokens"),
        when(col("__nt") === 0, lit(0L)).otherwise(
            expr("((__nt - size(array_distinct(__toks))) * 1000) div __nt"))
          .as("dup_tok_permille"),
        when(col("__nt") < 2, lit(0L)).otherwise(
            expr("((size(__bg) - size(array_distinct(__bg))) * 1000)" +
              " div size(__bg)"))
          .as("dup_bigram_permille"))

  /** L14 — overlapping fixed-window document chunking (RAG / context-
    * window prep): one chunk of `size` chars starting every `stride`
    * chars (`stride < size` ⇒ overlap of `size - stride`); the last
    * chunk of a doc may be shorter. A generator explode over an integer
    * sequence — narrow, no shuffle, chunk text never leaves the row it
    * came from until downstream asks for it.
    */
  def chunk(docs: DataFrame, size: Int, stride: Int): DataFrame = {
    require(stride >= 1 && size >= stride,
      s"need 1 <= stride <= size, got size=$size stride=$stride")
    docs.filter(col("n_chars") >= 1)
      .select(col("doc_id"),
        explode(sequence(lit(1), col("n_chars").cast("int"), lit(stride)))
          .as("pos"),
        col("text"))
      .select(col("doc_id"),
        expr(s"(pos - 1) div $stride").cast("long").as("chunk_id"),
        col("pos").cast("long").as("pos"),
        expr(s"substring(text, pos, $size)").as("chunk"))
  }

  /** Rolling polynomial fingerprint of the token stream (order-sensitive,
    * collision-resistant enough for grouping): fold tokens with
    * h = (h*31 + md5Long(token) mod 2^31) mod 2^31. The modulus keeps
    * every intermediate below 2^36 — no ANSI-mode long overflow — and
    * the per-token hash is [[graft.Det.md5Long]], so the exact fold
    * replays in DuckDB (l04d is hash-matched, not merely rows-checked).
    * Tokenization uses the explicit [[GopherWhitespace]] class, NOT `\S+`:
    * Java `\s` includes U+000B where RE2's does not, so the shorthand
    * would silently hash-diverge on a doc containing a vertical tab.
    */
  def fingerprint(text: Column): Column = {
    val m = lit(1L << 31)
    aggregate(
      regexp_extract_all(text, lit(s"[^$GopherWhitespace]+"), lit(0)),
      lit(0L),
      (acc, tok) => pmod(acc * lit(31L) + pmod(graft.Det.md5Long(tok), m), m))
  }

  /** L26 — fasttext-shaped linear quality scorer over hashed bigram
    * features: lowercase tokens → adjacent bigrams → feature id =
    * md5Long(bigram) mod `buckets` (the hashing trick — fixed-width
    * feature space, no vocabulary build) → score = Σ weight(fid), an
    * integer. A trained model ships its weight table; the fixture
    * derives weight(fid) = fid % 201 − 100 deterministically so the
    * whole scoring path — hashing, bucketing, lookup, sum — is exercised
    * and EXACT (integer arithmetic end-to-end, md5Long replays in
    * DuckDB). Per-row HOF work: no shuffle, no UDF; the 100 TB cost is
    * one codegen'd pass over the text column, like the other quality
    * gates.
    */
  def hashedLinearScore(text: Column, buckets: Int): Seq[Column] = {
    val toks = regexp_extract_all(lower(text),
      lit(s"[^$GopherWhitespace]+"), lit(0))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit("_"), b))
    val scoreSum = aggregate(bigrams, lit(0L),
      (acc, g) =>
        acc + (pmod(graft.Det.md5Long(g), lit(buckets.toLong)) % 201L
          - 100L))
    Seq(size(bigrams).cast("long").as("n_bigrams"),
      scoreSum.as("score_sum"),
      (scoreSum >= 0).as("keep"))
  }

  /** L29 — hashed n-gram importance weights (the DSIR shape — Xie et
    * al. 2023's "Data Selection with Importance Resampling"): score
    * every document by how much more likely its features are under a
    * TARGET corpus (`isTarget` rows — the curated set you want more of)
    * than under the full raw pool. Features are the same lowercase
    * bigrams → md5Long mod `buckets` hashing trick as
    * [[hashedLinearScore]]; bucket b gets the Laplace-smoothed
    * likelihood ratio, kept EXACT as
    * `score_e6(b) = 10^6·(cnt_t+1)·(N_r+B) div ((cnt_r+1)·(N_t+B))`
    * (DSIR's log-ratio sum is libm- and order-dependent across engines;
    * the linearized ratio sum ranks the same direction and replays
    * bit-for-bit in integer arithmetic — magnitudes stay under 2^63 up
    * to ~10^8 corpus bigrams, beyond which the same formula lifts to
    * decimal(38,0)). Per doc: `w_e6 = Σ_occurrences score_e6(fid)`,
    * with feature-less docs kept at (0, 0).
    *
    * Plan: one explode pass over the text (codegen HOFs), ONE bucket
    * groupBy (B rows out), totals re-aggregated FROM the bucket stats
    * (no second corpus pass), and the ≤B-row score table broadcast back
    * onto the exploded stream for the per-doc sum — at 100 TB the only
    * wide exchange is the doc-keyed final groupBy.
    */
  /** The hashed-bigram feature stream (doc_id, __tgt, fid) shared by
    * [[importanceWeights]] and the streaming stats maintenance (S23).
    */
  def hashedFeatures(docs: DataFrame, isTarget: Column,
      buckets: Int): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")),
      lit(s"[^$GopherWhitespace]+"), lit(0))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit("_"), b))
    docs
      .select(col("doc_id"), isTarget.as("__tgt"), explode(bigrams).as("g"))
      .select(col("doc_id"), col("__tgt"),
        pmod(graft.Det.md5Long(col("g")), lit(buckets.toLong)).as("fid"))
  }

  /** Bucket stats (fid, cnt_r, cnt_t) of a feature stream — ADDITIVE
    * over disjoint doc sets, which is what makes the streaming
    * maintenance (S23) correct: stats of a union == summed stats of
    * the parts.
    */
  def bucketStats(feats: DataFrame): DataFrame =
    feats.groupBy("fid").agg(
      count(lit(1)).as("cnt_r"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("cnt_t"))

  /** The ≤buckets-row score table from bucket stats: per-bucket
    * Laplace-smoothed likelihood ratios in exact e6 integers, totals
    * re-aggregated FROM the stats (no second corpus pass).
    */
  def bucketScores(stats: DataFrame, buckets: Int): DataFrame = {
    val totals = stats.agg(sum("cnt_r").as("n_r"), sum("cnt_t").as("n_t"))
    stats.crossJoin(broadcast(totals))
      .withColumn("score_e6",
        expr(s"1000000 * (cnt_t + 1) * (n_r + $buckets)" +
          s" div ((cnt_r + 1) * (n_t + $buckets))"))
      .select("fid", "score_e6")
  }

  /** Score a doc set against a (fid, score_e6) table: per-doc feature
    * count + weight sum, feature-less docs kept at (0, 0). THE one
    * scoring tail — the one-shot weights, the S23 maintained-stats
    * read, and the streaming spec all call this, so the feature-less
    * default can never diverge between them.
    */
  def weightsFromScores(docs: DataFrame, isTarget: Column, buckets: Int,
      scores: DataFrame): DataFrame = {
    val feats = hashedFeatures(docs, isTarget, buckets)
    val perDoc = feats.join(broadcast(scores), "fid")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("score_e6").as("w_e6"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("w_e6"), lit(0L)).as("w_e6"))
  }

  def importanceWeights(docs: DataFrame, isTarget: Column,
      buckets: Int): DataFrame = {
    val scores = bucketScores(
      bucketStats(hashedFeatures(docs, isTarget, buckets)), buckets)
    weightsFromScores(docs, isTarget, buckets, scores)
  }

  /** L50 — bigram-LM cross-entropy scoring (the CCNet-style quality
    * filter): train an add-one-smoothed word-bigram model on a
    * REFERENCE slice of the corpus, then score EVERY doc by the mean
    * negative log-likelihood of its bigrams under that model —
    * fluent, reference-like text scores low; boilerplate and garble
    * score high. p(w2|w1) = (c2(w1,w2)+1) / (c1(w1)+V), where c1
    * counts w1 as a bigram HEAD (so the conditional normalizes
    * exactly over the V-smoothed vocabulary) and V = |reference
    * vocabulary| over all token positions. Output (doc_id, n_bigrams,
    * xent_r4); xent_r4 is NULL when a doc has no bigram.
    *
    * Scale: the model is reference-sized and BROADCAST twice (bigram
    * and head-count tables); scoring is then map-side only — one
    * explode, two broadcast hash joins, one per-doc aggregate. At
    * 100 TB you'd cap the model at top-K bigrams (the tail is
    * Laplace-smoothed anyway); nothing else changes. Floats appear
    * only in the final ln()s; round(4) on the MEAN absorbs sub-1e-12
    * fold-order noise (the l03 cosine-oracle precedent).
    */
  private val lmToks =
    regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))

  /** (doc_id, w1, w2) bigram stream of a doc table (L50's tokenization:
    * lowercase alphabetic words).
    */
  def bigramPairs(docs: DataFrame): DataFrame = {
    val n1 = greatest(size(lmToks) - 1, lit(0))
    docs
      .select(col("doc_id"),
        explode(zip_with(slice(lmToks, lit(1), n1),
          slice(lmToks, lit(2), n1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** The L50 model STATS of a reference slice, as one tall additive
    * table (kind, a, b, n): kind 'c2' = bigram counts, 'c1' = bigram-
    * HEAD counts, 'tok' = per-token occurrence counts (the vocabulary
    * is its row count). ADDITIVE over disjoint doc sets — what makes
    * the S38 streaming maintenance correct (stats of a union == summed
    * stats of the parts; 'tok' rows sum too, and V = #distinct rows is
    * read off the aggregated table).
    */
  def bigramStats(refDocs: DataFrame): DataFrame = {
    val pairs = bigramPairs(refDocs)
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .select(lit("c2").as("kind"), col("w1").as("a"), col("w2").as("b"),
        col("n"))
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("n"))
      .select(lit("c1").as("kind"), col("w1").as("a"),
        lit(null).cast("string").as("b"), col("n"))
    val tok = refDocs.select(explode(lmToks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .select(lit("tok").as("kind"), col("tok").as("a"),
        lit(null).cast("string").as("b"), col("n"))
    c2.unionByName(c1).unionByName(tok)
  }

  /** Score every doc against aggregated L50 stats (see [[bigramXent]]
    * for the model and the scale notes — both paths share this scorer).
    */
  def bigramXentFromStats(docs: DataFrame, stats: DataFrame): DataFrame = {
    val c2 = stats.filter(col("kind") === "c2")
      .select(col("a").as("w1"), col("b").as("w2"), col("n").as("c2"))
    val c1 = stats.filter(col("kind") === "c1")
      .select(col("a").as("w1"), col("n").as("c1"))
    val v = stats.filter(col("kind") === "tok")
      .agg(count(lit(1)).as("v"))
    val nll = bigramPairs(docs)
      .join(broadcast(c2), Seq("w1", "w2"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        (log(coalesce(col("c1"), lit(0L)) + col("v")) -
          log(coalesce(col("c2"), lit(0L)) + lit(1L))).as("nll"))
    val perDoc = nll.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"), round(avg("nll"), 4).as("xent_r4"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("xent_r4"))
  }

  def bigramXent(docs: DataFrame, isRef: Column): DataFrame =
    bigramXentFromStats(docs, bigramStats(docs.filter(isRef)))

  /** L34 — deterministic text canonicalization, the cleaning pass every
    * hash-keyed step downstream (exact dedup, fingerprints, shingles)
    * assumes has already run: lowercase, control chars → space,
    * whitespace runs collapsed to one space, edges trimmed. Pure
    * codegen'd regexp_replace chain — no UDF — and every rule replays
    * in DuckDB, so canonical-form md5s are engine-portable corpus keys.
    * (Unicode NFC is deliberately OUT: Spark has no codegen
    * normalization primitive, and a JVM Normalizer UDF would make the
    * canonical key engine-private — the exact property this op exists
    * to avoid.)
    */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), lit("[\\p{Cntrl}]"), lit(" ")),
      lit(s"[$GopherWhitespace]+"), lit(" ")))

  /** L31 — largest-remainder apportionment (Hamilton's method): split an
    * integer `budget` across the groups of `counts` (`group`, `n`)
    * exactly proportionally — `floor(budget·n_i/N)` seats each, the
    * `budget − Σfloor` leftovers to the largest integer remainders
    * (`budget·n_i mod N`, ties → group asc). Every quantity is integer:
    * the allocation replays bit-for-bit cross-engine and can neither
    * over- nor under-allocate (Σalloc == budget whenever budget ≤ N·…,
    * exactly). Windows run on the GROUP DIMENSION (|groups| rows), not
    * the data — the global window is dimension-sized by construction.
    * Output: (group, n, alloc).
    */
  def apportion(counts: DataFrame, group: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.orderBy(col("rem").desc, col(group).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts.crossJoin(broadcast(counts.agg(sum("n").as("big_n"))))
      .withColumn("floor_alloc", expr(s"$budget * n div big_n"))
      .withColumn("rem", expr(s"($budget * n) % big_n"))
      .withColumn("extra_seats",
        lit(budget.toLong) - sum("floor_alloc").over(wAll))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col(group).asc)))
      .withColumn("alloc", col("floor_alloc") +
        when(col("rk") <= col("extra_seats"), 1L).otherwise(0L))
      .select(col(group), col("n"), col("alloc"))
  }

  /** L27 — BPE merge TRAINING (Sennrich et al. 2016's corpus half, the
    * piece L22's coverage query assumed pre-trained): learn the first
    * `merges` byte-pair merges over the corpus vocabulary. Classic
    * word-frequency formulation: tokenize (lowercase, the explicit
    * [[GopherWhitespace]] class, alphabetic words only — symbol strings
    * then never collide with any delimiter the oracle replay uses),
    * keep the `vocabWords` most frequent words (deterministic total
    * order: freq desc, word asc), split each into characters, then per
    * round: count adjacent symbol pairs weighted by word frequency, pick
    * the max-count pair (tie-break count desc, p1 asc, p2 asc — a 1-row
    * driver fetch like the codebook collects), and merge it greedily
    * left-to-right in every word via one array fold.
    *
    * Scale shape: the iterated state is the VOCABULARY (distinct words ×
    * frequency), which is millions of rows when the corpus is 100 TB —
    * the corpus itself is touched exactly once by the word count. Each
    * round is one pair-count shuffle over the vocab plus a map-only
    * merge, rounds bounded by `merges`. Exact integer counts and
    * deterministic tie-breaks end-to-end, so the merge table
    * hash-matches an unrolled DuckDB replay (the same fold runs as a
    * list_reduce over single-element lists). Returns one row per learned
    * merge: (round, p1, p2, cnt).
    */
  /** One greedy left-to-right BPE merge pass over a symbol array: every
    * adjacent (p1, p2) becomes p1p2; a just-merged symbol cannot
    * re-merge within the same pass ("aaa" + (a,a) → [aa, a]). Shared by
    * [[bpeTrain]] (vocab side) and [[bpeSubtokenCounts]] (corpus side).
    */
  private def applyMerge(syms: Column, p1: String, p2: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) === 0, array(x))
          .when(element_at(acc, -1) === lit(p1) && x === lit(p2),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(lit(p1 + p2))))
          .otherwise(concat(acc, array(x))))

  /** L28 — BPE ENCODING with a learned merge table ([[bpeTrain]]'s
    * output, applied in training order — the standard BPE apply rule):
    * per document, tokenize (same lowercase alphabetic tokenizer the
    * training side used), split each word to characters, run every
    * merge as one greedy pass, and report (n_words, n_subtokens). The
    * compression ratio n_subtokens/n_words is THE tokenizer-quality
    * metric a vocab build is judged by. Merges arrive as a driver-side
    * Seq (8 rows — the codebook-collect pattern); the per-doc work is a
    * chain of codegen'd HOF folds, no shuffle beyond the final per-doc
    * agg. Zero-token docs survive with zeros (left join from the corpus).
    */
  def bpeSubtokenCounts(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")),
          lit(s"[^$GopherWhitespace]+"), lit(0))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
    val merged = merges.foldLeft(split(col("w"), ""): Column) {
      case (c, (p1, p2)) => applyMerge(c, p1, p2)
    }
    val perDoc = toks.select(col("doc_id"), size(merged).as("n_sub"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subtokens"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_subtokens"), lit(0L)).as("n_subtokens"))
  }

  def bpeTrain(docs: DataFrame, vocabWords: Int, merges: Int): DataFrame = {
    val s = docs.sparkSession
    val toks = docs.select(explode(regexp_extract_all(lower(col("text")),
        lit(s"[^$GopherWhitespace]+"), lit(0))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
    var words = toks.groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc).limit(vocabWords)
      .withColumn("syms", split(col("w"), ""))
      .transform(Checkpoints.cut)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < merges && !exhausted) {
      round += 1
      val n1 = greatest(size(col("syms")) - 1, lit(0))
      val top = words
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), n1), slice(col("syms"), lit(2), n1),
          (a, b) => struct(a.as("p1"), b.as("p2")))).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("p1").asc, col("p2").asc)
        .take(1)
      if (top.isEmpty) exhausted = true
      else {
        val (p1, p2, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((round, p1, p2, cnt))
        words = Checkpoints.cut(
          words.withColumn("syms", applyMerge(col("syms"), p1, p2)))
      }
    }
    import s.implicits._
    learned.toSeq.toDF("round", "p1", "p2", "cnt")
  }

  /** L49 — unigram-style tokenizer TRAINING (the SentencePiece
    * companion to [[bpeTrain]]): start from a LARGE candidate piece set
    * (frequent-word substrings), then run bounded PRUNING rounds —
    * segment the weighted vocabulary with the current pieces, measure
    * per-piece usage, drop the least-used multi-char pieces — the
    * top-down mirror of BPE's bottom-up merges. SentencePiece prunes by
    * EM likelihood loss with a float Viterbi; this trainer pins the
    * deterministic integer skeleton of the same loop so the k-round
    * result hash-matches a DuckDB replay: segmentation is greedy
    * LONGEST-MATCH (WordPiece's MaxMatch — the argmax is unique because
    * equal-length matches at one position are the same string), usage
    * is the freq-weighted piece count, pruning order is
    * (usage asc, piece asc), and single characters are never pruned
    * (coverage can never break).
    *
    * Scale shape (the l27 discipline): the corpus is scanned ONCE —
    * distributed — for the word-frequency table; everything after
    * operates on the top-`vocabWords` slice, which is BOUNDED BY
    * CONSTRUCTION (limit + checkpoint), so the rounds run driver-local
    * over ≤ vocabWords words × ≤ candidates pieces — exactly how
    * SentencePiece itself trains (the unbounded corpus reduces to a
    * bounded word-frequency table; the SimIndex codebook precedent for
    * bounded driver state).
    *
    * Returns the surviving pieces with their FINAL usage:
    * (piece, is_single, usage), usage recomputed against the final set.
    */
  def unigramTrain(docs: DataFrame, vocabWords: Int, maxPieceLen: Int,
      candidates: Int, rounds: Int, prunePerRound: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs.select(explode(regexp_extract_all(lower(col("text")),
        lit(s"[^$GopherWhitespace]+"), lit(0))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
    val words = toks.groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc).limit(vocabWords)
      .transform(Checkpoints.cut)
    val wordRows = words.as[(String, Long)].collect()
    // candidate multi-char pieces: every substring of length 2..L of a
    // vocab word, weighted by word freq; top `candidates` by
    // (cnt desc, piece asc). Singles = every char seen (never pruned).
    val subs = words.select(col("freq"),
        explode(flatten(transform(
          sequence(lit(1), length(col("w"))),
          i => transform(sequence(lit(2), lit(maxPieceLen)),
            l => when(i + l - 1 <= length(col("w")),
              col("w").substr(i, l)))))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy("p").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("p").asc).limit(candidates)
    val singles = wordRows.flatMap(_._1.split("")).distinct.toSet
    var multi = subs.select("p").as[String].collect().toVector

    def maxMatch(w: String, pieces: Set[String]): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < w.length) {
        var l = math.min(maxPieceLen, w.length - i)
        while (l > 1 && !pieces(w.substring(i, i + l))) l -= 1
        out += w.substring(i, i + l)
        i += l
      }
      out.result()
    }

    def usageOf(ms: Vector[String]): Map[String, Long] = {
      val pieces = singles ++ ms
      wordRows.toSeq
        .flatMap { case (w, f) => maxMatch(w, pieces).map(_ -> f) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }

    for (_ <- 1 to rounds) {
      val usage = usageOf(multi)
      multi = multi
        .sortBy(p => (usage.getOrElse(p, 0L), p))
        .drop(prunePerRound)
    }
    val fin = usageOf(multi)
    val out = (multi.map(p => (p, false)) ++
        singles.toSeq.map(c => (c, true)))
      .map { case (p, sng) => (p, sng, fin.getOrElse(p, 0L)) }
    s.createDataFrame(out).toDF("piece", "is_single", "usage")
  }

  /** L25 — PII scrubbing patterns, deliberately restricted to syntax
    * Java regex and RE2 interpret identically (explicit classes, bounded
    * quantifiers; no \b, no \d shorthand — same portability discipline
    * as [[GopherWhitespace]]). Emails then dashed phone numbers then
    * bare long digit runs; the order matters only if a pattern could
    * match inside an earlier replacement, which `<EMAIL>`/`<PHONE>`
    * tokens (letter-only) cannot.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val IdRe = "[0-9]{9,}"

  /** L52's read: per-document kept-text accounting after cutting every
    * span covered by a shingle in `dup` (a one-column `shingle` set —
    * the cross-document duplicate index, built one-shot by l52 or
    * continuously by s40's maintained partials). Every document
    * appears; zero-span docs keep everything. Plan: shingle explode →
    * semi join against the index → T19 interval coalescing on character
    * offsets → one doc-keyed agg + a left join to the corpus.
    */
  def spanCutStats(d: DataFrame, dup: DataFrame): DataFrame = {
    val sh = shingleStreamPos(d, 20)
    val iv = sh.join(dup.select("shingle"), Seq("shingle"), "left_semi")
      .select(col("doc_id"), col("pos").as("dup_s"),
        (col("pos") + 20).as("dup_e"))
    val spans = Temporal.coalesceIntervals(iv, Seq("doc_id"),
        "dup_s", "dup_e", "dup_s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans_cut"),
        sum(col("span_end") - col("span_start")).as("chars_cut"))
    d.select("doc_id", "n_chars")
      .join(spans, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("n_spans_cut"), lit(0L)).as("n_spans_cut"),
        coalesce(col("chars_cut"), lit(0L)).as("chars_cut"),
        (col("n_chars") - coalesce(col("chars_cut"), lit(0L)))
          .as("kept_chars"))
  }

  /** L54's selection: the docs chosen by the token-budget greedy rule —
    * global (alpha-density score desc, doc_id) prefix with Σ tokens ≤
    * ⌊total / budgetDenom⌋ — via the two-pass bucket-threshold plan
    * (cumulate over the bounded score domain, semi-join whole buckets,
    * doc_id-ordered prefix inside the one boundary bucket; never a
    * global single-partition cumsum). Input needs (doc_id, source,
    * n_chars, text); returns the selected rows with (n_toks, score)
    * attached.
    */
  def budgetSelect(d0: DataFrame, budgetDenom: Long): DataFrame = {
    val d = scored(d0)
    selectAgainstBuckets(d, scoreBuckets(d), budgetDenom)
  }

  /** The selection's per-doc features: whitespace token count +
    * alpha-density score (shared by the one-shot l54 and s41's
    * maintained form — the sessionStep discipline for scoring).
    */
  def scored(d0: DataFrame): DataFrame = d0
    .select(col("doc_id"), col("source"), col("n_chars"), col("text"),
      size(regexp_extract_all(lower(col("text")),
        lit(s"[^$GopherWhitespace]+"), lit(0))).cast("long").as("n_toks"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0)))
        .cast("long").as("n_alpha"))
    // greatest(n_chars, 1): an n_chars=0 doc scores 0 (n_alpha is 0 on
    // empty text) instead of silently dropping via NULL div — and the
    // DuckDB oracle's `//` would RAISE on 0, so the guard keeps the two
    // engines aligned on corpora with empty docs.
    .withColumn("score",
      expr("1000000 * n_alpha div greatest(n_chars, 1L)"))
    .transform(Checkpoints.cut) // read by both passes

  /** The selection's pass-1 aggregate: tokens per score bucket (the
    * bounded dimension s41 maintains as batch-stamped partials).
    */
  def scoreBuckets(d: DataFrame): DataFrame =
    d.groupBy("score").agg(sum("n_toks").as("btoks"))

  /** Pass 2 of the budget selection against an EXTERNALLY SUPPLIED
    * bucket histogram (one-shot or maintained): budget = Σbtoks div
    * budgetDenom, whole buckets above the boundary semi-join in, the
    * boundary bucket takes a doc_id-ordered prefix of its remainder.
    */
  def selectAgainstBuckets(d: DataFrame, buckets0: DataFrame,
      budgetDenom: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = buckets0.agg(
      expr(s"sum(btoks) div $budgetDenom").as("budget"))
    val buckets = buckets0
      .withColumn("cum_before", coalesce(sum("btoks").over(
        Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(budget))
    val fullBuckets = buckets
      .filter(col("cum_before") + col("btoks") <= col("budget"))
      .select("score")
    val boundary = buckets
      .filter(col("cum_before") <= col("budget") &&
        col("cum_before") + col("btoks") > col("budget"))
      .select(col("score").as("bscore"),
        (col("budget") - col("cum_before")).as("rem"))
    val selFull = d.join(fullBuckets, Seq("score"), "left_semi")
    val keep = Seq("doc_id", "source", "n_chars", "text", "n_toks",
      "n_alpha", "score")
    val selBoundary = d.join(broadcast(boundary),
        col("score") === col("bscore"))
      .withColumn("icum", sum("n_toks").over(
        Window.partitionBy("bscore").orderBy("doc_id")))
      .filter(col("icum") <= col("rem"))
      .select(keep.head, keep.tail: _*)
    selFull.select(keep.head, keep.tail: _*).unionByName(selBoundary)
  }

  /** Per-row PII redaction: counts of each pattern in `text` plus the
    * scrubbed string. Pure per-row codegen'd regex work — no shuffle, no
    * UDF; at 100 TB this pipelines inside the scan's whole-stage-codegen
    * like any other projection.
    */
  def piiRedact(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
    regexp_count(text, lit(PhoneRe)).cast("long").as("n_phones"),
    regexp_count(text, lit(IdRe)).cast("long").as("n_ids"),
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IdRe, "<ID>").as("redacted"))
}
