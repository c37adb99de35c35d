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
    docs.filter(col("n_chars") >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1), (col("n_chars") - (n - 1)).cast("int")))
          .as("pos"),
        col("text"))
      .select(col("doc_id"), expr(s"substring(text, pos, $n)").as("shingle"))
      .distinct()

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

  /** Rolling polynomial fingerprint of the token stream (order-sensitive,
    * collision-resistant enough for grouping): fold tokens with
    * h = (h*31 + xxhash64(token) mod 2^31) mod 2^31. The modulus keeps
    * every intermediate below 2^36 — no ANSI-mode long overflow.
    */
  def fingerprint(text: Column): Column = {
    val m = lit(1L << 31)
    aggregate(
      regexp_extract_all(text, lit("\\S+"), lit(0)),
      lit(0L),
      (acc, tok) => pmod(acc * lit(31L) + pmod(xxhash64(tok), m), m))
  }
}
