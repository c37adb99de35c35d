package graft

import graft.ops.Text
import org.apache.spark.sql.functions._

/** Unit gates for the training-data text ops added in round 4. */
class TextOpsSpec extends SparkSpecBase {

  private def mkDocs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
  }

  test("packGreedy: overflow opens a new pack, oversized doc packs alone") {
    // one bucket; token counts 3, 3, 3, 10, 2 with cap 6:
    // [3,3] -> pack 0, [3] -> pack 1 (3+3+3>6), [10] -> pack 2 (oversized,
    // alone), [2] -> pack 3 (2 after the oversized one: 10+2>6)
    val d = mkDocs(
      (0L, "a b c"), (8L, "d e f"), (16L, "g h i"),
      (24L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (32L, "x y"))
    val out = Text.packGreedy(d, cap = 6L, buckets = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 0L), (8L, 0L), (16L, 1L), (24L, 2L), (32L, 3L)))
  }

  test("packGreedy: buckets pack independently and fills reset") {
    // docs alternate buckets 0/1 (doc_id % 2); each bucket's fold must
    // restart its pack ids at 0 and never see the other's fill
    val d = mkDocs(
      (0L, "a b c d"), (1L, "p q r s"),
      (2L, "e f g"), (3L, "t u v"),
      (4L, "h i"), (5L, "w x"))
    val out = Text.packGreedy(d, cap = 5L, buckets = 2)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(3))).toSet
    // bucket 0: 4 tok -> p0; 3 tok (4+3>5) -> p1; 2 tok (3+2<=5) -> p1
    // bucket 1: same shape
    assert(out == Set((0L, 0L, 0L), (2L, 0L, 1L), (4L, 0L, 1L),
      (1L, 1L, 0L), (3L, 1L, 1L), (5L, 1L, 1L)))
  }

  test("bloom decontamination == exact pass; prefilter actually prunes") {
    val d = Tables.load(spark, sfDir, "documents")
    val bench = d.filter(col("doc_id") % 20 === 0)
    val train = d.filter(col("doc_id") % 20 =!= 0)
    val benchSh = Text.shingles(bench, 20).select("shingle").distinct()
    val exact = Text.shingleStream(train, 20)
      .join(benchSh, Seq("shingle"), "left_semi")
      .select("doc_id").distinct()
      .orderBy("doc_id").collect().toSeq
    val bloom = Text.bloomContaminated(train, bench, 20)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact && exact.nonEmpty)

    // the probe itself must prune: of the train shingle stream, only the
    // contaminated sliver plus ~fpp false positives may survive the
    // filter (here: well under a tenth of the stream)
    graft.functions.VecFunctions.ensureRegistered(spark)
    val bf = benchSh.select(xxhash64(col("shingle")).as("h"))
      .stat.bloomFilter("h", 100000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val stream = Text.shingleStream(train, 20)
    val total = stream.count()
    val survivors = stream.filter(call_function("bloom_might_contain",
      lit(bos.toByteArray), xxhash64(col("shingle")))).count()
    assert(survivors > 0 && survivors < total / 10,
      s"bloom prefilter did not prune: $survivors of $total")
  }

  test("packGreedy: packs never exceed cap except singleton oversized docs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val packs = Text.packGreedy(docs, cap = 256L, buckets = 8)
      .groupBy("bucket", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("tc").as("tok"))
      .collect()
    assert(packs.nonEmpty)
    packs.foreach { r =>
      assert(r.getLong(2) == 1L || r.getLong(3) <= 256L,
        s"multi-doc pack over budget: $r")
    }
  }

  test("chunking invariants: stride==size reassembles, overlap covers") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, "a"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    // no overlap: concatenating chunks in order reassembles the text
    val flat = Text.chunk(docs, size = 4, stride = 4)
      .orderBy("doc_id", "chunk_id").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getString(3)).mkString }
    assert(flat == Map(1L -> "abcdefghij", 2L -> "abc", 3L -> "a"))
    // overlap: every chunk but the last has full size; consecutive chunks
    // share exactly size-stride chars; every char position is covered
    val ov = Text.chunk(docs, size = 4, stride = 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    ov.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      val n = docs.filter(col("doc_id") === id).head().getLong(2)
      sorted.foreach { case (_, _, pos, c) =>
        assert(c.length == math.min(4L, n - pos + 1), s"doc $id pos $pos") }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._3 + 2)
          assert(a._4.drop(2) == b._4.take(a._4.length - 2))
        case _ =>
      }
      val text = docs.filter(col("doc_id") === id)
        .head().getString(1)
      val covered = sorted.flatMap(r =>
        (r._3.toInt - 1) until math.min(r._3.toInt - 1 + 4, text.length)).toSet
      assert(covered == text.indices.toSet, s"doc $id coverage hole")
    }
  }

  test("bigramXent: hand-computed smoothed model, OOV doc, no-bigram doc") {
    // reference = {0, 5}: tokens the/cat/sat + the/cat/ran -> V = 4,
    // c2 = {(the,cat):2, (cat,sat):1, (cat,ran):1}, c1 = {the:2, cat:2}
    // doc 1 == ref text: -ln(3/6), -ln(2/6) -> mean = ln(6)/2 = 0.8959
    // doc 2 all-OOV:     -ln(1/(0+4)) twice  -> mean = ln(4)  = 1.3863
    // doc 3 one token:   no bigrams -> n = 0, xent NULL
    val d = mkDocs((0L, "the cat sat"), (5L, "the cat ran"),
      (1L, "the cat sat"), (2L, "zz qq pp"), (3L, "x"))
    val got = Text.bigramXent(d, isRef = col("doc_id") % 5 === 0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toList
    assert(got.map(t => (t._1, t._2)) ==
      List((0L, 2L), (1L, 2L), (2L, 2L), (3L, 0L), (5L, 2L)))
    assert(got(0)._3 == 0.8959 && got(1)._3 == 0.8959)
    assert(got(2)._3 == 1.3863)   // OOV head falls back to ln(V)-mass
    assert(got(3)._3.isNaN)
    // the quality signal: reference-like text scores strictly lower
    assert(got(1)._3 < got(2)._3)
  }

  test("repetition features: degenerate and hand-computed docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),         // no tokens
      (2L, "a"),        // single token, no bigrams
      (3L, "a a a a"),  // all-duplicate: tok 750‰, bigram (3-1)*1000//3
      (4L, "a b a b"),  // alternating: tok 500‰, bigram (3-2)*1000//3
      (5L, "w x y z")   // all distinct: 0‰, 0‰
    ).toDF("doc_id", "text")
    val got = Text.repetitionFeatures(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      1L -> (0L, 0L, 0L),
      2L -> (1L, 0L, 0L),
      3L -> (4L, 750L, 666L),
      4L -> (4L, 500L, 333L),
      5L -> (4L, 0L, 0L)))
  }

  test("stableSplit: deterministic, leakage-safe, fractions roughly honored") {
    import spark.implicits._
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    assert(Text.splitBoundsHex(fr) == Seq("cccd", "e666"))
    intercept[IllegalArgumentException](
      Text.stableSplit(col("x"), Seq("a" -> 0.5, "b" -> 0.4)))
    // duplicate content MUST land in the same split (anti-leakage), and
    // reruns must agree
    val docs = (1 to 2000).map(i => (i.toLong, s"doc number ${i % 1000}"))
      .toDF("doc_id", "text")
      .withColumn("split", Text.stableSplit(col("text"), fr))
    val byText = docs.groupBy("text")
      .agg(count_distinct(col("split")).as("k")).agg(max("k")).head.getLong(0)
    assert(byText == 1L, "identical text split across partitions")
    val counts = docs.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    // 1000 distinct texts at 80/10/10: allow generous binomial slack
    assert(counts("train") > 1400 && counts("train") < 1800, counts.toString)
    assert(counts("val") > 80 && counts("test") > 80, counts.toString)
    assert(docs.collect().toSeq == docs.collect().toSeq)
  }

  test("vocabCoverage: deterministic vocab boundary, exact OOV counts") {
    import spark.implicits._
    // counts: aa×3, bb×2, cc×2, dd×1 — vocabSize=2 must take {aa, bb}
    // (cc ties bb on count; 'bb' < 'cc' wins the boundary)
    val docs = Seq(
      (1L, "aa bb aa cc"),
      (2L, "aa bb cc dd")).toDF("doc_id", "text")
    val got = Text.vocabCoverage(docs, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      1L -> (4L, 1L, 0.25),   // cc is OOV
      2L -> (4L, 2L, 0.5)))   // cc, dd OOV
    // a doc with no [a-z] tokens yields no row
    val empty = Seq((9L, "123 456 !!!")).toDF("doc_id", "text")
    assert(Text.vocabCoverage(empty, 2).collect().isEmpty)
  }

  test("piiRedact: counts and scrub on hand-built strings, clean text untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail a.b-c_d%e+f@sub.example.co.uk now"),
      (2L, "call +1-555-0123 or 44-123-4567 done"),
      (3L, "acct 123456789 id 98765432109876 short 12345678"),
      (4L, "x@y.io +1-555-0123 123456789 together"),
      (5L, "no pii here at all")
    ).toDF("doc_id", "text")
    val got = rows
      .select(col("doc_id") +: graft.ops.Text.piiRedact(col("text")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == (1L, 0L, 0L, "mail <EMAIL> now"))
    assert(got(2L) == (0L, 2L, 0L, "call <PHONE> or <PHONE> done"))
    // 8-digit run is below the >=9 ID floor and survives
    assert(got(3L) == (0L, 0L, 2L, "acct <ID> id <ID> short 12345678"))
    assert(got(4L) == (1L, 1L, 1L, "<EMAIL> <PHONE> <ID> together"))
    assert(got(5L) == (0L, 0L, 0L, "no pii here at all"))
  }

  test("gopherFlags: each rule flips on its own boundary case") {
    import spark.implicits._
    val docs = Seq(
      // 6 words, mean len 17/6=2.8333, stop 3/6 -> keep
      (1L, "the cat sat on the mat"),
      // 3 words < minWords -> ok_words false
      (2L, "the tiny doc"),
      // no stopwords -> ok_stop false
      (3L, "quick brown foxes jump high fences quickly"),
      // mean word length too long -> ok_word_len false
      (4L, "extraordinarily incomprehensible the pseudopseudohypoparathyroidism antidisestablishmentarianism"))
      .toDF("doc_id", "text")
    val got = Text.gopherFlags(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
      .toMap
    assert(got(1L) == ((true, true, true, true)))
    assert(got(2L) == ((false, true, true, false)))
    assert(got(3L) == ((true, true, false, false)))
    assert(got(4L)._2 == false)
    val m = Text.gopherFlags(docs).filter(col("doc_id") === 1).head()
    assert(m.getLong(1) == 6L && m.getDouble(2) == 2.8333)
    // zero-word doc: ratios NULL (declared, not divided), flags false —
    // dropped, never a divide-by-zero divergence between engines
    val empty = Text.gopherFlags(
      Seq((9L, "   ")).toDF("doc_id", "text")).head()
    assert(empty.getLong(1) == 0L && empty.isNullAt(2) && empty.isNullAt(3))
    assert(!empty.getBoolean(4) && !empty.getBoolean(5) &&
      !empty.getBoolean(6) && !empty.getBoolean(7))
    // U+000B vertical tab separates words — the explicit GopherWhitespace
    // class pins this on BOTH engines (Java \s includes \x0B, RE2's does
    // not; the shorthand would hash-diverge engine vs oracle here)
    val vt = Text.gopherFlags(
      Seq((10L, "the cat\u000Bsat on the mat")).toDF("doc_id", "text")).head()
    assert(vt.getLong(1) == 6L, s"vertical tab must split words: $vt")
  }

  test("hashedLinearScore: empty, 1-token, and hand-hashed bigram docs") {
    // Independent JVM replication of the scoring path: md5 hex → first
    // 15 chars as a long → mod 4096 buckets → weight fid % 201 − 100.
    // Not circular: java.security.MessageDigest, not the Spark column.
    def weight(bigram: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bigram.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val fid = java.lang.Long.parseLong(hex, 16) % 4096L
      fid % 201L - 100L
    }
    val d = mkDocs(
      (0L, ""),                    // no tokens -> 0 bigrams, score 0, keep
      (1L, "solo"),                // 1 token -> 0 bigrams, score 0, keep
      (2L, "Hello World again"))   // lowercased bigrams, hand-hashed
    val out = d.select(col("doc_id") +:
        Text.hashedLinearScore(col("text"), buckets = 4096): _*)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val s2 = weight("hello_world") + weight("world_again")
    assert(out(0) == ((0L, 0L, 0L, true)))
    assert(out(1) == ((1L, 0L, 0L, true)))
    assert(out(2) == ((2L, 2L, s2, s2 >= 0)))
  }

  test("importanceWeights: all-target ratio is exactly 1e6; target pulls up") {
    val d = mkDocs(
      (0L, "spark table scan"),   // en-ish: bigrams spark_table table_scan
      (1L, "spark table scan"),
      (2L, "der tisch hier"),     // raw-only bigrams
      (3L, "solo"),               // 1 token -> featureless, kept at (0,0)
      (4L, ""))                   // empty -> (0,0)
    // With EVERY doc in the target, cnt_t == cnt_r and n_t == n_r, so
    // each bucket's ratio collapses to exactly 10^6 — w_e6 must equal
    // n_feats * 1e6 with no rounding residue anywhere.
    val all = Text.importanceWeights(d, isTarget = lit(true), buckets = 64)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(all.toSeq == Seq((0L, 2L, 2000000L), (1L, 2L, 2000000L),
      (2L, 2L, 2000000L), (3L, 0L, 0L), (4L, 0L, 0L)))
    // Target = docs 0/1: their bigrams are target-frequent, doc 2's are
    // target-absent — doc 0 must outscore doc 2, and identical docs tie.
    val sel = Text.importanceWeights(d, isTarget = col("doc_id") < 2,
        buckets = 4096)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(sel(0)._2 == sel(1)._2)
    assert(sel(0)._2 > sel(2)._2)
  }

  test("apportion: exact budget, within-one-seat quotas, remainder ranking") {
    import spark.implicits._
    def run(counts: Seq[(String, Long)], budget: Int): Map[String, Long] =
      Text.apportion(counts.toDF("source", "n"), "source", budget)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // classic: quotas 4.29/2.86/2.86 (N=7, K=10) -> floors 4/2/2, two
    // leftover seats to the largest remainders (b and c, rem 6/7 each,
    // tie -> both get one; a's rem 2/7 misses out)
    assert(run(Seq(("a", 3L), ("b", 2L), ("c", 2L)), 10) ==
      Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // Σalloc == budget and every group within one seat of its quota
    val rnd = new scala.util.Random(53)
    for (_ <- 1 to 5) {
      val counts = (0 until 8).map(i => (s"s$i", 1L + rnd.nextInt(500)))
      val budget = 1 + rnd.nextInt(200)
      val got = run(counts, budget)
      assert(got.values.sum == budget)
      val n = counts.map(_._2).sum
      counts.foreach { case (g, c) =>
        val floorQ = budget.toLong * c / n
        assert(got(g) == floorQ || got(g) == floorQ + 1)
      }
    }
    // degenerate: budget 0 -> all zeros
    assert(run(Seq(("a", 5L), ("b", 5L)), 0).values.forall(_ == 0L))
  }

  test("l30 dup spans: >= 20 chars, disjoint per doc, inside the doc") {
    val rows = graft.queries.LlmQueries.queries("l30_dup_spans")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    // span geometry: at least one shingle long, at most n * shingle len
    rows.foreach { case (_, s, e, n) =>
      assert(e - s >= 20 && n >= 1 && e - s <= 20 * n)
    }
    // spans per doc are disjoint with a strict gap (else they'd merge)
    rows.groupBy(_._1).values.foreach { sp =>
      sp.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(e1 < s2)
        case _ =>
      }
    }
    // every span sits inside its document (1-based, end exclusive)
    val nchars = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (d, s, e, _) =>
      assert(s >= 1 && e <= nchars(d) + 1)
    }
  }

  test("canonicalText: case, control chars, runs, trim — and idempotent") {
    import spark.implicits._
    val d = Seq((0L, "  Hello\t\nWORLD  x\u0001y  "), (1L, ""),
      (2L, "a"), (3L, "\u0002\u0003"))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        Text.canonicalText(col("text")).as("c"),
        Text.canonicalText(Text.canonicalText(col("text"))).as("cc"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got(0)._2 == "hello world x y")
    assert(got(1)._2 == "" && got(2)._2 == "a" && got(3)._2 == "")
    // canonicalization is a projection: applying it twice changes nothing
    got.foreach { case (_, c, cc) => assert(c == cc) }
  }

  test("l33 keep-list: one keep per cluster, canonical is the longest") {
    val rows = graft.queries.LlmQueries.queries("l33_dedup_keeplist")(
      spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val nchars = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).values.foreach { members =>
      // every cluster member arrived via a near-dup pair -> >= 2 docs
      assert(members.length >= 2)
      val keeps = members.filter(_._3)
      assert(keeps.length == 1)
      val k = keeps.head._1
      members.foreach { case (d, _, _) =>
        assert(nchars(d) < nchars(k) ||
          (nchars(d) == nchars(k) && d >= k))
      }
    }
  }

  test("spanCutStats: identical twins cut fully, sub-shingle docs keep " +
      "everything, partial overlap cuts only the shared run") {
    val base = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMN" // 50
    val docs = mkDocs(
      1L -> base, 2L -> base,          // identical twins: cut everything
      3L -> "short",                   // < 20 chars: no shingles at all
      4L -> "zzzzyyyyxxxxwwwwvvvvuuuuttttssssrrrrqqqq",  // unique
      5L -> (base.take(30) + "QQQQQQQQQQQQQQQQQQQQQQ")) // shares a prefix
    val dup = Text.shingleStreamPos(docs, 20)
      .select("doc_id", "shingle").distinct()
      .groupBy("shingle").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("shingle")
    val got = Text.spanCutStats(docs, dup)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // twins: every position is in a cross-doc shingle -> one maximal
    // span covering the doc, kept 0
    assert(got(1L) == ((1L, 50L, 0L)) && got(2L) == ((1L, 50L, 0L)))
    // too short for a shingle and fully unique: kept everything
    assert(got(3L) == ((0L, 0L, 5L)))
    assert(got(4L) == ((0L, 0L, 40L)))
    // prefix sharer: shingles at positions 1..11 of doc 5 match doc
    // 1/2's prefix (30-char shared run -> 11 shingle starts), so the
    // cut span is [1, 31) = 30 chars; the Q-tail survives
    assert(got(5L) == ((1L, 30L, 22L)))
    // doc 1's mirrored cut: the shared 30-prefix also marks doc 1's
    // first 11 shingles... (it is fully covered by the twin anyway)
  }

  test("scored: an empty (n_chars = 0) doc scores 0 and stays selectable, " +
      "never NULL-dropped") {
    import spark.implicits._
    val d = Seq((1L, "web", "hello world five tokens here"),
        (2L, "web", ""),
        (3L, "web", "1234 5678")) // digits: n_alpha = 0, score 0
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")))
    val sc = Text.scored(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
    // ADVICE r14: 1000000*n_alpha div n_chars on n_chars=0 yields NULL
    // (doc silently excluded); the greatest(n_chars,1) guard pins 0.
    assert(sc(2L) == 0L && sc(3L) == 0L && sc(1L) > 0L)
    // and the empty doc participates in the budget selection (a huge
    // denominator selects only down to... here denom 1 selects all 3).
    val sel = Text.budgetSelect(d, budgetDenom = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel == Set(1L, 2L, 3L))
  }

  test("bpeTrain: known merge sequence, greedy overlap, early exhaustion") {
    def merges(text: String, n: Int) =
      Text.bpeTrain(mkDocs((0L, text)), vocabWords = 10, merges = n)
        .orderBy("round")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    // vocab {aaab: 2, ab: 1}: round 1 merges (a,a) cnt 4 (two per aaab);
    // round 2 (a,b) cnt 3 (aaab's tail + ab); round 3 (aa,ab) cnt 2;
    // then every word is a single symbol -> exhausted before merges=5
    assert(merges("aaab aaab ab", 5) == Seq(
      (1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)))
    // greedy left-to-right: "aaa" + (a,a) -> [aa, a], NOT [a, aa] —
    // round 2's top pair must therefore be (aa, a)
    assert(merges("aaa aaa", 4) == Seq(
      (1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  test("bpeSubtokenCounts: learned merges compress, OOV words still merge") {
    val d = mkDocs((0L, "aaab aaab ab"), (1L, "aabx"), (2L, ""))
    val learned = Text.bpeTrain(d.filter(col("doc_id") === 0), 10, 5)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(learned == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val out = Text.bpeSubtokenCounts(d, learned).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 0: every word collapses to ONE vocab symbol (full compression)
    assert(out(0) == ((0L, 3L, 3L)))
    // doc 1: OOV word aabx -> [aa, b, x] — merge 1 applies, 2/3 don't
    assert(out(1) == ((1L, 1L, 3L)))
    // doc 2: no tokens -> zeros, not a dropped row
    assert(out(2) == ((2L, 0L, 0L)))
  }

  test("winnowing invariants: window coverage + shared-run guarantee") {
    // The two properties that make winnowing (l44/l45/l46) a sound
    // near-dup primitive, asserted on the REGISTRY entry end-to-end:
    // (1) coverage — every window of W=4 consecutive 3-gram positions
    // contains a selected fingerprint; (2) guarantee — documents
    // sharing a token run of >= k+W-1 = 6 share a fingerprint VALUE.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toFile
    dir.deleteOnExit()
    val rnd = new scala.util.Random(17)
    def words(n: Int): String =
      Seq.fill(n)("w" + rnd.nextInt(400)).mkString(" ")
    val shared = words(12) // >= 6-token shared run between docs 1 and 2
    val docsRows = Seq(
      (1L, words(40) + " " + shared + " " + words(40)),
      (2L, words(25) + " " + shared + " " + words(60)),
      (3L, words(90)), // unrelated
      (4L, "a b")) // < k tokens: no grams, no fingerprints, no crash
    docsRows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val sel = SparkEntry.queries("l44_winnow")(spark, dir.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = sel.groupBy(_._1)
    assert(!byDoc.contains(4L))
    for ((id, text) <- docsRows if id != 4L) {
      val nGrams = text.split(" ").length - 2
      val poss = byDoc(id).map(_._2).toSet
      // coverage: every full window [p-3, p] holds a selection
      for (p <- 3 until nGrams)
        assert((p - 3 to p).exists(q => poss.contains(q.toLong)),
          s"doc $id window at $p")
      // selection is sparse, not everything
      assert(poss.size < nGrams)
    }
    val fp1 = byDoc(1L).map(_._3).toSet
    val fp2 = byDoc(2L).map(_._3).toSet
    val fp3 = byDoc(3L).map(_._3).toSet
    // guarantee: the 12-token shared run forces shared fingerprints
    assert((fp1 & fp2).nonEmpty)
    // unrelated doc shares (essentially) nothing: below l45's >= 3 gate
    assert((fp1 & fp3).size < 3 && (fp2 & fp3).size < 3)
  }

  test("l49 unigramTrain: singles survive, prune count exact, usage favors frequent substrings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("unigram").toFile
    // 'abab' dominates: its substrings (ab, ba, aba, bab, abab) should
    // out-use 'cd''s after pruning; chars a,b,c,d are the singles
    val rows = Seq(
      (1L, ("abab " * 30) + "cd", 1L),
      (2L, "abab abab cd cd", 2L))
    rows.toDF("doc_id", "text", "x").drop("x")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val docs = spark.read.parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val out = Text.unigramTrain(docs, vocabWords = 10, maxPieceLen = 4,
        candidates = 6, rounds = 2, prunePerRound = 2)
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    val (singles, multi) = out.partition(_._2)
    // every char of the vocab words survives as a single
    assert(singles.map(_._1).toSet == Set("a", "b", "c", "d"))
    // exactly candidates - rounds*prunePerRound multi pieces remain
    assert(multi.length == 6 - 2 * 2)
    // 'abab' (freq 32) maxmatches to one 4-char piece per occurrence —
    // the top surviving piece by usage must be 'abab' with usage 32
    assert(multi.maxBy(m => (m._3, m._1)) == (("abab", false, 32L)))
    // a piece never matched under MaxMatch shows usage 0 or was pruned;
    // all survivors are genuine substrings of the vocab words
    assert(multi.forall(m => "abab".contains(m._1) || "cd".contains(m._1)))
  }

  test("bounded-bucket LSH candidates: hot buckets emit an O(d) hub " +
      "star with identical candidate-graph components; capped clusters " +
      "REFINE uncapped (never falsely merge) and EQUAL uncapped on a " +
      "boilerplate clique family; TVF max_bucket wired") {
    import spark.implicits._
    graft.functions.VecFunctions.ensureRegistered(spark)
    // ---- synthetic hot bucket: the provable part of the contract.
    // One band table: bucket A holds 10 docs (hot under cap 4), bucket B
    // holds 3 (small), doc 50 bridges A and B via a second band.
    val bt = ((0L until 10L).map(d => (d, 0, 111L)) ++
        Seq((50L, 0, 222L), (51L, 0, 222L), (52L, 0, 222L)) ++
        Seq((5L, 1, 333L), (50L, 1, 333L)))
      .toDF("doc_id", "band", "band_sig")
    val uncapped = graft.ops.Similarity.bandedCandidates(bt, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = graft.ops.Similarity.bandedCandidates(bt, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hot bucket: 45 pairs uncapped -> 9 star pairs (hub = min id 0);
    // small buckets keep all pairs; bridge edge survives
    assert(uncapped.count(p => p._1 < 10 && p._2 < 10) == 45)
    assert(capped.count(p => p._1 < 10 && p._2 < 10) == 9)
    assert((0L until 10L).drop(1).forall(d => capped((0L, d))))
    assert(capped((50L, 51L)) && capped((50L, 52L)) && capped((51L, 52L)))
    assert(capped((5L, 50L)))
    // candidate-graph components identical (the connectivity contract)
    def comps(pairs: Set[(Long, Long)]): Set[Set[Long]] =
      graft.ops.Graphs.connectedComponentsDF(spark,
          pairs.toSeq.toDF("src", "dst"))
        .collect().groupBy(_.getLong(1)).values
        .map(_.map(_.getLong(0)).toSet).toSet
    assert(comps(capped) == comps(uncapped))

    // ---- the corpus gate (the honest post-filter contract, see
    // Similarity.bandedCandidates): capped verified pairs ⊆ uncapped,
    // so capped CLUSTER LABELS are a REFINEMENT of uncapped — never a
    // false merge (the dangerous direction for a dedup consumer);
    // chained components may split. Run at cap 8 so the organic
    // fixture's buckets genuinely get capped.
    def pipeline(d: org.apache.spark.sql.DataFrame, maxBucket: Int)
        : (Set[(Long, Long)], Map[Long, Long]) = {
      val sh = graft.ops.Text.shingles(d, 3).cache()
      val sigs = graft.ops.Similarity.minHashSignatures(sh, 32).cache()
      val cands = graft.ops.Similarity.lshCandidates(sigs, 32, 16, maxBucket)
      val likely = graft.ops.Similarity.estimateJaccard(cands, sigs)
        .filter(col("est_jaccard") >= 0.42).select("a_id", "b_id")
      val pairs = graft.ops.Similarity.exactJaccardCompact(sh, likely)
        .filter(col("jaccard") > 0.6)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val labels = graft.ops.Graphs.connectedComponentsDF(spark, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, labels)
    }
    val d = Tables.load(spark, sfDir, "documents")
    val (pc, lc) = pipeline(d, 8)
    val (pu, lu) = pipeline(d, 0)
    assert(pc.nonEmpty && pc.subsetOf(pu),
      "capped verified pairs must be a subset of uncapped")
    // refinement: every capped cluster sits inside ONE uncapped cluster
    lc.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(lu).toSet.size == 1,
        "a capped cluster spans two uncapped clusters (false merge)")
    }
    // and the registry entry is the capped pipeline at cap 64 — with
    // its SQL-door twin (capped near_dup_pairs_lsh composed into
    // connected_components) pinned row-for-row equal
    val l02g = SparkEntry.queries("l02g_lsh_capped_clusters")(spark, sfDir)
      .collect().toSeq
    assert(l02g.nonEmpty)
    assert(SparkEntry.queries("l02i_lsh_clusters_sql")(spark, sfDir)
      .collect().toSeq == l02g, "l02i SQL composition != l02g")

    // ---- clique-family gate: when a hot bucket IS a genuine near-dup
    // clique (the boilerplate shape that creates hot buckets at scale),
    // every star edge survives the exact re-check and the capped labels
    // EQUAL uncapped's. 30 near-identical copies (one-token suffix)
    // + 5 unrelated docs; cap 8 makes the family's buckets hot.
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark woods tonight while the moon " +
      "rises slowly over the quiet hills beyond the silver river"
    val clique = (0L until 30L).map(i => (i, s"$base copy$i")) ++
      (100L until 105L).map(i =>
        (i, s"completely unrelated document number $i with its own " +
          s"words entirely distinct content ${i * 7} nothing shared " +
          s"here at all ${i * 13} flamingo umbrella ${i * 31} xylophone"))
    val cdocs = clique.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val (cpc, clcap) = pipeline(cdocs, 8)
    val (cpu, cluncap) = pipeline(cdocs, 0)
    assert(cpc.nonEmpty && clcap == cluncap,
      "clique-family capped labels must equal uncapped exactly")
    assert((0L until 30L).forall(i => clcap.get(i).contains(0L)),
      "the boilerplate family must label as one cluster under the cap")

    // ---- SQL door: the optional 9th arg reaches the kernel — capped
    // pairs are a subset of uncapped, every reported pair still exactly
    // verified over the threshold
    graft.functions.TableFunctions.ensureRegistered(spark)
    Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("graft_l02g_docs")
    def tvf(arg: String) = spark.sql(
      s"""SELECT a_id, b_id FROM near_dup_pairs_lsh('graft_l02g_docs',
         |'doc_id', 'text', 3, 60, 32, 16, 42$arg)
         |ORDER BY a_id, b_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tvfCapped = tvf(", 8")
    val tvfFull = tvf("")
    assert(tvfCapped.nonEmpty && tvfCapped.subsetOf(tvfFull))
  }

  test("LLM SQL-door twins == Scala siblings row-for-row " +
      "(near_dup_pairs, cosine_topk, decontaminate)") {
    Seq("l02d_near_dedup_sql" -> "l02_near_dedup",
        "l02f_lsh_sql" -> "l02b_lsh_near_dedup",
        "l03e_cosine_topk_sql" -> "l03_cosine_topk",
        "l03f_ivf_neardup_sql" -> "l03d_ivf_neardup",
        "l10c_decontaminate_sql" -> "l10_decontaminate",
        "l10e_decontaminate_bloom_sql" -> "l10b_decontaminate_bloom",
        "l59c_video_neardup_sql" -> "l59_video_neardup")
      .foreach { case (twin, sibling) =>
        val a = SparkEntry.queries(twin)(spark, sfDir).collect().toSeq
        val b = SparkEntry.queries(sibling)(spark, sfDir).collect().toSeq
        assert(a.nonEmpty && a == b, s"$twin != $sibling")
      }
    // the TVF's derived n_chars must equal the kernel's semantics on a
    // table WITHOUT a length column (the point of deriving it)
    import spark.implicits._
    graft.functions.TableFunctions.ensureRegistered(spark)
    Seq((1L, "abcabc"), (2L, "abcabd"), (3L, "zzzzzz"))
      .toDF("id", "body").createOrReplaceTempView("tvf_nd_docs")
    val pairs = spark.sql(
      """SELECT a_id, b_id FROM
        |near_dup_pairs('tvf_nd_docs', 'id', 'body', 3, 40)
        |ORDER BY a_id, b_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc1 {abc,bca,cab}, doc2 {abc,bca,cab,abd}: inter 3, union 4,
    // j = 0.75 > 0.4; doc3 {zzz} disjoint from both
    assert(pairs == Seq((1L, 2L)))
  }
}
