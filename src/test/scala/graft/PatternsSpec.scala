package graft

import graft.ops.Patterns
import org.apache.spark.sql.functions._

/** Q57 — the parameterized sequence-pattern machine: contiguous (KMP)
  * mode vs a string-replace oracle, subsequence mode vs a hand fold,
  * repeated-symbol patterns where a naive reset machine undercounts.
  */
class PatternsSpec extends SparkSpecBase {

  /** Events for one user at minute offsets with the given type codes. */
  private def evDF(userSyms: (Long, Seq[String])*) = {
    import spark.implicits._
    userSyms.flatMap { case (u, syms) =>
      syms.zipWithIndex.map { case (sym, i) =>
        (u, i.toLong + 1L,
          new java.sql.Timestamp(1700006400000L + i * 60000L), sym)
      }
    }.toDF("user_id", "event_id", "ts", "event_type")
  }

  private def run(df: org.apache.spark.sql.DataFrame, pat: Seq[String],
      contiguous: Boolean): Map[Long, (Long, Long)] =
    Patterns.matchCounts(df, "user_id", "ts", "event_id", "event_type",
        pat, contiguous)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  /** Non-overlapping greedy contiguous count — the replace-trick oracle
    * (each symbol one char).
    */
  private def replaceCount(syms: Seq[String], pat: Seq[String]): Long = {
    val s = syms.map(_.head).mkString
    val p = pat.map(_.head).mkString
    ((s.length - s.replace(p, "").length) / p.length).toLong
  }

  /** Greedy subsequence count — the straightforward reference fold. */
  private def subseqCount(syms: Seq[String], pat: Seq[String]): Long = {
    var stage = 0; var cnt = 0L
    syms.foreach { sym =>
      if (sym == pat(stage)) {
        stage += 1
        if (stage == pat.length) { cnt += 1; stage = 0 }
      }
    }
    cnt
  }

  test("contiguous mode: repeated-symbol pattern needs the KMP fallback") {
    // a,a,a,b contains ONE contiguous a,a,b — a naive reset machine
    // (drop to stage 0 on mismatch) finds none
    val df = evDF(1L -> Seq("a", "a", "a", "b"))
    assert(run(df, Seq("a", "a", "b"), contiguous = true) ==
      Map(1L -> ((4L, 1L))))
    // overlap is NOT allowed: a,b,a,b,a,b has one a,b,a,b (chars 1-4),
    // the second needs chars 3-6 but 3-4 are consumed
    val df2 = evDF(2L -> Seq("a", "b", "a", "b", "a", "b"))
    assert(run(df2, Seq("a", "b", "a", "b"), contiguous = true) ==
      Map(2L -> ((6L, 1L))))
  }

  test("both modes == their reference folds on random streams (100 cases)") {
    val rnd = new scala.util.Random(57)
    val alphabet = Vector("a", "b", "c")
    val cases = (1L to 100L).map { u =>
      u -> Seq.fill(3 + rnd.nextInt(40))(alphabet(rnd.nextInt(3)))
    }
    val df = evDF(cases: _*)
    for (pat <- Seq(Seq("a", "b"), Seq("a", "a", "b"), Seq("a", "b", "a"),
        Seq("a", "b", "c", "a"))) {
      val cont = run(df, pat, contiguous = true)
      val sub = run(df, pat, contiguous = false)
      cases.foreach { case (u, syms) =>
        assert(cont(u) == ((syms.length.toLong, replaceCount(syms, pat))),
          s"contiguous user $u pat $pat syms $syms got ${cont(u)}")
        assert(sub(u) == ((syms.length.toLong, subseqCount(syms, pat))),
          s"subseq user $u pat $pat syms $syms got ${sub(u)}")
      }
    }
  }

  test("q57b contiguous machine == q42 replace trick on the fixture") {
    val q42 = SparkEntry.queries("q42_seq_pattern")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val q57b = SparkEntry.queries("q57b_pattern_contiguous")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(q57b == q42 && q42.nonEmpty)
  }
}
