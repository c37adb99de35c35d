package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q57 — parameterized sequence-pattern matching over event streams, the
  * MATCH_RECOGNIZE-lite surface q42's fixed view→click→purchase motif
  * generalizes to: the pattern is an ARGUMENT (a sequence of event-type
  * symbols), matched per entity in (ts, tieBreak) order by a state-machine
  * fold — the sessionStep/asofBatch shape, so the scan is one pass with
  * O(1) state per entity and the sequence never leaves its partition.
  *
  * Two matching modes, both greedy left-to-right and non-overlapping
  * (count++ then reset — a matched event is never reused):
  *
  *  - `contiguous = true`: the pattern must occupy CONSECUTIVE events —
  *    exactly the semantics of q42's `replace(seq, 'vcp', '')` string
  *    trick. Mismatch recovery uses a KMP failure table over the pattern
  *    symbols: a naive reset-to-zero undercounts patterns with repeated
  *    symbols (stream a,a,a,b contains one "a,a,b" — the naive machine
  *    finds none; PatternsSpec pins this).
  *  - `contiguous = false`: events may intervene between stages — the
  *    funnel/subsequence semantics real conversion analysis wants.
  *
  * At 100 TB: one entity-keyed shuffle + linear scan, the exact plan of
  * the other per-entity folds (sessionize, asofBatch); at the reference's
  * scale MATCH_RECOGNIZE engines do the same partition-sort-scan. The
  * per-partition output buffer is one row per entity (the result itself),
  * not per event.
  */
object Patterns {

  case class PatEv(entity: Long, ts_us: Long, tie: Long, sym: String)
  case class PatCount(entity: Long, n_events: Long, n_matches: Long)

  /** KMP failure table over pattern symbols: fail(k) = length of the
    * longest proper prefix of pattern[0,k) that is also its suffix.
    */
  private[ops] def failure(p: Seq[String]): Array[Int] = {
    val f = new Array[Int](p.length + 1)
    var k = 0
    for (i <- 1 until p.length) {
      while (k > 0 && p(i) != p(k)) k = f(k)
      if (p(i) == p(k)) k += 1
      f(i + 1) = k
    }
    f
  }

  /** One machine step, shared by both modes (the sessionStep discipline:
    * one function, so a future streaming twin cannot diverge). Returns
    * (newStage, matchedNow).
    */
  private[ops] def step(pat: Array[String], fail: Array[Int],
      contiguous: Boolean, stage0: Int, sym: String): (Int, Boolean) = {
    var stage = stage0
    if (contiguous) {
      while (stage > 0 && sym != pat(stage)) stage = fail(stage)
      if (sym == pat(stage)) stage += 1
    } else if (sym == pat(stage)) stage += 1
    if (stage == pat.length) (0, true) else (stage, false)
  }

  /** Per-entity (n_events, n_matches) for `pattern` over the stream
    * ordered by (ts, tieBreak). Every entity with at least one event
    * appears (callers filter n_matches > 0 when they only want hits).
    */
  def matchCounts(events: DataFrame, entity: String, ts: String,
      tieBreak: String, typeCol: String, pattern: Seq[String],
      contiguous: Boolean): DataFrame = {
    require(pattern.nonEmpty, "empty pattern")
    val spark = events.sparkSession
    import spark.implicits._
    val pat = pattern.toArray
    val fail = failure(pattern)
    events.select(col(entity).cast("long").as("entity"),
        graft.Det.epochUs(col(ts)).as("ts_us"),
        col(tieBreak).cast("long").as("tie"),
        col(typeCol).cast("string").as("sym"))
      .as[PatEv]
      .repartition(col("entity"))
      .sortWithinPartitions("entity", "ts_us", "tie")
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[PatCount]
        var cur = 0L
        var started = false
        var stage = 0
        var cnt = 0L
        var n = 0L
        it.foreach { e =>
          if (!started) { started = true; cur = e.entity }
          else if (e.entity != cur) {
            out += PatCount(cur, n, cnt)
            cur = e.entity; stage = 0; cnt = 0L; n = 0L
          }
          val (s2, hit) = step(pat, fail, contiguous, stage, e.sym)
          stage = s2
          if (hit) cnt += 1
          n += 1
        }
        if (started) out += PatCount(cur, n, cnt)
        out.iterator
      }
      .toDF()
  }
}
