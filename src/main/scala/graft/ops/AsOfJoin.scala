package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the right row with
  * the greatest `rightTs <= leftTs` (or `<` when `strict`) within the same
  * key group. The reference's time-point read `get(key, t)` generalized to
  * a relational operator (SURVEY.md Q10/T04, §4.3 item 1).
  *
  * Implementation is the union+window pattern, NOT a non-equi join: Spark
  * plans `l.ts >= r.ts` conditions as BroadcastNestedLoopJoin — an O(n·m)
  * cliff at scale. Here both sides are unioned, shuffled ONCE on the key
  * columns, sorted within partitions by (ts, side, tieBreak), and each left
  * row picks up the running `last` non-null right payload. O(n log n),
  * single shuffle, spill-safe — survives a 1000-executor 100 TB run as long
  * as no single key group is degenerate (salt upstream if one is).
  *
  * Tie semantics: right rows at ts == left ts ARE visible (non-strict) and
  * among right ties the one with the greatest `tieBreak` wins — both sides
  * of the oracle must declare the same rule.
  */
object AsOfJoin {

  /** Register the as-of strategy once per session (idempotent;
    * synchronized — extraStrategies is a bare var and a concurrent
    * read-modify-write from two planner threads could drop a strategy).
    */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      val cur = spark.experimental.extraStrategies
      if (!cur.contains(graft.plans.AsOfJoinStrategy))
        spark.experimental.extraStrategies = cur :+ graft.plans.AsOfJoinStrategy
    }

  /** Sort-merge as-of join through the custom Catalyst operator
    * ([[graft.plans.AsOfMergeJoinExec]]): same semantics and output shape
    * as [[apply]], but each side is shuffled/sorted independently (and not
    * at all when already key-distributed and sorted, e.g. bucketed
    * tables) and the merge streams with O(1) state. See the node's
    * Scaladoc for the contract.
    */
  def merge(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: String,
      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    // fresh-alias every right column so self-joins can't collide expr ids
    val rAnalyzed = right.queryExecution.analyzed
    val aliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(aliases, rAnalyzed)
    val rOut = aliases.map(_.toAttribute)
    // resolve names with the session's resolver (case-insensitive by
    // default, like col()) and refuse ambiguity instead of picking one
    val resolver = spark.sessionState.conf.resolver
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() =>
          throw new IllegalArgumentException(s"column $n not found")
        case many =>
          throw new IllegalArgumentException(
            s"column $n is ambiguous: ${many.map(_.name).mkString(", ")}")
      }
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      on.map(attr(lPlan.output, _)), on.map(attr(rOut, _)),
      attr(lPlan.output, leftTs), attr(rOut, rightTs),
      attr(rOut, tieBreak),
      payload.map(attr(rOut, _)),
      payload.map(p => AttributeReference(p + "_asof",
        attr(rOut, p).dataType, nullable = true)()),
      strict)
    org.apache.spark.sql.GraftPlanBridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.SparkSession], node)
  }

  /** Forward as-of join (pandas merge_asof direction="forward"): for each
    * left row, the right row with the SMALLEST `rightTs >= leftTs` (or
    * `>` when strict); among right rows at the same ts the SMALLEST
    * `tieBreak` wins (mirror of the backward rule). Same union +
    * single-shuffle window shape as [[apply]], with the pick scanning a
    * forward frame instead of a running `last`.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: String,
      strict: Boolean = false): DataFrame = {
    val reserved = Set("__ts", "__is_right", "__tie", "__r_pay", "__pay_fwd")
    val clash = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(clash.isEmpty,
      s"as-of join inputs must not contain reserved column(s): ${clash.mkString(", ")}")
    // ... and fail fast on OUTPUT-name collisions too: the result appends
    // payload columns as `<p>_fwd`, so a left input already carrying that
    // name would yield duplicate columns that break the next by-name ref.
    val outClash = payload.map(_ + "_fwd").filter(left.columns.contains)
    require(outClash.isEmpty,
      s"as-of forward join left input already contains output column(s): ${outClash.mkString(", ")}")
    val rightSide = right.select(
      on.map(col) ++ Seq(col(rightTs).as("__ts"), lit(1).as("__is_right"),
        col(tieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__r_pay")): _*)
    val leftCols = left.columns.toSeq
    val leftSide = left.select(
      leftCols.map(col) ++ Seq(col(leftTs).as("__ts"),
        lit(0).as("__is_right")): _*)
    val unioned = leftSide.unionByName(rightSide, allowMissingColumns = true)
    // Equal-ts right rows are visible iff non-strict: inside the forward
    // frame (after the left row) when visible, before it when not.
    val sideOrder = if (strict) col("__is_right").desc else col("__is_right").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, sideOrder, col("__tie").asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("__pay_fwd", first(col("__r_pay"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__pay_fwd.$p").as(p + "_fwd")): _*)
  }

  /** Nearest as-of join (pandas merge_asof direction="nearest"): the
    * backward (non-strict) and strict-forward candidates composed; the
    * smaller absolute time gap wins, exact ties go backward. `leftTs` and
    * `rightTs` must share a type whose subtraction is orderable
    * (timestamp, date, numeric). Two single-shuffle passes — still no
    * non-equi join anywhere.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: String): DataFrame = {
    require(!payload.contains(rightTs),
      s"payload must not contain $rightTs (appended internally for the gap compare)")
    val payloadB = payload :+ rightTs
    // nearest composes backward + forward: intermediate frames carry
    // `<p>_asof` / `<p>_fwd` (for every payload column AND rightTs) and the
    // output appends `<p>_near` — a left input already holding any of those
    // would produce duplicate column names downstream. Fail fast instead.
    val outClash = (payloadB.flatMap(p => Seq(p + "_asof", p + "_fwd")) ++
      payload.map(_ + "_near")).filter(left.columns.contains).distinct
    require(outClash.isEmpty,
      s"as-of nearest join left input already contains working/output column(s): ${outClash.mkString(", ")}")
    val b = apply(left, right, on, leftTs, rightTs, payloadB, tieBreak)
    val f = forward(b, right, on, leftTs, rightTs, payloadB, tieBreak,
      strict = true)
    val bts = col(rightTs + "_asof")
    val fts = col(rightTs + "_fwd")
    val useB = bts.isNotNull &&
      (fts.isNull || (col(leftTs) - bts) <= (fts - col(leftTs)))
    f.select(left.columns.toSeq.map(col) ++ payload.map(p =>
      when(useB, col(p + "_asof")).otherwise(col(p + "_fwd"))
        .as(p + "_near")): _*)
  }

  /** Backward as-of join with a TOLERANCE (pandas merge_asof
    * `tolerance=`): a candidate older than `toleranceUs` microseconds
    * before the probe is discarded — the payload comes back null,
    * exactly as if no right row existed. The same single-shuffle
    * backward pass as [[apply]] with `rightTs` carried alongside the
    * payload for the staleness test (the [[nearest]] composition move);
    * both ts columns must be timestamps. The stale check happens AFTER
    * the pick, not by pre-filtering the right side — a stale-but-newest
    * click correctly yields NO match rather than falling back to an
    * even older one (pandas semantics).
    */
  def tolerance(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: String,
      toleranceUs: Long): DataFrame = {
    require(!payload.contains(rightTs),
      s"payload must not contain $rightTs (appended internally for the staleness test)")
    val payloadB = payload :+ rightTs
    val outClash = payloadB.map(_ + "_asof").filter(left.columns.contains)
    require(outClash.isEmpty,
      s"as-of tolerance join left input already contains output column(s): ${outClash.mkString(", ")}")
    val b = apply(left, right, on, leftTs, rightTs, payloadB, tieBreak)
    val fresh = col(rightTs + "_asof").isNotNull &&
      graft.Det.epochUs(col(leftTs)) -
        graft.Det.epochUs(col(rightTs + "_asof")) <= toleranceUs
    b.select(left.columns.toSeq.map(col) ++ payload.map(p =>
      when(fresh, col(p + "_asof")).otherwise(lit(null)).as(p + "_asof")): _*)
  }

  def apply(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: String,
      strict: Boolean = false): DataFrame = {
    // Fail fast on temp-column collisions: an input already carrying one
    // of the reserved working names would be silently corrupted by the
    // union+window plumbing below (`merge` has its own ambiguity checks).
    val reserved = Set("__ts", "__is_right", "__tie", "__r_pay", "__pay_asof")
    val clash = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(clash.isEmpty,
      s"as-of join inputs must not contain reserved column(s): ${clash.mkString(", ")}")
    val outClash = payload.map(_ + "_asof").filter(left.columns.contains)
    require(outClash.isEmpty,
      s"as-of join left input already contains output column(s): ${outClash.mkString(", ")}")
    // The whole right payload travels as ONE struct column: `last(...,
    // ignoreNulls)` then skips exactly the left-side placeholder rows
    // (struct null) while a matched right row whose payload FIELDS are
    // null is still honored, and multi-column payloads can never mix
    // values from different right rows. Left side simply omits __tie and
    // the payload struct — unionByName(allowMissingColumns) nulls them
    // with the right side's own types (so any orderable tieBreak type
    // works).
    val rightSide = right.select(
      on.map(col) ++ Seq(col(rightTs).as("__ts"), lit(1).as("__is_right"),
        col(tieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__r_pay")): _*)
    val leftCols = left.columns.toSeq
    val leftSide = left.select(
      leftCols.map(col) ++ Seq(col(leftTs).as("__ts"),
        lit(0).as("__is_right")): _*)
    val unioned = leftSide.unionByName(rightSide, allowMissingColumns = true)
    // Right rows sort before left rows at equal ts iff non-strict (visible);
    // after iff strict (invisible). Among right ties, larger tieBreak last
    // so running `last` picks it.
    val sideOrder = if (strict) col("__is_right").asc else col("__is_right").desc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, sideOrder, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__pay_asof", last(col("__r_pay"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__pay_asof.$p").as(p + "_asof")): _*)
  }
}
