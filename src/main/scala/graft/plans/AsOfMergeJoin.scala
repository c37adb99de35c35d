package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, NamedExpression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode => LogicalBinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}

/** Whole-operator as-of join through the full Catalyst stack (SURVEY.md
  * §4.3's upgrade path, ROADMAP item 1): a logical node, a strategy, and a
  * sort-merge physical operator.
  *
  * Compared to the library-level union+window form (graft.ops.AsOfJoin —
  * which sorts BOTH sides together in one shuffled partition stream), this
  * operator lets each side keep its own distribution/ordering: Catalyst
  * shuffles+sorts the two children independently (or not at all if the
  * input is already bucketed+sorted — the requiredChildDistribution /
  * requiredChildOrdering contract makes storage-sorted inputs zero-sort),
  * and the merge itself is a streaming O(|L|+|R|) pass with O(1) state per
  * partition.
  *
  * Semantics (identical to graft.ops.AsOfJoin): for each left row, the
  * payload of the right row in the same key group with the greatest
  * rightTs <= leftTs (strictly < when `strict`); ties on rightTs resolved
  * by greatest `rightTie`. Right payload may be legitimately NULL — match
  * tracking is row-based, not ignoreNulls-based.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    payload: Seq[NamedExpression],
    payloadOut: Seq[Attribute], // fixed at construction: stable expr ids
    strict: Boolean) extends LogicalBinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut is synthesized by this operator, not consumed from children
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfMergeJoinExec]]; registered via
  * `spark.experimental.extraStrategies` (see AsOfJoin.ensureStrategy).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfMergeJoinExec(n.leftKeys, n.rightKeys, n.leftTs, n.rightTs,
        n.rightTie, n.payload, n.payloadOut, n.strict,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Per-partition merge state: consumes the sorted right iterator as the
  * (sorted) left rows stream through [[join]], keeping the best visible
  * payload per key group — the exact logic of the as-of merge, factored
  * out so the interpreted path (doExecute) and the whole-stage-codegen
  * path (doProduce's generated loop) cannot diverge.
  */
final class AsOfMergeState(
    rIter: Iterator[InternalRow],
    lKeyProj: UnsafeProjection, rKeyProj: UnsafeProjection,
    lTsProj: UnsafeProjection, rTsProj: UnsafeProjection,
    payProj: UnsafeProjection,
    keyOrd: Ordering[InternalRow], tsOrd: Ordering[InternalRow],
    strict: Boolean, nPayCols: Int) {
  private val joined = new JoinedRow
  private val nullPay = new GenericInternalRow(nPayCols)
  private var rRow: InternalRow = _
  private var rKey: InternalRow = _
  private var rTs: InternalRow = _
  private var lastPay: InternalRow = _
  private var lastKey: InternalRow = _
  private def advanceRight(): Unit =
    if (rIter.hasNext) {
      rRow = rIter.next(); rKey = rKeyProj(rRow); rTs = rTsProj(rRow)
    } else { rRow = null; rKey = null; rTs = null }
  advanceRight()

  /** The joined output row for this left row (reuses internal buffers —
    * callers must consume or copy before the next call).
    */
  def join(l: InternalRow): InternalRow = {
    val lKey = lKeyProj(l)
    val lTs = lTsProj(l)
    while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
    while (rRow != null && keyOrd.compare(rKey, lKey) == 0 && {
        val c = tsOrd.compare(rTs, lTs)
        c < 0 || (c == 0 && !strict)
      }) {
      lastPay = payProj(rRow).copy()
      lastKey = rKey.copy()
      advanceRight()
    }
    val pay =
      if (lastKey != null && keyOrd.compare(lastKey, lKey) == 0) lastPay
      else nullPay
    joined(l, pay)
  }
}

/** Serializable per-partition factory for [[AsOfMergeState]] (projections
  * and orderings are built on the executor; the generated WSCG class
  * calls [[create]] once per partition from its init).
  */
final class AsOfMergeStateFactory(
    leftOut: Seq[Attribute], rightOut: Seq[Attribute],
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    payload: Seq[NamedExpression], strict: Boolean) extends Serializable {
  def create(rIter: Iterator[InternalRow]): AsOfMergeState =
    new AsOfMergeState(
      rIter,
      UnsafeProjection.create(leftKeys, leftOut),
      UnsafeProjection.create(rightKeys, rightOut),
      UnsafeProjection.create(Seq(leftTs), leftOut),
      UnsafeProjection.create(Seq(rightTs), rightOut),
      UnsafeProjection.create(payload, rightOut),
      RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType)),
      RowOrdering.createNaturalAscendingOrdering(Seq(leftTs.dataType)),
      strict, payload.length)
}

case class AsOfMergeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    payload: Seq[NamedExpression],
    payloadOut: Seq[Attribute],
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  // Both sides clustered on the key — EnsureRequirements co-partitions
  // them (inserting exchanges only where the child isn't already
  // key-distributed, e.g. bucketed tables come in free).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Left: (keys, ts); right: (keys, ts, tie) so the LAST right row seen
  // while advancing is automatically the max-(ts, tie) match.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs :+ rightTie).map(SortOrder(_, Ascending)))

  // The merge is left-driven and order-preserving: downstream operators
  // keyed on leftKeys (groupBy, another as-of) need no further exchange
  // or sort.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  private def stateFactory: AsOfMergeStateFactory =
    new AsOfMergeStateFactory(left.output, right.output, leftKeys,
      rightKeys, leftTs, rightTs, payload, strict)

  override protected def doExecute(): RDD[InternalRow] = {
    val factory = stateFactory
    val leftOut = left.output
    val payOut = payloadOut
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val state = factory.create(rIter)
      val resultProj = UnsafeProjection.create(allOut, leftOut ++ payOut)
      lIter.map(l => resultProj(state.join(l)))
    }
  }

  // ---- whole-stage codegen ----------------------------------------------
  // The merge consumes TWO sorted inputs, so (like SortMergeJoinExec) this
  // node is a codegen REGION LEAF: children compile into their own spans
  // and feed through inputRDDs; the generated loop here pulls left rows,
  // advances the precompiled per-partition merge state, and inlines the
  // PARENT's consume — fusing the join output into downstream projections
  // and aggregates with no iterator boundary.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // the emitted JoinedRow reuses internal buffers row-to-row
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val factory = ctx.addReferenceObj("asofFactory", stateFactory,
      classOf[AsOfMergeStateFactory].getName)
    val stateCls = classOf[AsOfMergeState].getName
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];", forceInline = true)
    val state = ctx.addMutableState(stateCls, "asofState",
      v => s"$v = $factory.create(inputs[1]);", forceInline = true)
    val lRow = ctx.freshName("lRow")
    val outRow = ctx.freshName("outRow")
    // column-based consume: bind each output column to an extraction from
    // the joined row, so the parent inlines typed accesses (and the WSCG
    // top can build its own UnsafeRow — a raw JoinedRow must never escape)
    ctx.INPUT_ROW = outRow
    ctx.currentVars = null
    val resultVars = output.zipWithIndex.map { case (a, i) =>
      org.apache.spark.sql.catalyst.expressions
        .BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $lRow = (InternalRow) $leftInput.next();
       |  InternalRow $outRow = $state.join($lRow);
       |  ${consume(ctx, resultVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}
