package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, NamedExpression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode => LogicalBinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

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
    right: SparkPlan) extends BinaryExecNode {

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

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rightOut)
      val payProj = UnsafeProjection.create(payload, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val resultProj = UnsafeProjection.create(output, leftOut ++ payloadOut)
      val joined = new JoinedRow
      val nullPay = new GenericInternalRow(payloadOut.length)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTs: InternalRow = _
        private var lastPay: InternalRow = _ // copied payload of best match
        private var lastKey: InternalRow = _ // copied key it belongs to
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow)
            rTs = rTsProj(rRow)
          } else { rRow = null; rKey = null; rTs = null }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTs = lTsProj(l)
          // consume right rows whose key sorts before the current left key
          while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
          // consume right rows in this key group visible at lTs, keeping
          // the last one (right is (ts, tie)-sorted: last seen == max)
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
          resultProj(joined(l, pay))
        }
      }
    }
  }
}
