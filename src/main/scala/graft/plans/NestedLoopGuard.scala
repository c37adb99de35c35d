package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, IsNull, Or, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in plan linter (`spark.graft.failOnNestedLoop=true`): rejects join
  * shapes Spark can only execute as CartesianProduct or
  * BroadcastNestedLoopJoin — the O(n·m) cliff class that passes every
  * test-scale run and melts down at 100 TB (the exact failure mode the
  * as-of operator exists to avoid, SURVEY §4.3 item 1).
  *
  * Placement matters: [[install]] registers the rule via
  * `spark.experimental.extraOptimizations` — a TRUE end-of-optimizer
  * batch, after RewriteSubquery, so it also sees the nested-loop joins
  * that non-equi EXISTS / IN / NOT IN subquery rewrites materialize
  * (that is where the null-aware anti pattern below becomes visible).
  * The `GraftExtensions` config-only path can only use
  * `injectOptimizerRule`, which runs in the operator-optimization batch
  * BEFORE subquery rewriting — a best-effort early lint that catches
  * explicitly-written non-equi joins but not subquery-materialized ones.
  * Sessions that want full coverage call [[install]].
  *
  * Deliberate exemptions (each an explicit user opt-in or a safe shape):
  *   - any equi-linked join (it will hash/sort-merge),
  *   - NOT IN's null-aware anti pattern `(a = b) OR isnull(a = b)` —
  *     Spark executes it as a null-aware broadcast hash join,
  *   - an explicit `broadcast()` hint on either side,
  *   - an explicit `crossJoin` (JoinType Cross).
  */
object NestedLoopGuard extends Rule[LogicalPlan] with PredicateHelper {

  val CONF = "spark.graft.failOnNestedLoop"

  /** Register at the END of the optimizer (after subquery rewriting) —
    * idempotent; synchronized because `extraOptimizations` is a bare var.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      val cur = spark.experimental.extraOptimizations
      if (!cur.contains(NestedLoopGuard))
        spark.experimental.extraOptimizations = cur :+ NestedLoopGuard
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(CONF, "false").toBoolean) plan.foreach {
      case j: Join if j.joinType != Cross && !hasEquiLink(j) && !optedIn(j) =>
        throw new IllegalStateException(
          s"$CONF: ${j.joinType} join has no equi key and would execute " +
            s"as a nested loop / cartesian product; add an equality " +
            s"predicate, a broadcast() hint, or use crossJoin explicitly. " +
            s"Condition: ${j.condition.map(_.sql).getOrElse("<none>")}")
      case _ =>
    }
    plan
  }

  private def linksSides(j: Join, a: Expression, b: Expression): Boolean =
    (a.references.subsetOf(j.left.outputSet) &&
      b.references.subsetOf(j.right.outputSet)) ||
      (b.references.subsetOf(j.left.outputSet) &&
        a.references.subsetOf(j.right.outputSet))

  private def hasEquiLink(j: Join): Boolean =
    j.condition.exists(c => splitConjunctivePredicates(c).exists {
      case EqualTo(a, b) => linksSides(j, a, b)
      case EqualNullSafe(a, b) => linksSides(j, a, b)
      // NOT IN after RewritePredicateSubquery: (a = b) OR isnull(a = b)
      case Or(e1: EqualTo, IsNull(e2: EqualTo))
        if e1.semanticEquals(e2) => linksSides(j, e1.left, e1.right)
      case _ => false
    })

  private def optedIn(j: Join): Boolean =
    j.hint.leftHint.exists(_.strategy.isDefined) ||
      j.hint.rightHint.exists(_.strategy.isDefined)
}
