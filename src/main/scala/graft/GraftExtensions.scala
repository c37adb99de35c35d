package graft

import graft.functions.{FloatVecDot, SimHash64, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: lets any session pick up the
  * engine's native functions via config, with no code dependency on the
  * registration helper —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (Equivalent to `VecFunctions.ensureRegistered(spark)`, which the query
  * contract uses because it receives an already-built session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs(0))))
    // SQL table-valued surface for the signature operators (asof_join,
    // snapshot) — same builders as TableFunctions.ensureRegistered.
    graft.functions.TableFunctions.registrations.foreach(ext.injectTableFunction)
    // Opt-in O(n·m) join-shape linter (spark.graft.failOnNestedLoop).
    // injectOptimizerRule places this in the operator-optimization batch,
    // BEFORE subquery rewriting — a best-effort early lint from the
    // config-only path. Full coverage (joins materialized by non-equi
    // EXISTS/IN rewrites) needs end-of-optimizer placement:
    // NestedLoopGuard.install(spark), which PlanShapeSpec validates.
    ext.injectOptimizerRule(_ => graft.plans.NestedLoopGuard)
  }
}
