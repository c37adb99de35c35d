package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for float-vector dot products.
  *
  * The pure-HOF form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is
  * CORRECT but interpreted per element with boxing — ~60× slower than the
  * DuckDB baseline on the all-pairs bench. This expression generates a
  * tight primitive loop inside whole-stage codegen (SURVEY.md §4.3 item 5:
  * custom Expression only where the bench demands it). Summation is
  * sequential in double precision — identical fold order to the HOF form
  * and the DuckDB oracle, so hash determinism is unchanged.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float> (the engine's embedding type); enforced by
  // the call sites rather than ExpectsInputTypes (private[sql] in 4.x).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Idempotent per-session registration of the engine's native functions —
  * queries receive the driver's SparkSession, so registration happens at
  * use-sites, not session construction.
  */
object VecFunctions {
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
  }
}
