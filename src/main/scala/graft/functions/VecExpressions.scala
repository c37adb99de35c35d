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

/** Merge-intersection count of two SORTED long arrays — the exact-set
  * re-check kernel for hashed-shingle near-dedup. The row-exploded
  * alternative (join on the shingle key, group, count) shuffles
  * |pairs| × |shingles| rows; this expression runs O(|a|+|b|) comparisons
  * per pair inside whole-stage codegen over a broadcast of the compact
  * per-doc arrays. Inputs MUST be sorted ascending (sort_array upstream).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var n = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of a token array in ONE pass: per-token 60-bit md5
  * hash (the top 15 hex nibbles — EXACTLY [[graft.Det.md5Long]], so the
  * whole fingerprint replays in DuckDB and l07 is hash-matched, not
  * tolerance-gated), sign-votes accumulated into 64 counters, sign bits
  * assembled. Bits 60–63 of a 60-bit hash are always 0, so they always
  * vote -1 and the fingerprint's top nibble is 0 — 60 effective bits,
  * which the Hamming-locality property is indifferent to. The
  * pure-Column formulation needs 64 separate aggregate() folds over the
  * token array (O(64·t) interpreted lambda calls and a plan too large
  * for codegen); this expression is one tight loop. CodegenFallback: a
  * single virtual call per row is noise next to the per-token md5.
  * md5-vs-xxhash cost: ~3-5× per token (Det.scala's documented
  * tradeoff) — paid here because SimHash IS a seeded-decision operator
  * whose replay-ability is the point; LSH banding keeps xxhash64.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  // Matches the pure-Column twin on edge inputs too: a NULL token votes -1
  // on every bit (the HOF's when(...).otherwise(-1) path) and a NULL
  // array yields 0L (the HOF's null-folded bitwiseOR of zeros).
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val tokens = v.asInstanceOf[ArrayData]
    val md = SimHash64.digest.get()
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokens.numElements()) {
      if (tokens.isNullAt(i)) {
        var bit = 0
        while (bit < 64) { votes(bit) -= 1; bit += 1 }
      } else {
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        // first 15 hex nibbles == big-endian first 8 bytes >>> 4
        var be = 0L
        var b = 0
        while (b < 8) { be = (be << 8) | (d(b) & 0xFFL); b += 1 }
        val h = be >>> 4
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
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
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs(0)), "built-in")
    // Spark's own runtime-filter probe (codegen'd, long-keyed): exposed as
    // a function so library code can apply a pre-built bloom filter the
    // same way InjectRuntimeFilter does, without a UDF.
    reg.createOrReplaceTempFunction("bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
