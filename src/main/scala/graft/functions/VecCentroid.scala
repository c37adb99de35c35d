package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.6): elementwise mean of float vectors —
  * the coarse-quantizer building block for IVF-style ANN (each group's
  * centroid). Partial aggregation is a dense double-sum vector, so the
  * shuffle carries one row per (group × partition), not per vector.
  */
case class CentroidBuf(sum: Array[Double], n: Long)

object VecCentroid extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
  type Buf = CentroidBuf
  private def Buf(s: Array[Double], n: Long) = CentroidBuf(s, n)

  override def zero: Buf = Buf(Array.empty, 0L)

  override def reduce(b: Buf, v: Seq[Float]): Buf = {
    val s = if (b.sum.isEmpty) new Array[Double](v.length) else b.sum
    var i = 0
    while (i < v.length) { s(i) += v(i).toDouble; i += 1 }
    Buf(s, b.n + 1)
  }

  override def merge(a: Buf, b: Buf): Buf =
    if (a.sum.isEmpty) b
    else if (b.sum.isEmpty) a
    else {
      val s = a.sum.clone()
      var i = 0
      while (i < s.length) { s(i) += b.sum(i); i += 1 }
      Buf(s, a.n + b.n)
    }

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
