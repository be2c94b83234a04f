package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** I4 fast path — typed Aggregator computing an element-wise centroid of
  * ARRAY<BIGINT> (scaled-integer) embeddings without the posexplode:
  * the buffer is one (sums[64], count) pair per group instead of 64
  * exploded rows per input vector, so the shuffle carries
  * O(groups × dims) instead of O(rows × dims). finish applies the same
  * half-up integer division as the oracle-checked posexplode form
  * (CentroidSpec proves equality). */
object VectorCentroid extends Aggregator[Array[Long], (Array[Long], Long), Array[Long]] {

  def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)

  def reduce(b: (Array[Long], Long), a: Array[Long]): (Array[Long], Long) =
    if (b._2 == 0L) (a.clone(), 1L)
    else {
      val s = b._1
      var i = 0
      while (i < s.length && i < a.length) { s(i) += a(i); i += 1 }
      (s, b._2 + 1L)
    }

  def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) =
    if (x._2 == 0L) y
    else if (y._2 == 0L) x
    else {
      val s = x._1
      var i = 0
      while (i < s.length && i < y._1.length) { s(i) += y._1(i); i += 1 }
      (s, x._2 + y._2)
    }

  def finish(r: (Array[Long], Long)): Array[Long] =
    if (r._2 == 0L) Array.emptyLongArray
    else r._1.map(s => (2 * s + r._2) / (2 * r._2)) // same half-up as SQL `div`

  def bufferEncoder: Encoder[(Array[Long], Long)] =
    Encoders.tuple(ExpressionEncoders.longArray, Encoders.scalaLong)
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoders.longArray
}

private object ExpressionEncoders {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
