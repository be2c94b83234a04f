package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** I4 fast path — typed Aggregator computing an element-wise centroid of
  * ARRAY<BIGINT> (scaled-integer) embeddings without the posexplode:
  * the buffer is one (sums[64], count) pair per group instead of 64
  * exploded rows per input vector, so the shuffle carries
  * O(groups × dims) instead of O(rows × dims). finish applies the same
  * integer division as the oracle-checked posexplode form — half-up
  * for non-negative sums, truncated toward zero for negative ones
  * (matching SQL `div` and DuckDB `//` exactly; CentroidSpec proves
  * equality with the SQL form).
  *
  * Input contract (r4 review): every vector in a group must have the
  * same length — ragged input used to be silently truncated to the
  * FIRST vector's length, making results depend on partition order;
  * now it throws. NULL input arrays contribute nothing. */
object VectorCentroid extends Aggregator[Array[Long], (Array[Long], Long), Array[Long]] {

  def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)

  private def requireSameDims(expected: Int, got: Int): Unit =
    if (expected != got) throw new IllegalArgumentException(
      s"VectorCentroid: ragged input (dim $got vs $expected) — " +
        "centroids over mixed-dimension vectors are undefined")

  def reduce(b: (Array[Long], Long), a: Array[Long]): (Array[Long], Long) =
    if (a == null) b
    else if (b._2 == 0L) (a.clone(), 1L)
    else {
      val s = b._1
      requireSameDims(s.length, a.length)
      var i = 0
      while (i < s.length) { s(i) += a(i); i += 1 }
      (s, b._2 + 1L)
    }

  def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) =
    if (x._2 == 0L) y
    else if (y._2 == 0L) x
    else {
      val s = x._1
      requireSameDims(s.length, y._1.length)
      var i = 0
      while (i < s.length) { s(i) += y._1(i); i += 1 }
      (s, x._2 + y._2)
    }

  def finish(r: (Array[Long], Long)): Array[Long] =
    if (r._2 == 0L) Array.emptyLongArray
    // BigInt: 2*s halves the Long headroom and wraps where a HUGEINT
    // oracle keeps going — the same fix WeightedAvg.finish carries
    else r._1.map(s => ((2 * BigInt(s) + r._2) / (2 * BigInt(r._2))).toLong)

  def bufferEncoder: Encoder[(Array[Long], Long)] =
    Encoders.tuple(ExpressionEncoders.longArray, Encoders.scalaLong)
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoders.longArray
}

private object ExpressionEncoders {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
