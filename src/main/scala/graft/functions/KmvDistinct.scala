package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable K-Minimum-Values distinct-count sketch as a typed
  * Aggregator: the buffer is the k smallest (unsigned) 64-bit hashes
  * seen; merge = merge-and-truncate, so partial aggregation and
  * cross-partition combination work like any built-in. Estimate:
  * (k-1) / fraction-of-hash-space-covered-by-kth-minimum. Constant
  * O(k) memory per group — the 100 TB alternative to exact distinct
  * alongside approx_count_distinct (HLL); KMV additionally supports
  * set operations (union = merge; intersection via inclusion-exclusion
  * on the combined sketch), which HLL sketches can't do without
  * re-scanning. Accuracy ~ 1/sqrt(k-2) relative error (k=256 → ~6%).
  * Input is a pre-hashed BIGINT (e.g. xxhash64(col)). */
class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Long] {

  private def toUnsignedDouble(h: Long): Double =
    h.toDouble - Long.MinValue.toDouble // shift to [0, 2^64)

  def zero: Array[Long] = Array.emptyLongArray

  /** Buffers are kept sorted by unsigned value, size ≤ k. */
  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    // sorted insert of the shifted (unsigned-comparable) value
    val v = h ^ Long.MinValue
    if (buf.length == k && v >= buf(buf.length - 1)) buf
    else {
      val i = java.util.Arrays.binarySearch(buf, v)
      if (i >= 0) buf // already present (exact duplicate hash)
      else {
        val at = -i - 1
        val out = new Array[Long](math.min(buf.length + 1, k))
        System.arraycopy(buf, 0, out, 0, at)
        if (at < out.length) {
          out(at) = v
          System.arraycopy(buf, at, out, at + 1,
            math.min(buf.length - at, out.length - at - 1))
        }
        out
      }
    }
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val merged = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) { merged(n) = a(i); i += 1 }
      else if (b(j) < a(i)) { merged(n) = b(j); j += 1 }
      else { merged(n) = a(i); i += 1; j += 1 } // dedup equal hashes
      n += 1
    }
    while (i < a.length) { merged(n) = a(i); i += 1; n += 1 }
    while (j < b.length) { merged(n) = b(j); j += 1; n += 1 }
    java.util.Arrays.copyOf(merged, math.min(n, k))
  }

  def finish(buf: Array[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else {
      // buffer holds hash ^ Long.MinValue; as a signed long that is the
      // hash's unsigned position minus 2^63, so shift once to [0, 2^64)
      val kth = toUnsignedDouble(buf(k - 1))
      val frac = kth / math.pow(2.0, 64)
      math.round((k - 1) / frac)
    }

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
