package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitters sketch as a typed Aggregator:
  * ≤ k-1 counters per buffer, O(k) memory regardless of stream length.
  *
  * Guarantee (the reason the downstream query can carry an EXACT
  * oracle): for any item with true frequency f over n total items, the
  * sketch retains it whenever f > n/k — each decrement event removes k
  * units of total count, so at most n/k decrements ever hit one key.
  * The merge (combine counts, then subtract the k-th largest combined
  * count and drop non-positives — Agarwal et al.'s mergeable-summaries
  * construction) preserves the same bound, which is what lets the
  * sketch flow through Spark's partial aggregation like a built-in:
  * per-partition sketches on the map side, one O(k) merge tree on the
  * reduce side, no shuffle of raw items. At 100 TB the candidate set
  * is k strings instead of a billion-row group-by; a second exact pass
  * over only the candidates (broadcast semi-join) removes the false
  * positives, so sketch + verify = exact heavy hitters.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k >= 2, "Misra-Gries needs k >= 2")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1)
      case None if buf.size < k - 1 => buf.updated(term, 1L)
      case None =>
        // decrement-all: one unit from each of the k-1 counters plus the
        // arriving item = k units of mass per eviction event
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k - 1) combined
    else {
      // subtract the k-th largest count from everything; at most k-1
      // values can strictly exceed it, so the result fits the budget
      val d = combined.values.toArray.sortInPlaceWith(_ > _).apply(k - 1)
      combined.view.mapValues(_ - d).filter(_._2 > 0).toMap
    }
  }

  /** Candidate keys only — counts are lower bounds and merge-order
    * dependent, so they never leave the sketch; the exact pass
    * re-counts. Sorted for deterministic output. */
  def finish(buf: Map[String, Long]): Array[String] =
    buf.keys.toArray.sorted

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
