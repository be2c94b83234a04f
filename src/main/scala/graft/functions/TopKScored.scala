package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate inside the bounded top-k fold. */
final case class Scored(score: Double, id: Long)

/** Bounded-heap per-group top-k (r8 verdict item 2): a typed Aggregator
  * that keeps the k best (score, id) pairs under the total order
  * (score DESC, id ASC) — the same order every ANN ranking window in
  * this repo used, so swapping it in is result-identical.
  *
  * Why an Aggregator and not `row_number().over(partitionBy(query))`:
  * the window form SORTS each query's whole candidate set in one task —
  * for flat-PQ pre-rank that is the entire corpus per query. An
  * Aggregator is partial-aggregatable: every map task folds its own
  * candidates into a ≤k-element buffer, the shuffle carries ONE ≤k
  * buffer per (group × map task) instead of every candidate row, and
  * the final merge is a k-bounded sorted-array merge. Per-group state
  * is O(k) by construction — no per-group sort ever materializes, at
  * any corpus size (the ObjectHashAggregate path, same as the sketch
  * aggregators).
  *
  * Determinism: the order is total (ids are unique within a group;
  * score ties break on id), insert and merge preserve it, so the
  * result is independent of partitioning and arrival order — the
  * partition-invariance sweep covers every query built on this.
  * Scores must be non-NaN (ANN cosines are finite by construction;
  * a NaN would poison any comparison-based top-k, window form
  * included). */
final class TopKScored(k: Int)
    extends Aggregator[Scored, Array[Scored], Array[Scored]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  /** Strict "ranks ahead of": score desc, id asc. */
  private def ahead(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Array[Scored] = Array.empty

  override def reduce(buf: Array[Scored], a: Scored): Array[Scored] =
    if (buf.length >= k && !ahead(a, buf(buf.length - 1))) buf
    else {
      // binary search for a's slot in the (score desc, id asc) order
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ahead(buf(mid), a)) lo = mid + 1 else hi = mid
      }
      val n = math.min(buf.length + 1, k)
      val out = new Array[Scored](n)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = a
      System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
      out
    }

  override def merge(x: Array[Scored], y: Array[Scored]): Array[Scored] = {
    val n = math.min(x.length + y.length, k)
    val out = new Array[Scored](n)
    var i = 0
    var j = 0
    var o = 0
    while (o < n) {
      if (j >= y.length || (i < x.length && ahead(x(i), y(j)))) {
        out(o) = x(i); i += 1
      } else {
        out(o) = y(j); j += 1
      }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Scored]): Array[Scored] = buf
  override def bufferEncoder: Encoder[Array[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Scored]] = ExpressionEncoder()
}

object TopKScored {

  /** The aggregate as a Column: `topk(k)(score, id)` yields the ordered
    * array<struct<score,id>> of the group's k best. */
  def topk(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKScored(k)).apply(score, id)

  /** The shared ranking tail every ANN query ends with: group `df` by
    * `groupCol`, keep the k best (score, id), and explode back to
    * (groupCol, idName, rank ∈ 1..k BIGINT) — exactly the schema the
    * former `row_number <= k` windows produced, position in the ordered
    * buffer IS the rank. */
  def rankedTopk(df: DataFrame, groupCol: String, score: Column, id: Column,
      k: Int, idName: String = "neighbor_id"): DataFrame =
    df.groupBy(groupCol)
      .agg(topk(k)(score, id).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col(groupCol), col("s.id").as(idName),
        (col("pos") + 1).cast("bigint").as("rank"))
}
