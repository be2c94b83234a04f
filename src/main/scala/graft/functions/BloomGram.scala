package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Shared probe-position scheme for the bloom build (Aggregator) and
  * probe (expression): position i = fmix64(h + i*golden) mod m, where
  * fmix64 is the murmur3 finalizer. A full mix per probe (rather than
  * Kirsch-Mitzenmacher's arithmetic progression h + i*h2) costs two
  * extra multiplies but makes the K positions effectively independent —
  * the AP variant measured ~4.5% FP where theory for independent
  * probes says ~0.1% (AP probes of members and non-members overlap
  * structurally when their steps collide mod m). Pure integer
  * arithmetic on the sha256-derived gram hash; the generated code calls
  * THIS method, so build and probe cannot drift. */
object BloomHash {
  val K = 7 // probe count; with m=2^16 bits good to ~5k keys at <1% FP

  def pos(hash: Long, i: Int, m: Int): Int = {
    var z = hash + i.toLong * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 33)) * 0xFF51AFD7ED558CCDL
    z = (z ^ (z >>> 33)) * 0xC4CEB9FE1A85EC53L
    z ^= z >>> 33
    ((z & Long.MaxValue) % m).toInt
  }
}

/** Mergeable bloom-filter build as a typed Aggregator over pre-hashed
  * BIGINT keys: the buffer is the bit array itself (m bits as m/64
  * longs), reduce sets K bits, merge is a bitwise OR — fully
  * associative, so partial aggregation builds per-partition filters
  * map-side and the reduce side ORs ~numPartitions fixed-size arrays.
  * At 100 TB the filter's size is a constant (here 8 KiB) regardless of
  * input rows — the broadcast-a-prefilter primitive for
  * decontamination, semi-join pruning, and dirty-key skipping. */
class BloomGramAgg(mBits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive multiple of 64")

  def zero: Array[Long] = new Array[Long](mBits / 64)

  def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    var i = 0
    while (i < BloomHash.K) {
      val p = BloomHash.pos(hash, i, mBits)
      buf(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** [[BloomGramAgg]] over a NULLABLE feed (r15): a None (SQL NULL) input
  * contributes nothing — the same semantics as the `WHERE col IS NOT
  * NULL` the per-column sidecar writers used to apply, expressed inside
  * the aggregator so the ONE-PASS sidecar aggregation (every stats and
  * bloom column of a fresh snapshot in a single job) needs no per-column
  * filter. Bit-identical output to BloomGramAgg over the filtered feed. */
class BloomGramAggNullable(mBits: Int)
    extends Aggregator[Option[Long], Array[Long], Array[Long]] {
  private val inner = new BloomGramAgg(mBits)
  def zero: Array[Long] = inner.zero
  def reduce(buf: Array[Long], hash: Option[Long]): Array[Long] =
    hash.fold(buf)(inner.reduce(buf, _))
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  def finish(buf: Array[Long]): Array[Long] = buf
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Native probe: `bloom_contains(bits, hash)` — true iff all K probe
  * bits are set. Stays inside WholeStageCodegen (no per-row array
  * materialization, no lambda): the generated code reads K words
  * straight out of the UnsafeArrayData. m is derived from the array
  * length, so the same expression serves any filter size. One-sided
  * error: may return true for an absent key (false positive, removed
  * by the exact verify stage downstream), never false for a present
  * one. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (ARRAY<BIGINT>, BIGINT), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  // empty bits array → NULL (not a modulo-zero crash in user SQL)
  override def nullable: Boolean = true

  override protected def nullSafeEval(bitsAny: Any, hashAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[ArrayData]
    val hash = hashAny.asInstanceOf[Long]
    val m = bits.numElements() * 64
    if (m == 0) return null
    var i = 0
    while (i < BloomHash.K) {
      val p = BloomHash.pos(hash, i, m)
      if ((bits.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, hash) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val ok = ctx.freshName("ok")
      val posFn = "graft.functions.BloomHash$.MODULE$.pos"
      s"""
         |final int $m = $bits.numElements() * 64;
         |boolean $ok = true;
         |if ($m == 0) { ${ev.isNull} = true; } else {
         |  for (int $i = 0; $i < ${BloomHash.K}; $i++) {
         |    final int $p = $posFn($hash, $i, $m);
         |    if (($bits.getLong($p >>> 6) & (1L << ($p & 63))) == 0L) { $ok = false; break; }
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
