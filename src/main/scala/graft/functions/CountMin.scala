package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch as a mergeable typed Aggregator over pre-hashed
  * BIGINT keys: d×w counters flat in one Array[Long] (row r at
  * [r*w, (r+1)*w)), reduce bumps one counter per row, merge is
  * element-wise add — associative, so it flows through partial
  * aggregation like the bloom/KMV/MG sketches. Complements them:
  * KMV answers "how many distinct", MG answers "which are the top",
  * CM answers "how often does THIS key occur" for arbitrary keys in
  * O(d·w) memory — the turnstile-model frequency table a 100 TB
  * pipeline keeps where an exact per-key table would be another fact
  * table. Estimates are one-sided: est ≥ true count always; overshoot
  * per row is the row's collision mass (expected n/w), and the min
  * over d rows keeps it near that. Probe positions reuse BloomHash.pos
  * (murmur-finalizer mix per row — independent rows, and build/probe
  * cannot drift since both call the same method). */
class CountMinAgg(width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(width >= 2, "need width >= 2")
  // depth is NOT a parameter: the probe infers width as
  // length / CmEstimate.DEPTH, so a builder with any other depth would
  // silently mix counters across rows and break the one-sided
  // guarantee (code-review finding). One shared constant, no drift.
  private val depth = CmEstimate.DEPTH

  def zero: Array[Long] = new Array[Long](depth * width)

  def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + BloomHash.pos(hash, r, width)) += 1L
      r += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Native probe: `cm_estimate(sketch, hash)` = min over the d rows of
  * the probed counters. Width is inferred from the sketch length and
  * the fixed depth (companion DEPTH), so one expression serves any
  * width. Codegen calls the same BloomHash.pos as the builder. */
case class CmEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cm_estimate expects (ARRAY<BIGINT>, BIGINT), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cm_estimate"

  // sketch shorter than DEPTH (width 0) → NULL, not a modulo-zero crash
  override def nullable: Boolean = true

  override protected def nullSafeEval(sketchAny: Any, hashAny: Any): Any = {
    val sketch = sketchAny.asInstanceOf[ArrayData]
    val hash = hashAny.asInstanceOf[Long]
    val width = sketch.numElements() / CmEstimate.DEPTH
    if (width == 0) return null
    var est = Long.MaxValue
    var r = 0
    while (r < CmEstimate.DEPTH) {
      val v = sketch.getLong(r * width + BloomHash.pos(hash, r, width))
      if (v < est) est = v
      r += 1
    }
    est
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sketch, hash) => {
      val w = ctx.freshName("w")
      val r = ctx.freshName("r")
      val v = ctx.freshName("v")
      val est = ctx.freshName("est")
      val posFn = "graft.functions.BloomHash$.MODULE$.pos"
      s"""
         |final int $w = $sketch.numElements() / ${CmEstimate.DEPTH};
         |long $est = Long.MAX_VALUE;
         |if ($w == 0) { ${ev.isNull} = true; $est = -1L; } else {
         |  for (int $r = 0; $r < ${CmEstimate.DEPTH}; $r++) {
         |    final long $v = $sketch.getLong($r * $w + $posFn($hash, $r, $w));
         |    if ($v < $est) $est = $v;
         |  }
         |}
         |${ev.value} = $est;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimate =
    copy(left = newLeft, right = newRight)
}

object CmEstimate {
  /** Fixed sketch depth shared by builder instances and the probe. */
  val DEPTH = 4
}
