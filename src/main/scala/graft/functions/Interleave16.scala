package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 32-bit Morton (Z-order) code from the low
  * 16 bits of two BIGINT dimensions — bit-interleaved so that sorting by
  * the result clusters rows that are close in BOTH dimensions into the
  * same file/row-group. This is the multi-dimensional data-layout
  * primitive behind `layout_zorder`: a table Z-ordered on (user, hour)
  * gives every per-file min/max footer a tight bounding BOX over both
  * columns, so a 100 TB scan filtered on either (or both) dimensions
  * skips most files — a linear sort only clusters its leading column.
  *
  * Deterministic pure bit arithmetic (the classic magic-number spread),
  * reproduced digit-for-digit by the oracle's shift/mask SQL; codegen'd
  * so the layout write stays inside WholeStageCodegen. Inputs outside
  * [0, 65535] fold via `& 0xFFFF` — callers bucket/clamp first (the
  * layout op derives both dims mod 2^16 explicitly). */
case class Interleave16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"interleave16 expects (BIGINT, BIGINT), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave16"

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    spread(x.asInstanceOf[Long]) | (spread(y.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      // identical spread for both operands, y's shifted up one bit
      def spreadCode(in: String, out: String): String =
        s"""
           |long $out = $in & 0xFFFFL;
           |$out = ($out | ($out << 8)) & 0x00FF00FFL;
           |$out = ($out | ($out << 4)) & 0x0F0F0F0FL;
           |$out = ($out | ($out << 2)) & 0x33333333L;
           |$out = ($out | ($out << 1)) & 0x55555555L;
         """.stripMargin
      spreadCode(x, sx) + spreadCode(y, sy) +
        s"${ev.value} = $sx | ($sy << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Interleave16 =
    copy(left = newLeft, right = newRight)
}
