package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: intersection CARDINALITY of two SORTED
  * string arrays — `inter_count_sorted(a, b) = |set(a) ∩ set(b)|`.
  *
  * Why a custom Expression instead of `size(array_intersect(a, b))`:
  * ArrayIntersect builds a hash set per invocation and materializes the
  * intersection array just to take its length — measured as the
  * single-task hot spot of the all-pairs Jaccard at bench scale (25M
  * pairs at sf0.1). This expression is a branch-light two-pointer merge
  * over the already-sorted arrays inside WholeStageCodegen: no per-call
  * allocation, no materialized intersection, ~|a|+|b| binary UTF8
  * comparisons per pair via UTF8String.binaryCompare — the same binary
  * order Spark's array_sort produces. binaryCompare, NOT compareTo:
  * Spark 4's compareTo calls SparkEnvUtils.isTesting → System.getenv on
  * EVERY invocation (a collation-era assertion hook), which turns a
  * ~20ns comparison into ~1µs and made the 25M-pair all-pairs run
  * minutes instead of seconds (measured via thread dump: all 32
  * executors inside ProcessEnvironment.hashCode under compareTo).
  *
  * Contract: inputs must be duplicate-free and sorted ascending
  * (array_sort(array_distinct(...))); NULL for a null array or a null
  * element (split() token arrays contain neither — defensive only).
  * Counting (not materializing) makes the result independent of element
  * order conventions, so the DuckDB oracle can use list_intersect
  * freely. */
case class InterCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"inter_count_sorted expects two ARRAY<STRING> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "inter_count_sorted"
  // may return NULL for non-null inputs (null element)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val c = x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  int $c = $a.getUTF8String($i).binaryCompare($b.getUTF8String($j));
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $cnt; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterCountSorted =
    copy(left = newLeft, right = newRight)
}
