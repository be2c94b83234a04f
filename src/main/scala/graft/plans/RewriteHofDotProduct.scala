package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: recognize the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * over ARRAY<BIGINT> columns and replace it with the native codegen
  * expression [[graft.functions.DotLong]]. Users keep writing the
  * portable HOF form; plans get the tight primitive loop (the HOF pair
  * evaluates interpreted lambdas per element — measured 10-100× slower
  * on the similarity hot paths).
  *
  * Installed via GraftExtensions (spark.sql.extensions) or
  * `spark.experimental.extraOptimizations`. Semantics are identical on
  * ALL inputs: exact 64-bit integer math, and DotLong reproduces the HOF
  * null behavior bit-for-bit — NULL for a null array, for unequal
  * lengths (zip_with null-pads the shorter side, poisoning the sum), and
  * for any null element (verified by RuleSpec/ExpressionProps).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, mulMode),
                Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(Add(accRef: NamedLambdaVariable, vRef: NamedLambdaVariable, addMode),
              Seq(acc2: NamedLambdaVariable, v2: NamedLambdaVariable), _),
            LambdaFunction(finRef: NamedLambdaVariable, Seq(fin2: NamedLambdaVariable), _))
          if isLongArray(a) && isLongArray(b)
            && x1.exprId == x2.exprId && y1.exprId == y2.exprId
            && accRef.exprId == acc2.exprId && vRef.exprId == v2.exprId
            && finRef.exprId == fin2.exprId
            // TRY-mode arithmetic (NULL on overflow) is not reproduced
            // by DotLong — leave those plans untouched. Spark 4 wraps
            // the mode in NumericEvalContext(evalMode, ...), so compare
            // the inner evalMode (comparing the context itself to an
            // EvalMode is always false — the bug this guard had first).
            && mulMode.evalMode != EvalMode.TRY
            && addMode.evalMode != EvalMode.TRY =>
        // carry the matched arithmetic's eval mode: under Spark 4's
        // default ANSI the HOF throws on 64-bit overflow, so the
        // replacement must too — a wrapping DotLong would silently
        // return a wrong sum exactly where ANSI promises an error
        // (r4 review)
        graft.functions.DotLong(a, b,
          ansi = mulMode.evalMode == EvalMode.ANSI
            || addMode.evalMode == EvalMode.ANSI)
    }
}
