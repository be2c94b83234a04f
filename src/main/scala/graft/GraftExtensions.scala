package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BloomContains, CmEstimate, DotLong, TokenizePos}

/** Production wiring for graft's native expressions:
  * `--conf spark.sql.extensions=graft.GraftExtensions` registers them in
  * every session (tests cover this path; the query builders also
  * self-register via GraftFunctions.register so a plain session works). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotLong(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("tokenize_pos"),
      new ExpressionInfo(classOf[TokenizePos].getName, "tokenize_pos"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenizePos(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomContains(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cm_estimate"),
      new ExpressionInfo(classOf[CmEstimate].getName, "cm_estimate"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CmEstimate(exprs(0), exprs(1))))
  }
}
