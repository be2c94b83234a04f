package graft

import org.apache.spark.sql.functions._

import graft.plans.RewriteHofDotProduct

/** The custom optimizer rule: HOF dot products over ARRAY<BIGINT> are
  * rewritten to the native DotLong expression, with identical results. */
class RuleSpec extends SparkSpec {

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  private def arrays = spark.range(50).select(
    expr("transform(sequence(0, 31), d -> id * 31 + d)").as("a"),
    expr("transform(sequence(0, 31), d -> (id + 7) * (d + 2))").as("b"))

  test("RewriteHofDotProduct swaps the HOF pattern for dot_long") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    try {
      val df = arrays.select(expr(hof).as("dot"))
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotLong])),
        s"expected DotLong in optimized plan:\n$optimized")
      // and the rewritten plan computes the same values as the raw HOF
      val native = df.collect().map(_.getLong(0)).toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofDotProduct)
      val plain = arrays.select(expr(hof).as("dot")).collect().map(_.getLong(0)).toSeq
      assert(native == plain)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofDotProduct)
    }
  }

  test("rule leaves non-matching aggregates alone (double arrays)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    try {
      val df = spark.range(5).select(
        expr("transform(sequence(0, 3), d -> cast(d as double))").as("a"),
        expr("transform(sequence(0, 3), d -> cast(d as double))").as("b"))
        .select(expr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)").as("dot"))
      assert(!df.queryExecution.optimizedPlan.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotLong])))
      assert(df.collect().map(_.getDouble(0)).toSeq == Seq.fill(5)(14.0))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofDotProduct)
    }
  }

  test("rewritten dot product preserves ANSI overflow behavior") {
    // r4 review: under Spark 4's default ANSI mode the HOF throws on
    // 64-bit overflow; the rewrite must not silently wrap instead. The
    // rule carries the matched evalMode into DotLong(ansi = true).
    assume(spark.conf.get("spark.sql.ansi.enabled") == "true")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    try {
      val big = spark.sql(
        s"SELECT array(${Long.MaxValue}L) AS a, array(2L) AS b")
      val df = big.select(expr(hof).as("dot"))
      assert(df.queryExecution.optimizedPlan.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotLong])), "rewrite did not fire")
      val e = intercept[Throwable](df.collect())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(e).exists(c => Option(c.getMessage).exists(
        _.toLowerCase.contains("overflow"))),
        s"expected long-overflow error, got: $e")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofDotProduct)
    }
  }
}
