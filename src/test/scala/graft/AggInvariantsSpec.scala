package graft

import org.apache.spark.sql.functions._
import graft.ops.{Aggs, Q}

/** Bound invariants for the r8 aggregate additions — the inequalities
  * the oracle hash can't state as such. */
class AggInvariantsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("winsorize: thresholds inside the data range, clipped sum bounded, clip count small") {
    val out = Q.withCached(Aggs.aggWinsorize.build(spark, dir))(_.collect())
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val p05 = r.getAs[Long]("p05_micro")
      val p95 = r.getAs[Long]("p95_micro")
      val sumW = r.getAs[Long]("sum_winsorized_micro")
      val clipped = r.getAs[Long]("n_clipped")
      assert(p05 <= p95)
      // the winsorized sum lies in [n*p05, n*p95] by construction
      assert(sumW >= n * p05 && sumW <= n * p95,
        s"sum $sumW outside [${n * p05}, ${n * p95}]")
      // at most ~10% of rows clip (5% each tail, integer-rank slack)
      assert(clipped <= n / 10 + 2, s"clipped $clipped of $n")
    }
  }

  test("winsorized sum equals the plain sum when clipping is disabled by the data") {
    // degenerate check on a constant column: p05 == p95 == the value,
    // zero rows clip, sum preserved exactly
    val s = spark
    import s.implicits._
    val const = Seq.fill(100)(("k", 5000000L)).toDF("event_type", "v_micro")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
    val r = const
      .withColumn("rk", row_number().over(w.orderBy("v_micro")))
      .withColumn("n", count(lit(1)).over(w))
      .agg(min(when(col("rk") === expr("(n * 5 + 99) div 100"), col("v_micro"))).as("p05"),
        min(when(col("rk") === expr("(n * 95 + 99) div 100"), col("v_micro"))).as("p95"))
      .head()
    assert(r.getLong(0) == 5000000L && r.getLong(1) == 5000000L)
  }

  test("corr stats: moments satisfy Cauchy-Schwarz per group") {
    val out = Q.withCached(Aggs.aggCorrStats.build(spark, dir))(_.collect())
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = BigInt(r.getAs[Long]("n"))
      val sx = BigInt(r.getAs[Long]("sum_x")); val sy = BigInt(r.getAs[Long]("sum_y"))
      val sxy = BigInt(r.getAs[Long]("sum_xy"))
      val sx2 = BigInt(r.getAs[Long]("sum_x2")); val sy2 = BigInt(r.getAs[Long]("sum_y2"))
      val covN = n * sxy - sx * sy
      val varXN = n * sx2 - sx * sx
      val varYN = n * sy2 - sy * sy
      assert(varXN >= 0 && varYN >= 0)
      // (n·cov)² <= (n·varX)(n·varY) — exact integer Cauchy-Schwarz
      assert(covN * covN <= varXN * varYN,
        s"Cauchy-Schwarz violated: ${covN * covN} > ${varXN * varYN}")
    }
  }
}
