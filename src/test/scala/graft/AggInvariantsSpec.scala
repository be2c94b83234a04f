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

  test("winsorize engine on a constant column: nothing clips, sum preserved exactly") {
    // degenerate input through THE production engine (not a re-derived
    // copy of its rank math — r8 review): constant values mean
    // p05 == p95 == the value, zero clipped rows, winsorized sum ==
    // the plain sum
    val s = spark
    import s.implicits._
    val const = Seq.fill(100)(("k", 5000000L)).toDF("event_type", "v_micro")
    val r = Q.withCached(Aggs.winsorizeEngine(const))(_.head())
    assert(r.getAs[Long]("p05_micro") == 5000000L)
    assert(r.getAs[Long]("p95_micro") == 5000000L)
    assert(r.getAs[Long]("n_clipped") == 0L)
    assert(r.getAs[Long]("sum_winsorized_micro") == 100L * 5000000L)
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
