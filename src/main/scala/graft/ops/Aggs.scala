package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.D — aggregation operators. All money math follows the Tables.scala
  * determinism policy: DECIMAL(18,6) inputs, products ≤ DECIMAL(38,12),
  * explicit ROUND-then-CAST in the DuckDB twins, integer micro-unit
  * averages. Scale note (100 TB): every query here is a single hash
  * aggregate — partial (map-side) + final after one shuffle on the group
  * keys; group cardinality is tiny relative to input so the shuffle is
  * the partial-agg output, not the fact table. */
object Aggs {

  /** D1 — TPC-H Q1 analog (pricing summary). */
  val aggPricingSummary: Q = Q(
    "agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
      |      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 6) AS DECIMAL(38,6)) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6))
      |      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))), 6) AS DECIMAL(18,6))
      |      * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6)))), 6) AS DECIMAL(38,6)) AS sum_charge,
      |  (2*SUM(CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT)) + COUNT(*)) // (2*COUNT(*)) AS avg_qty_micro,
      |  (2*SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)) + COUNT(*)) // (2*COUNT(*)) AS avg_price_micro,
      |  (2*SUM(CAST(CAST(l_discount AS DECIMAL(18,6)) * 1000000 AS BIGINT)) + COUNT(*)) // (2*COUNT(*)) AS avg_disc_micro,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    val l = lineitem(s, dir)
    val disc1 = lit(1).cast("decimal(18,6)") - d6(col("l_discount"))
    val rev = d6(col("l_extendedprice")) * disc1 // exact DECIMAL(38,12)
    val rev6 = rev.cast("decimal(18,6)") // HALF_UP == DuckDB ROUND(,6)
    val charge = rev6 * (lit(1).cast("decimal(18,6)") + d6(col("l_tax")))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        out6(sum(d6(col("l_quantity")))).as("sum_qty"),
        out6(sum(d6(col("l_extendedprice")))).as("sum_base_price"),
        out6(sum(rev)).as("sum_disc_price"),
        out6(sum(charge)).as("sum_charge"),
        sum(micro(col("l_quantity"))).as("sq_micro"),
        sum(micro(col("l_extendedprice"))).as("sp_micro"),
        sum(micro(col("l_discount"))).as("sd_micro"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty_micro", avgMicroExpr("sq_micro", "count_order"))
      .withColumn("avg_price_micro", avgMicroExpr("sp_micro", "count_order"))
      .withColumn("avg_disc_micro", avgMicroExpr("sd_micro", "count_order"))
      .drop("sq_micro", "sp_micro", "sd_micro")
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** D2 — exact distinct counts (Expand + two-phase agg under the hood).
    * Scale note: count(DISTINCT x) forces a shuffle on (group, x); at
    * 100 TB prefer D3's approx_count_distinct unless exactness is
    * contractual. */
  val aggDistinctExact: Q = Q(
    "agg_distinct_exact",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, dir) =>
    lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** D7 — post-aggregation filter (HAVING). The avg threshold is an
    * exact integer comparison on micro-units — no decimal division. */
  val aggHaving: Q = Q(
    "agg_having",
    """SELECT c_nationkey, COUNT(*) AS n_cust,
      |  (2*SUM(CAST(CAST(c_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT)) + COUNT(*)) // (2*COUNT(*)) AS avg_bal_micro
      |FROM customer
      |GROUP BY c_nationkey
      |HAVING COUNT(*) > 2
      |   AND SUM(CAST(CAST(c_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT)) > 4000000000 * COUNT(*)
      |ORDER BY c_nationkey""".stripMargin
  ) { (s, dir) =>
    customer(s, dir)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        sum(micro(col("c_acctbal"))).as("bal_micro"))
      .where(col("n_cust") > 2 && col("bal_micro") > lit(4000000000L) * col("n_cust"))
      .withColumn("avg_bal_micro", avgMicroExpr("bal_micro", "n_cust"))
      .drop("bal_micro")
      .orderBy("c_nationkey")
  }

  def all: Seq[Q] = Seq(aggPricingSummary, aggDistinctExact, aggHaving)
}
