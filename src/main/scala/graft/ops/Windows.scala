package graft.ops

import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.E — window functions. Ranking outputs are cast to BIGINT (Spark
  * returns INT, DuckDB BIGINT). events.ts is carried as epoch
  * microseconds BIGINT (both engines truncate the ns source to µs
  * identically). Scale note: every window here partitions by a
  * high-cardinality key (custkey/user_id), so state per partition is
  * small and the single shuffle per window spec is unavoidable-minimal;
  * E1's rank<=3 filter happens before the final sort. */
object Windows {

  /** E1 — top-3 orders per customer by (totalprice DESC, orderkey). */
  val windowTopkPerGroup: Q = Q(
    "window_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** E2 — rank / dense_rank / ntile per market segment. */
  val windowRankDenseNtile: Q = Q(
    "window_rank_dense_ntile",
    """SELECT c_custkey, c_mktsegment,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |  CAST(ntile(4) OVER w AS BIGINT) AS tile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        rank().over(w).cast("bigint").as("rnk"),
        dense_rank().over(w).cast("bigint").as("drnk"),
        ntile(4).over(w).cast("bigint").as("tile"))
      .orderBy("c_mktsegment", "rnk", "c_custkey")
  }

  /** E3 — running sum (rows frame, exact micro-unit BIGINT; DuckDB's
    * windowed SUM(BIGINT) is HUGEINT → CAST back in the oracle). */
  val windowRunningSum: Q = Q(
    "window_running_sum",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_spend_micro
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(micro(col("o_totalprice"))).over(w).as("running_spend_micro"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E4 — lag/lead over the event stream (epoch-µs arithmetic). */
  val windowLagLead: Q = Q(
    "window_lag_lead",
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  lag(epoch_us(ts)) OVER w AS prev_us,
      |  lead(epoch_us(ts)) OVER w AS next_us,
      |  (epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000 AS gap_s
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .withColumn("gap_s", expr("(ts_us - prev_us) div 1000000"))
      .select("user_id", "event_id", "ts_us", "prev_us", "next_us", "gap_s")
      .orderBy("user_id", "event_id")
  }

  /** E5 — range frame: events per user in the preceding 600 s (inclusive
    * of peers at the same second). Epoch-seconds BIGINT range keys —
    * identical RANGE semantics in both engines. */
  val windowRangeFrame: Q = Q(
    "window_range_frame",
    """SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ts_s,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
      |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_prec_600s
      |FROM events ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-600, 0)
    events(s, dir)
      .withColumn("ts_s", expr("unix_micros(ts) div 1000000"))
      .withColumn("n_prec_600s", count(lit(1)).over(w))
      .select("user_id", "event_id", "ts_s", "n_prec_600s")
      .orderBy("event_id")
  }

  /** E6 — first_value/last_value over the full-partition frame. */
  val windowFirstLast: Q = Q(
    "window_first_last",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  last_value(o_orderkey) OVER w AS last_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E7 — percent_rank / cume_dist: relative-position analytics. Both
    * are ratios of small integers computed in IEEE double ((rank-1)/
    * (n-1), n_le/n) — bit-identical across engines, so the DOUBLE
    * outputs hash-match directly. */
  val windowPercentRank: Q = Q(
    "window_percent_rank",
    """SELECT o_custkey, o_orderkey,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_custkey", "o_orderkey")
  }

  def all: Seq[Q] = Seq(windowTopkPerGroup, windowRankDenseNtile,
    windowRunningSum, windowLagLead, windowRangeFrame, windowFirstLast,
    windowPercentRank)
}
