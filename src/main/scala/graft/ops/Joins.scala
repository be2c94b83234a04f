package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.C — joins. Scale notes per query:
  *  - C1 pins broadcast() on the dims: at 100 TB the fact side never
  *    shuffles; nation/region/customer-dims stay ≤ MBs.
  *  - C2 pre-aggregates lineitem on the join key BEFORE the join, so the
  *    shuffle carries one row per order instead of one per lineitem
  *    (map-side combine first) — the join then co-partitions two
  *    already-reduced sides.
  *  - C3-C5 shuffle on the equi key; left_semi/left_anti never materialize
  *    the right payload.
  *  - C6 is a broadcast nested-loop on the two tiny dims only.
  */
object Joins {

  /** C1 — dimension enrichment via broadcast hash joins. */
  val joinBroadcastDims: Q = Q(
    "join_broadcast_dims",
    """SELECT c_custkey, n_name, r_name
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    customer(s, dir)
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")
      .orderBy("c_custkey")
  }

  /** C2 — fact-to-fact equi join; lineitem pre-aggregated on the key. */
  val joinShuffleFact: Q = Q(
    "join_shuffle_fact",
    """SELECT o_orderkey, o_totalprice,
      |  CAST(SUM(CAST(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6))
      |      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))), 6) AS DECIMAL(18,6))
      |      * 1000000 AS BIGINT)) AS BIGINT) AS order_revenue_micro,
      |  COUNT(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey, o_totalprice
      |ORDER BY o_orderkey""".stripMargin
  ) { (s, dir) =>
    val rev = d6(col("l_extendedprice")) * (lit(1).cast("decimal(18,6)") - d6(col("l_discount")))
    val liAgg = lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(micro(rev)).as("order_revenue_micro"), count(lit(1)).as("n_items"))
    orders(s, dir)
      .join(liAgg, col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_totalprice", "order_revenue_micro", "n_items")
      .orderBy("o_orderkey")
  }

  /** C3 — left outer join keeping order-less customers (count = 0). */
  val joinLeftOuter: Q = Q(
    "join_left_outer",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(COALESCE(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)), 0)
      |    AS BIGINT) AS total_spent_micro
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    customer(s, dir)
      .join(orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(micro(col("o_totalprice"))), lit(0L)).as("total_spent_micro"))
      .orderBy("c_custkey")
  }

  /** C4 — left semi (EXISTS). */
  val joinSemi: Q = Q(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    customer(s, dir)
      .join(orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** C5 — left anti (NOT EXISTS). */
  val joinAnti: Q = Q(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    customer(s, dir)
      .join(orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** C6 — cross join + theta residual on tiny dims (BNLJ). */
  val joinCrossTheta: Q = Q(
    "join_cross_theta",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |WHERE r_regionkey <> n_regionkey
      |ORDER BY r_name, n_name""".stripMargin
  ) { (s, dir) =>
    region(s, dir)
      .crossJoin(nation(s, dir))
      .where(col("r_regionkey") =!= col("n_regionkey"))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")
  }

  /** C7 — interval/range join: purchases within 2h after a signup, same
    * user. Equi on user_id + time-range residual → SMJ on user_id with
    * the range applied as a join residual; the streaming twin (H7) is a
    * stream-stream join with symmetric watermarks. All time math in
    * epoch µs (engine-identical). */
  val joinRangeInterval: Q = Q(
    "join_range_interval",
    """SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id,
      |  epoch_us(p.ts) - epoch_us(s.ts) AS delay_us
      |FROM (SELECT * FROM events WHERE event_type = 'signup') s
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON s.user_id = p.user_id
      | AND epoch_us(p.ts) >  epoch_us(s.ts)
      | AND epoch_us(p.ts) <= epoch_us(s.ts) + 7200000000
      |ORDER BY signup_id, purchase_id""".stripMargin
  ) { (s, dir) =>
    val ev = events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
    val sg = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"), col("ts_us").as("s_us"))
    val pu = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts_us").as("p_us"))
    sg.join(pu, col("s_user") === col("p_user")
        && col("p_us") > col("s_us")
        && col("p_us") <= col("s_us") + lit(7200000000L))
      .select(col("s_user").as("user_id"), col("signup_id"), col("purchase_id"),
        (col("p_us") - col("s_us")).as("delay_us"))
      .orderBy("signup_id", "purchase_id")
  }

  /** C8 — as-of join emulation: for each 'error' event, the most recent
    * strictly-prior event of the same user (any type), ties on µs broken
    * by event_id. Spark has no native ASOF; the lag-window form costs one
    * shuffle+sort per user partition and is identical SQL in the oracle
    * (DuckDB's ASOF JOIN has different tie semantics, so we pin our own).
    * Scale path: range-partition by user, sort within partition — exactly
    * what the window translates to. */
  val joinAsof: Q = Q(
    "join_asof",
    """SELECT event_id, user_id, ts_us, prev_id, prev_type, prev_us FROM (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
      |    lag(event_id)   OVER w AS prev_id,
      |    lag(event_type) OVER w AS prev_type,
      |    lag(epoch_us(ts)) OVER w AS prev_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |) t WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .where(col("event_type") === "error")
      .select("event_id", "user_id", "ts_us", "prev_id", "prev_type", "prev_us")
      .orderBy("event_id")
  }

  /** C8b — the same as-of semantics through the custom whole-operator
    * path: graft.plans.AsOfJoinPlan/-Exec (LogicalPlan + Strategy +
    * physical merge join; one hash exchange + sort per side, single
    * buffered right row of state — see AsOfJoin scaladoc for why this
    * beats the window/range-join compositions at scale). Same oracle
    * semantics as C8. */
  val joinAsofNative: Q = Q(
    "join_asof_native",
    """SELECT event_id, user_id, ts_us, prev_id, prev_type, prev_us FROM (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
      |    lag(event_id)   OVER w AS prev_id,
      |    lag(event_type) OVER w AS prev_type,
      |    lag(epoch_us(ts)) OVER w AS prev_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |) t WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    val ev = events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
    val lft = ev.where(col("event_type") === "error")
      .select("event_id", "user_id", "ts_us")
    val rgt = ev.select(col("user_id").as("r_user"), col("ts_us").as("prev_us"),
      col("event_id").as("prev_id"), col("event_type").as("prev_type"))
    graft.plans.AsOfJoin.asof(lft, rgt,
        "user_id", "ts_us", "event_id", "r_user", "prev_us", "prev_id")
      .select("event_id", "user_id", "ts_us", "prev_id", "prev_type", "prev_us")
      .orderBy("event_id")
  }

  /** C9 — FULL OUTER join: BUILDING-segment customers vs per-customer
    * order counts. Both null sides are exercised — customers without
    * orders (null right) and orders from non-BUILDING customers (null
    * left). Same shuffle shape as the inner fact join; at 100 TB full
    * outer cannot broadcast either side, so the plan MUST be a
    * shuffle-hash/sort-merge on the key — which is what Spark picks. */
  val joinFullOuter: Q = Q(
    "join_full_outer",
    """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
      |  c.c_name, o.n_orders
      |FROM (SELECT c_custkey, c_name FROM customer
      |      WHERE c_mktsegment = 'BUILDING') c
      |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders
      |                 FROM orders GROUP BY o_custkey) o
      |  ON c.c_custkey = o.o_custkey
      |ORDER BY custkey""".stripMargin
  ) { (s, dir) =>
    val c = customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name")
    val o = orders(s, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_orders"))
      .orderBy("custkey")
  }

  /** C10 — the composed star-schema query (TPC-H Q5 shape): six-table
    * join + filtered fact scan + grouped aggregate, the workload the
    * relational core exists for. Written fully declaratively so
    * Catalyst chooses the physical shape; at sf the expected plan is
    * broadcast hash joins for supplier/nation/region (small dims), a
    * shuffle join between orders and lineitem (the two facts), and the
    * o_orderdate + r_name filters pushed into the scans (AQE is free to
    * reorder — that freedom is the point of staying declarative; the
    * co-nationality predicate c_nationkey = s_nationkey rides on the
    * lineitem-supplier equi join). Revenue in exact micro-units. */
  val joinStarSchema: Q = Q(
    "join_star_schema",
    """SELECT n_name,
      |  CAST(SUM(CAST(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6))
      |      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))), 6) AS DECIMAL(18,6))
      |      * 1000000 AS BIGINT)) AS BIGINT) AS revenue_micro,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin
  ) { (s, dir) =>
    val rev = d6(col("l_extendedprice")) * (lit(1).cast("decimal(18,6)") - d6(col("l_discount")))
    customer(s, dir)
      .join(orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .join(region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA"
        && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("n_name")
      .agg(sum(micro(rev)).as("revenue_micro"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** C11 — salted equi join, oracle-checked against the PLAIN join:
    * the join-side skew pattern (complement of agg_salted_hotkey).
    * The big side is salted into 8 sub-keys and the small side
    * replicated per salt, so one hot key spreads over 8 reducers.
    * Salting must not change the result — the oracle is the unsalted
    * join — and the aggregate on top makes the check exact.
    *
    * vs AQE (r7, PLANS.md §C11-AQE): at scale reach for
    * `spark.sql.adaptive.skewJoin` FIRST — it splits oversized shuffle
    * partitions at runtime with no query rewrite, and PartitionSpec
    * pins that it engages on this build. Manual salting remains the
    * right tool exactly when AQE's split can't apply: the skewed join
    * never shuffles its small side (broadcast / stream-static),
    * the skew is on an AGGREGATION key (D13 — AQE splits join
    * partitions only), or a deterministic plan-time layout is required. */
  val joinSaltedSkew: Q = Q(
    "join_salted_skew",
    """SELECT s_suppkey, s_name,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_qty_micro,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin
  ) { (s, dir) =>
    Salted.saltedEquiJoin(lineitem(s, dir), supplier(s, dir), "l_suppkey", "s_suppkey")
      .groupBy("s_suppkey", "s_name")
      .agg(sum(micro(col("l_quantity"))).as("sum_qty_micro"),
        count(lit(1)).as("n_items"))
      .orderBy("s_suppkey")
  }

  /** C12 — shipping-priority top-k (TPC-H Q3 shape): segment-filtered
    * customer ⋈ orders ⋈ lineitem, grouped revenue, global top-10.
    * The limit sits on the aggregate, so the plan finishes with
    * TakeOrderedAndProject — per-partition top-10 merged at the driver,
    * never a full sort of the grouped output. Deterministic tie-break
    * on o_orderkey keeps the oracle exact. */
  val joinPriorityTopk: Q = Q(
    "join_priority_topk",
    """SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6))
      |      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))), 6) AS DECIMAL(18,6))
      |      * 1000000 AS BIGINT)) AS BIGINT) AS revenue_micro
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue_micro DESC, o_orderkey LIMIT 10""".stripMargin
  ) { (s, dir) =>
    val rev = d6(col("l_extendedprice")) * (lit(1).cast("decimal(18,6)") - d6(col("l_discount")))
    customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      .join(orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(micro(rev)).as("revenue_micro"))
      .orderBy(col("revenue_micro").desc, col("o_orderkey"))
      .limit(10)
  }

  /** C13 (r8) — INTERVAL-OVERLAP join (ranges × ranges; C7 is
    * point-in-range): click windows vs purchase windows of the same
    * user that overlap in time, strict half-open semantics
    * (a.s < b.e ∧ b.s < a.e). The REGISTERED plan is the scale
    * strategy itself, not a theta join: each 2-hour interval explodes
    * to the ≤3 hour buckets it touches, candidates come from an
    * EQUI-join on (user, hour_bucket) — partitionable, no BNLJ —
    * deduped (an overlapping pair can co-occupy up to 3 buckets) and
    * exact-verified. Candidates are bounded by true temporal
    * co-locality (pairs in the same hour), never |A|×|B|; bucket width
    * tunes the candidate/duplication trade exactly like LSH band
    * width. The oracle is the naive theta join — output equality IS
    * the proof the bucketed rewrite loses nothing. */
  val joinIntervalOverlap: Q = Q(
    "join_interval_overlap",
    """WITH a AS (SELECT event_id AS a_id, user_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + 7200000000 AS e
      |  FROM events WHERE event_type = 'click'),
      |b AS (SELECT event_id AS b_id, user_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + 7200000000 AS e
      |  FROM events WHERE event_type = 'purchase')
      |SELECT a.a_id, b.b_id,
      |  CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) AS overlap_us
      |FROM a JOIN b ON a.user_id = b.user_id AND a.s < b.e AND b.s < a.e
      |ORDER BY a_id, b_id""".stripMargin
  ) { (s, dir) =>
    val us = 3600L * 1000000L // one bucket = one hour of microseconds
    def side(tpe: String, idAs: String) = events(s, dir)
      .where(col("event_type") === tpe)
      .select(col("event_id").as(idAs), col("user_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + lit(7200000000L)).as("e"))
    val a = side("click", "a_id")
      .select(col("a_id"), col("user_id"), col("s").as("a_s"), col("e").as("a_e"),
        explode(expr(s"sequence(s div $us, (e - 1) div $us)")).as("hb"))
    val b = side("purchase", "b_id")
      .select(col("b_id"), col("user_id"), col("s").as("b_s"), col("e").as("b_e"),
        explode(expr(s"sequence(s div $us, (e - 1) div $us)")).as("hb"))
    a.join(b, Seq("user_id", "hb"))
      .where(col("a_s") < col("b_e") && col("b_s") < col("a_e")) // exact verify
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .as("overlap_us"))
      .distinct() // a pair can co-occupy up to 3 hour buckets
      .orderBy("a_id", "b_id")
  }

  def all: Seq[Q] = Seq(joinBroadcastDims, joinShuffleFact, joinLeftOuter,
    joinSemi, joinAnti, joinCrossTheta, joinRangeInterval, joinAsof,
    joinAsofNative, joinFullOuter, joinStarSchema, joinSaltedSkew,
    joinPriorityTopk, joinIntervalOverlap)
}
