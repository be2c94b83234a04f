package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.F — sort / limit / set operations. F1 compiles to
  * TakeOrderedAndProject (per-partition top-k, no global sort — the
  * property that matters at 100 TB). Set ops shuffle on the full row;
  * all operands here are single pruned columns. */
object SetSort {

  /** F1 — multi-key global ORDER BY + LIMIT (top-k). */
  val sortMultikeyLimit: Q = Q(
    "sort_multikey_limit",
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin
  ) { (s, dir) =>
    orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** F2 — explicit NULL ordering over a left join (Spark defaults to
    * nulls-first on ASC, DuckDB to nulls-last — always spelled out). */
  val sortNullsOrdering: Q = Q(
    "sort_nulls_ordering",
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |ORDER BY o_totalprice ASC NULLS FIRST, c_custkey, o_orderkey NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    customer(s, dir)
      .join(orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .select("c_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").asc_nulls_first, col("c_custkey").asc,
        col("o_orderkey").asc_nulls_first)
  }

  /** F3 — UNION with dedup (stream fan-in analog). */
  val setUnionDistinct: Q = Q(
    "set_union_distinct",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    val c = customer(s, dir)
    c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .union(c.where(col("c_mktsegment") === "MACHINERY").select("c_custkey"))
      .distinct()
      .orderBy("c_custkey")
  }

  /** F4 — INTERSECT. */
  val setIntersect: Q = Q(
    "set_intersect",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    val c = customer(s, dir)
    c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .intersect(c.where(col("c_acctbal") > 5000).select("c_custkey"))
      .orderBy("c_custkey")
  }

  /** F5 — EXCEPT. */
  val setExcept: Q = Q(
    "set_except",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    val c = customer(s, dir)
    c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .except(c.where(col("c_acctbal") > 5000).select("c_custkey"))
      .orderBy("c_custkey")
  }

  /** F6 — INTERSECT ALL (multiset semantics: duplicates kept up to the
    * min multiplicity on each side). Input sides project non-unique
    * keys so multiplicities actually differ from the distinct form. */
  val setIntersectAll: Q = Q(
    "set_intersect_all",
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      |ORDER BY o_custkey""".stripMargin
  ) { (s, dir) =>
    val o = orders(s, dir)
    o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .intersectAll(o.where(col("o_orderpriority") === "2-HIGH").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** F7 — EXCEPT ALL (multiset difference: each match cancels ONE
    * occurrence). */
  val setExceptAll: Q = Q(
    "set_except_all",
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      |ORDER BY o_custkey""".stripMargin
  ) { (s, dir) =>
    val o = orders(s, dir)
    o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .exceptAll(o.where(col("o_orderpriority") === "2-HIGH").select("o_custkey"))
      .orderBy("o_custkey")
  }

  def all: Seq[Q] = Seq(sortMultikeyLimit, sortNullsOrdering,
    setUnionDistinct, setIntersect, setExcept, setIntersectAll, setExceptAll)
}
