package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.A — scans. Scale note: both queries are single-stage scans; A1's
  * ORDER BY+LIMIT compiles to TakeOrderedAndProject (top-k per partition,
  * no global sort), A2's predicate reaches the parquet reader
  * (PushedFilters on l_shipdate/l_discount) so row groups outside the
  * date range are skipped entirely at 100 TB. */
object Scans {

  /** A1 — projection + column pruning. */
  val scanParquetProject: Q = Q(
    "scan_parquet_project",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 500""".stripMargin
  ) { (s, dir) =>
    lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      .limit(500)
  }

  /** A2 — predicate pushdown to parquet row groups. */
  val scanFilterPushdown: Q = Q(
    "scan_filter_pushdown",
    """SELECT l_orderkey, l_linenumber, l_discount, l_shipdate FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |ORDER BY l_orderkey, l_linenumber, l_discount, l_shipdate""".stripMargin
  ) { (s, dir) =>
    lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07))
      .select("l_orderkey", "l_linenumber", "l_discount", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber", "l_discount", "l_shipdate")
  }

  def all: Seq[Q] = Seq(scanParquetProject, scanFilterPushdown)
}
