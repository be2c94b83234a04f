package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.A — scans. Scale note: both queries are single-stage scans; A1's
  * ORDER BY+LIMIT compiles to TakeOrderedAndProject (top-k per partition,
  * no global sort), A2's predicate reaches the parquet reader
  * (PushedFilters on l_shipdate/l_discount) so row groups outside the
  * date range are skipped entirely at 100 TB.
  *
  * The `scan_*_roundtrip` rows (r8) cover the non-parquet serialization
  * formats a real ingest/egest boundary speaks — CSV, JSON-lines, ORC —
  * by writing a fixture table out in the format and reading it back with
  * an explicit schema before aggregating; the oracle runs the identical
  * aggregate over the original parquet, so any fidelity loss in the
  * text encoding (double formatting, µs timestamps, int widths, unicode)
  * breaks the row. Scale note: write and read are both one-file-per-
  * partition parallel, the read schema is explicit (no inference scan),
  * and the aggregate downstream is the usual partial+final hash agg. */
object Scans {

  /** µs-precision timestamp pattern for the text formats — the CSV/JSON
    * default truncates to millis, which would silently round-trip-lose
    * the fixtures' microsecond timestamps. */
  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Write `df` in `format` to a deterministic temp dir and read it back
    * with the exact source schema. Deterministic path + overwrite keeps
    * repeated runs (bench passes, the invariance sweep) from accreting
    * temp copies; the dir-hash suffix separates concurrent SF dirs. */
  private[graft] def roundTrip(df: DataFrame, format: String, key: String,
      tag: String): DataFrame = {
    val out = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_fmt",
      s"${key}_${Integer.toHexString(tag.hashCode)}").toString
    df.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", TsFmt)
      .format(format).save(out)
    df.sparkSession.read.schema(df.schema)
      .option("header", "true").option("timestampFormat", TsFmt)
      .format(format).load(out)
  }

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

  /** A6 — CSV round-trip fidelity. lineitem exercises every scalar type
    * in the fixtures through the text encoding: int64 keys, int32
    * linenumber, four low-entropy doubles, single-char strings, and µs
    * timestamps. The aggregate digests each through count/sum/min/max so
    * a single mis-parsed cell flips the row. */
  val scanCsvRoundtrip: Q = Q(
    "scan_csv_roundtrip",
    """SELECT l_returnflag,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_qty_micro,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_price_micro,
      |  CAST(SUM(CAST(CAST(l_tax AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_tax_micro,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
      |  CAST(SUM(l_linenumber) AS BIGINT) AS sum_lineno,
      |  MIN(l_shipdate) AS min_ship,
      |  MAX(l_shipdate) AS max_ship
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, dir) =>
    roundTrip(lineitem(s, dir), "csv", "scan_csv_roundtrip", dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(micro(col("l_quantity"))).as("sum_qty_micro"),
        sum(micro(col("l_extendedprice"))).as("sum_price_micro"),
        sum(micro(col("l_tax"))).as("sum_tax_micro"),
        sum(col("l_orderkey")).as("sum_okey"),
        sum(col("l_linenumber")).as("sum_lineno"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
      .orderBy("l_returnflag")
  }

  /** A7 — JSON-lines round-trip fidelity over orders (the ingest format
    * most real document/event feeds arrive in). Explicit read schema —
    * no inference pass — and the same µs timestampFormat as A6. */
  val scanJsonlRoundtrip: Q = Q(
    "scan_jsonl_roundtrip",
    """SELECT o_orderstatus,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_total_micro,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |  MIN(o_orderdate) AS min_date,
      |  MAX(o_orderdate) AS max_date,
      |  MIN(o_orderpriority) AS min_prio,
      |  MAX(o_orderpriority) AS max_prio
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, dir) =>
    roundTrip(orders(s, dir), "json", "scan_jsonl_roundtrip", dir)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(micro(col("o_totalprice"))).as("sum_total_micro"),
        sum(col("o_custkey")).as("sum_cust"),
        min(col("o_orderdate")).as("min_date"),
        max(col("o_orderdate")).as("max_date"),
        min(col("o_orderpriority")).as("min_prio"),
        max(col("o_orderpriority")).as("max_prio"))
      .orderBy("o_orderstatus")
  }

  /** A8 — ORC round-trip fidelity over documents: the one columnar
    * alternative to parquet in every Spark distribution, exercised on
    * the text-heavy table so multi-byte/unicode strings cross the
    * encoder. sum(length(text)) re-measures every character post-trip. */
  val scanOrcRoundtrip: Q = Q(
    "scan_orc_roundtrip",
    """SELECT lang,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  COUNT(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    roundTrip(documents(s, dir), "orc", "scan_orc_roundtrip", dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("bigint")).as("sum_len"),
        sum(col("doc_id")).as("sum_ids"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  }

  /** A9 (r8) — schema-evolution read: a real ingest accretes batches
    * whose schemas DRIFT (a new column appears mid-stream); the scan
    * must union them without rewriting history. Batch 1 = even
    * event_ids WITHOUT event_type, batch 2 = odd event_ids WITH it;
    * `mergeSchema` unions the footers and back-fills the missing
    * column with NULL. The digest groups by column-presence, so the
    * oracle can reproduce it from the ORIGINAL table by parity — any
    * mis-merge (dropped column, wrong null-fill, type clash) breaks
    * the hash. Scale note: mergeSchema pays one footer read per file
    * at planning; production pins the merged schema in a catalog and
    * passes it explicitly — the read path is identical. */
  val scanSchemaEvolution: Q = Q(
    "scan_schema_evolution",
    """SELECT (event_id % 2 = 1) AS has_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(CASE WHEN event_id % 2 = 1 THEN event_type END) AS BIGINT)
      |    AS n_typed,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT)
      |    AS sum_value_micro
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_fmt",
      s"evolve_${Integer.toHexString(dir.hashCode)}").toString
    val ev = events(s, dir)
    ev.where(col("event_id") % 2 === 0)
      .select("event_id", "user_id", "value")
      .write.mode("overwrite").parquet(s"$out/b=1")
    ev.where(col("event_id") % 2 === 1)
      .select("event_id", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$out/b=2")
    s.read.option("mergeSchema", "true").parquet(s"$out/b=1", s"$out/b=2")
      .groupBy((col("event_id") % 2 === 1).as("has_type"))
      .agg(count(lit(1)).as("n"),
        count(col("event_type")).as("n_typed"),
        sum(micro(col("value"))).as("sum_value_micro"))
      .orderBy("has_type")
  }

  def all: Seq[Q] = Seq(scanParquetProject, scanFilterPushdown,
    scanCsvRoundtrip, scanJsonlRoundtrip, scanOrcRoundtrip,
    scanSchemaEvolution)
}
