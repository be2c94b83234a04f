package graft

import org.apache.spark.sql.DataFrame

/** §2.A format round-trips (A6-A8): the registered rows hash an
  * aggregate digest against the parquet oracle; these tests pin the
  * stronger per-row property — the round-tripped frame is EXACTLY the
  * original, every cell, both directions — so a fidelity loss the
  * digest happens to cancel (e.g. symmetric ± errors summing to zero)
  * still fails loudly here. */
class FormatSpec extends SparkSpec {

  private def assertExactRoundTrip(orig: DataFrame, format: String): Unit = {
    val back = ops.Scans.roundTrip(orig, format, s"spec_$format", "spec")
    assert(back.schema == orig.schema,
      s"$format schema drifted: ${back.schema} vs ${orig.schema}")
    val lost = orig.exceptAll(back).count()
    val gained = back.exceptAll(orig).count()
    assert(lost == 0 && gained == 0,
      s"$format round-trip not exact: lost=$lost gained=$gained")
  }

  test("CSV round-trip is cell-exact on lineitem (doubles, int32, µs timestamps)") {
    assertExactRoundTrip(Tables.lineitem(spark, sf("sf0.001")), "csv")
  }

  test("JSON-lines round-trip is cell-exact on orders") {
    assertExactRoundTrip(Tables.orders(spark, sf("sf0.001")), "json")
  }

  test("ORC round-trip is cell-exact on documents (unicode text)") {
    assertExactRoundTrip(Tables.documents(spark, sf("sf0.001")), "orc")
  }

  test("registered round-trip digests match the direct parquet aggregate") {
    // the oracle proves Spark-vs-DuckDB; this proves the round-trip arm
    // equals the no-round-trip arm WITHIN Spark, so a driver-side pass
    // can't be explained by both surfaces sharing the same corruption
    for (q <- Seq(ops.Scans.scanCsvRoundtrip, ops.Scans.scanJsonlRoundtrip,
        ops.Scans.scanOrcRoundtrip)) {
      val viaFormat = q.build(spark, sf("sf0.001")).collect().toSeq
      val direct = q.key match {
        case "scan_csv_roundtrip" =>
          import org.apache.spark.sql.functions._
          import Tables._
          lineitem(spark, sf("sf0.001")).groupBy("l_returnflag").agg(
            count(lit(1)).as("n_rows"),
            sum(micro(col("l_quantity"))).as("sum_qty_micro"),
            sum(micro(col("l_extendedprice"))).as("sum_price_micro"),
            sum(micro(col("l_tax"))).as("sum_tax_micro"),
            sum(col("l_orderkey")).as("sum_okey"),
            sum(col("l_linenumber")).as("sum_lineno"),
            min(col("l_shipdate")).as("min_ship"),
            max(col("l_shipdate")).as("max_ship"))
            .orderBy("l_returnflag").collect().toSeq
        case "scan_jsonl_roundtrip" =>
          import org.apache.spark.sql.functions._
          import Tables._
          orders(spark, sf("sf0.001")).groupBy("o_orderstatus").agg(
            count(lit(1)).as("n_rows"),
            sum(micro(col("o_totalprice"))).as("sum_total_micro"),
            sum(col("o_custkey")).as("sum_cust"),
            min(col("o_orderdate")).as("min_date"),
            max(col("o_orderdate")).as("max_date"),
            min(col("o_orderpriority")).as("min_prio"),
            max(col("o_orderpriority")).as("max_prio"))
            .orderBy("o_orderstatus").collect().toSeq
        case _ =>
          import org.apache.spark.sql.functions._
          import Tables._
          documents(spark, sf("sf0.001")).groupBy("lang").agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            sum(length(col("text")).cast("bigint")).as("sum_len"),
            sum(col("doc_id")).as("sum_ids"),
            countDistinct(col("source")).as("n_sources"))
            .orderBy("lang").collect().toSeq
      }
      assert(viaFormat == direct, s"${q.key}: digest diverged from direct parquet aggregate")
    }
  }
}
