package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format coverage beyond parquet: CSV and JSON (line-delimited)
  * round-trips with explicit schemas — the batch ingest formats a
  * pipeline meets besides columnar storage. Schemas are always explicit
  * (schema inference is a full extra pass at 100 TB). */
class SourceFormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private def docs = Tables.documents(spark, sf("sf0.001"))
    .select("doc_id", "lang", "n_chars")

  test("csv round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).collect()(0).getLong(0) ==
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
  }

  test("json-lines round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("orc round-trip preserves values and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // ORC gets the same predicate pushdown treatment as parquet
    val filtered = back.where(col("n_chars") > 200)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("n_chars"),
      s"expected pushed filters in ORC scan:\n$scan")
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    // a 100 TB table accretes columns over its lifetime; readers must
    // take the union without rewriting old files.
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    docs.write.mode("overwrite").parquet(s"$dir/v=1")
    docs.withColumn("quality", lit(1L)).write.mode("overwrite").parquet(s"$dir/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "quality", "v"))
    // old files surface the new column as NULL; new files carry it
    val counts = merged.groupBy("v")
      .agg(count(lit(1)).as("n"), count(col("quality")).as("nq"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = docs.count()
    assert(counts(1) == (n, 0L), "v=1 files must read quality as NULL")
    assert(counts(2) == (n, n), "v=2 files must carry quality")
  }

  test("json ingest: corrupt lines are quarantined, not fatal (PERMISSIVE)") {
    // ingest robustness: a bad record in TBs of JSONL must neither kill
    // the job (FAILFAST) nor silently vanish — PERMISSIVE + a corrupt-
    // record column routes it to quarantine for audit.
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    val lines = Seq(
      """{"doc_id": 1, "lang": "en", "n_chars": 10}""",
      """{"doc_id": 2, "lang": "es" """, // truncated json
      """not json at all""",
      """{"doc_id": 4, "lang": "de", "n_chars": 40}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      lines.mkString("\n").getBytes)
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val read = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record column requires a materialized referent
    val good = read.where(col("_corrupt_record").isNull)
    val bad = read.where(col("_corrupt_record").isNotNull)
    assert(good.count() == 2 && bad.count() == 2)
    assert(good.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    read.unpersist()
  }

  test("parquet ingest: corrupt file fails loud by default, skippable by option") {
    // the other ingest-robustness half (r9): at 100 TB a truncated or
    // bit-rotted parquet FILE (not row) is a weekly event. Default
    // behavior must be fail-loud — silently dropping a whole file is a
    // data-loss bug — with ignoreCorruptFiles the explicit operator
    // decision to trade completeness for availability.
    val dir = java.nio.file.Files.createTempDirectory("graft_pqcorrupt").toString
    docs.write.mode("overwrite").parquet(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part-zz-corrupt.snappy.parquet"),
      "this is not a parquet footer".getBytes)
    val n = docs.count()
    intercept[Exception] {
      spark.read.parquet(dir).count() // fail loud: corrupt data detected
    }
    val skipped = spark.read.option("ignoreCorruptFiles", "true").parquet(dir)
    assert(skipped.count() == n, "healthy files must survive the skip")
    // the option is per-read: the session default stays strict
    intercept[Exception] { spark.read.parquet(dir).count() }
  }
}
