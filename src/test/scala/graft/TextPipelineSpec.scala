package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the r4 pipeline operators beyond the DuckDB
  * hash gate: the oracle proves Spark ≡ DuckDB on the same SQL; these
  * prove the SQL means what the operator claims. */
class TextPipelineSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("doc chunks reassemble to the original document") {
    // stride 32, width 40: dropping the 8-token overlap from every
    // chunk after the first and concatenating must rebuild the doc.
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    // collect_list has no intra-group order guarantee; sort_array over
    // (chunk_id, core) structs makes the concatenation order exact.
    val rebuilt = ops.TextOps.llmDocChunks.build(spark, dir)
      .withColumn("core", when(col("chunk_id") === 0, col("chunk"))
        .otherwise(expr("concat_ws(' ', slice(split(chunk, ' '), 9, 32))")))
      .where(length(col("core")) > 0)
      .groupBy("doc_id")
      .agg(expr("concat_ws(' ', transform(sort_array(collect_list(struct(chunk_id, core))), s -> s.core))").as("rebuilt"))
    val bad = rebuilt.join(docs, "doc_id")
      .where(col("rebuilt") =!= col("text")).count()
    assert(bad == 0, s"$bad docs did not reassemble from their chunks")
  }

  test("chunk sizes follow the stride-32/width-40 contract exactly") {
    // chunk i covers tokens [32i, 32i+40) clipped to the doc, so its
    // size must be min(40, n_tokens - 32i) — truncation can reach the
    // last TWO chunks (when n_tokens mod 32 is in 1..7), never earlier.
    val n = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
    val c = ops.TextOps.llmDocChunks.build(spark, dir).join(n, "doc_id")
    val viol = c.where(
      col("n_chunk_tokens") =!= least(lit(40L), col("n_tokens") - col("chunk_id") * 32)).count()
    assert(viol == 0)
  }

  test("sequence packing is a per-source exclusive prefix sum") {
    val p = ops.TextOps.llmPackSequences.build(spark, dir)
    // start_off must equal the sum of earlier docs' n_tokens in the
    // same source, and (seq_no, seq_off) must be its div/mod by 256.
    val viol = p.where(
      col("seq_no") * 256 + col("seq_off") =!= col("start_off") ||
      col("seq_off") < 0 || col("seq_off") >= 256).count()
    assert(viol == 0)
    import spark.implicits._
    val perSource = p.select("source", "doc_id", "n_tokens", "start_off")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).values
    perSource.foreach { rows =>
      var acc = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, off) =>
        assert(off == acc); acc += n
      }
    }
  }

  test("decontamination flags every exact duplicate of a benchmark doc") {
    // an exact dup of a benchmark doc (>= 4 tokens) shares ALL its
    // 4-grams, so it must appear in the contaminated set.
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .where(size(split(col("text"), " ")) >= 4)
    val benchTexts = docs.where(col("doc_id") % 53 === 0).select(col("text").as("bt"))
    val dupIds = docs.where(col("doc_id") % 53 =!= 0)
      .join(benchTexts, col("text") === col("bt"))
      .select("doc_id").distinct()
    val flagged = ops.TextOps.llmDecontaminate.build(spark, dir).select("doc_id")
    assert(dupIds.except(flagged).count() == 0,
      "an exact duplicate of a benchmark doc escaped decontamination")
  }
}
