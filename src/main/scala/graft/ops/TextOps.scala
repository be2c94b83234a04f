package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.I extension — text-analysis operators for training-data pipelines:
  * token counting (whitespace + regex tokenizers), document
  * fingerprinting (order-sensitive rolling hash), quality scoring
  * (length/stopword/short-token ratios), and language-ID (marker-token
  * vote). All single-pass narrow scans — no shuffle except the final
  * presentation sort; at 100 TB these are the cheap per-document map
  * stages of a curation pipeline.
  *
  * Cross-engine hash: tokens are hashed to 60-bit ints via
  * sha256-hex-prefix (both engines produce identical standard SHA-256;
  * 15 hex chars < 2^63), then combined with exact integer mod
  * arithmetic — never engine-specific hash functions (Spark xxhash64 and
  * DuckDB hash() differ; those appear only in non-oracle ops). */
object TextOps {

  private val M = 1000000007L // fingerprint modulus

  /** Token counting: whitespace tokens vs a regex tokenizer (the
    * BPE-style pre-tokenization pattern: runs of letters or digits). */
  val llmTokenCount: Q = Q(
    "llm_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens,
      |  CAST(length(text) AS BIGINT) AS n_text_chars
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+")).cast("bigint").as("n_re_tokens"),
        length(col("text")).cast("bigint").as("n_text_chars"))
      .orderBy("doc_id")
  }

  /** Order-sensitive document fingerprint: rolling hash
    * fp = fold(tokens, (acc, h) -> (acc*31 + h) mod M) over sha256-derived
    * 60-bit token hashes (mod M before folding so DuckDB's init-less
    * list_reduce equals Spark's aggregate with 0 seed). Reordering two
    * tokens changes the fingerprint; duplicate-content docs collide. */
  val llmFingerprint: Q = Q(
    "llm_fingerprint",
    s"""SELECT doc_id,
      |  list_reduce(
      |    list_transform(string_split(text, ' '),
      |      t -> ('0x' || substr(sha256(t), 1, 15))::BIGINT % $M),
      |    (a, b) -> (a * 31 + b) % $M) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    documents(s, dir)
      .select(col("doc_id"), expr(
        s"""aggregate(
           |  transform(split(text, ' '),
           |    t -> cast(conv(substring(sha2(t, 256), 1, 15), 16, 10) as bigint) % ${M}L),
           |  0L, (a, b) -> (a * 31 + b) % ${M}L)""".stripMargin).as("fp"))
      .orderBy("doc_id")
  }

  /** Quality score in exact micro-units: stopword ratio, short-token
    * ratio, and a length term, combined 1:1:1. All-integer arithmetic —
    * engine-identical; a real pipeline would tune the weights. */
  val llmQualityScore: Q = Q(
    "llm_quality_score",
    """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
      |           FROM documents),
      |c AS (SELECT doc_id, n_chars,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','to','and'))) AS BIGINT) AS n_stop,
      |  CAST(len(list_filter(toks, x -> length(x) <= 2)) AS BIGINT) AS n_short
      |  FROM t)
      |SELECT doc_id, n_tokens, n_stop, n_short,
      |  (2*n_stop*1000000 + n_tokens) // (2*n_tokens) AS stop_ratio_micro,
      |  (2*n_short*1000000 + n_tokens) // (2*n_tokens) AS short_ratio_micro,
      |  least(n_chars, 500) * 2000 AS len_score_micro,
      |  ((2*n_stop*1000000 + n_tokens) // (2*n_tokens)
      |    + 1000000 - (2*n_short*1000000 + n_tokens) // (2*n_tokens)
      |    + least(n_chars, 500) * 2000) // 3 AS quality_micro
      |FROM c ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("bigint"))
      .withColumn("n_stop",
        expr("size(filter(toks, x -> x in ('the','a','of','to','and')))").cast("bigint"))
      .withColumn("n_short", expr("size(filter(toks, x -> length(x) <= 2))").cast("bigint"))
      .withColumn("stop_ratio_micro", expr("(2*n_stop*1000000 + n_tokens) div (2*n_tokens)"))
      .withColumn("short_ratio_micro", expr("(2*n_short*1000000 + n_tokens) div (2*n_tokens)"))
      .withColumn("len_score_micro", least(col("n_chars"), lit(500)) * 2000)
      .withColumn("quality_micro",
        expr("(stop_ratio_micro + 1000000 - short_ratio_micro + len_score_micro) div 3"))
      .select("doc_id", "n_tokens", "n_stop", "n_short", "stop_ratio_micro",
        "short_ratio_micro", "len_score_micro", "quality_micro")
      .orderBy("doc_id")
  }

  /** Language-ID by marker-token vote (the n-gram-profile heuristic
    * reduced to three fixed marker sets so the logic is exactly
    * SQL-mirrorable; a real pipeline swaps in per-language char-n-gram
    * profile tables broadcast-joined the same way). Ties → 'und'. */
  val llmLangId: Q = Q(
    "llm_lang_id",
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      |v AS (SELECT doc_id, lang,
      |  CAST(len(list_filter(toks, x -> x IN ('the','a','of'))) AS BIGINT) AS v_en,
      |  CAST(len(list_filter(toks, x -> x IN ('data','table','row'))) AS BIGINT) AS v_dat,
      |  CAST(len(list_filter(toks, x -> x IN ('stream','window','join'))) AS BIGINT) AS v_str
      |  FROM t)
      |SELECT doc_id, lang, v_en, v_dat, v_str,
      |  CASE WHEN v_en > v_dat AND v_en > v_str THEN 'en'
      |       WHEN v_dat > v_en AND v_dat > v_str THEN 'dat'
      |       WHEN v_str > v_en AND v_str > v_dat THEN 'str'
      |       ELSE 'und' END AS predicted
      |FROM v ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("v_en", expr("size(filter(toks, x -> x in ('the','a','of')))").cast("bigint"))
      .withColumn("v_dat", expr("size(filter(toks, x -> x in ('data','table','row')))").cast("bigint"))
      .withColumn("v_str", expr("size(filter(toks, x -> x in ('stream','window','join')))").cast("bigint"))
      .withColumn("predicted",
        when(col("v_en") > col("v_dat") && col("v_en") > col("v_str"), "en")
          .when(col("v_dat") > col("v_en") && col("v_dat") > col("v_str"), "dat")
          .when(col("v_str") > col("v_en") && col("v_str") > col("v_dat"), "str")
          .otherwise("und"))
      .select("doc_id", "lang", "v_en", "v_dat", "v_str", "predicted")
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling — the data-mixing primitive of a
    * training pipeline: per-language keep rates applied by CONTENT-
    * INDEPENDENT hash of the doc id, so the sample is reproducible
    * across runs, engines, and cluster sizes (no rand(), no
    * engine-specific hash — the sha256-derived value is the repo's
    * cross-engine hash pattern). At 100 TB this is a narrow scan with
    * the filter pushed to the row level: no shuffle, no state, and
    * changing mix rates is a literal edit. */
  val llmStratifiedSample: Q = Q(
    "llm_stratified_sample",
    """WITH h AS (SELECT doc_id, lang, n_chars,
      |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      |  FROM documents)
      |SELECT doc_id, lang, n_chars FROM h
      |WHERE hv % 100 < CASE lang WHEN 'en' THEN 50 WHEN 'es' THEN 25 ELSE 10 END
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    documents(s, dir)
      .withColumn("hv", expr(
        "cast(conv(substring(sha2(cast(doc_id as string), 256), 1, 15), 16, 10) as bigint)"))
      .where(col("hv") % 100 < expr(
        "case lang when 'en' then 50 when 'es' then 25 else 10 end"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  def all: Seq[Q] = Seq(llmTokenCount, llmFingerprint, llmQualityScore, llmLangId,
    llmStratifiedSample)
}
