package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.I extension — multimodal/binary-column plumbing as an
  * oracle-checked query: documents.text lifted to an opaque BINARY
  * payload, features computed from the bytes (the SQL-expressible subset
  * of what graft.multimodal.StubDecoder does; MediaSpec proves the
  * typed mapPartitions pipeline computes the same features). */
object MediaOps {

  val llmMediaFeatures: Q = Q(
    "llm_media_features",
    """SELECT doc_id, 'text/plain' AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
      |  1 + ascii(substr(text, 1, 1)) % 64 AS width,
      |  1 + ascii(substr(text, 2, 1)) % 64 AS height
      |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    // NULL text is excluded on BOTH surfaces: a typed MediaFeatures row
    // cannot represent NULL features, so the consistent contract is
    // that null-payload records are dropped, not zero-filled
    documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("n_bytes"),
        lower(hex(encode(substring(col("text"), 1, 8), "UTF-8"))).as("header_hex"),
        (lit(1) + ascii(substring(col("text"), 1, 1)) % 64).as("width"),
        (lit(1) + ascii(substring(col("text"), 2, 1)) % 64).as("height"))
      .orderBy("doc_id")
  }

  /** Media resize accounting (the SQL-expressible twin of
    * Media.resize + StubResizer at maxDim=16: payload truncated to 256
    * codepoints; MediaSpec proves the typed stage computes the same).
    * Narrow per-row scan, payloads never shuffle. */
  val llmMediaResize: Q = Q(
    "llm_media_resize",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(substr(text, 1, 256))) AS BIGINT) AS resized_bytes
      |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("n_bytes"),
        octet_length(encode(substring(col("text"), 1, 256), "UTF-8"))
          .cast("bigint").as("resized_bytes"))
      .orderBy("doc_id")
  }

  /** Frame sampling (the SQL twin of Media.frameSample at
    * frameChars=16, stride=4: keep frames 0, 4, 8, … of 16 codepoints
    * each; MediaSpec proves the typed flatMap emits the same frames).
    * Pure generator — 1→N explode per row, no shuffle; dropped frames
    * never materialize. frame_no keeps the ORIGINAL index so stride
    * gaps stay visible. */
  val llmMediaFrames: Q = Q(
    "llm_media_frames",
    """WITH t AS (SELECT doc_id, text,
      |    CAST(length(text) AS BIGINT) AS n FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT doc_id, text,
      |    unnest(generate_series(0, (n-1) // 16, 4)) AS k FROM t)
      |SELECT doc_id, CAST(k AS BIGINT) AS frame_no,
      |  substr(text, CAST(k*16+1 AS INT), 16) AS frame
      |FROM c ORDER BY doc_id, frame_no""".stripMargin
  ) { (s, dir) =>
    documents(s, dir)
      .where(col("text").isNotNull)
      .withColumn("n", length(col("text")).cast("bigint"))
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0L, (n-1) div 16, 4L)")).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        expr("substring(text, cast(frame_no*16+1 as int), 16)").as("frame"))
      .orderBy("doc_id", "frame_no")
  }

  def all: Seq[Q] = Seq(llmMediaFeatures, llmMediaResize, llmMediaFrames)
}
