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

  def all: Seq[Q] = Seq(llmMediaFeatures)
}
