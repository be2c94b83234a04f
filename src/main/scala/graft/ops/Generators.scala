package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.G — generators (1-to-N) and scalar UDFs. G1 is the flatMap analog
  * of a catenae Link returning a list of Electrons. Scale note: explode
  * happens inside codegen before the aggregation's map-side combine, so
  * the shuffle carries (word, partial count), not raw tokens. G2's UDF is
  * Catalyst-opaque by design (the surface test) — the oracle twin proves
  * the semantics, and the registered-function path is exercised via
  * spark.udf.register. */
object Generators {

  /** G1 — explode tokens → word count top-50. */
  val explodeTokens: Q = Q(
    "explode_tokens",
    """SELECT word, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY cnt DESC, word LIMIT 50""".stripMargin
  ) { (s, dir) =>
    documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(50)
  }

  /** G2 — registered Scala UDF (price banding) + grouped counts. */
  val udfScalar: Q = Q(
    "udf_scalar",
    """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
      |            WHEN o_totalprice < 300000 THEN 'mid'
      |            ELSE 'high' END AS band,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY band""".stripMargin
  ) { (s, dir) =>
    val priceBand = udf((p: Double) =>
      if (p < 100000) "low" else if (p < 300000) "mid" else "high")
    s.udf.register("price_band", priceBand)
    orders(s, dir)
      .select(call_udf("price_band", col("o_totalprice")).as("band"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"))
      .orderBy("band")
  }

  /** G3 — the true UDTF surface: the custom Catalyst Generator
    * graft.functions.TokenizePos driven through LATERAL VIEW (SQL entry
    * point; registered via GraftFunctions/GraftExtensions). Semantically
    * posexplode(split(...)) — which is exactly what the oracle twin
    * computes — but exercised through the Generator extension point. */
  val udtfGenerator: Q = Q(
    "udtf_generator",
    """SELECT doc_id, tok, pos FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |    CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos
      |  FROM documents WHERE doc_id < 100) t
      |ORDER BY doc_id, pos""".stripMargin
  ) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    documents(s, dir).where(col("doc_id") < 100).createOrReplaceTempView("g3_docs")
    s.sql(
      """SELECT doc_id, t.tok, CAST(t.pos AS BIGINT) AS pos
        |FROM g3_docs LATERAL VIEW tokenize_pos(text) t AS tok, pos
        |ORDER BY doc_id, pos""".stripMargin)
  }

  def all: Seq[Q] = Seq(explodeTokens, udfScalar, udtfGenerator)
}
