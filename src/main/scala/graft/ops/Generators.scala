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
    // java.lang.Double, not Double: a primitive-typed udf makes Spark
    // emit NULL for NULL input, but the oracle's CASE falls through to
    // ELSE 'high' (NULL < x is NULL, not true) — match that (r4 review)
    val priceBand = udf((p: java.lang.Double) =>
      if (p == null) "high"
      else if (p < 100000) "low" else if (p < 300000) "mid" else "high")
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

  /** G4 — time-series resampling with gap fill: bucket events per
    * (event_type, hour), then LEFT-join each type's dense hour grid
    * (sequence + explode of its own [min, max] span) so silent hours
    * surface as explicit zeros — the resample-then-model prep step.
    * The grid generator is per-group and arithmetic (no driver
    * enumeration); grid and buckets co-partition on the same
    * (event_type, hour) key, and grid size is span/step per type
    * regardless of event count — at 100 TB the join is grid-bounded,
    * not event-bounded. */
  val generateResample: Q = Q(
    "generate_resample",
    """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_value_micro
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, min(h) AS mn, max(h) AS mx FROM b GROUP BY 1),
      |g AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM r)
      |SELECT g.event_type, g.h, coalesce(b.n, 0) AS n,
      |  coalesce(b.sum_value_micro, 0) AS sum_value_micro
      |FROM g LEFT JOIN b USING (event_type, h)
      |ORDER BY event_type, h""".stripMargin
  ) { (s, dir) =>
    val b = Q.cached(events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), sum(micro(col("value"))).as("sum_value_micro"))
    ) // read twice: grid bounds and the join probe (r4 review)
    val g = b.groupBy("event_type").agg(min("h").as("mn"), max("h").as("mx"))
      .select(col("event_type"),
        explode(expr("sequence(mn, mx, interval 1 hour)")).as("h"))
    g.join(b, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value_micro"), lit(0L)).as("sum_value_micro"))
      .orderBy("event_type", "h")
  }

  def all: Seq[Q] = Seq(explodeTokens, udfScalar, udtfGenerator, generateResample)
}
