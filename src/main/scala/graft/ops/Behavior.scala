package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2 extension (r8) — behavioral event analytics: the two queries every
  * event-stream deployment ends up running daily.
  *
  *  - `funnel_stages` — ordered-sequence funnel (view → click →
  *    purchase): a user converts at stage k only if the stages happened
  *    IN ORDER (first purchase after first click after first view) —
  *    the strict-ordering semantics that separates a funnel from three
  *    independent counts.
  *  - `cohort_retention` — daily cohort retention matrix: users
  *    cohorted by first-activity day, counted in every later day they
  *    return (the per-val doc notes the weekly divisor swap).
  *
  * Both are two-phase aggregates over (user, small-key) rows — the
  * event table reduces to one row per user (funnel) or per (user, day)
  * (cohort) in the map-side combine, so the shuffle carries user-count
  * rows, never raw events. Timestamps compare as epoch microseconds
  * (the repo's cross-engine event-time policy). */
object Behavior {

  /** Strict-order funnel: stage timestamps are each user's FIRST event
    * of the type; stage k counts only users whose chain is strictly
    * increasing up to k. One narrow aggregate (min per type via
    * conditional min) + a four-row final count. */
  val funnelStages: Q = Q(
    "funnel_stages",
    """WITH u AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
      |  FROM events GROUP BY 1)
      |SELECT
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(count(t_view) AS BIGINT) AS n_viewed,
      |  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
      |  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
      |                 AND t_buy > t_click
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
      |FROM u""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("t_view"),
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t_click"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_buy"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t_view")).as("n_viewed"),
        sum(when(col("t_view").isNotNull && col("t_click") > col("t_view"), 1L)
          .otherwise(0L)).as("n_clicked_after_view"),
        sum(when(col("t_view").isNotNull && col("t_click") > col("t_view")
            && col("t_buy") > col("t_click"), 1L)
          .otherwise(0L)).as("n_converted"))
  }

  /** Daily cohort retention: cohort day = floor(first-activity epoch /
    * day); a user counts toward (cohort, offset) once per day they
    * return. Integer day arithmetic on epoch microseconds (no calendar
    * functions — engine-identical and timezone-free); day granularity
    * because the fixture spans one month (a production run swaps the
    * divisor for weeks — same plan). 59 cells with real decay
    * (13..134 active) at sf0.01. */
  val cohortRetention: Q = Q(
    "cohort_retention",
    """WITH w AS (SELECT DISTINCT user_id,
      |    epoch_us(ts) // 86400000000 AS day FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM w GROUP BY 1)
      |SELECT c.cohort_day, CAST(w.day - c.cohort_day AS BIGINT) AS day_offset,
      |  CAST(count(*) AS BIGINT) AS n_active
      |FROM w JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val w = Q.cached(events(s, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct())
    val c = w.groupBy("user_id").agg(min("day").as("cohort_day"))
    w.join(c, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Gap-based sessionization in BATCH form (H3's session_window is the
    * streaming/state form; this is the lag-flag formulation every
    * warehouse runs): a new session starts when the gap to the user's
    * previous event exceeds 30 minutes; session id = running sum of
    * start flags per user. Output: per-user session count, longest
    * session (events), mean session span in seconds (micro-unit exact).
    * Two windows over the user partition + one aggregate — events
    * reduce to (user, session) rows at the first aggregate. */
  val sessionStats: Q = Q(
    "session_stats",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      |f AS (SELECT user_id, t,
      |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
      |              > 1800000000 OR
      |              lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM e),
      |s AS (SELECT user_id, t,
      |    sum(is_start) OVER (PARTITION BY user_id ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM f),
      |g AS (SELECT user_id, sess, CAST(count(*) AS BIGINT) AS n_events,
      |    max(t) - min(t) AS span_us
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(max(n_events) AS BIGINT) AS max_session_events,
      |  CAST(sum(span_us) // count(*) AS BIGINT) AS mean_span_us
      |FROM g GROUP BY 1 ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("t")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
      .withColumn("prev", lag("t", 1).over(byUser))
      .withColumn("is_start",
        when(col("prev").isNull || col("t") - col("prev") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum("is_start").over(run))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"), (max("t") - min("t")).as("span_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        expr("sum(span_us) div count(1)").as("mean_span_us"))
      .orderBy("user_id")
  }

  def all: Seq[Q] = Seq(funnelStages, cohortRetention, sessionStats)
}
