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
  *  - `cohort_retention` — weekly cohort retention matrix: users
  *    cohorted by first-activity week, counted in every later week
  *    they return.
  *
  * Both are two-phase aggregates over (user, small-key) rows — the
  * event table reduces to one row per user (funnel) or per (user, week)
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

  def all: Seq[Q] = Seq(funnelStages, cohortRetention)
}
