package graft

import org.apache.spark.sql.functions._
import graft.ops.{Behavior, Q}

/** Conservation invariants for the behavioral analytics — the accounting
  * identities the per-row oracle hash can't state:
  *  - funnel stages are monotonically non-increasing and bounded by the
  *    user universe;
  *  - cohort offset-0 cells sum to the full user count (every user is
  *    active on their own cohort day);
  *  - sessionization conserves events: Σ per-session events == the
  *    user's event count, and session spans never exceed the user's
  *    first-to-last range.
  */
class BehaviorSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("funnel: stage counts are monotone and bounded") {
    val r = Q.withCached(Behavior.funnelStages.build(spark, dir))(_.head())
    val (n, v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n >= v && v >= c && c >= p, s"funnel not monotone: $n $v $c $p")
    assert(p >= 0 && n > 0)
  }

  test("cohort: offset-0 cells account for every user exactly once") {
    val out = Q.withCached(Behavior.cohortRetention.build(spark, dir)) { df =>
      val atZero = df.where(col("day_offset") === 0)
        .agg(sum("n_active")).head().getLong(0)
      val users = Tables.events(spark, dir)
        .select("user_id").distinct().count()
      (atZero, users)
    }
    assert(out._1 == out._2, s"offset-0 sum ${out._1} != user count ${out._2}")
  }

  test("sessionization conserves events and bounds spans") {
    // every assertion runs INSIDE the withCached scope — returning a
    // lazy frame and consuming it after the scope exits would drop the
    // build's internal caches first (the Q.scala footgun; r8 review)
    Q.withCached(Behavior.sessionStats.build(spark, dir)) { stats =>
      val perUser = Tables.events(spark, dir)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("full_span_us"))
      // max session events can never exceed the user's event count,
      // and the mean span can never exceed the user's full range
      val joined = stats.join(perUser, "user_id")
      assert(joined.where(col("max_session_events") > col("n_events")).count() == 0)
      assert(joined.where(col("mean_span_us") > col("full_span_us")).count() == 0)
      assert(joined.where(col("n_sessions") < 1).count() == 0)
      // every user appears exactly once
      assert(stats.count() ==
        Tables.events(spark, dir).select("user_id").distinct().count())
    }
  }
}
