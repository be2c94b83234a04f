package graft

import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoin, AsOfJoinExec}

/** The custom whole-operator as-of join: plan shape, edge semantics, and
  * equivalence with the window-emulation form (C8). */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private def lft = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
    .toDF("k", "ts", "id")
  private def rgt = Seq((1L, 90L, 1L, "a"), (1L, 150L, 2L, "b"), (3L, 10L, 3L, "c"))
    .toDF("rk", "rts", "rid", "payload")

  test("asof picks the latest strictly-prior right row per key; null when none") {
    val got = AsOfJoin.asof(lft, rgt, "k", "ts", "id", "rk", "rts", "rid")
      .orderBy("k", "ts")
      .select("k", "ts", "rid", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 100L, 1L, "a"),   // 90 < 100
      (1L, 200L, 2L, "b"),   // 150 latest < 200
      (2L, 50L, -1L, null))) // key 2 has no right rows
  }

  test("NULL keys match nothing (not key 0) on either side") {
    // r4 review: null.asInstanceOf[Long] unboxes to 0L, which made a
    // NULL key behave as key 0 in the merge. Left NULLs must emit the
    // unmatched row; right NULLs must never be held as a match.
    val l = Seq((Some(0L), Some(100L), 10L), (None, Some(100L), 11L),
        (Some(1L), None, 12L))
      .toDF("k", "ts", "id")
    val r = Seq((Some(0L), Some(50L), 1L, "zero"), (None, Some(40L), 2L, "nullk"),
        (Some(1L), Some(10L), 3L, "one"))
      .toDF("rk", "rts", "rid", "payload")
    val got = AsOfJoin.asof(l, r, "k", "ts", "id", "rk", "rts", "rid")
      .select("id", "payload").collect()
      .map(row => row.getLong(0) -> Option(row.getString(1))).toMap
    assert(got(10L).contains("zero"), "key 0 must still match its own prior row")
    assert(got(11L).isEmpty, "NULL left key must match nothing")
    assert(got(12L).isEmpty, "NULL left ts must match nothing")
  }

  test("non-BIGINT asof columns fail fast on the driver") {
    val l = Seq((1, 100L, 10L)).toDF("k", "ts", "id") // k is INT
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, rgt, "k", "ts", "id", "rk", "rts", "rid")
    }
    assert(e.getMessage.contains("must be BIGINT"))
  }

  test("physical plan is the custom exec with co-partitioned sorted children") {
    val df = AsOfJoin.asof(lft, rgt, "k", "ts", "id", "rk", "rts", "rid")
    // executedPlan is wrapped in AdaptiveSparkPlanExec (whose collect
    // doesn't descend), so assert on the rendered tree
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin"), s"expected AsOfJoin in:\n$planStr")
    assert(planStr.contains("Sort") && planStr.contains("Exchange hashpartitioning"))
  }

  test("native as-of == window-emulation on the events fixture") {
    val native = SparkEntry.queries("join_asof_native")(spark, sf("sf0.001")).collect()
    val window = SparkEntry.queries("join_asof")(spark, sf("sf0.001")).collect()
    assert(native.map(_.toSeq).toSeq == window.map(_.toSeq).toSeq)
  }

  test("tie on ts broken by id (strictly-prior in (ts, id) lex order)") {
    val l = Seq((1L, 100L, 5L)).toDF("k", "ts", "id")
    val r = Seq((1L, 100L, 3L, "same-ts-smaller-id"), (1L, 100L, 7L, "same-ts-larger-id"))
      .toDF("rk", "rts", "rid", "payload")
    val got = AsOfJoin.asof(l, r, "k", "ts", "id", "rk", "rts", "rid")
      .select("payload").collect().map(_.getString(0))
    assert(got.toSeq == Seq("same-ts-smaller-id"))
  }
}
