package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Q}

/** Hand-computable invariants for the integer PageRank — the exact
  * values the similarity-graph row can't isolate:
  *  - an isolated vertex holds exactly the dangling base rank;
  *  - a symmetric clique is a fixed point at the uniform rank;
  *  - a directed star concentrates rank in the hub by exactly the
  *    damped sum of its leaves' contributions;
  *  - ranks are bounded below by the base at every iteration.
  */
class GraphSpec extends SparkSpec {

  private def pr(vs: Seq[Long], es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val out = Q.withCached(
      Graph.pageRank(vs.toDF("id"),
        es.toDF("src", "dst"), iters)) { df =>
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    out
  }

  test("isolated vertex holds the dangling base rank exactly") {
    val ranks = pr(Seq(1L, 2L, 3L), Seq((2L, 3L), (3L, 2L)), iters = 3)
    assert(ranks(1L) == 150000L)
  }

  test("symmetric clique reaches its integer fixed point, uniform across vertices") {
    // K4, both directions: deg = 3. Real-arithmetic fixed point is
    // 1000000, but floor division loses one micro on the 3-way split
    // (3·⌊1000000/3⌋ = 999999) — the INTEGER fixed point is 999999
    // after one iteration and provably stable thereafter:
    // 150000 + 850·(3·⌊999999/3⌋)/1000 = 999999. Pin that exact
    // value and its uniformity — deterministic floor loss, not drift.
    val vs = Seq(0L, 1L, 2L, 3L)
    val es = for (a <- vs; b <- vs if a != b) yield (a, b)
    assert(pr(vs, es, iters = 1).values.toSet == Set(999999L))
    assert(pr(vs, es, iters = 3).values.toSet == Set(999999L))
  }

  test("directed star: hub rank = base + damped leaf contributions, exact") {
    // 4 leaves each with one out-edge to the hub (deg 1); hub has no
    // out-edges. Iter 1: hub = 150000 + 850*(4*1000000)/1000;
    // leaves receive nothing = 150000. Iter 2: hub = 150000 +
    // 850*(4*150000)/1000 (leaves' updated ranks).
    val vs = Seq(0L, 1L, 2L, 3L, 4L) // 0 = hub
    val es = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
    val r1 = pr(vs, es, iters = 1)
    assert(r1(0L) == 150000L + 850L * 4000000L / 1000L)
    assert(r1(1L) == 150000L)
    val r2 = pr(vs, es, iters = 2)
    assert(r2(0L) == 150000L + 850L * (4L * 150000L) / 1000L)
  }

  test("triangle counts: oriented engine ≡ naive enumeration on a random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph with planted skew: vertex 0 is
    // adjacent to everything (the celebrity), plus LCG edges for real
    // triangle structure
    val n = 200
    val lcg = (1 to 600).scanLeft(12345L)((s, _) => (s * 1103515245L + 12341L) % 2147483647L)
    val rnd = lcg.sliding(2).map { case Seq(a, b) =>
      (a % n, b % n)
    }.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSeq
    val star = (1L until n).map(i => (0L, i))
    val half = (rnd ++ star).distinct.toDF("src", "dst")
    val oriented = Q.withCached(graft.ops.Graph.triangleCounts(half))(
      _.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val naive = Q.withCached(graft.ops.Graph.triangleCountsNaive(half))(
      _.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(oriented == naive)
    assert(oriented.values.sum % 3 == 0)     // every triangle counted at its 3 corners
    assert(oriented.getOrElse(0L, 0L) > 0)   // the celebrity sits in real triangles
  }

  test("triangle counts: known tiny graphs, exact") {
    import spark.implicits._
    // K4: every vertex in C(3,2)=3 triangles
    val k4 = (for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)).toDF("src", "dst")
    val c4 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("src", "dst") // square: none
    val k4c = Q.withCached(graft.ops.Graph.triangleCounts(k4))(
      _.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(k4c == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(Q.withCached(graft.ops.Graph.triangleCounts(c4))(_.count()) == 0L)
  }

  test("every rank is bounded below by the base rank") {
    val s = spark
    val ranks = Q.withCached(
      graft.ops.Graph.graphPagerank.build(s, sf("sf0.001"))) { df =>
      df.agg(min("pr_micro"), count(lit(1))).head()
    }
    assert(ranks.getLong(0) >= 150000L)
    assert(ranks.getLong(1) > 0)
  }
}
