package graft

import org.scalatest.funsuite.AnyFunSuite

class LongLongMapSpec extends AnyFunSuite {
  test("fuzz vs reference map: puts, overwrites, growth, full key domain") {
    val rnd = new scala.util.Random(11)
    val m = new graft.ops.LongLongMap(8) // tiny start -> many growths
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    // sentinel and adversarial keys, then 20k random ops (positive,
    // negative, clustered-sequential — the doc_id shape)
    val keyPool = Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 1L) ++
      (0L until 2000L) ++ Seq.fill(2000)(rnd.nextLong())
    (0 until 20000).foreach { _ =>
      val k = keyPool(rnd.nextInt(keyPool.size))
      if (rnd.nextBoolean() || !ref.contains(k)) {
        val v = rnd.nextLong()
        m.put(k, v); ref(k) = v
      } else assert(m.get(k) == ref(k))
      assert(m.contains(k) == ref.contains(k))
    }
    assert(m.size == ref.size)
    val got = m.keysIterator.map(k => k -> m.get(k)).toMap
    assert(got == ref.toMap)
    // absent keys stay absent across growth
    (0 until 100).foreach { _ =>
      val k = rnd.nextLong()
      if (!ref.contains(k)) assert(!m.contains(k))
    }
  }

  test("union-find usage shape: path compression during keysIterator") {
    // localRoots compresses paths lazily while the iterator drains —
    // overwrite-only puts during iteration must be safe and visible
    val m = new graft.ops.LongLongMap(8)
    (0L until 100L).foreach(i => m.put(i, math.max(0L, i - 1))) // chain
    def find(x: Long): Long = {
      var r = x
      while (m.get(r) != r) r = m.get(r)
      var c = x
      while (c != r) { val n = m.get(c); m.put(c, r); c = n }
      r
    }
    val roots = m.keysIterator.map(v => v -> find(v)).toMap
    assert(roots == (0L until 100L).map(_ -> 0L).toMap)
  }
}
