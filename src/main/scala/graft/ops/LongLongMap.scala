package graft.ops

/** Minimal open-addressing long->long hash map for the per-partition
  * union-find in [[DedupOps]]'s recursive contraction (and its
  * driver-side escape hatch). The contraction's per-task memory bound
  * IS this map — `java.util.HashMap[Long, Long]` costs ~80 bytes per
  * entry (boxed keys/values + entry nodes) and churns the GC during
  * the build; two flat long arrays cost 16 bytes per SLOT (~27 bytes
  * per entry at the 0.6 load cap) with zero allocation after growth,
  * so the scaladoc's "~16 bytes per resident vertex" claim is what
  * the executor actually observes.
  *
  * Linear probing over a power-of-two table, grow-on-load-0.6.
  * `Long.MinValue` is the empty-slot sentinel; a real MinValue key is
  * carried in two side fields, so the full key domain is supported.
  * Not thread-safe; single-task use only.
  */
private[graft] final class LongLongMap(initialCapacity: Int = 1 << 10) {
  private[this] var cap = {
    var c = 8
    while (c < initialCapacity) c <<= 1
    c
  }
  private[this] var mask = cap - 1
  private[this] var keys = Array.fill[Long](cap)(Long.MinValue)
  private[this] var vals = new Array[Long](cap)
  private[this] var n = 0
  private[this] var hasMin = false
  private[this] var minVal = 0L

  def size: Int = n + (if (hasMin) 1 else 0)

  // Stafford variant 13 finalizer — sequential ids hash to spread slots
  @inline private[this] def slot(k: Long): Int = {
    var z = k
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt & mask
  }

  private[this] def grow(): Unit = {
    val ok = keys; val ov = vals
    cap <<= 1; mask = cap - 1; n = 0
    keys = Array.fill[Long](cap)(Long.MinValue)
    vals = new Array[Long](cap)
    var i = 0
    while (i < ok.length) {
      if (ok(i) != Long.MinValue) put(ok(i), ov(i))
      i += 1
    }
  }

  def put(k: Long, v: Long): Unit =
    if (k == Long.MinValue) { hasMin = true; minVal = v }
    else {
      var i = slot(k)
      while (keys(i) != Long.MinValue && keys(i) != k) i = (i + 1) & mask
      if (keys(i) == Long.MinValue) {
        if ((n + 1) * 5L > cap * 3L) { grow(); put(k, v); return }
        keys(i) = k; n += 1
      }
      vals(i) = v
    }

  def contains(k: Long): Boolean =
    if (k == Long.MinValue) hasMin
    else {
      var i = slot(k)
      while (keys(i) != Long.MinValue && keys(i) != k) i = (i + 1) & mask
      keys(i) == k
    }

  /** Caller guarantees the key is present (union-find reads only keys
    * it inserted). */
  def get(k: Long): Long =
    if (k == Long.MinValue) minVal
    else {
      var i = slot(k)
      while (keys(i) != k) i = (i + 1) & mask
      vals(i)
    }

  def keysIterator: Iterator[Long] = {
    val arr = keys // stable snapshot reference for the iterator
    val base = Iterator.range(0, arr.length)
      .filter(i => arr(i) != Long.MinValue).map(arr)
    if (hasMin) Iterator.single(Long.MinValue) ++ base else base
  }
}
