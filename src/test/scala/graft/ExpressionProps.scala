package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{DotLong, MinHash32, SimHash60}

/** ScalaCheck properties for the native expressions (pure eval path —
  * no SparkSession needed; the codegen path is covered by LlmSpec's
  * dataframe-level equivalence test). */
object ExpressionProps extends Properties("graft.expressions") {

  private val longArr = Gen.listOfN(64, Gen.chooseNum(-1000000L, 1000000L))

  property("dot_long == BigInt dot product") = Prop.forAll(longArr, longArr) {
    (a: List[Long], b: List[Long]) =>
      val got = DotLong(
        Literal.create(a.toArray, ArrayType(LongType)),
        Literal.create(b.toArray, ArrayType(LongType))).eval(null).asInstanceOf[Long]
      val want = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      BigInt(got) == want
  }

  property("dot_long: NULL on unequal lengths (HOF zip_with null-pad twin)") =
    Prop.forAll(longArr, longArr, Gen.chooseNum(1, 63)) {
      (a: List[Long], b: List[Long], k: Int) =>
        DotLong(
          Literal.create(a.toArray, ArrayType(LongType)),
          Literal.create(b.take(k).toArray, ArrayType(LongType))).eval(null) == null
    }

  property("dot_long: NULL when any element is NULL (HOF poison twin)") =
    Prop.forAll(longArr, Gen.chooseNum(0, 63)) { (a: List[Long], at: Int) =>
      val withNull: Array[Any] = a.toArray.map(x => x: Any).updated(at, null)
      DotLong(
        Literal.create(new GenericArrayData(withNull), ArrayType(LongType)),
        Literal.create(a.toArray, ArrayType(LongType))).eval(null) == null
    }

  private val tokArr = Gen.nonEmptyListOf(Gen.identifier.map(_.take(12)))

  property("inter_count_sorted == set-intersection cardinality") =
    Prop.forAll(tokArr, tokArr) { (a: List[String], b: List[String]) =>
      def sortedArr(xs: List[String]): ArrayData = new GenericArrayData(
        xs.distinct.sorted.map(UTF8String.fromString).toArray)
      val got = graft.functions.InterCountSorted(
        Literal.create(sortedArr(a), ArrayType(StringType)),
        Literal.create(sortedArr(b), ArrayType(StringType))).eval(null)
      got == a.toSet.intersect(b.toSet).size.toLong
    }

  property("simhash60: bit b set iff strict majority of hashes set bit b") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 60) - 1))) { hs =>
      val sig = SimHash60(Literal.create(hs.toArray, ArrayType(LongType)))
        .eval(null).asInstanceOf[Long]
      (0 until 60).forall { b =>
        val set = hs.count(h => ((h >> b) & 1L) == 1L)
        val expected = 2 * set > hs.size
        (((sig >> b) & 1L) == 1L) == expected
      }
    }

  property("minhash32: permutation-invariant and monotone under union") =
    Prop.forAll(tokArr, tokArr) { (a: List[String], b: List[String]) =>
      def mh(toks: Seq[String]): Seq[Long] = {
        val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray)
        MinHash32(Literal.create(arr, ArrayType(StringType)))
          .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      }
      val same = mh(a) == mh(scala.util.Random.shuffle(a))
      // min over a union is the pairwise min of the parts' minhashes
      val unionOk = mh(a ++ b) == mh(a).zip(mh(b)).map { case (x, y) => math.min(x, y) }
      same && unionOk
    }

  property("bloom: build-then-probe never false-negative; NULL-safe") =
    Prop.forAll(Gen.listOfN(200, Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      (keys: List[Long]) =>
        val agg = new graft.functions.BloomGramAgg(1 << 12)
        val bits = keys.foldLeft(agg.zero)(agg.reduce)
        val arr = Literal.create(bits, ArrayType(LongType))
        val allIn = keys.forall { k =>
          graft.functions.BloomContains(arr, Literal.create(k, LongType))
            .eval(null) == true
        }
        val nullSafe = graft.functions.BloomContains(
          Literal.create(null, ArrayType(LongType)),
          Literal.create(1L, LongType)).eval(null) == null
        allIn && nullSafe
    }

  property("bloom: merge(a,b) covers every key of both parts") =
    Prop.forAll(Gen.listOfN(100, Gen.chooseNum(Long.MinValue, Long.MaxValue)),
      Gen.listOfN(100, Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      (xs: List[Long], ys: List[Long]) =>
        val agg = new graft.functions.BloomGramAgg(1 << 12)
        val merged = agg.merge(
          xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce))
        val arr = Literal.create(merged, ArrayType(LongType))
        (xs ++ ys).forall { k =>
          graft.functions.BloomContains(arr, Literal.create(k, LongType))
            .eval(null) == true
        }
    }

  property("count-min: estimate >= true count, across merges") =
    Prop.forAll(Gen.listOfN(300, Gen.chooseNum(0L, 40L)),
      Gen.chooseNum(1, 299)) { (keys: List[Long], splitAt: Int) =>
        val agg = new graft.functions.CountMinAgg(64)
        val (l, r) = keys.splitAt(splitAt)
        val sketch = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        val arr = Literal.create(sketch, ArrayType(LongType))
        keys.distinct.forall { k =>
          val est = graft.functions.CmEstimate(arr, Literal.create(k, LongType))
            .eval(null).asInstanceOf[Long]
          est >= keys.count(_ == k)
        }
    }

  property("interleave16 == per-bit reference interleave; fold is & 0xFFFF") =
    Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (x: Long, y: Long) =>
      def ref(v: Long, off: Int): Long =
        (0 until 16).map(b => (((v >> b) & 1L) << (2 * b + off))).sum
      val got = graft.functions.Interleave16(
        Literal.create(x, LongType), Literal.create(y, LongType))
        .eval(null).asInstanceOf[Long]
      got == (ref(x & 0xFFFFL, 0) | ref(y & 0xFFFFL, 1))
    }

  property("interleave16 orders like the z-curve: equal high dims, higher y wins") =
    Prop.forAll(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65534L)) {
      (x: Long, y: Long) =>
        // monotone in each dimension with the other fixed
        def z(a: Long, b: Long): Long = graft.functions.Interleave16(
          Literal.create(a, LongType), Literal.create(b, LongType))
          .eval(null).asInstanceOf[Long]
        z(x, y) < z(x, y + 1) && (x >= 65535L || z(x, y) < z(x + 1, y))
    }

  property("tokenize_pos keeps trailing empty tokens (split limit -1)") =
    Prop.forAll(Gen.listOf(Gen.identifier.map(_.take(6)))) { (toks: List[String]) =>
      val text = toks.mkString(" ") + " " // trailing space → trailing empty token
      val rows = graft.functions.TokenizePos(
        Literal.create(UTF8String.fromString(text), StringType))
        .eval(null).asInstanceOf[IterableOnce[org.apache.spark.sql.catalyst.InternalRow]]
      // split(' ') semantics both engines share: n separators → n+1 tokens
      rows.iterator.size == text.count(_ == ' ') + 1
    }

  property("weighted-avg finish: no overflow at the documented headroom") =
    Prop.forAll(Gen.chooseNum(1L, Long.MaxValue / 2),
      Gen.chooseNum(1L, 1000000L)) { (sum: Long, n: Long) =>
        val got = graft.functions.WeightedAvg.finish((sum, n))
        got == ((2 * BigInt(sum) + n) / (2 * BigInt(n))).toLong && got >= 0
    }

  property("minhash32/simhash60: NULL element => NULL signature") =
    Prop.forAll(Gen.chooseNum(0, 5)) { (at: Int) =>
      val toks: Array[Any] = Array.fill[Any](6)(UTF8String.fromString("t"))
      toks(at) = null
      val mh = MinHash32(Literal.create(
        new GenericArrayData(toks), ArrayType(StringType))).eval(null)
      val hs: Array[Any] = Array.fill[Any](6)(7L)
      hs(at) = null
      val sh = SimHash60(Literal.create(
        new GenericArrayData(hs), ArrayType(LongType))).eval(null)
      mh == null && sh == null
    }

  property("vector-centroid: ragged input throws, uniform input averages") =
    Prop.forAll(Gen.chooseNum(2, 8), Gen.chooseNum(1L, 1000L)) { (dims: Int, v: Long) =>
      val vc = graft.functions.VectorCentroid
      val ok = vc.finish(vc.reduce(vc.reduce(vc.zero, Array.fill(dims)(v)),
        Array.fill(dims)(3 * v)))
      val raggedThrows =
        try { vc.reduce(vc.reduce(vc.zero, Array.fill(dims)(v)),
          Array.fill(dims + 1)(v)); false }
        catch { case _: IllegalArgumentException => true }
      ok.toSeq == Seq.fill(dims)(2 * v) && raggedThrows &&
        vc.reduce(vc.zero, null)._2 == 0L // NULL array contributes nothing
    }

  property("misra-gries: merge keeps every item with freq > n/k") =
    Prop.forAll(
      Gen.listOfN(300, Gen.oneOf("hot1", "hot1", "hot1", "hot2", "hot2", "c1", "c2",
        "c3", "c4", "c5", "c6", "c7", "c8")),
      Gen.chooseNum(1, 299)) { (stream: List[String], splitAt: Int) =>
        val mg = new graft.functions.MisraGries(8)
        val (l, r) = stream.splitAt(splitAt)
        val cands = mg.finish(mg.merge(
          l.foldLeft(mg.zero)(mg.reduce), r.foldLeft(mg.zero)(mg.reduce))).toSet
        val n = stream.size
        val heavy = stream.groupBy(identity).view.mapValues(_.size)
          .filter(_._2 * 8 > n).keySet
        cands.size <= 7 && heavy.subsetOf(cands)
    }
}
