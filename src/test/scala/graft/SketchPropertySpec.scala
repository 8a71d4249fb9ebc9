package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.TextFingerprint

/** Property-based contracts for the round-8 primitives — driver-side eval
  * of the same functions the codegen'd expressions call, over randomized
  * inputs (the DataFrame/codegen path is covered by NativeExprSpec and the
  * oracle gate; these pin the MATH on inputs the fixtures never produce).
  */
class SketchPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  private def arr(words: Seq[String]): GenericArrayData =
    new GenericArrayData(words.map(w => UTF8String.fromString(w): Any))

  private def sketchOf(words: Seq[String], k: Int): Seq[Long] = {
    val g = TextFingerprint.kmvSketch(arr(words), k)
    (0 until g.numElements()).map(g.getLong)
  }

  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val docGen: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, wordGen))

  test("kmvSketch: sorted, distinct, bounded by k, and subset-monotone") {
    check(Prop.forAll(docGen, Gen.chooseNum(1, 12)) { (words: List[String], k: Int) =>
      val sk = sketchOf(words, k)
      val sortedDistinct = sk == sk.sorted && sk.distinct == sk
      val bounded = sk.length <= k
      // the sketch of any prefix is a superset-filter of the full sketch's
      // low values: adding shingles can only push values OUT of the k-min
      val skBig = sketchOf(words, Int.MaxValue)
      val isKMin = sk == skBig.take(k)
      sortedDistinct && bounded && isKMin
    })
  }

  test("kmvSketch: union-composability (merge of doc sketches = corpus sketch)") {
    check(Prop.forAll(docGen, docGen, Gen.chooseNum(1, 8)) {
      (a: List[String], b: List[String], k: Int) =>
        // two separate documents (NOT concatenated — concatenation creates
        // bridging shingles): the corpus k-min over both shingle sets must
        // equal the k-min of the merged per-doc sketches
        val merged = (sketchOf(a, k) ++ sketchOf(b, k)).distinct.sorted.take(k)
        val full = (sketchOf(a, Int.MaxValue) ++ sketchOf(b, Int.MaxValue))
          .distinct.sorted.take(k)
        merged == full
    })
  }

  private def refMorton(x: Long, y: Long): Long = {
    var out = 0L
    for (i <- 0 until 31) {
      out |= ((x >> i) & 1L) << (2 * i)
      out |= ((y >> i) & 1L) << (2 * i + 1)
    }
    out
  }

  test("Morton spread steps equal the bit-by-bit reference on arbitrary longs") {
    // the Column-side fold is pinned in LayoutSpec; this pins the magic
    // masks themselves across the whole 31-bit domain including extremes
    val steps = Seq((16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L), (1, 0x5555555555555555L))
    def spread(v: Long): Long =
      steps.foldLeft(v & 0x7FFFFFFFL) { case (x, (s, m)) => (x | (x << s)) & m }
    check(Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (x: Long, y: Long) =>
      val z = spread(x) | (spread(y) << 1)
      z == refMorton(x & 0x7FFFFFFFL, y & 0x7FFFFFFFL) && z >= 0
    })
  }

  test("streaming top-k merge is split-invariant and equals the sorted-take reference") {
    import graft.streaming.StreamingTopK.mergeTopK
    val valuesGen = Gen.listOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    val kGen = Gen.chooseNum(1, 8)
    check(Prop.forAll(valuesGen, kGen, Gen.chooseNum(0, 1000)) {
      (vs: List[Long], k: Int, cutSeed: Int) =>
        val ref = vs.sorted(Ordering.Long.reverse).take(k)
        // one-shot merge matches the reference...
        val oneShot = mergeTopK(Array.empty, vs.iterator, k).toList
        // ...and ANY two-batch split through intermediate state matches too
        // (the micro-batch prefix contract: state is a pure function of the
        // multiset, not of how the stream was batched)
        val cut = if (vs.isEmpty) 0 else cutSeed % (vs.length + 1)
        val (a, b) = vs.splitAt(cut)
        val viaState = mergeTopK(mergeTopK(Array.empty, a.iterator, k), b.iterator, k).toList
        oneShot == ref && viaState == ref
    })
  }

  test("histogram binning and merge are split-invariant and bracket every value") {
    import graft.streaming.StreamingHist.{bin, quantileBin}
    val valuesGen = Gen.listOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    check(Prop.forAll(valuesGen, Gen.chooseNum(0, 1000)) { (vs: List[Long], cutSeed: Int) =>
      val incl = vs.filter(_ >= 1L)
      // binning brackets: every included value lies inside its bin's range
      val brackets = incl.forall { v =>
        val b = bin(v); v >= (1L << b) && (b == 62 || v < (1L << (b + 1)))
      }
      // additive merge is split-invariant (the micro-batch prefix contract)
      def histOf(xs: List[Long]): Map[Int, Long] =
        xs.filter(_ >= 1L).groupBy(bin).view.mapValues(_.length.toLong).toMap
      val cut = if (vs.isEmpty) 0 else cutSeed % (vs.length + 1)
      val (a, b) = vs.splitAt(cut)
      val merged = (histOf(a).keySet ++ histOf(b).keySet)
        .map(k => k -> (histOf(a).getOrElse(k, 0L) + histOf(b).getOrElse(k, 0L))).toMap
      val splitInvariant = merged == histOf(vs)
      // the quantile bin brackets the exact percentile under the same rule
      val quantileOk = incl.isEmpty || {
        val h = histOf(vs).toSeq.sortBy(_._1)
        val sorted = incl.sorted
        Seq(50L, 90L, 99L).forall { q =>
          val qb = quantileBin(h.map(_._1), h.map(_._2), q)
          val exact = sorted(((q * sorted.length + 99) / 100 - 1).toInt)
          bin(exact) == qb
        }
      }
      brackets && splitInvariant && quantileOk
    })
  }

  test("Morton key preserves per-dimension ordering within the other dimension") {
    // de-interleaving the key recovers both inputs — the property file
    // skipping relies on (a z-range bounds BOTH dimensions)
    def unspread(z: Long): Long = {
      var out = 0L
      for (i <- 0 until 31) out |= ((z >> (2 * i)) & 1L) << i
      out
    }
    check(Prop.forAll(Gen.chooseNum(0L, 0x7FFFFFFFL), Gen.chooseNum(0L, 0x7FFFFFFFL)) {
      (x: Long, y: Long) =>
        val z = refMorton(x, y)
        unspread(z) == x && unspread(z >> 1) == y
    })
  }
}
