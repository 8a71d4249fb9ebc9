package graft

import org.apache.spark.sql.functions._

import graft.queries.Unigram

/** The unigram-LM tokenizer. The oracle hash-match pins engine agreement;
  * this spec pins that the pipeline implements the model:
  *
  *  1. the fixed-point log2 equals an independent driver-side integer
  *     implementation (and tracks true log2 within 1 ulp of 2^-16);
  *  2. the inventory is exactly the driver-side frequency-seeded top-k
  *     plus the character coverage floor;
  *  3. Viterbi token counts equal a driver-side DP replay on every corpus
  *     word, and on short words equal brute-force enumeration over ALL
  *     segmentations (max score, then min piece count) — true optimality,
  *     not just engine agreement;
  *  4. the packed objective's tie-break is exercised: equal-probability
  *     segmentations resolve to the fewest pieces.
  */
class UnigramSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  /** Driver-side fixed-point log2: msb·2^16 + 16 iterated-squaring bits. */
  private def lgFp(c: Long): Long = {
    require(c >= 1)
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(c)
    var r = if (msb <= 30) c << (30 - msb) else c >> (msb - 30)
    var f = 0L
    for (_ <- 1 to 16) {
      val sq = r * r / 1073741824L
      if (sq >= 2147483648L) { r = sq / 2; f = f * 2 + 1 }
      else { r = sq; f = f * 2 }
    }
    msb * 65536L + f
  }

  private def corpusWords(): Map[String, Long] = {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, sfDir)
    s.table("documents").select($"text").as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
  }

  /** Driver-side seeded inventory: chars + top 48 substrings (len 2..4). */
  private def bruteInventory(words: Map[String, Long]): Map[String, Long] = {
    val subs = scala.collection.mutable.Map[String, Long]()
    val chars = scala.collection.mutable.Map[String, Long]()
    for ((w, freq) <- words; i <- 0 until w.length) {
      chars(w.substring(i, i + 1)) = chars.getOrElse(w.substring(i, i + 1), 0L) + freq
      for (l <- 2 to 4; if i + l <= w.length) {
        val p = w.substring(i, i + l)
        subs(p) = subs.getOrElse(p, 0L) + freq
      }
    }
    val top = subs.toSeq.sortBy { case (p, c) => (-c, p) }.take(48)
    (top ++ chars.toSeq).toMap
  }

  /** Driver-side packed Viterbi: returns (best packed value, k). */
  private def bruteViterbi(w: String, wgt: Map[String, Long]): Long = {
    val dp = Array.fill(w.length + 1)(Long.MinValue)
    dp(0) = 0L
    for (j <- 1 to w.length; l <- 1 to math.min(4, j)) {
      val p = w.substring(j - l, j)
      wgt.get(p).foreach { weight =>
        if (dp(j - l) != Long.MinValue)
          dp(j) = math.max(dp(j), dp(j - l) + weight)
      }
    }
    dp(w.length)
  }

  test("fixed-point log2 tracks true log2 within one 2^-16 ulp") {
    for (c <- Seq(1L, 2L, 3L, 7L, 871L, 123456789L, (1L << 44) - 1)) {
      val got = lgFp(c)
      val want = math.log(c.toDouble) / math.log(2.0) * 65536.0
      assert(math.abs(got - want) <= 1.0, s"lgFp($c) = $got, true = $want")
    }
  }

  test("inventory equals the driver-side frequency-seeded top-k plus coverage floor") {
    val s = spark
    import s.implicits._
    val got = Unigram.inventory(s, sfDir)
      .select($"piece", $"cnt", $"lg_fp").as[(String, Long, Long)].collect()
    val want = bruteInventory(corpusWords())
    assert(got.length == want.size, s"inventory size ${got.length} vs ${want.size}")
    got.foreach { case (p, c, lg) =>
      assert(want.get(p).contains(c), s"piece '$p' count $c vs ${want.get(p)}")
      assert(lg == lgFp(c), s"piece '$p' lg_fp $lg vs ${lgFp(c)}")
    }
  }

  test("Viterbi counts equal a driver-side DP replay on every corpus word") {
    val s = spark
    import s.implicits._
    val words = corpusWords()
    val inv = bruteInventory(words)
    val lgc = lgFp(inv.values.sum)
    val wgt = inv.map { case (p, c) => p -> ((lgFp(c) - lgc) * 1024L - 1L) }
    val got = Unigram.vocabTok(s, sfDir)
      .select($"w", $"n_toks").as[(String, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w, k) =>
      val want = -bruteViterbi(w, wgt) % 1024L
      assert(k == want, s"word '$w': viterbi k $k vs driver $want")
    }
  }

  test("on short words the DP matches brute-force enumeration (max prob, then min pieces)") {
    val words = corpusWords()
    val inv = bruteInventory(words)
    val lgc = lgFp(inv.values.sum)
    val wgt = inv.map { case (p, c) => p -> ((lgFp(c) - lgc) * 1024L - 1L) }
    def segmentations(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val h = w.substring(0, l)
        if (wgt.contains(h)) segmentations(w.substring(l)).map(h +: _) else Seq.empty
      }
    val shortWords = words.keys.filter(w => w.length >= 2 && w.length <= 8).take(40)
    assert(shortWords.nonEmpty)
    for (w <- shortWords) {
      val best = segmentations(w).map(seg => seg.map(wgt).sum).max
      assert(bruteViterbi(w, wgt) == best,
        s"'$w': DP ${bruteViterbi(w, wgt)} vs enumeration $best")
    }
  }

  test("tie-break: equal-probability segmentations resolve to fewest pieces") {
    // pieces 'ab' and 'a','b' with counts making ab exactly a*b/C impossible
    // exactly; instead verify structurally: when a word segments both as
    // one 2-char piece and two 1-char pieces with the SAME quantized score
    // sum, the packed objective picks k=1. Construct: counts c_ab, c_a,
    // c_b all equal — then lg terms are equal and 1 piece beats 2.
    val wgt = Map("a" -> (-65536L * 1024 - 1), "b" -> (-65536L * 1024 - 1),
      "ab" -> (-131072L * 1024 - 1))
    // score(ab) = score(a)+score(b) in lg terms (-131072 = 2·-65536) but
    // packs to fewer pieces: -131072·1024-1 > -131072·1024-2
    assert(bruteViterbi("ab", wgt) == -131072L * 1024 - 1)
    assert(-bruteViterbi("ab", wgt) % 1024L == 1L, "must pick the single piece")
  }

  test("fertility: unigram Viterbi under-segments both greedy trainers on the fixture") {
    val s = spark
    import s.implicits._
    val rows = Unigram.compare(s, sfDir)
      .select($"lang", $"bpe_fertility_bp", $"wordpiece_fertility_bp",
        $"unigram_fertility_bp").as[(String, Long, Long, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { case (lang, b, w, u) =>
      assert(u >= 10000L, s"$lang below 1 token/word")
      assert(u < b && u < w,
        s"$lang: global Viterbi ($u) must beat greedy merges (bpe $b, wp $w) here")
    }
  }
}
