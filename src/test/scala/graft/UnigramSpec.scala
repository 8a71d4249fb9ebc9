package graft

import org.apache.spark.sql.functions._

import graft.queries.Unigram

/** The unigram-LM tokenizer. The oracle hash-match pins engine agreement;
  * this spec pins that the pipeline implements the model:
  *
  *  1. the fixed-point log2 equals an independent driver-side integer
  *     implementation (and tracks true log2 within 1 ulp of 2^-16);
  *  2. the SEED inventory is exactly the driver-side frequency-seeded
  *     top-k plus the character coverage floor, and the SHIPPED inventory
  *     equals a driver-side replay of the whole hard-EM round (Viterbi
  *     backtrack E-step, +1-smoothed usage M-step, likelihood-loss prune
  *     with the (loss, cnt, piece) tie-break, characters exempt);
  *  3. Viterbi token counts equal a driver-side DP replay on every corpus
  *     word, and on short words equal brute-force enumeration over ALL
  *     segmentations (max score, then min piece count) — true optimality,
  *     not just engine agreement;
  *  4. the packed objective's tie-break is exercised: equal-probability
  *     segmentations resolve to the fewest pieces;
  *  5. the EM round does not increase corpus fertility (the r15 done-bar).
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

  /** Driver-side argmax path under the packed objective, backtracked with
    * the pipeline's exact tie-break: smallest piece length first among
    * score maximizers at each boundary. */
  private def brutePath(w: String, wgt: Map[String, Long]): Seq[String] = {
    val dp = Array.fill(w.length + 1)(Long.MinValue)
    dp(0) = 0L
    for (j <- 1 to w.length; l <- 1 to math.min(4, j)) {
      val p = w.substring(j - l, j)
      wgt.get(p).foreach { weight =>
        if (dp(j - l) != Long.MinValue) dp(j) = math.max(dp(j), dp(j - l) + weight)
      }
    }
    var j = w.length
    val out = scala.collection.mutable.Buffer[String]()
    while (j > 0) {
      val l = (1 to math.min(4, j)).find { l =>
        val p = w.substring(j - l, j)
        wgt.contains(p) && dp(j - l) != Long.MinValue && dp(j - l) + wgt(p) == dp(j)
      }.get
      out += w.substring(j - l, j); j -= l
    }
    out.toSeq
  }

  private def packedWeights(inv: Map[String, Long]): Map[String, Long] = {
    val lgc = lgFp(inv.values.sum)
    inv.map { case (p, c) => p -> ((lgFp(c) - lgc) * 1024L - 1L) }
  }

  /** Driver-side hard-EM round + prune: (final inventory counts, pruned). */
  private def bruteEm(words: Map[String, Long], seed: Map[String, Long])
      : (Map[String, Long], Set[String]) = {
    val wgt0 = packedWeights(seed)
    val uses = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, freq) <- words; p <- brutePath(w, wgt0)) uses(p) += freq
    val cnt1 = seed.keys.map(p => p -> (uses(p) + 1L)).toMap
    val w1 = packedWeights(cnt1)
    val multi = seed.keys.filter(_.length >= 2).toSeq
    def loss(p: String): Long = uses(p) * (w1(p) - p.map(c => w1(c.toString)).sum)
    val pruned = multi.sortBy(p => (loss(p), cnt1(p), p)).take(12).toSet
    (cnt1.filter { case (p, _) => p.length == 1 || !pruned(p) }, pruned)
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

  test("seed inventory equals the driver-side frequency-seeded top-k plus coverage floor") {
    val s = spark
    import s.implicits._
    val got = Unigram.seedInventory(s, sfDir)
      .select($"piece", $"cnt", $"lg_fp").as[(String, Long, Long)].collect()
    val want = bruteInventory(corpusWords())
    assert(got.length == want.size, s"inventory size ${got.length} vs ${want.size}")
    got.foreach { case (p, c, lg) =>
      assert(want.get(p).contains(c), s"piece '$p' count $c vs ${want.get(p)}")
      assert(lg == lgFp(c), s"piece '$p' lg_fp $lg vs ${lgFp(c)}")
    }
  }

  test("shipped inventory equals a driver-side replay of the hard-EM round + prune") {
    val s = spark
    import s.implicits._
    val words = corpusWords()
    val (want, pruned) = bruteEm(words, bruteInventory(words))
    val got = Unigram.inventory(s, sfDir)
      .select($"piece", $"cnt", $"lg_fp").as[(String, Long, Long)].collect()
    assert(got.length == want.size, s"inventory size ${got.length} vs ${want.size}")
    got.foreach { case (p, c, lg) =>
      assert(!pruned(p), s"pruned piece '$p' must not ship")
      assert(want.get(p).contains(c), s"piece '$p' EM count $c vs ${want.get(p)}")
      assert(lg == lgFp(c), s"piece '$p' lg_fp $lg vs ${lgFp(c)}")
    }
    assert(pruned.size == 12, "the shrinking factor drops exactly 25% of the seeds")
    assert(pruned.forall(_.length >= 2), "characters are coverage-exempt")
  }

  test("Viterbi counts equal a driver-side DP replay on every corpus word") {
    val s = spark
    import s.implicits._
    val words = corpusWords()
    val (fin, _) = bruteEm(words, bruteInventory(words))
    val wgt = packedWeights(fin)
    val got = Unigram.vocabTok(s, sfDir)
      .select($"w", $"n_toks").as[(String, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w, k) =>
      val want = -bruteViterbi(w, wgt) % 1024L
      assert(k == want, s"word '$w': viterbi k $k vs driver $want")
    }
  }

  test("the EM round does not increase corpus fertility") {
    val words = corpusWords()
    val seed = bruteInventory(words)
    val (fin, _) = bruteEm(words, seed)
    def corpusToks(inv: Map[String, Long]): Long = {
      val wgt = packedWeights(inv)
      words.map { case (w, f) => f * brutePath(w, wgt).length }.sum
    }
    val (before, after) = (corpusToks(seed), corpusToks(fin))
    assert(after <= before,
      s"EM+prune fertility regressed: $after tokens vs seed $before")
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
