package graft

import org.apache.spark.sql.functions._

import graft.queries.SbLm

/** The Stupid-Backoff trigram model. The oracle pins engine agreement; this
  * spec pins that the pipeline implements Brants et al.'s scheme:
  *
  *  1. every held-out document's cross-entropy equals a driver-side replay
  *     of the full backoff cascade from raw train-split counts;
  *  2. the holdout split genuinely exercises backoff on the fixture (both a
  *     trigram-hit level and at least one backoff level are populated);
  *  3. the mix table is a partition of the scored tokens: shares sum to
  *     10000 bp up to per-level floor loss, levels stay in {0,1,2,3};
  *  4. train/holdout never overlap by content (the split is leakage-free by
  *     construction — same text, same side).
  */
class SbLmSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf
  private val P = 1073741824L // 2^30

  private def lgFp(c: Long): Long = {
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(c)
    var r = if (msb <= 30) c << (30 - msb) else c >> (msb - 30)
    var f = 0L
    for (_ <- 1 to 16) {
      val sq = r * r / P
      if (sq >= 2147483648L) { r = sq / 2; f = f * 2 + 1 }
      else { r = sq; f = f * 2 }
    }
    msb * 65536L + f
  }

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (doc_id, split, words) for every fixture document. */
  private def docs(): Seq[(Long, String, Array[String])] = {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, sfDir)
    s.table("documents").select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.map { case (id, t) =>
        val text = Option(t).getOrElse("")
        val split = if (sha256Hex(text).charAt(0) <= 'c') "train" else "holdout"
        (id, split, text.split(" ").filter(_.nonEmpty))
      }
  }

  /** Driver-side replay: per holdout doc, (n_trigrams, xent_fp) plus the
    * per-token levels. */
  private def brute(ds: Seq[(Long, String, Array[String])])
      : (Map[Long, (Long, Long)], Seq[Long]) = {
    val train = ds.filter(_._2 == "train")
    def grams(n: Int) = train.flatMap(_._3.toSeq.sliding(n).filter(_.length == n))
    val c3 = grams(3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = grams(2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = grams(1).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = c1.values.sum

    def score(a: String, b: String, c: String): (Long, Long) =
      c3.get(Seq(a, b, c)) match {
        case Some(t) => (3L, math.max((BigInt(t) * P / c2(Seq(a, b))).toLong, 1L))
        case None => c2.get(Seq(b, c)) match {
          case Some(t) =>
            (2L, math.max(2 * (BigInt(t) * P / c1(Seq(b))).toLong / 5, 1L))
          case None => c1.get(Seq(c)) match {
            case Some(t) => (1L, math.max(4 * (BigInt(t) * P / n).toLong / 25, 1L))
            case None => (0L, math.max(4 * (P / n) / 25, 1L))
          }
        }
      }

    val perTok = ds.filter(_._2 == "holdout").flatMap { case (id, _, w) =>
      w.toSeq.sliding(3).filter(_.length == 3).toSeq.collect { case Seq(a, b, c) =>
        val (lvl, p) = score(a, b, c)
        (id, lvl, 30L * 65536L - lgFp(p))
      }
    }
    val perDoc = perTok.groupBy(_._1).view.mapValues { ts =>
      (ts.size.toLong, ts.map(_._3).sum / ts.size)
    }.toMap
    (perDoc, perTok.map(_._2))
  }

  test("held-out cross-entropy equals the driver-side backoff replay") {
    val s = spark
    import s.implicits._
    val (want, _) = brute(docs())
    val got = SbLm.perplexity(s, sfDir)
      .select($"doc_id", $"n_trigrams", $"xent_fp", $"bits")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size, s"${got.length} docs vs ${want.size}")
    got.foreach { case (id, n, x, b) =>
      assert(want(id) == ((n, x)), s"doc $id: ($n,$x) vs ${want(id)}")
      assert(b == x / 65536)
    }
  }

  test("the fixture exercises the cascade: hits AND backoffs both present") {
    val (_, levels) = brute(docs())
    assert(levels.contains(3L), "no trigram hit on the fixture")
    assert(levels.exists(_ < 3L), "holdout never backs off — split broken?")
  }

  test("mix table partitions the scored tokens; levels in range") {
    val s = spark
    import s.implicits._
    val mix = SbLm.backoffMix(s, sfDir)
      .select($"level", $"n_tokens", $"share_bp", $"mean_bits_fp")
      .as[(Long, Long, Long, Long)].collect()
    val (_, levels) = brute(docs())
    assert(mix.map(_._1).forall(l => l >= 0 && l <= 3))
    assert(mix.map(_._2).sum == levels.size)
    mix.foreach { case (l, n, _, _) =>
      assert(n == levels.count(_ == l), s"level $l token count")
    }
    val shareSum = mix.map(_._3).sum
    assert(shareSum > 10000 - mix.length && shareSum <= 10000,
      s"shares sum to $shareSum bp")
    mix.foreach { case (_, _, _, bits) => assert(bits >= 0) }
  }

  test("the split is leakage-free: identical text never lands on both sides") {
    val bySide = docs().groupBy(_._2).view
      .mapValues(_.map(_._3.mkString(" ")).toSet).toMap
    val overlap = bySide.getOrElse("train", Set.empty)
      .intersect(bySide.getOrElse("holdout", Set.empty))
    assert(overlap.isEmpty, s"${overlap.size} texts on both sides")
  }

  test("filter curve: retention is monotone and consistent with perplexity") {
    val s = spark
    import s.implicits._
    val curve = SbLm.filterCurve(s, sfDir)
      .orderBy($"cutoff_bits")
      .select($"cutoff_bits", $"docs_kept", $"docs_total", $"doc_keep_bp",
        $"trigrams_kept", $"trigrams_total")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(curve.map(_._1).toSeq == Seq(3L, 4L, 5L, 6L))
    curve.zip(curve.tail).foreach { case (lo, hi) =>
      assert(lo._2 <= hi._2 && lo._5 <= hi._5, s"retention monotone: $lo vs $hi")
    }
    val ppl = SbLm.perplexity(s, sfDir)
      .select($"bits", $"n_trigrams").as[(Long, Long)].collect()
    curve.foreach { case (b, dk, dt, bp, gk, gt) =>
      assert(dk == ppl.count(_._1 <= b), s"cutoff $b docs_kept")
      assert(dt == ppl.length && gt == ppl.map(_._2).sum)
      assert(gk == ppl.filter(_._1 <= b).map(_._2).sum, s"cutoff $b mass")
      assert(bp == dk * 10000 / dt)
    }
  }
}
