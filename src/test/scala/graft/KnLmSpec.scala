package graft

import org.apache.spark.sql.functions._

import graft.queries.KnLm

/** The Kneser-Ney bigram model. The oracle pins engine agreement; this
  * spec pins that the pipeline implements interpolated KN:
  *
  *  1. every bigram's quantized probability equals a driver-side replay of
  *     the D = 3/4 interpolation from raw counts;
  *  2. probability mass is conserved under quantization: per head, the
  *     observed-successor mass never exceeds 1 (the discount reserves
  *     strictly positive mass for unseen successors);
  *  3. the continuation device does its job: a tail's score responds to
  *     CONTEXT COUNT, not raw frequency (the "San Francisco" property —
  *     a frequent word following few contexts gets less continuation mass
  *     than its frequency alone would);
  *  4. per-document cross-entropy equals a driver-side replay, and sits
  *     in [0, log2(vocab)+1] bits on the near-uniform fixture.
  */
class KnLmSpec extends SparkSpec {

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

  private def corpusBigrams(): Seq[(Long, String, String)] = {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, sfDir)
    s.table("documents").select($"doc_id", $"text").as[(Long, String)].collect()
      .toSeq.flatMap { case (id, t) =>
        val w = Option(t).getOrElse("").split(" ").filter(_.nonEmpty)
        w.toSeq.sliding(2).collect { case Seq(a, b) => (id, a, b) }
      }
  }

  /** Driver-side model: bigram -> (c_hw, c_h, n1_h, cont_w, p_fp). */
  private def bruteModel(bg: Seq[(Long, String, String)])
      : Map[(String, String), Long] = {
    val cHW = bg.groupBy(g => (g._2, g._3)).view.mapValues(_.size.toLong).toMap
    val cH = cHW.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1H = cHW.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val contW = cHW.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val z = contW.values.sum
    cHW.map { case ((h, w), c) =>
      val t1 = (BigInt(4 * c - 3) * P / BigInt(4 * cH(h))).toLong
      val t2 = (3 * n1H(h) * P / (4 * cH(h))) * contW(w) / z
      (h, w) -> math.max(t1 + t2, 1L)
    }
  }

  test("quantized probabilities equal the driver-side D=3/4 interpolation") {
    val s = spark
    import s.implicits._
    val want = bruteModel(corpusBigrams())
    val got = KnLm.model(s, sfDir)
      .select($"head", $"tail", $"p_fp").as[(String, String, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (h, w, p) =>
      assert(want((h, w)) == p, s"($h,$w): spark $p vs driver ${want((h, w))}")
    }
  }

  test("mass conservation: observed-successor mass per head stays below 1") {
    val s = spark
    import s.implicits._
    val byHead = KnLm.model(s, sfDir)
      .groupBy($"head").agg(sum($"p_fp").as("mass"))
      .select($"head", $"mass").as[(String, Long)].collect()
    assert(byHead.nonEmpty)
    byHead.foreach { case (h, m) =>
      assert(m <= P, s"head '$h': observed mass $m exceeds 2^30")
      assert(m > 0, s"head '$h': empty mass")
    }
  }

  test("continuation device: context diversity, not raw frequency, drives the backoff term") {
    val s = spark
    import s.implicits._
    // within one head, two tails with equal bigram count: the one following
    // MORE distinct contexts must score at least as high (t1 equal, t2
    // monotone in cont_w)
    val rows = KnLm.model(s, sfDir)
      .select($"head", $"tail", $"c_hw", $"cont_w", $"p_fp")
      .as[(String, String, Long, Long, Long)].collect()
    val pairs = rows.groupBy(r => (r._1, r._3)).values.filter(_.length >= 2)
    assert(pairs.nonEmpty, "fixture must contain equal-count tail pairs")
    pairs.foreach { grp =>
      val sorted = grp.sortBy(_._4)
      sorted.zip(sorted.tail).foreach { case (lo, hi) =>
        assert(lo._5 <= hi._5,
          s"head ${lo._1}: tail ${lo._2} (cont ${lo._4}) outscores ${hi._2} (cont ${hi._4})")
      }
    }
  }

  test("filter curve: retention is monotone in the cutoff and consistent with perplexity") {
    val s = spark
    import s.implicits._
    val curve = KnLm.filterCurve(s, sfDir)
      .orderBy($"cutoff_bits")
      .select($"cutoff_bits", $"docs_kept", $"docs_total", $"doc_keep_bp",
        $"bigrams_kept", $"bigrams_total")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(curve.map(_._1).toSeq == Seq(3L, 4L, 5L, 6L))
    curve.zip(curve.tail).foreach { case (lo, hi) =>
      assert(lo._2 <= hi._2 && lo._5 <= hi._5,
        s"retention must be monotone: $lo vs $hi")
    }
    val ppl = KnLm.perplexity(s, sfDir)
      .select($"bits", $"n_bigrams").as[(Long, Long)].collect()
    curve.foreach { case (b, dk, dt, bp, gk, gt) =>
      assert(dk == ppl.count(_._1 <= b), s"cutoff $b docs_kept")
      assert(dt == ppl.length && gt == ppl.map(_._2).sum)
      assert(gk == ppl.filter(_._1 <= b).map(_._2).sum, s"cutoff $b bigram mass")
      assert(bp == dk * 10000 / dt)
    }
  }

  test("per-document cross-entropy equals a driver replay, within sane bits") {
    val s = spark
    import s.implicits._
    val bg = corpusBigrams()
    val model = bruteModel(bg)
    val want = bg.groupBy(_._1).view.mapValues { gs =>
      val bits = gs.map(g => 30L * 65536L - lgFp(model((g._2, g._3))))
      (gs.size.toLong, bits.sum / gs.size)
    }.toMap
    val got = KnLm.perplexity(s, sfDir)
      .select($"doc_id", $"n_bigrams", $"xent_fp", $"bits")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (id, n, x, b) =>
      assert(want(id) == ((n, x)), s"doc $id: ($n,$x) vs ${want(id)}")
      assert(b == x / 65536, s"doc $id: bits floor")
      assert(b >= 0 && b <= 6, s"doc $id: $b bits implausible for a 31-word vocab")
    }
  }
}
