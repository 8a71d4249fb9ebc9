package graft

import org.apache.spark.sql.functions._

import graft.queries.Packing

/** No-split complement-pairing packer. The oracle pins engine agreement;
  * this spec pins the packing semantics:
  *
  *  1. every per-source row equals a driver-side replay (sort, complement
  *     pairing, fit/overflow verdicts, sequence accounting, utilization);
  *  2. the sequence count satisfies the exact accounting identity
  *     fit + 2·split + odd-middle + oversize;
  *  3. pairing never loses to the one-doc-per-sequence baseline;
  *  4. the fixture exercises both branches (fitting AND overflowing
  *     pairs exist).
  */
class PackPairingSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf
  private val L = 128L

  private def brute(): Map[String, (Long, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, sfDir)
    val docs = s.table("documents")
      .filter($"source".isNotNull && $"text".isNotNull)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect().toSeq
      .map { case (id, src, t) => (id, src, t.split(" ", -1).length.toLong) }

    docs.groupBy(_._2).map { case (src, ds) =>
      val toks = ds.map(_._3)
      val oversize = toks.count(_ > L)
      val nos = ds.filter(_._3 <= L).sortBy(d => (-d._3, d._1)).map(_._3)
      val m = nos.length
      val pairSums = (0 until m / 2).map(i => nos(i) + nos(m - 1 - i))
      val fit = pairSums.count(_ <= L).toLong
      val splitP = pairSums.count(_ > L).toLong
      val seqs = fit + 2 * splitP + (m % 2) + oversize
      val capped = toks.map(math.min(_, L)).sum
      src -> ((ds.length.toLong, toks.sum, oversize.toLong, fit, splitP,
        seqs, ds.length.toLong, capped * 10000 / (seqs * L),
        capped * 10000 / (ds.length * L)))
    }
  }

  test("per-source packing equals the driver-side replay") {
    val s = spark
    import s.implicits._
    val want = brute()
    val got = Packing.packPairing(s, sfDir)
      .select($"source", $"n_docs", $"total_tokens", $"n_oversize",
        $"n_pairs_fit", $"n_pairs_split", $"n_sequences",
        $"n_sequences_single", $"util_bp", $"util_single_bp")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(got.length == want.size)
    got.foreach { case (src, a, b, c, d, e, f, g, h, i) =>
      assert(want(src) == ((a, b, c, d, e, f, g, h, i)),
        s"source $src: got ${(a, b, c, d, e, f, g, h, i)} vs ${want(src)}")
    }
  }

  test("sequence accounting identity and baseline dominance") {
    val s = spark
    import s.implicits._
    val rows = Packing.packPairing(s, sfDir)
      .select($"n_docs", $"n_oversize", $"n_pairs_fit", $"n_pairs_split",
        $"n_sequences", $"util_bp", $"util_single_bp")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nd, ov, fit, sp, seqs, u, us) =>
      val m = nd - ov
      assert(seqs == fit + 2 * sp + (m % 2) + ov, "accounting identity")
      assert(seqs <= nd, "pairing can never need more sequences than docs")
      assert(u >= us, s"paired utilization $u below baseline $us")
    }
  }

  test("the fixture exercises both pair branches") {
    val s = spark
    import s.implicits._
    val rows = Packing.packPairing(s, sfDir)
      .select($"n_pairs_fit", $"n_pairs_split").as[(Long, Long)].collect()
    assert(rows.map(_._1).sum > 0, "no fitting pair on the fixture")
    assert(rows.map(_._2).sum > 0, "no overflowing pair on the fixture")
  }
}
