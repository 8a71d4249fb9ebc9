package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Prefix-filtered exact similarity join. The DuckDB gate re-proves
  * losslessness structurally (the entry's oracle IS the inverted-index
  * SQL); this spec pins the same cross-validation in-JVM plus the
  * pruning accounting:
  *
  *  1. ppjoin's result set equals ngramJaccard's exactly — two different
  *     candidate-generation algorithms, one answer;
  *  2. the stats row is consistent (result ⊆ prefix candidates ⊆ full
  *     candidates, share arithmetic exact);
  *  3. the prefix filter actually prunes on the fixture (strict
  *     inequality — a vacuous filter would satisfy 1 and 2).
  */
class PpjoinSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  test("ppjoin equals the inverted-index join: lossless pruning, in-JVM") {
    val s = spark
    import s.implicits._
    val pp = Dedup.ppjoin(s, sfDir)
      .select($"doc_a", $"doc_b", $"inter", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    // the independent reference is the UNFILTERED inverted-index builder:
    // the catalog's dedup_ngram_jaccard entry serves the ppjoin path
    // itself since r15, so comparing against it would be vacuous
    val brute = Dedup.ngramJaccardUnfiltered(s, sfDir)
      .select($"doc_a", $"doc_b", $"inter", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(pp == brute,
      s"ppjoin minus brute: ${(pp -- brute).take(3)}; " +
        s"brute minus ppjoin: ${(brute -- pp).take(3)}")
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
  }

  test("stats: containment chain and exact share arithmetic; pruning is real") {
    val s = spark
    import s.implicits._
    val Array((np, nf, nr, bp)) = Dedup.ppjoinStats(s, sfDir)
      .select($"n_cand_prefix", $"n_cand_full", $"n_result", $"cand_share_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(nr <= np && np <= nf)
    assert(bp == np * 10000 / nf)
    assert(np < nf, "the prefix filter must prune strictly on the fixture")
    assert(nr == Dedup.ngramJaccardUnfiltered(s, sfDir).count())
  }

  test("banding curve: arithmetic exact, S-curve direction, truth anchored") {
    val s = spark
    import s.implicits._
    val rows = Dedup.bandingCurve(s, sfDir)
      .orderBy($"rows_per_band")
      .select($"n_bands", $"rows_per_band", $"n_candidates", $"truth_pairs",
        $"caught", $"recall_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq((8L, 2L), (4L, 4L), (2L, 8L)))
    val truth = Dedup.ppjoin(s, sfDir).count()
    rows.foreach { case (_, _, nc, tp, c, bp) =>
      assert(tp == truth)
      assert(c <= math.min(nc, tp))
      assert(bp == c * 10000 / tp)
    }
    // sharper bands can only lose candidate probability at J < 1
    assert(rows.head._6 >= rows.last._6,
      "8x2 recall must not be below 2x8 recall")
    assert(rows.head._6 > 0)
  }
}
