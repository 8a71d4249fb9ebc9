package graft

import org.apache.spark.sql.functions._

import graft.plans.TextFingerprint
import graft.queries.Dedup

/** KMV corpus-overlap sketch: expression contract (k smallest distinct,
  * sorted, union-composable) plus estimator accuracy against the exact
  * shingle-level overlap on the sf0.001 fixture — the property the oracle
  * hash-match alone cannot assert (the oracle runs the same estimator, so it
  * agrees even if the estimate were useless).
  */
class KmvOverlapSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def session = { val s = spark; TextFingerprint.register(s); s }

  /** Driver-side reference: all mapped shingle hashes of a words array. */
  private def allHashes(words: Seq[String]): Set[Long] =
    words.sliding(3).filter(_.length == 3).map { w =>
      val shingle = w.mkString(" ")
      var acc = 0L
      shingle.foreach(c => acc = (acc * 131 + c.toLong) % 1000000007L)
      (acc * 2654435761L) % 4294967296L
    }.toSet

  test("graft_kmv_sketch returns the k smallest distinct hashes, ascending") {
    val s = session
    import s.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown fox",
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two", // < 3 words -> empty sketch
      "repeat repeat repeat repeat repeat repeat") // all shingles identical
    val got = docs.toDF("text")
      .select(expr("graft_kmv_sketch(split(text, ' '), 5)").as("sk"))
      .collect().map(_.getSeq[Long](0).toList)
    docs.zip(got).foreach { case (text, sk) =>
      val want = allHashes(text.split(" ").toSeq).toList.sorted.take(5)
      assert(sk == want, s"for: $text")
    }
  }

  test("KMV sketches compose under union (merge = sketch of concatenation)") {
    val s = session
    import s.implicits._
    val a = "the fast key order sort table scan merge part window small hash"
    val b = "stream spark window window dup key order sort batch batch merge"
    val Seq(skA, skB, skAB) = Seq(a, b, a + " x " + b).toDF("text")
      .select(expr("graft_kmv_sketch(split(text, ' '), 8)").as("sk"))
      .collect().toSeq.map(_.getSeq[Long](0).toSet)
    // the k smallest of the union's universe are all present in the union
    // of the parts' sketches (the bridging shingles around " x " can only
    // ADD values, and k-min of a superset is a subset of candidate minima)
    val merged = (skA ++ skB).toList.sorted.take(8).toSet
    val exact = (allHashes(a.split(" ").toSeq) ++ allHashes(b.split(" ").toSeq))
      .toList.sorted.take(8).toSet
    assert(merged == exact)
    assert(skAB.subsetOf(allHashes((a + " x " + b).split(" ").toSeq)))
  }

  test("estimators land near exact shingle overlap on the fixture corpus") {
    val s = session
    import s.implicits._
    graft.fixtures.Fixtures.register(s, sfDir)

    val est = Dedup.corpusOverlapKmv(s, sfDir)
      .select($"lang_a", $"lang_b", $"jaccard_est", $"est_union")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap

    // exact shingle-level overlap per lang pair (the thing KMV avoids
    // computing at scale; affordable at sf0.001)
    val hashes = s.table("documents")
      .select($"lang", explode(expr("graft_kmv_sketch(split(text, ' '), 1000000)")).as("h"))
      .distinct()
    val exact = hashes.as("a").join(hashes.as("b"),
        $"a.h" === $"b.h" && $"a.lang" < $"b.lang")
      .groupBy($"a.lang".as("la"), $"b.lang".as("lb"))
      .agg(count(lit(1)).as("inter"))
      .join(hashes.groupBy($"lang".as("la")).agg(count(lit(1)).as("na")), Seq("la"))
      .join(hashes.groupBy($"lang".as("lb")).agg(count(lit(1)).as("nb")), Seq("lb"))
      .collect()
      .map(r => ((r.getString(1), r.getString(0)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    assert(est.keySet == exact.keySet)
    est.foreach { case (pair, (jEst, uEst)) =>
      val (inter, na, nb) = exact(pair)
      val union = na + nb - inter
      val jTrue = inter.toDouble / union
      // k=256: binomial std ≈ sqrt(j(1-j)/k) ≈ 0.02 at j≈0.1; allow 4σ
      assert(math.abs(jEst - jTrue) < 0.08,
        s"$pair: jaccard_est $jEst vs true $jTrue")
      // KMV distinct-count estimator: relative error ~ 1/sqrt(k-1) ≈ 6.3%
      assert(math.abs(uEst - union) / union < 0.25,
        s"$pair: est_union $uEst vs true $union")
    }
  }

  test("incremental minhash equals the full-corpus pairs filtered to the batch") {
    val s = session
    import s.implicits._
    val inc = Dedup.incrementalMinhash(s, sfDir)
    val full = Dedup.minhashLsh(s, sfDir)
      .filter(col("doc_a") % 7 === 0 || col("doc_b") % 7 === 0)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("corpus overlap survives snapshots whose sketches are all empty") {
    val s = session
    import s.implicits._
    // Fixtures.register is memoized per (session, sfDir): registering the
    // real fixture first, then overriding the documents view, keeps the
    // override live through corpusOverlapKmv's own register call. Every doc
    // in langs aa/bb is under 3 words -> their sketches are EMPTY. The
    // explode drops empty sketches, so degenerate snapshots fall out of the
    // report entirely — on both engines (the oracle's len(words) >= 3 filter
    // mirrors it) — rather than joining with an empty mg. cc carries one
    // real doc so the pipeline end (sketch, pair machinery) still runs.
    graft.fixtures.Fixtures.register(s, sfDir)
    Seq((1L, "aa", "one two"), (2L, "bb", "x"), (3L, "bb", "y z"),
      (4L, "cc", "alpha beta gamma delta"))
      .toDF("doc_id", "lang", "text").createOrReplaceTempView("documents")
    try {
      // no pair row (only cc sketches) and, crucially, no runtime throw
      assert(Dedup.corpusOverlapKmv(s, sfDir).collect().isEmpty)
      // novelty attribution sees only the lang that contributed hashes
      val nov = Dedup.corpusNoveltyKmv(s, sfDir).collect()
      assert(nov.map(_.getString(0)).toSet == Set("cc"))
    } finally {
      // restore the real table for suites sharing the session
      s.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("documents")
    }
  }
}
