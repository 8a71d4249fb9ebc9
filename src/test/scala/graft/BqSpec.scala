package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The binary-quantization rung. The oracle hash-match pins engine
  * agreement; this spec pins that the rung implements BQ over the shared
  * index artifact:
  *
  *  1. the packed words are exactly the persisted SQ8 codes' top bits
  *     (MSB-first per 32-code half-word) — verified against a driver-side
  *     repack of the artifact;
  *  2. Hamming ranking equals a driver-side popcount over those words;
  *  3. the exact rerank dominates the raw bit scan per query (a true
  *     neighbor in the Hamming shortlist can only move UP when re-scored
  *     by true cosine);
  *  4. serving purity: the BQ plans read the published sq8_codes artifact
  *     through the delta protocol and contain no quantizer build.
  */
class BqSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  private def packedDriverSide(): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    AnnIndex.sq8CodesOf(AnnIndex.served(s, sfDir))
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect()
      .map { case (id, codes) =>
        def pack(half: Seq[Int]): Long =
          half.foldLeft(0L)((acc, c) => acc * 2 + (if (c >= 128) 1 else 0))
        id -> ((pack(codes.slice(0, 32)), pack(codes.slice(32, 64))))
      }.toMap
  }

  test("packed words are the SQ8 codes' top bits (driver repack agrees)") {
    val s = spark
    import s.implicits._
    val want = packedDriverSide()
    val got = Similarity.annBq(s, sfDir) // force the serving path once
    assert(got.count() > 0)
    // reach the packed frame through the memo the entries share
    val words = graft.util.Memo.cached(s, sfDir, "bq_words")(
      sys.error("bq_words must already be memoized by the serve"))
      .select($"vec_id", $"w0", $"w1").as[(Long, Long, Long)].collect()
    assert(words.nonEmpty)
    words.foreach { case (id, w0, w1) =>
      assert(want(id) == ((w0, w1)), s"vec $id packed ${(w0, w1)}, want ${want(id)}")
    }
  }

  test("Hamming ranking equals a driver-side popcount scan") {
    val s = spark
    import s.implicits._
    val words = packedDriverSide()
    val queries = words.keys.filter(id => id % 50 == 0 && id < 50 * 40).toSeq
    val got = Similarity.annBq(s, sfDir)
      .select($"query_id", $"neighbor_id", $"rank", $"hamming")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(r => (r._2, r._4)).toSeq).toMap
    assert(got.keySet == queries.toSet)
    for (q <- queries) {
      val (q0, q1) = words(q)
      val want = words.toSeq.filter(_._1 != q)
        .map { case (id, (w0, w1)) =>
          (id, (java.lang.Long.bitCount(w0 ^ q0) + java.lang.Long.bitCount(w1 ^ q1)).toLong)
        }
        .sortBy { case (id, h) => (h, id) }.take(3)
      assert(got(q) == want, s"query $q: got ${got(q)}, want $want")
    }
  }

  test("exact rerank dominates the raw bit scan per query") {
    val s = spark
    import s.implicits._
    val raw = Similarity.annRecallBq(s, sfDir)
      .select($"query_id", $"hits").as[(Long, Long)].collect().toMap
    val rr = Similarity.annRecallBqRerank(s, sfDir)
      .select($"query_id", $"hits").as[(Long, Long)].collect().toMap
    assert(raw.keySet == rr.keySet)
    raw.foreach { case (q, h) =>
      assert(rr(q) >= h, s"query $q: rerank hits ${rr(q)} below raw $h")
    }
    assert(rr.values.sum > raw.values.sum,
      "the rerank must add hits somewhere on the fixture")
  }

  test("IVF admission: every composed-rung answer lies in one of the query's probed cells") {
    val s = spark
    import s.implicits._
    val idx = AnnIndex.served(s, sfDir)
    val probed = Similarity.probesTo(s, sfDir, idx.centroids, 3)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cells = idx.assignments
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val out = Similarity.annIvfBq(s, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, n) =>
      assert(probed(q).contains(cells(n)),
        s"query $q answered with $n from unprobed cell ${cells(n)}")
    }
  }

  test("serving purity: BQ plans read the published sq8_codes artifact, no quantizer build") {
    for ((name, df) <- Seq(
        "bq" -> Similarity.annBq(spark, sfDir),
        "bq_rerank" -> Similarity.annBqRerank(spark, sfDir),
        "ivfbq" -> Similarity.annIvfBq(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("sq8_codes"),
        s"$name: plan does not scan the persisted code artifact")
      assert(plan.contains("delta="),
        s"$name: plan does not read through the delta protocol")
      assert(!plan.toLowerCase.contains("posexplode"),
        s"$name: the quantizer build's element explode leaked into serving")
    }
  }
}
