package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hybrid retrieval contracts the DuckDB gate cannot see on THIS fixture:
  * the synthetic embeddings are uncorrelated with the synthetic text, so
  * the gated entry never produces a doc surfaced by BOTH arms — the
  * both-arms fusion sum is pinned here on a hand-built frame instead. */
class HybridSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  test("fusion sums both arms' reciprocal ranks and a both-arms doc beats single-arm peers") {
    import spark.implicits._
    // query 1: doc 10 is rank-1 in BOTH arms; doc 11 dense-only rank 2;
    // doc 12 sparse-only rank 2. RRF: 10 → ⌊1e6/61⌋·2 = 2·16393 = 32786,
    // 11 and 12 → ⌊1e6/62⌋ = 16129 each.
    val dense = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "doc_id", "dense_rank")
    val sparse = Seq((1L, 10L, 1L), (1L, 12L, 2L)).toDF("qid", "doc_id", "sparse_rank")
    val out = Hybrid.fuse(dense, sparse).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("rrf_e6"), r.getAs[Long]("rank"))).toList.sortBy(_._3)
    assert(out == List((10L, 2 * 16393L, 1L), (11L, 16129L, 2L), (12L, 16129L, 3L)),
      s"fusion arithmetic drifted: $out")
  }

  test("the gated entry fuses real arms: every query ≤3 rows, rrf recomputes from the ranks") {
    val res = Hybrid.hybridRrf(spark, sfDir)
    val perQuery = res.groupBy(col("query_id")).count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getAs[Long]("count") <= 3))
    // rrf_e6 must equal the reciprocal-rank sum recomputed from the arm
    // ranks in every row (NULL arm → 0 contribution)
    val bad = res.filter(
      col("rrf_e6") =!=
        coalesce(expr("CAST(1000000 AS BIGINT) DIV (60 + dense_rank)"), lit(0L)) +
        coalesce(expr("CAST(1000000 AS BIGINT) DIV (60 + sparse_rank)"), lit(0L)))
    assert(bad.isEmpty, "rrf_e6 inconsistent with the arm ranks")
    // both arms genuinely contribute rows to the fused top-3
    assert(res.filter(col("dense_rank").isNotNull).count() > 0, "dense arm absent")
    assert(res.filter(col("sparse_rank").isNotNull).count() > 0, "sparse arm absent")
  }

  test("sparse arm is self-excluding and never returns the query doc") {
    val res = Hybrid.hybridRrf(spark, sfDir)
    assert(res.filter(col("query_id") === col("doc_id")).isEmpty,
      "a query retrieved itself")
  }

  test("evalMrr equals a driver replay over the arm lists; scores in range") {
    val sp = spark
    import sp.implicits._
    val sfDir = SparkSpec.fixtureSf
    val labels = sp.table("embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val arms = graft.queries.Hybrid.armLists(sp, sfDir)
      .select($"arm", $"qid", $"doc_id", $"rank")
      .as[(String, Long, Long, Long)].collect()
    val want = arms
      .filter(r => labels.contains(r._2) && labels.contains(r._3))
      .groupBy(_._1).map { case (arm, rows) =>
        val perQ = rows.groupBy(_._2).map { case (q, rs) =>
          rs.filter(r => labels(r._2) == labels(r._3)).map(_._4)
            .sorted.headOption
        }.toSeq
        val n = perQ.size.toLong
        val hits = perQ.count(_.isDefined).toLong
        val rr = perQ.flatMap(_.map(1000000L / _)).sum
        arm -> ((n, hits, hits * 10000 / n, rr / n))
      }
    val got = graft.queries.Hybrid.evalMrr(sp, sfDir)
      .select($"arm", $"n_queries", $"hits", $"success_bp", $"mrr_e6")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set("dense", "sparse", "fused"))
    got.foreach { case (arm, n, h, sbp, mrr) =>
      assert(want(arm) == ((n, h, sbp, mrr)),
        s"$arm: ${(n, h, sbp, mrr)} vs ${want(arm)}")
      assert(h <= n && sbp <= 10000 && mrr <= 1000000)
    }
  }
}
