package graft

import graft.queries.TextOps

/** text_rrf_fusion: the fused ranking must equal the RRF of the per-term
  * top-20 lists as produced by the PUBLIC single-term BM25 entry points
  * (an independent composition path), and the fusion arithmetic must hold
  * its bounds. */
class RrfFusionSpec extends SparkSpec {

  private lazy val fused =
    TextOps.rrfFusion(spark, SparkSpec.fixtureSf).collect()

  test("fusion equals RRF over the single-term BM25 rankings") {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    val docs = spark.table("documents")
    val expected = scala.collection.mutable.Map[Long, (Long, Long)]()
    TextOps.bm25Terms.foreach { t =>
      // collect() of the ordered+limited query preserves rank order; do
      // NOT re-sort by the ROUNDED output score — 6-dp ties could flip
      val list = TextOps.bm25(docs, Seq(t)).collect()
      list.zipWithIndex.foreach { case (r, i) =>
          val id = r.getAs[Long]("doc_id")
          val (n, s) = expected.getOrElse(id, (0L, 0L))
          expected(id) = (n + 1, s + 1000000L / (60L + i + 1))
        }
    }
    val top = expected.toSeq.sortBy { case (id, (_, s)) => (-s, id) }.take(20)
    assert(fused.length == 20)
    val got = fused.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_lists"), r.getAs[Long]("rrf_e6"))).toMap
    top.foreach { case (id, (n, s)) =>
      assert(got.contains(id), s"doc $id missing from fusion")
      assert(got(id) == ((n, s)), s"doc $id: ${got(id)} vs ($n, $s)")
    }
  }

  test("fusion scores respect the per-list bounds") {
    fused.foreach { r =>
      val n = r.getAs[Long]("n_lists")
      val s = r.getAs[Long]("rrf_e6")
      assert(n >= 1 && n <= TextOps.bm25Terms.length.toLong)
      // each list contributes between 10^6/80 (rank 20) and 10^6/61 (rank 1)
      assert(s >= n * (1000000L / 80) && s <= n * (1000000L / 61),
        s"rrf_e6 $s out of range for $n lists")
    }
  }
}
