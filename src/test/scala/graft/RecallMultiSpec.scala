package graft

import graft.queries.Similarity

/** sim_ann_recall_lsh_multi: the second hash table's candidates are a
  * superset of the first's, so per-query recall can only rise — the same
  * monotonicity law IvfNprobeSpec pins for the nprobe lever. */
class RecallMultiSpec extends SparkSpec {

  test("multi-table recall dominates single-table recall per query") {
    val single = Similarity.annRecall(spark, SparkSpec.fixtureSf).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall_at_3")).toMap
    val multi = Similarity.annRecallLshMulti(spark, SparkSpec.fixtureSf).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall_at_3")).toMap
    assert(multi.keySet == single.keySet)
    multi.foreach { case (q, r) =>
      assert(r >= single(q), s"query $q: multi $r < single ${single(q)}")
    }
  }
}
