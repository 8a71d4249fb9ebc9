package graft

import graft.queries.TextOps

/** Properties of the end-to-end curation funnel that the differential
  * oracle can't express: stage monotonicity and the one-pass plan shape. */
class PretrainFunnelSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("funnel stages are monotonically non-increasing in docs and tokens") {
    val rows = TextOps.pretrainFunnel(spark, sfDir)
      .orderBy("stage_id").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(1)).toSeq == Seq(
      "all", "exact_dedup", "near_dedup", "quality", "decontaminated", "domain_mix"))
    val docs = rows.map(_.getLong(2))
    val toks = rows.map(_.getLong(3))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      s"doc counts must not increase: ${docs.toSeq}")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a },
      s"token counts must not increase: ${toks.toSeq}")
    assert(docs.last > 0, "the mix stage must keep a non-empty corpus")
  }

  test("funnel is ONE aggregation pass, not six unioned stage chains") {
    val plan = TextOps.pretrainFunnel(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the union-of-aggregates form re-executes every stage chain per
    // branch; the flagged single-pass form has no Union at all
    assert(!plan.contains("Union"), "unexpected Union of per-stage aggregates")
  }

  test("corpus_build emits exactly the corpus the funnel's last stage reports") {
    val funnel = TextOps.pretrainFunnel(spark, sfDir).collect()
      .map(r => r.getAs[String]("stage") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
      .toMap
    val build = TextOps.corpusBuild(spark, sfDir).collect()
    // the report and the materialization consume one shared flag frame —
    // their totals must agree exactly
    assert(build.length.toLong === funnel("domain_mix")._1)
    assert(build.map(_.getAs[Long]("n_words")).sum === funnel("domain_mix")._2)
    // assignments recompute from the survivor's identity: content-hash
    // split matches the split operator's rule, shard is the Knuth hash
    val split = graft.queries.Sampling.trainHoldoutSplit(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    build.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("split") === split(id), s"doc $id split desyncs")
      val shard = ((id % 2147483648L) * 2654435761L) % 4294967296L % 8L
      assert(r.getAs[Long]("shard") === shard, s"doc $id shard desyncs")
    }
    // both loader dimensions are actually populated on the fixture
    assert(build.map(_.getAs[String]("split")).distinct.length === 2)
    assert(build.map(_.getAs[Long]("shard")).distinct.length > 1)
  }
}
