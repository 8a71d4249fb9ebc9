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
}
