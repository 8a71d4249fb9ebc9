package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** The over-fetch→recall curve (`sim_ann_recall_rerank_curve`): the
  * refine stage's knob table, twin of the nprobe curve (IvfNprobeSpec).
  * Per-query dominance of the exact stage is pinned in AnnIndexSpec; this
  * spec pins the SWEEP — monotone in the budget, and anchored at both
  * ends to the independently gated entries (b=3 ⇒ the pure-ADC recall,
  * b=12 ⇒ the production two-stage entry), so the curve cannot drift from
  * the paths it prices. */
class RerankCurveSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def hits(df: DataFrame): Long =
    df.agg(sum(col("hits"))).collect().head.getLong(0)

  test("curve is monotone in the budget and anchored to the gated entries") {
    val rows = Similarity.annRecallRerankCurve(spark, sfDir).collect()
    val curve = rows
      .map(r => r.getAs[Long]("rerank_budget") -> r.getAs[Long]("hits_total"))
      .toMap
    assert(curve.keySet == Set(3L, 6L, 12L, 24L))

    // shortlists nest as the budget grows and a true top-3 neighbor in the
    // shortlist always survives the exact top-3 (AnnIndexSpec's dominance
    // pin) — so hits are non-decreasing in the budget
    assert(curve(3) <= curve(6) && curve(6) <= curve(12) &&
      curve(12) <= curve(24),
      s"recall must be non-decreasing in the rerank budget, got $curve")

    // b = 3 re-ranks the ADC top-3 by exact cosine: same SET, reordered —
    // identical hits to the pure-ADC recall entry
    assert(curve(3L) == hits(Similarity.annRecallIvfPq(spark, sfDir)),
      "b=3 (no over-fetch) must equal the pure-ADC recall@3")
    // b = 12 IS the gated production two-stage entry
    assert(curve(12L) == hits(Similarity.annRecallIvfPqRerank(spark, sfDir)),
      "the b=12 row must agree with sim_ann_recall_ivfpq_rerank")
  }

  test("macro recall column is consistent with its own hit counts") {
    Similarity.annRecallRerankCurve(spark, sfDir).collect().foreach { r =>
      val n = r.getAs[Long]("n_queries")
      val h = r.getAs[Long]("hits_total")
      val macroR = r.getAs[Double]("macro_recall_at_3")
      assert(n > 0, "fixture must yield queries")
      // the column is round(·, 6): allow half an ulp of that quantization
      assert(math.abs(macroR - h.toDouble / (n * 3.0)) <= 5e-7,
        s"macro_recall_at_3 must be hits/(n*3): $r")
      assert(h <= n * 3, "hits cannot exceed 3 per query")
    }
  }
}
