package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Product quantization: structural invariants plus the recall floor that
  * the oracle hash-match cannot assert (the oracle runs the same ADC, so it
  * agrees even if quantization destroyed the ranking — as it measurably
  * does without L2 normalization: 0.03 recall vs 0.23 here). */
class PqSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ADC ranking: 3 neighbors per query, distances non-decreasing in rank") {
    val s = spark
    val out = Similarity.annPq(s, sfDir).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 3, s"query $q")
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      val d = sorted.map(_.getAs[Double]("approx_d2"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b },
        s"query $q: ADC distances must be non-decreasing in rank: ${d.toSeq}")
      // unit vectors: d² = 2 − 2·cos ∈ [0, 4]; quantization error keeps the
      // estimate near the range, never wildly outside it
      assert(d.forall(x => x > -0.5 && x < 4.5), s"query $q: ${d.toSeq}")
    }
  }

  test("quantization recall clears the floor (codes carry real signal)") {
    val s = spark
    val recall = Similarity.annRecallPq(s, sfDir)
      .agg(avg("recall_at_3")).head().getDouble(0)
    // random top-3 of ~500 would score ~0.006; the measured value at this
    // fixture is 0.23 — assert a floor far above chance but safely under
    // run-to-run variation of the fixed deterministic pipeline (none: the
    // pipeline is fully deterministic, so this is a regression pin)
    assert(recall > 0.15, s"mean recall@3 $recall")
  }
}
