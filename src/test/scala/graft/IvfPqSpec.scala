package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** IVF×PQ composition (Jégou et al. 2011): cell pruning must actually cut
  * the ADC scan (the whole point of the composition — full-scan ADC reads
  * every code row per query) without giving back the recall the PQ codes
  * carry. The oracle hash-match cannot assert either: it runs the same
  * pruned ADC, so it agrees even if the probe list pruned everything.
  */
class IvfPqSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("cell pruning: ADC reads a small fraction of the full-scan code rows") {
    val s = spark
    import s.implicits._
    // sf0.1, not the suite default: the pruned fraction is ~nprobe/centroids
    // and centroids follow the sqrt-law seed (largest power-of-two stride
    // with stride^2 <= n) — sf0.1's 2000 vectors give ~62 cells, so
    // 3-of-62 probing demonstrates a deep cut; the 500-vector sf0.001/
    // sf0.01 fixtures have 31 smaller cells
    val sfDir = "/root/testdata/sf0.1"
    val df = Similarity.annIvfPq(s, sfDir)
    df.collect()
    val observed = df.queryExecution.observedMetrics
    assert(observed.contains("ivfpq"), s"observed metrics: ${observed.keys}")
    val adcRows = observed("ivfpq").getAs[Long]("adc_rows")

    // full-scan ADC (annPq) touches (N−1) code groups per query, pqM code
    // rows each; compute the same budget from the fixture
    val n = s.table("embeddings").count()
    val q = Similarity.annIvfPq(s, sfDir).select($"query_id").distinct().count()
    val fullScanRows = q * (n - 1) * 16L // pqM = 16
    assert(adcRows > 0, "pruned ADC must still read candidate codes")
    assert(adcRows < fullScanRows / 4,
      s"nprobe=3 over ~sqrt(n) cells must prune: read $adcRows of $fullScanRows")
  }

  test("composition trades bounded recall for the ADC cut; both stay above the floor") {
    val s = spark
    val pq = Similarity.annRecallPq(s, sfDir)
      .agg(sum("hits"), avg("recall_at_3")).head()
    val ivfpq = Similarity.annRecallIvfPq(s, sfDir)
      .agg(sum("hits"), avg("recall_at_3")).head()
    // fully deterministic pipeline → regression pins, not statistical
    // bounds. Under the sqrt-law quantizer the sf0.01 fixture has 31 cells
    // of ~16 vectors, so nprobe=3 reads ~10% of the corpus — the honest
    // IVF tradeoff (measured: full-scan PQ 0.433, IVF×PQ 0.300; before
    // r11's sqrt-law fix the fixture had 5 corpus-sized cells and the
    // "pruned" scan was nearly a full scan, which is why IVF×PQ used to
    // match full-scan recall here). nprobe is the deployment's recall
    // lever — IvfNprobeSpec pins its monotonicity.
    assert(pq.getDouble(1) > 0.4, s"full-scan PQ recall floor: ${pq.getDouble(1)}")
    assert(ivfpq.getDouble(1) > 0.25, s"IVF×PQ recall floor: ${ivfpq.getDouble(1)}")
  }
}
