package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.fixtures.Fixtures
import graft.plans.DotProduct

/** ANN index health — the serving-time dashboard a deployment reads to
  * decide WHEN to retrain the coarse quantizer: per IVF cell, its
  * population and the cosine-to-own-centroid distribution (quantization
  * tightness). A cell whose mean attachment decays, or whose population
  * balloons, is where recall silently leaks between retrains; the IVFADC
  * ladder already showed (sim_ann_recall_ivfpq_residual) that the
  * published residual gain needs TIGHT cells — this is the monitor for
  * exactly that precondition.
  *
  * Determinism: cosines are the family's strict-fold dot + IEEE sqrt
  * (bit-identical across engines), quantized ONCE per vector to integer
  * micro-units via floor(cos·10⁶) — floor of an identical double is
  * identical — so every reported statistic is integer arithmetic and the
  * whole report hash-matches. Cells come from the persisted assignments
  * artifact (no training operator in this plan); the per-cell stats are
  * one map-side-combined aggregation over the corpus.
  */
object IndexHealth {

  /** Per cell: (cell, n_vectors, mean_cos_e6, min_cos_e6, max_cos_e6). */
  def ivfHealth(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    DotProduct.register(spark)
    import spark.implicits._
    val v = Similarity.vecs(spark, sfDir)
    val cents = Similarity.centroidsOf(v)
    v.join(Similarity.ivfAssignments(spark, sfDir), Seq("vec_id"))
      .join(cents, $"cluster" === $"cid")
      .select($"cluster".as("cell"),
        floor((Similarity.dotExpr("embedding", "cemb") /
          (sqrt($"norm_sq") * sqrt($"cnorm"))) * lit(1000000d))
          .cast(LongType).as("c6"))
      .groupBy($"cell")
      .agg(count(lit(1)).as("n_vectors"),
        expr("SUM(c6) DIV COUNT(1)").as("mean_cos_e6"),
        min($"c6").as("min_cos_e6"), max($"c6").as("max_cos_e6"))
  }

  val ivfHealthOracle: String = Fixtures.oracle(
    Similarity.assignmentCtes +
      s""", ih_c6 AS (
         SELECT s.cluster AS cell,
                CAST(FLOOR((d.dot / (SQRT(n.norm_sq) * SQRT(c.cnorm))) * 1000000)
                  AS BIGINT) AS c6
         FROM assignments s
         JOIN cdots d ON s.vec_id = d.vec_id AND s.cluster = d.cid
         JOIN nrm n ON s.vec_id = n.vec_id
         JOIN cn c ON s.cluster = c.cid)
       SELECT cell, CAST(COUNT(1) AS BIGINT) AS n_vectors,
              CAST(SUM(c6) // COUNT(1) AS BIGINT) AS mean_cos_e6,
              CAST(MIN(c6) AS BIGINT) AS min_cos_e6,
              CAST(MAX(c6) AS BIGINT) AS max_cos_e6
       FROM ih_c6 GROUP BY cell""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_index_health" -> (ivfHealth _))

  val oracles: Map[String, String] = Map(
    "sim_index_health" -> ivfHealthOracle)
}
