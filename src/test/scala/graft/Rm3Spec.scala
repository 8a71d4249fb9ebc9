package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RM3 pseudo-relevance feedback (`retrieval_rm3_terms` / `_search`).
  * The DuckDB gate pins end-result equality; these pins are the model
  * SEMANTICS a result hash cannot see: the interpolation budget (the
  * expansion arm can never outweigh λ), the expansion set's relation to
  * the original query, and the λ-degeneracy anchor — with the expansion
  * arm removed, the weighted second pass must reproduce the first-pass
  * BM25 ranking exactly (a positive per-term scale cannot reorder). */
class Rm3Spec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  test("expansion table: consecutive ranks, positive weights, budget <= 1-λ, no originals") {
    graft.fixtures.Fixtures.register(spark, sfDir)
    val rows = Hybrid.rm3Terms(spark, sfDir)
      .orderBy(col("trank")).collect()
    assert(rows.nonEmpty && rows.length <= Hybrid.rm3ExpTerms)
    assert(rows.map(_.getAs[Long]("trank")).toSeq ==
      (1L to rows.length).toSeq, "tranks must be consecutive from 1")
    val weights = rows.map(_.getAs[Double]("weight"))
    assert(weights.forall(_ > 0), "expansion weights must be positive")
    // Σ_topE (1−λ)·rm/Σ_all rm ≤ 1−λ = 0.5 — the expansion arm can never
    // outweigh the interpolation budget
    assert(weights.sum <= 0.5 + 1e-9,
      s"expansion mass must respect 1-λ, got ${weights.sum}")
    // rm mass must be ranked consistently with trank
    val rms = rows.map(_.getAs[Double]("rm_w"))
    assert(rms.sliding(2).forall(w => w.length < 2 || w(1) <= w(0)),
      s"rm mass must be non-increasing in trank, got ${rms.toSeq}")
    val terms = rows.map(_.getAs[String]("term")).toSet
    assert(terms.intersect(TextOps.bm25Terms.toSet).isEmpty,
      "original query terms are interpolated separately, never expanded")
  }

  test("λ-degeneracy: originals-only weights reproduce the first-pass BM25 ranking") {
    graft.fixtures.Fixtures.register(spark, sfDir)
    import spark.implicits._
    val origOnly = TextOps.bm25Terms.toDF("word")
      .withColumn("w", lit(0.5) / lit(3.0))
    val rescored = Hybrid.rm3Score(spark, sfDir, origOnly)
      .orderBy($"ssum".desc, $"doc_id")
      .limit(10).select($"doc_id").as[Long].collect().toSeq
    val firstPass = TextOps.bm25(spark.table("documents"), TextOps.bm25Terms)
      .limit(10).select($"doc_id").as[Long].collect().toSeq
    assert(rescored == firstPass,
      s"uniform positive term weights must preserve the BM25 order:\n" +
        s"  weighted: $rescored\n  first-pass: $firstPass")
  }
}
