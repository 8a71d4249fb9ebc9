package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is a named DataFrame pipeline implementing one
  * operator/view from SURVEY.md §2; [[oracleSql]] carries the equivalent
  * DuckDB SQL over the same parquet tables (Ekubo-shaped facts are derived by
  * the shared deterministic fixture prelude, graft.fixtures.Fixtures).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Rollups.hourlyVolumeByToken(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Tpch.queries, Tpch.oracles),
      (CoreViews.queries, CoreViews.oracles),
      (Rollups.queries, Rollups.oracles),
      (Twamm.queries, Twamm.oracles),
      (Tokens.queries, Tokens.oracles),
      (Analytics.queries, Analytics.oracles),
      (Governance.queries, Governance.oracles),
      (Positions.queries, Positions.oracles),
      (Sessions.queries, Sessions.oracles),
      (TextOps.queries, TextOps.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (AnnIndex.queries, AnnIndex.oracles),
      (GraphAnn.queries, GraphAnn.oracles),
      (Hybrid.queries, Hybrid.oracles),
      (StreamReplay.queries, StreamReplay.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Sampling.queries, Sampling.oracles),
      (Classifier.queries, Classifier.oracles),
      (Bpe.queries, Bpe.oracles),
      (WordPiece.queries, WordPiece.oracles),
      (Unigram.queries, Unigram.oracles),
      (KnLm.queries, KnLm.oracles),
      (SbLm.queries, SbLm.oracles),
      (Dbscan.queries, Dbscan.oracles),
      (Packing.queries, Packing.oracles),
      (Audio.queries, Audio.oracles),
      (Negatives.queries, Negatives.oracles),
      (IndexHealth.queries, IndexHealth.oracles),
      (Pca.queries, Pca.oracles),
      (Diagnostics.queries, Diagnostics.oracles),
      (Insights.queries, Insights.oracles),
      (DataQuality.queries, DataQuality.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
