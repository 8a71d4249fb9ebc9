package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.fixtures.Fixtures

/** No-split sequence packing by sorted complement pairing — the SFT-style
  * loader contract where a document must NEVER cross a sequence boundary
  * (Krell et al. 2021, "Efficient Sequence Packing without
  * Cross-Contamination", motivate the family; this is its simplest
  * deterministic member). [[TextOps.packManifest]] is the opposite
  * contract (GPT-style concat-and-chunk, documents freely split); together
  * the two entries price the trade a data team actually faces: packing
  * efficiency versus attention-mask purity.
  *
  * Scheme: per source stream, rank documents by (token count DESC, doc_id)
  * and pair rank r with rank m+1−r — largest with smallest, the classic
  * sum-equalizing complement pairing. A pair whose combined length fits
  * the sequence budget shares ONE sequence; an overflowing pair falls back
  * to two. Documents longer than the budget are counted as oversize
  * (their own, truncated, sequence). The output compares against the
  * one-doc-per-sequence baseline: sequences saved and utilization gained,
  * in exact basis points.
  *
  * Scale shape: the per-source rank is bucket-decomposed on the token
  * count — a VALUE bounded by the 128-token budget after the oversize
  * gate — so the only unbounded-partition window in sight runs over ≤128
  * rows per source ([[TextOps.ccnetBuckets]]'s discipline); within-bucket
  * row_numbers partition by (source, tok). Offsets and per-source totals
  * are (source × 128)-bounded broadcasts; everything else is
  * map-side-combinable aggregation. Integer arithmetic end to end.
  */
object Packing {

  /** The no-split sequence budget, in whitespace tokens. Half the
    * concat-and-chunk family's 256: fixture documents run 10-99 tokens,
    * so at 128 complement pairs both fit AND overflow — both branches of
    * the packer stay exercised at gate scale. */
  private val seqLen = 128L

  def packPairing(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val base = spark.table("documents")
      .filter($"source".isNotNull && $"text".isNotNull)
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast(LongType).as("tok"))
    val nos = base.filter($"tok" <= seqLen)

    val bOff = nos.groupBy($"source", $"tok").agg(count(lit(1)).as("b_n"))
      .withColumn("b_off", coalesce(sum($"b_n").over(
        Window.partitionBy($"source").orderBy($"tok".desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"source", $"tok", $"b_off")
    val mBySource = nos.groupBy($"source").agg(count(lit(1)).as("m"))

    val ranked = nos
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source", $"tok").orderBy($"doc_id")))
      .join(broadcast(bOff), Seq("source", "tok"))
      .withColumn("r", $"b_off" + $"rn")
      .join(broadcast(mBySource), Seq("source"))

    val pairs = ranked
      .withColumn("p", least($"r", $"m" + 1 - $"r"))
      .groupBy($"source", $"p")
      .agg(sum($"tok").as("pair_tok"), count(lit(1)).as("members"))
    val pairStats = pairs.groupBy($"source").agg(
      sum(when($"pair_tok" <= seqLen, 1L).otherwise($"members")).as("n_seq_pairs"),
      sum(when($"members" === 2 && $"pair_tok" <= seqLen, 1L).otherwise(0L))
        .as("n_pairs_fit"),
      sum(when($"members" === 2 && $"pair_tok" > seqLen, 1L).otherwise(0L))
        .as("n_pairs_split"))

    val docStats = base.groupBy($"source").agg(
      count(lit(1)).as("n_docs"), sum($"tok").as("total_tokens"),
      sum(least($"tok", lit(seqLen))).as("tokens_capped"),
      sum(when($"tok" > seqLen, 1L).otherwise(0L)).as("n_oversize"))

    docStats.join(pairStats, Seq("source"), "left")
      .select($"source", $"n_docs", $"total_tokens", $"tokens_capped",
        $"n_oversize",
        coalesce($"n_pairs_fit", lit(0L)).as("n_pairs_fit"),
        coalesce($"n_pairs_split", lit(0L)).as("n_pairs_split"),
        (coalesce($"n_seq_pairs", lit(0L)) + $"n_oversize").as("n_sequences"))
      .select($"source", $"n_docs", $"total_tokens", $"n_oversize",
        $"n_pairs_fit", $"n_pairs_split", $"n_sequences",
        $"n_docs".as("n_sequences_single"),
        expr(s"tokens_capped * 10000 DIV (n_sequences * $seqLen)").as("util_bp"),
        expr(s"tokens_capped * 10000 DIV (n_docs * $seqLen)").as("util_single_bp"))
  }

  // ------------------------------------------------------------- oracles

  val packPairingOracle: String = Fixtures.oracle(
    s""", pp_base AS (
         SELECT doc_id, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
         FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
       pp_nos AS (
         SELECT source, tok,
                ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY tok DESC, doc_id) AS r,
                COUNT(1) OVER (PARTITION BY source) AS m
         FROM pp_base WHERE tok <= $seqLen),
       pp_pairs AS (
         SELECT source, LEAST(r, m + 1 - r) AS p,
                SUM(tok) AS pair_tok, COUNT(1) AS members
         FROM pp_nos GROUP BY 1, 2),
       pp_ps AS (
         SELECT source,
                SUM(CASE WHEN pair_tok <= $seqLen THEN 1 ELSE members END) AS n_seq_pairs,
                SUM(CASE WHEN members = 2 AND pair_tok <= $seqLen THEN 1 ELSE 0 END) AS n_pairs_fit,
                SUM(CASE WHEN members = 2 AND pair_tok > $seqLen THEN 1 ELSE 0 END) AS n_pairs_split
         FROM pp_pairs GROUP BY 1),
       pp_ds AS (
         SELECT source, COUNT(1) AS n_docs, SUM(tok) AS total_tokens,
                SUM(LEAST(tok, $seqLen)) AS tokens_capped,
                SUM(CASE WHEN tok > $seqLen THEN 1 ELSE 0 END) AS n_oversize
         FROM pp_base GROUP BY 1)
       SELECT d.source, CAST(d.n_docs AS BIGINT) AS n_docs,
              CAST(d.total_tokens AS BIGINT) AS total_tokens,
              CAST(d.n_oversize AS BIGINT) AS n_oversize,
              CAST(COALESCE(p.n_pairs_fit, 0) AS BIGINT) AS n_pairs_fit,
              CAST(COALESCE(p.n_pairs_split, 0) AS BIGINT) AS n_pairs_split,
              CAST(COALESCE(p.n_seq_pairs, 0) + d.n_oversize AS BIGINT) AS n_sequences,
              CAST(d.n_docs AS BIGINT) AS n_sequences_single,
              CAST(d.tokens_capped * 10000
                   // ((COALESCE(p.n_seq_pairs, 0) + d.n_oversize) * $seqLen)
                AS BIGINT) AS util_bp,
              CAST(d.tokens_capped * 10000 // (d.n_docs * $seqLen)
                AS BIGINT) AS util_single_bp
       FROM pp_ds d LEFT JOIN pp_ps p USING (source)""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_pack_pairing" -> (packPairing _))

  val oracles: Map[String, String] = Map(
    "corpus_pack_pairing" -> packPairingOracle)
}
