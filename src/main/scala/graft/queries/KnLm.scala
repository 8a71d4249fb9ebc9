package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** Interpolated Kneser-Ney bigram language model + per-document
  * cross-entropy — the perplexity-filter signal pretraining pipelines
  * (CCNet, LLaMA data recipes) gate crawl text with. [[TextOps.lmFluency]]
  * is the unsmoothed MLE average; this is the real smoothed model:
  *
  *   p_KN(w | h) = max(c(hw) − D, 0)/c(h·) + D·N₁₊(h·)/c(h·) · p_cont(w)
  *   p_cont(w)   = N₁₊(·w) / N₁₊(··)
  *
  * with absolute discount D = 3/4 (Kneser & Ney 1995; Chen & Goodman 1999
  * report 0.75 as the standard fixed discount). The continuation
  * distribution — "how many distinct contexts does w follow" rather than
  * raw frequency — is the model's defining device.
  *
  * Determinism discipline (the [[Unigram]] playbook): D = 3/4 keeps every
  * term rational, probabilities are quantized ONCE to 2^30 fixed point
  * with bounded integer arithmetic — term1 = (4·c_hw − 3)·2^30 DIV (4·c_h)
  * through a DECIMAL(38)/HUGEINT product (c_hw ≤ ~10¹³ at 100 TB
  * overflows BIGINT when shifted, the denominator division lands back in
  * BIGINT), term2 = ((3·N₁₊(h·)·2^30 DIV (4·c_h))·N₁₊(·w)) DIV N₁₊(··)
  * entirely in BIGINT (N₁₊ counts are vocabulary-bounded) — and the
  * per-token information content is the exact fixed-point log2
  * ([[Unigram.lgFpSql]]): bits·2^16 = 30·2^16 − lg(p_fp). Both engines
  * replay the identical integer recurrences, so document cross-entropy
  * hash-matches with zero floating-point risk.
  *
  * Scoring is in-sample (the model is trained on the corpus it scores —
  * the self-perplexity curation signal; every scored bigram is observed,
  * so c(hw) ≥ 1 and no unseen-event branch is needed). Scale shape: counts
  * and N₁₊ tables are vocabulary²-bounded (Heaps-bounded far below corpus
  * size); the corpus is touched twice (bigram extraction, per-doc
  * scoring); the scoring join deliberately carries NO broadcast hint —
  * the model table grows with vocabulary² and must shuffle at estimate
  * scale, exactly the ScalePlanSpec growing-broadcast rule.
  */
object KnLm {

  /** 2^30 — the probability fixed-point scale. */
  private val pScale = 1073741824L

  /** The model table: one row per distinct bigram with its ingredient
    * counts and the quantized interpolated-KN probability. Memoized —
    * perplexity replays it. */
  def model(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.util.Memo.cached(spark, sfDir, "kn_model") {
      import spark.implicits._
      val grams = bigrams(spark)
      val big = grams.groupBy($"head", $"tail")
        .agg(count(lit(1)).as("c_hw"))
      val head = big.groupBy($"head")
        .agg(sum($"c_hw").as("c_h"), count(lit(1)).as("n1_h"))
      val cont = big.groupBy($"tail").agg(count(lit(1)).as("cont_w"))
      val z = cont.agg(sum($"cont_w").as("z"))
      big.join(head, Seq("head"))
        .join(cont, Seq("tail"))
        .crossJoin(broadcast(z))
        .select($"head", $"tail", $"c_hw", $"c_h", $"n1_h", $"cont_w", $"z",
          (expr(s"CAST(4 * c_hw - 3 AS DECIMAL(38,0)) * $pScale DIV (4 * c_h)") +
            expr(s"((3 * n1_h * $pScale DIV (4 * c_h)) * cont_w) DIV z"))
            .as("p_fp"))
        .select($"head", $"tail", $"c_hw", $"c_h", $"n1_h", $"cont_w",
          greatest($"p_fp", lit(1L)).as("p_fp"))
    }
  }

  /** Per-document cross-entropy under the model: (doc_id, n_bigrams,
    * xent_fp = mean bits·2^16, bits = the integer floor) — the quality
    * signal a curation pipeline buckets and thresholds on. */
  def perplexity(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val m = model(spark, sfDir)
      .select($"head", $"tail",
        (lit(30L * 65536L) - expr(Unigram.lgFpSql("p_fp", spark = true)))
          .as("bits_fp"))
    bigrams(spark)
      .join(m, Seq("head", "tail"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"bits_fp").as("total_fp"))
      .select($"doc_id", $"n_bigrams",
        expr("total_fp DIV n_bigrams").as("xent_fp"),
        expr("(total_fp DIV n_bigrams) DIV 65536").as("bits"))
  }

  /** The filter-threshold knob curve: for each bits-per-token cutoff, how
    * many documents (and how much bigram mass) a "keep docs at ≤ b bits"
    * perplexity filter retains — the table a curation pipeline reads
    * before committing to a threshold, like the nprobe/rerank curves on
    * the ANN side. Cutoffs span the fixture's entropy range; retention is
    * monotone in the cutoff by construction (KnLmSpec pins it). */
  def filterCurve(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    perplexity(spark, sfDir)
      .select(explode(expr("sequence(3, 6)")).as("cutoff_bits"),
        $"bits", $"n_bigrams")
      .groupBy($"cutoff_bits")
      .agg(count(lit(1)).as("docs_total"),
        sum(when($"bits" <= $"cutoff_bits", 1L).otherwise(0L)).as("docs_kept"),
        sum($"n_bigrams").as("bigrams_total"),
        sum(when($"bits" <= $"cutoff_bits", $"n_bigrams").otherwise(0L))
          .as("bigrams_kept"))
      .select($"cutoff_bits".cast("long").as("cutoff_bits"),
        $"docs_kept", $"docs_total",
        expr("docs_kept * 10000 DIV docs_total").as("doc_keep_bp"),
        $"bigrams_kept", $"bigrams_total",
        expr("bigrams_kept * 10000 DIV bigrams_total").as("token_keep_bp"))
  }

  /** (doc_id, head, tail) bigram occurrences — the corpus pass. */
  private def bigrams(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.table("documents")
      .withColumn("words", split($"text", " "))
      .filter(size($"words") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(words) - 2), " +
          "i -> struct(words[i] AS head, words[i+1] AS tail))")).as("g"))
      .select($"doc_id", $"g.head", $"g.tail")
      .filter($"head" =!= "" && $"tail" =!= "")
  }

  // ------------------------------------------------------------- oracles

  private val modelCtes: String =
    s""", kn_g AS (
         SELECT doc_id, w[t.i] AS head, w[t.i + 1] AS tail
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
               WHERE length(text) > 0),
              UNNEST(range(1, len(w))) AS t(i)
         WHERE w[t.i] <> '' AND w[t.i + 1] <> ''),
       kn_big AS MATERIALIZED (
         SELECT head, tail, COUNT(1) AS c_hw FROM kn_g GROUP BY 1, 2),
       kn_head AS (
         SELECT head, SUM(c_hw) AS c_h, COUNT(1) AS n1_h
         FROM kn_big GROUP BY 1),
       kn_cont AS (
         SELECT tail, COUNT(1) AS cont_w FROM kn_big GROUP BY 1),
       kn_z AS (SELECT SUM(cont_w) AS z FROM kn_cont),
       kn_model AS MATERIALIZED (
         SELECT b.head, b.tail, b.c_hw, h.c_h, h.n1_h, c.cont_w,
                CAST(GREATEST(
                  CAST(CAST(4 * b.c_hw - 3 AS HUGEINT) * $pScale
                       // (4 * h.c_h) AS BIGINT)
                  + ((3 * h.n1_h * $pScale // (4 * h.c_h)) * c.cont_w)
                    // (SELECT z FROM kn_z),
                  1) AS BIGINT) AS p_fp
         FROM kn_big b
         JOIN kn_head h ON b.head = h.head
         JOIN kn_cont c ON b.tail = c.tail)"""

  val modelOracle: String = Fixtures.oracle(modelCtes +
    """ SELECT head, tail, CAST(c_hw AS BIGINT) AS c_hw,
              CAST(c_h AS BIGINT) AS c_h, CAST(n1_h AS BIGINT) AS n1_h,
              CAST(cont_w AS BIGINT) AS cont_w, CAST(p_fp AS BIGINT) AS p_fp
       FROM kn_model""")

  private val pplCtes: String = modelCtes +
    s""", kn_bits AS (
         SELECT head, tail,
                30 * 65536 - ${Unigram.lgFpSql("p_fp", spark = false)} AS bits_fp
         FROM kn_model),
       kn_ppl AS MATERIALIZED (
         SELECT g.doc_id, CAST(COUNT(1) AS BIGINT) AS n_bigrams,
                CAST(SUM(m.bits_fp) // COUNT(1) AS BIGINT) AS xent_fp,
                CAST((SUM(m.bits_fp) // COUNT(1)) // 65536 AS BIGINT) AS bits
         FROM kn_g g JOIN kn_bits m ON g.head = m.head AND g.tail = m.tail
         GROUP BY g.doc_id)"""

  val perplexityOracle: String = Fixtures.oracle(pplCtes +
    " SELECT doc_id, n_bigrams, xent_fp, bits FROM kn_ppl")

  val filterCurveOracle: String = Fixtures.oracle(pplCtes +
    """ SELECT CAST(c.b AS BIGINT) AS cutoff_bits,
              CAST(SUM(CASE WHEN p.bits <= c.b THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
              CAST(COUNT(1) AS BIGINT) AS docs_total,
              CAST((SUM(CASE WHEN p.bits <= c.b THEN 1 ELSE 0 END) * 10000)
                   // COUNT(1) AS BIGINT) AS doc_keep_bp,
              CAST(SUM(CASE WHEN p.bits <= c.b THEN p.n_bigrams ELSE 0 END) AS BIGINT)
                AS bigrams_kept,
              CAST(SUM(p.n_bigrams) AS BIGINT) AS bigrams_total,
              CAST((SUM(CASE WHEN p.bits <= c.b THEN p.n_bigrams ELSE 0 END) * 10000)
                   // SUM(p.n_bigrams) AS BIGINT) AS token_keep_bp
       FROM kn_ppl p CROSS JOIN UNNEST(range(3, 7)) AS c(b)
       GROUP BY c.b""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_kn_model" -> (model _),
    "text_kn_perplexity" -> (perplexity _),
    "text_kn_filter_curve" -> (filterCurve _))

  val oracles: Map[String, String] = Map(
    "text_kn_model" -> modelOracle,
    "text_kn_perplexity" -> perplexityOracle,
    "text_kn_filter_curve" -> filterCurveOracle)
}
