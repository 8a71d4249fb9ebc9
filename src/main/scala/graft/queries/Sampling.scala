package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures

/** Sampling and corpus-shaping operators for training-data pipelines, over
  * the `documents` and `embeddings` tables: stratified down-sampling,
  * per-stratum uniform-k selection, int8 embedding quantization, and
  * token-budget context packing.
  *
  * Everything here must be reproducible run-over-run and engine-over-engine
  * (the DuckDB differential oracle re-derives every row), so randomness is
  * replaced by a multiplicative hash of the stable key: `rand()`-style
  * sampling would be irreproducible and, at 100 TB, make every retry of a
  * failed stage emit a different corpus. The hash keeps the decision a
  * narrow per-row projection — no shuffle, no state, resumable at any point.
  */
object Sampling {

  /** Knuth multiplicative hash of a non-negative id, mod 2^32. The id is
    * first reduced mod 2^31 so the product stays under 2^63 (non-ANSI Spark
    * would wrap silently; DuckDB would error — BOTH are wrong answers).
    * Collisions across 2^31-spaced ids only shift which rows are sampled,
    * never determinism. */
  private val Mult = 2654435761L // floor(2^32 / golden ratio), Knuth §6.4
  /** Public: reused by TextOps.pretrainFunnel so the funnel's mix stage
    * and the sampling operators share ONE hash definition. */
  def bucketExprSql(id: String): String =
    s"(($id % 2147483648) * $Mult) % 4294967296"

  /** Per-language Bernoulli rates in basis points (fraction of 10000).
    * The synthetic corpus is en-heavy; a curation pass typically
    * down-samples the dominant language and keeps the tail. */
  val stratumRatesBp: Map[String, Int] = Map("en" -> 2000)
  val defaultRateBp: Int = 5000

  /** SQL twin of the Spark rate fold — ONE definition feeds both engines,
    * so editing [[stratumRatesBp]] can never silently desync the oracle. */
  /** Public for the same reason as [[bucketExprSql]]. */
  def rateCaseSql(langCol: String): String =
    "CASE " +
      stratumRatesBp.map { case (l, bp) => s"WHEN $langCol = '$l' THEN $bp" }.mkString(" ") +
      s" ELSE $defaultRateBp END"

  /** Stratified hash-sampling: keep a deterministic `rate(lang)` fraction of
    * each language stratum. The keep/drop decision is a pure projection of
    * (doc_id, lang) — the plan is scan → filter, no shuffle, and the same
    * doc survives every re-run and both engines. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val rateCol = stratumRatesBp.foldLeft(lit(defaultRateBp)) {
      case (acc, (lang, bp)) => when($"lang" === lang, lit(bp)).otherwise(acc)
    }
    spark.table("documents")
      .withColumn("bucket", (expr(bucketExprSql("doc_id")) % 10000L).cast(LongType))
      .withColumn("rate_bp", rateCol.cast(LongType))
      .filter($"bucket" < $"rate_bp")
      .select($"doc_id", $"lang", $"bucket", $"rate_bp")
  }

  val stratifiedSampleOracle: String = Fixtures.oracle(
    s"""SELECT doc_id, lang,
               CAST(${bucketExprSql("doc_id")} % 10000 AS BIGINT) AS bucket,
               CAST(${rateCaseSql("lang")} AS BIGINT) AS rate_bp
        FROM documents
        WHERE ${bucketExprSql("doc_id")} % 10000 < ${rateCaseSql("lang")}""")

  /** Deterministic uniform-k per stratum (the batch analogue of reservoir
    * sampling): rank docs inside each language by hash order and keep the
    * first k. Tie-break on doc_id so colliding hashes stay deterministic.
    *
    * Two-stage top-k: a single `Window.partitionBy(lang)` would put the
    * ENTIRE stratum in one task (a handful of languages → a handful of
    * tasks sorting terabytes at 100 TB). Stage 1 ranks within (lang, salt)
    * — 199 parallel partitions per stratum — and keeps k rows per salt;
    * since each stratum's global top-k is contained in the union of its
    * per-salt top-ks, stage 2's per-lang window sees at most 199·k rows
    * per stratum and the result is IDENTICAL to the one-shot window. */
  def uniformKPerStratum(spark: SparkSession, sfDir: String, k: Int = 50): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hashed = spark.table("documents")
      .withColumn("h", expr(bucketExprSql("doc_id")).cast(LongType))
      .withColumn("salt", pmod($"doc_id", lit(199L)))
    val localTopK = hashed
      .withColumn("rk_local", row_number().over(
        Window.partitionBy($"lang", $"salt").orderBy($"h", $"doc_id")))
      .filter($"rk_local" <= k)
    localTopK
      .withColumn("rk", row_number().over(
        Window.partitionBy($"lang").orderBy($"h", $"doc_id")))
      .filter($"rk" <= k)
      .select($"lang", $"doc_id", $"rk".cast(LongType).as("sample_rank"))
  }

  val uniformKPerStratumOracle: String = Fixtures.oracle(
    s"""SELECT lang, doc_id, CAST(rk AS BIGINT) AS sample_rank
        FROM (SELECT lang, doc_id,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY ${bucketExprSql("doc_id")}, doc_id) AS rk
              FROM documents)
        WHERE rk <= 50""")

  /** Symmetric int8 quantization of the embedding column: per-vector scale
    * = max|x|, q_i = floor(x_i * 127 / scale + 0.5) in [-127, 127]. Emitted
    * exploded (vec_id, idx, q) so the oracle verifies every element, not a
    * digest. All arithmetic is on doubles promoted from the stored float32
    * (exact) with `floor(x + 0.5)` instead of engine `round` — Spark
    * HALF_UP vs DuckDB's banker's-rounding on doubles would differ at
    * exact .5 midpoints.
    *
    * Scale path: the transform is a narrow projection (quantized vectors
    * are 4x smaller than the float32 input — this operator's point at
    * 100 TB); the explode here is only the oracle-visibility format. */
  def embeddingQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("embeddings")
      .withColumn("scale",
        expr("array_max(transform(embedding, x -> abs(cast(x AS DOUBLE))))"))
      .select($"vec_id", $"scale",
        posexplode(expr(
          """transform(embedding, x ->
             CASE WHEN scale = 0.0d THEN 0L
                  ELSE cast(greatest(-127.0d, least(127.0d,
                         floor(cast(x AS DOUBLE) * 127.0d / scale + 0.5d))) AS BIGINT)
             END)""")).as(Seq("idx", "q")))
      .select($"vec_id", $"idx".cast(LongType).as("idx"), $"q",
        $"scale".as("q_scale"))
  }

  val embeddingQuantizeOracle: String = Fixtures.oracle(
    """SELECT vec_id,
              CAST(u.i - 1 AS BIGINT) AS idx,
              CASE WHEN s.scale = 0.0 THEN 0
                   ELSE CAST(greatest(-127.0, least(127.0,
                          floor(CAST(u.x AS DOUBLE) * 127.0 / s.scale + 0.5))) AS BIGINT)
              END AS q,
              s.scale AS q_scale
       FROM (SELECT vec_id,
                    list_aggregate(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE))), 'max') AS scale,
                    embedding
             FROM embeddings) s,
            UNNEST(list_transform(s.embedding, (x, i) -> {'x': x, 'i': i})) AS r(u)""")

  /** Token-budget context packing: inside each language stratum, docs in
    * doc_id order are packed into context windows of `budget` whitespace
    * tokens via a running prefix sum — window_id = floor(tokens_before /
    * budget). A window may overflow by at most one document (the classic
    * streaming-packing bound); exact greedy packing is inherently
    * sequential and would serialize the corpus through one task.
    *
    * The prefix sum is BUCKET-DECOMPOSED (same pattern as the
    * staker-rewards harmonic prefix): cum = in-bucket prefix + the
    * per-(lang, bucket) offset, where the offset window runs over
    * bucket-count-sized rows. A single per-lang running sum would put the
    * whole stratum in one task at 100 TB; integer addition is associative,
    * so the decomposition is bit-identical to the one-shot window. */
  def packTokenBudget(spark: SparkSession, sfDir: String, budget: Int = 2048): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.table("documents")
      .withColumn("n_tokens", size(split($"text", " ")).cast(LongType))
      .withColumn("bucket", expr("doc_id DIV 1024"))
    val wB = Window.partitionBy($"lang", $"bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bOff = docs.groupBy($"lang", $"bucket").agg(sum($"n_tokens").as("b_sum"))
      .withColumn("b_off", coalesce(
        sum($"b_sum").over(Window.partitionBy($"lang").orderBy($"bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"lang", $"bucket", $"b_off")
    docs
      .withColumn("cum_in", sum($"n_tokens").over(wB))
      .join(broadcast(bOff), Seq("lang", "bucket"))
      .withColumn("cum_tokens", $"cum_in" + $"b_off")
      .withColumn("window_id", floor(($"cum_tokens" - $"n_tokens") / budget).cast(LongType))
      .select($"lang", $"doc_id", $"n_tokens", $"window_id",
        ($"cum_tokens" - $"n_tokens").as("tokens_before"))
  }

  val packTokenBudgetOracle: String = Fixtures.oracle(
    """SELECT lang, doc_id,
              CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(floor((cum_tokens - n_tokens) / 2048.0) AS BIGINT) AS window_id,
              CAST(cum_tokens - n_tokens AS BIGINT) AS tokens_before
       FROM (SELECT lang, doc_id,
                    len(string_split(text, ' ')) AS n_tokens,
                    sum(len(string_split(text, ' '))) OVER (
                      PARTITION BY lang ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum_tokens
             FROM documents)""")

  /** Domain mixing: rebalance per-domain corpus shares toward a uniform
    * target by down-sampling over-represented domains. The per-domain keep
    * rate is DERIVED from the data (rate_d = total / (n_domains · n_d),
    * capped at 1), then applied with the same multiplicative-hash Bernoulli
    * as [[stratifiedSample]] — the Dolma/DoReMi-style mixing step. The
    * domain column is `lang` because that is the SKEWED axis of this corpus
    * (en ≈ 44% vs ~14% each for the rest); `source` is uniform by
    * construction, so mixing on it would never exercise the down-sampling
    * branch.
    *
    * Scale path: the rate table is one map-side-combined count per domain
    * (dimension-sized, broadcast back); the keep/drop pass is a narrow
    * scan-side filter. All rate arithmetic is integer basis points so both
    * engines derive identical thresholds. */
  def domainMix(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val docs = spark.table("documents")
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_d"))
    val totals = counts.agg(sum($"n_d").as("total"), count(lit(1)).as("n_domains"))
    val rates = counts.crossJoin(broadcast(totals))
      .select($"lang",
        // DIV, not `/`: Column./ is double division and a truncating cast
        // can disagree with exact floor at near-integer quotients
        least(lit(10000L),
          expr("(total * 10000) DIV (n_domains * n_d)")).as("rate_bp"))
    docs
      .join(broadcast(rates), Seq("lang"))
      .withColumn("bucket", (expr(bucketExprSql("doc_id")) % 10000L).cast(LongType))
      .filter($"bucket" < $"rate_bp")
      .select($"doc_id", $"lang", $"bucket", $"rate_bp")
  }

  val domainMixOracle: String = Fixtures.oracle(
    s"""SELECT d.doc_id, d.lang,
               CAST(${bucketExprSql("d.doc_id")} % 10000 AS BIGINT) AS bucket,
               r.rate_bp
        FROM documents d
        JOIN (SELECT lang,
                     CAST(least(10000, (t.total * 10000) // (t.n_domains * n_d)) AS BIGINT)
                       AS rate_bp
              FROM (SELECT lang, COUNT(*) AS n_d FROM documents GROUP BY lang) c
              CROSS JOIN (SELECT COUNT(*) AS total, COUNT(DISTINCT lang) AS n_domains
                          FROM documents) t) r
          ON r.lang = d.lang
        WHERE ${bucketExprSql("d.doc_id")} % 10000 < r.rate_bp""")

  /** Temperature-scaled domain mixing (the mT5/XLM-R multilingual sampling
    * scheme): target domain shares ∝ n_d^α with α = 1/2, flattening the
    * size distribution less aggressively than [[domainMix]]'s uniform
    * target. The kept-corpus budget is half the corpus; each domain's keep
    * count is its √n-proportional share of that budget, converted to a
    * Bernoulli rate and applied with the same deterministic
    * multiplicative-hash decision as the other samplers.
    *
    * Exactness: n^(1/2) is computed as an INTEGER sqrt — floor(√n) from the
    * IEEE-exact double sqrt, then corrected by one in each direction so the
    * result is exactly ⌊√n⌋ even at values where the double rounds across
    * the integer boundary. Every downstream quantity (share, rate) is
    * integer arithmetic, so the per-domain weight SUM is order-free and
    * both engines derive bit-identical thresholds — the same reason
    * [[domainMix]] uses basis points.
    *
    * Scale path: identical to domainMix — one map-side-combined count per
    * domain, a domain-sized rate table broadcast back, scan-side filter. */
  def temperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val docs = spark.table("documents")
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_d"))
    val weights = counts
      .withColumn("s0", expr("CAST(FLOOR(SQRT(CAST(n_d AS DOUBLE))) AS BIGINT)"))
      .withColumn("s1", expr("s0 - CASE WHEN s0 * s0 > n_d THEN 1 ELSE 0 END"))
      .withColumn("w_d", expr("s1 + CASE WHEN (s1 + 1) * (s1 + 1) <= n_d THEN 1 ELSE 0 END"))
      .select($"lang", $"n_d", $"w_d")
    val totals = weights.agg(sum($"n_d").as("total"), sum($"w_d").as("w_total"))
    val rates = weights.crossJoin(broadcast(totals))
      .select($"lang",
        least(lit(10000L),
          expr("((((total DIV 2) * w_d) DIV w_total) * 10000) DIV n_d")).as("rate_bp"))
    docs
      .join(broadcast(rates), Seq("lang"))
      .withColumn("bucket", (expr(bucketExprSql("doc_id")) % 10000L).cast(LongType))
      .filter($"bucket" < $"rate_bp")
      .select($"doc_id", $"lang", $"bucket", $"rate_bp")
  }

  val temperatureMixOracle: String = Fixtures.oracle(
    s"""SELECT d.doc_id, d.lang,
               CAST(${bucketExprSql("d.doc_id")} % 10000 AS BIGINT) AS bucket,
               r.rate_bp
        FROM documents d
        JOIN (SELECT lang,
                     CAST(least(10000, ((((t.total // 2) * w_d) // t.w_total) * 10000) // n_d)
                       AS BIGINT) AS rate_bp
              FROM (SELECT lang, n_d,
                           s1 + CASE WHEN (s1 + 1) * (s1 + 1) <= n_d THEN 1 ELSE 0 END AS w_d
                    FROM (SELECT lang, n_d,
                                 s0 - CASE WHEN s0 * s0 > n_d THEN 1 ELSE 0 END AS s1
                          FROM (SELECT lang, COUNT(*) AS n_d,
                                       CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s0
                                FROM documents GROUP BY lang))) w
              CROSS JOIN (SELECT SUM(n_d) AS total, SUM(w_d) AS w_total
                          FROM (SELECT n_d,
                                       s1 + CASE WHEN (s1 + 1) * (s1 + 1) <= n_d THEN 1 ELSE 0 END AS w_d
                                FROM (SELECT n_d,
                                             s0 - CASE WHEN s0 * s0 > n_d THEN 1 ELSE 0 END AS s1
                                      FROM (SELECT COUNT(*) AS n_d,
                                                   CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s0
                                            FROM documents GROUP BY lang)))) t) r
          ON r.lang = d.lang
        WHERE ${bucketExprSql("d.doc_id")} % 10000 < r.rate_bp""")

  /** Exact integer sqrt of a nonneg integer SQL expression: floor(√x)
    * guarded against double rounding in BOTH directions — the
    * [[temperatureMix]] correction chain, factored so it can be ITERATED
    * (n^(1/4) = isqrt(isqrt(n))) without copy-paste drift. Same text runs
    * on both engines (FLOOR/SQRT/CASE only). */
  private[queries] def isqrtSql(x: String): String = {
    val s0 = s"CAST(FLOOR(SQRT(CAST(($x) AS DOUBLE))) AS BIGINT)"
    val s1 = s"($s0 - CASE WHEN $s0 * $s0 > ($x) THEN 1 ELSE 0 END)"
    s"($s1 + CASE WHEN ($s1 + 1) * ($s1 + 1) <= ($x) THEN 1 ELSE 0 END)"
  }

  /** Temperature-mixing knob table (the [[temperatureMix]] sweep, same
    * convention as the ANN family's nprobe/rerank curves): per-language
    * budget share in bp at sampling exponents 1 (raw), 1/2 (the shipped
    * τ=2), 1/4 (τ=4), and 0 (uniform, τ→∞) — every weight an EXACT
    * integer (w = n, isqrt(n), isqrt(isqrt(n)), 1; iterated exact integer
    * sqrt, no pow()/libm anywhere), so the whole flattening ladder is
    * hash-gateable. A mixture designer reads the ladder before picking τ:
    * shares majorize monotonically toward uniform as the exponent falls
    * (spec-pinned).
    *
    * Scale shape: one label-set-sized count aggregate feeds all four
    * arms; totals are 1-row broadcasts; output is 4·|langs| rows. */
  def temperatureCurve(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val counts = spark.table("documents")
      .groupBy($"lang").agg(count(lit(1)).as("n_d"))
      .localCheckpoint() // label-set-sized; feeds all four arms
    val arms = Seq(
      "1" -> "n_d",
      "2" -> isqrtSql("n_d"),
      "4" -> isqrtSql(isqrtSql("n_d")),
      "inf" -> "CAST(1 AS BIGINT)")
    arms.map { case (tau, wExpr) =>
      val w = counts.withColumn("w", expr(wExpr))
      val tot = w.agg(sum($"w").as("w_total"))
      w.crossJoin(broadcast(tot))
        .select(lit(tau).as("tau"), $"lang", $"n_d", $"w",
          expr("(w * 10000) DIV w_total").as("share_bp"))
    }.reduce(_ unionByName _)
  }

  val temperatureCurveOracle: String = {
    val arms = Seq(
      "1" -> "n_d",
      "2" -> isqrtSql("n_d"),
      "4" -> isqrtSql(isqrtSql("n_d")),
      "inf" -> "CAST(1 AS BIGINT)").map { case (tau, wExpr) =>
      s"""SELECT '$tau' AS tau, lang, n_d, CAST(w AS BIGINT) AS w,
                 CAST((w * 10000) // (SELECT SUM(($wExpr)) FROM mtc_counts)
                   AS BIGINT) AS share_bp
          FROM (SELECT lang, n_d, ($wExpr) AS w FROM mtc_counts)"""
    }.mkString(" UNION ALL ")
    Fixtures.oracle(
      s""", mtc_counts AS MATERIALIZED (
           SELECT lang, COUNT(1) AS n_d FROM documents GROUP BY 1)
         $arms""")
  }

  /** UniMax capped-uniform language sampling (Chung et al., 2023): spread
    * a fixed budget (half the corpus, [[temperatureMix]]'s convention)
    * UNIFORMLY across languages, except that a language smaller than its
    * uniform share is taken whole and its slack re-spread over the rest —
    * the water-filling allocation that avoids both temperature sampling's
    * head-domination and epoch-repetition of tiny languages.
    *
    * The water level is found by the classic sorted sweep, all integer:
    * rank languages by size ascending; at rank k the fair share of the
    * remaining budget is `(B − cum) DIV (L − k + 1)` — the first rank whose
    * size EXCEEDS its share fixes the cap c for every larger language
    * (ascending order guarantees all later ranks overflow too). The sweep
    * runs over the language-count frame — label-set-sized, the same
    * bounded-window class as the other domain tables (never the corpus).
    * Quotas convert to bp rates and apply with the shared deterministic
    * hash decision; truncating DIV on both engines keeps every threshold
    * bit-identical. */
  def unimaxSample(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    // unlabeled docs are excluded from a LANGUAGE-budget allocation up
    // front (they could never be emitted through the lang join anyway, but
    // counting them would still distort every quota) — and the exclusion
    // also keeps the sweep's ORDER BY off NULL keys, where the engines
    // disagree (Spark sorts NULLS FIRST, DuckDB NULLS LAST)
    val docs = spark.table("documents").filter($"lang".isNotNull)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_d"))
    val tot = counts.agg(sum($"n_d").as("total"), count(lit(1)).as("n_langs"))

    // BOUNDED global window: `counts` has one row per LANGUAGE — label-set
    // sized (~10² at web scale), never corpus-growing. Pinned by
    // ScalePlanSpec ("global windows are provably bounded").
    val w = Window.orderBy($"n_d", $"lang")
    val ranked = counts.crossJoin(broadcast(tot))
      .withColumn("k", row_number().over(w).cast(LongType))
      .withColumn("cum_excl", coalesce(
        sum($"n_d").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("share", expr("((total DIV 2) - cum_excl) DIV (n_langs - k + 1)"))

    // the first overflowing rank's share IS the water level; with budget
    // < corpus at least one rank overflows, the left join is belt
    val level = ranked.filter($"n_d" > $"share")
      .orderBy($"k").limit(1).select($"share".as("c"))
    val rates = ranked.join(broadcast(level), lit(true), "left")
      .select($"lang",
        when($"n_d" <= $"share", lit(10000L))
          .otherwise(expr("(least(n_d, coalesce(c, 0L)) * 10000) DIV n_d"))
          .as("rate_bp"))

    docs
      .join(broadcast(rates), Seq("lang"))
      .withColumn("bucket", (expr(bucketExprSql("doc_id")) % 10000L).cast(LongType))
      .filter($"bucket" < $"rate_bp")
      .select($"doc_id", $"lang", $"bucket", $"rate_bp")
  }

  val unimaxSampleOracle: String = Fixtures.oracle(
    s""", um_c AS (SELECT lang, COUNT(*) AS n_d FROM documents
                   WHERE lang IS NOT NULL GROUP BY 1),
       um_t AS (SELECT SUM(n_d) AS total, COUNT(*) AS n_langs FROM um_c),
       um_s AS (
         SELECT lang, n_d,
                ((t.total // 2) - COALESCE(SUM(n_d) OVER (ORDER BY n_d, lang
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                  // (t.n_langs - ROW_NUMBER() OVER (ORDER BY n_d, lang) + 1)
                  AS share,
                ROW_NUMBER() OVER (ORDER BY n_d, lang) AS k
         FROM um_c, um_t t),
       um_lvl AS (SELECT share AS c FROM um_s WHERE n_d > share
                  ORDER BY k LIMIT 1),
       um_rates AS (
         SELECT s.lang,
                CAST(CASE WHEN s.n_d <= s.share THEN 10000
                          ELSE (LEAST(s.n_d, COALESCE(l.c, 0)) * 10000) // s.n_d
                     END AS BIGINT) AS rate_bp
         FROM um_s s LEFT JOIN um_lvl l ON TRUE)
       SELECT d.doc_id, d.lang,
              CAST(${bucketExprSql("d.doc_id")} % 10000 AS BIGINT) AS bucket,
              r.rate_bp
       FROM documents d JOIN um_rates r ON d.lang = r.lang
       WHERE ${bucketExprSql("d.doc_id")} % 10000 < r.rate_bp""")

  /** Importance (weighted) sampling: keep-probability proportional to a
    * per-document weight — here a length proxy capped at 95% — instead of
    * a per-stratum constant. Same deterministic-hash machinery as the
    * stratified sampler (pure projection, no shuffle, retry-stable); only
    * the rate becomes a function of the row. The realistic use is
    * quality-weighted corpus mixing, where weight = a quality score. */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .withColumn("weight_bp", least(lit(9500L), $"n_chars" * 10L).cast(LongType))
      .withColumn("bucket", (expr(bucketExprSql("doc_id")) % 10000L).cast(LongType))
      .filter($"bucket" < $"weight_bp")
      .select($"doc_id", $"lang", $"bucket", $"weight_bp")
  }

  val weightedSampleOracle: String = Fixtures.oracle(
    s"""SELECT doc_id, lang,
               CAST(${bucketExprSql("doc_id")} % 10000 AS BIGINT) AS bucket,
               CAST(least(9500, n_chars * 10) AS BIGINT) AS weight_bp
        FROM documents
        WHERE ${bucketExprSql("doc_id")} % 10000 < least(9500, n_chars * 10)""")

  /** Leakage-free train/holdout split: the split decision hashes the
    * DOCUMENT CONTENT (sha-256 of text), not the row id, so byte-identical
    * duplicates land in the same split even across re-crawls with new ids —
    * the eval-contamination failure mode a row-id split invites. The first
    * hex nibble buckets 16 ways: 0–c → train (13/16 ≈ 81%), d–f →
    * holdout. Pure projection; composes with the dedup ladder for
    * near-dup-safe splits (route each near-dup CLUSTER's canonical sha
    * through the same rule). */
  /** Content-hash split rule — ONE definition per engine (the
    * [[bucketExprSql]] convention), shared with `TextOps.corpusBuild`, so
    * editing the ratio can never silently desync the standalone split view
    * from the corpus manifest. First hex char ≤ 'c' ⇒ 13/16 train. */
  def splitCol(sha: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(substring(sha, 1, 1) <= "c", "train").otherwise("holdout")

  /** SQL twin of [[splitCol]]. */
  def splitCaseSql(shaExpr: String): String =
    s"CASE WHEN substr($shaExpr, 1, 1) <= 'c' THEN 'train' ELSE 'holdout' END"

  def trainHoldoutSplit(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .withColumn("content_sha", sha2($"text", 256))
      .withColumn("split", splitCol($"content_sha"))
      .select($"doc_id", $"lang", $"content_sha", $"split")
  }

  val trainHoldoutSplitOracle: String = Fixtures.oracle(
    s"""SELECT doc_id, lang,
              sha256(text) AS content_sha,
              ${splitCaseSql("sha256(text)")} AS split
       FROM documents""")

  /** Class-balanced downsampling (classifier-training prep): every label
    * keeps exactly the MINORITY class's count, chosen by the deterministic
    * Knuth-hash order (retry-stable, like every sampler here). Two-stage
    * top-m: rank within (label, salt) buckets first, keep ≤ m per bucket,
    * then re-rank only the ≤ 199·m survivors per label — the global top-m
    * of a label is always within the top-m of its bucket, so this is
    * bit-identical to the one-shot window without ever sorting a whole
    * class in one task (same scale rationale as [[uniformKPerStratum]]).
    * The minority count m is a 1-row broadcast. */
  def classBalanced(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val e = spark.table("embeddings")
      .select($"vec_id", $"label".cast(LongType).as("label"))
    val m = e.groupBy($"label").agg(count(lit(1)).as("cnt"))
      .agg(min($"cnt").as("m"))

    val bucketed = e
      .withColumn("h", expr(bucketExprSql("vec_id")))
      .withColumn("salt", $"vec_id" % 199)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy($"label", $"salt").orderBy($"h", $"vec_id")
    val survivors = bucketed
      .withColumn("r1", row_number().over(w1))
      .join(broadcast(m))
      .filter($"r1" <= $"m")
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy($"label").orderBy($"h", $"vec_id")
    survivors
      .withColumn("rank", row_number().over(w2).cast(LongType))
      .filter($"rank" <= $"m")
      .select($"label", $"rank", $"vec_id")
  }

  val classBalancedOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
       m AS (SELECT MIN(cnt) AS m
             FROM (SELECT label, COUNT(1) AS cnt FROM e GROUP BY 1) c),
       r AS (SELECT label, vec_id,
                    ROW_NUMBER() OVER (PARTITION BY label
                                       ORDER BY ${bucketExprSql("vec_id")}, vec_id) AS rank
             FROM e)
       SELECT label, CAST(rank AS BIGINT) AS rank, vec_id
       FROM r, m WHERE rank <= m.m"""

  /** Diversity-aware quality selection (cross-modal): the top-2
    * highest-quality documents PER EMBEDDING CLUSTER — cluster-balanced
    * curation, the selection rule that keeps a quality-filtered corpus from
    * collapsing onto one mode. Composes the shared text-quality signals
    * (TextOps.curationSignals) with the shared IVF assignment
    * (Similarity.ivfAssignments) over the doc_id = vec_id spine; the top-k
    * window partitions BY CLUSTER, bounded by cell occupancy
    * (~N/centroids), ties broken on doc_id. */
  def diverseQuality(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.plans.DotProduct.register(spark)
    import spark.implicits._
    val quality = TextOps.curationSignals(spark).select($"doc_id", $"quality")
    val assign = Similarity.ivfAssignments(spark, sfDir)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster").orderBy($"quality".desc, $"doc_id")
    quality.join(assign, $"doc_id" === $"vec_id")
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter($"rank" <= 2)
      .select($"cluster", $"rank", $"doc_id", round($"quality", 6).as("quality"))
  }

  val diverseQualityOracle: String = Fixtures.oracle(
    Similarity.assignmentCtesFor("embeddings") +
      s""", dq_sig AS (
         SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
                CAST(${TextOps.stopCountDuck("text")} AS DOUBLE)
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
                CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq
         FROM documents),
       dq_q AS (
         SELECT doc_id,
                LEAST(1.0, n_words / 200.0) * 0.4
                  + LEAST(1.0, stop_ratio * 10.0) * 0.3
                  + (n_uniq / n_words) * 0.3 AS quality
         FROM dq_sig),
       dq_r AS (
         SELECT a.cluster, q.doc_id, q.quality,
                ROW_NUMBER() OVER (PARTITION BY a.cluster
                                   ORDER BY q.quality DESC, q.doc_id) AS rank
         FROM dq_q q JOIN assignments a ON q.doc_id = a.vec_id)
       SELECT cluster, CAST(rank AS BIGINT) AS rank, doc_id, ROUND(quality, 6) AS quality
       FROM dq_r WHERE rank <= 2""")

  /** DSIR importance RESAMPLING — the selection half of Xie et al. 2023:
    * keep each document with probability proportional to its importance
    * weight (TextOps.dsirWeights — how target-like its hashed-bigram bag
    * is), normalized so the expected kept volume is half the corpus:
    * rate_d = min(1, w_d / (2·w̄)). The keep decision is the same
    * deterministic Knuth-hash Bernoulli as every sampler here — the paper
    * samples a Gumbel top-k; a hash threshold keeps the decision
    * retry-stable and oracle-checkable while preserving the
    * ∝-weight semantics.
    *
    * Scale shape: the weight frame adds DSIR's fixed-bucket score pass
    * (constant-size broadcasts only); the mean weight is a 1-row broadcast;
    * the keep filter is a projection of (doc_id, weight). Documents under
    * 2 words carry no bigram evidence and drop out of the weight frame —
    * and therefore the sample — identically in both engines. */
  def dsirSample(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val w = TextOps.dsirWeights(spark, sfDir)
    val avg = w.agg(expr("sum(weight_bp) DIV count(1)").as("avg_bp"))
    w.crossJoin(broadcast(avg))
      .withColumn("rate_bp",
        least(lit(10000L), expr("(weight_bp * 5000) DIV avg_bp")))
      .withColumn("bucket", (expr(bucketExprSql("doc_id")) % 10000L).cast(LongType))
      .filter($"bucket" < $"rate_bp")
      .select($"doc_id", $"weight_bp", $"bucket", $"rate_bp")
  }

  val dsirSampleOracle: String = Fixtures.oracle(TextOps.dsirCtes +
    s""", dsir_avg AS (SELECT SUM(weight_bp) // COUNT(1) AS avg_bp FROM dsir_w)
       SELECT d.doc_id, d.weight_bp,
              CAST(${bucketExprSql("d.doc_id")} % 10000 AS BIGINT) AS bucket,
              CAST(LEAST(10000, (d.weight_bp * 5000) // a.avg_bp) AS BIGINT) AS rate_bp
       FROM dsir_w d CROSS JOIN dsir_avg a
       WHERE ${bucketExprSql("d.doc_id")} % 10000
               < LEAST(10000, (d.weight_bp * 5000) // a.avg_bp)""")

  /** DoReMi-style domain-mixture reweighting (Xie et al., "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * NeurIPS 2023): upweight domains where the proxy model does WORST.
    * DoReMi's update is weight_d ∝ prior_d · exp(η · excess_loss_d); this
    * keeps the same monotone signal as integer rationals — the per-domain
    * "loss" is the corpus-derived bigram fluency ([[TextOps.lmFluency]]:
    * lower fluency = less predictable under the corpus LM = higher loss),
    * and exp(excess) becomes the hardness ratio
    *
    *   hardness_bp_d = 10⁴ · corpus_mean_fluency / mean_fluency_d
    *
    * (>10⁴ exactly when the domain is harder than average — monotone in
    * DoReMi's excess loss, ln/exp-free so every value is integer
    * arithmetic and bit-identical across engines). The prior is the
    * observed doc share; the output mixture is normalized to ~10⁴ bp by
    * integer division (Σ within n_domains of 10⁴ by truncation — exact
    * enough for a sampling rate table; a production run would hand the
    * rates to [[domainMix]]'s Bernoulli gate).
    *
    * The domain axis is `lang` — the corpus's skewed axis, same choice and
    * reason as [[domainMix]]. Docs under 2 words carry no bigram loss
    * evidence and drop from the means identically in both engines.
    *
    * Scale shape: the fluency frame is the vocabulary-safe lmFluency plan
    * (both count joins shuffle on their keys); everything after is
    * domain-sized — one map-side-combined (lang) aggregate, a 1-row corpus
    * mean, a ≤n_domains-row weight table. No new corpus-sized exchange. */
  def doremiWeights(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val fl = TextOps.lmFluency(spark, sfDir)
      .join(spark.table("documents").select($"doc_id", $"lang"), Seq("doc_id"))
    val perDom = fl.groupBy($"lang").agg(
      count(lit(1)).as("n_docs"), sum($"fluency").as("fl_sum"))
    val corpus = perDom.agg(
      sum($"n_docs").as("all_docs"), sum($"fl_sum").as("all_fl"))
    val scored = perDom.crossJoin(broadcast(corpus))
      .select($"lang", $"n_docs",
        expr("(n_docs * 10000) DIV all_docs").as("share_bp"),
        expr("((all_fl DIV all_docs) * 10000) DIV (fl_sum DIV n_docs)")
          .as("hardness_bp"))
      .withColumn("raw", $"share_bp" * $"hardness_bp")
    val rawTotal = scored.agg(sum($"raw").as("raw_total"))
    scored.crossJoin(broadcast(rawTotal))
      .select($"lang", $"n_docs", $"share_bp", $"hardness_bp",
        expr("(raw * 10000) DIV raw_total").as("weight_bp"))
  }

  val doremiWeightsOracle: String = Fixtures.oracle(TextOps.fluencyCtes("dm_") +
    """, dm_dom AS (
         SELECT d.lang, COUNT(1) AS n_docs, SUM(f.fluency) AS fl_sum
         FROM dm_fl f JOIN documents d ON f.doc_id = d.doc_id
         GROUP BY 1),
       dm_all AS (SELECT SUM(n_docs) AS all_docs, SUM(fl_sum) AS all_fl FROM dm_dom),
       dm_scored AS (
         SELECT m.lang, m.n_docs,
                (m.n_docs * 10000) // a.all_docs AS share_bp,
                ((a.all_fl // a.all_docs) * 10000) // (m.fl_sum // m.n_docs)
                  AS hardness_bp
         FROM dm_dom m CROSS JOIN dm_all a),
       dm_tot AS (SELECT SUM(share_bp * hardness_bp) AS raw_total FROM dm_scored)
       SELECT s.lang, s.n_docs,
              CAST(s.share_bp AS BIGINT) AS share_bp,
              CAST(s.hardness_bp AS BIGINT) AS hardness_bp,
              CAST((s.share_bp * s.hardness_bp * 10000) // t.raw_total AS BIGINT)
                AS weight_bp
       FROM dm_scored s CROSS JOIN dm_tot t""")

  /** RHO-loss data selection (Mindermann et al., ICML'22 "Prioritized
    * training on points that are learnable, worth learning, and not yet
    * learnt"): score every training document by
    *
    *   excess = reducible_holdout_loss_proxy = L_train(x) − L_holdout(x)
    *
    * where L_train is the loss proxy under a model of the TRAIN split and
    * L_holdout under a model trained on the held-out split (which never saw
    * x). High-excess points are learnable (the holdout model predicts them
    * fine) but not yet learnt (the train-split model does not) — noise
    * scores low on both, memorized boilerplate scores low excess. The loss
    * proxy is the [[TextOps.lmFluency]] corpus-bigram-LM score negated:
    * fluency is a predictability score, so excess loss = ref_fluency −
    * self_fluency, both integer by the fluency discipline.
    *
    * The split is the content-hash [[splitCol]] — the SAME assignment
    * `split_train_holdout` exports, so the selection is consistent with the
    * pipeline's own holdout. Documents whose bigrams/heads the holdout LM
    * never saw contribute 0 for those grams (add-zero: an unseen gram has
    * frequency 0, not a smoothing constant — keeps every value integer and
    * engine-exact).
    *
    * Scale shape: two vocabulary-sized count frames per LM (bigram + head),
    * each a map-side-combined shuffle over the split-filtered gram stream;
    * scoring is two LEFT shuffle joins on the gram/head keys (vocabulary
    * frames never broadcast — Heaps' law) and one per-doc aggregate; the
    * top-64 selection is orderBy+limit = TakeOrderedAndProject (per-
    * partition top-64, single 64-row merge — never a global sort). */
  def rhoLossSelect(spark: SparkSession, sfDir: String, topK: Int = 64): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val grams = spark.table("documents")
      .withColumn("split", splitCol(sha2($"text", 256)))
      .withColumn("words", split($"text", " "))
      .filter(size($"words") >= 2)
      .select($"doc_id", $"split", explode(expr(
        "transform(sequence(0, size(words) - 2), " +
          "i -> struct(words[i] AS head, concat(words[i], ' ', words[i+1]) AS gram))"))
        .as("g"))
      .select($"doc_id", $"split", $"g.head", $"g.gram")

    def lm(split: String): (DataFrame, DataFrame) = {
      val s = grams.filter($"split" === split)
      (s.groupBy($"gram").agg(count(lit(1)).as("big_n")),
        s.groupBy($"head").agg(count(lit(1)).as("head_n")))
    }
    val (trainBig, trainHead) = lm("train")
    val (refBig, refHead) = lm("holdout")

    def score(big: DataFrame, head: DataFrame, out: String): DataFrame =
      grams.filter($"split" === "train")
        .join(big, Seq("gram"), "left")
        .join(head, Seq("head"), "left")
        .select($"doc_id",
          coalesce(expr("(big_n * 1000000L) DIV head_n"), lit(0L)).as("g_score"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"), sum($"g_score").as("total"))
        .select($"doc_id", $"n_grams", expr("total DIV n_grams").as(out))

    score(trainBig, trainHead, "self_fluency")
      .join(score(refBig, refHead, "ref_fluency").drop("n_grams"), Seq("doc_id"))
      .withColumn("excess", $"ref_fluency" - $"self_fluency")
      .orderBy($"excess".desc, $"doc_id")
      .limit(topK)
  }

  val rhoLossSelectOracle: String = Fixtures.oracle(
    """, rho_grams AS (
         SELECT doc_id,
                CASE WHEN substr(sha256(text), 1, 1) <= 'c'
                     THEN 'train' ELSE 'holdout' END AS split,
                words[i+1] AS head, words[i+1] || ' ' || words[i+2] AS gram
         FROM (SELECT doc_id, text, string_split(text, ' ') AS words
               FROM documents
               WHERE len(string_split(text, ' ')) >= 2) dw,
              UNNEST(range(len(words) - 1)) AS t(i)),
       rho_tb AS (SELECT gram, COUNT(1) AS big_n FROM rho_grams
                  WHERE split = 'train' GROUP BY 1),
       rho_th AS (SELECT head, COUNT(1) AS head_n FROM rho_grams
                  WHERE split = 'train' GROUP BY 1),
       rho_rb AS (SELECT gram, COUNT(1) AS big_n FROM rho_grams
                  WHERE split = 'holdout' GROUP BY 1),
       rho_rh AS (SELECT head, COUNT(1) AS head_n FROM rho_grams
                  WHERE split = 'holdout' GROUP BY 1),
       rho_self AS (
         SELECT g.doc_id, COUNT(1) AS n_grams,
                CAST(SUM(COALESCE((b.big_n * 1000000) // h.head_n, 0)) // COUNT(1) AS BIGINT)
                  AS self_fluency
         FROM rho_grams g
         LEFT JOIN rho_tb b ON g.gram = b.gram
         LEFT JOIN rho_th h ON g.head = h.head
         WHERE g.split = 'train' GROUP BY 1),
       rho_ref AS (
         SELECT g.doc_id,
                CAST(SUM(COALESCE((b.big_n * 1000000) // h.head_n, 0)) // COUNT(1) AS BIGINT)
                  AS ref_fluency
         FROM rho_grams g
         LEFT JOIN rho_rb b ON g.gram = b.gram
         LEFT JOIN rho_rh h ON g.head = h.head
         WHERE g.split = 'train' GROUP BY 1)
       SELECT s.doc_id, s.n_grams, s.self_fluency, r.ref_fluency,
              r.ref_fluency - s.self_fluency AS excess
       FROM rho_self s JOIN rho_ref r ON s.doc_id = r.doc_id
       ORDER BY excess DESC, s.doc_id
       LIMIT 64""")

  /** Data-constrained epoch scheduling (Muennighoff et al., NeurIPS'23
    * "Scaling data-constrained language models"): when the training budget
    * exceeds the corpus, data must REPEAT — and repeated tokens decay in
    * value, worthless past ~4 epochs. Allocate a token budget B = 2×corpus
    * across sources by water-filling a per-source level L with each source
    * capped at 4 epochs of itself: Σ min(cap_s, L) = B, cap_s = 4·n_s —
    * the [[unimaxSample]] sweep with the published repetition ceiling as
    * the cap instead of the corpus itself. Sources at cap repeat 4×;
    * everything else sits at the shared level (≥ 1 epoch by construction
    * at B = 2×corpus since L ≥ B/k ≥ smallest caps… the spec asserts the
    * fixture exercises both sides).
    *
    * Output per source: tokens, cap, allocation, epochs in bp
    * (10⁴ = one epoch), at_cap. Integer throughout — the level sweep runs
    * over the SOURCE-set-sized frame (bounded global window, the unimax
    * class), allocation is exact floor division; the ≤(k−1)-token sweep
    * remainder stays unallocated, documented, identically in both
    * engines. */
  def epochSchedule(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val counts = spark.table("documents").filter($"source".isNotNull)
      .groupBy($"source")
      .agg(sum(size(split($"text", " ")).cast(LongType)).as("n_tok"))
      .withColumn("cap", $"n_tok" * 4L)
    val tot = counts.agg(sum($"n_tok").as("total"), count(lit(1)).as("n_src"))

    // BOUNDED global window: one row per SOURCE (label-set sized)
    val w = Window.orderBy($"cap", $"source")
    val ranked = counts.crossJoin(broadcast(tot))
      .withColumn("k", row_number().over(w).cast(LongType))
      .withColumn("cum_excl", coalesce(
        sum($"cap").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("level", expr("((total * 2) - cum_excl) DIV (n_src - k + 1)"))

    val level = ranked.filter($"cap" > $"level")
      .orderBy($"k").limit(1).select($"level".as("lv"))
    ranked.join(broadcast(level), lit(true), "left")
      .select($"source", $"n_tok", $"cap",
        when($"cap" <= $"level", $"cap")
          .otherwise(least($"cap", coalesce($"lv", lit(0L)))).as("alloc"))
      .select($"source", $"n_tok", $"cap", $"alloc",
        expr("(alloc * 10000) DIV n_tok").as("epochs_bp"),
        ($"alloc" === $"cap").as("at_cap"))
  }

  val epochScheduleOracle: String = Fixtures.oracle(
    """, eps_c AS (
         SELECT source,
                SUM(len(string_split(text, ' '))) AS n_tok,
                SUM(len(string_split(text, ' '))) * 4 AS cap
         FROM documents WHERE source IS NOT NULL GROUP BY 1),
       eps_t AS (SELECT SUM(n_tok) AS total, COUNT(1) AS n_src FROM eps_c),
       eps_r AS (
         SELECT c.source, c.n_tok, c.cap,
                ROW_NUMBER() OVER (ORDER BY c.cap, c.source) AS k,
                COALESCE(SUM(c.cap) OVER (ORDER BY c.cap, c.source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl,
                t.total, t.n_src
         FROM eps_c c CROSS JOIN eps_t t),
       eps_r2 AS (
         SELECT *, ((total * 2) - cum_excl) // (n_src - k + 1) AS level
         FROM eps_r),
       eps_lv AS (
         SELECT level AS lv FROM eps_r2 WHERE cap > level ORDER BY k LIMIT 1),
       eps_a AS (
         SELECT r.source, r.n_tok, r.cap,
                CASE WHEN r.cap <= r.level THEN r.cap
                     ELSE LEAST(r.cap, COALESCE(l.lv, 0)) END AS alloc
         FROM eps_r2 r LEFT JOIN eps_lv l ON TRUE)
       SELECT source, CAST(n_tok AS BIGINT) AS n_tok, CAST(cap AS BIGINT) AS cap,
              CAST(alloc AS BIGINT) AS alloc,
              CAST((alloc * 10000) // n_tok AS BIGINT) AS epochs_bp,
              alloc = cap AS at_cap
       FROM eps_a""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mix_epoch_schedule" -> (epochSchedule _),
    "sample_rho_loss" -> ((s: SparkSession, d: String) => rhoLossSelect(s, d)),
    "mix_doremi_weights" -> (doremiWeights _),
    "sample_dsir" -> (dsirSample _),
    "sample_class_balanced" -> (classBalanced _),
    "sample_diverse_quality" -> (diverseQuality _),
    "sample_weighted" -> (weightedSample _),
    "split_train_holdout" -> (trainHoldoutSplit _),
    "sample_stratified" -> (stratifiedSample _),
    "sample_uniform_k" -> ((s: SparkSession, d: String) => uniformKPerStratum(s, d)),
    "embedding_quantize" -> (embeddingQuantize _),
    "pack_token_budget" -> ((s: SparkSession, d: String) => packTokenBudget(s, d)),
    "sample_domain_mix" -> (domainMix _),
    "sample_temperature_mix" -> (temperatureMix _),
    "mix_temperature_curve" -> (temperatureCurve _),
    "sample_unimax" -> (unimaxSample _))

  val oracles: Map[String, String] = Map(
    "mix_epoch_schedule" -> epochScheduleOracle,
    "sample_rho_loss" -> rhoLossSelectOracle,
    "mix_doremi_weights" -> doremiWeightsOracle,
    "sample_dsir" -> dsirSampleOracle,
    "sample_class_balanced" -> classBalancedOracle,
    "sample_diverse_quality" -> diverseQualityOracle,
    "sample_weighted" -> weightedSampleOracle,
    "split_train_holdout" -> trainHoldoutSplitOracle,
    "sample_stratified" -> stratifiedSampleOracle,
    "sample_uniform_k" -> uniformKPerStratumOracle,
    "embedding_quantize" -> embeddingQuantizeOracle,
    "pack_token_budget" -> packTokenBudgetOracle,
    "sample_domain_mix" -> domainMixOracle,
    "sample_temperature_mix" -> temperatureMixOracle,
    "mix_temperature_curve" -> temperatureCurveOracle,
    "sample_unimax" -> unimaxSampleOracle)
}
