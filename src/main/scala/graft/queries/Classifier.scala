package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.fixtures.Fixtures
import graft.functions.TextHash

/** In-engine quality-classifier TRAINING — the discriminative counterpart of
  * the DSIR importance estimator ([[TextOps.dsirWeights]]): where DSIR asks
  * "how likely is this bag under the target distribution" (generative), this
  * trains a linear bag-of-words filter the way CCNet / DCLM / FineWeb-Edu
  * curation stacks do (fastText over labeled exemplars) and APPLIES it as a
  * keep/toss gate. The model IS a DataFrame — a fixed-width hashed-feature
  * weight table that a production run trains once per corpus snapshot,
  * writes, and reuses across every scoring pass (same index-vs-query split
  * as [[TextOps.dfIndex]] / [[TextOps.bm25Search]]).
  *
  * Training is Naive-Bayes-by-counting, integerized: per hashed unigram
  * bucket b, the one-vs-rest evidence ratio
  *
  *   weight_bp(b) = 10⁴ · (pos_b + 1)(neg_total + V) / ((neg_b + 1)(pos_total + V))
  *
  * — the exact-rational analogue of the NB log-odds
  * log P(b|pos) − log P(b|neg) with add-one smoothing (monotone in it, since
  * x ↦ log x is monotone), kept ln-free so every value is integer
  * arithmetic, order-free, and bit-identical across engines (the
  * [[TextOps.lmFluency]] discipline). V is the OBSERVED vocabulary — the
  * count of occupied buckets (≤ [[nbBuckets]]), exactly Laplace's rule —
  * not the bucket width: smoothing with the full width systematically
  * deflates the smaller class whenever its token count is below the width
  * (measured: every margin sat ~−5000 bp on the fixture), which would make
  * the absolute keep gate a corpus-size artifact instead of a class
  * boundary. Positive exemplars are documents from
  * the target sources (a caller parameter in library use; the fixture pins
  * the same two sources DSIR targets, so the two estimators are comparable
  * on the same task).
  *
  * Scale shape: training is ONE map-side-combined (bucket, class) count over
  * scan-side exploded tokens — feature hashing bounds the model at
  * [[nbBuckets]] rows regardless of corpus vocabulary (Heaps' law never
  * touches it), which is what makes the model table legitimately
  * broadcastable at any corpus size. The ratio runs in DECIMAL(38,0)
  * lanes ([[weightExpr]]) so no token-count product a real corpus can
  * produce wraps; NbBoundarySpec pins the arithmetic at the former Long
  * boundary and beyond.
  *
  * Reference scope note: the reference engine has no model-based filtering —
  * this family is part of the beyond-reference training-data surface the
  * build mandates (quality scoring over `documents`).
  */
object Classifier {

  /** Fixed hashed-feature width — same constant-size-by-construction bound
    * as count-min and DSIR's bucket tables. */
  private def nbBuckets = 4096

  /** Positive-exemplar sources (the "high quality" label). Matches
    * [[TextOps]]'s DSIR target slice so generative and discriminative
    * estimators are trained on the identical supervision. */
  // ONE definition with the DSIR target slice (TextOps.dsirTargetSources):
  // the doc below claims the two estimators share supervision — referencing
  // the constant makes that claim structural instead of a convention
  private def nbPosSources = TextOps.dsirTargetSources
  private def nbPosPred = nbPosSources.map(s => s"'$s'").mkString(
    "source IN (", ", ", ")")

  /** (doc_id, source, bucket) token stream: scan-side explode, the token
    * STRING dies in the projection — only the integer bucket reaches any
    * exchange. Memoized: the frame feeds the count pass AND the score
    * join, and the char-level polynomial hashing is the expensive part. */
  private def nbTokens(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.cached(spark, sfDir, "nb_tokens") {
      import spark.implicits._
      spark.table("documents")
        .select($"doc_id", $"source", explode(split($"text", " ")).as("w"))
        .select($"doc_id", $"source",
          expr(s"${TextHash.sparkWordHash("w")} % $nbBuckets").as("bucket"))
    }

  /** The trained model: one row per OCCUPIED bucket with class counts and
    * the integer evidence weight. Memo-cached — [[nbScore]] applies the
    * same table the train query emits. */
  private[queries] def nbWeights(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.cached(spark, sfDir, "nb_weights") {
      import spark.implicits._
      val counts = nbTokens(spark, sfDir)
        .withColumn("is_pos", expr(nbPosPred))
        .groupBy($"bucket")
        .agg(sum(when($"is_pos", 1L).otherwise(0L)).as("pos_n"),
          sum(when($"is_pos", 0L).otherwise(1L)).as("neg_n"))
      val totals = counts.agg(
        sum($"pos_n").as("pos_total"), sum($"neg_n").as("neg_total"),
        count(lit(1)).as("v"))
      counts.crossJoin(broadcast(totals))
        .select($"bucket", $"pos_n", $"neg_n", expr(weightExpr).as("weight_bp"))
    }

  /** The evidence-ratio expression in DECIMAL(38,0) lanes (HUGEINT on the
    * oracle side): plain Long products wrap once pos_b·neg_total passes
    * ~2⁶³/10⁴ ≈ 9·10¹⁴ — inside reach of a 100 TB token count — and the
    * engines diverge on wrap (Spark non-ANSI wraps silently, DuckDB
    * errors). Decimal lanes keep the products exact to 10³⁸ at every
    * magnitude a real corpus can produce.
    *
    * The CASE guard handles the one residual ceiling: the QUOTIENT itself
    * only fits a BIGINT while the class ratio is below ~8·10¹⁴ (a
    * one-token-class pathology, not a corpus-size effect) — and on
    * overflow Spark's decimal DIV WRAPS silently where DuckDB's
    * HUGEINT→BIGINT cast errors. Both engines instead null it: the guard
    * compares the IEEE-double estimate of the quotient (bit-identical
    * cross-engine — nearest-double casts of exact integers, one division,
    * one compare) against 8·10¹⁸, conservatively inside Long range so a
    * guard-passing quotient (≤ estimate + ~10³ ulp error) can never wrap.
    * NbBoundarySpec replays the whole expression against BigInt
    * arithmetic at adversarial magnitudes. */
  private[queries] val weightExpr: String = {
    val num = "(CAST(pos_n + 1 AS DECIMAL(38,0)) * (neg_total + v)) * 10000"
    val den = "CAST(neg_n + 1 AS DECIMAL(38,0)) * (pos_total + v)"
    s"CASE WHEN CAST($num AS DOUBLE) / CAST($den AS DOUBLE) < 8.0e18 " +
      s"THEN ($num) DIV ($den) ELSE CAST(NULL AS BIGINT) END"
  }

  def nbTrain(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    nbWeights(spark, sfDir)
  }

  /** Apply the model: per document, the mean evidence MARGIN in basis
    * points — weight_bp − 10⁴ per token, so 0 is the class boundary
    * (a token seen equally often in both classes scores 10⁴ = ratio 1) —
    * and the keep gate. The model join broadcasts the ≤[[nbBuckets]]-row
    * weight table against the token stream; the per-doc fold is one
    * map-side-combined aggregate. Every token's bucket is occupied by
    * construction (the model was trained on this corpus), so the inner
    * join drops nothing; scoring a FOREIGN corpus would left-join with a
    * neutral 10⁴ fallback — same plan, one coalesce. */
  def nbScore(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val w = nbWeights(spark, sfDir)
    nbTokens(spark, sfDir)
      .join(broadcast(w.select($"bucket", $"weight_bp")), Seq("bucket"))
      .groupBy($"doc_id")
      // the margin sum promotes to DECIMAL(38,0) for the same reason as
      // [[weightExpr]]: DuckDB's SUM(BIGINT) is already HUGEINT, so a Long
      // sum on this side would wrap first and diverge at ~10¹⁵ doc tokens
      .agg(count(lit(1)).as("n_tokens"),
        sum(($"weight_bp" - lit(10000L)).cast(DecimalType(38, 0))).as("m"))
      .select($"doc_id", $"n_tokens",
        expr("m DIV n_tokens").as("margin_bp"),
        ($"m" > 0L).as("keep"))
  }

  /** DuckDB spelling of Spark's TRUNCATING integer division for a possibly
    * negative numerator: Spark `DIV` truncates toward zero, DuckDB `//`
    * floors — they agree only on non-negative operands. The nb margin sum
    * Σ(weight_bp − 10⁴) is signed by construction (0 is the class
    * boundary), so every oracle replay of `m DIV n_tokens` must sign-split
    * or a negative non-divisible margin shifts by 1 and flips bins. */
  private def truncDiv(s: String, n: String): String =
    s"(CASE WHEN ($s) >= 0 THEN ($s) // ($n) ELSE -((-($s)) // ($n)) END)"

  /** Shared oracle CTEs ending at `nb_w(bucket, pos_n, neg_n, weight_bp)`. */
  private def nbCtes: String =
    s""", nb_t AS (
         SELECT doc_id, source,
                ${TextHash.duckWordHash("w")} % $nbBuckets AS bucket
         FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
               FROM documents)),
       nb_c AS (
         SELECT bucket,
                SUM(CASE WHEN $nbPosPred THEN 1 ELSE 0 END) AS pos_n,
                SUM(CASE WHEN $nbPosPred THEN 0 ELSE 1 END) AS neg_n
         FROM nb_t GROUP BY 1),
       nb_tot AS (SELECT SUM(pos_n) AS pos_total, SUM(neg_n) AS neg_total,
                         COUNT(1) AS v FROM nb_c),
       nb_w AS (
         SELECT bucket, pos_n, neg_n,
                CASE WHEN CAST(w_num AS DOUBLE) / CAST(w_den AS DOUBLE) < 8.0e18
                     THEN CAST(w_num // w_den AS BIGINT) ELSE NULL END
                  AS weight_bp
         FROM (SELECT c.bucket, c.pos_n, c.neg_n,
                      (CAST(c.pos_n + 1 AS HUGEINT) * (t.neg_total + t.v))
                        * 10000 AS w_num,
                      CAST(c.neg_n + 1 AS HUGEINT) * (t.pos_total + t.v)
                        AS w_den
               FROM nb_c c CROSS JOIN nb_tot t))"""

  val nbTrainOracle: String = Fixtures.oracle(nbCtes +
    """
       SELECT bucket, CAST(pos_n AS BIGINT) AS pos_n,
              CAST(neg_n AS BIGINT) AS neg_n,
              CAST(weight_bp AS BIGINT) AS weight_bp
       FROM nb_w""")

  val nbScoreOracle: String = Fixtures.oracle(nbCtes +
    s"""
       SELECT g.doc_id, COUNT(1) AS n_tokens,
              CAST(${truncDiv("SUM(w.weight_bp - 10000)", "COUNT(1)")}
                AS BIGINT) AS margin_bp,
              SUM(w.weight_bp - 10000) > 0 AS keep
       FROM nb_t g JOIN nb_w w ON g.bucket = w.bucket
       GROUP BY 1""")

  // =====================================================================
  // Class-balanced batch perceptron: the OPTIMIZING counterpart of the
  // counting NB (Rosenblatt's rule in the full-batch form of Duda–Hart
  // §5.5 — every round computes one gradient of the perceptron criterion
  // over the whole corpus and applies it once, which is what makes the
  // loop distributable: per-example sequential updates don't shard,
  // full-batch sums do. The same shape McDonald et al. (NAACL 2010)
  // distribute by parameter mixing; here each round IS one exact global
  // batch). Updates are CLASS-BALANCED — each error doc's contribution is
  // scaled by the OTHER class's doc count (the integer form of the
  // standard 1/class-frequency cost reweighting): measured unbalanced on
  // the fixture (50 pos / 450 neg), the raw batch overshoots into an
  // all-negative limit cycle (curve: 50 → 450 → 50 → … errors, every
  // final margin ≤ 0); cross-scaling makes the two classes' gradient
  // mass comparable and the model actually separates. Both scalings are
  // exact integers, so the entries stay hash-gateable.
  // =====================================================================

  /** Fixed round budget: training cost is pcpRounds × 2 corpus passes by
    * construction, never data-dependent (a convergence test would make
    * the plan shape — and the oracle — corpus-dependent). */
  private[queries] val pcpRounds = 12

  /** Fixed-point scale of the L1-normalized features: x̂ = (tf·pcpF) DIV dl,
    * so every document is a length-free composition vector with mass
    * ≈ pcpF. Without this, margins are dominated by document LENGTH (all
    * docs share one vocabulary, so Σ tf·w ≈ dl·mean(w)) and the batch
    * update can only swing global polarity — measured as a 50 ↔ 450
    * error limit cycle that no step schedule tamed. dl ≤ a few hundred,
    * so 10⁴ resolves every tf/dl ratio the fixture (or any real page-
    * length corpus) produces. */
  private[queries] val pcpF = 10000L

  /** Balanced-update quantum: negative-class errors step ×pcpQ, positive
    * ×(n_neg·pcpQ) DIV n_pos — the class-imbalance ratio as a BOUNDED
    * integer (raw cross-mass scaling n_neg/n_pos·n_pos kept magnitudes
    * proportional to corpus size; the ratio keeps them proportional to
    * imbalance only). */
  private[queries] val pcpQ = 100L

  /** (doc_id, bucket, tf, y): hashed-unigram counts with the ±1 label —
    * the design matrix, one corpus-sized aggregate over the shared
    * [[nbTokens]] stream (the label rides `max()` over the per-doc
    * constant so no join against `documents` is needed) — plus the BIAS
    * feature (bucket −1, tf 1, per doc): without an intercept every
    * balanced batch update shifts the whole weight vector by a class's
    * gradient mass, so the model's POLARITY oscillates and the
    * discriminative per-bucket contrast never surfaces (measured: the
    * biasless curve swings 50 ↔ 450 errors with no usable round); with
    * it, the class-imbalance mass concentrates in the 1-D bias weight and
    * the token weights accumulate the error-set contrast. */
  private[queries] def pcpFeatures(spark: SparkSession, sfDir: String): DataFrame =
    pcpTf(spark, sfDir)

  private def pcpTf(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.checkpointed(spark, sfDir, "pcp_tf") {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val base = nbTokens(spark, sfDir)
        .groupBy($"doc_id", $"bucket")
        .agg(count(lit(1)).as("tf"),
          max(when(expr(nbPosPred), 1L).otherwise(-1L)).as("y"))
      val normed = base
        // PARTITIONED window (doc-keyed — the bounded class)
        .withColumn("dl", sum($"tf").over(Window.partitionBy($"doc_id")))
        .select($"doc_id", $"bucket",
          expr(s"(tf * $pcpF) DIV dl").as("xf"), $"y")
      normed.unionByName(base.select($"doc_id", $"y").distinct()
        .select($"doc_id", lit(-1L).as("bucket"), lit(pcpF).as("xf"), $"y"))
    }

  private val decZero = lit(0).cast(DecimalType(38, 0))

  /** One batch-perceptron training run per (session, corpus): K rounds of
    * score → error set → gradient → additive update, all integer (the
    * perceptron has no learning-rate rational to truncate — update = raw
    * count sums), DECIMAL(38,0)/HUGEINT lanes so no 100 TB token count can
    * wrap ([[weightExpr]]'s argument). Every round's weight table and
    * error set is localCheckpoint-ed: rounds chain from materialized
    * leaves, not a 6-deep replay ([[graft.util.Memo.checkpointed]]'s
    * task-binary argument). Returns (final weights, per-round curve).
    *
    * Scale shape: each round is exactly two corpus-sized passes (the
    * full-batch gradient's floor) — a doc-partitioned margin aggregate
    * against a ≤[[nbBuckets]]-row BROADCAST model, then a bucket-keyed
    * gradient over the error docs; weights/gradients stay model-sized
    * (≤4096 rows) at any corpus size. */
  private val pcpCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), (DataFrame, DataFrame)]

  private def pcpModel(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) =
    pcpCache.getOrElseUpdate((spark, sfDir), {
      import spark.implicits._
      val tf = pcpTf(spark, sfDir)
      // per-class doc counts + the bounded imbalance ratio (1-row broadcast)
      // coalesce: sum() over an EMPTY corpus is NULL, and the driver
      // collect below must read zeros there (empty-vs-empty gate contract),
      // not NPE
      val cls = tf.select($"doc_id", $"y").distinct()
        .agg(coalesce(sum(when($"y" === 1L, 1L).otherwise(0L)), lit(0L)).as("n_pos"),
          coalesce(sum(when($"y" === 1L, 0L).otherwise(1L)), lit(0L)).as("n_neg"))
        .withColumn("r", expr(
          s"CASE WHEN n_pos = 0 THEN 0 ELSE (n_neg * $pcpQ) DIV n_pos END"))
        .localCheckpoint()
      val Array(nPos, nNeg) = cls.collect().head match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
      // w₀ = 0, as an empty model-schema frame: round 1's margins coalesce
      // to 0, so its error set is every positive doc (sign(0) = −1)
      val ws = scala.collection.mutable.ArrayBuffer(
        tf.limit(0).select($"bucket", decZero.as("wgt")))
      val curve = Seq.newBuilder[DataFrame]
      // per-round balanced error mass ep·n_neg + en·n_pos, the pocket key
      val bmass = scala.collection.mutable.ArrayBuffer.empty[BigInt]
      for (k <- 1 to pcpRounds) {
        val errs = tf.join(broadcast(ws.last), Seq("bucket"), "left_outer")
          .withColumn("contrib",
            $"xf".cast(DecimalType(38, 0)) * coalesce($"wgt", decZero))
          .groupBy($"doc_id", $"y")
          .agg(sum($"contrib").as("m"))
          .filter(($"y" === 1L && $"m" <= 0) || ($"y" === -1L && $"m" > 0))
          .select($"doc_id", $"y")
          .localCheckpoint()
        // the y factor casts to DECIMAL FIRST so the per-row product runs
        // in decimal like the oracle's HUGEINT — a Long product of
        // xf(≤10⁴)·r would wrap silently past a ~10¹³:1 class imbalance
        // (the weightExpr ceiling class)
        val grad = tf.join(errs.select($"doc_id"), Seq("doc_id"))
          .crossJoin(broadcast(cls))
          .groupBy($"bucket")
          .agg(sum($"y".cast(DecimalType(38, 0)) * $"xf" *
            when($"y" === 1L, $"r").otherwise(lit(pcpQ))).as("g"))
          .localCheckpoint() // ≤ nbBuckets rows
        ws += ws.last.join(grad, Seq("bucket"), "full_outer")
          .select($"bucket",
            (coalesce($"wgt", decZero) + coalesce($"g", decZero)).as("wgt"))
          .localCheckpoint()
        // 1-row bounded collects per round (the Bpe merge-table class):
        // the pocket needs the per-class error counts ON THE DRIVER to
        // pick which round's frame the train/score entries serve
        val Array(ep, en) = errs
          .agg(coalesce(sum(when($"y" === 1L, 1L).otherwise(0L)), lit(0L)).as("ep"),
            coalesce(sum(when($"y" === 1L, 0L).otherwise(1L)), lit(0L)).as("en"))
          .collect().head match {
          case r => Array(r.getLong(0), r.getLong(1))
        }
        bmass += BigInt(ep) * BigInt(nNeg) + BigInt(en) * BigInt(nPos)
        curve += Seq((k.toLong, ep + en, ep, en, grad.count()))
          .toDF("round", "errors", "errors_pos", "errors_neg", "updated")
      }
      // pocket (Gallant 1990): serve the round with the smallest BALANCED
      // error mass (ties → earliest). er_k scored w_{k-1}, so the winner
      // is ws(k*−1); plain error count would pick the degenerate
      // all-negative model whenever the classes are this imbalanced
      val kStar = bmass.zipWithIndex.minBy { case (b, i) => (b, i) }._2 + 1
      (ws(kStar - 1), curve.result().reduce(_ unionByName _))
    })

  /** The trained linear model — the POCKET round's weight table (Gallant,
    * IEEE TNN 1990: on non-separable data the raw perceptron ends wherever
    * its limit cycle happens to stop, so serve the best round instead).
    * "Best" is the smallest balanced error mass ep·n_neg + en·n_pos — the
    * integer cross-multiplied form of the balanced error rate, which under
    * class imbalance is the criterion that does NOT hand the win to the
    * degenerate all-negative model (measured: plain error count does). */
  def pcpTrain(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    pcpModel(spark, sfDir)._1
      .select($"bucket", $"wgt".cast(LongType).as("wgt"))
  }

  /** The training curve: per round, how many documents the CURRENT model
    * misclassifies and how many buckets the batch update touches — the
    * table a curation run reads to size [[pcpRounds]] (and to see
    * non-separable oscillation instead of guessing at it). */
  def pcpCurve(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    pcpModel(spark, sfDir)._2
  }

  /** Apply the trained model: per-doc margin Σ x̂·w and the keep gate
    * (margin > 0 — the training rule's own sign convention, so "keep"
    * means "the model calls it a positive exemplar"). Same broadcast-join
    * + map-side fold plan as [[nbScore]]. The BIGINT margin wraps only
    * past ~10¹¹ docs × full imbalance — the [[weightExpr]] ceiling class,
    * same guard story. */
  def pcpScore(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val w = pcpModel(spark, sfDir)._1
    pcpTf(spark, sfDir)
      .join(broadcast(w), Seq("bucket"), "left_outer")
      .withColumn("contrib",
        $"xf".cast(DecimalType(38, 0)) * coalesce($"wgt", decZero))
      .groupBy($"doc_id")
      .agg(sum($"contrib").as("m"))
      .select($"doc_id", $"m".cast(LongType).as("margin"), ($"m" > 0).as("keep"))
  }

  /** Oracle CTE chain: `pcp_tf`, then K unrolled MATERIALIZED rounds
    * (errors → gradient → weights; MATERIALIZED because each CTE is
    * consumed twice — inlining would replay the whole prefix 2^K times),
    * ending at `pcp_w$pcpRounds`. */
  private def pcpCtes: String = {
    val rounds = (1 to pcpRounds).map { k =>
      s""", pcp_er$k AS MATERIALIZED (
           SELECT doc_id, y FROM (
             SELECT t.doc_id, t.y,
                    SUM(CAST(t.xf AS HUGEINT) * COALESCE(w.wgt, 0)) AS m
             FROM pcp_tf t LEFT JOIN pcp_w${k - 1} w ON t.bucket = w.bucket
             GROUP BY 1, 2)
           WHERE (y = 1 AND m <= 0) OR (y = -1 AND m > 0)),
         pcp_gr$k AS MATERIALIZED (
           SELECT t.bucket,
                  SUM(CAST(t.y AS HUGEINT) * t.xf *
                      (CASE WHEN t.y = 1 THEN c.r ELSE $pcpQ END)) AS g
           FROM pcp_tf t JOIN pcp_er$k e ON t.doc_id = e.doc_id
           CROSS JOIN pcp_cls c
           GROUP BY 1),
         pcp_w$k AS MATERIALIZED (
           SELECT COALESCE(w.bucket, g.bucket) AS bucket,
                  COALESCE(w.wgt, 0) + COALESCE(g.g, 0) AS wgt
           FROM pcp_w${k - 1} w FULL OUTER JOIN pcp_gr$k g ON w.bucket = g.bucket)"""
    }.mkString
    val berRows = (1 to pcpRounds).map { k =>
      s"""SELECT $k AS k,
                 COALESCE(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END), 0) AS ep,
                 COALESCE(SUM(CASE WHEN y = 1 THEN 0 ELSE 1 END), 0) AS en
          FROM pcp_er$k"""
    }.mkString(" UNION ALL ")
    // the pocket winner serves w_{k*−1} (er_k scored w_{k-1}); each arm is
    // guarded by the scalar pick so exactly one branch survives
    val pocketArms = (1 to pcpRounds).map { k =>
      s"""SELECT bucket, wgt FROM pcp_w${k - 1}
          WHERE (SELECT k FROM pcp_pick) = $k"""
    }.mkString(" UNION ALL ")
    s""", pcp_tf0 AS MATERIALIZED (
         SELECT doc_id, bucket, COUNT(1) AS tf,
                MAX(CASE WHEN $nbPosPred THEN 1 ELSE -1 END) AS y
         FROM nb_t GROUP BY 1, 2),
       pcp_tf AS MATERIALIZED (
         SELECT doc_id, bucket,
                (tf * $pcpF) // SUM(tf) OVER (PARTITION BY doc_id) AS xf, y
         FROM pcp_tf0
         UNION ALL
         SELECT DISTINCT doc_id, CAST(-1 AS BIGINT) AS bucket,
                CAST($pcpF AS BIGINT) AS xf, y
         FROM pcp_tf0),
       pcp_cls AS MATERIALIZED (
         SELECT n_pos, n_neg,
                CASE WHEN n_pos = 0 THEN 0
                     ELSE (n_neg * $pcpQ) // n_pos END AS r
         FROM (SELECT SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS n_pos,
                      SUM(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS n_neg
               FROM (SELECT DISTINCT doc_id, y FROM pcp_tf))),
       pcp_w0 AS (SELECT CAST(NULL AS BIGINT) AS bucket,
                         CAST(0 AS HUGEINT) AS wgt WHERE FALSE)""" + rounds +
      s""", pcp_ber AS MATERIALIZED (
         SELECT b.k, b.ep, b.en,
                CAST(b.ep AS HUGEINT) * c.n_neg
                  + CAST(b.en AS HUGEINT) * c.n_pos AS bmass
         FROM ($berRows) b CROSS JOIN pcp_cls c),
       pcp_pick AS MATERIALIZED (
         SELECT k FROM pcp_ber ORDER BY bmass, k LIMIT 1),
       pcp_wbest AS MATERIALIZED ($pocketArms)"""
  }

  val pcpTrainOracle: String = Fixtures.oracle(nbCtes + pcpCtes +
    """
     SELECT bucket, CAST(wgt AS BIGINT) AS wgt FROM pcp_wbest""")

  val pcpCurveOracle: String = Fixtures.oracle(nbCtes + pcpCtes +
    """
     SELECT CAST(k AS BIGINT) AS round,
            CAST(ep + en AS BIGINT) AS errors,
            CAST(ep AS BIGINT) AS errors_pos,
            CAST(en AS BIGINT) AS errors_neg,
            CASE k """ +
    (1 to pcpRounds).map { k =>
      s"WHEN $k THEN (SELECT COUNT(1) FROM pcp_gr$k)"
    }.mkString(" ") +
    """ END AS updated
     FROM pcp_ber""")

  val pcpScoreOracle: String = Fixtures.oracle(nbCtes + pcpCtes +
    """
     SELECT t.doc_id,
            CAST(SUM(CAST(t.xf AS HUGEINT) * COALESCE(w.wgt, 0)) AS BIGINT)
              AS margin,
            SUM(CAST(t.xf AS HUGEINT) * COALESCE(w.wgt, 0)) > 0 AS keep
     FROM pcp_tf t LEFT JOIN pcp_wbest w ON t.bucket = w.bucket
     GROUP BY 1""")

  // =====================================================================
  // Evaluation surface: threshold sweep over both models' margins
  // =====================================================================

  /** Threshold count for the PR sweep: the margin range splits into
    * prThresholds integer levels (min + i·(max−min) DIV prThresholds). */
  private[queries] val prThresholds = 8

  /** Precision/recall table over margin thresholds for BOTH trained
    * models, against the training supervision — the operating-point
    * picker a curation run reads instead of shipping the models' default
    * `margin > 0` gate blind (under 9:1 imbalance the default sits at
    * wildly different precision for the two models; this table makes the
    * trade a number at 8 operating points each).
    *
    * Everything is exact integer arithmetic: thresholds are integer
    * splits of the [min, max] margin range (1-row broadcast), the
    * confusion counts are integer aggregates, precision/recall are
    * basis-point cross-multiplications with zero-denominator guards —
    * so the sweep is hash-gateable like everything else in the family.
    *
    * Scale shape: each model contributes one margins frame (the same
    * broadcast-join plan its score entry runs), a 1-row min/max
    * aggregate, and ONE pass over docs × prThresholds broadcast
    * threshold rows folded by a map-side-combined aggregate — O(corpus)
    * per model, threshold count fixed. */
  def marginPr(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val labels = spark.table("documents")
      .select($"doc_id", expr(nbPosPred).as("pos"))
    def sweep(tag: String, margins: DataFrame): DataFrame = {
      // eagerly materialized, same reason as the calibration arm: the
      // threshold grid needs a min/max pass BEFORE the sweep aggregate, so
      // the score-join subtree otherwise executes twice per arm per run
      val m = margins.join(labels, Seq("doc_id")).localCheckpoint(true)
      val mm = m.agg(min($"margin").as("mn"), max($"margin").as("mx"))
      val thr = mm.select(explode(sequence(lit(0), lit(prThresholds - 1))).as("i"),
        $"mn", $"mx")
        .select($"i".cast(LongType).as("i"),
          expr(s"mn + i * (mx - mn) DIV $prThresholds").as("t"))
      m.crossJoin(broadcast(thr))
        .groupBy($"i", $"t")
        .agg(
          sum(when($"margin" > $"t" && $"pos", 1L).otherwise(0L)).as("tp"),
          sum(when($"margin" > $"t" && !$"pos", 1L).otherwise(0L)).as("fp"),
          sum(when($"margin" <= $"t" && $"pos", 1L).otherwise(0L)).as("fn"),
          sum(when($"margin" <= $"t" && !$"pos", 1L).otherwise(0L)).as("tn"))
        .select(lit(tag).as("model"), $"i".as("level"), $"t".as("threshold"),
          $"tp", $"fp", $"fn", $"tn",
          expr("CASE WHEN tp + fp = 0 THEN NULL ELSE tp * 10000 DIV (tp + fp) END")
            .as("precision_bp"),
          expr("CASE WHEN tp + fn = 0 THEN NULL ELSE tp * 10000 DIV (tp + fn) END")
            .as("recall_bp"))
    }
    sweep("nb", nbScore(spark, sfDir).select($"doc_id", $"margin_bp".as("margin")))
      .unionByName(sweep("percep",
        pcpScore(spark, sfDir).select($"doc_id", $"margin")))
  }

  /** One PR-sweep oracle arm over a margins CTE `(doc_id, margin)`. */
  private def prArmCtes(tag: String, marginsCte: String): String =
    s""", pr_m_$tag AS MATERIALIZED (
         SELECT m.doc_id, m.margin, $nbPosPred AS pos
         FROM ($marginsCte) m
         JOIN documents d ON d.doc_id = m.doc_id),
       pr_mm_$tag AS (SELECT MIN(margin) AS mn, MAX(margin) AS mx FROM pr_m_$tag),
       pr_thr_$tag AS (
         SELECT CAST(u.i AS BIGINT) AS i,
                mm.mn + u.i * (mm.mx - mm.mn) // $prThresholds AS t
         FROM pr_mm_$tag mm, UNNEST(range($prThresholds)) AS u(i)),
       pr_$tag AS (
         SELECT '$tag' AS model, th.i AS level, th.t AS threshold,
                SUM(CASE WHEN m.margin > th.t AND m.pos THEN 1 ELSE 0 END) AS tp,
                SUM(CASE WHEN m.margin > th.t AND NOT m.pos THEN 1 ELSE 0 END) AS fp,
                SUM(CASE WHEN m.margin <= th.t AND m.pos THEN 1 ELSE 0 END) AS fn,
                SUM(CASE WHEN m.margin <= th.t AND NOT m.pos THEN 1 ELSE 0 END) AS tn
         FROM pr_m_$tag m CROSS JOIN pr_thr_$tag th
         GROUP BY 1, 2, 3)"""

  val marginPrOracle: String = Fixtures.oracle(nbCtes + pcpCtes +
    prArmCtes("nb",
      s"""SELECT g.doc_id,
                 ${truncDiv("SUM(w.weight_bp - 10000)", "COUNT(1)")} AS margin
          FROM nb_t g JOIN nb_w w ON g.bucket = w.bucket
          GROUP BY 1""") +
    prArmCtes("percep",
      s"""SELECT t.doc_id,
                 CAST(SUM(CAST(t.xf AS HUGEINT) * COALESCE(w.wgt, 0)) AS BIGINT)
                   AS margin
          FROM pcp_tf t LEFT JOIN pcp_wbest w ON t.bucket = w.bucket
          GROUP BY 1""") +
    """
     SELECT model, CAST(level AS BIGINT) AS level,
            CAST(threshold AS BIGINT) AS threshold,
            CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
            CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
            CAST(CASE WHEN tp + fp = 0 THEN NULL
                      ELSE tp * 10000 // (tp + fp) END AS BIGINT) AS precision_bp,
            CAST(CASE WHEN tp + fn = 0 THEN NULL
                      ELSE tp * 10000 // (tp + fn) END AS BIGINT) AS recall_bp
     FROM (SELECT * FROM pr_nb UNION ALL SELECT * FROM pr_percep)""")

  // =====================================================================
  // Calibration: histogram binning (Zadrozny & Elkan, ICML'01) over both
  // models' margins
  // =====================================================================

  /** Equal-width margin bins for the calibration table. */
  private[queries] val calBins = 8

  /** The calibration table for BOTH models — histogram binning: split the
    * observed margin range into [[calBins]] equal-width bins, and per bin
    * report the OBSERVED positive rate, which IS the calibrated
    * probability a raw margin in that bin maps to (Zadrozny & Elkan's
    * histogram method — the simplest published calibrator, and the one
    * that needs no sequential pass, unlike isotonic/PAV). A raw margin is
    * not a probability: the PR sweep ([[marginPr]]) picks an operating
    * POINT, this table turns every score into an expected-quality NUMBER —
    * what a mixture sampler needs when it weights documents by quality
    * instead of thresholding them.
    *
    * Exactness: bins are integer splits of [mn, mx] (width w = mx−mn+1;
    * bin = (margin−mn)·B DIV w, always in [0, B−1]); rates are
    * basis-point integer divisions. Wraps only if the margin RANGE
    * exceeds 2⁶⁰ — the same weight-ceiling class the score entries
    * document.
    *
    * Scale shape per model: the margins frame (the score entry's own
    * broadcast-join plan), a 1-row min/width broadcast, and ONE
    * map-side-combined aggregate keyed by the ≤[[calBins]] bin ids. */
  def calibration(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val labels = spark.table("documents")
      .select($"doc_id", expr(nbPosPred).as("pos"))
    def arm(tag: String, margins: DataFrame): DataFrame = {
      // eagerly materialized (the evalMrr arm-list discipline): the bin
      // range needs a min/max pass BEFORE the binning aggregate, so the
      // score-join subtree otherwise executes twice per arm per run; the
      // frame is one narrow row per doc (the score entry's own output size)
      val m = margins.join(labels, Seq("doc_id")).localCheckpoint(true)
      val mm = m.agg(min($"margin").as("mn"),
        (max($"margin") - min($"margin") + lit(1L)).as("w"))
      m.crossJoin(broadcast(mm))
        .groupBy(expr(s"(margin - mn) * $calBins DIV w").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min($"margin").as("margin_min"), max($"margin").as("margin_max"),
          sum(when($"pos", 1L).otherwise(0L)).as("n_pos"))
        .select(lit(tag).as("model"), $"bin", $"n_docs",
          $"margin_min", $"margin_max", $"n_pos",
          expr("n_pos * 10000 DIV n_docs").as("pos_rate_bp"))
    }
    arm("nb", nbScore(spark, sfDir)
        .select($"doc_id", $"margin_bp".cast(LongType).as("margin")))
      .unionByName(arm("percep",
        pcpScore(spark, sfDir).select($"doc_id", $"margin")))
  }

  /** One calibration oracle arm over a margins CTE `(doc_id, margin)`. */
  private def calArmCtes(tag: String, marginsCte: String): String =
    s""", cal_m_$tag AS MATERIALIZED (
         SELECT m.doc_id, CAST(m.margin AS BIGINT) AS margin, $nbPosPred AS pos
         FROM ($marginsCte) m
         JOIN documents d ON d.doc_id = m.doc_id),
       cal_mm_$tag AS (
         SELECT MIN(margin) AS mn, MAX(margin) - MIN(margin) + 1 AS w
         FROM cal_m_$tag),
       cal_$tag AS (
         SELECT '$tag' AS model,
                (m.margin - mm.mn) * $calBins // mm.w AS bin,
                COUNT(1) AS n_docs,
                MIN(m.margin) AS margin_min, MAX(m.margin) AS margin_max,
                SUM(CASE WHEN m.pos THEN 1 ELSE 0 END) AS n_pos
         FROM cal_m_$tag m CROSS JOIN cal_mm_$tag mm
         GROUP BY 1, 2)"""

  val calibrationOracle: String = Fixtures.oracle(nbCtes + pcpCtes +
    calArmCtes("nb",
      s"""SELECT g.doc_id,
                 ${truncDiv("SUM(w.weight_bp - 10000)", "COUNT(1)")} AS margin
          FROM nb_t g JOIN nb_w w ON g.bucket = w.bucket
          GROUP BY 1""") +
    calArmCtes("percep",
      s"""SELECT t.doc_id,
                 CAST(SUM(CAST(t.xf AS HUGEINT) * COALESCE(w.wgt, 0)) AS BIGINT)
                   AS margin
          FROM pcp_tf t LEFT JOIN pcp_wbest w ON t.bucket = w.bucket
          GROUP BY 1""") +
    """
     SELECT model, CAST(bin AS BIGINT) AS bin,
            CAST(n_docs AS BIGINT) AS n_docs,
            CAST(margin_min AS BIGINT) AS margin_min,
            CAST(margin_max AS BIGINT) AS margin_max,
            CAST(n_pos AS BIGINT) AS n_pos,
            CAST(n_pos * 10000 // n_docs AS BIGINT) AS pos_rate_bp
     FROM (SELECT * FROM cal_nb UNION ALL SELECT * FROM cal_percep)""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "classifier_nb_train" -> (nbTrain _),
    "classifier_nb_score" -> (nbScore _),
    "classifier_percep_train" -> (pcpTrain _),
    "classifier_percep_curve" -> (pcpCurve _),
    "classifier_percep_score" -> (pcpScore _),
    "classifier_margin_pr" -> (marginPr _),
    "classifier_calibration" -> (calibration _))

  val oracles: Map[String, String] = Map(
    "classifier_nb_train" -> nbTrainOracle,
    "classifier_nb_score" -> nbScoreOracle,
    "classifier_percep_train" -> pcpTrainOracle,
    "classifier_percep_curve" -> pcpCurveOracle,
    "classifier_percep_score" -> pcpScoreOracle,
    "classifier_margin_pr" -> marginPrOracle,
    "classifier_calibration" -> calibrationOracle)
}
