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
    """
       SELECT g.doc_id, COUNT(1) AS n_tokens,
              CAST(SUM(w.weight_bp - 10000) // COUNT(1) AS BIGINT) AS margin_bp,
              SUM(w.weight_bp - 10000) > 0 AS keep
       FROM nb_t g JOIN nb_w w ON g.bucket = w.bucket
       GROUP BY 1""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "classifier_nb_train" -> (nbTrain _),
    "classifier_nb_score" -> (nbScore _))

  val oracles: Map[String, String] = Map(
    "classifier_nb_train" -> nbTrainOracle,
    "classifier_nb_score" -> nbScoreOracle)
}
