package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** Conversion analytics and training-example assembly over the event
  * stream: multi-touch attribution, a deterministic A/B comparison,
  * point-in-time feature assembly, out-of-fold target encoding, and the
  * SCD2 dimension-history build — the reports a growth/ML team runs on
  * the same events table the rest of the catalog rolls up.
  *
  * Exactness model ([[Sessions.ewmaTrend]] mold): each entry's oracle is
  * ONE SQL text parameterized only by the integer-division spelling, so
  * DuckDB replays the computation verbatim and the gate is a true
  * bit-equality check. Where the literal SQL spelling would plan badly in
  * Spark (attribution's UNION-ALL arms re-running the lag window), the
  * served side re-expresses the SAME definition in the DataFrame API and
  * the re-gate proves value equality.
  */
object Insights {

  /** Attribution lookback: credit the (up to) 8 same-user events preceding
    * each conversion, cut at the previous conversion. A FIXED lag depth —
    * like [[Sessions.ewmaTrend]]'s 16-term chain — keeps the window state
    * bounded per task at any corpus size (no unbounded
    * rows-between-preceding frames). */
  private val lookback = 8

  /** Multi-touch attribution (Shapley-free classics): for every `purchase`,
    * the preceding [[lookback]] same-user events SINCE THE LAST PURCHASE
    * are its touchpoints, and each of the four standard credit models splits
    * the conversion's 10⁴ basis points across them:
    *
    *  - `last_touch`:  all credit to the most recent touch
    *  - `first_touch`: all credit to the earliest touch in the window
    *  - `linear`:      10⁴ DIV n to each touch, remainder (10⁴ MOD n) to
    *    the most recent — so every conversion's credit sums to EXACTLY 10⁴
    *    (the exactness the basis-point convention demands; a float split
    *    would leak ulps per conversion)
    *  - `time_decay`:  weight 2^-(steps back) per touch over the valid
    *    window's weight mass, floor-sum deficit to the most recent — the
    *    same exact-conservation discipline as linear's remainder
    *
    * Output per (model, channel): conversions touched, touch rows, total
    * credit. Conversions with no touch in the window (cut at lag 1 or no
    * history) simply assign no credit — visible as
    * n_conversions < the purchase count, not silently padded.
    *
    * Scale shape: the lag chain is ONE window pass over user partitions
    * (state = [[lookback]] strings per task); the credit arms EXPLODE from
    * that frame (one Generate over a 25-slot struct array — the SQL
    * UNION-ALL spelling the oracle replays would make Spark re-run the
    * window per arm, 17 partition sorts instead of 1; the explode form
    * keeps the executed plan at one Window + one Generate) and feed a
    * map-side-combined aggregate keyed by (model, channel) — 5 event
    * types × 4 models of groups. No self-joins, no global windows. */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val pc = spark.sql("WITH _one AS (SELECT 1)" + pcSql
      + " SELECT * FROM pc")
    val linearArms = (1 to lookback).map(i => expr(
      s"""CASE WHEN $i < cut AND t$i IS NOT NULL THEN named_struct(
            'model', 'linear', 'channel', t$i,
            'credit_bp', CAST(10000 AS BIGINT) DIV n
              + CASE WHEN $i = 1 THEN CAST(10000 AS BIGINT) % n
                     ELSE CAST(0 AS BIGINT) END) END"""))
    val lastArm = expr(
      """CASE WHEN n >= 1 THEN named_struct(
           'model', 'last_touch', 'channel', t1,
           'credit_bp', CAST(10000 AS BIGINT)) END""")
    val firstArms = (1 to lookback).map(i => expr(
      s"""CASE WHEN fpos = $i THEN named_struct(
            'model', 'first_touch', 'channel', t$i,
            'credit_bp', CAST(10000 AS BIGINT)) END"""))
    val decayArms = (1 to lookback).map(i => expr(
      s"""CASE WHEN $i < cut AND t$i IS NOT NULL THEN named_struct(
            'model', 'time_decay', 'channel', t$i,
            'credit_bp', (CAST(10000 AS BIGINT) * ${1L << (lookback - i)}) DIV tw
              + CASE WHEN $i = 1 THEN ${decayDeficit("DIV")}
                     ELSE CAST(0 AS BIGINT) END) END"""))
    pc.select($"seq", explode(array(
        linearArms ++ Seq(lastArm) ++ firstArms ++ decayArms: _*)).as("c"))
      .where($"c".isNotNull)
      .groupBy($"c.model".as("model"), $"c.channel".as("channel"))
      .agg(
        countDistinct($"seq").cast("long").as("n_conversions"),
        count(lit(1)).cast("long").as("n_touches"),
        sum($"c.credit_bp").cast("long").as("credit_bp_total"))
  }

  /** The shared lag-frame prefix (CTE-chain continuation): `pc` is one row
    * per purchase with its [[lookback]] lags, the previous-purchase cut,
    * the in-window touch count n and the earliest touch position fpos.
    * NULL-typed events are excluded at the source: the n/fpos arithmetic
    * relies on lag contiguity (lag i NULL ⇒ lag i+1 NULL), which only
    * holds when event_type itself is never NULL — untyped rows are not
    * touchpoints and not conversions. Division-free, so ONE text serves
    * both engines verbatim; it starts
    * mid-WITH so the oracle prelude's chain can absorb it (the Spark side
    * prepends a dummy head). */
  private def pcSql: String = {
    val lagCols = (1 to lookback).map(i =>
      s"LAG(event_type, $i) OVER w AS t$i").mkString(",\n              ")
    // first purchase among the lags bounds the window (9 = unbounded)
    val cutExpr = (1 to lookback).map(i =>
      s"WHEN t$i = 'purchase' THEN $i").mkString("CASE ", " ", " ELSE 9 END")
    // lags are contiguous (lag i NULL => lag i+1 NULL), so n is the count
    // of in-window non-null positions and position 1 is valid iff n >= 1
    val nExpr = (1 to lookback).map(i =>
      s"(CASE WHEN $i < cut AND t$i IS NOT NULL THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val firstPos = (1 to lookback).map(i =>
      s"CASE WHEN $i < cut AND t$i IS NOT NULL THEN $i ELSE 0 END")
      .mkString("GREATEST(", ", ", ")")
    // time-decay weight mass: w_i = 2^(lookback-i) halves per step back,
    // tw = sum over the valid window (division-free — the arms divide)
    val twExpr = (1 to lookback).map(i =>
      s"(CASE WHEN $i < cut AND t$i IS NOT NULL THEN ${1L << (lookback - i)} ELSE 0 END)")
      .mkString(" + ")
    s""", lagged AS (
         SELECT seq, event_type,
              $lagCols
         FROM (SELECT seq, user_id, event_type FROM raw
               WHERE event_type IS NOT NULL) e
         WINDOW w AS (PARTITION BY user_id ORDER BY seq)),
       pc AS (
         SELECT *, $nExpr AS n, $firstPos AS fpos, $twExpr AS tw
         FROM (SELECT *, $cutExpr AS cut
               FROM lagged WHERE event_type = 'purchase'))"""
  }

  /** The lookback knob PRICED: at window depths 2/4/8, how many
    * conversions get any credit (coverage), how many touchpoints the
    * window sees, and the mean touches per credited conversion — the
    * table that says what another doubling of [[lookback]] (and of
    * per-task window state) actually buys. All three depths project from
    * ONE pc frame (valid-at-depth-d is `i ≤ d AND i < cut AND tᵢ NOT
    * NULL`, so the depth-8 lag chain subsumes the shallower windows);
    * one window pass, one map-side aggregate, dialect-common text.
    *
    * Structural fact the curve makes visible: `credited` is
    * depth-INVARIANT — a conversion has a valid touch at any depth iff
    * its lag-1 is valid (contiguity + the cut both anchor at position 1) —
    * so deeper windows buy touch breadth (178 → 289 → 400 centi-touches
    * per credited conversion at sf0.01), never coverage. The knob prices
    * state against attribution granularity, not against reach. */
  private val curveDepths = Seq(2, 4, lookback)

  private def curveNd(d: Int): String = (1 to d).map(i =>
    s"(CASE WHEN $i < cut AND t$i IS NOT NULL THEN 1 ELSE 0 END)")
    .mkString("(", " + ", ")")

  def attributionCurve(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    // ONE aggregate over one pc pass computes every depth's counters (the
    // oracle's UNION-ALL spelling would re-run the lag window per depth);
    // the row-per-depth shape then explodes from the 1-row frame
    val pc = spark.sql("WITH _one AS (SELECT 1)" + pcSql
      + " SELECT * FROM pc")
    val aggs = count(lit(1)).as("conversions") +: curveDepths.flatMap { d =>
      Seq(
        sum(expr(s"CASE WHEN ${curveNd(d)} >= 1 THEN 1 ELSE 0 END")).as(s"cr_$d"),
        sum(expr(curveNd(d))).as(s"to_$d"))
    }
    pc.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(curveDepths.map { d =>
        struct(lit(d.toLong).as("depth"), col(s"cr_$d").as("credited"),
          col(s"to_$d").as("touches"))
      }: _*)).as("a"), $"conversions")
      .select($"a.depth".cast("long").as("depth"),
        $"a.credited".cast("long").as("credited"),
        $"a.touches".cast("long").as("touches"),
        expr("a.credited * 10000 DIV conversions").cast("long").as("coverage_bp"),
        expr("a.touches * 100 DIV GREATEST(a.credited, 1)").cast("long")
          .as("touches_per_credited_c"))
  }

  private def attributionCurveSql(div: String): String = {
    val arms = curveDepths.map { d =>
      s"""SELECT $d AS depth,
              SUM(CASE WHEN ${curveNd(d)} >= 1 THEN 1 ELSE 0 END) AS credited,
              SUM(${curveNd(d)}) AS touches,
              COUNT(1) AS conversions
          FROM pc"""
    }
    s"""$pcSql,
       ac AS (
          ${arms.mkString("\n          UNION ALL ")})
       SELECT CAST(depth AS BIGINT) AS depth,
              CAST(credited AS BIGINT) AS credited,
              CAST(touches AS BIGINT) AS touches,
              CAST(credited * 10000 $div conversions AS BIGINT) AS coverage_bp,
              CAST(touches * 100 $div GREATEST(credited, 1) AS BIGINT)
                AS touches_per_credited_c
       FROM ac"""
  }

  val attributionCurveOracle: String =
    Fixtures.oracle(attributionCurveSql("//"))

  /** Row-local floor-sum deficit of the time-decay split: 10⁴ minus the
    * sum of per-touch floors — added to the most-recent touch (valid
    * whenever n ≥ 1, by lag contiguity) so the decay model conserves the
    * conversion's 10⁴ exactly, like linear's MOD remainder. */
  private def decayDeficit(div: String): String =
    (1 to lookback).map(i =>
      s"(CASE WHEN $i < cut AND t$i IS NOT NULL THEN " +
        s"(CAST(10000 AS BIGINT) * ${1L << (lookback - i)}) $div tw ELSE 0 END)")
      .mkString("(CAST(10000 AS BIGINT) - (", " + ", "))")

  /** The full oracle text: [[pcSql]] + the credit arms as UNION ALL (the
    * replayable spelling; the Spark side explodes instead — see
    * [[attribution]]). */
  private def attributionSql(div: String): String = {
    val decayArms = (1 to lookback).map(i =>
      s"""SELECT seq, 'time_decay' AS model, t$i AS channel,
              (CAST(10000 AS BIGINT) * ${1L << (lookback - i)}) $div tw
                + CASE WHEN $i = 1 THEN ${decayDeficit(div)} ELSE 0 END AS credit_bp
          FROM pc WHERE $i < cut AND t$i IS NOT NULL""")
    val linearArms = (1 to lookback).map(i =>
      s"""SELECT seq, 'linear' AS model, t$i AS channel,
              CAST(10000 AS BIGINT) $div n
                + CASE WHEN $i = 1 THEN CAST(10000 AS BIGINT) % n ELSE 0 END AS credit_bp
          FROM pc WHERE $i < cut AND t$i IS NOT NULL""")
    val lastArm =
      s"""SELECT seq, 'last_touch' AS model, t1 AS channel,
              CAST(10000 AS BIGINT) AS credit_bp
          FROM pc WHERE n >= 1"""
    val firstArms = (1 to lookback).map(i =>
      s"""SELECT seq, 'first_touch' AS model, t$i AS channel,
              CAST(10000 AS BIGINT) AS credit_bp
          FROM pc WHERE fpos = $i""")
    val arms = (linearArms ++ Seq(lastArm) ++ firstArms ++ decayArms)
      .mkString("\n          UNION ALL ")
    s"""$pcSql,
       credits AS (
          $arms)
       SELECT model, channel,
              CAST(COUNT(DISTINCT seq) AS BIGINT) AS n_conversions,
              CAST(COUNT(1) AS BIGINT) AS n_touches,
              CAST(SUM(credit_bp) AS BIGINT) AS credit_bp_total
       FROM credits
       GROUP BY model, channel"""
  }

  val attributionOracle: String = Fixtures.oracle(attributionSql("//"))

  /** Deterministic A/B comparison: users split by parity (variant A =
    * even user_id, B = odd — a hash split is the production form; parity
    * is its oracle-replayable stand-in), metric = per-user purchase rate
    * in basis points. Reports both group means, the lift, and a Welch-style
    * z statistic in milli-units — all EXACT integer arithmetic:
    *
    *  - rate_bp  = purchases · 10⁴ DIV events (per user)
    *  - mean_bp  = Σrate DIV n (per variant)
    *  - var      = (n·Σrate² − (Σrate)²) DIV n² (population variance, floor)
    *  - z_milli  = sign(lift) · |lift| · 10³ DIV isqrt(varA DIV nA
    *               + varB DIV nB + 1)  — the +1 guards the degenerate
    *    zero-variance corpus, and the SIGN SPLIT keeps both engines on
    *    positive-operand division (Spark's DIV truncates toward zero,
    *    DuckDB's // floors: they disagree on negatives).
    *
    * Scale shape: one map-side-combined per-user aggregate, then a 2-group
    * aggregate folded to one row — no windows, no joins. */
  def abLift(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    spark.sql("WITH _one AS (SELECT 1)" + abLiftSql("DIV", "DECIMAL(38,0)"))
  }

  private def abLiftSql(div: String, wide: String): String = {
    // GREATEST(n, 1) guards the degenerate single-parity batch (an empty
    // variant reads mean/var 0 instead of erroring under ANSI division).
    // The s/q accumulators and the n² denominator run in `wide` lanes
    // (DECIMAL(38,0) on Spark, HUGEINT in the oracle, the nbScore/pcp
    // discipline): q ≤ n·10⁸ so n·q and s² pass int64 at ~3·10⁵ users per
    // variant — inside any real corpus — and the engines diverge on wrap
    // (Spark ANSI errors, DuckDB HUGEINT keeps going). Wide lanes stay
    // exact to 10³⁸, i.e. ~10¹⁵ users per variant.
    val se2 = s"(var_a $div GREATEST(n_a, 1) + var_b $div GREATEST(n_b, 1) + 1)"
    val isq = Sampling.isqrtSql(se2)
    s""", ur AS (
         SELECT user_id % 2 AS variant,
                SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  * CAST(10000 AS BIGINT) $div COUNT(1) AS rate_bp
         FROM raw GROUP BY user_id),
       g AS (
         SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                SUM(CAST(CASE WHEN variant = 0 THEN rate_bp ELSE 0 END AS $wide)) AS s_a,
                SUM(CAST(CASE WHEN variant = 1 THEN rate_bp ELSE 0 END AS $wide)) AS s_b,
                SUM(CAST(CASE WHEN variant = 0 THEN rate_bp * rate_bp ELSE 0 END AS $wide)) AS q_a,
                SUM(CAST(CASE WHEN variant = 1 THEN rate_bp * rate_bp ELSE 0 END AS $wide)) AS q_b
         FROM ur),
       m AS (
         SELECT n_a, n_b,
                s_a $div GREATEST(n_a, 1) AS mean_a_bp,
                s_b $div GREATEST(n_b, 1) AS mean_b_bp,
                (n_a * q_a - s_a * s_a) $div GREATEST(CAST(n_a AS $wide) * n_a, 1) AS var_a,
                (n_b * q_b - s_b * s_b) $div GREATEST(CAST(n_b AS $wide) * n_b, 1) AS var_b
         FROM g)
       SELECT n_a, n_b,
              CAST(mean_a_bp AS BIGINT) AS mean_a_bp,
              CAST(mean_b_bp AS BIGINT) AS mean_b_bp,
              CAST(mean_b_bp - mean_a_bp AS BIGINT) AS lift_bp,
              CAST(CASE WHEN mean_b_bp >= mean_a_bp THEN 1 ELSE -1 END
                   * (ABS(mean_b_bp - mean_a_bp) * CAST(1000 AS BIGINT) $div $isq)
                   AS BIGINT) AS z_milli
       FROM m"""
  }

  val abLiftOracle: String = Fixtures.oracle(abLiftSql("//", "HUGEINT"))

  /** Point-in-time training-example assembly (the feature-store
    * "time-travel join" discipline): one row per `purchase` with features
    * computed STRICTLY BEFORE the label row — prior event count, prior
    * spend, prior purchases, last event type — and a repurchase label from
    * the events strictly after. Leakage-free by frame construction:
    * `ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING` can never see the
    * label row, and the label arm subtracts the inclusive prefix from the
    * user total, so no feature column reads the future and no label column
    * reads the past.
    *
    * Scale shape: ONE user-partitioned window pass (running COUNT/SUM
    * frames carry O(1) state per task — Spark never buffers the frame for
    * distributive aggregates) plus a same-partitioning total (no second
    * exchange). Output is the purchase subset — the training matrix a
    * propensity model consumes. */
  def featureMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    spark.sql("WITH _one AS (SELECT 1)" + featureMatrixSql)
  }

  /** Dialect-common (no integer-division needed). */
  private val featureMatrixSql: String =
    s""", fm AS (
         SELECT seq, user_id, event_type,
                COUNT(1) OVER wp AS f_prior_events,
                SUM(cents) OVER wp AS f_prior_spend_c,
                SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER wp AS f_prior_purchases,
                LAG(event_type) OVER wo AS f_last_type,
                SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id) AS user_purchases
         FROM raw
         WINDOW wp AS (PARTITION BY user_id ORDER BY seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                wo AS (PARTITION BY user_id ORDER BY seq))
       SELECT seq, user_id,
              CAST(f_prior_events AS BIGINT) AS f_prior_events,
              CAST(COALESCE(f_prior_spend_c, 0) AS BIGINT) AS f_prior_spend_c,
              CAST(COALESCE(f_prior_purchases, 0) AS BIGINT) AS f_prior_purchases,
              COALESCE(f_last_type, 'none') AS f_last_type,
              CAST(CASE WHEN user_purchases - COALESCE(f_prior_purchases, 0) - 1 > 0
                   THEN 1 ELSE 0 END AS BIGINT) AS label_repurchase
       FROM fm WHERE event_type = 'purchase'"""

  val featureMatrixOracle: String = Fixtures.oracle(featureMatrixSql)

  /** Smoothing pseudo-count for [[targetEncode]]: the encoding shrinks
    * toward the global prior by m virtual rows — the additive-smoothing
    * form of Micci-Barreca (SIGKDD Expl. 2001). */
  private val teM = 100

  /** Leakage-free target encoding of a high-cardinality categorical (the
    * dollar bucket, cents DIV 100 — ~560 levels): per (category, fold) the
    * OUT-OF-FOLD purchase rate, smoothed toward the global prior with
    * [[teM]] pseudo-counts:
    *
    *   enc_bp = (pos_oof·10⁴ + m·prior_bp) DIV (n_oof + m)
    *
    * A training row in fold f reads enc(cat, f), which was computed
    * WITHOUT fold f's rows — the standard cross-fold construction that
    * keeps the encoding from memorizing its own labels. All-integer: rates
    * in basis points, division floors identically on both engines
    * (positive operands throughout).
    *
    * Scale shape: one map-side-combined (category, fold) aggregate, then
    * category-partitioned windows over the ~560×5-row frame — corpus size
    * touches only the first pass. */
  def targetEncode(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    spark.sql("WITH _one AS (SELECT 1)" + targetEncodeSql("DIV"))
  }

  private def targetEncodeSql(div: String): String =
    s""", te_g AS (
         SELECT cents $div 100 AS cat, seq % 5 AS fold,
                COUNT(1) AS n,
                SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
         FROM raw GROUP BY cents $div 100, seq % 5),
       te_w AS (
         SELECT cat, fold, n, pos,
                SUM(n) OVER (PARTITION BY cat) - n AS n_oof,
                SUM(pos) OVER (PARTITION BY cat) - pos AS pos_oof,
                SUM(pos) OVER () * CAST(10000 AS BIGINT) $div SUM(n) OVER () AS prior_bp
         FROM te_g)
       SELECT CAST(cat AS BIGINT) AS cat, CAST(fold AS BIGINT) AS fold,
              CAST(n_oof AS BIGINT) AS n_oof,
              CAST(prior_bp AS BIGINT) AS prior_bp,
              CAST((pos_oof * CAST(10000 AS BIGINT) + $teM * prior_bp)
                   $div (n_oof + $teM) AS BIGINT) AS enc_bp
       FROM te_w"""

  val targetEncodeOracle: String = Fixtures.oracle(targetEncodeSql("//"))

  /** The leakage gap PRICED (why [[targetEncode]] is out-of-fold): score
    * every event's own label against two encoders of its (category, fold) —
    * the shipped out-of-fold one, and the LEAKY in-fold one a naive
    * implementation would use (the full-category rate, which saw the row's
    * own label). Per fold: mean |label − enc| in basis points under both,
    * and the optimism gap (leaky error minus honest error — negative,
    * because memorizing your own labels always LOOKS better). A pipeline
    * reads this row to know how much of a naive encoder's apparent lift is
    * leakage, the same way the recall ladder prices encoding choices.
    *
    * Scale shape: the (category, fold) encoder frame is category-bounded
    * (never corpus-sized) and joins back to the corpus on its grouping
    * key — BROADCAST-hinted, since the frame is provably bounded by the
    * category grid (~560×5 rows) while Catalyst's post-window size
    * estimate turns pessimistic at scale (the 100× soak read a 47 MB
    * corpus-side shuffle before the hint, zero after); one scan of events
    * on each side of the join, map-side-combined per-fold fold. The hint
    * is a comment to DuckDB, so the shared text stays verbatim.
    * All-integer (positive operands). */
  def teLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    spark.sql("WITH _one AS (SELECT 1)" + teLeakageSql("DIV"))
  }

  private def teLeakageSql(div: String): String =
    s""", tl_g AS (
         SELECT cents $div 100 AS cat, seq % 5 AS fold,
                COUNT(1) AS n,
                SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
         FROM raw GROUP BY cents $div 100, seq % 5),
       tl_w AS (
         SELECT cat, fold, n, pos,
                SUM(n) OVER (PARTITION BY cat) AS n_cat,
                SUM(pos) OVER (PARTITION BY cat) AS pos_cat,
                SUM(pos) OVER () * CAST(10000 AS BIGINT) $div SUM(n) OVER () AS prior_bp
         FROM tl_g),
       tl_enc AS (
         SELECT cat, fold,
                ((pos_cat - pos) * CAST(10000 AS BIGINT) + $teM * prior_bp)
                  $div (n_cat - n + $teM) AS enc_oof,
                (pos_cat * CAST(10000 AS BIGINT) + $teM * prior_bp)
                  $div (n_cat + $teM) AS enc_in
         FROM tl_w),
       tl_ev AS (
         SELECT cents $div 100 AS cat, seq % 5 AS fold,
                CASE WHEN event_type = 'purchase'
                     THEN CAST(10000 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
         FROM raw)
       SELECT /*+ BROADCAST(c) */ e.fold AS fold,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(ABS(e.y - c.enc_oof)) $div COUNT(1) AS BIGINT) AS mae_oof_bp,
              CAST(SUM(ABS(e.y - c.enc_in)) $div COUNT(1) AS BIGINT) AS mae_in_bp,
              CAST(SUM(ABS(e.y - c.enc_in)) $div COUNT(1)
                   - SUM(ABS(e.y - c.enc_oof)) $div COUNT(1) AS BIGINT) AS optimism_bp
       FROM tl_ev e JOIN tl_enc c ON e.cat = c.cat AND e.fold = c.fold
       GROUP BY e.fold"""

  val teLeakageOracle: String = Fixtures.oracle(teLeakageSql("//"))

  /** SCD2 dimension history (the slowly-changing-dimension type-2 build
    * every warehouse runs nightly): per user, the DAILY activity tier
    * (low/mid/high by fixed event-count thresholds) compressed into
    * validity intervals by the gaps-and-islands construction — a change
    * flag from LAG, a running island id from its prefix sum, one group per
    * island. Output: (user, tier, day_from, day_to, n_days, is_current),
    * where is_current marks the interval touching the user's last observed
    * day. Days with no events do not close an interval (observed-day
    * contiguity — the standard SCD2 "valid until superseded" reading).
    *
    * Scale shape: one map-side-combined (user, day) aggregate, then
    * user-partitioned windows over the per-day frame (≤ days rows per
    * user) and a final (user, island) aggregate — never a global window,
    * never a join. */
  def scd2Tiers(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    spark.sql("WITH _one AS (SELECT 1)" + scd2Sql("DIV"))
  }

  private def scd2Sql(div: String): String =
    s""", s2_ud AS (
         SELECT user_id, (block_number - 1000) * 120 $div 86400 AS day,
                COUNT(1) AS n
         FROM raw
         GROUP BY user_id, (block_number - 1000) * 120 $div 86400),
       s2_t AS (
         SELECT user_id, day,
                CASE WHEN n >= 8 THEN 'high'
                     WHEN n >= 4 THEN 'mid' ELSE 'low' END AS tier
         FROM s2_ud),
       s2_c AS (
         SELECT *, CASE WHEN LAG(tier) OVER w IS NULL
                          OR LAG(tier) OVER w <> tier THEN 1 ELSE 0 END AS chg
         FROM s2_t
         WINDOW w AS (PARTITION BY user_id ORDER BY day)),
       s2_i AS (
         SELECT *,
                SUM(chg) OVER (PARTITION BY user_id ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS island,
                MAX(day) OVER (PARTITION BY user_id) AS last_day
         FROM s2_c)
       SELECT user_id, tier,
              CAST(MIN(day) AS BIGINT) AS day_from,
              CAST(MAX(day) AS BIGINT) AS day_to,
              CAST(COUNT(1) AS BIGINT) AS n_days,
              CAST(CASE WHEN MAX(day) = MAX(last_day) THEN 1 ELSE 0 END
                   AS BIGINT) AS is_current
       FROM s2_i
       GROUP BY user_id, tier, island"""

  val scd2Oracle: String = Fixtures.oracle(scd2Sql("//"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_attribution" -> (attribution _),
    "events_ab_lift" -> (abLift _),
    "events_feature_matrix" -> (featureMatrix _),
    "events_target_encode" -> (targetEncode _),
    "events_te_leakage" -> (teLeakage _),
    "events_attribution_curve" -> (attributionCurve _),
    "events_scd2_tiers" -> (scd2Tiers _))

  val oracles: Map[String, String] = Map(
    "events_attribution" -> attributionOracle,
    "events_ab_lift" -> abLiftOracle,
    "events_feature_matrix" -> featureMatrixOracle,
    "events_target_encode" -> targetEncodeOracle,
    "events_te_leakage" -> teLeakageOracle,
    "events_attribution_curve" -> attributionCurveOracle,
    "events_scd2_tiers" -> scd2Oracle)
}
