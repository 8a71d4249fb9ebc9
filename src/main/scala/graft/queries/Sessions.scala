package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures

/** Stream analytics over the raw `events` table itself: gap-based
  * sessionization and per-user daily tumbling windows (W3/T7 over the
  * driver corpus' stream-shaped table).
  *
  * Times are handled as epoch seconds derived from the deterministic
  * event-id clock (`ts` itself is nanos-typed and dialect-risky); the
  * session grid uses the same 120 s block spacing as the fixtures.
  */
object Sessions {

  /** Gap-based sessionization: a new session starts when a user is idle
    * > 30 virtual minutes; per-session event count, value sum, duration. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    // deterministic per-event clock (same derivation as fixtures.ek)
    val evts = spark.table("ek")
      .select($"user_id", $"seq", $"btime".as("t"),
        $"cents".cast(DecimalType(18, 0)).as("cents"))

    val w = Window.partitionBy($"user_id").orderBy($"seq")
    val sessions = evts
      .withColumn("prev_t", lag($"t", 1).over(w))
      .withColumn("new_session",
        when($"prev_t".isNull || $"t" - $"prev_t" > 1800, 1L).otherwise(0L))
      .withColumn("session_no",
        sum($"new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    sessions
      .groupBy($"user_id", $"session_no")
      .agg(
        min($"t").as("session_start"),
        max($"t").as("session_end"),
        (max($"t") - min($"t")).as("duration_secs"),
        count(lit(1)).as("n_events"),
        // internal sum stays decimal-exact; final output canonicalized to
        // BIGINT (integer cents fit int64) so both engines hash identically
        sum($"cents").cast(LongType).as("total_cents"))
  }

  val sessionizeOracle: String = Fixtures.oracle(
    """, sess AS (
         SELECT user_id, seq, btime AS t, CAST(cents AS DECIMAL(18,0)) AS cents,
                CASE WHEN LAG(btime) OVER (PARTITION BY user_id ORDER BY seq) IS NULL
                       OR btime - LAG(btime) OVER (PARTITION BY user_id ORDER BY seq) > 1800
                     THEN 1 ELSE 0 END AS new_session
         FROM ek),
       numbered AS (
         SELECT user_id, seq, t, cents,
                SUM(new_session) OVER (PARTITION BY user_id ORDER BY seq
                  ROWS UNBOUNDED PRECEDING) AS session_no
         FROM sess)
       SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
              MIN(t) AS session_start,
              MAX(t) AS session_end,
              MAX(t) - MIN(t) AS duration_secs,
              COUNT(1) AS n_events,
              CAST(SUM(cents) AS BIGINT) AS total_cents
       FROM numbered
       GROUP BY user_id, session_no""")

  /** Per-user daily tumbling windows with event-type pivot counts (A2/T7). */
  def userDaily(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("ek")
      .withColumn("day", $"btime" - $"btime" % 86400)
      .groupBy($"user_id", $"day")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("purchases"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("errors"),
        sum($"cents".cast(DecimalType(18, 0))).cast(LongType).as("total_cents"))
  }

  val userDailyOracle: String = Fixtures.oracle(
    """SELECT user_id,
              btime - btime % 86400 AS day,
              COUNT(1) AS n_events,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
              CAST(SUM(CAST(cents AS DECIMAL(18,0))) AS BIGINT) AS total_cents
       FROM ek
       GROUP BY 1, 2""")

  /** Cohort retention: users grouped by first-seen day; per (cohort, day
    * offset) the active-user count and the retention rate against the
    * cohort's size, in integer basis points.
    *
    * Plan shape: one distinct over (user, day), one user-keyed min, one
    * user-keyed join (co-partitioned with the distinct — Catalyst reuses
    * the exchange), and a final tiny (cohort, offset) aggregate. The
    * cohort-size side is `day_offset = 0` of the same aggregate (every user
    * is active on their cohort day by definition), so no second scan. */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val days = spark.table("ek")
      .select($"user_id", ($"btime" - $"btime" % 86400).as("day"))
      .distinct()
    val first = days.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    val counts = days.join(first, Seq("user_id"))
      .withColumn("day_offset", expr("(day - cohort_day) div 86400"))
      .groupBy($"cohort_day", $"day_offset")
      .agg(count(lit(1)).as("n_users")) // distinct by construction
    val sizes = counts.filter($"day_offset" === 0L)
      .select($"cohort_day", $"n_users".as("cohort_size"))
    counts.join(sizes, Seq("cohort_day"))
      .select($"cohort_day", $"day_offset", $"n_users",
        expr("n_users * 10000 div cohort_size").as("retention_bp"))
  }

  val retentionOracle: String = Fixtures.oracle(
    """, ret_days AS (
         SELECT DISTINCT user_id, btime - btime % 86400 AS day FROM ek),
       ret_first AS (
         SELECT user_id, MIN(day) AS cohort_day FROM ret_days GROUP BY 1),
       ret_counts AS (
         SELECT f.cohort_day, (d.day - f.cohort_day) // 86400 AS day_offset,
                COUNT(1) AS n_users
         FROM ret_days d JOIN ret_first f ON d.user_id = f.user_id
         GROUP BY 1, 2),
       ret_sizes AS (
         SELECT cohort_day, n_users AS cohort_size FROM ret_counts
         WHERE day_offset = 0)
       SELECT c.cohort_day,
              CAST(c.day_offset AS BIGINT) AS day_offset,
              CAST(c.n_users AS BIGINT) AS n_users,
              CAST(c.n_users * 10000 // s.cohort_size AS BIGINT) AS retention_bp
       FROM ret_counts c JOIN ret_sizes s ON c.cohort_day = s.cohort_day""")

  /** Funnel conversion window: a stage counts only within this many
    * seq-div-[[funnelBucketWidth]] blocks of the previous stage. ONE
    * definition shared by the batch operator, its oracle, the streaming
    * twin ([[graft.streaming.StreamingFunnel]]) and the twin's spec — the
    * four sites used to hardcode 150/8 independently. */
  private[graft] val funnelWindowBuckets = 150L
  private[graft] val funnelBucketWidth = 8L

  /** Ordered conversion funnel view → click → purchase: how many users
    * reach each stage, where a stage counts only if it happens strictly
    * after the previous stage (sequenced on the unique per-event `seq`, so
    * ordering is total and deterministic — `btime` has ties within a
    * block) and within a 150-block (~5 virtual hours) conversion window of
    * it. The window uses the fixtures' event-id clock: block = seq div 8,
    * so the constraint is pure integer arithmetic on both engines — and
    * without it every user trivially reaches stage 3 (probed: 150 blocks
    * splits the sf0.01 population 26/25/99 across stages 1/2/3).
    *
    * Plan shape: three filtered user-keyed min-aggregates chained by
    * user-keyed joins — every shuffle is on user_id, so the chain
    * co-partitions; no window over the full stream, no per-user event
    * arrays. Output is ≤4 rows (stage, n_users). */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val e = spark.table("ek").select($"user_id", $"event_type", $"seq")
    val users = e.select($"user_id").distinct()
    val s1 = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"seq").as("s1"))
    val s2 = e.filter($"event_type" === "click").join(s1, Seq("user_id"))
      .filter($"seq" > $"s1" && expr(
        s"seq div $funnelBucketWidth - s1 div $funnelBucketWidth <= $funnelWindowBuckets"))
      .groupBy($"user_id").agg(min($"seq").as("s2"))
    val s3 = e.filter($"event_type" === "purchase").join(s2, Seq("user_id"))
      .filter($"seq" > $"s2" && expr(
        s"seq div $funnelBucketWidth - s2 div $funnelBucketWidth <= $funnelWindowBuckets"))
      .groupBy($"user_id").agg(min($"seq").as("s3"))

    users
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(
        when($"s3".isNotNull, 3L).when($"s2".isNotNull, 2L)
          .when($"s1".isNotNull, 1L).otherwise(0L).as("stage"))
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
  }

  val funnelOracle: String = Fixtures.oracle(
    s""", fun_s1 AS (
         SELECT user_id, MIN(seq) AS s1 FROM ek WHERE event_type = 'view' GROUP BY 1),
       fun_s2 AS (
         SELECT e.user_id, MIN(e.seq) AS s2 FROM ek e
         JOIN fun_s1 f ON e.user_id = f.user_id
         WHERE e.event_type = 'click' AND e.seq > f.s1
           AND e.seq // $funnelBucketWidth - f.s1 // $funnelBucketWidth <= $funnelWindowBuckets GROUP BY 1),
       fun_s3 AS (
         SELECT e.user_id, MIN(e.seq) AS s3 FROM ek e
         JOIN fun_s2 f ON e.user_id = f.user_id
         WHERE e.event_type = 'purchase' AND e.seq > f.s2
           AND e.seq // $funnelBucketWidth - f.s2 // $funnelBucketWidth <= $funnelWindowBuckets GROUP BY 1),
       fun_stage AS (
         SELECT u.user_id,
                CASE WHEN s3.user_id IS NOT NULL THEN 3
                     WHEN s2.user_id IS NOT NULL THEN 2
                     WHEN s1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS stage
         FROM (SELECT DISTINCT user_id FROM ek) u
         LEFT JOIN fun_s1 s1 ON u.user_id = s1.user_id
         LEFT JOIN fun_s2 s2 ON u.user_id = s2.user_id
         LEFT JOIN fun_s3 s3 ON u.user_id = s3.user_id)
       SELECT CAST(stage AS BIGINT) AS stage, COUNT(1) AS n_users
       FROM fun_stage GROUP BY stage""")

  /** Top-5 event amounts per user via the bounded [[graft.plans.TopKLongs]]
    * aggregate — the scale-correct "top-k per group": a window rank
    * (`ROW_NUMBER() ... <= k`, the oracle's formulation) shuffles and sorts
    * EVERY event; the bounded aggregate pre-collapses each map task to ≤ k
    * values per user before the exchange, so the shuffle carries
    * `users × k` longs no matter how many events the corpus has. The
    * result is a value multiset per rank, so tie order cannot diverge
    * between engines. */
  def topAmountsPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.plans.DotProduct.register(spark) // registers the shared native-fn surface
    import spark.implicits._
    spark.table("raw")
      .groupBy($"user_id")
      .agg(expr("graft_topk(cents, 5)").as("tops"))
      .select($"user_id", posexplode($"tops").as(Seq("r", "amount")))
      .select($"user_id", ($"r" + 1).cast(LongType).as("rank"), $"amount")
  }

  val topAmountsPerUserOracle: String = Fixtures.oracle(
    """SELECT user_id, CAST(r AS BIGINT) AS rank, amount FROM (
         SELECT user_id, cents AS amount,
                ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cents DESC) AS r
         FROM raw) t
       WHERE r <= 5""")

  /** Point-in-time join over the event stream: each click matched to the
    * same user's most recent purchase at-or-before it (inclusive as-of on
    * the globally-unique event sequence, so ties are impossible and the
    * result is deterministic). Runs through the generalized
    * [[graft.operators.AsOf]] merge-as-union operator — one shuffle of
    * |clicks| + |purchases| rows on user_id, no row multiplication — and is
    * oracle-checked against DuckDB's native ASOF JOIN, which implements the
    * same semantics independently. */
  def asofLastPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val ev = spark.table("raw")
    val clicks = ev.filter($"event_type" === "click").select($"user_id", $"seq")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"seq", $"cents")
    graft.operators.AsOf
      .backward(clicks, purchases, Seq("user_id"), "seq", "seq", Seq("seq", "cents"), "p_")
      .select($"user_id", $"seq".as("click_seq"),
        $"p_seq".as("purchase_seq"), $"p_cents".as("purchase_cents"))
  }

  val asofLastPurchaseOracle: String = Fixtures.oracle(
    """SELECT c.user_id, c.seq AS click_seq,
              p.seq AS purchase_seq, p.cents AS purchase_cents
       FROM (SELECT user_id, seq FROM raw WHERE event_type = 'click') c
       ASOF JOIN (SELECT user_id, seq, cents FROM raw WHERE event_type = 'purchase') p
         ON c.user_id = p.user_id AND c.seq >= p.seq""")

  /** Multi-level OLAP rollup: revenue by (day, event_type) with per-day
    * subtotals and a grand total in ONE pass — `ROLLUP` plans a single
    * shuffle with partial aggregation per grouping set, vs the 3-scan
    * UNION ALL a naive report would run. Null grouping keys are
    * canonicalized (`-1` / `'ALL'`) so both engines emit identical
    * subtotal rows. */
  def dailyRollup(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("ek")
      // truncating DIV on BOTH sides: DuckDB's INTEGER `//` truncates toward
      // zero exactly like Spark's DIV (verified: -7 // 2 = -3 — only
      // DOUBLE-typed `//` floors), so for btime below the anchor the pair
      // still agrees; a floor() here would be the one that diverges
      .select(expr("(btime - 1704067200) DIV 86400").as("day"),
        $"event_type", $"cents")
      .rollup($"day", $"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"cents").as("total_cents"))
      .select(coalesce($"day", lit(-1L)).as("day"),
        coalesce($"event_type", lit("ALL")).as("event_type"),
        $"n_events", $"total_cents")
  }

  val dailyRollupOracle: String = Fixtures.oracle(
    """SELECT COALESCE(day, -1) AS day,
              COALESCE(event_type, 'ALL') AS event_type,
              COUNT(1) AS n_events,
              CAST(SUM(cents) AS BIGINT) AS total_cents
       FROM (SELECT (btime - 1704067200) // 86400 AS day, event_type, cents FROM ek)
       GROUP BY ROLLUP(day, event_type)""")

  /** Quartile decomposition of purchase amounts per user (NTILE): assigns
    * each purchase to a within-user quartile, then aggregates per quartile.
    * The window partitions by user (corpus-parallel, no global sort); the
    * (cents, seq) ordering is unique so tile assignment is deterministic. */
  def valueQuartiles(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val purchases = spark.table("raw")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"seq", $"cents")
    val w = Window.partitionBy($"user_id").orderBy($"cents", $"seq")
    purchases
      .withColumn("quartile", ntile(4).over(w).cast(LongType))
      .groupBy($"quartile")
      .agg(count(lit(1)).as("n"), sum($"cents").as("total_cents"),
        min($"cents").as("min_cents"), max($"cents").as("max_cents"))
  }

  val valueQuartilesOracle: String = Fixtures.oracle(
    """SELECT CAST(q AS BIGINT) AS quartile,
              COUNT(1) AS n, CAST(SUM(cents) AS BIGINT) AS total_cents,
              MIN(cents) AS min_cents, MAX(cents) AS max_cents
       FROM (SELECT cents,
                    NTILE(4) OVER (PARTITION BY user_id ORDER BY cents, seq) AS q
             FROM raw WHERE event_type = 'purchase')
       GROUP BY 1""")

  /** Cross-user temporal correlation: for each purchase, how many clicks
    * (by anyone) land in the 4 minutes after it. There is NO equality key
    * between the sides — the naive formulation is a quadratic
    * BroadcastNestedLoopJoin — so this runs through
    * [[graft.operators.BinnedRange]]: both sides key by a 239-second time
    * bin, the purchase side explodes to its ≤2 overlapped bins, and the
    * exact window re-checks after an ordinary hash join. Candidates are
    * window-proportional, not |purchases|×|clicks|. Per-event times
    * spread within the 120 s block via the event's in-block slot. */
  def clickFollow(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val ev = spark.table("ek")
      .select($"seq", $"event_type", ($"btime" + ($"seq" % 8) * 15).as("t"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"seq".as("purchase_seq"), $"t")
    val clicks = ev.filter($"event_type" === "click")
      .select($"seq".as("click_seq"), $"t".as("ct"))

    graft.operators.BinnedRange
      .pointsInWindow(purchases, clicks, "t", "ct", 1, 240, Seq("click_seq"))
      .groupBy($"purchase_seq")
      .agg(count(lit(1)).as("n_follow_clicks"))
  }

  val clickFollowOracle: String = Fixtures.oracle(
    """, cf AS (SELECT seq, event_type, btime + (seq % 8) * 15 AS t FROM ek)
       SELECT p.seq AS purchase_seq, COUNT(1) AS n_follow_clicks
       FROM cf p
       JOIN cf c ON c.event_type = 'click'
               AND c.t >= p.t + 1 AND c.t <= p.t + 240
       WHERE p.event_type = 'purchase'
       GROUP BY 1""")

  /** Cohort set algebra over the virtual week: users active on weekdays
    * INTERSECT / EXCEPT users active on weekends. Set ops hash-distinct
    * each side on the full row — here a single bigint column — so the
    * shuffle carries distinct user ids, not events; Catalyst plans both
    * ops as aggregates over a union-style exchange, no nested loops. */
  def cohortSets(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val days = spark.table("ek")
      // truncating DIV matches DuckDB's integer `//`, see dailyRollup
      .select($"user_id",
        expr("(btime - 1704067200) DIV 86400").as("day"))
    val weekday = days.filter($"day" % 7 < 5).select($"user_id").distinct()
    val weekend = days.filter($"day" % 7 >= 5).select($"user_id").distinct()
    weekday.intersect(weekend).select($"user_id", lit("both").as("cohort"))
      .unionByName(
        weekday.except(weekend).select($"user_id", lit("weekday_only").as("cohort")))
      .unionByName(
        weekend.except(weekday).select($"user_id", lit("weekend_only").as("cohort")))
  }

  val cohortSetsOracle: String = Fixtures.oracle(
    """, cs AS (SELECT user_id, (btime - 1704067200) // 86400 AS day FROM ek),
       wd AS (SELECT DISTINCT user_id FROM cs WHERE day % 7 < 5),
       we AS (SELECT DISTINCT user_id FROM cs WHERE day % 7 >= 5)
       SELECT user_id, 'both' AS cohort FROM (SELECT user_id FROM wd INTERSECT SELECT user_id FROM we)
       UNION ALL
       SELECT user_id, 'weekday_only' FROM (SELECT user_id FROM wd EXCEPT SELECT user_id FROM we)
       UNION ALL
       SELECT user_id, 'weekend_only' FROM (SELECT user_id FROM we EXCEPT SELECT user_id FROM wd)""")

  /** Semi-structured extraction: `events.props` is a JSON blob (the only
    * semi-structured column in the corpus). The path extraction is a
    * codegen'd scan-side projection (`get_json_object`, one JsonPath parse
    * per row — no UDF, no schema inference pass), followed by one
    * map-side-combined aggregate per event_type. At 100 TB the JSON never
    * reaches a shuffle: only (event_type, k) longs do. Null-safe: rows
    * whose props lack the key drop out before the aggregate, identically
    * in both engines. */
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("events")
      .select($"event_type", get_json_object($"props", "$.k").cast(LongType).as("k"))
      .filter($"k".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        countDistinct($"k").as("n_distinct_k"),
        sum(when($"k" >= 50, 1L).otherwise(0L)).as("n_high"))
  }

  val jsonPropsOracle: String =
    """SELECT event_type,
              COUNT(1) AS n,
              CAST(SUM(k) AS BIGINT) AS sum_k,
              COUNT(DISTINCT k) AS n_distinct_k,
              CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
       FROM (SELECT event_type,
                    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             FROM events) e
       WHERE k IS NOT NULL
       GROUP BY 1"""

  /** Per-user z-score anomaly detection over event amounts — the data-QA
    * operator a pipeline runs before trusting a metric stream. The per-user
    * moments (n, Σx, Σx²) accumulate EXACTLY (decimal-128 sums — longs
    * would overflow Σx² long before 100 TB) in ONE map-side-combined
    * aggregate; z is computed without ever materializing μ or σ as
    * intermediate doubles: z = (x·n − Σx) / √(n·Σx² − (Σx)²), ONE double
    * division per event, so both engines make every |z| ≥ 3 decision on
    * identical IEEE values. The moments join is a plain equi-join on
    * user_id — the moments frame is one row PER USER, which grows with the
    * corpus, so it must never be broadcast; both sides already share the
    * user_id partitioning from the aggregate.
    * Degenerate users (zero variance) are filtered arithmetically —
    * n·Σx² = (Σx)² — before any division. */
  def anomalyZscore(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val r = spark.table("raw")
      .select($"user_id", $"seq", $"cents".cast(DecimalType(18, 0)).as("c"))
    val moments = r.groupBy($"user_id")
      .agg(count(lit(1)).cast(DecimalType(18, 0)).as("n"),
        sum($"c").cast(DecimalType(28, 0)).as("sc"),
        sum(($"c" * $"c").cast(DecimalType(28, 0))).cast(DecimalType(38, 0)).as("sc2"))
      .filter($"n" * $"sc2" =!= $"sc" * $"sc")

    r.join(moments, Seq("user_id"))
      .withColumn("z",
        ($"c" * $"n" - $"sc").cast(DoubleType) /
          sqrt(($"n" * $"sc2" - $"sc" * $"sc").cast(DoubleType)))
      .filter(abs($"z") >= 3.0)
      .select($"user_id", $"seq",
        $"c".cast(LongType).as("cents"), round($"z", 6).as("z"))
  }

  val anomalyZscoreOracle: String = Fixtures.oracle(
    """, az_r AS (SELECT user_id, seq, CAST(cents AS DECIMAL(18,0)) AS c FROM raw),
       az_m AS (SELECT user_id,
                       CAST(COUNT(1) AS DECIMAL(18,0)) AS n,
                       CAST(SUM(c) AS DECIMAL(28,0)) AS sc,
                       CAST(SUM(CAST(c * c AS DECIMAL(28,0))) AS DECIMAL(38,0)) AS sc2
                FROM az_r GROUP BY 1)
       SELECT r.user_id, r.seq, CAST(r.c AS BIGINT) AS cents,
              ROUND(CAST(r.c * m.n - m.sc AS DOUBLE)
                    / SQRT(CAST(m.n * m.sc2 - m.sc * m.sc AS DOUBLE)), 6) AS z
       FROM az_r r JOIN az_m m ON r.user_id = m.user_id
       WHERE m.n * m.sc2 <> m.sc * m.sc
         AND ABS(CAST(r.c * m.n - m.sc AS DOUBLE)
                 / SQRT(CAST(m.n * m.sc2 - m.sc * m.sc AS DOUBLE))) >= 3.0""")

  /** Integer PageRank over the user interaction graph — the graph-centrality
    * quality signal of web-corpus curation (Common Crawl ranks pages by
    * harmonic centrality / PageRank over the link graph; here the "links"
    * are purchase→click temporal influence edges from the same binned range
    * join as [[clickFollow]]).
    *
    * Determinism: ranks are held as integers at scale 10^12 and every step
    * is integer arithmetic — per-edge share r DIV deg, damping
    * (85·Σ) DIV 100 — so the per-node contribution SUM is order-free and
    * five iterations produce bit-identical ranks in both engines (a
    * double-valued PageRank would drift by summation order).
    *
    * Scale path: the edge list is built by an equi-joinable binned range
    * join (never all-pairs), each iteration is ONE shuffle (join ranks⋈edges
    * on src, re-group on dst), and the rank frame is localCheckpoint-ed per
    * round so the plan stays iteration-depth-free — the same iterate +
    * truncate pattern as dedup_cluster_components. Cost is
    * iterations × output-sized shuffles at any corpus size. */
  /** The SHARED directed purchase→click influence-edge set — one
    * definition for the whole graph family (PageRank, HITS, triangles,
    * label propagation): purchases influence clicks landing 1-240 s later
    * via the equi-joinable binned range join (never all-pairs), self-loops
    * dropped, distinct. Memo.checkpointed: the corpus-sized join runs once
    * per (session, sfDir) however many graph entries consume it, and every
    * consumer gets a lineage-truncated leaf (the iterate-and-truncate
    * precondition). An edit to the window constants or the synthetic clock
    * now changes every graph operator — and every oracle, via the equally
    * shared [[influenceEdgeCtes]] — together. */
  private[queries] def influenceEdges(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.checkpointed(spark, sfDir, "influence_edges") {
      import spark.implicits._
      val ev = spark.table("ek")
        .select($"user_id", $"seq", $"event_type", ($"btime" + ($"seq" % 8) * 15).as("t"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("src"), $"t")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id".as("dst_user"), $"t".as("ct"))
      graft.operators.BinnedRange
        .pointsInWindow(purchases, clicks, "t", "ct", 1, 240, Seq("dst_user"))
        .filter($"src" =!= $"dst_user")
        .select($"src", $"dst_user".as("dst"))
        .distinct()
    }

  /** Undirected view of [[influenceEdges]] (u < v, distinct) — the
    * triangle/LPA base. */
  private[queries] def influenceUndirected(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.checkpointed(spark, sfDir, "influence_und") {
      import spark.implicits._
      influenceEdges(spark, sfDir)
        .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
        .distinct()
    }

  /** The oracle twin of [[influenceEdges]], prefix-parameterized so every
    * graph oracle asserts the SAME edge SQL: emits `${p}ev` and
    * `${p}edges(src, dst)`; MATERIALIZED because iterative oracles
    * reference the edge CTE once per unrolled round. */
  private def influenceEdgeCtes(p: String): String =
    s""", ${p}ev AS (SELECT user_id, seq, event_type, btime + (seq % 8) * 15 AS t FROM ek),
       ${p}edges AS MATERIALIZED (
         SELECT DISTINCT p.user_id AS src, c.user_id AS dst
         FROM ${p}ev p JOIN ${p}ev c
           ON c.event_type = 'click' AND c.t >= p.t + 1 AND c.t <= p.t + 240
         WHERE p.event_type = 'purchase' AND p.user_id <> c.user_id)"""

  def userPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val S = 1000000000000L

    val edges = influenceEdges(spark, sfDir)

    // Round-INVARIANT frames materialized once (opt guide §2.4, VERDICT r15
    // #9): the old loop re-executed the out-degree aggregation, the
    // node-set union+distinct, and the 1-row node count (plus its
    // broadcast) inside EVERY round's checkpoint job — 5× each for
    // quantities that never change. Pre-joining deg onto edges also drops
    // one join per round (edges ⋈ ranks ⋈ outDeg → edgesDeg ⋈ ranks).
    // Both checkpoints are edge-/node-sized, the bound the per-round plan
    // already shuffled.
    val edgesDeg = edges
      .join(edges.groupBy($"src").agg(count(lit(1)).as("deg")), Seq("src"))
      .localCheckpoint()
    val nodes = edges.select($"src".as("u")).union(edges.select($"dst".as("u"))).distinct()
    val base = nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("n"))))
      .localCheckpoint()

    var ranks = base.select($"u", expr(s"$S DIV n").as("r"))
    for (_ <- 1 to 5) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("u", "src"), Seq("src"))
        .select($"dst".as("u"), expr("r DIV deg").as("c"))
        .groupBy($"u").agg(sum($"c").as("contrib"))
      ranks = base
        .join(contrib, Seq("u"), "left")
        .select($"u",
          expr(s"((15 * ($S DIV n)) DIV 100) + (85 * coalesce(contrib, CAST(0 AS BIGINT))) DIV 100")
            .as("r"))
        .localCheckpoint()
    }
    ranks.select($"u".as("user_id"), $"r".as("rank_e12"))
  }

  private def pagerankIterCte(prev: String, cur: String): String =
    s""", $cur AS (
         SELECT nd.u,
                CAST(pb.b + (85 * COALESCE(SUM(pv.r // dg.deg), 0)) // 100 AS BIGINT) AS r
         FROM pr_nodes nd
         CROSS JOIN pr_base pb
         LEFT JOIN pr_edges e ON e.dst = nd.u
         LEFT JOIN $prev pv ON pv.u = e.src
         LEFT JOIN pr_deg dg ON dg.src = e.src
         GROUP BY nd.u, pb.b)"""

  val userPagerankOracle: String = Fixtures.oracle(
    influenceEdgeCtes("pr_") +
    """,
       pr_nodes AS (SELECT src AS u FROM pr_edges UNION SELECT dst FROM pr_edges),
       pr_n AS (SELECT COUNT(*) AS n FROM pr_nodes),
       pr_deg AS (SELECT src, COUNT(*) AS deg FROM pr_edges GROUP BY 1),
       pr_base AS (SELECT CAST((15 * (1000000000000 // n)) // 100 AS BIGINT) AS b FROM pr_n),
       pr_r0 AS (SELECT u, CAST((SELECT 1000000000000 // n FROM pr_n) AS BIGINT) AS r
                 FROM pr_nodes)""" +
      pagerankIterCte("pr_r0", "pr_r1") +
      pagerankIterCte("pr_r1", "pr_r2") +
      pagerankIterCte("pr_r2", "pr_r3") +
      pagerankIterCte("pr_r3", "pr_r4") +
      pagerankIterCte("pr_r4", "pr_r5") +
      "\n       SELECT u AS user_id, r AS rank_e12 FROM pr_r5")

  /** Z-order (Morton) layout keys over the event stream — the sort key a
    * 100 TB events table is physically laid out by so that file-level
    * min/max statistics prune scans for predicates on EITHER `user_id` OR
    * time (a single-column sort prunes only its own column; see
    * [[graft.operators.Layout]] and LayoutSpec's measured bounding-box
    * shrink). The interleaved dimensions are the user id and the BLOCK
    * INDEX (btime minus the epoch anchor, over the 120 s spacing) so both
    * sides carry comparable variation widths — interleaving the raw epoch
    * seconds would waste the time dimension's bits on a constant offset.
    *
    * The key is pure built-in bitwise arithmetic (5-step magic-mask
    * spread), whole-stage-codegen'd, and bit-identical in DuckDB — layout
    * keys are oracle-checked like any other operator. */
  def zorderKey(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("ek")
      .select($"id", $"user_id", $"btime",
        graft.operators.Layout.zorderKey(
          $"user_id", expr("(btime - 1704067200) div 120"))
          .as("zkey"))
  }

  val zorderKeyOracle: String = Fixtures.oracle(
    graft.operators.Layout.duckZorderCtes(
      "(SELECT id, user_id, btime FROM ek)",
      "user_id", "(btime - 1704067200) // 120") +
      s"""
       SELECT id, user_id, btime, ${graft.operators.Layout.duckZorderKey} AS zkey
       FROM z5""")

  /** Exponentially-weighted moving average of purchase amounts per user —
    * the trend/smoothing primitive behind spend-drift detection, computed
    * in EXACT integer arithmetic: with α = 1/2 the last 16 weights are the
    * powers 2^15..2^0, so `ewma = Σ availableⱼ cents_{n-j}·2^(15-j) DIV
    * Σ availableⱼ 2^(15-j)` is a ratio of exact longs (largest numerator
    * < 2^63 for cents < 2^47) — no float-sum order dependence, no decimal
    * plumbing, bit-identical across engines (the text_lm_fluency
    * division-exact lesson applied to time series). Short histories use
    * only the available lags (true prefix EWMA, not zero-padded).
    *
    * The 16-term lag chain is ONE window pass per user partition — at
    * 100 TB the state per task is 16 lags deep regardless of user-history
    * length, and partitions are per-user (no global window). The SQL text
    * is generated once and shared by both engines modulo the integer-div
    * spelling. */
  private def ewmaSql(div: String): String = {
    val num = (0 until 16).map(j =>
      s"CASE WHEN LAG(seq, $j) OVER w IS NOT NULL THEN LAG(cents, $j) OVER w * ${1L << (15 - j)} ELSE 0 END")
      .mkString("(", " + ", ")")
    val den = (0 until 16).map(j =>
      s"CASE WHEN LAG(seq, $j) OVER w IS NOT NULL THEN ${1L << (15 - j)} ELSE 0 END")
      .mkString("(", " + ", ")")
    s"""SELECT seq, user_id, cents, $num $div $den AS ewma_cents
       FROM (SELECT seq, user_id, cents FROM raw WHERE event_type = 'purchase') p
       WINDOW w AS (PARTITION BY user_id ORDER BY seq)"""
  }

  def ewmaTrend(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    spark.sql(ewmaSql("div"))
  }

  val ewmaTrendOracle: String = Fixtures.oracle(ewmaSql("//"))

  /** Bot/spam-account screening — the behavioral data-QA stage of a
    * training-data pipeline (automated accounts poison engagement-derived
    * quality signals, so curation flags them before any popularity-weighted
    * sampling). Per user: volume (event count), diversity (distinct event
    * types), activity span, and burstiness (max events in any 10-minute
    * wall-clock bucket); flags compare each user against corpus-derived
    * baselines — volume > 1.2× the mean and burst > 1.5× the mean burst —
    * by integer cross-multiplication (the q11/q22 discipline: no
    * double-ulp flip can disagree between engines), so thresholds track
    * corpus composition instead of going stale as absolute constants.
    *
    * Scale shape: two map-side-combined aggregates partitioned by user
    * (the burst pre-agg keys on (user, bucket) — never a per-user ordered
    * window), a user-count-sized join on user_id, and a 1-row mean
    * broadcast. No global windows, no collect. */
  def botFlags(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val ev = spark.table("ek").select($"user_id", $"event_type", $"btime")
    val perUser = ev.groupBy($"user_id").agg(
      count(lit(1)).as("n_events"),
      count_distinct($"event_type").as("n_types"),
      (max($"btime") - min($"btime")).as("span_secs"))
    val burst = ev
      .groupBy($"user_id", expr("btime DIV 600").as("win"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"user_id").agg(max($"c").as("max_burst"))
    val stats = perUser.join(burst, Seq("user_id"))
    val avgs = stats.agg(
      expr("sum(n_events) DIV count(1)").as("avg_n"),
      expr("sum(max_burst) DIV count(1)").as("avg_burst"))
    stats.crossJoin(broadcast(avgs))
      .select($"user_id", $"n_events", $"n_types", $"span_secs", $"max_burst",
        ($"n_events" * 5 > $"avg_n" * 6).as("flag_volume"),
        ($"max_burst" * 2 > $"avg_burst" * 3).as("flag_burst"))
      .withColumn("is_bot", $"flag_volume" || $"flag_burst")
  }

  val botFlagsOracle: String = Fixtures.oracle(
    """, bot_pu AS (
         SELECT user_id, COUNT(1) AS n_events,
                CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
                MAX(btime) - MIN(btime) AS span_secs
         FROM ek GROUP BY 1),
       bot_b AS (
         SELECT user_id, MAX(c) AS max_burst
         FROM (SELECT user_id, btime // 600 AS win, COUNT(1) AS c
               FROM ek GROUP BY 1, 2)
         GROUP BY 1),
       bot_a AS (SELECT SUM(n_events) // COUNT(1) AS avg_n FROM bot_pu),
       bot_ab AS (SELECT SUM(max_burst) // COUNT(1) AS avg_burst FROM bot_b)
       SELECT p.user_id, p.n_events, p.n_types, p.span_secs, b.max_burst,
              p.n_events * 5 > a.avg_n * 6 AS flag_volume,
              b.max_burst * 2 > ab.avg_burst * 3 AS flag_burst,
              (p.n_events * 5 > a.avg_n * 6)
                OR (b.max_burst * 2 > ab.avg_burst * 3) AS is_bot
       FROM bot_pu p
       JOIN bot_b b ON p.user_id = b.user_id
       CROSS JOIN bot_a a CROSS JOIN bot_ab ab""")

  /** Mergeable histogram quantiles — the FIXED-STATE quantile path for
    * 100 TB, next to the exact-sort family ([[valueQuartiles]] NTILE,
    * `text_length_percentiles`): log₂-binned value histograms per event
    * type, and p50/p90/p99 read off the cumulative bins. An exact
    * percentile shuffles and sorts every row; the histogram is ≤64
    * counters per group — map-side combined, additively mergeable across
    * partitions, days, and streams (the same order-free-merge contract as
    * the count-min/KMV/top-k sketch family) — at the cost of a bounded
    * answer: the quantile is located to its power-of-two bin [lo, hi]
    * (≤2× relative error; subdivide bins for tighter bounds, same plan).
    *
    * Everything is integer: bin = ⌊log₂ cents⌋ via `length(bin(x)) - 1`
    * (both engines print identical binary strings), the quantile rule is
    * the cross-multiplied `cum·100 ≥ q·total`, and the bin bounds are
    * shifts — no float ever appears, so both engines agree bit-for-bit.
    *
    * Scale shape: one map-side-combined (type, bin) count; the cumulative
    * window runs over ≤64 rows per type (value-range bounded, the
    * [[graft.queries.TextOps.ccnetBuckets]] discipline); the quantile
    * probe set is a 3-row broadcast. */
  def histQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hist = spark.table("raw")
      .filter($"cents" >= 1L)
      .withColumn("bin", expr(graft.functions.Log2Bin.binSql("cents")))
      .groupBy($"event_type", $"bin").agg(count(lit(1)).as("n"))
    val cum = hist
      .withColumn("cum", sum($"n").over(
        Window.partitionBy($"event_type").orderBy($"bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum($"n").over(Window.partitionBy($"event_type")))
    val qs = Seq(50L, 90L, 99L).toDF("q")
    cum.crossJoin(broadcast(qs))
      .filter($"cum" * 100L >= $"q" * $"total")
      .groupBy($"event_type", $"q")
      .agg(min($"bin").as("qbin"), max($"total").as("total"))
      .select($"event_type", $"q", $"total", $"qbin",
        expr(graft.functions.Log2Bin.sparkLoSql("qbin")).as("lo_cents"),
        expr(graft.functions.Log2Bin.sparkHiSql("qbin")).as("hi_cents"))
  }

  val histQuantilesOracle: String = Fixtures.oracle(
    s""", hq_h AS (
         SELECT event_type, ${graft.functions.Log2Bin.binSql("cents")} AS bin,
                COUNT(1) AS n
         FROM raw WHERE cents >= 1 GROUP BY 1, 2),
       hq_c AS (
         SELECT event_type, bin, n,
                SUM(n) OVER (PARTITION BY event_type ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS cum,
                SUM(n) OVER (PARTITION BY event_type) AS total
         FROM hq_h)
       SELECT c.event_type, q.q, CAST(MAX(c.total) AS BIGINT) AS total,
              MIN(c.bin) AS qbin,
              ${graft.functions.Log2Bin.duckLoSql("MIN(c.bin)")} AS lo_cents,
              ${graft.functions.Log2Bin.duckHiSql("MIN(c.bin)")} AS hi_cents
       FROM hq_c c CROSS JOIN (VALUES (CAST(50 AS BIGINT)), (CAST(90 AS BIGINT)), (CAST(99 AS BIGINT))) AS q(q)
       WHERE c.cum * 100 >= q.q * c.total
       GROUP BY 1, 2""")

  /** Association rules over purchase baskets (Agrawal et al., SIGMOD'93):
    * support, confidence and lift for item PAIRS, in basis points by
    * integer cross-multiplication — the co-purchase/recommendation miner,
    * set-co-occurrence where [[clickFollow]] is temporal.
    *
    * Scale design, in order:
    *  1. basket = DISTINCT (user, item) — one map-side-combined distinct.
    *  2. APRIORI PRUNE before any pair work: only items bought by ≥ 0.5%
    *     of purchasing users survive (corpus-RELATIVE threshold by
    *     cross-multiplication — a fixed count would stop pruning at 100×;
    *     the apriori property guarantees no frequent pair is lost). The
    *     prune join keys on item and is NOT broadcast-hinted — an item
    *     catalog grows with the corpus.
    *  3. baskets above 64 pruned items are excluded (the bot/crawler
    *     screen — [[botFlags]] is the upstream gate; a basket cap bounds
    *     per-user pair fan-out at 64²/2, the standard frequent-itemset
    *     mitigation), singleton baskets carry no pairs.
    *  4. pair explode over the sorted basket array (a < b by
    *     construction), ONE (a, b)-keyed map-side-combined count; pairs
    *     kept at ≥ 0.1% of the basket population.
    * All supports (n_a, n_b, N) are recomputed over the SAME capped
    * population the pairs come from, so confidence/lift are internally
    * consistent. Only the two 1-row totals broadcast. */
  def basketRules(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val ui = spark.table("events")
      .filter($"event_type" === "purchase")
      .select($"user_id",
        get_json_object($"props", "$.k").cast(LongType).as("item"))
      .filter($"item".isNotNull)
      .distinct()

    val nRaw = ui.select($"user_id").distinct().agg(count(lit(1)).as("n_raw"))
    val frequent = ui.groupBy($"item").agg(count(lit(1)).as("n_i"))
      .crossJoin(broadcast(nRaw))
      .filter($"n_i" * 200 >= $"n_raw")
      .select($"item")

    // consumed by four downstream frames (population, supports, the 1-row
    // total, pair explode) — memoized so the distinct→prune→cap chain and
    // its 1-row broadcast build once (Memo discipline; without it the plan
    // replicates the subtree per consumer)
    val baskets = graft.util.Memo.cached(spark, sfDir, "basket_baskets") {
      ui.join(frequent, Seq("item"))
        .groupBy($"user_id")
        .agg(sort_array(collect_set($"item")).as("items"))
        .filter(size($"items").between(2, 64))
    }

    val pop = baskets.select($"user_id", explode($"items").as("item"))
    val itemSupp = pop.groupBy($"item").agg(count(lit(1)).as("n_i"))
    val nUsers = baskets.agg(count(lit(1)).as("n_users"))

    val pairs = baskets.select(explode(expr(
      """flatten(transform(sequence(0, size(items) - 2),
           i -> transform(sequence(i + 1, size(items) - 1),
             j -> named_struct('a', element_at(items, i + 1),
                               'b', element_at(items, j + 1)))))""")).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))

    pairs.groupBy($"a", $"b").agg(count(lit(1)).as("n_ab"))
      .crossJoin(broadcast(nUsers))
      .filter($"n_ab" * 1000 >= $"n_users")
      .join(itemSupp.select($"item".as("a"), $"n_i".as("n_a")), Seq("a"))
      .join(itemSupp.select($"item".as("b"), $"n_i".as("n_b")), Seq("b"))
      .select($"a", $"b", $"n_a", $"n_b", $"n_ab",
        expr("n_ab * 10000 DIV n_a").as("conf_ab_bp"),
        expr("n_ab * 10000 DIV n_b").as("conf_ba_bp"),
        // BOTH lift operands widen to DECIMAL(38) (HUGEINT on the oracle
        // side): the numerator n_ab·n_users·10⁴ overflows Long past ~10⁸
        // users, and the denominator n_a·n_b past ~3·10⁹ per item — either
        // wrap silently in non-ANSI Spark while DuckDB errors
        expr("CAST((CAST(n_ab AS DECIMAL(38,0)) * n_users * 10000)" +
          " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_bp"))
  }

  /** Oracle pairs come from a basket self-join (a < b) — the same unique
    * unordered pairs the sorted-array explode produces. */
  val basketRulesOracle: String = Fixtures.oracle(
    """, br_ui0 AS (
         SELECT DISTINCT user_id,
                TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
         FROM events
         WHERE event_type = 'purchase'),
       br_ui AS (SELECT user_id, item FROM br_ui0 WHERE item IS NOT NULL),
       br_nraw AS (SELECT COUNT(DISTINCT user_id) AS n_raw FROM br_ui),
       br_freq AS (
         SELECT item FROM br_ui, br_nraw
         GROUP BY item, n_raw HAVING COUNT(1) * 200 >= n_raw),
       br_basket AS (
         SELECT u.user_id, COUNT(1) AS bn
         FROM br_ui u JOIN br_freq f ON u.item = f.item
         GROUP BY 1 HAVING COUNT(1) BETWEEN 2 AND 64),
       br_pop AS (
         SELECT u.user_id, u.item
         FROM br_ui u
         JOIN br_freq f ON u.item = f.item
         JOIN br_basket b ON u.user_id = b.user_id),
       br_supp AS (SELECT item, COUNT(1) AS n_i FROM br_pop GROUP BY 1),
       br_n AS (SELECT COUNT(1) AS n_users FROM br_basket),
       br_ps AS (
         SELECT x.item AS a, y.item AS b, COUNT(1) AS n_ab
         FROM br_pop x JOIN br_pop y
           ON x.user_id = y.user_id AND x.item < y.item
         GROUP BY 1, 2)
       SELECT p.a, p.b, sa.n_i AS n_a, sb.n_i AS n_b,
              CAST(p.n_ab AS BIGINT) AS n_ab,
              CAST((p.n_ab * 10000) // sa.n_i AS BIGINT) AS conf_ab_bp,
              CAST((p.n_ab * 10000) // sb.n_i AS BIGINT) AS conf_ba_bp,
              CAST((CAST(p.n_ab AS HUGEINT) * n.n_users * 10000)
                   // (CAST(sa.n_i AS HUGEINT) * sb.n_i) AS BIGINT) AS lift_bp
       FROM br_ps p
       JOIN br_supp sa ON p.a = sa.item
       JOIN br_supp sb ON p.b = sb.item
       CROSS JOIN br_n n
       WHERE p.n_ab * 1000 >= n.n_users""")

  /** k-anonymity release gate over the event log (Sweeney, 2002; Samarati's
    * generalization step) — the privacy pass a training-data release runs
    * before shipping interaction logs: a quasi-identifier combination seen
    * for fewer than k DISTINCT users re-identifies; the cell must be
    * generalized (coarsen the value axis one level) or suppressed.
    *
    * Quasi-identifiers here: (event_type, hour-of-day, log₂ value bin) —
    * the [[Log2Bin]] contract shared with `events_hist_quantiles`, so the
    * generalization ladder "bin → bin DIV 2" is the histogram's own
    * coarsening. Per level-0 cell the release decision is
    *   0 (publish as-is)   if n_users ≥ k,
    *   1 (publish coarse)  else if the bin DIV 2 cell reaches k users,
    *   2 (suppress)        otherwise.
    *
    * Scale shape: the QI space is bounded (|event_type| × 24 × ≤63 bins),
    * so both aggregates are map-side-combined shuffles whose OUTPUT is
    * cell-count-sized; the distinct-user count shuffles (QI, user_id)
    * pairs — corpus-sized in, cell-sized out, the same shape as every
    * rollup. The coarse frame joins back on its bounded cell key. Pure
    * integer arithmetic throughout — bit-identical across engines. */
  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val k = 8
    val rec = spark.table("ek")
      .filter($"cents".isNotNull && $"cents" >= 1L && $"event_type".isNotNull)
      .select($"event_type", (($"btime" / 3600L).cast(LongType) % 24L).as("hour"),
        expr(graft.functions.Log2Bin.binSql("cents")).as("bin"), $"user_id")
    val l0 = rec.groupBy($"event_type", $"hour", $"bin")
      .agg(count(lit(1)).as("n_records"), countDistinct($"user_id").as("n_users"))
    val l1 = rec.groupBy($"event_type", $"hour", expr("bin DIV 2").as("coarse_bin"))
      .agg(countDistinct($"user_id").as("coarse_users"))
    l0.withColumn("coarse_bin", expr("bin DIV 2"))
      .join(l1, Seq("event_type", "hour", "coarse_bin"))
      .select($"event_type", $"hour", $"bin", $"n_records", $"n_users",
        $"coarse_users",
        when($"n_users" >= k, 0L)
          .when($"coarse_users" >= k, 1L)
          .otherwise(2L).as("release_level"))
  }

  val kAnonymityOracle: String = Fixtures.oracle(
    s""", ka_rec AS (
         SELECT event_type,
                CAST(FLOOR(btime / 3600) AS BIGINT) % 24 AS hour,
                ${graft.functions.Log2Bin.binSql("cents")} AS bin,
                user_id
         FROM ek
         WHERE cents IS NOT NULL AND cents >= 1 AND event_type IS NOT NULL),
       ka_l0 AS (
         SELECT event_type, hour, bin, COUNT(1) AS n_records,
                COUNT(DISTINCT user_id) AS n_users
         FROM ka_rec GROUP BY 1, 2, 3),
       ka_l1 AS (
         SELECT event_type, hour, bin // 2 AS coarse_bin,
                COUNT(DISTINCT user_id) AS coarse_users
         FROM ka_rec GROUP BY 1, 2, 3)
       SELECT a.event_type, a.hour, a.bin, a.n_records, a.n_users,
              b.coarse_users,
              CAST(CASE WHEN a.n_users >= 8 THEN 0
                        WHEN b.coarse_users >= 8 THEN 1
                        ELSE 2 END AS BIGINT) AS release_level
       FROM ka_l0 a
       JOIN ka_l1 b ON a.event_type = b.event_type AND a.hour = b.hour
                   AND a.bin // 2 = b.coarse_bin""")

  /** Distinct l-diversity release gate (Machanavajjhala et al. TKDD'07)
    * beside [[kAnonymity]]'s size gate: k-anonymity alone leaks when a
    * published cell is homogeneous in the sensitive attribute — every
    * record in it shares the secret, so re-identification isn't even
    * needed. Here the quasi-identifier is (hour, value bin), the
    * sensitive attribute is the event type, and a cell publishes only
    * when BOTH k = 8 distinct users AND l = 3 distinct sensitive values
    * co-occur; `top_type_bp` (dominant type share) is the homogeneity
    * diagnostic the entropy variant thresholds.
    *
    * Scale shape: corpus-sized (QI, type) / (QI, user) distinct shuffles
    * in, bounded-cell-space (24 h × ~64 bins) aggregates out — the
    * [[kAnonymity]] contract. */
  def lDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val (k, l) = (8, 3)
    val rec = spark.table("ek")
      .filter($"cents".isNotNull && $"cents" >= 1L && $"event_type".isNotNull)
      .select((($"btime" / 3600L).cast(LongType) % 24L).as("hour"),
        expr(graft.functions.Log2Bin.binSql("cents")).as("bin"),
        $"event_type", $"user_id")
    val cells = rec.groupBy($"hour", $"bin")
      .agg(count(lit(1)).as("n_records"),
        countDistinct($"user_id").as("n_users"),
        countDistinct($"event_type").as("n_types"))
    val top = rec.groupBy($"hour", $"bin", $"event_type")
      .agg(count(lit(1)).as("tn"))
      .groupBy($"hour", $"bin").agg(max($"tn").as("top_tn"))
    cells.join(top, Seq("hour", "bin"))
      .select($"hour", $"bin", $"n_records", $"n_users", $"n_types",
        expr("top_tn * 10000 DIV n_records").as("top_type_bp"),
        when($"n_users" >= k && $"n_types" >= l, "publish")
          .otherwise("suppress").as("verdict"))
  }

  val lDiversityOracle: String = Fixtures.oracle(
    s""", ld_rec AS (
         SELECT CAST(FLOOR(btime / 3600) AS BIGINT) % 24 AS hour,
                ${graft.functions.Log2Bin.binSql("cents")} AS bin,
                event_type, user_id
         FROM ek
         WHERE cents IS NOT NULL AND cents >= 1 AND event_type IS NOT NULL),
       ld_cells AS (
         SELECT hour, bin, COUNT(1) AS n_records,
                COUNT(DISTINCT user_id) AS n_users,
                COUNT(DISTINCT event_type) AS n_types
         FROM ld_rec GROUP BY 1, 2),
       ld_top AS (
         SELECT hour, bin, MAX(tn) AS top_tn FROM (
           SELECT hour, bin, event_type, COUNT(1) AS tn
           FROM ld_rec GROUP BY 1, 2, 3)
         GROUP BY 1, 2)
       SELECT c.hour, c.bin, c.n_records, c.n_users, c.n_types,
              CAST(t.top_tn * 10000 // c.n_records AS BIGINT) AS top_type_bp,
              CASE WHEN c.n_users >= 8 AND c.n_types >= 3
                   THEN 'publish' ELSE 'suppress' END AS verdict
       FROM ld_cells c JOIN ld_top t ON c.hour = t.hour AND c.bin = t.bin""")

  /** Triangle counting + local clustering coefficient over the purchase→
    * click influence graph (same edge set as [[userPagerank]]) via
    * degree-ordered edge orientation — the MapReduce-era standard for
    * at-scale triangle enumeration (Suri & Vassilvitskii, WWW'11; Cohen's
    * MapReduce graph kit): orient every undirected edge from its
    * lower-(degree, id) endpoint to the higher one, so each triangle is
    * generated by exactly ONE wedge at its lowest-ranked apex and
    * out-degrees are O(√m)-bounded — the wedge explosion a hub vertex
    * would cause under naive adjacency joins cannot happen.
    *
    * Plan shape: edges come from the binned range join (never all-pairs);
    * degree and orientation are node-/edge-sized shuffles; the wedge build
    * is a self-equi-join of the oriented adjacency on its apex and the
    * closing check is an equi-join on (b, c) — three shuffle joins total,
    * every key a real hash key. Per-node credit explodes each triangle to
    * its 3 corners, then one map-side-combined count; the clustering
    * coefficient 2·t·10⁴ DIV (deg·(deg−1)) stays integer basis points. */
  def triangleCount(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val und = influenceUndirected(spark, sfDir)

    val deg = und.select($"u".as("n")).union(und.select($"v".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("deg"))

    // orientation: lower (deg, id) endpoint → higher; keep the head's rank
    // so wedges can order their two spokes without re-joining degrees
    val oriented = und
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("deg", "du"), Seq("u"))
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("deg", "dv"), Seq("v"))
      .select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u").otherwise($"v").as("a"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v").otherwise($"u").as("b"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"dv").otherwise($"du").as("db"))

    val wedges = oriented.as("x").join(oriented.as("y"), $"x.a" === $"y.a" &&
        ($"x.db" < $"y.db" || ($"x.db" === $"y.db" && $"x.b" < $"y.b")))
      .select($"x.a".as("a"), $"x.b".as("b"), $"y.b".as("c"))

    val triangles = wedges
      .join(oriented.select($"a".as("b"), $"b".as("c")), Seq("b", "c"))
      .localCheckpoint()

    val credit = triangles.select(explode(array($"a", $"b", $"c")).as("n"))
      .groupBy($"n").agg(count(lit(1)).as("n_triangles"))

    deg.join(credit, Seq("n"), "left")
      .select($"n".as("user_id"), $"deg".as("degree"),
        coalesce($"n_triangles", lit(0L)).as("n_triangles"),
        when($"deg" >= 2L,
          expr("(2 * coalesce(n_triangles, CAST(0 AS BIGINT)) * 10000) DIV (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("lcc_bp"))
  }

  val triangleCountOracle: String = Fixtures.oracle(
    influenceEdgeCtes("tc_") +
    """,
       tc_und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM tc_edges),
       tc_deg AS (SELECT n, COUNT(1) AS deg FROM (
                    SELECT u AS n FROM tc_und UNION ALL SELECT v FROM tc_und)
                  GROUP BY 1),
       tc_or AS (
         SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                     THEN e.u ELSE e.v END AS a,
                CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                     THEN e.v ELSE e.u END AS b,
                CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                     THEN dv.deg ELSE du.deg END AS db
         FROM tc_und e
         JOIN tc_deg du ON du.n = e.u
         JOIN tc_deg dv ON dv.n = e.v),
       tc_tri AS (
         SELECT x.a, x.b, y.b AS c
         FROM tc_or x
         JOIN tc_or y ON x.a = y.a
                     AND (x.db < y.db OR (x.db = y.db AND x.b < y.b))
         JOIN tc_or z ON z.a = x.b AND z.b = y.b),
       tc_credit AS (
         SELECT n, COUNT(1) AS n_triangles FROM (
           SELECT a AS n FROM tc_tri
           UNION ALL SELECT b FROM tc_tri
           UNION ALL SELECT c FROM tc_tri)
         GROUP BY 1)
       SELECT d.n AS user_id, d.deg AS degree,
              COALESCE(c.n_triangles, 0) AS n_triangles,
              CAST(CASE WHEN d.deg >= 2
                   THEN (2 * COALESCE(c.n_triangles, 0) * 10000) // (d.deg * (d.deg - 1))
                   ELSE 0 END AS BIGINT) AS lcc_bp
       FROM tc_deg d LEFT JOIN tc_credit c ON c.n = d.n""")

  /** HyperLogLog distinct-user estimation per event type (Flajolet,
    * Fusy, Gandouet & Meunier, AofA'07) — the third cardinality sketch
    * next to KMV (`corpus_overlap_kmv`) and exact distinct: m = 256
    * registers of 5 bits each (160 B per group, forever), where register
    * j keeps max ρ(w) over the users hashing to it (ρ = leading-zero
    * rank of the remaining 24 hash bits). Registers merge by MAX — like
    * every sketch here, order-free and union-composable across
    * partitions, days, and streams — and duplicate users land on the
    * same (j, ρ) so the sketch counts DISTINCT by construction with no
    * distinct shuffle.
    *
    * Determinism discipline: the Knuth multiplicative hash
    * ([[Sampling.bucketExprSql]] — shared SQL text in both engines)
    * replaces the engine hash; the harmonic mean Z = Σ 2^(−Mⱼ) is held
    * EXACT as the integer S = Σ 2^(25−Mⱼ) (common denominator 2²⁵), so
    * the only float op is the final α·m²·2²⁵/S — literal-arithmetic
    * constants and one correctly-rounded division, bit-identical across
    * engines. The raw estimator is reported next to the exact count and
    * the zero-register count V (the small-range-correction trigger a
    * consumer applies); err_bp makes the sketch error observable per
    * group, the count-min discipline.
    *
    * Scale shape: ONE map-side-combined (event_type, j) MAX aggregate —
    * corpus-sized scan in, ≤ |types|·256 rows out; the register grid
    * completion is a bounded broadcast cross join; the exact side (for
    * the error column) is the only distinct-sized exchange, and a
    * production run at 10¹¹ users would simply drop it — the sketch side
    * never materializes user-count state. */
  def distinctHll(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val m = 256

    val hashed = spark.table("raw")
      .filter($"event_type".isNotNull && $"user_id".isNotNull)
      .select($"event_type",
        expr(Sampling.bucketExprSql("user_id")).as("h"))
      .select($"event_type", ($"h" % m).as("j"), expr("h DIV 256").as("w"))
      .select($"event_type", $"j",
        when($"w" === 0L, lit(25L))
          .otherwise(lit(25L) - length(expr("bin(w)"))).as("rho"))

    val regs = hashed.groupBy($"event_type", $"j").agg(max($"rho").as("mj"))

    val grid = spark.table("raw").filter($"event_type".isNotNull)
      .select($"event_type").distinct()
      .crossJoin(spark.range(m).select($"id".as("j")))

    val sketch = grid.join(regs, Seq("event_type", "j"), "left")
      .withColumn("mj", coalesce($"mj", lit(0L)))
      .groupBy($"event_type")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(25 - mj AS INT))")).as("s2"),
        sum(when($"mj" === 0L, 1L).otherwise(0L)).as("v_zero"))

    val exact = spark.table("raw")
      .filter($"event_type".isNotNull && $"user_id".isNotNull)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("exact_distinct"))

    sketch.join(exact, Seq("event_type"))
      .withColumn("hll_raw", round(
        expr(s"((0.7213 / (1.0 + 1.079 / $m.0)) * ${m * m}.0 * 33554432.0) / CAST(s2 AS DOUBLE)"), 3))
      // the error stays DOUBLE end-to-end: a double→int cast here would
      // diverge (Spark truncates, DuckDB rounds-to-nearest)
      .select($"event_type", $"exact_distinct", $"v_zero", $"s2",
        $"hll_raw",
        round($"hll_raw" / $"exact_distinct".cast(DoubleType), 6).as("est_over_exact"))
  }

  val distinctHllOracle: String = Fixtures.oracle(
    s""", hll_h AS (
         SELECT event_type, ${Sampling.bucketExprSql("user_id")} AS h
         FROM raw WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
       hll_rho AS (
         SELECT event_type, h % 256 AS j,
                CASE WHEN h // 256 = 0 THEN 25
                     ELSE 25 - len(bin(h // 256)) END AS rho
         FROM hll_h),
       hll_regs AS (
         SELECT event_type, j, MAX(rho) AS mj FROM hll_rho GROUP BY 1, 2),
       hll_grid AS (
         SELECT t.event_type, CAST(s.j AS BIGINT) AS j
         FROM (SELECT DISTINCT event_type FROM raw WHERE event_type IS NOT NULL) t,
              UNNEST(range(256)) AS s(j)),
       hll_sk AS (
         SELECT g.event_type,
                SUM(CAST(1 AS BIGINT) << CAST(25 - COALESCE(r.mj, 0) AS INT)) AS s2,
                SUM(CASE WHEN COALESCE(r.mj, 0) = 0 THEN 1 ELSE 0 END) AS v_zero
         FROM hll_grid g
         LEFT JOIN hll_regs r ON g.event_type = r.event_type AND g.j = r.j
         GROUP BY 1),
       hll_ex AS (
         SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
         FROM raw WHERE event_type IS NOT NULL AND user_id IS NOT NULL
         GROUP BY 1)
       SELECT s.event_type, e.exact_distinct,
              CAST(s.v_zero AS BIGINT) AS v_zero, CAST(s.s2 AS BIGINT) AS s2,
              ROUND(((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 33554432.0)
                    / CAST(s.s2 AS DOUBLE), 3) AS hll_raw,
              ROUND(ROUND(((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 33554432.0)
                          / CAST(s.s2 AS DOUBLE), 3)
                    / CAST(e.exact_distinct AS DOUBLE), 6) AS est_over_exact
       FROM hll_sk s JOIN hll_ex e ON s.event_type = e.event_type""")

  /** Community detection over the influence graph by synchronous label
    * propagation (Raghavan, Albert & Kumara, 2007) — the near-linear-time
    * community primitive next to [[userPagerank]] (centrality) and
    * `dedup_cluster_components` (connectivity): every node starts as its
    * own label and, for 4 synchronized rounds, adopts the most frequent
    * label among its neighbors (ties to the SMALLEST label — the
    * deterministic tie-break that replaces the published random one, same
    * discipline as every hash-for-rand substitution here).
    *
    * Scale shape: per round, ONE shuffle join (labels ⋈ adjacency on the
    * neighbor end) and ONE map-side-combined (node, label) count; the
    * per-node argmax is a bounded aggregate (candidate labels ≤ degree),
    * via max_by on Spark and a degree-bounded ROW_NUMBER partition on the
    * oracle — never a corpus-wide window. localCheckpoint truncates the
    * per-round lineage exactly like PageRank. Output: each node's final
    * community and the community size. */
  def labelPropagation(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val und = influenceUndirected(spark, sfDir)
    val adj = und.select($"u".as("n"), $"v".as("nbr"))
      .union(und.select($"v".as("n"), $"u".as("nbr")))
      .localCheckpoint()

    var labels = adj.select($"n").distinct().select($"n", $"n".as("lbl"))
    for (_ <- 1 to 4) {
      labels = adj
        .join(labels.select($"n".as("nbr"), $"lbl"), Seq("nbr"))
        .groupBy($"n", $"lbl").agg(count(lit(1)).as("cnt"))
        .groupBy($"n")
        .agg(max_by($"lbl", struct($"cnt", -$"lbl")).as("lbl"))
        .localCheckpoint()
    }
    labels.join(labels.groupBy($"lbl").agg(count(lit(1)).as("community_size")), Seq("lbl"))
      .select($"n".as("user_id"), $"lbl".as("community"), $"community_size")
  }

  private def lpaIterCte(n: Int): String = {
    val (prev, cur) = (s"lpa_l${n - 1}", s"lpa_l$n")
    s""", lpa_c$n AS MATERIALIZED (
         SELECT a.n, p.lbl, COUNT(1) AS cnt
         FROM lpa_adj a JOIN $prev p ON p.n = a.nbr
         GROUP BY 1, 2),
       $cur AS MATERIALIZED (
         SELECT n, lbl FROM (
           SELECT n, lbl,
                  ROW_NUMBER() OVER (PARTITION BY n ORDER BY cnt DESC, lbl ASC) AS rk
           FROM lpa_c$n)
         WHERE rk = 1)"""
  }

  val labelPropagationOracle: String = Fixtures.oracle(
    influenceEdgeCtes("lpa_") +
    """,
       lpa_und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                   FROM lpa_edges),
       lpa_adj AS MATERIALIZED (
         SELECT u AS n, v AS nbr FROM lpa_und
         UNION ALL SELECT v, u FROM lpa_und),
       lpa_l0 AS (SELECT DISTINCT n, n AS lbl FROM lpa_adj)""" +
      (1 to 4).map(lpaIterCte).mkString("\n") +
      """
       SELECT l.n AS user_id, l.lbl AS community, s.community_size
       FROM lpa_l4 l
       JOIN (SELECT lbl, COUNT(1) AS community_size FROM lpa_l4 GROUP BY 1) s
         ON l.lbl = s.lbl""")

  /** HITS hubs and authorities (Kleinberg, JACM 1999) over the DIRECTED
    * purchase→click influence graph — the fourth graph-centrality lens
    * next to PageRank (undirected prestige), connected components
    * (reachability), and label propagation (communities): a node is a
    * good AUTHORITY if many good hubs point at it, a good HUB if it
    * points at good authorities — the two-sided fixed point PageRank's
    * single score cannot express (here: users whose purchases trigger
    * clicks vs users whose clicks follow purchases).
    *
    * Determinism discipline: both scores are integers at 10⁻⁶ scale; each
    * half-round is one integer sum over in-/out-neighbors and an L∞
    * normalization by the round's max (truncating division, both
    * engines) — the [[Pca]] iteration's arithmetic on a graph instead of
    * a matrix, so 4 rounds are bit-identical and the oracle unrolls them
    * as MATERIALIZED CTEs.
    *
    * Scale shape: per round TWO shuffle joins (scores ⋈ edges on the
    * source end, then on the destination end) and two map-side-combined
    * sums — output-sized exchanges at any corpus size, PageRank's
    * iterate-and-truncate pattern (localCheckpoint per round). */
  def hitsScores(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val S = 1000000L

    val edges = influenceEdges(spark, sfDir)

    val nodes = edges.select($"src".as("u")).union(edges.select($"dst".as("u")))
      .distinct().localCheckpoint()

    // Iterate over NONZERO scores only and re-attach the zero-score nodes
    // once at the end: a node absent from a half-round's sum contributes
    // exactly 0 to the next sum and never to a (positive) L∞ max, so the
    // fixed point is unchanged — while the previous shape's per-round
    // nodes-LEFT-JOIN + max-broadcast-subquery re-executed each half-round's
    // join/agg subtree up to 4× inside one checkpoint (measured 3.14 s min2
    // for 4 rounds at sf0.1; opt guide §2.4: remove repeated passes before
    // tuning them). Each half-round is ONE materialized shuffle join + agg;
    // the L∞ max is a 1-row bounded control read over the checkpoint (the
    // repo's bounds-row class, not a data collect).
    def linf(raw: DataFrame, out: String): DataFrame = {
      val m = raw.agg(max($"raw")).head()
      val mv = if (m.isNullAt(0)) 0L else m.getLong(0)
      if (mv == 0L) raw.select($"u", lit(0L).as(out))
      else raw.select($"u", expr(s"(raw * $S) DIV $mv").as(out))
    }
    var hPrev = nodes.select($"u", lit(S).as("h"))
    var aNew: DataFrame = null
    var hNew: DataFrame = null
    for (_ <- 1 to 4) {
      val aRaw = edges.join(hPrev.select($"u".as("src"), $"h"), Seq("src"))
        .groupBy($"dst".as("u")).agg(sum($"h").as("raw"))
        .localCheckpoint()
      aNew = linf(aRaw, "a")
      val hRaw = edges.join(aNew.select($"u".as("dst"), $"a".as("na")), Seq("dst"))
        .groupBy($"src".as("u")).agg(sum($"na").as("raw"))
        .localCheckpoint()
      hNew = linf(hRaw, "h")
      hPrev = hNew
    }
    nodes
      .join(aNew, Seq("u"), "left")
      .join(hNew, Seq("u"), "left")
      .select($"u".as("user_id"),
        coalesce($"a", lit(0L)).as("authority_e6"),
        coalesce($"h", lit(0L)).as("hub_e6"))
  }

  private def hitsIterCte(n: Int): String = {
    val prev = if (n == 1) "hits_s0" else s"hits_s${n - 1}"
    s""", hits_ar$n AS MATERIALIZED (
         SELECT nd.u, COALESCE(SUM(pv.h), 0) AS raw
         FROM hits_nodes nd
         LEFT JOIN hits_edges e ON e.dst = nd.u
         LEFT JOIN $prev pv ON pv.u = e.src
         GROUP BY nd.u),
       hits_am$n AS (SELECT MAX(raw) AS m FROM hits_ar$n),
       hits_an$n AS MATERIALIZED (
         SELECT r.u, CASE WHEN m.m = 0 THEN 0
                          ELSE CAST((r.raw * 1000000) // m.m AS BIGINT) END AS a
         FROM hits_ar$n r CROSS JOIN hits_am$n m),
       hits_hr$n AS MATERIALIZED (
         SELECT nd.u, COALESCE(SUM(av.a), 0) AS raw
         FROM hits_nodes nd
         LEFT JOIN hits_edges e ON e.src = nd.u
         LEFT JOIN hits_an$n av ON av.u = e.dst
         GROUP BY nd.u),
       hits_hm$n AS (SELECT MAX(raw) AS m FROM hits_hr$n),
       hits_s$n AS MATERIALIZED (
         SELECT a.u, a.a,
                CASE WHEN m.m = 0 THEN 0
                     ELSE CAST((h.raw * 1000000) // m.m AS BIGINT) END AS h
         FROM hits_an$n a
         JOIN hits_hr$n h ON h.u = a.u
         CROSS JOIN hits_hm$n m)"""
  }

  val hitsScoresOracle: String = Fixtures.oracle(
    influenceEdgeCtes("hits_") +
    """,
       hits_nodes AS (SELECT src AS u FROM hits_edges UNION SELECT dst FROM hits_edges),
       hits_s0 AS (SELECT u, CAST(1000000 AS BIGINT) AS a,
                          CAST(1000000 AS BIGINT) AS h
                   FROM hits_nodes)""" +
      (1 to 4).map(hitsIterCte).mkString("\n") +
      """
       SELECT u AS user_id, a AS authority_e6, h AS hub_e6 FROM hits_s4""")

  /** First-order Markov transition matrix over per-user event sequences —
    * the behavioral-model counterpart of the bigram LM ([[TextOps
    * .lmFluency]] on events instead of words): P(next event type | current)
    * estimated from every consecutive pair in each user's seq-ordered
    * stream, in exact basis points. The table a funnel designer or a
    * bot-detector reads (a user stream whose transitions diverge from this
    * matrix is [[botFlags]]' statistical cousin).
    *
    * Scale shape: ONE per-user window pass for the lag (bounded by a
    * single user's history — the EWMA class, never a global partition),
    * then a map-side-combined (prev, next) count on a |types|²-bounded key
    * space; row-normalization joins on the |types|-bounded prev key.
    * Integer everywhere: p_bp = cnt·10⁴ DIV row_total. */
  def markovTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"seq")
    val pairs = spark.table("raw")
      .filter($"event_type".isNotNull && $"user_id".isNotNull)
      .select($"user_id", $"seq", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
    val counts = pairs.groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = counts.groupBy($"prev_type").agg(sum($"n").as("row_n"))
    counts.join(rowTot, Seq("prev_type"))
      .select($"prev_type", $"next_type", $"n",
        expr("(n * 10000) DIV row_n").as("p_bp"))
  }

  val markovTransitionsOracle: String = Fixtures.oracle(
    """, mkv_p AS (
         SELECT user_id, seq, event_type,
                LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY seq)
                  AS prev_type
         FROM raw WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
       mkv_c AS (
         SELECT prev_type, event_type AS next_type, COUNT(1) AS n
         FROM mkv_p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       mkv_t AS (SELECT prev_type, SUM(n) AS row_n FROM mkv_c GROUP BY 1)
       SELECT c.prev_type, c.next_type, c.n,
              CAST((c.n * 10000) // t.row_n AS BIGINT) AS p_bp
       FROM mkv_c c JOIN mkv_t t ON c.prev_type = t.prev_type""")

  /** k-core peeling threshold and fixed round budget. 8 rounds reach the
    * 3-core fixpoint on every fixture scale (KcoreSpec pins it: every
    * survivor's in-core degree ≥ k, so a 9th peel would remove nothing);
    * a fixed budget keeps the plan — and the unrolled oracle — corpus-
    * independent, the same convention as every iterative entry here. */
  private[queries] val kcoreK = 3
  private[queries] val kcoreRounds = 8

  /** Ladder levels spanning the degree scale geometrically — adjacent
    * small k are indistinguishable on a graph whose core is dense (the
    * fixture's 3-core is a near-clique of min degree 32; a 2/3/4 ladder
    * read three identical rows). */
  private[queries] val kcoreCurveKs = Seq(2, 16, 64)

  /** k-core decomposition of the undirected influence graph (Seidman's
    * coreness, Matula–Beck peeling): [[kcoreRounds]] synchronous rounds,
    * each dropping every node whose CURRENT degree < [[kcoreK]] and the
    * edges touching it. The 3-core is the densely-interconnected
    * community skeleton — the graph-analytics counterpart of the
    * clustering coefficient ([[triangleCount]]'s lcc), and the standard
    * preprocessing cut before expensive per-node algorithms.
    *
    * Scale shape: per round, one node-keyed degree aggregate and two
    * edge×survivor equi-joins — all hash-keyed shuffles on real keys,
    * frames monotonically SHRINK (peeling only deletes), and each round
    * chains from a localCheckpoint leaf (the iterate-and-truncate
    * discipline every graph entry here shares). */
  /** The peeled k-core edge set — Memo-shared so the per-node entry and
    * the ladder reuse each k's chain instead of re-peeling. */
  private def kcorePeel(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    graft.util.Memo.checkpointed(spark, sfDir, s"kcore_e_$k") {
      import spark.implicits._
      var e = influenceUndirected(spark, sfDir)
      for (_ <- 1 to kcoreRounds) {
        val keep = e.select($"u".as("n")).union(e.select($"v".as("n")))
          .groupBy($"n").agg(count(lit(1)).as("deg"))
          .filter($"deg" >= k)
          .select($"n")
          .localCheckpoint() // node-sized; consumed by BOTH endpoint joins
        e = e.join(keep.withColumnRenamed("n", "u"), Seq("u"))
          .join(keep.withColumnRenamed("n", "v"), Seq("v"))
          .select($"u", $"v")
          .localCheckpoint()
      }
      e
    }

  def kcore(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    kcorePeel(spark, sfDir, kcoreK)
      .select($"u".as("n")).union(
        kcorePeel(spark, sfDir, kcoreK).select($"v".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("core_degree"))
      .select($"n".as("user_id"), $"core_degree")
  }

  /** Spec hook: the shared undirected influence-edge frame. */
  private[graft] def ccEdges(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    influenceUndirected(spark, sfDir)
  }

  /** Connected components by large-star/small-star alternation — Kiveris
    * et al. (MLG/KDD 2014), "Connected Components in MapReduce and
    * Beyond". The repo's other component operator
    * ([[Dedup.clusterComponents]]) converges in O(component diameter)
    * min-label rounds; the star alternation contracts paths
    * logarithmically — O(log n) rounds on ANY topology — which is the
    * difference between 5 and 50 shuffles on a 100 TB web-ish graph with
    * long chains. Per round: large-star hangs every larger-than-center
    * neighbor under the neighborhood minimum, small-star re-hangs the
    * smaller ones and the center itself; each is one symmetric groupBy +
    * one shuffle join, the edge frame localCheckpoint-ed per round (the
    * iterate-and-truncate discipline), monotonically toward a
    * min-rooted star forest. Convergence is driver-checked cheaply on the
    * (count, Σu, Σv) stamp, then CONFIRMED by an exact set-difference job
    * in the candidate round — a stamp collision can't fake a fixpoint.
    *
    * Output matches the dedup component report's shape: every node of the
    * influence graph with its component label (= component-minimum
    * user_id, the star root at fixpoint), component size, and a
    * canon/member role. The oracle computes true reachable minima with
    * one recursive CTE over the SAME edge SQL — so the alternation's
    * correctness theorem is re-proved by the gate on every run. */
  /** The alternation itself, factored for spec-level testing on synthetic
    * graphs: `edges` is an undirected (u, v) frame (u < v, distinct) →
    * (user_id, component) labels for every endpoint. */
  private[graft] def starContract(spark: SparkSession, edges0: DataFrame): DataFrame = {
    import spark.implicits._
    var e = edges0
    def stamp(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum($"u"), lit(0L)), coalesce(sum($"v"), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def minFrame(edges: DataFrame): DataFrame = {
      val sym = edges.select($"u".as("x"), $"v".as("y"))
        .unionByName(edges.select($"v".as("x"), $"u".as("y")))
      sym.join(
        sym.groupBy($"x").agg(min($"y").as("mn"))
          .select($"x", least($"x", $"mn").as("m")),
        Seq("x"))
    }
    var prev = stamp(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 15) {
      val t0 = System.nanoTime()
      val prevE = e
      // large-star: neighbors above the center hang under the minimum
      val large = minFrame(e).filter($"y" > $"x")
        .select($"m".as("u"), $"y".as("v")) // m <= x < y: already ordered
        .distinct().localCheckpoint()
      // small-star: neighbors below the center (and the center) re-hang
      val sm = minFrame(large)
      val e2 = sm.filter($"y" < $"x")
        .select(least($"y", $"m").as("u"), greatest($"y", $"m").as("v"))
        .filter($"u" =!= $"v")
        .unionByName(sm.select($"x", $"m").distinct()
          .filter($"m" =!= $"x").select($"m".as("u"), $"x".as("v")))
        .distinct().localCheckpoint()
      e = e2
      val cur = stamp(e)
      // a stable stamp is the convergence CANDIDATE; the fixpoint claim
      // is then verified exactly (one extra set-difference job, only at
      // the final round) — stamp collisions can't fake convergence
      converged = cur == prev &&
        e.exceptAll(prevE).unionByName(prevE.exceptAll(e)).isEmpty
      prev = cur
      rounds += 1
      System.err.println(s"[graft] bigstar round=$rounds stamp=$cur " +
        f"ms=${(System.nanoTime() - t0) / 1e6}%.0f")
    }
    require(converged, s"big-star did not converge in $rounds rounds")

    val nodes = edges0.select($"u".as("user_id"))
      .unionByName(edges0.select($"v".as("user_id"))).distinct()
    nodes
      .join(e.select($"v".as("user_id"), $"u".as("comp")), Seq("user_id"), "left")
      .groupBy($"user_id").agg(min($"comp").as("comp"))
      .select($"user_id", coalesce($"comp", $"user_id").as("component"))
  }

  def ccBigstar(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val labels = graft.util.Memo.cached(spark, sfDir, "cc_bigstar_labels") {
      starContract(spark, influenceUndirected(spark, sfDir))
    }
    val sizes = labels.groupBy($"component").agg(count(lit(1)).as("component_size"))
    labels.join(sizes, Seq("component"))
      .select($"user_id", $"component", $"component_size",
        when($"user_id" === $"component", "canon").otherwise("member").as("role"))
  }

  val ccBigstarOracle: String = Fixtures.oracle(influenceEdgeCtes("bs_") +
    """,
       bs_und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                  FROM bs_edges),
       bs_sym AS (SELECT u AS src, v AS dst FROM bs_und
                  UNION ALL SELECT v, u FROM bs_und)
       SELECT user_id, component, component_size, role FROM (
         WITH RECURSIVE reach(n, lab) AS (
             SELECT src, src FROM bs_sym
             UNION
             SELECT e.dst, r.lab FROM bs_sym e JOIN reach r ON e.src = r.n),
         comp AS (SELECT n AS user_id, MIN(lab) AS component FROM reach GROUP BY n),
         sizes AS (SELECT component, COUNT(1) AS component_size FROM comp GROUP BY 1)
         SELECT c.user_id, c.component,
                CAST(s.component_size AS BIGINT) AS component_size,
                CASE WHEN c.user_id = c.component THEN 'canon' ELSE 'member' END AS role
         FROM comp c JOIN sizes s USING (component)) t""")

  /** Coreness ladder over [[kcoreCurveKs]] (k = 2/16/64): per level, the
    * surviving core's node and edge counts plus its minimum in-core
    * degree — the graph's density profile in three numbers per level
    * (the knob-table convention: nprobe/rerank/temperature curves, now
    * for the peeling threshold). Cores NEST (a higher-k core is a
    * subgraph of every lower-k core) and every non-empty level's min
    * degree reads ≥ its k — both spec-pinned. */
  def kcoreCurve(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    kcoreCurveKs.map { k =>
      val e = kcorePeel(spark, sfDir, k)
      val deg = e.select($"u".as("n")).union(e.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("deg"))
      deg.agg(count(lit(1)).as("n_nodes"),
        coalesce(min($"deg"), lit(0L)).as("min_core_degree"))
        .crossJoin(e.agg(count(lit(1)).as("n_edges")))
        .select(lit(k.toLong).as("k"), $"n_nodes", $"n_edges", $"min_core_degree")
    }.reduce(_ unionByName _)
  }

  val kcoreCurveOracle: String = {
    def chain(k: Int): String = {
      val p = s"kc$k"
      (1 to kcoreRounds).map { r =>
        s""", ${p}_k$r AS MATERIALIZED (
             SELECT n FROM (
               SELECT n, COUNT(1) AS deg FROM (
                 SELECT u AS n FROM ${p}_e${r - 1} UNION ALL SELECT v FROM ${p}_e${r - 1})
               GROUP BY 1)
             WHERE deg >= $k),
           ${p}_e$r AS MATERIALIZED (
             SELECT e.u, e.v FROM ${p}_e${r - 1} e
             JOIN ${p}_k$r a ON a.n = e.u
             JOIN ${p}_k$r b ON b.n = e.v)"""
      }.mkString(s""", ${p}_e0 AS MATERIALIZED (
           SELECT u, v FROM kcc_und)""", "", "")
    }
    def stats(k: Int): String =
      s"""SELECT CAST($k AS BIGINT) AS k,
                CAST(COUNT(1) AS BIGINT) AS n_nodes,
                (SELECT CAST(COUNT(1) AS BIGINT) FROM kc${k}_e$kcoreRounds) AS n_edges,
                CAST(COALESCE(MIN(deg), 0) AS BIGINT) AS min_core_degree
         FROM (SELECT n, COUNT(1) AS deg FROM (
                 SELECT u AS n FROM kc${k}_e$kcoreRounds
                 UNION ALL SELECT v FROM kc${k}_e$kcoreRounds)
               GROUP BY 1)"""
    Fixtures.oracle(influenceEdgeCtes("kcc_") +
      s""",
       kcc_und AS MATERIALIZED (
         SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         FROM kcc_edges)""" +
      kcoreCurveKs.map(chain).mkString +
      kcoreCurveKs.map(stats).mkString(" UNION ALL "))
  }

  val kcoreOracle: String = {
    val rounds = (1 to kcoreRounds).map { r =>
      s""", kc_k$r AS MATERIALIZED (
           SELECT n FROM (
             SELECT n, COUNT(1) AS deg FROM (
               SELECT u AS n FROM kc_e${r - 1} UNION ALL SELECT v FROM kc_e${r - 1})
             GROUP BY 1)
           WHERE deg >= $kcoreK),
         kc_e$r AS MATERIALIZED (
           SELECT e.u, e.v FROM kc_e${r - 1} e
           JOIN kc_k$r a ON a.n = e.u
           JOIN kc_k$r b ON b.n = e.v)"""
    }.mkString
    Fixtures.oracle(influenceEdgeCtes("kc_") +
      s""",
       kc_e0 AS MATERIALIZED (
         SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         FROM kc_edges)""" + rounds +
      s"""
       SELECT n AS user_id, CAST(COUNT(1) AS BIGINT) AS core_degree
       FROM (SELECT u AS n FROM kc_e$kcoreRounds
             UNION ALL SELECT v FROM kc_e$kcoreRounds)
       GROUP BY 1""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_kcore" -> (kcore _),
    "events_kcore_curve" -> (kcoreCurve _),
    "events_cc_bigstar" -> (ccBigstar _),
    "events_markov_transitions" -> (markovTransitions _),
    "events_hits_scores" -> (hitsScores _),
    "events_distinct_hll" -> (distinctHll _),
    "events_label_propagation" -> (labelPropagation _),
    "privacy_k_anon" -> (kAnonymity _),
    "privacy_l_diversity" -> (lDiversity _),
    "events_triangle_count" -> (triangleCount _),
    "events_basket_rules" -> (basketRules _),
    "events_hist_quantiles" -> (histQuantiles _),
    "events_bot_flags" -> (botFlags _),
    "events_ewma_trend" -> (ewmaTrend _),
    "layout_zorder_key" -> (zorderKey _),
    "events_user_pagerank" -> (userPagerank _),
    "events_sessionization" -> (sessionize _),
    "events_json_props" -> (jsonProps _),
    "events_anomaly_zscore" -> (anomalyZscore _),
    "events_asof_last_purchase" -> (asofLastPurchase _),
    "events_click_follow" -> (clickFollow _),
    "events_cohort_sets" -> (cohortSets _),
    "events_daily_rollup" -> (dailyRollup _),
    "events_value_quartiles" -> (valueQuartiles _),
    "events_user_daily" -> (userDaily _),
    "events_retention" -> (retention _),
    "events_top_amounts_per_user" -> (topAmountsPerUser _),
    "events_funnel" -> (funnel _))

  val oracles: Map[String, String] = Map(
    "events_kcore" -> kcoreOracle,
    "events_kcore_curve" -> kcoreCurveOracle,
    "events_cc_bigstar" -> ccBigstarOracle,
    "events_markov_transitions" -> markovTransitionsOracle,
    "events_hits_scores" -> hitsScoresOracle,
    "events_distinct_hll" -> distinctHllOracle,
    "events_label_propagation" -> labelPropagationOracle,
    "privacy_k_anon" -> kAnonymityOracle,
    "privacy_l_diversity" -> lDiversityOracle,
    "events_triangle_count" -> triangleCountOracle,
    "events_basket_rules" -> basketRulesOracle,
    "events_hist_quantiles" -> histQuantilesOracle,
    "events_bot_flags" -> botFlagsOracle,
    "events_ewma_trend" -> ewmaTrendOracle,
    "layout_zorder_key" -> zorderKeyOracle,
    "events_user_pagerank" -> userPagerankOracle,
    "events_sessionization" -> sessionizeOracle,
    "events_json_props" -> jsonPropsOracle,
    "events_anomaly_zscore" -> anomalyZscoreOracle,
    "events_asof_last_purchase" -> asofLastPurchaseOracle,
    "events_click_follow" -> clickFollowOracle,
    "events_cohort_sets" -> cohortSetsOracle,
    "events_daily_rollup" -> dailyRollupOracle,
    "events_value_quartiles" -> valueQuartilesOracle,
    "events_user_daily" -> userDailyOracle,
    "events_retention" -> retentionOracle,
    "events_top_amounts_per_user" -> topAmountsPerUserOracle,
    "events_funnel" -> funnelOracle)
}
