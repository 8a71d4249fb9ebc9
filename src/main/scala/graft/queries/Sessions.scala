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
  def userPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val S = 1000000000000L

    val ev = spark.table("ek")
      .select($"user_id", $"seq", $"event_type", ($"btime" + ($"seq" % 8) * 15).as("t"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("src"), $"t")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("dst_user"), $"t".as("ct"))

    val edges = graft.operators.BinnedRange
      .pointsInWindow(purchases, clicks, "t", "ct", 1, 240, Seq("dst_user"))
      .filter($"src" =!= $"dst_user")
      .select($"src", $"dst_user".as("dst"))
      .distinct()
      .localCheckpoint()

    val nodes = edges.select($"src".as("u")).union(edges.select($"dst".as("u"))).distinct()
    val outDeg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val nRow = nodes.agg(count(lit(1)).as("n"))

    var ranks = nodes.crossJoin(broadcast(nRow))
      .select($"u", expr(s"$S DIV n").as("r"))
    for (_ <- 1 to 5) {
      val contrib = edges
        .join(ranks.withColumnRenamed("u", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select($"dst".as("u"), expr("r DIV deg").as("c"))
        .groupBy($"u").agg(sum($"c").as("contrib"))
      ranks = nodes.crossJoin(broadcast(nRow))
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
    """, pr_ev AS (SELECT user_id, seq, event_type, btime + (seq % 8) * 15 AS t FROM ek),
       pr_edges AS (
         SELECT DISTINCT p.user_id AS src, c.user_id AS dst
         FROM pr_ev p JOIN pr_ev c
           ON c.event_type = 'click' AND c.t >= p.t + 1 AND c.t <= p.t + 240
         WHERE p.event_type = 'purchase' AND p.user_id <> c.user_id),
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
        // lift numerator n_ab·n_users·10⁴ overflows Long once both factors
        // pass ~10⁸ users — widen to DECIMAL(38) (HUGEINT on the oracle
        // side) so the engines stay bit-exact instead of diverging on wrap
        expr("CAST((CAST(n_ab AS DECIMAL(38,0)) * n_users * 10000)" +
          " DIV (n_a * n_b) AS BIGINT)").as("lift_bp"))
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
                   // (sa.n_i * sb.n_i) AS BIGINT) AS lift_bp
       FROM br_ps p
       JOIN br_supp sa ON p.a = sa.item
       JOIN br_supp sb ON p.b = sb.item
       CROSS JOIN br_n n
       WHERE p.n_ab * 1000 >= n.n_users""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
