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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_sessionization" -> (sessionize _),
    "events_user_daily" -> (userDaily _))

  val oracles: Map[String, String] = Map(
    "events_sessionization" -> sessionizeOracle,
    "events_user_daily" -> userDailyOracle)
}
