package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.CoreViews

/** Hand-built-frame semantics of the core views (SURVEY.md §5):
  * pool_states fallback rules (dao.ts:387-417) and tick-liquidity
  * cancellation (dao.ts:475-499). */
class ViewSemanticsSpec extends SparkSpec {

  private def dec(v: Long) = new java.math.BigDecimal(v)

  private lazy val emptySwaps = {
    import spark.implicits._
    Seq.empty[(String, java.math.BigDecimal, Long, java.math.BigDecimal, Double, Long)]
      .toDF("pool_key_hash", "liquidity_after", "event_id", "x", "sqrt_ratio_after", "tick_after")
      .select($"event_id", $"pool_key_hash", $"sqrt_ratio_after", $"tick_after", $"liquidity_after")
  }

  test("pool_states falls back to initialization when no swaps (dao.ts:387-390)") {
    import spark.implicits._
    val pools = Seq("p1").toDF("key_hash")
    val inits = Seq((10L, "p1", 42L, 1.5e38))
      .toDF("event_id", "pool_key_hash", "tick", "sqrt_ratio")
    val updates = Seq.empty[(Long, String, Long, Long, java.math.BigDecimal)]
      .toDF("event_id", "pool_key_hash", "lower_bound", "upper_bound", "liquidity_delta")

    val out = CoreViews.poolStatesFrom(spark, pools, emptySwaps, inits, updates).collect().head
    assert(out.getAs[Long]("tick") == 42L)
    assert(out.getAs[Double]("sqrt_ratio") == 1.5e38)
    assert(out.getAs[java.math.BigDecimal]("liquidity").longValueExact() == 0L)
    assert(out.getAs[Long]("last_event_id") == 10L)
  }

  test("pool_states counts only straddling post-swap deltas (dao.ts:407-417)") {
    import spark.implicits._
    val pools = Seq("p1").toDF("key_hash")
    val swaps = Seq((100L, "p1", dec(500), 3.0e38, 50L))
      .toDF("event_id", "pool_key_hash", "liquidity_after", "sqrt_ratio_after", "tick_after")
    val inits = Seq((10L, "p1", 0L, 1.0e38))
      .toDF("event_id", "pool_key_hash", "tick", "sqrt_ratio")
    val updates = Seq(
      (90L, "p1", 0L, 100L, dec(111)),   // before last swap: ignored
      (110L, "p1", 0L, 100L, dec(7)),    // after, straddles tick 50: counted
      (120L, "p1", 60L, 100L, dec(13)))  // after, does not straddle: ignored
      .toDF("event_id", "pool_key_hash", "lower_bound", "upper_bound", "liquidity_delta")

    val out = CoreViews.poolStatesFrom(spark, pools, swaps, inits, updates).collect().head
    assert(out.getAs[java.math.BigDecimal]("liquidity").longValueExact() == 507L)
    assert(out.getAs[Long]("last_event_id") == 120L)
    assert(out.getAs[Long]("last_liquidity_update_event_id") == 120L)
  }

  test("tick liquidity cancels to zero on full withdrawal (dao.ts:498)") {
    import spark.implicits._
    val updates = Seq(
      (1L, "p1", 0L, 100L, dec(50)),
      (2L, "p1", 0L, 100L, dec(-50)),  // full withdrawal: both bounds cancel
      (3L, "p1", 200L, 300L, dec(9)))
      .toDF("event_id", "pool_key_hash", "lower_bound", "upper_bound", "liquidity_delta")

    val rows = CoreViews.tickLiquidityFrom(spark, updates)
      .orderBy("tick").collect()
    // ticks 0/100 cancelled entirely; only the open 200/300 position remains
    assert(rows.map(_.getAs[Long]("tick")).toSeq == Seq(200L, 300L))
    assert(rows.map(_.getAs[java.math.BigDecimal]("net_liquidity_delta_diff").longValueExact()).toSeq
      == Seq(9L, -9L))
  }
}
