package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Rollups

/** Incremental analytical-refresh leg (T6): maintains the four hourly rollup
  * tables as hour-partitioned parquet, rewriting ONLY the partitions inside
  * the refresh window — the Spark re-expression of the reference's
  * `INSERT ... ON CONFLICT DO UPDATE ... WHERE hour >= since` refresh that
  * runs for all four tables on every analytical tick (index.ts:71-102,
  * dao.ts:1617-1787).
  *
  * Mechanics per tick:
  *  - the refresh window starts `lookBackHours` BEFORE the previous tick's
  *    watermark (the reference's 2× look-back: rows that landed in an
  *    already-refreshed hour after the watermark advanced — same-hour
  *    stragglers of the cadence — get re-aggregated on the next tick);
  *  - each rollup recomputes `hour >= since` only (the predicate lands below
  *    the aggregate, see [[Rollups.hourlyVolumeByTokenSince]]) and writes
  *    with DYNAMIC partition overwrite on `hour`: partitions inside the
  *    window are replaced wholesale, older partitions are never read or
  *    written — at 100 TB the tick costs O(look-back window), not O(history);
  *  - the first tick (no watermark) materializes the full history once.
  *
  * The watermark is the dataset clock (MAX(blocks.time) hour) at tick time —
  * the streaming cursor's block time in a live deployment.
  *
  * Like the reference's upsert, the overwrite never deletes a whole hour
  * that lost ALL its rows: that only happens under reorg, which is handled
  * by [[StreamDriver.retract]] upstream (the retracted facts disappear from
  * the source, and the next tick's window covers the reorged hours because
  * reorg depth < look-back in practice; a deeper reorg warrants a one-off
  * full rebuild, same as the reference).
  */
final class RollupRefresher(
    spark: SparkSession,
    sfDir: String,
    outRoot: String,
    lookBackHours: Long = 2L) {

  /** The four rollup tables and their incremental builders. */
  private val rollups: Seq[(String, Long => DataFrame)] = Seq(
    ("hourly_volume_by_token", s => Rollups.hourlyVolumeByTokenSince(spark, sfDir, s)),
    ("hourly_revenue_by_token", s => Rollups.hourlyRevenueByTokenSince(spark, sfDir, s)),
    ("hourly_price_data", s => Rollups.hourlyPriceDataSince(spark, sfDir, s)),
    ("hourly_tvl_delta_by_token", s => Rollups.hourlyTvlDeltaByTokenSince(spark, sfDir, s)))

  @volatile private var watermark: Option[Long] = None

  /** Watermark hours refreshed so far (None until the first tick). */
  def currentWatermark: Option[Long] = watermark

  /** One analytical tick. Returns the `since` bound used (Long.MinValue on
    * the initial full materialization). */
  def refresh(): Long = {
    val since = watermark.map(_ - lookBackHours * 3600L).getOrElse(Long.MinValue)
    rollups.foreach { case (name, build) =>
      build(since)
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("hour")
        .parquet(s"$outRoot/$name")
    }
    // advance to the dataset clock: the max hour any fact can have reached
    val clock = spark.table("blocks")
      .agg(max(col("time") - col("time") % 3600)).collect()(0)
    if (!clock.isNullAt(0)) watermark = Some(clock.getLong(0))
    since
  }

  /** Read back a maintained rollup table. */
  def table(name: String): DataFrame = spark.read.parquet(s"$outRoot/$name")

  /** Adapter for [[StreamDriver]]'s analytical tier:
    * `new StreamDriver(..., onAnalyticalRefresh = refresher.hook)`. */
  def hook: Long => Unit = _ => refresh()
}
