package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures

/** Hourly analytical rollups (dao.ts:1544-1796).
  *
  * The reference maintains these incrementally (`INSERT ... ON CONFLICT DO
  * UPDATE` for hours ≥ watermark). Here each is a pure recompute pipeline —
  * the incremental path at scale is a `replaceWhere`-style dynamic partition
  * overwrite of `hour >= watermark` (see graft.streaming), which reuses these
  * same builders with a filtered input.
  *
  * Scale notes: `pool_keys` and `blocks` are broadcast (dimension-sized);
  * the only shuffle per rollup is the final (key, hour, token) aggregate,
  * which gets a map-side partial. Hours are BIGINT epoch-second buckets
  * (`time - time % 3600` ≡ DATE_TRUNC('hour'), dao.ts:1549).
  */
object Rollups {

  private val dec38 = DecimalType(38, 0)
  private val dec30 = DecimalType(30, 0)

  /** 2^128 (Q128 fixed-point divisor of the fee math, dao.ts:1552-1554). */
  private val two128 = lit(3.402823669209385e38)

  /** Facts joined to (pool_keys ⋈ event_keys ⋈ blocks) with an hour column. */
  private def withHour(spark: SparkSession, fact: DataFrame, keyCol: String): DataFrame = {
    val pools = spark.table("pool_keys")
    val ek = spark.table("event_keys").select(col("id"), col("block_number"))
    val blocks = spark.table("blocks").select(col("number"), col("time"))
    fact
      .join(broadcast(pools), fact(keyCol) === pools("key_hash"))
      .join(ek, fact("event_id") === ek("id"))
      .join(broadcast(blocks), ek("block_number") === blocks("number"))
      .withColumn("hour", col("time") - col("time") % 3600)
  }

  /** hourly_volume_by_token (dao.ts:1545-1615): swap volume + swap fees +
    * accumulated fees per (pool, hour, token side). */
  def hourlyVolumeByToken(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val swapData = withHour(spark, spark.table("swaps"), "pool_key_hash")
      .select(
        $"pool_key_hash".as("key_hash"),
        $"hour",
        when($"delta0" >= 0, $"token0").otherwise($"token1").as("token"),
        when($"delta0" >= 0, $"delta0").otherwise($"delta1").as("vol"),
        $"fee".cast(DoubleType).as("fee_d"))
      // FLOOR(amount * fee / 2^128) — Q128 fixed-point fee (dao.ts:1552-1554),
      // computed in double (exact for fixture magnitudes), floored per row.
      .withColumn("fee_amt", floor($"vol".cast(DoubleType) * $"fee_d" / two128))
      .groupBy($"key_hash", $"hour", $"token")
      .agg(
        sum($"vol").cast(dec30).as("volume"),
        sum($"fee_amt").cast(dec30).as("fees"),
        count(lit(1)).as("swap_count"))

    val fa = withHour(spark, spark.table("fees_accumulated"), "pool_key_hash")
    val fees0 = fa.filter($"amount0" > 0)
      .groupBy($"pool_key_hash".as("key_hash"), $"hour", $"token0".as("token"))
      .agg(lit(0).cast(dec30).as("volume"), sum($"amount0").cast(dec30).as("fees"),
        lit(0L).as("swap_count"))
    val fees1 = fa.filter($"amount1" > 0)
      .groupBy($"pool_key_hash".as("key_hash"), $"hour", $"token1".as("token"))
      .agg(lit(0).cast(dec30).as("volume"), sum($"amount1").cast(dec30).as("fees"),
        lit(0L).as("swap_count"))

    swapData.unionByName(fees0).unionByName(fees1)
      .groupBy($"key_hash", $"hour", $"token")
      .agg(
        sum($"volume").cast(dec38).as("volume"),
        sum($"fees").cast(dec38).as("fees"),
        sum($"swap_count").cast(LongType).as("swap_count"))
  }

  val hourlyVolumeByTokenOracle: String = Fixtures.oracle(
    """, swap_data AS (
         SELECT s.pool_key_hash AS key_hash,
                b.time - b.time % 3600 AS hour,
                CASE WHEN s.delta0 >= 0 THEN pk.token0 ELSE pk.token1 END AS token,
                CAST(SUM(CASE WHEN s.delta0 >= 0 THEN s.delta0 ELSE s.delta1 END) AS DECIMAL(30,0)) AS volume,
                CAST(SUM(CAST(FLOOR(CAST(CASE WHEN s.delta0 >= 0 THEN s.delta0 ELSE s.delta1 END AS DOUBLE)
                          * CAST(pk.fee AS DOUBLE) / 3.402823669209385e38) AS BIGINT)) AS DECIMAL(30,0)) AS fees,
                COUNT(1) AS swap_count
         FROM swaps s
         JOIN pool_keys pk ON s.pool_key_hash = pk.key_hash
         JOIN event_keys ek ON s.event_id = ek.id
         JOIN blocks b ON ek.block_number = b.number
         GROUP BY 1, 2, 3),
       fees_token0 AS (
         SELECT fa.pool_key_hash AS key_hash,
                b.time - b.time % 3600 AS hour,
                pk.token0 AS token,
                CAST(0 AS DECIMAL(30,0)) AS volume,
                CAST(SUM(fa.amount0) AS DECIMAL(30,0)) AS fees,
                CAST(0 AS BIGINT) AS swap_count
         FROM fees_accumulated fa
         JOIN pool_keys pk ON fa.pool_key_hash = pk.key_hash
         JOIN event_keys ek ON fa.event_id = ek.id
         JOIN blocks b ON ek.block_number = b.number
         WHERE fa.amount0 > 0
         GROUP BY 1, 2, 3),
       fees_token1 AS (
         SELECT fa.pool_key_hash AS key_hash,
                b.time - b.time % 3600 AS hour,
                pk.token1 AS token,
                CAST(0 AS DECIMAL(30,0)) AS volume,
                CAST(SUM(fa.amount1) AS DECIMAL(30,0)) AS fees,
                CAST(0 AS BIGINT) AS swap_count
         FROM fees_accumulated fa
         JOIN pool_keys pk ON fa.pool_key_hash = pk.key_hash
         JOIN event_keys ek ON fa.event_id = ek.id
         JOIN blocks b ON ek.block_number = b.number
         WHERE fa.amount1 > 0
         GROUP BY 1, 2, 3),
       combined_data AS (
         SELECT * FROM swap_data
         UNION ALL SELECT * FROM fees_token0
         UNION ALL SELECT * FROM fees_token1)
       SELECT key_hash, hour, token,
              CAST(SUM(volume) AS DECIMAL(38,0)) AS volume,
              CAST(SUM(fees) AS DECIMAL(38,0)) AS fees,
              CAST(SUM(swap_count) AS BIGINT) AS swap_count
       FROM combined_data
       GROUP BY key_hash, hour, token""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hourly_volume_by_token" -> (hourlyVolumeByToken _))

  val oracles: Map[String, String] = Map(
    "hourly_volume_by_token" -> hourlyVolumeByTokenOracle)
}
