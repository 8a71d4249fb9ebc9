package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures

/** The two math-heavy analytical views: token_pair_realized_volatility
  * (dao.ts:1038-1083) and pool_market_depth (dao.ts:1085-1207).
  *
  * Cross-engine determinism: transcendental results (LN/POWER) can differ by
  * 1 ulp between libm implementations, so every such per-row value is rounded
  * into a DECIMAL before any aggregation (order-independent exact sums), and
  * shared constants (ln(1.000001), the 41-step depth ladder, per-fee tick
  * widths) are computed once on the JVM and emitted as literals into both the
  * Spark plan and the DuckDB oracle text.
  */
object Analytics {

  private val dec38 = DecimalType(38, 0)

  /** ln(1.000001), the tick log base (dao.ts:1075,1137). */
  private val lnTickBase: Double = math.log(1.000001)

  /** Depth ladder: POWER(1.21, n) * 0.00005 for n in 0..40 (dao.ts:1086-1088)
    * with depth_in_ticks = floor(ln(1+d)/ln(1.000001)) (dao.ts:1137). */
  private val depthLadder: Seq[(Double, Int)] = (0 to 40).map { n =>
    val d = math.pow(1.21, n) * 0.00005
    (d, math.floor(math.log1p(d) / lnTickBase).toInt)
  }

  /** fee_in_ticks = ceil(log10(1 + fee/2^128) / log10(1.000001)) per fee tier
    * (dao.ts:1138-1139), precomputed for the four fixture fee constants. */
  private val feeInTicks: Seq[(String, Int)] = Seq(
    "34028236692093846346337460743176821",
    "170141183460469231731687303715884105",
    "1020847100762815390390123822295304634",
    "1701411834604692317316873037158841057").map { feeStr =>
    val feeD = new java.math.BigDecimal(feeStr).doubleValue / math.pow(2.0, 128)
    (feeStr, math.ceil(math.log10(1.0 + feeD) / math.log10(1.000001)).toInt)
  }

  // =====================================================================
  // token_pair_realized_volatility (dao.ts:1038-1083)
  // =====================================================================

  def realizedVolatility(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val now = spark.table("blocks").agg(max($"time").as("now"))
    val hpd = Rollups.hourlyPriceData(spark, sfDir).crossJoin(broadcast(now))

    // log price per hour, rounded into decimal to absorb libm ulp
    val prices = hpd
      .filter($"k_volume" =!= 0 &&
        $"hour".between($"now" - 604800L, $"now"))
      .select($"token0", $"token1", $"hour",
        log($"total".cast(DoubleType) / $"k_volume".cast(DoubleType))
          .cast(DecimalType(30, 15)).as("log_price"))

    val w = Window.partitionBy($"token0", $"token1").orderBy($"hour")
    val changes = prices
      .withColumn("prev", lag($"log_price", 1).over(w))
      .filter($"prev".isNotNull)
      .withColumn("price_change", ($"log_price" - $"prev").cast(DoubleType))

    changes.groupBy($"token0", $"token1")
      .agg(
        count(lit(1)).as("observation_count"),
        sqrt(sum(($"price_change" * $"price_change").cast(DecimalType(38, 18)))
          .cast(DoubleType)).as("realized_volatility"))
      .filter($"realized_volatility".isNotNull)
      .select($"token0", $"token1", $"realized_volatility", $"observation_count",
        floor($"realized_volatility" / lit(lnTickBase)).cast(LongType)
          .as("volatility_in_ticks"))
  }

  val realizedVolatilityOracle: String = Fixtures.oracle(
    Rollups.hourlyPriceCtes +
      s""", now_t AS (SELECT MAX(time) AS now FROM blocks),
       prices AS (
         SELECT token0, token1, hour,
                CAST(LN(CAST(total AS DOUBLE) / CAST(k_volume AS DOUBLE)) AS DECIMAL(30,15)) AS log_price
         FROM hourly_price_cte
         WHERE k_volume != 0
           AND hour BETWEEN (SELECT now FROM now_t) - 604800 AND (SELECT now FROM now_t)),
       changes AS (
         SELECT token0, token1,
                CAST(log_price - LAG(log_price) OVER (PARTITION BY token0, token1 ORDER BY hour) AS DOUBLE) AS price_change
         FROM prices),
       rv AS (
         SELECT token0, token1,
                COUNT(1) AS observation_count,
                SQRT(CAST(SUM(CAST(price_change * price_change AS DECIMAL(38,18))) AS DOUBLE)) AS realized_volatility
         FROM changes WHERE price_change IS NOT NULL
         GROUP BY token0, token1)
       SELECT token0, token1, realized_volatility, observation_count,
              CAST(FLOOR(realized_volatility / $lnTickBase) AS BIGINT) AS volatility_in_ticks
       FROM rv WHERE realized_volatility IS NOT NULL""")

  // =====================================================================
  // pool_market_depth (dao.ts:1085-1207)
  // =====================================================================

  def poolMarketDepth(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val swaps = spark.table("swaps")
    val pools = spark.table("pool_keys")
    val blocks = spark.table("blocks").select($"number", $"time")

    // block_number = blockOf(event_id) is a pure projection (dao.ts:124
    // packing) — only the broadcast block-dimension join remains
    val swapsPk = swaps.filter($"liquidity_after" =!= 0)
      .join(broadcast(pools.select($"key_hash", $"token0", $"token1")),
        $"pool_key_hash" === $"key_hash")

    // last swap time per token pair (dao.ts:1096-1122)
    val lastSwapTime = swapsPk
      .groupBy($"token0", $"token1").agg(max($"event_id").as("last_id"))
      .withColumn("block_number", graft.ingest.Ingest.blockOf($"last_id"))
      .join(broadcast(blocks), $"block_number" === $"number")
      .select($"token0", $"token1", $"time".as("last_time"))

    // exact median tick over the trailing hour (dao.ts:1113-1130)
    val medianTicks = swapsPk
      .withColumn("block_number", graft.ingest.Ingest.blockOf($"event_id"))
      .join(broadcast(blocks), $"block_number" === $"number")
      .join(broadcast(lastSwapTime), Seq("token0", "token1"))
      .filter($"time" >= $"last_time" - 3600)
      .groupBy($"token0", $"token1")
      .agg(expr("percentile(tick_after, 0.5)").as("median_tick"))

    val depths = depthLadder.toDF("depth_percent", "depth_in_ticks")
    val feeTicks = feeInTicks.toDF("fee_str", "fee_in_ticks")
      .select(col("fee_str").cast(dec38).as("fee_key"), col("fee_in_ticks"))

    // pools × 41 depth levels (J6 cross join; both sides broadcast-sized)
    val poolStates = pools
      .join(broadcast(feeTicks), $"fee" === $"fee_key")
      .crossJoin(broadcast(depths))
      .join(broadcast(medianTicks), Seq("token0", "token1"), "left")
      .select($"key_hash", $"depth_percent", $"depth_in_ticks", $"fee_in_ticks",
        round($"median_tick").cast(IntegerType).as("last_tick"))

    // cumulative liquidity over tick bounds (W5 + W4, dao.ts:1147-1153)
    val wTick = Window.partitionBy($"pool_key_hash").orderBy($"tick")
    val poolTicks = CoreViews.tickLiquidity(spark, sfDir)
      .select($"pool_key_hash", $"tick", $"net_liquidity_delta_diff")
      .withColumn("liquidity", sum($"net_liquidity_delta_diff")
        .over(wTick.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tick_end", lead($"tick", 1).over(wTick))
      .select($"pool_key_hash", $"liquidity", $"tick".as("tick_start"), $"tick_end")

    // int4range intersections as greatest/least pairs (J11, dao.ts:1155-1168);
    // LEAST ignores NULLs, so a NULL tick_end is an unbounded upper bound.
    val ranges = poolTicks
      .filter($"liquidity" =!= 0)
      .join(poolStates.filter($"fee_in_ticks" < $"depth_in_ticks"),
        $"pool_key_hash" === $"key_hash")
      .select($"pool_key_hash", $"liquidity", $"depth_percent",
        greatest($"last_tick" - $"depth_in_ticks", $"tick_start").as("lo_b"),
        least($"last_tick" - $"fee_in_ticks", $"tick_end").as("hi_b"),
        greatest($"last_tick" + $"fee_in_ticks", $"tick_start").as("lo_a"),
        least($"last_tick" + $"depth_in_ticks", $"tick_end").as("hi_a"))
      .filter($"lo_b" < $"hi_b" || $"lo_a" < $"hi_a")

    // token amounts: per-term double math → DECIMAL(38,6) to absorb pow ulp,
    // then exact sums and FLOOR (dao.ts:1170-1186)
    def pw(c: org.apache.spark.sql.Column) = pow(lit(1.0000005), c.cast(DoubleType))
    val liqD = $"liquidity".cast(DoubleType)
    val amounts = ranges
      .withColumn("term1", when($"lo_b" < $"hi_b",
        (liqD * (pw($"hi_b") - pw($"lo_b"))).cast(DecimalType(38, 6))))
      .withColumn("term0", when($"lo_a" < $"hi_a",
        (liqD * (lit(1.0) / pw($"lo_a") - lit(1.0) / pw($"hi_a"))).cast(DecimalType(38, 6))))
      .groupBy($"pool_key_hash", $"depth_percent")
      .agg(floor(sum($"term1")).cast(dec38).as("amount1"),
        floor(sum($"term0")).cast(dec38).as("amount0"))

    amounts.select(
      $"pool_key_hash",
      $"depth_percent",
      coalesce($"amount0", lit(0)).cast(LongType).as("depth0"),
      coalesce($"amount1", lit(0)).cast(LongType).as("depth1"))
  }

  val poolMarketDepthOracle: String = {
    // %.17e forces a DOUBLE literal in DuckDB (exponent-free literals parse
    // as DECIMAL and lose a ulp on the cast) and round-trips exactly.
    val depthValues = depthLadder
      .map { case (d, t) => f"($d%.17e, $t)" }.mkString(", ")
    val feeCase = feeInTicks
      .map { case (f, t) => s"WHEN CAST('$f' AS DECIMAL(38,0)) THEN $t" }
      .mkString("CASE pk.fee ", " ", " END")
    Fixtures.oracle(
      CoreViews.tickLiquidityCtes +
        s""", depth_percentages(depth_percent, depth_in_ticks) AS (
           SELECT * FROM (VALUES $depthValues) AS v(d, t)),
         swaps_pk AS (
           SELECT s.event_id, s.tick_after, pk.token0, pk.token1
           FROM swaps s JOIN pool_keys pk ON s.pool_key_hash = pk.key_hash
           WHERE s.liquidity_after != 0),
         last_swap_time AS (
           SELECT t.token0, t.token1, b.time AS last_time
           FROM (SELECT token0, token1, MAX(event_id) AS last_id
                 FROM swaps_pk GROUP BY token0, token1) t
           JOIN event_keys ek ON t.last_id = ek.id
           JOIN blocks b ON ek.block_number = b.number),
         median_ticks AS (
           SELECT sp.token0, sp.token1,
                  PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY sp.tick_after) AS median_tick
           FROM swaps_pk sp
           JOIN event_keys ek ON sp.event_id = ek.id
           JOIN blocks b ON ek.block_number = b.number
           JOIN last_swap_time lst ON sp.token0 = lst.token0 AND sp.token1 = lst.token1
           WHERE b.time >= lst.last_time - 3600
           GROUP BY sp.token0, sp.token1),
         depth_pool_states AS (
           SELECT pk.key_hash, dp.depth_percent, dp.depth_in_ticks,
                  $feeCase AS fee_in_ticks,
                  CAST(ROUND(mt.median_tick) AS INT) AS last_tick
           FROM pool_keys pk
           CROSS JOIN depth_percentages dp
           LEFT JOIN median_ticks mt ON pk.token0 = mt.token0 AND pk.token1 = mt.token1),
         pool_ticks AS (
           SELECT pool_key_hash,
                  SUM(net_liquidity_delta_diff) OVER (PARTITION BY pool_key_hash ORDER BY tick
                    ROWS UNBOUNDED PRECEDING) AS liquidity,
                  tick AS tick_start,
                  LEAD(tick) OVER (PARTITION BY pool_key_hash ORDER BY tick) AS tick_end
           FROM tick_liquidity_cte),
         ranges AS (
           SELECT pt.pool_key_hash, pt.liquidity, ps.depth_percent,
                  GREATEST(ps.last_tick - ps.depth_in_ticks, pt.tick_start) AS lo_b,
                  LEAST(ps.last_tick - ps.fee_in_ticks, pt.tick_end) AS hi_b,
                  GREATEST(ps.last_tick + ps.fee_in_ticks, pt.tick_start) AS lo_a,
                  LEAST(ps.last_tick + ps.depth_in_ticks, pt.tick_end) AS hi_a
           FROM pool_ticks pt
           JOIN depth_pool_states ps ON pt.pool_key_hash = ps.key_hash
           WHERE pt.liquidity != 0 AND ps.fee_in_ticks < ps.depth_in_ticks),
         amounts AS (
           SELECT pool_key_hash, depth_percent,
                  CAST(FLOOR(SUM(CASE WHEN lo_b < hi_b THEN CAST(CAST(liquidity AS DOUBLE)
                    * (POWER(1.0000005, CAST(hi_b AS DOUBLE)) - POWER(1.0000005, CAST(lo_b AS DOUBLE)))
                    AS DECIMAL(38,6)) END)) AS DECIMAL(38,0)) AS amount1,
                  CAST(FLOOR(SUM(CASE WHEN lo_a < hi_a THEN CAST(CAST(liquidity AS DOUBLE)
                    * (1.0 / POWER(1.0000005, CAST(lo_a AS DOUBLE)) - 1.0 / POWER(1.0000005, CAST(hi_a AS DOUBLE)))
                    AS DECIMAL(38,6)) END)) AS DECIMAL(38,0)) AS amount0
           FROM ranges
           WHERE lo_b < hi_b OR lo_a < hi_a
           GROUP BY pool_key_hash, depth_percent)
         SELECT pool_key_hash, depth_percent,
                CAST(COALESCE(amount0, 0) AS BIGINT) AS depth0,
                CAST(COALESCE(amount1, 0) AS BIGINT) AS depth1
         FROM amounts""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "token_pair_realized_volatility" -> (realizedVolatility _),
    "pool_market_depth" -> (poolMarketDepth _))

  val oracles: Map[String, String] = Map(
    "token_pair_realized_volatility" -> realizedVolatilityOracle,
    "pool_market_depth" -> poolMarketDepthOracle)
}
