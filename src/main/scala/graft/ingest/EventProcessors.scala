package graft.ingest

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.decode.FeltDecode
import graft.decode.FeltDecode.{Felts, Res}

/** The event-processor registry (S1/S2/S3, SURVEY §2.1): each processor is a
  * server-side filter `(emitter, keys[0])` plus a typed felt-array decoder
  * producing fact-shaped rows (eventProcessors.ts:77-494, here the CORE
  * contract family; remaining contract families decode the same way).
  *
  * Spark-first fan-out: one scan of the raw event batch, one `filter` per
  * processor (Catalyst pushes the emitter/selector equality to the source),
  * then a typed per-partition decode. The output columns mirror the fact
  * tables the dao insert methods write (dao.ts:1895-2395).
  */
object EventProcessors {

  /** One registered processor. `contract` is the logical emitting contract
    * (resolved to an address per deployment, like the reference's env vars
    * CORE_ADDRESS / NFT_ADDRESS / TWAMM_ADDRESS / STAKER_ADDRESS ...). */
  final case class Processor(
      name: String,
      contract: String,
      keySelector: String,
      schema: StructType,
      decode: Felts => Row)

  private def hex(v: BigInt): String = "0x" + v.toString(16)
  private def dec(v: BigInt): java.math.BigDecimal = new java.math.BigDecimal(v.bigInteger)

  private val poolKeyFields = Seq(
    StructField("token0", StringType), StructField("token1", StringType),
    StructField("fee", DecimalType(38, 0)), StructField("tick_spacing", IntegerType),
    StructField("extension", StringType))

  /** Swapped (events/core.ts:73-82, selector 0x157717...9a870). */
  val swapped: Processor = Processor(
    "swaps", "core",
    "0x157717768aca88da4ac4279765f09f4d0151823d573537fbbeb950cdbd9a870",
    StructType(StructField("locker", StringType) +: poolKeyFields ++: Seq(
      StructField("delta0", DecimalType(38, 0)), StructField("delta1", DecimalType(38, 0)),
      StructField("sqrt_ratio_after", StringType), StructField("tick_after", IntegerType),
      StructField("liquidity_after", DecimalType(38, 0)))),
    data => {
      val locker = FeltDecode.parseAddress(data, 0)
      val pk = FeltDecode.parsePoolKey(data, locker.next)
      // swap params (amount i129, is_token1 bool, sqrt_ratio_limit u256,
      // skip_ahead u128) are consumed but not stored (dao.ts:2210-2247)
      val amount = FeltDecode.parseI129(data, pk.next)
      val isToken1 = FeltDecode.parseBoolean(data, amount.next)
      val limit = FeltDecode.parseU256(data, isToken1.next)
      val skip = FeltDecode.parseU128(data, limit.next)
      val d0 = FeltDecode.parseI129(data, skip.next)
      val d1 = FeltDecode.parseI129(data, d0.next)
      val sra = FeltDecode.parseU256(data, d1.next)
      val tick = FeltDecode.parseI129(data, sra.next)
      val liq = FeltDecode.parseU128(data, tick.next)
      val k = pk.value
      Row(hex(locker.value), hex(k.token0), hex(k.token1), dec(k.fee),
        k.tickSpacing.toInt, hex(k.extension), dec(d0.value), dec(d1.value),
        hex(sra.value), tick.value.toInt, dec(liq.value))
    })

  /** PositionUpdated (events/core.ts:24-45, selector 0x03a7ad...946e). */
  val positionUpdated: Processor = Processor(
    "position_updates", "core",
    "0x03a7adca3546c213ce791fabf3b04090c163e419c808c9830fb343a4a395946e",
    StructType(StructField("locker", StringType) +: poolKeyFields ++: Seq(
      StructField("salt", StringType),
      StructField("lower_bound", IntegerType), StructField("upper_bound", IntegerType),
      StructField("liquidity_delta", DecimalType(38, 0)),
      StructField("delta0", DecimalType(38, 0)), StructField("delta1", DecimalType(38, 0)))),
    data => {
      val locker = FeltDecode.parseAddress(data, 0)
      val pk = FeltDecode.parsePoolKey(data, locker.next)
      val salt = FeltDecode.parseU128(data, pk.next)
      val lower = FeltDecode.parseI129(data, salt.next)
      val upper = FeltDecode.parseI129(data, lower.next)
      val liqD = FeltDecode.parseI129(data, upper.next)
      val d0 = FeltDecode.parseI129(data, liqD.next)
      val d1 = FeltDecode.parseI129(data, d0.next)
      val k = pk.value
      Row(hex(locker.value), hex(k.token0), hex(k.token1), dec(k.fee),
        k.tickSpacing.toInt, hex(k.extension), hex(salt.value),
        lower.value.toInt, upper.value.toInt, dec(liqD.value),
        dec(d0.value), dec(d1.value))
    })

  /** PoolInitialized (events/core.ts:83-90, selector 0x025ccf...5f1). */
  val poolInitialized: Processor = Processor(
    "pool_initializations", "core",
    "0x025ccf80ee62b2ca9b97c76ccea317c7f450fd6efb6ed6ea56da21d7bb9da5f1",
    StructType(poolKeyFields ++ Seq(
      StructField("tick", IntegerType), StructField("sqrt_ratio", StringType))),
    data => {
      val pk = FeltDecode.parsePoolKey(data, 0)
      val tick = FeltDecode.parseI129(data, pk.next)
      val sr = FeltDecode.parseU256(data, tick.next)
      val k = pk.value
      Row(hex(k.token0), hex(k.token1), dec(k.fee), k.tickSpacing.toInt,
        hex(k.extension), tick.value.toInt, hex(sr.value))
    })

  /** FeesAccumulated (events/core.ts:101-108, selector 0x0237e5...57aa). */
  val feesAccumulated: Processor = Processor(
    "fees_accumulated", "core",
    "0x0237e5e0677822acfc9117ed0f7ba4810b2c6b539a2359e8d73f9025d56957aa",
    StructType(poolKeyFields ++ Seq(
      StructField("amount0", DecimalType(38, 0)), StructField("amount1", DecimalType(38, 0)))),
    data => {
      val pk = FeltDecode.parsePoolKey(data, 0)
      val a0 = FeltDecode.parseU128(data, pk.next)
      val a1 = FeltDecode.parseU128(data, a0.next)
      val k = pk.value
      Row(hex(k.token0), hex(k.token1), dec(k.fee), k.tickSpacing.toInt,
        hex(k.extension), dec(a0.value), dec(a1.value))
    })

  /** ProtocolFeesWithdrawn (events/core.ts:59-66, selector 0x291697...24a). */
  val protocolFeesWithdrawn: Processor = Processor(
    "protocol_fees_withdrawn", "core",
    "0x291697c8230383d5c3cc8dc39443356a7da6b0735605fb0ee0f7bfbb7b824a",
    StructType(Seq(
      StructField("recipient", StringType), StructField("token", StringType),
      StructField("amount", DecimalType(38, 0)))),
    data => {
      val rec = FeltDecode.parseAddress(data, 0)
      val tok = FeltDecode.parseAddress(data, rec.next)
      val amt = FeltDecode.parseU128(data, tok.next)
      Row(hex(rec.value), hex(tok.value), dec(amt.value))
    })

  /** TWAMM OrderUpdated (events/twamm.ts:22-28, selector 0xb670ed...359e). */
  val orderUpdated: Processor = Processor(
    "twamm_order_updates", "twamm",
    "0xb670ed7b7ee8ccb350963a7dea39493daff6e7a43ab021a0e4ac2d652d359e",
    StructType(Seq(
      StructField("owner", StringType), StructField("salt", StringType),
      StructField("sell_token", StringType), StructField("buy_token", StringType),
      StructField("fee", DecimalType(38, 0)),
      StructField("start_time", LongType), StructField("end_time", LongType),
      StructField("sale_rate_delta", DecimalType(38, 0)))),
    data => {
      val owner = FeltDecode.parseAddress(data, 0)
      val salt = FeltDecode.parseFelt252(data, owner.next)
      val sell = FeltDecode.parseAddress(data, salt.next)
      val buy = FeltDecode.parseAddress(data, sell.next)
      val fee = FeltDecode.parseU128(data, buy.next)
      val st = FeltDecode.parseU64(data, fee.next)
      val et = FeltDecode.parseU64(data, st.next)
      val srd = FeltDecode.parseI129(data, et.next)
      Row(hex(owner.value), hex(salt.value), hex(sell.value), hex(buy.value),
        dec(fee.value), st.value.toLong, et.value.toLong, dec(srd.value))
    })

  /** TWAMM OrderProceedsWithdrawn (events/twamm.ts:30-36, 0x3e0741...89b5). */
  val orderProceedsWithdrawn: Processor = Processor(
    "twamm_proceeds_withdrawals", "twamm",
    "0x3e074150c5906b2e323cea942b41f67f3639fcae5dc1fe4cf19c6801dff89b5",
    StructType(Seq(
      StructField("owner", StringType), StructField("salt", StringType),
      StructField("sell_token", StringType), StructField("buy_token", StringType),
      StructField("fee", DecimalType(38, 0)),
      StructField("start_time", LongType), StructField("end_time", LongType),
      StructField("amount", DecimalType(38, 0)))),
    data => {
      val owner = FeltDecode.parseAddress(data, 0)
      val salt = FeltDecode.parseFelt252(data, owner.next)
      val sell = FeltDecode.parseAddress(data, salt.next)
      val buy = FeltDecode.parseAddress(data, sell.next)
      val fee = FeltDecode.parseU128(data, buy.next)
      val st = FeltDecode.parseU64(data, fee.next)
      val et = FeltDecode.parseU64(data, st.next)
      val amt = FeltDecode.parseU128(data, et.next)
      Row(hex(owner.value), hex(salt.value), hex(sell.value), hex(buy.value),
        dec(fee.value), st.value.toLong, et.value.toLong, dec(amt.value))
    })

  /** TWAMM VirtualOrdersExecuted (events/twamm.ts:46-52, 0x29416a...840f). */
  val virtualOrdersExecuted: Processor = Processor(
    "twamm_virtual_order_executions", "twamm",
    "0x29416aa69fb4a5270dd3c2b3e6d05f457dc0dbf96f423db1f86c5b7b2e6840f",
    StructType(Seq(
      StructField("token0", StringType), StructField("token1", StringType),
      StructField("fee", DecimalType(38, 0)),
      StructField("token0_sale_rate", DecimalType(38, 0)),
      StructField("token1_sale_rate", DecimalType(38, 0)),
      StructField("delta0", DecimalType(38, 0)), StructField("delta1", DecimalType(38, 0)))),
    data => {
      val t0 = FeltDecode.parseAddress(data, 0)
      val t1 = FeltDecode.parseAddress(data, t0.next)
      val fee = FeltDecode.parseU128(data, t1.next)
      val r0 = FeltDecode.parseU128(data, fee.next)
      val r1 = FeltDecode.parseU128(data, r0.next)
      val d0 = FeltDecode.parseI129(data, r1.next)
      val d1 = FeltDecode.parseI129(data, d0.next)
      Row(hex(t0.value), hex(t1.value), dec(fee.value), dec(r0.value),
        dec(r1.value), dec(d0.value), dec(d1.value))
    })

  /** Staker Staked (events/staker.ts:4-9, selector 0x024fda...9ebe). */
  val staked: Processor = Processor(
    "staker_staked", "staker",
    "0x024fdaadc324c3bb8e59febfb2e8a399331e58193489e54ac40fec46745a9ebe",
    StructType(Seq(
      StructField("from_address", StringType), StructField("amount", DecimalType(38, 0)),
      StructField("delegate", StringType))),
    data => {
      val from = FeltDecode.parseAddress(data, 0)
      val amt = FeltDecode.parseU128(data, from.next)
      val del = FeltDecode.parseAddress(data, amt.next)
      Row(hex(from.value), dec(amt.value), hex(del.value))
    })

  /** Staker Withdrawn (events/staker.ts:11-17, selector 0x036a4d...0248). */
  val withdrawn: Processor = Processor(
    "staker_withdrawn", "staker",
    "0x036a4d15ab9e146faab90d4abc1c0cad17c4ded24551c781ba100392b5a70248",
    StructType(Seq(
      StructField("from_address", StringType), StructField("delegate", StringType),
      StructField("recipient", StringType), StructField("amount", DecimalType(38, 0)))),
    data => {
      val from = FeltDecode.parseAddress(data, 0)
      val del = FeltDecode.parseAddress(data, from.next)
      val to = FeltDecode.parseAddress(data, del.next)
      val amt = FeltDecode.parseU128(data, to.next)
      Row(hex(from.value), hex(del.value), hex(to.value), dec(amt.value))
    })

  /** NFT Transfer (events/nft.ts:4-8, selector 0x99cd8b...6e9). */
  val nftTransfer: Processor = Processor(
    "position_transfers", "nft",
    "0x99cd8bde557814842a3121e8ddfd433a539b8c9f14bf31ebf108d12e6196e9",
    StructType(Seq(
      StructField("from_address", StringType), StructField("to_address", StringType),
      StructField("token_id", DecimalType(38, 0)))),
    data => {
      val from = FeltDecode.parseAddress(data, 0)
      val to = FeltDecode.parseAddress(data, from.next)
      val id = FeltDecode.parseU256(data, to.next)
      Row(hex(from.value), hex(to.value), dec(id.value))
    })

  /** PositionMintedWithReferrer (events/positions.ts:24-29, 0x0289e5...80fd). */
  val mintedWithReferrer: Processor = Processor(
    "position_minted_with_referrer", "positions",
    "0x0289e57bf153052470392b578fad8d64393d2b5307e0cf1bf59f7967db3480fd",
    StructType(Seq(
      StructField("token_id", LongType), StructField("referrer", StringType))),
    data => {
      val id = FeltDecode.parseU64(data, 0)
      val ref = FeltDecode.parseAddress(data, id.next)
      Row(id.value.toLong, hex(ref.value))
    })

  /** Legacy PositionMinted (events/positions.ts:10-19, 0x2a9157...929f):
    * trailing referrer is backwards-compatible-optional (S7). */
  val legacyPositionMinted: Processor = Processor(
    "legacy_position_minted", "positions",
    "0x2a9157ea1542bfe11220258bf15d8aa02d791e7f94426446ec85b94159929f",
    StructType(StructField("token_id", LongType) +: poolKeyFields ++: Seq(
      StructField("lower_bound", IntegerType), StructField("upper_bound", IntegerType),
      StructField("referrer", StringType))),
    data => {
      val id = FeltDecode.parseU64(data, 0)
      val pk = FeltDecode.parsePoolKey(data, id.next)
      val lower = FeltDecode.parseI129(data, pk.next)
      val upper = FeltDecode.parseI129(data, lower.next)
      val ref = FeltDecode.backwardsCompatible(FeltDecode.parseAddress)(data, upper.next)
      val k = pk.value
      Row(id.value.toLong, hex(k.token0), hex(k.token1), dec(k.fee),
        k.tickSpacing.toInt, hex(k.extension), lower.value.toInt, upper.value.toInt,
        ref.value.map(hex).orNull)
    })

  val registry: Seq[Processor] = Seq(
    swapped, positionUpdated, poolInitialized, feesAccumulated, protocolFeesWithdrawn,
    orderUpdated, orderProceedsWithdrawn, virtualOrdersExecuted,
    staked, withdrawn, nftTransfer, mintedWithReferrer, legacyPositionMinted)

  /** Fan a raw event batch out to typed fact frames. Raw schema:
    * (block_number, transaction_index, event_index, emitter, key0,
    * data array<string>); `contracts` maps logical contract names to
    * deployed addresses (the reference's env-var filter inputs). Every
    * output carries the packed event_id. */
  def decodeAll(spark: SparkSession, raw: DataFrame,
      contracts: Map[String, String]): Map[String, DataFrame] =
    registry.filter(p => contracts.contains(p.contract)).map { p =>
      val metaSchema = StructType(Seq(StructField("event_id", LongType)) ++ p.schema.fields)
      val decode = p.decode
      val matching = raw
        .filter(col("emitter") === contracts(p.contract) && col("key0") === p.keySelector)
        .select(
          Ingest.eventId(col("block_number"), col("transaction_index"), col("event_index"))
            .as("event_id"),
          col("data"))
      val out = matching
        .map { r =>
          val decoded = decode(r.getSeq[String](1).toIndexedSeq)
          Row.fromSeq(r.getLong(0) +: decoded.toSeq)
        }(Encoders.row(metaSchema))
      p.name -> out.toDF()
    }.toMap
}
