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

  /** Decimal with a LOUD 38-digit ceiling: Spark's DecimalType maxes at
    * precision 38 — one digit short of u128-max (39 digits), far short of
    * u256 — while the reference's Postgres NUMERIC is unbounded. A value
    * beyond the ceiling must fail the decode visibly; the silent
    * alternative is Row encoding's CheckOverflow nulling the amount inside
    * a fact row (non-ANSI) where nothing would ever notice. */
  private def dec(v: BigInt): java.math.BigDecimal = {
    val d = new java.math.BigDecimal(v.bigInteger)
    require(d.precision <= 38, s"decoded integer exceeds DECIMAL(38,0): $v")
    d
  }

  /** u64 felt into a Long with an explicit range check — `BigInt.toLong`
    * silently WRAPS for values ≥ 2^63, which would persist a corrupted
    * key/time instead of rejecting the payload. */
  private def u64(v: BigInt): Long = {
    require(v.signum >= 0 && v.bitLength <= 63, s"u64 value out of Long range: $v")
    v.toLong
  }

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

  /** Shared layout of PositionFeesCollected / ProtocolFeesPaid
    * (events/core.ts:51-58 and :91-97, both `pool_key, position_key
    * (salt u128, owner, bounds), delta`): the dao writes both to
    * identically-shaped tables (dao.ts:2003-2027 / :2114-2138). */
  private def poolPositionDeltaProcessor(name: String, selector: String): Processor =
    Processor(
      name, "core", selector,
      StructType(poolKeyFields ++ Seq(
        StructField("owner", StringType), StructField("salt", StringType),
        StructField("lower_bound", IntegerType), StructField("upper_bound", IntegerType),
        StructField("delta0", DecimalType(38, 0)), StructField("delta1", DecimalType(38, 0)))),
      data => {
        val pk = FeltDecode.parsePoolKey(data, 0)
        val salt = FeltDecode.parseU128(data, pk.next)
        val owner = FeltDecode.parseAddress(data, salt.next)
        val lower = FeltDecode.parseI129(data, owner.next)
        val upper = FeltDecode.parseI129(data, lower.next)
        val d0 = FeltDecode.parseI129(data, upper.next)
        val d1 = FeltDecode.parseI129(data, d0.next)
        val k = pk.value
        Row(hex(k.token0), hex(k.token1), dec(k.fee), k.tickSpacing.toInt,
          hex(k.extension), hex(owner.value), hex(salt.value),
          lower.value.toInt, upper.value.toInt, dec(d0.value), dec(d1.value))
      })

  /** PositionFeesCollected (eventProcessors.ts:138-151, 0x96982a...1100). */
  val positionFeesCollected: Processor = poolPositionDeltaProcessor(
    "position_fees_collected",
    "0x96982abd597114bdaa4a60612f87fabfcc7206aa12d61c50e7ba1e6c291100")

  /** ProtocolFeesPaid (eventProcessors.ts:194-207, 0x5dacf5...c4e5). */
  val protocolFeesPaid: Processor = poolPositionDeltaProcessor(
    "protocol_fees_paid",
    "0x5dacf59794364ad1555bb3c9b2346afa81e57e5c19bb6bae0d22721c96c4e5")

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
        dec(fee.value), u64(st.value), u64(et.value), dec(srd.value))
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
        dec(fee.value), u64(st.value), u64(et.value), dec(amt.value))
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
      Row(u64(id.value), hex(ref.value))
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
      Row(u64(id.value), hex(k.token0), hex(k.token1), dec(k.fee),
        k.tickSpacing.toInt, hex(k.extension), lower.value.toInt, upper.value.toInt,
        ref.value.map(hex).orNull)
    })

  /** One proposal call: target, entry-point selector, calldata span — the
    * reference's per-call child row (dao.ts:2525-2560). */
  val callType: StructType = StructType(Seq(
    StructField("to_address", StringType), StructField("selector", StringType),
    StructField("calldata", ArrayType(StringType))))

  /** Governor Proposed (events/governor.ts:21-32, 0x02a98c...ba3f): nested
    * span-of-calls with span calldata (S4/S5), trailing optional config
    * version (S7). Calls are emitted as a typed ARRAY column — the decode
    * keeps the full structure the reference persists as child rows
    * (dao.ts:2525-2560); [[governorProposalCalls]] posexplodes it into the
    * `governor_proposed_calls` child-table shape. */
  val governorProposed: Processor = Processor(
    "governor_proposed", "governor",
    "0x02a98c37f5b13fe14803e72b284c81be9ebbedc6cf74ed8d1489ed74951cba3f",
    StructType(Seq(
      StructField("id", StringType), StructField("proposer", StringType),
      StructField("config_version", LongType),
      StructField("calls", ArrayType(callType)))),
    data => {
      val id = FeltDecode.parseFelt252(data, 0)
      val proposer = FeltDecode.parseAddress(data, id.next)
      val call = FeltDecode.combineParsers[(BigInt, BigInt, Seq[BigInt])](Seq(
        "to" -> FeltDecode.parseAddress.asInstanceOf[FeltDecode.Parser[Any]],
        "selector" -> FeltDecode.parseFelt252.asInstanceOf[FeltDecode.Parser[Any]],
        "calldata" -> FeltDecode.parseSpanOf(FeltDecode.parseFelt252).asInstanceOf[FeltDecode.Parser[Any]]))(
        m => (m("to").asInstanceOf[BigInt], m("selector").asInstanceOf[BigInt],
          m("calldata").asInstanceOf[Seq[BigInt]]))
      val calls = FeltDecode.parseSpanOf(call)(data, proposer.next)
      val cfg = FeltDecode.backwardsCompatible(FeltDecode.parseU64)(data, calls.next)
      Row(hex(id.value), hex(proposer.value),
        cfg.value.map(u64).map(Long.box).orNull,
        calls.value.map { case (to, sel, cd) => Row(hex(to), hex(sel), cd.map(hex)) })
    })

  /** Governor Voted (events/governor.ts:35-41, 0x5c9afa...162). */
  val governorVoted: Processor = Processor(
    "governor_voted", "governor",
    "0x5c9afac1c510b50d3e0004024ba7b8e190864f1543dd8025d08f88410fb162",
    StructType(Seq(
      StructField("id", StringType), StructField("voter", StringType),
      StructField("weight", DecimalType(38, 0)), StructField("yea", BooleanType))),
    data => {
      val id = FeltDecode.parseFelt252(data, 0)
      val voter = FeltDecode.parseAddress(data, id.next)
      val w = FeltDecode.parseU128(data, voter.next)
      val yea = FeltDecode.parseBoolean(data, w.next)
      Row(hex(id.value), hex(voter.value), dec(w.value), yea.value)
    })

  /** Governor Canceled (events/governor.ts:43-46, 0xad1f80...192). */
  val governorCanceled: Processor = Processor(
    "governor_canceled", "governor",
    "0xad1f80a0e6ac2d42f6ce99670de84817aef2368cd22a19f85fcb721f689192",
    StructType(Seq(StructField("id", StringType))),
    data => Row(hex(FeltDecode.parseFelt252(data, 0).value)))

  /** Governor Executed (events/governor.ts:57-62, 0x01f431...ab78):
    * span-of-span results kept as a nested ARRAY column — the per-result
    * word rows the reference persists (dao.ts:2580-2614) are derived by
    * [[governorExecutionResults]]. */
  val governorExecuted: Processor = Processor(
    "governor_executed", "governor",
    "0x01f4317aae43f6c24b2b85c6d8b21d5fa0a28cee0476cd52ca5d60d4787aab78",
    StructType(Seq(
      StructField("id", StringType),
      StructField("results", ArrayType(ArrayType(StringType))))),
    data => {
      val id = FeltDecode.parseFelt252(data, 0)
      val results = FeltDecode.parseSpanOf(FeltDecode.parseSpanOf(FeltDecode.parseFelt252))(data, id.next)
      Row(hex(id.value), results.value.map(_.map(hex)))
    })

  /** Governor CreationThresholdBreached (events/governor.ts:49-55,
    * 0xda0eb1...9baf): the reference routes it to the canceled table
    * (eventProcessors.ts:365-379 "just use the canceled table") — union
    * this frame's `id` with `governor_canceled` to mirror that. */
  val governorCreationThresholdBreached: Processor = Processor(
    "governor_creation_threshold_breached", "governor",
    "0xda0eb1cb71bdbfac21648d8b87024714f7eb6207978c7eb359a20144a99baf",
    StructType(Seq(
      StructField("id", StringType), StructField("breach_timestamp", LongType))),
    data => {
      val id = FeltDecode.parseFelt252(data, 0)
      val ts = FeltDecode.parseU64(data, id.next)
      Row(hex(id.value), u64(ts.value))
    })

  /** Governor Described (events/governor.ts:65-69, 0x8643a1...7a9):
    * ByteArray description (S6). */
  val governorDescribed: Processor = Processor(
    "governor_proposal_described", "governor",
    "0x8643a1c8a461189d5b77de7576b06aa9148c9127101228f02816d13768e7a9",
    StructType(Seq(
      StructField("id", StringType), StructField("description", StringType))),
    data => {
      val id = FeltDecode.parseFelt252(data, 0)
      val desc = FeltDecode.parseByteArray(data, id.next)
      Row(hex(id.value), desc.value)
    })

  /** Governor Reconfigured (events/governor.ts:72-88, 0x02b997...9fb). */
  val governorReconfigured: Processor = Processor(
    "governor_reconfigured", "governor",
    "0x02b9973fd701ab68169e139e241db74576eca4e885bad73d016982a59f1ac9fb",
    StructType(Seq(
      StructField("voting_start_delay", LongType), StructField("voting_period", LongType),
      StructField("voting_weight_smoothing_duration", LongType),
      StructField("quorum", DecimalType(38, 0)),
      StructField("proposal_creation_threshold", DecimalType(38, 0)),
      StructField("execution_delay", LongType), StructField("execution_window", LongType),
      StructField("version", LongType))),
    data => {
      val vsd = FeltDecode.parseU64(data, 0)
      val vp = FeltDecode.parseU64(data, vsd.next)
      val vwsd = FeltDecode.parseU64(data, vp.next)
      val q = FeltDecode.parseU128(data, vwsd.next)
      val pct = FeltDecode.parseU128(data, q.next)
      val ed = FeltDecode.parseU64(data, pct.next)
      val ew = FeltDecode.parseU64(data, ed.next)
      val ver = FeltDecode.parseU64(data, ew.next)
      Row(u64(vsd.value), u64(vp.value), u64(vwsd.value), dec(q.value),
        dec(pct.value), u64(ed.value), u64(ew.value), u64(ver.value))
    })

  private val registrationSchema = StructType(Seq(
    StructField("address", StringType), StructField("name", StringType),
    StructField("symbol", StringType), StructField("decimals", IntegerType),
    StructField("total_supply", DecimalType(38, 0))))

  /** Token registration v1/v2 (events/tokenRegistry.ts:11-18, 0x3ea44d...d74):
    * felt-packed short-string name/symbol, decoded at the boundary. */
  val tokenRegistered: Processor = Processor(
    "token_registrations", "token_registry",
    "0x3ea44da5af08f985c5ac763fa2573381d77aeee47d9a845f0c6764cb805d74",
    registrationSchema,
    data => {
      val addr = FeltDecode.parseAddress(data, 0)
      val name = FeltDecode.parseFelt252(data, addr.next)
      val sym = FeltDecode.parseFelt252(data, name.next)
      val decs = FeltDecode.parseU8(data, sym.next)
      val supply = FeltDecode.parseU128(data, decs.next)
      Row(hex(addr.value),
        graft.functions.Felts.parseShortStringImpl(new java.math.BigDecimal(name.value.bigInteger)),
        graft.functions.Felts.parseShortStringImpl(new java.math.BigDecimal(sym.value.bigInteger)),
        decs.value, dec(supply.value))
    })

  /** Token registration from the v2 registry (eventProcessors.ts:238-252):
    * identical payload/parser to v1, separate deployed contract. Shares the
    * v1 output name — [[decodeAll]] unions same-name frames, mirroring the
    * reference's shared `insertRegistration` target table. */
  val tokenRegisteredV2: Processor = tokenRegistered.copy(contract = "token_registry_v2")

  /** Token registration v3 (events/tokenRegistry.ts:23-30): ByteArray
    * name/symbol (same selector, different contract). */
  val tokenRegisteredV3: Processor = Processor(
    "token_registrations_v3", "token_registry_v3",
    "0x3ea44da5af08f985c5ac763fa2573381d77aeee47d9a845f0c6764cb805d74",
    registrationSchema,
    data => {
      val addr = FeltDecode.parseAddress(data, 0)
      val name = FeltDecode.parseByteArray(data, addr.next)
      val sym = FeltDecode.parseByteArray(data, name.next)
      val decs = FeltDecode.parseU8(data, sym.next)
      val supply = FeltDecode.parseU128(data, decs.next)
      Row(hex(addr.value), name.value, sym.value, decs.value, dec(supply.value))
    })

  /** Oracle SnapshotEvent (events/oracle.ts:9-15, 0x0385e1...38b). */
  val oracleSnapshot: Processor = Processor(
    "oracle_snapshots", "oracle",
    "0x0385e1b60fdfb8aeee9212a69cdb72415cef7b24ec07a60cdd65b65d0582238b",
    StructType(Seq(
      StructField("token0", StringType), StructField("token1", StringType),
      StructField("index", LongType),
      StructField("snapshot_block_timestamp", LongType),
      StructField("snapshot_tick_cumulative", DecimalType(38, 0)))),
    data => {
      val t0 = FeltDecode.parseAddress(data, 0)
      val t1 = FeltDecode.parseAddress(data, t0.next)
      val idx = FeltDecode.parseU64(data, t1.next)
      val ts = FeltDecode.parseU64(data, idx.next)
      val tc = FeltDecode.parseI129(data, ts.next)
      Row(hex(t0.value), hex(t1.value), u64(idx.value), u64(ts.value), dec(tc.value))
    })

  /** Limit OrderPlaced (events/limitOrders.ts:17-24, 0x03b935...7cb). */
  val limitOrderPlaced: Processor = Processor(
    "limit_order_placed", "limit_orders",
    "0x03b935dbbdb7f463a394fc8729e7e26e30edebbc3bd5617bf1d7cf9e1ce6f7cb",
    StructType(Seq(
      StructField("owner", StringType), StructField("salt", StringType),
      StructField("token0", StringType), StructField("token1", StringType),
      StructField("tick", IntegerType),
      StructField("liquidity", DecimalType(38, 0)), StructField("amount", DecimalType(38, 0)))),
    data => {
      val owner = FeltDecode.parseAddress(data, 0)
      val salt = FeltDecode.parseFelt252(data, owner.next)
      val t0 = FeltDecode.parseAddress(data, salt.next)
      val t1 = FeltDecode.parseAddress(data, t0.next)
      val tick = FeltDecode.parseI129(data, t1.next)
      val liq = FeltDecode.parseU128(data, tick.next)
      val amt = FeltDecode.parseU128(data, liq.next)
      Row(hex(owner.value), hex(salt.value), hex(t0.value), hex(t1.value),
        tick.value.toInt, dec(liq.value), dec(amt.value))
    })

  /** Limit OrderClosed (events/limitOrders.ts:26-33, 0x0196e7...4ae). */
  val limitOrderClosed: Processor = Processor(
    "limit_order_closed", "limit_orders",
    "0x0196e77c6eab92283e3fc303198bb0a523c0c7d93b4de1d8bf636eab7517c4ae",
    StructType(Seq(
      StructField("owner", StringType), StructField("salt", StringType),
      StructField("token0", StringType), StructField("token1", StringType),
      StructField("tick", IntegerType),
      StructField("amount0", DecimalType(38, 0)), StructField("amount1", DecimalType(38, 0)))),
    data => {
      val owner = FeltDecode.parseAddress(data, 0)
      val salt = FeltDecode.parseFelt252(data, owner.next)
      val t0 = FeltDecode.parseAddress(data, salt.next)
      val t1 = FeltDecode.parseAddress(data, t0.next)
      val tick = FeltDecode.parseI129(data, t1.next)
      val a0 = FeltDecode.parseU128(data, tick.next)
      val a1 = FeltDecode.parseU128(data, a0.next)
      Row(hex(owner.value), hex(salt.value), hex(t0.value), hex(t1.value),
        tick.value.toInt, dec(a0.value), dec(a1.value))
    })

  /** Spline LiquidityUpdated (events/spline.ts:11-21, 0x0203c0...b5d);
    * zero-liquidity-factor events are dropped by the handler
    * (eventProcessors.ts:88-93) — the caller filters post-decode. */
  val liquidityUpdated: Processor = Processor(
    "liquidity_updated", "spline",
    "0x0203c047cc01ab425e271dd20fc0651f0e3ed06fb6545850508001db3c822b5d",
    StructType(poolKeyFields ++ Seq(
      StructField("sender", StringType),
      StructField("liquidity_factor", DecimalType(38, 0)),
      StructField("shares", StringType),
      StructField("amount0", DecimalType(38, 0)), StructField("amount1", DecimalType(38, 0)),
      StructField("protocol_fees0", DecimalType(38, 0)),
      StructField("protocol_fees1", DecimalType(38, 0)))),
    data => {
      val pk = FeltDecode.parsePoolKey(data, 0)
      val sender = FeltDecode.parseAddress(data, pk.next)
      val lf = FeltDecode.parseI129(data, sender.next)
      val shares = FeltDecode.parseU256(data, lf.next)
      val a0 = FeltDecode.parseI129(data, shares.next)
      val a1 = FeltDecode.parseI129(data, a0.next)
      val pf0 = FeltDecode.parseU128(data, a1.next)
      val pf1 = FeltDecode.parseU128(data, pf0.next)
      val k = pk.value
      Row(hex(k.token0), hex(k.token1), dec(k.fee), k.tickSpacing.toInt,
        hex(k.extension), hex(sender.value), dec(lf.value), hex(shares.value),
        dec(a0.value), dec(a1.value), dec(pf0.value), dec(pf1.value))
    })

  /** The full 29-processor registry — one entry per `fromAddress` filter in
    * the reference's eventProcessors.ts. */
  val registry: Seq[Processor] = Seq(
    swapped, positionUpdated, positionFeesCollected, poolInitialized,
    feesAccumulated, protocolFeesWithdrawn, protocolFeesPaid,
    orderUpdated, orderProceedsWithdrawn, virtualOrdersExecuted,
    staked, withdrawn, nftTransfer, mintedWithReferrer, legacyPositionMinted,
    governorProposed, governorVoted, governorCanceled,
    governorCreationThresholdBreached, governorExecuted,
    governorDescribed, governorReconfigured,
    tokenRegistered, tokenRegisteredV2, tokenRegisteredV3, oracleSnapshot,
    limitOrderPlaced, limitOrderClosed, liquidityUpdated)

  /** Fan a raw event batch out to typed fact frames. Raw schema:
    * (block_number, transaction_index, event_index, emitter, key0,
    * data array<string>); `contracts` maps logical contract names to
    * deployed addresses (the reference's env-var filter inputs). Every
    * output carries the packed event_id. */
  /** Canonical form of a 0x-hex felt for equality tests: lowercase, leading
    * zeros stripped. Selectors/addresses circulate in BOTH minimal-hex and
    * zero-padded-to-64 forms (the registry constants themselves are mixed,
    * copied verbatim from the reference); exact string equality would make
    * whichever subset mismatches the feed's canonical form silently match
    * nothing. */
  private[ingest] def normHex(s: String): String = {
    val h = s.toLowerCase.stripPrefix("0x").dropWhile(_ == '0')
    "0x" + (if (h.isEmpty) "0" else h)
  }

  /** Column twin of [[normHex]] (codegen'd regexps, stays in the scan). */
  private def normHexCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val stripped = regexp_replace(regexp_replace(lower(c), "^0x", ""), "^0+", "")
    concat(lit("0x"), when(stripped === "", "0").otherwise(stripped))
  }

  def decodeAll(spark: SparkSession, raw: DataFrame,
      contracts: Map[String, String]): Map[String, DataFrame] = {
    // normalize ONCE, before the per-processor loop: each of the ~29
    // registry filters reuses the projected columns instead of paying the
    // lower+regexp chain per row per processor on the ingest hot path
    val normed = raw
      .withColumn("emitter_norm", normHexCol(col("emitter")))
      .withColumn("key0_norm", normHexCol(col("key0")))
    registry.filter(p => contracts.contains(p.contract)).map { p =>
      val metaSchema = StructType(Seq(StructField("event_id", LongType)) ++ p.schema.fields)
      val decode = p.decode
      val matching = normed
        .filter(col("emitter_norm") === normHex(contracts(p.contract)) &&
          col("key0_norm") === normHex(p.keySelector))
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
    }
      // same-name processors (the v1/v2 registry routes) share one output
      // table, exactly like the reference's shared insertRegistration
      .groupBy(_._1)
      .map { case (name, frames) => name -> frames.map(_._2).reduce(_ unionByName _) }
  }

  /** S9 child rows: one row per proposal call (dao.ts:2525-2560), derived
    * from the decoded `governor_proposed` frame by posexplode — the Spark
    * analogue of the reference's per-call INSERT loop. */
  def governorProposalCalls(proposed: DataFrame): DataFrame =
    proposed
      .select(col("event_id"), col("id").as("proposal_id"),
        posexplode(col("calls")).as(Seq("index", "call")))
      .select(col("event_id"), col("proposal_id"), col("index"),
        col("call.to_address").as("to_address"), col("call.selector").as("selector"),
        col("call.calldata").as("calldata"))

  /** S9 child rows: one row per execution-result word (dao.ts:2580-2614);
    * empty result spans keep a row with a NULL word (posexplode_outer) so
    * no executed call disappears from the child table. */
  def governorExecutionResults(executed: DataFrame): DataFrame =
    executed
      // outer at BOTH levels: an execution with an empty results array (or
      // an empty span inside it) keeps a NULL-word row — otherwise the
      // execution disappears from the child table entirely
      .select(col("event_id"), col("id").as("proposal_id"),
        posexplode_outer(col("results")).as(Seq("index", "span")))
      .select(col("event_id"), col("proposal_id"), col("index"),
        posexplode_outer(col("span")).as(Seq("word_index", "result_word")))
}
