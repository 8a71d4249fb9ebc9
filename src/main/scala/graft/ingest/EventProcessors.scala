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

  /** One registered processor. */
  final case class Processor(
      name: String,
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
    "swaps",
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
    "position_updates",
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
    "pool_initializations",
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
    "fees_accumulated",
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
    "protocol_fees_withdrawn",
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

  val registry: Seq[Processor] = Seq(
    swapped, positionUpdated, poolInitialized, feesAccumulated, protocolFeesWithdrawn)

  /** Fan a raw event batch out to typed fact frames. Raw schema:
    * (block_number, transaction_index, event_index, emitter, key0,
    * data array<string>). Every output carries the packed event_id. */
  def decodeAll(spark: SparkSession, raw: DataFrame, coreAddress: String): Map[String, DataFrame] =
    registry.map { p =>
      val metaSchema = StructType(Seq(StructField("event_id", LongType)) ++ p.schema.fields)
      val decode = p.decode
      val matching = raw
        .filter(col("emitter") === coreAddress && col("key0") === p.keySelector)
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
