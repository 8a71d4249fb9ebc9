package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ingest.EventProcessors

/** Ingest fan-out (S1-S3): raw felt-array events → per-processor filter →
  * typed fact rows, end-to-end through decodeAll. */
class EventProcessorsSpec extends SparkSpec {

  private val core = "0xcore"

  private def hx(v: BigInt): String = "0x" + v.toString(16)

  private val rawSchema = StructType(Seq(
    StructField("block_number", LongType),
    StructField("transaction_index", LongType),
    StructField("event_index", LongType),
    StructField("emitter", StringType),
    StructField("key0", StringType),
    StructField("data", ArrayType(StringType))))

  test("decodeAll routes and decodes core events (eventProcessors.ts registry)") {
    // Swapped payload: locker, pool_key(5), swap params (i129 amount,
    // bool is_token1, u256 limit, u128 skip), delta(i129 x2),
    // sqrt_ratio_after u256, tick_after i129, liquidity_after u128
    val swapData = Seq(
      "0xabc",                      // locker
      "0x5", "0x6", "0x3", "0xa", "0x0",  // pool key
      "0x64", "0x0",                // amount +100
      "0x1",                        // is_token1
      "0x0", "0x1",                 // sqrt_ratio_limit = 2^128
      "0x0",                        // skip_ahead
      "0x1f4", "0x0",               // delta0 +500
      "0xc8", "0x1",                // delta1 -200
      "0x10", "0x2",                // sqrt_ratio_after = 0x10 + 2*2^128
      "0x32", "0x1",                // tick_after -50
      "0x3e8")                      // liquidity_after 1000

    val initData = Seq(
      "0x5", "0x6", "0x3", "0xa", "0x0",  // pool key
      "0x14", "0x0",                // tick +20
      "0x1", "0x0")                 // sqrt_ratio = 1

    val pfwData = Seq("0xfee1", "0x7", "0x2710") // recipient, token, 10000

    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, 1L, 0L, core, EventProcessors.swapped.keySelector, swapData),
        Row(10L, 1L, 1L, core, EventProcessors.poolInitialized.keySelector, initData),
        Row(11L, 0L, 0L, core, EventProcessors.protocolFeesWithdrawn.keySelector, pfwData),
        Row(11L, 0L, 1L, "0xother", EventProcessors.swapped.keySelector, swapData))),
      rawSchema)

    val out = EventProcessors.decodeAll(spark, raw, Map("core" -> core))

    val swaps = out("swaps").collect()
    assert(swaps.length == 1) // the 0xother emitter row is filtered out (S2)
    val s = swaps.head
    assert(s.getAs[Long]("event_id") == 10L * 4294967296L + 1L * 65536L)
    assert(s.getAs[String]("locker") == "0xabc")
    assert(s.getAs[String]("token0") == "0x5" && s.getAs[String]("token1") == "0x6")
    assert(s.getAs[java.math.BigDecimal]("delta0").longValueExact() == 500L)
    assert(s.getAs[java.math.BigDecimal]("delta1").longValueExact() == -200L)
    assert(s.getAs[String]("sqrt_ratio_after") == hx(BigInt(16) + BigInt(2) * (BigInt(1) << 128)))
    assert(s.getAs[Int]("tick_after") == -50)
    assert(s.getAs[java.math.BigDecimal]("liquidity_after").longValueExact() == 1000L)

    val inits = out("pool_initializations").collect()
    assert(inits.length == 1)
    assert(inits.head.getAs[Int]("tick") == 20)
    assert(inits.head.getAs[Int]("tick_spacing") == 10)

    val pfw = out("protocol_fees_withdrawn").collect()
    assert(pfw.length == 1)
    assert(pfw.head.getAs[String]("token") == "0x7")
    assert(pfw.head.getAs[java.math.BigDecimal]("amount").longValueExact() == 10000L)

    assert(out("position_updates").isEmpty)
    assert(out("fees_accumulated").isEmpty)
  }

  test("decodeAll routes per-contract (twamm family, S2 emitter filters)") {
    // OrderUpdated: owner, salt, order_key(sell,buy,fee,start,end), i129 delta
    val orderData = Seq("0xa1", "0x7", "0x5", "0x6", "0x3", "0x100", "0x200",
      "0x2328", "0x1") // sale_rate_delta = -9000
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(7L, 0L, 0L, "0xtwamm", EventProcessors.orderUpdated.keySelector, orderData),
        Row(7L, 0L, 1L, "0xcore", EventProcessors.orderUpdated.keySelector, orderData))),
      rawSchema)

    val out = EventProcessors.decodeAll(spark, raw,
      Map("core" -> "0xcore", "twamm" -> "0xtwamm"))
    val orders = out("twamm_order_updates").collect()
    assert(orders.length == 1) // the core-emitted row has a twamm selector → dropped
    val o = orders.head
    assert(o.getAs[String]("owner") == "0xa1")
    assert(o.getAs[Long]("start_time") == 256L && o.getAs[Long]("end_time") == 512L)
    assert(o.getAs[java.math.BigDecimal]("sale_rate_delta").longValueExact() == -9000L)
    // contracts not present in the map are simply not decoded
    assert(!out.contains("staker_staked"))

    val mapped = EventProcessors.decodeAll(spark, raw, Map("staker" -> "0xs"))
    assert(mapped.keySet == Set("staker_staked", "staker_withdrawn"))
  }

  test("governor decoders: nested call spans + ByteArray description (S4/S6/S7)") {
    // Proposed: id, proposer, calls span [2 calls: (to, sel, calldata[3]),
    // (to, sel, calldata[0])], optional config_version = 5
    val proposed = Seq("0x11", "0x22", "0x2",
      "0x31", "0x41", "0x3", "0x1", "0x2", "0x3",
      "0x32", "0x42", "0x0",
      "0x5")
    // Described: id, ByteArray("hello") = span[0 words] + pending + len
    val described = Seq("0x12", "0x0", "0x68656c6c6f", "0x5")
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(3L, 0L, 0L, "0xgov", EventProcessors.governorProposed.keySelector, proposed),
        Row(3L, 0L, 1L, "0xgov", EventProcessors.governorDescribed.keySelector, described))),
      rawSchema)

    val out = EventProcessors.decodeAll(spark, raw, Map("governor" -> "0xgov"))
    val p = out("governor_proposed").collect().head
    assert(p.getAs[String]("id") == "0x11" && p.getAs[String]("proposer") == "0x22")
    val calls = p.getAs[scala.collection.Seq[Row]]("calls")
    assert(calls.size == 2)
    assert(calls.head.getAs[String]("to_address") == "0x31")
    assert(calls.head.getAs[String]("selector") == "0x41")
    assert(calls.head.getAs[scala.collection.Seq[String]]("calldata") == Seq("0x1", "0x2", "0x3"))
    assert(calls(1).getAs[String]("to_address") == "0x32")
    assert(calls(1).getAs[scala.collection.Seq[String]]("calldata").isEmpty)
    assert(p.getAs[Long]("config_version") == 5L)

    val d = out("governor_proposal_described").collect().head
    assert(d.getAs[String]("description") == "hello")

    // S9 child derivation: one row per call, preserving order + calldata
    val children = EventProcessors.governorProposalCalls(out("governor_proposed"))
      .orderBy("index").collect()
    assert(children.length == 2)
    assert(children(0).getAs[String]("proposal_id") == "0x11")
    assert(children(0).getAs[Int]("index") == 0 &&
      children(0).getAs[String]("to_address") == "0x31" &&
      children(0).getAs[scala.collection.Seq[String]]("calldata") == Seq("0x1", "0x2", "0x3"))
    assert(children(1).getAs[Int]("index") == 1 &&
      children(1).getAs[scala.collection.Seq[String]]("calldata").isEmpty)
  }

  test("governor executed: span-of-span results → per-word child rows (S9)") {
    // Executed: id, results span [2 spans: ["0xa","0xb"], []]
    val executed = Seq("0x77", "0x2", "0x2", "0xa", "0xb", "0x0")
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(4L, 0L, 0L, "0xgov", EventProcessors.governorExecuted.keySelector, executed))),
      rawSchema)
    val out = EventProcessors.decodeAll(spark, raw, Map("governor" -> "0xgov"))
    val e = out("governor_executed").collect().head
    assert(e.getAs[String]("id") == "0x77")
    val results = e.getAs[scala.collection.Seq[scala.collection.Seq[String]]]("results")
    assert(results == Seq(Seq("0xa", "0xb"), Seq()))

    val words = EventProcessors.governorExecutionResults(out("governor_executed"))
      .orderBy("index", "word_index").collect()
    // span 0 contributes two word rows; the empty span keeps one NULL-word row
    assert(words.length == 3)
    assert(words(0).getAs[String]("result_word") == "0xa" &&
      words(1).getAs[String]("result_word") == "0xb")
    assert(words(2).getAs[Int]("index") == 1 && words(2).isNullAt(words(2).fieldIndex("result_word")))
  }
}
