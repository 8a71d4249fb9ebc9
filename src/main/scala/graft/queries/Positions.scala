package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures

/** Remaining fact-table surface: position NFT ownership, protocol
  * withdrawals, TWAMM proceeds, and the governor calldata child tables
  * (the S9 array build/explode op, SURVEY §2.1).
  */
object Positions {

  private val dec38 = DecimalType(38, 0)

  /** Current owner per position NFT: last transfer wins (O1 top-1-per-key),
    * joined with the minting referrer (dao.ts:134-143, 250-257). */
  def positionOwners(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val transfers = spark.table("position_transfers")
    val lastTransfer = transfers
      .groupBy($"token_id")
      .agg(
        max_by(struct($"event_id", $"to_address"), $"event_id").as("t"),
        count(lit(1)).as("transfer_count"))
      .select($"token_id", $"t.to_address".as("owner"),
        $"t.event_id".as("last_transfer_event_id"), $"transfer_count")

    val referrer = spark.table("position_minted_with_referrer")
      .groupBy($"token_id")
      .agg(max_by($"referrer", $"event_id").as("referrer"))

    lastTransfer
      .join(broadcast(referrer), Seq("token_id"), "left")
      .select($"token_id", $"owner", $"last_transfer_event_id",
        $"transfer_count", $"referrer")
  }

  val positionOwnersOracle: String = Fixtures.oracle(
    """, last_transfer AS (
         SELECT token_id, to_address AS owner, event_id AS last_transfer_event_id
         FROM (SELECT t.*, ROW_NUMBER() OVER (PARTITION BY token_id ORDER BY event_id DESC) AS rn
               FROM position_transfers t) x WHERE rn = 1),
       counts AS (
         SELECT token_id, COUNT(1) AS transfer_count
         FROM position_transfers GROUP BY token_id),
       ref AS (
         SELECT token_id, referrer
         FROM (SELECT m.*, ROW_NUMBER() OVER (PARTITION BY token_id ORDER BY event_id DESC) AS rn
               FROM position_minted_with_referrer m) x WHERE rn = 1)
       SELECT lt.token_id, lt.owner, lt.last_transfer_event_id,
              c.transfer_count, r.referrer
       FROM last_transfer lt
       JOIN counts c ON lt.token_id = c.token_id
       LEFT JOIN ref r ON lt.token_id = r.token_id""")

  /** Protocol fee withdrawals rolled up per token (dao.ts:183-190). */
  def protocolWithdrawals(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("protocol_fees_withdrawn")
      .groupBy($"token")
      .agg(sum($"amount").cast(LongType).as("total_withdrawn"),
        count(lit(1)).as("withdrawal_count"),
        max($"event_id").as("last_event_id"))
  }

  val protocolWithdrawalsOracle: String = Fixtures.oracle(
    """SELECT token,
              CAST(SUM(amount) AS BIGINT) AS total_withdrawn,
              COUNT(1) AS withdrawal_count,
              MAX(event_id) AS last_event_id
       FROM protocol_fees_withdrawn GROUP BY token""")

  /** TWAMM proceeds withdrawn per (pool, owner) (dao.ts:669-686). */
  def twammProceeds(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("twamm_proceeds_withdrawals")
      .groupBy($"key_hash".as("pool_key_hash"), $"owner")
      .agg(sum($"amount0").cast(LongType).as("amount0"),
        sum($"amount1").cast(LongType).as("amount1"),
        count(lit(1)).as("withdrawal_count"))
  }

  val twammProceedsOracle: String = Fixtures.oracle(
    """SELECT key_hash AS pool_key_hash, owner,
              CAST(SUM(amount0) AS BIGINT) AS amount0,
              CAST(SUM(amount1) AS BIGINT) AS amount1,
              COUNT(1) AS withdrawal_count
       FROM twamm_proceeds_withdrawals GROUP BY 1, 2""")

  /** Governor proposal calls: rebuild each proposal's ordered calldata as an
    * ArrayType column (S9 multi-row VALUES, dao.ts:2525-2560) and explode it
    * back with posexplode — the round trip exercises the array build/explode
    * path while keeping the oracle-compared output flat. */
  def proposalCalls(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val calls = spark.table("governor_proposed_calls")
    val packed = calls
      .groupBy($"proposal_id")
      .agg(sort_array(collect_list(struct($"index", $"to_address", $"selector", $"calldata_word")))
        .as("calls"))

    packed
      .select($"proposal_id", posexplode($"calls").as(Seq("pos", "call")))
      .select(
        $"proposal_id",
        $"call.index".cast(LongType).as("index"),
        $"call.to_address",
        $"call.selector",
        $"call.calldata_word".cast(LongType).as("calldata_word"))
  }

  val proposalCallsOracle: String = Fixtures.oracle(
    """SELECT proposal_id,
              CAST(index AS BIGINT) AS index,
              to_address, selector,
              CAST(calldata_word AS BIGINT) AS calldata_word
       FROM governor_proposed_calls""")

  /** Governor execution results, flattened words (dao.ts:2580-2614). */
  def executionResults(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("governor_executed_results")
      .groupBy($"proposal_id")
      .agg(sum($"result_word").cast(LongType).as("result_sum"),
        count(lit(1)).as("n_words"),
        min($"event_id").as("first_event_id"))
  }

  val executionResultsOracle: String = Fixtures.oracle(
    """SELECT proposal_id,
              CAST(SUM(result_word) AS BIGINT) AS result_sum,
              COUNT(1) AS n_words,
              MIN(event_id) AS first_event_id
       FROM governor_executed_results GROUP BY proposal_id""")

  /** Proposal descriptions with the reference's NUL sanitization (P6,
    * dao.ts:2703-2704 replaces the null char before insert) and the latest
    * description per proposal winning. */
  def proposalDescriptions(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("governor_proposal_described")
      .withColumn("clean", regexp_replace($"description", "\u0001", "?"))
      .groupBy($"id".as("proposal_id"))
      .agg(max_by($"clean", $"event_id").as("description"),
        count(lit(1)).as("revision_count"))
  }

  val proposalDescriptionsOracle: String = Fixtures.oracle(
    """, cleaned AS (
         SELECT id, event_id, regexp_replace(description, chr(1), '?', 'g') AS clean
         FROM governor_proposal_described),
       latest AS (
         SELECT id, clean,
                ROW_NUMBER() OVER (PARTITION BY id ORDER BY event_id DESC) AS rn
         FROM cleaned)
       SELECT l.id AS proposal_id, l.clean AS description, c.revision_count
       FROM latest l
       JOIN (SELECT id, COUNT(1) AS revision_count FROM cleaned GROUP BY id) c
         ON l.id = c.id
       WHERE l.rn = 1""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "governor_proposal_descriptions" -> (proposalDescriptions _),
    "position_owners" -> (positionOwners _),
    "protocol_withdrawals_by_token" -> (protocolWithdrawals _),
    "twamm_proceeds_by_owner" -> (twammProceeds _),
    "governor_proposal_calls" -> (proposalCalls _),
    "governor_execution_results" -> (executionResults _))

  val oracles: Map[String, String] = Map(
    "governor_proposal_descriptions" -> proposalDescriptionsOracle,
    "position_owners" -> positionOwnersOracle,
    "protocol_withdrawals_by_token" -> protocolWithdrawalsOracle,
    "twamm_proceeds_by_owner" -> twammProceedsOracle,
    "governor_proposal_calls" -> proposalCallsOracle,
    "governor_execution_results" -> executionResultsOracle)
}
