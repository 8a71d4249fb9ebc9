package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.functions.Felts

/** latest_token_registrations_view (dao.ts:970-1023): decode felt-packed v1
  * metadata, validate symbols/names, and dedup by the reference's rules —
  * latest registration per address wins, but only when that address's first
  * registration was also the first claim of the (lower-cased) symbol.
  */
object Tokens {

  private val asciiRe = "^[\\x00-\\x7F]*$"

  def latestTokenRegistrations(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.plans.ParseShortString.register(spark)
    import spark.implicits._

    // codegen'd native expression (graft.plans.ParseShortString); the
    // equivalent Scala UDF lives in Felts for non-hot paths and tests.
    val v1 = spark.table("token_registrations")
      .select($"address", $"event_id",
        expr("parse_short_string_native(name)").as("name"),
        expr("parse_short_string_native(symbol)").as("symbol"),
        $"decimals", $"total_supply")
    val v3 = spark.table("token_registrations_v3")
      .select($"address", $"event_id", $"name", $"symbol", $"decimals", $"total_supply")

    // memoized: the union + decode + double-rlike validation feeds three
    // consumers (perAddress, firstOfSymbol, and the join probe) — without the
    // persist the whole decode tree executes three times
    val validated = graft.util.Memo.checkpointed(spark, sfDir, "token_regs_validated") {
      v1.unionByName(v3)
        .filter(
          length($"symbol") > 1 && length($"symbol") < 10 &&
            $"symbol".rlike(asciiRe) &&
            length($"name") < 128 && $"name".rlike(asciiRe))
    }

    val perAddress = validated.groupBy($"address")
      .agg(min($"event_id").as("first_registration_id"),
        max($"event_id").as("last_registration_id"))

    val firstOfSymbol = validated.groupBy(lower($"symbol").as("lower_symbol"))
      .agg(min($"event_id").as("first_id"))

    // both aggregates are token-registry-sized → broadcast them so the fact
    // side never shuffles
    broadcast(perAddress).as("iba")
      .join(validated.as("vr"),
        $"iba.address" === $"vr.address" &&
          $"iba.last_registration_id" === $"vr.event_id")
      .join(broadcast(firstOfSymbol).as("fr"),
        $"fr.lower_symbol" === lower($"vr.symbol") &&
          $"iba.first_registration_id" === $"fr.first_id")
      .select($"iba.address", $"vr.name", $"vr.symbol", $"vr.decimals",
        $"vr.total_supply".cast("long").as("total_supply"))
  }

  /** Oracle: short-string unpack inlined as byte arithmetic (fixture names are
    * ≤ 6 bytes, symbols ≤ 3); validation + dedup mirrors the reference. */
  val latestTokenRegistrationsOracle: String = {
    val nameSql = Felts.unpackShortStringSql("tr.name", 8)
    val symSql = Felts.unpackShortStringSql("tr.symbol", 8)
    Fixtures.oracle(
      s""", all_regs AS (
           SELECT address, event_id,
                  $nameSql AS name,
                  $symSql AS symbol,
                  decimals, total_supply
           FROM token_registrations tr
           UNION ALL
           SELECT address, event_id, name, symbol, decimals, total_supply
           FROM token_registrations_v3),
         validated AS (
           SELECT * FROM all_regs
           WHERE LENGTH(symbol) > 1 AND LENGTH(symbol) < 10
             AND regexp_matches(symbol, '^[\\x00-\\x7F]*$$')
             AND LENGTH(name) < 128
             AND regexp_matches(name, '^[\\x00-\\x7F]*$$')),
         per_address AS (
           SELECT address, MIN(event_id) AS first_registration_id,
                  MAX(event_id) AS last_registration_id
           FROM validated GROUP BY address),
         first_of_symbol AS (
           SELECT LOWER(symbol) AS lower_symbol, MIN(event_id) AS first_id
           FROM validated GROUP BY 1)
         SELECT iba.address, vr.name, vr.symbol, vr.decimals,
                CAST(vr.total_supply AS BIGINT) AS total_supply
         FROM per_address iba
         JOIN validated vr
           ON iba.address = vr.address AND iba.last_registration_id = vr.event_id
         JOIN first_of_symbol fr
           ON fr.lower_symbol = LOWER(vr.symbol) AND iba.first_registration_id = fr.first_id""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "latest_token_registrations" -> (latestTokenRegistrations _))

  val oracles: Map[String, String] = Map(
    "latest_token_registrations" -> latestTokenRegistrationsOracle)
}
