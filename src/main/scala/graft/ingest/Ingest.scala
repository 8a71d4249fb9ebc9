package graft.ingest

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-side primitives: the universal event key, the pool-key dimension
  * hash, dimension upsert, and reorg retraction (SURVEY.md §2.1 S8-S13).
  */
object Ingest {

  /** `id = block_number * 2^32 + transaction_index * 2^16 + event_index` —
    * the generated total-order key (dao.ts:124). A pure column expression:
    * ordering by id ≡ ordering by (block, tx, idx), and the block number is
    * recoverable by shift, which is what makes reorg retraction a pure
    * predicate on any fact table. */
  def eventId(block: Column, txIndex: Column, eventIndex: Column): Column =
    block.cast(LongType) * 4294967296L + txIndex.cast(LongType) * 65536L + eventIndex.cast(LongType)

  /** Inverse of [[eventId]]: the block number a fact belongs to — a pure
    * bit-shift projection (the packing multiplier is 2^32), exact for the
    * full non-negative long range. Because every fact carries event_id,
    * queries never need a fact-sized join to `event_keys` just to recover
    * the block number: `withColumn("block_number", blockOf($"event_id"))`
    * followed by a broadcast join to `blocks` replaces it shuffle-free. */
  def blockOf(eventId: Column): Column = shiftright(eventId, 32)

  /** SHA-256 pool-key hash over the fixed-width big-endian field encoding
    * (poolKeyHash.ts:4-14): token0/token1/extension as 32-byte words, fee and
    * tick_spacing as 16-byte words. Column form — composes `sha2` over
    * `unhex(lpad(...))`, fully codegen'd. Inputs are 0x-hex strings. */
  def poolKeyHashCol(token0: Column, token1: Column, fee: Column,
      tickSpacing: Column, extension: Column): Column = {
    def pad(c: Column, w: Int) = lpad(regexp_replace(c, "^0x", ""), w, "0")
    sha2(concat(
      unhex(pad(token0, 64)), unhex(pad(token1, 64)),
      unhex(pad(fee, 32)), unhex(pad(tickSpacing, 32)),
      unhex(pad(extension, 64))), 256)
  }

  /** Driver-side twin of [[poolKeyHashCol]] for tests (exact byte layout). */
  def poolKeyHash(token0: BigInt, token1: BigInt, fee: BigInt,
      tickSpacing: BigInt, extension: BigInt): BigInt = {
    val md = MessageDigest.getInstance("SHA-256")
    def put(v: BigInt, hexWidth: Int): Unit = {
      val hex = v.toString(16).reverse.padTo(hexWidth, '0').reverse
      md.update(hex.grouped(2).map(b => Integer.parseInt(b, 16).toByte).toArray)
    }
    put(token0, 64); put(token1, 64); put(fee, 32); put(tickSpacing, 32); put(extension, 64)
    BigInt(1, md.digest())
  }

  /** Dimension upsert (`ON CONFLICT DO NOTHING`, dao.ts:1869-1893): keep
    * every existing row untouched and add only incoming keys that are
    * genuinely new. The anti-join makes the DO-NOTHING direction explicit —
    * `union.dropDuplicates(key)` keeps a partition-order-dependent row per
    * key and can silently REPLACE an existing dimension row's attributes
    * with the incoming version. (Among multiple new rows sharing a key
    * within one batch the pick is still arbitrary, matching the reference's
    * insert-order nondeterminism inside a transaction.) */
  def upsertDim(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    existing.unionByName(
      incoming.join(existing.select(key), Seq(key), "left_anti").dropDuplicates(key))

  /** Reorg retraction (dao.ts:2306-2321 / index.ts:162-184): drop every fact
    * at or above the invalidated block. The FK cascade of the reference is
    * implicit here — every fact's event_id embeds its block number, so one
    * predicate retracts any fact table; with block-range-partitioned parquet
    * this prunes to a partition-level delete. */
  def retractFacts(fact: DataFrame, fromBlock: Long): DataFrame =
    fact.filter(col("event_id") < fromBlock * 4294967296L)

  /** Retraction for tables keyed by block number directly (blocks). */
  def retractBlocks(blocks: DataFrame, fromBlock: Long): DataFrame =
    blocks.filter(col("number") < fromBlock)
}
