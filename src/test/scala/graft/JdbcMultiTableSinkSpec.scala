package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.JdbcMultiTableSink

/** Per-batch atomic-repair semantics of the multi-table JDBC sink — the
  * drop-in analogue of the reference DAO's one-transaction-per-block write
  * of all fact tables plus cursor (dao.ts:1895-2893, index.ts:195-257).
  * Derby stands in for Postgres, three fact tables stand in for the
  * reference's ~24. */
class JdbcMultiTableSinkSpec extends SparkSpec {

  private val factTables = Seq("mt_swaps", "mt_deposits", "mt_transfers")

  private def frames(blocks: Range, cents: Long): Map[String, DataFrame] = {
    import spark.implicits._
    factTables.map { t =>
      t -> blocks.map(b => (b.toLong, cents)).toDF("block_number", "cents")
    }.toMap
  }

  private def mkSink(): (JdbcMultiTableSink, String) = {
    val root = SparkSpec.tempDir("graft-mtsink").toString
    val url = s"jdbc:derby:$root/db;create=true"
    (new JdbcMultiTableSink(url, factTables), url)
  }

  private def rows(url: String, t: String): DataFrame =
    spark.read.jdbc(url, t, new java.util.Properties)

  test("cursor advances only after every fact table holds the batch") {
    val (sink, url) = mkSink()
    assert(sink.cursor().isEmpty)

    sink.write(frames(1 to 10, cents = 5L), batchId = 0L, endBlock = 10L)
    assert(sink.cursor().contains((0L, 10L)))
    factTables.foreach(t => assert(rows(url, t).count() == 10L))

    // replaying the SAME batch converges (delete-own-batch first), no dupes
    sink.write(frames(1 to 10, cents = 5L), batchId = 0L, endBlock = 10L)
    factTables.foreach { t =>
      assert(rows(url, t).count() == 10L)
      assert(rows(url, t).groupBy("block_number").count()
        .filter(col("count") > 1).isEmpty)
    }
  }

  test("a crashed batch (some tables written, no cursor) is repaired then replayed") {
    val (sink, url) = mkSink()
    sink.write(frames(1 to 10, cents = 5L), batchId = 0L, endBlock = 10L)

    // simulate the crash: batch 1 reached two of three tables, cursor never
    // written — exactly the state between step 2 and step 3 of write()
    import spark.implicits._
    Seq("mt_swaps", "mt_deposits").foreach { t =>
      (11 to 20).map(b => (b.toLong, 9L, 1L)).toDF("block_number", "cents", "batch_id")
        .write.mode("append").jdbc(url, t, new java.util.Properties)
    }
    assert(rows(url, "mt_swaps").count() == 20L)
    assert(rows(url, "mt_transfers").count() == 10L) // torn state

    // restart contract (index.ts:242-244): cursor still says batch 0, so
    // everything above it is unacknowledged and must go
    sink.repairAfterRestart()
    factTables.foreach { t =>
      assert(rows(url, t).count() == 10L,
        s"$t must hold exactly the acknowledged batch after repair")
      assert(rows(url, t).agg(max($"block_number")).collect().head.getLong(0) == 10L)
    }
    assert(sink.cursor().contains((0L, 10L)))

    // the checkpoint replay then rewrites batch 1 in full — consistent end
    sink.write(frames(11 to 20, cents = 9L), batchId = 1L, endBlock = 20L)
    assert(sink.cursor().contains((1L, 20L)))
    factTables.foreach(t => assert(rows(url, t).count() == 20L))
  }

  test("repair with no cursor at all clears every orphan row") {
    val (sink, url) = mkSink()
    import spark.implicits._
    // a crash during the very first batch: rows exist, cursor never written
    (1 to 5).map(b => (b.toLong, 1L, 0L)).toDF("block_number", "cents", "batch_id")
      .write.mode("append").jdbc(url, "mt_swaps", new java.util.Properties)

    sink.repairAfterRestart()
    assert(rows(url, "mt_swaps").count() == 0L)
  }

  test("StreamDriver leg: routed fan-out, cursor tracking, reorg retract end-to-end") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import spark.implicits._

    val root = SparkSpec.tempDir("graft-mtsink-e2e").toString
    val rawDir = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(rawDir))
    val url = s"jdbc:derby:$root/db;create=true"
    val sink = new JdbcMultiTableSink(url, Seq("mt_even", "mt_odd"))

    // the router is the per-processor fan-out in miniature: events split by
    // a selector predicate, each family to its own fact table
    val route = (batch: DataFrame) => Map(
      "mt_even" -> batch.filter(col("block_number") % 2 === 0),
      "mt_odd"  -> batch.filter(col("block_number") % 2 === 1))

    val schema = StructType(Seq(
      StructField("block_number", LongType),
      StructField("transaction_index", LongType),
      StructField("event_index", LongType)))
    // dimension leg riding the same driver: the pool_keys analogue — one
    // content-addressed key per 10-block family, insert-ignore on the DB
    sink.ensureDimTable("mt_dim_keys",
      Seq("key_hash" -> "BIGINT", "first_block" -> "BIGINT"), Seq("key_hash"))
    val dimOf = (batch: DataFrame) => batch
      .groupBy((col("block_number") / 10).cast("long").as("key_hash"))
      .agg(min(col("block_number")).as("first_block"))
    val driver = new graft.streaming.StreamDriver(spark, s"$root/facts",
      s"$root/ckpt", multiTableSink = Some((sink, route)),
      multiTableDims = Seq(("mt_dim_keys", Seq("key_hash"), dimOf)))

    (1L to 100L).map(b => (b, 0L, 0L)).toDF("block_number", "transaction_index", "event_index")
      .write.mode("overwrite").parquet(s"$rawDir/chunk=1")
    driver.start(s"$rawDir/*", schema, Trigger.AvailableNow()).awaitTermination()

    assert(rows(url, "mt_even").count() == 50L)
    assert(rows(url, "mt_odd").count() == 50L)
    assert(sink.cursor().map(_._2).contains(100L))
    assert(rows(url, "mt_dim_keys").count() == 11L,
      "one dim row per key family, duplicates skipped database-side")

    // reorg: both tables lose the suffix, cursor rolls back atomically
    driver.retract(61L)
    assert(rows(url, "mt_even").count() == 30L)
    assert(rows(url, "mt_odd").count() == 30L)
    assert(sink.cursor().map(_._2).contains(60L))
  }

  test("reorg retract deletes the suffix from all tables and rolls the cursor back") {
    val (sink, url) = mkSink()
    sink.write(frames(1 to 10, cents = 5L), batchId = 0L, endBlock = 10L)
    sink.write(frames(11 to 20, cents = 9L), batchId = 1L, endBlock = 20L)

    sink.retract(fromBlock = 8L)
    factTables.foreach { t =>
      assert(rows(url, t).count() == 7L)
      assert(rows(url, t).agg(max(col("block_number"))).collect().head.getLong(0) == 7L)
    }
    assert(sink.cursor().contains((1L, 7L)),
      "cursor must roll back with the facts, atomically")
  }

  test("upsert dialect is selected from the JDBC url") {
    import graft.streaming.JdbcUpsertDialect
    assert(JdbcUpsertDialect.of("jdbc:postgresql://db:5432/graft")
      == JdbcUpsertDialect.Postgres)
    assert(JdbcUpsertDialect.of("jdbc:derby:/tmp/x;create=true")
      == JdbcUpsertDialect.Derby)
    val (sink, url) = mkSink()
    assert(sink.dialect == JdbcUpsertDialect.Derby)
  }

  test("both dialects generate the reference-shaped cursor upsert SQL") {
    import graft.streaming.JdbcUpsertDialect._
    // the reference's writeCursor form (dao.ts:1840-1851): one statement,
    // conflict-target on the marker's key, update-in-place on conflict
    assert(Postgres.cursorUpsert("graft_cursor", 7L, 1234L) ==
      "INSERT INTO graft_cursor (id, batch_id, block_number) VALUES (0, 7, 1234) " +
        "ON CONFLICT (id) DO UPDATE SET batch_id = EXCLUDED.batch_id, " +
        "block_number = EXCLUDED.block_number")
    assert(Derby.cursorUpsert("graft_cursor", 7L, 1234L) ==
      "MERGE INTO graft_cursor c USING SYSIBM.SYSDUMMY1 s ON c.id = 0 " +
        "WHEN MATCHED THEN UPDATE SET batch_id = 7, block_number = 1234 " +
        "WHEN NOT MATCHED THEN INSERT (id, batch_id, block_number) " +
        "VALUES (0, 7, 1234)")
    assert(Postgres.cursorCreate("c") == Derby.cursorCreate("c"),
      "only the upsert differs between dialects; DDL is common SQL")
  }

  test("both dialects generate the reference-shaped dimension insert-ignore") {
    import graft.streaming.JdbcUpsertDialect._
    // the reference's insertPoolKeyHash form (dao.ts:1869-1893): insert the
    // dimension row, let the DATABASE skip existing keys
    assert(Postgres.insertIgnore("pool_keys",
      Seq("key_hash", "token0", "token1"), Seq("key_hash")) ==
      ("INSERT INTO pool_keys (key_hash, token0, token1) VALUES (?, ?, ?) " +
        "ON CONFLICT (key_hash) DO NOTHING",
        Seq("key_hash", "token0", "token1")))
    assert(Derby.insertIgnore("pool_keys",
      Seq("key_hash", "token0", "token1"), Seq("key_hash")) ==
      ("MERGE INTO pool_keys t USING SYSIBM.SYSDUMMY1 s ON t.key_hash = ? " +
        "WHEN NOT MATCHED THEN INSERT (key_hash, token0, token1) " +
        "VALUES (?, ?, ?)",
        Seq("key_hash", "key_hash", "token0", "token1")))
    // composite key: Postgres widens the conflict target, Derby the ON chain
    assert(Postgres.insertIgnore("d", Seq("a", "b", "v"), Seq("a", "b"))._1
      .contains("ON CONFLICT (a, b) DO NOTHING"))
    assert(Derby.insertIgnore("d", Seq("a", "b", "v"), Seq("a", "b"))._1
      .contains("ON t.a = ? AND t.b = ?"))
  }

  test("writeDim skips existing keys: replays and overlapping batches never dup or fail") {
    import spark.implicits._
    val (sink, url) = mkSink()
    sink.ensureDimTable("mt_pool_keys",
      Seq("key_hash" -> "BIGINT", "token0" -> "BIGINT", "token1" -> "BIGINT"),
      Seq("key_hash"))
    val dim1 = (1 to 50).map(k => (k.toLong, k * 10L, k * 11L))
      .toDF("key_hash", "token0", "token1").repartition(4)
    sink.writeDim("mt_pool_keys", dim1, Seq("key_hash"))
    assert(rows(url, "mt_pool_keys").count() == 50L)
    // replay of the same frame + an overlapping batch: only new keys land,
    // existing rows keep their ORIGINAL values (DO NOTHING, not update)
    val dim2 = (26 to 75).map(k => (k.toLong, -1L, -1L))
      .toDF("key_hash", "token0", "token1").repartition(4)
    sink.writeDim("mt_pool_keys", dim1, Seq("key_hash"))
    sink.writeDim("mt_pool_keys", dim2, Seq("key_hash"))
    val got = rows(url, "mt_pool_keys")
    assert(got.count() == 75L)
    assert(got.filter(col("key_hash") === 30L).select("token0").head.getLong(0)
      == 300L, "an existing key's row must be left untouched")
    assert(got.filter(col("key_hash") === 60L).select("token0").head.getLong(0)
      == -1L, "a new key from the overlapping batch must land")
  }

  test("the Derby MERGE leg: repeated writes keep ONE cursor row, updated in place") {
    val (sink, url) = mkSink()
    sink.write(frames(1 to 5, cents = 5L), batchId = 0L, endBlock = 5L)   // NOT MATCHED
    sink.write(frames(6 to 10, cents = 5L), batchId = 1L, endBlock = 10L) // MATCHED
    sink.write(frames(11 to 15, cents = 5L), batchId = 2L, endBlock = 15L)
    val cur = rows(url, "graft_cursor")
    assert(cur.count() == 1L, "the upsert must never grow the marker table")
    assert(sink.cursor().contains((2L, 15L)))
  }
}
