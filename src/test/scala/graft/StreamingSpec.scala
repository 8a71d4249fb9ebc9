package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.streaming.StreamDriver

/** End-to-end streaming lifecycle (SURVEY §2.10 T1/T2/T5): file-backed block
  * stream → foreachBatch ingestion → checkpoint resume → two-tier refresh. */
class StreamingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("block_number", LongType),
    StructField("transaction_index", LongType),
    StructField("event_index", LongType)))

  test("ingest, checkpoint-resume, and two-tier refresh cadence (T1/T2/T5)") {
    import spark.implicits._
    val root = SparkSpec.tempDir("graft-streaming").toString
    val rawDir = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(rawDir))

    var operationalRefreshes = 0
    var analyticalRefreshes = 0
    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt",
      analyticalEvery = 2L,
      onOperationalRefresh = _ => operationalRefreshes += 1,
      onAnalyticalRefresh = _ => analyticalRefreshes += 1)

    // chunk 1: blocks 1..100
    (1L to 100L).map(b => (b, 0L, 0L)).toDF("block_number", "transaction_index", "event_index")
      .write.mode("overwrite").parquet(s"$rawDir/chunk=1")
    // the file stream watches rawDir recursively via glob
    val q1 = driver.start(s"$rawDir/*", schema, Trigger.AvailableNow())
    q1.awaitTermination()

    val afterFirst = spark.read.parquet(s"$root/facts/raw_events")
    assert(afterFirst.count() == 100L)
    assert(operationalRefreshes == 1)    // one batch → one operational refresh
    assert(analyticalRefreshes == 1)     // batchId 0 % 2 == 0

    // chunk 2 arrives; a RESTARTED query on the same checkpoint must process
    // only the new file (cursor semantics, T2)
    (101L to 150L).map(b => (b, 0L, 0L)).toDF("block_number", "transaction_index", "event_index")
      .write.mode("overwrite").parquet(s"$rawDir/chunk=2")
    val q2 = driver.start(s"$rawDir/*", schema, Trigger.AvailableNow())
    q2.awaitTermination()

    val afterSecond = spark.read.parquet(s"$root/facts/raw_events")
    assert(afterSecond.count() == 150L)
    assert(afterSecond.agg(max($"block_number")).collect().head.getLong(0) == 150L)
    assert(operationalRefreshes == 2)
    assert(analyticalRefreshes == 1)     // batchId 1 % 2 != 0 → throttled

    // event ids were derived during ingestion and are the global order
    val ids = afterSecond.select($"event_id").orderBy($"event_id")
      .collect().map(_.getLong(0))
    assert(ids.toSeq == (1L to 150L).map(_ * 4294967296L))
  }

  test("real checkpoint replay after retract does not resurrect retracted blocks (T2/T3)") {
    import spark.implicits._
    val root = SparkSpec.tempDir("graft-streaming").toString
    val rawDir = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(rawDir))

    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt")
    (1L to 9000L).map(b => (b, 0L, 0L)).toDF("block_number", "transaction_index", "event_index")
      .write.mode("overwrite").parquet(s"$rawDir/chunk=1")
    val q1 = driver.start(s"$rawDir/*", schema, Trigger.AvailableNow())
    q1.awaitTermination()
    assert(spark.read.parquet(s"$root/facts/raw_events").count() == 9000L)

    driver.retract(5000L)
    assert(spark.read.parquet(s"$root/facts/raw_events").count() == 4999L)

    // simulate the crash window: the retract ran AFTER batch 0's data write
    // but the commit marker is lost, so the restarted query REPLAYS batch 0
    // from its pre-reorg offset file list (Spark's own replay path, not a
    // hand-called processBatch)
    val commit = java.nio.file.Paths.get(s"$root/ckpt/ingest/commits/0")
    assert(java.nio.file.Files.exists(commit))
    java.nio.file.Files.delete(commit)
    // the local FS keeps a Hadoop checksum twin; left behind it fails the
    // replayed batch's commit rename with a misleading "concurrently using"
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/ckpt/ingest/commits/.0.crc"))

    val q2 = driver.start(s"$rawDir/*", schema, Trigger.AvailableNow())
    q2.awaitTermination()

    val after = spark.read.parquet(s"$root/facts/raw_events")
    assert(after.count() == 4999L)
    assert(after.agg(max($"block_number")).collect().head.getLong(0) == 4999L)
  }

  test("pending blocks are served operationally but never committed as canonical (T4)") {
    import spark.implicits._
    val root = SparkSpec.tempDir("graft-streaming").toString
    val rawDir = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(rawDir))

    val pendingSchema = StructType(schema.fields :+ StructField("is_pending", BooleanType))
    var lastOperational: Option[org.apache.spark.sql.DataFrame] = None
    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt",
      onOperationalRefresh = df => lastOperational = Some(df))

    // chunk 1: blocks 1..10 finalized, block 11 pending (unfinalized head)
    ((1L to 10L).map(b => (b, 0L, 0L, false)) :+ ((11L, 0L, 0L, true)))
      .toDF("block_number", "transaction_index", "event_index", "is_pending")
      .write.mode("overwrite").parquet(s"$rawDir/chunk=1")
    driver.start(s"$rawDir/*", pendingSchema, Trigger.AvailableNow()).awaitTermination()

    // canonical storage holds only finalized blocks; the operational surface
    // (and the refresh callback) see the pending head too
    assert(spark.read.parquet(s"$root/facts/raw_events").count() == 10L)
    assert(driver.operationalEvents.count() == 11L)
    assert(lastOperational.get.count() == 11L)
    val pendingRows = driver.operationalEvents.filter($"batch_id" === driver.PendingBatchId)
    assert(pendingRows.select($"block_number").collect().map(_.getLong(0)).toSeq == Seq(11L))

    // chunk 2: block 11 re-emitted finalized + block 12 pending — the swap
    // needs NO reorg: canonical grows to 11, the pending store is replaced
    ((Seq((11L, 0L, 0L, false))) :+ ((12L, 0L, 0L, true)))
      .toDF("block_number", "transaction_index", "event_index", "is_pending")
      .write.mode("overwrite").parquet(s"$rawDir/chunk=2")
    driver.start(s"$rawDir/*", pendingSchema, Trigger.AvailableNow()).awaitTermination()

    val canonical = spark.read.parquet(s"$root/facts/raw_events")
    assert(canonical.count() == 11L)
    assert(canonical.agg(max($"block_number")).collect().head.getLong(0) == 11L)
    // no duplicate: block 11 exists exactly once across the whole surface
    val op = driver.operationalEvents
    assert(op.count() == 12L)
    assert(op.filter($"block_number" === 11L).count() == 1L)
    assert(op.filter($"batch_id" === driver.PendingBatchId)
      .select($"block_number").collect().map(_.getLong(0)).toSeq == Seq(12L))

    // startup cleanup: a fresh driver drops the stale pending suffix before
    // resuming (the live source re-emits the head, never advancing past it)
    val driver2 = new StreamDriver(spark, s"$root/facts", s"$root/ckpt")
    driver2.start(s"$rawDir/*", pendingSchema, Trigger.AvailableNow()).awaitTermination()
    assert(driver2.operationalEvents.filter($"batch_id" === driver2.PendingBatchId).isEmpty)
    assert(spark.read.parquet(s"$root/facts/raw_events").count() == 11L)
  }

  test("checkpoint replay after retract does not repopulate the pending store (T3 ∩ T4)") {
    import spark.implicits._
    val root = SparkSpec.tempDir("graft-streaming").toString
    val rawDir = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(rawDir))

    val pendingSchema = StructType(schema.fields :+ StructField("is_pending", BooleanType))
    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt")

    // blocks 1..9000 finalized, 9001 pending (head of the pre-reorg chain)
    ((1L to 9000L).map(b => (b, 0L, 0L, false)) :+ ((9001L, 0L, 0L, true)))
      .toDF("block_number", "transaction_index", "event_index", "is_pending")
      .write.mode("overwrite").parquet(s"$rawDir/chunk=1")
    driver.start(s"$rawDir/*", pendingSchema, Trigger.AvailableNow()).awaitTermination()
    assert(driver.operationalEvents.filter($"batch_id" === driver.PendingBatchId).count() == 1L)

    // reorg back to 5000: the pending head is invalidated with it
    driver.retract(5000L)
    assert(driver.operationalEvents.filter($"batch_id" === driver.PendingBatchId).isEmpty)

    // lose batch 0's commit → Spark replays it from the pre-reorg offsets.
    // The retract-ledger guard must apply to the batch's PENDING subset too:
    // block 9001 is ≥ the cutoff and must not reappear in the pending store.
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/ckpt/ingest/commits/0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/ckpt/ingest/commits/.0.crc"))
    driver.start(s"$rawDir/*", pendingSchema, Trigger.AvailableNow()).awaitTermination()

    val op = driver.operationalEvents
    assert(op.filter($"batch_id" === driver.PendingBatchId).isEmpty)
    assert(op.count() == 4999L)
    assert(op.agg(max($"block_number")).collect().head.getLong(0) == 4999L)
  }

  test("operationalEvents serves the pending head (or nothing) before any canonical data") {
    import spark.implicits._
    val root = SparkSpec.tempDir("graft-streaming").toString
    val rawDir = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(rawDir))

    val pendingSchema = StructType(schema.fields :+ StructField("is_pending", BooleanType))
    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt")

    // nothing processed at all → empty frame, not an exception
    assert(driver.operationalEvents.isEmpty)

    // an all-pending first batch: the canonical write has zero rows (the
    // raw_events dir exists but holds no data files), yet the operational
    // surface must serve the pending head
    Seq((1L, 0L, 0L, true), (2L, 0L, 0L, true))
      .toDF("block_number", "transaction_index", "event_index", "is_pending")
      .write.mode("overwrite").parquet(s"$rawDir/chunk=1")
    driver.start(s"$rawDir/*", pendingSchema, Trigger.AvailableNow()).awaitTermination()

    val op = driver.operationalEvents
    assert(op.count() == 2L)
    assert(op.filter($"batch_id" === driver.PendingBatchId).count() == 2L)
  }

  test("a custom (non-file) BlockSource drives the same ingestion pipeline") {
    import spark.implicits._
    val root = SparkSpec.tempDir("graft-streaming").toString

    // an in-memory stream standing in for a network source (Kafka / gRPC
    // bridge): proves the BlockSource seam, not just the bundled file impl
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val source = new graft.sources.BlockSource {
      override def schema = StructType(Seq(
        StructField("block_number", LongType),
        StructField("transaction_index", LongType),
        StructField("event_index", LongType)))
      override def stream(s: org.apache.spark.sql.SparkSession) =
        mem.toDF().toDF("block_number", "transaction_index", "event_index")
    }

    mem.addData((1L to 50L).map(b => (b, 0L, 0L)))
    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt")
    driver.start(source, Trigger.AvailableNow()).awaitTermination()

    val events = spark.read.parquet(s"$root/facts/raw_events")
    assert(events.count() == 50L)
    assert(events.agg(max($"block_number")).collect().head.getLong(0) == 50L)
  }

  test("JDBC sink leg: idempotent batch writes, replay convergence, reorg deletes") {
    import spark.implicits._
    val root = SparkSpec.tempDir("graft-streaming").toString
    val rawDir = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(rawDir))

    // Spark's bundled embedded Derby stands in for the reference's Postgres
    val url = s"jdbc:derby:$root/db;create=true"
    val sink = new graft.streaming.JdbcBatchSink(url, "raw_events")
    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt",
      jdbcSink = Some(sink))

    (1L to 9000L).map(b => (b, 0L, 0L)).toDF("block_number", "transaction_index", "event_index")
      .write.mode("overwrite").parquet(s"$rawDir/chunk=1")
    driver.start(s"$rawDir/*", schema, Trigger.AvailableNow()).awaitTermination()

    def jdbcRows() = spark.read.jdbc(url, "raw_events", new java.util.Properties)
    assert(jdbcRows().count() == 9000L)

    // a reorg deletes the suffix on the relational side too
    driver.retract(5000L)
    assert(jdbcRows().count() == 4999L)

    // checkpoint replay of the pre-reorg batch: the delete-own-batch write
    // plus the retract-ledger filter converge to the survivor set, no dupes
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/ckpt/ingest/commits/0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/ckpt/ingest/commits/.0.crc"))
    driver.start(s"$rawDir/*", schema, Trigger.AvailableNow()).awaitTermination()

    assert(jdbcRows().count() == 4999L)
    assert(jdbcRows().groupBy($"block_number").count().filter($"count" > 1).isEmpty)
    assert(jdbcRows().agg(max($"block_number")).collect().head.getLong(0) == 4999L)
  }

  test("hourly rollup watermark upsert equals full recompute (T6)") {
    val sfDir = "/root/testdata/sf0.001"
    val full = graft.queries.Rollups.hourlyVolumeByToken(spark, sfDir)

    val hours = full.select("hour").distinct().orderBy("hour")
      .collect().map(_.getLong(0))
    assert(hours.length > 2)
    val watermark = hours(hours.length / 2)

    val upserted = full.filter(col("hour") < watermark)
      .unionByName(graft.queries.Rollups.hourlyVolumeByTokenSince(spark, sfDir, watermark))

    assert(upserted.count() == full.count())
    assert(upserted.exceptAll(full).isEmpty && full.exceptAll(upserted).isEmpty)
  }
}
