package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.FeedBlockSource
import graft.sources.v2.{BlockFeedProvider, JsonBlockFeed}
import graft.streaming.StreamDriver

/** The `graft-blocks` DataSource V2 connector (S1 as a first-class Spark
  * source): chunk-count offsets, exactly-once checkpoint recovery, batch
  * backfill, and end-to-end ingestion through StreamDriver. */
class BlockFeedV2Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("block_number", LongType),
    StructField("transaction_index", LongType),
    StructField("event_index", LongType)))

  private def chunk(blocks: Range): Seq[Map[String, Any]] =
    blocks.map(b => Map[String, Any](
      "block_number" -> b.toLong, "transaction_index" -> 0L, "event_index" -> 0L))

  test("streaming read: offsets advance per committed chunk, AvailableNow drains") {
    val dir = SparkSpec.tempDir("graft-feed-v2").toString + "/feed"
    val feed = new JsonBlockFeed(dir)
    feed.emit(chunk(1 to 50))
    feed.emit(chunk(51 to 80))

    val out = SparkSpec.tempDir("graft-feed-v2-out").toString
    val q = spark.readStream.format("graft-blocks").schema(schema)
      .option("path", dir).load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$out/ckpt")
      .format("parquet").option("path", s"$out/data").start()
    q.awaitTermination()

    val got = spark.read.parquet(s"$out/data")
    assert(got.count() == 80)
    assert(got.agg(max(col("block_number"))).collect().head.getLong(0) == 80L)

    // restart on the SAME checkpoint with one more chunk: only the new
    // chunk is read (offset = committed-chunk count survived recovery)
    feed.emit(chunk(81 to 90))
    val q2 = spark.readStream.format("graft-blocks").schema(schema)
      .option("path", dir).load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$out/ckpt")
      .format("parquet").option("path", s"$out/data").start()
    q2.awaitTermination()
    val after = spark.read.parquet(s"$out/data")
    assert(after.count() == 90, "exactly the 10 new rows appended — no replay, no loss")
  }

  test("batch backfill scans every committed chunk with one partition per chunk") {
    val dir = SparkSpec.tempDir("graft-feed-v2b").toString + "/feed"
    val feed = new JsonBlockFeed(dir)
    (1 to 4).foreach(i => feed.emit(chunk(i * 10 until i * 10 + 5)))

    val df = spark.read.format("graft-blocks").schema(schema)
      .option("path", dir).load()
    assert(df.count() == 20)
    assert(df.rdd.getNumPartitions == 4, "parallelism follows producer chunking")
    // scalar values survive the JSON round-trip typed
    assert(df.schema == schema)
    assert(df.agg(min(col("block_number"))).collect().head.getLong(0) == 10L)
  }

  test("end-to-end: StreamDriver ingests through the v2 seam") {
    val root = SparkSpec.tempDir("graft-feed-v2e").toString
    val dir = s"$root/feed"
    val feed = new JsonBlockFeed(dir)
    feed.emit(chunk(1 to 100))

    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt")
    val q = driver.start(FeedBlockSource(dir, schema), Trigger.AvailableNow())
    q.awaitTermination()

    val facts = spark.read.parquet(s"$root/facts/raw_events")
    assert(facts.count() == 100)
    assert(facts.agg(max(col("block_number"))).collect().head.getLong(0) == 100L)
  }

  test("maxChunksPerTrigger drains a backlog in bounded micro-batches") {
    val dir = SparkSpec.tempDir("graft-feed-v2a").toString + "/feed"
    val feed = new JsonBlockFeed(dir)
    (1 to 3).foreach(i => feed.emit(chunk(i * 100 until i * 100 + 10)))

    val out = SparkSpec.tempDir("graft-feed-v2a-out").toString
    val q = spark.readStream.format("graft-blocks").schema(schema)
      .option("path", dir).option("maxChunksPerTrigger", "1").load()
      .writeStream.trigger(Trigger.ProcessingTime("50 milliseconds"))
      .option("checkpointLocation", s"$out/ckpt")
      .format("parquet").option("path", s"$out/data").start()
    try {
      q.processAllAvailable()
      val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
      assert(dataBatches.length == 3,
        s"3 chunks at 1 chunk/trigger must take 3 batches, got ${dataBatches.length}")
      assert(dataBatches.forall(_.numInputRows == 10))
    } finally q.stop()
    assert(spark.read.parquet(s"$out/data").count() == 30)
  }

  test("a control marker always rides alone in its micro-batch") {
    val dir = SparkSpec.tempDir("graft-feed-v2c").toString + "/feed"
    val feed = new JsonBlockFeed(dir)
    val ctl = BlockFeedProvider.withControlColumns(schema)
    feed.emit(chunk(1 to 5))
    feed.emit(chunk(6 to 10))
    feed.emitInvalidate(3L)
    feed.emit(chunk(1 to 4))
    feed.emit(chunk(5 to 8))

    val out = SparkSpec.tempDir("graft-feed-v2c-out").toString
    val q = spark.readStream.format("graft-blocks").schema(ctl)
      .option("path", dir).load()
      .writeStream.trigger(Trigger.ProcessingTime("50 milliseconds"))
      .option("checkpointLocation", s"$out/ckpt")
      .format("parquet").option("path", s"$out/data").start()
    try {
      q.processAllAvailable()
      val batches = q.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows)
      // [5+5 data] [1 marker] [4+4 data] — the marker splits the backlog
      assert(batches.toSeq == Seq(10L, 1L, 8L),
        s"marker must form its own batch, got ${batches.toSeq}")
    } finally q.stop()
  }

  test("reorg invalidation + pending head drive through the connector (T3/T4 on the v2 leg)") {
    import org.apache.spark.sql.functions.col
    val root = SparkSpec.tempDir("graft-feed-v2r").toString
    val dir = s"$root/feed"
    val feed = new JsonBlockFeed(dir)
    val pendingSchema = StructType(schema.fields :+ StructField("is_pending", BooleanType))
    val ctl = BlockFeedProvider.withControlColumns(pendingSchema)

    def rows(blocks: Seq[Long], pending: Boolean): Seq[Map[String, Any]] =
      blocks.map(b => Map[String, Any]("block_number" -> b,
        "transaction_index" -> 0L, "event_index" -> 0L, "is_pending" -> pending))

    var operationalRefreshes = 0
    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt",
      onOperationalRefresh = _ => operationalRefreshes += 1)

    // blocks 1..80 finalized + 81 pending (the unfinalized head)
    feed.emit(rows((1L to 80L), pending = false) ++ rows(Seq(81L), pending = true))
    val q = driver.start(FeedBlockSource(dir, ctl), Trigger.ProcessingTime("50 milliseconds"))
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$root/facts/raw_events").count() == 80L)
      val op1 = driver.operationalEvents
      assert(op1.count() == 81L)
      assert(op1.filter(col("batch_id") === driver.PendingBatchId)
        .select("block_number").collect().map(_.getLong(0)).toSeq == Seq(81L))

      // heartbeat: a liveness-only batch — no state moves, pending survives
      feed.emitHeartbeat()
      q.processAllAvailable()
      assert(spark.read.parquet(s"$root/facts/raw_events").count() == 80L)
      assert(driver.operationalEvents.count() == 81L)

      // MID-STREAM reorg to block 50 (query keeps running): the invalidate
      // marker retracts 50..80 and the pending 81; the new chain re-emits
      // 50..60 finalized with a new pending head 61
      feed.emitInvalidate(50L)
      feed.emit(rows((50L to 60L), pending = false) ++ rows(Seq(61L), pending = true))
      q.processAllAvailable()

      val canonical = spark.read.parquet(s"$root/facts/raw_events")
      assert(canonical.count() == 60L, "1..49 survivors + 50..60 new chain")
      assert(canonical.agg(org.apache.spark.sql.functions.max(col("block_number")))
        .collect().head.getLong(0) == 60L)
      assert(canonical.groupBy(col("block_number")).count()
        .filter(col("count") > 1).isEmpty, "no duplicate blocks across the reorg")
      val op2 = driver.operationalEvents
      assert(op2.count() == 61L)
      assert(op2.filter(col("batch_id") === driver.PendingBatchId)
        .select("block_number").collect().map(_.getLong(0)).toSeq == Seq(61L))
      // data batches + the invalidate's downstream poke all refreshed
      assert(operationalRefreshes >= 3)
    } finally q.stop()

    // restart on the same checkpoint: the stale pending head is dropped,
    // no chunk replays, and new data keeps flowing
    feed.emit(rows((61L to 70L), pending = false))
    val q2 = driver.start(FeedBlockSource(dir, ctl), Trigger.AvailableNow())
    q2.awaitTermination()
    val after = spark.read.parquet(s"$root/facts/raw_events")
    assert(after.count() == 70L)
    assert(after.groupBy(col("block_number")).count().filter(col("count") > 1).isEmpty)
    assert(driver.operationalEvents
      .filter(col("batch_id") === driver.PendingBatchId).isEmpty)
  }

  test("an invalidate before any canonical write is a clean no-op retraction") {
    val root = SparkSpec.tempDir("graft-feed-v2i").toString
    val dir = s"$root/feed"
    val feed = new JsonBlockFeed(dir)
    val ctl = BlockFeedProvider.withControlColumns(schema)
    feed.emitInvalidate(10L)
    feed.emit(chunk(1 to 20))
    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt")
    driver.start(FeedBlockSource(dir, ctl), Trigger.AvailableNow()).awaitTermination()
    assert(spark.read.parquet(s"$root/facts/raw_events").count() == 20L)
  }

  test("producer restart tolerates foreign files and resumes numbering (ADVICE r8)") {
    val dir = SparkSpec.tempDir("graft-feed-v2f").toString
    val feed = new JsonBlockFeed(dir)
    feed.emit(chunk(1 to 3))
    feed.emit(chunk(4 to 6))
    // a foreign .jsonl drops into the feed dir — must neither brick the
    // restarted producer's resume parse nor appear in the chunk listing
    Files.write(java.nio.file.Paths.get(dir, "notes.jsonl"), "{}".getBytes)
    assert(BlockFeedProvider.listChunks(dir).length == 2)
    val resumed = new JsonBlockFeed(dir)
    resumed.emit(chunk(7 to 9))
    val names = BlockFeedProvider.listChunks(dir)
      .map(p => java.nio.file.Paths.get(p).getFileName.toString)
    assert(names.length == 3 && names.distinct.length == 3,
      s"resumed producer must continue the sequence, got ${names.toSeq}")
    val df = spark.read.format("graft-blocks").schema(schema)
      .option("path", dir).load()
    assert(df.count() == 9)
  }

  test("chunk listing ignores uncommitted temp files") {
    val dir = SparkSpec.tempDir("graft-feed-v2t").toString
    val feed = new JsonBlockFeed(dir)
    feed.emit(chunk(1 to 3))
    // a producer mid-write: temp file present, not yet renamed
    Files.write(java.nio.file.Paths.get(dir, ".chunk123.tmp"),
      "{\"block_number\": 999}".getBytes)
    assert(BlockFeedProvider.listChunks(dir).length == 1)
    val df = spark.read.format("graft-blocks").schema(schema)
      .option("path", dir).load()
    assert(df.agg(max(col("block_number"))).collect().head.getLong(0) == 3L)
  }
}
