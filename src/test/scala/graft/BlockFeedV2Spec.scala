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
    val dir = Files.createTempDirectory("graft-feed-v2").toString + "/feed"
    val feed = new JsonBlockFeed(dir)
    feed.emit(chunk(1 to 50))
    feed.emit(chunk(51 to 80))

    val out = Files.createTempDirectory("graft-feed-v2-out").toString
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
    val dir = Files.createTempDirectory("graft-feed-v2b").toString + "/feed"
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
    val root = Files.createTempDirectory("graft-feed-v2e").toString
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
    val dir = Files.createTempDirectory("graft-feed-v2a").toString + "/feed"
    val feed = new JsonBlockFeed(dir)
    (1 to 3).foreach(i => feed.emit(chunk(i * 100 until i * 100 + 10)))

    val out = Files.createTempDirectory("graft-feed-v2a-out").toString
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

  test("chunk listing ignores uncommitted temp files") {
    val dir = Files.createTempDirectory("graft-feed-v2t").toString
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
