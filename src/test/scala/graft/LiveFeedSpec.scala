package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.LiveBlockFeed
import graft.streaming.StreamDriver

/** The live-stream scenario (S1 seam under a genuinely racing feed): a
  * producer thread pushes block chunks while the ingestion query RUNS —
  * finalized blocks, then a pending head, then the head re-sent finalized
  * with a new pending head (the reference's pending → accepted transition),
  * then a mid-stream reorg via quiesce + retract + resume on the same
  * checkpoint. Operational and canonical views are asserted at every step. */
class LiveFeedSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("block_number", LongType),
    StructField("transaction_index", LongType),
    StructField("event_index", LongType),
    StructField("is_pending", BooleanType)))

  private def rows(blocks: Range, pending: Boolean) = {
    import spark.implicits._
    blocks.map(b => (b.toLong, 0L, 0L, pending))
      .toDF("block_number", "transaction_index", "event_index", "is_pending")
  }

  /** Poll until `cond` holds (listing-vs-write races make timing
    * nondeterministic; the assertions are on converged states). */
  private def eventually(what: String, timeoutMs: Long = 60000L)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond) {
      if (System.nanoTime() > deadline) fail(s"timed out waiting for: $what")
      Thread.sleep(100)
    }
  }

  test("racing live feed: pending head swap and mid-stream reorg (S1/T3/T4)") {
    val root = SparkSpec.tempDir("graft-live").toString
    val rawDir = s"$root/raw"
    Files.createDirectories(java.nio.file.Paths.get(rawDir))

    val feed = new LiveBlockFeed(rawDir, schema)
    val driver = new StreamDriver(spark, s"$root/facts", s"$root/ckpt")

    def canonicalMax: Long = {
      // the directory can exist before any data file lands (mid-write) —
      // treat unreadable/empty the same as absent
      try spark.read.parquet(s"$root/facts/raw_events").agg(max(col("block_number")))
        .collect().headOption.filterNot(_.isNullAt(0)).map(_.getLong(0)).getOrElse(-1L)
      catch { case _: org.apache.spark.sql.AnalysisException => -1L }
    }
    def operational: (Long, Long) = { // (count, max block)
      val o = driver.operationalEvents
      if (o.columns.isEmpty) (0L, -1L)
      else {
        val r = o.agg(count(lit(1)), max(col("block_number"))).collect().head
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
      }
    }

    val query = driver.start(feed.source, Trigger.ProcessingTime("150 milliseconds"))
    try {
      // ---- step 1: a producer thread races the running query ----
      val producer = new Thread(() => {
        feed.emit(rows(1 to 30, pending = false))
        Thread.sleep(200)
        feed.emit(rows(31 to 33, pending = true))
      }, "live-feed-producer")
      producer.start()
      producer.join()

      eventually("canonical 1..30 + pending head 31..33 visible") {
        canonicalMax == 30L && operational == ((33L, 33L))
      }

      // ---- step 2: the head finalizes; a new pending head replaces it ----
      // one chunk carries both, like one gRPC data message with mixed
      // finality: 31..32 accepted, 33..35 the new unfinalized head
      feed.emit(rows(31 to 32, pending = false)
        .unionByName(rows(33 to 35, pending = true)))

      eventually("head swap: canonical through 32, pending exactly 33..35") {
        canonicalMax == 32L && operational == ((35L, 35L))
      }
      // the swapped-out pending rows are gone, not duplicated: 32 canonical
      // + 3 pending, every block number unique
      assert(driver.operationalEvents.groupBy(col("block_number")).count()
        .filter(col("count") > 1).isEmpty, "head swap must not duplicate blocks")

      // ---- step 3: reorg at 25 — control-channel event: quiesce, retract,
      // resume on the SAME checkpoint while the feed keeps producing ----
      query.stop()
      query.awaitTermination()
      driver.retract(25L)
      assert(canonicalMax == 24L, "retract must drop canonical blocks >= 25")
      assert(operational == ((24L, 24L)), "a reorg invalidates the pending head")

      val query2 = driver.start(feed.source, Trigger.ProcessingTime("150 milliseconds"))
      try {
        feed.emit(rows(25 to 40, pending = false)) // the post-reorg chain
        eventually("post-reorg chain ingested: canonical through 40") {
          canonicalMax == 40L && operational == ((40L, 40L))
        }
        // exactly 1..40, once each: the replay ledger kept retracted blocks
        // out and the new chain filled the gap
        val all = spark.read.parquet(s"$root/facts/raw_events")
        assert(all.count() == 40L)
        assert(all.groupBy(col("block_number")).count()
          .filter(col("count") > 1).isEmpty, "no block may appear twice after reorg")
      } finally { query2.stop(); query2.awaitTermination() }
    } finally { if (query.isActive) query.stop() }
  }

  test("a restarted producer resumes chunk numbering, never clobbering committed chunks") {
    val dir = SparkSpec.tempDir("graft-live-restart").toString
    val feed1 = new LiveBlockFeed(dir, schema)
    feed1.emit(rows(1 to 3, pending = false))
    feed1.emit(rows(4 to 6, pending = false))

    // a stray non-numeric entry (operator backup) must be skipped by the
    // resume scan, not parsed into a constructor NumberFormatException
    Files.createDirectory(java.nio.file.Paths.get(dir, "chunk=2.bak"))

    // a NEW producer instance over the same directory (process restart):
    // counting from zero again would overwrite chunk=1, deleting parquet
    // parts a consumer checkpoint may already reference
    val feed2 = new LiveBlockFeed(dir, schema)
    feed2.emit(rows(7 to 9, pending = false))

    assert(graft.util.Dirs.numericSuffixes(dir, "chunk=").sorted == Seq(1, 2, 3))
    // all 9 blocks survive — nothing was overwritten
    val all = spark.read.schema(schema)
      .parquet(s"$dir/chunk=1", s"$dir/chunk=2", s"$dir/chunk=3")
    assert(all.count() == 9L)
    assert(all.agg(org.apache.spark.sql.functions.countDistinct(
      org.apache.spark.sql.functions.col("block_number"))).head().getLong(0) == 9L)
  }
}
