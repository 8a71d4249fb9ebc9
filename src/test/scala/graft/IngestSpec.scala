package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ingest.Ingest

/** Event-id packing laws, pool-key hashing, dimension upsert, reorg. */
class IngestSpec extends SparkSpec {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  test("event_id packing preserves (block, tx, idx) order (dao.ts:124)") {
    val key = Gen.zip(Gen.chooseNum(0L, 10000000L), Gen.chooseNum(0L, 65535L),
      Gen.chooseNum(0L, 65535L))
    check(Prop.forAll(key, key) { (a, b) =>
      val pack = (k: (Long, Long, Long)) => k._1 * 4294967296L + k._2 * 65536L + k._3
      (pack(a) < pack(b)) == (Ordering[(Long, Long, Long)].lt(a, b))
    })
  }

  test("eventId column expression matches scalar packing") {
    import spark.implicits._
    val df = Seq((5L, 3L, 2L), (0L, 0L, 0L), (1000L, 65535L, 65535L))
      .toDF("b", "t", "e")
      .select(Ingest.eventId($"b", $"t", $"e").as("id"),
        Ingest.blockOf(Ingest.eventId($"b", $"t", $"e")).as("blk"), $"b")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(5L * 4294967296L + 3L * 65536L + 2L, 0L, 1000L * 4294967296L + 65535L * 65536L + 65535L))
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("poolKeyHash column matches the exact byte-layout digest (poolKeyHash.ts:4-14)") {
    import spark.implicits._
    val t0 = BigInt("1234abcd", 16); val t1 = BigInt("ff00ff00ff", 16)
    val fee = BigInt("34028236692093846346337460743176821")
    val ts = BigInt(200); val ext = BigInt(0)

    val expected = Ingest.poolKeyHash(t0, t1, fee, ts, ext)
    val got = Seq((s"0x${t0.toString(16)}", s"0x${t1.toString(16)}",
        s"0x${fee.toString(16)}", s"0x${ts.toString(16)}", s"0x${ext.toString(16)}"))
      .toDF("t0", "t1", "fee", "ts", "ext")
      .select(Ingest.poolKeyHashCol($"t0", $"t1", $"fee", $"ts", $"ext").as("h"))
      .collect().head.getString(0)
    assert(BigInt(got, 16) == expected)
  }

  test("dimension upsert keeps first row per key (dao.ts:1869-1893)") {
    import spark.implicits._
    val existing = Seq(("k1", "a"), ("k2", "b")).toDF("key_hash", "v")
    val incoming = Seq(("k2", "CHANGED"), ("k3", "c")).toDF("key_hash", "v")
    val merged = Ingest.upsertDim(existing, incoming, "key_hash")
      .orderBy("key_hash").collect().map(r => (r.getString(0), r.getString(1)))
    assert(merged.toSeq == Seq(("k1", "a"), ("k2", "b"), ("k3", "c")))
  }

  test("reorg invariant: ingest(a++b) then retract(b) == ingest(a) (index.ts:162-184)") {
    import spark.implicits._
    val mk = (b: Long, t: Long, e: Long) =>
      b * 4294967296L + t * 65536L + e
    val a = (1L to 50L).flatMap(b => Seq(mk(b, 0, 0), mk(b, 1, 0)))
    val bSuffix = (51L to 60L).map(mk(_, 0, 0))

    val all = (a ++ bSuffix).toDF("event_id")
    val retracted = Ingest.retractFacts(all, 51L)
    assert(retracted.orderBy("event_id").collect().map(_.getLong(0)).toSeq == a.sorted)
  }

  test("streaming retract rewrites only affected buckets (T3)") {
    import spark.implicits._
    val dir = SparkSpec.tempDir("graft-stream").toString
    val driver = new graft.streaming.StreamDriver(spark, dir, s"$dir/ckpt")

    val batch = (1L to 9000L).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index")
    driver.processBatch(batch, 0L)

    driver.retract(5000L)
    val remaining = spark.read.parquet(s"$dir/raw_events")
    assert(remaining.count() == 4999L)
    assert(remaining.agg(max("block_number")).collect().head.getLong(0) == 4999L)
    // bucket 0 untouched, bucket 1 rewritten, bucket 2 gone
    val buckets = remaining.select(col("block_bucket").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(buckets == Seq(0L, 1L))
  }

  test("retract crash recovery: committed-but-unswapped survivors are not lost (T3)") {
    import spark.implicits._
    val dir = SparkSpec.tempDir("graft-stream").toString
    val driver = new graft.streaming.StreamDriver(spark, dir, s"$dir/ckpt")

    val batch = (1L to 9000L).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index")
    driver.processBatch(batch, 0L)

    // Simulate a retract(5000) that crashed right AFTER its commit point
    // (survivors fully materialized + DELETE marker written) but BEFORE any
    // delete or swap: replay step 1 of retract() by hand, then "crash". The
    // marker carries "fromBlock maxBatchId" (the ledger entry is replayed
    // from it on recovery).
    val boundary = 5000L / 4096
    graft.ingest.Ingest.retractFacts(
        spark.read.parquet(s"$dir/raw_events")
          .filter(col("block_bucket") === boundary), 5000L)
      .write.mode("overwrite")
      .partitionBy("batch_id", "block_bucket")
      .parquet(s"$dir/.retract_tmp")
    val markerPath = java.nio.file.Paths.get(s"$dir/.retract_tmp/_RETRACT_DELETE")
    java.nio.file.Files.write(markerPath, s"5000 0".getBytes("UTF-8"))

    // Recovery must complete the pending retract from the materialized
    // survivors — final state identical to an uninterrupted retract(5000).
    driver.recoverRetract()
    val remaining = spark.read.parquet(s"$dir/raw_events")
    assert(remaining.count() == 4999L)
    assert(remaining.agg(max("block_number")).collect().head.getLong(0) == 4999L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/.retract_tmp")))

    // A marker-less temp dir (crash BEFORE commit) is discarded untouched:
    // the source is still intact, so nothing may be deleted from it.
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/.retract_tmp/batch_id=0"))
    driver.recoverRetract()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/.retract_tmp")))
    assert(spark.read.parquet(s"$dir/raw_events").count() == 4999L)
  }

  test("checkpoint replay after retract does not resurrect retracted blocks (T2/T3)") {
    import spark.implicits._
    val dir = SparkSpec.tempDir("graft-stream").toString
    val driver = new graft.streaming.StreamDriver(spark, dir, s"$dir/ckpt")

    val preReorg = (1L to 9000L).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index")
    driver.processBatch(preReorg, 0L)
    driver.retract(5000L)

    // a crash before batch 0's checkpoint commit makes Spark REPLAY it with
    // its pre-reorg file list; the retract ledger must filter the replay to
    // the survivor set instead of resurrecting blocks >= 5000 and
    // clobbering the swapped-in boundary bucket
    driver.processBatch(preReorg, 0L)
    val afterReplay = spark.read.parquet(s"$dir/raw_events")
    assert(afterReplay.count() == 4999L)
    assert(afterReplay.agg(max("block_number")).collect().head.getLong(0) == 4999L)

    // the post-reorg canonical chain arrives in NEWER batches — unfiltered
    val postReorg = (5000L to 5100L).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index")
    driver.processBatch(postReorg, 1L)
    val afterNew = spark.read.parquet(s"$dir/raw_events")
    assert(afterNew.count() == 4999L + 101L)
    assert(afterNew.agg(max("block_number")).collect().head.getLong(0) == 5100L)
  }

  test("rows without a block number are dropped at the ingest boundary") {
    import spark.implicits._
    val dir = SparkSpec.tempDir("graft-stream").toString
    val driver = new graft.streaming.StreamDriver(spark, dir, s"$dir/ckpt")
    val batch = Seq((Option(7L), 0L, 0L), (Option.empty[Long], 0L, 1L))
      .toDF("block_number", "transaction_index", "event_index")
    driver.processBatch(batch, 0L)
    val written = spark.read.parquet(s"$dir/raw_events")
    assert(written.count() == 1L)
    // no __HIVE_DEFAULT_PARTITION__ bucket exists to wedge a retract, and a
    // retract covering everything completes without a parse error
    val bucketDirs = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$dir/raw_events/batch_id=0"))
      .toArray.map(_.toString).filter(_.contains("block_bucket"))
    assert(bucketDirs.forall(!_.contains("__HIVE_DEFAULT_PARTITION__")))
    driver.retract(5L)
    val schema = written.schema
    assert(spark.read.schema(schema).parquet(s"$dir/raw_events").count() == 0L)
  }

  test("compact folds old batches into the archive partition losslessly") {
    import spark.implicits._
    val dir = SparkSpec.tempDir("graft-stream").toString
    val driver = new graft.streaming.StreamDriver(spark, dir, s"$dir/ckpt")
    def batchDf(lo: Long, hi: Long) = (lo to hi).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index")

    driver.processBatch(batchDf(1, 3000), 0L)
    driver.processBatch(batchDf(3001, 6000), 1L)
    driver.processBatch(batchDf(6001, 9000), 2L)
    val before = spark.read.parquet(s"$dir/raw_events")
      .select("block_number").as[Long].collect().sorted.toSeq

    driver.compact(2L) // fold batches 0 and 1; batch 2 stays live

    val batchDirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/raw_events"))
      .toArray.map(_.toString.split('/').last).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(batchDirs == Seq("batch_id=-1", "batch_id=2"))
    val after = spark.read.parquet(s"$dir/raw_events")
      .select("block_number").as[Long].collect().sorted.toSeq
    assert(after == before)

    // a second compaction folds the previous archive plus batch 2
    driver.processBatch(batchDf(9001, 9100), 3L)
    driver.compact(3L)
    val dirs2 = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/raw_events"))
      .toArray.map(_.toString.split('/').last).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(dirs2 == Seq("batch_id=-1", "batch_id=3"))
    assert(spark.read.parquet(s"$dir/raw_events").count() == 9100L)
  }

  test("checkpoint replay of a compacted batch does not duplicate its rows") {
    import spark.implicits._
    val dir = SparkSpec.tempDir("graft-stream").toString
    val driver = new graft.streaming.StreamDriver(spark, dir, s"$dir/ckpt")
    val b0 = (1L to 100L).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index")
    driver.processBatch(b0, 0L)
    driver.processBatch((101L to 200L).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index"), 1L)
    driver.compact(2L)

    // replay of folded batch 0 must not resurrect batch_id=0
    driver.processBatch(b0, 0L)
    assert(spark.read.parquet(s"$dir/raw_events").count() == 200L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/raw_events/batch_id=0")))
  }

  test("retract over the archive partition prunes and rewrites correctly") {
    import spark.implicits._
    val dir = SparkSpec.tempDir("graft-stream").toString
    val driver = new graft.streaming.StreamDriver(spark, dir, s"$dir/ckpt")
    driver.processBatch((1L to 9000L).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index"), 0L)
    driver.compact(1L)

    driver.retract(5000L)
    val left = spark.read.parquet(s"$dir/raw_events")
    assert(left.count() == 4999L)
    assert(left.agg(max("block_number")).collect().head.getLong(0) == 4999L)
  }

  test("compact clamps an over-large bound so future batches are not skipped") {
    import spark.implicits._
    val dir = SparkSpec.tempDir("graft-stream").toString
    val driver = new graft.streaming.StreamDriver(spark, dir, s"$dir/ckpt")
    driver.processBatch((1L to 100L).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index"), 0L)
    driver.compact(100L) // fat-fingered bound: only batch 0 exists

    // batch 1 is NOT folded (it did not exist at compact time) — the
    // clamped ledger must let it write normally instead of skipping it
    driver.processBatch((101L to 200L).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index"), 1L)
    assert(spark.read.parquet(s"$dir/raw_events").count() == 200L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/raw_events/batch_id=1")))
  }

  test("compact recovery completes a fold that crashed before its deletes") {
    import spark.implicits._
    val dir = SparkSpec.tempDir("graft-stream").toString
    val driver = new graft.streaming.StreamDriver(spark, dir, s"$dir/ckpt")
    def batchDf(lo: Long, hi: Long) = (lo to hi).map(b => (b, 0L, 0L))
      .toDF("block_number", "transaction_index", "event_index")
    driver.processBatch(batchDf(1, 100), 0L)
    driver.processBatch(batchDf(101, 200), 1L)

    // replay compact step 1 by hand (fold batches < 2 into the archive),
    // write the DELETE marker, then "crash" before any source delete
    spark.read.parquet(s"$dir/raw_events")
      .filter(col("batch_id") < 2L)
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      .partitionBy("batch_id", "block_bucket")
      .parquet(s"$dir/.compact_tmp")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/.compact_tmp/_RETRACT_DELETE"), "2".getBytes("UTF-8"))

    driver.recoverCompact()

    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/raw_events"))
      .toArray.map(_.toString.split('/').last).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(dirs == Seq("batch_id=-1"))
    assert(spark.read.parquet(s"$dir/raw_events").count() == 200L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/.compact_tmp")))
    // the ledger entry was replayed from the marker: a replay of batch 0 is skipped
    driver.processBatch(batchDf(1, 100), 0L)
    assert(spark.read.parquet(s"$dir/raw_events").count() == 200L)
  }
}
