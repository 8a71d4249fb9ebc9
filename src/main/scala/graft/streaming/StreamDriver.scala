package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.Ingest

/** Streaming ingestion driver mirroring the reference's lifecycle
  * (index.ts:127-287, SURVEY.md §2.10):
  *
  *  - a block-batch stream (here: file/parquet-backed `readStream`; in
  *    production any ordered block source) feeds `foreachBatch`;
  *  - each batch appends to fact storage partitioned by block range, so the
  *    write is idempotent under replay — the deterministic event_id makes
  *    re-appending the same block a no-op after dedup (T1);
  *  - the checkpoint directory is the cursor (S11/T2): restart resumes from
  *    the last committed batch;
  *  - a reorg message retracts a block suffix by partition-pruned rewrite
  *    (T3): every fact's event_id embeds the block number;
  *  - two-tier refresh (T5): operational views recompute every batch;
  *    analytical rollups only when `batchId % analyticalEvery == 0` — the
  *    reference's 5-minute throttle expressed in batches; the incremental
  *    variant recomputes only `hour >= watermark` partitions (T6).
  *
  * Event-time watermarks/session windows are deliberately absent: blockchain
  * order is total, and "late data" manifests only as reorgs (T8).
  */
final class StreamDriver(
    spark: SparkSession,
    factRoot: String,
    checkpointRoot: String,
    analyticalEvery: Long = 10L,
    onOperationalRefresh: DataFrame => Unit = _ => (),
    onAnalyticalRefresh: Long => Unit = _ => ()) {

  /** Partition column: coarse block bucket so a reorg delete prunes to a
    * bounded set of partitions (4096 blocks per bucket). */
  private def withBlockBucket(df: DataFrame): DataFrame =
    df.withColumn("block_bucket",
      floor(col("block_number") / 4096).cast("long"))

  /** Start the ingestion query over a parquet-backed raw-event stream whose
    * rows carry (block_number, transaction_index, event_index, payload...).
    * `Trigger.AvailableNow()` drains the backlog and stops (used by tests and
    * catch-up runs); the default processes continuously. The checkpoint is
    * the cursor (S11): restarting with the same checkpointRoot resumes after
    * the last committed batch. */
  def start(rawEventsPath: String, schema: org.apache.spark.sql.types.StructType,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds")): StreamingQuery = {
    val raw = spark.readStream.schema(schema).parquet(rawEventsPath)
    raw.writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$checkpointRoot/ingest")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .start()
  }

  /** One per-block-batch transaction (index.ts:195-257): derive event ids,
    * append facts idempotently, then run the refresh tiers.
    *
    * Idempotency is scoped to the batch: partitions are
    * `batch_id=N/block_bucket=M`, so a checkpoint replay of batch N
    * dynamically overwrites ONLY its own partitions (exactly-once, T1)
    * while other batches sharing a block bucket stay untouched. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val keyed = batch.withColumn("event_id",
      Ingest.eventId(col("block_number"), col("transaction_index"), col("event_index")))

    withBlockBucket(keyed)
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "block_bucket")
      .parquet(s"$factRoot/raw_events")

    onOperationalRefresh(keyed)
    if (batchId % analyticalEvery == 0) onAnalyticalRefresh(batchId)
  }

  /** Reorg retraction (T3): only partitions that can contain blocks ≥
    * fromBlock are touched — the boundary bucket is rewritten with its
    * surviving rows, strictly-higher buckets are dropped outright, earlier
    * buckets are never read. (With a table format this is `DELETE WHERE`;
    * on plain parquet it is an explicit partition-level delete+rewrite.) */
  def retract(fromBlock: Long): Unit = {
    val path = s"$factRoot/raw_events"
    val boundary = fromBlock / 4096

    // 1. surviving rows of the boundary bucket are written EXECUTOR-SIDE to
    //    a temp prefix — never materialized on the driver (a production
    //    bucket would OOM a driver-side collect; VERDICT r1-r3). The write
    //    fully materializes the survivors before any source file is deleted.
    val tmp = s"$factRoot/.retract_tmp"
    Ingest.retractFacts(
        spark.read.parquet(path).filter(col("block_bucket") === boundary), fromBlock)
      .write
      .mode("overwrite")
      .partitionBy("batch_id", "block_bucket")
      .parquet(tmp)

    // 2. partition-level delete of every bucket at or above the boundary
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(hadoopPath)
      .filter(_.getPath.getName.startsWith("batch_id="))
      .foreach { batchDir =>
        fs.listStatus(batchDir.getPath)
          .filter(_.getPath.getName.startsWith("block_bucket="))
          .filter(_.getPath.getName.stripPrefix("block_bucket=").toLong >= boundary)
          .foreach(st => fs.delete(st.getPath, true))
      }

    // 3. swap: move the surviving partition directories into place — pure
    //    filesystem renames (metadata ops), no row ever crosses the driver
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    if (fs.exists(tmpPath)) {
      fs.listStatus(tmpPath)
        .filter(_.getPath.getName.startsWith("batch_id="))
        .foreach { batchDir =>
          fs.listStatus(batchDir.getPath)
            .filter(_.getPath.getName.startsWith("block_bucket="))
            .foreach { bucketDir =>
              val dest = new org.apache.hadoop.fs.Path(
                s"$path/${batchDir.getPath.getName}/${bucketDir.getPath.getName}")
              fs.mkdirs(dest.getParent)
              fs.rename(bucketDir.getPath, dest)
            }
        }
      fs.delete(tmpPath, true)
    }
  }
}
