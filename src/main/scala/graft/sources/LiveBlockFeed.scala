package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** A live block feed over the file-source seam — the closest a sandboxed
  * build gets to the reference's network cursor stream (an Apibara gRPC
  * subscription pushing block batches while the indexer runs,
  * index.ts:127-141).
  *
  * A producer (its own thread, a bridge process draining gRPC, a test
  * script) calls [[emit]] while a [[graft.streaming.StreamDriver]] query is
  * RUNNING over [[source]]; each emit lands one uniquely-named chunk under
  * the watched directory and becomes (part of) the next micro-batch. The
  * arrival race is real — the stream's file listing runs concurrently with
  * the producer's write — and safe, because the chunk is fully written
  * under a staging directory OUTSIDE the watched tree and then renamed
  * into the watched path as ONE directory rename. Per-part-file renames
  * would not be enough: a multi-partition emit commits part files one at a
  * time, so a listing could catch half an emit and split one block batch
  * across two micro-batches (and a listing must never record an in-flight
  * staging path that vanishes at rename time — that fails the micro-batch
  * on read).
  *
  * Rows follow the raw-event contract
  * `(block_number, transaction_index, event_index, ..., is_pending?)`:
  * a finalized block is emitted with `is_pending = false`, the unfinalized
  * head with `true`, and a later emit re-sends the head's blocks finalized
  * (the reference's pending → accepted transition). Reorgs are NOT emitted
  * through the feed: like the reference's invalidate message they are a
  * control-channel event, delivered by quiescing the query and calling
  * `StreamDriver.retract` before resuming on the same checkpoint.
  */
final class LiveBlockFeed(dir: String, val schema: StructType) {

  // resume numbering after any chunks a previous producer left behind: a
  // restarted producer that re-counted from 0 would OVERWRITE committed
  // chunk dirs the consumer's file-source WAL already references, breaking
  // checkpoint recovery with FileNotFoundException (JsonBlockFeed makes the
  // same guarantee)
  private val chunkIds: AtomicInteger = new AtomicInteger(
    graft.util.Dirs.numericSuffixes(dir, "chunk=").foldLeft(0)(math.max))

  /** The consuming side: hand this to `StreamDriver.start`. */
  def source: BlockSource = FileBlockSource(s"$dir/*", schema)

  /** Append one block batch to the feed. Thread-safe; callable while the
    * consuming query runs. The frame must match [[schema]]. The batch is
    * staged under a hidden directory and committed with one atomic
    * directory rename, so a concurrent listing sees the whole emit or
    * none of it. */
  def emit(batch: DataFrame): Unit = {
    require(batch.schema.fieldNames.sameElements(schema.fieldNames),
      s"feed rows must match the declared schema ${schema.fieldNames.mkString(",")}")
    val id = chunkIds.incrementAndGet()
    // stage OUTSIDE the watched tree: a glob listing must never observe
    // in-flight part files (leaf names aren't dot-prefixed, so hidden-file
    // filtering would not reliably exclude a staging dir under `dir`)
    val staged = s"${dir.stripSuffix("/")}.staging/chunk=$id"
    batch.write.mode("overwrite").parquet(staged)
    val conf = batch.sparkSession.sparkContext.hadoopConfiguration
    val dest = new org.apache.hadoop.fs.Path(s"$dir/chunk=$id")
    val fs = dest.getFileSystem(conf)
    require(fs.rename(new org.apache.hadoop.fs.Path(staged), dest),
      s"commit rename failed for $staged")
  }
}
