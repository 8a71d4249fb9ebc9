package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The ordered block-event source boundary.
  *
  * The reference ingests from a network stream (an Apibara gRPC cursor
  * stream, index.ts:16-24,127-141). This trait is the seam where that
  * source plugs into [[graft.streaming.StreamDriver]]: anything that can
  * present itself as a Spark streaming DataFrame of raw event rows
  * `(block_number, transaction_index, event_index, payload..., is_pending?)`
  * qualifies — a Kafka topic, a custom DataSource V2 stream, or a bridge
  * process draining gRPC into files.
  *
  * Ordering contract: rows arrive grouped by block batch and the source
  * replays from the driver's checkpoint position on restart (Spark's
  * offset semantics provide this for any real streaming source).
  */
trait BlockSource {

  /** Row schema of the raw event stream this source emits. */
  def schema: StructType

  /** The streaming DataFrame (must have `isStreaming == true`). */
  def stream(spark: SparkSession): DataFrame
}

/** The bundled parquet-directory implementation — the sandbox stand-in for
  * the gRPC stream (no network here) and the natural shape for replay/
  * backfill from an event archive. Each new file under `path` (glob
  * allowed) becomes a micro-batch; Spark's file-source offsets make
  * restarts resume after the last committed file. */
final case class FileBlockSource(path: String, schema: StructType) extends BlockSource {
  override def stream(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema).parquet(path)
}

/** The custom DataSource V2 implementation of the seam: the `graft-blocks`
  * connector ([[graft.sources.v2.BlockFeedProvider]]) reading a directory
  * of atomically-committed JSON-lines chunks — the wire shape a gRPC
  * bridge process writes. Offsets are committed-chunk counts, so
  * checkpoint recovery replans identical micro-batches (exactly-once with
  * StreamDriver's idempotent sink). */
final case class FeedBlockSource(dir: String, schema: StructType) extends BlockSource {
  override def stream(spark: SparkSession): DataFrame =
    spark.readStream.format("graft-blocks").schema(schema).option("path", dir).load()
}
