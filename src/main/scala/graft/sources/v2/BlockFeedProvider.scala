package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-blocks`: a DataSource V2 streaming connector for the ordered
  * block-event feed — the Spark-native form of the reference's network
  * cursor stream (an Apibara gRPC subscription delivering block batches,
  * index.ts:16-24,127-141).
  *
  * Transport model: a bridge process
  * ([[graft.sources.net.BlockStreamDrainer]] over the TCP wire protocol, a
  * gRPC drainer in a protobuf-equipped deployment, a test, the
  * [[JsonBlockFeed]] helper) appends immutable chunk files
  * `chunk-NNNNNNNNNNNN.jsonl` — one JSON object per raw event row — into a
  * directory, committing each via atomic rename so a chunk is either
  * invisible or complete. The STREAM OFFSET is the count of committed
  * chunks: chunks are append-only and ordered by their numeric suffix, so
  * an offset range `[start, end)` always re-plans to the same files — the
  * deterministic-replay property Spark's exactly-once contract needs
  * (each micro-batch re-reads identically on checkpoint recovery).
  *
  * All FOUR of the reference stream's dispatch arms ride this one format
  * (index.ts:142-287): `data` as plain rows, pending/accepted as the
  * `is_pending` row flag, and `invalidate` / `heartbeat` as single-row
  * CONTROL chunks (`chunk-N.ctrl.jsonl`, [[BlockFeedProvider.ControlCol]])
  * that offset planning always places alone in their micro-batch — see
  * `latestOffset(start, limit)`.
  *
  * Offset-listing cost under long stream histories: the offset is a chunk
  * COUNT, so `latestOffset` is one directory listing — O(committed chunks),
  * not O(rows). Chunk files are append-only forever from the connector's
  * view; a deployment whose history outgrows a flat directory listing
  * (~10⁶ chunks) periodically quiesces, folds the consumed prefix into the
  * batch archive (StreamDriver.compact's discipline), moves the survivor
  * chunks to a fresh feed directory renumbered from 0, and restarts the
  * query with a fresh checkpoint — the same base-offset rotation Kafka
  * performs with log segment deletion + earliest-offset advance. PLANS.md
  * §"DSv2 offset compaction" records the protocol.
  *
  * Usage (streaming and batch):
  * {{{
  *   spark.readStream.format("graft-blocks")
  *     .schema(contract).option("path", dir).load()
  *   spark.read.format("graft-blocks")
  *     .schema(contract).option("path", dir).load()   // backfill scan
  * }}}
  *
  * Scale notes: one input partition per chunk — the parallelism follows the
  * producer's batching, as with Kafka partitions; offsets are O(1) counts
  * (a directory listing, no per-row state); readers stream lines without
  * buffering a chunk in memory. Scalar fields only (long/int/double/
  * boolean/string) — the raw-event contract (block_number,
  * transaction_index, event_index, payload…, is_pending) is scalar-typed;
  * felt payloads ride as hex strings, exactly as the reference's wire
  * format delivers them.
  */
final class BlockFeedProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-blocks"

  /** The caller's schema IS the contract (supportsExternalMetadata); the
    * inferred default is the minimal block-event triple. */
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockFeedProvider.defaultSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-blocks requires option 'path'"))
    schema.fields.foreach(f => require(BlockFeedProvider.supported(f.dataType),
      s"graft-blocks supports scalar fields only; ${f.name} is ${f.dataType}"))
    new BlockFeedTable(dir, schema)
  }
}

object BlockFeedProvider {
  val defaultSchema: StructType = StructType(Seq(
    StructField("block_number", LongType),
    StructField("transaction_index", LongType),
    StructField("event_index", LongType)))

  /** Control-message columns (the reference stream's non-data dispatch arms,
    * index.ts:142-287: `invalidate` and `heartbeat`; `data` rides as plain
    * rows and pending as the `is_pending` flag). A control row has
    * `_control` set and every data column null; a data row has `_control`
    * null. Append these to the read schema via [[withControlColumns]] when
    * the feed carries markers. */
  val ControlCol = "_control"
  val InvalidateFromCol = "_invalidate_from"
  val ControlInvalidate = "invalidate"
  val ControlHeartbeat = "heartbeat"

  def withControlColumns(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      StructField(ControlCol, StringType),
      StructField(InvalidateFromCol, LongType)))

  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | StringType => true
    case _ => false
  }

  /** `chunk-<digits>.jsonl` (data) or `chunk-<digits>.ctrl.jsonl` (control
    * marker); anything else in the directory is a foreign file, skipped. */
  private val ChunkName = "chunk-(\\d+)(\\.ctrl)?\\.jsonl".r

  /** The numeric suffix of a committed chunk file name, if it is one. */
  def chunkId(name: String): Option[Long] = name match {
    case ChunkName(digits, _) if digits.length <= 18 => Some(digits.toLong)
    case _ => None
  }

  /** A control chunk carries exactly one marker row (invalidate/heartbeat)
    * and no data. It is detectable from the NAME so offset planning can put
    * it alone in its micro-batch without opening the file. */
  def isControl(path: String): Boolean =
    Paths.get(path).getFileName.toString.contains(".ctrl.")

  /** Committed chunks in append order. Ordered by the PARSED numeric
    * suffix, not lexicographically: zero-padding makes the two agree up to
    * the padding width, but past it (chunk-1000000 vs chunk-999999 at %06d)
    * lexicographic order would silently diverge from append order and break
    * deterministic offset→file replay. Foreign `.jsonl` files are skipped,
    * never parse errors. */
  def listChunks(dir: String): Array[String] =
    graft.util.Dirs.listNames(dir)
      .flatMap(n => chunkId(n).map(id => (id, n)))
      .sortBy(_._1)
      .map { case (_, n) => Paths.get(dir).resolve(n).toString }
      .toArray
}

final class BlockFeedTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-blocks:$dir"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxChunks = Option(options.get("maxChunksPerTrigger")).map(_.toInt)
    maxChunks.foreach(n => require(n > 0, s"maxChunksPerTrigger must be positive, got $n"))
    new ScanBuilder {
      override def build(): Scan = new BlockFeedScan(dir, tableSchema, maxChunks)
    }
  }
}

final class BlockFeedScan(
    dir: String, schema: StructType, maxChunksPerTrigger: Option[Int] = None) extends Scan {
  override def readSchema(): StructType = schema

  /** Batch leg: a backfill scan of every committed chunk — the replay/
    * bootstrap path (the reference starts from a cursor of 0 the same way). */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      BlockFeedProvider.listChunks(dir).map(ChunkPartition)
    override def createReaderFactory(): PartitionReaderFactory =
      new ChunkReaderFactory(schema)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BlockFeedMicroBatchStream(dir, schema, maxChunksPerTrigger)
}

/** Offset = number of committed chunks. Monotone because chunks are
  * append-only and never rewritten. */
final case class ChunkCountOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}

final class BlockFeedMicroBatchStream(
    dir: String, schema: StructType, maxChunksPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = ChunkCountOffset(0)

  /** Trigger.AvailableNow drain target: captured ONCE at query start.
    * Without this, Spark's generic wrapper would capture the FIRST
    * admission-limited offset as the drain target — a control marker (or
    * maxChunksPerTrigger cap) at the head of the backlog would end the
    * run after one micro-batch instead of draining. */
  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(BlockFeedProvider.listChunks(dir).length)

  override def latestOffset(): Offset =
    ChunkCountOffset(BlockFeedProvider.listChunks(dir).length)

  /** Backpressure (`maxChunksPerTrigger`): cap how far one micro-batch
    * advances, so a deep backlog drains in bounded batches instead of one
    * giant catch-up batch — the Kafka `maxOffsetsPerTrigger` discipline.
    * "Rows" at the admission layer are CHUNKS: the unit the offset counts. */
  override def getDefaultReadLimit: ReadLimit =
    maxChunksPerTrigger.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  /** Besides the admission cap, a micro-batch never CROSSES a control
    * chunk (invalidate/heartbeat marker): a marker rides ALONE in its
    * batch, so the consumer (StreamDriver) sees data batches and control
    * batches strictly ordered — pre-invalidate data commits before the
    * retraction runs, post-invalidate data only after it. This is the
    * micro-batch form of the reference's sequential message dispatch
    * (index.ts:142-287). Determinism holds: the boundary is a pure
    * function of the committed chunk list prefix, so recovery re-plans
    * the same ranges. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val committed = BlockFeedProvider.listChunks(dir)
    // under AvailableNow, never admit past the chunk count captured at
    // query start (chunks committed mid-drain wait for the next run)
    val avail = availableNowTarget
      .map(t => math.min(t, committed.length)).getOrElse(committed.length)
    val chunks = committed.take(avail)
    val from = start.asInstanceOf[ChunkCountOffset].n
    val cap = limit match {
      case r: ReadMaxRows => math.min(chunks.length.toLong, from + r.maxRows()).toInt
      case _ => chunks.length
    }
    val end =
      if (from < chunks.length && BlockFeedProvider.isControl(chunks(from))) from + 1
      else (from until cap).find(i => BlockFeedProvider.isControl(chunks(i))).getOrElse(cap)
    ChunkCountOffset(end)
  }

  override def deserializeOffset(json: String): Offset =
    ChunkCountOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChunkCountOffset].n
    val e = end.asInstanceOf[ChunkCountOffset].n
    val chunks = BlockFeedProvider.listChunks(dir)
    require(chunks.length >= e,
      s"offset $e ahead of committed chunks ${chunks.length} — chunk files must never be deleted while a checkpoint references them")
    chunks.slice(s, e).map(ChunkPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChunkReaderFactory(schema)

  /** Chunk files stay on disk for batch backfill/replay; retention is the
    * archive's concern (the reference keeps the chain too). */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

final case class ChunkPartition(path: String) extends InputPartition

final class ChunkReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ChunkReader(partition.asInstanceOf[ChunkPartition].path, schema)
}

/** Streams one JSON-lines chunk; no whole-chunk buffering. Jackson is
  * Spark's own bundled JSON library — no added dependency. */
final class ChunkReader(path: String, schema: StructType)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = Files.lines(Paths.get(path), StandardCharsets.UTF_8)
  private val it = lines.iterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    var row: InternalRow = null
    while (row == null && it.hasNext) {
      val line = it.next()
      if (line.trim.nonEmpty) row = parse(mapper.readTree(line))
    }
    current = row
    row != null
  }

  private def parse(node: JsonNode): InternalRow =
    InternalRow.fromSeq(schema.fields.toSeq.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case LongType => v.asLong()
        case IntegerType => v.asInt()
        case DoubleType => v.asDouble()
        case BooleanType => v.asBoolean()
        case StringType => UTF8String.fromString(v.asText())
        case dt => throw new IllegalStateException(s"unsupported type $dt")
      }
    })

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

/** Producer helper: the writing half of the feed (what a gRPC bridge or a
  * test uses). Each [[emit]] writes one chunk to a temp file and commits it
  * with an ATOMIC rename — a concurrent reader's directory listing sees the
  * chunk fully or not at all.
  *
  * Besides data batches, the producer forwards the reference stream's
  * CONTROL messages (index.ts:142-287) as single-row marker chunks:
  * [[emitInvalidate]] (chain reorg — retract from a block) and
  * [[emitHeartbeat]] (liveness signal). Markers share the chunk number
  * sequence, so the offset contract is unchanged; the `.ctrl.` name infix
  * lets offset planning isolate them without opening the file. */
final class JsonBlockFeed(dir: String) {
  Files.createDirectories(Paths.get(dir))
  private val mapper = new ObjectMapper()
  // resume numbering after any chunks a previous producer left behind: the
  // parse is TOLERANT (chunk-<digits> names only) — a foreign .jsonl file
  // in the feed dir must not brick producer restart
  private val next = new AtomicLong(
    graft.util.Dirs.listNames(dir)
      .flatMap(BlockFeedProvider.chunkId)
      .foldLeft(0L)(math.max))

  /** Append one block batch: each row is (column → scalar value). */
  def emit(rows: Seq[Map[String, Any]]): Unit = {
    val body = rows.map { r =>
      val o = mapper.createObjectNode()
      r.foreach {
        case (k, v: Long) => o.put(k, v)
        case (k, v: Int) => o.put(k, v.toLong)
        case (k, v: Double) => o.put(k, v)
        case (k, v: Boolean) => o.put(k, v)
        case (k, v: String) => o.put(k, v)
        case (k, v) => throw new IllegalArgumentException(s"unsupported $k=$v")
      }
      o.toString
    }.mkString("", "\n", "\n")
    commit(body, ctrl = false)
  }

  /** Reorg marker: every block ≥ `fromBlock` is invalid; the consumer
    * retracts the suffix before reading any later chunk (the reference's
    * `invalidate` dispatch arm + dao.ts:2306-2321 retraction). */
  def emitInvalidate(fromBlock: Long): Unit =
    commit(s"""{"${BlockFeedProvider.ControlCol}":"${BlockFeedProvider.ControlInvalidate}","${BlockFeedProvider.InvalidateFromCol}":$fromBlock}""" + "\n",
      ctrl = true)

  /** Liveness marker: no data, but the micro-batch it forms carries one
    * input row, so progress-based stall watchdogs ([[graft.streaming.LivenessMonitor]])
    * see a heartbeat exactly as the reference's keep-alive message. */
  def emitHeartbeat(): Unit =
    commit(s"""{"${BlockFeedProvider.ControlCol}":"${BlockFeedProvider.ControlHeartbeat}"}""" + "\n",
      ctrl = true)

  private def commit(body: String, ctrl: Boolean): Unit = {
    val id = next.incrementAndGet()
    val name = if (ctrl) f"chunk-$id%012d.ctrl.jsonl" else f"chunk-$id%012d.jsonl"
    val tmp: Path = Files.createTempFile(Paths.get(dir), ".chunk", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
  }
}
