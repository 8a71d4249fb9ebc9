package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-blocks`: a DataSource V2 streaming connector for the ordered
  * block-event feed — the Spark-native form of the reference's network
  * cursor stream (an Apibara gRPC subscription delivering block batches,
  * index.ts:16-24,127-141).
  *
  * Transport model: a bridge process (the gRPC drainer, a test, the
  * [[JsonBlockFeed]] helper) appends immutable chunk files
  * `chunk-NNNNNN.jsonl` — one JSON object per raw event row — into a
  * directory, committing each via atomic rename so a chunk is either
  * invisible or complete. The STREAM OFFSET is the count of committed
  * chunks: chunks are append-only and lexicographically ordered, so an
  * offset range `[start, end)` always re-plans to the same files — the
  * deterministic-replay property Spark's exactly-once contract needs
  * (each micro-batch re-reads identically on checkpoint recovery).
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

  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | StringType => true
    case _ => false
  }

  /** Committed chunks, lexicographically ordered (zero-padded names make
    * that the append order). */
  def listChunks(dir: String): Array[String] =
    graft.util.Dirs.listNames(dir)
      .filter(_.endsWith(".jsonl"))
      .map(n => Paths.get(dir).resolve(n).toString)
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
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = ChunkCountOffset(0)

  override def latestOffset(): Offset =
    ChunkCountOffset(BlockFeedProvider.listChunks(dir).length)

  /** Backpressure (`maxChunksPerTrigger`): cap how far one micro-batch
    * advances, so a deep backlog drains in bounded batches instead of one
    * giant catch-up batch — the Kafka `maxOffsetsPerTrigger` discipline.
    * "Rows" at the admission layer are CHUNKS: the unit the offset counts. */
  override def getDefaultReadLimit: ReadLimit =
    maxChunksPerTrigger.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = BlockFeedProvider.listChunks(dir).length
    val from = start.asInstanceOf[ChunkCountOffset].n
    limit match {
      case r: ReadMaxRows => ChunkCountOffset(math.min(avail.toLong, from + r.maxRows()).toInt)
      case _ => ChunkCountOffset(avail)
    }
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
  * chunk fully or not at all. */
final class JsonBlockFeed(dir: String) {
  Files.createDirectories(Paths.get(dir))
  private val mapper = new ObjectMapper()
  // resume numbering after any chunks a previous producer left behind
  private val next = new AtomicInteger(
    BlockFeedProvider.listChunks(dir).lastOption
      .map(p => Paths.get(p).getFileName.toString.stripPrefix("chunk-").stripSuffix(".jsonl").toInt)
      .getOrElse(0))

  /** Append one block batch: each row is (column → scalar value). */
  def emit(rows: Seq[Map[String, Any]]): Unit = {
    val id = next.incrementAndGet()
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
    val tmp: Path = Files.createTempFile(Paths.get(dir), ".chunk", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, f"chunk-$id%06d.jsonl"),
      StandardCopyOption.ATOMIC_MOVE)
  }
}
