package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for 100 TB tables: Z-order (Morton) keys
  * and a z-ordered writer.
  *
  * Why: a table sorted on ONE column prunes parquet row groups only for
  * predicates on that column — a 100 TB events table sorted by time reads
  * every file for a `user_id = ?` probe. Interleaving the bits of two
  * columns into one sort key gives every output file a tight bounding box
  * in BOTH dimensions, so file-level min/max statistics prune scans for
  * predicates on either column (the technique behind Delta/Iceberg
  * Z-ordering; Morton, 1966).
  *
  * The key is composed entirely from built-in bitwise expressions
  * (shiftleft / AND / OR) — whole-stage-codegen'd, no UDF, no custom
  * Catalyst node — via the standard 5-step magic-mask bit spread. Inputs
  * are masked to the low 31 bits (callers with wider domains should bucket
  * or rank first — interleaving only helps when the two dimensions have
  * comparable variation width; see [[writeZOrdered]]'s scaladoc).
  *
  * [[duckZorderCtes]] emits the SAME arithmetic as a DuckDB CTE chain so
  * layout keys are oracle-checkable like every other operator.
  */
object Layout {

  /** (shift, mask) steps spreading a 31-bit value to even bit positions:
    * after the fold, bit i of the input sits at bit 2i. */
  private val steps: Seq[(Int, Long)] = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  private val low31 = 0x7FFFFFFFL

  /** Bit-spread of the low 31 bits of `c`: input bit i → output bit 2i. */
  def spread(c: Column): Column =
    steps.foldLeft(c.bitwiseAND(lit(low31))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 62-bit Morton key interleaving the low 31 bits of `a` (even bit
    * positions) and `b` (odd positions). Always non-negative. */
  def zorderKey(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** The DuckDB mirror of [[zorderKey]] as a WITH-chain fragment: emits CTEs
    * `z0..z5` where `z5` has all of `baseCte`'s columns plus `zkey`.
    * `aExpr` / `bExpr` are SQL expressions over `baseCte`'s columns. */
  def duckZorderCtes(baseCte: String, aExpr: String, bExpr: String): String = {
    val s0 = s""", z0 AS (SELECT *, ($aExpr) & $low31 AS za, ($bExpr) & $low31 AS zb FROM $baseCte)"""
    val chain = steps.zipWithIndex.map { case ((s, m), i) =>
      s""", z${i + 1} AS (SELECT * EXCLUDE (za, zb),
            (za | (za << $s)) & $m AS za, (zb | (zb << $s)) & $m AS zb FROM z$i)"""
    }.mkString("\n")
    s0 + "\n" + chain
  }

  /** SELECT-able zkey expression over `z5`'s spread columns. */
  val duckZorderKey: String = "(za | (zb << 1))"

  /** Write `df` z-ordered on `(a, b)` as `numFiles` parquet files: range
    * partition on the Morton key (each output file owns a contiguous
    * z-range, i.e. a tight 2-D bounding box), sort within partitions so
    * parquet row-group min/max stay tight too.
    *
    * Scale note: `repartitionByRange` samples the key distribution, so
    * output files are balanced even under skew. The interleave assumes the
    * two columns' VARIATION widths are comparable — a 5-bit dimension
    * interleaved with a 30-bit one degenerates to single-column sorting on
    * the wide one (its high bits dominate the key). Rank/bucket wide or
    * offset-heavy columns into comparable ranges first (the spec's
    * normalization shows the pattern); this mirrors how production
    * z-ordering range-partitions each column before interleaving. */
  def writeZOrdered(df: DataFrame, a: String, b: String, path: String,
      numFiles: Int): Unit =
    df.withColumn("__zkey", zorderKey(col(a), col(b)))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)

  /** Training-data shard export: write `df` as `numShards` parquet shard
    * directories (`shard=N/`) with DETERMINISTIC membership — shard =
    * Knuth-hash(idCol) mod numShards — plus a `_manifest.json` recording
    * per-shard row counts. Determinism is the contract a training run
    * needs: re-exporting the same corpus yields byte-identical shard
    * MEMBERSHIP (resumable downloads, reproducible data order after the
    * in-shard sort by id), unlike `repartition(n)`'s round-robin, which
    * depends on input split sizes. One shuffle, keyed by the shard id;
    * in-shard order is the id sort, so readers get a stable sequence. */
  def writeSharded(df: DataFrame, idCol: String, path: String,
      numShards: Int): Map[Int, Long] = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    // fail BEFORE writing anything: a non-integral id column would cast to
    // null for every row and a null id would hash to a null shard — rows
    // silently landing in __HIVE_DEFAULT_PARTITION__, invisible to shard
    // readers and the manifest
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"writeSharded needs an integral id column; $idCol is ${idType.simpleString}")
    require(df.filter(col(idCol).isNull).isEmpty,
      s"writeSharded: $idCol contains nulls — null hashes to no shard")
    df
      .withColumn("shard", pmod(
        col(idCol).cast("long") * lit(2654435761L), lit(numShards.toLong)).cast("int"))
      .repartition(numShards, col("shard"))
      // sort by (shard, id), not id alone: the dynamic-partition writer
      // inserts its own per-partition sort on `shard`, and the documented
      // in-shard id order must not depend on that sort's stability
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // manifest counts from the WRITTEN files (ground truth, ~free footer
    // reads), not a second pass over the source lineage — which would both
    // double the export cost and, under a concurrently-changing input,
    // record counts disagreeing with the parquet actually written
    val counts = df.sparkSession.read.parquet(path)
      .groupBy(col("shard").cast("int").as("shard")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val manifest = (0 until numShards).map(s =>
      s"""{"shard":$s,"rows":${counts.getOrElse(s, 0L)}}""").mkString("[", ",", "]")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_manifest.json"),
      manifest.getBytes("UTF-8"))
    counts
  }
}
