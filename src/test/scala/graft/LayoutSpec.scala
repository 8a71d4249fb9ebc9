package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: key contract (bit interleave parity with a driver-side
  * reference) and the property that justifies its existence — z-ordered
  * files have tighter per-file bounding boxes than single-column-sorted
  * files, so file-level min/max statistics prune scans on BOTH dimensions.
  */
class LayoutSpec extends SparkSpec {

  private def refMorton(a: Long, b: Long): Long = {
    var out = 0L
    for (i <- 0 until 31) {
      out |= ((a >> i) & 1L) << (2 * i)
      out |= ((b >> i) & 1L) << (2 * i + 1)
    }
    out
  }

  test("zorderKey matches the reference bit interleave (codegen path)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(200)((math.abs(rng.nextLong()) & 0x7FFFFFFFL,
      math.abs(rng.nextLong()) & 0x7FFFFFFFL)) ++
      Seq((0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (1L, 0L), (0L, 1L))
    val got = rows.toDF("a", "b")
      .select($"a", $"b", Layout.zorderKey($"a", $"b").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) => assert(z == refMorton(a, b), s"($a,$b)") }
  }

  test("zorderKey masks wide inputs to their low 31 bits") {
    val s = spark
    import s.implicits._
    val got = Seq((Long.MaxValue, 1L << 40)).toDF("a", "b")
      .select(Layout.zorderKey($"a", $"b")).as[Long].head()
    assert(got == refMorton(Long.MaxValue & 0x7FFFFFFFL, (1L << 40) & 0x7FFFFFFFL))
  }

  /** File-skipping metric: per-file (u, t) min/max boxes — what a parquet
    * reader's file-level statistics give it — probed with range predicates
    * of width span/8 in ONE dimension. Returns the average fraction of
    * files a probe cannot skip, per dimension. This is the metric z-order
    * exists for: a u-sorted layout answers u-probes with ~1 file but
    * t-probes with ALL files (its boxes span the full t range); z-order
    * must stay well under "all files" in BOTH dimensions. */
  private def probeFractions(df: DataFrame): (Double, Double) = {
    val stats = df
      .groupBy(input_file_name().as("f"))
      .agg(min("u").as("u0"), max("u").as("u1"),
        min("t").as("t0"), max("t").as("t1"))
      .collect()
      .map(r => (r.getAs[Long]("u0"), r.getAs[Long]("u1"),
        r.getAs[Long]("t0"), r.getAs[Long]("t1")))
    def frac(lo: Long => Long, hi: Long => Long,
        boxLo: ((Long, Long, Long, Long)) => Long,
        boxHi: ((Long, Long, Long, Long)) => Long): Double = {
      val span = stats.map(boxHi).max - stats.map(boxLo).min + 1
      val w = span / 8
      val origin = stats.map(boxLo).min
      val probes = (0 until 8).map(i => (origin + i * w, origin + i * w + w - 1))
      probes.map { case (p0, p1) =>
        stats.count(b => boxLo(b) <= p1 && boxHi(b) >= p0).toDouble / stats.length
      }.sum / probes.length
    }
    (frac(identity, identity, _._1, _._2), frac(identity, identity, _._3, _._4))
  }

  test("z-order prunes files in both dimensions; single sorts fail their cross dim") {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, "/root/testdata/sf0.001")

    // normalize both dimensions to comparable widths (users are ~5 bits,
    // the block index ~7 bits at this sf): scale users ×8 into 0..~200
    val events = s.table("ek")
      .select(($"user_id" * 8).as("u"), expr("(btime - 1704067200) div 120").as("t"))

    val base = SparkSpec.tempDir("graft_layout").toString
    val n = 8
    Layout.writeZOrdered(events, "u", "t", s"$base/z", n)
    events.repartitionByRange(n, $"u").sortWithinPartitions("u")
      .write.parquet(s"$base/u")
    events.repartitionByRange(n, $"t").sortWithinPartitions("t")
      .write.parquet(s"$base/t")

    val (zU, zT) = probeFractions(s.read.parquet(s"$base/z"))
    val (uU, uT) = probeFractions(s.read.parquet(s"$base/u"))
    val (tU, tT) = probeFractions(s.read.parquet(s"$base/t"))

    // each single sort is near-perfect in its own dimension but reads
    // (almost) everything for the other
    assert(uU < 0.4 && tT < 0.4, s"sanity: own-dim pruning uU=$uU tT=$tT")
    assert(uT > 0.9 && tU > 0.9, s"cross-dim reads ~all files: uT=$uT tU=$tU")
    // z-order: BOTH dimensions prune meaningfully — the worst dimension
    // still skips a real fraction of files, which no single sort does
    assert(math.max(zU, zT) < 0.75,
      s"zorder worst-dim fraction: u=$zU t=$zT")
  }

  test("sharded export: deterministic membership, stable in-shard order, manifest") {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, "/root/testdata/sf0.001")
    val docs = s.table("documents").select($"doc_id", $"lang", $"n_chars")

    val base = SparkSpec.tempDir("graft_shards").toString
    val counts1 = Layout.writeSharded(docs, "doc_id", s"$base/a", 4)
    val counts2 = Layout.writeSharded(docs, "doc_id", s"$base/b", 4)
    assert(counts1 == counts2, "membership must be reproducible")
    assert(counts1.values.sum == docs.count())
    // hash sharding balances within a loose factor (no shard starves)
    val (lo, hi) = (counts1.values.min, counts1.values.max)
    assert(lo > 0 && hi < 3 * lo, s"shard balance: $counts1")

    // identical membership AND identical in-shard id order across exports
    def shard0(ids: String) = s.read.parquet(s"$ids/shard=0")
      .select($"doc_id").as[Long].collect().toSeq
    assert(shard0(s"$base/a") == shard0(s"$base/b"))
    assert(shard0(s"$base/a") == shard0(s"$base/a").sorted)

    // manifest row counts agree with the data
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/a", "_manifest.json")), "UTF-8")
    counts1.foreach { case (sh, n) =>
      assert(manifest.contains(s"""{"shard":$sh,"rows":$n}"""), manifest)
    }
  }
}
