package graft

import org.apache.spark.sql.functions._

/** Invariants of the soak synthesizer (ScaleSoak): the 10× corpus is only a
  * valid scaling probe if it keeps the driver corpus's schemas, value ranges
  * and density laws — otherwise alpha measures distribution drift, not plan
  * behavior. Everything here is pinned against what TESTDATA.md's sf ladder
  * actually contains (verified with DuckDB, round 11).
  */
class ScaleSoakSpec extends SparkSpec {

  test("events match the driver shape: dense ids, 5 types, bounded 2-decimal values, json props") {
    import spark.implicits._
    val ev = ScaleSoak.events(spark, 1)
    val agg = ev.agg(
      count(lit(1)), countDistinct($"event_id"), max($"event_id"),
      min($"value"), max($"value"), max($"user_id"),
      countDistinct($"event_type")).head
    assert(agg.getLong(0) === 100000L)
    assert(agg.getLong(1) === 100000L && agg.getLong(2) === 99999L)
    assert(agg.getDouble(3) >= 0.0 && agg.getDouble(4) <= 560.21)
    assert(agg.getLong(5) < 1500L)
    assert(agg.getLong(6) === 5L)
    // props parse as {"k": 0..99} — the contract basket_rules/json_props use
    val ks = ev.select(get_json_object($"props", "$.k").cast("long").as("k"))
      .agg(min($"k"), max($"k"), count(when($"k".isNull, 1))).head
    assert(ks.getLong(0) >= 0 && ks.getLong(1) <= 99 && ks.getLong(2) === 0L)
  }

  test("documents draw from the 31-word vocabulary with driver-like lengths and a real dup rate") {
    import spark.implicits._
    val docs = ScaleSoak.documents(spark, 1)
    val words = docs.select(explode(split($"text", " ")).as("w"))
      .agg(countDistinct($"w")).head.getLong(0)
    assert(words === 31L)
    val agg = docs.agg(
      count(lit(1)), countDistinct($"text"),
      min(size(split($"text", " "))), max(size(split($"text", " "))),
      countDistinct($"lang"), countDistinct($"source"),
      count(when(length($"text") =!= $"n_chars", 1))).head
    assert(agg.getLong(0) === 5000L)
    // exact dups exist (driver sf0.1: 8/5000) but stay rare
    val dups = agg.getLong(0) - agg.getLong(1)
    assert(dups >= 1 && dups <= 50, s"dup count $dups out of band")
    assert(agg.getInt(2) >= 10 && agg.getInt(3) <= 100)
    assert(agg.getLong(4) === 5L && agg.getLong(5) === 20L)
    assert(agg.getLong(6) === 0L, "n_chars must equal length(text)")
    // en is the plurality language, as in the driver corpus
    val top = docs.groupBy($"lang").count().orderBy($"count".desc).head.getString(0)
    assert(top === "en")
  }

  test("embeddings are 64-dim bounded cluster mixtures with labels 0..9") {
    import spark.implicits._
    val emb = ScaleSoak.embeddings(spark, 1)
    val agg = emb.agg(
      count(lit(1)), countDistinct($"label"), min($"label"), max($"label"),
      min(size($"embedding")), max(size($"embedding"))).head
    assert(agg.getLong(0) === 2000L && agg.getLong(1) === 10L)
    assert(agg.getInt(2) === 0 && agg.getInt(3) === 9)
    assert(agg.getInt(4) === 64 && agg.getInt(5) === 64)
    val bounds = emb.select(explode($"embedding").as("x"))
      .agg(min($"x"), max($"x")).head
    assert(bounds.getFloat(0) >= -0.34f && bounds.getFloat(1) <= 0.34f)
    // the label signal is real: same-label centroids are tighter than the
    // global spread on the first dimension (clustered, not pure noise)
    val d0 = emb.select($"label", element_at($"embedding", 1).as("x0"))
    val within = d0.groupBy($"label").agg(stddev($"x0").as("s"))
      .agg(avg($"s")).head.getDouble(0)
    val global = d0.agg(stddev($"x0")).head.getDouble(0)
    assert(within < global, "per-label spread must be below global spread")
  }

  test("lineitem keeps (orderkey, linenumber) unique with 1-7 lines per order") {
    import spark.implicits._
    val li = ScaleSoak.lineitem(spark, 1).filter($"l_orderkey" < 5000)
    val dupKeys = li.groupBy($"l_orderkey", $"l_linenumber").count()
      .filter($"count" > 1).count()
    assert(dupKeys === 0L)
    val lines = li.groupBy($"l_orderkey").count()
      .agg(min($"count"), max($"count"), avg($"count")).head
    assert(lines.getLong(0) >= 1 && lines.getLong(1) <= 7)
    assert(lines.getDouble(2) > 3.0 && lines.getDouble(2) < 5.0)
    // foreign keys stay inside the same-scale dimensions
    val fk = li.agg(max($"l_partkey"), max($"l_suppkey")).head
    assert(fk.getLong(0) < 20000L && fk.getLong(1) < 1000L)
  }

  test("generation is deterministic: two independent builds hash identically") {
    import spark.implicits._
    def checksum(): Long = ScaleSoak.documents(spark, 1)
      .select(xxhash64($"doc_id", $"text", $"lang", $"source").as("h"))
      .agg(expr("bit_xor(h)")).head.getLong(0)  // xor: order-free, overflow-free under ANSI
    assert(checksum() === checksum())
  }
}
