package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures
import graft.operators.Layout

/** Physical-design diagnostics — the two reports a data engineer runs
  * BEFORE pointing a 100 TB job at a table:
  *
  *  - [[keySkew]]: per candidate shuffle key, the exact key-frequency
  *    profile (max / mean / p99 key cardinality) plus the derived salt
  *    recommendation — the number that decides whether a join or aggregate
  *    on that key needs [[graft.util.Salted]] (and with how many buckets)
  *    or can rely on AQE's runtime skew split. The repo's dedup/ANN band
  *    joins all ride the salt gate; this entry is how a deployment SIZES
  *    that gate from the data instead of guessing.
  *  - [[skippingStats]]: measured zone-map (file-level min/max) prune
  *    ratios for point and range probes under two physical layouts —
  *    natural (chain order) and Z-order — quantifying what
  *    [[graft.operators.Layout]]'s scaladoc claims qualitatively: a
  *    single-column sort prunes only its own column, the Morton interleave
  *    prunes both. This is the evidence table behind choosing a table
  *    layout, produced by the engine itself.
  *
  * Everything is exact integer arithmetic over the shared fixture views, so
  * both reports hash-gate against DuckDB like every other operator.
  */
object Diagnostics {

  // =====================================================================
  // events_key_skew — shuffle-key skew profile + salt sizing
  // =====================================================================

  /** Candidate shuffle keys profiled over the event stream: the keys the
    * repo's own queries shuffle on (user joins/windows, per-type rollups,
    * pool aggregates, per-block grouping). */
  private val skewKeys = Seq("user_id", "event_type", "pool_id", "block_number")

  /** Per-key skew report: one row per candidate key with
    * (n_rows, n_keys, max/mean/p99 per-key cardinality, skew ratio in
    * basis points, recommended salt buckets).
    *
    * Definitions (all exact):
    *  - mean_key_rows = n_rows DIV n_keys (≥ 1 — every counted key has a row)
    *  - p99_key_rows  = the smallest per-key count c such that keys with
    *    count ≤ c cover ≥ 99% of keys (exact inverse-CDF over the
    *    count-of-counts frame)
    *  - skew_bp       = max_key_rows · 10⁴ DIV mean_key_rows
    *  - salt_buckets  = 1 when max ≤ 2·mean (AQE's runtime split handles
    *    mild skew for free), else ⌈max / mean⌉ — the split factor that
    *    brings the hottest key's per-reducer share down to the mean, the
    *    sizing rule [[graft.util.Salted.saltedPairSelfJoin]]'s bucket knob
    *    expects.
    *
    * Scale shape: ONE corpus-sized pass — the 4-way key explode feeds a
    * single map-side-combined (key_name, key_val) count — then everything
    * downstream is |keys|-sized (the count-of-counts frame is smaller
    * still: one row per DISTINCT frequency). The cumulative window
    * partitions by key_name over that tiny frame; no global windows, no
    * collect. The skew profile itself cannot be skewed-on by construction:
    * its shuffle key (key_name, key_val) is exactly as skewed as the data,
    * but the per-group state is one counter (map-side combine bounds the
    * shuffle volume by the KEY cardinality, not the row count). */
  def keySkew(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val kv = spark.table("ek").select(explode(array(skewKeys.map(k =>
        struct(lit(k).as("key_name"), col(k).cast(StringType).as("key_val"))): _*))
        .as("kv"))
      .select($"kv.key_name", $"kv.key_val")
    val cnts = kv.groupBy($"key_name", $"key_val").agg(count(lit(1)).as("c"))
    val tot = cnts.groupBy($"key_name").agg(
      sum($"c").as("n_rows"), count(lit(1)).as("n_keys"), max($"c").as("max_key_rows"))
    val coc = cnts.groupBy($"key_name", $"c").agg(count(lit(1)).as("nk"))
      .withColumn("cum", sum($"nk").over(
        Window.partitionBy($"key_name").orderBy($"c")))
    val p99 = coc.join(tot.select($"key_name", $"n_keys"), Seq("key_name"))
      .filter($"cum" * 100 >= $"n_keys" * 99)
      .groupBy($"key_name").agg(min($"c").as("p99_key_rows"))
    tot.join(p99, Seq("key_name"))
      .withColumn("mean_key_rows", expr("n_rows DIV n_keys"))
      .select($"key_name", $"n_rows", $"n_keys", $"max_key_rows",
        $"mean_key_rows", $"p99_key_rows",
        expr("max_key_rows * 10000 DIV mean_key_rows").as("skew_bp"),
        expr("CASE WHEN max_key_rows <= 2 * mean_key_rows THEN 1 " +
          "ELSE (max_key_rows + mean_key_rows - 1) DIV mean_key_rows END")
          .as("salt_buckets"))
  }

  val keySkewOracle: String = Fixtures.oracle(
    s""", skw_kv AS (
         ${skewKeys.map(k =>
           s"SELECT '$k' AS key_name, CAST($k AS VARCHAR) AS key_val FROM ek")
           .mkString("\n         UNION ALL ")}),
       skw_c AS MATERIALIZED (
         SELECT key_name, key_val, COUNT(1) AS c FROM skw_kv GROUP BY 1, 2),
       skw_tot AS (
         SELECT key_name, SUM(c) AS n_rows, COUNT(1) AS n_keys, MAX(c) AS max_key_rows
         FROM skw_c GROUP BY 1),
       skw_coc AS (
         SELECT key_name, c, COUNT(1) AS nk,
                SUM(COUNT(1)) OVER (PARTITION BY key_name ORDER BY c) AS cum
         FROM skw_c GROUP BY 1, 2),
       skw_p99 AS (
         SELECT o.key_name, MIN(o.c) AS p99_key_rows
         FROM skw_coc o JOIN skw_tot t ON t.key_name = o.key_name
         WHERE o.cum * 100 >= t.n_keys * 99
         GROUP BY 1)
       SELECT t.key_name,
              CAST(t.n_rows AS BIGINT) AS n_rows,
              CAST(t.n_keys AS BIGINT) AS n_keys,
              CAST(t.max_key_rows AS BIGINT) AS max_key_rows,
              CAST(t.n_rows // t.n_keys AS BIGINT) AS mean_key_rows,
              CAST(p.p99_key_rows AS BIGINT) AS p99_key_rows,
              CAST(t.max_key_rows * 10000 // (t.n_rows // t.n_keys) AS BIGINT) AS skew_bp,
              CAST(CASE WHEN t.max_key_rows <= 2 * (t.n_rows // t.n_keys) THEN 1
                   ELSE (t.max_key_rows + (t.n_rows // t.n_keys) - 1) // (t.n_rows // t.n_keys)
                   END AS BIGINT) AS salt_buckets
       FROM skw_tot t JOIN skw_p99 p ON p.key_name = t.key_name""")

  // =====================================================================
  // layout_skipping_stats — measured zone-map prune ratios per layout
  // =====================================================================

  /** Zone-map block granularities. Blocks are FIXED RANGES of each
    * layout's sort key — the range-partitioned-file model (each file owns
    * a contiguous key range, zone map = per-file min/max), so block
    * assignment needs no global sort or row numbering: it is a pure
    * per-row expression at any scale, and block COUNT grows linearly with
    * the data while each block's population stays bounded by the key
    * range's density.
    *  - natural: 20 chain blocks per file (~160 events at the fixture's 8
    *    events/block) — chain order IS arrival order, the layout an ingest
    *    sink produces without any clustering.
    *  - zorder: zkey DIV 2^6 — dropping 3 interleaved bit-pairs leaves an
    *    8×8 (user × time-block) cell per file, the 2-D bounding box the
    *    Morton interleave exists to keep tight. Fixed key-range cells
    *    stand in for range-partitioned files (what [[Layout.writeZOrdered]]
    *    produces) to keep the diagnostic sort-free and oracle-replayable;
    *    the prune GEOMETRY they measure is the same, and the cell is small
    *    enough to discriminate at every fixture scale (the user dimension
    *    spans 15 at sf0.001). */
  private val naturalBlockSpan = 20
  private val zorderBlockShift = 6

  /** Probe count per dimension: point probes on user_id, range probes on
    * the time-block index, both placed by integer splits of the observed
    * [min, max] (1-row broadcast — corpus-relative, never stale). */
  private val nProbes = 4

  /** Measured zone-map skipping per (layout × probe): for each probe, the
    * fraction of blocks whose [min, max] interval cannot exclude it —
    * exactly the files a scan must read under file-level statistics
    * pruning. Output: one row per (layout, probe_kind, probe_i) with the
    * probe's bounds, total blocks, blocks hit, and hit_bp = hit·10⁴ DIV
    * blocks (LOWER is better).
    *
    * The punchline this table documents: the natural layout prunes TIME
    * probes (chain order correlates with time) but reads ~every file for
    * a USER probe, while the Z-order layout prunes both — the
    * [[Layout.zorderKey]] claim as a measured number.
    *
    * Scale shape: one corpus pass per layout feeding a map-side-combined
    * per-block min/max aggregate (block id is a pure expression); the
    * probe frame is 2·nProbes rows from a 1-row min/max broadcast; the
    * block × probe join broadcasts the probes. No global windows, no
    * collect, no row numbering. */
  def skippingStats(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val base = spark.table("ek").select(
      $"user_id", expr("(btime - 1704067200) DIV 120").as("tdim"),
      $"block_number",
      Layout.zorderKey($"user_id", expr("(btime - 1704067200) DIV 120")).as("zkey"))

    def zoneMaps(layout: String, blk: org.apache.spark.sql.Column): DataFrame =
      base.groupBy(blk.as("blk")).agg(
        min($"user_id").as("u_min"), max($"user_id").as("u_max"),
        min($"tdim").as("t_min"), max($"tdim").as("t_max"))
        .select(lit(layout).as("layout"), $"u_min", $"u_max", $"t_min", $"t_max")

    val blocks = zoneMaps("natural", expr(s"block_number DIV $naturalBlockSpan"))
      .unionByName(zoneMaps("zorder", expr(s"zkey DIV ${1L << zorderBlockShift}")))

    val mm = base.agg(min($"user_id").as("u_lo"), max($"user_id").as("u_hi"),
      min($"tdim").as("t_lo"), max($"tdim").as("t_hi"))
    val probes = mm.select(explode(sequence(lit(0), lit(nProbes - 1))).as("i"),
        $"u_lo", $"u_hi", $"t_lo", $"t_hi")
      .select($"i",
        expr(s"u_lo + i * (u_hi - u_lo) DIV $nProbes").as("user_probe"),
        expr(s"t_lo + i * (t_hi - t_lo) DIV $nProbes").as("time_lo"),
        expr(s"t_lo + i * (t_hi - t_lo) DIV $nProbes + (t_hi - t_lo) DIV 8")
          .as("time_hi"))
      .select(explode(array(
        struct(lit("user_point").as("probe_kind"), $"i".cast(LongType).as("probe_i"),
          $"user_probe".cast(LongType).as("probe_lo"),
          $"user_probe".cast(LongType).as("probe_hi")),
        struct(lit("time_range").as("probe_kind"), $"i".cast(LongType).as("probe_i"),
          $"time_lo".cast(LongType).as("probe_lo"),
          $"time_hi".cast(LongType).as("probe_hi")))).as("p"))
      .select($"p.probe_kind", $"p.probe_i", $"p.probe_lo", $"p.probe_hi")

    blocks.crossJoin(broadcast(probes))
      .withColumn("hit", when(
        ($"probe_kind" === "user_point" &&
          $"u_min" <= $"probe_lo" && $"probe_lo" <= $"u_max") ||
        ($"probe_kind" === "time_range" &&
          $"t_min" <= $"probe_hi" && $"probe_lo" <= $"t_max"), 1L).otherwise(0L))
      .groupBy($"layout", $"probe_kind", $"probe_i", $"probe_lo", $"probe_hi")
      .agg(count(lit(1)).as("n_blocks"), sum($"hit").as("n_hit"))
      .withColumn("hit_bp", expr("n_hit * 10000 DIV n_blocks"))
  }

  val skippingStatsOracle: String = Fixtures.oracle(
    Layout.duckZorderCtes(
      "(SELECT user_id, (btime - 1704067200) // 120 AS tdim, block_number FROM ek)",
      "user_id", "tdim") +
    s""", lsk_base AS MATERIALIZED (
         SELECT user_id, tdim, block_number, ${Layout.duckZorderKey} AS zkey FROM z5),
       lsk_blocks AS (
         SELECT 'natural' AS layout, MIN(user_id) AS u_min, MAX(user_id) AS u_max,
                MIN(tdim) AS t_min, MAX(tdim) AS t_max
         FROM lsk_base GROUP BY block_number // $naturalBlockSpan
         UNION ALL
         SELECT 'zorder', MIN(user_id), MAX(user_id), MIN(tdim), MAX(tdim)
         FROM lsk_base GROUP BY zkey // ${1L << zorderBlockShift}),
       lsk_mm AS (
         SELECT MIN(user_id) AS u_lo, MAX(user_id) AS u_hi,
                MIN(tdim) AS t_lo, MAX(tdim) AS t_hi
         FROM lsk_base),
       lsk_probes AS (
         SELECT 'user_point' AS probe_kind, CAST(u.i AS BIGINT) AS probe_i,
                CAST(m.u_lo + u.i * (m.u_hi - m.u_lo) // $nProbes AS BIGINT) AS probe_lo,
                CAST(m.u_lo + u.i * (m.u_hi - m.u_lo) // $nProbes AS BIGINT) AS probe_hi
         FROM lsk_mm m, UNNEST(range($nProbes)) AS u(i)
         UNION ALL
         SELECT 'time_range', CAST(u.i AS BIGINT),
                CAST(m.t_lo + u.i * (m.t_hi - m.t_lo) // $nProbes AS BIGINT),
                CAST(m.t_lo + u.i * (m.t_hi - m.t_lo) // $nProbes
                     + (m.t_hi - m.t_lo) // 8 AS BIGINT)
         FROM lsk_mm m, UNNEST(range($nProbes)) AS u(i))
       SELECT b.layout, p.probe_kind, p.probe_i, p.probe_lo, p.probe_hi,
              CAST(COUNT(1) AS BIGINT) AS n_blocks,
              CAST(SUM(CASE WHEN (p.probe_kind = 'user_point'
                                  AND b.u_min <= p.probe_lo AND p.probe_lo <= b.u_max)
                             OR (p.probe_kind = 'time_range'
                                  AND b.t_min <= p.probe_hi AND p.probe_lo <= b.t_max)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
              CAST(SUM(CASE WHEN (p.probe_kind = 'user_point'
                                  AND b.u_min <= p.probe_lo AND p.probe_lo <= b.u_max)
                             OR (p.probe_kind = 'time_range'
                                  AND b.t_min <= p.probe_hi AND p.probe_lo <= b.t_max)
                        THEN 1 ELSE 0 END) * 10000 // COUNT(1) AS BIGINT) AS hit_bp
       FROM lsk_blocks b CROSS JOIN lsk_probes p
       GROUP BY 1, 2, 3, 4, 5""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_key_skew" -> (keySkew _),
    "layout_skipping_stats" -> (skippingStats _))

  val oracles: Map[String, String] = Map(
    "events_key_skew" -> keySkewOracle,
    "layout_skipping_stats" -> skippingStatsOracle)
}
