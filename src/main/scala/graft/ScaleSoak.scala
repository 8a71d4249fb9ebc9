package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up soak: synthesize an sf1-shaped corpus (default 10× the driver's
  * sf0.1, same schemas / distributions / scaling laws as TESTDATA.md) and
  * measure the heaviest catalog entries at both scales, reporting per-query
  * scaling exponents alpha = log(t_big/t_small) / log(scale).
  *
  * Purpose: every >=sf1 claim in PLANS.md is argued from plan shape
  * (exchange/broadcast structure pinned by ScalePlanSpec); this main samples
  * the claim empirically — a query whose wall time grows super-linearly
  * (alpha >> 1) at 10× gets a plan diff and a fix before anyone trusts the
  * 100 TB story.
  *
  * Generation is pure column arithmetic over spark.range — xxhash64-seeded,
  * no rand()/now() — so the corpus is bit-reproducible across machines and
  * runs. Scaling laws mirror the driver's own sf ladder (TESTDATA.md,
  * verified 0.001→0.01→0.1): events/users/customers/orders/lineitem/part/
  * supplier all 10× per sf step, documents 10×, embeddings 10× (the driver
  * used 4× on the last step; we scale the full 10× — strictly more work),
  * region/nation fixed.
  *
  * Usage: SPARK_GRAFT_SOAK_DIR=/tmp/graft_sf1 SPARK_GRAFT_SOAK_SCALE=10 \
  *   sbt "runMain graft.ScaleSoak"   (synth is skipped if the dir is built)
  */
object ScaleSoak {

  /** The measured set: the heaviest entries by BENCH_r10 min-of-2, covering
    * every family whose scale story matters — the dedup ladder, ANN, graph,
    * sketches, the reference's twamm/staker analytics, TPC-H joins, and the
    * two sequential-round trainers. */
  val heavy: Seq[String] = Seq(
    "q1_pricing_summary",       // scan-agg baseline: pure map-side combine
    "q9_product_profit",        // 5-way fact join
    "q22_dormant_customers",    // scalar-subquery broadcast + left-anti
    "events_user_pagerank",     // iterative graph, 1 shuffle/round
    "events_basket_rules",      // apriori pair explode behind support prune
    "events_sessionization",    // session windows over user partitions
    "dedup_minhash_lsh",        // band-bucket candidate join (salt gate)
    "dedup_cluster_components", // iterative min-label propagation
    "dedup_substring_runs",     // rolling-hash span islands
    "corpus_overlap_kmv",       // scan-side KMV sketch union
    "sim_ann_ivfpq",            // Lloyd + codebook + cell-restricted ADC
    "sim_cosine_topk",          // brute-force budgeted baseline
    "staker_rewards",           // reference's heaviest governance view
    "twamm_sale_rate_deltas",   // interval-intersection range join
    "twamm_proceeds_by_owner",  // lateral pipeline
    "token_pair_realized_volatility", // decorrelated window analytics
    "text_vocab_coverage",      // 3-level partitioned prefix-sum hierarchy
    "text_bpe_train",           // 12 sequential distributed rounds
    // round-11 additions with a scale story worth sampling:
    "embedding_pca_power",      // per-partition Gram kernel + driver rounds
    "events_triangle_count",    // degree-oriented wedge joins
    "events_label_propagation", // 4 sync LPA rounds, 1 join/round
    "events_hits_scores",       // 4 two-sided integer rounds
    "privacy_k_anon",           // bounded-QI distinct aggregation
    "text_rrf_fusion",          // shared posting frame + fixed-budget lists
    // round-12 additions with a scale story worth sampling:
    "sim_ann_opq",              // full-scan ADC on variance-allocated codes
    "embedding_pca_topk",       // shared Gram pass + driver deflation rounds
    "sim_ann_recall_ivf_cells", // two quantizer builds + shared exact side
    "streaming_sessions_replay",// file-fed harness: must stay O(1) driver
    "streaming_anomaly_replay", // prefix contract at 10× the state volume
    "sim_ann_ivfpq_compacted",  // build + append + FOLD: O(n) rewrite leg
    "sim_ann_ivfpq_residual",   // nprobe-fold distance tables + refined cells
    "sim_ann_sq8",              // full-scan 1-byte/dim reconstruction ADC
    "sim_ann_ivfpq_rerank",     // ADC shortlist + output-sized exact refine
    "corpus_pack_stats",        // hierarchical positional prefix sum
    // round-12 extension (this session):
    "sim_ann_recall_nprobe_curve", // 4-level probe sweep over one index
    "sim_ann_filtered",         // corpus-sized label join + bounded probes
    "sim_ann_ivfpq_vacuumed",   // delete + FOLD: the physical-erasure leg
    "retrieval_hybrid_rrf",     // inverted-index build + posting-mass joins
    "sim_ann_recall_rerank_curve", // shared shortlist + 4 bounded rank cuts
    "retrieval_rm3_search",     // feedback-bounded model + 8-term posting probe
    "classifier_percep_train",  // 12 x 2 corpus passes, model-sized state
    "embedding_jl_project",     // pure scan-side native kernel, zero shuffles
    "embedding_jl_distortion",  // Q0-broadcast all-pairs, decimal-lane folds
    "events_kcore",             // 8 peel rounds, monotonically shrinking frames
    // round-13 entries (soak rows backfilled in round 14):
    "multimodal_media_meta",    // encode→shuffle→decode codec chain
    "multimodal_frame_sample",  // memo-shared decode + frame explode
    "multimodal_resize",        // decode→box-downsample→re-encode→decode
    "multimodal_feature_extract", // decode + per-pixel moment scan
    "multimodal_phash_dedup",   // DCT pHash + salted band join
    // round-14 graph-ANN rework:
    "sim_ann_graph_build",      // NN-descent, ρK-capped expansion rounds
    "sim_ann_graph_search",     // seeded beam search over the persisted graph
    "sim_ann_recall_graph_curve", // rounds→recall sweep, shared search chain
    // round-14 additions: tokenizer family + graph append leg
    "text_wordpiece_train",     // 12 rounds, ratio argmax (2 aggs/round)
    "text_wordpiece_fertility", // (word × pos) ⋈ pieces + greedy fold walk
    "text_tokenizer_compare",   // all three tokenizer pipelines, shared memos
    "text_unigram_fertility",   // inventory seed + per-word Viterbi DP fold
    "text_kn_perplexity",       // vocab²-bounded model ⋈ corpus bigrams
    "sim_ann_graph_incremental", // standing build + search-based insertion
    "sim_ann_recall_graph_incremental", // post-append beam search, 2 deltas
    "sim_ann_bq",               // 1-bit full scan: 2 popcounts/pair
    "sim_ann_bq_rerank",        // Hamming shortlist + output-sized rerank
    "sim_ann_ivfbq",            // cell admission + bit scan + exact rerank
    "sim_ann_graph_deleted",    // tombstone-masked beam search, 3 deltas
    // round-14 session-3 additions:
    "text_sb_perplexity",       // 3 gram-model scoring shuffles, holdout side
    "sim_dbscan_clusters",      // cell-blocked ε-pairs + label rounds
    "corpus_pack_pairing",      // value-decomposed rank + paired aggregation
    "events_cc_bigstar",        // O(log n)-round star-contraction components
    "multimodal_wav_energy",    // WAV decode + per-sample int loops
    "multimodal_video_cuts",    // frame-array decode + pairwise luma deltas
    "retrieval_eval_mrr",       // arm lists + label joins + 2-level agg
    "dedup_ppjoin",             // prefix-filtered exact similarity join
    "dedup_ngram_jaccard",      // exact rung, served through the ppjoin filter (r15)
    // round-14 session-4 additions:
    "events_key_skew",          // 4-way key explode + count-of-counts windows
    "layout_skipping_stats",    // two per-block zone-map aggs + probe broadcast
    "classifier_calibration",   // two margin frames + bin-keyed folds
    // round-14 session-5 additions:
    "events_attribution",       // 8-deep lag chain + exploded credit arms
    "events_ab_lift",           // per-user agg folded to one stats row
    "dq_expectations",          // per-table check-grid scans + anti-joins
    "dq_profile",               // exact-distinct Expand lanes, 1 scan/table
    "dq_drift",                 // GROUPING SETS bin pass + fixed-point PSI
    "events_feature_matrix",    // prefix-frame window pass, purchase-sized out
    "events_target_encode",     // (cat, fold) agg + cat-partitioned windows
    "events_scd2_tiers",        // user-day agg + islands windows + island agg
    "streaming_dq_replay",      // check-grid counters through the state store
    "events_te_leakage",        // 2 corpus scans + cat-bounded encoder join
    "events_attribution_curve") // one lag pass, 3 depths from one aggregate

  // ---------------------------------------------------------------- synth

  private val vocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  private def vocabSql: String =
    vocab.map(w => s"'$w'").mkString("array(", ",", ")")

  /** events: driver shape — event_id dense, ~667 events/user, 5 uniform
    * types, value 2-decimal in [0,560], props = {"k": 0..99}, ts spread over
    * Jan 2024 (never consumed by the catalog; fixtures derive time from
    * event_id — Fixtures.scala:441). */
  private[graft] def events(spark: SparkSession, s: Int): DataFrame = {
    import spark.implicits._
    val n = 100000L * s
    spark.range(n)
      .select(
        $"id".as("event_id"),
        timestamp_seconds(lit(1704067200L) + ($"id" * 2591913L / n)).as("ts"),
        pmod(xxhash64($"id", lit(7)), lit(1500L * s)).as("user_id"),
        element_at(
          array(Seq("signup", "purchase", "view", "click", "error").map(lit): _*),
          pmod(xxhash64($"id", lit(11)), lit(5)).cast("int") + 1).as("event_type"),
        (pmod(xxhash64($"id", lit(13)), lit(56022L)).cast("double") / 100.0).as("value"),
        concat(lit("{\"k\": "), pmod(xxhash64($"id", lit(17)), lit(100L)), lit("}")).as("props"))
  }

  /** documents: 31-word near-uniform vocabulary, 10-100 words/doc,
    * lang en 41% / zh es fr de ~15% each, 20 sources, ~0.16% exact-dup rate
    * (driver sf0.1: 8/5000) via shared text seeds. */
  private[graft] def documents(spark: SparkSession, s: Int): DataFrame = {
    import spark.implicits._
    val n = 5000L * s
    spark.range(n)
      .withColumn("seed",
        when(pmod(xxhash64($"id", lit(23)), lit(1000L)) < 2 && $"id" >= 16,
          $"id" - pmod(xxhash64($"id", lit(29)), lit(16L)) - 1).otherwise($"id"))
      .withColumn("n_words", (lit(10) + pmod(xxhash64($"seed", lit(31)), lit(91L))).cast("int"))
      .withColumn("text", expr(
        s"""array_join(transform(sequence(1, n_words),
           |  i -> element_at($vocabSql,
           |         CAST(pmod(xxhash64(seed, CAST(i AS BIGINT), 131L), 31) AS INT) + 1)), ' ')"""
          .stripMargin))
      .withColumn("l", pmod(xxhash64($"id", lit(37)), lit(100L)))
      .select(
        $"id".as("doc_id"),
        $"text",
        when($"l" < 41, "en").when($"l" < 56, "zh").when($"l" < 71, "es")
          .when($"l" < 86, "fr").otherwise("de").as("lang"),
        concat(lit("src"), pmod(xxhash64($"id", lit(41)), lit(20L))).as("source"),
        length($"text").cast("long").as("n_chars"))
  }

  /** embeddings: 64-dim float, 10 labeled clusters — per-(label,dim) center
    * in ±0.25 plus per-(vec,dim) noise in ±0.08 (driver value range ±0.34). */
  private[graft] def embeddings(spark: SparkSession, s: Int): DataFrame = {
    import spark.implicits._
    spark.range(2000L * s)
      .withColumn("label", pmod(xxhash64($"id", lit(43)), lit(10L)).cast("int"))
      .select(
        $"id".as("vec_id"),
        expr("""transform(sequence(0, 63), j -> CAST(
                |  (pmod(xxhash64(CAST(label AS BIGINT), CAST(j AS BIGINT), 47L), 1000) - 500) / 2000.0
                |  + (pmod(xxhash64(id, CAST(j AS BIGINT), 53L), 1000) - 500) / 6250.0
                |AS FLOAT))""".stripMargin).as("embedding"),
        $"label")
  }

  private[graft] def customer(spark: SparkSession, s: Int): DataFrame = {
    import spark.implicits._
    spark.range(15000L * s).select(
      $"id".as("c_custkey"),
      format_string("Customer#%09d", $"id").as("c_name"),
      pmod(xxhash64($"id", lit(61)), lit(25L)).cast("int").as("c_nationkey"),
      (pmod(xxhash64($"id", lit(67)), lit(999000L)).cast("double") / 100.0 + 1000.0).as("c_acctbal"),
      element_at(array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY").map(lit): _*),
        pmod(xxhash64($"id", lit(71)), lit(5)).cast("int") + 1).as("c_mktsegment"))
  }

  private[graft] def supplier(spark: SparkSession, s: Int): DataFrame = {
    import spark.implicits._
    spark.range(1000L * s).select(
      $"id".as("s_suppkey"),
      format_string("Supplier#%09d", $"id").as("s_name"),
      pmod(xxhash64($"id", lit(73)), lit(25L)).cast("int").as("s_nationkey"),
      (pmod(xxhash64($"id", lit(79)), lit(999000L)).cast("double") / 100.0).as("s_acctbal"))
  }

  private[graft] def part(spark: SparkSession, s: Int): DataFrame = {
    import spark.implicits._
    // the driver's exact 8×8 p_name product (q9 filters '%widget%' — a noun
    // set without it silently empties the query)
    val adjs = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
    val nouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
    spark.range(20000L * s).select(
      $"id".as("p_partkey"),
      concat(
        element_at(array(adjs.map(lit): _*), pmod(xxhash64($"id", lit(83)), lit(8)).cast("int") + 1),
        lit(" "),
        element_at(array(nouns.map(lit): _*), pmod(xxhash64($"id", lit(89)), lit(8)).cast("int") + 1))
        .as("p_name"),
      concat(lit("Brand#"), pmod(xxhash64($"id", lit(97)), lit(25L)) + 1).as("p_brand"),
      element_at(array(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD").map(lit): _*),
        pmod(xxhash64($"id", lit(101)), lit(6)).cast("int") + 1).as("p_type"),
      (pmod(xxhash64($"id", lit(103)), lit(50L)) + 1).cast("int").as("p_size"),
      (lit(900.0) + pmod(xxhash64($"id", lit(107)), lit(1000L)).cast("double") / 10.0)
        .as("p_retailprice"))
  }

  private[graft] def orders(spark: SparkSession, s: Int): DataFrame = {
    import spark.implicits._
    spark.range(150000L * s).select(
      $"id".as("o_orderkey"),
      pmod(xxhash64($"id", lit(109)), lit(15000L * s)).as("o_custkey"),
      element_at(array(Seq("F", "O", "P").map(lit): _*),
        pmod(xxhash64($"id", lit(113)), lit(3)).cast("int") + 1).as("o_orderstatus"),
      (pmod(xxhash64($"id", lit(127)), lit(49899128L)).cast("double") / 100.0 + 1000.0)
        .as("o_totalprice"),
      timestamp_seconds(lit(788918400L)
        + pmod(xxhash64($"id", lit(131)), lit(2404L)) * 86400L).as("o_orderdate"),
      element_at(array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW").map(lit): _*),
        pmod(xxhash64($"id", lit(137)), lit(5)).cast("int") + 1).as("o_orderpriority"))
  }

  /** lineitem derives from orders (1-7 lines each, avg 4 — the driver's
    * 4.08) so (l_orderkey, l_linenumber) stays unique and key ranges match
    * the dimension tables at the same scale. */
  private[graft] def lineitem(spark: SparkSession, s: Int): DataFrame = {
    import spark.implicits._
    orders(spark, s)
      .select($"o_orderkey", $"o_orderdate",
        (pmod(xxhash64($"o_orderkey", lit(139)), lit(7L)) + 1).cast("int").as("nl"))
      .select($"o_orderkey", $"o_orderdate", explode(sequence(lit(1), $"nl")).as("l_linenumber"))
      .select(
        $"o_orderkey".as("l_orderkey"),
        pmod(xxhash64($"o_orderkey", $"l_linenumber", lit(149)), lit(20000L * s)).as("l_partkey"),
        pmod(xxhash64($"o_orderkey", $"l_linenumber", lit(151)), lit(1000L * s)).as("l_suppkey"),
        $"l_linenumber",
        (pmod(xxhash64($"o_orderkey", $"l_linenumber", lit(157)), lit(50L)) + 1)
          .cast("double").as("l_quantity"),
        (pmod(xxhash64($"o_orderkey", $"l_linenumber", lit(163)), lit(10409923L))
          .cast("double") / 100.0 + 900.0).as("l_extendedprice"),
        (pmod(xxhash64($"o_orderkey", $"l_linenumber", lit(167)), lit(11L))
          .cast("double") / 100.0).as("l_discount"),
        (pmod(xxhash64($"o_orderkey", $"l_linenumber", lit(173)), lit(9L))
          .cast("double") / 100.0).as("l_tax"),
        element_at(array(Seq("A", "N", "R").map(lit): _*),
          pmod(xxhash64($"o_orderkey", $"l_linenumber", lit(179)), lit(3)).cast("int") + 1)
          .as("l_returnflag"),
        element_at(array(Seq("F", "O").map(lit): _*),
          pmod(xxhash64($"o_orderkey", $"l_linenumber", lit(181)), lit(2)).cast("int") + 1)
          .as("l_linestatus"),
        timestamp_seconds(unix_timestamp($"o_orderdate")
          + pmod(xxhash64($"o_orderkey", $"l_linenumber", lit(191)), lit(120L)) * 86400L)
          .as("l_shipdate"))
  }

  /** Build every base table under outDir (skipped when the marker exists). */
  def synth(spark: SparkSession, outDir: String, s: Int): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$outDir/_GRAFT_SYNTH_s$s")
    if (fs.exists(marker)) return
    val t0 = System.nanoTime()
    // region/nation are fixed-size dimensions, identical across the sf
    // ladder: carry them over from the driver's sf0.1 unchanged.
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    val gens: Seq[(String, DataFrame)] = Seq(
      "events" -> events(spark, s), "documents" -> documents(spark, s),
      "embeddings" -> embeddings(spark, s), "customer" -> customer(spark, s),
      "supplier" -> supplier(spark, s), "part" -> part(spark, s),
      "orders" -> orders(spark, s), "lineitem" -> lineitem(spark, s))
    gens.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    fs.create(marker, true).close()
    System.err.println(f"[soak] synth s=$s built under $outDir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }

  // ---------------------------------------------------------------- soak

  def main(args: Array[String]): Unit = {
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR", "/tmp/graft_sf1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SOAK_SCALE", "10").toInt
    val smallDir = sys.env.getOrElse("SPARK_GRAFT_SOAK_BASE", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_SOAK_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_SOAK_MEM", "48g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    synth(spark, outDir, scale)

    // per-query shuffle attribution: alpha on wall alone can't distinguish
    // "more data" from "worse plan"; shuffle-bytes alpha pins which it is.
    val acc = new java.util.concurrent.atomic.AtomicLongArray(3) // read, write, input
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        acc.addAndGet(0, m.shuffleReadMetrics.totalBytesRead)
        acc.addAndGet(1, m.shuffleWriteMetrics.bytesWritten)
        acc.addAndGet(2, m.inputMetrics.bytesRead)
      }
    })
    def drain(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case scala.util.control.NonFatal(_) => Thread.sleep(200) }

    val names = heavy.filter(n => only.forall(_.contains(n)))
    case class R(name: String, dir: String, wall: Double, min2: Double,
        shufRead: Long, shufWrite: Long, input: Long, rows: Long)
    val results = scala.collection.mutable.ArrayBuffer.empty[R]
    for (dir <- Seq(smallDir, outDir)) {
      graft.fixtures.Fixtures.register(spark, dir)
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        drain(); acc.set(0, 0); acc.set(1, 0); acc.set(2, 0)
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        val w1 = (System.nanoTime() - t0) / 1e9
        drain()
        val (sr, sw, in) = (acc.get(0), acc.get(1), acc.get(2))
        val t1 = System.nanoTime()
        fn(spark, dir).count()
        val w2 = (System.nanoTime() - t1) / 1e9
        val r = R(name, dir, w1, math.min(w1, w2), sr, sw, in, rows)
        results += r
        System.err.println(f"[soak] $dir%s ${r.name}%-32s wall=${r.wall}%8.2f min2=${r.min2}%8.2f " +
          f"shufR=${r.shufRead / 1e6}%9.1fMB shufW=${r.shufWrite / 1e6}%9.1fMB rows=${r.rows}%d")
      }
    }

    val logS = math.log(scale.toDouble)
    def a(big: Double, small: Double): Double =
      if (small <= 0 || big <= 0) Double.NaN
      else math.rint(math.log(big / small) / logS * 100) / 100
    println("| query | t(sf0.1) s | t(sf1) s | alpha_wall | shufW 0.1 MB | shufW sf1 MB | alpha_shuf | rows 0.1 -> sf1 |")
    println("|---|---|---|---|---|---|---|---|")
    for (name <- names) {
      val s0 = results.find(r => r.name == name && r.dir == smallDir).get
      val s1 = results.find(r => r.name == name && r.dir == outDir).get
      println(f"| $name | ${s0.min2}%.2f | ${s1.min2}%.2f | ${a(s1.min2, s0.min2)}%.2f " +
        f"| ${s0.shufWrite / 1e6}%.1f | ${s1.shufWrite / 1e6}%.1f " +
        f"| ${a(s1.shufWrite.toDouble.max(1), s0.shufWrite.toDouble.max(1))}%.2f " +
        f"| ${s0.rows} -> ${s1.rows} |")
    }
    val tot0 = results.filter(_.dir == smallDir).map(_.min2).sum
    val tot1 = results.filter(_.dir == outDir).map(_.min2).sum
    println(f"%nTOTAL min2: sf0.1=${tot0}%.1f s  sf$scale x=${tot1}%.1f s  alpha=${a(tot1, tot0)}%.2f")
    spark.stop()
  }
}
