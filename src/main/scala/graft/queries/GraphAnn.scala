package graft.queries

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures
import graft.plans.DotProduct

/** Graph-based ANN — the index family that dominates production vector
  * serving below ~10⁸ vectors (HNSW/NSG lineage), here in its
  * distributed-friendly form:
  *
  *  - BUILD: a k-NN graph by NN-descent (Dong, Moses & Li, WWW'11
  *    "Efficient k-nearest neighbor graph construction for generic
  *    similarity measures") — batch-synchronous rounds where each node's
  *    candidate pool is its current neighbors' neighbors (in BOTH edge
  *    directions, the paper's B(v) ∪ R(v) reversal), re-ranked to the best
  *    K. The reverse direction is SAMPLED to the best [[rhoCap]] incoming
  *    edges per node (the paper's ρK cap, §2.3): without it a hub vector
  *    that lands in many nodes' top-K contributes R(v)² candidate pairs in
  *    one round — a quadratic pocket on clustered corpora. With the cap,
  *    per-node candidate work is bounded by (K+ρK)² regardless of skew, so
  *    each round is O(N·(K+ρK)²) pairs: one self-join + one bounded
  *    per-node top-K, the map-reduce shape the paper itself gives.
  *    Initialization is the persisted LSH tables (both plane families — a
  *    principled warm start that reuses the index artifacts every other
  *    family serves from) plus a ±3 id-ring that guarantees the seed graph
  *    has no isolated nodes even where LSH buckets are singletons.
  *  - SERVE: beam search over the persisted graph in its batch-synchronous
  *    form (expand the whole frontier each round along UNDIRECTED edges —
  *    forward K plus the same ρK-capped reverse sample — keep the best
  *    [[beam]] by exact cosine, fixed [[searchRounds]] rounds). Entry
  *    points are PER-QUERY: each query seeds its frontier with its
  *    MULTI-PROBE co-bucket mates from BOTH persisted LSH plane families
  *    (own bucket plus every Hamming-1 bucket, capped at [[lshSeedCap]]
  *    per family ranked by probe distance) plus a fixed set of
  *    [[nLandmarks]] global landmarks — a flat graph has no HNSW
  *    hierarchy to funnel a single global entry toward the query's
  *    region, so seeding diversity is what buys convergence (the
  *    round-13 single-`MIN(vec_id)` entry measured recall@3 0.05 at
  *    sf0.1; r14's single-probe seeding over the degree-8 graph measured
  *    0.65; multi-probe seeds + degree 16 measure 0.917 — see
  *    [[recallGraphCurve]] for the published knob curve). Per query the
  *    work is O(rounds·beam·(K+ρK)) dot products; the corpus is never
  *    scanned.
  *
  * Lifecycle discipline matches [[AnnIndex]]: the first consumer per
  * (session, sfDir) builds ONCE (atomically, via `computeIfAbsent`) and
  * publishes `graph_edges` under the same delta protocol (staging dir,
  * manifest last, atomic rename); search and recall entries then serve
  * from the parquet artifact — their plans contain no NN-descent operator
  * (GraphAnnSpec pins exactly this: no build-shaped join signature in any
  * serving plan, build-once across repeated serves, and seed determinism).
  *
  * Determinism: scores are the native [[graft.plans.DotProduct]] left-fold
  * divided by exact square roots — the same IEEE-reproducible contract the
  * rest of the similarity family relies on — so the DuckDB oracle replays
  * build and search verbatim, round by unrolled round. The oracle CTEs are
  * `MATERIALIZED`: DuckDB inlines WITH-chains by default, and the build
  * recursion (each round references the previous twice) made the round-13
  * oracles re-evaluate the chain ~4^rounds times (~10 min each at sf0.01);
  * materializing each round's frame makes the replay linear in rounds.
  */
object GraphAnn {

  /** Graph degree K: each node keeps its best 16 neighbors. The
    * recall/cost knob of the family (HNSW's M — production HNSW runs
    * M 16-48). Raised 8 → 16 in r15: at sf0.1 the degree-8 graph held
    * only 52/120 of the queries' true top-3 as direct edges, capping the
    * beam search at 0.68 no matter the seeds — this corpus is
    * near-uniform (true top-3 cosines ~0.4), so the neighbors-of-
    * neighbors signal NN-descent exploits is weak and degree is what
    * buys graph quality. Build stays O(N·(K+ρK)²) pairs per round. */
  private val K = 16

  /** NN-descent refinement rounds after the LSH+ring seed (swept r14 at
    * K=8: serving recall 0.62 after 4 rounds, 0.65 after 5 — one more
    * round than the clique init needed, at linear candidate volume; kept
    * at 5 under K=16, where the build converges to 104/120 true-top-3
    * direct edges at sf0.1). */
  private val rounds = 5

  /** Per-node co-bucket seed span: inside each LSH bucket (members ordered
    * by vec_id) every node pairs with its next `bucketRingCap` bucket
    * mates instead of the whole bucket. The clique init was the build's
    * quadratic pocket: plane count is fixed, so bucket occupancy grows
    * linearly with the corpus and clique pairs quadratically — measured
    * α_shuf 1.56 on the 10× soak. The ring is Θ(N·cap) at every scale and
    * NN-descent's transitive expansion recovers (then beats) the clique's
    * recall with one extra round. */
  private val bucketRingCap = 8

  /** Reverse-neighbor sample cap (the paper's ρK, ρ=1): each node
    * contributes at most this many incoming edges to the expansion, both
    * in build rounds and in the serving adjacency. */
  private val rhoCap = K

  /** Beam width and round count of the serving search. The r14 sweep at
    * sf0.1 (beam 8/10/12/16 × rounds 3..6, K=8) put the knee at beam=12;
    * under K=16 + multi-probe seeds the published curve saturates at
    * rounds=3 (0.917 at ~760 visited/query of the 2000-vector sf0.1
    * corpus — vs the PQ arm's 0.43 and plain LSH's 0.07); rounds stay at
    * 5 as the safety margin the curve entry prices (visited grows <3%
    * past saturation). [[recallGraphCurve]] gates the rounds axis. */
  private val beam = 12
  private val searchRounds = 5

  /** Per-query seed budget: co-bucket mates per LSH plane family under
    * MULTI-PROBE (own bucket + the [[Similarity.lshPlanes]] Hamming-1
    * buckets — Lv et al. VLDB'07's probe sequence applied to SEEDING,
    * r15/VERDICT r14 #7: single-probe seeds covered too little of the
    * graph for the beam to reach the true neighborhood — multi-probe
    * alone lifted sf0.1 recall@3 0.65 → 0.68, and with the degree-16
    * graph the pair measures 0.917), plus the fixed
    * global landmark count (the [[nLandmarks]] smallest vec_ids — ids are
    * unordered w.r.t. embedding space, so these are deterministic uniform
    * starts that carry queries whose probe ring is empty). */
  private val lshSeedCap = 16
  private val nLandmarks = 16

  // ------------------------------------------------------------------
  // build

  /** Exact cosine for a directed candidate-pair frame (src, dst); both
    * ends join the degenerate-filtered vector frame, so zero-norm vectors
    * can never enter the graph (same boundary as [[Similarity.vecs]]). */
  private def scorePairs(v: DataFrame, pairs: DataFrame): DataFrame = {
    val s = v.select(col("vec_id").as("src"), col("embedding").as("semb"),
      col("norm_sq").as("sn"))
    val d = v.select(col("vec_id").as("dst"), col("embedding").as("demb"),
      col("norm_sq").as("dn"))
    pairs.join(s, Seq("src")).join(d, Seq("dst"))
      .select(col("src"), col("dst"),
        (Similarity.dotExpr("semb", "demb") /
          (sqrt(col("sn")) * sqrt(col("dn")))).as("cosine"))
  }

  /** Keep each node's best k candidates. The window frame is bounded by
    * the per-node candidate count (≤ ring + bucket + (K+ρK)² rows), never
    * corpus-sized. */
  private def topK(v: DataFrame, cand: DataFrame, k: Int): DataFrame =
    scorePairs(v, cand.distinct())
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("cosine").desc, col("dst"))))
      .filter(col("rn") <= k)

  /** The ρK reverse sample: each node's best `cap` INCOMING edges (by
    * cosine, ties on the far end), re-oriented outward. One bounded window
    * — the skew gate that keeps hub nodes from exploding the expansion. */
  private def revCapped(g: DataFrame, cap: Int): DataFrame =
    g.select(col("src"), col("dst"), col("cosine"))
      .withColumn("rrn", row_number().over(
        Window.partitionBy(col("dst")).orderBy(col("cosine").desc, col("src"))))
      .filter(col("rrn") <= cap)
      .select(col("dst").as("src"), col("src").as("dst"))

  /** NN-descent over the session corpus (restricted to `pred`'s vectors
    * for the incremental base); returns (src, dst, cosine, rn).
    * Each round is localCheckpoint'd: the expansion references the previous
    * graph three times, so un-truncated lineage would re-derive it
    * exponentially — the build is one-shot and immediately persisted, so
    * truncation costs nothing downstream. The LSH artifacts are per-vector
    * (a vector's bucket does not depend on the rest of the corpus), so
    * filtering the served full-corpus bands by `pred` IS the standing
    * corpus's index — no second LSH build. */
  private def buildGraph(spark: SparkSession, sfDir: String,
      pred: String = "TRUE"): DataFrame = {
    val v = Similarity.vecs(spark, sfDir).filter(expr(pred))
    val idx = AnnIndex.served(spark, sfDir)

    val ring = v.select(col("vec_id").as("src"),
        explode(expr("sequence(-3, 3)")).as("off"))
      .filter(col("off") =!= 0)
      .select(col("src"), (col("src") + col("off")).as("dst"))
      .join(v.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")

    // co-bucket RING pairs from BOTH persisted LSH plane families: rank
    // members inside each bucket by vec_id, then pair each with its next
    // [[bucketRingCap]] mates via an exploded-offset EQUI-join on
    // (bucket, pos) — output AND join work are Θ(N·cap); the bucket-clique
    // self-join this replaces was Θ(Σ n_b²), quadratic once occupancy
    // outgrows the fixed plane count (α_shuf 1.56 on the 10× soak)
    def coBucket(allBands: DataFrame): DataFrame = {
      val bands = allBands.filter(expr(pred))
      val pos = bands.withColumn("pos", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("vec_id"))))
      val probes = pos.select(col("bucket"), col("vec_id").as("src"),
          explode(expr(s"sequence(1, $bucketRingCap)")).as("off"), col("pos"))
        .select(col("bucket"), col("src"), (col("pos") + col("off")).as("pos"))
      val fwd = probes.join(
          pos.select(col("bucket"), col("pos"), col("vec_id").as("dst")),
          Seq("bucket", "pos"))
        .select(col("src"), col("dst"))
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    }
    val init = ring
      .union(coBucket(idx.bands))
      .union(coBucket(idx.bandsT1.getOrElse(sys.error(
        "graph build needs the multi-table LSH artifact (withT1 index)"))))

    var g = topK(v, init, K).localCheckpoint()
    for (_ <- 1 to rounds) {
      val und = g.select(col("src"), col("dst")).union(revCapped(g, rhoCap))
      val nn = und.as("x").join(und.as("y"),
          col("x.dst") === col("y.src") && col("x.src") =!= col("y.dst"))
        .select(col("x.src").as("src"), col("y.dst").as("dst"))
      g = topK(v, g.select(col("src"), col("dst")).union(nn), K).localCheckpoint()
    }
    g
  }

  // ------------------------------------------------------------------
  // persistence (AnnIndex delta protocol: staging, manifest last, atomic
  // rename; build-once per session root, artifacts immutable afterwards)

  private val roots = new ConcurrentHashMap[(SparkSession, String), String]()

  /** The session's published graph root (spec seam). */
  private[queries] def rootOf(spark: SparkSession, sfDir: String): Option[String] =
    Option(roots.get((spark, sfDir)))

  /** The persisted k-NN graph, building + publishing on first touch.
    * `computeIfAbsent` makes first-touch atomic: concurrent consumers
    * block on one build instead of racing duplicate publishes. */
  private[queries] def graphEdges(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    DotProduct.register(spark)
    val root = roots.computeIfAbsent((spark, sfDir), _ => {
      val r = Files.createTempDirectory("graft-ann-graph-").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        AnnIndex.rmTree(Paths.get(r))))
      AnnIndex.writeDelta(r, 1, "base") { tmp =>
        buildGraph(spark, sfDir).write.parquet(s"$tmp/graph_edges")
      }
      r
    })
    spark.read.parquet(s"${AnnIndex.deltaPath(root, 1)}/graph_edges")
  }

  // ------------------------------------------------------------------
  // incremental lifecycle (the append leg the other index families gate
  // via sim_ann_*_incremental): base graph over the standing corpus, new
  // vectors inserted WITHOUT a rebuild by searching the base graph —
  // HNSW-style search-based insertion (each new node's edges are its
  // beam-search top-K), published as an append delta under the same
  // protocol. The base's NN-descent never re-runs: insertion work is
  // O(batch · rounds·beam·(K+ρK)) dot products, independent of the
  // standing corpus size — the property that makes the graph family
  // maintainable online at 100 TB.

  private val incrRoots = new ConcurrentHashMap[(SparkSession, String), String]()

  /** The incremental root's published delta chain (spec seam). */
  private[queries] def incrRootOf(spark: SparkSession, sfDir: String): Option[String] =
    Option(incrRoots.get((spark, sfDir)))

  private def incrRoot(spark: SparkSession, sfDir: String): String = {
    Fixtures.register(spark, sfDir)
    DotProduct.register(spark)
    incrRoots.computeIfAbsent((spark, sfDir), _ => {
      val r = Files.createTempDirectory("graft-ann-graph-incr-").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        AnnIndex.rmTree(Paths.get(r))))
      AnnIndex.writeDelta(r, 1, "base") { tmp =>
        buildGraph(spark, sfDir, AnnIndex.standingPred)
          .write.parquet(s"$tmp/graph_edges")
      }
      // insertion search: batch vectors probe the PERSISTED base graph,
      // seeded from their own LSH co-bucket mates among the standing
      // corpus + the standing landmarks
      val base = spark.read.parquet(s"${AnnIndex.deltaPath(r, 1)}/graph_edges")
      val v = Similarity.vecs(spark, sfDir)
      val qv = v.filter(expr(AnnIndex.batchPred))
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
          col("norm_sq").as("qn"))
      val scored = searchChain(v, undirectedAdj(base), qv,
        seeds(spark, sfDir, qv, AnnIndex.batchPred, AnnIndex.standingPred),
        boundedQueries = false)
        .last._2
      val inserted = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))))
        .filter(col("rn") <= K)
        .select(col("qid").as("src"), col("vec_id").as("dst"),
          col("cosine"), col("rn"))
      AnnIndex.writeDelta(r, 2, "append") { tmp =>
        inserted.write.parquet(s"$tmp/graph_edges")
      }
      // the delete leg (same fixture ids as the IVF×PQ lifecycle): a
      // tombstone-only delta — edge artifacts untouched, serving masks
      AnnIndex.writeDelta(r, 3, "delete") { tmp =>
        spark.table("embeddings").filter(expr(AnnIndex.deletedPred))
          .select(col("vec_id")).distinct().write.parquet(s"$tmp/tombstones")
      }
      r
    })
  }

  /** All published edges of the incremental root (base ∪ append). */
  private def incrEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val root = incrRoot(spark, sfDir)
    spark.read.parquet(s"${AnnIndex.deltaPath(root, 1)}/graph_edges")
      .unionByName(
        spark.read.parquet(s"${AnnIndex.deltaPath(root, 2)}/graph_edges"))
  }

  // ------------------------------------------------------------------
  // serving internals

  /** Undirected serving adjacency over an edge frame: the forward edges
    * plus the same ρK-capped reverse sample the build uses — degree ≤ K+ρK
    * per node, so every frontier expansion is O(frontier·(K+ρK)). */
  private def undirectedAdj(e: DataFrame): DataFrame =
    e.select(col("src"), col("dst")).union(revCapped(e, rhoCap))

  private def serveAdj(spark: SparkSession, sfDir: String): DataFrame =
    undirectedAdj(graphEdges(spark, sfDir))

  /** Per-query seeds: MULTI-PROBE co-bucket mates from both persisted LSH
    * plane families (own bucket ∪ the Hamming-1 buckets — where a true
    * neighbor lands when it disagrees with the query on exactly one
    * hyperplane, single-probe LSH's dominant miss mode; best
    * [[lshSeedCap]] per family ranked by probe distance then vec_id) ∪
    * the global landmark set, deduped. The probe fan-out is a bounded
    * explode on the QUERY side — the bucket join stays the same
    * equi-join, so the scale shape is unchanged. `qidPred` selects the
    * searching vectors; `poolPred` restricts mates AND landmarks to the
    * graph's population (the standing corpus during an insertion search,
    * everything otherwise). */
  private def seeds(spark: SparkSession, sfDir: String, qv: DataFrame,
      qidPred: String, poolPred: String): DataFrame = {
    val idx = AnnIndex.served(spark, sfDir)
    val v = Similarity.vecs(spark, sfDir)
    def mates(bands: DataFrame): DataFrame =
      bands.filter(expr(qidPred))
        .select(col("vec_id").as("qid"),
          explode(expr(
            s"""concat(
                 array(named_struct('d', 0, 'pb', CAST(bucket AS BIGINT))),
                 transform(sequence(0, ${Similarity.lshPlanes - 1}),
                   p -> named_struct('d', 1,
                     'pb', CAST(bucket AS BIGINT) ^
                           shiftleft(CAST(1 AS BIGINT), p))))""")).as("pr"))
        .select(col("qid"), col("pr.d").as("d"), col("pr.pb").as("bucket"))
        .join(bands.filter(expr(poolPred)).select(col("vec_id"), col("bucket")),
          Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("mrn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d"), col("vec_id"))))
        .filter(col("mrn") <= lshSeedCap)
        .select(col("qid"), col("vec_id"))
    val landmarks = v.filter(expr(poolPred))
      .orderBy(col("vec_id")).limit(nLandmarks).select(col("vec_id"))
    qv.select(col("qid")).crossJoin(landmarks)
      .union(mates(idx.bands))
      .union(mates(idx.bandsT1.getOrElse(sys.error(
        "graph search needs the multi-table LSH artifact (withT1 index)"))))
      .distinct()
  }

  /** Batch-synchronous beam search, returning each round's
    * (visited, scored-visited) pair — round r's scored frame is what both
    * [[graphSearch]] (last round) and [[recallGraphCurve]] (every round)
    * rank. All per-round frames are O(queries·beam·(K+ρK)).
    *
    * The frames CARRIED ACROSS rounds (frontier, visited) are eagerly
    * localCheckpoint'd: round r references round r−1 through two paths, so
    * un-truncated lineage re-derives the whole chain ~2^rounds times —
    * measured 12–22 s per serving entry at sf0.1 before the fix. The
    * RETURNED scored frame is built lazily from the checkpointed inputs
    * plus a LIVE `edges` join, so every serving plan still scans the
    * persisted graph artifact (the purity property GraphAnnSpec pins).
    * States are memoized per (session, sfDir): the three serving entries
    * share one search execution, like every other index family shares its
    * [[AnnIndex.served]] artifacts. */
  private val states = new ConcurrentHashMap[(SparkSession, String, String),
    Seq[(DataFrame, DataFrame)]]()

  /** The generic batch-synchronous beam search over `edges` for the query
    * frame `qv` from `seedFrame` — shared verbatim by the main serving
    * entries, the incremental lifecycle's insertion search, and the
    * post-append recall search.
    *
    * `boundedQueries` gates the scoring join's broadcast hint: the serving
    * paths search for the FIXED query budget (≤ maxQueries rows — the
    * candidates×queries frame is bounded, broadcast is the shuffle-free
    * rerank shape), but the INSERTION search's "queries" are the append
    * batch, which grows with the corpus — its candidate frame is
    * Θ(batch·budget) and hint-broadcasting it collects the whole thing to
    * the driver (measured: >1 GiB task results at the 100× soak, killing
    * the build). With the hint off both joins degrade to shuffles —
    * distributed regardless of batch size. */
  private def searchChain(v: DataFrame, edges: DataFrame, qv: DataFrame,
      seedFrame: DataFrame, boundedQueries: Boolean = true): Seq[(DataFrame, DataFrame)] = {
    def score(cand: DataFrame): DataFrame = {
      val withQ = cand.join(qv, Seq("qid"))
      v.join(if (boundedQueries) broadcast(withQ) else withQ, Seq("vec_id"))
        .select(col("qid"), col("vec_id"),
          (Similarity.dotExpr("embedding", "qemb") /
            (sqrt(col("qn")) * sqrt(col("norm_sq")))).as("cosine"))
    }

    var frontier = seedFrame.localCheckpoint()
    var visited = frontier
    (1 to searchRounds).map { _ =>
      val expand = frontier.as("f").join(edges.as("e"),
          col("f.vec_id") === col("e.src"))
        .select(col("f.qid").as("qid"), col("e.dst").as("vec_id"))
      val cand = visited.union(expand).distinct()
      // ONE materialization of the candidate set per round: the next
      // frontier is ranked over the checkpointed leaf, so the
      // expand+distinct subtree no longer executes twice per round (once
      // under the frontier checkpoint, once under the visited one). The
      // RETURNED scored frame stays derived from the LIVE `cand` — its
      // plan keeps the persisted-graph scan (the purity property
      // GraphAnnSpec pins); values are identical either way.
      val candCk = cand.localCheckpoint()
      frontier = score(candCk)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))))
        .filter(col("rn") <= beam)
        .select(col("qid"), col("vec_id"))
        .localCheckpoint()
      visited = candCk
      (visited, score(cand))
    }
  }

  /** The standard query set (every 50th vector) as a scoring frame. */
  private def queryFrame(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.vecs(spark, sfDir).filter(expr(Similarity.queryFilter))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("norm_sq").as("qn"))

  private def searchStates(spark: SparkSession, sfDir: String)
      : Seq[(DataFrame, DataFrame)] =
    states.computeIfAbsent((spark, sfDir, "main"), _ => {
      // register BEFORE the query frame: queryFrame touches the fixture
      // tables ahead of serveAdj's own registration, so an isolated
      // first-touch of this entry (subset Verify/Explain) would otherwise
      // fail on the unregistered `embeddings` view
      Fixtures.register(spark, sfDir)
      DotProduct.register(spark)
      val qv = queryFrame(spark, sfDir)
      searchChain(Similarity.vecs(spark, sfDir), serveAdj(spark, sfDir), qv,
        seeds(spark, sfDir, qv, Similarity.queryFilter, "TRUE"))
    })

  /** Top-3 answer frame from a scored-visited frame. */
  private def top3(scored: DataFrame): DataFrame =
    scored
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rn") <= 3)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        col("rn").cast(LongType).as("rank"), round(col("cosine"), 6).as("cosine"))

  // ------------------------------------------------------------------
  // entries

  /** The published graph itself: each node's K nearest by cosine after the
    * NN-descent rounds. */
  def graphBuild(spark: SparkSession, sfDir: String): DataFrame =
    graphEdges(spark, sfDir)
      .select(col("src").as("vec_id"), col("dst").as("neighbor_id"),
        col("rn").cast(LongType).as("rank"), round(col("cosine"), 6).as("cosine"))

  /** Beam search over the persisted graph from per-query seeds (LSH
    * co-bucket mates + landmarks), answering top-3 from everything
    * visited after [[searchRounds]] rounds. */
  def graphSearch(spark: SparkSession, sfDir: String): DataFrame =
    top3(searchStates(spark, sfDir).last._2)

  /** Recall@3 of the beam search vs the exact top-3, through the same
    * shared harness as every other index family — the number that prices
    * the graph arm against IVF×PQ / LSH at their published budgets. */
  def recallGraph(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.recallAgainst(
      Similarity.cosineTopK(spark, sfDir).filter(col("rank") <= 3),
      graphSearch(spark, sfDir))

  /** The search-rounds→recall knob curve, one row per round 1..[[
    * searchRounds]], each carrying macro recall@3 AND the measured
    * candidate budget (avg visited per query) — the table a deployment
    * consults before trading rounds for recall, and the published evidence
    * that the curve flattens where [[searchRounds]] pins it. Rounds nest
    * (round r's visited ⊂ round r+1's), so macro recall is non-decreasing
    * — GraphAnnSpec pins the monotonicity. */
  def recallGraphCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = Similarity.cosineTopK(spark, sfDir)
      .filter(col("rank") <= 3).localCheckpoint()
    searchStates(spark, sfDir).zipWithIndex.map { case ((visited, scored), i) =>
      val rec = Similarity.recallAgainst(exact, top3(scored))
        .agg(count(lit(1)).as("n_queries"),
          coalesce(sum(col("hits")), lit(0L)).as("hits_total"))
      val vis = visited.filter(col("vec_id") =!= col("qid"))
        .agg(count(lit(1)).as("visited_total"))
      rec.crossJoin(vis).select(
        lit((i + 1).toLong).as("search_rounds"),
        col("n_queries"), col("hits_total"),
        round(col("hits_total") / (greatest(col("n_queries"), lit(1L)) * lit(3.0)), 6)
          .as("macro_recall_at_3"),
        round(col("visited_total") / greatest(col("n_queries"), lit(1L)), 6)
          .as("avg_visited"))
    }.reduce(_ unionByName _)
  }

  /** The append leg's published artifact: each inserted (batch) node's
    * K nearest among the standing corpus, found by searching the persisted
    * base graph — no NN-descent re-run (the plan reads delta=00002's
    * parquet only; GraphAnnSpec pins it). */
  def graphIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val root = incrRoot(spark, sfDir)
    spark.read.parquet(s"${AnnIndex.deltaPath(root, 2)}/graph_edges")
      .select(col("src").as("vec_id"), col("dst").as("neighbor_id"),
        col("rn").cast(LongType).as("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** The delete leg: beam search over the graph with the tombstoned ids
    * masked out — edges touching a deleted node are dropped at serving
    * (anti-join against the tombstone delta, the [[AnnIndex.deleteIds]]
    * mask semantics), and seeds draw only from surviving ids, so a deleted
    * vector can neither be traversed through nor returned. Completes the
    * graph family's lifecycle: build / append / delete, all three served
    * from immutable deltas of one root. */
  /** The masked serving view: every edge whose either endpoint is
    * tombstoned dropped via anti-joins against the persisted artifact. */
  private def maskedIncrEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val root = incrRoot(spark, sfDir)
    val ts = spark.read.parquet(s"${AnnIndex.deltaPath(root, 3)}/tombstones")
    incrEdges(spark, sfDir)
      .join(ts.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(ts.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
  }

  /** Beam search for the standard queries over a given adjacency with the
    * surviving-ids seed pool — the delete and compacted legs share it. */
  private def survivorSearch(spark: SparkSession, sfDir: String,
      edges: DataFrame, variant: String): DataFrame = {
    val chain = states.computeIfAbsent((spark, sfDir, variant), _ => {
      val qv = queryFrame(spark, sfDir)
      searchChain(Similarity.vecs(spark, sfDir), undirectedAdj(edges), qv,
        seeds(spark, sfDir, qv, Similarity.queryFilter,
          s"NOT (${AnnIndex.deletedPred})"))
    })
    top3(chain.last._2)
  }

  def graphDeleted(spark: SparkSession, sfDir: String): DataFrame =
    survivorSearch(spark, sfDir, maskedIncrEdges(spark, sfDir), "del")

  private val foldRoots = new ConcurrentHashMap[(SparkSession, String), String]()

  /** The compacted root (spec seam). */
  private[queries] def foldRootOf(spark: SparkSession, sfDir: String): Option[String] =
    Option(foldRoots.get((spark, sfDir)))

  /** The compaction leg: fold the masked view into a fresh single base
    * delta — after the fold no artifact byte of a tombstoned vector's
    * edges exists on disk (the erasure guarantee; GraphAnnSpec reads the
    * folded parquet raw to pin it), and serving over the folded root must
    * not move a single ranked pair relative to the masked view — the two
    * entries share [[graphDeletedOracle]] verbatim, the same contract the
    * IVF×PQ vacuumed leg pins. */
  def graphCompacted(spark: SparkSession, sfDir: String): DataFrame = {
    val root = foldRoots.computeIfAbsent((spark, sfDir), _ => {
      val r = Files.createTempDirectory("graft-ann-graph-fold-").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        AnnIndex.rmTree(Paths.get(r))))
      AnnIndex.writeDelta(r, 1, "base") { tmp =>
        maskedIncrEdges(spark, sfDir).write.parquet(s"$tmp/graph_edges")
      }
      r
    })
    survivorSearch(spark, sfDir,
      spark.read.parquet(s"${AnnIndex.deltaPath(root, 1)}/graph_edges"), "fold")
  }

  /** Recall@3 of the masked search against the exact top-3 over the
    * SURVIVING corpus — deletion changes the ground truth (a deleted
    * vector is not a valid answer), so the recall that prices the delete
    * leg grades against survivors-only exactness, the same convention the
    * filtered-ANN recall uses for its label predicate. */
  def recallGraphDeleted(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    DotProduct.register(spark)
    val v = Similarity.vecs(spark, sfDir)
    val qv = queryFrame(spark, sfDir)
    val exact = v.filter(expr(s"NOT (${AnnIndex.deletedPred})"))
      .crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (Similarity.dotExpr("embedding", "qemb") /
          (sqrt(col("qn")) * sqrt(col("norm_sq")))).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"))
    Similarity.recallAgainst(exact, graphDeleted(spark, sfDir))
  }

  /** Recall@3 of the standard query set over the POST-APPEND graph (base ∪
    * inserted edges) against the exact top-3 over the FULL corpus — the
    * gate that proves appended vectors are retrievable through the ρK
    * reverse sample of their inserted forward edges, without any rebuild. */
  def recallGraphIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val chain = states.computeIfAbsent((spark, sfDir, "incr"), _ => {
      val qv = queryFrame(spark, sfDir)
      searchChain(Similarity.vecs(spark, sfDir),
        undirectedAdj(incrEdges(spark, sfDir)), qv,
        seeds(spark, sfDir, qv, Similarity.queryFilter, "TRUE"))
    })
    Similarity.recallAgainst(
      Similarity.cosineTopK(spark, sfDir).filter(col("rank") <= 3),
      top3(chain.last._2))
  }

  // ------------------------------------------------------------------
  // oracles — unrolled replay of build + search. Every iterative frame is
  // AS MATERIALIZED: DuckDB inlines plain CTEs, and both the build and the
  // search reference each round's frame several times — materialization
  // keeps the replay linear in rounds instead of ~4^rounds.

  private def mult(i: Int) = graft.plans.LshBucket.multipliers(i)

  /** One scored-candidates → top-K round: ${p}cand$i → ${p}g$i. The `p`
    * prefix namespaces a whole chain so one oracle can carry several
    * (the incremental entries replay a standing build "s", an insertion
    * search "i", and a post-append query search "q" in one statement). */
  private def gRound(i: Int, p: String = ""): String =
    s""", ${p}sc$i AS MATERIALIZED (
         SELECT c.src, c.dst,
                ${DotProduct.duckDot("a.embedding", "b.embedding")}
                  / (SQRT(sn.norm_sq) * SQRT(dn.norm_sq)) AS cosine
         FROM ${p}cand$i c
         JOIN embeddings a ON a.vec_id = c.src
         JOIN embeddings b ON b.vec_id = c.dst
         JOIN nrm sn ON sn.vec_id = c.src
         JOIN nrm dn ON dn.vec_id = c.dst),
       ${p}g$i AS MATERIALIZED (
         SELECT src, dst, cosine, rn FROM (
           SELECT src, dst, cosine,
                  ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
           FROM ${p}sc$i) WHERE rn <= $K)"""

  /** The ρK-capped undirected edge set of g$i (build expansion + serving
    * adjacency share this shape). */
  private def undCte(name: String, g: String): String =
    s""", $name AS MATERIALIZED (
         SELECT src, dst FROM $g
         UNION
         SELECT dst AS src, src AS dst FROM (
           SELECT src, dst,
                  ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cosine DESC, src) AS rrn
           FROM $g) WHERE rrn <= $rhoCap)"""

  /** ${p}g$i → ${p}cand${i+1} (current edges ∪ neighbors-of-neighbors over
    * the capped undirected set). */
  private def expandRound(i: Int, p: String = ""): String =
    undCte(s"${p}und$i", s"${p}g$i") +
      s""", ${p}cand${i + 1} AS MATERIALIZED (
         SELECT src, dst FROM ${p}g$i
         UNION
         SELECT x.src, y.dst FROM ${p}und$i x
         JOIN ${p}und$i y ON x.dst = y.src AND x.src != y.dst)"""

  /** The forward bucket-ring pairs of one plane family: bucket members
    * ranked by vec_id, each paired with its next [[bucketRingCap]] mates
    * (the Spark side reverses them too; the caller unions both
    * directions). */
  private def bucketRingCte(name: String, gb: String): String =
    s""", ${name}_pos AS MATERIALIZED (
         SELECT bucket, vec_id,
                ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS pos
         FROM $gb),
       $name AS MATERIALIZED (
         SELECT a.vec_id AS src, b.vec_id AS dst
         FROM ${name}_pos a JOIN ${name}_pos b
           ON b.bucket = a.bucket
          AND b.pos BETWEEN a.pos + 1 AND a.pos + $bucketRingCap)"""

  /** The full build chain ending in g$rounds. */
  private val buildCtes: String =
    Similarity.elementCtes("embeddings") +
      Similarity.bucketCteFor("gb0", mult(0)) +
      Similarity.bucketCteFor("gb1", mult(1)) +
      Similarity.normCte("embeddings") +
      s""", ring AS MATERIALIZED (
         SELECT a.vec_id AS src, b.vec_id AS dst
         FROM nrm a JOIN nrm b
           ON b.vec_id BETWEEN a.vec_id - 3 AND a.vec_id + 3
          AND b.vec_id != a.vec_id)""" +
      bucketRingCte("brg0", "gb0") +
      bucketRingCte("brg1", "gb1") +
      s""", cand0 AS MATERIALIZED (
         SELECT src, dst FROM ring
         UNION SELECT src, dst FROM brg0
         UNION SELECT dst AS src, src AS dst FROM brg0
         UNION SELECT src, dst FROM brg1
         UNION SELECT dst AS src, src AS dst FROM brg1)""" +
      (0 to rounds).map(i =>
        gRound(i) + (if (i < rounds) expandRound(i) else "")).mkString

  val graphBuildOracle: String = Fixtures.oracle(buildCtes +
    s""" SELECT src AS vec_id, dst AS neighbor_id,
              CAST(rn AS BIGINT) AS rank, ROUND(cosine, 6) AS cosine
       FROM g$rounds""")

  /** Per-query MULTI-PROBE co-bucket seed mates from one plane family's
    * bucket CTE — the exact twin of the Spark [[seeds]] probe ring: own
    * bucket (distance 0) plus the [[Similarity.lshPlanes]] Hamming-1
    * buckets (distance 1), mates ranked by probe distance then vec_id.
    * `qPred` (over the bucket CTE's plain `vec_id`) selects the searching
    * side, `matePred` (over `b.vec_id`) restricts the mate pool (the
    * standing corpus during an insertion search). */
  private def matesCte(name: String, gb: String, qPred: String,
      matePred: String = "TRUE"): String =
    s""", $name AS MATERIALIZED (
         SELECT qid, vec_id FROM (
           SELECT q.qid, b.vec_id,
                  ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY q.d, b.vec_id) AS mrn
           FROM (SELECT vec_id AS qid, CAST(bucket AS BIGINT) AS pb, 0 AS d
                 FROM $gb WHERE ($qPred)
                 UNION ALL
                 SELECT vec_id,
                        xor(CAST(bucket AS BIGINT),
                            CAST(1 AS BIGINT) << CAST(t.p AS INTEGER)), 1
                 FROM $gb, UNNEST(range(${Similarity.lshPlanes})) AS t(p)
                 WHERE ($qPred)) q
           JOIN $gb b ON CAST(b.bucket AS BIGINT) = q.pb AND b.vec_id != q.qid
           WHERE ($matePred)) WHERE mrn <= $lshSeedCap)"""

  /** One search round: ${p}f${r-1}/${p}v${r-1} → ${p}vcand$r, ${p}vsc$r,
    * ${p}f$r, ${p}v$r, expanding along ${p}sadj. */
  private def searchRound(r: Int, p: String = ""): String =
    s""", ${p}exp$r AS (
         SELECT f.qid, g.dst AS vec_id
         FROM ${p}f${r - 1} f JOIN ${p}sadj g ON g.src = f.vec_id),
       ${p}vcand$r AS MATERIALIZED (
         SELECT qid, vec_id FROM ${p}v${r - 1}
         UNION SELECT qid, vec_id FROM ${p}exp$r),
       ${p}vsc$r AS MATERIALIZED (
         SELECT c.qid, c.vec_id,
                ${DotProduct.duckDot("d.embedding", "q.embedding")}
                  / (SQRT(qn.norm_sq) * SQRT(dn.norm_sq)) AS cosine
         FROM ${p}vcand$r c
         JOIN embeddings q ON q.vec_id = c.qid
         JOIN embeddings d ON d.vec_id = c.vec_id
         JOIN nrm qn ON qn.vec_id = c.qid
         JOIN nrm dn ON dn.vec_id = c.vec_id),
       ${p}f$r AS MATERIALIZED (
         SELECT qid, vec_id FROM (
           SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
           FROM ${p}vsc$r) WHERE rn <= $beam),
       ${p}v$r AS (SELECT qid, vec_id FROM ${p}vcand$r)"""

  private val searchCtes: String = buildCtes +
    undCte("sadj", s"g$rounds") +
    s""", qset AS MATERIALIZED (SELECT vec_id AS qid FROM nrm WHERE ${Similarity.queryPred("vec_id")}),
       lmk AS MATERIALIZED (SELECT vec_id FROM nrm ORDER BY vec_id LIMIT $nLandmarks)""" +
    matesCte("mates0", "gb0", Similarity.queryPred("vec_id")) +
    matesCte("mates1", "gb1", Similarity.queryPred("vec_id")) +
    s""", f0 AS MATERIALIZED (
         SELECT q.qid, l.vec_id FROM qset q CROSS JOIN lmk l
         UNION SELECT qid, vec_id FROM mates0
         UNION SELECT qid, vec_id FROM mates1),
       v0 AS (SELECT qid, vec_id FROM f0)""" +
    (1 to searchRounds).map(searchRound(_)).mkString

  val graphSearchOracle: String = Fixtures.oracle(searchCtes +
    s""" SELECT qid AS query_id, vec_id AS neighbor_id,
              CAST(rn AS BIGINT) AS rank, ROUND(cosine, 6) AS cosine
       FROM (SELECT qid, vec_id, cosine,
                    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
             FROM vsc$searchRounds WHERE vec_id != qid)
       WHERE rn <= 3""")

  val recallGraphOracle: String = Similarity.recallOracle(searchCtes,
    s"SELECT qid, vec_id FROM vcand$searchRounds WHERE vec_id != qid")

  val recallGraphCurveOracle: String = Fixtures.oracle(searchCtes +
    Similarity.exactSideCtes +
    (1 to searchRounds).map { r =>
      Similarity.candRankedCtes(s"r$r",
        s"SELECT qid, vec_id FROM vcand$r WHERE vec_id != qid") +
        s""", rec_r$r AS (
           SELECT e.qid, COUNT(l.vec_id) AS hits
           FROM exact_ranked e
           LEFT JOIN cand_ranked_r$r l
             ON l.qid = e.qid AND l.vec_id = e.vec_id AND l.rank <= 3
           WHERE e.rank <= 3
           GROUP BY e.qid),
         vis_r$r AS (
           SELECT COUNT(*) AS visited_total FROM v$r WHERE vec_id != qid)"""
    }.mkString +
    (1 to searchRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS search_rounds,
                CAST(COUNT(1) AS BIGINT) AS n_queries,
                CAST(COALESCE(SUM(hits), 0) AS BIGINT) AS hits_total,
                ROUND(COALESCE(SUM(hits), 0)
                      / (GREATEST(COUNT(1), 1) * 3.0), 6) AS macro_recall_at_3,
                ROUND((SELECT visited_total FROM vis_r$r)
                      / GREATEST(COUNT(1), 1), 6) AS avg_visited
         FROM rec_r$r"""
    }.mkString(" UNION ALL "))

  // ------------------------------------------------------------------
  // incremental-lifecycle oracles: one statement replays the standing
  // build ("s" chain), the batch insertion search ("i" chain), and — for
  // the recall entry — the post-append query search ("q" chain).

  /** `pred` with its vec_id reference alias-qualified for a joined scope. */
  private def predFor(ref: String, pred: String): String =
    pred.replace("vec_id", ref)

  /** Standing-corpus build chain ending in sg$rounds: the full-corpus
    * el/gb/nrm prelude plus standing-filtered views (buckets and norms are
    * per-vector, so a WHERE is the standing index). */
  private val incrBuildCtes: String =
    Similarity.elementCtes("embeddings") +
      Similarity.bucketCteFor("gb0", mult(0)) +
      Similarity.bucketCteFor("gb1", mult(1)) +
      Similarity.normCte("embeddings") +
      s""", sgb0 AS MATERIALIZED (SELECT * FROM gb0 WHERE ${AnnIndex.standingPred}),
         sgb1 AS MATERIALIZED (SELECT * FROM gb1 WHERE ${AnnIndex.standingPred}),
         snrm AS MATERIALIZED (SELECT * FROM nrm WHERE ${AnnIndex.standingPred}),
         sring AS MATERIALIZED (
           SELECT a.vec_id AS src, b.vec_id AS dst
           FROM snrm a JOIN snrm b
             ON b.vec_id BETWEEN a.vec_id - 3 AND a.vec_id + 3
            AND b.vec_id != a.vec_id)""" +
      bucketRingCte("sbrg0", "sgb0") +
      bucketRingCte("sbrg1", "sgb1") +
      s""", scand0 AS MATERIALIZED (
         SELECT src, dst FROM sring
         UNION SELECT src, dst FROM sbrg0
         UNION SELECT dst AS src, src AS dst FROM sbrg0
         UNION SELECT src, dst FROM sbrg1
         UNION SELECT dst AS src, src AS dst FROM sbrg1)""" +
      (0 to rounds).map(i =>
        gRound(i, "s") + (if (i < rounds) expandRound(i, "s") else "")).mkString

  /** Insertion search for the batch vectors over the standing graph,
    * ending in ins_edges (each batch node's K nearest standing vectors). */
  private val insertCtes: String = incrBuildCtes +
    undCte("isadj", s"sg$rounds") +
    s""", iqset AS MATERIALIZED (SELECT vec_id AS qid FROM nrm WHERE ${AnnIndex.batchPred}),
       ilmk AS MATERIALIZED (SELECT vec_id FROM snrm ORDER BY vec_id LIMIT $nLandmarks)""" +
    matesCte("imates0", "gb0", AnnIndex.batchPred,
      predFor("b.vec_id", AnnIndex.standingPred)) +
    matesCte("imates1", "gb1", AnnIndex.batchPred,
      predFor("b.vec_id", AnnIndex.standingPred)) +
    s""", if0 AS MATERIALIZED (
         SELECT q.qid, l.vec_id FROM iqset q CROSS JOIN ilmk l
         UNION SELECT qid, vec_id FROM imates0
         UNION SELECT qid, vec_id FROM imates1),
       iv0 AS (SELECT qid, vec_id FROM if0)""" +
    (1 to searchRounds).map(searchRound(_, "i")).mkString +
    s""", ins_edges AS MATERIALIZED (
         SELECT qid AS src, vec_id AS dst, cosine, rn
         FROM (SELECT qid, vec_id, cosine,
                      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
               FROM ivsc$searchRounds)
         WHERE rn <= $K)"""

  val graphIncrementalOracle: String = Fixtures.oracle(insertCtes +
    s""" SELECT src AS vec_id, dst AS neighbor_id,
              CAST(rn AS BIGINT) AS rank, ROUND(cosine, 6) AS cosine
       FROM ins_edges""")

  /** Post-append query search over base ∪ inserted edges. */
  private val incrSearchCtes: String = insertCtes +
    s""", all_e AS MATERIALIZED (
         SELECT src, dst, cosine FROM sg$rounds
         UNION ALL SELECT src, dst, cosine FROM ins_edges)""" +
    undCte("qsadj", "all_e") +
    s""", qqset AS MATERIALIZED (SELECT vec_id AS qid FROM nrm WHERE ${Similarity.queryPred("vec_id")}),
       qlmk AS MATERIALIZED (SELECT vec_id FROM nrm ORDER BY vec_id LIMIT $nLandmarks)""" +
    matesCte("qmates0", "gb0", Similarity.queryPred("vec_id")) +
    matesCte("qmates1", "gb1", Similarity.queryPred("vec_id")) +
    s""", qf0 AS MATERIALIZED (
         SELECT q.qid, l.vec_id FROM qqset q CROSS JOIN qlmk l
         UNION SELECT qid, vec_id FROM qmates0
         UNION SELECT qid, vec_id FROM qmates1),
       qv0 AS (SELECT qid, vec_id FROM qf0)""" +
    (1 to searchRounds).map(searchRound(_, "q")).mkString

  val recallGraphIncrementalOracle: String = Similarity.recallOracle(incrSearchCtes,
    s"SELECT qid, vec_id FROM qvcand$searchRounds WHERE vec_id != qid")

  /** Delete-leg search: the same base+append chain with the tombstone mask
    * applied to edges, mates, and landmarks (the oracle replays the mask
    * as the generating arithmetic predicate; the Spark side reads the
    * tombstone artifact — GraphAnnSpec pins that mechanism). */
  private val deletedSearchCtes: String = insertCtes +
    s""", dall_e AS MATERIALIZED (
         SELECT src, dst, cosine FROM sg$rounds
         UNION ALL SELECT src, dst, cosine FROM ins_edges),
       dmask_e AS MATERIALIZED (
         SELECT src, dst, cosine FROM dall_e
         WHERE NOT (${predFor("src", AnnIndex.deletedPred)})
           AND NOT (${predFor("dst", AnnIndex.deletedPred)}))""" +
    undCte("dsadj", "dmask_e") +
    s""", dqset AS MATERIALIZED (SELECT vec_id AS qid FROM nrm WHERE ${Similarity.queryPred("vec_id")}),
       dlmk AS MATERIALIZED (
         SELECT vec_id FROM nrm
         WHERE NOT (${AnnIndex.deletedPred})
         ORDER BY vec_id LIMIT $nLandmarks)""" +
    matesCte("dmates0", "gb0", Similarity.queryPred("vec_id"),
      s"NOT (${predFor("b.vec_id", AnnIndex.deletedPred)})") +
    matesCte("dmates1", "gb1", Similarity.queryPred("vec_id"),
      s"NOT (${predFor("b.vec_id", AnnIndex.deletedPred)})") +
    s""", df0 AS MATERIALIZED (
         SELECT q.qid, l.vec_id FROM dqset q CROSS JOIN dlmk l
         UNION SELECT qid, vec_id FROM dmates0
         UNION SELECT qid, vec_id FROM dmates1),
       dv0 AS (SELECT qid, vec_id FROM df0)""" +
    (1 to searchRounds).map(searchRound(_, "d")).mkString

  val graphDeletedOracle: String = Fixtures.oracle(deletedSearchCtes +
    s""" SELECT qid AS query_id, vec_id AS neighbor_id,
              CAST(rn AS BIGINT) AS rank, ROUND(cosine, 6) AS cosine
       FROM (SELECT qid, vec_id, cosine,
                    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
             FROM dvsc$searchRounds WHERE vec_id != qid)
       WHERE rn <= 3""")

  /** Survivor-truth recall: exact side restricted to non-deleted vectors,
    * candidate side the masked search's visited set. */
  val recallGraphDeletedOracle: String = Fixtures.oracle(deletedSearchCtes +
    s""", sexact_dots AS MATERIALIZED (
         SELECT q.vec_id AS qid, d.vec_id,
                ${DotProduct.duckDot("d.embedding", "q.embedding")} AS dot
         FROM embeddings q
         JOIN embeddings d
           ON d.vec_id != q.vec_id AND NOT (${predFor("d.vec_id", AnnIndex.deletedPred)})
         WHERE ${Similarity.queryPred("q.vec_id")}),
       sexact_ranked AS MATERIALIZED (
         SELECT qid, vec_id,
                ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         FROM (SELECT dots.qid, dots.vec_id,
                      dots.dot / (SQRT(qn.norm_sq) * SQRT(vn.norm_sq)) AS cosine
               FROM sexact_dots dots
               JOIN nrm qn ON dots.qid = qn.vec_id
               JOIN nrm vn ON dots.vec_id = vn.vec_id))""" +
    Similarity.candRankedCtes("gd",
      s"SELECT qid, vec_id FROM dvcand$searchRounds WHERE vec_id != qid") +
    """ SELECT e.qid AS query_id,
              CAST(COUNT(l.vec_id) AS BIGINT) AS hits,
              ROUND(COUNT(l.vec_id) / 3.0, 6) AS recall_at_3
       FROM sexact_ranked e
       LEFT JOIN cand_ranked_gd l
         ON l.qid = e.qid AND l.vec_id = e.vec_id AND l.rank <= 3
       WHERE e.rank <= 3
       GROUP BY e.qid""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_graph_build" -> (graphBuild _),
    "sim_ann_graph_search" -> (graphSearch _),
    "sim_ann_recall_graph" -> (recallGraph _),
    "sim_ann_recall_graph_curve" -> (recallGraphCurve _),
    "sim_ann_graph_incremental" -> (graphIncremental _),
    "sim_ann_recall_graph_incremental" -> (recallGraphIncremental _),
    "sim_ann_graph_deleted" -> (graphDeleted _),
    "sim_ann_graph_compacted" -> (graphCompacted _),
    "sim_ann_recall_graph_deleted" -> (recallGraphDeleted _))

  val oracles: Map[String, String] = Map(
    "sim_ann_graph_build" -> graphBuildOracle,
    "sim_ann_graph_search" -> graphSearchOracle,
    "sim_ann_recall_graph" -> recallGraphOracle,
    "sim_ann_recall_graph_curve" -> recallGraphCurveOracle,
    "sim_ann_graph_incremental" -> graphIncrementalOracle,
    "sim_ann_recall_graph_incremental" -> recallGraphIncrementalOracle,
    "sim_ann_graph_deleted" -> graphDeletedOracle,
    // physical removal must not move a single ranked pair vs the mask
    "sim_ann_graph_compacted" -> graphDeletedOracle,
    "sim_ann_recall_graph_deleted" -> recallGraphDeletedOracle)
}
