package graft.queries

import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

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
  *    K. Each round is one self-join + one bounded per-node top-K: the
  *    map-reduce shape the paper itself gives, O(N·K²) candidate pairs per
  *    round — linear in N at fixed degree, no all-pairs step anywhere.
  *    Initialization is the persisted LSH tables (both plane families — a
  *    principled warm start that reuses the index artifacts every other
  *    family serves from) plus a ±3 id-ring that guarantees the seed graph
  *    has no isolated nodes even where LSH buckets are singletons.
  *  - SERVE: beam search over the persisted graph (greedy best-first in
  *    its batch-synchronous form: expand the whole frontier each round,
  *    keep the best `beam` by exact cosine, fixed `searchRounds` rounds) —
  *    per query the work is O(rounds·beam·K) dot products against a graph
  *    that arrives via one broadcast-sized frontier join per round; the
  *    corpus is never scanned.
  *
  * Lifecycle discipline matches [[AnnIndex]]: the first consumer per
  * (session, sfDir) builds ONCE and publishes `graph_edges` under the same
  * delta protocol (staging dir, manifest last, atomic rename); search and
  * recall entries then serve from the parquet artifact — their plans
  * contain no NN-descent operator (GraphAnnSpec pins it).
  *
  * Determinism: scores are the native [[graft.plans.DotProduct]] left-fold
  * divided by exact square roots — the same IEEE-reproducible contract the
  * rest of the similarity family relies on — so the DuckDB oracle replays
  * build and search verbatim, round by unrolled round.
  */
object GraphAnn {

  /** Graph degree K: each node keeps its best 6 neighbors. The recall/cost
    * knob of the family (HNSW's M). */
  private val K = 6

  /** NN-descent refinement rounds after the LSH+ring seed. Two rounds
    * quadruple the effective exploration radius (neighbors-of-neighbors
    * twice); the fixture recall saturates here. */
  private val rounds = 2

  /** Beam width and round count of the serving search. */
  private val beam = 8
  private val searchRounds = 3

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
    * the per-node candidate count (≤ ring + bucket + K + (2K)² rows), never
    * corpus-sized. */
  private def topK(v: DataFrame, cand: DataFrame, k: Int): DataFrame =
    scorePairs(v, cand.distinct())
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("cosine").desc, col("dst"))))
      .filter(col("rn") <= k)

  /** NN-descent over the session corpus; returns (src, dst, cosine, rn). */
  private def buildGraph(spark: SparkSession, sfDir: String): DataFrame = {
    val v = Similarity.vecs(spark, sfDir)
    val idx = AnnIndex.served(spark, sfDir)

    val ring = v.select(col("vec_id").as("src"),
        explode(expr("sequence(-3, 3)")).as("off"))
      .filter(col("off") =!= 0)
      .select(col("src"), (col("src") + col("off")).as("dst"))
      .join(v.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")

    // co-bucket pairs from BOTH persisted LSH plane families, through the
    // shared salt gate (a boilerplate-hot bucket is the same skew story as
    // every band join in the repo)
    def coBucket(bands: DataFrame): DataFrame = {
      val p = graft.util.Salted.pairSelfJoin(bands, "bucket", "vec_id")
      p.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
    }
    val init = ring
      .union(coBucket(idx.bands))
      .union(coBucket(idx.bandsT1.getOrElse(sys.error(
        "graph build needs the multi-table LSH artifact (withT1 index)"))))

    var g = topK(v, init, K)
    for (_ <- 1 to rounds) {
      val und = g.select(col("src"), col("dst"))
        .union(g.select(col("dst").as("src"), col("src").as("dst")))
      val nn = und.as("x").join(und.as("y"),
          col("x.dst") === col("y.src") && col("x.src") =!= col("y.dst"))
        .select(col("x.src").as("src"), col("y.dst").as("dst"))
      g = topK(v, g.select(col("src"), col("dst")).union(nn), K)
    }
    g
  }

  // ------------------------------------------------------------------
  // persistence (AnnIndex delta protocol: staging, manifest last, atomic
  // rename; build-once per session root, artifacts immutable afterwards)

  private val roots = TrieMap.empty[(SparkSession, String), String]

  /** The session's published graph root (spec seam). */
  private[queries] def rootOf(spark: SparkSession, sfDir: String): Option[String] =
    roots.get((spark, sfDir))

  /** The persisted k-NN graph, building + publishing on first touch. */
  private[queries] def graphEdges(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    DotProduct.register(spark)
    val root = roots.getOrElseUpdate((spark, sfDir), {
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
  // entries

  /** The published graph itself: each node's K nearest by cosine after the
    * NN-descent rounds. */
  def graphBuild(spark: SparkSession, sfDir: String): DataFrame =
    graphEdges(spark, sfDir)
      .select(col("src").as("vec_id"), col("dst").as("neighbor_id"),
        col("rn").cast(LongType).as("rank"), round(col("cosine"), 6).as("cosine"))

  /** Beam search over the persisted graph: start every query at the
    * corpus's minimum vec_id (a fixed, artifact-independent entry point —
    * production graphs keep a designated entry like HNSW's top layer),
    * expand the frontier along graph edges for [[searchRounds]] rounds
    * keeping the best [[beam]] by exact cosine, then answer top-3 from
    * everything visited. All per-round frames are O(queries·beam·K). */
  def graphSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = graphEdges(spark, sfDir).select(col("src"), col("dst"))
    val v = Similarity.vecs(spark, sfDir)
    val qv = v.filter(expr(Similarity.queryFilter))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("norm_sq").as("qn"))

    // score a (qid, vec_id) candidate frame: broadcast candidates×queries,
    // probe the vector frame — the same shuffle-free rerank shape as
    // Similarity.rerank
    def score(cand: DataFrame): DataFrame =
      v.join(broadcast(cand.join(qv, Seq("qid"))), Seq("vec_id"))
        .select(col("qid"), col("vec_id"),
          (Similarity.dotExpr("embedding", "qemb") /
            (sqrt(col("qn")) * sqrt(col("norm_sq")))).as("cosine"))

    val entry = v.agg(min(col("vec_id")).as("vec_id")) // 1-row frame
    var frontier = qv.select(col("qid")).crossJoin(entry)
    var visited = frontier
    var scored: DataFrame = null
    for (_ <- 1 to searchRounds) {
      val expand = frontier.as("f").join(edges.as("e"),
          col("f.vec_id") === col("e.src"))
        .select(col("f.qid").as("qid"), col("e.dst").as("vec_id"))
      val cand = visited.union(expand).distinct()
      scored = score(cand)
      frontier = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))))
        .filter(col("rn") <= beam)
        .select(col("qid"), col("vec_id"))
      visited = cand
    }
    scored
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rn") <= 3)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        col("rn").cast(LongType).as("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** Recall@3 of the beam search vs the exact top-3, through the same
    * shared harness as every other index family — the number that prices
    * the graph arm against IVF×PQ / LSH at their published budgets. */
  def recallGraph(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.recallAgainst(
      Similarity.cosineTopK(spark, sfDir).filter(col("rank") <= 3),
      graphSearch(spark, sfDir))

  // ------------------------------------------------------------------
  // oracles — unrolled replay of build + search

  private def mult(i: Int) = graft.plans.LshBucket.multipliers(i)

  /** One scored-candidates → top-K round: cand$i → g$i. */
  private def gRound(i: Int): String =
    s""", sc$i AS (
         SELECT c.src, c.dst,
                ${DotProduct.duckDot("a.embedding", "b.embedding")}
                  / (SQRT(sn.norm_sq) * SQRT(dn.norm_sq)) AS cosine
         FROM cand$i c
         JOIN embeddings a ON a.vec_id = c.src
         JOIN embeddings b ON b.vec_id = c.dst
         JOIN nrm sn ON sn.vec_id = c.src
         JOIN nrm dn ON dn.vec_id = c.dst),
       g$i AS (
         SELECT src, dst, cosine, rn FROM (
           SELECT src, dst, cosine,
                  ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
           FROM sc$i) WHERE rn <= $K)"""

  /** g$i → cand${i+1} (current edges ∪ neighbors-of-neighbors, both
    * directions). */
  private def expandRound(i: Int): String =
    s""", und$i AS (SELECT src, dst FROM g$i UNION SELECT dst, src FROM g$i),
       cand${i + 1} AS (
         SELECT src, dst FROM g$i
         UNION
         SELECT x.src, y.dst FROM und$i x
         JOIN und$i y ON x.dst = y.src AND x.src != y.dst)"""

  /** The full build chain ending in g$rounds. */
  private val buildCtes: String =
    Similarity.elementCtes("embeddings") +
      Similarity.bucketCteFor("gb0", mult(0)) +
      Similarity.bucketCteFor("gb1", mult(1)) +
      Similarity.normCte("embeddings") +
      s""", ring AS (
         SELECT a.vec_id AS src, b.vec_id AS dst
         FROM nrm a JOIN nrm b
           ON b.vec_id BETWEEN a.vec_id - 3 AND a.vec_id + 3
          AND b.vec_id != a.vec_id),
       cand0 AS (
         SELECT src, dst FROM ring
         UNION
         SELECT a.vec_id, b.vec_id FROM gb0 a
         JOIN gb0 b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
         UNION
         SELECT a.vec_id, b.vec_id FROM gb1 a
         JOIN gb1 b ON a.bucket = b.bucket AND a.vec_id != b.vec_id)""" +
      (0 to rounds).map(i =>
        gRound(i) + (if (i < rounds) expandRound(i) else "")).mkString

  val graphBuildOracle: String = Fixtures.oracle(buildCtes +
    s""" SELECT src AS vec_id, dst AS neighbor_id,
              CAST(rn AS BIGINT) AS rank, ROUND(cosine, 6) AS cosine
       FROM g$rounds""")

  /** One search round: f${r-1}/v${r-1} → vcand$r, vsc$r, f$r, v$r. */
  private def searchRound(r: Int): String =
    s""", exp$r AS (
         SELECT f.qid, g.dst AS vec_id
         FROM f${r - 1} f JOIN g$rounds g ON g.src = f.vec_id),
       vcand$r AS (
         SELECT qid, vec_id FROM v${r - 1}
         UNION SELECT qid, vec_id FROM exp$r),
       vsc$r AS (
         SELECT c.qid, c.vec_id,
                ${DotProduct.duckDot("d.embedding", "q.embedding")}
                  / (SQRT(qn.norm_sq) * SQRT(dn.norm_sq)) AS cosine
         FROM vcand$r c
         JOIN embeddings q ON q.vec_id = c.qid
         JOIN embeddings d ON d.vec_id = c.vec_id
         JOIN nrm qn ON qn.vec_id = c.qid
         JOIN nrm dn ON dn.vec_id = c.vec_id),
       f$r AS (
         SELECT qid, vec_id FROM (
           SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
           FROM vsc$r) WHERE rn <= $beam),
       v$r AS (SELECT qid, vec_id FROM vcand$r)"""

  private val searchCtes: String = buildCtes +
    s""", qset AS (SELECT vec_id AS qid FROM nrm WHERE ${Similarity.queryPred("vec_id")}),
       ep AS (SELECT MIN(vec_id) AS vec_id FROM nrm),
       f0 AS (SELECT q.qid, e.vec_id FROM qset q CROSS JOIN ep e),
       v0 AS (SELECT qid, vec_id FROM f0)""" +
    (1 to searchRounds).map(searchRound).mkString

  val graphSearchOracle: String = Fixtures.oracle(searchCtes +
    s""" SELECT qid AS query_id, vec_id AS neighbor_id,
              CAST(rn AS BIGINT) AS rank, ROUND(cosine, 6) AS cosine
       FROM (SELECT qid, vec_id, cosine,
                    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
             FROM vsc$searchRounds WHERE vec_id != qid)
       WHERE rn <= 3""")

  val recallGraphOracle: String = Similarity.recallOracle(searchCtes,
    s"SELECT qid, vec_id FROM vcand$searchRounds WHERE vec_id != qid")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_graph_build" -> (graphBuild _),
    "sim_ann_graph_search" -> (graphSearch _),
    "sim_ann_recall_graph" -> (recallGraph _))

  val oracles: Map[String, String] = Map(
    "sim_ann_graph_build" -> graphBuildOracle,
    "sim_ann_graph_search" -> graphSearchOracle,
    "sim_ann_recall_graph" -> recallGraphOracle)
}
