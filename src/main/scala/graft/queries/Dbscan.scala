package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.plans.DotProduct

/** Density-based clustering (DBSCAN, Ester et al. KDD'96) over the
  * embedding corpus — the curation primitive that finds *shaped* groups
  * (near-dup pockets, template farms, topical blobs) without fixing a
  * cluster count the way the k-means/k-center family does, and that names
  * its leftovers: every vector is exactly one of core / border / noise,
  * and the noise share is itself the data-QA signal.
  *
  * Semantics on cosine space: N(v) = same-IVF-cell vectors u with
  * cos(u,v) ≥ 1/4; v is CORE iff |N(v)| ≥ 3; clusters are the connected
  * components of the core-core ε-graph (labelled by min core vec_id);
  * a non-core vector with a core neighbor is a BORDER of its minimum
  * core-neighbor label; everything else is NOISE (cluster −1). The
  * neighborhood is blocked to the query vector's own IVF cell (the
  * [[Similarity.semanticDedup]] precedent): the quadratic term is bounded
  * by cell size, and the cell count grows as √n (the sqrt-law quantizer),
  * exactly the knob that keeps the blocked ε-graph subquadratic while the
  * full KDD'96 graph would be O(n²) at any threshold. Cells are SERVED
  * from the persisted [[AnnIndex]] assignments artifact — no training
  * operator in this plan.
  *
  * Determinism: the threshold is exact-rational — cos ≥ 1/4 is evaluated
  * as `dot > 0 AND (dot·dot)·16 ≥ na·nb` with both engines running the
  * identical IEEE product chain on the identical strict-left-fold dots
  * ([[graft.plans.DotProduct]]'s contract), so no square root and no
  * rounding ever decides an edge differently. Component labels follow the
  * [[Dedup.clusterComponents]] playbook: Spark iterates min-label
  * propagation to a driver-checked fixpoint (localCheckpoint per round —
  * fresh lineage, flat per-round cost), the oracle computes true reachable
  * minima with one recursive CTE; DbscanSpec additionally replays the
  * whole pipeline driver-side and pins the fixpoint property on the
  * emitted labels.
  *
  * Scale shape: one cell-keyed self-join (cell-size-bounded pairs), one
  * map-side-combined degree count, O(component-diameter) label rounds of
  * one shuffle join each over the CORE-edge frame only (far smaller than
  * the corpus), and two hash joins to classify borders. No corpus-sized
  * broadcast anywhere; the only broadcasts are Catalyst-sized-at-runtime
  * (AQE) or absent.
  */
object Dbscan {

  /** minPts: a vector is core with ≥ this many in-cell ε-neighbors
    * (self excluded — the KDD'96 count includes self; 3-excluding ≡
    * 4-including). */
  private val minNeighbors = 3L

  /** Spec hook: the exact input frame the pipeline clusters —
    * (vec_id, embedding, norm_sq, cell). */
  private[graft] def inputs(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    DotProduct.register(spark)
    Similarity.vecs(spark, sfDir)
      .join(Similarity.ivfAssignments(spark, sfDir), Seq("vec_id"))
      .withColumnRenamed("cluster", "cell")
  }

  /** Same-cell candidate pairs scored once at the weakest curve threshold
    * (cos ≥ 1/8): (va, vb, dot, na, nb), memoized — the verdict filters it
    * to the working 1/4 threshold, the ε-curve to all three rungs. The
    * tighter filter from the prefiltered frame is EXACTLY the set the
    * unfiltered join yields: dot²·64 = 4·(dot²·16) in IEEE (power-of-two
    * scaling is exact), so 1/4-pass implies 1/8-pass with no boundary
    * risk — the oracle keeps its unprefiltered form. */
  private def scoredPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.util.Memo.cached(spark, sfDir, "dbscan_scored") {
      val av = inputs(spark, sfDir)
      av.select($"cell", $"vec_id".as("va"), $"embedding".as("ea"), $"norm_sq".as("na"))
        .join(av.select($"cell", $"vec_id".as("vb"), $"embedding".as("eb"), $"norm_sq".as("nb")),
          Seq("cell"))
        .filter($"va" < $"vb")
        .select($"va", $"vb",
          Similarity.dotExpr("ea", "eb").as("dot"), $"na", $"nb")
        .filter($"dot" > lit(0d) &&
          ($"dot" * $"dot") * lit(64d) >= $"na" * $"nb")
    }
  }

  /** ε-edges (va < vb), degrees, cores, converged labels, border
    * assignment — all memoized as one per-vector frame:
    * (vec_id, role, cluster, n_neighbors). */
  private def clustersFrame(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    DotProduct.register(spark)
    graft.util.Memo.cached(spark, sfDir, "dbscan_clusters") {
      import spark.implicits._
      val av = inputs(spark, sfDir)

      val pairs = scoredPairs(spark, sfDir)
        .filter(($"dot" * $"dot") * lit(16d) >= $"na" * $"nb")
        .select($"va", $"vb")

      // Round-invariant frames are materialized ONCE before the label loop
      // (opt guide §2.4, the pagerank/HITS hoist): un-checkpointed, every
      // propagation round re-executed the degree aggregate + core filter +
      // both core joins from the pair cache — measured 263 s of task
      // runtime across ~2300 tasks for the cold entry, almost all of it
      // this re-derivation × rounds.
      val deg = pairs.select($"va".as("vec_id"))
        .unionByName(pairs.select($"vb".as("vec_id")))
        .groupBy($"vec_id").agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val core = deg.filter($"deg" >= minNeighbors).select($"vec_id")

      // core-core edges, both directions
      val ce = pairs
        .join(core.withColumnRenamed("vec_id", "va"), Seq("va"))
        .join(core.withColumnRenamed("vec_id", "vb"), Seq("vb"))
      val sym = ce.select($"va".as("src"), $"vb".as("dst"))
        .unionByName(ce.select($"vb".as("src"), $"va".as("dst")))
        .localCheckpoint()

      // min-label propagation to a driver-checked fixpoint (the
      // clusterComponents loop: label sums are strictly decreasing until
      // converged, so equality of consecutive sums IS the fixpoint)
      var cur = core.select($"vec_id", $"vec_id".as("label")).localCheckpoint()
      def labelSum(df: DataFrame): Long =
        df.agg(coalesce(sum($"label"), lit(0L))).as[Long].head()
      var prevSum = labelSum(cur)
      var converged = false
      var rounds = 0
      while (!converged && rounds < 20) {
        val next = cur.join(sym, $"vec_id" === $"src")
          .select($"dst".as("vec_id"), $"label")
          .unionByName(cur)
          .groupBy($"vec_id").agg(min($"label").as("label"))
          .localCheckpoint()
        val nextSum = labelSum(next)
        cur = next
        converged = nextSum == prevSum
        prevSum = nextSum
        rounds += 1
      }
      require(converged, s"dbscan labels did not converge in $rounds rounds")
      val labels = cur

      // border: non-core endpoint of an edge whose other endpoint is core
      // → min converged label among its core neighbors
      val badj = pairs
        .join(core.withColumnRenamed("vec_id", "vb"), Seq("vb"))
        .join(core.withColumnRenamed("vec_id", "va"), Seq("va"), "left_anti")
        .select($"va".as("v"), $"vb".as("u"))
        .unionByName(pairs
          .join(core.withColumnRenamed("vec_id", "va"), Seq("va"))
          .join(core.withColumnRenamed("vec_id", "vb"), Seq("vb"), "left_anti")
          .select($"vb".as("v"), $"va".as("u")))
      val border = badj
        .join(labels.select($"vec_id".as("u"), $"label".as("cl")), Seq("u"))
        .groupBy($"v").agg(min($"cl").as("bcluster"))

      av.select($"vec_id")
        .join(labels.withColumnRenamed("label", "ccluster"), Seq("vec_id"), "left")
        .join(border.withColumnRenamed("v", "vec_id"), Seq("vec_id"), "left")
        .join(deg, Seq("vec_id"), "left")
        .select($"vec_id",
          when($"ccluster".isNotNull, "core")
            .when($"bcluster".isNotNull, "border")
            .otherwise("noise").as("role"),
          coalesce($"ccluster", $"bcluster", lit(-1L)).as("cluster"),
          coalesce($"deg", lit(0L)).as("n_neighbors"))
    }
  }

  /** Per-vector DBSCAN verdict: (vec_id, role, cluster, n_neighbors). */
  def clusters(spark: SparkSession, sfDir: String): DataFrame =
    clustersFrame(spark, sfDir)

  /** Per-cluster census (noise rolls up under cluster −1): (cluster,
    * n_total, n_core, n_border) — the shape/leftover report a curation
    * pass reads before deciding what the pockets are. */
  def stats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    clustersFrame(spark, sfDir)
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"role" === "core", 1L).otherwise(0L)).as("n_core"),
        sum(when($"role" === "border", 1L).otherwise(0L)).as("n_border"))
  }

  /** The ε-knob rungs: cos ≥ num/den as (theta_bp, num², den²) for the
    * squared-comparison rule. 1/8 (loose), 1/4 (the working threshold),
    * 3/8 (tight) — the geometric-ish ladder the coreness curve uses:
    * adjacent finer rungs are indistinguishable on a dense fixture. */
  private val curveRungs: Seq[(Long, Double, Double)] =
    Seq((1250L, 1d, 64d), (2500L, 1d, 16d), (3750L, 9d, 64d))

  /** The ε-knob table: per cosine threshold, the blocked ε-graph's edge
    * count and the core/border/noise census — the table a curation pass
    * reads before committing to an ε, like the nprobe/rerank/coreness
    * curves. One memoized scored-pair frame feeds every rung; cluster
    * labels are deliberately not re-derived per rung (the census, not the
    * partition, is the knob signal — and it keeps the oracle recursion-free
    * and cheap). Monotone by construction in edges and cores
    * (DbscanCurveSpec pins it). */
  def curve(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sc = scoredPairs(spark, sfDir)
    val all = inputs(spark, sfDir).select($"vec_id")
    curveRungs.map { case (bp, num, den) =>
      val e = sc.filter(($"dot" * $"dot") * lit(den) >= ($"na" * $"nb") * lit(num))
        .select($"va", $"vb")
      val deg = e.select($"va".as("vec_id"))
        .unionByName(e.select($"vb".as("vec_id")))
        .groupBy($"vec_id").agg(count(lit(1)).as("deg"))
      val core = deg.filter($"deg" >= minNeighbors).select($"vec_id")
      val coreNb = e
        .join(core.withColumnRenamed("vec_id", "vb"), Seq("vb"))
        .select($"va".as("vec_id"))
        .unionByName(e
          .join(core.withColumnRenamed("vec_id", "va"), Seq("va"))
          .select($"vb".as("vec_id")))
        .distinct()
      val roles = all
        .join(core.withColumn("is_core", lit(1L)), Seq("vec_id"), "left")
        .join(coreNb.withColumn("has_core_nb", lit(1L)), Seq("vec_id"), "left")
        .agg(count(lit(1)).as("n_vectors"),
          coalesce(sum($"is_core"), lit(0L)).as("n_core"),
          coalesce(sum(when($"is_core".isNull && $"has_core_nb".isNotNull, 1L)),
            lit(0L)).as("n_border"))
      e.agg(count(lit(1)).as("n_edges")).crossJoin(roles)
        .select(lit(bp).as("theta_bp"), $"n_edges", $"n_core", $"n_border",
          ($"n_vectors" - $"n_core" - $"n_border").as("n_noise"))
    }.reduce(_ unionByName _)
  }

  // ------------------------------------------------------------- oracles

  /** The shared CTE chain: assignments (the IVF quantizer twin), ε-pairs,
    * degrees, cores, the border adjacency. The recursive component part
    * lives in each oracle's inner WITH (DuckDB scopes RECURSIVE to one
    * WITH block). */
  private val dbCtes: String = Similarity.assignmentCtes +
    s""", db_scored AS MATERIALIZED (
         SELECT x.vec_id AS va, y.vec_id AS vb,
                ${DotProduct.duckDot("ea.embedding", "eb.embedding")} AS dot,
                na.norm_sq AS na, nb.norm_sq AS nb
         FROM assignments x
         JOIN assignments y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         JOIN embeddings ea ON x.vec_id = ea.vec_id
         JOIN embeddings eb ON y.vec_id = eb.vec_id
         JOIN nrm na ON x.vec_id = na.vec_id
         JOIN nrm nb ON y.vec_id = nb.vec_id),
       db_pairs AS MATERIALIZED (
         SELECT va, vb FROM db_scored
         WHERE dot > 0 AND (dot * dot) * 16 >= na * nb),
       db_deg AS MATERIALIZED (
         SELECT v, COUNT(1) AS deg
         FROM (SELECT va AS v FROM db_pairs
               UNION ALL SELECT vb AS v FROM db_pairs)
         GROUP BY 1),
       db_core AS MATERIALIZED (SELECT v FROM db_deg WHERE deg >= $minNeighbors),
       db_ce AS MATERIALIZED (
         SELECT p.va AS src, p.vb AS dst
         FROM db_pairs p JOIN db_core a ON p.va = a.v JOIN db_core b ON p.vb = b.v
         UNION ALL
         SELECT p.vb, p.va
         FROM db_pairs p JOIN db_core a ON p.va = a.v JOIN db_core b ON p.vb = b.v),
       db_badj AS MATERIALIZED (
         SELECT p.va AS v, p.vb AS u
         FROM db_pairs p JOIN db_core b ON p.vb = b.v
         LEFT JOIN db_core a ON p.va = a.v WHERE a.v IS NULL
         UNION ALL
         SELECT p.vb, p.va
         FROM db_pairs p JOIN db_core a ON p.va = a.v
         LEFT JOIN db_core b ON p.vb = b.v WHERE b.v IS NULL)"""

  /** Recursive min-label components + border assignment + the final
    * per-vector verdict, as an inner WITH-RECURSIVE subquery. */
  private val verdictSubquery: String =
    s"""(WITH RECURSIVE reach(v, lab) AS (
           SELECT v, v FROM db_core
           UNION
           SELECT e.dst, r.lab FROM db_ce e JOIN reach r ON e.src = r.v),
         comp AS (SELECT v, MIN(lab) AS cl FROM reach GROUP BY v),
         bord AS (
           SELECT j.v, MIN(c.cl) AS cl
           FROM db_badj j JOIN comp c ON j.u = c.v GROUP BY j.v)
         SELECT n.vec_id,
                CASE WHEN c.cl IS NOT NULL THEN 'core'
                     WHEN b.cl IS NOT NULL THEN 'border'
                     ELSE 'noise' END AS role,
                COALESCE(c.cl, b.cl, -1) AS cluster,
                COALESCE(d.deg, 0) AS n_neighbors
         FROM nrm n
         LEFT JOIN comp c ON n.vec_id = c.v
         LEFT JOIN bord b ON n.vec_id = b.v
         LEFT JOIN db_deg d ON n.vec_id = d.v)"""

  val clustersOracle: String = Fixtures.oracle(dbCtes +
    s""" SELECT vec_id, role, CAST(cluster AS BIGINT) AS cluster,
               CAST(n_neighbors AS BIGINT) AS n_neighbors
        FROM $verdictSubquery t""")

  val statsOracle: String = Fixtures.oracle(dbCtes +
    s""" SELECT CAST(cluster AS BIGINT) AS cluster,
               CAST(COUNT(1) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN role = 'core' THEN 1 ELSE 0 END) AS BIGINT) AS n_core,
               CAST(SUM(CASE WHEN role = 'border' THEN 1 ELSE 0 END) AS BIGINT) AS n_border
        FROM $verdictSubquery t GROUP BY cluster""")

  private def rungCtes(tag: String, num: Int, den: Int): String =
    s""", ${tag}_e AS MATERIALIZED (
         SELECT va, vb FROM db_scored
         WHERE dot > 0 AND (dot * dot) * $den >= (na * nb) * $num),
       ${tag}_deg AS MATERIALIZED (
         SELECT v, COUNT(1) AS deg
         FROM (SELECT va AS v FROM ${tag}_e
               UNION ALL SELECT vb AS v FROM ${tag}_e)
         GROUP BY 1),
       ${tag}_core AS MATERIALIZED (SELECT v FROM ${tag}_deg WHERE deg >= $minNeighbors),
       ${tag}_cnb AS MATERIALIZED (
         SELECT DISTINCT v FROM (
           SELECT e.va AS v FROM ${tag}_e e JOIN ${tag}_core c ON e.vb = c.v
           UNION ALL
           SELECT e.vb AS v FROM ${tag}_e e JOIN ${tag}_core c ON e.va = c.v)),
       ${tag}_stats AS (
         SELECT (SELECT COUNT(1) FROM ${tag}_e) AS n_edges,
                (SELECT COUNT(1) FROM ${tag}_core) AS n_core,
                (SELECT COUNT(1) FROM ${tag}_cnb b
                 LEFT JOIN ${tag}_core c ON b.v = c.v
                 WHERE c.v IS NULL) AS n_border,
                (SELECT COUNT(1) FROM nrm) AS n_vec)"""

  private def rungSelect(tag: String, bp: Long): String =
    s"""SELECT CAST($bp AS BIGINT) AS theta_bp,
              CAST(n_edges AS BIGINT) AS n_edges,
              CAST(n_core AS BIGINT) AS n_core,
              CAST(n_border AS BIGINT) AS n_border,
              CAST(n_vec - n_core - n_border AS BIGINT) AS n_noise
       FROM ${tag}_stats"""

  val curveOracle: String = Fixtures.oracle(dbCtes +
    rungCtes("cv1", 1, 64) + rungCtes("cv2", 1, 16) + rungCtes("cv3", 9, 64) +
    " " + Seq(rungSelect("cv1", 1250L), rungSelect("cv2", 2500L),
      rungSelect("cv3", 3750L)).mkString(" UNION ALL "))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_dbscan_clusters" -> (clusters _),
    "sim_dbscan_stats" -> (stats _),
    "sim_dbscan_curve" -> (curve _))

  val oracles: Map[String, String] = Map(
    "sim_dbscan_clusters" -> clustersOracle,
    "sim_dbscan_stats" -> statsOracle,
    "sim_dbscan_curve" -> curveOracle)
}
