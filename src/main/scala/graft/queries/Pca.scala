package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** Distributed principal-component extraction over the embedding corpus —
  * the dimensionality-reduction stage of an embedding pipeline (whitening,
  * compression ahead of PQ, Matryoshka-style truncation diagnostics): the
  * dominant eigenvector of the uncentered second-moment (Gram) matrix
  * G = Σᵥ x xᵀ via power iteration (von Mises & Pollaczek-Geiringer, 1929;
  * the PageRank of linear algebra).
  *
  * Why uncentered: embedding corpora are near-zero-mean by construction
  * (cosine-normalized encoders), and the uncentered second moment is the
  * quantity PQ/IVF residual pipelines actually whiten against.
  *
  * Distribution shape — the part that matters at 100 TB:
  *   - The ONLY corpus-sized pass is the Gram accumulation: a typed
  *     per-partition kernel accumulates the d×d outer-product sum in a
  *     primitive Long array (one 4096-long partial per partition — the
  *     exchange carries d²·partitions rows regardless of corpus size; no
  *     shuffle of raw vectors). See the inline note for why this is the
  *     honest inner loop rather than an exploded-cell HOF pipeline.
  *   - The iteration itself runs on the COLLECTED d²-cell Gram — a
  *     constant-size model table, the same bounded-collect pattern as the
  *     BPE trainer's k-row merge table ([[Bpe]]): 128 rounds over a 64×64
  *     integer matrix is driver arithmetic, not a distributed job, and at
  *     ANY corpus size the collect is 4096 longs.
  *
  * Determinism discipline: the Gram cells are fixed-point integers
  * (floor(xᵢ·xⱼ·10⁹) — two correctly-rounded double products then a floor,
  * bit-identical across engines), so the corpus aggregate is an order-free
  * integer sum; each iteration is an exact BigInt matvec (HUGEINT lanes in
  * the oracle's 128 unrolled CTE rounds — a Long would wrap at n·d·10¹⁵)
  * with L∞ normalization (max-abs, integer compare, truncating division in
  * both engines) instead of an L2 norm — no sqrt, no float accumulation,
  * so all 128 rounds stay bit-identical and the whole operator
  * hash-matches the DuckDB oracle. 128 rounds because the fixture's
  * cluster spectrum is nearly flat (λ₁/λ₂ ≈ 1.02 at sf0.01) — the rounds
  * knob buys convergence at gap⁻¹·log(1/ε) cost, and each round is O(d²).
  *
  * Output per dimension: the eigenvector in 10⁻⁶ fixed point, the
  * eigenvalue estimate (λ ≈ max|G·v| with v normalized to max 1), and λ's
  * share of tr(G) = Σλᵢ in basis points — the explained-variance number a
  * dimensionality decision reads. */
object Pca {

  /** Valid-vector predicate (SQL, shared wording with the oracle): a real
    * crawl's embedding column carries encoder failures — NULLs, truncated
    * rows, NaN/Inf elements, blown-up magnitudes — and every one of them
    * would either crash the kernel (short row), poison the Gram (NaN), or
    * overflow the fixed-point cell (|x| ≥ 10³ ⇒ x²·10⁹ ≥ 10¹⁵ per cell and
    * floor() diverges cross-engine at the Long edge). Same spirit as
    * [[Similarity.vecs]]' norm guard. `d` is inferred from the corpus: the
    * width of the lowest-id non-null vector (deterministic, oracle-
    * mirrored), so the operator follows the corpus schema instead of
    * assuming the driver fixture's 64. */
  private def validPred(d: Int): String =
    s"embedding IS NOT NULL AND size(embedding) = $d AND " +
      // the lambda must be TRUE (never NULL) for a bad element: `x IS
      // NULL` first, because Spark's three-valued `exists` would turn a
      // NULL lambda into a dropped row while DuckDB's list_filter drops
      // the ELEMENT and keeps the row — opposite verdicts on the same
      // vector. |x| < 4: embeddings are unit-normalized (fixture max
      // ~0.5); 4 keeps every fixed-point lane provably in range — Gram
      // cell ≤ 1.6e10 (Long-safe past 5·10⁸ rows/partition, orders beyond
      // any real split), q² ≤ 1.6e13 and q·v ≤ 4e12 (Long-safe to
      // d ≈ 4·10⁵) — where the previous 10³ cap let near-threshold
      // vectors wrap Spark's Long lanes while DuckDB's HUGEINT stayed
      // exact
      "NOT exists(embedding, x -> x IS NULL OR isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) >= 4.0)"

  /** Power-iteration rounds (see convergence note in the scaladoc). */
  private val Rounds = 128

  /** Fixed-point scales: Gram cells 10⁻⁹, eigenvector 10⁻⁶. */
  private val GScale = 1000000000L
  private val VScale = 1000000L

  /** The collected corpus Gram — the one distributed pass, memoized per
    * (session, sfDir) so the power entry, the projection entry, the top-k
    * deflation chain, and the OPQ allocation all consume one accumulation.
    * d = 0 means no valid vectors (empty model). */
  private val gramCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (Int, Array[Array[BigInt]])]()

  private[queries] def gram(spark: SparkSession, sfDir: String): (Int, Array[Array[BigInt]]) =
    gramCache.computeIfAbsent((spark, sfDir), { _ =>
      Fixtures.register(spark, sfDir)
      import spark.implicits._

      // MODAL width, not the lowest-id row's: the first vector could
      // itself be a truncated encoder failure, which would reject the
      // whole healthy corpus; the most frequent width (ties to the
      // smaller) is robust and oracle-mirrorable
      val dOpt = spark.table("embeddings").filter($"embedding".isNotNull)
        .groupBy(size($"embedding").as("w")).count()
        .orderBy($"count".desc, $"w").limit(1)
        .select($"w").as[Int].collect().headOption
      dOpt match {
        case None    => (0, Array.empty[Array[BigInt]])
        case Some(dd) => collectGram(spark, dd)
      }
    })

  /** The Gram diagonal — per-dimension fixed-point second moments, the
    * variance statistic [[Similarity]]'s OPQ-lite subspace allocation
    * consumes (exact integers, so the allocation ordering is
    * oracle-reproducible). */
  private[queries] def gramDiag(spark: SparkSession, sfDir: String): (Int, Array[BigInt]) = {
    val (d, g) = gram(spark, sfDir)
    (d, Array.tabulate(d)(i => g(i)(i)))
  }

  /** Returns (d, v, m, trace) for the dominant component. */
  private def component(spark: SparkSession, sfDir: String): (Int, Array[BigInt], BigInt, BigInt) = {
    val (d, g) = gram(spark, sfDir)
    if (d == 0) return (0, Array.empty[BigInt], BigInt(0), BigInt(0))
    val trace = (0 until d).map(i => g(i)(i)).sum
    val (v, m) = powerIterate(g, d)
    (d, v, m, trace)
  }

  private def collectGram(spark: SparkSession, D: Int): (Int, Array[Array[BigInt]]) = {
      import spark.implicits._

      // Typed per-partition kernel, not an exploded-cell HOF pipeline: the
      // d² nested `transform` lambdas evaluate interpreted PER ELEMENT
      // (measured 5.2 s for 2000×4096 cells at sf0.1 vs ~0.3 s for this
      // loop) — a Gram accumulation is the textbook case for the
      // mapPartitions escape hatch (MLlib's computeGramianMatrix makes the
      // same call). Arithmetic is IDENTICAL: floor(xᵢ·xⱼ·10⁹) per
      // (vector, i, j), summed in Long per partition (the |x| < 4 gate in
      // validPred keeps each cell ≤ 1.6·10¹⁰, Long-safe far beyond any
      // real partition size), one d²-long partial per partition on the
      // wire.
      val gramRows = spark.table("embeddings")
      .filter(expr(validPred(D)))
      .select($"embedding").as[Seq[Float]]
      .mapPartitions { it =>
        var seen = false
        val acc = new Array[Long](D * D)
        it.foreach { e =>
          seen = true
          var i = 0
          while (i < D) {
            val xi = e(i).toDouble
            var j = 0
            while (j < D) {
              acc(i * D + j) += math.floor(xi * e(j).toDouble * GScale.toDouble).toLong
              j += 1
            }
            i += 1
          }
        }
        // an empty partition contributes NOTHING (not a zero partial):
        // with no valid vectors anywhere the collected Gram must be EMPTY
        // so the model is empty like the oracle's empty CTE chain — d rows
        // of zeros here vs 0 oracle rows was a differential break
        if (seen) Iterator.single(acc) else Iterator.empty
      }
      // DECIMAL(38,0) lanes for the cross-partition merge, not SUM(BIGINT):
      // a Long total wraps at ~3.7·10¹⁰ vectors while DuckDB's SUM is
      // already HUGEINT — the same silent-wrap divergence class the NB
      // classifier guards against
      .toDF("acc").select(posexplode($"acc")).toDF("idx", "q")
      .groupBy($"idx")
      .agg(sum($"q".cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("g"))
      .as[(Int, java.math.BigDecimal)].collect() // bounded: exactly d² = 4096 rows

    if (gramRows.isEmpty) return (0, Array.empty[Array[BigInt]])
    val g = Array.ofDim[BigInt](D, D)
    gramRows.foreach { case (idx, q) => g(idx / D)(idx % D) = BigInt(q.toBigInteger) }
    (D, g)
  }

  /** Exact integer power rounds over a collected Gram: matvec, L∞
    * normalization (max-abs, truncating division in both engines). */
  private def powerIterate(g: Array[Array[BigInt]], D: Int,
      rounds: Int = Rounds): (Array[BigInt], BigInt) = {
    var v = Array.fill(D)(BigInt(VScale))
    var m = BigInt(0)
    var round = 0
    while (round < rounds && (round == 0 || m != 0)) {
      val w = Array.tabulate(D)(i =>
        (0 until D).map(j => g(i)(j) * v(j)).sum)
      m = w.map(_.abs).max
      // degenerate all-zero Gram (only zero vectors survive the filter):
      // converge to the zero model instead of dividing by zero — the
      // oracle's CASE m = 0 guard mirrors this fixpoint exactly
      v = if (m == 0) Array.fill(D)(BigInt(0))
          else w.map(wi => (wi * VScale) / m) // BigInt `/` truncates toward zero — the DIV / HUGEINT // contract
      round += 1
    }
    (v, m)
  }

  /** Hotelling deflation in the SAME fixed-point scale, exact and
    * HUGEINT-safe: with num = vᵀGv and den = vᵀv, the deflated matrix is
    * G' = G − λ·vvᵀ/den (λ = num/den) computed as two truncating integer
    * steps — t_i = (num·v_i) div den, then G'_ij = G_ij − (t_i·v_j) div
    * den — so every intermediate stays below ~10³⁷ (inside the oracle's
    * HUGEINT lanes; a single-step num·v_i·v_j product would overflow
    * them). The two per-cell truncations are the identical arithmetic in
    * both engines, so the deflated matrix — and every later component —
    * is bit-exact cross-engine; the ~1-ulp deflation residue only
    * perturbs WHICH matrix both engines iterate, never their agreement. */
  private def deflate(g: Array[Array[BigInt]], v: Array[BigInt], D: Int): Array[Array[BigInt]] = {
    val den = v.map(x => x * x).sum
    if (den == 0) return g // zero component: nothing to remove
    val num = (0 until D).map(i =>
      v(i) * (0 until D).map(j => g(i)(j) * v(j)).sum).sum
    val t = Array.tabulate(D)(i => (num * v(i)) / den)
    Array.tabulate(D, D)((i, j) => g(i)(j) - (t(i) * v(j)) / den)
  }

  /** Top-k components by repeated power-iteration + deflation. Returns
    * (d, trace, per-component (v, m)). Deflated components run fewer
    * rounds ([[TopkRounds]]) than the dominant one: the unrolled oracle
    * chain for k components otherwise exceeds DuckDB's binder depth limit
    * (max_expression_depth 1000 at k×128×3 chained CTEs). Both engines
    * run the identical round counts, so the contract is unchanged —
    * rounds are a knob, the gate pins whatever they compute. */
  private val topkK = 3
  private val TopkRounds = 48
  private def components(spark: SparkSession, sfDir: String): (Int, BigInt, Seq[(Array[BigInt], BigInt)]) = {
    val (d, g0) = gram(spark, sfDir)
    if (d == 0) return (0, BigInt(0), Seq.empty)
    val trace = (0 until d).map(i => g0(i)(i)).sum
    var g = g0
    val out = Seq.newBuilder[(Array[BigInt], BigInt)]
    for (c <- 1 to topkK) {
      val (v, m) = powerIterate(g, d, if (c == 1) Rounds else TopkRounds)
      out += ((v, m))
      if (c < topkK) g = deflate(g, v, d)
    }
    (d, trace, out.result())
  }

  /** Distributed Gram accumulation, then 128 exact integer
    * power-iteration rounds on the collected constant-size matrix. */
  def pcaPower(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val (d, v, m, trace) = component(spark, sfDir)
    val lambdaE6 = (m / GScale).toLong
    val shareBp =
      if (trace == 0) 0L else ((m * 10000) / (trace * VScale)).toLong
    (0 until d).map(i => (i.toLong, v(i).toLong, lambdaE6, shareBp))
      .toDF("dim", "v_e6", "lambda_e6", "var_share_bp")
  }

  /** Apply the component: per-vector projection onto the trained
    * direction — the whitening / "how much does PC1 explain this vector"
    * diagnostic an embedding pipeline runs corpus-wide after training the
    * model (same train-once/apply-many split as classifier_nb_train/score
    * and the AnnIndex persisted lifecycle).
    *
    * Scale shape: the component is a 64-long literal folded into a
    * codegen'd higher-order aggregate — pure scan-side projection, NO
    * join, NO shuffle (the model rides the plan the way
    * text_classifier_score's hash weights do). Arithmetic: the vector is
    * quantized to 10⁻⁶ fixed point (floor — deterministic), the projection
    * is an exact integer dot with v_e6, and the explained-share
    * proj²·10⁴ / (‖x‖²·‖v‖²) runs in DECIMAL(38,0)/HUGEINT lanes. */
  def pcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val (d, v, _, _) = component(spark, sfDir)
    val base = spark.table("embeddings")
    if (d == 0)
      // no vectors at all: empty result with the stable schema
      return base.limit(0).select($"vec_id", $"label".cast("bigint").as("label"),
        lit(0L).as("proj_e12"), lit(0L).as("share_bp"))
    val vLit = v.map(_.toLong).mkString("array(", "L, ", "L)")
    val vNormSq = v.map(x => x * x).sum.toLong

    val q = s"CAST(floor(CAST(element_at(embedding, i + 1) AS DOUBLE) * ${VScale}.0) AS BIGINT)"
    base
      .filter(expr(validPred(d)))
      .select($"vec_id", $"label".cast("bigint").as("label"),
        expr(s"aggregate(sequence(0, ${d - 1}), CAST(0 AS BIGINT), " +
          s"(acc, i) -> acc + $q * element_at($vLit, i + 1))").as("proj_e12"),
        expr(s"aggregate(sequence(0, ${d - 1}), CAST(0 AS BIGINT), " +
          s"(acc, i) -> acc + $q * $q)").as("norm_q"))
      .select($"vec_id", $"label", $"proj_e12",
        // a degenerate zero component (all-zero Gram) scores share 0 for
        // every vector — guarded driver-side since vNormSq is a constant
        (if (vNormSq == 0) expr("CAST(0 AS BIGINT)")
         else expr("CASE WHEN norm_q = 0 THEN CAST(0 AS BIGINT) ELSE " +
           "CAST((CAST(proj_e12 AS DECIMAL(38,0)) * proj_e12 * 10000) " +
           s"DIV (CAST(norm_q AS DECIMAL(38,0)) * $vNormSq) AS BIGINT) END")).as("share_bp"))
  }

  /** One unrolled oracle iteration `prev → next` over gram CTE `gramCte`
    * with name prefix `prefix`, mirroring the integer matvec + L∞
    * normalization (HUGEINT lanes). */
  private def iterCteFor(prefix: String, gramCte: String)(n: Int): String = {
    val (prev, cur) = (s"${prefix}v${n - 1}", s"${prefix}v$n")
    s""", ${prefix}w$n AS MATERIALIZED (
         SELECT g.i, SUM(CAST(g.g AS HUGEINT) * v.v) AS w
         FROM $gramCte g JOIN $prev v ON g.j = v.i GROUP BY 1),
       ${prefix}m$n AS MATERIALIZED (SELECT MAX(ABS(w)) AS m FROM ${prefix}w$n),
       $cur AS MATERIALIZED (
         SELECT w.i, CASE WHEN m.m = 0 THEN CAST(0 AS HUGEINT)
                          ELSE (w.w * $VScale) // m.m END AS v
         FROM ${prefix}w$n w CROSS JOIN ${prefix}m$n m)"""
  }

  private def iterCte(n: Int): String = iterCteFor("pca_", "pca_gram")(n)

  /** Oracle twin of [[deflate]]: the two-step truncating Hotelling update
    * producing `$out` from `$gramCte` and `$prefix`'s converged vector
    * (`${prefix}v$prevRounds`) — exact same intermediate magnitudes, so
    * every lane stays inside HUGEINT. The den = 0 (zero component) guard
    * mirrors the Scala early-return. */
  private def deflateCtes(prefix: String, prevRounds: Int, gramCte: String,
      out: String): String =
    s""", ${out}_den AS MATERIALIZED (
         SELECT SUM(v * v) AS den FROM ${prefix}v$prevRounds),
       ${out}_num AS MATERIALIZED (
         SELECT SUM(CAST(g.g AS HUGEINT) * vi.v * vj.v) AS num
         FROM $gramCte g
         JOIN ${prefix}v$prevRounds vi ON g.i = vi.i
         JOIN ${prefix}v$prevRounds vj ON g.j = vj.i),
       ${out}_t AS MATERIALIZED (
         SELECT vi.i,
                CASE WHEN d.den = 0 THEN CAST(0 AS HUGEINT)
                     ELSE (n.num * vi.v) // d.den END AS t
         FROM ${prefix}v$prevRounds vi
         CROSS JOIN ${out}_num n CROSS JOIN ${out}_den d),
       $out AS MATERIALIZED (
         SELECT g.i, g.j,
                CAST(g.g AS HUGEINT) -
                CASE WHEN d.den = 0 THEN CAST(0 AS HUGEINT)
                     ELSE (t.t * vj.v) // d.den END AS g
         FROM $gramCte g
         JOIN ${out}_t t ON g.i = t.i
         JOIN ${prefix}v$prevRounds vj ON g.j = vj.i
         CROSS JOIN ${out}_den d)"""

  /** The Gram-accumulation half of the oracle chain (valid-vector filter,
    * fixed-point cells, `pca_gram`, `pca_trace`) — shared by the power/
    * projection/top-k oracles AND [[Similarity]]'s OPQ allocation oracle,
    * which consumes only the diagonal. */
  private[queries] def pcaGramCtes: String =
    s""", pca_d AS (SELECT len(embedding) AS d FROM embeddings
                    WHERE embedding IS NOT NULL
                    GROUP BY 1 ORDER BY COUNT(1) DESC, d LIMIT 1),
       pca_valid AS (
         SELECT e.vec_id, e.label, e.embedding
         FROM embeddings e, pca_d
         WHERE e.embedding IS NOT NULL AND len(e.embedding) = pca_d.d
           AND len(list_filter(e.embedding,
                 x -> x IS NULL OR isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) >= 4.0)) = 0),
       pca_cells AS (
         SELECT CAST(ti.i AS INT) AS i, CAST(tj.j AS INT) AS j,
                CAST(FLOOR((CAST(e.embedding[ti.i + 1] AS DOUBLE)
                            * CAST(e.embedding[tj.j + 1] AS DOUBLE)) * ${GScale}.0) AS BIGINT) AS q
         FROM pca_valid e, pca_d, UNNEST(range(pca_d.d)) AS ti(i), UNNEST(range(pca_d.d)) AS tj(j)),
       pca_gram AS MATERIALIZED (SELECT i, j, SUM(q) AS g FROM pca_cells GROUP BY 1, 2),
       pca_trace AS (SELECT SUM(g) AS trace FROM pca_gram WHERE i = j)"""

  /** Shared oracle chain ending at `pca_v$Rounds` / `pca_m$Rounds` /
    * `pca_trace` — ONE definition feeds both the power and the projection
    * oracle, so an edit to the iteration cannot desync them. */
  private def pcaChainCtes: String =
    pcaGramCtes +
      s""",
       pca_v0 AS (SELECT CAST(t.i AS INT) AS i, CAST($VScale AS HUGEINT) AS v
                  FROM pca_d, UNNEST(range(pca_d.d)) AS t(i))""" +
      (1 to Rounds).map(iterCte).mkString("\n")

  /** Component (prefix, rounds) pairs of the top-k oracle chain:
    * component 1 reuses the `pca_` chain verbatim; deflated components
    * get their own prefix and the shorter [[TopkRounds]] unroll. */
  private val topkPrefixes: Seq[(String, Int)] =
    (Seq(("pca_", Rounds)) ++ Seq(("pcb_", TopkRounds), ("pcc_", TopkRounds)))
      .take(topkK)

  /** Full top-k chain: component 1's converged vector, then per further
    * component a deflation + a fresh unroll over the deflated gram. */
  private def topkChainCtes: String =
    pcaChainCtes + topkPrefixes.sliding(2).collect {
      case Seq((prev, prevRounds), (cur, curRounds)) =>
        val prevGram = if (prev == "pca_") "pca_gram" else s"${prev}gram"
        deflateCtes(prev, prevRounds, prevGram, s"${cur}gram") +
          s""",
           ${cur}v0 AS (SELECT i, v FROM pca_v0)""" +
          (1 to curRounds).map(iterCteFor(cur, s"${cur}gram")).mkString("\n")
    }.mkString

  /** Top-k principal components by power iteration + exact Hotelling
    * deflation (the r11 "PCA stops at one component" gap): component c+1
    * is the dominant eigenvector of the deflated Gram G − λvvᵀ/(vᵀv),
    * computed in the same fixed-point integer lanes ([[deflate]]'s
    * two-step truncation keeps every oracle intermediate inside HUGEINT).
    * Output: (comp, dim, v_e6, lambda_e6, var_share_bp) — the top-k
    * spectrum a truncation/whitening decision reads (shares against the
    * ORIGINAL trace, so they are comparable across components and sum
    * toward the explained-variance budget). Distribution shape: the only
    * corpus pass is the one shared Gram accumulation ([[gram]]); the
    * k×128 rounds are driver arithmetic on the collected 64×64 matrix. */
  def pcaTopk(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val (d, trace, comps) = components(spark, sfDir)
    comps.zipWithIndex.flatMap { case ((v, m), c) =>
      val lambdaE6 = (m / GScale).toLong
      val shareBp = if (trace == 0) 0L else ((m * 10000) / (trace * VScale)).toLong
      (0 until d).map(i => ((c + 1).toLong, i.toLong, v(i).toLong, lambdaE6, shareBp))
    }.toDF("comp", "dim", "v_e6", "lambda_e6", "var_share_bp")
  }

  /** Per-vector projections onto the top-k subspace — the compression/
    * truncation payload ([[pcaProject]] generalized to k components): one
    * scan, k codegen'd integer-dot aggregates per row, exploded to
    * (vec_id, label, comp, proj_e12). No join, no shuffle: the k
    * component vectors ride the plan as literals. */
  def pcaTopkProject(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val (d, _, comps) = components(spark, sfDir)
    val base = spark.table("embeddings")
    if (d == 0)
      return base.limit(0).select($"vec_id", $"label".cast("bigint").as("label"),
        lit(0L).as("comp"), lit(0L).as("proj_e12"))
    val q = s"CAST(floor(CAST(element_at(embedding, i + 1) AS DOUBLE) * ${VScale}.0) AS BIGINT)"
    val arms = comps.zipWithIndex.map { case ((v, _), c) =>
      val vLit = v.map(_.toLong).mkString("array(", "L, ", "L)")
      expr(s"named_struct('comp', CAST(${c + 1} AS BIGINT), " +
        s"'proj_e12', aggregate(sequence(0, ${d - 1}), CAST(0 AS BIGINT), " +
        s"(acc, i) -> acc + $q * element_at($vLit, i + 1)))")
    }
    base
      .filter(expr(validPred(d)))
      .select($"vec_id", $"label".cast("bigint").as("label"),
        explode(array(arms: _*)).as("p"))
      .select($"vec_id", $"label", $"p.comp".as("comp"), $"p.proj_e12".as("proj_e12"))
  }

  val pcaTopkOracle: String = {
    val arms = topkPrefixes.zipWithIndex.map { case ((p, r), c) =>
      s"""SELECT CAST(${c + 1} AS BIGINT) AS comp, CAST(v.i AS BIGINT) AS dim,
             CAST(v.v AS BIGINT) AS v_e6,
             CAST(m.m // $GScale AS BIGINT) AS lambda_e6,
             CASE WHEN t.trace = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST((m.m * 10000) // (CAST(t.trace AS HUGEINT) * $VScale) AS BIGINT) END
               AS var_share_bp
          FROM ${p}v$r v
          CROSS JOIN ${p}m$r m
          CROSS JOIN pca_trace t"""
    }.mkString(" UNION ALL ")
    Fixtures.oracle(topkChainCtes + "\n" + arms)
  }

  val pcaTopkProjectOracle: String = {
    val arms = topkPrefixes.zipWithIndex.map { case ((p, r), c) =>
      s"""SELECT vec_id, label, CAST(${c + 1} AS BIGINT) AS comp,
             CAST(SUM(q * v) AS BIGINT) AS proj_e12
          FROM (SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
                       CAST(FLOOR(CAST(e.embedding[t.i + 1] AS DOUBLE) * ${VScale}.0) AS BIGINT) AS q,
                       v.v
                FROM pca_valid e, pca_d, UNNEST(range(pca_d.d)) AS t(i)
                JOIN ${p}v$r v ON v.i = t.i)
          GROUP BY 1, 2"""
    }.mkString(" UNION ALL ")
    Fixtures.oracle(topkChainCtes + "\n" + arms)
  }

  val pcaPowerOracle: String = Fixtures.oracle(pcaChainCtes +
    s"""
       SELECT CAST(v.i AS BIGINT) AS dim, CAST(v.v AS BIGINT) AS v_e6,
              CAST(m.m // $GScale AS BIGINT) AS lambda_e6,
              CASE WHEN t.trace = 0 THEN CAST(0 AS BIGINT)
                   ELSE CAST((m.m * 10000) // (CAST(t.trace AS HUGEINT) * $VScale) AS BIGINT) END
                AS var_share_bp
       FROM pca_v$Rounds v
       CROSS JOIN pca_m$Rounds m
       CROSS JOIN pca_trace t""")

  val pcaProjectOracle: String = Fixtures.oracle(pcaChainCtes +
    s""",
       pca_q AS (
         SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, v.i,
                CAST(FLOOR(CAST(e.embedding[t.i + 1] AS DOUBLE) * ${VScale}.0) AS BIGINT) AS q,
                v.v
         FROM pca_valid e, pca_d, UNNEST(range(pca_d.d)) AS t(i)
         JOIN pca_v$Rounds v ON v.i = t.i),
       pca_proj AS (
         SELECT vec_id, label,
                CAST(SUM(q * v) AS BIGINT) AS proj_e12,
                CAST(SUM(q * q) AS BIGINT) AS norm_q
         FROM pca_q GROUP BY 1, 2),
       pca_vn AS (SELECT SUM(v * v) AS vn FROM pca_v$Rounds)
       SELECT p.vec_id, p.label, p.proj_e12,
              CASE WHEN p.norm_q = 0 OR n.vn = 0 THEN 0
                   ELSE CAST((CAST(p.proj_e12 AS HUGEINT) * p.proj_e12 * 10000)
                             // (CAST(p.norm_q AS HUGEINT) * n.vn) AS BIGINT) END
                AS share_bp
       FROM pca_proj p CROSS JOIN pca_vn n""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_pca_power" -> (pcaPower _),
    "embedding_pca_project" -> (pcaProject _),
    "embedding_pca_topk" -> (pcaTopk _),
    "embedding_pca_topk_project" -> (pcaTopkProject _))

  val oracles: Map[String, String] = Map(
    "embedding_pca_power" -> pcaPowerOracle,
    "embedding_pca_project" -> pcaProjectOracle,
    "embedding_pca_topk" -> pcaTopkOracle,
    "embedding_pca_topk_project" -> pcaTopkProjectOracle)
}
