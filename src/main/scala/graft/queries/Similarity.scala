package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Three paths:
  *  - brute-force cosine top-k — the exact baseline; at scale this is the
  *    per-partition score+local-top-k / global-top-k pattern;
  *  - random-hyperplane LSH buckets → candidate generation → exact re-rank —
  *    the scale path: the expensive pairing is replaced by an equi-join on
  *    the bucket id, shrinking candidates by ~2^planes;
  *  - IVF-style coarse quantization → probe own cell → exact re-rank.
  *
  * Every dot product / norm / hyperplane projection is ONE codegen'd
  * `aggregate(...)` fold over the vector arrays — never a posexplode into
  * 64 element rows joined on (vec_id, idx) (that paid a 64× row blow-up plus
  * a shuffle per dot; flagged in rounds 1-3). Folds accumulate per-element
  * double products cast to DECIMAL(38,12) and sum exactly, so an index-order
  * fold equals the oracle's order-independent decimal SUM bit-for-bit. The
  * LSH planes are integer-valued (pseudo-random from plane/dim index
  * arithmetic), so bucket ids are exact integers and the whole ANN path is
  * oracle-checkable.
  */
object Similarity {

  private val dec3812 = DecimalType(38, 12)

  /** Queries = every 50th vector. */
  private val queryFilter = "vec_id % 50 = 0"

  /** Exact decimal dot product of two array columns: one codegen'd
    * `aggregate(zip_with(...))` fold per pair — no element explosion, no
    * pre-aggregation shuffle. The merge result must be cast back: Spark
    * types (38,12)+(38,12) as (38,11), which would not match the
    * accumulator type. */
  private def dotExpr(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, " +
      "(x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,12))), " +
      "CAST(0 AS DECIMAL(38,12)), (acc, v) -> CAST(acc + v AS DECIMAL(38,12)))")

  /** Exact decimal squared norm of an array column (same fold). */
  private def normSqExpr(a: String): Column = expr(
    s"aggregate($a, CAST(0 AS DECIMAL(38,12)), (acc, x) -> " +
      "CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12)) AS DECIMAL(38,12)))")

  /** 12-plane random-hyperplane LSH bucket id as ONE nested fold per vector:
    * the outer fold walks planes p=0..11, the inner fold computes the exact
    * decimal projection against plane weights w(p,j) = ((p*37 + j*13) % 19)
    * - 9; sign bits pack into a 12-bit bucket. Zero joins, zero shuffles —
    * a pure projection over the scan. */
  private def bucketExpr(emb: String): Column = expr(
    s"""aggregate(sequence(0, 11), CAST(0 AS BIGINT), (acc, p) -> acc +
          IF(aggregate(sequence(0, size($emb) - 1), CAST(0 AS DECIMAL(38,12)), (a, j) ->
               CAST(a + CAST(CAST((p * 37 + j * 13) % 19 - 9 AS DOUBLE)
                             * CAST($emb[j] AS DOUBLE) AS DECIMAL(38,12)) AS DECIMAL(38,12)))
             >= 0, SHIFTLEFT(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT)))""")

  /** (vec_id, embedding, norm_sq) — one scan-side projection, memoized
    * because every similarity query consumes it. */
  private def vecs(spark: SparkSession, sfDir: String, table: String = "embeddings"): DataFrame =
    graft.util.Memo.cached(spark, sfDir, s"sim_vecs_$table") {
      spark.table(table).select(col("vec_id"), col("embedding"),
        normSqExpr("embedding").as("norm_sq"))
    }

  /** LSH bucket per vector — shared by ANN + near-dup. */
  private def lshBuckets(spark: SparkSession, sfDir: String, table: String = "embeddings"): DataFrame =
    graft.util.Memo.cached(spark, sfDir, s"sim_buckets_$table") {
      spark.table(table).select(col("vec_id"), bucketExpr("embedding").as("bucket"))
    }

  private def cosineCol: Column =
    col("dot").cast(DoubleType) /
      (sqrt(col("qn").cast(DoubleType)) * sqrt(col("norm_sq").cast(DoubleType)))

  /** Exact re-rank of (qid, vec_id) candidate pairs: broadcast the
    * (candidates ⋈ query vectors) side — query vectors are 1/50th of the
    * corpus and candidates are bucket-bounded — and probe the full vector
    * set without a shuffle; one fold per pair, then top-k per query. */
  private def rerank(v: DataFrame, qv: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val scored = v
      .join(broadcast(candidates.join(qv, Seq("qid"))), Seq("vec_id"))
      .select(col("qid"), col("vec_id"),
        dotExpr("embedding", "qemb").as("dot"), col("qn"), col("norm_sq"))
      .withColumn("cosine", cosineCol)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast(LongType).as("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** Exact cosine top-5 neighbors for each query vector. */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val v = vecs(spark, sfDir)
    val qv = v.filter(expr(queryFilter))
      .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"norm_sq".as("qn"))

    val scored = v.crossJoin(broadcast(qv))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id", dotExpr("embedding", "qemb").as("dot"), $"qn", $"norm_sq")
      .withColumn("cosine", cosineCol)

    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"qid".as("query_id"), $"vec_id".as("neighbor_id"),
        $"rank".cast(LongType).as("rank"), round($"cosine", 6).as("cosine"))
  }

  /** Shared oracle CTEs over `table`: exploded elements, norms. (The oracle
    * side stays exploded — DuckDB has no zip_with fold; decimal SUM over
    * elements is order-independent and equals the Spark-side fold.) */
  private def elementCtes(table: String): String =
    s""", el AS (
         SELECT e.vec_id, CAST(t.i AS INT) AS idx,
                CAST(e.embedding[t.i + 1] AS DOUBLE) AS v
         FROM $table e, UNNEST(range(len(e.embedding))) AS t(i)),
       nrm AS (
         SELECT vec_id, SUM(CAST(v * v AS DECIMAL(38,12))) AS norm_sq
         FROM el GROUP BY vec_id)"""

  private val bucketCte: String =
    """, buckets AS (
         SELECT vec_id,
                SUM(CASE WHEN proj >= 0 THEN CAST(POWER(2.0, CAST(p AS DOUBLE)) AS BIGINT) ELSE 0 END) AS bucket
         FROM (
           SELECT el.vec_id, CAST(t.p AS INT) AS p,
                  SUM(CAST(CAST((t.p * 37 + el.idx * 13) % 19 - 9 AS DOUBLE) * el.v AS DECIMAL(38,12))) AS proj
           FROM el, UNNEST(range(12)) AS t(p)
           GROUP BY 1, 2) pr
         GROUP BY vec_id)"""

  val cosineTopKOracle: String = Fixtures.oracle(
    elementCtes("embeddings") +
      s""", dots AS (
         SELECT q.vec_id AS qid, d.vec_id, SUM(CAST(q.v * d.v AS DECIMAL(38,12))) AS dot
         FROM el q JOIN el d ON q.idx = d.idx AND d.vec_id != q.vec_id
         WHERE q.$queryFilter
         GROUP BY 1, 2),
       scored AS (
         SELECT dots.qid, dots.vec_id,
                CAST(dots.dot AS DOUBLE)
                  / (SQRT(CAST(qn.norm_sq AS DOUBLE)) * SQRT(CAST(vn.norm_sq AS DOUBLE))) AS cosine
         FROM dots
         JOIN nrm qn ON dots.qid = qn.vec_id
         JOIN nrm vn ON dots.vec_id = vn.vec_id),
       ranked AS (
         SELECT qid, vec_id, cosine,
                ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         FROM scored)
       SELECT qid AS query_id, vec_id AS neighbor_id,
              CAST(rank AS BIGINT) AS rank, ROUND(cosine, 6) AS cosine
       FROM ranked WHERE rank <= 5""")

  /** LSH-bucketed ANN: 12 integer hyperplanes → sign-bit bucket id, then
    * exact cosine re-rank within the bucket, top-3 per query. */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val v = vecs(spark, sfDir)
    val buckets = lshBuckets(spark, sfDir)

    val qb = buckets.filter(expr(queryFilter))
      .select($"vec_id".as("qid"), $"bucket")
    val candidates = qb.join(buckets, Seq("bucket"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id")

    val qv = v.filter(expr(queryFilter))
      .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"norm_sq".as("qn"))
    rerank(v, qv, candidates, 3)
  }

  val annLshOracle: String = Fixtures.oracle(
    elementCtes("embeddings") + bucketCte +
      s""", candidates AS (
         SELECT q.vec_id AS qid, b.vec_id
         FROM buckets q JOIN buckets b ON q.bucket = b.bucket AND b.vec_id != q.vec_id
         WHERE q.$queryFilter),
       dots AS (
         SELECT c.qid, c.vec_id, SUM(CAST(q.v * d.v AS DECIMAL(38,12))) AS dot
         FROM candidates c
         JOIN el q ON q.vec_id = c.qid
         JOIN el d ON d.vec_id = c.vec_id AND d.idx = q.idx
         GROUP BY 1, 2),
       scored AS (
         SELECT dots.qid, dots.vec_id,
                CAST(dots.dot AS DOUBLE)
                  / (SQRT(CAST(qn.norm_sq AS DOUBLE)) * SQRT(CAST(vn.norm_sq AS DOUBLE))) AS cosine
         FROM dots
         JOIN nrm qn ON dots.qid = qn.vec_id
         JOIN nrm vn ON dots.vec_id = vn.vec_id),
       ranked AS (
         SELECT qid, vec_id, cosine,
                ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         FROM scored)
       SELECT qid AS query_id, vec_id AS neighbor_id,
              CAST(rank AS BIGINT) AS rank, ROUND(cosine, 6) AS cosine
       FROM ranked WHERE rank <= 3""")

  /** Embedding-cosine near-duplicate pairs: same LSH bucketing as [[annLsh]]
    * but symmetric (a < b) with a 0.99 cosine threshold — the embedding
    * counterpart of MinHash near-dup detection. Reads `embeddings_aug` (the
    * corpus plus a deterministic duplicated vector, Fixtures) because the
    * raw corpus contains no ≥0.99 pair at any sf — the threshold branch was
    * never exercised in rounds 1-3. Both sides stay candidate-pair-sized:
    * two equi-joins pulling each pair's arrays, then one fold per pair. */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val v = vecs(spark, sfDir, "embeddings_aug")
    val buckets = lshBuckets(spark, sfDir, "embeddings_aug")

    val pairs = buckets.as("a").join(buckets.as("b"),
        $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("va"), $"b.vec_id".as("vb"))

    v.select($"vec_id".as("va"), $"embedding".as("aemb"), $"norm_sq".as("na"))
      .join(pairs, Seq("va"))
      .join(v.select($"vec_id".as("vb"), $"embedding".as("bemb"), $"norm_sq".as("nb")), Seq("vb"))
      .select($"va", $"vb", dotExpr("aemb", "bemb").as("dot"), $"na", $"nb")
      .withColumn("cosine", $"dot".cast(DoubleType) /
        (sqrt($"na".cast(DoubleType)) * sqrt($"nb".cast(DoubleType))))
      .filter($"cosine" >= 0.99)
      .select($"va".as("vec_a"), $"vb".as("vec_b"), round($"cosine", 6).as("cosine"))
  }

  val embeddingNearDupOracle: String = Fixtures.oracle(
    elementCtes("embeddings_aug") + bucketCte +
      """, pairs AS (
         SELECT a.vec_id AS va, b.vec_id AS vb
         FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       dots AS (
         SELECT p.va, p.vb, SUM(CAST(x.v * y.v AS DECIMAL(38,12))) AS dot
         FROM pairs p
         JOIN el x ON x.vec_id = p.va
         JOIN el y ON y.vec_id = p.vb AND y.idx = x.idx
         GROUP BY 1, 2),
       scored AS (
         SELECT dots.va, dots.vb,
                CAST(dots.dot AS DOUBLE)
                  / (SQRT(CAST(na.norm_sq AS DOUBLE)) * SQRT(CAST(nb.norm_sq AS DOUBLE))) AS cosine
         FROM dots
         JOIN nrm na ON dots.va = na.vec_id
         JOIN nrm nb ON dots.vb = nb.vec_id)
       SELECT va AS vec_a, vb AS vec_b, ROUND(cosine, 6) AS cosine
       FROM scored WHERE cosine >= 0.99""")

  /** IVF-style ANN: a deterministic coarse quantizer (centroids = every 97th
    * vector, the seeded-sample stand-in for k-means) assigns each vector to
    * its max-cosine centroid; queries probe their own cell (nprobe=1) and
    * exact-re-rank within it. Assignment is one broadcast of the centroid
    * ARRAYS (not exploded elements) against the vector scan — a fold per
    * (vector, centroid) — followed by a map-side-combined min_by, so the
    * only shuffle is centroid-count-deep. */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val v = vecs(spark, sfDir)

    val assignments = graft.util.Memo.cached(spark, sfDir, "sim_ivf_assign") {
      val cents = v.filter($"vec_id" % 97 === 3)
        .select($"vec_id".as("cid"), $"embedding".as("cemb"), $"norm_sq".as("cnorm"))
      // min_by over (-cos, cid) ≡ ROW_NUMBER(ORDER BY cos DESC, cid) = 1,
      // but aggregates with a map-side partial instead of a window sort
      v.crossJoin(broadcast(cents))
        .select($"vec_id", $"cid", dotExpr("embedding", "cemb").as("dot"), $"norm_sq", $"cnorm")
        .withColumn("cos", $"dot".cast(DoubleType) /
          (sqrt($"norm_sq".cast(DoubleType)) * sqrt($"cnorm".cast(DoubleType))))
        .groupBy($"vec_id")
        .agg(min_by($"cid", struct(negate($"cos"), $"cid")).as("cluster"))
    }

    val qa = assignments.filter(expr(queryFilter))
      .select($"vec_id".as("qid"), $"cluster")
    val candidates = qa.join(assignments, Seq("cluster"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id")

    val qv = v.filter(expr(queryFilter))
      .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"norm_sq".as("qn"))
    rerank(v, qv, candidates, 3)
  }

  val annIvfOracle: String = Fixtures.oracle(
    elementCtes("embeddings") +
      s""", cel AS (SELECT vec_id AS cid, idx, v AS cv FROM el WHERE vec_id % 97 = 3),
       cn AS (SELECT vec_id AS cid, norm_sq AS cnorm FROM nrm WHERE vec_id % 97 = 3),
       cdots AS (
         SELECT el.vec_id, cel.cid, SUM(CAST(el.v * cel.cv AS DECIMAL(38,12))) AS dot
         FROM el JOIN cel ON el.idx = cel.idx
         GROUP BY 1, 2),
       assignments AS (
         SELECT vec_id, cid AS cluster
         FROM (SELECT d.vec_id, d.cid,
                      ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
                        CAST(d.dot AS DOUBLE) / (SQRT(CAST(n.norm_sq AS DOUBLE)) * SQRT(CAST(c.cnorm AS DOUBLE))) DESC,
                        d.cid) AS rn
               FROM cdots d
               JOIN nrm n ON d.vec_id = n.vec_id
               JOIN cn c ON d.cid = c.cid) t
         WHERE rn = 1),
       candidates AS (
         SELECT q.vec_id AS qid, a.vec_id
         FROM assignments q JOIN assignments a
           ON q.cluster = a.cluster AND a.vec_id != q.vec_id
         WHERE q.$queryFilter),
       dots AS (
         SELECT c.qid, c.vec_id, SUM(CAST(q.v * d.v AS DECIMAL(38,12))) AS dot
         FROM candidates c
         JOIN el q ON q.vec_id = c.qid
         JOIN el d ON d.vec_id = c.vec_id AND d.idx = q.idx
         GROUP BY 1, 2),
       scored AS (
         SELECT dots.qid, dots.vec_id,
                CAST(dots.dot AS DOUBLE)
                  / (SQRT(CAST(qn.norm_sq AS DOUBLE)) * SQRT(CAST(vn.norm_sq AS DOUBLE))) AS cosine
         FROM dots
         JOIN nrm qn ON dots.qid = qn.vec_id
         JOIN nrm vn ON dots.vec_id = vn.vec_id),
       ranked AS (
         SELECT qid, vec_id, cosine,
                ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         FROM scored)
       SELECT qid AS query_id, vec_id AS neighbor_id,
              CAST(rank AS BIGINT) AS rank, ROUND(cosine, 6) AS cosine
       FROM ranked WHERE rank <= 3""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_topk" -> (cosineTopK _),
    "sim_ann_lsh" -> (annLsh _),
    "sim_ann_ivf" -> (annIvf _),
    "sim_embedding_near_dup" -> (embeddingNearDup _))

  val oracles: Map[String, String] = Map(
    "sim_cosine_topk" -> cosineTopKOracle,
    "sim_ann_lsh" -> annLshOracle,
    "sim_ann_ivf" -> annIvfOracle,
    "sim_embedding_near_dup" -> embeddingNearDupOracle)
}
