package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline; at scale this is the
  *    per-partition score+local-top-k / global-top-k pattern;
  *  - random-hyperplane LSH buckets → candidate generation → exact re-rank —
  *    the scale path: the expensive pairing is replaced by an equi-join on
  *    the bucket id, shrinking candidates by ~2^planes.
  *
  * Determinism: dot products / norms are per-element double products cast to
  * DECIMAL(38,12) and summed exactly (order-independent — a raw double SUM
  * differs across engines/partitionings). The LSH planes are integer-valued
  * (pseudo-random from plane/dim index arithmetic), so bucket ids are exact
  * integers and the whole ANN path is oracle-checkable.
  */
object Similarity {

  private val dec3812 = DecimalType(38, 12)

  /** Queries = every 50th vector. */
  private val queryFilter = "vec_id % 50 = 0"

  /** (vec_id, idx, val) exploded vector elements + per-vector norms —
    * memoized: all three similarity queries share them. */
  private def elements(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.cached(spark, sfDir, "sim_elements") {
      import spark.implicits._
      spark.table("embeddings")
        .select($"vec_id", posexplode($"embedding").as(Seq("idx", "v")))
        .select($"vec_id", $"idx", $"v".cast(DoubleType).as("v"))
    }

  private def norms(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.cached(spark, sfDir, "sim_norms") {
      import spark.implicits._
      elements(spark, sfDir)
        .groupBy($"vec_id")
        .agg(sum(($"v" * $"v").cast(dec3812)).as("norm_sq"))
    }

  /** Random-hyperplane LSH bucket per vector — shared by ANN + near-dup. */
  private def lshBuckets(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.cached(spark, sfDir, "sim_buckets") {
      import spark.implicits._
      val el = elements(spark, sfDir)
      val planes = spark.range(12).select($"id".cast(IntegerType).as("p"))
      el.join(broadcast(planes))
        .withColumn("w", (($"p" * 37 + $"idx" * 13) % 19 - 9).cast(DoubleType))
        .groupBy($"vec_id", $"p")
        .agg(sum(($"w" * $"v").cast(dec3812)).as("proj"))
        .groupBy($"vec_id")
        .agg(sum(when($"proj" >= 0,
          pow(lit(2.0), $"p".cast(DoubleType)).cast(LongType)).otherwise(0L)).as("bucket"))
    }

  /** Exact cosine top-5 neighbors for each query vector.
    *
    * Dots are one codegen'd fold per (query, vector) pair —
    * `aggregate(zip_with(...))` over the arrays — instead of exploding
    * 64 element rows per pair into a join+groupBy: ~64× less intermediate
    * data, no shuffle before the top-k window. The decimal fold is exact,
    * so it equals the oracle's order-independent decimal SUM. */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val vecs = spark.table("embeddings").select($"vec_id", $"embedding")
    val qvecs = vecs.filter(expr(queryFilter))
      .select($"vec_id".as("qid"), $"embedding".as("qemb"))

    val dots = vecs.crossJoin(broadcast(qvecs))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id", expr(
        // the merge result must be cast back: Spark types (38,12)+(38,12)
        // as (38,11), which would not match the accumulator type
        "aggregate(zip_with(embedding, qemb, " +
          "(x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,12))), " +
          "CAST(0 AS DECIMAL(38,12)), (acc, v) -> CAST(acc + v AS DECIMAL(38,12)))").as("dot"))

    val n = norms(spark, sfDir)
    val scored = dots
      .join(n.withColumnRenamed("vec_id", "qid").withColumnRenamed("norm_sq", "qn"), Seq("qid"))
      .join(n, Seq("vec_id"))
      .withColumn("cosine", $"dot".cast(DoubleType) /
        (sqrt($"qn".cast(DoubleType)) * sqrt($"norm_sq".cast(DoubleType))))

    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"qid".as("query_id"), $"vec_id".as("neighbor_id"),
        $"rank".cast(LongType).as("rank"), round($"cosine", 6).as("cosine"))
  }

  /** Shared oracle CTEs: exploded elements, norms. */
  private val elementCtes: String =
    """, el AS (
         SELECT e.vec_id, CAST(t.i AS INT) AS idx,
                CAST(e.embedding[t.i + 1] AS DOUBLE) AS v
         FROM embeddings e, UNNEST(range(len(e.embedding))) AS t(i)),
       nrm AS (
         SELECT vec_id, SUM(CAST(v * v AS DECIMAL(38,12))) AS norm_sq
         FROM el GROUP BY vec_id)"""

  val cosineTopKOracle: String = Fixtures.oracle(
    elementCtes +
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
    * exact cosine re-rank within the bucket, top-3 per query. Plane weight
    * for (plane p, dim j) = ((p*37 + j*13) % 19) - 9. */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val el = elements(spark, sfDir)
    val buckets = lshBuckets(spark, sfDir)

    val qb = buckets.filter(expr(queryFilter))
      .select($"vec_id".as("qid"), $"bucket")
    val candidates = qb.join(buckets, Seq("bucket"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id")

    // exact re-rank of in-bucket candidates only; the candidate×query-element
    // side is tiny, so it broadcasts and el is probed without a shuffle
    val qel = el.select($"vec_id".as("qid"), $"idx", $"v".as("qv"))
    val dots = el
      .join(broadcast(candidates.join(qel, Seq("qid"))), Seq("vec_id", "idx"))
      .groupBy($"qid", $"vec_id")
      .agg(sum(($"qv" * $"v").cast(dec3812)).as("dot"))

    val n = norms(spark, sfDir)
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vec_id")
    dots
      .join(n.withColumnRenamed("vec_id", "qid").withColumnRenamed("norm_sq", "qn"), Seq("qid"))
      .join(n, Seq("vec_id"))
      .withColumn("cosine", $"dot".cast(DoubleType) /
        (sqrt($"qn".cast(DoubleType)) * sqrt($"norm_sq".cast(DoubleType))))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"qid".as("query_id"), $"vec_id".as("neighbor_id"),
        $"rank".cast(LongType).as("rank"), round($"cosine", 6).as("cosine"))
  }

  val annLshOracle: String = Fixtures.oracle(
    elementCtes +
      s""", buckets AS (
         SELECT vec_id,
                SUM(CASE WHEN proj >= 0 THEN CAST(POWER(2.0, CAST(p AS DOUBLE)) AS BIGINT) ELSE 0 END) AS bucket
         FROM (
           SELECT el.vec_id, CAST(t.p AS INT) AS p,
                  SUM(CAST(CAST((t.p * 37 + el.idx * 13) % 19 - 9 AS DOUBLE) * el.v AS DECIMAL(38,12))) AS proj
           FROM el, UNNEST(range(12)) AS t(p)
           GROUP BY 1, 2) pr
         GROUP BY vec_id),
       candidates AS (
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
    * counterpart of MinHash near-dup detection. */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val el = elements(spark, sfDir)
    val buckets = lshBuckets(spark, sfDir)

    val pairs = buckets.as("a").join(buckets.as("b"),
        $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("va"), $"b.vec_id".as("vb"))

    val dots = el.select($"vec_id".as("vb"), $"idx", $"v".as("bv"))
      .join(broadcast(pairs
        .join(el.select($"vec_id".as("va"), $"idx", $"v".as("av")), Seq("va"))),
        Seq("vb", "idx"))
      .groupBy($"va", $"vb")
      .agg(sum(($"av" * $"bv").cast(dec3812)).as("dot"))

    val n = norms(spark, sfDir)
    dots
      .join(n.withColumnRenamed("vec_id", "va").withColumnRenamed("norm_sq", "na"), Seq("va"))
      .join(n.withColumnRenamed("vec_id", "vb").withColumnRenamed("norm_sq", "nb"), Seq("vb"))
      .withColumn("cosine", $"dot".cast(DoubleType) /
        (sqrt($"na".cast(DoubleType)) * sqrt($"nb".cast(DoubleType))))
      .filter($"cosine" >= 0.99)
      .select($"va".as("vec_a"), $"vb".as("vec_b"), round($"cosine", 6).as("cosine"))
  }

  val embeddingNearDupOracle: String = Fixtures.oracle(
    elementCtes +
      """, buckets AS (
         SELECT vec_id,
                SUM(CASE WHEN proj >= 0 THEN CAST(POWER(2.0, CAST(p AS DOUBLE)) AS BIGINT) ELSE 0 END) AS bucket
         FROM (
           SELECT el.vec_id, CAST(t.p AS INT) AS p,
                  SUM(CAST(CAST((t.p * 37 + el.idx * 13) % 19 - 9 AS DOUBLE) * el.v AS DECIMAL(38,12))) AS proj
           FROM el, UNNEST(range(12)) AS t(p)
           GROUP BY 1, 2) pr
         GROUP BY vec_id),
       pairs AS (
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
    * exact-re-rank within it. At scale the assignment is one broadcast join
    * against the centroid set and the probe is an equi-join on cluster id —
    * the partition-pruning counterpart of the LSH path. */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val el = elements(spark, sfDir)
    val n = norms(spark, sfDir)

    val assignments = graft.util.Memo.cached(spark, sfDir, "sim_ivf_assign") {
      val cel = el.filter($"vec_id" % 97 === 3)
        .select($"vec_id".as("cid"), $"idx", $"v".as("cv"))
      val cn = n.filter($"vec_id" % 97 === 3)
        .select($"vec_id".as("cid"), $"norm_sq".as("cnorm"))

      val dots = el.join(broadcast(cel), Seq("idx"))
        .groupBy($"vec_id", $"cid")
        .agg(sum(($"v" * $"cv").cast(dec3812)).as("dot"))
      val scored = dots
        .join(n, Seq("vec_id")).join(broadcast(cn), Seq("cid"))
        .withColumn("cos", $"dot".cast(DoubleType) /
          (sqrt($"norm_sq".cast(DoubleType)) * sqrt($"cnorm".cast(DoubleType))))
      val w = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"cid")
      scored.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"vec_id", $"cid".as("cluster"))
    }

    val qa = assignments.filter(expr(queryFilter))
      .select($"vec_id".as("qid"), $"cluster")
    val candidates = qa.join(assignments, Seq("cluster"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id")

    val qel = el.select($"vec_id".as("qid"), $"idx", $"v".as("qv"))
    val dots = el
      .join(broadcast(candidates.join(qel, Seq("qid"))), Seq("vec_id", "idx"))
      .groupBy($"qid", $"vec_id")
      .agg(sum(($"qv" * $"v").cast(dec3812)).as("dot"))

    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vec_id")
    dots
      .join(n.withColumnRenamed("vec_id", "qid").withColumnRenamed("norm_sq", "qn"), Seq("qid"))
      .join(n, Seq("vec_id"))
      .withColumn("cosine", $"dot".cast(DoubleType) /
        (sqrt($"qn".cast(DoubleType)) * sqrt($"norm_sq".cast(DoubleType))))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"qid".as("query_id"), $"vec_id".as("neighbor_id"),
        $"rank".cast(LongType).as("rank"), round($"cosine", 6).as("cosine"))
  }

  val annIvfOracle: String = Fixtures.oracle(
    elementCtes +
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
