package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.fixtures.Fixtures
import graft.plans.DotProduct

/** Hard-negative mining for contrastive embedding training — the data-prep
  * op behind DPR/ANCE-style retrievers (Karpukhin et al. 2020; Xiong et
  * al. 2021): for every query the training set needs negatives that are
  * CLOSE in embedding space but wrong by the relevance truth ("hard",
  * mined from the ANN index's own neighborhood) plus a few uncorrelated
  * ("easy") ones for stability. Label = the relevance proxy the eval and
  * filtered-ANN entries already grade with.
  *
  *  - HARD: the query's IVF-cell co-occupants (SERVED from the persisted
  *    assignments artifact — mining reads the index, trains nothing) with
  *    a different label, top-3 by cosine — the highest-scoring wrong
  *    answers, exactly ANCE's "retrieve from the current index" shape.
  *  - EASY: a FIXED hash-bottom-64 pool (the deterministic Knuth order the
  *    samplers use) crossed against the queries, different-label, 3 per
  *    query by the pairwise hash — per-query pseudo-random yet replayable.
  *
  * Scale shape: hard mining joins queries to their own cell only (the
  * sqrt-law cell bound, as every serving entry); the easy pool is a
  * 64-row TakeOrdered broadcast at ANY corpus size; all ranks are windows
  * over cell- or pool-bounded partitions. Cosines are the standard
  * strict-fold dot + IEEE sqrt the whole similarity family shares.
  */
object Negatives {

  private val kHard = 3
  private val kEasy = 3
  private val poolSize = 64

  /** Spec hook: (vec_id, embedding, norm_sq, cell, label). */
  private[graft] def inputs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Dbscan.inputs(spark, sfDir)
      .join(spark.table("embeddings").select($"vec_id", $"label"), Seq("vec_id"))
  }

  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    DotProduct.register(spark)
    import spark.implicits._
    val av = inputs(spark, sfDir)
    val qv = av.filter(expr(Similarity.queryPred("vec_id")))
      .select($"vec_id".as("qid"), $"embedding".as("qemb"),
        $"norm_sq".as("qn"), $"cell".as("qcell"), $"label".as("qlabel"))

    val hard = av
      .join(qv, $"cell" === $"qcell" && $"vec_id" =!= $"qid" &&
        $"label" =!= $"qlabel")
      .select($"qid", $"vec_id".as("neg_id"),
        (Similarity.dotExpr("qemb", "embedding") /
          (sqrt($"qn") * sqrt($"norm_sq"))).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"neg_id")))
      .filter($"rank" <= kHard)
      .select($"qid", $"neg_id", lit("hard").as("kind"),
        $"rank".cast(LongType).as("rank"), round($"cos", 6).as("cosine"))

    val pool = av
      .withColumn("h", expr(Sampling.bucketExprSql("vec_id")))
      .orderBy($"h", $"vec_id").limit(poolSize)
      .select($"vec_id", $"embedding", $"norm_sq", $"label")
    val easy = qv
      .join(broadcast(pool), $"vec_id" =!= $"qid" && $"label" =!= $"qlabel")
      .withColumn("ph", expr("((vec_id % 2147483648) * 2654435761 + qid) % 4294967296"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"ph", $"vec_id")))
      .filter($"rank" <= kEasy)
      .select($"qid", $"vec_id".as("neg_id"), lit("easy").as("kind"),
        $"rank".cast(LongType).as("rank"),
        round(Similarity.dotExpr("qemb", "embedding") /
          (sqrt($"qn") * sqrt($"norm_sq")), 6).as("cosine"))

    hard.unionByName(easy)
      .select($"qid".as("query_id"), $"neg_id", $"kind", $"rank", $"cosine")
  }

  // ------------------------------------------------------------- oracle

  val hardNegativesOracle: String = Fixtures.oracle(
    Similarity.assignmentCtes +
      s""", hn_lab AS (SELECT vec_id, label FROM embeddings),
       hn_q AS (
         SELECT a.vec_id AS qid, a.cluster AS qcell, l.label AS qlabel
         FROM assignments a JOIN hn_lab l ON a.vec_id = l.vec_id
         WHERE ${Similarity.queryPred("a.vec_id")}),
       hn_hard AS (
         SELECT qid, neg_id, 'hard' AS kind, rank, ROUND(cos, 6) AS cosine
         FROM (
           SELECT q.qid, a.vec_id AS neg_id,
                  ${DotProduct.duckDot("qe.embedding", "ae.embedding")}
                    / (SQRT(qn.norm_sq) * SQRT(an.norm_sq)) AS cos,
                  ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                    ${DotProduct.duckDot("qe.embedding", "ae.embedding")}
                      / (SQRT(qn.norm_sq) * SQRT(an.norm_sq)) DESC,
                    a.vec_id) AS rank
           FROM hn_q q
           JOIN assignments a ON a.cluster = q.qcell AND a.vec_id <> q.qid
           JOIN hn_lab al ON a.vec_id = al.vec_id AND al.label <> q.qlabel
           JOIN embeddings qe ON q.qid = qe.vec_id
           JOIN embeddings ae ON a.vec_id = ae.vec_id
           JOIN nrm qn ON q.qid = qn.vec_id
           JOIN nrm an ON a.vec_id = an.vec_id)
         WHERE rank <= $kHard),
       hn_pool AS (
         SELECT n.vec_id, l.label
         FROM nrm n JOIN hn_lab l ON n.vec_id = l.vec_id
         ORDER BY ${Sampling.bucketExprSql("n.vec_id")}, n.vec_id
         LIMIT $poolSize),
       hn_easy AS (
         SELECT qid, neg_id, 'easy' AS kind, rank, ROUND(cos, 6) AS cosine
         FROM (
           SELECT q.qid, p.vec_id AS neg_id,
                  ${DotProduct.duckDot("qe.embedding", "pe.embedding")}
                    / (SQRT(qn.norm_sq) * SQRT(pn.norm_sq)) AS cos,
                  ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                    ((p.vec_id % 2147483648) * 2654435761 + q.qid) % 4294967296,
                    p.vec_id) AS rank
           FROM hn_q q
           JOIN hn_pool p ON p.vec_id <> q.qid AND p.label <> q.qlabel
           JOIN embeddings qe ON q.qid = qe.vec_id
           JOIN embeddings pe ON p.vec_id = pe.vec_id
           JOIN nrm qn ON q.qid = qn.vec_id
           JOIN nrm pn ON p.vec_id = pn.vec_id)
         WHERE rank <= $kEasy)
       SELECT qid AS query_id, neg_id, kind, rank, cosine FROM hn_hard
       UNION ALL
       SELECT qid AS query_id, neg_id, kind, rank, cosine FROM hn_easy""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_hard_negatives" -> (hardNegatives _))

  val oracles: Map[String, String] = Map(
    "sample_hard_negatives" -> hardNegativesOracle)
}
