package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.fixtures.Fixtures
import graft.plans.DotProduct

/** Hybrid sparse + dense retrieval — the deployment shape every modern
  * retrieval stack converged on (Vespa, Weaviate, Elasticsearch 8 kNN+BM25:
  * a lexical arm catches exact-term matches dense embeddings smear out, a
  * dense arm catches paraphrases lexical scoring misses, and reciprocal-
  * rank fusion combines them WITHOUT comparing their incomparable scores —
  * Cormack, Clarke & Büttcher, SIGIR'09).
  *
  * The two corpora share one key space (`doc_id` ≡ `vec_id`, the fixture's
  * text↔embedding pairing), so each query id retrieves through both arms:
  *
  *  - **Dense arm**: the production two-stage ANN serving path —
  *    [[Similarity.annIvfPqRerank]], i.e. persisted-index ADC shortlist +
  *    exact-cosine refine to top-3. Nothing new trains; the hybrid entry
  *    consumes the same served list the standalone entry gates.
  *  - **Sparse arm**: more-like-this BM25 (Lucene MLT's design): each query
  *    DOC's terms ranked rarest-first (df ascending — idf is monotone in
  *    df, so this is the top-idf selection as an INTEGER sort, no float
  *    compare), capped at [[mltTerms]] terms; the selected terms' postings
  *    are scored with [[TextOps.bm25Scored]]'s exact BM25 arithmetic
  *    (k1 = 1.2, b = 0.75, rational idf — no ln()) and summed per candidate
  *    in DECIMAL(25,12) lanes (variable number of addends per candidate —
  *    a double sum would be fold-order-sensitive across engines; the
  *    decimal lane is the [[Similarity]] ADC determinism trick).
  *  - **Fusion**: Σ_arms ⌊10⁶/(60 + rank)⌋ over a FULL OUTER join of the
  *    two top-k lists — integer-exact ([[TextOps.rrfFusion]]'s constant),
  *    final top-3 per query, ties on doc_id.
  *
  * Scale shape: the token/tf/df frames are the inverted-index build — one
  * corpus-sized shuffle each, shared across all queries (a deployment
  * materializes them once per snapshot, exactly like [[TextOps.dfIndex]]).
  * Query-side frames are Q₀-bounded: term selection is a window over the
  * Q₀ query docs' own vocabularies; the candidate join probes the posting
  * lists with a broadcast of Q₀ × [[mltTerms]] (qid, word) rows, so its
  * volume is the selected terms' posting mass — and rarest-first selection
  * MINIMIZES that mass (the MLT design point: frequent terms contribute
  * little idf and huge postings). The fusion window partitions by query
  * over ≤ (3 + [[sparseK]]) rows. No corpus-sized window, no unbounded
  * broadcast, dense arm partition-pruned through the persisted index.
  */
object Hybrid {

  /** Rarest-terms-per-query budget (Lucene MLT `maxQueryTerms`, sized to
    * the fixture's short docs). */
  private[queries] val mltTerms = 4

  /** Sparse arm depth; the dense arm serves its standard top-3. */
  private[queries] val sparseK = 8

  /** The sparse arm alone: (qid, doc_id, rank ≤ sparseK). */
  private def sparseRanked(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val docs = spark.table("documents")
    val tf = docs
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .groupBy($"doc_id", $"word")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val dls = docs.select($"doc_id", size(split($"text", " ")).cast(LongType).as("dl"))
    val stats = dls.agg(count(lit(1)).as("n"), sum($"dl").as("total_dl"))

    // term selection: the query docs' vocabularies (Q₀-bounded) ranked
    // rarest-first; df rides along so the scorer needs no vocab-sized join
    val qterms = tf.filter(expr(Similarity.queryPred("doc_id")))
      .select($"doc_id".as("qid"), $"word")
      .join(df, Seq("word"))
      .withColumn("trank", row_number().over(
        Window.partitionBy($"qid").orderBy($"df", $"word")))
      .filter($"trank" <= mltTerms)
      .select($"qid", $"word", $"df")

    // candidate scoring: [[TextOps.bm25Scored]]'s expression tree verbatim
    // (the oracle mirrors it token for token), summed in decimal lanes
    tf.join(broadcast(qterms), Seq("word"))
      .filter($"doc_id" =!= $"qid")
      .join(dls, Seq("doc_id"))
      .join(broadcast(stats))
      .withColumn("avgdl", $"total_dl".cast(DoubleType) / $"n".cast(DoubleType))
      .withColumn("idf",
        (($"n" - $"df").cast(DoubleType) + lit(0.5)) / ($"df".cast(DoubleType) + lit(0.5)))
      .withColumn("sc",
        $"idf" * ($"tf".cast(DoubleType) * lit(2.2)) /
          ($"tf".cast(DoubleType) +
            lit(1.2) * (lit(0.25) + lit(0.75) * ($"dl".cast(DoubleType) / $"avgdl"))))
      .withColumn("scd", $"sc".cast(DecimalType(25, 12)))
      .groupBy($"qid", $"doc_id")
      .agg(sum($"scd").as("ssum"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"ssum".desc, $"doc_id")))
      .filter($"rank" <= sparseK)
      .select($"qid", $"doc_id", $"rank")
  }

  /** Hybrid retrieval under the gate: dense top-3 (persisted-index
    * two-stage serving) ⊕ sparse top-[[sparseK]] (MLT BM25), RRF-fused,
    * top-3 per query. Arm ranks ride the output (NULL when an arm did not
    * surface the doc) — the triage columns a deployment's relevance
    * dashboard reads. */
  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    DotProduct.register(spark)
    import spark.implicits._
    val dense = Similarity.annIvfPqRerank(spark, sfDir)
      .select($"query_id".as("qid"), $"neighbor_id".as("doc_id"),
        $"rank".as("dense_rank"))
    val sparse = sparseRanked(spark)
      .select($"qid", $"doc_id", $"rank".cast(LongType).as("sparse_rank"))
    fuse(dense, sparse)
  }

  /** The fusion step alone, factored for spec-level pinning (the fixture's
    * synthetic embeddings are uncorrelated with its text, so the
    * both-arms-agree sum path needs a hand-built frame to exercise):
    * FULL OUTER join of (qid, doc_id, dense_rank) and (qid, doc_id,
    * sparse_rank), integer RRF, top-3 per query. */
  private[queries] def fuse(dense: DataFrame, sparse: DataFrame): DataFrame = {
    import dense.sparkSession.implicits._
    dense.join(sparse, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(expr("CAST(1000000 AS BIGINT) DIV (60 + dense_rank)"), lit(0L)) +
          coalesce(expr("CAST(1000000 AS BIGINT) DIV (60 + sparse_rank)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"rrf_e6".desc, $"doc_id")))
      .filter($"rank" <= 3)
      .select($"qid".as("query_id"), $"doc_id", $"rrf_e6",
        $"dense_rank", $"sparse_rank", $"rank".cast(LongType).as("rank"))
  }

  val hybridRrfOracle: String = Fixtures.oracle(
    // dense arm: the full rerank chain (probes → ADC → exact refine)
    Similarity.pqCtes + Similarity.assignmentCtes + Similarity.ivfPqCtes +
      Similarity.rerankCtes +
      s""", hy_tf AS (
         SELECT doc_id, word, COUNT(1) AS tf
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY 1, 2),
       hy_df AS (SELECT word, COUNT(1) AS df FROM hy_tf GROUP BY 1),
       hy_dls AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                  FROM documents),
       hy_stats AS (SELECT COUNT(1) AS n, SUM(dl) AS total_dl FROM hy_dls),
       hy_qterms AS (
         SELECT qid, word, df FROM (
           SELECT t.doc_id AS qid, t.word, d.df,
                  ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.word) AS trank
           FROM hy_tf t JOIN hy_df d ON t.word = d.word
           WHERE ${Similarity.queryPred("t.doc_id")})
         WHERE trank <= $mltTerms),
       hy_sc AS (
         SELECT q.qid, t.doc_id,
                CAST(CAST(
                  ((CAST(s.n - q.df AS DOUBLE) + 0.5) / (CAST(q.df AS DOUBLE) + 0.5))
                    * (CAST(t.tf AS DOUBLE) * 2.2)
                    / (CAST(t.tf AS DOUBLE)
                       + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE)
                                               / (CAST(s.total_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))))
                  AS VARCHAR) AS DECIMAL(25,12)) AS scd
         FROM hy_qterms q
         JOIN hy_tf t ON q.word = t.word AND t.doc_id != q.qid
         JOIN hy_dls l ON t.doc_id = l.doc_id
         CROSS JOIN hy_stats s),
       hy_sparse AS (
         SELECT qid, doc_id, rank FROM (
           SELECT qid, doc_id,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ssum DESC, doc_id) AS rank
           FROM (SELECT qid, doc_id, SUM(scd) AS ssum FROM hy_sc GROUP BY 1, 2))
         WHERE rank <= $sparseK),
       hy_dense AS (
         SELECT qid, vec_id AS doc_id, rank FROM rr_ranked WHERE rank <= 3),
       hy_fused AS (
         SELECT COALESCE(d.qid, s.qid) AS qid,
                COALESCE(d.doc_id, s.doc_id) AS doc_id,
                d.rank AS dense_rank, s.rank AS sparse_rank,
                COALESCE(1000000 // (60 + d.rank), 0)
                  + COALESCE(1000000 // (60 + s.rank), 0) AS rrf_e6
         FROM hy_dense d
         FULL OUTER JOIN hy_sparse s ON d.qid = s.qid AND d.doc_id = s.doc_id)
       SELECT qid AS query_id, doc_id,
              CAST(rrf_e6 AS BIGINT) AS rrf_e6,
              CAST(dense_rank AS BIGINT) AS dense_rank,
              CAST(sparse_rank AS BIGINT) AS sparse_rank,
              CAST(rk AS BIGINT) AS rank
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                         ORDER BY rrf_e6 DESC, doc_id) AS rk
             FROM hy_fused)
       WHERE rk <= 3""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "retrieval_hybrid_rrf" -> (hybridRrf _))

  val oracles: Map[String, String] = Map(
    "retrieval_hybrid_rrf" -> hybridRrfOracle)
}
