package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.{Dedup, Sampling, TextOps}

/** Robustness of the curation family against the garbage a real crawl
  * contains. The synthetic fixtures are well-formed; a 100 TB crawl is
  * not — so this suite swaps `documents.parquet` for an adversarial set
  * (empty text, NULL text, all-whitespace, single mega-token, unicode +
  * control characters, stopword-only, exact duplicates, NULL lang) and
  * runs a representative query per family end-to-end. The contract is:
  * no operator throws, row-level invariants hold, and the funnel/build
  * consistency law survives inputs the oracles never exercised. */
class AdversarialCorpusSpec extends SparkSpec {

  private lazy val advDir: String = {
    // reuse every well-formed table from the smallest fixture unchanged
    val dir = SparkSpec.fixtureDirExcept("documents", "embeddings")
    writeAdversarialEmbeddings(dir.resolve("embeddings.parquet").toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = true)))
    val docs = Seq(
      Row(1L, "", "en", "srcA", 0L),                                     // empty
      Row(2L, null, "en", "srcA", null),                                 // NULL text
      Row(3L, "    ", "en", "srcA", 4L),                                 // whitespace only
      Row(4L, "x" * 2000, "en", "srcA", 2000L),                          // one mega-token
      Row(5L, "hello", "de", "srcB", 5L),                                // single word
      Row(6L, "the the the a of the a of", "en", "srcB", 25L),           // stopwords only
      Row(7L, "héllo wörld 漢字 test über straße", null, "srcB", 31L),   // unicode + NULL lang
      Row(8L, "tab\tand\nnewline chars here", "fr", "srcC", 26L),        // control chars
      Row(9L, "duplicate content for the exact dedup pair", "en", "srcC", 42L),
      Row(10L, "duplicate content for the exact dedup pair", "en", "srcC", 42L),
      Row(11L, "a normal looking document with several plain words inside it", "en", "srcC", 60L),
      Row(12L, ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 20).trim, "en", "srcD", 619L)) // long + repetitive
    spark.createDataFrame(
        spark.sparkContext.parallelize(docs, 2), schema)
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  /** Embeddings a real pipeline's encoder failures produce: zero vectors,
    * NULLs, truncated rows, overflow magnitudes, NaN elements — including a
    * degenerate vector sitting in a QUERY slot (vec_id divisible by 50). */
  private def writeAdversarialEmbeddings(path: String): Unit = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true),
      StructField("label", IntegerType, nullable = true)))
    def vec(i: Long): Seq[Float] =
      (0 until 8).map(d => math.sin(i * 31 + d * 7).toFloat)
    val rows: Seq[Row] = (0L until 60L).map {
      case 7L  => Row(7L, Seq.fill(8)(0f), 0)                       // zero vector
      case 13L => Row(13L, null, 1)                                 // NULL embedding
      case 23L => Row(23L, Seq(1f, 2f), 0)                          // truncated
      case 31L => Row(31L, Seq.fill(8)(1e30f), 1)                   // overflow magnitude
      case 41L => Row(41L, Seq(1f, Float.NaN, 3f, 4f, 5f, 6f, 7f, 8f), 0) // NaN element
      case 43L => Row(43L, Seq(1f, Float.PositiveInfinity, 3f, 4f, 5f, 6f, 7f, 8f), 1) // Inf element
      case 50L => Row(50L, Seq.fill(8)(0f), 1)                      // degenerate QUERY
      case i   => Row(i, vec(i), (i % 2).toInt)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(path)
  }

  /** Run one representative per family; the assertion is the run itself
    * plus a sanity bound (operators must not invent rows from garbage). */
  private val probes: Seq[(String, Int => Boolean)] = Seq(
    "text_token_count" -> (_ == 12),        // one row per doc, nulls included
    "text_quality_score" -> (_ <= 12),
    "text_lang_id" -> (_ <= 12),
    "text_gopher_rules" -> (_ <= 12),
    "text_zipf_spectrum" -> (_ >= 1),
    "text_domain_lift" -> (_ >= 0),
    "text_ngram_diversity" -> (n => n >= 1 && n <= 4), // ≤ one row per source
    "text_dup_gram_signals" -> (_ <= 12),
    "text_line_dedup" -> (_ <= 12),
    "text_lm_fluency" -> (_ <= 12),
    "text_bpe_top_pairs" -> (_ <= 32),
    "text_bpe_train" -> (_ == 12),          // pairs never exhaust on this corpus
    "text_bpe_fertility" -> (n => n >= 1 && n <= 4), // one row per lang value
    "text_langid_confusion" -> (n => n >= 1 && n <= 12),
    "corpus_heaps_curve" -> (n => n >= 1 && n <= 12),
    "sample_kcenter" -> (_ == 8),           // 55 valid vectors > k = 8
    "sim_ann_recall_matryoshka" -> (_ >= 0), // truncated garbage re-guarded per width
    "corpus_curation" -> (_ <= 12),
    "dedup_exact" -> (_ >= 1),
    "dedup_minhash_lsh" -> (_ >= 0),
    "dedup_threshold_curve" -> (_ == 5),    // tau frame drives the output
    "dedup_ngram_jaccard" -> (_ >= 0),
    "sample_stratified" -> (_ <= 12),
    "sample_unimax" -> (_ <= 12),
    "split_train_holdout" -> (_ == 12),
    "corpus_pretrain_funnel" -> (_ == 6),
    "sim_ann_lsh" -> (_ >= 0),
    "sim_embedding_near_dup" -> (_ >= 0),
    "sim_outlier_report" -> (_ >= 0),
    "sim_kmeans_refine" -> (_ >= 0),
    "embedding_quantize" -> (_ >= 0),
    "sample_class_balanced" -> (_ >= 0),
    "embedding_pca_power" -> (_ == 8),      // d inferred from the 8-wide corpus
    "embedding_pca_project" -> (_ == 55),   // only the valid vectors score
    "embedding_pca_topk" -> (_ == 24),      // 3 components × the 8-wide corpus
    "embedding_pca_topk_project" -> (_ == 165), // 3 × the 55 valid vectors
    "sim_ann_sq8" -> (_ >= 0),              // width guard drops truncated pairs
    "sim_ann_ivfpq_rerank" -> (_ >= 0),     // exact refine of whatever ADC yields
    "sim_ann_ivfpq_residual" -> (_ >= 0),   // TRY_CAST lanes absorb NaN/Inf/NULL
    "corpus_pack_manifest" -> (_ <= 12),    // NULL-source/text rows outside streams
    "corpus_pack_stats" -> (n => n >= 1 && n <= 12),
    "sim_ann_opq" -> (_ == 0),              // allocation undefined off the 64-grid
    "sim_ann_recall_opq" -> (_ >= 0),       // exact side drives rows, hits = 0
    "sim_ann_recall_nprobe_curve" -> (_ == 4),  // one row per nprobe level
    "sim_ann_filtered" -> (_ >= 0),             // label join drops garbage rows
    "sim_ann_recall_filtered" -> (_ >= 0),
    "sim_ann_ivfpq_deleted" -> (_ >= 0),        // mask over whatever survives
    "retrieval_hybrid_rrf" -> (_ >= 0),         // arms may both come up empty
    "sample_rho_loss" -> (n => n >= 0 && n <= 12),
    "mix_epoch_schedule" -> (n => n >= 1 && n <= 4),
    "corpus_hhi_concentration" -> (n => n >= 1 && n <= 4),
    "text_rrf_fusion" -> (n => n >= 0 && n <= 20),
    "sim_ann_recall_rerank_curve" -> (_ == 4),  // one row per budget level
    "retrieval_rm3_terms" -> (n => n >= 0 && n <= 5),
    "retrieval_rm3_search" -> (n => n >= 0 && n <= 10),
    "classifier_percep_train" -> (_ >= 0),      // pocket may serve w0 = empty
    "classifier_percep_curve" -> (_ == 12),     // one row per round, always
    "classifier_percep_score" -> (_ >= 0),
    "classifier_margin_pr" -> (n => n >= 0 && n <= 16),
    "embedding_jl_project" -> (_ >= 0),         // only finite-norm vectors
    "embedding_jl_distortion" -> (_ >= 0),
    "sim_ann_recall_jl" -> (_ >= 0),
    "text_wordpiece_train" -> (_ == 12),        // pairs never exhaust here
    "text_wordpiece_fertility" -> (n => n >= 1 && n <= 4),
    "text_tokenizer_compare" -> (n => n >= 1 && n <= 4),
    "text_unigram_inventory" -> (_ >= 1),       // chars + up to 48 substrings
    "text_unigram_fertility" -> (n => n >= 1 && n <= 4),
    "text_kn_model" -> (_ >= 1),                // >= 1 observed bigram
    "text_kn_perplexity" -> (_ <= 12),          // only multi-word docs score
    "text_kn_filter_curve" -> (_ == 4),         // one row per cutoff level
    "sim_ann_bq" -> (_ >= 0),                   // 8-dim corpus: w1 packs empty
    "sim_ann_bq_rerank" -> (_ >= 0),
    "sim_ann_recall_bq" -> (_ >= 0),
    "sim_ann_ivfbq" -> (_ >= 0),
    "sim_ann_recall_ivfbq" -> (_ >= 0),
    "sim_ann_graph_incremental" -> (_ >= 0),    // degenerate batch rows drop
    "sim_ann_recall_graph_incremental" -> (_ >= 0),
    "sim_ann_graph_deleted" -> (_ >= 0),
    "sim_ann_graph_compacted" -> (_ >= 0),
    "sim_ann_recall_graph_deleted" -> (_ >= 0))

  test("every probed operator survives the adversarial corpus") {
    graft.fixtures.Fixtures.register(spark, advDir)
    val failures = probes.flatMap { case (name, rowsOk) =>
      try {
        val n = SparkEntry.queries(name)(spark, advDir).collect().length
        if (rowsOk(n)) None else Some(s"$name: unexpected row count $n")
      } catch {
        case e: Exception => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("exact dedup elects one canonical doc from the duplicated pair") {
    graft.fixtures.Fixtures.register(spark, advDir)
    val out = Dedup.dedupExact(spark, advDir).collect()
    // docs 9 and 10 share text: one group, canonical = min id, count = 2
    val dup = out.filter(r => Set(9L, 10L).contains(r.getAs[Long]("canonical_doc_id")))
    assert(dup.length === 1)
    assert(dup.head.getAs[Long]("canonical_doc_id") === 9L)
    assert(dup.head.getAs[Long]("dup_count") === 2L)
  }

  test("the funnel/build consistency law holds on garbage input") {
    graft.fixtures.Fixtures.register(spark, advDir)
    val funnel = TextOps.pretrainFunnel(spark, advDir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    val build = TextOps.corpusBuild(spark, advDir).collect()
    assert(build.length.toLong === funnel("domain_mix"))
    // survivors are real documents, never invented ids
    val ids = spark.table("documents").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(build.forall(r => ids.contains(r.getAs[Long]("doc_id"))))
  }

  test("PCA infers the corpus width and scores only valid vectors") {
    graft.fixtures.Fixtures.register(spark, advDir)
    val comp = graft.queries.Pca.pcaPower(spark, advDir).collect()
    assert(comp.map(_.getAs[Long]("dim")).toSeq == (0L until 8L), "d must follow the corpus")
    assert(comp.map(r => math.abs(r.getAs[Long]("v_e6"))).max == 1000000L)
    val proj = graft.queries.Pca.pcaProject(spark, advDir).collect()
    val excluded = Set(13L, 23L, 31L, 41L, 43L) // null/truncated/overflow/NaN/Inf
    assert(proj.map(_.getAs[Long]("vec_id")).toSet.intersect(excluded).isEmpty,
      "encoder failures must never be scored")
    proj.foreach(r => assert(r.getAs[Long]("share_bp") >= 0 &&
      r.getAs[Long]("share_bp") <= 10000))
  }

  test("degenerate embeddings never reach a cosine ranking") {
    graft.fixtures.Fixtures.register(spark, advDir)
    val out = graft.queries.Similarity.cosineTopK(spark, advDir).collect()
    assert(out.nonEmpty, "the healthy query slot (vec_id 0) must rank neighbors")
    // no NaN cosine anywhere — the norm>0 index guard is what prevents a
    // zero/NaN vector from sorting ABOVE every real neighbor
    assert(out.forall(r => !r.getAs[Double]("cosine").isNaN))
    // the degenerate vectors are out of the index entirely, on both sides
    // (43 = Inf element: its norm is +Infinity, which passed a naive
    // `norm > 0 AND NOT isnan(norm)` guard — the finite-norm leg exists
    // because its cosine is NaN or ±Inf all the same)
    val degenerate = Set(7L, 13L, 41L, 43L, 50L)
    assert(out.forall(r => !degenerate.contains(r.getAs[Long]("neighbor_id"))))
    assert(out.forall(r => r.getAs[Long]("query_id") != 50L),
      "a zero-norm query slot must produce no result group")
    // ranks stay contiguous from 1 per query group
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      assert(g.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to g.length).toSeq)
    }
  }

  test("degenerate embeddings are never selected as k-center coreset centers") {
    graft.fixtures.Fixtures.register(spark, advDir)
    val out = graft.queries.Similarity.kcenterSelect(spark, advDir).collect()
    assert(out.length === 8)
    val degenerate = Set(7L, 13L, 41L, 43L, 50L)
    assert(out.forall(r => !degenerate.contains(r.getAs[Long]("center_id"))),
      s"degenerate vector selected: ${out.map(_.getAs[Long]("center_id")).mkString(",")}")
    // coverage partitions exactly the valid vectors (60 - 5 degenerate)
    assert(out.map(_.getAs[Long]("covered")).sum === 55L)
  }

  test("the split operator never leaks duplicate text across the split") {
    graft.fixtures.Fixtures.register(spark, advDir)
    val out = Sampling.trainHoldoutSplit(spark, advDir).collect()
    val side = out.filter(r => Set(9L, 10L).contains(r.getAs[Long]("doc_id")))
      .map(_.getAs[String]("split")).distinct
    assert(side.length === 1, s"identical text must land on ONE side, got $side")
  }
}
