package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures
import graft.functions.TextHash

/** Text-analysis operators for large-scale training-data pipelines, over the
  * `documents` table: token counting, quality scoring, language-ID heuristic,
  * and document fingerprinting.
  *
  * All are narrow per-row transforms (no shuffle except optional final
  * aggregation) built from codegen'd functions/higher-order expressions — at
  * 100 TB these run at scan speed with full column pruning. Results are
  * integer/rounded-double so the DuckDB differential oracle applies.
  */
object TextOps {

  /** The word-bigram explode expression (over a `words` column), shared by
    * every string-bigram consumer ([[ngramCounts]], [[ngramDiversity]],
    * [[dupGramSignals]]) so the gram universe can never silently diverge
    * between signals. */
  private[queries] val bigramConcatSql: String =
    "transform(sequence(0, size(words) - 2), i -> concat(words[i], ' ', words[i+1]))"

  /** Tiny stopword lexicon (words present in the synthetic corpus). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "to", "and")

  private def stopCountSpark(col: String): String =
    stopwords.map(w => s"size(filter(split($col, ' '), x -> x = '$w'))").mkString(" + ")

  private[queries] def stopCountDuck(col: String): String =
    stopwords.map(w => s"len(list_filter(string_split($col, ' '), x -> x = '$w'))").mkString(" + ")

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * ([a-z]+ | digits | punctuation runs). */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents").select(
      $"doc_id",
      size(split($"text", " ")).cast(LongType).as("ws_tokens"),
      expr("regexp_count(text, '[a-z]+')").cast(LongType).as("word_tokens"),
      expr("regexp_count(text, '[0-9]+')").cast(LongType).as("num_tokens"),
      length($"text").cast(LongType).as("n_chars"))
  }

  val tokenCountOracle: String = Fixtures.oracle(
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
              CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS word_tokens,
              CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS num_tokens,
              CAST(length(text) AS BIGINT) AS n_chars
       FROM documents""")

  /** Quality scoring: length/stopword/punctuation/repetition signals → one
    * [0,1] score. The formula is arbitrary but fixed; what is being tested
    * is the operator plumbing, identical on both engines. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val docs = spark.table("documents")
      .withColumn("words", split($"text", " "))
      .withColumn("n_words", size($"words").cast(DoubleType))
      .withColumn("n_uniq", size(array_distinct($"words")).cast(DoubleType))
      .withColumn("stop_ratio", expr(stopCountSpark("text")).cast(DoubleType) / $"n_words")
      .withColumn("mean_word_len",
        (length($"text") - ($"n_words" - 1)).cast(DoubleType) / $"n_words")

    docs.select(
      $"doc_id",
      round($"stop_ratio", 6).as("stop_ratio"),
      round($"n_uniq" / $"n_words", 6).as("uniq_ratio"),
      round($"mean_word_len", 6).as("mean_word_len"),
      round(
        least(lit(1.0), $"n_words" / 200.0) * 0.4 +
          least(lit(1.0), $"stop_ratio" * 10.0) * 0.3 +
          ($"n_uniq" / $"n_words") * 0.3, 6).as("quality_score"))
  }

  val qualityScoreOracle: String = Fixtures.oracle(
    s"""SELECT doc_id,
              ROUND(stop_ratio, 6) AS stop_ratio,
              ROUND(n_uniq / n_words, 6) AS uniq_ratio,
              ROUND(mean_word_len, 6) AS mean_word_len,
              ROUND(LEAST(1.0, n_words / 200.0) * 0.4
                    + LEAST(1.0, stop_ratio * 10.0) * 0.3
                    + (n_uniq / n_words) * 0.3, 6) AS quality_score
       FROM (
         SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
                CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
                CAST(${stopCountDuck("text")} AS DOUBLE)
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
                CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
         FROM documents) t""")

  /** The language detector, ONE definition per dialect: stop-ratio scoring
    * and the threshold ladder are shared by [[langId]] and
    * [[langIdConfusion]] (and their oracles), so the confusion matrix can
    * never drift from the detector it audits. */
  private def langStopRatioCol: Column =
    expr(stopCountSpark("text")).cast(DoubleType) /
      size(split(col("text"), " ")).cast(DoubleType)

  private def langPredCol(r: Column): Column =
    when(r >= 0.08, "en").when(r >= 0.04, "en_like").otherwise("other")

  private val langStopRatioSql: String =
    s"""CAST(${stopCountDuck("text")} AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE)"""

  private val langPredSql: String =
    """CASE WHEN stop_ratio >= 0.08 THEN 'en'
            WHEN stop_ratio >= 0.04 THEN 'en_like'
            ELSE 'other' END"""

  /** Language-ID heuristic: n-gram/stopword evidence → label. (The corpus is
    * synthetic, so this classifies by English-stopword density; the operator
    * shape — explode-free per-row scoring — is what matters at scale.) */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .withColumn("stop_ratio", langStopRatioCol)
      .select(
        $"doc_id",
        round($"stop_ratio", 6).as("en_score"),
        langPredCol($"stop_ratio").as("lang_pred"))
  }

  val langIdOracle: String = Fixtures.oracle(
    s"""SELECT doc_id,
              ROUND(stop_ratio, 6) AS en_score,
              $langPredSql AS lang_pred
       FROM (
         SELECT doc_id, $langStopRatioSql AS stop_ratio
         FROM documents) t""")

  /** Language-ID confusion matrix: detector prediction vs the corpus's own
    * lang metadata, per cell, with row shares in basis points — the
    * agreement table crawl curation uses to find mislabeled sources before
    * trusting EITHER signal (a source whose metadata says `de` but whose
    * detector column says `en` is a labeling bug or a mirror). NULL
    * metadata is canonicalized to 'unknown' so the share join never drops
    * cells on a null key. Plan: ONE scan-side projection (the same
    * explode-free stopword scoring as [[langId]]) into a (lang, pred)
    * map-side-combined count; the per-lang totals frame is label-set-sized
    * (bounded like the source dimension) and broadcasts. */
  def langIdConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    // consumed twice below (totals + share join): memoized so the corpus
    // scan with the stopword scoring runs once; the frame is
    // (labels × 3 predictions)-sized
    val cells = graft.util.Memo.cached(spark, sfDir, "langid_cells") {
      spark.table("documents")
        .withColumn("stop_ratio", langStopRatioCol)
        .select(
          coalesce($"lang", lit("unknown")).as("lang"),
          langPredCol($"stop_ratio").as("lang_pred"))
        .groupBy($"lang", $"lang_pred").agg(count(lit(1)).as("docs"))
    }
    val totals = cells.groupBy($"lang").agg(sum($"docs").as("lang_docs"))
    cells.join(broadcast(totals), Seq("lang"))
      .select($"lang", $"lang_pred", $"docs",
        expr("docs * 10000 DIV lang_docs").as("row_share_bp"))
  }

  val langIdConfusionOracle: String = Fixtures.oracle(
    s""", lc_cells AS (
         SELECT COALESCE(lang, 'unknown') AS lang,
                $langPredSql AS lang_pred,
                COUNT(1) AS docs
         FROM (
           SELECT lang, $langStopRatioSql AS stop_ratio
           FROM documents) t
         GROUP BY 1, 2),
       lc_tot AS (SELECT lang, SUM(docs) AS lang_docs FROM lc_cells GROUP BY 1)
       SELECT c.lang, c.lang_pred, CAST(c.docs AS BIGINT) AS docs,
              CAST((c.docs * 10000) // t.lang_docs AS BIGINT) AS row_share_bp
       FROM lc_cells c JOIN lc_tot t ON c.lang = t.lang""")

  /** Document fingerprint: rolling polynomial hash over word hashes —
    * a content-defined 60-bit id (mod 1e9+7 folded), plus the per-doc word
    * count it covers. Pure integer arithmetic on both engines. */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .withColumn("words", split($"text", " "))
      .select(
        $"doc_id",
        expr(TextHash.sparkDocFingerprint("words")).as("fingerprint"),
        size($"words").cast(LongType).as("n_words"))
  }

  val docFingerprintOracle: String = Fixtures.oracle(
    s"""SELECT doc_id,
              ${TextHash.duckDocFingerprint("string_split(text, ' ')")} AS fingerprint,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
       FROM documents""")

  /** The end-to-end curation funnel a training-data pipeline runs before
    * tokenization: keep each document only if it is the canonical copy of
    * its exact-dup group AND language-classified English-like AND above the
    * quality bar AND inside the token-length band. One declarative plan —
    * the dedup groupBy is the only shuffle; every signal is a scan-side
    * projection, and Catalyst prunes `documents` to (doc_id, text) once for
    * all four signals. Thresholds keep a non-trivial subset at every sf
    * (~30% of the corpus). */
  /** Canonical representative per exact-dup group (same groups as GROUP BY
    * text — within a SHA-256 group all texts are identical). Shared by
    * [[corpusCuration]] and [[pretrainFunnel]]. */
  private def canonicalDocIds(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.table("documents")
      .groupBy(sha2($"text", 256).as("sha"))
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
  }

  /** Per-document curation signals + composite quality score. ONE
    * definition feeds [[corpusCuration]], [[pretrainFunnel]], and (via the
    * mirrored SQL in their oracles) both differential checks. */
  private[queries] def curationSignals(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.table("documents")
      .withColumn("n_words", size(split($"text", " ")).cast(DoubleType))
      .withColumn("stop_ratio", expr(stopCountSpark("text")).cast(DoubleType) / $"n_words")
      .withColumn("n_uniq", size(array_distinct(split($"text", " "))).cast(DoubleType))
      .withColumn("quality",
        least(lit(1.0), $"n_words" / 200.0) * 0.4 +
          least(lit(1.0), $"stop_ratio" * 10.0) * 0.3 +
          ($"n_uniq" / $"n_words") * 0.3)
  }

  /** The curation bar (quality floor, stopword floor, token-length band),
    * applied identically by [[corpusCuration]] and the funnel's stage 3. */
  private def curationBar(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.filter($"quality" >= 0.5 && $"stop_ratio" >= 0.04 &&
      $"n_words".between(10.0, 150.0))
  }

  def corpusCuration(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    curationBar(curationSignals(spark))
      .join(canonicalDocIds(spark), Seq("doc_id"), "left_semi")
      .select(
        $"doc_id",
        round($"quality", 6).as("quality_score"),
        $"n_words".cast(LongType).as("ws_tokens"),
        when($"stop_ratio" >= 0.08, "en").otherwise("en_like").as("lang_pred"))
  }

  val corpusCurationOracle: String = Fixtures.oracle(
    s""", curation_sig AS (
         SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
                CAST(${stopCountDuck("text")} AS DOUBLE)
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
                CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq
         FROM documents),
       curation_q AS (
         SELECT doc_id, n_words, stop_ratio,
                LEAST(1.0, n_words / 200.0) * 0.4
                  + LEAST(1.0, stop_ratio * 10.0) * 0.3
                  + (n_uniq / n_words) * 0.3 AS quality
         FROM curation_sig),
       curation_canon AS (
         SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text)
       SELECT q.doc_id,
              ROUND(q.quality, 6) AS quality_score,
              CAST(q.n_words AS BIGINT) AS ws_tokens,
              CASE WHEN q.stop_ratio >= 0.08 THEN 'en' ELSE 'en_like' END AS lang_pred
       FROM curation_q q
       WHERE q.doc_id IN (SELECT doc_id FROM curation_canon)
         AND q.quality >= 0.5 AND q.stop_ratio >= 0.04
         AND q.n_words BETWEEN 10.0 AND 150.0""")

  /** Benchmark-decontamination probe set: in production this is the union
    * of eval-suite n-grams (tiny against the corpus — always the broadcast
    * side); here a fixed literal list of word-3-grams known to occur in the
    * synthetic corpus, so the overlap branch is actually exercised. */
  val contaminationProbes: Seq[String] = Seq(
    "key agg row", "batch window spark", "table table key",
    "query big table", "value fast spark")

  /** Contamination scan: per-document occurrence and distinct-probe counts
    * of eval-set n-grams — the decontamination step a training pipeline
    * runs before cutting a corpus release. The probe filter sits directly
    * on the exploded gram stream (scan-side, before any shuffle), so only
    * matching grams — a vanishing fraction — reach the aggregation. */
  /** (doc_id, gram) stream of probe-set matches — scan-side filter before
    * any shuffle. Shared by [[contamination]] and [[pretrainFunnel]] so the
    * two can never disagree about what "contaminated" means. */
  private def probeGramHits(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.table("documents")
      .withColumn("words", split($"text", " "))
      .filter(size($"words") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(words) - 3), " +
          "i -> concat(words[i], ' ', words[i+1], ' ', words[i+2]))")).as("gram"))
      .filter($"gram".isInCollection(contaminationProbes))
  }

  def contamination(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    probeGramHits(spark)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hits"),
        countDistinct($"gram").as("n_probes"))
  }

  val contaminationOracle: String = Fixtures.oracle(
    s""", cont_words AS (
         SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       cont_grams AS (
         SELECT doc_id, words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS gram
         FROM cont_words, UNNEST(range(len(words) - 2)) AS t(i)
         WHERE len(words) >= 3)
       SELECT doc_id,
              CAST(COUNT(1) AS BIGINT) AS n_hits,
              CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_probes
       FROM cont_grams
       WHERE gram IN (${contaminationProbes.map(p => s"'$p'").mkString(", ")})
       GROUP BY doc_id""")

  /** Per-document contamination OVERLAP FRACTION — the published
    * decontamination rule (the GPT-3 appendix / "dirty vs clean" split):
    * not just "does the doc contain an eval n-gram" ([[contamination]]'s
    * membership flags) but WHAT SHARE of the doc's distinct 3-grams hit
    * the eval set, with the keep/drop flag at the 10% threshold by integer
    * cross-multiplication. A long document quoting one benchmark line is
    * salvageable; a short one that IS the benchmark line is not — the
    * fraction separates them where membership cannot.
    *
    * Scale shape: ONE map-side-combined doc-keyed aggregate over the
    * memoized distinct-gram frame (shared with the whole dedup ladder —
    * the gram explode is never re-run); the probe set is a fixed literal.
    * Emits one row per ≥3-word document, hits or not — the zero rows are
    * the point (the clean corpus is the output). */
  def contaminationOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    Dedup.distinctGrams(spark, sfDir)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"gram".isInCollection(contaminationProbes), 1L).otherwise(0L))
          .as("n_hit"))
      .select($"doc_id", $"n_grams", $"n_hit",
        expr("n_hit * 10000 DIV n_grams").as("overlap_bp"))
      .withColumn("flagged", $"overlap_bp" >= 1000L)
  }

  val contaminationOverlapOracle: String = Fixtures.oracle(
    s""", co_grams AS (
         SELECT DISTINCT doc_id, words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS gram
         FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
               WHERE len(string_split(text, ' ')) >= 3) d,
              UNNEST(range(len(d.words) - 2)) AS t(i)),
       co AS (
         SELECT doc_id, COUNT(1) AS n_grams,
                CAST(SUM(CASE WHEN gram IN (${contaminationProbes.map(p => s"'$p'").mkString(", ")})
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         FROM co_grams GROUP BY 1)
       SELECT doc_id, n_grams, n_hit,
              CAST((n_hit * 10000) // n_grams AS BIGINT) AS overlap_bp,
              (n_hit * 10000) // n_grams >= 1000 AS flagged
       FROM co""")

  // shared with StreamReplay's count-min twin (StreamingCms pins D/W to the
  // same values; its spec asserts the stream/batch counter agreement)
  private[queries] val cmsD = 4 // hash rows
  private[queries] val cmsW = 1024 // buckets per row
  private[queries] val cmsProbes = Seq("the", "key", "order", "sort", "batch", "window",
    "hash", "stream", "spark", "scan", "merge", "zzz_absent_zzz")

  /** Count-min sketch term-frequency estimation (Cormode & Muthukrishnan,
    * 2005): token counts folded into a FIXED d×w counter matrix (4×1024
    * longs — 32 KB regardless of corpus size), probed for a fixed word set
    * with `est = min_i counter[i][h_i(w)]`. The sketch never underestimates
    * (every occurrence lands in all d probed cells) and overestimates only
    * by hash-colliding mass — both properties pinned in CmsSpec, and the
    * `overestimate` column makes the error observable per probe.
    *
    * Why it earns a place next to the exact `text_ngram_counts`: the exact
    * counter's state is vocabulary-sized (Heaps' law — unbounded), the
    * sketch's is 32 KB and MERGEABLE (counters sum), which is what a
    * streaming / federated deployment carries. Scale shape: one map-side-
    * combined shuffle of (i, bucket) keys with ≤ d×w rows out; the counter
    * frame and the probe table are constant-size broadcasts. Hashes reuse
    * the minhash permutation family over the shared polynomial word hash —
    * pure integer arithmetic, so the whole sketch is oracle-checkable. */
  def countMin(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    def bucketOf(wordHashSql: String, iCol: String): String =
      s"(($wordHashSql * (97 + 31 * $iCol) + (13 + 17 * $iCol)) % ${TextHash.P}) % $cmsW"

    val counters = spark.table("documents")
      .select(explode(split($"text", " ")).as("word"))
      .select(expr(TextHash.sparkWordHash("word")).as("wh"),
        explode(expr(s"sequence(0, ${cmsD - 1})")).as("i"))
      .select($"i", expr(bucketOf("wh", "i")).as("bucket"))
      .groupBy($"i", $"bucket").agg(count(lit(1)).as("cnt"))

    val probes = cmsProbes.toDF("word")
      .select($"word", expr(TextHash.sparkWordHash("word")).as("wh"),
        explode(expr(s"sequence(0, ${cmsD - 1})")).as("i"))
      .select($"word", $"i", expr(bucketOf("wh", "i")).as("bucket"))

    val exact = spark.table("documents")
      .select(explode(split($"text", " ")).as("word"))
      .filter($"word".isin(cmsProbes: _*))
      .groupBy($"word").agg(count(lit(1)).as("exact_n"))

    probes
      .join(broadcast(counters), Seq("i", "bucket"), "left")
      .groupBy($"word")
      .agg(min(coalesce($"cnt", lit(0L))).as("cm_estimate"))
      .join(exact, Seq("word"), "left")
      .withColumn("exact_n", coalesce($"exact_n", lit(0L)))
      .select($"word", $"exact_n", $"cm_estimate",
        ($"cm_estimate" - $"exact_n").as("overestimate"))
  }

  val countMinOracle: String = {
    def bucketOf(wh: String, i: String): String =
      s"(($wh * (97 + 31 * $i) + (13 + 17 * $i)) % ${TextHash.P}) % $cmsW"
    val probeValues = cmsProbes.map(p => s"('$p')").mkString(", ")
    Fixtures.oracle(
      s""", cms_words AS (
         SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       cms_counters AS (
         SELECT i, bucket, COUNT(1) AS cnt FROM (
           SELECT CAST(t.i AS INT) AS i,
                  ${bucketOf(TextHash.duckWordHash("w.word"), "t.i")} AS bucket
           FROM cms_words w, UNNEST(range($cmsD)) AS t(i))
         GROUP BY 1, 2),
       cms_probes(word) AS (VALUES $probeValues),
       cms_pb AS (
         SELECT p.word, CAST(t.i AS INT) AS i,
                ${bucketOf(TextHash.duckWordHash("p.word"), "t.i")} AS bucket
         FROM cms_probes p, UNNEST(range($cmsD)) AS t(i)),
       cms_est AS (
         SELECT p.word, MIN(COALESCE(c.cnt, 0)) AS cm_estimate
         FROM cms_pb p
         LEFT JOIN cms_counters c ON p.i = c.i AND p.bucket = c.bucket
         GROUP BY 1),
       cms_exact AS (
         SELECT word, COUNT(1) AS exact_n FROM cms_words
         WHERE word IN (${cmsProbes.map(p => s"'$p'").mkString(", ")})
         GROUP BY 1)
       SELECT e.word, COALESCE(x.exact_n, 0) AS exact_n, e.cm_estimate,
              e.cm_estimate - COALESCE(x.exact_n, 0) AS overestimate
       FROM cms_est e LEFT JOIN cms_exact x ON e.word = x.word""")
  }

  /** Per-language length distribution: exact interpolated p50/p90/p99 of
    * whitespace token counts — the corpus-health dashboard behind length
    * cutoffs. Exact `percentile` (not approx) is intentional: the stratum
    * count is tiny (languages), the per-stratum state is the value
    * multiset, and the DuckDB oracle's quantile_cont uses the same
    * (n-1)p interpolation, so a 4-decimal round compares exactly. */
  def lengthPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .select($"lang", size(split($"text", " ")).cast(LongType).as("n"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(expr("percentile(n, 0.5)"), 4).as("p50"),
        round(expr("percentile(n, 0.9)"), 4).as("p90"),
        round(expr("percentile(n, 0.99)"), 4).as("p99"))
  }

  val lengthPercentilesOracle: String = Fixtures.oracle(
    """SELECT lang, COUNT(1) AS n_docs,
              ROUND(quantile_cont(len(string_split(text, ' ')), 0.5), 4) AS p50,
              ROUND(quantile_cont(len(string_split(text, ' ')), 0.9), 4) AS p90,
              ROUND(quantile_cont(len(string_split(text, ' ')), 0.99), 4) AS p99
       FROM documents
       GROUP BY 1""")

  /** Fixed-window document chunking: split every document into 50-word
    * chunks on a 40-word stride (10-word overlap) — the context-window
    * packing step before tokenization in a training pipeline. A pure
    * narrow transform (split → sequence → explode → slice): no shuffle,
    * runs at scan speed with the ~n_words/stride fan-out bounded per row,
    * so it parallelizes perfectly at 100 TB. Chunk identity is
    * (doc_id, chunk_start), deterministic under any partitioning. */
  def chunk(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .withColumn("words", split($"text", " "))
      .filter(size($"words") > 0)
      .select($"doc_id", $"words",
        explode(expr(
          "transform(sequence(0, cast(ceil(size(words) / 40.0) as int) - 1), i -> i * 40)"))
          .as("st"))
      .withColumn("chunk", expr("slice(words, st + 1, 50)"))
      .select($"doc_id",
        $"st".cast(LongType).as("chunk_start"),
        size($"chunk").cast(LongType).as("n_tokens"),
        array_join($"chunk", " ").as("chunk_text"))
  }

  val chunkOracle: String = Fixtures.oracle(
    """, ch_words AS (
         SELECT doc_id, string_split(text, ' ') AS words FROM documents
         WHERE len(string_split(text, ' ')) > 0)
       SELECT doc_id,
              CAST(st AS BIGINT) AS chunk_start,
              CAST(len(words[st+1:st+50]) AS BIGINT) AS n_tokens,
              array_to_string(words[st+1:st+50], ' ') AS chunk_text
       FROM ch_words, UNNEST(range(0, len(words), 40)) AS t(st)""")

  // =====================================================================
  // Cross-document sequence packing (concat-and-chunk, the GPT-style
  // loader manifest; Brown et al. 2020 appendix B / Raffel et al. 2020
  // "packing" — documents concatenated per source stream and cut into
  // fixed token windows)
  // =====================================================================

  private val packWindow = 256L // tokens per training sequence
  private val packBlock = 4096L // prefix-sum fan-out per level

  /** Per-doc EXCLUSIVE token prefix within its source stream — the one
    * number packing needs — computed as a hierarchical prefix sum so no
    * window ever runs unpartitioned over the corpus (the vocabCoverage
    * discipline, positional flavor): level 0 runs inside a 4096-doc block,
    * level 1 across the ≤4096 blocks of a superblock, level 2 across
    * superblocks — exact for ≤ 4096³ ≈ 6.9·10¹⁰ docs per source (≳100 TB
    * at 1.5 kB/doc; a 4th level extends it mechanically). Long addition is
    * associative, so the decomposition is bit-identical to the one-shot
    * running sum the oracle computes. NULL-source/NULL-text rows are
    * outside any pack stream and are dropped on both sides. */
  private def packPrefix(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = spark.table("documents")
      .filter(col("source").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast(LongType).as("tok"))
      .withColumn("block", expr(s"doc_id DIV $packBlock"))
      .withColumn("sblock", expr(s"block DIV $packBlock"))
    val wL0 = Window.partitionBy(col("source"), col("block")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bt = base.groupBy(col("source"), col("block"))
      .agg(sum(col("tok")).as("bt"))
      .withColumn("sblock", expr(s"block DIV $packBlock"))
    val wL1 = Window.partitionBy(col("source"), col("sblock")).orderBy(col("block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = bt.withColumn("boff", coalesce(sum(col("bt")).over(wL1), lit(0L)))
      .select(col("source"), col("block"), col("boff"))
    val st = bt.groupBy(col("source"), col("sblock")).agg(sum(col("bt")).as("st"))
    val wL2 = Window.partitionBy(col("source")).orderBy(col("sblock"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val soff = st.withColumn("soff", coalesce(sum(col("st")).over(wL2), lit(0L)))
      .select(col("source"), col("sblock"), col("soff"))
    base
      .withColumn("cum0", coalesce(sum(col("tok")).over(wL0), lit(0L)))
      .join(boff, Seq("source", "block"))
      .join(soff, Seq("source", "sblock"))
      .withColumn("cum_before", col("soff") + col("boff") + col("cum0"))
      .select(col("doc_id"), col("source"), col("tok"), col("cum_before"))
  }

  /** The packing manifest a training loader reads: for every document, the
    * first fixed-size token window it lands in (per source stream, window
    * ids source-local) and how many windows it spans. Pure integer
    * arithmetic on the exclusive prefix — window = cum DIV 256 — so both
    * engines agree bit-for-bit. */
  def packManifest(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    packPrefix(spark)
      .select(col("doc_id"), col("source"), col("tok").as("tok_count"),
        expr(s"cum_before DIV $packWindow").as("first_window"),
        (expr(s"(cum_before + tok - 1) DIV $packWindow")
          - expr(s"cum_before DIV $packWindow") + lit(1L)).as("windows_spanned"))
  }

  val packManifestOracle: String = Fixtures.oracle(
    s""", pk AS (
         SELECT doc_id, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
                COALESCE(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                  OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         FROM documents
         WHERE source IS NOT NULL AND text IS NOT NULL)
       SELECT doc_id, source, tok AS tok_count,
              CAST(cum_before // $packWindow AS BIGINT) AS first_window,
              CAST(((cum_before + tok - 1) // $packWindow)
                   - (cum_before // $packWindow) + 1 AS BIGINT) AS windows_spanned
       FROM pk""")

  /** Packing efficiency — the number a data team actually tracks: per
    * source stream, how many training windows the corpus fills, how many
    * documents straddle a window boundary (attention-mask overhead), and
    * the padding wasted in the final partial window. */
  def packStats(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    packPrefix(spark)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        sum(when(expr(s"(cum_before + tok - 1) DIV $packWindow")
          > expr(s"cum_before DIV $packWindow"), 1L).otherwise(0L)).as("crossing_docs"))
      .withColumn("n_windows", expr(s"(total_tokens + ${packWindow - 1}) DIV $packWindow"))
      .withColumn("pad_waste", col("n_windows") * packWindow - col("total_tokens"))
      .withColumn("docs_per_window",
        round(col("n_docs").cast(DoubleType) / col("n_windows").cast(DoubleType), 6))
      .select(col("source"), col("n_docs"), col("total_tokens"), col("n_windows"),
        col("crossing_docs"), col("pad_waste"), col("docs_per_window"))
  }

  val packStatsOracle: String = Fixtures.oracle(
    s""", pk AS (
         SELECT doc_id, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
                COALESCE(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                  OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         FROM documents
         WHERE source IS NOT NULL AND text IS NOT NULL)
       SELECT source, CAST(COUNT(1) AS BIGINT) AS n_docs,
              CAST(SUM(tok) AS BIGINT) AS total_tokens,
              CAST((SUM(tok) + ${packWindow - 1}) // $packWindow AS BIGINT) AS n_windows,
              CAST(SUM(CASE WHEN ((cum_before + tok - 1) // $packWindow)
                                 > (cum_before // $packWindow)
                            THEN 1 ELSE 0 END) AS BIGINT) AS crossing_docs,
              CAST(((SUM(tok) + ${packWindow - 1}) // $packWindow) * $packWindow
                   - SUM(tok) AS BIGINT) AS pad_waste,
              ROUND(CAST(COUNT(1) AS DOUBLE)
                    / CAST((SUM(tok) + ${packWindow - 1}) // $packWindow AS DOUBLE), 6)
                AS docs_per_window
       FROM pk GROUP BY source""")

  /** Table-backed decontamination with a bloom pre-filter: probe n-grams
    * come from a TABLE (here the `src0` slice of the corpus standing in for
    * an eval suite), not a literal list — the realistic shape once the eval
    * union is tens of millions of grams.
    *
    * Scale plan: the probe side aggregates into ONE bloom filter
    * (`graft_bloom_agg`, Catalyst's own bloom sketch, registered for SQL in
    * [[graft.plans.GraftExtensions]]); the scalar subquery broadcasts those
    * few MB to every task, and `graft_might_contain` drops non-matching
    * corpus grams AT THE SCAN — the exact-verify semi join that follows
    * only ever shuffles the bloom's survivors (true hits + the ~1% false
    * positives), not the corpus gram stream. Blooms have no false
    * negatives, so the result is bit-identical to the exact semi join the
    * oracle runs. This is the same plan Spark's runtime row-level filtering
    * injects for selective joins, made explicit and user-controllable. */
  def contaminationBloom(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.plans.DotProduct.register(spark)
    spark.sql(
      """WITH gw AS (
           SELECT doc_id, source, split(text, ' ') AS words FROM documents),
         grams AS (
           SELECT doc_id, source,
                  explode(transform(sequence(0, size(words) - 3),
                          i -> concat(words[i], ' ', words[i+1], ' ', words[i+2]))) AS gram
           FROM gw WHERE size(words) >= 3),
         probe AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
         corpus AS (SELECT doc_id, gram FROM grams WHERE source <> 'src0')
         SELECT c.doc_id,
                COUNT(1) AS n_hits,
                COUNT(DISTINCT c.gram) AS n_probes
         FROM corpus c
         LEFT SEMI JOIN probe p ON c.gram = p.gram
         WHERE graft_might_contain(
                 (SELECT graft_bloom_agg(xxhash64(gram), 8192L) FROM probe),
                 xxhash64(c.gram))
         GROUP BY c.doc_id""")
  }

  val contaminationBloomOracle: String = Fixtures.oracle(
    """, cb_words AS (
         SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
       cb_grams AS (
         SELECT doc_id, source, words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS gram
         FROM cb_words, UNNEST(range(len(words) - 2)) AS t(i)
         WHERE len(words) >= 3)
       SELECT g.doc_id,
              CAST(COUNT(1) AS BIGINT) AS n_hits,
              CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_probes
       FROM cb_grams g
       WHERE g.source <> 'src0'
         AND g.gram IN (SELECT gram FROM cb_grams WHERE source = 'src0')
       GROUP BY g.doc_id""")

  /** Gopher-style repetition filter: per-document repetition signals and a
    * keep/drop verdict — the within-document repetition rules (top-word
    * fraction, duplicate n-gram fraction) a training pipeline applies after
    * dedup and before tokenization.
    *
    * All fractions are integer basis points (`x * 10000 div total`) so the
    * DuckDB comparison is bit-exact. Plan shape: two explode → two-level
    * aggregations, both keyed by doc_id (the second level reuses the
    * partitioning of the first: Catalyst plans the (doc_id, word) →
    * (doc_id) reaggregation without a second exchange), then one join on
    * doc_id — no global state, linear in corpus size at 100 TB. */
  def repetitionFilter(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val docs = spark.table("documents").withColumn("words", split($"text", " "))

    val wordStats = docs
      .select($"doc_id", explode($"words").as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_words"), max($"cnt").as("top_cnt"))

    val gramStats = docs
      .filter(size($"words") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(words) - 2), " +
          "i -> concat(words[i], ' ', words[i+1]))")).as("gram"))
      .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_grams"),
        sum(when($"cnt" >= 2, $"cnt").otherwise(0L)).as("dup_occ"))

    wordStats.join(gramStats, Seq("doc_id"))
      .select(
        $"doc_id",
        expr("top_cnt * 10000 div n_words").as("top_word_bp"),
        expr("dup_occ * 10000 div n_grams").as("dup_2gram_bp"),
        when(expr("top_cnt * 10000 div n_words") < 1200 &&
          expr("dup_occ * 10000 div n_grams") < 800, "keep")
          .otherwise("drop").as("verdict"))
  }

  val repetitionFilterOracle: String = Fixtures.oracle(
    """, rep_words AS (
         SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents),
       rep_wc AS (
         SELECT doc_id, word, COUNT(1) AS cnt FROM rep_words GROUP BY 1, 2),
       rep_wstats AS (
         SELECT doc_id, SUM(cnt) AS n_words, MAX(cnt) AS top_cnt
         FROM rep_wc GROUP BY doc_id),
       rep_dw AS (
         SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       rep_grams AS (
         SELECT doc_id, words[i+1] || ' ' || words[i+2] AS gram
         FROM rep_dw, UNNEST(range(len(words) - 1)) AS t(i)
         WHERE len(words) >= 2),
       rep_gc AS (
         SELECT doc_id, gram, COUNT(1) AS cnt FROM rep_grams GROUP BY 1, 2),
       rep_gstats AS (
         SELECT doc_id, SUM(cnt) AS n_grams,
                SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_occ
         FROM rep_gc GROUP BY doc_id)
       SELECT w.doc_id,
              CAST(w.top_cnt * 10000 // w.n_words AS BIGINT) AS top_word_bp,
              CAST(g.dup_occ * 10000 // g.n_grams AS BIGINT) AS dup_2gram_bp,
              CASE WHEN w.top_cnt * 10000 // w.n_words < 1200
                    AND g.dup_occ * 10000 // g.n_grams < 800
                   THEN 'keep' ELSE 'drop' END AS verdict
       FROM rep_wstats w JOIN rep_gstats g ON w.doc_id = g.doc_id""")

  /** PII patterns shared by the Spark pipeline and the DuckDB oracle. Kept
    * to constructs whose semantics are identical in Java regex and RE2
    * (character classes, +, bounded repetition — no backreferences or
    * lookaround, which RE2 lacks). */
  val emailPattern: String = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
  val phonePattern: String = "555-[0-9]{4}"

  /** PII redaction: detect and mask email/phone spans over the
    * `documents_pii` fixture view (the corpus with deterministic synthetic
    * PII injected — the raw corpus has none, and a redactor whose match
    * branch never fires is untested; see Fixtures `documents_pii`).
    *
    * Pure per-row regex projection — scan-speed at 100 TB, no shuffle, and
    * the redacted text itself is reduced to SHA-256 + length so the full
    * corpus never leaves the scan stage in the result. */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents_pii")
      .withColumn("redacted",
        regexp_replace(regexp_replace($"text", lit(emailPattern), lit("<EMAIL>")),
          lit(phonePattern), lit("<PHONE>")))
      .select(
        $"doc_id",
        regexp_count($"text", lit(emailPattern)).cast(LongType).as("n_emails"),
        regexp_count($"text", lit(phonePattern)).cast(LongType).as("n_phones"),
        length($"redacted").cast(LongType).as("redacted_len"),
        sha2($"redacted", 256).as("redacted_sha"))
  }

  val piiRedactOracle: String = Fixtures.oracle(
    s""", pii_red AS (
         SELECT doc_id, text,
                regexp_replace(regexp_replace(text, '$emailPattern', '<EMAIL>', 'g'),
                               '$phonePattern', '<PHONE>', 'g') AS redacted
         FROM documents_pii)
       SELECT doc_id,
              CAST(len(regexp_extract_all(text, '$emailPattern')) AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(text, '$phonePattern')) AS BIGINT) AS n_phones,
              CAST(length(redacted) AS BIGINT) AS redacted_len,
              sha256(redacted) AS redacted_sha
       FROM pii_red""")

  /** BM25 query terms (fixed literal set, like [[contamination]]'s probes):
    * the retrieval surface is parameterized by the caller; a FIXED query
    * budget keeps the scoring join O(corpus), never O(corpus × queries). */
  val bm25Terms: Seq[String] = Seq("spark", "join", "window")

  /** BM25 keyword retrieval (Robertson/Spärck Jones, the standard
    * training-data search/ranking primitive): top-20 documents for a fixed
    * query term set, k1 = 1.2, b = 0.75.
    *
    * Scale shape: the exploded token stream is filtered to the query terms
    * SCAN-SIDE (the match fraction is vanishing, as in [[contamination]]),
    * so the (doc, term, tf) aggregate shuffles only matching tokens; df and
    * the corpus stats (N, avgdl) are 1-row/term-count broadcasts; the final
    * per-document combine adds a FIXED number of per-term scores in literal
    * order, so no double-sum reorder can flip a bit. The idf uses the
    * rational (N − df + ½)/(df + ½) form — division and multiply only
    * (IEEE-exact-rounded, bit-identical across engines), no ln() whose libm
    * rounding could diverge. Only top-k ordering needs the score, so ties
    * break on doc_id for determinism. */
  def bm25Search(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    bm25(spark.table("documents"), bm25Terms)
  }

  /** The per-(doc, term) BM25 score frame, shared by the sum-combined
    * ranking ([[bm25]]) and the rank-fused one ([[rrfFusion]]) — one
    * definition of the scoring arithmetic. */
  private[queries] def bm25Scored(documents: DataFrame, terms: Seq[String]): DataFrame = {
    import documents.sparkSession.implicits._
    val docs = documents
      .select($"doc_id", size(split($"text", " ")).cast(LongType).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n"), sum($"dl").as("total_dl"))

    val tf = documents
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .filter($"word".isin(terms: _*))
      .groupBy($"doc_id", $"word")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))

    tf
      .join(broadcast(df), Seq("word"))
      .join(docs, Seq("doc_id"))
      .join(broadcast(stats))
      .withColumn("avgdl", $"total_dl".cast(DoubleType) / $"n".cast(DoubleType))
      .withColumn("idf",
        (($"n" - $"df").cast(DoubleType) + lit(0.5)) / ($"df".cast(DoubleType) + lit(0.5)))
      .withColumn("sc",
        $"idf" * ($"tf".cast(DoubleType) * lit(2.2)) /
          ($"tf".cast(DoubleType) +
            lit(1.2) * (lit(0.25) + lit(0.75) * ($"dl".cast(DoubleType) / $"avgdl"))))
  }

  /** The scoring pipeline itself, factored for spec-level testing on
    * hand-built frames: (doc_id, text) + query terms → top-20 (doc_id,
    * score). */
  def bm25(documents: DataFrame, terms: Seq[String]): DataFrame = {
    import documents.sparkSession.implicits._
    val scored = bm25Scored(documents, terms)

    // per-term sums see at most ONE row each ((doc, word) is unique after
    // the tf aggregate), so the only true addition is the fixed-order
    // coalesce chain below — order-independent by construction
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when($"word" === t, $"sc")).as(s"s_$i")
    }
    scored.groupBy($"doc_id")
      .agg(perTerm.head, perTerm.tail: _*)
      .withColumn("score",
        terms.indices.map(i => coalesce(col(s"s_$i"), lit(0.0))).reduce(_ + _))
      .orderBy($"score".desc, $"doc_id")
      .limit(20)
      .select($"doc_id", round($"score", 6).as("score"))
  }

  /** The per-(doc, term) BM25 score CTE chain ending at
    * `scored(doc_id, word, sc)` — the oracle twin of [[bm25Scored]], shared
    * by the sum-combined and rank-fused oracles. */
  private def bm25ScoredCtes: String = {
    val terms = bm25Terms.map(t => s"'$t'").mkString(", ")
    s""", dls AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                  FROM documents),
        stats AS (SELECT COUNT(1) AS n, SUM(dl) AS total_dl FROM dls),
        tf AS (SELECT doc_id, word, COUNT(1) AS tf
               FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
               WHERE word IN ($terms)
               GROUP BY 1, 2),
        df AS (SELECT word, COUNT(1) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT t.doc_id, t.word,
                 ((CAST(s.n - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
                   * (CAST(t.tf AS DOUBLE) * 2.2)
                   / (CAST(t.tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE)
                                              / (CAST(s.total_dl AS DOUBLE) / CAST(s.n AS DOUBLE))))) AS sc
          FROM tf t
          JOIN df d ON t.word = d.word
          JOIN dls l ON t.doc_id = l.doc_id
          CROSS JOIN stats s)"""
  }

  val bm25SearchOracle: String = {
    val caseSums = bm25Terms.zipWithIndex
      .map { case (t, i) => s"SUM(CASE WHEN word = '$t' THEN sc END) AS s_$i" }
      .mkString(", ")
    val total = bm25Terms.indices.map(i => s"COALESCE(s_$i, 0.0)").mkString(" + ")
    Fixtures.oracle(bm25ScoredCtes +
      s""",
          combined AS (SELECT doc_id, $caseSums FROM scored GROUP BY 1)
       SELECT doc_id, ROUND($total, 6) AS score
       FROM combined
       ORDER BY $total DESC, doc_id
       LIMIT 20""")
  }

  /** Reciprocal-rank fusion of the per-term result lists (Cormack, Clarke
    * & Büttcher, SIGIR'09): each query term produces its own top-20
    * ranking by single-term BM25 score, and the fused score of a document
    * is Σ_lists ⌊10⁶/(60 + rank)⌋ — the k=60 RRF constant, integerized so
    * the fusion is bit-exact (score-sum combination, [[bm25]], is the
    * thing RRF was published to beat: ranks are comparable across lists,
    * raw scores are not).
    *
    * Scale shape: the scored frame is the shared [[bm25Scored]] posting
    * computation; each per-term top-20 is ONE filter + TakeOrdered pass —
    * the per-list cost is bounded by the FIXED query budget (|terms|
    * passes), never a per-term corpus-sized window (a ranking window
    * partitioned by term would inherit the full posting list of a
    * frequent term — the r4 WindowExec class). The rank window that does
    * run sits above a ≤20-row post-limit frame (the bpeTopPairs bounded
    * class). Fusion itself is a ≤|terms|·20-row integer aggregate. */
  def rrfFusion(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val scored = bm25Scored(spark.table("documents"), bm25Terms)

    val perTerm = bm25Terms.map { t =>
      scored.filter($"word" === t)
        .orderBy($"sc".desc, $"doc_id")
        .limit(20)
        // BOUNDED global window: the frame above is post-limit (≤ 20 rows)
        .withColumn("rank", row_number().over(Window.orderBy($"sc".desc, $"doc_id"))
          .cast(LongType))
        .select($"doc_id", lit(t).as("term"), $"rank")
    }.reduce(_ union _)

    perTerm
      .withColumn("rr", expr("CAST(1000000 AS BIGINT) DIV (60 + rank)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_lists"), sum($"rr").as("rrf_e6"))
      .orderBy($"rrf_e6".desc, $"doc_id")
      .limit(20)
  }

  val rrfFusionOracle: String = {
    val lists = bm25Terms.zipWithIndex.map { case (t, i) =>
      s""", rrf_l$i AS (
           SELECT doc_id, '$t' AS term,
                  ROW_NUMBER() OVER (ORDER BY sc DESC, doc_id) AS rank
           FROM scored WHERE word = '$t'
           ORDER BY sc DESC, doc_id LIMIT 20)"""
    }.mkString("\n")
    val union = bm25Terms.indices.map(i => s"SELECT * FROM rrf_l$i")
      .mkString(" UNION ALL ")
    Fixtures.oracle(bm25ScoredCtes + lists +
      s""",
         rrf_all AS ($union)
       SELECT doc_id, COUNT(1) AS n_lists,
              CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_e6
       FROM rrf_all
       GROUP BY 1
       ORDER BY rrf_e6 DESC, doc_id
       LIMIT 20""")
  }

  /** Per-document TF-IDF keyword extraction: top-3 terms per document by
    * tf × (N+1)/(df+1) — the rational idf (no ln(), same bit-determinism
    * argument as [[bm25Search]]). The (doc, word) tf aggregate is the one
    * corpus-sized shuffle; df re-aggregates the tf frame and joins back as a
    * plain SHUFFLE join on the word key — the df frame is vocabulary-sized
    * (Heaps' law: 10⁸-10⁹ distinct tokens at web scale, typos/URLs/ids), so
    * it must never be broadcast; the only broadcast is the 1-row corpus
    * count. The top-3 window partitions BY DOCUMENT, so every
    * window is bounded by a single document's vocabulary — no global sort,
    * no whole-corpus partition (the r4 WindowExec lesson). Ties break on the
    * word itself for a deterministic keyword set. */
  def keywordTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val tf = spark.table("documents")
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .groupBy($"doc_id", $"word")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val n = spark.table("documents").agg(count(lit(1)).as("n"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"sc".desc, $"word")
    tf.join(df, Seq("word"))
      .join(broadcast(n))
      .withColumn("sc",
        $"tf".cast(DoubleType) *
          (($"n" + lit(1L)).cast(DoubleType) / ($"df" + lit(1L)).cast(DoubleType)))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter($"rank" <= 3)
      .select($"doc_id", $"word".as("keyword"), $"rank", round($"sc", 6).as("score"))
  }

  val keywordTfidfOracle: String = Fixtures.oracle(
    """, tf AS (SELECT doc_id, word, COUNT(1) AS tf
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
                GROUP BY 1, 2),
       df AS (SELECT word, COUNT(1) AS df FROM tf GROUP BY 1),
       n AS (SELECT COUNT(1) AS n FROM documents),
       scored AS (
         SELECT t.doc_id, t.word,
                CAST(t.tf AS DOUBLE) * (CAST(n.n + 1 AS DOUBLE) / CAST(d.df + 1 AS DOUBLE)) AS sc,
                ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                   ORDER BY CAST(t.tf AS DOUBLE) * (CAST(n.n + 1 AS DOUBLE) / CAST(d.df + 1 AS DOUBLE)) DESC,
                                            t.word) AS rank
         FROM tf t JOIN df d ON t.word = d.word CROSS JOIN n)
       SELECT doc_id, word AS keyword, CAST(rank AS BIGINT) AS rank, ROUND(sc, 6) AS score
       FROM scored WHERE rank <= 3""")

  /** Corpus n-gram language-model counts (the classic MapReduce LM
    * workload): word bigrams with count and document frequency, top-100 by
    * count. ONE shuffle keyed on the bigram itself (map-side combined), so
    * hot grams are the only skew surface (salt via util.Salted if a corpus
    * has a degenerate header); the top-k is a TakeOrderedAndProject over the
    * vocabulary²-sized aggregate, never a global sort of the corpus. Ties
    * break on the gram text. */
  def ngramCounts(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .withColumn("words", split($"text", " "))
      .filter(size($"words") >= 2)
      .select($"doc_id", explode(expr(bigramConcatSql))
        .as("bigram"))
      .groupBy($"bigram")
      .agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("n_docs"))
      .orderBy($"n".desc, $"bigram")
      .limit(100)
  }

  val ngramCountsOracle: String = Fixtures.oracle(
    """, dw AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents
                WHERE len(string_split(text, ' ')) >= 2),
       grams AS (
         SELECT doc_id, words[i+1] || ' ' || words[i+2] AS bigram
         FROM dw, UNNEST(range(len(words) - 1)) AS t(i))
       SELECT bigram, COUNT(1) AS n, COUNT(DISTINCT doc_id) AS n_docs
       FROM grams
       GROUP BY 1
       ORDER BY n DESC, bigram
       LIMIT 100""")

  /** Collocation mining by pointwise mutual information — the classic
    * corpus-statistics workload (word2vec-era count pipelines): bigrams
    * whose observed frequency beats the independence expectation,
    * `P(xy)/(P(x)P(y))`, reported as the raw likelihood RATIO (= e^PMI; the
    * log is monotone, so ranking is unchanged and the score stays inside
    * the cross-engine-exact +,×,÷ arithmetic — ln() would diverge by libm
    * rounding, the [[bm25Search]] lesson).
    *
    * Scale shape: one bigram-keyed shuffle + one unigram-keyed shuffle,
    * both map-side combined; the two unigram-count joins are VOCABULARY
    * joins and therefore plain shuffle joins on the word key — never
    * broadcast (Heaps' law; the keywordTfidf rule). Only the two 1-row
    * totals broadcast. The ≥5 count floor drops the hapax tail before the
    * joins; the final top-50 is a TakeOrderedAndProject over the surviving
    * collocation aggregate, never a global sort of the corpus.
    *
    * Ratio arithmetic: `((cxy·nu)·nu) / ((cx·cy)·nb)` with explicit
    * parenthesization, each IEEE op exact-rounded identically in both
    * engines; counts convert exactly to double below 2^53. */
  def bigramPmi(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val words = spark.table("documents")
      .select(explode(split($"text", " ")).as("word"))
    val uni = words.groupBy($"word").agg(count(lit(1)).as("c"))
    val nu = uni.agg(sum($"c").as("nu"))

    val biAll = spark.table("documents")
      .withColumn("words", split($"text", " "))
      .filter(size($"words") >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(words) - 2), i -> struct(words[i] AS x, words[i+1] AS y))"))
        .as("p"))
      .select($"p.x", $"p.y")
      .groupBy($"x", $"y").agg(count(lit(1)).as("cxy"))
    // nb is the UNFLOORED bigram total: P(xy) = cxy/nb must be a fraction
    // of all bigram occurrences — totalling only the ≥5 survivors would
    // inflate every ratio by the floored-out mass (constant-factor, so the
    // oracle can't catch it if it mirrors the mistake)
    val nb = biAll.agg(sum($"cxy").as("nb"))
    val bi = biAll.filter($"cxy" >= 5)

    bi
      .join(uni.select($"word".as("x"), $"c".as("cx")), Seq("x"))
      .join(uni.select($"word".as("y"), $"c".as("cy")), Seq("y"))
      .join(broadcast(nu)).join(broadcast(nb))
      .withColumn("pmi_ratio", round(
        (($"cxy".cast(DoubleType) * $"nu".cast(DoubleType)) * $"nu".cast(DoubleType)) /
          ((($"cx".cast(DoubleType) * $"cy".cast(DoubleType)) * $"nb".cast(DoubleType))), 6))
      .select(concat($"x", lit(" "), $"y").as("bigram"), $"cxy".as("n"), $"pmi_ratio")
      .orderBy($"pmi_ratio".desc, $"bigram")
      .limit(50)
  }

  val bigramPmiOracle: String = Fixtures.oracle(
    """, pmi_words AS (
         SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       pmi_uni AS (SELECT word, COUNT(1) AS c FROM pmi_words GROUP BY 1),
       pmi_nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM pmi_uni),
       pmi_dw AS (SELECT string_split(text, ' ') AS words FROM documents
                  WHERE len(string_split(text, ' ')) >= 2),
       pmi_bi_all AS (
         SELECT words[i+1] AS x, words[i+2] AS y, COUNT(1) AS cxy
         FROM pmi_dw, UNNEST(range(len(words) - 1)) AS t(i)
         GROUP BY 1, 2),
       pmi_nb AS (SELECT CAST(SUM(cxy) AS BIGINT) AS nb FROM pmi_bi_all),
       pmi_bi AS (SELECT * FROM pmi_bi_all WHERE cxy >= 5)
       SELECT b.x || ' ' || b.y AS bigram, b.cxy AS n,
              ROUND(((CAST(b.cxy AS DOUBLE) * CAST(n1.nu AS DOUBLE)) * CAST(n1.nu AS DOUBLE))
                    / (((CAST(ux.c AS DOUBLE) * CAST(uy.c AS DOUBLE)) * CAST(n2.nb AS DOUBLE))), 6) AS pmi_ratio
       FROM pmi_bi b
       JOIN pmi_uni ux ON b.x = ux.word
       JOIN pmi_uni uy ON b.y = uy.word
       CROSS JOIN pmi_nu n1 CROSS JOIN pmi_nb n2
       ORDER BY pmi_ratio DESC, bigram
       LIMIT 50""")

  /** Vocabulary coverage (tokenizer-prep shape): terms ranked by corpus
    * frequency with the CUMULATIVE token-coverage fraction — "how big must
    * the vocabulary be to cover X% of tokens", ordered deterministically by
    * (count desc, term).
    *
    * The global rank + running sum are HIERARCHICALLY DECOMPOSED so that no
    * window ever runs unpartitioned over the vocabulary (which grows with
    * the corpus under Heaps' law — 10^8-10^9 distinct tokens at 100 TB; the
    * same reasoning that killed the keywordTfidf broadcast in r7). Integer
    * addition is associative, so the decomposition is bit-identical to the
    * one-shot window and the oracle is unchanged:
    *
    *   level 0  per-(n, 2-char term prefix) bucket: row_number by term.
    *            Byte-wise string order means term1 < term2 ⟹ prefix(term1)
    *            ≤ prefix(term2), so buckets are contiguous slices of the
    *            global (n desc, term) order.
    *   level 1  offsets across prefixes within an exact count n: window
    *            partitioned by n, ≤ |charset|² rows per partition.
    *   level 2  offsets across distinct counts within a power-of-two bin
    *            (floor(log2 n) — monotone in n, so bins are contiguous
    *            count ranges): window partitioned by bin.
    *   level 3  offsets across the ≤ 64 bins (provably bounded by the long
    *            width): a triangular self-join over ≤ 64 rows — no window.
    *
    * The level-1/2 offset tables grow with the vocabulary, so they join by
    * SHUFFLE on (n, p) / (n); only the 64-row bin table and the 1-row
    * corpus total broadcast. The fraction divides two exact longs per row,
    * so both engines agree bit-for-bit. */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = spark.table("documents")
      .select(explode(split($"text", " ")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum($"n").as("total"))

    // level 0: in-bucket rank; every row in a (n, p) bucket carries the
    // same count n, so its cumulative-sum contribution is just n·rank_in
    val rows = counts.withColumn("p", substring($"term", 1, 2))
    val wA = Window.partitionBy($"n", $"p").orderBy($"term")
    val ranked = rows.withColumn("rank_in", row_number().over(wA).cast(LongType))

    // level 1: bucket sizes, then offsets across prefixes within each n
    val b1 = rows.groupBy($"n", $"p").agg(count(lit(1)).as("cnt"))
    val wB = Window.partitionBy($"n").orderBy($"p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bOff = b1
      .withColumn("p_off", coalesce(sum($"cnt").over(wB), lit(0L)))
      .select($"n", $"p", $"p_off")

    // level 2: per-count totals, offsets across counts within a log2 bin
    val n1 = b1.groupBy($"n").agg(sum($"cnt").as("cnt_n"))
      .withColumn("nsum_n", $"n" * $"cnt_n")
      .withColumn("bin", floor(log2($"n")).cast(LongType))
    val wC = Window.partitionBy($"bin").orderBy($"n".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val nOff = n1
      .withColumn("n_off_cnt", coalesce(sum($"cnt_n").over(wC), lit(0L)))
      .withColumn("n_off_nsum", coalesce(sum($"nsum_n").over(wC), lit(0L)))
      .select($"n", $"bin", $"n_off_cnt", $"n_off_nsum")

    // level 3: offsets across the ≤ 64 bins (bounded by the bit width of a
    // long, not by the corpus) — a ≤ 64×64 triangular self-join instead of
    // a window, so no unpartitioned WindowExec anywhere in the plan
    val bins = n1.groupBy($"bin")
      .agg(sum($"cnt_n").as("cnt_b"), sum($"nsum_n").as("nsum_b"))
    val binOff = bins.as("b")
      .join(bins.select($"bin".as("h_bin"), $"cnt_b".as("h_cnt"),
        $"nsum_b".as("h_nsum")), $"h_bin" > $"b.bin", "left")
      .groupBy($"b.bin".as("bin"))
      .agg(coalesce(sum($"h_cnt"), lit(0L)).as("bin_off_cnt"),
        coalesce(sum($"h_nsum"), lit(0L)).as("bin_off_nsum"))

    // compose one (n, p)-keyed offset table; vocabulary-growing frames
    // join by shuffle, only the 64-row bin table broadcasts
    val offs = bOff
      .join(nOff, Seq("n"))
      .join(broadcast(binOff), Seq("bin"))
      .select($"n", $"p",
        ($"p_off" + $"n_off_cnt" + $"bin_off_cnt").as("rank_off"),
        ($"n" * $"p_off" + $"n_off_nsum" + $"bin_off_nsum").as("nsum_off"))

    ranked
      .join(offs, Seq("n", "p"))
      .join(broadcast(total))
      .withColumn("rank", $"rank_off" + $"rank_in")
      .withColumn("cum_n", $"nsum_off" + $"n" * $"rank_in")
      .select($"rank", $"term", $"n",
        round($"cum_n".cast(DoubleType) / $"total".cast(DoubleType), 6).as("coverage"))
  }

  val vocabCoverageOracle: String = Fixtures.oracle(
    """, counts AS (
         SELECT term, COUNT(1) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
         GROUP BY 1),
       t AS (SELECT SUM(n) AS total FROM counts)
       SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank,
              term, n,
              ROUND(CAST(SUM(n) OVER (ORDER BY n DESC, term
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                    / CAST(t.total AS DOUBLE), 6) AS coverage
       FROM counts, t""")

  /** End-to-end pre-training data funnel — the whole curation pipeline as
    * ONE declarative plan, reporting (docs, tokens) surviving each stage:
    *
    *   0 all → 1 exact dedup → 2 winnow near-dup → 3 quality
    *     → 4 decontaminated → 5 domain mix
    *
    * Composition rules are the deterministic ones each stage already uses
    * standalone: exact dedup keeps the min doc_id per SHA-256 group; the
    * near-dup stage drops any document that winnow-pairs with a LOWER
    * doc_id (Dedup.winnow's pair set, shared memo — survivor choice is
    * order-free); quality re-uses [[corpusCuration]]'s predicates;
    * decontamination anti-joins documents containing any
    * [[contaminationProbes]] gram; the mix stage applies
    * [[Sampling]]'s Knuth-hash Bernoulli rates per language.
    *
    * Scale shape: ONE pass. Each stage contributes a doc_id-keyed marker
    * set (sha canonical ids, winnow near-dup ids, quality survivors, probe
    * hits); the funnel outer-joins the four markers onto the doc spine and
    * computes all six stage counts in a SINGLE aggregation over cumulative
    * flag conjunctions (a UNION-of-six-aggregates form would re-execute
    * every stage chain per branch — 6 chains instead of 1). Document text
    * never re-shuffles: every join carries 8-byte ids plus booleans.
    *
    * The per-doc stage flags live in [[funnelFlags]], shared with
    * [[corpusBuild]] (the materialization), so the report can never desync
    * from the corpus it describes. Memoized: both consumers trigger the
    * winnow self-join and the contamination gram explode, the two
    * expensive legs. */
  private def funnelFlags(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.cached(spark, sfDir, "funnel_flags") {
      import spark.implicits._
      val docs = spark.table("documents")
        .select($"doc_id", $"lang", size(split($"text", " ")).cast(LongType).as("n_words"))

      val canonical = canonicalDocIds(spark).withColumn("c1", lit(1))

      val nearDups = Dedup.winnow(spark, sfDir).select($"doc_b".as("doc_id")).distinct()
        .withColumn("c2", lit(1))

      val qualityOk = curationBar(curationSignals(spark))
        .select($"doc_id", lit(1).as("c3"))

      val contaminated = probeGramHits(spark)
        .select($"doc_id").distinct()
        .withColumn("c4", lit(1))

      val rateCol = Sampling.stratumRatesBp.foldLeft(lit(Sampling.defaultRateBp)) {
        case (acc, (lang, bp)) => when($"lang" === lang, lit(bp)).otherwise(acc)
      }
      docs
        .join(canonical, Seq("doc_id"), "left_outer")
        .join(nearDups, Seq("doc_id"), "left_outer")
        .join(qualityOk, Seq("doc_id"), "left_outer")
        .join(contaminated, Seq("doc_id"), "left_outer")
        .withColumn("s1", $"c1".isNotNull)
        .withColumn("s2", $"s1" && $"c2".isNull)
        .withColumn("s3", $"s2" && $"c3".isNotNull)
        .withColumn("s4", $"s3" && $"c4".isNull)
        .withColumn("s5", $"s4" &&
          (expr(Sampling.bucketExprSql("doc_id")) % 10000L).cast(LongType) <
            rateCol.cast(LongType))
        .select($"doc_id", $"lang", $"n_words", $"s1", $"s2", $"s3", $"s4", $"s5")
    }

  def pretrainFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val flagged = funnelFlags(spark, sfDir)

    def nAt(f: org.apache.spark.sql.Column) = sum(when(f, 1L).otherwise(0L))
    def tAt(f: org.apache.spark.sql.Column) = sum(when(f, $"n_words").otherwise(0L))
    flagged
      .agg(
        count(lit(1)).as("n0"), sum($"n_words").as("t0"),
        nAt($"s1").as("n1"), tAt($"s1").as("t1"),
        nAt($"s2").as("n2"), tAt($"s2").as("t2"),
        nAt($"s3").as("n3"), tAt($"s3").as("t3"),
        nAt($"s4").as("n4"), tAt($"s4").as("t4"),
        nAt($"s5").as("n5"), tAt($"s5").as("t5"))
      .select(expr(
        """stack(6,
             0L, 'all',            n0, t0,
             1L, 'exact_dedup',    n1, t1,
             2L, 'near_dedup',     n2, t2,
             3L, 'quality',        n3, t3,
             4L, 'decontaminated', n4, t4,
             5L, 'domain_mix',     n5, t5) AS (stage_id, stage, n_docs, n_tokens)"""))
  }

  /** The funnel CTE chain (through the per-stage survivor sets f_s1..f_s5),
    * shared by the funnel and corpus-build oracles — the SQL twin of the
    * [[funnelFlags]] sharing on the Spark side. */
  private val funnelOracleCtes: String = {
    val probes = contaminationProbes.map(p => s"'$p'").mkString(", ")
    Dedup.winnowOracleCtes +
      s""", f_docs AS (
           SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
           FROM documents),
         f_s1 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
         f_s2 AS (SELECT doc_id FROM f_s1
                  WHERE doc_id NOT IN (SELECT doc_b FROM w_pairs)),
         f_sig AS (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
                  CAST(${stopCountDuck("text")} AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
                  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq
           FROM documents),
         f_quality AS (
           SELECT doc_id
           FROM (SELECT doc_id, n_words, stop_ratio,
                        LEAST(1.0, n_words / 200.0) * 0.4
                          + LEAST(1.0, stop_ratio * 10.0) * 0.3
                          + (n_uniq / n_words) * 0.3 AS quality
                 FROM f_sig) q
           WHERE q.quality >= 0.5 AND q.stop_ratio >= 0.04
             AND q.n_words BETWEEN 10.0 AND 150.0),
         f_s3 AS (SELECT doc_id FROM f_s2 WHERE doc_id IN (SELECT doc_id FROM f_quality)),
         f_contam AS (
           SELECT DISTINCT doc_id
           FROM (SELECT doc_id, words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS gram
                 FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
                       WHERE len(string_split(text, ' ')) >= 3) dw,
                      UNNEST(range(len(words) - 2)) AS t(i)) g
           WHERE gram IN ($probes)),
         f_s4 AS (SELECT doc_id FROM f_s3 WHERE doc_id NOT IN (SELECT doc_id FROM f_contam)),
         f_s5 AS (
           SELECT d.doc_id FROM f_s4 s JOIN f_docs d ON s.doc_id = d.doc_id
           WHERE (${Sampling.bucketExprSql("d.doc_id")}) % 10000
                 < ${Sampling.rateCaseSql("d.lang")})"""
  }

  val pretrainFunnelOracle: String =
    Fixtures.oracle(funnelOracleCtes +
      s"""
         SELECT CAST(0 AS BIGINT) AS stage_id, 'all' AS stage,
                COUNT(1) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS n_tokens FROM f_docs
         UNION ALL
         SELECT 1, 'exact_dedup', COUNT(1), CAST(SUM(d.n_words) AS BIGINT)
         FROM f_s1 s JOIN f_docs d ON s.doc_id = d.doc_id
         UNION ALL
         SELECT 2, 'near_dedup', COUNT(1), CAST(SUM(d.n_words) AS BIGINT)
         FROM f_s2 s JOIN f_docs d ON s.doc_id = d.doc_id
         UNION ALL
         SELECT 3, 'quality', COUNT(1), CAST(SUM(d.n_words) AS BIGINT)
         FROM f_s3 s JOIN f_docs d ON s.doc_id = d.doc_id
         UNION ALL
         SELECT 4, 'decontaminated', COUNT(1), CAST(SUM(d.n_words) AS BIGINT)
         FROM f_s4 s JOIN f_docs d ON s.doc_id = d.doc_id
         UNION ALL
         SELECT 5, 'domain_mix', COUNT(1), CAST(SUM(d.n_words) AS BIGINT)
         FROM f_s5 s JOIN f_docs d ON s.doc_id = d.doc_id""")

  /** The capstone materialization: the corpus the funnel REPORTS on, as a
    * per-document survivor manifest with the two assignments a training
    * loader needs — the leakage-free content-hash train/holdout split (the
    * [[graft.queries.Sampling.trainHoldoutSplit]] rule: duplicate text
    * always lands on one side) and the deterministic Knuth-hash shard
    * (the [[graft.operators.Layout]] export contract, 8 shards). A user of
    * the engine runs the funnel to AUDIT attrition and corpus_build to
    * EMIT the corpus; both consume the same memoized [[funnelFlags]]
    * frame, so the report can never desync from the materialization.
    *
    * Scale shape: the flag frame's joins are all doc-id equi-joins (the
    * funnel's audited shape); on top of it this adds ONE more doc-id
    * equi-join (for the content hash) and two scan-side hash projections —
    * no new shuffles beyond the join, no windows, nothing driver-side.
    * The output is survivor-sized and ready for
    * `Layout.writeSharded`-style export. */
  def corpusBuild(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    funnelFlags(spark, sfDir)
      .filter($"s5")
      .join(spark.table("documents")
        .select($"doc_id", sha2($"text", 256).as("content_sha")), Seq("doc_id"))
      .withColumn("split", Sampling.splitCol($"content_sha"))
      .withColumn("shard",
        (expr(Sampling.bucketExprSql("doc_id")) % 8L).cast(LongType))
      .select($"doc_id", $"lang", $"n_words", $"split", $"shard")
  }

  val corpusBuildOracle: String =
    Fixtures.oracle(funnelOracleCtes +
      s"""
         SELECT d.doc_id, d.lang, d.n_words,
                ${Sampling.splitCaseSql("sha256(t.text)")} AS split,
                CAST((${Sampling.bucketExprSql("d.doc_id")}) % 8 AS BIGINT) AS shard
         FROM f_s5 s
         JOIN f_docs d ON s.doc_id = d.doc_id
         JOIN documents t ON d.doc_id = t.doc_id""")

  /** N-gram LM fluency score — the perplexity-proxy quality signal a
    * curation pipeline computes from the corpus's OWN statistics: per
    * document, the average scaled conditional bigram frequency
    * avg_g⌊10⁶ · cnt(w₁w₂) / cnt(w₁·)⌋ (how "expected" each next word is
    * given the corpus LM). Deliberately ln-free AND division-exact: each
    * per-gram score is an INTEGER (floor division), the per-doc total is an
    * integer sum, and the final average is one more floor division — no
    * floating-point accumulation anywhere, so the oracle matches
    * bit-for-bit regardless of row order.
    *
    * Scale shape: BOTH count joins are SHUFFLE joins on their gram/head
    * keys (inverted-index pattern, same as [[ngramCounts]]) — the bigram
    * vocabulary is V²-shaped, and the unigram head-count frame is still
    * vocabulary-sized (Heaps' law is sublinear, not bounded: a web corpus
    * has 10⁸-10⁹ distinct tokens), so neither may broadcast. Then ONE
    * map-side-combined per-doc aggregate. Documents under 2 words have no
    * bigrams and drop out identically in both engines. */
  def lmFluency(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.util.Memo.cached(spark, sfDir, "lm_fluency") {
    import spark.implicits._
    val grams = spark.table("documents")
      .withColumn("words", split($"text", " "))
      .filter(size($"words") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(words) - 2), " +
          "i -> struct(words[i] AS head, concat(words[i], ' ', words[i+1]) AS gram))"))
        .as("g"))
      .select($"doc_id", $"g.head", $"g.gram")

    val bigCnt = grams.groupBy($"gram").agg(count(lit(1)).as("big_n"))
    val headCnt = grams.groupBy($"head").agg(count(lit(1)).as("head_n"))

    grams
      .join(bigCnt, Seq("gram"))
      .join(headCnt, Seq("head"))
      .select($"doc_id", expr("(big_n * 1000000L) DIV head_n").as("g_score"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"), sum($"g_score").as("total"))
      .select($"doc_id", $"n_grams", expr("total DIV n_grams").as("fluency"))
    }
  }

  /** THE fluency oracle CTE chain, name-prefixed so multiple consumers can
    * coexist in one WITH block — ends at `<p>fl(doc_id, n_grams, fluency)`.
    * One definition behind one helper: the lmFluency, DoReMi, and CCNet
    * oracles all assert the SAME arithmetic, so an edit to the fluency
    * formula cannot desync them (the shared-builder discipline). */
  private[queries] def fluencyCtes(p: String): String =
    s""", ${p}grams AS (
         SELECT doc_id, words[i+1] AS head, words[i+1] || ' ' || words[i+2] AS gram
         FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
               WHERE len(string_split(text, ' ')) >= 2) dw,
              UNNEST(range(len(words) - 1)) AS t(i)),
       ${p}big AS (SELECT gram, COUNT(1) AS big_n FROM ${p}grams GROUP BY 1),
       ${p}head AS (SELECT head, COUNT(1) AS head_n FROM ${p}grams GROUP BY 1),
       ${p}fl AS (
         SELECT g.doc_id,
                COUNT(1) AS n_grams,
                CAST(SUM((b.big_n * 1000000) // h.head_n) // COUNT(1) AS BIGINT) AS fluency
         FROM ${p}grams g
         JOIN ${p}big b ON g.gram = b.gram
         JOIN ${p}head h ON g.head = h.head
         GROUP BY 1)"""

  val lmFluencyOracle: String = Fixtures.oracle(fluencyCtes("lm_") +
    """
       SELECT doc_id, n_grams, fluency FROM lm_fl""")

  /** Model-based quality scoring — the fastText-classifier curation stage
    * (DCLM / FineWeb-Edu filter corpora with a linear bag-of-words
    * classifier; its inference is exactly this shape: hash each token into
    * a weight table, sum, threshold). The weight table here is a
    * deterministic function of the shared polynomial word hash
    * (`w ↦ (hash(w) mod 1001) − 500`, a pseudo-random ±500 weight) so both
    * engines score identically with NO model file; swapping in real learned
    * weights changes the lookup, not the plan.
    *
    * Scale path: pure scan-side projection — the per-document fold is a
    * codegen'd higher-order aggregate over the token array, no shuffle, no
    * vocabulary-sized side state (the "weight table" is computed inline
    * from the hash, the same trick as feature hashing). Integer sums are
    * order-free, so scores are bit-identical across engines. */
  def classifierScore(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val wordWeight = s"(${TextHash.sparkWordHash("w")} % 1001) - 500"
    spark.table("documents")
      .withColumn("words", split($"text", " "))
      .select($"doc_id",
        size($"words").cast(LongType).as("n_words"),
        expr(s"aggregate(transform(words, w -> $wordWeight), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("score"))
      // score can be NEGATIVE: both Spark's DIV and DuckDB's integer //
      // truncate toward zero (verified: -7//2 = -3 in both), so plain DIV
      // is dialect-safe here; only DOUBLE-typed // floors in DuckDB
      .withColumn("score_bp", expr("(score * 10000) DIV n_words"))
      .withColumn("keep", ($"score" > 0L).cast("boolean"))
      .select($"doc_id", $"n_words", $"score", $"score_bp", $"keep")
  }

  val classifierScoreOracle: String = Fixtures.oracle(
    s"""SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(words,
                      w -> (${TextHash.duckWordHash("w")} % 1001) - 500)) AS BIGINT) AS score,
               CAST((list_sum(list_transform(words,
                      w -> (${TextHash.duckWordHash("w")} % 1001) - 500)) * 10000)
                    // len(words) AS BIGINT) AS score_bp,
               list_sum(list_transform(words,
                      w -> (${TextHash.duckWordHash("w")} % 1001) - 500)) > 0 AS keep
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)""")

  /** Cross-document segment-level dedup — the C4 "remove repeated lines
    * across the corpus" stage. The corpus has no sentence structure, so the
    * unit is a fixed 8-word segment: each document splits into consecutive
    * 8-word windows, every segment occurrence competes globally on its
    * content hash, and only the FIRST occurrence (lowest (doc_id, seg_idx))
    * survives. Output is the per-document attrition report a curation run
    * inspects: segments held vs segments kept.
    *
    * Scale path: segments explode scan-side; the global winner election is
    * ONE map-side-combinable min per segment hash (the shuffle key is the
    * content hash, the same blocking discipline as the dedup ladder — never
    * all-pairs); the keep check is an equi-join on (hash, packed position).
    * Positions pack as `doc_id · 2^20 + seg_idx` — exact while documents
    * stay under ~10^6 segments (8M words), a documented bound. */
  def lineDedup(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val segsIdx = spark.table("documents")
      .withColumn("words", split($"text", " "))
      .select($"doc_id", posexplode(expr(
        "transform(sequence(0, CAST((size(words) + 7) DIV 8 AS INT) - 1), " +
          s"i -> ${TextHash.sparkDocFingerprint("slice(words, i * 8 + 1, 8)")})")))
      .toDF("doc_id", "seg_idx", "h")
      .withColumn("packed", $"doc_id" * 1048576L + $"seg_idx")
    val winners = segsIdx.groupBy($"h").agg(min($"packed").as("w"))
    val kept = segsIdx.join(winners,
        segsIdx("h") === winners("h") && segsIdx("packed") === winners("w"))
      .groupBy(segsIdx("doc_id")).agg(count(lit(1)).as("n_kept"))
    segsIdx.groupBy($"doc_id").agg(count(lit(1)).as("n_segs"))
      .join(kept, Seq("doc_id"), "left")
      .select($"doc_id", $"n_segs",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        expr("(coalesce(n_kept, CAST(0 AS BIGINT)) * 10000) DIV n_segs").as("kept_bp"))
  }

  val lineDedupOracle: String = Fixtures.oracle(
    s""", ld_segs AS (
         SELECT doc_id, CAST(t.i AS BIGINT) AS seg_idx,
                ${TextHash.duckDocFingerprint("list_slice(words, i * 8 + 1, i * 8 + 8)")} AS h,
                doc_id * 1048576 + t.i AS packed
         FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) d,
              UNNEST(range((len(words) + 7) // 8)) AS t(i)),
       ld_win AS (SELECT h, MIN(packed) AS w FROM ld_segs GROUP BY h),
       ld_kept AS (
         SELECT s.doc_id, COUNT(1) AS n_kept
         FROM ld_segs s JOIN ld_win v ON v.h = s.h AND v.w = s.packed
         GROUP BY 1)
       SELECT s.doc_id, COUNT(1) AS n_segs,
              CAST(COALESCE(MAX(k.n_kept), 0) AS BIGINT) AS n_kept,
              CAST((COALESCE(MAX(k.n_kept), 0) * 10000) // COUNT(1) AS BIGINT) AS kept_bp
       FROM ld_segs s LEFT JOIN ld_kept k ON k.doc_id = s.doc_id
       GROUP BY s.doc_id""")

  /** Hashed-feature space for the DSIR estimator: like count-min and
    * feature hashing, a FIXED bucket count replaces the Heaps-unbounded
    * bigram vocabulary, which is what makes the distribution tables
    * constant-size (and legitimately broadcastable) at any corpus scale.
    * DSIR's published configuration uses 10⁴ hashed buckets; 2^12 keeps the
    * fixture's buckets multiply occupied. */
  private def dsirBuckets = 4096

  /** The target-distribution sources — DSIR's "formal text" exemplar set
    * (Wikipedia+books in the paper). A caller parameter in library use,
    * like [[bm25Search]]'s query set; two of the corpus's 20 uniform
    * sources ≈ a 10% target slice. */
  /** Public: Classifier.nbPosSources references this SAME slice so the
    * generative (DSIR) and discriminative (NB) estimators are provably
    * trained on identical supervision. */
  private[queries] def dsirTargetSources = Seq("src1", "src2")
  private def dsirTargetPred = dsirTargetSources.map(s => s"'$s'").mkString(
    "source IN (", ", ", ")")

  /** Shared (doc, bucket) hashed-bigram stream: one row per bigram
    * occurrence, bucket = polynomial hash of the bigram string mod
    * [[dsirBuckets]]. Scan-side explode; the bigram STRING never leaves the
    * projection — only the integer bucket reaches any exchange. */
  private def dsirGrams(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.cached(spark, sfDir, "dsir_grams") {
      import spark.implicits._
      spark.table("documents")
        .withColumn("words", split($"text", " "))
        .filter(size($"words") >= 2)
        .select($"doc_id", $"source", explode(expr(bigramConcatSql)).as("gram"))
        .select($"doc_id", $"source",
          expr(s"${TextHash.sparkWordHash("gram")} % $dsirBuckets").as("bucket"))
    }

  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): per document, how
    * much more likely its hashed-bigram bag is under the TARGET
    * distribution (docs from [[dsirTargetSources]]) than under the raw
    * corpus distribution. The published estimator is log-space
    * (Σ c_b · (log p̂_t[b] − log p̂_r[b])); this one keeps the SAME ordering
    * signal as a rational per-bucket likelihood ratio in basis points with
    * add-one smoothing — ln-free, so every quantity is integer arithmetic,
    * order-free, and bit-identical across engines (the [[lmFluency]]
    * discipline):
    *
    *   score_b  = 10⁴ · (tgt_b + 1)(raw_total + B) / ((raw_b + 1)(tgt_total + B))
    *   weight   = (Σ_grams score_bucket(gram)) DIV n_grams
    *
    * Scale shape: both count tables are FIXED [[dsirBuckets]]-row frames
    * (map-side-combined counts — feature hashing is what bounds them, the
    * same reason [[countMin]] scales), so the score-table broadcast is
    * constant-size at any corpus; the per-doc weight is one
    * map-side-combined aggregate over scan-side exploded grams. Long
    * arithmetic holds while (tgt_b+1)·(raw_total+B)·10⁴ < 2^63 — beyond
    * ~10¹⁰ target grams, promote the score expression to DECIMAL(38,0)
    * (same values, wider lanes). */
  private[queries] def dsirWeights(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.cached(spark, sfDir, "dsir_weights") {
    import spark.implicits._
    val grams = dsirGrams(spark, sfDir)
    val raw = grams.groupBy($"bucket").agg(count(lit(1)).as("raw_b"))
    val tgt = grams.filter(expr(dsirTargetPred))
      .groupBy($"bucket").agg(count(lit(1)).as("tgt_b"))
    val totals = raw.agg(sum($"raw_b").as("raw_total")).crossJoin(
      tgt.agg(coalesce(sum($"tgt_b"), lit(0L)).as("tgt_total")))
    val scores = raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select($"bucket", expr(
        s"((coalesce(tgt_b, CAST(0 AS BIGINT)) + 1) * (raw_total + $dsirBuckets) * 10000) " +
          s"DIV ((raw_b + 1) * (tgt_total + $dsirBuckets))").as("score_bp"))
    grams
      .join(broadcast(scores), Seq("bucket"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"), sum($"score_bp").as("s"))
      .select($"doc_id", $"n_grams", expr("s DIV n_grams").as("weight_bp"))
  }

  def dsirWeight(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    dsirWeights(spark, sfDir)
  }

  /** Oracle twin of [[dsirWeights]], ending at CTE `dsir_w(doc_id, n_grams,
    * weight_bp)` — shared with Sampling's resampling oracle. */
  private[queries] def dsirCtes: String =
    s""", dsir_grams AS (
         SELECT doc_id, source,
                ${TextHash.duckWordHash("(words[i+1] || ' ' || words[i+2])")} % $dsirBuckets AS bucket
         FROM (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents
               WHERE len(string_split(text, ' ')) >= 2) dw,
              UNNEST(range(len(words) - 1)) AS t(i)),
       dsir_raw AS (SELECT bucket, COUNT(1) AS raw_b FROM dsir_grams GROUP BY 1),
       dsir_tgt AS (SELECT bucket, COUNT(1) AS tgt_b FROM dsir_grams
                    WHERE $dsirTargetPred GROUP BY 1),
       dsir_tot AS (SELECT (SELECT SUM(raw_b) FROM dsir_raw) AS raw_total,
                           (SELECT COALESCE(SUM(tgt_b), 0) FROM dsir_tgt) AS tgt_total),
       dsir_scores AS (
         SELECT r.bucket,
                ((COALESCE(g.tgt_b, 0) + 1) * (t.raw_total + $dsirBuckets) * 10000)
                  // ((r.raw_b + 1) * (t.tgt_total + $dsirBuckets)) AS score_bp
         FROM dsir_raw r LEFT JOIN dsir_tgt g ON r.bucket = g.bucket
         CROSS JOIN dsir_tot t),
       dsir_w AS (
         SELECT g.doc_id, COUNT(1) AS n_grams,
                CAST(SUM(s.score_bp) // COUNT(1) AS BIGINT) AS weight_bp
         FROM dsir_grams g JOIN dsir_scores s ON g.bucket = s.bucket
         GROUP BY 1)"""

  val dsirWeightOracle: String = Fixtures.oracle(dsirCtes +
    """
       SELECT doc_id, n_grams, weight_bp FROM dsir_w""")

  /** Materialized document-frequency / idf index — the serving-side half of
    * [[bm25Search]]: a deployment computes this ONCE per corpus snapshot and
    * reuses it across every query (the reference recomputes df per query
    * because its corpus is view-sized; at 100 TB the index IS the product).
    * idf is the same rational BM25 form bm25Search scores with,
    * (N − df + ½)/(df + ½), integerized ×2 into basis points so the table
    * is order-free exact: idf_bp = ((2N − 2df + 1) · 10⁴) DIV (2df + 1).
    *
    * Scale shape: per-doc DISTINCT terms come from a scan-side
    * array_distinct (never a corpus-wide DISTINCT shuffle of raw
    * occurrences); the df count is ONE map-side-combined shuffle on the
    * term key; N is a 1-row broadcast. Output is vocabulary-sized — it is
    * an INDEX, written once, bucketed by term for the lookup join. */
  def dfIndex(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val pairs = spark.table("documents")
      .select(explode(array_distinct(split($"text", " "))).as("term"))
    val dfs = pairs.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = spark.table("documents").agg(count(lit(1)).as("n_docs"))
    dfs.crossJoin(broadcast(n))
      .select($"term", $"df", $"n_docs",
        expr("((2 * n_docs - 2 * df + 1) * 10000) DIV (2 * df + 1)").as("idf_bp"))
  }

  val dfIndexOracle: String = Fixtures.oracle(
    """, dfx AS (
         SELECT term, COUNT(1) AS df
         FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
               FROM documents)
         GROUP BY 1),
       dfn AS (SELECT COUNT(1) AS n_docs FROM documents)
       SELECT x.term, x.df, n.n_docs,
              CAST(((2 * n.n_docs - 2 * x.df + 1) * 10000) // (2 * x.df + 1) AS BIGINT)
                AS idf_bp
       FROM dfx x CROSS JOIN dfn n""")

  /** CCNet perplexity bucketing (Wenzek et al. 2020): split each language
    * into head / middle / tail TERCILES by language-model score — the
    * canonical "keep the head, inspect the middle, drop the tail" curation
    * gate. The LM signal is the corpus-derived [[lmFluency]] score (higher
    * = more predictable = CCNet's lower perplexity), and a doc's tercile
    * comes from its exact rank within its language:
    *
    *   tercile = ((n_lang − asc_rank) · 3) DIV n_lang   (0=head, 2=tail)
    *
    * — pure integer arithmetic on (rank, count), so the cut points are
    * bit-identical across engines by construction, unlike any
    * floating-point quantile estimate.
    *
    * Scale shape: the per-language rank is NEVER a per-lang global window
    * (one task per language at 100 TB — the vocabCoverage defect class).
    * It is bucket-decomposed on the SCORE VALUE: fluency DIV 10⁴ buckets
    * (≤ ~101 per language — bounded by the score's value range, not the
    * corpus), per-(lang, bucket) counts, a prefix-sum window over that
    * bounded count table (broadcast back), and an in-bucket row_number.
    * Residual partition = docs per (lang, score-decile-ish slice) —
    * 100× finer than per-lang. Rank arithmetic is associative, so the
    * decomposition is bit-identical to the one-shot window. */
  def ccnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val fl = lmFluency(spark, sfDir)
      .join(spark.table("documents").select($"doc_id", $"lang"), Seq("doc_id"))
      .withColumn("fbucket", expr("fluency DIV 10000"))
    val bOff = fl.groupBy($"lang", $"fbucket").agg(count(lit(1)).as("b_n"))
      .withColumn("b_off", coalesce(
        sum($"b_n").over(Window.partitionBy($"lang").orderBy($"fbucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"lang", $"fbucket", $"b_off")
    val nLang = fl.groupBy($"lang").agg(count(lit(1)).as("n_lang"))
    fl.withColumn("rn", row_number().over(
        Window.partitionBy($"lang", $"fbucket").orderBy($"fluency", $"doc_id")))
      .join(broadcast(bOff), Seq("lang", "fbucket"))
      .withColumn("asc_rank", $"b_off" + $"rn")
      .join(broadcast(nLang), Seq("lang"))
      .withColumn("tercile", expr("((n_lang - asc_rank) * 3) DIV n_lang"))
      .select($"doc_id", $"lang", $"fluency", $"asc_rank", $"n_lang", $"tercile",
        when($"tercile" === 0L, "head").when($"tercile" === 1L, "middle")
          .otherwise("tail").as("ccnet_bucket"))
  }

  val ccnetBucketsOracle: String = Fixtures.oracle(fluencyCtes("cc_") +
    """, cc_r AS (
         SELECT f.doc_id, d.lang, f.fluency,
                ROW_NUMBER() OVER (PARTITION BY d.lang
                                   ORDER BY f.fluency, f.doc_id) AS asc_rank,
                COUNT(1) OVER (PARTITION BY d.lang) AS n_lang
         FROM cc_fl f JOIN documents d ON f.doc_id = d.doc_id)
       SELECT doc_id, lang, fluency,
              CAST(asc_rank AS BIGINT) AS asc_rank,
              CAST(n_lang AS BIGINT) AS n_lang,
              CAST(((n_lang - asc_rank) * 3) // n_lang AS BIGINT) AS tercile,
              CASE ((n_lang - asc_rank) * 3) // n_lang
                WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
              END AS ccnet_bucket
       FROM cc_r""")

  /** BPE-training pair counts — the inner-loop primitive of byte-pair
    * encoding tokenizer training (Sennrich et al. 2016): count adjacent
    * symbol pairs corpus-wide, merge the winner, repeat. This operator is
    * one round at character level, with the trick that makes BPE train on
    * terabyte corpora at all: pairs are counted over the DISTINCT-word
    * vocabulary weighted by word frequency — the corpus collapses to a
    * Heaps-bounded vocabulary before any character work happens, so the
    * explode is vocabulary-sized, not corpus-sized. The iterative merge
    * loop composes this per round (apply the merge to the vocabulary —
    * a string rewrite on vocab-sized rows — and re-count).
    *
    * Output: the top 32 pairs under the deterministic total order
    * (count DESC, pair ASC) — the next-merge candidate list. Top-k via
    * orderBy+limit plans as TakeOrderedAndProject (per-partition heads,
    * then one merge of ≤ k·partitions rows — never a global sort);
    * the rank window runs over ≤ 32 rows. */
  def bpeTopPairs(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val vocab = spark.table("documents")
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
    vocab.filter(length($"w") >= 2)
      .select($"freq", explode(expr(
        "transform(sequence(0, length(w) - 2), i -> substring(w, i + 1, 2))"))
        .as("pair"))
      .groupBy($"pair").agg(sum($"freq").as("pair_count"))
      .orderBy($"pair_count".desc, $"pair".asc)
      .limit(32)
      // BOUNDED global window: input is the post-limit 32-row frame (a
      // TakeOrderedAndProject), never the pair distribution. Pinned by
      // ScalePlanSpec ("global windows are provably bounded").
      .withColumn("merge_rank", row_number().over(
        Window.orderBy($"pair_count".desc, $"pair".asc)))
  }

  val bpeTopPairsOracle: String = Fixtures.oracle(
    """, bpe_v AS (
         SELECT w, COUNT(1) AS freq
         FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         GROUP BY 1),
       bpe_p AS (
         SELECT substring(v.w, t.i + 1, 2) AS pair, SUM(v.freq) AS pair_count
         FROM (SELECT w, freq FROM bpe_v WHERE length(w) >= 2) v,
              UNNEST(range(length(v.w) - 1)) AS t(i)
         GROUP BY 1)
       SELECT pair, CAST(pair_count AS BIGINT) AS pair_count,
              CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS INT)
                AS merge_rank
       FROM bpe_p
       ORDER BY pair_count DESC, pair LIMIT 32""")

  /** Gopher rule gate (Rae et al. 2021, Table A1) — the canonical NAMED
    * rule set curation stacks cite, as one boolean column per rule plus
    * the conjunction. Thresholds are the paper's, applied by integer
    * cross-multiplication (no ratio ever materializes, so no double-ulp
    * flip can disagree between engines):
    *
    *   - word count in [50, 100 000]
    *   - mean word length in [3, 10] chars
    *   - ≥ 2 stopword hits (the shared stopword list)
    *   - duplicate-word mass ≤ 50% (unique words ≥ half the tokens —
    *     the fixture-visible stand-in for the paper's duplicate-line
    *     fraction; this corpus has no line structure)
    *
    * The paper's symbol-ratio / bullet / ellipsis rules are vacuous on a
    * purely alphabetic corpus and are deliberately omitted rather than
    * shipped untestable. Scale shape: pure scan-side projection — no
    * joins, no shuffles, no state. */
  def gopherRules(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .withColumn("words", split($"text", " "))
      .withColumn("n_words", size($"words").cast(LongType))
      .withColumn("n_chars_w", (length($"text") - ($"n_words" - 1L)))
      .withColumn("n_uniq", size(array_distinct($"words")).cast(LongType))
      .withColumn("n_stop", expr(stopCountSpark("text")).cast(LongType))
      .select($"doc_id", $"n_words", $"n_uniq", $"n_stop",
        ($"n_words" >= 50L && $"n_words" <= 100000L).as("rule_word_count"),
        ($"n_chars_w" >= $"n_words" * 3L && $"n_chars_w" <= $"n_words" * 10L)
          .as("rule_mean_word_len"),
        ($"n_stop" >= 2L).as("rule_stopwords"),
        ($"n_uniq" * 2L >= $"n_words").as("rule_dup_mass"))
      .withColumn("keep",
        $"rule_word_count" && $"rule_mean_word_len" &&
          $"rule_stopwords" && $"rule_dup_mass")
  }

  val gopherRulesOracle: String = Fixtures.oracle(
    s"""SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(list_distinct(words)) AS BIGINT) AS n_uniq,
               CAST(${stopCountDuck("text")} AS BIGINT) AS n_stop,
               len(words) >= 50 AND len(words) <= 100000 AS rule_word_count,
               (length(text) - (len(words) - 1)) >= len(words) * 3
                 AND (length(text) - (len(words) - 1)) <= len(words) * 10
                 AS rule_mean_word_len,
               ${stopCountDuck("text")} >= 2 AS rule_stopwords,
               len(list_distinct(words)) * 2 >= len(words) AS rule_dup_mass,
               (len(words) >= 50 AND len(words) <= 100000)
                 AND ((length(text) - (len(words) - 1)) >= len(words) * 3
                      AND (length(text) - (len(words) - 1)) <= len(words) * 10)
                 AND (${stopCountDuck("text")} >= 2)
                 AND (len(list_distinct(words)) * 2 >= len(words)) AS keep
        FROM (SELECT doc_id, text, string_split(text, ' ') AS words
              FROM documents)""")

  /** Per-document duplicate-n-gram mass — the RedPajama-v2 quality-signal
    * family (`frac_chars_top_2gram`, `frac_chars_dupe_2grams`): how much of
    * a document's character mass sits in its single most-repeated bigram,
    * and in ALL bigrams occurring ≥2× within the doc. Boilerplate, chart
    * spam, and template pages score high while passing whole-doc
    * repetition filters ([[repetitionFilter]] compares doc-level duplicate
    * lines; this is the sub-line n-gram version both signals ship with).
    * Masses are basis points by integer cross-multiplication; overlapping
    * occurrences mean the signal can exceed 10⁴ by construction (same as
    * the published signal). Top-gram ties break on the lexicographically
    * LARGEST gram — `max(struct(count, gram))` here, `ORDER BY c DESC,
    * gram DESC` in the oracle, identical on ASCII corpora.
    *
    * Scale shape: scan-side gram explode → ONE (doc, gram)-keyed
    * map-side-combined count → ONE doc-keyed agg (struct-max + conditional
    * sums; per-doc cardinality is doc-length-bounded, so no global or
    * per-corpus window anywhere). */
  def dupGramSignals(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .select($"doc_id", length($"text").cast(LongType).as("n_chars"),
        split($"text", " ").as("words"))
      .filter(size($"words") >= 2)
      .select($"doc_id", $"n_chars", explode(expr(bigramConcatSql))
        .as("gram"))
      .groupBy($"doc_id", $"n_chars", $"gram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id", $"n_chars")
      .agg(
        sum($"c").as("n_grams"),
        max(struct($"c", $"gram")).as("top"),
        sum(when($"c" >= 2, $"c" * length($"gram").cast(LongType)).otherwise(0L))
          .as("dup_chars"))
      .select($"doc_id", $"n_grams",
        $"top.gram".as("top_gram"), $"top.c".as("top_gram_n"),
        expr("top.c * length(top.gram) * 10000 DIV n_chars").as("top_mass_bp"),
        expr("dup_chars * 10000 DIV n_chars").as("dup_mass_bp"))
  }

  val dupGramSignalsOracle: String = Fixtures.oracle(
    """, dg_dw AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                          string_split(text, ' ') AS words
                   FROM documents WHERE len(string_split(text, ' ')) >= 2),
       dg_g AS (SELECT doc_id, n_chars, words[i+1] || ' ' || words[i+2] AS gram
                FROM dg_dw, UNNEST(range(len(words) - 1)) AS t(i)),
       dg_c AS (SELECT doc_id, n_chars, gram, COUNT(1) AS c
                FROM dg_g GROUP BY 1, 2, 3),
       dg_top AS (SELECT doc_id, gram, c,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY c DESC, gram DESC) AS rn
                  FROM dg_c),
       dg_sum AS (SELECT doc_id, n_chars,
                         CAST(SUM(c) AS BIGINT) AS n_grams,
                         CAST(SUM(CASE WHEN c >= 2
                                       THEN c * length(gram) ELSE 0 END) AS BIGINT)
                           AS dup_chars
                  FROM dg_c GROUP BY 1, 2)
       SELECT s.doc_id, s.n_grams, t.gram AS top_gram,
              CAST(t.c AS BIGINT) AS top_gram_n,
              CAST((t.c * length(t.gram) * 10000) // s.n_chars AS BIGINT)
                AS top_mass_bp,
              CAST((s.dup_chars * 10000) // s.n_chars AS BIGINT) AS dup_mass_bp
       FROM dg_sum s JOIN dg_top t ON s.doc_id = t.doc_id AND t.rn = 1""")

  /** The corpus data card — the per-(lang, source) composition table every
    * released dataset publishes (docs, unique docs by content hash, words,
    * chars, corpus share, stopword density): the first page of a dataset
    * README and the frame mixture decisions are sanity-checked against.
    * Shares and densities are basis points by integer cross-multiplication.
    *
    * Scale shape: ONE map-side-combined (lang, source) aggregate over a
    * scan-side projection (sha/size/length per row), plus a 1-row total
    * broadcast for the share denominator. The distinct-doc count uses
    * count(DISTINCT sha) INSIDE the group — Spark expands it to a two-pass
    * aggregate on the same grouping key, still never corpus-global. */
  def dataCard(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val per = spark.table("documents")
      .select($"lang", $"source", sha2($"text", 256).as("sha"),
        size(split($"text", " ")).cast(LongType).as("w"),
        length($"text").cast(LongType).as("c"),
        expr(stopCountSpark("text")).cast(LongType).as("stop"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"sha").as("n_unique"),
        sum($"w").as("n_words"),
        sum($"c").as("n_chars"),
        sum($"stop").as("n_stop"))
    val total = per.agg(sum($"n_words").as("tw"))
    per.crossJoin(broadcast(total))
      .select($"lang", $"source", $"n_docs", $"n_unique", $"n_words", $"n_chars",
        expr("n_words * 10000 DIV tw").as("share_bp"),
        expr("n_stop * 10000 DIV n_words").as("stop_bp"))
      .orderBy($"lang", $"source")
  }

  val dataCardOracle: String = Fixtures.oracle(
    s""", dc AS (
         SELECT lang, source, COUNT(1) AS n_docs,
                COUNT(DISTINCT sha256(text)) AS n_unique,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
                CAST(SUM(length(text)) AS BIGINT) AS n_chars,
                CAST(SUM(${stopCountDuck("text")}) AS BIGINT) AS n_stop
         FROM documents GROUP BY 1, 2),
       dc_t AS (SELECT CAST(SUM(n_words) AS BIGINT) AS tw FROM dc)
       SELECT lang, source, n_docs, n_unique, n_words, n_chars,
              CAST((n_words * 10000) // tw AS BIGINT) AS share_bp,
              CAST((n_stop * 10000) // n_words AS BIGINT) AS stop_bp
       FROM dc CROSS JOIN dc_t
       ORDER BY lang, source""")

  /** Zipf/Heaps corpus diagnostic: the frequency-of-frequencies spectrum.
    * Term frequencies are bucketed into power-of-two bins (the
    * `events_hist_quantiles` binning, `floor(log2 c)` via `length(bin(c))-1`)
    * and each bin reports how many distinct terms and how many total
    * occurrences it holds. Under Zipf the per-bin occupancy falls off
    * geometrically — a corpus whose spectrum doesn't (e.g. heavy synthetic
    * duplication inflating the high-frequency bins) fails the shape test, so
    * this is the one-page "is this crawl snapshot statistically normal"
    * report curation pipelines run before anything else.
    *
    * Scale shape: scan-side explode → ONE vocabulary-keyed shuffle agg
    * (map-side combined) → a ≤64-row bin agg. Nothing is broadcast, no
    * window, no sort beyond the 64-row presentation orderBy. */
  def zipfSpectrum(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("c"))
      .withColumn("fbin", expr(graft.functions.Log2Bin.binSql("c")))
      .groupBy($"fbin")
      .agg(count(lit(1)).as("n_terms"), sum($"c").as("n_occ"))
      .select($"fbin", $"n_terms", $"n_occ",
        expr(graft.functions.Log2Bin.sparkLoSql("fbin")).as("lo_freq"),
        expr(graft.functions.Log2Bin.sparkHiSql("fbin")).as("hi_freq"))
      .orderBy($"fbin")
  }

  val zipfSpectrumOracle: String = Fixtures.oracle(
    s""", zs_w AS (SELECT w AS word
                  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
                  WHERE length(w) > 0),
       zs_f AS (SELECT word, COUNT(1) AS c FROM zs_w GROUP BY 1),
       zs_b AS (SELECT ${graft.functions.Log2Bin.binSql("c")} AS fbin,
                       COUNT(1) AS n_terms, CAST(SUM(c) AS BIGINT) AS n_occ
                FROM zs_f GROUP BY 1)
       SELECT fbin, n_terms, n_occ,
              ${graft.functions.Log2Bin.duckLoSql("fbin")} AS lo_freq,
              ${graft.functions.Log2Bin.duckHiSql("fbin")} AS hi_freq
       FROM zs_b
       ORDER BY fbin""")

  /** Vocabulary growth curve (Heaps'-law diagnostic): treat doc_id as
    * ingest order, cut the id range into 16 equal buckets, and report per
    * bucket the docs/tokens ingested, the NEW distinct terms (first
    * occurrence lands in the bucket), and the cumulative vocabulary — "how
    * much new content does the next crawl snapshot add", the exact twin of
    * `corpus_novelty_kmv`'s sketch estimate and the data-scaling saturation
    * signal. Plan: one (term → min bucket) vocabulary-keyed
    * map-side-combined agg; bucketing is pure integer arithmetic against
    * the 1-row (min, max) id frame; then 16-row aggregates only — the
    * cumulative sum is a triangular self-join over ≤ 16 rows, no window,
    * no corpus-sized broadcast anywhere. */
  def heapsCurve(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val docs = spark.table("documents")
    val bounds = docs.agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
    val bucketCol =
      expr("CAST(least(15, ((doc_id - lo) * 16) DIV (hi - lo + 1)) AS BIGINT)")

    val bucketed = docs.crossJoin(broadcast(bounds))
      .select(bucketCol.as("bucket"), $"text")

    val docStats = bucketed
      .groupBy($"bucket")
      .agg(count(lit(1)).as("docs"),
        sum(expr("size(filter(split(text, ' '), w -> length(w) > 0))"))
          .as("tokens"))

    val newTerms = bucketed
      .select($"bucket", explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
      .groupBy($"term").agg(min($"bucket").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("new_terms"))

    // both sides of the triangular self-join read this ≤ 16-row frame;
    // materialize it so the two corpus-sized aggregations behind it run
    // once, not once per side
    val perBucket = docStats.join(newTerms, Seq("bucket"), "left")
      .select($"bucket", $"docs", $"tokens",
        coalesce($"new_terms", lit(0L)).as("new_terms"))
      .localCheckpoint()

    perBucket
      .join(perBucket.select($"bucket".as("h_b"), $"new_terms".as("h_n")),
        expr("h_b <= bucket"), "left")
      .groupBy($"bucket", $"docs", $"tokens", $"new_terms")
      .agg(sum($"h_n").as("cum_vocab"))
  }

  val heapsCurveOracle: String = Fixtures.oracle(
    """, hc_bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
       hc_docs AS (
         SELECT CAST(LEAST(15, ((d.doc_id - b.lo) * 16) // (b.hi - b.lo + 1)) AS BIGINT)
                  AS bucket,
                d.text
         FROM documents d, hc_bounds b),
       hc_stats AS (
         SELECT bucket, COUNT(1) AS docs,
                CAST(SUM(len(list_filter(string_split(text, ' '),
                                         w -> length(w) > 0))) AS BIGINT) AS tokens
         FROM hc_docs GROUP BY 1),
       hc_first AS (
         SELECT w AS term, MIN(bucket) AS bucket
         FROM hc_docs, UNNEST(string_split(text, ' ')) AS t(w)
         WHERE length(w) > 0 GROUP BY 1),
       hc_new AS (SELECT bucket, COUNT(1) AS new_terms FROM hc_first GROUP BY 1),
       hc_pb AS (
         SELECT s.bucket, CAST(s.docs AS BIGINT) AS docs, s.tokens,
                CAST(COALESCE(n.new_terms, 0) AS BIGINT) AS new_terms
         FROM hc_stats s LEFT JOIN hc_new n ON s.bucket = n.bucket)
       SELECT b.bucket, b.docs, b.tokens, b.new_terms,
              CAST(SUM(h.new_terms) AS BIGINT) AS cum_vocab
       FROM hc_pb b LEFT JOIN hc_pb h ON h.bucket <= b.bucket
       GROUP BY 1, 2, 3, 4""")

  /** Per-source n-gram diversity: distinct bigrams as a share of total
    * bigram occurrences, in basis points. The low-diversity tail is the
    * template/boilerplate/synthetic-data signal at DOMAIN granularity —
    * `text_repetition_filter` catches self-repeating DOCUMENTS; a source
    * whose documents are individually clean but collectively near-identical
    * (mirror farms, generated spam) only shows up here.
    *
    * Scale shape: scan-side bigram explode → ONE (source, bigram)-keyed
    * shuffle agg (map-side combined) → a source-sized re-agg. The ratio is
    * integer cross-multiplication (`·10⁴ DIV`), order-free on both engines
    * (DuckDB INTEGER `//` truncates exactly like Spark's DIV — the pinned
    * dialect rule). */
  def ngramDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .withColumn("words", split($"text", " "))
      .filter(size($"words") >= 2)
      .select($"source", explode(expr(bigramConcatSql))
        .as("bigram"))
      .groupBy($"source", $"bigram").agg(count(lit(1)).as("n"))
      .groupBy($"source")
      .agg(count(lit(1)).as("distinct_bigrams"), sum($"n").as("total_bigrams"))
      .select($"source", $"distinct_bigrams", $"total_bigrams",
        expr("distinct_bigrams * 10000 DIV total_bigrams").as("diversity_bp"))
      .orderBy($"source")
  }

  val ngramDiversityOracle: String = Fixtures.oracle(
    """, nd_dw AS (SELECT source, string_split(text, ' ') AS words FROM documents
                   WHERE len(string_split(text, ' ')) >= 2),
       nd_g AS (SELECT source, words[i+1] || ' ' || words[i+2] AS bigram
                FROM nd_dw, UNNEST(range(len(words) - 1)) AS t(i)),
       nd_sb AS (SELECT source, bigram, COUNT(1) AS n FROM nd_g GROUP BY 1, 2)
       SELECT source, COUNT(1) AS distinct_bigrams,
              CAST(SUM(n) AS BIGINT) AS total_bigrams,
              CAST((COUNT(1) * 10000) // SUM(n) AS BIGINT) AS diversity_bp
       FROM nd_sb
       GROUP BY 1
       ORDER BY source""")

  /** Per-domain characteristic terms by association lift: for each
    * (source, word), `lift = P(word | source) / P(word) = (a·N)/(n_s·c_w)`.
    * This is the domain-indicative-vocabulary report (the χ²/log-odds
    * feature-selection family — lift keeps the exact same ranking inside
    * the cross-engine-exact ×,÷ arithmetic; χ²'s squared products would
    * need a variance denominator for no extra ordering power). Used to
    * label what a domain IS about before deciding its mixture weight, and
    * as the seed list for classifier-based topic filters.
    *
    * Scale shape: (source, word) counts in ONE map-side-combined shuffle;
    * the per-word corpus-count join is a VOCABULARY join and therefore a
    * plain shuffle join on the word key (Heaps' law — the keywordTfidf
    * rule); only the source-sized totals table and the 1-row grand total
    * broadcast. The ≥5 count floor drops the hapax tail before the joins;
    * the final top-200 is a TakeOrderedAndProject, never a global sort.
    *
    * Ratio arithmetic: long products are exact below 2^53 and convert
    * exactly to double; one IEEE division, exact-rounded identically on
    * both engines. At 100 TB counts approach 2^53 — normalize with two
    * divisions `(a/n_s)/(c_w/N)` there; at every tested SF the single
    * division keeps full precision. */
  def domainLift(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val sw = spark.table("documents")
      .select($"source", explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"source", $"word").agg(count(lit(1)).as("a"))
    val cw = sw.groupBy($"word").agg(sum($"a").as("cw"))
    val ns = sw.groupBy($"source").agg(sum($"a").as("ns"))
    val n = sw.agg(sum($"a").as("n"))
    sw.filter($"a" >= 5)
      .join(cw, "word")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(n))
      .withColumn("lift_ratio",
        ($"a" * $"n").cast(DoubleType) / ($"ns" * $"cw").cast(DoubleType))
      .select($"source", $"word", $"a".as("n_in_domain"), $"cw".as("n_corpus"),
        $"lift_ratio")
      .orderBy($"lift_ratio".desc, $"source", $"word")
      .limit(200)
  }

  val domainLiftOracle: String = Fixtures.oracle(
    """, dl_w AS (SELECT source, w AS word
                  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
                  WHERE length(w) > 0),
       dl_sw AS (SELECT source, word, COUNT(1) AS a FROM dl_w GROUP BY 1, 2),
       dl_cw AS (SELECT word, CAST(SUM(a) AS BIGINT) AS cw FROM dl_sw GROUP BY 1),
       dl_ns AS (SELECT source, CAST(SUM(a) AS BIGINT) AS ns FROM dl_sw GROUP BY 1),
       dl_n AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM dl_sw)
       SELECT sw.source, sw.word,
              CAST(sw.a AS BIGINT) AS n_in_domain, cw.cw AS n_corpus,
              CAST(sw.a * n.n AS DOUBLE) / CAST(ns.ns * cw.cw AS DOUBLE)
                AS lift_ratio
       FROM dl_sw sw
       JOIN dl_cw cw USING (word)
       JOIN dl_ns ns USING (source)
       CROSS JOIN dl_n n
       WHERE sw.a >= 5
       ORDER BY lift_ratio DESC, sw.source, sw.word
       LIMIT 200""")

  /** Source-concentration report per language — the Herfindahl–Hirschman
    * index (HHI, the antitrust concentration measure) of token mass across
    * sources, the "is this language's data one scraper in a trench coat"
    * diagnostic a datacard publishes next to composition shares: a
    * language fed by one dominant domain inherits that domain's biases and
    * dedup blind spots however many documents it has.
    *
    * Exactness: HHI = Σ share² needs NO floats — report
    * hhi_e8 = ⌊Σ tok_s² · 10⁸ / T²⌋ (one floor division at the end; 10⁸ =
    * monopoly) with Σ tok_s² carried in DECIMAL(38,0)/HUGEINT lanes (a
    * Long wraps at ~3·10⁹ tokens in one source). Alongside: the top
    * source's share in bp (max_by, no window) and the source count — the
    * three numbers a mixture rebalance reads.
    *
    * Scale shape: one (lang, source) map-side-combined token sum (bounded
    * output: label-set × domain-set), then one lang-keyed fold — no
    * corpus-sized exchange after the scan. */
  def hhiConcentration(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .filter($"lang".isNotNull && $"source".isNotNull)
      .groupBy($"lang", $"source")
      .agg(sum(size(split($"text", " ")).cast(LongType)).as("tok"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_sources"),
        sum($"tok").as("total_tok"),
        sum($"tok".cast(DecimalType(38, 0)) * $"tok").as("sq"),
        max($"tok").as("top_tok"))
      .select($"lang", $"n_sources", $"total_tok",
        expr("CAST((sq * 100000000) DIV (CAST(total_tok AS DECIMAL(38,0)) * total_tok) AS BIGINT)")
          .as("hhi_e8"),
        expr("(top_tok * 10000) DIV total_tok").as("top_share_bp"))
  }

  val hhiConcentrationOracle: String = Fixtures.oracle(
    """, hhi_st AS (
         SELECT lang, source, SUM(len(string_split(text, ' '))) AS tok
         FROM documents
         WHERE lang IS NOT NULL AND source IS NOT NULL
         GROUP BY 1, 2)
       SELECT lang, COUNT(1) AS n_sources,
              CAST(SUM(tok) AS BIGINT) AS total_tok,
              CAST((SUM(CAST(tok AS HUGEINT) * tok) * 100000000)
                   // (CAST(SUM(tok) AS HUGEINT) * SUM(tok)) AS BIGINT) AS hhi_e8,
              CAST((MAX(tok) * 10000) // SUM(tok) AS BIGINT) AS top_share_bp
       FROM hhi_st GROUP BY 1""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rrf_fusion" -> (rrfFusion _),
    "corpus_hhi_concentration" -> (hhiConcentration _),
    "corpus_datacard" -> (dataCard _),
    "text_zipf_spectrum" -> (zipfSpectrum _),
    "corpus_heaps_curve" -> (heapsCurve _),
    "text_ngram_diversity" -> (ngramDiversity _),
    "text_domain_lift" -> (domainLift _),
    "text_dup_gram_signals" -> (dupGramSignals _),
    "corpus_build" -> (corpusBuild _),
    "text_gopher_rules" -> (gopherRules _),
    "text_bpe_top_pairs" -> (bpeTopPairs _),
    "text_ccnet_buckets" -> (ccnetBuckets _),
    "text_dsir_weight" -> (dsirWeight _),
    "text_df_index" -> (dfIndex _),
    "text_classifier_score" -> (classifierScore _),
    "text_line_dedup" -> (lineDedup _),
    "text_token_count" -> (tokenCount _),
    "text_quality_score" -> (qualityScore _),
    "text_lang_id" -> (langId _),
    "text_langid_confusion" -> (langIdConfusion _),
    "text_doc_fingerprint" -> (docFingerprint _),
    "corpus_curation" -> (corpusCuration _),
    "text_chunk" -> (chunk _),
    "corpus_pack_manifest" -> (packManifest _),
    "corpus_pack_stats" -> (packStats _),
    "text_length_percentiles" -> (lengthPercentiles _),
    "text_contamination" -> (contamination _),
    "text_contamination_overlap" -> (contaminationOverlap _),
    "text_contamination_bloom" -> (contaminationBloom _),
    "text_repetition_filter" -> (repetitionFilter _),
    "text_pii_redact" -> (piiRedact _),
    "text_bm25_search" -> (bm25Search _),
    "text_keyword_tfidf" -> (keywordTfidf _),
    "text_ngram_counts" -> (ngramCounts _),
    "text_bigram_pmi" -> (bigramPmi _),
    "text_count_min" -> (countMin _),
    "text_vocab_coverage" -> (vocabCoverage _),
    "text_lm_fluency" -> (lmFluency _),
    "corpus_pretrain_funnel" -> (pretrainFunnel _))

  val oracles: Map[String, String] = Map(
    "text_rrf_fusion" -> rrfFusionOracle,
    "corpus_hhi_concentration" -> hhiConcentrationOracle,
    "corpus_datacard" -> dataCardOracle,
    "text_zipf_spectrum" -> zipfSpectrumOracle,
    "corpus_heaps_curve" -> heapsCurveOracle,
    "text_ngram_diversity" -> ngramDiversityOracle,
    "text_domain_lift" -> domainLiftOracle,
    "text_dup_gram_signals" -> dupGramSignalsOracle,
    "corpus_build" -> corpusBuildOracle,
    "text_gopher_rules" -> gopherRulesOracle,
    "text_bpe_top_pairs" -> bpeTopPairsOracle,
    "text_ccnet_buckets" -> ccnetBucketsOracle,
    "text_dsir_weight" -> dsirWeightOracle,
    "text_df_index" -> dfIndexOracle,
    "text_classifier_score" -> classifierScoreOracle,
    "text_line_dedup" -> lineDedupOracle,
    "text_token_count" -> tokenCountOracle,
    "text_quality_score" -> qualityScoreOracle,
    "text_lang_id" -> langIdOracle,
    "text_langid_confusion" -> langIdConfusionOracle,
    "text_doc_fingerprint" -> docFingerprintOracle,
    "corpus_curation" -> corpusCurationOracle,
    "text_chunk" -> chunkOracle,
    "corpus_pack_manifest" -> packManifestOracle,
    "corpus_pack_stats" -> packStatsOracle,
    "text_length_percentiles" -> lengthPercentilesOracle,
    "text_contamination" -> contaminationOracle,
    "text_contamination_overlap" -> contaminationOverlapOracle,
    "text_contamination_bloom" -> contaminationBloomOracle,
    "text_repetition_filter" -> repetitionFilterOracle,
    "text_pii_redact" -> piiRedactOracle,
    "text_bm25_search" -> bm25SearchOracle,
    "text_keyword_tfidf" -> keywordTfidfOracle,
    "text_ngram_counts" -> ngramCountsOracle,
    "text_bigram_pmi" -> bigramPmiOracle,
    "text_count_min" -> countMinOracle,
    "text_vocab_coverage" -> vocabCoverageOracle,
    "text_lm_fluency" -> lmFluencyOracle,
    "corpus_pretrain_funnel" -> pretrainFunnelOracle)
}
