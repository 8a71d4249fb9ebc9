package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** Stupid-Backoff trigram language model with held-out scoring — the
  * web-scale LM of Brants et al. EMNLP'07 ("Large Language Models in
  * Machine Translation"), designed for exactly this engine shape: counts
  * are plain distributed aggregations, scores are count RATIOS with a
  * constant backoff penalty, and nothing needs the normalized-probability
  * machinery that blocks KN-style smoothing from trivially sharding.
  *
  *   S(w | a b) = c3(a b w)/c2(a b)             if c3 > 0
  *              = 0.4 · c2(b w)/c1(b)           else if c2 > 0
  *              = 0.4² · c1(w)/N                else if c1 > 0
  *              = 0.4² · 1/N                    else (OOV floor)
  *
  * Unlike [[KnLm]] (in-sample, every scored bigram observed), scoring here
  * is OUT-of-sample over the content-hash holdout split
  * ([[Sampling.splitCol]] — the leakage-free split `split_train_holdout`
  * exports), so the backoff chain is genuinely exercised: unseen test
  * trigrams fall to the bigram level, unseen bigrams to the unigram level,
  * and unseen words to the 1/N floor. [[backoffMix]] reports how often —
  * the coverage table Brants et al. publish per corpus size.
  *
  * Determinism discipline (the [[KnLm]]/[[Unigram]] playbook): the backoff
  * factor 0.4 = 2/5 is exact-rational, probabilities are quantized ONCE to
  * 2^30 fixed point — level 3 runs `CAST(c3 AS DECIMAL(38,0)) * 2^30 DIV
  * c2` through a DECIMAL/HUGEINT lane (corpus-scale counts shifted by 2^30
  * overflow BIGINT), the ·2/5 and ·4/25 penalties are integer
  * multiply-then-DIV AFTER the quantizing division — and per-token bits are
  * the exact fixed-point log2 ([[Unigram.lgFpSql]]). Both engines replay
  * the identical integer recurrence, so the held-out cross-entropy
  * hash-matches with zero floating-point risk.
  *
  * Scale shape: the three count tables are gram-distinct-bounded (far below
  * corpus size under Heaps' law for uni/bi; the trigram table is the big
  * one — Brants et al. shard it, we shuffle on it). Denominators are
  * PRE-JOINED into the model tables (train once, score many: the serving
  * join count is what repeats), so scoring is exactly three shuffles of the
  * held-out gram frame — on (a,b,c), (b,c), (c) — plus a 1-row N broadcast.
  * No model table carries a broadcast hint: they grow with the corpus
  * (ScalePlanSpec's growing-broadcast rule).
  */
object SbLm {

  /** 2^30 — the probability fixed-point scale (shared with [[KnLm]]). */
  private val pScale = 1073741824L

  /** Positional n-gram extraction: (doc_id, split, w0[, w1[, w2]]). */
  private def grams(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val names = Seq("a", "b", "c").take(n)
    val fields = names.zipWithIndex
      .map { case (nm, i) => s"words[i + $i] AS $nm" }.mkString(", ")
    spark.table("documents")
      .withColumn("split", Sampling.splitCol(sha2($"text", 256)))
      .withColumn("words", split($"text", " "))
      .filter(size($"words") >= n)
      .select($"doc_id", $"split", explode(expr(
        s"transform(sequence(0, size(words) - $n), i -> struct($fields))")).as("g"))
      .select($"doc_id" +: $"split" +: names.map(nm => col(s"g.$nm")): _*)
      .filter(names.map(nm => col(nm) =!= "").reduce(_ && _))
  }

  /** Per-token held-out score frame: (doc_id, level, bits_fp). Memoized —
    * both catalog entries aggregate it. */
  private def scored(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.util.Memo.cached(spark, sfDir, "sb_scored") {
      import spark.implicits._
      val c3 = grams(spark, 3).filter($"split" === "train")
        .groupBy($"a", $"b", $"c").agg(count(lit(1)).as("c3"))
      val c2 = grams(spark, 2).filter($"split" === "train")
        .groupBy($"a", $"b").agg(count(lit(1)).as("c2"))
      val c1 = grams(spark, 1).filter($"split" === "train")
        .groupBy($"a").agg(count(lit(1)).as("c1"))
      val nTot = c1.agg(sum($"c1").as("n_tot"))

      // denominators pre-joined: the train-once / score-many boundary
      val triTab = c3.join(c2.withColumnRenamed("c2", "c2ab"), Seq("a", "b"))
      val biTab = c2.select($"a".as("b"), $"b".as("c"), $"c2".as("c2bw"))
        .join(c1.select($"a".as("b"), $"c1".as("c1b")), Seq("b"))
      val uniTab = c1.select($"a".as("c"), $"c1".as("c1w"))

      grams(spark, 3).filter($"split" === "holdout")
        .join(triTab, Seq("a", "b", "c"), "left")
        .join(biTab, Seq("b", "c"), "left")
        .join(uniTab, Seq("c"), "left")
        .crossJoin(broadcast(nTot))
        .select($"doc_id",
          when($"c3".isNotNull, 3L).when($"c2bw".isNotNull, 2L)
            .when($"c1w".isNotNull, 1L).otherwise(0L).as("level"),
          greatest(
            when($"c3".isNotNull,
              expr(s"CAST(c3 AS DECIMAL(38,0)) * $pScale DIV c2ab"))
              .when($"c2bw".isNotNull,
                expr(s"(2 * (CAST(c2bw AS DECIMAL(38,0)) * $pScale DIV c1b)) DIV 5"))
              .when($"c1w".isNotNull,
                expr(s"(4 * (CAST(c1w AS DECIMAL(38,0)) * $pScale DIV n_tot)) DIV 25"))
              .otherwise(expr(s"(4 * ($pScale DIV n_tot)) DIV 25")),
            lit(1L)).as("p_fp"))
        .select($"doc_id", $"level",
          (lit(30L * 65536L) - expr(Unigram.lgFpSql("p_fp", spark = true)))
            .as("bits_fp"))
    }
  }

  /** Per-held-out-document cross-entropy under the backed-off model:
    * (doc_id, n_trigrams, xent_fp = mean bits·2^16, bits) — the
    * out-of-sample twin of [[KnLm.perplexity]]'s curation signal. */
  def perplexity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    scored(spark, sfDir)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum($"bits_fp").as("total_fp"))
      .select($"doc_id", $"n_trigrams",
        expr("total_fp DIV n_trigrams").as("xent_fp"),
        expr("(total_fp DIV n_trigrams) DIV 65536").as("bits"))
  }

  /** The backoff coverage table: per level (3 = trigram hit, 2 = bigram
    * backoff, 1 = unigram backoff, 0 = OOV floor) the held-out token count,
    * share in bp, and mean bits — the "how much context does the model
    * actually have" diagnostic a deployment reads against corpus size. */
  def backoffMix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byLevel = scored(spark, sfDir)
      .groupBy($"level")
      .agg(count(lit(1)).as("n_tokens"), sum($"bits_fp").as("total_fp"))
    val tot = byLevel.agg(sum($"n_tokens").as("tot"))
    byLevel.crossJoin(broadcast(tot))
      .select($"level", $"n_tokens",
        expr("n_tokens * 10000 DIV tot").as("share_bp"),
        expr("total_fp DIV n_tokens").as("mean_bits_fp"))
  }

  /** The held-out filter-threshold knob curve — [[KnLm.filterCurve]]'s
    * twin on the OUT-of-sample signal: per bits cutoff 3..6, document and
    * trigram-mass retention of a "keep ≤ b bits" filter. The two curves
    * together price the in-sample/held-out gap a deployment must know
    * before picking a perplexity threshold on unseen crawl data. */
  def filterCurve(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    perplexity(spark, sfDir)
      .select(explode(expr("sequence(3, 6)")).as("cutoff_bits"),
        $"bits", $"n_trigrams")
      .groupBy($"cutoff_bits")
      .agg(count(lit(1)).as("docs_total"),
        sum(when($"bits" <= $"cutoff_bits", 1L).otherwise(0L)).as("docs_kept"),
        sum($"n_trigrams").as("trigrams_total"),
        sum(when($"bits" <= $"cutoff_bits", $"n_trigrams").otherwise(0L))
          .as("trigrams_kept"))
      .select($"cutoff_bits".cast("long").as("cutoff_bits"),
        $"docs_kept", $"docs_total",
        expr("docs_kept * 10000 DIV docs_total").as("doc_keep_bp"),
        $"trigrams_kept", $"trigrams_total",
        expr("trigrams_kept * 10000 DIV trigrams_total").as("token_keep_bp"))
  }

  // ------------------------------------------------------------- oracles

  private val scoredCtes: String =
    s""", sb_doc AS (
         SELECT doc_id, string_split(text, ' ') AS w,
                ${Sampling.splitCaseSql("sha256(text)")} AS split
         FROM documents WHERE length(text) > 0),
       sb_tri AS (
         SELECT doc_id, split, w[t.i] AS a, w[t.i + 1] AS b, w[t.i + 2] AS c
         FROM sb_doc, UNNEST(range(1, len(w) - 1)) AS t(i)
         WHERE w[t.i] <> '' AND w[t.i + 1] <> '' AND w[t.i + 2] <> ''),
       sb_big AS (
         SELECT doc_id, split, w[t.i] AS a, w[t.i + 1] AS b
         FROM sb_doc, UNNEST(range(1, len(w))) AS t(i)
         WHERE w[t.i] <> '' AND w[t.i + 1] <> ''),
       sb_uni AS (
         SELECT doc_id, split, w[t.i] AS a
         FROM sb_doc, UNNEST(range(1, len(w) + 1)) AS t(i)
         WHERE w[t.i] <> ''),
       sb_c3 AS MATERIALIZED (
         SELECT a, b, c, COUNT(1) AS c3 FROM sb_tri
         WHERE split = 'train' GROUP BY 1, 2, 3),
       sb_c2 AS MATERIALIZED (
         SELECT a, b, COUNT(1) AS c2 FROM sb_big
         WHERE split = 'train' GROUP BY 1, 2),
       sb_c1 AS MATERIALIZED (
         SELECT a, COUNT(1) AS c1 FROM sb_uni
         WHERE split = 'train' GROUP BY 1),
       sb_n AS (SELECT SUM(c1) AS n_tot FROM sb_c1),
       sb_tri_tab AS MATERIALIZED (
         SELECT t.a, t.b, t.c, t.c3, d.c2 AS c2ab
         FROM sb_c3 t JOIN sb_c2 d ON t.a = d.a AND t.b = d.b),
       sb_bi_tab AS MATERIALIZED (
         SELECT g.a AS b, g.b AS c, g.c2 AS c2bw, d.c1 AS c1b
         FROM sb_c2 g JOIN sb_c1 d ON g.a = d.a),
       sb_p AS MATERIALIZED (
         SELECT g.doc_id,
                CASE WHEN t.c3 IS NOT NULL THEN 3
                     WHEN b.c2bw IS NOT NULL THEN 2
                     WHEN u.c1 IS NOT NULL THEN 1 ELSE 0 END AS level,
                CAST(GREATEST(CASE
                  WHEN t.c3 IS NOT NULL
                    THEN CAST(t.c3 AS HUGEINT) * $pScale // t.c2ab
                  WHEN b.c2bw IS NOT NULL
                    THEN (2 * (CAST(b.c2bw AS HUGEINT) * $pScale // b.c1b)) // 5
                  WHEN u.c1 IS NOT NULL
                    THEN (4 * (CAST(u.c1 AS HUGEINT) * $pScale
                               // (SELECT n_tot FROM sb_n))) // 25
                  ELSE (4 * ($pScale // (SELECT n_tot FROM sb_n))) // 25 END,
                  1) AS BIGINT) AS p_fp
         FROM sb_tri g
         LEFT JOIN sb_tri_tab t ON g.a = t.a AND g.b = t.b AND g.c = t.c
         LEFT JOIN sb_bi_tab b ON g.b = b.b AND g.c = b.c
         LEFT JOIN sb_c1 u ON g.c = u.a
         WHERE g.split = 'holdout'),
       sb_scored AS MATERIALIZED (
         SELECT doc_id, CAST(level AS BIGINT) AS level,
                30 * 65536 - ${Unigram.lgFpSql("p_fp", spark = false)} AS bits_fp
         FROM sb_p)"""

  val perplexityOracle: String = Fixtures.oracle(scoredCtes +
    """ SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_trigrams,
              CAST(SUM(bits_fp) // COUNT(1) AS BIGINT) AS xent_fp,
              CAST((SUM(bits_fp) // COUNT(1)) // 65536 AS BIGINT) AS bits
       FROM sb_scored GROUP BY doc_id""")

  val backoffMixOracle: String = Fixtures.oracle(scoredCtes +
    """ SELECT level, CAST(COUNT(1) AS BIGINT) AS n_tokens,
              CAST(COUNT(1) * 10000 // (SELECT COUNT(1) FROM sb_scored)
                AS BIGINT) AS share_bp,
              CAST(SUM(bits_fp) // COUNT(1) AS BIGINT) AS mean_bits_fp
       FROM sb_scored GROUP BY level""")

  val filterCurveOracle: String = Fixtures.oracle(scoredCtes +
    """, sb_ppl AS (
         SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_trigrams,
                CAST((SUM(bits_fp) // COUNT(1)) // 65536 AS BIGINT) AS bits
         FROM sb_scored GROUP BY doc_id)
       SELECT CAST(c.b AS BIGINT) AS cutoff_bits,
              CAST(SUM(CASE WHEN p.bits <= c.b THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
              CAST(COUNT(1) AS BIGINT) AS docs_total,
              CAST((SUM(CASE WHEN p.bits <= c.b THEN 1 ELSE 0 END) * 10000)
                   // COUNT(1) AS BIGINT) AS doc_keep_bp,
              CAST(SUM(CASE WHEN p.bits <= c.b THEN p.n_trigrams ELSE 0 END) AS BIGINT)
                AS trigrams_kept,
              CAST(SUM(p.n_trigrams) AS BIGINT) AS trigrams_total,
              CAST((SUM(CASE WHEN p.bits <= c.b THEN p.n_trigrams ELSE 0 END) * 10000)
                   // SUM(p.n_trigrams) AS BIGINT) AS token_keep_bp
       FROM sb_ppl p CROSS JOIN UNNEST(range(3, 7)) AS c(b)
       GROUP BY c.b""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_sb_perplexity" -> (perplexity _),
    "text_sb_backoff_mix" -> (backoffMix _),
    "text_sb_filter_curve" -> (filterCurve _))

  val oracles: Map[String, String] = Map(
    "text_sb_perplexity" -> perplexityOracle,
    "text_sb_backoff_mix" -> backoffMixOracle,
    "text_sb_filter_curve" -> filterCurveOracle)
}
