package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** WordPiece tokenizer training and greedy longest-match inference
  * (Schuster & Nakajima, ICASSP 2012 — the BERT/SentencePiece-BPE sibling),
  * completing the in-engine tokenizer family next to [[Bpe]].
  *
  * WordPiece differs from BPE in BOTH halves of the algorithm, so the two
  * families price against each other:
  *
  *  - TRAINING picks the merge maximizing the unigram-LM likelihood gain
  *    `count(ab) / (count(a)·count(b))` — a likelihood RATIO — instead of
  *    BPE's raw `count(ab)` argmax. A pair of individually-rare tokens that
  *    almost always co-occur wins over a pair of ubiquitous tokens that
  *    co-occur by chance. The ratio is computed in exact fixed-point
  *    (`count(ab)·10¹² DIV (count(a)·count(b))`, DECIMAL(38) intermediates /
  *    DuckDB HUGEINT — counts ≤ ~10¹³ at 100 TB keep every product within
  *    both), so the argmax is a total order both engines replay bit-equal;
  *    ties break lexicographically on (a, b) like the BPE trainer.
  *  - INFERENCE is greedy longest-match-first over the final vocabulary
  *    (BERT's WordPiece tokenizer), NOT merge-order replay: at each position
  *    consume the longest vocab piece that matches, else a single character.
  *    The continuation marker (`##`) is presentational — it changes piece
  *    SPELLING for subword disambiguation, not the match/segmentation
  *    semantics — and is omitted; documented here so the boundary is honest.
  *
  * Scale shape: identical to [[Bpe]] — every training round and the whole
  * inference pipeline are DISTINCT-VOCABULARY-sized (Heaps-bounded, ~10⁸
  * rows at 100 TB), never corpus-sized; the corpus is touched exactly twice,
  * both map-side-combined aggregations. Training adds one vocabulary-sized
  * token-count aggregation per round (the ratio's denominators) to BPE's
  * pair-count aggregation; both argmaxes are TakeOrderedAndProject (1-row
  * result, no global sort). Inference materializes per-word longest-match
  * lengths relationally — (word × char positions) ⋈ broadcast(pieces), a
  * vocabulary-sized frame with a bounded 12-piece fan-out — then walks each
  * word with one `aggregate` fold over the match-length array (greedy jumps:
  * pos += matchlen(pos)); no per-row UDF, no driver loop. DuckDB replays the
  * identical join + `list_reduce` walk, so all three oracles hash-match.
  */
object WordPiece {

  /** Merge budget — same knob and same fixture value as [[Bpe.bpeMerges]],
    * so the [[compare]] entry prices the two selection criteria at an equal
    * vocabulary size. */
  private[queries] val wpMerges = 12

  /** Fixed-point scale of the likelihood-ratio score (basis: 10¹²). The
    * score is ≤ 1 (count(ab) ≤ min(count(a), count(b))), so scaled scores
    * fit BIGINT; intermediates `count·10¹²` and `count·count` fit
    * DECIMAL(38)/HUGEINT for corpus token counts up to ~10¹³. */
  private val scoreScale = "1000000000000"

  /** The learned merge table: one row per round, in training order —
    * (merge_rank, pair_left, pair_right, piece, pair_count, score_fp).
    * Memoized like [[Bpe.trainMerges]]; the inference entries replay the
    * trained pieces rather than re-training. */
  def trainMerges(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.util.Memo.checkpointed(spark, sfDir, "wp_train_merges") {
      import spark.implicits._
      var v = Bpe.vocab0(spark, sfDir).localCheckpoint()
      var merges = Vector.empty[DataFrame]
      for (t <- 1 to wpMerges) {
        // unigram token counts of the CURRENT tokenization — the ratio's
        // denominators; one vocabulary-sized map-side-combined aggregation
        val tok = v.select($"freq", explode($"toks").as("tk"))
          .groupBy($"tk").agg(sum($"freq").as("cnt"))
        val top = v.select($"freq", explode(Bpe.pairsCol).as("p"))
          .groupBy($"p.a".as("a"), $"p.b".as("b"))
          .agg(sum($"freq").as("pair_count"))
          .join(tok.select($"tk".as("a"), $"cnt".as("ca")), Seq("a"))
          .join(tok.select($"tk".as("b"), $"cnt".as("cb")), Seq("b"))
          .withColumn("score_fp", expr(
            s"CAST(pair_count AS DECIMAL(38,0)) * $scoreScale" +
              " DIV (CAST(ca AS DECIMAL(38,0)) * cb)"))
          .orderBy($"score_fp".desc, $"a", $"b").limit(1)
          .localCheckpoint()
        merges = merges :+ top.select(lit(t.toLong).as("merge_rank"),
          $"a".as("pair_left"), $"b".as("pair_right"),
          concat($"a", $"b").as("piece"), $"pair_count", $"score_fp")
        if (t < wpMerges)
          v = v.crossJoin(broadcast(top.select($"a", $"b")))
            .select($"w", $"freq",
              expr(Bpe.mergeFoldSql("toks", "a", "b")).as("toks"))
            .localCheckpoint()
      }
      merges.reduce(_ unionByName _)
    }
  }

  /** Greedy longest-match walk over a per-word match-length array `ml`
    * (ml[p+1] = longest vocab piece matching at 0-based char position p,
    * 1 if only the single-character fallback matches): fold positions
    * left-to-right, consuming ml[pos] characters whenever the cursor sits
    * on the position — the accumulator is (chars consumed, pieces emitted).
    * Every position is visited, consumed ones are skipped, so the fold is
    * O(len) and total by construction (ml ≥ 1 everywhere). */
  private def greedyCountSql(ml: String): String =
    s"""aggregate(sequence(1, size($ml)),
          named_struct('p', 0, 'n', 0),
          (acc, i) -> IF(acc.p = i - 1,
            named_struct('p', acc.p + element_at($ml, acc.p + 1),
                         'n', acc.n + 1),
            acc))"""

  /** The tokenized vocabulary under greedy longest-match inference:
    * (w, n_toks, consumed) — `consumed` is the walk's final cursor,
    * = length(w) by the totality invariant (WordPieceSpec pins it). */
  private[graft] def vocabTok(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.checkpointed(spark, sfDir, "wp_vtok") {
      vocabTokBuild(spark, sfDir)
    }

  /** The un-memoized build plan (ScalePlanSpec pins its matcher broadcast —
    * the memoized wrapper hands consumers a leaf RDD, so the shape is only
    * visible here). */
  private[graft] def vocabTokBuild(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pieces = trainMerges(spark, sfDir).select($"piece").distinct()
    val ml = Bpe.vocab0(spark, sfDir)
      .select($"w", explode(expr("sequence(1, length(w))")).as("pos"))
      .crossJoin(broadcast(pieces))
      .groupBy($"w", $"pos")
      .agg(max(when(expr("substring(w, pos, length(piece)) = piece"),
        length($"piece")).otherwise(1)).as("mlen"))
      .groupBy($"w")
      .agg(expr("transform(array_sort(collect_list(named_struct(" +
        "'pos', pos, 'mlen', mlen))), x -> x.mlen)").as("ml"))
    ml.select($"w", expr(greedyCountSql("ml") + ".n").cast("long").as("n_toks"),
      expr(greedyCountSql("ml") + ".p").cast("long").as("consumed"))
  }

  /** Tokenizer fertility per language under the trained WordPiece vocab —
    * the same published table shape as [[Bpe.fertility]], so the two
    * tokenizers are directly comparable. */
  def fertility(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val vt = vocabTok(spark, sfDir).select($"w", $"n_toks")
    Bpe.langWord(spark, sfDir).join(vt, Seq("w"))
      .groupBy($"lang")
      .agg(sum($"freq").as("words"),
        sum($"freq" * $"n_toks").as("tokens"),
        sum($"freq" * length($"w")).as("chars"))
      .select($"lang", $"words", $"tokens",
        expr("tokens * 10000 DIV words").as("fertility_bp"),
        expr("chars * 10000 DIV tokens").as("chars_per_token_bp"))
  }

  // the cross-tokenizer comparison entry lives in [[Unigram]] (3-way).

  // -------------------------------------------------------------------
  // Oracles — the training rounds unrolled as MATERIALIZED CTE triples
  // (token counts, ratio-argmax winner, fold-updated vocabulary), then the
  // greedy walk replayed with the same join + list_reduce. Shares bpe_w /
  // bpe_v0 with the BPE chain via Bpe.vocabCtes.
  // -------------------------------------------------------------------

  private def wpRound(t: Int): String =
    s""", wp_tok$t AS MATERIALIZED (
         SELECT tk, SUM(freq) AS cnt
         FROM (SELECT freq, unnest(toks) AS tk FROM wp_v${t - 1})
         GROUP BY 1),
       wp_p$t AS MATERIALIZED (
         SELECT p.a, p.b, p.pair_count,
                CAST(CAST(p.pair_count AS HUGEINT) * $scoreScale
                     // (CAST(ca.cnt AS HUGEINT) * cb.cnt) AS BIGINT) AS score_fp
         FROM (SELECT toks[t.i] AS a, toks[t.i + 1] AS b, SUM(freq) AS pair_count
               FROM wp_v${t - 1}, UNNEST(range(1, len(toks))) AS t(i)
               GROUP BY 1, 2) p
         JOIN wp_tok$t ca ON ca.tk = p.a
         JOIN wp_tok$t cb ON cb.tk = p.b
         ORDER BY score_fp DESC, p.a, p.b LIMIT 1),
       wp_v$t AS MATERIALIZED (
         SELECT v.w, v.freq,
                CASE WHEN p.a IS NULL THEN v.toks
                     ELSE ${Bpe.duckMergeFold("v.toks", "p.a", "p.b")} END AS toks
         FROM wp_v${t - 1} v LEFT JOIN wp_p$t p ON TRUE)"""

  private[queries] val trainCtes: String =
    Bpe.vocabCtes +
      ", wp_v0 AS (SELECT w, freq, toks FROM bpe_v0)" +
      (1 to wpMerges).map(wpRound).mkString

  /** The WP rounds + inference chain WITHOUT the corpus prelude — for the
    * cross-tokenizer comparison oracle, which shares one bpe_w/bpe_v0. */
  private[queries] val chainAfterVocabCtes: String =
    ", wp_v0 AS (SELECT w, freq, toks FROM bpe_v0)" +
      (1 to wpMerges).map(wpRound).mkString

  val trainMergesOracle: String = Fixtures.oracle(trainCtes +
    (1 to wpMerges).map(t =>
      s"""SELECT CAST($t AS BIGINT) AS merge_rank, a AS pair_left,
             b AS pair_right, a || b AS piece,
             CAST(pair_count AS BIGINT) AS pair_count, score_fp
          FROM wp_p$t""").mkString("\n", " UNION ALL ", ""))

  /** DuckDB twin of [[greedyCountSql]]: same seed-prepended list_reduce,
    * accumulator [consumed, pieces]; `[2]` extracts the piece count. */
  private def duckGreedyCount(ml: String): String =
    s"""list_reduce(
          list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
            list_transform(range(1, len($ml) + 1), i -> [i, CAST(0 AS BIGINT)])),
          (acc, x) -> CASE WHEN acc[1] = x[1] - 1
                           THEN [acc[1] + $ml[acc[1] + 1], acc[2] + 1]
                           ELSE acc END)[2]"""

  /** Pieces table + per-word match-length arrays + the greedy walk → the
    * (w, n_toks) vocabulary CTE `wp_vt`. */
  private[queries] val inferCtes: String =
    s""", wp_pieces AS MATERIALIZED (
         SELECT DISTINCT piece FROM (${(1 to wpMerges)
      .map(t => s"SELECT a || b AS piece FROM wp_p$t").mkString(" UNION ALL ")})),
       wp_ml AS MATERIALIZED (
         SELECT s.w, s.pos,
                MAX(CASE WHEN substring(s.w, s.pos, length(p.piece)) = p.piece
                         THEN length(p.piece) ELSE 1 END) AS mlen
         FROM (SELECT w, unnest(range(1, length(w) + 1)) AS pos FROM bpe_w) s
         CROSS JOIN wp_pieces p
         GROUP BY 1, 2),
       wp_mla AS MATERIALIZED (
         SELECT w, list(mlen ORDER BY pos) AS ml FROM wp_ml GROUP BY 1),
       wp_vt AS MATERIALIZED (
         SELECT w, CAST(${duckGreedyCount("ml")} AS BIGINT) AS n_toks
         FROM wp_mla)"""

  val fertilityOracle: String = Fixtures.oracle(
    trainCtes + inferCtes + Bpe.langWordCte + Bpe.fertilitySelect("wp_vt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_wordpiece_train" -> (trainMerges _),
    "text_wordpiece_fertility" -> (fertility _))

  val oracles: Map[String, String] = Map(
    "text_wordpiece_train" -> trainMergesOracle,
    "text_wordpiece_fertility" -> fertilityOracle)
}
