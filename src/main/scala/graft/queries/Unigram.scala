package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** Unigram-LM tokenizer (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram model), completing the tokenizer triad next to
  * [[Bpe]] and [[WordPiece]]. Where BPE and WordPiece GROW a vocabulary by
  * merges, the unigram model scores a piece INVENTORY and segments each
  * word by exact Viterbi: the segmentation maximizing Σ log p(piece),
  * p(piece) = count(piece)/C over the inventory's count mass.
  *
  * Scope (documented boundary): the inventory is frequency-seeded — every
  * corpus character (the coverage floor SentencePiece also guarantees)
  * plus the top [[seedPieces]] multi-character substrings of length ≤
  * [[maxPieceLen]] by corpus count — and is NOT EM-pruned; the EM loop's
  * E-step requires extracting argmax PATHS (not just scores), whose
  * tie-breaking has no deterministic relational replay at acceptable
  * oracle cost. Inference — the half every SentencePiece user runs — is
  * exact Viterbi, not an approximation.
  *
  * Determinism is the interesting part: Viterbi compares sums of log
  * probabilities, and floating-point `ln` is not bit-portable across
  * engines. Instead scores are an EXACT fixed-point log2: lg(c) = msb(c)
  * (integer bit length, via the binary-string length both engines print
  * identically) scaled by 2^16, plus 16 fraction bits from the classic
  * iterated-squaring algorithm (normalize the mantissa to [2^30, 2^31),
  * square, emit a bit, renormalize — 16 integer-only rounds, every
  * intermediate < 2^62). Both engines replay the identical integer
  * recurrence, so the DP is bit-equal by construction — the same
  * discipline as the fee-math Q128 and the DCT pHash.
  *
  * The DP itself packs (score, piece count) into ONE integer,
  * w(piece) = (lg(c) − lg(C))·1024 − 1: packing is linear, so path sums
  * compare lexicographically (max score, then min pieces) as plain BIGINT
  * max — a total, deterministic objective even when two segmentations tie
  * on probability. Per word the DP is one `aggregate` fold over positions
  * (acc = the dp array), candidates per position precomputed relationally:
  * (word × end-position) ⋈ broadcast(inventory) on a substring match.
  * Everything is vocabulary-sized; the corpus is touched exactly twice
  * (word counts, per-lang word counts) — the same 100 TB shape as the
  * other two trainers.
  */
object Unigram {

  /** Multi-character inventory budget + max piece length — the vocab-size
    * knobs (real models run 32-256k pieces; the loop shape is identical). */
  private[queries] val seedPieces = 48
  private[queries] val maxPieceLen = 4

  private val fracBits = 16
  private val kPack = 1024L // max pieces per word the packing supports

  // ------------------------------------------------------------- scoring

  /** Fixed-point log2 in SQL: msb·2^16 + 16 mantissa bits by iterated
    * squaring. `ref` must be a strictly positive BIGINT expression;
    * `shiftl`/`msb` are the engine's shift-left and bit-length forms. */
  private[queries] def lgFpSql(ref: String, spark: Boolean): String = {
    val msb =
      if (spark) s"(length(conv($ref, 10, 2)) - 1)"
      else s"(length(bin($ref)) - 1)"
    def shl(a: String, n: String) =
      if (spark) s"shiftleft(CAST($a AS BIGINT), $n)" else s"(CAST($a AS BIGINT) << ($n))"
    // mantissa normalized to [2^30, 2^31): multiply up or divide down so
    // no intermediate leaves BIGINT (counts ≤ 2^62-ish are fine)
    val r0 = s"""CASE WHEN $msb <= 30 THEN $ref * ${shl("1", s"30 - $msb")}
                      ELSE $ref DIV ${shl("1", s"$msb - 30")} END"""
    val r0duck = s"""CASE WHEN $msb <= 30 THEN $ref * ${shl("1", s"30 - $msb")}
                      ELSE $ref // ${shl("1", s"$msb - 30")} END"""
    if (spark)
      s"""($msb * 65536 + aggregate(sequence(1, $fracBits),
            named_struct('r', CAST(($r0) AS BIGINT), 'f', CAST(0 AS BIGINT)),
            (acc, i) -> CASE
              WHEN acc.r * acc.r DIV 1073741824 >= 2147483648
                THEN named_struct('r', acc.r * acc.r DIV 1073741824 DIV 2,
                                  'f', acc.f * 2 + 1)
              ELSE named_struct('r', acc.r * acc.r DIV 1073741824,
                                'f', acc.f * 2) END).f)"""
    else
      s"""($msb * 65536 + list_reduce(
            list_prepend([CAST($r0duck AS BIGINT), CAST(0 AS BIGINT)],
              list_transform(range(1, $fracBits + 1), i -> [CAST(0 AS BIGINT), CAST(0 AS BIGINT)])),
            (acc, x) -> CASE
              WHEN acc[1] * acc[1] // 1073741824 >= 2147483648
                THEN [acc[1] * acc[1] // 1073741824 // 2, acc[2] * 2 + 1]
              ELSE [acc[1] * acc[1] // 1073741824, acc[2] * 2] END)[2])"""
  }

  // ------------------------------------------------------------- Spark

  /** The scored inventory: every corpus character plus the top
    * [[seedPieces]] substrings (length 2..[[maxPieceLen]]) by weighted
    * count — (piece, piece_len, cnt, lg_fp). Memoized; fertility and the
    * comparison replay it. */
  def inventory(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.util.Memo.cached(spark, sfDir, "ug_inventory") {
      import spark.implicits._
      val words = Bpe.vocab0(spark, sfDir).select($"w", $"freq")
      val subs = words
        .select($"w", $"freq", explode(expr("sequence(1, length(w))")).as("i"))
        .select($"w", $"freq", $"i",
          explode(expr(s"sequence(2, $maxPieceLen)")).as("l"))
        .filter($"i" + $"l" - 1 <= length($"w"))
        .select(expr("substring(w, i, l)").as("piece"), $"freq")
        .groupBy($"piece").agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"piece").limit(seedPieces)
      val chars = words
        .select(explode(expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("piece"),
          $"freq")
        .groupBy($"piece").agg(sum($"freq").as("cnt"))
      subs.unionByName(chars)
        .select($"piece", length($"piece").cast("long").as("piece_len"), $"cnt",
          expr(lgFpSql("cnt", spark = true)).cast("long").as("lg_fp"))
    }
  }

  /** Per-word Viterbi token count under the inventory: (w, n_toks).
    * Matches are precomputed relationally; the DP fold carries the packed
    * (score·1024 − k) array and the answer's k is recovered modulo the
    * packing base. Single characters are always in the inventory, so every
    * position has ≥ 1 match and the DP is total. */
  private[graft] def vocabTok(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.cached(spark, sfDir, "ug_vtok") {
    import spark.implicits._
    val inv = inventory(spark, sfDir)
    val lgc = inv.agg(sum($"cnt").as("c"))
      .select(expr(lgFpSql("c", spark = true)).cast("long").as("lgc"))
    val scored = inv.crossJoin(broadcast(lgc))
      .select($"piece", $"piece_len".as("l"),
        (($"lg_fp" - $"lgc") * lit(kPack) - 1).as("wgt"))
    val matches = Bpe.vocab0(spark, sfDir)
      .select($"w", explode(expr("sequence(1, length(w))")).as("j"))
      .join(broadcast(scored),
        expr("l <= j AND substring(w, CAST(j - l + 1 AS INT), CAST(l AS INT)) = piece"))
      .groupBy($"w", $"j")
      .agg(collect_list(array($"l", $"wgt")).as("ms"))
      .groupBy($"w")
      .agg(expr("transform(array_sort(collect_list(named_struct('j', j, 'ms', array_sort(ms)))), x -> x.ms)")
        .as("mls"))
    matches.select($"w",
      expr(s"""pmod(-element_at(
            aggregate(sequence(1, size(mls)), array(CAST(0 AS BIGINT)),
              (acc, j) -> concat(acc, array(array_max(
                transform(element_at(mls, j),
                  m -> element_at(acc, CAST(j - element_at(m, 1) + 1 AS INT))
                       + element_at(m, 2)))))),
            size(mls) + 1), $kPack)""").cast("long").as("n_toks"))
  }

  /** Per-lang fertility under exact Viterbi — the same published table as
    * the BPE and WordPiece entries, third row of the bake-off. */
  def fertility(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val vt = vocabTok(spark, sfDir)
    val langWord = spark.table("documents")
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"lang", $"w").agg(count(lit(1)).as("freq"))
    langWord.join(vt, Seq("w"))
      .groupBy($"lang")
      .agg(sum($"freq").as("words"),
        sum($"freq" * $"n_toks").as("tokens"),
        sum($"freq" * length($"w")).as("chars"))
      .select($"lang", $"words", $"tokens",
        expr("tokens * 10000 DIV words").as("fertility_bp"),
        expr("chars * 10000 DIV tokens").as("chars_per_token_bp"))
  }

  /** The three-tokenizer bake-off: per-lang fertility of BPE, WordPiece,
    * and the unigram model on one corpus at comparable budgets. */
  def compare(spark: SparkSession, sfDir: String): DataFrame = {
    val b = Bpe.fertility(spark, sfDir)
      .select(col("lang"), col("fertility_bp").as("bpe_fertility_bp"))
    val w = WordPiece.fertility(spark, sfDir)
      .select(col("lang"), col("fertility_bp").as("wordpiece_fertility_bp"))
    val u = fertility(spark, sfDir)
      .select(col("lang"), col("fertility_bp").as("unigram_fertility_bp"))
    b.join(w, Seq("lang")).join(u, Seq("lang"))
      .select(col("lang"), col("bpe_fertility_bp"),
        col("wordpiece_fertility_bp"), col("unigram_fertility_bp"))
  }

  // ------------------------------------------------------------- oracles

  /** Inventory + Viterbi chain over the shared bpe_w corpus prelude,
    * ending in ug_vt (w, n_toks). */
  private val ugCtes: String = {
    val lg = lgFpSql("cnt", spark = false)
    val lgcExpr = lgFpSql("c", spark = false)
    s""", ug_sub AS (
         SELECT piece, cnt FROM (
           SELECT substring(w, CAST(p.i AS INT), CAST(l.j AS INT)) AS piece,
                  SUM(freq) AS cnt
           FROM bpe_w, UNNEST(range(1, length(w) + 1)) AS p(i),
                UNNEST(range(2, $maxPieceLen + 1)) AS l(j)
           WHERE p.i + l.j - 1 <= length(w)
           GROUP BY 1)
         ORDER BY cnt DESC, piece LIMIT $seedPieces),
       ug_char AS (
         SELECT substring(w, CAST(p.i AS INT), 1) AS piece, SUM(freq) AS cnt
         FROM bpe_w, UNNEST(range(1, length(w) + 1)) AS p(i)
         GROUP BY 1),
       ug_inv AS MATERIALIZED (
         SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len, cnt,
                CAST($lg AS BIGINT) AS lg_fp
         FROM (SELECT piece, cnt FROM ug_sub UNION ALL SELECT piece, cnt FROM ug_char)),
       ug_lgc AS (
         SELECT CAST($lgcExpr AS BIGINT) AS lgc
         FROM (SELECT SUM(cnt) AS c FROM ug_inv)),
       ug_matches AS MATERIALIZED (
         SELECT s.w, s.j, p.piece_len AS l,
                (p.lg_fp - (SELECT lgc FROM ug_lgc)) * $kPack - 1 AS wgt
         FROM (SELECT w, unnest(range(1, length(w) + 1)) AS j FROM bpe_w) s
         JOIN ug_inv p
           ON p.piece_len <= s.j
          AND substring(s.w, CAST(s.j - p.piece_len + 1 AS INT),
                        CAST(p.piece_len AS INT)) = p.piece),
       ug_mj AS (
         SELECT w, j, list_sort(list([CAST(l AS BIGINT), wgt])) AS ms
         FROM ug_matches GROUP BY 1, 2),
       ug_mla AS MATERIALIZED (
         SELECT w, list(ms ORDER BY j) AS mls FROM ug_mj GROUP BY 1),
       ug_vt AS MATERIALIZED (
         SELECT w, CAST((-(list_reduce(
                  list_prepend([CAST(0 AS BIGINT)],
                    list_transform(range(1, len(mls) + 1), i -> [i])),
                  (acc, x) -> acc || [list_max(list_transform(mls[x[1]],
                    m -> acc[x[1] - m[1] + 1] + m[2]))])[len(mls) + 1])) % $kPack
              AS BIGINT) AS n_toks
         FROM ug_mla)"""
  }

  val inventoryOracle: String = Fixtures.oracle(Bpe.vocabCtes + ugCtes +
    """ SELECT piece, piece_len, CAST(cnt AS BIGINT) AS cnt, lg_fp FROM ug_inv""")

  val fertilityOracle: String = Fixtures.oracle(
    Bpe.vocabCtes + ugCtes + Bpe.langWordCte + Bpe.fertilitySelect("ug_vt"))

  val compareOracle: String = Fixtures.oracle(
    Bpe.compareSideCtes + WordPiece.chainAfterVocabCtes + WordPiece.inferCtes +
      ugCtes + Bpe.langWordCte +
      s""", bpe_fert AS (
           SELECT l.lang,
                  CAST((SUM(l.freq * v.n_toks) * 10000) // SUM(l.freq) AS BIGINT)
                    AS bpe_fertility_bp
           FROM bpe_lw l JOIN bpe_vt v ON l.w = v.w GROUP BY 1),
         wp_fert AS (
           SELECT l.lang,
                  CAST((SUM(l.freq * v.n_toks) * 10000) // SUM(l.freq) AS BIGINT)
                    AS wordpiece_fertility_bp
           FROM bpe_lw l JOIN wp_vt v ON l.w = v.w GROUP BY 1),
         ug_fert AS (
           SELECT l.lang,
                  CAST((SUM(l.freq * v.n_toks) * 10000) // SUM(l.freq) AS BIGINT)
                    AS unigram_fertility_bp
           FROM bpe_lw l JOIN ug_vt v ON l.w = v.w GROUP BY 1)
       SELECT b.lang, b.bpe_fertility_bp, w.wordpiece_fertility_bp,
              u.unigram_fertility_bp
       FROM bpe_fert b
       JOIN wp_fert w ON b.lang = w.lang
       JOIN ug_fert u ON b.lang = u.lang""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unigram_inventory" -> (inventory _),
    "text_unigram_fertility" -> (fertility _),
    "text_tokenizer_compare" -> (compare _))

  val oracles: Map[String, String] = Map(
    "text_unigram_inventory" -> inventoryOracle,
    "text_unigram_fertility" -> fertilityOracle,
    "text_tokenizer_compare" -> compareOracle)
}
