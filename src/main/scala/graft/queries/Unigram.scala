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
  * Training (since r15, VERDICT r14 #5): the inventory is frequency-seeded
  * — every corpus character (the coverage floor SentencePiece also
  * guarantees) plus the top [[seedPieces]] multi-character substrings of
  * length ≤ [[maxPieceLen]] by corpus count — then refined by ONE
  * deterministic hard-EM round closing the documented gap to Kudo 2018:
  * E-step = exact Viterbi paths under the seed model (argmax PATH
  * extracted by DP backtrack with a total tie-break — smallest piece
  * length first among score maximizers, which both engines replay because
  * the per-position match lists are sorted identically); M-step = piece
  * counts re-estimated as the frequency-weighted Viterbi usage mass, +1
  * smoothed so unused coverage characters stay positive; PRUNE = drop the
  * [[prunePieces]] multi-character pieces with the smallest exact
  * likelihood-loss upper bound, loss(p) = uses(p)·(w(p) − Σ_chars w(c)) —
  * the corpus log-likelihood forfeited if every Viterbi use of p fell
  * back to its character spelling (the always-available alternative), in
  * the same packed fixed-point weights the DP compares, so the rank is
  * integer-exact and tie-broken on (loss, cnt, piece). 25% of the seed
  * budget per round is SentencePiece's own default shrinking factor.
  * Inference — the half every SentencePiece user runs — is exact Viterbi
  * over the pruned inventory. Remaining documented boundary: ONE EM round
  * (SentencePiece iterates until a target vocab), and hard (Viterbi) EM
  * rather than the lattice-expectation E-step.
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

  /** Pieces dropped by the EM prune: 25% of the seed budget, SentencePiece's
    * default per-round shrinking factor. */
  private[queries] val prunePieces = 12

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

  /** The SEED inventory: every corpus character plus the top
    * [[seedPieces]] substrings (length 2..[[maxPieceLen]]) by weighted
    * count — (piece, piece_len, cnt, lg_fp). The EM round's starting
    * model; [[inventory]] is what ships. Memoized. */
  private[graft] def seedInventory(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.util.Memo.checkpointed(spark, sfDir, "ug_seed_inv") {
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

  /** (piece, l, wgt) — packed DP weights under an inventory's count mass. */
  private def scoredPieces(spark: SparkSession, inv: DataFrame): DataFrame = {
    import spark.implicits._
    val lgc = inv.agg(sum($"cnt").as("c"))
      .select(expr(lgFpSql("c", spark = true)).cast("long").as("lgc"))
    inv.crossJoin(broadcast(lgc))
      .select($"piece", $"piece_len".as("l"),
        (($"lg_fp" - $"lgc") * lit(kPack) - 1).as("wgt"))
  }

  /** (w, j, piece, l, wgt) — per-position inventory matches over the
    * weighted vocabulary (the DP's relational precomputation). */
  private def matchFrame(spark: SparkSession, sfDir: String,
      scored: DataFrame): DataFrame = {
    import spark.implicits._
    Bpe.vocab0(spark, sfDir)
      .select($"w", explode(expr("sequence(1, length(w))")).as("j"))
      .join(broadcast(scored),
        expr("l <= j AND substring(w, CAST(j - l + 1 AS INT), CAST(l AS INT)) = piece"))
  }

  /** (w, mls, dp) — the packed Viterbi DP array per word (dp(0)=0 at
    * element 1; dp(j) at element j+1). */
  private def dpFrame(matches: DataFrame): DataFrame =
    matches
      .groupBy(col("w"), col("j"))
      .agg(collect_list(array(col("l"), col("wgt"))).as("ms"))
      .groupBy(col("w"))
      .agg(expr("transform(array_sort(collect_list(named_struct('j', j, 'ms', array_sort(ms)))), x -> x.ms)")
        .as("mls"))
      .withColumn("dp", expr(
        """aggregate(sequence(1, size(mls)), array(CAST(0 AS BIGINT)),
             (acc, j) -> concat(acc, array(array_max(
               transform(element_at(mls, j),
                 m -> element_at(acc, CAST(j - element_at(m, 1) + 1 AS INT))
                      + element_at(m, 2))))))"""))

  /** The shipped inventory: seed → one hard-EM round → prune (see the
    * object doc). Memoized; fertility, the comparison, and the Viterbi
    * DP all consume it. */
  def inventory(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.util.Memo.checkpointed(spark, sfDir, "ug_inventory") {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val seed = seedInventory(spark, sfDir)
      // E-step: argmax segmentation boundaries by DP backtrack. At each
      // position the chosen match is the FIRST score maximizer of the
      // sorted match list (smallest l, a total order — one piece per
      // (word, position, length)); `b` is the ascending boundary list
      // [0, ..., |w|], so segment k is (j = b[k+1], l = b[k+1] − b[k]).
      val matches0 = matchFrame(spark, sfDir, scoredPieces(spark, seed))
      val picks = dpFrame(matches0)
        .withColumn("b", expr(
          """aggregate(sequence(1, size(mls)),
               array(CAST(size(mls) AS BIGINT)),
               (acc, i) -> IF(element_at(acc, 1) <= 0, acc,
                 concat(array(element_at(acc, 1) - element_at(element_at(
                   filter(element_at(mls, CAST(element_at(acc, 1) AS INT)),
                     m -> element_at(dp, CAST(element_at(acc, 1) - element_at(m, 1) + 1 AS INT))
                          + element_at(m, 2)
                          = element_at(dp, CAST(element_at(acc, 1) + 1 AS INT))), 1), 1)),
                   acc)))"""))
        .select($"w", explode(expr(
          """transform(sequence(1, size(b) - 1),
               k -> named_struct('j', element_at(b, CAST(k + 1 AS INT)),
                                 'l', element_at(b, CAST(k + 1 AS INT))
                                      - element_at(b, CAST(k AS INT))))""")).as("seg"))
        .select($"w", $"seg.j".as("j"), $"seg.l".as("l"))
      val usage = picks
        .join(matches0.select($"w", $"j", $"l", $"piece"), Seq("w", "j", "l"))
        .join(Bpe.vocab0(spark, sfDir).select($"w", $"freq"), Seq("w"))
        .groupBy($"piece").agg(sum($"freq").as("uses"))
      // M-step: counts = frequency-weighted Viterbi usage, +1 smoothed
      val em = seed.select($"piece", $"piece_len")
        .join(usage, Seq("piece"), "left")
        .select($"piece", $"piece_len",
          (coalesce($"uses", lit(0L)) + 1L).as("cnt"),
          coalesce($"uses", lit(0L)).as("uses"))
        .withColumn("lg_fp", expr(lgFpSql("cnt", spark = true)).cast("long"))
      // prune: exact likelihood-loss upper bound vs the character spelling
      val lgc1 = em.agg(sum($"cnt").as("c"))
        .select(expr(lgFpSql("c", spark = true)).cast("long").as("lgc"))
      val w1 = em.crossJoin(broadcast(lgc1))
        .withColumn("wgt", ($"lg_fp" - $"lgc") * lit(kPack) - 1)
      val chars = w1.filter($"piece_len" === 1)
      val charSpell = w1.filter($"piece_len" >= 2)
        .select($"piece", explode(expr(
          "transform(sequence(1, CAST(length(piece) AS INT)), i -> substring(piece, i, 1))")).as("ch"))
        .join(broadcast(chars.select($"piece".as("ch"), $"wgt".as("cw"))), Seq("ch"))
        .groupBy($"piece").agg(sum($"cw").as("char_wgt"))
      // the global window ranks ≤ seedPieces rows — inventory-sized, never
      // corpus-sized
      val kept = w1.filter($"piece_len" >= 2)
        .join(charSpell, Seq("piece"))
        .withColumn("loss", $"uses" * ($"wgt" - $"char_wgt"))
        .withColumn("prn", row_number().over(
          Window.orderBy($"loss", $"cnt", $"piece")))
        .filter($"prn" > prunePieces)
      kept.select($"piece", $"piece_len", $"cnt", $"lg_fp")
        .unionByName(chars.select($"piece", $"piece_len", $"cnt", $"lg_fp"))
    }
  }

  /** Per-word Viterbi token count under the inventory: (w, n_toks).
    * Matches are precomputed relationally; the DP fold carries the packed
    * (score·1024 − k) array and the answer's k is recovered modulo the
    * packing base. Single characters are always in the inventory, so every
    * position has ≥ 1 match and the DP is total. */
  private[graft] def vocabTok(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Memo.checkpointed(spark, sfDir, "ug_vtok") {
      vocabTokBuild(spark, sfDir)
    }

  /** The un-memoized build plan (ScalePlanSpec pins its matcher broadcast —
    * the memoized wrapper hands consumers a leaf RDD, so the shape is only
    * visible here). */
  private[graft] def vocabTokBuild(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val matches =
      matchFrame(spark, sfDir, scoredPieces(spark, inventory(spark, sfDir)))
    dpFrame(matches).select($"w",
      expr(s"pmod(-element_at(dp, size(mls) + 1), $kPack)")
        .cast("long").as("n_toks"))
  }

  /** Per-lang fertility under exact Viterbi — the same published table as
    * the BPE and WordPiece entries, third row of the bake-off. */
  def fertility(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val vt = vocabTok(spark, sfDir)
    Bpe.langWord(spark, sfDir).join(vt, Seq("w"))
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

  /** One DP-chain's CTEs under an inventory CTE `$inv` (expects columns
    * piece/piece_len/cnt/lg_fp): `${p}lgc`, `${p}matches` (with the piece
    * itself when `withPiece`), `${p}mj`, `${p}mla`, and — when `withDp` —
    * `${p}dp` (w, mls, dp array). */
  private def dpCtes(p: String, inv: String, withPiece: Boolean): String = {
    val lgcExpr = lgFpSql("c", spark = false)
    s""", ${p}lgc AS (
         SELECT CAST($lgcExpr AS BIGINT) AS lgc
         FROM (SELECT SUM(cnt) AS c FROM $inv)),
       ${p}matches AS MATERIALIZED (
         SELECT s.w, s.j, p.piece_len AS l,${if (withPiece) " p.piece," else ""}
                (p.lg_fp - (SELECT lgc FROM ${p}lgc)) * $kPack - 1 AS wgt
         FROM (SELECT w, unnest(range(1, length(w) + 1)) AS j FROM bpe_w) s
         JOIN $inv p
           ON p.piece_len <= s.j
          AND substring(s.w, CAST(s.j - p.piece_len + 1 AS INT),
                        CAST(p.piece_len AS INT)) = p.piece),
       ${p}mj AS (
         SELECT w, j, list_sort(list([CAST(l AS BIGINT), wgt])) AS ms
         FROM ${p}matches GROUP BY 1, 2),
       ${p}mla AS MATERIALIZED (
         SELECT w, list(ms ORDER BY j) AS mls FROM ${p}mj GROUP BY 1)"""
  }

  /** Inventory + EM round + Viterbi chain over the shared bpe_w corpus
    * prelude: seed chain (`ug0_*`), E-step backtrack (`ug0_bt`/`ug0_picks`
    * — ascending boundary list, smallest-l-first among score maximizers,
    * the Spark twin's exact rule), M-step usage counts, the
    * likelihood-loss prune, the FINAL inventory `ug_inv`, and the final
    * Viterbi `ug_vt` (w, n_toks). */
  private val ugCtes: String = {
    val lg = lgFpSql("cnt", spark = false)
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
       ug0_inv AS MATERIALIZED (
         SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len, cnt,
                CAST($lg AS BIGINT) AS lg_fp
         FROM (SELECT piece, cnt FROM ug_sub UNION ALL SELECT piece, cnt FROM ug_char))""" +
      dpCtes("ug0_", "ug0_inv", withPiece = true) +
      s""", ug0_dp AS MATERIALIZED (
         SELECT w, mls, list_reduce(
                  list_prepend([CAST(0 AS BIGINT)],
                    list_transform(range(1, len(mls) + 1), i -> [i])),
                  (acc, x) -> acc || [list_max(list_transform(mls[x[1]],
                    m -> acc[x[1] - m[1] + 1] + m[2]))]) AS dp
         FROM ug0_mla),
       ug0_bt AS MATERIALIZED (
         SELECT w, list_reduce(
                  list_prepend([CAST(len(mls) AS BIGINT)],
                    list_transform(range(1, len(mls) + 1), i -> [CAST(0 AS BIGINT)])),
                  (acc, x) -> CASE WHEN acc[1] <= 0 THEN acc
                    ELSE list_prepend(acc[1] - list_filter(mls[acc[1]],
                           m -> dp[acc[1] - m[1] + 1] + m[2] = dp[acc[1] + 1])[1][1],
                         acc) END) AS b
         FROM ug0_dp),
       ug0_picks AS MATERIALIZED (
         SELECT w, b[CAST(t.k + 1 AS INT)] AS j,
                b[CAST(t.k + 1 AS INT)] - b[CAST(t.k AS INT)] AS l
         FROM ug0_bt, UNNEST(range(1, len(b))) AS t(k)),
       ug0_use AS MATERIALIZED (
         SELECT m.piece, SUM(v.freq) AS uses
         FROM ug0_picks p
         JOIN ug0_matches m ON m.w = p.w AND m.j = p.j AND m.l = p.l
         JOIN bpe_w v ON v.w = p.w
         GROUP BY 1),
       ug_em AS MATERIALIZED (
         SELECT piece, piece_len, cnt, uses, CAST($lg AS BIGINT) AS lg_fp
         FROM (SELECT s.piece, s.piece_len,
                      COALESCE(u.uses, 0) + 1 AS cnt,
                      COALESCE(u.uses, 0) AS uses
               FROM ug0_inv s LEFT JOIN ug0_use u ON s.piece = u.piece)),
       ug_lgc1 AS (
         SELECT CAST(${lgFpSql("c", spark = false)} AS BIGINT) AS lgc
         FROM (SELECT SUM(cnt) AS c FROM ug_em)),
       ug_w1 AS MATERIALIZED (
         SELECT e.*, (e.lg_fp - (SELECT lgc FROM ug_lgc1)) * $kPack - 1 AS wgt
         FROM ug_em e),
       ug_cs AS (
         SELECT x.piece, SUM(c.wgt) AS char_wgt
         FROM (SELECT piece, substring(piece, CAST(t.i AS INT), 1) AS ch
               FROM ug_w1, UNNEST(range(1, length(piece) + 1)) AS t(i)
               WHERE piece_len >= 2) x
         JOIN ug_w1 c ON c.piece = x.ch AND c.piece_len = 1
         GROUP BY 1),
       ug_inv AS MATERIALIZED (
         SELECT piece, piece_len, cnt, lg_fp FROM (
           SELECT w.piece, w.piece_len, w.cnt, w.lg_fp,
                  ROW_NUMBER() OVER (
                    ORDER BY w.uses * (w.wgt - cs.char_wgt), w.cnt, w.piece) AS prn
           FROM ug_w1 w JOIN ug_cs cs ON cs.piece = w.piece)
         WHERE prn > $prunePieces
         UNION ALL
         SELECT piece, piece_len, cnt, lg_fp FROM ug_w1 WHERE piece_len = 1)""" +
      dpCtes("ug_", "ug_inv", withPiece = false) +
      s""", ug_vt AS MATERIALIZED (
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
