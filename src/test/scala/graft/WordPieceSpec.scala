package graft

import org.apache.spark.sql.functions._

import graft.queries.{Bpe, WordPiece}

/** The WordPiece trainer + greedy longest-match inference. The oracle
  * hash-match proves Spark and DuckDB agree on the unrolled loop; this spec
  * proves the loop implements WordPiece: the merge sequence equals an
  * independent driver-side likelihood-ratio trainer, the selection criterion
  * demonstrably DIVERGES from BPE's raw-count argmax on the fixture, and the
  * relational greedy matcher equals a driver-side longest-match walk with
  * the totality invariant (every word fully consumed) pinned.
  */
class WordPieceSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf
  private val scale = BigInt("1000000000000")

  /** Driver-side reference trainer: likelihood-ratio argmax in the same
    * fixed point (floor(pair·10¹² / (cnt_a·cnt_b))), ties by (a, b),
    * greedy left-to-right merge application. */
  private def bruteTrain(words: Seq[String], k: Int)
      : Vector[(String, String, Long, Long)] = {
    val vocab = scala.collection.mutable.Map[Vector[String], Long]()
    words.foreach { w =>
      val key = w.toCharArray.map(_.toString).toVector
      vocab(key) = vocab.getOrElse(key, 0L) + 1
    }
    var state = vocab.toMap
    var out = Vector.empty[(String, String, Long, Long)]
    for (_ <- 1 to k) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      val toks = scala.collection.mutable.Map[String, Long]()
      state.foreach { case (ts, freq) =>
        ts.foreach(t => toks(t) = toks.getOrElse(t, 0L) + freq)
        ts.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + freq
          case _ =>
        }
      }
      if (pairs.nonEmpty) {
        val scored = pairs.map { case ((a, b), c) =>
          ((a, b), c, (BigInt(c) * scale / (BigInt(toks(a)) * BigInt(toks(b)))).toLong)
        }
        val ((a, b), n, s) = scored.minBy { case ((x, y), _, sc) => (-sc, x, y) }
        out = out :+ ((a, b, n, s))
        state = state.groupMapReduce { case (ts, _) =>
          ts.foldLeft(Vector.empty[String]) { (acc, t) =>
            if (acc.nonEmpty && acc.last == a && t == b) acc.init :+ (a + b)
            else acc :+ t
          }
        } { case (_, freq) => freq } (_ + _)
      }
    }
    out
  }

  /** Driver-side greedy longest-match token count over a piece set (single
    * characters always match as the fallback). */
  private def bruteGreedy(w: String, pieces: Set[String]): Int = {
    val maxLen = if (pieces.isEmpty) 1 else pieces.map(_.length).max
    var pos = 0
    var n = 0
    while (pos < w.length) {
      val l = (math.min(maxLen, w.length - pos) to 1 by -1)
        .find(len => len == 1 || pieces.contains(w.substring(pos, pos + len))).get
      pos += l
      n += 1
    }
    n
  }

  private def corpusWords(dir: String): Seq[String] = {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, dir)
    s.table("documents").select($"text").as[String].collect().toSeq
      .flatMap(_.split(" ").filter(_.nonEmpty))
  }

  test("merge sequence equals an independent driver-side ratio trainer") {
    val s = spark
    import s.implicits._
    val got = WordPiece.trainMerges(s, sfDir)
      .orderBy($"merge_rank")
      .select($"pair_left", $"pair_right", $"pair_count", $"score_fp")
      .as[(String, String, Long, Long)].collect().toVector
    val want = bruteTrain(corpusWords(sfDir), 12)
    assert(got == want, s"\nspark: $got\nbrute: $want")
  }

  test("the ratio criterion diverges from BPE's count criterion on the fixture") {
    val s = spark
    import s.implicits._
    val wp1 = WordPiece.trainMerges(s, sfDir).filter($"merge_rank" === 1L)
      .select($"pair_left", $"pair_right", $"pair_count")
      .as[(String, String, Long)].head()
    val bpe1 = Bpe.trainMerges(s, sfDir).filter($"merge_rank" === 1L)
      .select($"pair_left", $"pair_right", $"pair_count")
      .as[(String, String, Long)].head()
    assert((wp1._1, wp1._2) != (bpe1._1, bpe1._2),
      s"fixture must separate the criteria: both picked $wp1")
    assert(wp1._3 < bpe1._3,
      "the ratio winner must be rarer than the count winner — " +
        s"wp $wp1 vs bpe $bpe1")
  }

  test("greedy matcher: total (every word fully consumed) and equal to a driver walk") {
    val s = spark
    import s.implicits._
    val pieces = WordPiece.trainMerges(s, sfDir)
      .select($"piece").as[String].collect().toSet
    val vt = WordPiece.vocabTok(s, sfDir)
      .select($"w", $"n_toks", $"consumed")
      .as[(String, Long, Long)].collect()
    assert(vt.nonEmpty)
    vt.foreach { case (w, n, consumed) =>
      assert(consumed == w.length.toLong,
        s"greedy walk must consume '$w' exactly: $consumed of ${w.length}")
      assert(n >= 1L && n <= w.length.toLong, s"token count out of range for '$w': $n")
      assert(n == bruteGreedy(w, pieces).toLong,
        s"greedy count mismatch for '$w' with pieces $pieces")
    }
  }

  test("longest match wins over eager shorter pieces (nested-piece corpus)") {
    // vocabulary where a long piece contains a shorter learned piece: the
    // matcher must take the longest match, not the first learned one
    val s = spark
    import s.implicits._
    val dir = SparkSpec.fixtureDirExcept("documents")
    // 'abc' repeated: trains ab, abc (ratio picks deterministically);
    // greedy over {ab, abc} at 'abc' must emit ONE token, not ab+c
    Seq((1L, "abc abc abc abc", "en", "srcA", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val pieces = WordPiece.trainMerges(s, dir.toString)
      .select($"piece").as[String].collect().toSet
    assert(pieces.contains("abc"), s"full word must be learned: $pieces")
    val vt = WordPiece.vocabTok(s, dir.toString)
      .select($"w", $"n_toks").as[(String, Long)].collect().toMap
    assert(vt("abc") == 1L, s"longest match must consume the whole word: $vt")
    graft.util.Memo.release(s, dir.toString)
  }

  test("randomized corpora: trainer equals the driver replay on seeded word soups") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(7, 23, 61)) {
      val rnd = new scala.util.Random(seed)
      val words = Vector.fill(30 + rnd.nextInt(20)) {
        (0 to rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val docs = words.grouped(8).map(_.mkString(" ")).toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "srcA", t.length.toLong) }
      val dir = SparkSpec.fixtureDirExcept("documents")
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
      val got = WordPiece.trainMerges(s, dir.toString)
        .orderBy($"merge_rank")
        .select($"pair_left", $"pair_right", $"pair_count", $"score_fp")
        .as[(String, String, Long, Long)].collect().toVector
      val want = bruteTrain(words, 12)
      assert(got === want, s"seed $seed:\nspark: $got\nbrute: $want")

      // and inference stays total + driver-equal on the random vocab
      val pieces = got.map { case (a, b, _, _) => a + b }.toSet
      val vt = WordPiece.vocabTok(s, dir.toString)
        .select($"w", $"n_toks", $"consumed").as[(String, Long, Long)].collect()
      vt.foreach { case (w, n, consumed) =>
        assert(consumed == w.length.toLong, s"seed $seed: '$w' not consumed")
        assert(n == bruteGreedy(w, pieces).toLong, s"seed $seed: '$w' count")
      }
      graft.util.Memo.release(s, dir.toString)
    }
  }

  test("compare table: all langs present, every tokenizer at >= 1 token/word") {
    val s = spark
    import s.implicits._
    val rows = graft.queries.Unigram.compare(s, sfDir)
      .select($"lang", $"bpe_fertility_bp", $"wordpiece_fertility_bp",
        $"unigram_fertility_bp")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 5, s"one row per fixture lang: ${rows.toSeq}")
    rows.foreach { case (lang, b, w, u) =>
      assert(b >= 10000L && w >= 10000L && u >= 10000L,
        s"$lang fertility below 1 token/word: ($b, $w, $u)")
    }
  }
}
