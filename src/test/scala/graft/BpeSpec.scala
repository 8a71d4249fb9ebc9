package graft

import org.apache.spark.sql.functions._

import graft.queries.{Bpe, TextOps}

/** The sequential BPE trainer. The oracle hash-match proves both engines
  * agree on the unrolled loop; this spec proves the loop implements BPE:
  * the merge sequence equals an independent driver-side trainer, merge #1
  * equals the rank-1 pair of the single-round `text_bpe_top_pairs`
  * operator (the two operators must tell one story), and applying the
  * merge table preserves word content while never increasing token count.
  */
class BpeSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  /** Driver-side reference trainer: greedy weighted pair counts over the
    * distinct-word vocabulary, ties by (a, b), left-to-right application. */
  private def bruteTrain(words: Seq[String], k: Int): Vector[(String, String, Long)] = {
    val vocab = scala.collection.mutable.Map[Vector[String], Long]()
    words
      .foreach { w =>
        val key = w.toCharArray.map(_.toString).toVector
        vocab(key) = vocab.getOrElse(key, 0L) + 1
      }
    var state = vocab.toMap
    var out = Vector.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      state.foreach { case (toks, freq) =>
        toks.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + freq
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        out = out :+ ((a, b, n))
        state = state.groupMapReduce { case (toks, _) =>
          toks.foldLeft(Vector.empty[String]) { (acc, t) =>
            if (acc.nonEmpty && acc.last == a && t == b)
              acc.init :+ (a + b)
            else acc :+ t
          }
        } { case (_, freq) => freq } (_ + _)
      }
    }
    out
  }

  test("merge sequence equals an independent driver-side trainer") {
    val s = spark
    import s.implicits._
    val got = Bpe.trainMerges(s, sfDir)
      .orderBy($"merge_rank")
      .select($"pair_left", $"pair_right", $"pair_count")
      .as[(String, String, Long)].collect().toVector
    graft.fixtures.Fixtures.register(s, sfDir)
    val corpusWords = s.table("documents").select($"text").as[String].collect().toSeq
      .flatMap(t => t.split(" ").filter(_.nonEmpty))
    val want = bruteTrain(corpusWords, 12)
    assert(got == want, s"\nspark: $got\nbrute: $want")
  }

  test("merge #1 equals text_bpe_top_pairs' rank-1 pair") {
    val s = spark
    import s.implicits._
    val first = Bpe.trainMerges(s, sfDir).filter($"merge_rank" === 1L)
      .select(concat($"pair_left", $"pair_right"), $"pair_count")
      .as[(String, Long)].head()
    val top1 = TextOps.bpeTopPairs(s, sfDir).filter($"merge_rank" === 1)
      .select($"pair", $"pair_count").as[(String, Long)].head()
    assert(first == top1, s"trainer round 1 $first vs top_pairs rank 1 $top1")
  }

  test("fertility invariants: content preserved, 1 <= tokens <= chars") {
    val s = spark
    import s.implicits._
    val f = Bpe.fertility(s, sfDir)
    // chars isn't in the output; re-derive the per-lang word/char totals
    val totals = s.table("documents")
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"lang")
      .agg(count(lit(1)).as("words"), sum(length($"w")).as("chars"))
    val joined = f.join(totals.withColumnRenamed("words", "w2"), Seq("lang"))
      .select($"lang", $"words", $"tokens", $"w2", $"chars",
        $"fertility_bp", $"chars_per_token_bp").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (words, tokens, w2, chars) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(words == w2, s"word totals must agree for ${r.getString(0)}")
      assert(tokens >= words, "every word is at least one token")
      assert(tokens <= chars, "merging never increases token count past chars")
      assert(r.getLong(5) == tokens * 10000L / words)
      assert(r.getLong(6) == chars * 10000L / tokens)
    }
  }

  test("merge exhaustion truncates the table and fertility reflects the merges that happened") {
    val s = spark
    import s.implicits._
    // a corpus whose vocabulary runs out of pairs before the 12-round
    // budget: two 2-char words = exactly 2 possible merges
    val dir = SparkSpec.fixtureDirExcept("documents")
    Seq((1L, "ab cd ab", "en", "srcA", 8L), (2L, "cd", "en", "srcA", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)

    val merges = graft.queries.Bpe.trainMerges(s, dir.toString)
      .orderBy($"merge_rank")
      .select($"pair_left", $"pair_right", $"pair_count")
      .as[(String, String, Long)].collect().toVector
    // ab occurs twice, cd twice: ties broken lexicographically — (a,b) wins
    // round 1; after both merges every word is one token and rounds 3-12
    // produce nothing
    assert(merges === Vector(("a", "b", 2L), ("c", "d", 2L)),
      s"exhaustion must truncate, got $merges")

    val fert = graft.queries.Bpe.fertility(s, dir.toString)
      .select($"lang", $"words", $"tokens").as[(String, Long, Long)].collect()
    assert(fert.toSeq === Seq(("en", 4L, 4L)),
      "after full merging every word is exactly one token")
    graft.util.Memo.release(s, dir.toString)
  }

  test("randomized corpora: trainer equals the driver replay on seeded word soups") {
    // small alphabet + short words force dense pair collisions and ties —
    // the regimes where a tie-break or fold bug would show; three seeded
    // corpora, each trained end-to-end and compared merge-for-merge
    val s = spark
    import s.implicits._
    for (seed <- Seq(11, 42, 97)) {
      val rnd = new scala.util.Random(seed)
      val words = Vector.fill(30 + rnd.nextInt(20)) {
        (0 to rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val docs = words.grouped(8).map(_.mkString(" ")).toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "srcA", t.length.toLong) }
      val dir = SparkSpec.fixtureDirExcept("documents")
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)

      val got = graft.queries.Bpe.trainMerges(s, dir.toString)
        .orderBy($"merge_rank")
        .select($"pair_left", $"pair_right", $"pair_count")
        .as[(String, String, Long)].collect().toVector
      val want = bruteTrain(words, 12)
      assert(got === want, s"seed $seed:\nspark: $got\nbrute: $want")
      graft.util.Memo.release(s, dir.toString)
    }
  }

  test("merge tokens containing quotes or backslashes survive the literal replay") {
    // real corpora learn merges like ("'", "s"); Spark SQL string literals
    // are backslash-escaped and CONCATENATE adjacent literals, so the
    // SQL-standard '' doubling silently produced a wrong (empty) literal —
    // this corpus forces both a quote and a backslash into the merge table
    val s = spark
    import s.implicits._
    val dir = SparkSpec.fixtureDirExcept("documents")
    Seq((1L, "'s 's 's a\\b a\\b", "en", "srcA", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)

    val merges = graft.queries.Bpe.trainMerges(s, dir.toString)
      .orderBy($"merge_rank")
      .select($"pair_left", $"pair_right").as[(String, String)].collect().toVector
    assert(merges.exists { case (a, b) => (a + b).contains("'") },
      s"a quote merge must be learned: $merges")
    assert(merges.exists { case (a, b) => (a + b).contains("\\") },
      s"a backslash merge must be learned: $merges")

    // fertility replays those merges as SQL literals; with broken escaping
    // the quote merge silently never applies (tokens > words) or the
    // backslash merge throws a ParseException
    val fert = graft.queries.Bpe.fertility(s, dir.toString)
      .select($"words", $"tokens").as[(Long, Long)].head()
    assert(fert === ((5L, 5L)),
      s"full merging must collapse every word to one token: $fert")
    graft.util.Memo.release(s, dir.toString)
  }

  test("applying the merge table preserves every word's concatenated content") {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, sfDir)
    val merges = Bpe.trainMerges(s, sfDir)
      .orderBy($"merge_rank")
      .select($"pair_left", $"pair_right").as[(String, String)].collect()
    val words = s.table("documents").select($"text").as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty)).distinct
    words.foreach { w =>
      val toks = merges.foldLeft(w.toCharArray.map(_.toString).toVector) {
        case (ts, (a, b)) =>
          ts.foldLeft(Vector.empty[String]) { (acc, t) =>
            if (acc.nonEmpty && acc.last == a && t == b) acc.init :+ (a + b)
            else acc :+ t
          }
      }
      assert(toks.mkString == w, s"content broken for '$w': $toks")
    }
  }

  test("vocab curve: fertility is monotone in the budget and anchored at k=12") {
    val sp = spark
    import sp.implicits._
    val curve = graft.queries.Bpe.vocabCurve(sp, SparkSpec.fixtureSf)
      .orderBy($"merges")
      .select($"merges", $"words", $"tokens", $"fertility_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(curve.map(_._1).toSeq == Seq(4L, 8L, 12L))
    assert(curve.map(_._2).distinct.length == 1, "word mass is budget-free")
    curve.zip(curve.tail).foreach { case (lo, hi) =>
      assert(hi._3 <= lo._3 && hi._4 <= lo._4,
        s"more merges cannot grow token counts: $lo vs $hi")
    }
    // the k=12 rung equals the per-lang fertility entry's global mass
    val fert = graft.queries.Bpe.fertility(sp, SparkSpec.fixtureSf)
      .select($"words", $"tokens").as[(Long, Long)].collect()
    val last = curve.last
    assert(fert.map(_._1).sum == last._2 && fert.map(_._2).sum == last._3)
  }
}
