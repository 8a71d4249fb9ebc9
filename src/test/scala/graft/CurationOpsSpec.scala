package graft

import org.apache.spark.sql.functions._

import graft.queries.{Classifier, Dedup, Sampling, Sessions, TextOps}

/** Behavioral contracts for the round-10 curation operators (the DuckDB
  * oracle pins the arithmetic; these pin the SEMANTICS the arithmetic is
  * supposed to deliver):
  *
  *   - DSIR weights must actually DISCRIMINATE toward the target
  *     distribution — the property the estimator exists for, which a
  *     value-level oracle (running the same formula) cannot assert.
  *   - DSIR resampling must keep the hash-threshold subset at the half-
  *     corpus budget.
  *   - The df/idf index must agree with a brute-force distinct-doc count
  *     and be monotone in df.
  *   - Bot flags must equal the cross-multiplied comparison against the
  *     corpus means recomputed from the output itself, with both flag
  *     branches exercised by the fixture.
  */
class CurationOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("dsir weights discriminate toward the target sources") {
    val w = TextOps.dsirWeight(spark, sfDir)
    val byTgt = w
      .join(spark.table("documents").select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("is_tgt", col("source").isin("src1", "src2"))
      .groupBy(col("is_tgt")).agg(avg(col("weight_bp")).as("aw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byTgt(true) > byTgt(false),
      s"target-source docs must average higher importance: $byTgt")
    // weights are likelihood RATIOS in basis points: a doc scoring at the
    // raw distribution sits near 10000 only when the target equals the
    // corpus; with a thin target, smoothing pulls scores below that. All
    // weights must be strictly positive (add-one smoothing guarantees it).
    val mn = w.agg(min(col("weight_bp"))).first().getLong(0)
    assert(mn > 0, s"smoothed likelihood ratios are strictly positive, got $mn")
  }

  test("dsir weight frame has one row per ≥2-word doc, n_grams = words-1") {
    val w = TextOps.dsirWeight(spark, sfDir)
    val docs = spark.table("documents")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("expect"))
      .filter(col("expect") >= 1)
    assert(w.count() === docs.count())
    val bad = w.join(docs, Seq("doc_id")).filter(col("n_grams") =!= col("expect")).count()
    assert(bad === 0, "every bigram occurrence must be counted exactly once")
  }

  test("dsir resampling keeps the deterministic subset at the half-corpus budget") {
    val kept = Sampling.dsirSample(spark, sfDir)
    assert(kept.filter(col("bucket") >= col("rate_bp")).count() === 0,
      "every kept row must satisfy its own hash threshold")
    // rate_bp must be the broadcast-mean normalization of the weight frame
    val w = TextOps.dsirWeight(spark, sfDir)
    val avgBp = w.agg(expr("sum(weight_bp) DIV count(1)")).first().getLong(0)
    val badRate = kept
      .withColumn("expect", least(lit(10000L), expr(s"(weight_bp * 5000) DIV $avgBp")))
      .filter(col("rate_bp") =!= col("expect")).count()
    assert(badRate === 0)
    // expected kept volume is total/2; the Knuth hash is uniform enough that
    // ±40% of the budget covers every fixture sf (observed: 48-50%)
    val total = spark.table("documents").count()
    val n = kept.count()
    assert(n > total * 3 / 10 && n < total * 7 / 10,
      s"kept $n of $total — resampling budget is half the corpus")
  }

  test("df index matches brute-force document frequency and idf is monotone") {
    val idx = TextOps.dfIndex(spark, sfDir)
    val brute = spark.table("documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("bdf"))
    assert(idx.join(brute, Seq("term")).filter(col("df") =!= col("bdf")).count() === 0)
    assert(idx.count() === brute.count())
    val rows = idx.select(col("df"), col("idf_bp")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((d1, i1), (d2, i2)) =>
        assert(d1 != d2 || i1 == i2)
        if (d1 < d2) assert(i1 >= i2, s"idf must not increase with df: ($d1,$i1) -> ($d2,$i2)")
      case _ => ()
    }
  }

  test("nb classifier: model is feature-hash bounded and discriminates the label") {
    val model = Classifier.nbTrain(spark, sfDir)
    // the feature-hashing contract: the model can NEVER outgrow the bucket
    // count, whatever the corpus vocabulary does under Heaps' law
    assert(model.count() <= 4096)
    assert(model.filter(col("pos_n") < 0 || col("neg_n") < 0).count() === 0)
    val scores = Classifier.nbScore(spark, sfDir)
    val byLabel = scores
      .join(spark.table("documents").select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("is_pos", col("source").isin("src1", "src2"))
      .groupBy(col("is_pos")).agg(avg(col("margin_bp")).as("am"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLabel(true) > byLabel(false),
      s"positive-source docs must average a higher margin: $byLabel")
    // every document scores (the model was trained on this corpus, so no
    // token can miss the model join)
    assert(scores.count() === spark.table("documents").count())
  }

  test("nb classifier: keep gate agrees with the margin sign") {
    // keep is sum>0, margin_bp is the truncated mean — a small positive sum
    // can truncate to mean 0, so assert the two implications rather than
    // strict equality
    val rows = Classifier.nbScore(spark, sfDir).collect()
    rows.foreach { r =>
      val m = r.getAs[Long]("margin_bp")
      if (m > 0) assert(r.getAs[Boolean]("keep"), s"mean>0 implies sum>0: $r")
      if (m < 0) assert(!r.getAs[Boolean]("keep"), s"mean<0 implies sum<=0: $r")
    }
    assert(rows.exists(_.getAs[Boolean]("keep")) &&
      rows.exists(!_.getAs[Boolean]("keep")), "gate must split the fixture")
  }

  test("doremi weights: normalized mixture, hardness inverse to mean fluency") {
    val w = Sampling.doremiWeights(spark, sfDir).collect()
    val langs = spark.table("documents").select(col("lang")).distinct().count()
    assert(w.length === langs, "one mixture row per domain")
    // truncating integer normalization loses at most 1 bp per domain
    val total = w.map(_.getAs[Long]("weight_bp")).sum
    assert(total > 10000 - w.length && total <= 10000,
      s"mixture must normalize to ~10^4 bp, got $total")
    // hardness must order INVERSELY to per-domain mean fluency
    val fl = TextOps.lmFluency(spark, sfDir)
      .join(spark.table("documents").select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang")).agg(expr("sum(fluency) DIV count(1)").as("mf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    w.sortBy(_.getAs[Long]("hardness_bp")).toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(fl(a.getString(0)) >= fl(b.getString(0)),
          s"higher hardness must mean lower fluency: ${a.getString(0)} vs ${b.getString(0)}")
      case _ => ()
    }
    // the reweighting direction: vs its share, a domain moves UP iff its
    // hardness is above the mixture-weighted average (here: any domain
    // harder than 10^4 with near-uniform hardness gains weight)
    w.foreach { r =>
      val up = r.getAs[Long]("weight_bp") > r.getAs[Long]("share_bp")
      val hard = r.getAs[Long]("hardness_bp") > 10000L
      if (r.getAs[Long]("hardness_bp") != 10000L)
        assert(up === hard || math.abs(r.getAs[Long]("weight_bp") - r.getAs[Long]("share_bp")) <= 10,
          s"direction of reweighting must track hardness: $r")
    }
  }

  test("ccnet terciles are balanced within one doc and ordered by fluency") {
    val out = TextOps.ccnetBuckets(spark, sfDir).collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_.getAs[Long]("tercile")).view.mapValues(_.length)
      assert(sizes.keys.toSet === Set(0L, 1L, 2L), s"$lang must fill all terciles")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang tercile sizes must differ by at most one: $sizes")
      // bucket boundaries respect the score: every head doc outscores (or
      // ties) every middle doc, every middle outscores every tail doc
      def fl(t: Long) = rows.filter(_.getAs[Long]("tercile") == t)
        .map(_.getAs[Long]("fluency"))
      assert(fl(0).min >= fl(1).max, s"$lang head/middle boundary")
      assert(fl(1).min >= fl(2).max, s"$lang middle/tail boundary")
    }
  }

  test("gopher rules reconstruct from raw counts and the gate discriminates") {
    val out = TextOps.gopherRules(spark, sfDir).collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n_words")
      assert(r.getAs[Boolean]("rule_word_count") === (n >= 50L && n <= 100000L))
      assert(r.getAs[Boolean]("rule_stopwords") === (r.getAs[Long]("n_stop") >= 2L))
      assert(r.getAs[Boolean]("rule_dup_mass") === (r.getAs[Long]("n_uniq") * 2 >= n))
      assert(r.getAs[Boolean]("keep") ===
        (r.getAs[Boolean]("rule_word_count") && r.getAs[Boolean]("rule_mean_word_len") &&
          r.getAs[Boolean]("rule_stopwords") && r.getAs[Boolean]("rule_dup_mass")))
    }
    // the three corpus-discriminating rules each fire both ways (mean word
    // length is structurally in [3,10] on the synthetic vocabulary — kept
    // because it is the paper's rule, vacuously true here)
    for (rule <- Seq("rule_word_count", "rule_stopwords", "rule_dup_mass", "keep"))
      assert(out.exists(_.getAs[Boolean](rule)) && out.exists(!_.getAs[Boolean](rule)),
        s"$rule must split the fixture")
  }

  test("bpe pair counts: vocab-weighted counting equals the corpus-level count") {
    val out = TextOps.bpeTopPairs(spark, sfDir).collect()
    assert(out.length === 32)
    // brute force: count adjacent char pairs over EVERY token occurrence
    val brute = scala.collection.mutable.Map.empty[String, Long]
    spark.table("documents").select(col("text")).collect().foreach { r =>
      r.getString(0).split(" ").foreach { w =>
        var i = 0
        while (i + 1 < w.length) {
          val p = w.substring(i, i + 2)
          brute(p) = brute.getOrElse(p, 0L) + 1
          i += 1
        }
      }
    }
    out.foreach { r =>
      assert(r.getAs[Long]("pair_count") === brute(r.getAs[String]("pair")),
        s"vocab-weighted count must equal the corpus count for ${r.getAs[String]("pair")}")
    }
    // the output is the TRUE top-32 under (count desc, pair asc)
    val expected = brute.toSeq.sortBy { case (p, c) => (-c, p) }.take(32).map(_._1)
    assert(out.sortBy(_.getAs[Int]("merge_rank")).map(_.getAs[String]("pair")).toSeq
      === expected)
  }

  test("substring runs are witnessed by the true longest common token span") {
    val out = Dedup.substringRuns(spark, sfDir).collect()
    assert(out.nonEmpty, "the fixture's near-dup docs must surface run pairs")
    val words = spark.table("documents").select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    // O(n·m) longest common token SUBSTRING — brute-force ground truth
    def lcs(a: Array[String], b: Array[String]): Int = {
      var best = 0
      var prev = new Array[Int](b.length + 1)
      var cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        for (j <- 1 to b.length) {
          cur(j) = if (a(i - 1) == b(j - 1)) prev(j - 1) + 1 else 0
          if (cur(j) > best) best = cur(j)
        }
        val t = prev; prev = cur; cur = t
        java.util.Arrays.fill(cur, 0)
      }
      best
    }
    var exact = 0
    out.foreach { r =>
      val truth = lcs(words(r.getAs[Long]("doc_a")), words(r.getAs[Long]("doc_b")))
      val span = r.getAs[Long]("max_span_tokens")
      // the boilerplate cap can only BREAK runs (shorten), never extend —
      // so the reported span is a lower bound on the true shared span
      assert(span <= truth,
        s"reported span $span must not exceed the true LCS $truth: $r")
      if (span == truth) exact += 1
    }
    assert(exact > 0, "at least one pair must witness its true span exactly")
  }

  test("hist quantiles bracket the exact percentile for every (type, q)") {
    val out = Sessions.histQuantiles(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byType = spark.table("raw").filter(col("cents") >= 1)
      .select(col("event_type"), col("cents")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    out.foreach { r =>
      val vs = byType(r.getAs[String]("event_type"))
      val q = r.getAs[Long]("q")
      // the exact quantile under the SAME rule at value granularity:
      // smallest value whose rank satisfies rank·100 ≥ q·n
      val exact = vs(((q * vs.length + 99) / 100 - 1).toInt)
      assert(exact >= r.getAs[Long]("lo_cents") && exact <= r.getAs[Long]("hi_cents"),
        s"exact p$q=$exact outside [${r.getAs[Long]("lo_cents")}, ${r.getAs[Long]("hi_cents")}]: $r")
      assert(r.getAs[Long]("total") === vs.length.toLong)
    }
  }

  test("bot flags equal cross-multiplied comparison against recomputed corpus means") {
    // sf0.01: the burst branch needs enough users for the 10-minute-bucket
    // maximum to spread (both flag kinds fire there; sf0.001 only volume)
    val out = Sessions.botFlags(spark, "/root/testdata/sf0.01").collect()
    val avgN = out.map(_.getAs[Long]("n_events")).sum / out.length
    val avgB = out.map(_.getAs[Long]("max_burst")).sum / out.length
    out.foreach { r =>
      assert(r.getAs[Boolean]("flag_volume") === (r.getAs[Long]("n_events") * 5 > avgN * 6))
      assert(r.getAs[Boolean]("flag_burst") === (r.getAs[Long]("max_burst") * 2 > avgB * 3))
      assert(r.getAs[Boolean]("is_bot") ===
        (r.getAs[Boolean]("flag_volume") || r.getAs[Boolean]("flag_burst")))
    }
    assert(out.exists(_.getAs[Boolean]("flag_volume")), "volume branch must fire")
    assert(out.exists(_.getAs[Boolean]("flag_burst")), "burst branch must fire")
    assert(out.exists(r => !r.getAs[Boolean]("is_bot")), "most users must stay clean")
  }

  test("zipf spectrum partitions the vocabulary and brackets every term count") {
    val out = TextOps.zipfSpectrum(spark, sfDir).collect()
    val counts = spark.table("documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).count()
      .collect().map(_.getAs[Long]("count"))
    // bins PARTITION the vocabulary: term and occurrence totals are exact
    assert(out.map(_.getAs[Long]("n_terms")).sum === counts.length.toLong)
    assert(out.map(_.getAs[Long]("n_occ")).sum === counts.sum)
    // each bin's population is exactly the terms whose count it brackets
    out.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("lo_freq"), r.getAs[Long]("hi_freq"))
      assert(lo === (1L << r.getAs[Long]("fbin").toInt) && hi === lo * 2 - 1)
      assert(counts.count(c => c >= lo && c <= hi).toLong === r.getAs[Long]("n_terms"), r)
    }
  }

  test("unimax water level is the maximal uniform cap within the half-corpus budget") {
    val s = spark
    import s.implicits._
    val rates = Sampling.unimaxSample(s, sfDir)
      .select($"lang", $"rate_bp").distinct().as[(String, Long)].collect().toMap
    // unlabeled docs are outside the allocation, mirroring the operator
    val counts = s.table("documents").filter($"lang".isNotNull).groupBy($"lang")
      .agg(count(lit(1))).as[(String, Long)].collect().toMap
    val total = counts.values.sum
    val b = total / 2

    // independent driver-side water-fill sweep: languages processed before
    // the first overflow are taken whole; the overflow rank's share is the
    // cap for everyone else
    val sorted = counts.toSeq.sortBy { case (l, n) => (n, l) }
    val L = sorted.length
    var cum = 0L
    var cap = -1L
    val full = scala.collection.mutable.Set.empty[String]
    sorted.zipWithIndex.foreach { case ((l, n), i) =>
      if (cap < 0) {
        val share = (b - cum) / (L - i)
        if (n > share) cap = share else { full += l; cum += n }
      }
    }
    assert(cap >= 0, "a half-corpus budget must cap at least one language")
    val quota = counts.map { case (l, n) =>
      l -> (if (full(l)) n else math.min(n, cap)) }

    // operator rates equal the replayed quotas
    counts.keys.foreach { l =>
      val want = if (full(l)) 10000L else quota(l) * 10000L / counts(l)
      assert(rates.get(l).contains(want), s"$l: ${rates.get(l)} vs $want")
    }
    // feasible and maximal: the quota fits the budget, a one-higher cap
    // would not
    assert(quota.values.sum <= b)
    val bumped = counts.map { case (l, n) =>
      if (full(l)) n else math.min(n, cap + 1) }.sum
    assert(bumped > b, s"cap $cap must be maximal (bumped $bumped <= budget $b)")
  }

  test("dedup threshold curve is monotone and consistent with the estimate frame") {
    val s = spark
    import s.implicits._
    val rows = Dedup.thresholdCurve(s, sfDir)
      .orderBy($"tau_matches")
      .select($"tau_matches", $"tau_bp", $"n_pairs", $"docs_removed", $"removal_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(8L, 10L, 12L, 14L, 16L))
    rows.foreach { case (m, bp, _, _, _) => assert(bp === m * 625L) }
    // tightening the threshold can only shrink pairs and removals
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi._3 <= lo._3, s"pairs must be non-increasing: $lo -> $hi")
        assert(hi._4 <= lo._4, s"removals must be non-increasing: $lo -> $hi")
      case _ =>
    }
    // each row recomputes from the estimate frame under the canonical-min rule
    val cand = Dedup.minhashEstimate(s, sfDir)
      .select($"doc_b", $"matches").as[(Long, Long)].collect()
    val nDocs = s.table("documents").count()
    rows.foreach { case (m, _, nPairs, removed, remBp) =>
      val q = cand.filter(_._2 >= m)
      assert(nPairs === q.length.toLong, s"tau $m pairs")
      assert(removed === q.map(_._1).distinct.length.toLong, s"tau $m removals")
      assert(remBp === removed * 10000L / nDocs)
    }
  }

  test("basket rules recompute from a driver-side apriori over raw purchases") {
    val s = spark
    import s.implicits._
    val got = Sessions.basketRules(s, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap

    val ui = s.table("events").filter($"event_type" === "purchase")
      .select($"user_id", get_json_object($"props", "$.k").cast("long").as("item"))
      .filter($"item".isNotNull).distinct().as[(Long, Long)].collect()
    val nRaw = ui.map(_._1).distinct.length
    val freq = ui.groupBy(_._2)
      .filter { case (_, rows) => rows.length * 200 >= nRaw }.keySet
    val baskets = ui.filter(p => freq(p._2)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
      .filter { case (_, its) => its.size >= 2 && its.size <= 64 }
    val n = baskets.size.toLong
    val supp = baskets.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.values.foreach { its =>
      val v = its.toVector.sorted
      for (i <- v.indices; j <- i + 1 until v.size)
        pairCounts((v(i), v(j))) = pairCounts.getOrElse((v(i), v(j)), 0L) + 1
    }
    val want = pairCounts.filter(_._2 * 1000 >= n).map { case ((a, b), nab) =>
      val (na, nb) = (supp(a), supp(b))
      ((a, b), (na, nb, nab,
        nab * 10000 / na, nab * 10000 / nb, nab * n * 10000 / (na * nb)))
    }.toMap
    assert(got.nonEmpty && got === want)
  }

  test("heaps curve partitions the vocabulary and telescopes cumulatively") {
    val out = TextOps.heapsCurve(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("bucket"))
    val docs = spark.table("documents")
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).select("w").distinct().count()
    val tokens = docs
      .agg(sum(expr("size(filter(split(text, ' '), w -> length(w) > 0))")))
      .head().getLong(0)
    assert(out.map(_.getAs[Long]("docs")).sum === docs.count())
    assert(out.map(_.getAs[Long]("tokens")).sum === tokens)
    // every term's first occurrence lands in exactly one bucket
    assert(out.map(_.getAs[Long]("new_terms")).sum === vocab)
    // the cumulative column telescopes over the per-bucket news
    var running = 0L
    out.foreach { r =>
      running += r.getAs[Long]("new_terms")
      assert(r.getAs[Long]("cum_vocab") === running, r)
    }
    assert(out.last.getAs[Long]("cum_vocab") === vocab)
  }

  test("ngram diversity equals brute-force distinct/total per source") {
    val out = TextOps.ngramDiversity(spark, sfDir).collect()
    val docs = spark.table("documents")
      .select(col("source"), split(col("text"), " ").as("w"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .filter(_._2.length >= 2)
    val bySrc = docs.groupBy(_._1).map { case (s, ds) =>
      val grams = ds.flatMap(d => d._2.sliding(2).map(_.mkString(" ")))
      s -> ((grams.distinct.length.toLong, grams.length.toLong))
    }
    assert(out.length === bySrc.size)
    out.foreach { r =>
      val (d, t) = bySrc(r.getAs[String]("source"))
      assert(r.getAs[Long]("distinct_bigrams") === d, r)
      assert(r.getAs[Long]("total_bigrams") === t, r)
      assert(r.getAs[Long]("diversity_bp") === d * 10000L / t, r)
      assert(r.getAs[Long]("diversity_bp") > 0L && r.getAs[Long]("diversity_bp") <= 10000L)
    }
  }

  test("contamination overlap agrees with the membership scan and covers clean docs") {
    val overlap = TextOps.contaminationOverlap(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val hits = TextOps.contamination(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_probes")).toMap
    // one row per ≥3-word doc — the clean zeros are part of the output
    val eligible = spark.table("documents")
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(overlap.size.toLong === eligible)
    // distinct-probe counts agree exactly with the membership scan
    overlap.foreach { case (id, r) =>
      assert(r.getAs[Long]("n_hit") === hits.getOrElse(id, 0L), s"doc $id")
      assert(r.getAs[Long]("overlap_bp") ===
        r.getAs[Long]("n_hit") * 10000L / r.getAs[Long]("n_grams"))
      assert(r.getAs[Boolean]("flagged") === (r.getAs[Long]("overlap_bp") >= 1000L))
    }
    assert(overlap.values.exists(_.getAs[Long]("n_hit") > 0), "fixture has hits")
    assert(overlap.values.exists(_.getAs[Long]("n_hit") === 0L), "and clean docs")
  }

  test("data card partitions the corpus and its shares telescope to the whole") {
    val out = TextOps.dataCard(spark, sfDir).collect()
    val docs = spark.table("documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs)
    out.foreach { r =>
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_docs"), r)
      assert(r.getAs[Long]("n_unique") >= 1L, r)
      assert(r.getAs[Long]("stop_bp") >= 0L && r.getAs[Long]("stop_bp") <= 10000L, r)
    }
    // truncating division: shares sum to 10000 minus at most one bp per cell
    val shares = out.map(_.getAs[Long]("share_bp")).sum
    assert(shares <= 10000L && shares > 10000L - out.length, s"share sum $shares")
  }

  test("source overlap matrix partitions the candidate pairs exactly") {
    val pairs = Dedup.minhashEstimate(spark, sfDir).collect()
    val out = Dedup.sourceOverlap(spark, sfDir).collect()
    // every candidate pair lands in exactly one (source_a, source_b) cell
    assert(out.map(_.getAs[Long]("n_pairs")).sum === pairs.length.toLong)
    assert(out.map(_.getAs[Long]("n_strong")).sum ===
      pairs.count(_.getAs[Long]("matches") * 2 >= 16).toLong)
    out.foreach { r =>
      assert(r.getAs[String]("source_a") <= r.getAs[String]("source_b"),
        "cells are canonicalized by source order")
      assert(r.getAs[Boolean]("cross_source") ===
        (r.getAs[String]("source_a") != r.getAs[String]("source_b")))
      assert(r.getAs[Long]("n_strong") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("dup-gram signals recompute from per-doc brute force") {
    val out = TextOps.dupGramSignals(spark, sfDir).collect()
    val docs = spark.table("documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === docs.count(_._2.split(" ", -1).length >= 2))
    out.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val grams = text.split(" ", -1).sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.length.toLong).toMap
      // the elected top gram is the true argmax under (count, gram) order
      val (topGram, topN) = counts.maxBy { case (g, c) => (c, g) }
      assert(r.getAs[String]("top_gram") === topGram, r)
      assert(r.getAs[Long]("top_gram_n") === topN, r)
      assert(r.getAs[Long]("n_grams") === grams.length.toLong, r)
      val dupChars = counts.collect { case (g, c) if c >= 2 => c * g.length.toLong }.sum
      assert(r.getAs[Long]("dup_mass_bp") === dupChars * 10000L / text.length, r)
      assert(r.getAs[Long]("top_mass_bp") ===
        topN * topGram.length.toLong * 10000L / text.length, r)
      // a unique top gram contributes nothing to the duplicate mass
      if (topN < 2) assert(r.getAs[Long]("dup_mass_bp") === 0L ||
        counts.exists { case (_, c) => c >= 2 })
    }
  }

  test("domain lift recomputes from raw counts and is sorted by lift") {
    val out = TextOps.domainLift(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 200)
    val words = spark.table("documents")
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = words.length.toLong
    val bySrcWord = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byWord = words.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bySrc = words.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      val (s, w) = (r.getAs[String]("source"), r.getAs[String]("word"))
      val a = bySrcWord((s, w))
      assert(a >= 5L && r.getAs[Long]("n_in_domain") === a, r)
      assert(r.getAs[Long]("n_corpus") === byWord(w), r)
      val expect = (a * n).toDouble / (bySrc(s) * byWord(w)).toDouble
      assert(r.getAs[Double]("lift_ratio") === expect, r)
    }
    // presentation contract: descending by lift (total order breaks ties)
    val lifts = out.map(_.getAs[Double]("lift_ratio"))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
    // the report must actually discriminate: some term is over-represented
    assert(lifts.head > 1.0, "top lift must exceed the independence baseline")
  }
}
