package graft

import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.plans.{DotProduct, TextFingerprint}

/** Specs for the native codegen'd expressions (graft.plans): each is checked
  * against an independent driver-side reimplementation of its contract, AND
  * exercised through a DataFrame (whole-stage codegen path) — not just
  * interpreted eval. */
class NativeExprSpec extends SparkSpec {

  private def session = { val s = spark; DotProduct.register(s); TextFingerprint.register(s); s }

  test("graft_dot equals a strict left-to-right double fold (float arrays)") {
    val s = session
    import s.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rng.nextFloat() - 0.5f),
      Array.fill(64)(rng.nextFloat() - 0.5f)))
    val got = rows.toDF("a", "b")
      .select(expr("graft_dot(a, b)")).collect().map(_.getDouble(0))
    val want = rows.map { case (a, b) =>
      var acc = 0.0
      for (i <- 0 until 64) acc += a(i).toDouble * b(i).toDouble
      acc
    }
    // bit-exact, not approximate: the fold order is the contract
    assert(got.toSeq == want)
  }

  test("graft_dot handles double arrays, length mismatch, and nulls") {
    val s = session
    import s.implicits._
    val df = Seq(
      (Some(Seq(1.5, 2.5, 3.5)), Some(Seq(2.0, 4.0))), // common prefix: 1.5*2+2.5*4
      (None, Some(Seq(1.0)))) // null array -> null
      .toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 13.0)
    assert(rows(1).isNullAt(0))
  }

  test("graft_simhash32 equals the exploded ±1-vote formulation") {
    val s = session
    import s.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "a", "", "one two")
    // independent reimplementation of the oracle's exploded formulation
    def naive(text: String): Long = {
      val words = text.split(" ", -1)
      val votes = new Array[Int](32)
      for (w <- words) {
        var h = 0L
        for (c <- w) h = (h * 131 + c.toLong) % TextHash.P
        val wh2 = (h * 2654435761L) % 4294967296L
        for (j <- 0 until 32)
          votes(j) += (if (((wh2 >> j) & 1L) == 1L) 1 else -1)
      }
      (0 until 32).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }
    val got = docs.toDF("text")
      .select(expr("graft_simhash32(split(text, ' '))")).collect().map(_.getLong(0))
    assert(got.toSeq == docs.map(naive))
  }

  test("graft_minhash_bands equals the per-permutation shingle minima") {
    val s = session
    import s.implicits._
    val docs = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma", // exactly one shingle
      "alpha beta", // < 3 words -> no shingles -> empty array
      "x y z x y z x y z")
    def shingleHash(a: String, b: String, c: String): Long = {
      val sgl = s"$a $b $c"
      var h = 0L
      for (ch <- sgl) h = (h * 131 + ch.toLong) % TextHash.P
      h
    }
    def naive(text: String): Seq[Long] = {
      val words = text.split(" ", -1)
      if (words.length < 3) return Seq.empty
      val shingles = (0 to words.length - 3)
        .map(i => shingleHash(words(i), words(i + 1), words(i + 2)))
      val mh = (0 until 16).map { k =>
        shingles.map(wh => (wh * (97 + 31 * k) + (13 + 17 * k)) % TextHash.P).min
      }
      (0 until 8).map(b => mh(2 * b) * TextHash.P + mh(2 * b + 1))
    }
    val got = docs.toDF("text")
      .select(expr("graft_minhash_bands(split(text, ' '))"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(got.toSeq == docs.map(naive))
  }

  test("graft_minhash_sig: raw minima, and bands are its pairwise packing") {
    val s = session
    import s.implicits._
    val docs = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma",
      "alpha beta", // < 3 words -> empty
      "the quick brown fox jumps over the lazy dog")
    val rows = docs.toDF("text")
      .select(expr("graft_minhash_sig(split(text, ' '))").as("sig"),
        expr("graft_minhash_bands(split(text, ' '))").as("bands"))
      .collect()
      .map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    rows.foreach { case (sig, bands) =>
      if (sig.isEmpty) assert(bands.isEmpty)
      else {
        assert(sig.length == 16 && bands.length == 8)
        (0 until 8).foreach(b =>
          assert(bands(b) == sig(2 * b) * TextHash.P + sig(2 * b + 1)))
      }
    }
    // identical docs agree on every position; a different doc does not
    val Seq(s1, s2) = Seq(docs.head, docs.head).toDF("text")
      .select(expr("graft_minhash_sig(split(text, ' '))"))
      .collect().toSeq.map(_.getSeq[Long](0))
    assert(s1 == s2)
  }

  test("graft_simhash64_bands equals the exploded two-half ±1-vote formulation") {
    val s = session
    import s.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "a", "", "one two one two")
    // independent reimplementation of the oracle's exploded formulation
    def naive(text: String): Seq[Long] = {
      val votes = new Array[Int](64)
      for (w <- text.split(" ", -1)) {
        var h = 0L
        for (c <- w) h = (h * 131 + c.toLong) % TextHash.P
        val lo = (h * 2654435761L) % 4294967296L
        val hi = (h * 2246822519L) % 4294967296L
        for (j <- 0 until 32) {
          votes(j) += (if (((lo >> j) & 1L) == 1L) 1 else -1)
          votes(32 + j) += (if (((hi >> j) & 1L) == 1L) 1 else -1)
        }
      }
      (0 until 4).map(b =>
        (0 until 16).map(j => if (votes(16 * b + j) > 0) 1L << j else 0L).sum)
    }
    val got = docs.toDF("text")
      .select(expr("graft_simhash64_bands(split(text, ' '))"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(got.toSeq == docs.map(naive))
    // every chunk fits 16 bits — the blocking key space is 2^16 per band
    assert(got.flatten.forall(c => c >= 0L && c < 65536L))
  }

  test("graft_lsh_bucket equals the interpreted SQL decimal fold it replaced") {
    val s = session
    import s.implicits._
    val rng = new scala.util.Random(11)
    // adversarial magnitudes: tiny components push w*x toward the 1e-12
    // rounding boundary where shortest-repr vs exact-binary rounding differ
    val rows = Seq.fill(200)(Array.fill(64)(
      (rng.nextFloat() - 0.5f) * (if (rng.nextInt(4) == 0) 1e-10f else 1f)))
    val df = rows.map(Tuple1(_)).toDF("emb")
    val sqlFold =
      """aggregate(sequence(0, 11), CAST(0 AS BIGINT), (acc, p) -> acc +
           IF(aggregate(sequence(0, size(emb) - 1), CAST(0 AS DECIMAL(18,12)), (a, j) ->
                CAST(a + CAST(CAST((p * 37 + j * 13) % 19 - 9 AS DOUBLE)
                              * CAST(emb[j] AS DOUBLE) AS DECIMAL(18,12)) AS DECIMAL(18,12)))
              >= 0, SHIFTLEFT(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT)))"""
    val both = df.select(
      expr("graft_lsh_bucket(emb, 12)").as("native"),
      expr(sqlFold).as("fold")).collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))

    // independent reimplementation of the decimal-fold contract
    def naive(emb: Array[Float]): Long = {
      var fp = 0L
      for (p <- 0 until 12) {
        var acc = BigInt(0) // unscaled DECIMAL(18,12)
        for (j <- emb.indices) {
          val w = ((p * 37 + j * 13) % 19 - 9).toDouble
          val term = new java.math.BigDecimal(java.lang.Double.toString(w * emb(j).toDouble))
            .setScale(12, java.math.RoundingMode.HALF_UP).unscaledValue()
          acc += BigInt(term)
        }
        if (acc >= 0) fp |= (1L << p)
      }
      fp
    }
    val native = df.select(expr("graft_lsh_bucket(emb, 12)")).collect().map(_.getLong(0))
    assert(native.toSeq == rows.map(naive))
  }

  test("graft_lsh_bucket rejects planes outside the weight-schedule range") {
    val s = session
    import s.implicits._
    val df = Seq(Tuple1(Array.fill(8)(0.5f))).toDF("emb")
    intercept[Exception] {
      df.select(expr("graft_lsh_bucket(emb, 20)")).collect()
    }
    // null array -> null, planes honored for any in-range count
    val ok = Seq((Option.empty[Array[Float]], 1)).toDF("emb", "k")
      .select(expr("graft_lsh_bucket(emb, 4)")).collect()
    assert(ok(0).isNullAt(0))
  }

  test("graft_lsh_bucket multi-table: table 0 is the 2-arg form, other tables differ") {
    val s = session
    import s.implicits._
    val df = (1 to 64).map(i => Tuple2(i.toLong,
        Array.tabulate(16)(j => math.sin(i * 17 + j).toFloat)))
      .toDF("vec_id", "emb")

    val rows = df.select(
      expr("graft_lsh_bucket(emb, 12)").as("b2"),
      expr("graft_lsh_bucket(emb, 12, 0)").as("t0"),
      expr("graft_lsh_bucket(emb, 12, 1)").as("t1")).collect()
    // table 0 IS the original schedule — every existing oracle is unchanged
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
    // a different plane family buckets differently for at least some vectors
    assert(rows.exists(r => r.getLong(1) != r.getLong(2)))

    // out-of-range table index is rejected, not silently wrapped
    intercept[Exception] {
      df.select(expr("graft_lsh_bucket(emb, 12, 99)")).collect()
    }
  }

  test("graft_topk equals the window-rank formulation and map-side combines") {
    val s = session
    import s.implicits._
    // values engineered so groups have <k, =k, and >k rows, with ties
    val df = (1 to 500).map(i => (i % 7, (i * 31 % 100).toLong))
      .toDF("g", "v").repartition(8) // multiple partitions force partial merge
    graft.plans.DotProduct.register(s)

    val agg = df.groupBy($"g").agg(expr("graft_topk(v, 5)").as("tops"))
      .select($"g", posexplode($"tops").as(Seq("r", "v")))
      .select($"g", ($"r" + 1).as("rank"), $"v")
    val win = df.withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v".desc)))
      .filter($"rank" <= 5).select($"g", $"rank".cast("int").as("rank"), $"v")
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)

    // partial aggregation is the point: the plan must carry a partial_graft_topk
    val plan = df.groupBy($"g").agg(expr("graft_topk(v, 5)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"), s"no partial aggregate in:\n$plan")

    // nulls skipped; k larger than the group yields the whole group sorted
    val tiny = Seq((1, Some(3L)), (1, None), (1, Some(9L))).toDF("g", "v")
    val out = tiny.groupBy($"g").agg(expr("graft_topk(v, 5)").as("t"))
      .select($"t").head().getSeq[Long](0)
    assert(out == Seq(9L, 3L))
  }

  test("graft_bloom_agg + graft_might_contain: no false negatives, real filtering") {
    val s = session
    import s.implicits._
    (1L to 1000L).toDF("v").createOrReplaceTempView("bl_corpus")
    (1L to 1000L by 10).toDF("p").createOrReplaceTempView("bl_probe")
    val kept = s.sql(
      """SELECT v FROM bl_corpus
         WHERE graft_might_contain(
                 (SELECT graft_bloom_agg(xxhash64(p), 200L) FROM bl_probe),
                 xxhash64(v))""")
      .collect().map(_.getLong(0)).toSet
    val members = (1L to 1000L by 10).toSet
    // blooms never drop a member (the exact-verify join downstream relies
    // on this); and the sketch must actually prune most non-members
    assert(members.subsetOf(kept))
    assert(kept.size < 400, s"bloom pruned nothing: ${kept.size} of 1000 kept")
  }

  test("native expressions survive whole-stage codegen in a grouped plan") {
    val s = session
    import s.implicits._
    // push the expressions through a shuffle + aggregate so the generated
    // code path (not just the interpreted projection) is exercised
    val df = Seq.tabulate(100)(i => (i % 7, s"w$i w${i + 1} w${i + 2} w${i + 3}"))
      .toDF("k", "text")
      .groupBy($"k")
      .agg(
        sum(expr("graft_simhash32(split(text, ' '))")).as("sh"),
        sum(expr("graft_minhash_bands(split(text, ' '))[0]")).as("mb"))
    assert(df.collect().length == 7)
  }
}
