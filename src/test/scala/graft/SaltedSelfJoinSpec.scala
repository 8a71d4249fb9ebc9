package graft

import org.apache.spark.sql.functions._

import graft.util.Salted

/** The config-gated salted band/bucket self-join (VERDICT r7 #8): a
  * synthetic boilerplate band key — one key shared by most documents, the
  * pattern a common header produces under MinHash/winnow blocking — must
  * split across reducers under the salt while producing pair-for-pair
  * identical results to the plain join. */
class SaltedSelfJoinSpec extends SparkSpec {

  private def withBuckets[A](n: Int)(body: => A): A = {
    spark.conf.set(Salted.selfJoinBucketsKey, n.toString)
    try body finally spark.conf.unset(Salted.selfJoinBucketsKey)
  }

  // 200 docs share band key 0 (the boilerplate header); 100 more scatter
  private def bands = {
    val s = spark
    import s.implicits._
    s.range(0, 300)
      .select($"id".as("doc_id"),
        when($"id" < 200, 0L).otherwise($"id").as("band"))
  }

  test("salted pair self-join equals the plain join, pair for pair") {
    val plain = Salted.pairSelfJoin(bands, "band", "doc_id").cache()
    val salted = withBuckets(8) {
      Salted.pairSelfJoin(bands, "band", "doc_id").cache()
    }
    try {
      assert(plain.count() == 200L * 199 / 2 + 0L, "hot key yields C(200,2) pairs")
      assert(salted.count() == plain.count())
      assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty,
        "salting must not change the candidate-pair set")
    } finally { plain.unpersist(); salted.unpersist() }
  }

  test("the salt actually splits the hot band key across reducers") {
    val salted = withBuckets(8) { Salted.pairSelfJoin(bands, "band", "doc_id") }
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"join must key on (band, __salt):\n$plan")

    // the hot key's A-side rows land in 8 distinct salt groups — the split
    // AQE could only apply after measuring; here it's structural
    val s = spark
    import s.implicits._
    val spread = bands.withColumn("__salt", pmod(hash($"doc_id"), lit(8)))
      .filter($"band" === 0L).select($"__salt").distinct().count()
    assert(spread == 8L, s"expected the hot key spread over 8 salts, got $spread")
  }

  test("composite (band, band_key) salted self-join equals the plain join") {
    val s = spark
    import s.implicits._
    // two band indexes; band 0 has a hot key (0) shared by 150 docs, band 1
    // scatters — the exact blocking shape of the minhash/simhash/phash joins
    val banded = s.range(0, 200).select($"id".as("doc_id"))
      .select($"doc_id", explode(array(
        struct(lit(0L).as("band"), when($"doc_id" < 150, 0L).otherwise($"doc_id").as("band_key")),
        struct(lit(1L).as("band"), ($"doc_id" % 7).as("band_key")))).as("bk"))
      .select($"doc_id", $"bk.band", $"bk.band_key")
    val plain = Salted.pairSelfJoin(banded, Seq("band", "band_key"), "doc_id").cache()
    val salted = withBuckets(8) {
      Salted.pairSelfJoin(banded, Seq("band", "band_key"), "doc_id").cache()
    }
    try {
      assert(plain.count() > 0)
      assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty,
        "salting must not change the composite-key candidate-pair set")
    } finally { plain.unpersist(); salted.unpersist() }
  }

  test("minhashLsh under the salt gate matches its unsalted result") {
    val sfDir = "/root/testdata/sf0.001"
    val base = graft.queries.Dedup.minhashLsh(spark, sfDir).collect().toSet
    val salted = withBuckets(4) {
      graft.queries.Dedup.minhashLsh(spark, sfDir).collect().toSet
    }
    assert(base.nonEmpty, "fixture must produce LSH candidate pairs")
    assert(base == salted, "the salt gate must be invisible in the result")
  }

  test("carry variant: salted equals plain, payload columns intact") {
    val s = spark
    import s.implicits._
    val withIdx = bands.withColumn("idx", $"doc_id" % 7)
    val plain = Salted.pairSelfJoinCarry(withIdx, Seq("band"), "doc_id", Seq("idx")).cache()
    val salted = withBuckets(8) {
      Salted.pairSelfJoinCarry(withIdx, Seq("band"), "doc_id", Seq("idx")).cache()
    }
    try {
      assert(plain.columns.toSeq ===
        Seq("doc_id_a", "doc_id_b", "idx_a", "idx_b"))
      assert(plain.count() == 200L * 199 / 2)
      assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty,
        "salting must not change the carried-pair set")
      // the payload must be each side's own value, not a join artifact
      assert(plain.filter($"idx_a" =!= $"doc_id_a" % 7).count() === 0)
      assert(plain.filter($"idx_b" =!= $"doc_id_b" % 7).count() === 0)
    } finally { plain.unpersist(); salted.unpersist() }
  }

  test("substringRuns under the salt gate matches its unsalted result") {
    val sfDir = "/root/testdata/sf0.001"
    val base = graft.queries.Dedup.substringRuns(spark, sfDir).collect().toSet
    val salted = withBuckets(4) {
      graft.queries.Dedup.substringRuns(spark, sfDir).collect().toSet
    }
    assert(base.nonEmpty, "fixture must produce substring-run pairs")
    assert(base == salted, "the salt gate must be invisible in the result")
  }

  test("ngramJaccard under the salt gate matches its unsalted result") {
    val sfDir = "/root/testdata/sf0.001"
    // compare collected sets: combining both instances into one exceptAll
    // plan would duplicate the observe() metric name (DUPLICATED_METRICS_NAME).
    // The entry serves the memoized ppjoin path since r15, so the salted
    // variant must RELEASE the memo scope on both edges — otherwise it
    // would re-read the unsalted cached result and the test would be
    // vacuous (and the unsalted memo would leak a salted build to later
    // suites on the way out).
    val base = graft.queries.Dedup.ngramJaccard(spark, sfDir).collect().toSet
    val salted = withBuckets(4) {
      graft.util.Memo.release(spark, sfDir)
      try graft.queries.Dedup.ngramJaccard(spark, sfDir).collect().toSet
      finally graft.util.Memo.release(spark, sfDir)
    }
    assert(base.nonEmpty, "fixture must produce near-dup pairs")
    assert(base == salted, "the salt gate must be invisible in the result")
  }
}
