package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, Sampling, Sessions, TextOps}

/** Round-8 additions: temperature-scaled domain mixing, containment
  * near-dup verification, and integer PageRank over the interaction
  * graph. The DuckDB differential covers value equality; these tests pin
  * the SEMANTIC properties each operator exists for. */
class GraphSamplingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("temperature curve: head share falls monotonically toward uniform; weights are exact isqrt") {
    val rows = Sampling.temperatureCurve(spark, sfDir).collect()
    val byTau = rows.groupBy(_.getAs[String]("tau"))
    assert(byTau.keySet == Set("1", "2", "4", "inf"))
    // flattening ladder: the LARGEST language's share is non-increasing
    // as the exponent falls (per-language mins are not monotone — integer
    // quantization at single-digit weights — but the head always flattens)
    val maxShare = Seq("1", "2", "4", "inf")
      .map(t => byTau(t).map(_.getAs[Long]("share_bp")).max)
    assert(maxShare.sliding(2).forall(w => w.length < 2 || w(1) <= w(0)),
      s"head share must flatten with the exponent, got $maxShare")
    // uniform arm is exactly uniform
    assert(byTau("inf").map(_.getAs[Long]("share_bp")).distinct.length == 1)
    // τ=2 weights are the EXACT integer sqrt: w² ≤ n < (w+1)²
    byTau("2").foreach { r =>
      val n = r.getAs[Long]("n_d"); val w = r.getAs[Long]("w")
      assert(w * w <= n && n < (w + 1) * (w + 1), s"inexact isqrt: $r")
    }
  }

  test("temperature mix downsamples the head to a share between raw and uniform") {
    val kept = Sampling.temperatureMix(spark, sfDir)
      .groupBy(col("lang")).agg(count(lit(1)).as("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Sampling.temperatureMix(spark, sfDir)
      .select(col("lang"), col("rate_bp")).distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the dominant language is kept at a LOWER rate than every tail language
    // (that is what temperature sampling is for)
    val en = rates("en")
    rates.filterNot(_._1 == "en").foreach { case (l, bp) =>
      assert(en < bp, s"en rate $en should be below $l rate $bp")
    }
    assert(rates.values.forall(bp => bp > 0 && bp <= 10000))
    // α=1/2 interpolates: en's share of the KEPT corpus sits strictly
    // between its raw corpus share and the uniform 1/k share — the defining
    // property of temperature sampling at 0 < α < 1
    val keptShare = kept("en").toDouble / kept.values.sum
    val rawShare = corpus("en").toDouble / corpus.values.sum
    val uniformShare = 1.0 / corpus.size
    assert(keptShare < rawShare,
      s"kept share $keptShare should be below raw share $rawShare")
    assert(keptShare > uniformShare,
      s"kept share $keptShare should be above uniform share $uniformShare")
  }

  test("containment catches subset pairs and scores in exact basis points") {
    val out = Dedup.containment(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val inter = r.getAs[Long]("inter")
      val na = r.getAs[Long]("na"); val nb = r.getAs[Long]("nb")
      val bp = r.getAs[Long]("containment_bp")
      assert(bp == inter * 10000L / math.min(na, nb))
      assert(bp >= 8000L, s"below threshold: $r")
      assert(inter <= math.min(na, nb), "intersection cannot exceed either set")
    }
  }

  test("pagerank conserves damped mass and ranks in-degree hubs above leaves") {
    val ranks = Sessions.userPagerank(spark, sfDir)
    val n = ranks.count()
    assert(n > 0)
    val total = ranks.agg(sum(col("rank_e12"))).collect().head.getLong(0)
    val S = 1000000000000L
    // teleport mass alone is 0.15·S; dangling + integer-floor loss can only
    // shrink the total below S
    assert(total >= S * 15 / 100 - n * 2, s"total $total below teleport floor")
    assert(total <= S, s"total $total exceeds injected mass")
    // every node retains at least the teleport base
    val base = (15L * (S / n)) / 100L
    assert(ranks.filter(col("rank_e12") < base).isEmpty)
  }

  test("classifier score is a pure scan-side projection (no shuffle)") {
    val df = TextOps.classifierScore(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"model-filter inference must not shuffle:\n$plan")
    // keep/threshold consistency on actual rows
    df.collect().foreach { r =>
      val score = r.getAs[Long]("score"); val n = r.getAs[Long]("n_words")
      assert(r.getAs[Boolean]("keep") == (score > 0))
      assert(r.getAs[Long]("score_bp") == score * 10000L / n)
      assert(math.abs(score) <= 500L * n, "weights are bounded by ±500")
    }
  }

  test("line dedup keeps exactly one occurrence per distinct segment") {
    val out = TextOps.lineDedup(spark, sfDir)
    val totalKept = out.agg(sum(col("n_kept"))).collect().head.getLong(0)
    // total survivors across the corpus == number of distinct segment
    // hashes: every distinct segment elected exactly one winner
    graft.fixtures.Fixtures.register(spark, sfDir)
    val distinctSegs = spark.sql(
      """SELECT COUNT(DISTINCT h) AS c FROM (
           SELECT explode(transform(sequence(0, CAST((size(words) + 7) DIV 8 AS INT) - 1),
             i -> aggregate(transform(slice(words, i * 8 + 1, 8),
               w -> aggregate(transform(split(w, ''), c -> CAST(ascii(c) AS BIGINT)),
                 CAST(0 AS BIGINT), (acc, x) -> (acc * 131 + x) % 1000000007)),
               CAST(0 AS BIGINT), (acc, x) -> (acc * 131 + x) % 1000000007))) AS h
           FROM (SELECT split(text, ' ') AS words FROM documents))""")
      .collect().head.getLong(0)
    assert(totalKept == distinctSegs,
      s"kept $totalKept segments but corpus has $distinctSegs distinct ones")
    assert(out.filter(col("n_kept") > col("n_segs")).isEmpty)
  }
}
