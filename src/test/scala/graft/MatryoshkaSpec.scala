package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Matryoshka prefix-dimension recall sweep. The oracle hash-match proves
  * engine agreement; this spec pins the metric's shape: the output covers
  * every (width, query) cell exactly once, recall is hits/3, and on the
  * sf0.1 fixture recall rises strictly with prefix width (the pipeline is
  * fully deterministic, so these are regression pins, not statistical
  * bounds — measured 1 < 6 < 18 summed hits for widths 8 < 16 < 32).
  */
class MatryoshkaSpec extends SparkSpec {

  test("output covers 3 widths x query budget, recall = hits/3") {
    val s = spark
    import s.implicits._
    val out = Similarity.annRecallMatryoshka(s, "/root/testdata/sf0.01")
      .select($"dims", $"query_id", $"hits", $"recall_at_3")
      .as[(Long, Long, Long, Double)].collect()
    val byDim = out.groupBy(_._1)
    assert(byDim.keySet === Set(8L, 16L, 32L))
    val queries = out.map(_._2).distinct.sorted
    byDim.values.foreach { g =>
      assert(g.map(_._2).distinct.sorted.toSeq === queries.toSeq,
        "every width must evaluate the same query set")
    }
    out.foreach { case (_, _, hits, recall) =>
      assert(hits >= 0 && hits <= 3)
      assert(recall === BigDecimal(hits / 3.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("recall rises strictly with prefix width on the sf0.1 fixture") {
    val s = spark
    import s.implicits._
    val sums = Similarity.annRecallMatryoshka(s, "/root/testdata/sf0.1")
      .groupBy($"dims").agg(sum($"hits").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(sums(8L) < sums(16L) && sums(16L) < sums(32L),
      s"width sweep must be strictly monotone at this scale: $sums")
  }
}
