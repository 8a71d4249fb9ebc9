package graft

import graft.queries.TextOps

/** corpus_hhi_concentration: the report must equal an exact driver-side
  * recomputation, and the index must respect its analytic bounds. */
class HhiSpec extends SparkSpec {

  test("HHI and top-share match an exact BigInt recomputation") {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    val toks = spark.table("documents")
      .filter($"lang".isNotNull && $"source".isNotNull)
      .select($"lang", $"source", $"text").as[(String, String, String)]
      .collect()
      .groupBy(t => (t._1, t._2))
      .map { case (k, docs) => k -> docs.map(_._3.split(" ", -1).length.toLong).sum }
    val rows = TextOps.hhiConcentration(spark, SparkSpec.fixtureSf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val mine = toks.collect { case ((l, _), n) if l == lang => n }.toSeq
      val total = mine.sum
      val hhi = (mine.map(n => BigInt(n) * n).sum * 100000000) / (BigInt(total) * total)
      assert(r.getAs[Long]("n_sources") == mine.length.toLong)
      assert(r.getAs[Long]("total_tok") == total)
      assert(BigInt(r.getAs[Long]("hhi_e8")) == hhi)
      assert(r.getAs[Long]("top_share_bp") == mine.max * 10000 / total)
      // analytic bounds: uniform floor 10^8/k .. monopoly 10^8
      assert(r.getAs[Long]("hhi_e8") >= 100000000L / mine.length - 1)
      assert(r.getAs[Long]("hhi_e8") <= 100000000L)
    }
  }
}
