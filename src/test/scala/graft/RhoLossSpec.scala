package graft

import graft.queries.Sampling

/** sample_rho_loss: the selection must be exactly the top-64 of the full
  * scored train split under the (excess, doc_id) total order, every
  * selected document must belong to the train split, and the excess column
  * must be the stated difference of the two LM scores. */
class RhoLossSpec extends SparkSpec {

  private lazy val selected =
    Sampling.rhoLossSelect(spark, SparkSpec.fixtureSf).collect()

  private lazy val full =
    Sampling.rhoLossSelect(spark, SparkSpec.fixtureSf, topK = Int.MaxValue).collect()

  test("selects exactly the top-64 by (excess desc, doc_id)") {
    assert(selected.length == 64)
    val expect = full
      .sortBy(r => (-r.getAs[Long]("excess"), r.getAs[Long]("doc_id")))
      .take(64).map(_.getAs[Long]("doc_id")).toSet
    assert(selected.map(_.getAs[Long]("doc_id")).toSet == expect)
  }

  test("excess is ref minus self, on train-split documents only") {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    val trainIds = spark.table("documents")
      .select($"doc_id", org.apache.spark.sql.functions.sha2($"text", 256).as("sha"))
      .filter(Sampling.splitCol($"sha") === "train")
      .select($"doc_id").as[Long].collect().toSet
    selected.foreach { r =>
      assert(trainIds(r.getAs[Long]("doc_id")), "selected doc outside train split")
      assert(r.getAs[Long]("excess") ==
        r.getAs[Long]("ref_fluency") - r.getAs[Long]("self_fluency"))
    }
  }
}
