package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The class-balanced pocket perceptron (`classifier_percep_*`). The
  * DuckDB gate pins cross-engine equality of all three entries; these
  * pins are the TRAINING semantics a result hash cannot see: the zero
  * model's baseline round, the pocket guarantee (the served model is
  * never worse than any round the loop visited, measured by balanced
  * error mass), and train/score consistency (the published weight table
  * reproduces the published margins). */
class PerceptronSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  private def labels = {
    graft.fixtures.Fixtures.register(spark, sfDir)
    val pred = TextOps.dsirTargetSources.map(s => s"'$s'").mkString(
      "source IN (", ", ", ")")
    spark.table("documents").select(col("doc_id"),
      when(expr(pred), 1L).otherwise(-1L).as("y"))
  }

  test("round 1 is the zero model's all-negative baseline") {
    val c = Classifier.pcpCurve(spark, sfDir).orderBy(col("round")).collect()
    assert(c.length == Classifier.pcpRounds)
    val nPos = labels.filter(col("y") === 1L).count()
    // w₀ = 0 ⇒ every margin 0 ⇒ sign(0) = −1 ⇒ exactly the positives err
    assert(c.head.getAs[Long]("errors_pos") == nPos)
    assert(c.head.getAs[Long]("errors_neg") == 0L)
  }

  test("pocket: the served model attains the curve's minimum balanced error mass") {
    val lab = labels
    val nPos = lab.filter(col("y") === 1L).count()
    val nNeg = lab.count() - nPos
    val curveMin = Classifier.pcpCurve(spark, sfDir).collect()
      .map(r => BigInt(r.getAs[Long]("errors_pos")) * nNeg +
        BigInt(r.getAs[Long]("errors_neg")) * nPos)
      .min
    // balanced mass of the model the SCORE entry actually serves
    val served = Classifier.pcpScore(spark, sfDir)
      .join(lab, Seq("doc_id"))
      .agg(
        sum(when(col("y") === 1L && !col("keep"), 1L).otherwise(0L)).as("ep"),
        sum(when(col("y") === -1L && col("keep"), 1L).otherwise(0L)).as("en"))
      .collect().head
    val servedMass =
      BigInt(served.getLong(0)) * nNeg + BigInt(served.getLong(1)) * nPos
    assert(servedMass == curveMin,
      s"pocket must serve the best visited round: served $servedMass, curve min $curveMin")
    // and the best round must beat the all-negative baseline — the loop
    // must have LEARNED something on the fixture, or the entry is inert
    assert(servedMass < BigInt(nPos) * nNeg,
      s"served mass $servedMass must beat the zero model's ${BigInt(nPos) * nNeg}")
  }

  test("margin PR sweep: confusion conserves the corpus, recall falls as the gate tightens") {
    val nDocs = labels.count()
    val rows = Classifier.marginPr(spark, sfDir).collect()
    assert(rows.length == 2 * Classifier.prThresholds)
    rows.foreach { r =>
      val total = r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn")
      assert(total == nDocs, s"confusion must partition the corpus: $r")
    }
    for (model <- Seq("nb", "percep")) {
      val arm = rows.filter(_.getAs[String]("model") == model)
        .sortBy(_.getAs[Long]("level"))
      // margin > t is monotone in t: a tighter gate can only lose recall
      val recalls = arm.map(_.getAs[Long]("recall_bp"))
      assert(recalls.sliding(2).forall(w => w.length < 2 || w(1) <= w(0)),
        s"$model recall must be non-increasing in the threshold: ${recalls.toSeq}")
      val thr = arm.map(_.getAs[Long]("threshold"))
      assert(thr.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        s"$model thresholds must be non-decreasing: ${thr.toSeq}")
    }
  }

  test("train/score consistency: published weights reproduce published margins") {
    import spark.implicits._
    val w = Classifier.pcpTrain(spark, sfDir)
    val scored = Classifier.pcpScore(spark, sfDir)
    // margins recomputed from the train entry's table over the same
    // normalized features must match the score entry row for row
    val recomputed = Classifier.pcpFeatures(spark, sfDir)
      .join(broadcast(w), Seq("bucket"), "left_outer")
      .groupBy($"doc_id")
      .agg(sum($"xf" * coalesce($"wgt", lit(0L))).as("m2"))
    val diff = scored.join(recomputed, Seq("doc_id"))
      .filter($"margin" =!= $"m2")
    assert(diff.isEmpty, "margin mismatch between train and score entries")
  }
}
