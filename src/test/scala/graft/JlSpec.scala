package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.plans.JlProject
import graft.queries.Similarity

/** The JL projection family (`embedding_jl_*`, `sim_ann_recall_jl`).
  * The DuckDB gate pins cross-engine equality; these pins are the kernel
  * contract and the properties the gate can't see. */
class JlSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  test("kernel: project() equals the reference left fold, sign-exact") {
    val xs = Array(0.25f, -1.5f, 3.0f, 0.125f, -0.0625f)
    val a = ArrayData.toArrayData(xs)
    val k = 7
    val out = JlProject.project(a, k, aFloat = true)
    for (j <- 0 until k) {
      var acc = 0.0
      for (i <- xs.indices) acc += JlProject.sign(i.toLong, j.toLong) * xs(i).toDouble
      assert(out.getDouble(j) == acc, s"output $j must be the exact left fold")
    }
  }

  test("sign mix: columns are balanced and pairwise distinct (the linear-mix regression)") {
    val d = 64
    val k = 16
    val cols = (0 until k).map(j => (0 until d).map(i => JlProject.sign(i, j)))
    cols.zipWithIndex.foreach { case (c, j) =>
      val bias = math.abs(c.sum)
      assert(bias <= 24.0, s"column $j sign bias $bias of $d — mix is skewed")
    }
    // the round-12 bug: a linear cell mix left adjacent columns nearly
    // identical (recall 0.000, ratios 0.47-1.76); avalanched columns must
    // not collapse into each other
    for (a <- 0 until k; b <- a + 1 until k) {
      val agree = cols(a).zip(cols(b)).count { case (x, y) => x == y }
      assert(agree <= 48 && agree >= 16,
        s"columns $a,$b agree on $agree/$d signs — near-duplicate projection rows")
    }
  }

  test("the projection plan is shuffle-free (a pure scan-side map)") {
    val plan = Similarity.jlProject(spark, sfDir).queryExecution.executedPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"graft_jl must project in the scan — found exchanges:\n$plan")
  }

  test("distortion gauge reads unbiased (≈1.0 across the query set)") {
    val ratios = Similarity.jlDistortion(spark, sfDir).collect()
      .map(_.getAs[Double]("distortion_ratio"))
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.25,
      s"E[d2_jl] = k*d2_true should hold on average, got mean $mean (${ratios.toSeq})")
  }
}
