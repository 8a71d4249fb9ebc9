package graft

import org.apache.spark.sql.functions._

import graft.operators.BinnedRange

/** The binned range join must be exactly the naive non-equi join, while
  * planning as an equi-join (no nested-loop node). */
class BinnedRangeSpec extends SparkSpec {

  private def data = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val left = (1 to 300).map(i => (i.toLong, rng.nextInt(5000).toLong, i.toLong % 3))
      .toDF("lid", "lt", "k")
    val right = (1 to 400).map(i => (i.toLong, rng.nextInt(5000).toLong, i.toLong % 3, i.toLong * 10))
      .toDF("rid", "rt", "k", "v")
    (s, left, right)
  }

  test("matches the naive range join, including negative lower bounds") {
    val (s, left, right) = data
    import s.implicits._
    val got = BinnedRange.pointsInWindow(left, right, "lt", "rt", -30, 50, Seq("rid", "v"))
      .select($"lid", $"rid")
    val naive = left.join(right, $"rt" >= $"lt" - 30 && $"rt" <= $"lt" + 50)
      .select($"lid", $"rid")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    assert(got.count() == naive.count()) // no duplicated candidate pairs

    // the contrast that motivates the operator: with no equi keys at all,
    // Spark can only nested-loop the naive formulation; the binned join
    // must plan as a hash/merge equi-join on the bin id
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val binnedPlan = BinnedRange
      .pointsInWindow(left, right, "lt", "rt", -30, 50, Seq("rid", "v"))
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$binnedPlan")
  }

  test("per-key variant matches the naive key+range join") {
    val (s, left, right) = data
    import s.implicits._
    val joined = BinnedRange.pointsInWindow(
      left, right, "lt", "rt", 0, 100, Seq("rid", "v"), on = Seq("k"))
    val naive = left.join(right.withColumnRenamed("k", "rk"),
        $"k" === $"rk" && $"rt" >= $"lt" && $"rt" <= $"lt" + 100)
      .select($"lid", $"rid")
    val got = joined.select($"lid", $"rid")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // (with an equi key the naive plan is already a hash join — but its
    // residual range condition still explodes per-key work at scale; the
    // bin key keeps candidate pairs window-proportional)
    assert(!joined.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }
}
