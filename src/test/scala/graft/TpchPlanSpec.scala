package graft

import graft.queries.Tpch

/** Physical-plan assertions for representative TPC-H shapes: these pin the
  * scale-critical plan properties (scan-side pushdown, broadcast dims,
  * bounded top-k, no global sorts) so a refactor that silently loses one
  * fails a test, not a production run. */
class TpchPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6 is a pure scan-aggregate: zero joins, every predicate pushed") {
    val p = plan(Tpch.q6(spark, sfDir))
    assert(!p.contains("Join"), "q6 must not join anything")
    // the rendered PushedFilters list is truncated, so assert its prefix
    // plus the full predicate set in the scan's DataFilters line
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"q6's predicates must reach the parquet scan:\n$p")
    assert(p.contains("l_quantity#") && p.contains("< 24"),
      s"q6's quantity bound must sit on the scan, not above it:\n$p")
  }

  test("q1 is one partial+final aggregate pair with a pruned scan") {
    val p = plan(Tpch.q1(spark, sfDir))
    assert(!p.contains("Join"))
    // column pruning: the scan schema must not include the unused keys
    assert(!p.contains("l_orderkey") && !p.contains("l_partkey"),
      "q1 reads aggregate columns only — join keys must be pruned from the scan")
  }

  test("q5's dimension chain broadcasts; lineitem is never sort-merge joined") {
    val p = plan(Tpch.q5(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "no fact-to-fact shuffle join exists in q5's shape")
  }

  test("top-k queries use TakeOrderedAndProject, never a global sort") {
    for ((name, q) <- Seq("q3" -> Tpch.q3 _, "q10" -> Tpch.q10 _, "q18" -> Tpch.q18 _)) {
      val p = plan(q(spark, sfDir))
      assert(p.contains("TakeOrderedAndProject"),
        s"$name's LIMIT must compile to a bounded top-k, got:\n$p")
    }
  }

  test("q11/q22's global thresholds broadcast one row") {
    for ((name, q) <- Seq("q11" -> Tpch.q11 _, "q22" -> Tpch.q22 _)) {
      val p = plan(q(spark, sfDir))
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$name's scalar threshold must broadcast, got:\n$p")
    }
  }
}
