package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** Specs for the generalized as-of join: checked against the naive
  * range-join + max formulation (correct but quadratic — fine at test
  * scale), plus the edge semantics the contract promises. */
class AsOfSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 5L, "l-c"),
      (2L, 15L, "l-d"), (3L, 7L, "l-e"))
      .toDF("k", "t", "ltag")
    val right = Seq(
      (1L, 8L, 100L), (1L, 10L, 200L), (1L, 18L, 300L),
      (2L, 99L, 400L), (4L, 1L, 500L))
      .toDF("k", "rt", "v")
    (s, left, right)
  }

  test("backwardOuter matches the naive range-join formulation") {
    val (s, left, right) = fixture
    import s.implicits._
    val got = AsOf.backwardOuter(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))

    // naive reference: join all earlier right rows, keep the max rt
    val joined = left.join(right, left("k") === right("k") && $"rt" <= $"t", "left")
      .groupBy(left("k").as("k"), $"t", $"ltag")
      .agg(max_by(struct($"rt", $"v"), $"rt").as("m"))
      .select($"k", $"t", $"ltag", $"m.rt".as("asof_rt"), $"m.v".as("asof_v"))

    assert(got.exceptAll(joined).isEmpty && joined.exceptAll(got).isEmpty)
    assert(got.count() == left.count()) // outer keeps every left row
  }

  test("tie at equal ord is inclusive; no-match rows null (outer) or dropped (inner)") {
    val (s, left, right) = fixture
    import s.implicits._
    val out = AsOf.backwardOuter(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4))))).toMap
    assert(out((1L, 10L)) == Some((10L, 200L))) // rt == t matches (inclusive)
    assert(out((1L, 20L)) == Some((18L, 300L)))
    assert(out((1L, 5L)) == None) // earlier than every right row
    assert(out((2L, 15L)) == None) // right exists for key but only later
    assert(out((3L, 7L)) == None) // no right rows for key at all

    val inner = AsOf.backward(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
    assert(inner.count() == 2) // only the two matched left rows survive
  }

  test("plan shape: one exchange on the key, no join node, no row multiplication") {
    val (s, left, right) = fixture
    val plan = AsOf.backwardOuter(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .queryExecution.executedPlan.toString
    // the merge-as-union decomposition must not plan a join: a range join
    // here would multiply rows before pruning
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"), s"no window in:\n$plan")
  }
}
