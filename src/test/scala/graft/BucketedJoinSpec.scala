package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketed

/** The co-located layout contract: writing both sides bucketed+sorted by
  * the join key moves the join's shuffle to write time — the query plan
  * itself must contain NO Exchange. That plan property is the whole point,
  * so it is asserted literally. */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucketing join: sort-merge with zero exchanges; groupBy reuses the layout") {
    val s = spark
    import s.implicits._
    val tmp = SparkSpec.tempDir("bucketspec").toString
    s.sql(s"CREATE DATABASE IF NOT EXISTS bucketspec LOCATION '$tmp'")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: a broadcast join would trivially have no
      // exchange and prove nothing about the layout
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = (1 to 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "va")
      val b = (1 to 2000).map(i => (i.toLong % 500, i.toLong * 7)).toDF("k", "vb")
      Bucketed.write(a.coalesce(1), "bucketspec.ta", 8, Seq("k"))
      Bucketed.write(b.coalesce(1), "bucketspec.tb", 8, Seq("k"))

      val joined = Bucketed.join(s, "bucketspec.ta", "bucketspec.tb", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the layout's whole point: NO network move. (A local per-partition
      // Sort remains — Spark 3+ stopped trusting bucket sort order at read
      // time — but sorting pre-sorted runs is in-memory and spill-free;
      // the Exchange is what costs at 100 TB.)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // correctness: identical to the plain (shuffling) join
      val plain = a.as("a").join(b.as("b"), "k")
        .select($"k", $"va", $"vb")
      val got = joined.select($"k", $"va", $"vb")
      assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)

      // aggregation on the bucket key also satisfies its distribution from
      // the layout: no exchange before the final aggregate
      val aggPlan = s.table("bucketspec.ta").groupBy($"k").agg(sum($"va"))
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed groupBy still shuffles:\n$aggPlan")

      // bucket pruning: an equality filter reads 1 of 8 buckets. Spark's
      // auto-bucketed-scan heuristic turns the bucketed read off when no
      // exchange is saved, which also forfeits pruning — pin it on, as a
      // point-lookup-heavy deployment would.
      s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val pruned = s.table("bucketspec.ta").filter($"k" === 7)
          .queryExecution.executedPlan.toString
        assert(pruned.contains("SelectedBucketsCount: 1 out of 8"),
          s"no bucket pruning in:\n$pruned")
      } finally s.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP DATABASE IF EXISTS bucketspec CASCADE")
    }
  }
}
