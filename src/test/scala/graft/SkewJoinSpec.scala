package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: a pathologically skewed key must be split into
  * multiple tasks at runtime (skew=true in the final adaptive plan) with
  * results identical to the unskewed computation. This is the default
  * safety net for hot keys; `util.Salted` is the static variant for
  * aggregations (SaltedSpec). */
class SkewJoinSpec extends SparkSpec {

  test("a 90%-hot key is split by AQE and the join result is unchanged") {
    val s = spark
    import s.implicits._
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // tiny thresholds so test-sized data counts as skewed
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

      // 90% of fact rows share key 0; padding makes the hot partition's
      // bytes exceed the skew threshold
      val fact = s.range(0, 100000)
        .select((when($"id" % 10 === 0, $"id" % 40).otherwise(lit(0))).as("k"),
          concat(lit("x"), lpad($"id".cast("string"), 32, "0")).as("pad"))
      val dim = s.range(0, 40).select($"id".as("k"), ($"id" * 3).as("v"))

      // global aggregate (not a groupBy on k): an operator downstream that
      // itself required hashpartitioning(k) would legitimately make AQE
      // decline to split — splitting would break that distribution. The
      // max(pad) keeps the wide column flowing through the join shuffle so
      // the hot partition's bytes actually exceed the threshold.
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), max($"v").as("maxv"), max($"pad").as("maxp"))
      val row = joined.collect().head

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"AQE did not split the hot key:\n$plan")

      // correctness unchanged by the split
      assert(row.getLong(0) == 100000L) // every fact key exists in dim
      assert(row.getLong(1) == 30L * 3) // fact keys are multiples of 10 below 40
    } finally restore.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
