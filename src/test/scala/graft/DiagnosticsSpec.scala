package graft

import graft.queries.{Classifier, Diagnostics}

/** Physical-design diagnostics + the calibration table: driver-side
  * replays of the exact integer definitions, and the layout punchline
  * (z-order prunes user probes, natural order doesn't) as an assertion. */
class DiagnosticsSpec extends SparkSpec {

  private val sf = SparkSpec.fixtureSf

  test("key skew report matches a driver-side replay per key") {
    val rows = Diagnostics.keySkew(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("user_id", "event_type", "pool_id", "block_number"))

    graft.fixtures.Fixtures.register(spark, sf)
    for ((key, r) <- rows) {
      val counts = spark.table("ek").groupBy(key).count()
        .collect().map(_.getLong(1)).sorted
      val nRows = counts.sum
      val nKeys = counts.length.toLong
      val maxR = counts.max
      val mean = nRows / nKeys
      // smallest count c with #{keys: count <= c} covering >= 99% of keys
      val p99 = counts.zipWithIndex
        .collectFirst { case (c, i) if (i + 1) * 100 >= nKeys * 99 => c }.get
      assert(r.getLong(1) === nRows, key)
      assert(r.getLong(2) === nKeys, key)
      assert(r.getLong(3) === maxR, key)
      assert(r.getLong(4) === mean, key)
      assert(r.getLong(5) === p99, key)
      assert(r.getLong(6) === maxR * 10000 / mean, key)
      val expectSalt =
        if (maxR <= 2 * mean) 1L else (maxR + mean - 1) / mean
      assert(r.getLong(7) === expectSalt, key)
    }
  }

  test("skipping stats: z-order prunes user probes, both layouts prune time") {
    val rows = Diagnostics.skippingStats(spark, sf).collect()
    // full grid: 2 layouts x 2 probe kinds x 4 probes
    assert(rows.length === 16)
    def bpSum(layout: String, kind: String): Long = rows
      .filter(r => r.getString(0) == layout && r.getString(1) == kind)
      .map(_.getLong(7)).sum
    rows.foreach { r =>
      assert(r.getLong(6) <= r.getLong(5), "hits cannot exceed blocks")
      assert(r.getLong(6) >= 0L)
    }
    // chain order carries no user locality: every file sees every user
    assert(bpSum("natural", "user_point") === 4 * 10000L)
    // the Morton interleave restores user pruning...
    assert(bpSum("zorder", "user_point") < bpSum("natural", "user_point"))
    // ...without giving up time pruning relative to reading everything
    assert(bpSum("zorder", "time_range") < 4 * 10000L)
    assert(bpSum("natural", "time_range") < 4 * 10000L)
  }

  test("calibration bins partition each model's corpus with exact rates") {
    val rows = Classifier.calibration(spark, sf).collect()
    val scored = Classifier.nbScore(spark, sf).count()
    for (model <- Seq("nb", "percep")) {
      val bins = rows.filter(_.getString(0) == model)
      assert(bins.map(_.getLong(1)).distinct.length === bins.length, model)
      assert(bins.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8), model)
      // every scored document lands in exactly one bin
      assert(bins.map(_.getLong(2)).sum === scored, model)
      bins.foreach { r =>
        assert(r.getLong(3) <= r.getLong(4), "bin min <= max")
        assert(r.getLong(5) <= r.getLong(2), "pos <= n")
        assert(r.getLong(6) === r.getLong(5) * 10000 / r.getLong(2), "exact rate")
      }
    }
    // bin bounds are disjoint and ordered: a calibrator must be a function
    for (model <- Seq("nb", "percep")) {
      val sorted = rows.filter(_.getString(0) == model).sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) < b.getLong(3), model)
        case _ =>
      }
    }
  }
}
