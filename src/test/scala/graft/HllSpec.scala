package graft

import graft.queries.Sessions

/** events_distinct_hll: estimation quality within the published error
  * bound, and the union-composability (register-wise MAX merge) that makes
  * the sketch a sketch. */
class HllSpec extends SparkSpec {

  private lazy val rows =
    Sessions.distinctHll(spark, SparkSpec.fixtureSf).collect()

  test("raw estimate lands within the published error envelope") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      val ratio = r.getAs[Double]("est_over_exact")
      // 1.04/sqrt(256) = 6.5% std error; 4 sigma slack, plus small-range
      // bias (the raw estimator overestimates below ~3m — that is what
      // the v_zero column is for)
      if (exact >= 100)
        assert(math.abs(ratio - 1.0) < 0.3,
          s"${r.getAs[String]("event_type")}: est/exact $ratio (exact $exact)")
      assert(r.getAs[Long]("s2") >= 256L, "each register contributes >= 1")
      assert(r.getAs[Long]("v_zero") >= 0L && r.getAs[Long]("v_zero") <= 256L)
    }
  }

  test("registers merge by MAX: sketch(all) == merge(sketch(half1), sketch(half2))") {
    // driver-side replay of the register construction over a split corpus
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    val users = spark.table("raw")
      .filter($"event_type".isNotNull && $"user_id".isNotNull)
      .select($"event_type", $"user_id").as[(String, Long)].collect()
    def regsOf(rows: Seq[(String, Long)]): Map[(String, Long), Long] =
      rows.groupBy(identity).keys.toSeq // dedup exact pairs is a no-op for HLL but cheap
        .map { case (t, u) =>
          val h = ((u % 2147483648L) * 2654435761L) % 4294967296L
          val w = h / 256
          val rho = if (w == 0) 25L else 25L - java.lang.Long.toBinaryString(w).length
          ((t, h % 256), rho)
        }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    val (h1, h2) = users.partition(_._2 % 2 == 0)
    val all = regsOf(users.toSeq)
    val merged = (regsOf(h1.toSeq).toSeq ++ regsOf(h2.toSeq).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(all == merged)
  }
}
