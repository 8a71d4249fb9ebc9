package graft

import graft.queries.Sessions

/** events_markov_transitions: the transition matrix must equal a
  * driver-side recount over per-user ordered sequences, and each row of
  * the matrix must be a probability distribution up to floor loss. */
class MarkovSpec extends SparkSpec {

  private lazy val rows =
    Sessions.markovTransitions(spark, SparkSpec.fixtureSf).collect()

  test("transition counts match a driver-side sequence recount") {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    val seqs = spark.table("raw")
      .filter($"event_type".isNotNull && $"user_id".isNotNull)
      .select($"user_id", $"seq", $"event_type")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1)
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    seqs.values.foreach { evs =>
      evs.sortBy(_._2).map(_._3).toList.sliding(2).foreach {
        case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _         =>
      }
    }
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")))
      .toSet == counts.keySet)
    rows.foreach { r =>
      val k = (r.getAs[String]("prev_type"), r.getAs[String]("next_type"))
      assert(r.getAs[Long]("n") == counts(k), s"count of $k")
    }
  }

  test("each row of the matrix is a distribution up to floor loss") {
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (p, ts) =>
      val total = ts.map(_.getAs[Long]("p_bp")).sum
      assert(total <= 10000L && total > 10000L - ts.length,
        s"row $p sums to $total bp over ${ts.length} cells")
    }
  }
}
