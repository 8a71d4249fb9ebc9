package graft

import graft.queries.Sessions

/** events_hits_scores: the distributed integer HITS rounds must equal a
  * driver-side replay over the same directed edge set, and the score
  * semantics must hold (normalization, zero-in/out-degree nodes). */
class HitsSpec extends SparkSpec {

  private lazy val rows =
    Sessions.hitsScores(spark, SparkSpec.fixtureSf).collect()

  private lazy val reference: Map[Long, (Long, Long)] = {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    val ev = spark.table("ek")
      .select($"user_id", $"seq", $"event_type",
        ($"btime" + ($"seq" % 8) * 15).as("t"))
      .as[(Long, Long, String, Long)].collect()
    val purchases = ev.collect { case (u, _, "purchase", t) => (u, t) }
    val clicks = ev.collect { case (u, _, "click", t) => (u, t) }
    val edges = scala.collection.mutable.Set[(Long, Long)]()
    for ((pu, pt) <- purchases; (cu, ct) <- clicks)
      if (cu != pu && ct >= pt + 1 && ct <= pt + 240) edges += ((pu, cu))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val S = 1000000L
    var a = nodes.map(_ -> BigInt(S)).toMap
    var h = nodes.map(_ -> BigInt(S)).toMap
    for (_ <- 1 to 4) {
      // iterator, not Set.map: mapping a Set to scores would DEDUP equal
      // contributions before the sum
      val aRaw = nodes.map(n =>
        n -> edges.iterator.filter(_._2 == n).map(e => h(e._1)).sum).toMap
      val am = aRaw.values.max
      a = aRaw.map { case (n, r) => n -> (if (am == 0) BigInt(0) else r * S / am) }
      val hRaw = nodes.map(n =>
        n -> edges.iterator.filter(_._1 == n).map(e => a(e._2)).sum).toMap
      val hm = hRaw.values.max
      h = hRaw.map { case (n, r) => n -> (if (hm == 0) BigInt(0) else r * S / hm) }
    }
    nodes.map(n => n -> (a(n).toLong, h(n).toLong)).toMap
  }

  test("authority and hub scores match the driver-side replay") {
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("user_id")).toSet == reference.keySet)
    rows.foreach { r =>
      val (ea, eh) = reference(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("authority_e6") == ea, s"authority of ${r.getAs[Long]("user_id")}")
      assert(r.getAs[Long]("hub_e6") == eh, s"hub of ${r.getAs[Long]("user_id")}")
    }
  }

  test("scores are L-inf normalized and the two sides genuinely differ") {
    assert(rows.map(_.getAs[Long]("authority_e6")).max == 1000000L)
    assert(rows.map(_.getAs[Long]("hub_e6")).max == 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("authority_e6") >= 0 && r.getAs[Long]("authority_e6") <= 1000000L)
      assert(r.getAs[Long]("hub_e6") >= 0 && r.getAs[Long]("hub_e6") <= 1000000L)
    }
    // HITS is only worth shipping if hubs and authorities rank differently
    val byAuth = rows.sortBy(r => (-r.getAs[Long]("authority_e6"), r.getAs[Long]("user_id")))
      .map(_.getAs[Long]("user_id")).take(5).toSeq
    val byHub = rows.sortBy(r => (-r.getAs[Long]("hub_e6"), r.getAs[Long]("user_id")))
      .map(_.getAs[Long]("user_id")).take(5).toSeq
    assert(byAuth != byHub, "degenerate fixture: identical top-5 hubs and authorities")
  }
}
