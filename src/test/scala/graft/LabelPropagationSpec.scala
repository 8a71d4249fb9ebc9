package graft

import graft.queries.Sessions

/** events_label_propagation: the distributed 4-round synchronous LPA must
  * equal a driver-side replay over the same edge set (independent path:
  * JVM hash maps vs the join/aggregate rounds), and community bookkeeping
  * must be consistent. */
class LabelPropagationSpec extends SparkSpec {

  private lazy val rows =
    Sessions.labelPropagation(spark, SparkSpec.fixtureSf).collect()

  private lazy val referenceLabels: Map[Long, Long] = {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    val ev = spark.table("ek")
      .select($"user_id", $"seq", $"event_type",
        ($"btime" + ($"seq" % 8) * 15).as("t"))
      .as[(Long, Long, String, Long)].collect()
    val purchases = ev.collect { case (u, _, "purchase", t) => (u, t) }
    val clicks = ev.collect { case (u, _, "click", t) => (u, t) }
    val und = scala.collection.mutable.Set[(Long, Long)]()
    for ((pu, pt) <- purchases; (cu, ct) <- clicks)
      if (cu != pu && ct >= pt + 1 && ct <= pt + 240)
        und += ((math.min(pu, cu), math.max(pu, cu)))
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    for ((u, v) <- und) { adj(u) ::= v; adj(v) ::= u }
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(labels).map { case (l, xs) => (l, xs.size) }
        // max count, ties to the SMALLEST label
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    labels
  }

  test("final labels match the driver-side synchronous replay") {
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("user_id")).toSet == referenceLabels.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("community") == referenceLabels(r.getAs[Long]("user_id")),
        s"label of ${r.getAs[Long]("user_id")}")
    }
  }

  test("community sizes partition the node set and communities are non-trivial") {
    val byCommunity = rows.groupBy(_.getAs[Long]("community"))
    byCommunity.foreach { case (c, members) =>
      members.foreach(r => assert(r.getAs[Long]("community_size") == members.length.toLong,
        s"size of community $c"))
    }
    assert(byCommunity.values.map(_.length).sum == rows.length)
    // the fixture graph must actually coalesce: fewer communities than nodes
    assert(byCommunity.size < rows.length)
  }
}
