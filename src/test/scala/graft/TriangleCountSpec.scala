package graft

import graft.queries.Sessions

/** events_triangle_count: the degree-oriented distributed enumeration must
  * equal a driver-side adjacency-set recomputation (an independent path —
  * JVM hash sets vs the three-way oriented join), and the per-node credit
  * and clustering-coefficient arithmetic must satisfy their invariants. */
class TriangleCountSpec extends SparkSpec {

  private lazy val rows =
    Sessions.triangleCount(spark, SparkSpec.fixtureSf).collect()

  /** Driver-side reference: rebuild the influence edge set with plain
    * loops (same window arithmetic, no BinnedRange), then count triangles
    * per node via common-neighbor intersection over adjacency sets. */
  private lazy val reference: (Map[Long, Int], Map[Long, Int]) = {
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
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    for ((u, v) <- und) { adj(u) += v; adj(v) += u }
    val tri = scala.collection.mutable.Map[Long, Int]().withDefaultValue(0)
    for ((u, v) <- und; w <- adj(u) intersect adj(v)) {
      // each triangle is visited once per edge = 3 times total, crediting
      // its opposite corner each time — so per-node credits come out exact
      tri(w) += 1
    }
    (adj.map { case (n, s) => n -> s.size }.toMap, tri.toMap)
  }

  test("per-node degrees and triangle counts match the driver-side reference") {
    val (refDeg, refTri) = reference
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("user_id")).toSet == refDeg.keySet)
    rows.foreach { r =>
      val n = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("degree") == refDeg(n).toLong, s"degree of $n")
      assert(r.getAs[Long]("n_triangles") == refTri.getOrElse(n, 0).toLong,
        s"triangles of $n")
    }
  }

  test("total credit is 3x the triangle count and lcc stays in [0, 10000]") {
    val (_, refTri) = reference
    val total = rows.map(_.getAs[Long]("n_triangles")).sum
    assert(total == refTri.values.map(_.toLong).sum)
    assert(total % 3 == 0, "every triangle credits exactly 3 corners")
    rows.foreach { r =>
      val lcc = r.getAs[Long]("lcc_bp")
      assert(lcc >= 0 && lcc <= 10000, s"lcc_bp $lcc out of range")
      if (r.getAs[Long]("degree") < 2) assert(lcc == 0)
    }
  }
}
