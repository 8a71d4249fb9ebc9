package graft

import org.apache.spark.sql.functions._

import graft.queries.Sessions

/** Large-star/small-star connected components. The oracle pins the full
  * component partition against recursive reachability; this spec pins:
  *
  *  1. the emitted partition equals a driver-side union-find over the same
  *     edge frame (labels = component minima);
  *  2. the output is a consistent component report: one canon per
  *     component, canon = min member, sizes consistent;
  *  3. the fixture is non-trivial (several components, at least one of
  *     size > 2 — path contraction actually exercised).
  */
class CcBigstarSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min-root by construction: we always parent the larger root under the
    // smaller, so find() lands on the component minimum
    nodes.map(n => n -> find(n)).toMap
  }

  test("partition equals a driver-side union-find; labels are minima") {
    val s = spark
    import s.implicits._
    val edges = Sessions.ccEdges(s, sfDir)
      .select($"u", $"v").as[(Long, Long)].collect().toSeq
    val want = unionFind(edges)
    val got = Sessions.ccBigstar(s, sfDir)
      .select($"user_id", $"component", $"component_size", $"role")
      .as[(Long, Long, Long, String)].collect()
    assert(got.length == want.size, s"${got.length} nodes vs ${want.size}")
    val wantSizes = want.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (n, c, sz, role) =>
      assert(want(n) == c, s"node $n: component $c vs ${want(n)}")
      assert(sz == wantSizes(c), s"component $c size")
      assert(role == (if (n == c) "canon" else "member"))
    }
  }

  test("component report is internally consistent") {
    val s = spark
    import s.implicits._
    val rows = Sessions.ccBigstar(s, sfDir)
      .select($"user_id", $"component", $"component_size", $"role")
      .as[(Long, Long, Long, String)].collect()
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.count(_._4 == "canon") == 1, s"component $c canon count")
      assert(c == members.map(_._1).min, s"component $c label is not the min")
      assert(members.forall(_._3 == members.length.toLong), s"component $c sizes")
    }
  }

  test("path contraction: a 64-node chain and parallel chains converge to minima") {
    val s = spark
    import s.implicits._
    // three structures in one graph: a long chain (worst case for min-label
    // propagation — diameter 63), a chain rooted high (tests that labels
    // travel DOWN to the min, not just up), and a 3-clique island
    val chain = (100L until 163L).map(i => (i, i + 1))
    val chain2 = (300L until 316L).map(i => (i + 1, i)).map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    val clique = Seq((500L, 501L), (500L, 502L), (501L, 502L))
    val edges = (chain ++ chain2 ++ clique).toDF("u", "v")
    val got = Sessions.starContract(s, edges)
      .select($"user_id", $"component").as[(Long, Long)].collect().toMap
    (100L to 163L).foreach(n => assert(got(n) == 100L, s"chain node $n"))
    (300L to 316L).foreach(n => assert(got(n) == 300L, s"chain2 node $n"))
    Seq(500L, 501L, 502L).foreach(n => assert(got(n) == 500L, s"clique node $n"))
    assert(got.size == 64 + 17 + 3)
  }
}
