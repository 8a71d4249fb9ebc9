package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Greedy k-center coreset (Gonzalez farthest-point traversal). The oracle
  * hash-match proves Spark and DuckDB agree on the UNROLLED plan; this spec
  * proves the plan implements the greedy algorithm itself: the selection
  * sequence equals an independent driver-side traversal, the coverage radius
  * is non-increasing (the greedy 2-approximation certificate), and the final
  * assignment partitions the corpus.
  */
class KCenterSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The same strict left fold as graft_dot. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def bruteGreedy(k: Int): Vector[(Long, Double)] = {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, sfDir)
    val pts = s.table("embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => (id, e, dot(e, e)) }
      .filter { case (_, _, n2) => n2 > 0 && !n2.isNaN && n2 < Double.PositiveInfinity }
      .sortBy(_._1)

    val seed = pts.head
    var sel = Vector((seed._1, 0.0))
    val mind2 = scala.collection.mutable.Map(
      pts.map(p => p._1 -> (p._3 + seed._3 - 2 * dot(p._2, seed._2))): _*)
    for (_ <- 2 to k) {
      // argmax of mind2 with ties to the SMALLEST vec_id, skipping dups
      val cands = pts.filter(p => mind2(p._1) > 0)
      if (cands.nonEmpty) {
        val best = cands.minBy(p => (-mind2(p._1), p._1))
        sel = sel :+ (best._1 -> mind2(best._1))
        pts.foreach { p =>
          val d2 = p._3 + best._3 - 2 * dot(p._2, best._2)
          if (d2 < mind2(p._1)) mind2(p._1) = d2
        }
      }
    }
    sel
  }

  test("selection sequence equals an independent driver-side greedy traversal") {
    val s = spark
    import s.implicits._
    val got = Similarity.kcenterSelect(s, sfDir)
      .orderBy($"round")
      .select($"round", $"center_id", $"radius2")
      .as[(Long, Long, Double)].collect().toVector
    val want = bruteGreedy(8)
    assert(got.size == want.size, s"expected ${want.size} centers, got ${got.size}")
    got.zip(want).zipWithIndex.foreach { case (((r, id, rad), (wid, wrad)), i) =>
      assert(r == i + 1)
      assert(id == wid, s"round ${i + 1}: picked $id, brute force picked $wid")
      assert(math.abs(rad - BigDecimal(wrad).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"round ${i + 1}: radius $rad vs brute ${wrad}")
    }
  }

  test("coverage radius is non-increasing and the assignment partitions the corpus") {
    val s = spark
    import s.implicits._
    val rows = Similarity.kcenterSelect(s, sfDir)
      .orderBy($"round")
      .select($"round", $"center_id", $"radius2", $"covered")
      .as[(Long, Long, Double, Long)].collect()

    val radii = rows.drop(1).map(_._3) // round 1 is the seed, radius 0 by definition
    radii.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"greedy invariant violated: $a then $b")
      case _ =>
    }
    assert(rows.map(_._2).distinct.length == rows.length, "centers must be distinct")

    // the SAME triple guard as the operator's index boundary (vecs):
    // NaN > 0 is TRUE under Spark's ordering and +Inf passes a plain
    // positivity check, so either leg alone over-counts
    val n = s.table("embeddings")
      .filter(expr("""graft_dot(embedding, embedding) > 0
                      AND NOT isnan(graft_dot(embedding, embedding))
                      AND graft_dot(embedding, embedding) < double('Infinity')"""))
      .count()
    assert(rows.map(_._4).sum == n,
      s"coverage must partition the ${n} valid points, got ${rows.map(_._4).sum}")
  }
}
