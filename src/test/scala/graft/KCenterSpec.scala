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

  private val sfDir = SparkSpec.fixtureSf

  /** The same strict left fold as graft_dot. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def fixturePoints(dir: String): Array[(Long, Array[Float])] = {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, dir)
    s.table("embeddings").select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
  }

  private def bruteGreedy(raw: Seq[(Long, Array[Float])], k: Int): Vector[(Long, Double)] = {
    val pts = raw
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
    val want = bruteGreedy(fixturePoints(sfDir), 8)
    assert(got.size == want.size, s"expected ${want.size} centers, got ${got.size}")
    got.zip(want).zipWithIndex.foreach { case (((r, id, rad), (wid, wrad)), i) =>
      assert(r == i + 1)
      assert(id == wid, s"round ${i + 1}: picked $id, brute force picked $wid")
      assert(math.abs(rad - BigDecimal(wrad).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"round ${i + 1}: radius $rad vs brute ${wrad}")
    }
  }

  test("randomized embeddings: selection equals the driver replay on seeded point sets") {
    // clustered points + exact duplicates + a zero vector exercise the
    // tie-breaks, the dup-exclusion (mind2 > 0) and the norm guard on
    // inputs the fixture never produces; three seeded sets
    val s = spark
    import s.implicits._
    for (seed <- Seq(5, 23, 71)) {
      val rnd = new scala.util.Random(seed)
      val base = (0 until 40).map(i => (0 until 8).map(d =>
        (math.sin(i * 31 + d * 7) + rnd.nextGaussian() * 0.1).toFloat).toArray)
      val rows: Seq[(Long, Array[Float], Int)] = (0L until 40L).map {
        case 7L  => (7L, Array.fill(8)(0f), 0)  // zero vector: guarded out
        case 13L => (13L, base(1).clone, 0)     // exact duplicate of vec 1
        case i   => (i, base(i.toInt), 0)
      }
      val dir = SparkSpec.fixtureDirExcept("embeddings")
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(dir.resolve("embeddings.parquet").toString)

      val got = Similarity.kcenterSelect(s, dir.toString)
        .orderBy($"round")
        .select($"center_id", $"radius2").as[(Long, Double)].collect().toVector
      val want = bruteGreedy(rows.map(r => (r._1, r._2)), 8)
      assert(got.map(_._1) === want.map(_._1), s"seed $seed: $got vs $want")
      got.zip(want).zipWithIndex.foreach { case (((_, rad), (_, wrad)), i) =>
        assert(math.abs(rad - BigDecimal(wrad)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"seed $seed round ${i + 1}: radius $rad vs brute $wrad")
      }
      graft.util.Memo.release(s, dir.toString)
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
