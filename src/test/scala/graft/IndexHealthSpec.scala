package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dbscan, IndexHealth}

/** The IVF health report. The oracle pins engine agreement; this spec pins
  * what the numbers mean:
  *
  *  1. attachment optimality — every vector's cosine to its OWN centroid
  *     is the maximum over all centroids (the report monitors real
  *     assignments, so this re-proves the quantizer's argmax end-to-end
  *     through the persisted artifact);
  *  2. per-cell stats are a consistent partition of the corpus
  *     (populations sum, min ≤ mean ≤ max, cosines in [−1, 1] micro-units).
  */
class IndexHealthSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  test("attachment optimality: own centroid maximizes cosine") {
    val s = spark
    import s.implicits._
    val in = Dbscan.inputs(s, sfDir)
      .select($"vec_id", $"embedding", $"norm_sq", $"cell")
      .as[(Long, Array[Float], Double, Long)].collect()
    var stride = 1L
    while ((stride * 2) * (stride * 2) <= in.length) stride *= 2
    val cents = in.filter(r => r._1 % stride == 3 % stride)
    assert(cents.nonEmpty)
    in.foreach { case (v, e, n, cell) =>
      val cos = cents.map { c =>
        c._1 -> dot(e, c._2) / (math.sqrt(n) * math.sqrt(c._3))
      }.toMap
      val own = cos(cell)
      cos.foreach { case (cid, c) =>
        assert(own >= c || (own == c && cell <= cid),
          s"vec $v: centroid $cid cos $c beats own $cell cos $own")
      }
    }
  }

  test("per-cell stats partition the corpus consistently") {
    val s = spark
    import s.implicits._
    val rows = IndexHealth.ivfHealth(s, sfDir)
      .select($"cell", $"n_vectors", $"mean_cos_e6", $"min_cos_e6", $"max_cos_e6")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val n = Dbscan.inputs(s, sfDir).count()
    assert(rows.map(_._2).sum == n, "cell populations must sum to the corpus")
    rows.foreach { case (cell, nv, mean, mn, mx) =>
      assert(nv >= 1)
      assert(mn <= mean && mean <= mx, s"cell $cell stats out of order")
      assert(mn >= -1000000L && mx <= 1000000L, s"cell $cell cosine range")
    }
  }
}
