package graft

import org.apache.spark.sql.functions._

import graft.queries.Negatives

/** Hard-negative mining. The oracle pins engine agreement; this spec pins
  * the ANCE-shaped semantics against a driver replay and the structural
  * contract (wrong-label only, cell-local hard negatives, bounded counts,
  * deterministic easy sampling).
  */
class NegativesSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def hash(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 4294967296L

  test("output equals a driver-side replay of both mining arms") {
    val s = spark
    import s.implicits._
    val in = Negatives.inputs(s, sfDir)
      .select($"vec_id", $"embedding", $"norm_sq", $"cell", $"label")
      .as[(Long, Array[Float], Double, Long, Int)].collect().sortBy(_._1)
    val byId = in.map(r => r._1 -> r).toMap
    val queries = in.filter(r => r._1 % 50 == 0 && r._1 < 2500)

    val wantHard = queries.flatMap { q =>
      in.filter(c => c._4 == q._4 && c._1 != q._1 && c._5 != q._5)
        .map(c => (c._1, dot(q._2, c._2) / (math.sqrt(q._3) * math.sqrt(c._3))))
        .sortBy { case (id, c) => (-c, id) }
        .take(3).zipWithIndex
        .map { case ((id, c), i) =>
          (q._1, id, "hard", i + 1L,
            BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toSet
    val pool = in.map(_._1).sortBy(id => (hash(id), id)).take(64)
    val wantEasy = queries.flatMap { q =>
      pool.filter(id => id != q._1 && byId(id)._5 != q._5)
        .sortBy(id => (((id % 2147483648L) * 2654435761L + q._1) % 4294967296L, id))
        .take(3).zipWithIndex
        .map { case (id, i) =>
          val c = byId(id)
          (q._1, id, "easy", i + 1L,
            BigDecimal(dot(q._2, c._2) / (math.sqrt(q._3) * math.sqrt(c._3)))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toSet

    val got = Negatives.hardNegatives(s, sfDir)
      .select($"query_id", $"neg_id", $"kind", $"rank", $"cosine")
      .as[(Long, Long, String, Long, Double)].collect().toSet
    assert(got == wantHard ++ wantEasy,
      s"got minus want: ${(got -- (wantHard ++ wantEasy)).take(3)}; " +
        s"want minus got: ${((wantHard ++ wantEasy) -- got).take(3)}")
    assert(wantHard.nonEmpty && wantEasy.nonEmpty)
  }

  test("structural contract: wrong-label only, bounded per query") {
    val s = spark
    import s.implicits._
    val labels = s.table("embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val rows = Negatives.hardNegatives(s, sfDir)
      .select($"query_id", $"neg_id", $"kind", $"rank")
      .as[(Long, Long, String, Long)].collect()
    rows.foreach { case (q, n, _, r) =>
      assert(labels(q) != labels(n), s"negative $n shares query $q's label")
      assert(r >= 1 && r <= 3)
    }
    rows.groupBy(r => (r._1, r._3)).foreach { case ((q, k), g) =>
      assert(g.length <= 3, s"query $q kind $k overflows")
      assert(g.map(_._4).sorted.toSeq == (1L to g.length).toSeq)
    }
  }
}
