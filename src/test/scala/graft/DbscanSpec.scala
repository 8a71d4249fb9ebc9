package graft

import org.apache.spark.sql.functions._

import graft.queries.Dbscan

/** Cell-blocked DBSCAN. The oracle pins engine agreement; this spec pins
  * that the pipeline implements the KDD'96 semantics on the blocked
  * ε-graph:
  *
  *  1. the full per-vector verdict (role, cluster, degree) equals a
  *     driver-side replay from the same inputs — edges by the exact
  *     integer-free-but-deterministic (dot·dot)·16 ≥ na·nb rule, cores by
  *     minPts, clusters by true connected components, borders by minimum
  *     core-neighbor label;
  *  2. the emitted labels are a fixpoint: no core-core ε-edge crosses two
  *     clusters (the convergence loop really converged);
  *  3. cluster ids are canonical: each equals the minimum core vec_id of
  *     its component, borders never invent labels;
  *  4. the fixture is non-degenerate — all three roles and several
  *     clusters — so every branch of the operator is exercised;
  *  5. the census entry is exactly the verdict's group-by.
  */
class DbscanSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Driver replay: vec_id -> (role, cluster, degree); plus the core-core
    * edge list for the fixpoint check. */
  private def brute(): (Map[Long, (String, Long, Long)], Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    val in = Dbscan.inputs(s, sfDir)
      .select($"vec_id", $"embedding", $"norm_sq", $"cell")
      .as[(Long, Array[Float], Double, Long)].collect().sortBy(_._1)

    val edges = for {
      i <- in.indices
      j <- (i + 1) until in.length
      if in(i)._4 == in(j)._4
      d = dot(in(i)._2, in(j)._2)
      if d > 0 && (d * d) * 16 >= in(i)._3 * in(j)._3
    } yield (in(i)._1, in(j)._1)

    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val core = in.map(_._1).filter(v => deg.getOrElse(v, 0L) >= 3).toSet

    val ceAdj = edges.filter(e => core(e._1) && core(e._2))
      .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val label = scala.collection.mutable.Map[Long, Long]()
    core.toSeq.sorted.foreach { v =>
      if (!label.contains(v)) {
        // BFS the component, label everyone with the component min
        val seen = scala.collection.mutable.Set(v)
        val stack = scala.collection.mutable.Stack(v)
        while (stack.nonEmpty) {
          val x = stack.pop()
          ceAdj.getOrElse(x, Seq.empty).foreach { y =>
            if (!seen(y)) { seen += y; stack.push(y) }
          }
        }
        val lab = seen.min
        seen.foreach(x => label(x) = lab)
      }
    }

    val borderOf = edges
      .flatMap { case (a, b) =>
        Seq(a -> b, b -> a).collect {
          case (v, u) if !core(v) && core(u) => v -> label(u)
        }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap

    val verdict = in.map { case (v, _, _, _) =>
      if (core(v)) v -> (("core", label(v), deg.getOrElse(v, 0L)))
      else borderOf.get(v) match {
        case Some(c) => v -> (("border", c, deg.getOrElse(v, 0L)))
        case None => v -> (("noise", -1L, deg.getOrElse(v, 0L)))
      }
    }.toMap
    (verdict, edges.filter(e => core(e._1) && core(e._2)))
  }

  test("per-vector verdict equals the driver-side KDD'96 replay") {
    val s = spark
    import s.implicits._
    val (want, _) = brute()
    val got = Dbscan.clusters(s, sfDir)
      .select($"vec_id", $"role", $"cluster", $"n_neighbors")
      .as[(Long, String, Long, Long)].collect()
    assert(got.length == want.size, s"${got.length} rows vs ${want.size}")
    got.foreach { case (v, r, c, d) =>
      assert(want(v) == ((r, c, d)), s"vec $v: ($r,$c,$d) vs ${want(v)}")
    }
  }

  test("labels are a fixpoint: no core-core edge crosses clusters") {
    val s = spark
    import s.implicits._
    val (_, coreEdges) = brute()
    val cl = Dbscan.clusters(s, sfDir)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    assert(coreEdges.nonEmpty)
    coreEdges.foreach { case (a, b) =>
      assert(cl(a) == cl(b), s"edge ($a,$b) crosses ${cl(a)} vs ${cl(b)}")
    }
  }

  test("cluster ids are canonical minima; borders never invent labels") {
    val s = spark
    import s.implicits._
    val rows = Dbscan.clusters(s, sfDir)
      .select($"vec_id", $"role", $"cluster")
      .as[(Long, String, Long)].collect()
    val coreByCluster = rows.filter(_._2 == "core").groupBy(_._3)
    coreByCluster.foreach { case (c, members) =>
      assert(c == members.map(_._1).min, s"cluster $c is not its min core id")
    }
    val coreClusters = coreByCluster.keySet
    rows.filter(_._2 == "border").foreach { case (v, _, c) =>
      assert(coreClusters(c), s"border $v points at non-core cluster $c")
    }
    rows.filter(_._2 == "noise").foreach { case (v, _, c) =>
      assert(c == -1L, s"noise $v carries cluster $c")
    }
  }

  test("the fixture is non-degenerate: all roles, several clusters") {
    val s = spark
    import s.implicits._
    val rows = Dbscan.clusters(s, sfDir)
      .select($"role", $"cluster").as[(String, Long)].collect()
    assert(rows.count(_._1 == "core") > 10)
    assert(rows.count(_._1 == "border") > 10)
    assert(rows.count(_._1 == "noise") > 10)
    assert(rows.filter(_._1 == "core").map(_._2).distinct.length >= 5)
  }

  test("ε-curve equals a per-rung replay and is monotone in the threshold") {
    val s = spark
    import s.implicits._
    val in = Dbscan.inputs(s, sfDir)
      .select($"vec_id", $"embedding", $"norm_sq", $"cell")
      .as[(Long, Array[Float], Double, Long)].collect().sortBy(_._1)
    val rungs = Seq((1250L, 1d, 64d), (2500L, 1d, 16d), (3750L, 9d, 64d))
    val want = rungs.map { case (bp, num, den) =>
      val edges = for {
        i <- in.indices
        j <- (i + 1) until in.length
        if in(i)._4 == in(j)._4
        d = dot(in(i)._2, in(j)._2)
        if d > 0 && (d * d) * den >= (in(i)._3 * in(j)._3) * num
      } yield (in(i)._1, in(j)._1)
      val deg = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val core = in.map(_._1).filter(v => deg.getOrElse(v, 0) >= 3).toSet
      val border = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .collect { case (v, u) if !core(v) && core(u) => v }.toSet
      bp -> ((edges.length.toLong, core.size.toLong, border.size.toLong,
        in.length.toLong - core.size - border.size))
    }.toMap
    val got = Dbscan.curve(s, sfDir)
      .select($"theta_bp", $"n_edges", $"n_core", $"n_border", $"n_noise")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 3)
    got.foreach { case (bp, e, c, b, n) =>
      assert(want(bp) == ((e, c, b, n)), s"rung $bp: ${(e, c, b, n)} vs ${want(bp)}")
    }
    val byBp = got.sortBy(_._1)
    byBp.zip(byBp.tail).foreach { case (lo, hi) =>
      assert(lo._2 >= hi._2, "edges must shrink as the threshold tightens")
      assert(lo._3 >= hi._3, "cores must shrink as the threshold tightens")
      assert(lo._5 <= hi._5, "noise must grow as the threshold tightens")
    }
  }

  test("census equals the verdict's group-by") {
    val s = spark
    import s.implicits._
    val rows = Dbscan.clusters(s, sfDir)
      .select($"vec_id", $"role", $"cluster")
      .as[(Long, String, Long)].collect()
    val want = rows.groupBy(_._3).view.mapValues { ms =>
      (ms.length.toLong, ms.count(_._2 == "core").toLong,
        ms.count(_._2 == "border").toLong)
    }.toMap
    val got = Dbscan.stats(s, sfDir)
      .select($"cluster", $"n_total", $"n_core", $"n_border")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (c, t, nc, nb) =>
      assert(want(c) == ((t, nc, nb)), s"cluster $c: ($t,$nc,$nb) vs ${want(c)}")
    }
  }
}
