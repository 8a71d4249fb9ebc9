package graft

import graft.queries.StreamReplay
import graft.streaming.{StreamingCms, StreamingKmv}

/** The document-fed replay entries (streaming_cms_replay /
  * streaming_kmv_replay): the final streaming state surfaced through the
  * catalog must equal a driver-side recomputation from the operators' own
  * primitives — an independent path (JVM counter loops / TreeSet merge vs
  * the distributed flatMapGroupsWithState pipeline plus the final-state
  * argmax selection). */
class StreamReplaySpec extends SparkSpec {

  private def docs: Seq[(String, String)] = {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    spark.table("documents").select($"lang", $"text")
      .as[(String, String)].collect().toSeq
  }

  test("cms replay equals driver-side per-snapshot counters") {
    val probes = Seq("the", "key", "order", "sort", "batch", "window",
      "hash", "stream", "spark", "scan", "merge", "zzz_absent_zzz")
    val counters = scala.collection.mutable.Map[String, Array[Long]]()
    docs.foreach { case (lang, text) =>
      val c = counters.getOrElseUpdate(lang,
        new Array[Long](StreamingCms.D * StreamingCms.W))
      text.split(" ", -1).foreach { w =>
        val wh = StreamingCms.wordHash(w)
        for (i <- 0 until StreamingCms.D)
          c(i * StreamingCms.W + StreamingCms.bucket(wh, i)) += 1
      }
    }
    val rows = StreamReplay.cmsReplay(spark, SparkSpec.fixtureSf).collect()
    assert(rows.length == counters.size * probes.size)
    rows.foreach { r =>
      val expected = StreamingCms.estimate(
        counters(r.getAs[String]("lang")), r.getAs[String]("word"))
      assert(r.getAs[Long]("cm_estimate") == expected,
        s"${r.getAs[String]("lang")}/${r.getAs[String]("word")}")
    }
  }

  test("funnel replay histogram equals the batch funnel") {
    val streamed = StreamReplay.funnelReplay(spark, SparkSpec.fixtureSf).collect()
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
    val batch = graft.queries.Sessions.funnel(spark, SparkSpec.fixtureSf).collect()
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(streamed == batch)
  }

  test("dedup replay verdicts equal the min-id-per-content election") {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    val bySha = spark.table("documents").select($"doc_id", $"text")
      .as[(Long, String)].collect()
      .groupBy(d => graft.streaming.StreamingDedup.textSha(d._2))
      .map { case (_, ds) => ds.map(_._1).toSet -> ds.map(_._1).min }
    val expected = bySha.flatMap { case (ids, canon) => ids.map(_ -> canon) }
    val got = StreamReplay.dedupReplay(spark, SparkSpec.fixtureSf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("canonical_doc_id") == expected(id), s"canonical of $id")
      assert(r.getAs[Boolean]("is_duplicate") == (id != expected(id)))
    }
  }

  test("kmv replay equals driver-side per-snapshot sketch merge") {
    val k = 256
    val sets = scala.collection.mutable.Map[String, java.util.TreeSet[java.lang.Long]]()
    docs.foreach { case (lang, text) =>
      val set = sets.getOrElseUpdate(lang, new java.util.TreeSet[java.lang.Long]())
      StreamingKmv.docSketch(text, k).foreach { h =>
        if (set.size < k || h < set.last) {
          set.add(h)
          if (set.size > k) set.pollLast()
        }
      }
    }
    val rows = StreamReplay.kmvReplay(spark, SparkSpec.fixtureSf).collect()
    val nonEmpty = sets.filter(_._2.size > 0)
    assert(rows.length == nonEmpty.size)
    rows.foreach { r =>
      val set = sets(r.getAs[String]("lang"))
      val sketch = {
        val a = new Array[Long](set.size)
        val it = set.iterator(); var i = 0
        while (it.hasNext) { a(i) = it.next().longValue(); i += 1 }
        a
      }
      val est = StreamingKmv.estimate(sketch, k)
      assert(r.getAs[Long]("k_eff") == est.k_eff, s"k_eff of ${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("tau") == est.tau, s"tau of ${r.getAs[String]("lang")}")
      assert(math.abs(r.getAs[Double]("est_distinct") -
        BigDecimal(est.est_distinct).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"estimate of ${r.getAs[String]("lang")}")
    }
  }

  test("anomaly replay flags exactly the prefix-scored events") {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    // independent path: driver loop over per-user seq-ordered events with
    // the operator's own double arithmetic
    val byUser = spark.table("raw")
      .filter($"user_id".isNotNull && $"cents".isNotNull)
      .select($"user_id", $"seq", $"cents")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expected = byUser.toSeq.flatMap { case (u, evs) =>
      var (n, s, s2) = (0L, 0L, 0L)
      evs.toIndexedSeq.flatMap { case (_, seq, c) =>
        val out =
          if (n >= graft.streaming.StreamingAnomaly.minN) {
            val num = c.toDouble * n - s.toDouble
            val den = math.sqrt((n.toDouble * s2) - (s.toDouble * s))
            if (den > 0 && math.abs(num / den) >= 3.0)
              Some((u, seq, c, math.rint(num / den * 1e6) / 1e6))
            else None
          } else None
        n += 1; s += c; s2 += c * c
        out
      }
    }.toSet
    val got = StreamReplay.anomalyReplay(spark, SparkSpec.fixtureSf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("seq"),
        r.getAs[Long]("cents"), r.getAs[Double]("z"))).toSet
    assert(got == expected, s"got ${got.size} vs expected ${expected.size}")
  }

  test("sessions replay emission equals batch gap sessionization, totally flushed") {
    graft.fixtures.Fixtures.register(spark, SparkSpec.fixtureSf)
    import spark.implicits._
    val batch = graft.queries.Sessions.sessionize(spark, SparkSpec.fixtureSf)
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"total_cents")
      .collect().map(_.toSeq).toSet
    val got = StreamReplay.sessionsReplay(spark, SparkSpec.fixtureSf)
      .collect().map(_.toSeq).toSet
    // the watermark sentinel must have flushed EVERY session — equality,
    // not subset
    assert(got == batch,
      s"streaming emitted ${got.size} sessions vs batch ${batch.size}")
  }
}
