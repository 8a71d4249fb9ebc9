package graft

import graft.queries.Sessions

/** privacy_k_anon: the release-level decision must be exactly the k=8
  * distinct-user gate at each generalization level, and the coarse cell
  * can never report fewer users than any of its fine cells. */
class KAnonymitySpec extends SparkSpec {

  private lazy val rows =
    Sessions.kAnonymity(spark, SparkSpec.fixtureSf).collect()

  test("release levels encode the k=8 gate exactly") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, lvl) = (r.getAs[Long]("n_users"), r.getAs[Long]("coarse_users"),
        r.getAs[Long]("release_level"))
      lvl match {
        case 0 => assert(n >= 8, s"published cell with $n users")
        case 1 => assert(n < 8 && c >= 8, s"coarsened cell with ($n, $c)")
        case 2 => assert(n < 8 && c < 8, s"suppressed cell with ($n, $c)")
        case other => fail(s"unknown release level $other")
      }
      assert(c >= n, "coarse cell contains its fine cells' users")
      assert(r.getAs[Long]("n_records") >= n, "records >= distinct users")
    }
  }

  test("the fixture exercises all three release levels") {
    val levels = rows.map(_.getAs[Long]("release_level")).toSet
    assert(levels == Set(0L, 1L, 2L),
      s"degenerate fixture: only levels $levels present")
  }

  test("l-diversity: publish requires BOTH gates; homogeneity bound holds") {
    val s = spark
    import org.apache.spark.sql.functions._
    val ld = graft.queries.Sessions.lDiversity(s, SparkSpec.fixtureSf).collect()
    assert(ld.nonEmpty)
    ld.foreach { r =>
      val (nRec, nUsers, nTypes) = (r.getAs[Long]("n_records"),
        r.getAs[Long]("n_users"), r.getAs[Long]("n_types"))
      val top = r.getAs[Long]("top_type_bp")
      val verdict = r.getAs[String]("verdict")
      assert(verdict == (if (nUsers >= 8 && nTypes >= 3) "publish" else "suppress"))
      // the dominant type covers at least an equal share: top*nTypes >= 10000-ish
      assert(top * nTypes >= 10000 - nTypes, s"cell ${r}: impossible homogeneity")
      assert(top <= 10000 && nTypes >= 1 && nRec >= nUsers)
    }
    val verdicts = ld.map(_.getAs[String]("verdict")).toSet
    assert(verdicts == Set("publish", "suppress"),
      s"degenerate fixture: only $verdicts present")
  }
}
