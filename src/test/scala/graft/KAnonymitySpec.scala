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
}
