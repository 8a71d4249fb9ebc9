package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The NB weight arithmetic at adversarial magnitudes — the round-10
  * verdict's latent ceiling: with plain Long lanes the numerator
  * (pos_b+1)·(neg_total+V)·10⁴ wraps past 2⁶³ (~10¹⁴ pos·neg product, in
  * reach of a 100 TB token count) and the engines diverge on wrap. The
  * expression now runs in DECIMAL(38,0); this spec replays it against
  * driver-side BigInt arithmetic across the former boundary and beyond,
  * including the documented residual limit: the QUOTIENT itself exceeding
  * Long (a one-token-class pathology) must yield null, never a wrapped
  * value. */
class NbBoundarySpec extends SparkSpec {

  private val tenK = BigInt(10000)

  /** Driver-side replay of [[Classifier.weightExpr]], guard included: the
    * nearest-double quotient estimate decides null exactly as both engines
    * do. */
  private def expected(posN: Long, negN: Long, posT: Long, negT: Long,
      v: Long): Option[Long] = {
    val num = (BigInt(posN) + 1) * (BigInt(negT) + v) * tenK
    val den = (BigInt(negN) + 1) * (BigInt(posT) + v)
    if (num.doubleValue / den.doubleValue < 8.0e18) Some((num / den).toLong)
    else None
  }

  test("weight expression equals BigInt arithmetic across the Long boundary") {
    val rnd = new scala.util.Random(0xC1A55L)
    val lim = 2_000_000_000_000_000L // 2·10¹⁵ — beyond any 100 TB token count
    def draw(bound: Long): Long = math.abs(rnd.nextLong()) % bound

    // pinned boundary cases: numerator within a hair of 2⁶³ on both sides
    // (the exact territory Long lanes wrapped in), a zero-count bucket,
    // and a ratio that overflows the Long quotient
    val pinned = Seq(
      (0L, 0L, 0L, 0L, 1L),
      (961_918_000L, 5L, 961_918_000L, 959_000_000L, 4096L),
      (lim - 1, 0L, lim - 1, lim - 1, 4096L), // quotient ~2·10¹⁹ → null
      (3_037_000_498L, 3_037_000_498L, 3_037_000_499L, 3_037_000_499L, 1L))
    val randomized = (1 to 300).map { _ =>
      val posT = draw(lim) + 1
      val negT = draw(lim) + 1
      (draw(posT), draw(negT), posT, negT, draw(4096L) + 1)
    }

    val s = spark
    import s.implicits._
    val rows = (pinned ++ randomized).toDF(
      "pos_n", "neg_n", "pos_total", "neg_total", "v")
    val got = rows
      .withColumn("w", expr(Classifier.weightExpr))
      .collect()

    got.foreach { r =>
      val (pn, nn, pt, nt, v) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val want = expected(pn, nn, pt, nt, v)
      val have = if (r.isNullAt(5)) None else Some(r.getLong(5))
      assert(have == want,
        s"weight(pos_n=$pn neg_n=$nn pos_total=$pt neg_total=$nt v=$v): " +
          s"got $have want $want")
    }
    // the sweep must actually cross the former boundary in both directions
    val crossed = got.count { r =>
      (BigInt(r.getLong(0)) + 1) * (BigInt(r.getLong(3)) + r.getLong(4)) *
        tenK > BigInt(Long.MaxValue)
    }
    assert(crossed > 50, s"only $crossed cases above the old Long numerator bound")
  }
}
