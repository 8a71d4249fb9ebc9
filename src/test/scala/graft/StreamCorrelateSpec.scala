package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamCorrelate
import graft.streaming.StreamingSessions.SessionEvent

/** Stream-stream windowed join: matches emit across micro-batches, respect
  * the window bounds, and agree with the batch join on the same data. */
class StreamCorrelateSpec extends SparkSpec {

  private val t0 = 1704067200000L
  private def at(minutes: Long) = new Timestamp(t0 + minutes * 60000L)

  test("cross-batch matches within the window; outside-window pairs never emit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val clicks = MemoryStream[SessionEvent]
    val purchases = MemoryStream[SessionEvent]
    val q = StreamCorrelate.windowJoin(clicks.toDF(), purchases.toDF(), windowSecs = 600)
      .selectExpr("l_user_id AS user_id", "l_cents AS click_cents", "r_cents AS purchase_cents")
      .writeStream.format("memory").queryName("correlate_out")
      .outputMode(OutputMode.Append).start()

    // batch 1: purchases only — nothing to join yet
    purchases.addData(SessionEvent(1, at(0), 500), SessionEvent(2, at(0), 700))
    q.processAllAvailable()
    assert(s.table("correlate_out").count() == 0)

    // batch 2: user 1 clicks 5' after their purchase (in window), user 2
    // clicks 20' after (outside the 10' window), user 3 clicks with no
    // purchase at all
    clicks.addData(
      SessionEvent(1, at(5), 10), SessionEvent(2, at(20), 20), SessionEvent(3, at(5), 30))
    q.processAllAvailable()

    val got = s.table("correlate_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(got == Set((1L, 10L, 500L))) // only the in-window cross-batch pair

    // batch agreement: same operator, same data, batch mode
    val batch = StreamCorrelate.windowJoin(
        Seq(SessionEvent(1, at(5), 10), SessionEvent(2, at(20), 20),
          SessionEvent(3, at(5), 30)).toDF(),
        Seq(SessionEvent(1, at(0), 500), SessionEvent(2, at(0), 700)).toDF(),
        windowSecs = 600)
      .selectExpr("l_user_id", "l_cents", "r_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == got)
  }
}
