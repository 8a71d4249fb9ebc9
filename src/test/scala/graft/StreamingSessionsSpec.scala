package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingSessions
import graft.streaming.StreamingSessions.SessionEvent

/** Streaming gap-sessionization: sessions merge across micro-batches, emit
  * exactly once when the watermark closes them, and agree with the batch
  * session_window computation on the same events. */
class StreamingSessionsSpec extends SparkSpec {

  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z
  private def at(minutes: Long) = new Timestamp(t0 + minutes * 60000L)

  test("sessions merge across batches and emit once closed by the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[SessionEvent]
    val q = StreamingSessions.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()

    // batch 1: user 1 starts a session; user 2 one event
    in.addData(
      SessionEvent(1, at(0), 100), SessionEvent(2, at(5), 50))
    q.processAllAvailable()
    // batch 2: user 1 extends the SAME session (10' < 30' gap), then a new
    // one 50' later; nothing can emit yet (watermark still far behind)
    in.addData(
      SessionEvent(1, at(10), 200), SessionEvent(1, at(60), 400))
    q.processAllAvailable()
    assert(s.table("sessions_out").count() == 0,
      "sessions emitted before the watermark closed them")

    // two sentinel batches: the first advances the watermark past every
    // session close (watermark updates at batch END), the second triggers
    // the emitting batch
    in.addData(SessionEvent(99, at(600), 0))
    q.processAllAvailable()
    in.addData(SessionEvent(99, at(601), 0))
    q.processAllAvailable()

    val got = s.table("sessions_out")
      .filter($"user_id" =!= 99)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getLong(4)))
      .toSet
    q.stop()

    assert(got == Set(
      (1L, at(0), 2L, 300L),   // merged across batches 1+2
      (1L, at(60), 1L, 400L),  // separate session after the 50' gap
      (2L, at(5), 1L, 50L)))

    // batch/streaming agreement: the same operator in batch mode over the
    // same (non-sentinel) events yields the same sessions
    val batch = StreamingSessions.sessionize(Seq(
        SessionEvent(1, at(0), 100), SessionEvent(2, at(5), 50),
        SessionEvent(1, at(10), 200), SessionEvent(1, at(60), 400)).toDS())
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getLong(4)))
      .toSet
    assert(batch == got)
  }
}
