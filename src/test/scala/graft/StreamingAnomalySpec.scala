package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.{Anomaly, EventIn, Moments}

/** Incremental z-score anomaly detection: prefix-moment scoring across
  * micro-batches, and end-of-stream state that matches the batch moments. */
class StreamingAnomalySpec extends SparkSpec {

  // 10 calm events (values 100/101 alternating) then one spike
  private val calm = (1L to 10L).map(i => EventIn(7L, i, 100L + i % 2))
  private val spike = EventIn(7L, 11L, 500L)

  test("a spike is flagged against its prefix; calm events are not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[EventIn]
    val q = StreamingAnomaly.detect(in.toDS())
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode(OutputMode.Append).start()

    in.addData(calm: _*)
    q.processAllAvailable()
    in.addData(spike)
    q.processAllAvailable()

    val got = spark.table("anomaly_out").as[Anomaly].collect()
    q.stop()

    assert(got.map(_.seq).toSet == Set(11L), s"only the spike flags: ${got.toSeq}")
    val a = got.head
    assert(a.user_id == 7L && a.cents == 500L && a.z > 3.0)

    // the flag was computed against the 10-event prefix, exactly
    val (n, s, s2) = (calm.size.toLong,
      calm.map(_.cents).sum, calm.map(e => e.cents * e.cents).sum)
    val expected = (spike.cents.toDouble * n - s.toDouble) /
      math.sqrt(n.toDouble * s2 - s.toDouble * s)
    assert(math.abs(a.z - expected) < 1e-12)
  }

  test("below-minN prefixes never score, even for extreme values") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[EventIn]
    val q = StreamingAnomaly.detect(in.toDS())
      .writeStream.format("memory").queryName("anomaly_cold")
      .outputMode(OutputMode.Append).start()

    // 5 events < minN = 8: the 5th is a huge spike but has a 4-event prefix
    in.addData(EventIn(1, 1, 100), EventIn(1, 2, 100), EventIn(1, 3, 101),
      EventIn(1, 4, 100), EventIn(1, 5, 99999))
    q.processAllAvailable()
    val got = spark.table("anomaly_cold").collect()
    q.stop()
    assert(got.isEmpty, "no event may be scored before minN prior events")
  }

  test("moments state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = SparkSpec.tempDir("anomaly_ckpt").toString
    val in = MemoryStream[EventIn]
    // the memory sink rejects checkpoint recovery; collect via foreachBatch
    // (the same sink shape StreamDriver uses)
    val got = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
    def start() = StreamingAnomaly.detect(in.toDS())
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Anomaly], _: Long) =>
        got.synchronized { got ++= batch.collect() }; ()
      }
      .start()

    // run 1: the calm prefix builds up state, then stop
    val q1 = start()
    in.addData(calm: _*)
    q1.processAllAvailable()
    q1.stop()

    // run 2: same checkpoint — the spike must be scored against the
    // RECOVERED 10-event moments, not a cold state
    val q2 = start()
    in.addData(spike)
    q2.processAllAvailable()
    q2.stop()

    assert(got.map(_.seq).toSeq == Seq(11L),
      s"the spike must flag against recovered state: ${got.toSeq}")
    assert(got.head.z > 3.0)
  }

  test("end-of-stream state equals the batch moments (split across batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = calm :+ spike
    val in = MemoryStream[EventIn]
    // surface the state by re-deriving it: run the detector, then feed one
    // more probe event per user and recompute its expected prefix z by hand
    val q = StreamingAnomaly.detect(in.toDS(), threshold = 0.0)
      .writeStream.format("memory").queryName("anomaly_state")
      .outputMode(OutputMode.Append).start()

    in.addData(all.take(4): _*); q.processAllAvailable()
    in.addData(all.drop(4): _*); q.processAllAvailable()
    val probe = EventIn(7L, 99L, 200L)
    in.addData(probe); q.processAllAvailable()

    val got = spark.table("anomaly_state").as[Anomaly].collect()
      .filter(_.seq == 99L)
    q.stop()

    // batch moments over the full 11-event history
    val m = all.foldLeft(Moments(0, 0, 0)) { (m, e) =>
      Moments(m.n + 1, m.sum + e.cents, m.sumSq + e.cents * e.cents) }
    val expected = (probe.cents.toDouble * m.n - m.sum.toDouble) /
      math.sqrt(m.n.toDouble * m.sumSq - m.sum.toDouble * m.sum)
    assert(got.length == 1)
    assert(math.abs(got.head.z - expected) < 1e-12,
      "state moments after two batches must equal the batch-computed moments")
  }
}
