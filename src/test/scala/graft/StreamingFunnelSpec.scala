package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{EventIn, UserStage}

/** Stream/batch twin contract for the conversion funnel: replaying the real
  * event fixture in seq order, the streaming stage histogram equals the
  * batch definition after EVERY micro-batch prefix, equals the
  * `events_funnel` operator exactly at end of stream, and survives a
  * checkpoint restart. */
class StreamingFunnelSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def allEvents: Seq[EventIn] = {
    val s = spark
    import s.implicits._
    graft.fixtures.Fixtures.register(s, sfDir)
    s.table("ek").select($"user_id", $"event_type", $"seq")
      .as[EventIn].collect().toSeq.sortBy(e => (e.seq, e.user_id))
  }

  /** The batch definition, written directly (min view; min qualifying
    * click; min qualifying purchase) — independent of the greedy stream
    * transition it checks. */
  private def bruteStages(evs: Seq[EventIn]): Map[Long, Long] =
    evs.groupBy(_.user_id).map { case (u, es) =>
      val s1 = es.filter(_.event_type == "view").map(_.seq)
        .minOption
      val (wb, bw) = (StreamingFunnel.windowBuckets, StreamingFunnel.bucketWidth)
      val s2 = s1.flatMap(v => es.filter(e => e.event_type == "click" &&
        e.seq > v && e.seq / bw - v / bw <= wb).map(_.seq).minOption)
      val s3 = s2.flatMap(c => es.filter(e => e.event_type == "purchase" &&
        e.seq > c && e.seq / bw - c / bw <= wb).map(_.seq).minOption)
      u -> (if (s3.isDefined) 3L else if (s2.isDefined) 2L
            else if (s1.isDefined) 1L else 0L)
    }

  private def histogram(stages: Iterable[Long]): Map[Long, Long] =
    stages.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("stage histogram equals the batch definition after every prefix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evs = allEvents
    val cuts = Seq(evs.length / 3, 2 * evs.length / 3, evs.length)

    val latest = scala.collection.mutable.Map.empty[Long, Long]
    val in = MemoryStream[EventIn]
    val q = StreamingFunnel.stages(in.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserStage], _: Long) =>
        batch.collect().foreach(us => latest.synchronized {
          latest(us.user_id) = us.stage
        }); ()
      }.start()

    var from = 0
    for (cut <- cuts) {
      in.addData(evs.slice(from, cut): _*)
      q.processAllAvailable()
      from = cut
      val want = bruteStages(evs.take(cut))
      assert(latest.toMap === want,
        s"prefix $cut: streaming stages diverge from the batch definition")
    }
    q.stop()

    // end of stream: the histogram equals the events_funnel operator's rows
    val batchRows = graft.queries.Sessions.funnel(s, sfDir)
      .select($"stage", $"n_users").as[(Long, Long)].collect().toMap
    assert(histogram(latest.values) === batchRows)
  }

  test("funnel state survives a checkpoint restart mid-stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evs = allEvents
    val half = evs.length / 2
    val ckpt = SparkSpec.tempDir("funnel_ckpt").toString
    val latest = scala.collection.mutable.Map.empty[Long, Long]

    val in = MemoryStream[EventIn]
    def start() = StreamingFunnel.stages(in.toDS())
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserStage], _: Long) =>
        batch.collect().foreach(us => latest.synchronized {
          latest(us.user_id) = us.stage
        }); ()
      }.start()

    val q1 = start()
    in.addData(evs.take(half): _*)
    q1.processAllAvailable()
    q1.stop()

    // same checkpoint: the resumed query must carry the milestone state
    val q2 = start()
    in.addData(evs.drop(half): _*)
    q2.processAllAvailable()
    q2.stop()

    assert(latest.toMap === bruteStages(evs),
      "post-restart stages must equal the full-stream batch definition")
  }
}
