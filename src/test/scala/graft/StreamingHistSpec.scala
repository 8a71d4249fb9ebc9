package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingHist
import graft.streaming.StreamingHist.{HistOut, ValueIn}

/** Streaming log₂ histogram: fixed 64-counter state, bit-exact against the
  * batch query's `length(bin(v)) - 1` binning after every micro-batch
  * prefix, checkpoint-restartable, and quantile probes over the merged
  * sketch equal the batch cross-multiplication rule. */
class StreamingHistSpec extends SparkSpec {

  /** The batch side of the twin contract: the SAME binning expression the
    * events_hist_quantiles catalog query uses, evaluated by Spark SQL. */
  private def batchHist(rows: Seq[ValueIn]): Map[String, Map[Int, Long]] = {
    val s = spark
    import s.implicits._
    rows.toDF("group", "value")
      .filter($"value" >= 1L)
      .withColumn("bin", (length(bin($"value")) - 1).cast("int"))
      .groupBy($"group", $"bin").agg(count(lit(1)).as("n"))
      .as[(String, Int, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(r => r._2 -> r._3).toMap }
  }

  private def latestPerGroup(rows: Seq[HistOut]): Map[String, HistOut] =
    rows.zipWithIndex.groupBy(_._1.group)
      .map { case (g, rs) => g -> rs.maxBy(_._2)._1 }

  test("streaming histogram equals the batch binning after every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq(
      ValueIn("a", 1), ValueIn("a", 3), ValueIn("a", 900), ValueIn("a", 1024),
      ValueIn("b", 17), ValueIn("b", 0), ValueIn("b", -5)) // 0 and -5 excluded
    val batch2 = Seq(
      ValueIn("a", 2), ValueIn("a", 1L << 40),
      ValueIn("b", 16), ValueIn("b", 31)) // both land in bin 4

    val in = MemoryStream[ValueIn]
    val q = StreamingHist.hists(in.toDS())
      .writeStream.format("memory").queryName("hist_out")
      .outputMode(OutputMode.Update).start()

    in.addData(batch1: _*)
    q.processAllAvailable()
    val after1 = latestPerGroup(spark.table("hist_out").as[HistOut].collect().toSeq)
    in.addData(batch2: _*)
    q.processAllAvailable()
    val after2 = latestPerGroup(spark.table("hist_out").as[HistOut].collect().toSeq)
    q.stop()

    def asMap(h: HistOut): Map[Int, Long] = h.bins.zip(h.counts).toMap
    assert(after1.view.mapValues(asMap).toMap === batchHist(batch1))
    assert(after2.view.mapValues(asMap).toMap === batchHist(batch1 ++ batch2))
    // totals count only the included (≥ 1) values: 17, 16, 31
    assert(after2("b").total === 3L)
    // quantile probe over the merged sketch follows the batch rule: all
    // three of group b's included values land in bin 4 (16..31)
    val b = after2("b")
    assert(StreamingHist.quantileBin(b.bins, b.counts, 50L) === 4)
    assert(StreamingHist.quantileBin(b.bins, b.counts, 99L) === 4)
  }

  test("a group whose values were all excluded emits no sketch row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[ValueIn]
    val q = StreamingHist.hists(in.toDS())
      .writeStream.format("memory").queryName("hist_empty_out")
      .outputMode(OutputMode.Update).start()
    in.addData(ValueIn("dead", 0), ValueIn("dead", -7), ValueIn("live", 4))
    q.processAllAvailable()
    val out = spark.table("hist_empty_out").as[HistOut].collect()
    q.stop()

    // no empty sketch a quantile probe can't answer; the live group is intact
    assert(out.map(_.group).toSet === Set("live"))
    intercept[IllegalArgumentException] {
      StreamingHist.quantileBin(Nil, Nil, 50L)
    }
  }

  test("histogram state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = SparkSpec.tempDir("hist_ckpt").toString
    val in = MemoryStream[ValueIn]
    val got = scala.collection.mutable.ArrayBuffer.empty[HistOut]
    def start() = StreamingHist.hists(in.toDS())
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[HistOut], _: Long) =>
        got.synchronized { got ++= batch.collect() }; ()
      }
      .start()

    val b1 = Seq(ValueIn("a", 8), ValueIn("a", 9))
    val b2 = Seq(ValueIn("a", 1), ValueIn("a", 300))

    val q1 = start()
    in.addData(b1: _*)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    in.addData(b2: _*)
    q2.processAllAvailable()
    q2.stop()

    // the resumed state must reflect BOTH batches: bins {3:2, 0:1, 8:1}
    val last = got.last
    assert(last.bins.zip(last.counts).toMap === batchHist(b1 ++ b2)("a"))
    assert(last.total === 4L)
  }
}
