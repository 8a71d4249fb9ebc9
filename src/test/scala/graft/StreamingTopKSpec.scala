package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.{TopKOut, ValueIn}

/** Streaming top-k: bounded state, bit-exact against the native batch
  * aggregate after every prefix of micro-batches, checkpoint-restartable. */
class StreamingTopKSpec extends SparkSpec {

  private val k = 3

  /** The REGISTERED batch aggregate over the same rows — the twin contract
    * is against graft_topk itself, not a re-derivation. */
  private def batchTopK(rows: Seq[ValueIn]): Map[String, Seq[Long]] = {
    val s = spark
    graft.plans.DotProduct.register(s) // idempotent native-function surface
    import s.implicits._
    rows.toDF("group", "value")
      .groupBy($"group").agg(expr(s"graft_topk(value, $k)").as("topk"))
      .as[(String, Seq[Long])].collect().toMap
  }

  test("streaming top-k equals the batch aggregate after every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq(
      ValueIn("a", 10), ValueIn("a", 50), ValueIn("a", 30), ValueIn("a", 50),
      ValueIn("b", 7))
    val batch2 = Seq(
      ValueIn("a", 40), ValueIn("a", 5), // 40 enters, 5 does not
      ValueIn("b", 7), ValueIn("b", 2))  // duplicate 7 kept as a value

    val in = MemoryStream[ValueIn]
    val q = StreamingTopK.tops(in.toDS(), k)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode(OutputMode.Update).start()

    in.addData(batch1: _*)
    q.processAllAvailable()
    val after1 = spark.table("topk_out").as[TopKOut].collect()
      .map(t => t.group -> t.topk).toMap
    in.addData(batch2: _*)
    q.processAllAvailable()
    val all = spark.table("topk_out").as[TopKOut].collect()
    q.stop()

    assert(after1 === batchTopK(batch1))
    val after2 = all.zipWithIndex.groupBy(_._1.group)
      .map { case (g, rows) => g -> rows.maxBy(_._2)._1.topk }
    assert(after2 === batchTopK(batch1 ++ batch2))
    // the bound was exercised: group a saw 6 values, kept 3
    assert(after2("a") === Seq(50L, 50L, 40L))
  }

  test("top-k state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = SparkSpec.tempDir("topk_ckpt").toString
    val in = MemoryStream[ValueIn]
    val got = scala.collection.mutable.ArrayBuffer.empty[TopKOut]
    def start() = StreamingTopK.tops(in.toDS(), k)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[TopKOut], _: Long) =>
        got.synchronized { got ++= batch.collect() }; ()
      }
      .start()

    val b1 = Seq(ValueIn("a", 9), ValueIn("a", 1))
    val b2 = Seq(ValueIn("a", 5), ValueIn("a", 3))

    val q1 = start()
    in.addData(b1: _*)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    in.addData(b2: _*)
    q2.processAllAvailable()
    q2.stop()

    // the resumed state must reflect BOTH batches: {9,5,3}, not {5,3}
    assert(got.last.topk === batchTopK(b1 ++ b2)("a"))
  }
}
