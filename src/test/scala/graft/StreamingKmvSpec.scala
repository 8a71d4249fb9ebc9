package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingKmv
import graft.streaming.StreamingKmv.{DocIn, KmvEstimate}

/** Streaming KMV cardinality: bounded state, batch-equivalent merges. */
class StreamingKmvSpec extends SparkSpec {

  private val k = 8

  /** Driver-side reference: the k smallest distinct mapped shingle hashes
    * of a document set (what the batch operator computes per snapshot). */
  private def refSketch(texts: Seq[String]): Array[Long] =
    texts.flatMap(t => StreamingKmv.docSketch(t, Int.MaxValue))
      .distinct.sorted.take(k).toArray

  test("streaming estimates equal the batch sketch after every prefix of batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq(
      DocIn("a", 1, "the fast key order sort table scan merge part window small hash"),
      DocIn("a", 2, "stream spark window window dup key order sort batch batch merge"),
      DocIn("b", 3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val batch2 = Seq(
      DocIn("a", 4, "completely fresh content that shifts the sketch minima around"),
      DocIn("b", 5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup: no state change
      DocIn("b", 6, "lambda mu nu xi omicron pi rho sigma tau upsilon"))

    val in = MemoryStream[DocIn]
    val q = StreamingKmv.estimates(in.toDS(), k)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode(OutputMode.Update).start()

    in.addData(batch1: _*)
    q.processAllAvailable()
    val after1 = spark.table("kmv_out").as[KmvEstimate].collect()
      .map(e => e.snapshot -> e).toMap
    in.addData(batch2: _*)
    q.processAllAvailable()
    val all = spark.table("kmv_out").as[KmvEstimate].collect()
    q.stop()

    // prefix 1: streaming state == batch sketch of batch-1 docs
    val ref1a = StreamingKmv.estimate(refSketch(batch1.filter(_.snapshot == "a").map(_.text)), k)
    assert(after1("a").tau == ref1a.tau && after1("a").est_distinct == ref1a.est_distinct)

    // prefix 2 (Update mode appends the refreshed rows; take the last per key)
    val after2 = all.zipWithIndex.groupBy(_._1.snapshot)
      .map { case (s, rows) => s -> rows.maxBy(_._2)._1 }
    for (s <- Seq("a", "b")) {
      val docs = (batch1 ++ batch2).filter(_.snapshot == s).map(_.text)
      val ref = StreamingKmv.estimate(refSketch(docs), k)
      assert(after2(s).k_eff == ref.k_eff && after2(s).tau == ref.tau &&
        after2(s).est_distinct == ref.est_distinct, s"snapshot $s")
    }

    // bounded state: k_eff never exceeds k even though the corpora have
    // far more distinct shingles
    assert(all.forall(_.k_eff <= k))
    // and the full sketches genuinely overflowed k (the bound was exercised)
    assert(after2("a").k_eff == k && after2("b").k_eff == k)
  }

  test("sketch state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = SparkSpec.tempDir("kmv_ckpt").toString
    val in = MemoryStream[DocIn]
    val got = scala.collection.mutable.ArrayBuffer.empty[KmvEstimate]
    def start() = StreamingKmv.estimates(in.toDS(), k)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[KmvEstimate], _: Long) =>
        got.synchronized { got ++= batch.collect() }; ()
      }
      .start()

    val doc1 = DocIn("a", 1, "the fast key order sort table scan merge part window small hash")
    val doc2 = DocIn("a", 2, "stream spark window window dup key order sort batch batch merge")

    val q1 = start()
    in.addData(doc1)
    q1.processAllAvailable()
    q1.stop()

    // run 2 resumes from the checkpoint: the merged estimate must reflect
    // BOTH documents' shingles, i.e. equal the batch sketch of {doc1, doc2}
    val q2 = start()
    in.addData(doc2)
    q2.processAllAvailable()
    q2.stop()

    val ref = StreamingKmv.estimate(refSketch(Seq(doc1.text, doc2.text)), k)
    val last = got.last
    assert(last.k_eff == ref.k_eff && last.tau == ref.tau &&
      last.est_distinct == ref.est_distinct,
      s"recovered-state merge must equal the batch sketch: $last vs $ref")
  }
}
