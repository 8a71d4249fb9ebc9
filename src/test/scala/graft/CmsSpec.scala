package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.queries.TextOps
import graft.streaming.StreamingCms
import graft.streaming.StreamingCms.{CmsEstimate, DocIn}

/** Count-min sketch: the one-sided error guarantee on the batch operator,
  * collision behavior of the primitive, and stream/batch agreement of the
  * bounded-state streaming twin. */
class CmsSpec extends SparkSpec {

  test("batch estimates never underestimate the exact count") {
    val rows = TextOps.countMin(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_n"), r.getAs[Long]("cm_estimate"))
      assert(est >= exact, s"${r.getAs[String]("word")}: $est < $exact")
      assert(r.getAs[Long]("overestimate") == est - exact)
    }
  }

  test("collisions only ADD mass: estimate = exact + colliding counts") {
    // two words forced into the same cells would overestimate; with the
    // 4×1024 geometry, find the real overestimate by probing a word that is
    // absent from a tiny synthetic state except through collisions
    val counters = new Array[Long](StreamingCms.D * StreamingCms.W)
    Seq("alpha", "alpha", "beta").foreach { w =>
      val wh = StreamingCms.wordHash(w)
      for (i <- 0 until StreamingCms.D)
        counters(i * StreamingCms.W + StreamingCms.bucket(wh, i)) += 1
    }
    assert(StreamingCms.estimate(counters, "alpha") >= 2)
    assert(StreamingCms.estimate(counters, "beta") >= 1)
    // a word whose 4 cells are all untouched estimates exactly 0
    val untouched = (1 to 1000).map(n => s"w$n").find { w =>
      val wh = StreamingCms.wordHash(w)
      (0 until StreamingCms.D).forall(i =>
        counters(i * StreamingCms.W + StreamingCms.bucket(wh, i)) == 0L)
    }
    untouched.foreach(w => assert(StreamingCms.estimate(counters, w) == 0L))
  }

  test("streaming estimates equal the batch sketch after every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val probes = Seq("key", "batch", "absent")
    val batch1 = Seq(
      DocIn("a", 1, "key batch key sort merge"),
      DocIn("a", 2, "batch batch window"))
    val batch2 = Seq(DocIn("a", 3, "key key key stream"))

    val in = MemoryStream[DocIn]
    val q = StreamingCms.estimates(in.toDS(), probes)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Update).start()

    in.addData(batch1: _*)
    q.processAllAvailable()
    val mid = spark.table("cms_out").as[CmsEstimate].collect()
      .map(e => e.word -> e.cm_estimate).toMap
    in.addData(batch2: _*)
    q.processAllAvailable()
    val all = spark.table("cms_out").as[CmsEstimate].collect()
    q.stop()

    // reference: replay all words through a fresh matrix (the batch sketch)
    def ref(docs: Seq[DocIn]): Map[String, Long] = {
      val c = new Array[Long](StreamingCms.D * StreamingCms.W)
      docs.flatMap(_.text.split(" ", -1)).foreach { w =>
        val wh = StreamingCms.wordHash(w)
        for (i <- 0 until StreamingCms.D)
          c(i * StreamingCms.W + StreamingCms.bucket(wh, i)) += 1
      }
      probes.map(p => p -> StreamingCms.estimate(c, p)).toMap
    }
    assert(mid == ref(batch1))
    val fin = all.zipWithIndex.groupBy(_._1.word)
      .map { case (w, rows) => w -> rows.maxBy(_._2)._1.cm_estimate }
    assert(fin == ref(batch1 ++ batch2))
  }

  test("counter state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val probes = Seq("key", "stream")
    val ckpt = SparkSpec.tempDir("cms_ckpt").toString
    val in = MemoryStream[DocIn]
    val got = scala.collection.mutable.ArrayBuffer.empty[CmsEstimate]
    def start() = StreamingCms.estimates(in.toDS(), probes)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[CmsEstimate], _: Long) =>
        got.synchronized { got ++= batch.collect() }; ()
      }
      .start()

    val doc1 = DocIn("a", 1, "key stream key sort merge")
    val doc2 = DocIn("a", 2, "key stream stream batch")

    val q1 = start()
    in.addData(doc1)
    q1.processAllAvailable()
    q1.stop()

    // run 2 resumes from the checkpoint: estimates must equal the batch
    // sketch of BOTH documents — additive counter state recovered intact
    val q2 = start()
    in.addData(doc2)
    q2.processAllAvailable()
    q2.stop()

    val c = new Array[Long](StreamingCms.D * StreamingCms.W)
    Seq(doc1, doc2).flatMap(_.text.split(" ", -1)).foreach { w =>
      val wh = StreamingCms.wordHash(w)
      for (i <- 0 until StreamingCms.D)
        c(i * StreamingCms.W + StreamingCms.bucket(wh, i)) += 1
    }
    val last = got.groupBy(_.word).map { case (w, es) => w -> es.last.cm_estimate }
    probes.foreach(p => assert(last(p) == StreamingCms.estimate(c, p),
      s"recovered-state estimate for '$p': ${last(p)} vs batch ${StreamingCms.estimate(c, p)}"))
  }
}
