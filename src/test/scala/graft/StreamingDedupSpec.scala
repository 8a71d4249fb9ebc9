package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{DocIn, DupVerdict, NearDupPair}

/** Incremental dedup over a micro-batched document stream: state survives
  * across batches, and the streaming results agree with the batch dedup
  * semantics on the same corpus. */
class StreamingDedupSpec extends SparkSpec {

  test("streaming exact dedup: canonical assignment survives batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[DocIn]
    val q = StreamingDedup.exactDedup(in.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()

    // batch 1: two copies of "aa" (3 wins as min), one "bb"
    in.addData(DocIn(5, "aa"), DocIn(3, "aa"), DocIn(4, "bb"))
    q.processAllAvailable()
    // batch 2: a later "aa" copy with a SMALLER id — streaming first-seen
    // semantics keep 3 canonical; plus a fresh "cc"
    in.addData(DocIn(1, "aa"), DocIn(9, "cc"))
    q.processAllAvailable()

    val got = spark.table("dedup_out").as[DupVerdict].collect()
      .map(v => v.doc_id -> ((v.canonical_doc_id, v.is_duplicate))).toMap
    q.stop()

    assert(got(3) == ((3L, false)) && got(5) == ((3L, true)))
    assert(got(4) == ((4L, false)))
    assert(got(1) == ((3L, true))) // batch-2 copy resolved against batch-1 state
    assert(got(9) == ((9L, false)))
  }

  test("streaming simhash candidates equal the batch blocking on the same corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Seq(
      DocIn(1, "the quick brown fox jumps over the lazy dog"),
      DocIn(2, "the quick brown fox jumps over the lazy dog"), // exact dup -> hamming 0
      DocIn(3, "the quick brown fox jumps over the lazy cat"),
      DocIn(4, "pack my box with five dozen liquor jugs"),
      DocIn(5, "completely different content entirely unrelated text"))

    val in = MemoryStream[DocIn]
    val q = StreamingDedup.simhashPairs(in.toDS())
      .writeStream.format("memory").queryName("simhash_out")
      .outputMode(OutputMode.Append).start()
    in.addData(docs.take(2): _*)
    q.processAllAvailable()
    in.addData(docs.drop(2): _*)
    q.processAllAvailable()

    val streamed = spark.table("simhash_out").as[NearDupPair].collect()
      .map(p => (p.doc_a, p.doc_b, p.hamming)).distinct.sorted.toSeq
    q.stop()

    // batch reference: all-pairs over the same banding + Hamming cut
    val fps = docs.map(d => d.doc_id -> StreamingDedup.simhash(d.text))
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      hamming = java.lang.Long.bitCount(fa ^ fb)
      if hamming <= 12
      if (0 until 4).exists(k => ((fa >>> (16 * k)) & 65535L) == ((fb >>> (16 * k)) & 65535L))
    } yield (a, b, hamming)).distinct.sorted

    assert(streamed == expected)
    assert(streamed.contains((1L, 2L, 0))) // the exact dup pair is found
  }
}
