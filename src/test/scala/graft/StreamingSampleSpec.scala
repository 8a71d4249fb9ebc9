package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingSample
import graft.streaming.StreamingSample.State

/** The streaming bottom-k-by-hash sampler. Contract: min-k selection is a
  * semilattice, so the state after ANY micro-batch split equals the batch
  * sampler over the same rows — bit-exact, no tolerance.
  */
class StreamingSampleSpec extends SparkSpec {

  private val k = 50

  private def brute(ids: Seq[Long]): List[(Long, Long)] =
    ids.distinct.map(id => (StreamingSample.hash(id), id)).sorted.take(k).toList

  test("state after any split equals the one-shot bottom-k") {
    val ids = (0L until 400L).map(i => i * 7L % 1000L).distinct
    val want = brute(ids)
    for (m <- Seq(1, 2, 3, 5, 7)) {
      val batches = (0 until m).map(b => ids.filter(_ % m == b))
      val st = batches.foldLeft(State(0L, Nil)) { (s, batch) =>
        StreamingSample.merge(s, batch.iterator, k)
      }
      assert(st.sample == want, s"split %$m diverges from the batch election")
      assert(st.seen == ids.length.toLong)
    }
  }

  test("re-merging the same rows is idempotent on the sample") {
    val ids = (0L until 200L)
    val once = StreamingSample.merge(State(0L, Nil), ids.iterator, k)
    val twice = StreamingSample.merge(once, ids.iterator, k)
    assert(twice.sample == once.sample)
    assert(twice.seen == 2 * once.seen)
  }

  test("the replayed streaming sample equals the batch sampler end-to-end") {
    val s = spark
    import s.implicits._
    val sfDir = SparkSpec.fixtureSf
    val streamed = graft.queries.StreamReplay.queries("streaming_sample_replay")(s, sfDir)
      .select($"lang", $"doc_id", $"sample_rank")
      .as[(String, Long, Long)].collect().toSet
    val batch = graft.queries.Sampling.uniformKPerStratum(s, sfDir)
      .select($"lang", $"doc_id", $"sample_rank")
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream minus batch: ${(streamed -- batch).take(5)}; " +
        s"batch minus stream: ${(batch -- streamed).take(5)}")
  }
}
