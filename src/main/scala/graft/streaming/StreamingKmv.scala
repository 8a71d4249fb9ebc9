package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.TextFingerprint

/** Streaming distinct-shingle cardinality per corpus snapshot — the
  * streaming face of `corpus_overlap_kmv` (graft.queries.Dedup), built on
  * `mapGroupsWithState`.
  *
  * Why a sketch and not streaming `approx_count_distinct`/exact distinct:
  * exact streaming distinct needs state proportional to the distinct count
  * (unbounded on a crawl feed); the KMV sketch state is a FIXED k longs per
  * snapshot, forever, and merging a micro-batch into it is deterministic —
  * the state after any prefix of batches equals the batch operator's sketch
  * of the same documents, which is what the spec asserts (stream/batch
  * agreement, bit-exact, no tolerance).
  *
  * Scale design: per-document sketches come from the same native
  * [[TextFingerprint.kmvSketch]] fold the batch query plans into its scan
  * projection, so a micro-batch contributes ≤ k longs per doc; the state
  * store is keyed by snapshot (few groups, constant size each). Emission is
  * Update-mode: one refreshed estimate row per snapshot per batch.
  */
object StreamingKmv {

  case class DocIn(snapshot: String, doc_id: Long, text: String)
  case class KmvEstimate(snapshot: String, k_eff: Long, tau: Long, est_distinct: Double)

  /** Hash space of the mapped shingle hashes (mod 2^32). */
  val M: Double = 4294967296.0

  /** Per-document KMV sketch via the shared native fold (ascending, ≤ k). */
  def docSketch(text: String, k: Int): Array[Long] = {
    val words = new GenericArrayData(
      text.split(" ", -1).map(w => UTF8String.fromString(w): Any))
    val sk = TextFingerprint.kmvSketch(words, k)
    (0 until sk.numElements()).map(sk.getLong).toArray
  }

  /** Estimate from a sketch: `(k−1)·M/h_(k)` when full, else the exact
    * (complete) distinct count — the same estimator as the batch oracle. */
  def estimate(sketch: Array[Long], k: Int): KmvEstimate = {
    val kEff = sketch.length
    val tau = if (kEff == 0) 0L else sketch(kEff - 1)
    val est =
      if (kEff == k) (k - 1).toDouble * M / tau.toDouble else kEff.toDouble
    KmvEstimate("", kEff.toLong, tau, est)
  }

  /** One refreshed cardinality estimate per snapshot per micro-batch.
    * State: the k smallest distinct shingle hashes seen so far (sorted). */
  def estimates(docs: Dataset[DocIn], k: Int): Dataset[KmvEstimate] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => docSketch(d.text, k).map(h => (d.snapshot, h)))
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], KmvEstimate](GroupStateTimeout.NoTimeout) {
        (snapshot: String, rows: Iterator[(String, Long)], state: GroupState[Array[Long]]) =>
          val set = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.foreach(set.add(_)))
          rows.foreach { case (_, h) =>
            if (set.size < k || h < set.last) {
              set.add(h)
              if (set.size > k) set.pollLast()
            }
          }
          val merged = new Array[Long](set.size)
          val it = set.iterator()
          var i = 0
          while (it.hasNext) { merged(i) = it.next().longValue(); i += 1 }
          state.update(merged)
          estimate(merged, k).copy(snapshot = snapshot)
      }
  }
}
