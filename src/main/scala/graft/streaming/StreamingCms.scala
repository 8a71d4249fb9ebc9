package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming count-min term-frequency estimation — the bounded-state
  * streaming twin of `text_count_min` (graft.queries.TextOps), built on
  * `mapGroupsWithState`.
  *
  * State per group is the FIXED d×w counter matrix (4×1024 longs ≈ 32 KB,
  * forever) — exact streaming term counts need vocabulary-sized state,
  * which Heaps' law makes unbounded on a crawl feed. Counter merge is
  * addition, so the state after any prefix of micro-batches equals the
  * batch sketch of the same documents (asserted bit-exactly in the spec),
  * and estimates never underestimate — the count-min guarantee survives
  * streaming because the sketch is a linear transform of the count vector.
  *
  * Hashes are the same minhash-permutation family over the shared
  * polynomial word hash as the batch operator, evaluated executor-side.
  */
object StreamingCms {

  val D = 4
  val W = 1024
  private val P = graft.functions.TextHash.P

  case class DocIn(snapshot: String, doc_id: Long, text: String)
  case class CmsEstimate(snapshot: String, word: String, cm_estimate: Long)

  /** The shared polynomial word hash (TextHash contract, driver/executor
    * side). */
  def wordHash(w: String): Long = {
    var acc = 0L
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      acc = (acc * 131 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  def bucket(wh: Long, i: Int): Int =
    (((wh * (97 + 31 * i) + (13 + 17 * i)) % P) % W).toInt

  /** Probe a counter matrix: min over the d cells — never an underestimate. */
  def estimate(counters: Array[Long], word: String): Long = {
    val wh = wordHash(word)
    (0 until D).map(i => counters(i * W + bucket(wh, i))).min
  }

  /** One refreshed estimate row per (snapshot, probe word) per micro-batch.
    * State: the d×w counter matrix, updated additively. */
  def estimates(docs: Dataset[DocIn], probes: Seq[String]): Dataset[CmsEstimate] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.snapshot)
      .flatMapGroupsWithState[Array[Long], CmsEstimate](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (snapshot: String, rows: Iterator[DocIn], state: GroupState[Array[Long]]) =>
          val counters = state.getOption.getOrElse(new Array[Long](D * W))
          rows.foreach { d =>
            d.text.split(" ", -1).foreach { w =>
              val wh = wordHash(w)
              var i = 0
              while (i < D) {
                counters(i * W + bucket(wh, i)) += 1
                i += 1
              }
            }
          }
          state.update(counters)
          probes.iterator.map(w => CmsEstimate(snapshot, w, estimate(counters, w)))
      }
  }
}
