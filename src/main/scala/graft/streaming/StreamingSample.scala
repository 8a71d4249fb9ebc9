package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-stratum uniform sampler — the streaming face of
  * `sample_uniform_k` (graft.queries.Sampling), built on
  * `flatMapGroupsWithState`.
  *
  * The batch sampler keeps each stratum's bottom-k documents by the
  * deterministic Knuth multiplicative hash; bottom-k-by-hash is exactly a
  * reservoir sample that is ALSO order-free (min-k selection is a
  * semilattice: merging any micro-batch split of a dataset yields the same
  * k survivors as one pass — unlike the classic index-randomized reservoir,
  * which is order- and split-sensitive). So the streaming twin carries the
  * repo's standard bit-exactness contract: state after ANY prefix of
  * batches equals the batch sampler over the same rows, no tolerance.
  *
  * State per stratum is a FIXED k (hash, doc_id) pairs plus one counter —
  * constant forever, whatever the corpus does. Emission is Update-mode:
  * the full refreshed sample per stratum per batch, tagged with the
  * monotone rows-seen counter so a consumer (and the replay entry) can
  * select the latest snapshot without a batch id.
  */
object StreamingSample {

  case class DocIn(lang: String, doc_id: Long)
  case class SampleRow(lang: String, doc_id: Long, sample_rank: Long, n_seen: Long)

  /** (seen counter, sorted bottom-k of (hash, doc_id)). */
  case class State(seen: Long, sample: List[(Long, Long)])

  /** The batch sampler's hash, verbatim ([[graft.queries.Sampling]]§Mult):
    * ((id mod 2^31) · 2654435761) mod 2^32 — fits a Long with no overflow. */
  def hash(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 4294967296L

  /** Pure state transition (spec-testable without a streaming query):
    * fold a batch of ids into the bottom-k state. */
  def merge(st: State, ids: Iterator[Long], k: Int): State = {
    val set = scala.collection.mutable.TreeSet.empty[(Long, Long)]
    set ++= st.sample
    var seen = st.seen
    ids.foreach { id =>
      seen += 1
      val e = (hash(id), id)
      if (set.size < k || Ordering[(Long, Long)].lt(e, set.last)) {
        set += e
        if (set.size > k) set -= set.last
      }
    }
    State(seen, set.toList)
  }

  /** One refreshed per-stratum sample per micro-batch. */
  def samples(docs: Dataset[DocIn], k: Int): Dataset[SampleRow] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[State, SampleRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[DocIn], state: GroupState[State]) =>
          val st = merge(state.getOption.getOrElse(State(0L, Nil)),
            rows.map(_.doc_id), k)
          state.update(st)
          st.sample.iterator.zipWithIndex.map { case ((_, id), i) =>
            SampleRow(lang, id, i + 1L, st.seen)
          }
      }
  }
}
