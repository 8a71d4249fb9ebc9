package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming bounded top-k — the streaming face of the `graft_topk`
  * aggregate (graft.plans.TopKLongs), completing the stream/batch twin set
  * (KMV ✓ count-min ✓ top-k ✓). Built on `mapGroupsWithState`.
  *
  * Why this twin can be BIT-exact: the k largest values of a multiset are a
  * pure function of the multiset — selection is order-insensitive, exactly
  * like KMV's min-k and count-min's additive counters (and unlike
  * SpaceSaving/Misra-Gries heavy-hitters, whose contents depend on arrival
  * order — the reason the twin tracks VALUES, the same contract as the
  * batch aggregate). So the state after any prefix of micro-batches equals
  * `graft_topk` over the same rows, which the spec asserts with no
  * tolerance, against the registered native aggregate itself.
  *
  * Scale design: state is ≤ k longs per group, forever — the streaming
  * analogue of the batch aggregate's map-side bound (each micro-batch
  * collapses to ≤ k values per group before touching state). Emission is
  * Update-mode: one refreshed row per group per batch.
  */
object StreamingTopK {

  case class ValueIn(group: String, value: Long)
  case class TopKOut(group: String, topk: Seq[Long])

  /** Driver/executor-side reference merge: k largest (duplicates kept),
    * sorted descending — the batch aggregate's exact output contract. */
  def mergeTopK(state: Array[Long], incoming: Iterator[Long], k: Int): Array[Long] = {
    // k is small by contract (an aggregate budget, not a row set): a sort
    // of ≤ state + batch values per group per micro-batch is the simple
    // correct thing; a heap only changes constants
    (state.iterator ++ incoming).toArray.sorted(Ordering.Long.reverse).take(k)
  }

  /** One refreshed top-k row per group per micro-batch. */
  def tops(values: Dataset[ValueIn], k: Int): Dataset[TopKOut] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.group)
      .mapGroupsWithState[Array[Long], TopKOut](GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[ValueIn], state: GroupState[Array[Long]]) =>
          val merged = mergeTopK(
            state.getOption.getOrElse(Array.empty[Long]),
            rows.map(_.value), k)
          state.update(merged)
          TopKOut(group, merged.toSeq)
      }
  }
}
