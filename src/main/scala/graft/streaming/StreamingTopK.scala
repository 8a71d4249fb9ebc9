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
  * Scale design: state is ≤ k longs per group, forever. Unlike the batch
  * aggregate, `mapGroupsWithState` has no map-side combine — a micro-batch's
  * rows all shuffle to the group owner — so the merge folds the iterator
  * through a k-bounded min-heap (O(n log k) time, O(k) memory) instead of
  * materializing the batch. Emission is Update-mode: one refreshed row per
  * group per batch.
  */
object StreamingTopK {

  case class ValueIn(group: String, value: Long)
  case class TopKOut(group: String, topk: Seq[Long])

  /** Driver/executor-side reference merge: k largest (duplicates kept),
    * sorted descending — the batch aggregate's exact output contract. The
    * fold never materializes the batch: a min-heap of ≤ k survivors, so a
    * hot group with millions of rows in one micro-batch costs O(n log k)
    * and O(k) memory, not an O(n) array + O(n log n) sort. */
  def mergeTopK(state: Array[Long], incoming: Iterator[Long], k: Int): Array[Long] = {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    val heap = scala.collection.mutable.PriorityQueue.empty[Long](Ordering.Long.reverse)
    // restored state goes through the SAME k-bounded fold as incoming rows:
    // a checkpoint written under a larger k would otherwise pin oversized
    // state forever (the <= k contract must hold against ANY restored state)
    (state.iterator ++ incoming).foreach { v =>
      if (heap.size < k) heap.enqueue(v)
      else if (v > heap.head) { heap.dequeue(); heap.enqueue(v) }
    }
    heap.toArray.sorted(Ordering.Long.reverse)
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
