package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming log₂-binned value histogram — the bounded-state streaming twin
  * of `events_hist_quantiles` (graft.queries.Sessions), completing the
  * stream/batch sketch-twin set (KMV ✓ count-min ✓ top-k ✓ histogram ✓).
  * Built on `flatMapGroupsWithState`.
  *
  * State per group is a FIXED 64-counter array (one per power-of-two bin of
  * a positive long), forever — the same reason the batch operator is
  * 100 TB-safe: the sketch size is bounded by the VALUE RANGE, not the data.
  * Counter merge is addition, so the state after any prefix of micro-batches
  * is bit-exactly the batch histogram of the same rows (asserted in the spec
  * against the identical `floor(log2 v)` binning the batch query uses:
  * `length(bin(v)) - 1` = 63 − numberOfLeadingZeros(v) for v ≥ 1), and any
  * quantile located from the merged counters equals the batch
  * cross-multiplied `cum·100 ≥ q·total` rule over the same bins.
  *
  * Like the other twins, emission is Update-mode: one refreshed sketch row
  * per group per micro-batch, carrying only NON-EMPTY bins (≤ 64 pairs).
  */
object StreamingHist {

  case class ValueIn(group: String, value: Long)

  /** One sketch row per group per batch: parallel bin/count arrays sorted by
    * bin, plus the running total — everything a quantile probe needs. */
  case class HistOut(group: String, bins: Seq[Int], counts: Seq[Long], total: Long)

  /** The batch query's binning contract ([[graft.functions.Log2Bin.binSql]])
    * in its executor-side JVM form: floor(log₂ v) for v ≥ 1 — equal to
    * `length(bin(v)) - 1` (asserted bit-exactly in the spec); negatives and
    * zero are excluded exactly as the batch operator's `cents >= 1` guard
    * excludes them. */
  def bin(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)

  /** Locate the q-th percentile bin from merged counters by the batch
    * operator's exact integer rule: smallest bin with cum·100 ≥ q·total.
    * An empty sketch has no percentile — callers never see one from
    * [[hists]] (empty states emit nothing), so a probe on one is a bug. */
  def quantileBin(bins: Seq[Int], counts: Seq[Long], q: Long): Int = {
    require(bins.nonEmpty && counts.sum > 0, "quantile probe on an empty sketch")
    val total = counts.sum
    var cum = 0L
    var i = 0
    while (i < bins.length) {
      cum += counts(i)
      if (cum * 100L >= q * total) return bins(i)
      i += 1
    }
    bins.last
  }

  /** One refreshed histogram row per group per micro-batch. State: the
    * 64-long counter array, updated additively. */
  def hists(values: Dataset[ValueIn]): Dataset[HistOut] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.group)
      .flatMapGroupsWithState[Array[Long], HistOut](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[ValueIn], state: GroupState[Array[Long]]) =>
          val counters = state.getOption.getOrElse(new Array[Long](64))
          rows.foreach { r => if (r.value >= 1L) counters(bin(r.value)) += 1L }
          state.update(counters)
          val occupied = counters.indices.filter(counters(_) > 0L)
          // a group whose values were ALL excluded (< 1) has no sketch yet:
          // emitting an empty histogram would hand consumers a row no
          // quantile probe can answer
          if (occupied.isEmpty) Iterator.empty
          else Iterator.single(HistOut(
            group,
            occupied,
            occupied.map(counters(_)),
            counters.sum))
      }
  }
}
