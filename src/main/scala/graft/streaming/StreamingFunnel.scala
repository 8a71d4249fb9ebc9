package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental conversion funnel — the streaming face of the batch
  * `events_funnel` (graft.queries.Sessions.funnel): per user the earliest
  * view (s1), the earliest qualifying click after it (s2: `seq > s1` and
  * within the 150-bucket window `seq div 8 − s1 div 8 ≤ 150`), the earliest
  * qualifying purchase after that (s3); the user's stage is the deepest
  * milestone reached. State per user is exactly three optional longs —
  * bounded whatever the history length, unlike a naive "keep the user's
  * events" design.
  *
  * In-order contract (the same one the sessions twin documents): events are
  * processed in `seq` order — each micro-batch replays its rows sorted, and
  * cross-batch order is the feed's, which the cursor-ordered block stream
  * guarantees. Under that order the greedy transition equals the batch
  * fixed-point: the first view IS min(view); once s1 is final, the first
  * qualifying click IS the min qualifying click; likewise s3. (Division:
  * Scala `/` on non-negative longs truncates exactly like Spark's DIV and
  * DuckDB's integer `//`, so the window arithmetic is the batch
  * operator's.) The spec asserts the stage histogram equals the batch
  * operator after EVERY micro-batch prefix, equals `Sessions.funnel`'s
  * output exactly at end of stream, and survives checkpoint restart.
  */
object StreamingFunnel {

  case class EventIn(user_id: Long, event_type: String, seq: Long)

  /** Milestone seqs; -1 = not reached. */
  case class FunnelState(s1: Long, s2: Long, s3: Long)

  /** The user's deepest stage after the batch (Update-mode emission: the
    * latest row per user is the current stage). */
  case class UserStage(user_id: Long, stage: Long)

  /** The batch operator's window constants — ONE shared definition
    * (graft.queries.Sessions), so twin and batch can never drift. */
  val windowBuckets: Long = graft.queries.Sessions.funnelWindowBuckets
  val bucketWidth: Long = graft.queries.Sessions.funnelBucketWidth

  private def stageOf(st: FunnelState): Long =
    if (st.s3 >= 0) 3L else if (st.s2 >= 0) 2L else if (st.s1 >= 0) 1L else 0L

  def stages(events: Dataset[EventIn]): Dataset[UserStage] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, UserStage](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventIn], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          for (e <- rows.toSeq.sortBy(_.seq)) {
            e.event_type match {
              case "view" if st.s1 < 0 =>
                st = st.copy(s1 = e.seq)
              case "click" if st.s2 < 0 && st.s1 >= 0 && e.seq > st.s1 &&
                  e.seq / bucketWidth - st.s1 / bucketWidth <= windowBuckets =>
                st = st.copy(s2 = e.seq)
              case "purchase" if st.s3 < 0 && st.s2 >= 0 && e.seq > st.s2 &&
                  e.seq / bucketWidth - st.s2 / bucketWidth <= windowBuckets =>
                st = st.copy(s3 = e.seq)
              case _ =>
            }
          }
          state.update(st)
          Iterator.single(UserStage(user, stageOf(st)))
      }
  }
}
