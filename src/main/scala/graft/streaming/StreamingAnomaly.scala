package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental z-score anomaly detection over an event stream — the
  * streaming face of the batch data-QA operator
  * (graft.queries.Sessions.anomalyZscore).
  *
  * State is keyed by user (the same key the batch aggregate shuffles on),
  * holding the user's exact running moments (n, Σx, Σx²) as longs — cents
  * are bounded, so Σx² stays well inside a long for any realistic per-user
  * history; a 100 TB deployment would swap the state class to BigDecimal
  * strings without touching the operator shape.
  *
  * Semantics differ from batch BY DESIGN: the batch operator scores every
  * event against the user's FULL-history moments; the streaming operator
  * scores each arriving event against the moments of everything seen
  * BEFORE it (its honest prefix — a detector cannot consult the future).
  * The spec pins both: prefix scoring for flags, and end-of-stream state
  * that matches the batch moments exactly.
  */
object StreamingAnomaly {

  case class EventIn(user_id: Long, seq: Long, cents: Long)

  /** Exact running moments. */
  case class Moments(n: Long, sum: Long, sumSq: Long)

  /** An event flagged against its prefix moments. */
  case class Anomaly(user_id: Long, seq: Long, cents: Long, z: Double)

  /** Minimum prefix size before scoring: with fewer than `minN` prior
    * events the moment estimates are noise (and n = 1 would divide by a
    * zero variance). Same spirit as the batch operator's zero-variance
    * filter. */
  val minN = 8

  def detect(events: Dataset[EventIn], threshold: Double = 3.0): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Moments, Anomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventIn], state: GroupState[Moments]) =>
          var m = state.getOption.getOrElse(Moments(0L, 0L, 0L))
          val out = Seq.newBuilder[Anomaly]
          // within a micro-batch, replay in sequence order so the prefix
          // each event is scored against is deterministic under retries
          for (e <- rows.toSeq.sortBy(_.seq)) {
            if (m.n >= minN) {
              val num = e.cents.toDouble * m.n - m.sum.toDouble
              val den = math.sqrt((m.n.toDouble * m.sumSq) - (m.sum.toDouble * m.sum))
              if (den > 0 && math.abs(num / den) >= threshold)
                out += Anomaly(user, e.seq, e.cents, num / den)
            }
            m = Moments(m.n + 1, m.sum + e.cents, m.sumSq + e.cents * e.cents)
          }
          state.update(m)
          out.result().iterator
      }
  }
}
