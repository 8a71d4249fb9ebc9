package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming HyperLogLog distinct-user estimation per event type — the
  * streaming face of `events_distinct_hll` (graft.queries.Sessions),
  * built on `mapGroupsWithState`.
  *
  * State per group is the 256-register array itself (one byte per
  * register, mj ≤ 25 under the 32-bit hash) — 256 B forever, whatever
  * the user population does. Registers merge by MAX, which is order-free
  * and idempotent, so the twin carries the repo's standard bit-exactness
  * contract: state after ANY micro-batch split equals the batch sketch
  * of the same rows. Emission is Update-mode: one refreshed
  * (s2, v_zero) summary per group per batch, tagged with the monotone
  * rows-seen counter so the replay entry selects the latest snapshot.
  *
  * The hash, register split (j = h mod 256, w = h div 256) and rank
  * (rho = 25 − bitlength(w), 25 at w = 0) are the batch operator's
  * integer formulas verbatim — the only float in the whole family stays
  * in the final estimate constant, computed OUTSIDE the stream.
  */
object StreamingHll {

  case class EvIn(event_type: String, user_id: Long)
  case class HllSnap(event_type: String, s2: Long, v_zero: Long, n_seen: Long)

  /** (seen counter, 256 register maxima). */
  case class State(seen: Long, regs: Array[Byte])

  /** The batch operator's Knuth hash, verbatim. */
  def hash(u: Long): Long = ((u % 2147483648L) * 2654435761L) % 4294967296L

  /** rho = 25 − bitlength(h div 256); 25 when the quotient is 0. */
  def rho(h: Long): Int = {
    val w = h / 256
    if (w == 0) 25 else 25 - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  /** Pure state transition (spec-testable without a streaming query). */
  def merge(st: State, users: Iterator[Long]): State = {
    val regs = st.regs.clone()
    var seen = st.seen
    users.foreach { u =>
      seen += 1
      val h = hash(u)
      val j = (h % 256).toInt
      val r = rho(h)
      if (r > regs(j)) regs(j) = r.toByte
    }
    State(seen, regs)
  }

  /** Snapshot summary: s2 = Σ 2^(25 − mj), v_zero = #{mj = 0}. */
  def summarize(event_type: String, st: State): HllSnap = {
    var s2 = 0L
    var vz = 0L
    var j = 0
    while (j < 256) {
      s2 += 1L << (25 - st.regs(j))
      if (st.regs(j) == 0) vz += 1
      j += 1
    }
    HllSnap(event_type, s2, vz, st.seen)
  }

  /** One refreshed register summary per event type per micro-batch. */
  def sketches(events: Dataset[EvIn]): Dataset[HllSnap] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .mapGroupsWithState[State, HllSnap](GroupStateTimeout.NoTimeout) {
        (et: String, rows: Iterator[EvIn], state: GroupState[State]) =>
          val st = merge(state.getOption.getOrElse(State(0L, new Array[Byte](256))),
            rows.map(_.user_id))
          state.update(st)
          summarize(et, st)
      }
  }
}
