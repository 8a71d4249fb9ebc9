package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** No-progress liveness watchdog (T9, index.ts:26-46): the reference exits
  * when no blocks arrive within NO_BLOCKS_TIMEOUT_MS. Spark-side equivalent:
  * a StreamingQueryListener tracking the last input-carrying progress PER
  * QUERY (a session-level listener receives every query's events — one
  * shared timer would let any healthy query mask another query's stall).
  * `onStall` fires once per stall episode per query (latched; re-armed by
  * the next input-carrying batch), so a supervision callback is an alert,
  * not a per-trigger alarm storm. Callers can also poll [[stalled]].
  *
  * The clock is injectable because the listener events themselves cannot be
  * constructed outside `org.apache.spark.sql` — the `record*` methods are
  * the testable surface the Spark callbacks delegate to.
  */
final class LivenessMonitor(timeoutMs: Long = 300000L,
    onStall: () => Unit = () => (),
    now: () => Long = () => System.currentTimeMillis()) extends StreamingQueryListener {

  private val lastProgressAt = new ConcurrentHashMap[UUID, Long]()
  private val alerted = ConcurrentHashMap.newKeySet[UUID]()

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    recordStart(event.id)

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    recordProgress(event.progress.id, event.progress.numInputRows)

  override def onQueryIdle(event: QueryIdleEvent): Unit = recordIdle(event.id)

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    recordTerminated(event.id)

  private[graft] def recordStart(id: UUID): Unit =
    lastProgressAt.put(id, now())

  private[graft] def recordProgress(id: UUID, inputRows: Long): Unit =
    if (inputRows > 0) {
      lastProgressAt.put(id, now())
      alerted.remove(id)
    } else check(id)

  private[graft] def recordIdle(id: UUID): Unit = check(id)

  private[graft] def recordTerminated(id: UUID): Unit = {
    lastProgressAt.remove(id)
    alerted.remove(id)
  }

  private def check(id: UUID): Unit = {
    // computeIfAbsent, not getOrDefault: a query whose async started-event
    // was missed (listener registered after start()) must begin being
    // tracked at its FIRST observed event, or a stalled-from-birth query
    // would read `last = now()` forever and never alert
    val last = lastProgressAt.computeIfAbsent(id, _ => now())
    if (now() - last > timeoutMs && alerted.add(id)) onStall()
  }

  /** True when ANY tracked query has seen no input rows within the timeout. */
  def stalled: Boolean = {
    val t = now()
    lastProgressAt.values().stream().anyMatch(v => t - v > timeoutMs)
  }

  /** Millis since the last input-carrying batch of the most-stalled tracked
    * query (0 when nothing is tracked). */
  def sinceLastProgressMs: Long = {
    val t = now()
    val it = lastProgressAt.values().iterator()
    var max = 0L
    while (it.hasNext) { val d = t - it.next(); if (d > max) max = d }
    max
  }
}
