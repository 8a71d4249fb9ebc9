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
  */
final class LivenessMonitor(timeoutMs: Long = 300000L,
    onStall: () => Unit = () => ()) extends StreamingQueryListener {

  private val lastProgressAt = new ConcurrentHashMap[UUID, Long]()
  private val alerted = ConcurrentHashMap.newKeySet[UUID]()

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    lastProgressAt.put(event.id, System.currentTimeMillis())

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val id = event.progress.id
    if (event.progress.numInputRows > 0) {
      lastProgressAt.put(id, System.currentTimeMillis())
      alerted.remove(id)
    } else check(id)
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = check(event.id)

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    lastProgressAt.remove(event.id)
    alerted.remove(event.id)
  }

  private def check(id: UUID): Unit = {
    val last = lastProgressAt.getOrDefault(id, System.currentTimeMillis())
    if (System.currentTimeMillis() - last > timeoutMs && alerted.add(id)) onStall()
  }

  /** True when ANY tracked query has seen no input rows within the timeout. */
  def stalled: Boolean = {
    val now = System.currentTimeMillis()
    lastProgressAt.values().stream().anyMatch(t => now - t > timeoutMs)
  }

  /** Millis since the last input-carrying batch of the most-stalled tracked
    * query (0 when nothing is tracked). */
  def sinceLastProgressMs: Long = {
    val now = System.currentTimeMillis()
    val it = lastProgressAt.values().iterator()
    var max = 0L
    while (it.hasNext) { val d = now - it.next(); if (d > max) max = d }
    max
  }
}
