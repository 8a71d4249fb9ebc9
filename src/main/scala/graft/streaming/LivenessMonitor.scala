package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** No-progress liveness watchdog (T9, index.ts:26-46): the reference exits
  * when no blocks arrive within NO_BLOCKS_TIMEOUT_MS. Spark-side equivalent:
  * a StreamingQueryListener tracking the last progress timestamp; callers
  * poll [[stalled]] (or wire `onStall`) from their supervision loop.
  */
final class LivenessMonitor(timeoutMs: Long = 300000L,
    onStall: () => Unit = () => ()) extends StreamingQueryListener {

  private val lastProgressAt = new AtomicLong(System.currentTimeMillis())

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    lastProgressAt.set(System.currentTimeMillis())

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    if (event.progress.numInputRows > 0)
      lastProgressAt.set(System.currentTimeMillis())
    if (stalled) onStall()
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit =
    if (stalled) onStall()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  /** True when no input rows have been seen within the timeout. */
  def stalled: Boolean =
    System.currentTimeMillis() - lastProgressAt.get() > timeoutMs

  /** Millis since the last batch that carried input rows. */
  def sinceLastProgressMs: Long = System.currentTimeMillis() - lastProgressAt.get()
}
