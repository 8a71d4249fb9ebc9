package graft

import java.util.UUID

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LivenessMonitor

/** Stall-detection semantics with a manual clock (T9): per-query timers,
  * latched alerts, re-arm on input-carrying progress. */
class LivenessMonitorSpec extends AnyFunSuite {

  private def monitor(timeoutMs: Long) = {
    var clock = 0L
    var alerts = 0
    val m = new LivenessMonitor(timeoutMs, () => alerts += 1, () => clock)
    (m, (t: Long) => clock = t, () => alerts)
  }

  test("a query is stalled only after timeoutMs without input rows") {
    val (m, setClock, _) = monitor(100L)
    val q = UUID.randomUUID()
    m.recordStart(q)
    assert(!m.stalled)
    setClock(100L)
    assert(!m.stalled) // boundary: exactly timeout is not yet a stall
    setClock(101L)
    assert(m.stalled)
    assert(m.sinceLastProgressMs == 101L)
  }

  test("onStall fires once per episode and re-arms on input progress") {
    val (m, setClock, alerts) = monitor(100L)
    val q = UUID.randomUUID()
    m.recordStart(q)
    setClock(200L)
    m.recordIdle(q)
    m.recordIdle(q)
    m.recordProgress(q, 0L) // empty batch also must not re-fire
    assert(alerts() == 1)

    m.recordProgress(q, 5L) // input re-arms the latch and resets the timer
    assert(!m.stalled)
    setClock(500L)
    m.recordIdle(q)
    assert(alerts() == 2)
  }

  test("a healthy query does not mask another query's stall") {
    val (m, setClock, alerts) = monitor(100L)
    val healthy = UUID.randomUUID()
    val stuck = UUID.randomUUID()
    m.recordStart(healthy)
    m.recordStart(stuck)
    setClock(90L)
    m.recordProgress(healthy, 10L)
    setClock(150L)
    assert(m.stalled) // stuck is 150ms without input even though healthy is fresh
    m.recordIdle(stuck)
    assert(alerts() == 1)
    assert(m.sinceLastProgressMs == 150L)
  }

  test("a query with a missed started-event is tracked from its first observed event") {
    val (m, setClock, alerts) = monitor(100L)
    val q = UUID.randomUUID()
    m.recordIdle(q) // listener registered after start(): no recordStart seen
    assert(!m.stalled)
    setClock(200L)
    m.recordIdle(q) // 200ms since first observation -> stall must be detected
    assert(m.stalled)
    assert(alerts() == 1)
  }

  test("terminated queries stop being tracked") {
    val (m, setClock, alerts) = monitor(100L)
    val q = UUID.randomUUID()
    m.recordStart(q)
    setClock(500L)
    assert(m.stalled)
    m.recordTerminated(q)
    assert(!m.stalled)
    assert(m.sinceLastProgressMs == 0L)
    m.recordIdle(q) // idle for an untracked id must not alert
    assert(alerts() == 0)
  }
}
