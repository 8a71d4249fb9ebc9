package graft.util

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** Atomic build-once keyed registry: concurrent first touch of a key blocks
  * on ONE build instead of racing duplicates (TrieMap.getOrElseUpdate can
  * evaluate the thunk twice under a first-touch race and discard one result
  * — duplicate work plus an orphaned artifact when the build writes a temp
  * root; VERDICT r13/r14).
  *
  * Not a raw `ConcurrentHashMap.computeIfAbsent` around the build: several
  * builds NEST through the same registry (Memo's ppjoin result builds its
  * candidate memo mid-build), and CHM forbids updating the map from inside
  * a compute — same-bin recursion throws `IllegalStateException`. Instead
  * computeIfAbsent installs only a cheap lazy HOLDER (no user code runs
  * inside the map operation) and the build runs under the holder's own
  * monitor, so nested touches of other keys are plain independent lazy
  * initializations. A build that THROWS leaves the holder uninitialized —
  * the next touch retries (same contract as getOrElseUpdate).
  */
final class KeyedOnce[K, V] {

  private final class Entry(build: () => V) {
    @volatile private[KeyedOnce] var built = false
    lazy val value: V = { val v = build(); built = true; v }
  }

  private val entries = new ConcurrentHashMap[K, Entry]()

  /** The value for `key`, building it (once, under the entry's monitor) on
    * first touch. */
  def apply(key: K)(build: => V): V =
    entries.computeIfAbsent(key, _ => new Entry(() => build)).value

  /** The COMPLETED value for `key`: None while absent or still building —
    * matching the old TrieMap semantics, where an entry appeared only
    * after its build returned. */
  def get(key: K): Option[V] = {
    val e = entries.get(key)
    if (e != null && e.built) Some(e.value) else None
  }

  /** Drop `key`, returning its value IF the build had completed — a caller
    * freeing resources must not trigger a build just to free it, and must
    * not block on an in-flight one (an in-flight build completes orphaned:
    * its artifacts live until session teardown, the pre-existing release
    * race, now without a double-build). */
  def remove(key: K): Option[V] = {
    val e = entries.remove(key)
    if (e != null && e.built) Some(e.value) else None
  }

  /** Snapshot of the current keys (completed and in-flight). */
  def keys: Iterable[K] = entries.keySet().asScala.toVector
}
