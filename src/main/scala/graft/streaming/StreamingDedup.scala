package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.TextFingerprint

/** Incremental deduplication over a document stream — the streaming face of
  * the batch dedup ladder (graft.queries.Dedup), built on
  * `flatMapGroupsWithState` (SURVEY §2.10; the reference has no unordered
  * streams, T8, but a training-data ingest pipeline does).
  *
  * Both operators keep the batch design's scale property: state is keyed by
  * a content-derived blocking key (text hash / SimHash band), so the state
  * store partitions by the same key the batch shuffle would, and no
  * cross-key state exists anywhere.
  *
  *  - [[exactDedup]]: key = SHA-256 of the text; state = the canonical
  *    (first-seen, min doc_id within its arrival batch) doc id. Every
  *    arriving doc gets a verdict row immediately (Append mode).
  *  - [[simhashPairs]]: key = (band, 16-bit band chunk) of the 64-bit
  *    SimHash — exactly the batch query's blocking — state = docs seen in
  *    the bucket; an arriving doc emits a candidate pair per state member
  *    within Hamming ≤ 12 (deduplicate across bands downstream, as the
  *    batch query's `distinct` does). State per bucket grows with bucket
  *    occupancy, the same ~N/2^16 factor that bounds the batch self-join.
  */
object StreamingDedup {

  case class DocIn(doc_id: Long, text: String)
  case class DupVerdict(doc_id: Long, canonical_doc_id: Long, is_duplicate: Boolean)
  case class NearDupPair(doc_a: Long, doc_b: Long, hamming: Int, band: Int)

  def textSha(text: String): String =
    MessageDigest.getInstance("SHA-256").digest(text.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** 64-bit SimHash of a document via the same native fold as the batch
    * query (graft_simhash64_bands), driver/executor-side; the four 16-bit
    * band chunks pack into one long (chunk b at bits [16b, 16b+16)), so
    * Hamming distance is one `bitCount(xor)` and band keys are shifts. */
  def simhash(text: String): Long = {
    val chunks = TextFingerprint.simhash64Bands(new GenericArrayData(
      text.split(" ", -1).map(w => UTF8String.fromString(w): Any)))
    (0 until 4).map(b => chunks.getLong(b) << (16 * b)).reduce(_ | _)
  }

  /** Streaming exact dedup: one verdict per arriving document; the first
    * group member to arrive (min doc_id within its micro-batch) is
    * canonical for the group forever. */
  def exactDedup(docs: Dataset[DocIn]): Dataset[DupVerdict] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => textSha(d.text))
      .flatMapGroupsWithState[Long, DupVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[DocIn], state: GroupState[Long]) =>
          val batch = rows.toSeq.sortBy(_.doc_id)
          val canonical = state.getOption.getOrElse(batch.head.doc_id)
          state.update(canonical)
          batch.iterator.map(d =>
            DupVerdict(d.doc_id, canonical, d.doc_id != canonical))
      }
  }

  /** Streaming SimHash near-dup candidates: same 4×(16-bit band chunk)
    * blocking as the batch query, Hamming ≤ 12 verified against bucket
    * state. */
  def simhashPairs(docs: Dataset[DocIn]): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    docs
      .map(d => (d.doc_id, simhash(d.text)))
      .flatMap { case (id, fp) =>
        (0 until 4).map(b => (b, ((fp >>> (16 * b)) & 65535L).toInt, id, fp))
      }
      .groupByKey { case (b, key, _, _) => (b, key) }
      .flatMapGroupsWithState[Seq[(Long, Long)], NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: (Int, Int), rows: Iterator[(Int, Int, Long, Long)],
            state: GroupState[Seq[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[NearDupPair]
          for ((_, _, id, fp) <- rows.toSeq.sortBy(_._3)) {
            // re-delivery of a doc_id already in state must not produce a
            // (id, id) self-pair or a duplicate state entry — the batch
            // self-join excludes both via doc_id < doc_id
            if (!seen.exists(_._1 == id)) {
              for ((sid, sfp) <- seen) {
                val hamming = java.lang.Long.bitCount(fp ^ sfp)
                if (hamming <= 12) {
                  val (a, b) = if (sid < id) (sid, id) else (id, sid)
                  out += NearDupPair(a, b, hamming, bucket._1)
                }
              }
              seen :+= ((id, fp))
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }
}
