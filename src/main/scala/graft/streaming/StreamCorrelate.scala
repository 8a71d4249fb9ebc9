package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream windowed equi-join with bounded state.
  *
  * Joins two live streams on an equality key plus a time-window condition
  * (`right.ts` within `[left.ts - windowSecs, left.ts]`). Both sides carry a
  * watermark, and the range condition is what lets Spark BOUND the join
  * state: each side only buffers rows until the other side's watermark
  * passes the end of their possible match window — without the range
  * predicate, stream-stream join state grows with stream history and a
  * 100 TB/day deployment OOMs. Matches emit as soon as both rows have
  * arrived (inner-join append semantics); state eviction, not emission,
  * is what the watermark gates.
  */
object StreamCorrelate {

  /** `left` and `right` must expose `user_id` and a `ts` timestamp column;
    * columns are prefixed to keep the join output unambiguous. */
  def windowJoin(
      left: DataFrame,
      right: DataFrame,
      windowSecs: Long,
      watermark: String = "1 hour"): DataFrame = {
    val l = left.toDF(left.columns.map("l_" + _): _*).withWatermark("l_ts", watermark)
    val r = right.toDF(right.columns.map("r_" + _): _*).withWatermark("r_ts", watermark)
    l.join(r,
      expr(s"""l_user_id = r_user_id AND
               r_ts BETWEEN l_ts - INTERVAL $windowSecs SECONDS AND l_ts"""))
  }
}
