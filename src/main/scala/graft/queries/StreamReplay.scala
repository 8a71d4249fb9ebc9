package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.fixtures.Fixtures
import graft.streaming.{StreamingHist, StreamingTopK}

/** Driver-checkable batch replays of the streaming sketch twins.
  *
  * StreamingHist and StreamingTopK carry a bit-exactness contract: because
  * their state merges are order-free (additive counters; order-statistic
  * selection), the state after ANY micro-batch split of a dataset equals
  * the batch sketch of the same rows. The specs assert that against the
  * batch operators in-JVM; these entries put the SAME contract under the
  * driver's DuckDB differential gate — each runs the real streaming
  * operator (MemoryStream → flatMapGroupsWithState → memory sink) over a
  * deterministic 3-way split of the events fixture and emits the FINAL
  * state as a plain DataFrame whose oracle is the batch computation in
  * SQL. A regression in the streaming state merge now fails correctness,
  * not just a unit test.
  *
  * Harness note: the driver-side `collect()` feeding MemoryStream is the
  * REPLAY HARNESS, not the operator — micro-batch boundaries must be
  * controlled to mean anything, and MemoryStream is fed from the driver by
  * design. The operator's shuffle, state store, and merge all run
  * distributed; at production scale the same operators consume a real
  * stream ([[graft.streaming.StreamDriver]]'s sources), never a collect.
  */
object StreamReplay {

  private val numBatches = 3
  private val ids = new AtomicInteger()

  /** (event_type, cents) rows split deterministically by seq % 3 — the
    * replay's micro-batch boundaries. The split is ARBITRARY by contract
    * (any split must yield the same final state); determinism just keeps
    * reruns identical. */
  private def batches(spark: SparkSession, sfDir: String): IndexedSeq[Seq[(String, Long)]] = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val rows = spark.table("raw")
      .filter($"cents".isNotNull && $"event_type".isNotNull)
      .select($"event_type", $"cents", ($"seq" % numBatches).as("b"))
      .as[(String, Long, Long)].collect()
    (0 until numBatches).map(i =>
      rows.iterator.filter(_._3 == i).map(r => (r._1, r._2)).toSeq)
  }

  /** Run a streaming pipeline over the replay batches and return the full
    * Update-mode emission log. */
  private def replay[I, O](spark: SparkSession, sfDir: String, tag: String)
      (pipe: org.apache.spark.sql.Dataset[(String, Long)] => org.apache.spark.sql.Dataset[O]): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val name = s"${tag}_${ids.incrementAndGet()}"
    val q = pipe(in.toDS()).toDF().writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Update).start()
    try batches(spark, sfDir).foreach { b =>
      in.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  /** Final streaming log₂-histogram state per event type, exploded to
    * (event_type, bin, n) rows — oracle: the batch binning over the same
    * filter, i.e. `events_hist_quantiles`' first CTE. The final state per
    * group is the emission with the largest running total (totals are
    * non-decreasing; equal totals ⇒ identical counters). */
  def histReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val log = replay(spark, sfDir, "hist_replay") { ds =>
      StreamingHist.hists(ds.map { case (g, v) => StreamingHist.ValueIn(g, v) })
    }
    log.groupBy($"group")
      .agg(max_by(struct($"bins", $"counts"), $"total").as("s"))
      .select($"group".as("event_type"),
        explode(arrays_zip($"s.bins", $"s.counts")).as("bc"))
      .select($"event_type", $"bc.bins".cast(IntegerType).as("bin"),
        $"bc.counts".cast(LongType).as("n"))
  }

  val histReplayOracle: String = Fixtures.oracle(
    s"""
       SELECT event_type,
              CAST(${graft.functions.Log2Bin.binSql("cents")} AS INT) AS bin,
              COUNT(1) AS n
       FROM raw
       WHERE cents >= 1 AND cents IS NOT NULL AND event_type IS NOT NULL
       GROUP BY 1, 2""")

  /** Final streaming top-5 state per event type, exploded to
    * (event_type, rank, value) — oracle: the k largest cents per type via
    * ROW_NUMBER (the projected value sequence is a pure function of the
    * multiset even when the tied ROWS are arbitrary). The final state per
    * group is the lexicographically largest emission: order statistics
    * only ratchet upward, so later states dominate element-wise. */
  def topkReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val log = replay(spark, sfDir, "topk_replay") { ds =>
      StreamingTopK.tops(ds.map { case (g, v) => StreamingTopK.ValueIn(g, v) }, 5)
    }
    log.groupBy($"group").agg(max($"topk").as("topk"))
      .select($"group".as("event_type"), posexplode($"topk"))
      .toDF("event_type", "pos", "value")
      .select($"event_type", ($"pos" + 1).cast(LongType).as("rank"), $"value")
  }

  val topkReplayOracle: String = Fixtures.oracle(
    """
       SELECT event_type, CAST(rn AS BIGINT) AS rank, value FROM (
         SELECT event_type, cents AS value,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY cents DESC) AS rn
         FROM raw
         WHERE cents IS NOT NULL AND event_type IS NOT NULL)
       WHERE rn <= 5""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "streaming_hist_replay" -> (histReplay _),
    "streaming_topk_replay" -> (topkReplay _))

  val oracles: Map[String, String] = Map(
    "streaming_hist_replay" -> histReplayOracle,
    "streaming_topk_replay" -> topkReplayOracle)
}
