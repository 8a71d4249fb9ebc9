package graft.queries

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.fixtures.Fixtures
import graft.functions.TextHash
import graft.streaming.{StreamingCms, StreamingHist, StreamingKmv, StreamingTopK}

/** Driver-checkable batch replays of the streaming sketch twins.
  *
  * StreamingHist, StreamingTopK, StreamingCms, and StreamingKmv all carry a
  * bit-exactness contract: because their state merges are order-free
  * (additive counters; order-statistic selection; k-min set union), the
  * state after ANY micro-batch split of a dataset equals the batch sketch
  * of the same rows. The specs assert that against the
  * batch operators in-JVM; these entries put the SAME contract under the
  * driver's DuckDB differential gate — each runs the real streaming
  * operator over a deterministic 3-way split of the fixture and emits the
  * FINAL state as a plain DataFrame whose oracle is the batch computation
  * in SQL. A regression in the streaming state merge now fails
  * correctness, not just a unit test.
  *
  * Harness transport (round 12, VERDICT r11 #3): each deterministic batch
  * is written EXECUTOR-SIDE as its own parquet directory (a filter over
  * the fixture scan — no driver materialization), then moved file-by-file
  * into a watched directory consumed by Spark's file streaming source, one
  * move + `processAllAvailable` per micro-batch. The previous MemoryStream
  * harness collected the whole fixture to the driver and shipped it in the
  * task closure (~1.9 MiB task binaries at sf0.1, O(corpus) driver heap);
  * the file feed keeps the same batch boundaries with O(1) driver state —
  * the harness now has the same scale shape as the operators under test.
  *
  * Batch-boundary determinism: the order-free twins split by
  * `seq % 3` / `doc_id % 3` (any split is contractually equivalent); the
  * order-SENSITIVE twins (funnel, dedup) split by contiguous VALUE ranges
  * of their order key — computed from a 1-row min/max aggregate, no global
  * sort, no unpartitioned window — which preserves the in-order-prefix
  * contract (each group's rows arrive in ascending key ranges, and the
  * operators sort within a micro-batch group themselves).
  */
object StreamReplay {

  private val numBatches = 3

  /** The stream's state-store dimensionality AND the staged batch dirs'
    * part-file count (one shared constant — ADVICE r15: the two must move
    * together or the small-files overhead silently returns). */
  private val replayPartitions = 4

  /** Pin shuffle partitions to [[replayPartitions]] for the streaming
    * query: a streaming query snapshots spark.sql.shuffle.partitions at
    * START as its state-store dimensionality, and the replay twins keep
    * state for a handful of groups — 32 state partitions is pure per-batch
    * task overhead in the correctness gate (~2 s per entry, measured).
    * Production sizes this knob for throughput; the gate sizes it for its
    * state cardinality.
    *
    * Also disables no-data micro-batches for the stream (VERDICT r15 #2):
    * with them on, every data batch of the watermarked sessions replay was
    * followed by a watermark-flush EMPTY batch — 10 triggers for 5 links,
    * each paying full addBatch/walCommit/commitOffsets machinery (~0.45 s
    * warm, measured via ReplayProbe). Emission semantics are unchanged for
    * ANY replay entry: a no-data batch only emits what the next DATA batch
    * would emit anyway (the watermark is recomputed from the same inputs),
    * and every replay closes with inputs — sessions' two far-future
    * sentinel batches — that push the watermark past all real state, so
    * the final emission set is identical (the differential gate proves it
    * per entry). Both confs restored in finally; the catalog runs queries
    * sequentially. */
  private def withReplayPartitions[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    val prevNd = spark.conf.get(ndKey)
    spark.conf.set(key, replayPartitions.toString)
    spark.conf.set(ndKey, "false")
    try body finally {
      spark.conf.set(key, prev)
      spark.conf.set(ndKey, prevNd)
    }
  }

  /** Staged micro-batch inputs, ONE write per (session, sfDir, entry)
    * (VERDICT r14 #3 on the replay bench floor): the split frames are
    * deterministic, so re-writing them on every run — 3 parquet write
    * jobs per entry per bench PASS, ~13 entries × 2 passes — was pure
    * fixed overhead. The first run stages; every later run (the bench's
    * warm pass, repeated catalog passes, the stats consumers) hard-links
    * the committed part files into its own watch directory, a
    * metadata-only operation. Atomic first touch via [[graft.util.KeyedOnce]];
    * cleaned by a JVM shutdown hook (the dirs must outlive every
    * consumer in the session). */
  private val staged =
    new graft.util.KeyedOnce[(SparkSession, String, String), String]

  /** Run `pipe` over `batched` (a frame whose `b` column holds the 0-based
    * micro-batch index; the remaining columns must match `I`'s encoder
    * schema) through a parquet file stream, one batch per trigger. The
    * per-batch frames are written by executors — once per session, see
    * [[staged]] — and the driver only hard-links the committed part files
    * into the watched directory: nothing row-sized ever crosses it.
    * Returns the full emission log.
    *
    * The emission log is a parquet FILE sink too (via foreachBatch, which
    * unlike the built-in file sink accepts Update mode): each micro-batch's
    * emissions are appended by executor tasks, so the log never lands on
    * the driver — the round-12 memory sink held it in driver memory,
    * O(output) heap and the documented ~20 MB task binaries at the 100×
    * soak. The read-back is eagerly localCheckpoint'd (block-manager
    * storage, disk-spillable) so the whole staging directory can be
    * deleted before the entry's downstream aggregation runs — same tmp
    * hygiene as before, same O(1) driver state as the operators under
    * test. */
  private def replayViaFiles[I](spark: SparkSession, sfDir: String, tag: String,
      batched: => DataFrame, mode: OutputMode, nb: Int = numBatches)
      (pipe: Dataset[I] => Dataset[_])
      (implicit enc: Encoder[I]): DataFrame = {
    val src = staged((spark, sfDir, tag)) {
      val root = Files.createTempDirectory(s"graft-replay-stage-$tag-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(root)))
      val df = batched
      (0 until nb).foreach { i =>
        // coalesce to the stream's own partition count (4, see
        // withReplayPartitions): the batched frame carries the session's 32
        // shuffle partitions, so an uncoalesced write leaves ~32 tiny part
        // files per batch dir and every micro-batch scan pays ~32 file-open
        // tasks for a handful of rows each (opt guide §6: small files hurt
        // twice) — measured as 32-task scan stages inside each replay
        df.filter(col("b") === i).drop("b").coalesce(replayPartitions)
          .write.parquet(s"$root/b$i")
      }
      root.toString
    }
    val stage = Files.createTempDirectory(s"graft-replay-$tag-")
    try {
      val watch = s"$stage/watch"
      Files.createDirectories(Paths.get(watch))
      // Per-batch emissions are captured as eagerly localCheckpoint'd
      // frames (executor block-manager storage, memory-and-disk, O(1)
      // driver state) instead of the former per-batch parquet append +
      // post-stream read-back: each append paid the full Hadoop commit
      // protocol (task commits + job commit + _SUCCESS fsyncs, one job per
      // micro-batch) and the read-back paid listing + footer decode +
      // ANOTHER materialization — all harness transport, none of it the
      // operator under test (~0.1-0.25 s per batch, measured via
      // ReplayProbe's addBatch breakdown). The log content is identical:
      // the union of the same batch frames in batch order.
      val batches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val outSchema = withReplayPartitions(spark) {
        val in = spark.readStream.schema(enc.schema).parquet(watch).as[I](enc)
        val piped = pipe(in).toDF()
        // The foreachBatch frame is bound to the stream's CLONED session
        // (where the replay confs are snapshotted); the checkpointed blocks
        // must be re-adopted into the CALLER's session or the returned
        // frame would register temp views and resolve confs against the
        // clone (CatalogSpec caught exactly that).
        val emit: (DataFrame, Long) => Unit =
          (batch, _) => batches.synchronized {
            batches += adopt(spark, batch.localCheckpoint(true)); ()
          }
        val q = piped.writeStream.outputMode(mode).foreachBatch(emit).start()
        try (0 until nb).foreach { i =>
          linkParts(Paths.get(s"$src/b$i"), Paths.get(watch), s"b$i")
          // all newly-visible files land in ONE micro-batch (no
          // maxFilesPerTrigger cap), so the link boundary IS the batch
          // boundary
          q.processAllAvailable()
        } finally q.stop()
        piped.schema
      }
      // explicit schema on the empty path: a replay with zero emissions
      // must come back as an EMPTY frame of the right shape
      batches.synchronized {
        if (batches.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
        else batches.reduce(_ unionByName _)
      }
    } finally {
      // the staged corpus copy is dead weight once the stream is done;
      // leaking one per entry per run fills tmp under the bench/soak loops
      rmTree(stage)
    }
  }

  /** Re-bind a (checkpointed, leaf) frame from the stream's cloned session
    * onto `spark`. The zero-copy path wraps the frame's internal-row RDD via
    * `SparkSession.internalCreateDataFrame` — private[sql] in Scala, public
    * in bytecode (the repo's established reflection idiom: Memo's
    * LogicalRDD.rdd, the bench's listenerBus). Fallback on any reflective
    * surprise: the public `createDataFrame(RDD[Row], schema)`, which pays
    * one external-row conversion over the (output-sized) emission log but
    * is always correct. */
  private def adopt(spark: SparkSession, ck: DataFrame): DataFrame =
    try {
      val m = spark.getClass.getMethods
        .find(m => m.getName == "internalCreateDataFrame" && m.getParameterCount == 3)
        .getOrElse(throw new NoSuchMethodException("internalCreateDataFrame"))
      m.invoke(spark, ck.queryExecution.toRdd, ck.schema, java.lang.Boolean.FALSE)
        .asInstanceOf[DataFrame]
    } catch { case scala.util.control.NonFatal(_) =>
      spark.createDataFrame(ck.toDF().rdd, ck.schema)
    }

  private def rmTree(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) f.listFiles().foreach(c => rmTree(c.toPath))
    f.delete(); ()
  }

  /** Hard-link every committed part file of `src` into `dest` under a
    * batch-unique prefix. The shared staged input is immutable (links,
    * not moves, so [[staged]] survives for the next consumer); a link is
    * metadata-only on the same filesystem, with a copy fallback for
    * filesystems that refuse links. */
  private def linkParts(src: Path, dest: Path, prefix: String): Unit = {
    val s = Files.list(src)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach { p =>
        val d = dest.resolve(s"$prefix-${p.getFileName}")
        try { Files.createLink(d, p); () }
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(p, d, StandardCopyOption.COPY_ATTRIBUTES); () }
      }
    finally s.close()
  }

  /** (event_type, cents) rows with batch index `seq % 3` — the order-free
    * twins' micro-batch boundaries. The split is ARBITRARY by contract
    * (any split must yield the same final state); determinism just keeps
    * reruns identical. */
  private def eventBatches(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("raw")
      .filter($"cents".isNotNull && $"event_type".isNotNull)
      .select($"event_type".as("_1"), $"cents".as("_2"),
        ($"seq" % numBatches).cast("int").as("b"))
  }

  /** (lang, doc_id, text) rows with batch index `doc_id % 3` — the
    * document-fed order-free twins' boundaries. */
  private def docBatches(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents")
      .select($"lang".as("_1"), $"doc_id".as("_2"), $"text".as("_3"),
        ($"doc_id" % numBatches).cast("int").as("b"))
  }

  /** Contiguous-value-range batch index over `key`: batch i holds rows
    * whose key falls in the i-th third of [min, max] — the order-sensitive
    * twins' boundaries. One 1-row min/max aggregate (bounded collect), no
    * sort, no window. */
  private def rangeBatched(df: DataFrame, key: String): DataFrame = {
    val bounds = df.agg(min(col(key)), max(col(key))).head()
    // empty (or all-null-keyed) input: no rows to split — any constant
    // batch index works, and the oracle's empty result is matched by the
    // operator seeing zero rows (a typed Row match would MatchError here)
    if (bounds.isNullAt(0))
      return df.withColumn("b", lit(0).cast("int"))
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val span = mx - mn + 1
    df.withColumn("b", least(lit(numBatches - 1),
      ((col(key) - mn) * numBatches / span).cast("int")))
  }

  /** Final streaming log₂-histogram state per event type, exploded to
    * (event_type, bin, n) rows — oracle: the batch binning over the same
    * filter, i.e. `events_hist_quantiles`' first CTE. The final state per
    * group is the emission with the largest running total (totals are
    * non-decreasing; equal totals ⇒ identical counters). */
  def histReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val log = replayViaFiles[(String, Long)](spark, sfDir, "hist_replay",
      eventBatches(spark, sfDir), OutputMode.Update) { ds =>
      StreamingHist.hists(ds.map { case (g, v) => StreamingHist.ValueIn(g, v) })
    }
    log.groupBy($"group")
      .agg(max_by(struct($"bins", $"counts"), $"total").as("s"))
      .select($"group".as("event_type"),
        explode(arrays_zip($"s.bins", $"s.counts")).as("bc"))
      .select($"event_type", $"bc.bins".cast("int").as("bin"),
        $"bc.counts".cast("long").as("n"))
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
    val log = replayViaFiles[(String, Long)](spark, sfDir, "topk_replay",
      eventBatches(spark, sfDir), OutputMode.Update) { ds =>
      StreamingTopK.tops(ds.map { case (g, v) => StreamingTopK.ValueIn(g, v) }, 5)
    }
    log.groupBy($"group").agg(max($"topk").as("topk"))
      .select($"group".as("event_type"), posexplode($"topk"))
      .toDF("event_type", "pos", "value")
      .select($"event_type", ($"pos" + 1).cast("long").as("rank"), $"value")
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

  /** Final streaming count-min state per language snapshot, probed for the
    * batch operator's probe words — oracle: the per-snapshot count-min
    * sketch computed in SQL (the `text_count_min` arithmetic, partitioned
    * by lang). The final state per (snapshot, word) is the max estimate:
    * counters are additive, so every probe's estimate is non-decreasing
    * across batches. */
  def cmsReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val log = replayViaFiles[(String, Long, String)](spark, sfDir, "cms_replay",
      docBatches(spark, sfDir), OutputMode.Update) { ds =>
      StreamingCms.estimates(
        ds.map { case (s, id, t) => StreamingCms.DocIn(s, id, t) },
        TextOps.cmsProbes)
    }
    log.groupBy($"snapshot", $"word")
      .agg(max($"cm_estimate").as("cm_estimate"))
      .select($"snapshot".as("lang"), $"word", $"cm_estimate")
  }

  val cmsReplayOracle: String = {
    def bucketOf(wh: String, i: String): String =
      s"(($wh * (97 + 31 * $i) + (13 + 17 * $i)) % ${TextHash.P}) % ${TextOps.cmsW}"
    val probeValues = TextOps.cmsProbes.map(p => s"('$p')").mkString(", ")
    Fixtures.oracle(
      s""", scr_words AS (
         SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
       scr_counters AS (
         SELECT lang, i, bucket, COUNT(1) AS cnt FROM (
           SELECT w.lang, CAST(t.i AS INT) AS i,
                  ${bucketOf(TextHash.duckWordHash("w.word"), "t.i")} AS bucket
           FROM scr_words w, UNNEST(range(${TextOps.cmsD})) AS t(i))
         GROUP BY 1, 2, 3),
       scr_probes(word) AS (VALUES $probeValues),
       scr_pb AS (
         SELECT l.lang, p.word, CAST(t.i AS INT) AS i,
                ${bucketOf(TextHash.duckWordHash("p.word"), "t.i")} AS bucket
         FROM (SELECT DISTINCT lang FROM documents) l
         CROSS JOIN scr_probes p, UNNEST(range(${TextOps.cmsD})) AS t(i))
       SELECT p.lang, p.word, MIN(COALESCE(c.cnt, 0)) AS cm_estimate
       FROM scr_pb p
       LEFT JOIN scr_counters c
         ON p.lang = c.lang AND p.i = c.i AND p.bucket = c.bucket
       GROUP BY 1, 2""")
  }

  /** Final streaming KMV state per language snapshot — oracle: the batch
    * k-minimum-values sketch of the same shingle space
    * (`corpus_overlap_kmv`'s per-snapshot CTE) with the same estimator.
    * Final-state selection: k_eff only grows, and once the sketch is full
    * tau only shrinks, so the final emission is argmax of
    * (k_eff, −tau) — while below k the hash SET only grows (no eviction),
    * so equal k_eff implies an identical sketch. */
  def kmvReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 256
    val log = replayViaFiles[(String, Long, String)](spark, sfDir, "kmv_replay",
      docBatches(spark, sfDir), OutputMode.Update) { ds =>
      StreamingKmv.estimates(
        ds.map { case (s, id, t) => StreamingKmv.DocIn(s, id, t) }, k)
    }
    log.groupBy($"snapshot")
      .agg(max_by(struct($"k_eff", $"tau", $"est_distinct"),
        struct($"k_eff", -$"tau")).as("s"))
      .select($"snapshot".as("lang"), $"s.k_eff", $"s.tau",
        round($"s.est_distinct", 3).as("est_distinct"))
  }

  val kmvReplayOracle: String = Fixtures.oracle(
    s""", skr_h AS (
         SELECT DISTINCT lang,
                (${TextHash.duckWordHash("d.words[t.i+1] || ' ' || d.words[t.i+2] || ' ' || d.words[t.i+3]")} * 2654435761) % 4294967296 AS h
         FROM (SELECT lang, string_split(text, ' ') AS words FROM documents) d,
              UNNEST(range(len(d.words) - 2)) AS t(i)
         WHERE len(d.words) >= 3),
       skr_sk AS (
         SELECT lang, list_sort(list(h ORDER BY h))[1:256] AS sk
         FROM skr_h GROUP BY 1)
       SELECT lang,
              CAST(len(sk) AS BIGINT) AS k_eff,
              CASE WHEN len(sk) > 0 THEN sk[len(sk)] ELSE 0 END AS tau,
              ROUND(CASE WHEN len(sk) = 256
                    THEN CAST(255 AS DOUBLE) * 4294967296.0 / CAST(sk[len(sk)] AS DOUBLE)
                    ELSE CAST(len(sk) AS DOUBLE) END, 3) AS est_distinct
       FROM skr_sk""")

  /** Final streaming funnel state replayed IN ORDER — unlike the sketch
    * twins, the funnel's state transition is order-SENSITIVE (a click only
    * counts after the first view), so its replay contract is the in-order
    * prefix one its spec pins: batches are contiguous seq RANGES (the
    * operator sorts within a micro-batch group itself). The final stage
    * per user is the max emission (stages only ratchet up); the oracle is
    * the batch funnel's own SQL, verbatim. */
  def funnelReplay(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    // batched is passed BY NAME: rangeBatched's eager min/max job runs only
    // on first staging (once per session), not on every replay run
    replayViaFiles[graft.streaming.StreamingFunnel.EventIn](
      spark, sfDir, "funnel_replay",
      rangeBatched(spark.table("ek")
        .select($"user_id", $"event_type", $"seq"), "seq"),
      OutputMode.Update)(
      graft.streaming.StreamingFunnel.stages)
      .groupBy($"user_id").agg(max($"stage").as("stage"))
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
  }

  /** Final streaming exact-dedup verdicts replayed in doc-id order: the
    * canonical election is first-arrival, so an id-range-ordered replay's
    * verdicts equal the batch MIN(doc_id)-per-content election (each
    * content group's first-arriving batch holds its minimum id, and the
    * operator elects the min id within a batch) — each doc emits exactly
    * one Append-mode verdict, no final-state selection needed. */
  def dedupReplay(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    // by-name batched: the bounds job runs once per session (see funnelReplay)
    replayViaFiles[graft.streaming.StreamingDedup.DocIn](
      spark, sfDir, "dedup_replay",
      rangeBatched(spark.table("documents")
        .select($"doc_id", $"text"), "doc_id"),
      OutputMode.Append)(
      graft.streaming.StreamingDedup.exactDedup)
      .select($"doc_id", $"canonical_doc_id", $"is_duplicate")
  }

  val dedupReplayOracle: String = Fixtures.oracle(
    """, sdr_c AS (
         SELECT doc_id,
                MIN(doc_id) OVER (PARTITION BY sha256(text)) AS canonical_doc_id
         FROM documents)
       SELECT doc_id, canonical_doc_id,
              doc_id <> canonical_doc_id AS is_duplicate
       FROM sdr_c""")

  /** Streaming z-score anomaly replay — the PREFIX contract its spec pins
    * (a detector cannot consult the future), now under the differential
    * gate: with contiguous seq-range batches every event is scored against
    * the exact moments of the user's strictly-earlier events, regardless
    * of where the batch boundaries fall. The oracle is the prefix
    * computation as a window — deliberately NOT the batch
    * `events_anomaly_zscore` oracle, whose full-history moments are a
    * different (and for a live detector, unimplementable) estimator.
    * Double arithmetic mirrors the operator's op order exactly
    * (double×double products, one division, one sqrt — each correctly
    * rounded, so cross-engine identical). */
  def anomalyReplay(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    // by-name batched: the bounds job runs once per session (see funnelReplay)
    replayViaFiles[graft.streaming.StreamingAnomaly.EventIn](
      spark, sfDir, "anomaly_replay",
      rangeBatched(spark.table("raw")
        .filter($"user_id".isNotNull && $"cents".isNotNull)
        .select($"user_id", $"seq", $"cents"), "seq"),
      OutputMode.Append) { ds =>
      graft.streaming.StreamingAnomaly.detect(ds)
    }
      .select($"user_id", $"seq", $"cents", round($"z", 6).as("z"))
  }

  val anomalyReplayOracle: String = Fixtures.oracle(
    s""", sar_r AS (
         SELECT user_id, seq, cents FROM raw
         WHERE user_id IS NOT NULL AND cents IS NOT NULL),
       sar_p AS (
         SELECT user_id, seq, cents,
                COUNT(1) OVER w AS n,
                COALESCE(SUM(cents) OVER w, 0) AS s,
                COALESCE(SUM(cents * cents) OVER w, 0) AS s2
         FROM sar_r
         WINDOW w AS (PARTITION BY user_id ORDER BY seq
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       sar_z AS (
         SELECT user_id, seq, cents, n,
                (CAST(cents AS DOUBLE) * CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) AS num,
                SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE))
                     - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS den
         FROM sar_p)
       SELECT user_id, seq, cents, ROUND(num / den, 6) AS z
       FROM sar_z
       WHERE n >= ${graft.streaming.StreamingAnomaly.minN}
         AND den > 0 AND ABS(num / den) >= 3.0""")

  /** Streaming gap-sessionization replay: the native `session_window`
    * operator over TIME-ORDERED batches (contiguous btime ranges — with
    * no late data the watermark never drops an event), flushed by two
    * far-future sentinel batches that push the watermark past every real
    * session's close so the Append-mode emission set is total and
    * deterministic. The final emission then equals the BATCH gap
    * sessionization of the same rows — the oracle is
    * `events_sessionization`'s CTE chain reshaped to the streaming
    * output's columns (window end − gap = last event time). */
  def sessionsReplay(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    // the whole batched construction (max btime job + rangeBatched bounds
    // job) sits inside the BY-NAME argument: both eager aggregates run only
    // on first staging (once per session), not on every replay run
    replayViaFiles[graft.streaming.StreamingSessions.SessionEvent](
      spark, sfDir, "sessions_replay", {
        val ev = spark.table("ek")
          .filter($"user_id".isNotNull && $"btime".isNotNull && $"cents".isNotNull)
          .select($"user_id", $"btime", $"cents")
        // empty input: any sentinel base works (sentinels are filtered out
        // of the result; they exist only to close the watermark)
        val maxT = Option(ev.agg(max($"btime")).head())
          .filterNot(_.isNullAt(0)).map(_.getLong(0)).getOrElse(0L)
        val real = rangeBatched(ev, "btime")
        val sentinels = spark.range(2).select(
          lit(-1L).as("user_id"),
          (lit(maxT + 10000L) + $"id" * 10000L).as("btime"),
          lit(0L).as("cents"),
          ($"id" + numBatches).cast("int").as("b"))
        real.unionByName(sentinels)
          .select($"user_id", to_timestamp($"btime").as("ts"), $"cents", $"b")
      }, OutputMode.Append, nb = numBatches + 2)(
      graft.streaming.StreamingSessions.sessionize(_))
      .filter($"user_id" >= 0L)
      .select($"user_id",
        unix_seconds($"session_start").as("session_start"),
        (unix_seconds($"session_end") - 1800L).as("session_end"),
        $"n_events", $"total_cents")
  }

  val sessionsReplayOracle: String = Fixtures.oracle(
    """, ssr_e AS (
         SELECT user_id, seq, btime AS t, cents FROM ek
         WHERE user_id IS NOT NULL AND btime IS NOT NULL AND cents IS NOT NULL),
       ssr_s AS (
         SELECT user_id, seq, t, cents,
                CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t, seq) IS NULL
                       OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, seq) > 1800
                     THEN 1 ELSE 0 END AS new_session
         FROM ssr_e),
       ssr_n AS (
         SELECT user_id, t, cents,
                SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, seq
                  ROWS UNBOUNDED PRECEDING) AS session_no
         FROM ssr_s)
       SELECT user_id, MIN(t) AS session_start, MAX(t) AS session_end,
              COUNT(1) AS n_events, CAST(SUM(cents) AS BIGINT) AS total_cents
       FROM ssr_n
       GROUP BY user_id, session_no""")

  /** Final streaming per-stratum sample — the bottom-k-by-hash reservoir
    * ([[graft.streaming.StreamingSample]]) driven over the standard 3-way
    * document split; bottom-k selection is order-free, so the final state
    * must equal the batch `sample_uniform_k` election, whose oracle this
    * entry reuses verbatim. The latest snapshot per stratum is selected by
    * the monotone rows-seen tag (the kmv max_by idiom, join-shaped because
    * the snapshot is k rows, not one). */
  def sampleReplay(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val batched = spark.table("documents")
      .select($"lang".as("_1"), $"doc_id".as("_2"),
        ($"doc_id" % numBatches).cast("int").as("b"))
    val log = replayViaFiles[(String, Long)](spark, sfDir, "sample_replay",
      batched, OutputMode.Update) { ds =>
      graft.streaming.StreamingSample.samples(
        ds.map { case (l, id) => graft.streaming.StreamingSample.DocIn(l, id) }, 50)
    }
    val last = log.groupBy($"lang").agg(max($"n_seen").as("n_seen"))
    log.join(broadcast(last), Seq("lang", "n_seen"))
      .select($"lang", $"doc_id", $"sample_rank")
  }

  val sampleReplayOracle: String = Fixtures.oracle(
    s"""SELECT lang, doc_id, CAST(rk AS BIGINT) AS sample_rank
        FROM (SELECT lang, doc_id,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY ${Sampling.bucketExprSql("doc_id")}, doc_id) AS rk
              FROM documents)
        WHERE rk <= 50""")

  /** Final streaming HLL state per event type — the register-MAX sketch
    * ([[graft.streaming.StreamingHll]]) driven over the standard 3-way
    * split; register maxima are order-free, so the final state must equal
    * the batch `events_distinct_hll` sketch, whose oracle this entry
    * reuses VERBATIM (the exact count and the float estimate constant are
    * joined/computed outside the stream, over the same fixture). */
  def hllReplay(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val batched = spark.table("raw")
      .filter($"event_type".isNotNull && $"user_id".isNotNull)
      .select($"event_type".as("_1"), $"user_id".cast("long").as("_2"),
        ($"user_id" % numBatches).cast("int").as("b"))
    val log = replayViaFiles[(String, Long)](spark, sfDir, "hll_replay",
      batched, OutputMode.Update) { ds =>
      graft.streaming.StreamingHll.sketches(
        ds.map { case (et, u) => graft.streaming.StreamingHll.EvIn(et, u) })
    }
    val last = log.groupBy($"event_type").agg(max($"n_seen").as("n_seen"))
    val sketch = log.join(broadcast(last), Seq("event_type", "n_seen"))
      .select($"event_type", $"s2", $"v_zero")
    val exact = spark.table("raw")
      .filter($"event_type".isNotNull && $"user_id".isNotNull)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("exact_distinct"))
    sketch.join(exact, Seq("event_type"))
      .withColumn("hll_raw", round(
        expr("((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 33554432.0) / CAST(s2 AS DOUBLE)"), 3))
      .select($"event_type", $"exact_distinct", $"v_zero", $"s2", $"hll_raw",
        round($"hll_raw" / $"exact_distinct".cast("double"), 6).as("est_over_exact"))
  }

  /** The ingest-boundary DQ gate run WHILE ingesting: the events checks
    * from [[DataQuality.rowChecks]] (the SAME predicate texts — one source
    * of truth with the batch gate) as running violation counters over the
    * micro-batch stream. Each event explodes to one (check, is_violation)
    * row per check and a built-in streaming aggregation keeps per-check
    * running (n_rows, n_violations) — Spark's own state store, no custom
    * operator needed (the idiomatic form: counts are order-free and
    * mergeable). The final snapshot per check is the emission with the
    * largest n_rows (monotone), and the oracle is the batch gate's events
    * arm verbatim — a batch that would fail the load fails it identically
    * mid-stream, before publish. */
  def dqReplay(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val checks = DataQuality.rowChecks.filter(_._1 == "events")
    val batched = spark.table("events")
      .select($"event_type".as("_1"), $"value".as("_2"),
        pmod($"event_id", lit(numBatches)).cast("int").as("b"))
    val log = replayViaFiles[(String, Option[Double])](spark, sfDir, "dq_replay",
      batched, OutputMode.Update) { ds =>
      ds.toDF("event_type", "value")
        .select(explode(array(checks.map { case (_, nm, pred) =>
          struct(lit(nm).as("check_name"),
            when(expr(pred), 1L).otherwise(0L).as("v"))
        }: _*)).as("c"))
        .groupBy($"c.check_name".as("check_name"))
        .agg(count(lit(1)).as("n_rows"), sum($"c.v").as("n_violations"))
    }
    log.groupBy($"check_name")
      .agg(max_by(struct($"n_rows", $"n_violations"), $"n_rows").as("s"))
      .select(lit("events").as("table_name"), $"check_name",
        $"s.n_rows".cast("long").as("n_rows"),
        $"s.n_violations".cast("long").as("n_violations"),
        expr("s.n_violations * 10000 DIV s.n_rows").cast("long")
          .as("violation_bp"))
  }

  val dqReplayOracle: String = {
    val arms = DataQuality.rowChecks.filter(_._1 == "events").map {
      case (_, nm, pred) =>
        s"""SELECT '$nm' AS check_name,
                CAST(COUNT(1) AS BIGINT) AS n_rows,
                CAST(SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
            FROM events"""
    }
    Fixtures.oracle(
      s""", sdq AS (
          ${arms.mkString("\n          UNION ALL ")})
         SELECT 'events' AS table_name, check_name, n_rows, n_violations,
                CAST(n_violations * 10000 // n_rows AS BIGINT) AS violation_bp
         FROM sdq""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "streaming_dq_replay" -> (dqReplay _),
    "streaming_sample_replay" -> (sampleReplay _),
    "streaming_hll_replay" -> (hllReplay _),
    "streaming_anomaly_replay" -> (anomalyReplay _),
    "streaming_sessions_replay" -> (sessionsReplay _),
    "streaming_funnel_replay" -> (funnelReplay _),
    "streaming_dedup_replay" -> (dedupReplay _),
    "streaming_hist_replay" -> (histReplay _),
    "streaming_topk_replay" -> (topkReplay _),
    "streaming_cms_replay" -> (cmsReplay _),
    "streaming_kmv_replay" -> (kmvReplay _))

  val oracles: Map[String, String] = Map(
    "streaming_dq_replay" -> dqReplayOracle,
    "streaming_sample_replay" -> sampleReplayOracle,
    "streaming_hll_replay" -> graft.queries.Sessions.distinctHllOracle,
    "streaming_anomaly_replay" -> anomalyReplayOracle,
    "streaming_sessions_replay" -> sessionsReplayOracle,
    "streaming_funnel_replay" -> graft.queries.Sessions.funnelOracle,
    "streaming_dedup_replay" -> dedupReplayOracle,
    "streaming_hist_replay" -> histReplayOracle,
    "streaming_topk_replay" -> topkReplayOracle,
    "streaming_cms_replay" -> cmsReplayOracle,
    "streaming_kmv_replay" -> kmvReplayOracle)
}
