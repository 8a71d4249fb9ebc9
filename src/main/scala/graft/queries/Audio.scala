package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** Audio-column processing over a REAL wire format: hand-rolled RIFF/WAVE
  * (PCM 16-bit mono little-endian — the container every audio pipeline
  * ingests; RIFF chunk grammar per the public WAVE spec, no codec library
  * needed because PCM IS the samples).
  *
  * The corpus has no audio, so each entry SYNTHESIZES its signal from an
  * exact integer sample formula (silence head/tail around a sawtooth body
  * — the shape VAD/trim operators exist for), then runs the real
  * pipeline a 100 TB speech corpus needs:
  *
  *   encode (samples → RIFF/WAVE bytes)      — stands in for storage
  *     → blob as a `BinaryType` column across a shuffle boundary
  *   decode (chunk-walk the container)       — the parser under test,
  *       exercised for real: every 4th blob carries an extra LIST chunk
  *       between fmt and data that the walk must skip
  *     → per-partition typed feature loops ([[Multimodal]]'s idiom:
  *       amortized setup, tight int loops, no per-row dispatch)
  *
  * Differential testing without audio in the oracle: 16-bit PCM
  * round-trips integers losslessly, so the DuckDB oracle replays the
  * sample formula directly — any deviation in the encoder's layout or the
  * decoder's chunk walk (endianness, offsets, a mis-skipped chunk)
  * changes the decoded samples and fails the hash. The Scala formula and
  * the SQL fragment MUST stay in lockstep; every division that can see a
  * negative numerator relies on Scala `/` and DuckDB `//` BOTH truncating
  * toward zero (verified).
  *
  * Scale notes: blobs stay in executors end-to-end; the decoded frame is
  * memoized once per (session, sfDir) and every entry is a narrow map
  * over it, so the container parse runs once however many analyses read
  * the samples.
  */
object Audio {

  /** Sample rate (Hz); frame = 20 ms. */
  private val sr = 8000L
  private val frameLen = 160

  // ------------------------------------------------------------------
  // Sample formula (MUST match [[sampleSql]] below).
  private def nSamples(d: Long): Int = (800 + 40 * (d % 37)).toInt
  private def period(d: Long): Int = (20 + (d % 30)).toInt
  private def amp(d: Long): Int = (4000 + 500 * (d % 9)).toInt
  private def leadLen(d: Long): Int = (80 * (d % 5)).toInt
  private def tailLen(d: Long): Int = (80 * ((d * 3) % 5)).toInt

  private def sample(d: Long, i: Int): Int = {
    val (n, p, a) = (nSamples(d), period(d), amp(d))
    val (lead, tail) = (leadLen(d), tailLen(d))
    if (i < lead || i >= n - tail) 0
    else a * (2 * ((i - lead) % p) - p) / p
  }

  /** SQL twin over a `wv_doc`-shaped row (doc_id, n, p, a, lead, tail)
    * and 0-based sample index `i`. */
  private val docCte: String =
    """wv_doc AS (
         SELECT doc_id, 800 + 40*(doc_id % 37) AS n, 20 + (doc_id % 30) AS p,
                4000 + 500*(doc_id % 9) AS a,
                80*(doc_id % 5) AS lead, 80*((doc_id*3) % 5) AS tail
         FROM documents)"""
  private val sampleCte: String =
    """wv_s AS MATERIALIZED (
         SELECT doc_id, n, t.i AS i,
                CASE WHEN t.i < lead OR t.i >= n - tail THEN 0
                     ELSE a * (2*((t.i - lead) % p) - p) // p END AS s
         FROM wv_doc, UNNEST(range(0, n)) AS t(i))"""

  // ------------------------------------------------------------------
  // RIFF/WAVE codec (executor-side, pure JVM).

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Encode PCM16 mono → RIFF/WAVE. `junk` inserts a LIST chunk between
    * fmt and data (legal per the RIFF grammar; real encoders emit them). */
  private[graft] def encodeWav(samples: Array[Int], junk: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dataLen = samples.length * 2
    val junkPayload = Array[Byte]('I', 'N', 'F', 'O')
    val junkLen = if (junk) 8 + junkPayload.length else 0
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(4 + 24 + junkLen + 8 + dataLen))
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII"))
    bos.write(le32(16))
    bos.write(le16(1)) // PCM
    bos.write(le16(1)) // mono
    bos.write(le32(sr))
    bos.write(le32(sr * 2)) // byte rate
    bos.write(le16(2)) // block align
    bos.write(le16(16)) // bits per sample
    if (junk) {
      bos.write("LIST".getBytes("US-ASCII"))
      bos.write(le32(junkPayload.length))
      bos.write(junkPayload)
    }
    bos.write("data".getBytes("US-ASCII"))
    bos.write(le32(dataLen))
    samples.foreach(s => bos.write(le16(s & 0xffff)))
    bos.toByteArray
  }

  /** Decode RIFF/WAVE → (sampleRate, PCM16 samples): verify the RIFF/WAVE
    * magic, then WALK the chunk list — fmt is read wherever it sits, any
    * other chunk (LIST, fact, ...) is skipped by its declared length, data
    * ends the walk. Odd-length chunks consume their RIFF pad byte. */
  private[graft] def decodeWav(blob: Array[Byte]): (Long, Array[Int]) = {
    def u32(o: Int): Long =
      (blob(o) & 0xffL) | ((blob(o + 1) & 0xffL) << 8) |
        ((blob(o + 2) & 0xffL) << 16) | ((blob(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int = (blob(o) & 0xff) | ((blob(o + 1) & 0xff) << 8)
    def tag(o: Int): String = new String(blob, o, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE blob")
    var off = 12
    var rate = 0L
    while (off + 8 <= blob.length) {
      val (id, len) = (tag(off), u32(off + 4).toInt)
      if (id == "fmt ") {
        require(u16(off + 8) == 1 && u16(off + 10) == 1 && u16(off + 22) == 16,
          "only PCM16 mono supported")
        rate = u32(off + 12)
      } else if (id == "data") {
        require(rate > 0, "data chunk before fmt")
        val n = len / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val v = u16(off + 8 + 2 * i)
          out(i) = if (v >= 32768) v - 65536 else v // sign-extend PCM16
          i += 1
        }
        return (rate, out)
      }
      off += 8 + len + (len & 1) // chunks are word-aligned: odd pads 1
    }
    sys.error("no data chunk")
  }

  // ------------------------------------------------------------------
  // Pipeline stages.

  /** (doc_id, blob) with REAL container bytes; every 4th doc carries the
    * LIST chunk so the decoder's walk does real work. The repartition
    * forces the blob column through shuffle serialization (the
    * [[Multimodal]] rationale: in production the bytes arrive from
    * storage; fusing encode+decode into one task would test nothing). */
  private def wavBlobs(spark: SparkSession): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    spark.table("documents").select($"doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val s = Array.tabulate(nSamples(d))(i => sample(d, i))
        (d, encodeWav(s, junk = d % 4 == 0))
      })
      .toDF("doc_id", "blob").repartition(col("doc_id")).as[(Long, Array[Byte])]
  }

  /** Decoded samples, memoized: the container parse runs ONCE per scope
    * however many analyses read it. */
  private def decoded(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    graft.util.Memo.cached(spark, sfDir, "wav_decoded") {
      import spark.implicits._
      wavBlobs(spark).mapPartitions(_.map { case (d, blob) =>
        val (rate, s) = decodeWav(blob)
        (d, rate, s)
      }).toDF("doc_id", "rate", "samples")
    }
  }

  /** Container metadata off the DECODED blob: (doc_id, sample_rate,
    * n_samples, duration_ms, peak). */
  def wavMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decoded(spark, sfDir).as[(Long, Long, Array[Int])]
      .mapPartitions(_.map { case (d, rate, s) =>
        var peak = 0
        var i = 0
        while (i < s.length) {
          val a = math.abs(s(i)); if (a > peak) peak = a; i += 1
        }
        (d, rate, s.length.toLong, s.length * 1000L / rate, peak.toLong)
      })
      .toDF("doc_id", "sample_rate", "n_samples", "duration_ms", "peak")
  }

  /** Frame analysis (20 ms frames): (doc_id, n_frames, silent_frames,
    * zero_crossings, mean_energy) — the VAD-shaped signal statistics an
    * audio-curation pass gates on. */
  def wavEnergy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decoded(spark, sfDir).as[(Long, Long, Array[Int])]
      .mapPartitions(_.map { case (d, _, s) =>
        val n = s.length
        val nFrames = (n + frameLen - 1) / frameLen
        var silent = 0L
        var f = 0
        while (f < nFrames) {
          var abs = 0L
          var i = f * frameLen
          val end = math.min(n, i + frameLen)
          while (i < end) { abs += math.abs(s(i)); i += 1 }
          if (abs == 0) silent += 1
          f += 1
        }
        var zcr = 0L
        var en = 0L
        var i = 0
        while (i < n) {
          if (i > 0 && s(i - 1).toLong * s(i) < 0) zcr += 1
          en += s(i).toLong * s(i)
          i += 1
        }
        (d, nFrames.toLong, silent, zcr, en / n)
      })
      .toDF("doc_id", "n_frames", "silent_frames", "zero_crossings", "mean_energy")
  }

  /** Silence trim offsets off the decoded signal: (doc_id, lead_trim,
    * tail_trim, kept_samples) — the head/tail-silence removal every
    * speech pipeline runs before feature extraction. All-silent signals
    * keep nothing (kept 0, both trims = n by convention n − kept). */
  def wavTrim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decoded(spark, sfDir).as[(Long, Long, Array[Int])]
      .mapPartitions(_.map { case (d, _, s) =>
        var first = -1
        var last = -1
        var i = 0
        while (i < s.length) {
          if (s(i) != 0) { if (first < 0) first = i; last = i }
          i += 1
        }
        if (first < 0) (d, s.length.toLong, 0L, 0L)
        else (d, first.toLong, (s.length - 1 - last).toLong, (last - first + 1).toLong)
      })
      .toDF("doc_id", "lead_trim", "tail_trim", "kept_samples")
  }

  // ------------------------------------------------------------- oracles

  val wavMetaOracle: String = Fixtures.oracle(
    s""", $docCte, $sampleCte
       SELECT doc_id, CAST($sr AS BIGINT) AS sample_rate,
              CAST(COUNT(1) AS BIGINT) AS n_samples,
              CAST(COUNT(1) * 1000 // $sr AS BIGINT) AS duration_ms,
              CAST(MAX(ABS(s)) AS BIGINT) AS peak
       FROM wv_s GROUP BY doc_id""")

  val wavEnergyOracle: String = Fixtures.oracle(
    s""", $docCte, $sampleCte,
       wv_f AS (
         SELECT doc_id, i // $frameLen AS f, SUM(ABS(s)) AS fabs
         FROM wv_s GROUP BY 1, 2),
       wv_fr AS (
         SELECT doc_id, COUNT(1) AS n_frames,
                SUM(CASE WHEN fabs = 0 THEN 1 ELSE 0 END) AS silent_frames
         FROM wv_f GROUP BY 1),
       wv_z AS (
         SELECT doc_id,
                SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS zero_crossings,
                SUM(CAST(s AS BIGINT) * s) // COUNT(1) AS mean_energy
         FROM (SELECT doc_id, s,
                      s * LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prod
               FROM wv_s)
         GROUP BY doc_id)
       SELECT f.doc_id, CAST(f.n_frames AS BIGINT) AS n_frames,
              CAST(f.silent_frames AS BIGINT) AS silent_frames,
              CAST(z.zero_crossings AS BIGINT) AS zero_crossings,
              CAST(z.mean_energy AS BIGINT) AS mean_energy
       FROM wv_fr f JOIN wv_z z USING (doc_id)""")

  val wavTrimOracle: String = Fixtures.oracle(
    s""", $docCte, $sampleCte,
       wv_nz AS (
         SELECT doc_id, MIN(CASE WHEN s <> 0 THEN i END) AS first_nz,
                MAX(CASE WHEN s <> 0 THEN i END) AS last_nz,
                MAX(n) AS n
         FROM wv_s GROUP BY doc_id)
       SELECT doc_id,
              CAST(COALESCE(first_nz, n) AS BIGINT) AS lead_trim,
              CAST(COALESCE(n - 1 - last_nz, 0) AS BIGINT) AS tail_trim,
              CAST(COALESCE(last_nz - first_nz + 1, 0) AS BIGINT) AS kept_samples
       FROM wv_nz""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_wav_meta" -> (wavMeta _),
    "multimodal_wav_energy" -> (wavEnergy _),
    "multimodal_wav_trim" -> (wavTrim _))

  val oracles: Map[String, String] = Map(
    "multimodal_wav_meta" -> wavMetaOracle,
    "multimodal_wav_energy" -> wavEnergyOracle,
    "multimodal_wav_trim" -> wavTrimOracle)
}
