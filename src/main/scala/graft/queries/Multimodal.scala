package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * processed by a batched per-partition decode stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * DETERMINISTIC FAKE (clearly marked below) — what is real and tested is
  * the Spark-side shape a 100 TB media pipeline needs:
  *   - blobs as `BinaryType` columns co-partitioned with their metadata;
  *   - decode/feature-extract as `mapPartitions` over a typed Dataset
  *     (one JVM-side batch per partition — the Scala analogue of an arrow
  *     batch UDF: amortized setup, no per-row closure dispatch);
  *   - narrow output schema so column pruning drops the blob when only
  *     metadata is read downstream.
  *
  * The blob here is the UTF-8 encoding of `documents.text` (the corpus has
  * no real media), which also makes the metadata oracle-checkable: the fake
  * decode is pure arithmetic on byte length and first/last byte.
  */
object Multimodal {

  /** Decoded-media metadata row (what a real image decode would yield). */
  case class MediaMeta(doc_id: Long, byte_len: Long, format: String,
      width: Long, height: Long, n_frames: Long, mean_byte: Long)

  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val blobs = spark.table("documents")
      .select($"doc_id", $"text".cast(BinaryType).as("blob"))
      .as[(Long, Array[Byte])]

    blobs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        // --- STUB DECODE (no codecs in this container) ---------------
        // A real implementation would decode `bytes` with a codec here;
        // the replacement is deterministic arithmetic so the pipeline
        // stays differentially testable end-to-end.
        val len = bytes.length.toLong
        val first = if (bytes.nonEmpty) bytes(0) & 0xffL else 0L
        val last = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xffL else 0L
        MediaMeta(
          doc_id = id,
          byte_len = len,
          format = if (len % 2 == 0) "png" else "jpeg",
          width = 64 + (len * 7 + first) % 512,
          height = 64 + (len * 13 + last) % 512,
          n_frames = 1 + len % 30,
          mean_byte = (first + last) / 2)
        // ----------------------------------------------------------------
      }
    }.toDF()
  }

  /** The fake decode is arithmetic on byte length / boundary bytes, so the
    * oracle replays it in SQL (corpus is ASCII: strlen = bytes). */
  val mediaMetaOracle: String = Fixtures.oracle(
    """SELECT doc_id,
              CAST(strlen(text) AS BIGINT) AS byte_len,
              CASE WHEN strlen(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
              CAST(64 + (strlen(text) * 7 + ascii(substr(text, 1, 1))) % 512 AS BIGINT) AS width,
              CAST(64 + (strlen(text) * 13 + ascii(substr(text, strlen(text), 1))) % 512 AS BIGINT) AS height,
              CAST(1 + strlen(text) % 30 AS BIGINT) AS n_frames,
              CAST((ascii(substr(text, 1, 1)) + ascii(substr(text, strlen(text), 1))) // 2 AS BIGINT) AS mean_byte
       FROM documents""")

  /** Frame sampling plan: one row per sampled frame index (every k-th frame
    * of the fake stream) — the explode pattern a video pipeline uses to fan
    * a blob out to per-frame work items, with the blob itself pruned. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    mediaMeta(spark, sfDir)
      .filter($"n_frames" > 1)
      .select($"doc_id", $"n_frames",
        explode(expr("sequence(0, CAST(n_frames - 1 AS INT), 5)")).as("frame_idx"))
      .select($"doc_id", $"frame_idx".cast(LongType).as("frame_idx"),
        ($"doc_id" * 1000 + $"frame_idx").as("frame_key"))
  }

  val frameSampleOracle: String = Fixtures.oracle(
    """, meta AS (
         SELECT doc_id, CAST(1 + strlen(text) % 30 AS BIGINT) AS n_frames
         FROM documents)
       SELECT doc_id,
              CAST(t.f AS BIGINT) AS frame_idx,
              doc_id * 1000 + CAST(t.f AS BIGINT) AS frame_key
       FROM meta, UNNEST(range(0, n_frames, 5)) AS t(f)
       WHERE n_frames > 1""")

  /** Resize row: target dims fit into a 224-box preserving aspect, plus a
    * strided checksum standing in for the resampled payload. */
  case class Resized(doc_id: Long, width: Long, height: Long,
      out_width: Long, out_height: Long, resized_checksum: Long)

  /** Resize stage: compute aspect-preserving target dimensions (fit into
    * 224×224) and produce the "resampled" payload — STUBBED as a strided
    * byte checksum (stride = len/64 source bytes per output unit), because
    * the container has no codecs. The plumbing is the real part: a typed
    * per-partition batch stage whose byte loop touches the blob with the
    * same access pattern a downsampler would, while the target-dim
    * arithmetic is pure projection the optimizer can reorder. */
  def resize(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val blobs = spark.table("documents")
      .select($"doc_id", $"text".cast(BinaryType).as("blob"))
      .as[(Long, Array[Byte])]

    blobs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val len = bytes.length.toLong
        val first = if (bytes.nonEmpty) bytes(0) & 0xffL else 0L
        val last = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xffL else 0L
        // same fake dims as mediaMeta — one decode, many consumers
        val w = 64 + (len * 7 + first) % 512
        val h = 64 + (len * 13 + last) % 512
        val longSide = math.max(w, h)
        // --- STUB RESAMPLE (no codecs): strided byte checksum ----------
        val stride = math.max(1L, len / 64L).toInt
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xffL; i += stride }
        // ----------------------------------------------------------------
        Resized(id, w, h, w * 224 / longSide, h * 224 / longSide, sum)
      }
    }.toDF()
  }

  val resizeOracle: String = Fixtures.oracle(
    """, rmeta AS (
         SELECT doc_id, strlen(text) AS len,
                64 + (strlen(text) * 7 + ascii(substr(text, 1, 1))) % 512 AS w,
                64 + (strlen(text) * 13 + ascii(substr(text, strlen(text), 1))) % 512 AS h
         FROM documents)
       SELECT m.doc_id,
              CAST(m.w AS BIGINT) AS width,
              CAST(m.h AS BIGINT) AS height,
              CAST(m.w * 224 // greatest(m.w, m.h) AS BIGINT) AS out_width,
              CAST(m.h * 224 // greatest(m.w, m.h) AS BIGINT) AS out_height,
              CAST((SELECT COALESCE(SUM(ascii(substr(d.text, CAST(t.i AS INT) + 1, 1))), 0)
                    FROM UNNEST(range(0, m.len, greatest(1, m.len // 64))) AS t(i)) AS BIGINT)
                AS resized_checksum
       FROM rmeta m JOIN documents d ON d.doc_id = m.doc_id""")

  /** Feature-extraction stage: an 8-bin byte histogram per blob — the exact
    * shape of a per-item embedding/feature pass (one JVM batch per
    * partition, tight loop over the payload, small fixed-width output).
    * Emitted exploded (doc_id, bin, n) so the oracle checks every bin and
    * the driver's hash never sees an array column. */
  def featureExtract(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val blobs = spark.table("documents")
      .select($"doc_id", $"text".cast(BinaryType).as("blob"))
      .as[(Long, Array[Byte])]

    blobs.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val hist = new Array[Long](8)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1; i += 1 }
        (0 until 8).iterator.map(b => (id, b.toLong, hist(b)))
      }
    }.toDF("doc_id", "bin", "n")
  }

  val featureExtractOracle: String = Fixtures.oracle(
    """, chars AS (
         SELECT doc_id, ascii(substr(text, CAST(t.i AS INT) + 1, 1)) // 32 AS bin
         FROM documents, UNNEST(range(strlen(text))) AS t(i)),
       grid AS (
         SELECT d.doc_id, b.bin
         FROM documents d, UNNEST(range(8)) AS b(bin))
       SELECT g.doc_id, CAST(g.bin AS BIGINT) AS bin,
              CAST(COALESCE(c.n, 0) AS BIGINT) AS n
       FROM grid g
       LEFT JOIN (SELECT doc_id, bin, COUNT(*) AS n FROM chars GROUP BY 1, 2) c
         ON c.doc_id = g.doc_id AND c.bin = g.bin""")

  /** Per-band polynomial multipliers for the stub perceptual hash. */
  private val phashMults = Seq(131L, 137L, 139L, 149L)

  /** (doc_id, 4 × 16-bit fingerprint bands) over a blob column. Public like
    * [[MediaMeta]]: Janino-generated encoder code cannot touch a private
    * class, and the silent fallback is the interpreted row path. */
  case class PhashBands(doc_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Image near-duplicate detection by banded perceptual hash — the media
    * analogue of dedup_simhash: 64-bit fingerprint split into 4 × 16-bit
    * bands, candidates = pairs sharing ≥ 1 band (equi-join on the band
    * value, blocking-based like every dedup here), verified by Hamming
    * distance over the full fingerprint.
    *
    * The hash itself is a STUB like every decode in this module (a real
    * pHash needs an image codec: DCT over downsampled luma); the blob is
    * DECODED first (UTF-8 → codepoints — the decode IS the stub codec
    * step) and each band is a per-multiplier polynomial over the decoded
    * codepoints, looped in the same typed mapPartitions batch shape a
    * codec stage uses. Folding codepoints, not raw bytes, is what keeps
    * the oracle's per-character `ascii()` fold equivalent for ANY text,
    * not just the ASCII corpus. Only content-identical blobs collide under
    * the stub — the seeded `media_aug` copies (and the corpus's organic
    * duplicate texts at sf0.1) make the pipeline fire deterministically.
    * The Hamming verify never overflows: per-band XOR of 16-bit values,
    * popcounts summed — no 64-bit shift whose sign bit the two engines
    * could treat differently. */
  def phashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val blobs = spark.table("media_aug")
      .select($"doc_id", $"text".cast(BinaryType).as("blob"))
      .as[(Long, Array[Byte])]

    val bands = blobs.mapPartitions { it =>
      val ms = phashMults
      it.map { case (id, bytes) =>
        // --- STUB PHASH (no codecs in this container) -----------------
        // the "decode" step: bytes -> codepoints (a real codec would
        // yield pixels here); the fold then runs over decoded units so
        // the oracle's per-character ascii() fold matches for ANY text
        val cps = new String(bytes, "UTF-8").codePoints().toArray
        val h = Array.fill(4)(0L)
        var i = 0
        while (i < cps.length) {
          val x = cps(i).toLong
          var b = 0
          while (b < 4) { h(b) = (h(b) * ms(b) + x) % 65536L; b += 1 }
          i += 1
        }
        // ---------------------------------------------------------------
        PhashBands(id, h(0), h(1), h(2), h(3))
      }
    }.toDF()

    val expl = bands.select($"doc_id",
      explode(array(
        struct(lit(0).as("bi"), $"b0".as("bv")),
        struct(lit(1).as("bi"), $"b1".as("bv")),
        struct(lit(2).as("bi"), $"b2".as("bv")),
        struct(lit(3).as("bi"), $"b3".as("bv")))).as("band"))
      .select($"doc_id", $"band.bi", $"band.bv")

    // candidate pairs through the salt gate (uniform with the text band
    // joins), then one hamming computation per DISTINCT pair against the
    // per-doc band frame
    graft.util.Salted.pairSelfJoin(expl, Seq("bi", "bv"), "doc_id")
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"))
      .distinct()
      .join(bands.select($"doc_id".as("doc_a"), $"b0".as("a0"), $"b1".as("a1"),
        $"b2".as("a2"), $"b3".as("a3")), Seq("doc_a"))
      .join(bands.select($"doc_id".as("doc_b"), $"b0", $"b1", $"b2", $"b3"),
        Seq("doc_b"))
      .select($"doc_a", $"doc_b",
        (bit_count($"a0".bitwiseXOR($"b0")) +
          bit_count($"a1".bitwiseXOR($"b1")) +
          bit_count($"a2".bitwiseXOR($"b2")) +
          bit_count($"a3".bitwiseXOR($"b3"))).cast(LongType).as("hamming"))
      .filter($"hamming" <= 8)
  }

  private def duckBand(m: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, x) -> (a * $m + x) % 65536)"

  val phashDedupOracle: String = Fixtures.oracle(
    s""", ph AS (
         SELECT doc_id,
                ${duckBand(131L)} AS b0, ${duckBand(137L)} AS b1,
                ${duckBand(139L)} AS b2, ${duckBand(149L)} AS b3
         FROM media_aug),
       pbands AS (
         SELECT doc_id, 0 AS bi, b0 AS bv, b0, b1, b2, b3 FROM ph
         UNION ALL SELECT doc_id, 1, b1, b0, b1, b2, b3 FROM ph
         UNION ALL SELECT doc_id, 2, b2, b0, b1, b2, b3 FROM ph
         UNION ALL SELECT doc_id, 3, b3, b0, b1, b2, b3 FROM ph),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                   + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
         FROM pbands a JOIN pbands b
           ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 8""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_media_meta" -> (mediaMeta _),
    "multimodal_phash_dedup" -> (phashDedup _),
    "multimodal_frame_sample" -> (frameSample _),
    "multimodal_resize" -> (resize _),
    "multimodal_feature_extract" -> (featureExtract _))

  val oracles: Map[String, String] = Map(
    "multimodal_media_meta" -> mediaMetaOracle,
    "multimodal_phash_dedup" -> phashDedupOracle,
    "multimodal_frame_sample" -> frameSampleOracle,
    "multimodal_resize" -> resizeOracle,
    "multimodal_feature_extract" -> featureExtractOracle)
}
