package graft

import org.apache.spark.sql.functions._

import graft.queries.Audio

/** The RIFF/WAVE audio arm. The oracle pins the decoded samples against
  * the integer formula; this spec pins the codec itself and the
  * cross-entry physics:
  *
  *  1. encode→decode is the identity on PCM16 (extremes included), with
  *     and without the interleaved LIST chunk;
  *  2. the chunk walk is a real RIFF parser: unknown and odd-length
  *     chunks (with their pad byte) are skipped, garbage is rejected;
  *  3. the three entries agree with each other on the fixture
  *     (trim partition sums to the sample count, duration is n/8 ms,
  *     silent frames bounded by frames) and the fixture is
  *     non-degenerate (junk-chunked blobs, nonzero trims, crossings).
  */
class AudioSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  test("encode/decode round-trips PCM16, junk chunk or not") {
    val signals = Seq(
      Array(0, 1, -1, 32767, -32768, 12345, -12345),
      Array.tabulate(1000)(i => (i * 37 % 65536) - 32768),
      Array(0, 0, 0))
    for (s <- signals; junk <- Seq(false, true)) {
      val (rate, out) = Audio.decodeWav(Audio.encodeWav(s, junk))
      assert(rate == 8000L)
      assert(out.toSeq == s.toSeq, s"junk=$junk round-trip")
    }
  }

  test("the chunk walk skips unknown and odd-length chunks with padding") {
    val s = Array(100, -200, 300)
    val base = Audio.encodeWav(s, junk = false)
    // splice an odd-length unknown chunk (3 bytes + 1 pad) after WAVE
    val odd = Array[Byte]('x', 'y', 'z', 'w', 3, 0, 0, 0, 7, 8, 9, 0)
    val spliced = base.take(12) ++ odd ++ base.drop(12)
    val (rate, out) = Audio.decodeWav(spliced)
    assert(rate == 8000L && out.toSeq == s.toSeq)
    // garbage is rejected, not misparsed
    intercept[Exception](Audio.decodeWav("not audio at all".getBytes))
    intercept[Exception](Audio.decodeWav(base.take(20))) // truncated: no data
  }

  test("entries agree: trim partition, duration arithmetic, frame bounds") {
    val s = spark
    import s.implicits._
    val meta = Audio.wavMeta(s, sfDir)
      .select($"doc_id", $"n_samples", $"duration_ms", $"peak")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val trim = Audio.wavTrim(s, sfDir)
      .select($"doc_id", $"lead_trim", $"tail_trim", $"kept_samples")
      .as[(Long, Long, Long, Long)].collect()
    val energy = Audio.wavEnergy(s, sfDir)
      .select($"doc_id", $"n_frames", $"silent_frames", $"zero_crossings")
      .as[(Long, Long, Long, Long)].collect()
    assert(meta.nonEmpty && trim.length == meta.size && energy.length == meta.size)
    trim.foreach { case (d, lead, tail, kept) =>
      assert(lead + tail + kept == meta(d)._2, s"doc $d trim partition")
    }
    meta.values.foreach { case (d, n, ms, peak) =>
      assert(ms == n / 8, s"doc $d duration")
      assert(peak > 0 && peak < 32768, s"doc $d peak $peak")
    }
    energy.foreach { case (d, nf, silent, _) =>
      assert(nf == (meta(d)._2 + 159) / 160, s"doc $d frame count")
      assert(silent <= nf)
    }
    // non-degenerate fixture: silence trims and crossings both present
    assert(trim.exists(_._2 > 0), "no doc with leading silence")
    assert(trim.exists(_._3 > 0), "no doc with trailing silence")
    assert(energy.forall(_._4 > 0), "a sawtooth body must cross zero")
    assert(energy.exists(_._3 > 0), "no silent frame on the fixture")
  }
}
