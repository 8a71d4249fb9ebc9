package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.queries.Multimodal

/** The multimodal family runs REAL `javax.imageio` codecs (PNG + BMP).
  * These tests pin the properties the differential oracle relies on:
  * lossless pixel round-trips, correct format sniffing, and the exact
  * fixed-point DCT pHash semantics on hand-built images. */
class MultimodalSpec extends SparkSpec {

  private val sf = SparkSpec.fixtureSf

  private def img2x2(px: Seq[Int]): BufferedImage = {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, px(0)); img.setRGB(1, 0, px(1))
    img.setRGB(0, 1, px(2)); img.setRGB(1, 1, px(3))
    img
  }

  test("PNG and BMP round-trip 24-bit RGB losslessly (known pixels)") {
    val px = Seq(0x12345f, 0xfe0080, 0x00ff7f, 0xabcdef)
    for (fmt <- Seq("png", "bmp")) {
      val blob = Multimodal.encode(img2x2(px), fmt)
      assert(Multimodal.sniffFormat(blob) == fmt, s"sniffed format for $fmt")
      val back = Multimodal.decode(blob)
      assert(back.getWidth == 2 && back.getHeight == 2)
      val got = Seq(back.getRGB(0, 0), back.getRGB(1, 0),
        back.getRGB(0, 1), back.getRGB(1, 1)).map(_ & 0xffffff)
      assert(got == px, s"$fmt round-trip pixels")
    }
  }

  test("constant image has all-zero pHash (DCT AC of a constant is 0)") {
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x7b7b7b)
    val viaPng = Multimodal.decode(Multimodal.encodePng(img))
    assert(Multimodal.phashOf(viaPng).toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("pHash is content-deterministic and identical blobs collide at 0") {
    val a = Multimodal.synthTextImage("the quick brown fox jumps over the lazy dog")
    val b = Multimodal.synthTextImage("the quick brown fox jumps over the lazy dog")
    val ha = Multimodal.phashOf(Multimodal.decode(Multimodal.encodePng(a)))
    val hb = Multimodal.phashOf(Multimodal.decode(Multimodal.encodePng(b)))
    assert(ha.toSeq == hb.toSeq)
    // bands are 16/16/16/15 bits wide
    assert(ha.take(3).forall(v => v >= 0 && v < 65536) && ha(3) >= 0 && ha(3) < 32768)
  }

  test("phash_dedup finds the seeded byte-identical copies of doc 0") {
    val out = Multimodal.phashDedup(spark, sf)
      .filter(col("hamming") === 0).collect()
    val maxId = spark.read.parquet(s"$sf/documents.parquet")
      .agg(max("doc_id")).head.getLong(0)
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, maxId + 1)) && pairs.contains((0L, maxId + 2))
      && pairs.contains((maxId + 1, maxId + 2)),
      s"seeded duplicate pairs missing from $pairs")
  }

  test("media_meta decode matches the synthesis formula (real decode path)") {
    val rows = Multimodal.mediaMeta(spark, sf)
      .filter(col("doc_id").isin(0L, 1L, 3L, 7L)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getString(1) == "bmp" && rows(1L).getString(1) == "png")
    for ((d, r) <- rows) {
      val w = 8 + 2 * (d % 13); val h = 8 + 2 * ((d * 3) % 13)
      assert(r.getLong(2) == w && r.getLong(3) == h, s"dims of doc $d")
      // mean luma replayed from the formula
      val lumas = for (x <- 0 until w.toInt; y <- 0 until h.toInt) yield Multimodal.luma(
        ((d * 7 + x * 13 + y * 17) % 256).toInt,
        ((d * 11 + x * 3 + y * 5) % 256).toInt,
        ((d * 13 + x * 19 + y * 23) % 256).toInt)
      assert(r.getLong(5) == lumas.map(_.toLong).sum / (w * h), s"mean luma of doc $d")
    }
  }

  test("resize halves dims and survives the double codec round-trip") {
    val r = Multimodal.resize(spark, sf).filter(col("doc_id") === 5L).head
    val (w, h) = (8 + 2 * (5 % 13), 8 + 2 * ((5 * 3) % 13))
    assert(r.getLong(1) == w && r.getLong(2) == h)
    assert(r.getLong(3) == w / 2 && r.getLong(4) == h / 2)
  }

  test("feature_extract histogram bins sum to the pixel count") {
    val df = Multimodal.featureExtract(spark, sf)
      .groupBy("doc_id").agg(sum("n").as("n"), count(lit(1)).as("bins"))
      .filter(col("doc_id") < 20)
    for (r <- df.collect()) {
      val d = r.getLong(0)
      val expect = (8 + 2 * (d % 13)) * (8 + 2 * ((d * 3) % 13))
      assert(r.getLong(1) == expect && r.getLong(2) == 8L, s"doc $d")
    }
  }

  test("video cuts recover the shot structure exactly") {
    val sp = spark
    import sp.implicits._
    val rows = graft.queries.Multimodal.videoCuts(sp, sf)
      .select($"doc_id", $"n_frames", $"n_cuts", $"max_delta")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, nf, cuts, maxD) =>
      val sl = 2 + d % 3
      assert(nf == 6 + d % 7, s"doc $d frame count")
      // shot boundaries sit at the multiples of the shot length, and every
      // boundary's luma delta must clear the threshold while within-shot
      // pairs read exactly zero -- so cuts == boundary count is BOTH a
      // detector and a codec assertion (a lossy or misordered decode would
      // break the within-shot zeros)
      assert(cuts == (nf - 1) / sl, s"doc $d cuts $cuts vs shots")
      assert(maxD > 8, s"doc $d max delta $maxD")
    }
  }
}
