package graft

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.net._
import graft.sources.v2.BlockFeedProvider

/** The h2c transport layer in isolation (frames + HPACK) and end-to-end
  * (the gRPC block stream over HTTP/2, including flow control under a
  * DATA volume that exhausts the 65535-octet default windows). */
class Http2WireSpec extends AnyFunSuite {
  import Http2Wire._

  test("frame header round-trips type, flags, stream id, payload") {
    val out = new java.io.ByteArrayOutputStream()
    val f = Frame(THeaders, FEndHeaders | FEndStream, 1, Array[Byte](1, 2, 3))
    writeFrame(out, f)
    val r = readFrame(new ByteArrayInputStream(out.toByteArray)).get
    assert(r.tpe == THeaders && r.flags == (FEndHeaders | FEndStream))
    assert(r.streamId == 1 && r.payload.toSeq == Seq[Byte](1, 2, 3))
    assert(readFrame(new ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
  }

  test("HPACK: static-indexed, indexed-name, and new-name literals round-trip") {
    val headers = Seq(
      ":method" -> "POST",                       // exact static match -> indexed
      ":scheme" -> "http",                       // exact static match
      ":path" -> GrpcPath,                       // static name, literal value
      ":authority" -> "127.0.0.1:4000",
      "content-type" -> "application/grpc+proto",
      "te" -> "trailers",                        // new name, literal
      "grpc-status" -> "0",
      "x-long" -> ("v" * 300))                   // forces integer continuation
    val decoded = new HpackDecoder().decode(encodeHeaders(headers))
    assert(decoded == headers)
  }

  test("HPACK decoder: incremental indexing populates the dynamic table") {
    // literal with incremental indexing, new name "a"="b", then indexed 62
    val block = Array[Byte](
      0x40, 0x01, 'a'.toByte, 0x01, 'b'.toByte, // 0x40 = incremental, new name
      (0x80 | 62).toByte)                        // indexed: first dynamic entry
    val decoded = new HpackDecoder().decode(block)
    assert(decoded == Seq("a" -> "b", "a" -> "b"))
  }

  test("HPACK decoder rejects Huffman literals instead of mis-parsing them") {
    val block = Array[Byte](0x00, (0x80 | 1).toByte, 0x3f) // H bit set on name
    val e = intercept[IllegalArgumentException] {
      new HpackDecoder().decode(block)
    }
    assert(e.getMessage.contains("Huffman"))
  }

  test("h2c e2e: the reorg scenario drains identically over HTTP/2") {
    val root = SparkSpec.tempDir("graft-h2c-e2e").toString
    val script = BlockStreamScenario.chainWithReorg(blocks = 80L, reorgAt = 50L)
    val srv = new BlockStreamServer(script, binary = true, h2c = true)
    try {
      val n = BlockStreamDrainer.drain(
        "127.0.0.1", srv.boundPort, s"$root/feed", binary = true, h2c = true)
      assert(n == script.length, s"every message becomes one chunk, got $n")
      val ids = BlockFeedProvider.listChunks(s"$root/feed")
        .map(p => java.nio.file.Paths.get(p).getFileName.toString)
        .flatMap(BlockFeedProvider.chunkId)
      assert(ids.toSeq == (1L to script.length).toSeq)
    } finally srv.close()
  }

  test("h2c resume: a second connection subscribes from the chunk count") {
    val root = SparkSpec.tempDir("graft-h2c-resume").toString
    val script = BlockStreamScenario.chainWithReorg(blocks = 40L, reorgAt = 20L)
    val srv = new BlockStreamServer(script, binary = true, h2c = true)
    try {
      val (n1, done1) = BlockStreamDrainer.drainOnce(
        "127.0.0.1", srv.boundPort, s"$root/feed", maxMessages = 2,
        binary = true, h2c = true)
      assert(n1 == 2 && !done1)
      val (n2, done2) = BlockStreamDrainer.drainOnce(
        "127.0.0.1", srv.boundPort, s"$root/feed", binary = true, h2c = true)
      assert(done2 && n1 + n2 == script.length)
    } finally srv.close()
  }

  test("flow control: a DATA volume past the 65535-octet windows still drains") {
    // BOTH ends pinned to the RFC default window: one data message with
    // 6000 events is ~200 KB of protobuf — more than three times the
    // 65535-octet connection/stream windows, so the server MUST block on
    // the drainer's WINDOW_UPDATEs (and split to 16 KB frames) to finish;
    // a missing credit grant on either side deadlocks this test. The
    // production default (TunedWindow) would mask the blocking path here,
    // which is exactly why the knob is explicit.
    val root = SparkSpec.tempDir("graft-h2c-flow").toString
    val big = BlockStreamWire.data(Seq(BlockStreamWire.WireBlock(
      1L, 1704067200L, events = (0L until 6000L).map(i => (i / 50, i % 50)))))
    val srv = new BlockStreamServer(Seq(big), binary = true, h2c = true,
      h2cWindow = DefaultWindow)
    try {
      val n = BlockStreamDrainer.drain(
        "127.0.0.1", srv.boundPort, s"$root/feed", binary = true, h2c = true,
        h2cWindow = DefaultWindow)
      assert(n == 1L)
      val chunk = BlockFeedProvider.listChunks(s"$root/feed").head
      val rows = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(chunk)), "UTF-8").linesIterator.size
      assert(rows >= 6000, s"all 6000 events must cross the transport, got $rows")
    } finally srv.close()
  }

  test("tuned windows: the same oversized volume drains at the production default") {
    // the 4 MiB TunedWindow + batched half-window grants: same payload,
    // default knobs — covers the SETTINGS id-4 advertisement, the
    // connection-level top-up WINDOW_UPDATE, and the batched grant path
    // (200 KB < 4 MiB, so the sender never blocks; credit frames go out
    // at half-window, not per 16 KB frame)
    val root = SparkSpec.tempDir("graft-h2c-tuned").toString
    val big = BlockStreamWire.data(Seq(BlockStreamWire.WireBlock(
      1L, 1704067200L, events = (0L until 6000L).map(i => (i / 50, i % 50)))))
    val srv = new BlockStreamServer(Seq(big), binary = true, h2c = true)
    try {
      val n = BlockStreamDrainer.drain(
        "127.0.0.1", srv.boundPort, s"$root/feed", binary = true, h2c = true)
      assert(n == 1L)
    } finally srv.close()
  }
}
