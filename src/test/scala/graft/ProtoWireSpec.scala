package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}
import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.net.{BlockProtoCodec, BlockStreamDrainer, BlockStreamScenario, BlockStreamServer, BlockStreamWire, ProtoWire}
import graft.sources.v2.BlockFeedProvider

/** The hand-rolled protobuf framing ([[ProtoWire]]/[[BlockProtoCodec]]):
  * lossless against the JSON grammar trees the drainer dispatches on,
  * spec-conformant on the encoding details that matter (proto3 presence,
  * packed repeated, unknown-field skip, varint edges), and equivalent to
  * the JSON framing end-to-end through a real socket + drainer.
  */
class ProtoWireSpec extends AnyFunSuite {

  private val m = BlockStreamWire.mapper

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  /** Jackson parses small ints as IntNode while builders use LongNode;
    * value-equal trees can be node-class-unequal. Compare re-parsed. */
  private def norm(json: String): com.fasterxml.jackson.databind.JsonNode =
    m.readTree(json)
  private def roundtripResponse(json: String): Unit = {
    val decoded = BlockProtoCodec.decodeResponse(
      BlockProtoCodec.encodeResponse(m.readTree(json)))
    assert(norm(decoded.toString) == norm(json),
      s"lossy roundtrip:\n  in  $json\n  out $decoded")
  }

  // ------------------------------------------------------------ roundtrip

  private val genText: Gen[String] = Gen.oneOf(
    Gen.const(""), Gen.alphaNumStr,
    Gen.const("görli ⛓ 黑块"), // non-ASCII UTF-8 through bytes fields
    Gen.const("end-of-script"))

  private val genBlock: Gen[BlockStreamWire.WireBlock] = for {
    bn <- Gen.chooseNum(0L, Long.MaxValue)
    ts <- Gen.chooseNum(0L, 4102444800L)
    nEv <- Gen.chooseNum(0, 5)
    evs <- Gen.listOfN(nEv, Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 1000L)))
  } yield BlockStreamWire.WireBlock(bn, ts, evs)

  test("data messages roundtrip losslessly (property)") {
    val genData = for {
      blocks <- Gen.listOfN(3, genBlock)
      fin <- Gen.oneOf("accepted", "pending", "finalized", "")
      prod <- Gen.oneOf("live", "backfill", "")
    } yield BlockStreamWire.data(blocks, fin, prod)
    check(Prop.forAll(genData) { j => roundtripResponse(j); true })
  }

  test("invalidate / heartbeat / systemMessage roundtrip (property)") {
    val genMsg = Gen.oneOf(
      Gen.chooseNum(0L, Long.MaxValue).map(BlockStreamWire.invalidate),
      Gen.const(BlockStreamWire.heartbeat),
      Gen.zip(genText, Gen.oneOf(false, true)).map {
        case (t, err) => BlockStreamWire.systemMessage(t, err)
      })
    check(Prop.forAll(genMsg) { j => roundtripResponse(j); true })
    // the oneof corner: an EMPTY stderr must stay a stderr arm — oneof
    // members serialize even at their default value
    roundtripResponse(BlockStreamWire.systemMessage("", stderr = true))
  }

  test("subscribe requests roundtrip losslessly") {
    for (cursor <- Seq(0L, 1L, 7L, Int.MaxValue + 1L)) {
      val json = BlockStreamWire.subscribe(cursor)
      val decoded = BlockProtoCodec.decodeRequest(
        BlockProtoCodec.encodeRequest(m.readTree(json)))
      assert(norm(decoded.toString) == norm(json))
    }
  }

  // ------------------------------------------------- wire-format details

  test("varints: 64-bit edges survive; proto3 zero-default is not serialized") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, Long.MaxValue, -1L)) {
      val w = new ProtoWire.Writer; w.varint(v)
      assert(new ProtoWire.Reader(w.toBytes).varint() == v, s"varint $v")
    }
    // field-level: uint64(f, 0) writes nothing (scalar default), and the
    // reader materializes the default back — blockNumber 0 still decodes
    val zeroBlock = BlockStreamWire.data(
      Seq(BlockStreamWire.WireBlock(0L, 0L, Seq((0L, 0L)))))
    val enc = BlockProtoCodec.encodeResponse(m.readTree(zeroBlock))
    roundtripResponse(zeroBlock)
    val nonZero = BlockProtoCodec.encodeResponse(m.readTree(
      BlockStreamWire.data(Seq(BlockStreamWire.WireBlock(5L, 9L, Seq((2L, 3L)))))))
    assert(enc.length < nonZero.length,
      "zero-valued scalars must be absent from the wire, not encoded")
  }

  test("unknown fields are skipped, not fatal (forward compatibility)") {
    val base = BlockProtoCodec.encodeResponse(
      m.readTree(BlockStreamWire.invalidate(42L)))
    // append unknown fields of every wire type this decoder can meet:
    // field 900 varint, field 901 length-delimited, field 902 64-bit,
    // field 903 32-bit
    val bytes2 = {
      val o = new ByteArrayOutputStream()
      o.write(base)
      val w2 = new ProtoWire.Writer
      w2.varint((900L << 3) | 0); w2.varint(123456L)
      w2.varint((901L << 3) | 2); w2.varint(3L)
      o.write(w2.toBytes); o.write("abc".getBytes)
      val w3 = new ProtoWire.Writer
      w3.varint((902L << 3) | 1)
      o.write(w3.toBytes); o.write(Array.fill[Byte](8)(7))
      val w4 = new ProtoWire.Writer
      w4.varint((903L << 3) | 5)
      o.write(w4.toBytes); o.write(Array.fill[Byte](4)(9))
      o.toByteArray
    }
    val decoded = BlockProtoCodec.decodeResponse(bytes2)
    assert(decoded.path("_tag").asText() == "invalidate")
    assert(decoded.path("invalidate").path("cursor").path("orderKey").asLong() == 42L)
  }

  test("gRPC length-prefixed framing: roundtrip, clean EOF, truncation errors") {
    val msgs = Seq(
      BlockProtoCodec.encodeResponse(m.readTree(BlockStreamWire.heartbeat)),
      BlockProtoCodec.encodeResponse(m.readTree(BlockStreamWire.invalidate(9L))))
    val out = new ByteArrayOutputStream()
    msgs.foreach(ProtoWire.writeFrame(out, _))
    val in = new ByteArrayInputStream(out.toByteArray)
    assert(msgs.forall(msg => ProtoWire.readFrame(in).get.sameElements(msg)))
    assert(ProtoWire.readFrame(in).isEmpty, "EOF at a frame boundary is clean")

    // EOF mid-body is an error, never a silent truncation
    val torn = out.toByteArray.dropRight(1)
    val tin = new ByteArrayInputStream(torn)
    ProtoWire.readFrame(tin) // first frame intact
    intercept[EOFException](ProtoWire.readFrame(tin))
  }

  // ------------------------------------------------------------------ e2e

  test("binary framing ≡ JSON framing through a real socket + drainer") {
    val script = BlockStreamScenario.chainWithReorg(blocks = 40L, reorgAt = 20L)
    def drained(binary: Boolean): (Long, Seq[String]) = {
      val dir = SparkSpec.tempDir(s"graft-proto-e2e-$binary").toString
      val srv = new BlockStreamServer(script, binary = binary)
      try {
        val n = BlockStreamDrainer.drain(
          "127.0.0.1", srv.boundPort, dir, binary = binary)
        val chunks = BlockFeedProvider.listChunks(dir).sorted.map { p =>
          new String(Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
        }
        (n, chunks.toSeq)
      } finally srv.close()
    }
    val (nj, jsonChunks) = drained(binary = false)
    val (nb, protoChunks) = drained(binary = true)
    assert(nj == script.length && nb == nj)
    assert(protoChunks == jsonChunks,
      "the two framings must produce byte-identical chunk contents")
  }

  test("binary drainer resumes from the chunk count like the JSON one") {
    val script = BlockStreamScenario.chainWithReorg(blocks = 40L, reorgAt = 20L)
    val dir = SparkSpec.tempDir("graft-proto-resume").toString
    val srv = new BlockStreamServer(script, binary = true)
    try {
      val (n1, done1) = BlockStreamDrainer.drainOnce(
        "127.0.0.1", srv.boundPort, dir, maxMessages = 3, binary = true)
      assert(n1 == 3 && !done1)
      val (n2, done2) = BlockStreamDrainer.drainOnce(
        "127.0.0.1", srv.boundPort, dir, binary = true)
      assert(done2 && n1 + n2 == script.length)
      val ids = BlockFeedProvider.listChunks(dir)
        .map(p => java.nio.file.Paths.get(p).getFileName.toString)
        .flatMap(BlockFeedProvider.chunkId)
      assert(ids.toSeq == (1L to script.length).toSeq)
    } finally srv.close()
  }
}
