package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.decode.FeltDecode._

/** Parser-combinator semantics ported from the reference's only test suite
  * (/root/reference/src/parse.test.ts) plus round-trip properties. */
class FeltDecodeSpec extends AnyFunSuite {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  private def hx(v: BigInt): String = "0x" + v.toString(16)

  test("parsePoolKey from offset 0 (parse.test.ts:6-23)") {
    val r = parsePoolKey(Vector("0x5", "0x4", "0x3", "0x2", "0x1", "0x0"), 0)
    assert(r.next == 5)
    assert(r.value == PoolKey(5, 4, 3, 2, 1))
  }

  test("parsePoolKey from mid-array (parse.test.ts:25-41)") {
    val r = parsePoolKey(Vector("0x5", "0x4", "0x3", "0x2", "0x1", "0x2", "0x3", "0x4"), 3)
    assert(r.next == 8)
    assert(r.value == PoolKey(2, 1, 2, 3, 4))
  }

  test("parseUint8Array: packed short string (parse.test.ts:44-90)") {
    val hello = BigInt("68656c6c6f20776f726c64", 16)
    assert(new String(parseUint8Array(Vector(hx(hello)), 0).value) == "hello world")
    assert(parseUint8Array(Vector("0x0"), 0).value.isEmpty)
    val r = parseUint8Array(Vector("0x0", hx(hello)), 1)
    assert(new String(r.value) == "hello world" && r.next == 2)
  }

  test("parseByteArray: single + multi-word + markdown (parse.test.ts:92-162)") {
    assert(parseByteArray(Vector("0x0", hx(BigInt("68656c6c6f", 16)), "0x5"), 0)
      == Res("hello", 3))
    assert(parseByteArray(Vector("0x7b", "0x0", hx(BigInt("68656c6c6f", 16)), "0x5"), 1)
      == Res("hello", 4))
    val long = Vector("0x1",
      hx(BigInt("4c6f6e6720737472696e672c206d6f7265207468616e203331206368617261", 16)),
      hx(BigInt("63746572732e", 16)), "0x6")
    assert(parseByteArray(long, 0) == Res("Long string, more than 31 characters.", 4))
    val md = Vector(
      hx(BigInt("25a6c62b25db639c2a0fb26678f1ac2870e5fe8b22d3bd3eec09691d6755d8f", 16)),
      "0x2",
      hx(BigInt("2320746573742070726f706f73616c206465736372697074696f6e0a0a6865", 16)),
      hx(BigInt("6c6c6f20776f726c640a0a6060600a636f64650a6060600a0a232320746573", 16)),
      hx(BigInt("740a0a6e6f74207265616c6c79", 16)),
      "0xd")
    val r = parseByteArray(md, 1)
    assert(r.next == 6)
    assert(r.value ==
      "# test proposal description\n\nhello world\n\n```\ncode\n```\n\n## test\n\nnot really")
  }

  test("parseBoolean is strict 0/1 (parse.ts:76-92)") {
    assert(!parseBoolean(Vector("0x0"), 0).value)
    assert(parseBoolean(Vector("0x1"), 0).value)
    intercept[IllegalArgumentException](parseBoolean(Vector("0x2"), 0))
  }

  test("u256 lo/hi composition round-trip (parse.ts:40-46)") {
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue), Gen.chooseNum(0L, Long.MaxValue)) {
      (lo: Long, hi: Long) =>
        val r = parseU256(Vector(hx(BigInt(lo)), hx(BigInt(hi))), 0)
        r.value == BigInt(lo) + BigInt(hi) * (BigInt(1) << 128) && r.next == 2
    })
  }

  test("i129 sign-word property (parse.ts:48-55)") {
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue), Gen.oneOf(0L, 1L, 7L)) {
      (mag: Long, sign: Long) =>
        val r = parseI129(Vector(hx(BigInt(mag)), hx(BigInt(sign))), 0)
        r.value == (if (sign != 0) -BigInt(mag) else BigInt(mag))
    })
  }

  test("span length-prefix round-trip (parse.ts:11-29)") {
    check(Prop.forAll(Gen.listOfN(5, Gen.chooseNum(0L, Long.MaxValue))) { xs: List[Long] =>
      val data = hx(BigInt(xs.length)) +: xs.map(x => hx(BigInt(x)))
      val r = parseSpanOf(parseFelt252)(data.toVector, 0)
      r.value == xs.map(BigInt(_)) && r.next == xs.length + 1
    })
  }

  test("backwardsCompatible trailing field (parse.ts:98-107)") {
    assert(backwardsCompatible(parseFelt252)(Vector("0x1"), 1).value.isEmpty)
    assert(backwardsCompatible(parseFelt252)(Vector("0x1", "0x2"), 1).value.contains(BigInt(2)))
  }

  test("short-string UDF decodes felt packing (dao.ts:938-968)") {
    import graft.functions.Felts
    assert(Felts.parseShortStringImpl(new java.math.BigDecimal(5524272)) == "TK0")
    assert(Felts.parseShortStringImpl(new java.math.BigDecimal(92837519912496L)) == "Token0")
    assert(Felts.numericToHexImpl(new java.math.BigDecimal(255)) == "0xff")
  }
}
