package graft.decode

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

/** Combinator parsers for Starknet felt252-array ABI decoding — the typed
  * decode boundary of the engine (reference: /root/reference/src/parse.ts).
  *
  * A raw event payload is an ordered array of 0x-hex felt words. Parsers
  * consume `(data, offset)` and return `(value, next)`. These run inside
  * ingest-time UDFs only (S3-S7 in SURVEY.md §2.1); everything downstream of
  * decode is columnar.
  */
object FeltDecode {

  type Felts = IndexedSeq[String]

  /** Parse result: decoded value + next offset. */
  final case class Res[+T](value: T, next: Int)

  type Parser[T] = (Felts, Int) => Res[T]

  private def word(data: Felts, i: Int): BigInt = {
    val s = data(i)
    if (s.startsWith("0x") || s.startsWith("0X")) BigInt(s.drop(2), 16)
    else BigInt(s)
  }

  /** u128 / u64 / felt252 / address: one word (parse.ts:31-36,38,67-74). */
  val parseFelt252: Parser[BigInt] = (d, i) => Res(word(d, i), i + 1)
  val parseU128: Parser[BigInt] = parseFelt252
  val parseU64: Parser[BigInt] = parseFelt252
  val parseAddress: Parser[BigInt] = parseFelt252

  /** u256: lo word + hi word * 2^128 (parse.ts:40-46). */
  val parseU256: Parser[BigInt] = (d, i) =>
    Res(word(d, i) + word(d, i + 1) * (BigInt(1) << 128), i + 2)

  /** i129: magnitude word + sign word (non-zero ⇒ negative, parse.ts:48-55). */
  val parseI129: Parser[BigInt] = (d, i) =>
    Res(word(d, i) * (if (word(d, i + 1) != 0) -1 else 1), i + 2)

  /** u8 (parse.ts:60-65). */
  val parseU8: Parser[Int] = (d, i) => Res(word(d, i).toInt, i + 1)

  /** strict 0/1 boolean (parse.ts:76-92). */
  val parseBoolean: Parser[Boolean] = (d, i) => word(d, i) match {
    case x if x == 0 => Res(false, i + 1)
    case x if x == 1 => Res(true, i + 1)
    case _ => throw new IllegalArgumentException("Invalid boolean value")
  }

  /** Length-prefixed span (parse.ts:11-29). */
  def parseSpanOf[T](p: Parser[T]): Parser[Seq[T]] = (d, i) => {
    val n = word(d, i).toInt
    val out = ArrayBuffer.empty[T]
    var idx = i + 1
    while (out.length < n) {
      val r = p(d, idx)
      out += r.value
      idx = r.next
    }
    Res(out.toSeq, idx)
  }

  /** Trailing optional field — parse only if data remains (parse.ts:98-107). */
  def backwardsCompatible[T](p: Parser[T]): Parser[Option[T]] = (d, i) =>
    if (i < d.length) { val r = p(d, i); Res(Some(r.value), r.next) }
    else Res(None, i)

  /** Ordered-field struct decode (parse.ts:109-139): fields applied in index
    * order, consuming sequentially. */
  def combineParsers[T](fields: Seq[(String, Parser[Any])])(build: Map[String, Any] => T): Parser[T] =
    (d, i) => {
      var idx = i
      val m = Map.newBuilder[String, Any]
      fields.foreach { case (name, p) =>
        val r = p(d, idx)
        m += name -> r.value
        idx = r.next
      }
      Res(build(m.result()), idx)
    }

  /** One felt holding ≤31 packed bytes, most-significant first, stopping at
    * the first zero byte from the low end (parse.ts:141-166). */
  val parseUint8Array: Parser[Array[Byte]] = (d, i) => {
    val v = word(d, i)
    val out = ArrayBuffer.empty[Byte]
    var j = 0
    var stop = false
    while (j < 31 && !stop) {
      val byte = (v >> (j * 8)) & 0xff
      if (byte == 0) stop = true
      else {
        out.prepend(byte.toByte)
        j += 1
      }
    }
    Res(out.toArray, i + 1)
  }

  /** Cairo ByteArray: span of 31-byte words + pending word (+ unused pending
    * length), decoded as UTF-8 (parse.ts:168-180). */
  val parseByteArray: Parser[String] = (d, i) => {
    val words = parseSpanOf(parseUint8Array)(d, i)
    val pending = parseUint8Array(d, words.next)
    val bytes = (words.value :+ pending.value).flatten.toArray
    Res(new String(bytes, StandardCharsets.UTF_8), words.next + 2)
  }

  /** Typed pool key (events/core.ts): the 5-tuple every pool event carries. */
  final case class PoolKey(token0: BigInt, token1: BigInt, fee: BigInt,
      tickSpacing: BigInt, extension: BigInt)

  val parsePoolKey: Parser[PoolKey] = (d, i) => {
    val t0 = parseAddress(d, i)
    val t1 = parseAddress(d, t0.next)
    val fee = parseU128(d, t1.next)
    val ts = parseU128(d, fee.next)
    val ext = parseAddress(d, ts.next)
    Res(PoolKey(t0.value, t1.value, fee.value, ts.value, ext.value), ext.next)
  }
}
