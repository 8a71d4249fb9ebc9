package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Scalar conversions of the reference's PL/pgSQL helpers.
  *
  * Plain Scala UDFs (SURVEY.md §7.4): these run only at the decode boundary /
  * in dimension-sized views, never in a hot aggregation path, so a custom
  * codegen Expression is not warranted.
  */
object Felts {

  /** Cairo short string: base-256 ASCII packed into one felt
    * (`parse_short_string`, dao.ts:938-968). */
  def parseShortStringImpl(d: java.math.BigDecimal): String = {
    if (d == null) return null
    var n = d.toBigInteger
    if (n.signum < 0) return null
    val b256 = BigInteger.valueOf(256)
    val sb = new StringBuilder
    while (n.signum > 0) {
      val Array(q, r) = n.divideAndRemainder(b256)
      sb.insert(0, r.intValue.toChar)
      n = q
    }
    sb.toString
  }

  val parseShortString: UserDefinedFunction =
    udf((d: java.math.BigDecimal) => parseShortStringImpl(d))

  /** NUMERIC → 0x-hex (`numeric_to_hex`, dao.ts:1209-1229). */
  def numericToHexImpl(d: java.math.BigDecimal): String = {
    if (d == null) null
    else if (d.signum() < 0) "-0x" + d.negate.toBigInteger.toString(16)
    else "0x" + d.toBigInteger.toString(16)
  }

  val numericToHex: UserDefinedFunction =
    udf((d: java.math.BigDecimal) => numericToHexImpl(d))

  /** DuckDB-side unpack of a short-string packed integer with ≤ maxBytes
    * bytes: fixture strings are ASCII with no interior NULs, so skipping
    * zero bytes mirrors [[parseShortStringImpl]] exactly. Divisions are by
    * powers of 2 (256^i), hence exact in double. */
  def unpackShortStringSql(col: String, maxBytes: Int): String =
    (maxBytes - 1 to 0 by -1).map { i =>
      val div = math.pow(256.0, i.toDouble).toLong
      val byte = s"CAST(FLOOR(CAST($col AS DOUBLE) / $div.0) AS BIGINT) % 256"
      s"CASE WHEN ($byte) = 0 THEN '' ELSE CHR(CAST(($byte) AS INT)) END"
    }.mkString("CONCAT(", ", ", ")")
}
