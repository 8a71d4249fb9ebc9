package graft.functions

/** The power-of-two binning contract shared by every log₂-histogram
  * consumer — `events_hist_quantiles`, `text_zipf_spectrum`, and (as
  * documented executor-side code) `streaming.StreamingHist.bin`. One
  * definition per expression so the hist/zipf/streaming binning contracts
  * cannot silently diverge (the `bucketExprSql`/`splitCaseSql` discipline).
  *
  * `floor(log2 v)` for v ≥ 1 via `length(bin(v)) - 1`: the binary-string
  * hop is the one spelling whose SQL text is IDENTICAL in Spark and DuckDB,
  * and it equals `63 - numberOfLeadingZeros(v)` (the streaming twin's JVM
  * form, asserted bit-exactly in StreamingHistSpec). */
object Log2Bin {

  /** Both engines: floor(log2(col)) as BIGINT, for col ≥ 1. */
  def binSql(col: String): String = s"CAST(length(bin($col)) - 1 AS BIGINT)"

  /** Spark: inclusive lower bound of a bin, 2^bin. */
  def sparkLoSql(bin: String): String =
    s"shiftleft(CAST(1 AS BIGINT), CAST($bin AS INT))"

  /** Spark: inclusive upper bound of a bin, 2^(bin+1) - 1. */
  def sparkHiSql(bin: String): String =
    s"shiftleft(CAST(1 AS BIGINT), CAST($bin AS INT) + 1) - 1"

  /** DuckDB: inclusive lower bound — the 1 MUST be BIGINT before the
    * shift (INTEGER `<<` overflows at bin ≥ 31; Spark shifts a long). */
  def duckLoSql(bin: String): String =
    s"CAST(1 AS BIGINT) << CAST($bin AS INT)"

  /** DuckDB: inclusive upper bound. */
  def duckHiSql(bin: String): String =
    s"(CAST(1 AS BIGINT) << (CAST($bin AS INT) + 1)) - 1"
}
