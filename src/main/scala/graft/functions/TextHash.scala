package graft.functions

/** Shared deterministic text hashing, expressed as SQL snippets for BOTH
  * engines (Spark higher-order functions / DuckDB list functions) so that
  * dedup and fingerprint operators are oracle-checkable.
  *
  * All hashes are pure integer arithmetic (no engine hash builtins, which
  * differ across engines): a polynomial rolling hash over ASCII codes mod
  * p = 1e9+7, folded left-to-right. Every intermediate stays < 2^63.
  *
  * On the Spark side these compile to codegen'd higher-order expressions —
  * no UDFs in the hot path.
  */
object TextHash {

  /** Modulus for all polynomial hashes. */
  val P: Long = 1000000007L

  /** Spark SQL: hash of one word column (polynomial over chars). */
  def sparkWordHash(col: String): String =
    s"aggregate(transform(split($col, ''), c -> CAST(ascii(c) AS BIGINT)), " +
      s"CAST(0 AS BIGINT), (acc, x) -> (acc * 131 + x) % $P)"

  /** DuckDB: same fold (prepend the 0 seed — list_reduce has no init). */
  def duckWordHash(col: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($col, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 131 + b) % $P)"

  /** Spark SQL: whole-document fingerprint — fold word hashes. `wordsCol`
    * is an array<string> column. */
  def sparkDocFingerprint(wordsCol: String): String =
    s"aggregate(transform($wordsCol, w -> ${sparkWordHash("w")}), " +
      s"CAST(0 AS BIGINT), (acc, x) -> (acc * 131 + x) % $P)"

  /** DuckDB: same fingerprint over a list-of-words expression. */
  def duckDocFingerprint(wordsCol: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform($wordsCol, w -> ${duckWordHash("w")})), " +
      s"(a, b) -> (a * 131 + b) % $P)"
}
