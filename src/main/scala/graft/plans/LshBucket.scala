package graft.plans

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH bucket id over an embedding column.
  *
  * `graft_lsh_bucket(embedding, planes[, table])` computes, per vector, the
  * sign bit of `planes` integer-hyperplane projections and packs them into a
  * BIGINT bucket id — the blocking key of the similarity-search scale path
  * (bucket equi-join replaces the all-pairs cross join; candidates shrink by
  * ~2^planes). Plane weights are `w(p, j) = ((p*37 + j*m) % 19) - 9` where
  * `m` is the table's multiplier ([[LshBucket.multipliers]]; table 0 is the
  * original `m = 13` schedule, so two-argument calls are unchanged).
  *
  * Why native: the SQL formulation is a nested `aggregate()` lambda fold —
  * planes × dim interpreted decimal adds per vector that Spark never
  * whole-stage-compiles (same pathology [[DotProduct]] documents for pair
  * scoring; it caused 4-8× regressions when the fold sat in the bucket
  * projection). This expression is one codegen'd static call per vector.
  *
  * Exactness contract (why the DuckDB oracle still matches bit-for-bit):
  * each projection accumulates in DECIMAL(18,12), exactly like the SQL fold
  * it replaces —
  *   - per term, `w·x` is an IEEE double product, cast to DECIMAL(18,12)
  *     the way Spark's `Cast(double, decimal)` does it: shortest decimal
  *     string (`Double.toString`) then `setScale(12, HALF_UP)`. The oracle
  *     mirrors this with `CAST(CAST(w*x AS VARCHAR) AS DECIMAL(18,12))`.
  *   - terms sum exactly (scale-12 unscaled longs; |proj| < 1e3 for |w| ≤ 9,
  *     |x| < 1, dim ≤ 64 — no overflow at any corpus size), so the sum is
  *     order-independent and the oracle's exploded-element SUM agrees.
  *   - the sign decision (`proj >= 0`) is therefore identical in both
  *     engines even when the double-rounded projection would straddle 0.
  *
  * Plane count is a parameter (foldable INT): candidate volume is
  * ~N²/2^planes, so planes must grow with corpus size — 12 bits (4096
  * buckets) is right for the sf-scale fixtures; a 10⁹-document corpus wants
  * ≥ 20 planes or a multi-table LSH. NOTE: the weight schedule repeats at
  * p = 19 (`p*37 mod 19` cycles), so planes > 19 requires a different
  * schedule — the expression rejects planes outside [1, 19] rather than
  * silently emitting duplicate hyperplanes. The `table` argument IS the
  * multi-table path: each table indexes an independent multiplier (distinct
  * j-coefficient mod the prime 19 → distinct hyperplane family), queries
  * union the candidate sets of several tables, and recall grows with table
  * count at linear (not exponential) candidate cost.
  *
  * Null array yields null; elements are assumed non-null (parquet vector
  * columns), matching [[DotProduct]].
  */
case class LshBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(first.dataType), second.dataType, third.dataType) match {
      case (Some(_), IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_bucket requires (ARRAY<FLOAT|DOUBLE>, INT[, INT]) inputs, got " +
          s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = first.nullable || second.nullable || third.nullable

  private def isFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(emb: Any, planes: Any, table: Any): Any =
    LshBucket.bucket(emb.asInstanceOf[ArrayData], planes.asInstanceOf[Int],
      table.asInstanceOf[Int], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (emb, planes, table) =>
      s"graft.plans.LshBucket.bucket($emb, $planes, $table, $isFloat)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshBucket =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_lsh_bucket"
}

object LshBucket {

  /** Two-argument form: the original single-table (m = 13) schedule. */
  def apply(emb: Expression, planes: Expression): LshBucket =
    LshBucket(emb, planes, Literal(0))

  /** Per-table j-multipliers. 19 is prime, so any m ≢ 0 (mod 19) yields 19
    * distinct plane patterns; distinct multipliers yield distinct hyperplane
    * families (different j-coefficients). Index 0 = 13 keeps two-argument
    * calls and every existing oracle unchanged. */
  val multipliers: IndexedSeq[Int] = IndexedSeq(13, 15, 17, 2, 3, 5, 7, 11)

  /** One term of the projection fold: `d` cast to DECIMAL(18,12) exactly as
    * Spark's double→decimal cast does (shortest decimal representation, then
    * HALF_UP at scale 12), returned as the scale-12 unscaled long. The
    * string hop is the contract, not an accident: rounding the shortest
    * representation and rounding the exact binary expansion differ on some
    * inputs, and the differential oracle reproduces the former.
    *
    * Garbage guards (a crawl-scale embedding table contains encoder
    * failures; an expression that THROWS kills the whole stage): NaN terms
    * contribute 0 to the projection, and magnitudes beyond the decimal
    * range saturate sign-preserving — deterministic, and only reachable by
    * inputs whose bucket assignment is meaningless anyway. */
  private def termUnscaled(d: Double): Long =
    if (java.lang.Double.isNaN(d)) 0L
    else if (d == Double.PositiveInfinity) Long.MaxValue
    else if (d == Double.NegativeInfinity) Long.MinValue + 1
    else {
      val unscaled = new JBigDecimal(java.lang.Double.toString(d), MathContext.DECIMAL128)
        .setScale(12, RoundingMode.HALF_UP)
        .unscaledValue()
      if (unscaled.bitLength() > 63)
        (if (unscaled.signum() >= 0) Long.MaxValue else Long.MinValue + 1)
      else unscaled.longValueExact()
    }

  /** Static fold target shared by interpreted eval and generated code. */
  def bucket(emb: ArrayData, planes: Int, table: Int, isFloat: Boolean): Long = {
    require(planes >= 1 && planes <= 19,
      s"graft_lsh_bucket: planes must be in [1, 19] (weight schedule repeats " +
        s"at p = 19; use a different schedule for wider buckets), got $planes")
    require(table >= 0 && table < multipliers.length,
      s"graft_lsh_bucket: table must be in [0, ${multipliers.length - 1}], got $table")
    val m = multipliers(table)
    val n = emb.numElements()
    var fp = 0L
    var p = 0
    while (p < planes) {
      var acc = 0L // unscaled DECIMAL(18,12) projection
      var j = 0
      while (j < n) {
        val x = if (isFloat) emb.getFloat(j).toDouble else emb.getDouble(j)
        val w = ((p * 37 + j * m) % 19 - 9).toDouble
        acc += termUnscaled(w * x)
        j += 1
      }
      if (acc >= 0) fp |= (1L << p)
      p += 1
    }
    fp
  }
}
