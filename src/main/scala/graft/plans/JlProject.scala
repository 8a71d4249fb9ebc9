package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Johnson–Lindenstrauss ±1 random projection (Achlioptas 2003,
  * "Database-friendly random projections": sign entries from a
  * deterministic mix suffice — no Gaussians, no stored matrix). The
  * OBLIVIOUS counterpart of the trained PCA rotation ([[graft.queries.Pca]]):
  * the projection is a pure function of (element index, output index), so
  * reducing a 100 TB corpus to k dims costs ZERO training passes and the
  * "matrix" never exists — each executor materializes signs on the fly
  * inside one tight d×k multiply-add loop per vector.
  *
  * Determinism contract (same as [[DotProduct]]): per output j the fold is
  * a strict left-to-right `acc += ±x_i` over ascending i from 0.0 —
  * float→double casts exact, IEEE addition — so any engine folding the
  * same array in the same order with the same signs produces the same
  * bits. The sign is the top bit of murmur3's fmix32 finalizer over the
  * cell mix (i·2654435761 + j·2246822519) mod 2³² — [[sign]] is the one
  * definition, and the oracle twin replays the identical chain in
  * HUGEINT SQL (the Similarity `jl_s` CTE). fmix is NOT decorative: a
  * linear mix leaves adjacent output columns with near-identical sign
  * patterns (measured max column correlation 0.94–1.0 and distance
  * ratios 0.47–1.5 on the fixture); the avalanched signs measure 0.35
  * max correlation and an unbiased ≈0.98 distance ratio.
  */
case class JlProject(child: Expression, kExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = kExpr

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if kExpr.dataType == IntegerType && kExpr.foldable =>
      // k is foldable: reject null/negative widths at ANALYSIS time —
      // new Array[Double](-4) would otherwise throw mid-query
      kExpr.eval() match {
        case k: Int if k >= 0 => TypeCheckResult.TypeCheckSuccess
        case bad => TypeCheckResult.TypeCheckFailure(
          s"graft_jl output width must be a non-negative INT literal, got $bad")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_jl requires (ARRAY<FLOAT|DOUBLE>, INT literal), got " +
        s"${child.dataType.simpleString}, ${kExpr.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable || kExpr.nullable

  override protected def nullSafeEval(a: Any, k: Any): Any =
    JlProject.project(a.asInstanceOf[ArrayData], k.asInstanceOf[Int], elemFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, k) =>
      s"graft.plans.JlProject.project($a, $k, $elemFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JlProject =
    copy(child = newLeft, kExpr = newRight)

  override def prettyName: String = "graft_jl"
}

object JlProject {

  private final val Mask = 0xFFFFFFFFL

  /** +1/−1 for cell (i, j): murmur3 fmix32 over the linear cell mix, top
    * bit as the sign. Long products wrap mod 2⁶⁴ and 2³² | 2⁶⁴, so the
    * `& Mask` after each multiply is exactly mod 2³² — the SQL twin does
    * the same multiplies in HUGEINT with explicit `% 4294967296`. */
  def sign(i: Long, j: Long): Double = {
    var h = (i * 2654435761L + j * 2246822519L) & Mask
    h = ((h ^ (h >>> 16)) * 2246822507L) & Mask
    h = ((h ^ (h >>> 13)) * 3266489909L) & Mask
    h = h ^ (h >>> 16)
    if (h < 2147483648L) 1.0 else -1.0
  }

  /** Static projection target shared by interpreted eval and codegen:
    * out[j] = Σ_i sign(i,j)·a[i], i ascending per j — one d×k primitive
    * loop, no allocation beyond the k-long output. */
  def project(a: ArrayData, k: Int, aFloat: Boolean): ArrayData = {
    val d = a.numElements()
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        acc += sign(i.toLong, j.toLong) * x
        i += 1
      }
      out(j) = acc
      j += 1
    }
    ArrayData.toArrayData(out)
  }
}
