package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric array columns.
  *
  * This is the hot inner loop of every similarity query (SURVEY LLM section:
  * cosine top-k, LSH/IVF re-rank, embedding near-dup): one score per
  * candidate pair, 64 multiply-adds each. The `aggregate(zip_with(...))`
  * higher-order-function form is semantically identical but Spark never
  * compiles lambda folds into whole-stage codegen — every element pays
  * interpreted-eval dispatch plus boxing. This expression participates in
  * codegen and reduces the pair score to one static call with a tight
  * primitive double loop.
  *
  * Determinism contract (the reason this is exact enough for the DuckDB
  * differential oracle): the fold is a strict LEFT-TO-RIGHT sum of
  * `(double) a[i] * (double) b[i]` starting at 0.0. Element casts
  * (float→double) are exact, products and the running sum are IEEE-754
  * doubles — so any engine that folds the same arrays in the same order
  * produces the same bits. The oracle mirrors it with DuckDB's
  * `list_reduce(list_prepend(0.0, list_transform(...)))`, which is the same
  * left fold. No order-independent decimal detour is needed because array
  * order is part of the data, not of the partitioning.
  *
  * Arrays of unequal length fold over the common prefix (our embeddings are
  * fixed-width; this choice just keeps the expression total). Null arrays
  * yield null; elements are assumed non-null (parquet vector columns).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.DotProduct.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {

  /** Static fold target shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Register the native function surface on an existing session
    * (idempotent; single source of truth is [[GraftExtensions.functions]]). */
  def register(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** The DuckDB mirror of the same left fold, as oracle SQL text:
    * `x` walks `a` sliced to the common-prefix length with 1-based index
    * `i`; `b[i]` is 1-based too, so the pairing is index-aligned. The
    * slice mirrors the Scala loop's `min(len)` bound — without it an
    * out-of-range `b[i]` yields NULL and poisons the whole sum, where the
    * expression returns the prefix dot. `list_prepend(0.0, …)` seeds the
    * fold at 0.0 exactly like the codegen loop. */
  def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(" +
      s"$a[1:LEAST(len($a), len($b))], " +
      s"(x, i) -> CAST(x AS DOUBLE) * CAST($b[i] AS DOUBLE))), (p, q) -> p + q)"
}
