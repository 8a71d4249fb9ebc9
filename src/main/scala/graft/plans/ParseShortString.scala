package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Felts

/** Native Catalyst expression for the Cairo short-string decode
  * (`parse_short_string`, dao.ts:938-968).
  *
  * The plain Scala UDF in [[graft.functions.Felts]] is semantically
  * equivalent; this variant participates in whole-stage codegen (no
  * serialization boundary, no closure dispatch per row), which is the
  * preferred shape when a decode lands in a hot scan path (SURVEY §7.4 /
  * builder guidance: native Expression > UDF).
  */
case class ParseShortString(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"parse_short_string_native requires DECIMAL input, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ParseShortString.decode(input.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.ParseShortString.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): ParseShortString =
    copy(child = newChild)

  override def prettyName: String = "parse_short_string_native"
}

object ParseShortString {

  /** Static decode target shared by interpreted eval and generated code. */
  def decode(d: Decimal): UTF8String = {
    if (d == null) return null
    val s = Felts.parseShortStringImpl(d.toJavaBigDecimal)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** Register the native function surface on an existing session
    * (idempotent; single source of truth is [[GraftExtensions.functions]]). */
  def register(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
