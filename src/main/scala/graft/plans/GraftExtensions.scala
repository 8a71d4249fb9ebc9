package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extension entry point for the graft native-function surface.
  *
  * The idiomatic way to ship custom Catalyst expressions in a library:
  * users opt in per cluster with
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`), and
  * every session — including ones created by thrift/connect servers that the
  * application code never touches — resolves `graft_dot`, `graft_simhash32`,
  * `graft_minhash_bands`, `graft_lsh_bucket` and `parse_short_string_native`
  * in SQL text.
  *
  * The in-repo query catalog keeps calling the per-module `register(spark)`
  * helpers (they cover sessions that already exist, which extensions cannot
  * retrofit); both paths share [[GraftExtensions.functions]] so the two
  * surfaces cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Every native function the library exposes, in one place. */
  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))),
    (FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[TextFingerprint.SimHash32].getName, "graft_simhash32"),
      (children: Seq[Expression]) => TextFingerprint.SimHash32(children.head)),
    (FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[TextFingerprint.MinHashBands].getName, "graft_minhash_bands"),
      (children: Seq[Expression]) => TextFingerprint.MinHashBands(children.head)),
    (FunctionIdentifier("graft_simhash64_bands"),
      new ExpressionInfo(classOf[TextFingerprint.SimHash64Bands].getName, "graft_simhash64_bands"),
      (children: Seq[Expression]) => TextFingerprint.SimHash64Bands(children.head)),
    (FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "graft_lsh_bucket"),
      (children: Seq[Expression]) => LshBucket(children.head, children(1))),
    (FunctionIdentifier("parse_short_string_native"),
      new ExpressionInfo(classOf[ParseShortString].getName, "parse_short_string_native"),
      (children: Seq[Expression]) => ParseShortString(children.head)))
}
