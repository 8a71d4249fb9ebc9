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

  /** Wrap a builder with an arity check so a SQL call with the wrong number
    * of arguments fails analysis with the expected signature instead of an
    * IndexOutOfBoundsException from `children(i)`. */
  private def arities(name: String, ns: Set[Int])(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children =>
      if (ns.contains(children.length)) build(children)
      else throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> ns.toSeq.sorted.mkString(" or "),
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    arities(name, Set(n))(build)

  /** Every native function the library exposes, in one place. */
  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      arity("graft_dot", 2)(c => DotProduct(c.head, c(1)))),
    (FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[TextFingerprint.SimHash32].getName, "graft_simhash32"),
      arity("graft_simhash32", 1)(c => TextFingerprint.SimHash32(c.head))),
    (FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[TextFingerprint.MinHashBands].getName, "graft_minhash_bands"),
      arity("graft_minhash_bands", 1)(c => TextFingerprint.MinHashBands(c.head))),
    (FunctionIdentifier("graft_simhash64_bands"),
      new ExpressionInfo(classOf[TextFingerprint.SimHash64Bands].getName, "graft_simhash64_bands"),
      arity("graft_simhash64_bands", 1)(c => TextFingerprint.SimHash64Bands(c.head))),
    (FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "graft_lsh_bucket"),
      arities("graft_lsh_bucket", Set(2, 3))(c =>
        if (c.length == 2) LshBucket(c.head, c(1)) else LshBucket(c.head, c(1), c(2)))),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[TextFingerprint.MinHashSig].getName, "graft_minhash_sig"),
      arity("graft_minhash_sig", 1)(c => TextFingerprint.MinHashSig(c.head))),
    (FunctionIdentifier("graft_kmv_sketch"),
      new ExpressionInfo(classOf[TextFingerprint.KmvSketch].getName, "graft_kmv_sketch"),
      arity("graft_kmv_sketch", 2)(c => TextFingerprint.KmvSketch(c.head, c(1)))),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKLongs].getName, "graft_topk"),
      arity("graft_topk", 2)(c => TopKLongs(c.head, c(1)))),
    // Catalyst's bloom-filter pair, exposed to SQL. Spark builds these
    // internally for runtime row-level join filtering but never registers
    // them; a decontamination pipeline wants them first-class: build one
    // bloom over the (tiny) probe side, pre-filter the corpus scan-side,
    // and exact-verify only the survivors. No false negatives, so the
    // bloom is a pure bandwidth optimization over the exact semantics.
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      arities("graft_bloom_agg", Set(1, 2, 3))(c =>
        if (c.length == 1)
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c.head)
        else if (c.length == 2)
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c.head, c(1))
        else
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c.head, c(1), c(2)))),
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      arity("graft_might_contain", 2)(c =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(c.head, c(1)))),
    (FunctionIdentifier("parse_short_string_native"),
      new ExpressionInfo(classOf[ParseShortString].getName, "parse_short_string_native"),
      arity("parse_short_string_native", 1)(c => ParseShortString(c.head))),
    (FunctionIdentifier("graft_jl"),
      new ExpressionInfo(classOf[JlProject].getName, "graft_jl"),
      arity("graft_jl", 2)(c => JlProject(c.head, c(1)))))
}
