package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** The extension entry point must give a session that the application code
  * never touched (no `register(spark)` call) the full native-function
  * surface, resolvable from raw SQL text. */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions(GraftExtensions) resolves every native function from SQL") {
    spark // force the shared session (and its SparkContext) to exist first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    try {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      // reuses the existing SparkContext; extensions apply to the new session
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(!(s2 eq spark))

      val dot = s2.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
        .head().getDouble(0)
      assert(dot == 11.0)

      val sh = s2.sql("SELECT graft_simhash32(array('a', 'b', 'a'))").head().getLong(0)
      val shDirect = graft.plans.TextFingerprint.simhash32(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array("a", "b", "a").map(org.apache.spark.unsafe.types.UTF8String.fromString)))
      assert(sh == shDirect)

      assert(s2.sql("SELECT size(graft_minhash_bands(array('a','b','c','d')))")
        .head().getInt(0) == 8)

      // 0x6869 = "hi"
      assert(s2.sql("SELECT parse_short_string_native(CAST(26729 AS DECIMAL(38,0)))")
        .head().getString(0) == "hi")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("the descriptor list and the legacy register() expose the same names") {
    val names = GraftExtensions.functions.map(_._1.funcName).toSet
    assert(names == Set("graft_dot", "graft_simhash32", "graft_minhash_bands",
      "graft_simhash64_bands", "graft_lsh_bucket", "graft_topk",
      "graft_kmv_sketch", "graft_minhash_sig", "graft_bloom_agg",
      "graft_might_contain", "parse_short_string_native", "graft_jl"))
  }

  test("wrong-arity SQL calls fail analysis cleanly, not with IndexOutOfBounds") {
    graft.plans.GraftExtensions.functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", id.funcName), builder)
    }
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_lsh_bucket(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("graft_lsh_bucket"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0D))").collect()
    }
    assert(e2.getMessage.contains("graft_dot"))
  }
}
