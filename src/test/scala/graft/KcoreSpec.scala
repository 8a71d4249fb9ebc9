package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** k-core peeling (`events_kcore`). The DuckDB gate pins the unrolled
  * rounds; these pins are the DEFINITION the round count must satisfy:
  * the output is a fixpoint (every survivor keeps ≥ k neighbors INSIDE
  * the core — so a 9th peel would remove nothing and 8 rounds suffice),
  * and the core is a genuine subgraph cut (survivor degrees can only
  * shrink vs the full graph). */
class KcoreSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  test("the 8-round output is a k-core fixpoint, nested in the full graph") {
    graft.fixtures.Fixtures.register(spark, sfDir)
    val core = Sessions.kcore(spark, sfDir).collect()
    assert(core.nonEmpty, "the fixture's influence graph must have a 3-core")
    // fixpoint: in-core degree ≥ k for every survivor (one more peel
    // would be a no-op — the fixed round budget reached the answer, not
    // an intermediate front)
    core.foreach { r =>
      assert(r.getAs[Long]("core_degree") >= Sessions.kcoreK,
        s"survivor below k after the last round: $r")
    }
    // nested: the in-core degree never exceeds the full-graph degree
    val full = Sessions.triangleCount(spark, sfDir)
      .select(col("user_id"), col("degree")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("degree")).toMap
    core.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(full.contains(u) && r.getAs[Long]("core_degree") <= full(u),
        s"core degree must be a subgraph degree: $r vs full ${full.get(u)}")
    }
  }
}
