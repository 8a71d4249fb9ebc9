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

  test("the coreness ladder nests and every non-empty level is a fixpoint") {
    graft.fixtures.Fixtures.register(spark, sfDir)
    val rows = Sessions.kcoreCurve(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(2L, 16L, 64L))
    // cores nest: a higher threshold can only shrink the surviving core
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    val edges = rows.map(_.getAs[Long]("n_edges"))
    assert(nodes.sliding(2).forall(w => w.length < 2 || w(1) <= w(0)),
      s"node counts must be non-increasing in k: ${nodes.toSeq}")
    assert(edges.sliding(2).forall(w => w.length < 2 || w(1) <= w(0)),
      s"edge counts must be non-increasing in k: ${edges.toSeq}")
    // fixpoint per level: min in-core degree ≥ k wherever the core survives
    rows.foreach { r =>
      if (r.getAs[Long]("n_nodes") > 0)
        assert(r.getAs[Long]("min_core_degree") >= r.getAs[Long]("k"),
          s"non-empty level below its own threshold: $r")
    }
    assert(nodes.head > 0, "the fixture must have a non-trivial 2-core")
  }

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
