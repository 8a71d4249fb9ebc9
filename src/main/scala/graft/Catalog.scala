package graft

import org.apache.spark.sql.SparkSession

/** SQL facade over the query catalog: every `SparkEntry.queries` entry
  * becomes a named temp view, so a user of the reference — who addresses
  * its catalog as Postgres views (`SELECT * FROM pool_states_view`) — can
  * address this engine the same way (`spark.sql("SELECT * FROM
  * pool_states")`), including joins across derived views.
  *
  * Registration is pure DDL: each view captures the query's LOGICAL plan,
  * nothing executes until a consumer runs. Catalyst then optimizes the
  * CONSUMING statement through the view boundary (filter pushdown into the
  * view's plan, column pruning of unused view outputs), exactly like the
  * reference's non-materialized views — materialization tiers stay the
  * caller's choice (`spark.table(name).write...` or Memo), as in the
  * reference's MATERIALIZED VIEW split. */
object Catalog {

  /** Register the full catalog (plus the shared fixture base views) for
    * `sfDir`. Idempotent; re-registering after a data change re-points
    * every view. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    fixtures.Fixtures.register(spark, sfDir)
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, sfDir).createOrReplaceTempView(name)
    }
  }
}
