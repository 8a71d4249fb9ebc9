package graft

/** The SQL facade: every catalog entry is addressable as a named view, and
  * SQL consumers can filter/join across views with Catalyst optimizing
  * through the view boundary. */
class CatalogSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every catalog query is addressable as a SQL view") {
    Catalog.register(spark, sfDir)
    for (name <- SparkEntry.queries.keys)
      assert(spark.sql(s"SELECT * FROM $name LIMIT 1").columns.nonEmpty, name)
  }

  test("SQL over views matches the DataFrame API and supports cross-view joins") {
    Catalog.register(spark, sfDir)

    val viaSql = spark.sql("SELECT COUNT(*) FROM pool_states").collect().head.getLong(0)
    val viaDf = SparkEntry.queries("pool_states")(spark, sfDir).count()
    assert(viaSql == viaDf && viaSql > 0)

    // cross-view join: per-pool tick liquidity enriched with pool state
    val joined = spark.sql(
      """SELECT p.pool_key_hash, COUNT(*) AS n_ticks
         FROM per_pool_per_tick_liquidity t
         JOIN pool_states p ON t.pool_key_hash = p.pool_key_hash
         GROUP BY p.pool_key_hash""")
    assert(joined.count() > 0)
  }
}
