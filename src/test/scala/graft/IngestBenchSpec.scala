package graft

/** Small instance of the exact code path [[IngestBench]] runs at full
  * volume in the bench: all six phases (drain under both framings,
  * backfill, full-with-JDBC, sink-alone, paced live lag) must complete
  * with consistent counts and a well-formed JSON fragment. Volume knobs
  * are the only difference from the bench run — the chain, triggers, and
  * measurements are identical. */
class IngestBenchSpec extends SparkSpec {

  test("ingest harness: every phase completes and counts reconcile") {
    val r = IngestBench.run(spark,
      blocks = 60, eventsPerBlock = 5, perMessage = 10,
      chunksPerTrigger = 3, liveBlocks = 8, livePaceMs = 5L)
    assert(r.events == 300L)
    assert(r.jdbcRows == 300L)
    assert(r.drainSec > 0 && r.drainProtoSec > 0 &&
      r.backfillSec > 0 && r.fullSec > 0 && r.jdbcSec > 0)
    assert(r.lagP50Ms <= r.lagP95Ms && r.lagP95Ms <= r.lagMaxMs)
    // the fragment must stay parseable (it rides the bench's tail line)
    val json = r.json
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(json.contains("\"backfill_evps\":") && json.contains("\"lag_p95_ms\":"))
    // r15 medians protocol: every timed leg carries its (min, max) spread
    assert(r.drainSecs.size == 3 && r.fullSecs.size == 3)
    assert(json.contains("\"rounds\":3") && json.contains("\"drain_sec_minmax\":[") &&
      json.contains("\"full_sec_minmax\":["))
    // r15 live-Postgres leg: on hosts with the server binaries (this
    // sandbox), the same batch is sunk to a real PostgreSQL per round
    if (graft.streaming.pg.PgServer.available) {
      assert(r.jdbcPgSecs.size == 3 && r.jdbcPgSecs.forall(_ > 0))
      assert(json.contains("\"jdbc_pg_rps\":"))
    }
  }
}
