package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic Ekubo-shaped fact fixtures derived from the driver corpus.
  *
  * The driver's testdata (`/root/testdata/sf* /events.parquet`) has no DEX-event
  * tables, so every fact table of the reference schema
  * (`/root/reference/src/dao.ts:86-1541`) is derived *functionally* from the
  * `events` table with dialect-common SQL: the exact same text runs as Spark
  * temporary views and as the `WITH` prelude of each DuckDB oracle query, so
  * both engines see bit-identical inputs.
  *
  * Determinism rules (see FIXTURES.md):
  *   - integer/decimal arithmetic only for anything aggregated;
  *   - doubles only from deterministic IEEE ops (mul/add/floor on exact ints);
  *   - when an oracle must round a computed DOUBLE into DECIMAL, cast it
  *     through VARCHAR on the DuckDB side (`CAST(CAST(x AS VARCHAR) AS
  *     DECIMAL(p,s))`): Spark's cast rounds the shortest decimal
  *     representation (BigDecimal.valueOf) while DuckDB's direct cast
  *     rounds the full binary expansion — verified to differ (e.g.
  *     1/3 → …330000 vs …331968 at scale 20);
  *   - no engine-specific hash/random/time functions;
  *   - `cents = floor(value*100 + 0.5)` is exact (value has 2 decimals);
  *   - times are BIGINT epoch seconds (the reference's timestamptz semantics,
  *     without timestamp-dialect risk; reference stores int8 times itself for
  *     twamm/oracle rows, dao.ts:660-661, 710-711).
  *
  * Event-id packing mirrors `dao.ts:124`:
  *   id = block_number * 2^32 + transaction_index * 2^16 + event_index.
  */
object Fixtures {

  /** Base tables shipped by the driver (TESTDATA.md). */
  val baseTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  // Q128 fixed-point fee constants: floor(2^128 * bps / 10000)
  // (fee representation per dao.ts:1552-1554).
  private val fee1bps = "34028236692093846346337460743176821"
  private val fee5bps = "170141183460469231731687303715884105"
  private val fee30bps = "1020847100762815390390123822295304634"
  private val fee50bps = "1701411834604692317316873037158841057"

  /** 2^128 as a double literal (parses to exactly 2^128 in both engines). */
  val TwoPow128 = "3.402823669209385e38"

  /** Fixture view definitions, topologically ordered.
    * Dialect-common SQL: runs unchanged in Spark SQL and DuckDB. */
  val defs: Seq[(String, String)] = Seq(
    // ------------------------------------------------------------------
    // raw: enrich each event with deterministic derivation columns.
    // 8 events per block; 120 s block spacing => ~30 blocks/hour.
    "raw" -> s"""
      SELECT e.event_id AS seq,
             e.event_id % 100 AS bucket,
             e.user_id AS user_id,
             e.event_type AS event_type,
             CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN e.event_id % 5 = 4 THEN -1 ELSE 1 END AS sgn,
             e.user_id % 16 AS pool_id,
             1000 + CAST(FLOOR(CAST(e.event_id AS DOUBLE) / 8) AS BIGINT) AS block_number,
             CAST(FLOOR(CAST(e.event_id % 8 AS DOUBLE) / 2) AS BIGINT) AS transaction_index,
             e.event_id % 2 AS event_index
      FROM events e""",

    // ek: universal event key (dao.ts:122-132) + block time.
    "ek" -> s"""
      SELECT r.*,
             r.block_number * 4294967296 + r.transaction_index * 65536 + r.event_index AS id,
             '0xtx' || CAST(r.block_number AS STRING) || '_' || CAST(r.transaction_index AS STRING) AS transaction_hash,
             1704067200 + (r.block_number - 1000) * 120 AS btime,
             CASE WHEN r.bucket < 76 THEN '0xcore'
                  WHEN r.bucket < 83 THEN '0xtwamm'
                  WHEN r.bucket < 87 THEN '0xstaker'
                  WHEN r.bucket < 94 THEN '0xgovernor'
                  WHEN r.bucket < 96 THEN '0xtokenreg'
                  WHEN r.bucket < 99 THEN '0xlimitorders'
                  ELSE '0xmisc' END AS emitter
      FROM raw r""",

    // blocks (dao.ts:96-105); time = BIGINT epoch seconds.
    "blocks" -> s"""
      SELECT b.number,
             '0xb' || CAST(b.number AS STRING) AS hash,
             1704067200 + (b.number - 1000) * 120 AS time
      FROM (SELECT DISTINCT block_number AS number FROM raw) b""",

    // event_keys (dao.ts:122-132)
    "event_keys" -> s"""
      SELECT id, transaction_hash, block_number, transaction_index, event_index, emitter
      FROM ek""",

    // pool_keys dimension (dao.ts:107-119); 16 pools, token0 < token1 by
    // construction (dao.ts:44-47 ordering rule).
    "pool_keys" -> s"""
      SELECT DISTINCT
             '0xp' || CAST(pool_id AS STRING) AS key_hash,
             '0xt' || CAST(pool_id % 5 AS STRING) AS token0,
             '0xt' || CAST(5 + pool_id % 5 AS STRING) AS token1,
             CAST(CASE pool_id % 4 WHEN 0 THEN '$fee1bps' WHEN 1 THEN '$fee5bps'
                  WHEN 2 THEN '$fee30bps' ELSE '$fee50bps' END AS DECIMAL(38,0)) AS fee,
             CAST(10 * (1 + pool_id % 3) AS BIGINT) AS tick_spacing,
             CASE WHEN pool_id % 4 = 3 THEN '0xext' ELSE '0x0' END AS extension
      FROM raw""",

    // swaps (dao.ts:233-248). sqrt_ratio mirrored as DOUBLE for analytics
    // (u256 exactness is exercised by the decode layer, not the fixtures).
    "swaps" -> s"""
      SELECT id AS event_id,
             '0xl' || CAST(user_id % 40 AS STRING) AS locker,
             '0xp' || CAST(pool_id AS STRING) AS pool_key_hash,
             CAST(sgn * cents * 100 AS DECIMAL(18,0)) AS delta0,
             CAST(-sgn * cents * 99 AS DECIMAL(18,0)) AS delta1,
             $TwoPow128 * (1.0 + CAST((cents % 200) * 10 - 1000 AS DOUBLE) * 5e-7) AS sqrt_ratio_after,
             CAST((cents % 200) * 10 - 1000 AS BIGINT) AS tick_after,
             CAST(1000000 + cents * 10 AS DECIMAL(18,0)) AS liquidity_after
      FROM ek WHERE bucket < 40""",

    // position_updates (dao.ts:145-163)
    "position_updates" -> s"""
      SELECT id AS event_id,
             '0xl' || CAST(user_id % 40 AS STRING) AS locker,
             '0xp' || CAST(pool_id AS STRING) AS pool_key_hash,
             '0x' || CAST(user_id % 20 AS STRING) AS salt,
             CAST((user_id % 10) * 100 - 500 AS BIGINT) AS lower_bound,
             CAST((user_id % 10) * 100 - 400 + (seq % 3) * 100 AS BIGINT) AS upper_bound,
             CAST(sgn * cents AS DECIMAL(18,0)) AS liquidity_delta,
             CAST(sgn * cents * 100 AS DECIMAL(18,0)) AS delta0,
             CAST(sgn * cents * 99 AS DECIMAL(18,0)) AS delta1
      FROM ek WHERE bucket BETWEEN 40 AND 59""",

    // pool_initializations (dao.ts:221-230)
    "pool_initializations" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS pool_key_hash,
             CAST((cents % 150) * 10 - 750 AS BIGINT) AS tick,
             $TwoPow128 * (1.0 + CAST((cents % 150) * 10 - 750 AS DOUBLE) * 5e-7) AS sqrt_ratio
      FROM ek WHERE bucket BETWEEN 60 AND 61""",

    // fees_accumulated (dao.ts:210-219); zero amounts exercise the
    // `amount0 > 0` aggregation guards (dao.ts:1575).
    "fees_accumulated" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS pool_key_hash,
             CAST(CASE WHEN user_id % 5 = 0 THEN 0 ELSE cents * 3 END AS DECIMAL(18,0)) AS amount0,
             CAST(CASE WHEN user_id % 5 = 1 THEN 0 ELSE cents * 2 END AS DECIMAL(18,0)) AS amount1
      FROM ek WHERE bucket BETWEEN 62 AND 66""",

    // position_fees_collected (dao.ts:165-180); withdrawals => deltas <= 0.
    "position_fees_collected" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS pool_key_hash,
             '0xo' || CAST(user_id % 25 AS STRING) AS owner,
             '0x' || CAST(user_id % 20 AS STRING) AS salt,
             CAST((user_id % 10) * 100 - 500 AS BIGINT) AS lower_bound,
             CAST((user_id % 10) * 100 - 400 + (seq % 3) * 100 AS BIGINT) AS upper_bound,
             CAST(-(cents * 2) AS DECIMAL(18,0)) AS delta0,
             CAST(-cents AS DECIMAL(18,0)) AS delta1
      FROM ek WHERE bucket BETWEEN 67 AND 69""",

    // protocol_fees_paid (dao.ts:193-208); zeros exercise `delta != 0` guards.
    "protocol_fees_paid" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS pool_key_hash,
             '0xo' || CAST(user_id % 25 AS STRING) AS owner,
             '0x' || CAST(user_id % 20 AS STRING) AS salt,
             CAST((user_id % 10) * 100 - 500 AS BIGINT) AS lower_bound,
             CAST((user_id % 10) * 100 - 400 + (seq % 3) * 100 AS BIGINT) AS upper_bound,
             CAST(CASE WHEN user_id % 4 = 0 THEN 0 ELSE -(cents * 2) END AS DECIMAL(18,0)) AS delta0,
             CAST(CASE WHEN user_id % 4 = 1 THEN 0 ELSE -cents END AS DECIMAL(18,0)) AS delta1
      FROM ek WHERE bucket BETWEEN 70 AND 71""",

    // protocol_fees_withdrawn (dao.ts:183-190)
    "protocol_fees_withdrawn" -> s"""
      SELECT id AS event_id,
             '0xa' || CAST(user_id AS STRING) AS recipient,
             '0xt' || CAST(user_id % 10 AS STRING) AS token,
             CAST(cents AS DECIMAL(18,0)) AS amount
      FROM ek WHERE bucket = 72""",

    // position_transfers (dao.ts:134-143); '0x0' senders are mints.
    "position_transfers" -> s"""
      SELECT id AS event_id,
             CAST(user_id * 31 % 500 AS BIGINT) AS token_id,
             CASE WHEN seq % 4 = 0 THEN '0x0' ELSE '0xa' || CAST(user_id AS STRING) END AS from_address,
             '0xa' || CAST((user_id + 7) % 150 AS STRING) AS to_address
      FROM ek WHERE bucket BETWEEN 73 AND 74""",

    // position_minted_with_referrer (dao.ts:250-257)
    "position_minted_with_referrer" -> s"""
      SELECT id AS event_id,
             CAST(user_id * 31 % 500 AS BIGINT) AS token_id,
             '0xr' || CAST(user_id % 5 AS STRING) AS referrer
      FROM ek WHERE bucket = 75""",

    // twamm_order_updates (dao.ts:650-667); times BIGINT epoch, window-aligned
    // so orders overlap execution times (dao.ts:786-794 semantics).
    "twamm_order_updates" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS key_hash,
             '0xo' || CAST(user_id % 25 AS STRING) AS owner,
             '0x' || CAST(user_id % 20 AS STRING) AS salt,
             CAST(sgn * cents * 10 AS DECIMAL(18,0)) AS sale_rate_delta0,
             CAST(sgn * cents * 7 AS DECIMAL(18,0)) AS sale_rate_delta1,
             btime - (btime % 1024) AS start_time,
             btime - (btime % 1024) + 1024 * (1 + user_id % 8) AS end_time
      FROM ek WHERE bucket BETWEEN 76 AND 78""",

    // twamm_proceeds_withdrawals (dao.ts:669-686)
    "twamm_proceeds_withdrawals" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS key_hash,
             '0xo' || CAST(user_id % 25 AS STRING) AS owner,
             '0x' || CAST(user_id % 20 AS STRING) AS salt,
             CAST(cents * 3 AS DECIMAL(18,0)) AS amount0,
             CAST(cents * 2 AS DECIMAL(18,0)) AS amount1,
             btime - (btime % 1024) AS start_time,
             btime - (btime % 1024) + 1024 * (1 + user_id % 8) AS end_time
      FROM ek WHERE bucket = 79""",

    // twamm_virtual_order_executions (dao.ts:688-699)
    "twamm_virtual_order_executions" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS key_hash,
             CAST(cents * 10 AS DECIMAL(18,0)) AS token0_sale_rate,
             CAST(cents * 7 AS DECIMAL(18,0)) AS token1_sale_rate,
             CAST(sgn * cents AS DECIMAL(18,0)) AS delta0,
             CAST(-sgn * cents AS DECIMAL(18,0)) AS delta1
      FROM ek WHERE bucket BETWEEN 80 AND 82""",

    // staker_staked / staker_withdrawn (dao.ts:283-304)
    "staker_staked" -> s"""
      SELECT id AS event_id,
             '0xs' || CAST(user_id % 30 AS STRING) AS from_address,
             CAST(cents * 100 AS DECIMAL(18,0)) AS amount,
             '0xd' || CAST(user_id % 7 AS STRING) AS delegate
      FROM ek WHERE bucket BETWEEN 83 AND 85""",

    "staker_withdrawn" -> s"""
      SELECT id AS event_id,
             '0xs' || CAST(user_id % 30 AS STRING) AS from_address,
             CAST(cents * 50 AS DECIMAL(18,0)) AS amount,
             '0xa' || CAST(user_id AS STRING) AS recipient,
             '0xd' || CAST(user_id % 7 AS STRING) AS delegate
      FROM ek WHERE bucket = 86""",

    // governor_reconfigured (dao.ts:306-320); 3 config versions.
    "governor_reconfigured" -> s"""
      SELECT MIN(id) AS event_id,
             user_id % 3 AS version,
             3600 * (1 + user_id % 3) AS voting_start_delay,
             86400 AS voting_period,
             1800 AS voting_weight_smoothing_duration,
             CAST(500000 AS DECIMAL(18,0)) AS quorum,
             CAST(1000 AS DECIMAL(18,0)) AS proposal_creation_threshold,
             3600 AS execution_delay,
             86400 AS execution_window
      FROM ek WHERE bucket = 87 GROUP BY user_id % 3""",

    // governor_proposed (dao.ts:322-340); proposal id space of 15, deduped to
    // the first proposing event (PK semantics).
    "governor_proposed" -> s"""
      SELECT MIN(id) AS event_id,
             '0xprop' || CAST(user_id % 15 AS STRING) AS id,
             '0xu' || CAST((user_id % 15) % 7 AS STRING) AS proposer,
             (user_id % 15) % 3 AS config_version
      FROM ek WHERE bucket = 88 GROUP BY user_id % 15""",

    // governor_voted (dao.ts:342-355)
    "governor_voted" -> s"""
      SELECT id AS event_id,
             '0xprop' || CAST(user_id % 15 AS STRING) AS id,
             '0xv' || CAST(seq % 50 AS STRING) AS voter,
             CAST(cents AS DECIMAL(18,0)) AS weight,
             (seq % 3) < 2 AS yea
      FROM ek WHERE bucket BETWEEN 89 AND 91""",

    // governor_canceled / governor_executed (dao.ts:342-382)
    "governor_canceled" -> s"""
      SELECT id AS event_id, '0xprop' || CAST(user_id % 15 AS STRING) AS id
      FROM ek WHERE bucket = 92 AND user_id % 2 = 0""",

    "governor_executed" -> s"""
      SELECT id AS event_id, '0xprop' || CAST(user_id % 15 AS STRING) AS id
      FROM ek WHERE bucket = 92 AND user_id % 2 = 1""",

    // governor_proposed_calls (dao.ts:331-340): flattened child rows, one
    // calldata word per row (the NUMERIC[] column rebuilt/exploded by the
    // S9 query); every bucket-88 event beyond the proposal's first becomes
    // a call of its proposal.
    "governor_proposed_calls" -> s"""
      SELECT id AS event_id,
             '0xprop' || CAST(user_id % 15 AS STRING) AS proposal_id,
             ROW_NUMBER() OVER (PARTITION BY user_id % 15 ORDER BY id) - 1 AS index,
             '0xtarget' || CAST(user_id % 5 AS STRING) AS to_address,
             '0xsel' || CAST(cents % 7 AS STRING) AS selector,
             CAST(cents AS DECIMAL(18,0)) AS calldata_word
      FROM ek WHERE bucket = 88""",

    // governor_executed_results (dao.ts:361-371): flattened results words.
    "governor_executed_results" -> s"""
      SELECT id AS event_id,
             '0xprop' || CAST(user_id % 15 AS STRING) AS proposal_id,
             ROW_NUMBER() OVER (PARTITION BY user_id % 15 ORDER BY id) - 1 AS index,
             CAST(cents * 5 AS DECIMAL(18,0)) AS result_word
      FROM ek WHERE bucket = 92 AND user_id % 2 = 1""",

    "governor_proposal_described" -> s"""
      SELECT id AS event_id,
             '0xprop' || CAST(user_id % 15 AS STRING) AS id,
             'proposal ' || CAST(user_id % 15 AS STRING) || ' description' AS description
      FROM ek WHERE bucket = 93""",

    // token_registrations v1 (dao.ts:259-268): name/symbol felt-packed short
    // strings ("TokenD"/"TKD", D = last digit; 92837519912496 = pack("Token0"),
    // 5524272 = pack("TK0")). user_id%10=9 yields 1-char symbol "T" (invalid,
    // filtered by the registration validation view, dao.ts:989-999).
    "token_registrations" -> s"""
      SELECT id AS event_id,
             '0xt' || CAST(user_id % 10 AS STRING) AS address,
             CAST(92837519912496 + user_id % 10 AS DECIMAL(38,0)) AS name,
             CAST(CASE WHEN user_id % 10 = 9 THEN 84 ELSE 5524272 + user_id % 10 END AS DECIMAL(38,0)) AS symbol,
             CAST(6 + (user_id % 3) * 6 AS BIGINT) AS decimals,
             CAST(cents * 1000 AS DECIMAL(18,0)) AS total_supply
      FROM ek WHERE bucket = 94""",

    // token_registrations_v3 (dao.ts:270-281): VARCHAR name/symbol.
    "token_registrations_v3" -> s"""
      SELECT id AS event_id,
             '0xt' || CAST(user_id % 10 AS STRING) AS address,
             'Token' || CAST(user_id % 10 AS STRING) AS name,
             CASE WHEN user_id % 10 = 9 THEN 'T' ELSE 'TK' || CAST(user_id % 10 AS STRING) END AS symbol,
             CAST(6 + (user_id % 3) * 6 AS BIGINT) AS decimals,
             CAST(cents * 1000 AS DECIMAL(18,0)) AS total_supply
      FROM ek WHERE bucket = 95""",

    // limit_order_placed / limit_order_closed (dao.ts:715-747)
    "limit_order_placed" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS key_hash,
             '0xo' || CAST(user_id % 25 AS STRING) AS owner,
             '0x' || CAST(user_id % 20 AS STRING) AS salt,
             '0xt' || CAST(pool_id % 5 AS STRING) AS token0,
             '0xt' || CAST(5 + pool_id % 5 AS STRING) AS token1,
             CAST((cents % 100) * 10 - 500 AS BIGINT) AS tick,
             CAST(cents * 5 AS DECIMAL(18,0)) AS liquidity,
             CAST(cents * 4 AS DECIMAL(18,0)) AS amount
      FROM ek WHERE bucket BETWEEN 96 AND 97""",

    "limit_order_closed" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS key_hash,
             '0xo' || CAST(user_id % 25 AS STRING) AS owner,
             '0x' || CAST(user_id % 20 AS STRING) AS salt,
             '0xt' || CAST(pool_id % 5 AS STRING) AS token0,
             '0xt' || CAST(5 + pool_id % 5 AS STRING) AS token1,
             CAST((cents % 100) * 10 - 500 AS BIGINT) AS tick,
             CAST(cents AS DECIMAL(18,0)) AS amount0,
             CAST(cents * 2 AS DECIMAL(18,0)) AS amount1
      FROM ek WHERE bucket = 98""",

    // oracle_snapshots (dao.ts:701-713)
    "oracle_snapshots" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS key_hash,
             '0xt' || CAST(pool_id % 5 AS STRING) AS token0,
             '0xt' || CAST(5 + pool_id % 5 AS STRING) AS token1,
             CAST(seq % 64 AS BIGINT) AS index,
             btime AS snapshot_block_timestamp,
             CAST(cents * btime % 1000000007 AS DECIMAL(18,0)) AS snapshot_tick_cumulative
      FROM ek WHERE bucket = 99 AND user_id % 2 = 0""",

    // liquidity_updated — spline pools (dao.ts:749-763). Zero-liquidity-factor
    // events are dropped at ingest (eventProcessors.ts:88-93), mirrored here.
    "liquidity_updated" -> s"""
      SELECT id AS event_id,
             '0xp' || CAST(pool_id AS STRING) AS pool_key_hash,
             '0xa' || CAST(user_id AS STRING) AS sender,
             CAST(cents AS DECIMAL(18,0)) AS liquidity_factor,
             CAST(cents * 2 AS DECIMAL(18,0)) AS shares,
             CAST(cents * 3 AS DECIMAL(18,0)) AS amount0,
             CAST(cents * 4 AS DECIMAL(18,0)) AS amount1,
             CAST(CAST(FLOOR(CAST(cents AS DOUBLE) / 100) AS BIGINT) AS DECIMAL(18,0)) AS protocol_fees0,
             CAST(CAST(FLOOR(CAST(cents AS DOUBLE) / 100) AS BIGINT) AS DECIMAL(18,0)) AS protocol_fees1
      FROM ek WHERE bucket = 99 AND user_id % 2 = 1 AND user_id % 6 != 0""",

    // embeddings_aug: near-dup input = the corpus plus two copies of vector 0
    // under fresh ids. The driver corpus has no cosine ≥ 0.99 pair at any sf,
    // so sim_embedding_near_dup's threshold branch never fired (rounds 1-3);
    // the duplicates make it return a deterministic positive answer — pairs
    // (0, max+1), (0, max+2), (max+1, max+2) at cosine 1.0 — on both engines
    // (dialect-common SQL, same rows everywhere). Synthetic ids derive from
    // MAX(vec_id) so they can never collide with real ids at any sf.
    "embeddings_aug" -> s"""
      SELECT vec_id, embedding FROM embeddings
      UNION ALL SELECT (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id, embedding FROM embeddings WHERE vec_id = 0
      UNION ALL SELECT (SELECT MAX(vec_id) + 2 FROM embeddings) AS vec_id, embedding FROM embeddings WHERE vec_id = 0""",

    // media_aug: duplicate-blob input for the perceptual-hash dedup — the
    // same construction as embeddings_aug. The small-sf corpora have NO
    // duplicate documents (sf0.1 has a handful of organic ones), so the
    // two seeded byte-identical copies of doc 0 under fresh ids derived
    // from MAX(doc_id) guarantee a deterministic positive at EVERY sf.
    "media_aug" -> s"""
      SELECT doc_id, text FROM documents
      UNION ALL SELECT (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id, text FROM documents WHERE doc_id = 0
      UNION ALL SELECT (SELECT MAX(doc_id) + 2 FROM documents) AS doc_id, text FROM documents WHERE doc_id = 0""",

    // documents_pii: PII-redaction input = the corpus with deterministic
    // synthetic PII appended to a subset of documents (the driver corpus has
    // no digits or @-signs, so a redaction operator over raw `documents`
    // would never fire — same situation embeddings_aug solves for near-dup).
    // doc_id % 5: 0 → email+phone, 2 → email only, 4 → phone only, else
    // clean. Phone suffix is always 4 digits (1000 + doc_id % 9000).
    "documents_pii" -> s"""
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' || CAST(doc_id AS STRING) || '@example.com or 555-' || CAST(1000 + doc_id % 9000 AS STRING)
                  WHEN doc_id % 5 = 2 THEN text || ' mail admin' || CAST(doc_id AS STRING) || '@corp.example.org now'
                  WHEN doc_id % 5 = 4 THEN text || ' call 555-' || CAST(1000 + doc_id % 9000 AS STRING) || ' anytime'
                  ELSE text END AS text
      FROM documents""")

  /** Names of the derived fixture views (excludes driver base tables). */
  val factTables: Seq[String] = defs.map(_._1)

  /** Derived tables worth keeping hot: every fact view reads `ek`, and the
    * dimension joins read blocks/pool_keys. (Lazy cache: first use pays.) */
  private val cachedViews = Seq("ek", "blocks", "pool_keys")

  private val registeredFor =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register base tables + fixture views as Spark temp views. Idempotent
    * and memoized per (session, sfDir): every `queries` entry calls this, so
    * re-registration (10 parquet schema reads + uncaching) must be free. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    if (sfDir == registeredFor.get(spark)) return
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    // default; we never consume `ts` (fixtures derive time from event_id),
    // so reading nanos as plain longs is safe.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (registeredFor.containsKey(spark)) {
      cachedViews.foreach(v => spark.sql(s"UNCACHE TABLE IF EXISTS $v"))
      // the memoized sub-plans are derived from the previous sfDir's data:
      // stale AND a storage leak once the session points elsewhere
      graft.util.Memo.release(spark, registeredFor.get(spark))
    }
    baseTables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    defs.foreach { case (name, sql) =>
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS $sql")
      // The driver's testdata is one single-row-group parquet file per
      // table, which cannot split: without an explicit fan-out the
      // fact-sized `ek` cache inherits the scan's single partition and
      // EVERY downstream view runs its cache scan on one core. The shuffle
      // happens once, at cache build (replaced here, before any downstream
      // view resolves `ek`); a production events table is many
      // files/row-groups and gets this parallelism at the scan.
      // blocks/pool_keys stay as declared — they are dimension-sized and
      // aggregate through a shuffle already.
      if (name == "ek")
        spark.table("ek").repartition(spark.sparkContext.defaultParallelism)
          .createOrReplaceTempView("ek")
    }
    cachedViews.foreach(v => spark.sql(s"CACHE LAZY TABLE $v"))
    registeredFor.put(spark, sfDir)
  }

  private val metricLoggerFor =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Log `observe()`-attached metrics (names prefixed `graft_`) to stderr
    * when the observed query actually executes. Passive: no extra Spark job,
    * nothing cached. Registered once per session. */
  def ensureMetricLogger(spark: SparkSession): Unit =
    if (metricLoggerFor.add(spark)) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_")) System.err.println(s"[graft] $name: $row")
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      })
    }

  /** DuckDB oracle prelude: all fixture defs as a WITH chain. Unused CTEs are
    * pruned by the optimizer, so every oracle can just prepend this. */
  lazy val oraclePrelude: String =
    defs.map { case (n, s) => s"$n AS ($s)" }.mkString("WITH ", ",\n", "\n")

  /** Wrap an oracle query body with the fixture prelude. */
  def oracle(body: String): String = oraclePrelude + body
}
