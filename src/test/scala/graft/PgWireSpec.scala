package graft

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.JdbcMultiTableSink
import graft.streaming.pg.{PgDriver, PgServer, PgWire}

/** The hand-rolled PostgreSQL v3 wire client + minimal JDBC facade against
  * a LIVE PostgreSQL 15 — the execution path for the sink's production
  * dialect (dao.ts:1840-1851, 1869-1893 `INSERT … ON CONFLICT`), which
  * until round 15 was pinned SQL text only (spec'd verbatim but executed
  * solely via Derby's MERGE spelling). One disposable cluster per suite:
  * initdb into /tmp, trust auth for the main path plus one SCRAM role for
  * the auth exchange, torn down after.
  *
  * Every test `assume`s the server binaries exist so the suite degrades to
  * canceled (not failed) on machines without PostgreSQL. */
class PgWireSpec extends SparkSpec {

  private val scramPw = "graft-scram-pw"
  private lazy val pg: Option[PgServer.Instance] =
    if (!PgServer.available) None
    else Some(PgServer.start(SparkSpec.tempDir("graft-pg"),
      scramUsers = Map("scramuser" -> scramPw)))

  private def inst: PgServer.Instance = { assume(PgServer.available); pg.get }

  override def afterAll(): Unit = { pg.foreach(_.stop()); super.afterAll() }

  // ------------------------------------------------------ wire protocol

  test("simple query round-trips the catalog's column types in text format") {
    val c = inst.connect()
    try {
      val r = c.simple(
        """SELECT CAST(9007199254740993 AS bigint) AS i8,
                  CAST(-42 AS int) AS i4,
                  CAST(1.5 AS float8) AS f8,
                  true AS b,
                  'héllo''world' AS t,
                  CAST('123456789012345678.123456' AS numeric(38,6)) AS n,
                  CAST('2024-01-01 12:34:56.789012' AS timestamp) AS ts,
                  CAST('2024-02-29' AS date) AS d,
                  CAST(NULL AS text) AS nul""").head
      assert(r.rows.head == Vector(
        Some("9007199254740993"), Some("-42"), Some("1.5"), Some("t"),
        Some("héllo'world"), Some("123456789012345678.123456"),
        Some("2024-01-01 12:34:56.789012"), Some("2024-02-29"), None))
      assert(r.fields.map(_.name) ==
        Vector("i8", "i4", "f8", "b", "t", "n", "ts", "d", "nul"))
      assert(r.fields(0).typeOid == PgWire.OidInt8)
      assert(r.fields(5).typeOid == PgWire.OidNumeric)
    } finally c.close()
  }

  test("extended protocol binds text parameters including NULL") {
    val c = inst.connect()
    try {
      c.simple("CREATE TABLE ext_t (k bigint PRIMARY KEY, v text)")
      assert(c.execute("INSERT INTO ext_t VALUES ($1, $2)",
        Seq(Some("1"), Some("one"))).rowCount == 1)
      assert(c.execute("INSERT INTO ext_t VALUES ($1, $2)",
        Seq(Some("2"), None)).rowCount == 1)
      val r = c.execute("SELECT v FROM ext_t ORDER BY k")
      assert(r.rows == Vector(Vector(Some("one")), Vector(None)))
    } finally c.close()
  }

  test("pipelined executeBatch is one round-trip and reports per-row counts") {
    val c = inst.connect()
    try {
      c.simple("CREATE TABLE batch_t (k bigint PRIMARY KEY, v bigint)")
      val counts = c.executeBatch("INSERT INTO batch_t VALUES ($1, $2)",
        (1 to 500).map(i => Seq(Some(i.toString), Some((i * 7).toString))))
      assert(counts.length == 500 && counts.forall(_ == 1))
      val r = c.simple("SELECT count(*), sum(v) FROM batch_t").head
      assert(r.rows.head == Vector(Some("500"), Some((7 * 500 * 501 / 2).toString)))
    } finally c.close()
  }

  test("server errors carry the SQLSTATE and the connection stays usable") {
    val c = inst.connect()
    try {
      val e = intercept[PgWire.PgServerError](c.simple("SELECT * FROM does_not_exist"))
      assert(e.sqlState == "42P01") // undefined_table — the sink branches on this
      // a batch failure mid-pipeline skips the rest and names the row
      c.simple("CREATE TABLE err_t (k bigint PRIMARY KEY)")
      val be = intercept[PgWire.PgServerError](
        c.executeBatch("INSERT INTO err_t VALUES ($1)",
          Seq(Seq(Some("1")), Seq(Some("1")), Seq(Some("3")))))
      assert(be.sqlState == "23505" && be.getMessage.contains("batch row 1"))
      // the implicit pipeline transaction aborted: nothing persisted
      assert(c.simple("SELECT count(*) FROM err_t").head.rows.head == Vector(Some("0")))
      assert(c.simple("SELECT 1").head.rows.head == Vector(Some("1")))
    } finally c.close()
  }

  test("SCRAM-SHA-256 authenticates against the real exchange; bad password fails") {
    val good = inst.connect(asUser = "scramuser", password = Some(scramPw))
    try assert(good.simple("SELECT current_user").head.rows.head ==
      Vector(Some("scramuser")))
    finally good.close()

    val e = intercept[Exception](
      inst.connect(asUser = "scramuser", password = Some("wrong-password")))
    assert(e.isInstanceOf[PgWire.PgServerError] ||
      e.getMessage.contains("password")) // 28P01 invalid_password
  }

  // ------------------------------------------------------- JDBC facade

  private def jdbcProps: Properties = {
    val p = new Properties()
    p.setProperty("user", inst.user)
    p.setProperty("driver", "graft.streaming.pg.PgDriver")
    p
  }

  test("JDBC facade: DDL, prepared batch, transaction rollback") {
    PgDriver.ensureRegistered()
    val conn = DriverManager.getConnection(inst.url(), jdbcProps)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE jdbc_t (k bigint PRIMARY KEY, v double precision)")
      val ps = conn.prepareStatement("INSERT INTO jdbc_t VALUES (?, ?)")
      (1 to 10).foreach { i => ps.setLong(1, i.toLong); ps.setDouble(2, i / 4.0); ps.addBatch() }
      assert(ps.executeBatch().forall(_ == 1))
      val rs = st.executeQuery("SELECT count(*), sum(v) FROM jdbc_t")
      assert(rs.next())
      assert(rs.getLong(1) == 10L && rs.getDouble(2) == (1 to 10).map(_ / 4.0).sum)

      // rollback: JDBC's lazy-BEGIN transaction discipline against live PG
      conn.setAutoCommit(false)
      st.executeUpdate("DELETE FROM jdbc_t")
      conn.rollback()
      conn.setAutoCommit(true)
      val rs2 = st.executeQuery("SELECT count(*) FROM jdbc_t")
      assert(rs2.next() && rs2.getLong(1) == 10L)
    } finally conn.close()
  }

  test("Spark df.write.jdbc appends through the facade; schema probe reads back") {
    PgDriver.ensureRegistered()
    import spark.implicits._
    val df = (1 to 100).map(i =>
      (i.toLong, s"name$i", i * 1.5, i % 2 == 0,
        new java.sql.Timestamp(1704067200000L + i * 1000L))).toDF(
      "id", "name", "score", "flag", "ts")
    df.write.mode("append").jdbc(inst.url(), "spark_t", jdbcProps)
    // second append exercises tableExists + getSchemaOption (WHERE 1=0 probe)
    df.withColumn("id", $"id" + 100).write.mode("append")
      .jdbc(inst.url(), "spark_t", jdbcProps)

    val c = inst.connect()
    try {
      val r = c.simple(
        "SELECT count(*), CAST(min(ts) AS text), CAST(max(ts) AS text) " +
          "FROM spark_t WHERE flag").head
      assert(r.rows.head(0) == Some("100")) // 50 even-i rows per append
      // instants round-trip bit-exactly through the UTC session (the "+00"
      // suffix appears iff Spark's dialect chose timestamptz DDL)
      assert(r.rows.head(1).get.startsWith("2024-01-01 00:00:02"))
      assert(r.rows.head(2).get.startsWith("2024-01-01 00:01:40"))
    } finally c.close()
  }

  // ------------------------------------- the sink's production dialect

  private val factTables = Seq("pgf_swaps", "pgf_deposits")

  private def frames(blocks: Range, cents: Long): Map[String, DataFrame] = {
    import spark.implicits._
    factTables.map { t =>
      t -> blocks.map(b => (b.toLong, cents)).toDF("block_number", "cents")
    }.toMap
  }

  test("JdbcMultiTableSink runs its Postgres dialect against live PostgreSQL") {
    PgDriver.ensureRegistered()
    val sink = new JdbcMultiTableSink(inst.url(), factTables,
      connectionProperties = jdbcProps)
    assert(sink.dialect.name == "postgres") // the production dialect, selected by url
    assert(sink.cursor().isEmpty)

    // two batches: the cursor upsert takes BOTH arms of ON CONFLICT DO
    // UPDATE (insert, then conflict-update) on the real server
    sink.write(frames(1 to 10, cents = 5L), batchId = 0L, endBlock = 10L)
    assert(sink.cursor().contains((0L, 10L)))
    sink.write(frames(11 to 20, cents = 9L), batchId = 1L, endBlock = 20L)
    assert(sink.cursor().contains((1L, 20L)))

    // torn batch 2 (one table only, no cursor) → repair deletes it
    import spark.implicits._
    (21 to 30).map(b => (b.toLong, 1L, 2L)).toDF("block_number", "cents", "batch_id")
      .write.mode("append").jdbc(inst.url(), "pgf_swaps", jdbcProps)
    sink.repairAfterRestart()
    val c = inst.connect()
    try {
      for (t <- factTables)
        assert(c.simple(s"SELECT count(*), max(block_number) FROM $t").head
          .rows.head == Vector(Some("20"), Some("20")), s"torn batch must leave $t")

      // reorg retraction: facts >= 15 gone AND cursor rolled back atomically
      sink.retract(fromBlock = 15L)
      for (t <- factTables)
        assert(c.simple(s"SELECT max(block_number) FROM $t").head
          .rows.head == Vector(Some("14")))
      assert(sink.cursor().contains((1L, 14L)))
    } finally c.close()
  }

  test("writeDim executes INSERT … ON CONFLICT DO NOTHING distributed over the wire") {
    PgDriver.ensureRegistered()
    val sink = new JdbcMultiTableSink(inst.url(), Seq("pgd_unused"),
      connectionProperties = jdbcProps)
    sink.ensureDimTable("pgd_pool_keys",
      Seq("key_hash" -> "BIGINT", "token0" -> "VARCHAR(20)"), Seq("key_hash"))

    import spark.implicits._
    val dim = (1 to 50).map(i => (i.toLong % 20, s"tok${i % 20}"))
      .toDF("key_hash", "token0") // 50 rows, 20 distinct keys, dupes in-batch
    sink.writeDim("pgd_pool_keys", dim, Seq("key_hash"))
    sink.writeDim("pgd_pool_keys", dim, Seq("key_hash")) // replay: all conflict

    val c = inst.connect()
    try assert(c.simple("SELECT count(*) FROM pgd_pool_keys").head
      .rows.head == Vector(Some("20")))
    finally c.close()
  }
}
