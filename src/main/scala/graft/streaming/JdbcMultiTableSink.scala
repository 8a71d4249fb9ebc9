package graft.streaming

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-table transactional JDBC sink — the drop-in analogue of the
  * reference's per-block DAO transaction, which writes ~24 fact tables plus
  * the cursor inside ONE Postgres transaction per block batch
  * (reference dao.ts:1895-2893, index.ts:195-257: `beginTransaction` →
  * per-processor inserts → `writeCursor` → `commitTransaction`).
  *
  * Spark's distributed JDBC writer cannot share one transaction across
  * executor connections, so the reference's atomicity is reproduced as
  * crash-consistent replay instead:
  *
  *   1. delete-own-batch across ALL fact tables — one driver connection,
  *      one transaction;
  *   2. append every fact frame (distributed, parallel per table);
  *   3. write the cursor row LAST, in its own single-statement transaction.
  *
  * The cursor is the commit marker: it advances only after every fact table
  * holds the batch, so `cursor.batch_id >= b` ⟺ batch b is fully present.
  * A crash at any earlier point leaves orphan rows ABOVE the cursor, which
  * exactly mirrors the reference's restart contract ("endCursor is what we
  * write so when we restart we delete any pending data", index.ts:242-244):
  * [[repairAfterRestart]] deletes rows of any batch the cursor never
  * acknowledged, in one transaction, and the checkpoint replay then rewrites
  * the batch from scratch. Net observable behavior = per-batch atomicity.
  *
  * Reorg support (T3): [[retract]] deletes `block_number >= fromBlock` from
  * every fact table AND rolls the cursor back in ONE driver transaction —
  * the all-tables analogue of the reference's cascaded event_keys delete
  * (dao.ts:1543-1576).
  *
  * Works against any DriverManager-registered database; the spec runs on
  * Spark's bundled embedded Derby, production points at Postgres.
  *
  * @param url         JDBC url
  * @param tables      fact table names this sink owns (every write must
  *                    provide exactly these keys)
  * @param cursorTable single-row commit-marker table
  */
final class JdbcMultiTableSink(
    url: String,
    tables: Seq[String],
    cursorTable: String = "graft_cursor",
    connectionProperties: Properties = new Properties) {

  require(tables.nonEmpty, "sink needs at least one fact table")

  /** Crash-consistent multi-table batch write. `frames` must cover exactly
    * the configured tables; each frame gains a `batch_id` column. `endBlock`
    * is the batch's high block number, recorded on the cursor. */
  def write(frames: Map[String, DataFrame], batchId: Long, endBlock: Long): Unit = {
    val missing = tables.filterNot(frames.contains)
    val extra = frames.keys.filterNot(tables.contains)
    require(missing.isEmpty && extra.isEmpty,
      s"frames must match configured tables (missing: $missing, extra: ${extra.toSeq})")

    // 1. one transaction: clear any partial copy of this batch everywhere
    withConnection { conn =>
      conn.setAutoCommit(false)
      tables.foreach { t =>
        executeIgnoringMissing(conn, s"""DELETE FROM $t WHERE "batch_id" = $batchId""")
      }
      conn.commit()
    }

    // 2. distributed appends — replay-safe because step 1 reruns first
    tables.foreach { t =>
      frames(t).withColumn("batch_id", lit(batchId))
        .write.mode("append").jdbc(url, t, connectionProperties)
    }

    // 3. the commit marker, last: batch is now fully present everywhere
    withConnection { conn =>
      conn.setAutoCommit(false)
      ensureCursorTable(conn)
      executeIgnoringMissing(conn, s"DELETE FROM $cursorTable")
      executeIgnoringMissing(conn,
        s"INSERT INTO $cursorTable VALUES ($batchId, $endBlock)")
      conn.commit()
    }
  }

  /** The last fully-committed (batchId, endBlock), if any batch completed. */
  def cursor(): Option[(Long, Long)] =
    withConnection { conn =>
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            s"SELECT batch_id, block_number FROM $cursorTable")
          if (rs.next()) Some((rs.getLong(1), rs.getLong(2))) else None
        } finally st.close()
      } catch {
        case e: java.sql.SQLException if tableMissing(e) => None
      }
    }

  /** Startup repair: delete every row belonging to a batch the cursor never
    * acknowledged (a crash between the appends and the cursor write), in one
    * transaction. The streaming checkpoint then replays that batch. */
  def repairAfterRestart(): Unit = {
    val acknowledged = cursor().map(_._1)
    withConnection { conn =>
      conn.setAutoCommit(false)
      val pred = acknowledged match {
        case Some(b) => s""""batch_id" > $b"""
        case None    => "1=1" // nothing acknowledged: every row is orphaned
      }
      tables.foreach { t =>
        executeIgnoringMissing(conn, s"DELETE FROM $t WHERE $pred")
      }
      conn.commit()
    }
  }

  /** Reorg retraction across every table plus cursor rollback, atomically:
    * a reader never observes retracted facts with an unretracted cursor. */
  def retract(fromBlock: Long): Unit =
    withConnection { conn =>
      conn.setAutoCommit(false)
      tables.foreach { t =>
        executeIgnoringMissing(conn,
          s"""DELETE FROM $t WHERE "block_number" >= $fromBlock""")
      }
      executeIgnoringMissing(conn,
        s"UPDATE $cursorTable SET block_number = ${fromBlock - 1} " +
          s"WHERE block_number >= $fromBlock")
      conn.commit()
    }

  private def withConnection[A](body: Connection => A): A = {
    val conn = DriverManager.getConnection(url, connectionProperties)
    try body(conn) finally conn.close()
  }

  private def ensureCursorTable(conn: Connection): Unit =
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"CREATE TABLE $cursorTable (batch_id BIGINT, block_number BIGINT)")
      finally st.close()
    } catch {
      // X0Y32 = Derby "already exists"; 42P07 = Postgres duplicate_table
      case e: java.sql.SQLException
        if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" => ()
    }

  /** Missing tables are fine for deletes: first batch, nothing created yet
    * (the distributed append creates fact tables on first write). */
  private def executeIgnoringMissing(conn: Connection, sql: String): Unit =
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql)
      finally st.close()
    } catch {
      case e: java.sql.SQLException if tableMissing(e) => ()
    }

  /** 42X05 = Derby missing table; 42P01 = Postgres undefined_table. */
  private def tableMissing(e: java.sql.SQLException): Boolean =
    e.getSQLState == "42X05" || e.getSQLState == "42P01"
}
