package graft.streaming.pg

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, ResultSet, SQLException, Types}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.Properties

/** Minimal JDBC facade over [[PgWireConnection]], registered for
  * `jdbc:postgresql:` URLs — no Postgres driver jar exists in this sandbox
  * (and there is no egress to fetch one), so this facade is what lets the
  * EXISTING JDBC surface run against a live PostgreSQL 15 unchanged:
  * [[graft.streaming.JdbcMultiTableSink]] keeps its `DriverManager` +
  * `df.write.jdbc` code paths, Spark's own `JdbcUtils` keeps selecting its
  * built-in `PostgresDialect` from the URL (DDL type mapping, insert
  * statement shape), and only the bottom transport is ours.
  *
  * Shape: each JDBC interface is a `java.lang.reflect.Proxy` whose handler
  * implements exactly the surface Spark's JDBC writer and the sink
  * exercise — connection transaction control, Statement DDL/DML,
  * PreparedStatement text-parameter binds with pipelined `executeBatch`,
  * ResultSet + metadata for the `WHERE 1=0` schema probe — and throws
  * `UnsupportedOperationException` with the method name for anything
  * outside it (a loud seam, not silent corruption). JDBC's object-typed
  * bind/read values map to PostgreSQL's TEXT formats; timestamps are
  * encoded and decoded in UTC against the connection's pinned
  * `TimeZone=UTC`, so instants round-trip bit-exactly through either a
  * `timestamp` or `timestamptz` column.
  *
  * Transaction bookkeeping follows the JDBC contract: under
  * `setAutoCommit(false)` a `BEGIN` is issued lazily before the first
  * statement of each transaction (tracked from ReadyForQuery's status
  * byte), `commit`/`rollback` map to the SQL commands, and
  * `setAutoCommit(true)` commits any open transaction.
  */
final class PgDriver extends Driver {
  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:postgresql:")

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null
    val (host, port, db) = PgDriver.parseUrl(url)
    val user = Option(info.getProperty("user")).getOrElse("postgres")
    val password = Option(info.getProperty("password"))
    PgJdbc.connection(new PgWireConnection(host, port, user, db, password))
  }

  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException("getParentLogger")
}

object PgDriver {
  /** `jdbc:postgresql://host[:port]/db` (the standard form; defaults
    * host=127.0.0.1, port=5432). */
  def parseUrl(url: String): (String, Int, String) = {
    val rest = url.stripPrefix("jdbc:postgresql:")
    if (rest.startsWith("//")) {
      val noScheme = rest.stripPrefix("//")
      val slash = noScheme.indexOf('/')
      require(slash > 0, s"expected jdbc:postgresql://host[:port]/db, got $url")
      val hostPort = noScheme.substring(0, slash)
      val db = noScheme.substring(slash + 1).takeWhile(_ != '?')
      hostPort.split(':') match {
        case Array(h, p) => (h, p.toInt, db)
        case Array(h) => (h, 5432, db)
        case _ => throw new IllegalArgumentException(s"bad host:port in $url")
      }
    } else ("127.0.0.1", 5432, rest)
  }

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Register with DriverManager (idempotent). Spark's `DriverRegistry`
    * instantiates the class directly via the `driver` option; direct
    * `DriverManager.getConnection` callers invoke this first. */
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true)) DriverManager.registerDriver(new PgDriver)
}

private[pg] object PgJdbc {
  import PgWire._

  private val tsFmt = DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")

  // ---------------------------------------------------- value codecs

  /** JDBC bind value → PostgreSQL text literal (None = NULL). */
  def encode(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some(s)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case n: java.lang.Number => Some(n.toString)
    case b: java.lang.Boolean => Some(if (b) "t" else "f")
    case t: java.sql.Timestamp =>
      val inst = Instant.ofEpochSecond(Math.floorDiv(t.getTime, 1000L), t.getNanos.toLong)
      Some(tsFmt.format(LocalDateTime.ofInstant(inst, ZoneOffset.UTC)))
    case d: java.sql.Date => Some(d.toString)
    case b: Array[Byte] => Some("\\x" + b.map("%02x".format(_)).mkString)
    case other =>
      throw new SQLException(s"unsupported bind type ${other.getClass.getName}")
  }

  /** PostgreSQL text cell → java.sql.Timestamp, accepting `timestamp`
    * ("2024-01-01 00:00:00.5") and `timestamptz` in the UTC session
    * ("2024-01-01 00:00:00.5+00") spellings. */
  def decodeTimestamp(s: String): java.sql.Timestamp = {
    val noZone = s.replaceFirst("([+-]\\d\\d(:?\\d\\d)?)$", "")
    val (datePart, frac) = noZone.indexOf('.') match {
      case -1 => (noZone, 0L)
      case i => (noZone.substring(0, i),
        (noZone.substring(i + 1) + "0" * (9 - (noZone.length - i - 1))).take(9).toLong)
    }
    val ldt = LocalDateTime.parse(datePart, DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss"))
    val inst = ldt.toInstant(ZoneOffset.UTC)
    val ts = new java.sql.Timestamp(inst.toEpochMilli - inst.getNano / 1000000)
    ts.setNanos(frac.toInt)
    ts
  }

  def decodeBytes(s: String): Array[Byte] = {
    require(s.startsWith("\\x"), s"expected hex bytea, got ${s.take(8)}")
    s.drop(2).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  /** Type OID → (java.sql.Types code, type name, precision, scale). */
  def jdbcType(oid: Int, typmod: Int): (Int, String, Int, Int) = oid match {
    case OidInt8 => (Types.BIGINT, "int8", 19, 0)
    case OidInt4 => (Types.INTEGER, "int4", 10, 0)
    case OidInt2 => (Types.SMALLINT, "int2", 5, 0)
    case OidFloat8 => (Types.DOUBLE, "float8", 17, 17)
    case OidFloat4 => (Types.REAL, "float4", 8, 8)
    case OidBool => (Types.BOOLEAN, "bool", 1, 0)
    case OidText => (Types.VARCHAR, "text", Int.MaxValue, 0)
    case OidVarchar => (Types.VARCHAR, "varchar", math.max(typmod - 4, 0), 0)
    case OidBpchar => (Types.CHAR, "bpchar", math.max(typmod - 4, 0), 0)
    case OidNumeric =>
      if (typmod == -1) (Types.NUMERIC, "numeric", 38, 18)
      else (Types.NUMERIC, "numeric", ((typmod - 4) >> 16) & 0xffff, (typmod - 4) & 0xffff)
    case OidTimestamp => (Types.TIMESTAMP, "timestamp", 29, 6)
    case OidTimestamptz => (Types.TIMESTAMP, "timestamptz", 35, 6)
    case OidDate => (Types.DATE, "date", 13, 0)
    case OidBytea => (Types.BINARY, "bytea", Int.MaxValue, 0)
    case other => (Types.OTHER, s"oid$other", 0, 0)
  }

  // ------------------------------------------------------- proxy core

  private def proxy[T](iface: Class[T], label: String)(
      pf: PartialFunction[(String, Array[AnyRef]), Any]): T = {
    val handler = new InvocationHandler {
      override def invoke(p: AnyRef, method: Method, argsRaw: Array[AnyRef]): AnyRef = {
        val args = if (argsRaw == null) Array.empty[AnyRef] else argsRaw
        val key = (method.getName, args)
        if (pf.isDefinedAt(key)) pf(key).asInstanceOf[AnyRef]
        else method.getName match {
          case "toString" => s"graft-pgwire $label"
          case "hashCode" => Int.box(System.identityHashCode(p))
          case "equals" => Boolean.box(p eq args(0))
          case "isWrapperFor" => Boolean.box(false)
          case "getWarnings" => null
          case "clearWarnings" => null
          case m => throw new UnsupportedOperationException(s"pgwire $label.$m")
        }
      }
    }
    Proxy.newProxyInstance(iface.getClassLoader, Array[Class[_]](iface), handler)
      .asInstanceOf[T]
  }

  // ------------------------------------------------------- connection

  def connection(wire: PgWireConnection): Connection = new ConnState(wire).asConnection

  private final class ConnState(val wire: PgWireConnection) {
    var autoCommit = true
    var closed = false

    /** Lazy BEGIN: JDBC transactions start implicitly with the first
      * statement after setAutoCommit(false) / commit / rollback. */
    def beforeExec(): Unit =
      if (!autoCommit && wire.txStatus == 'I') { wire.simple("BEGIN"); () }

    def asConnection: Connection = proxy(classOf[Connection], "Connection") {
      case ("createStatement", Array()) => statement(this)
      case ("prepareStatement", Array(sql: String)) => prepared(this, sql)
      case ("setAutoCommit", Array(b: java.lang.Boolean)) =>
        if (b && !autoCommit && wire.txStatus != 'I') wire.simple("COMMIT")
        autoCommit = b
      case ("getAutoCommit", Array()) => autoCommit
      case ("commit", Array()) => if (wire.txStatus != 'I') { wire.simple("COMMIT"); () }
      case ("rollback", Array()) => if (wire.txStatus != 'I') { wire.simple("ROLLBACK"); () }
      case ("setSavepoint", Array(name: String)) =>
        beforeExec() // a savepoint is itself the transaction's first statement
        wire.simple(s"SAVEPOINT $name")
        proxy(classOf[java.sql.Savepoint], "Savepoint") {
          case ("getSavepointName", Array()) => name
        }
      case ("rollback", Array(sp: java.sql.Savepoint)) =>
        wire.simple(s"ROLLBACK TO SAVEPOINT ${sp.getSavepointName}")
      case ("releaseSavepoint", Array(sp: java.sql.Savepoint)) =>
        wire.simple(s"RELEASE SAVEPOINT ${sp.getSavepointName}")
      case ("setTransactionIsolation", Array(level: java.lang.Integer)) =>
        val name = level.intValue() match {
          case Connection.TRANSACTION_READ_UNCOMMITTED => "READ UNCOMMITTED"
          case Connection.TRANSACTION_READ_COMMITTED => "READ COMMITTED"
          case Connection.TRANSACTION_REPEATABLE_READ => "REPEATABLE READ"
          case Connection.TRANSACTION_SERIALIZABLE => "SERIALIZABLE"
          case other => throw new SQLException(s"bad isolation level $other")
        }
        wire.simple(s"SET SESSION CHARACTERISTICS AS TRANSACTION ISOLATION LEVEL $name")
      case ("getTransactionIsolation", Array()) => Connection.TRANSACTION_READ_COMMITTED
      case ("getMetaData", Array()) => metaData(this)
      case ("isClosed", Array()) => closed
      case ("isValid", Array(_)) => !closed
      case ("close", Array()) => if (!closed) { closed = true; wire.close() }
      case ("getCatalog", Array()) => null
      case ("setCatalog", Array(_)) => ()
      case ("getSchema", Array()) => "public"
    }
  }

  private def metaData(c: ConnState): java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData], "DatabaseMetaData") {
      case ("supportsTransactions", Array()) => true
      case ("supportsDataDefinitionAndDataManipulationTransactions", Array()) => true
      case ("supportsDataManipulationTransactionsOnly", Array()) => false
      case ("supportsTransactionIsolationLevel", Array(_)) => true
      case ("getDatabaseProductName", Array()) => "PostgreSQL"
      case ("getDatabaseProductVersion", Array()) =>
        c.wire.serverParams.getOrElse("server_version", "0")
      case ("getDatabaseMajorVersion", Array()) =>
        c.wire.serverParams.getOrElse("server_version", "0").takeWhile(_.isDigit) match {
          case "" => 0
          case d => d.toInt
        }
      case ("getDatabaseMinorVersion", Array()) => 0
      case ("getDriverName", Array()) => "graft-pgwire"
      case ("getDriverVersion", Array()) => "0.1"
      case ("getJDBCMajorVersion", Array()) => 4
      case ("getJDBCMinorVersion", Array()) => 2
      case ("getIdentifierQuoteString", Array()) => "\""
      case ("storesUpperCaseIdentifiers", Array()) => false
      case ("storesLowerCaseIdentifiers", Array()) => true
      case ("storesMixedCaseIdentifiers", Array()) => false
      case ("supportsMixedCaseIdentifiers", Array()) => false
      case ("getSQLKeywords", Array()) => ""
      case ("getURL", Array()) => null
      case ("getUserName", Array()) => c.wire.user
    }

  // -------------------------------------------------------- statement

  private def statement(c: ConnState): java.sql.Statement = {
    var lastResults: Vector[Result] = Vector.empty
    proxy(classOf[java.sql.Statement], "Statement") {
      case ("executeUpdate", Array(sql: String)) =>
        c.beforeExec(); c.wire.simple(sql).lastOption.map(_.rowCount).getOrElse(0)
      case ("executeQuery", Array(sql: String)) =>
        c.beforeExec(); resultSet(c.wire.simple(sql).last)
      case ("execute", Array(sql: String)) =>
        c.beforeExec(); lastResults = c.wire.simple(sql)
        lastResults.lastOption.exists(_.fields.nonEmpty)
      case ("getResultSet", Array()) => lastResults.lastOption.map(resultSet).orNull
      case ("getUpdateCount", Array()) =>
        lastResults.lastOption.filter(_.fields.isEmpty).map(_.rowCount).getOrElse(-1)
      case ("setQueryTimeout", Array(s: java.lang.Integer)) =>
        if (s.intValue() > 0) { c.wire.simple(s"SET statement_timeout = ${s.intValue() * 1000}"); () }
      case ("getQueryTimeout", Array()) => 0
      case ("close", Array()) => ()
      case ("isClosed", Array()) => false
      case ("setFetchSize", Array(_)) => ()
      case ("cancel", Array()) => ()
    }
  }

  /** JDBC `?` placeholders → the wire protocol's `$n`, skipping quoted
    * strings ('…', with '' escapes) and quoted identifiers ("…"). */
  def dollarize(jdbcSql: String): String = {
    val out = new java.lang.StringBuilder(jdbcSql.length + 8)
    var i = 0; var n = 0
    var quote: Char = 0
    while (i < jdbcSql.length) {
      val ch = jdbcSql.charAt(i)
      if (quote != 0) { out.append(ch); if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' => quote = ch; out.append(ch)
        case '?' => n += 1; out.append('$').append(n)
        case other => out.append(other)
      }
      i += 1
    }
    out.toString
  }

  private def prepared(c: ConnState, jdbcSql: String): java.sql.PreparedStatement = {
    val sql = dollarize(jdbcSql)
    val params = scala.collection.mutable.Map.empty[Int, Option[String]]
    val batch = Vector.newBuilder[Seq[Option[String]]]
    var batchSize = 0
    def snapshot(): Seq[Option[String]] = {
      val n = if (params.isEmpty) 0 else params.keys.max
      (1 to n).map(i => params.getOrElse(i, None))
    }
    def bind(i: AnyRef, v: Any): Unit =
      params(i.asInstanceOf[java.lang.Integer].intValue()) = encode(v)
    proxy(classOf[java.sql.PreparedStatement], "PreparedStatement") {
      case ("setObject", Array(i, v)) => bind(i, v)
      case ("setNull", Array(i, _)) => bind(i, null)
      case ("setString", Array(i, v)) => bind(i, v)
      case ("setLong", Array(i, v)) => bind(i, v)
      case ("setInt", Array(i, v)) => bind(i, v)
      case ("setShort", Array(i, v)) => bind(i, v)
      case ("setByte", Array(i, v)) => bind(i, v)
      case ("setDouble", Array(i, v)) => bind(i, v)
      case ("setFloat", Array(i, v)) => bind(i, v)
      case ("setBoolean", Array(i, v)) => bind(i, v)
      case ("setBigDecimal", Array(i, v)) => bind(i, v)
      case ("setTimestamp", Array(i, v)) => bind(i, v)
      case ("setDate", Array(i, v)) => bind(i, v)
      case ("setBytes", Array(i, v)) => bind(i, v)
      case ("clearParameters", Array()) => params.clear()
      case ("addBatch", Array()) => batch += snapshot(); batchSize += 1
      case ("clearBatch", Array()) => batch.clear(); batchSize = 0
      case ("executeBatch", Array()) =>
        c.beforeExec()
        val rows = batch.result(); batch.clear(); batchSize = 0
        c.wire.executeBatch(sql, rows)
      case ("executeUpdate", Array()) =>
        c.beforeExec(); c.wire.execute(sql, snapshot()).rowCount
      case ("executeQuery", Array()) =>
        c.beforeExec(); resultSet(c.wire.execute(sql, snapshot()))
      case ("execute", Array()) =>
        c.beforeExec(); c.wire.execute(sql, snapshot()).fields.nonEmpty
      case ("setQueryTimeout", Array(s: java.lang.Integer)) =>
        if (s.intValue() > 0) { c.wire.simple(s"SET statement_timeout = ${s.intValue() * 1000}"); () }
      case ("getQueryTimeout", Array()) => 0
      case ("close", Array()) => ()
      case ("isClosed", Array()) => false
      case ("setFetchSize", Array(_)) => ()
    }
  }

  // ------------------------------------------------------- result set

  private def resultSet(r: Result): ResultSet = {
    var row = -1
    var lastNull = false
    def cell(i: AnyRef): Option[String] =
      r.rows(row)(i.asInstanceOf[java.lang.Integer].intValue() - 1) match {
        case some @ Some(_) => lastNull = false; some
        case None => lastNull = true; None
      }
    proxy(classOf[ResultSet], "ResultSet") {
      case ("next", Array()) => row += 1; row < r.rows.length
      case ("wasNull", Array()) => lastNull
      case ("getString", Array(i: java.lang.Integer)) => cell(i).orNull
      case ("getLong", Array(i: java.lang.Integer)) => cell(i).map(_.toLong).getOrElse(0L)
      case ("getInt", Array(i: java.lang.Integer)) => cell(i).map(_.toInt).getOrElse(0)
      case ("getShort", Array(i: java.lang.Integer)) => cell(i).map(_.toShort).getOrElse(0.toShort)
      case ("getDouble", Array(i: java.lang.Integer)) => cell(i).map(_.toDouble).getOrElse(0.0)
      case ("getFloat", Array(i: java.lang.Integer)) => cell(i).map(_.toFloat).getOrElse(0.0f)
      case ("getBoolean", Array(i: java.lang.Integer)) =>
        cell(i).exists(s => s == "t" || s == "true")
      case ("getBigDecimal", Array(i: java.lang.Integer)) =>
        cell(i).map(new java.math.BigDecimal(_)).orNull
      case ("getTimestamp", Array(i: java.lang.Integer)) =>
        cell(i).map(decodeTimestamp).orNull
      case ("getDate", Array(i: java.lang.Integer)) =>
        cell(i).map(s => java.sql.Date.valueOf(LocalDate.parse(s))).orNull
      case ("getBytes", Array(i: java.lang.Integer)) => cell(i).map(decodeBytes).orNull
      case ("getMetaData", Array()) => resultSetMetaData(r)
      case ("close", Array()) => ()
      case ("isClosed", Array()) => false
    }
  }

  private def resultSetMetaData(r: Result): java.sql.ResultSetMetaData = {
    def f(i: AnyRef): Field = r.fields(i.asInstanceOf[java.lang.Integer].intValue() - 1)
    proxy(classOf[java.sql.ResultSetMetaData], "ResultSetMetaData") {
      case ("getColumnCount", Array()) => r.fields.length
      case ("getColumnName", Array(i)) => f(i).name
      case ("getColumnLabel", Array(i)) => f(i).name
      case ("getColumnType", Array(i)) => jdbcType(f(i).typeOid, f(i).typmod)._1
      case ("getColumnTypeName", Array(i)) => jdbcType(f(i).typeOid, f(i).typmod)._2
      case ("getPrecision", Array(i)) => jdbcType(f(i).typeOid, f(i).typmod)._3
      case ("getScale", Array(i)) => jdbcType(f(i).typeOid, f(i).typmod)._4
      case ("isSigned", Array(i)) => Set(OidInt2, OidInt4, OidInt8, OidFloat4,
        OidFloat8, OidNumeric).contains(f(i).typeOid)
      case ("isNullable", Array(_)) => java.sql.ResultSetMetaData.columnNullableUnknown
      case ("isCaseSensitive", Array(_)) => true
      case ("isCurrency", Array(_)) => false
      case ("isAutoIncrement", Array(_)) => false
    }
  }
}
