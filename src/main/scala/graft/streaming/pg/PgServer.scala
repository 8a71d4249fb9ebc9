package graft.streaming.pg

import java.net.ServerSocket
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Disposable local PostgreSQL instance for specs and the ingest bench:
  * `initdb` + `pg_ctl start` into a temp directory, TCP on a free loopback
  * port, stopped and deleted after use. This is what turns the sink's
  * Postgres dialect from pinned SQL text into an EXECUTED path — the
  * BASELINE target is "JDBC sink to Postgres", and the sandbox ships the
  * server binaries (PostgreSQL 15) even though it ships no client jar.
  *
  * PostgreSQL refuses to run as root, and these tests may run as root: in
  * that case every pg binary is wrapped in `setpriv --reuid=nobody`, with
  * the data directory parent made world-writable so `nobody` can own the
  * cluster. No system state is touched beyond the given scratch directory.
  *
  * Auth: `initdb --auth=trust` for the default superuser (the spec path),
  * plus an optional SCRAM user — [[start]] can append `pg_hba.conf` lines
  * and create password-carrying roles so [[PgWireConnection]]'s
  * SCRAM-SHA-256 implementation is exercised against the real server, not
  * a mock.
  */
object PgServer {

  private def which(bin: String): Option[Path] =
    Seq("/usr/local/bin", "/usr/bin", "/usr/lib/postgresql/15/bin")
      .map(d => Paths.get(d, bin)).find(Files.isExecutable)

  /** Server binaries present? (Specs `assume` on this.) */
  def available: Boolean = which("initdb").isDefined && which("pg_ctl").isDefined

  private lazy val isRoot: Boolean = System.getProperty("user.name") == "root"

  private def run(cmd: Seq[String]): Unit = {
    val full = if (isRoot)
      Seq("setpriv", "--reuid=65534", "--regid=65534", "--clear-groups") ++ cmd
    else cmd
    val pb = new ProcessBuilder(full.asJava)
    pb.redirectErrorStream(true)
    pb.directory(new java.io.File("/tmp")) // setpriv target must be able to cwd
    val p = pb.start()
    val outBytes = p.getInputStream.readAllBytes()
    val code = p.waitFor()
    if (code != 0)
      throw new IllegalStateException(
        s"${cmd.head} exited $code:\n${new String(outBytes).takeRight(2000)}")
  }

  final case class Instance(dataDir: Path, port: Int, user: String) {
    def url(db: String = "postgres"): String = s"jdbc:postgresql://127.0.0.1:$port/$db"
    def connect(db: String = "postgres", asUser: String = user,
        password: Option[String] = None): PgWireConnection =
      new PgWireConnection("127.0.0.1", port, asUser, db, password)
    def stop(): Unit = {
      try run(Seq(which("pg_ctl").get.toString, "-D", dataDir.toString, "-m", "immediate", "stop"))
      catch { case _: Throwable => () }
    }
  }

  /** Init and start a cluster under `scratch` (created; must not be a
    * directory PostgreSQL would refuse, i.e. keep it on local disk).
    * `scramUsers` are (name, password) roles created with scram-sha-256
    * verifiers and given a matching hostssl-less pg_hba scram line. */
  def start(scratch: Path, scramUsers: Map[String, String] = Map.empty): Instance = {
    require(available, "postgres binaries not found")
    Files.createDirectories(scratch)
    if (isRoot) {
      // nobody must be able to create the data dir and the unix socket dir
      Files.setPosixFilePermissions(scratch,
        java.nio.file.attribute.PosixFilePermissions.fromString("rwxrwxrwx"))
    }
    val dataDir = scratch.resolve("data")
    val user = "graft"
    run(Seq(which("initdb").get.toString, "-D", dataDir.toString,
      "--auth=trust", "-U", user, "--no-sync"))

    if (scramUsers.nonEmpty) {
      // scram lines must precede the trust catch-all to take effect
      val hba = dataDir.resolve("pg_hba.conf")
      val existing = new String(Files.readAllBytes(hba))
      val scramLines = scramUsers.keys.map(u =>
        s"host all $u 127.0.0.1/32 scram-sha-256").mkString("", "\n", "\n")
      // root rewriting the file leaves nobody's ownership intact
      Files.write(hba, (scramLines + existing).getBytes)
    }

    val port = { val s = new ServerSocket(0); try s.getLocalPort finally s.close() }
    run(Seq(which("pg_ctl").get.toString, "-D", dataDir.toString,
      "-l", scratch.resolve("pg.log").toString, "-w",
      "-o", s"-p $port -c listen_addresses=127.0.0.1 -k ${scratch.toString} " +
        "-c password_encryption=scram-sha-256 -c fsync=off",
      "start"))

    val inst = Instance(dataDir, port, user)
    // backstop for abnormal exits (a leaked postmaster outlives the JVM)
    Runtime.getRuntime.addShutdownHook(new Thread(() => inst.stop()))
    if (scramUsers.nonEmpty) {
      val c = inst.connect()
      try scramUsers.foreach { case (u, pw) =>
        c.simple(s"CREATE ROLE $u LOGIN PASSWORD '${pw.replace("'", "''")}'")
      } finally c.close()
    }
    inst
  }
}
