package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // session shared across suites
}

object SparkSpec {

  /** The smallest driver fixture — the default data for specs. */
  val fixtureSf = "/root/testdata/sf0.001"

  /** Temp fixture dir carrying every [[graft.fixtures.Fixtures.baseTables]]
    * parquet from [[fixtureSf]] EXCEPT the named ones, which the caller
    * writes itself — the shared setup for adversarial/synthetic-corpus
    * specs (was copy-pasted per test before). */
  /** Temp dir deleted at JVM exit — specs use this instead of a bare
    * Files.createTempDirectory so test runs don't accrete /tmp (dirs may
    * be read lazily until the shared session dies, so per-test deletion
    * is not safe; JVM exit is). */
  def tempDir(prefix: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir
  }

  def fixtureDirExcept(except: String*): java.nio.file.Path = {
    val dir = tempDir("graft_fix")
    for (t <- graft.fixtures.Fixtures.baseTables if !except.contains(t))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$fixtureSf/$t.parquet"),
        dir.resolve(s"$t.parquet"))
    dir
  }

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
