package graft.util

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Leak-safe local directory listing. `Files.list` holds an OS directory
  * handle until CLOSED — relying on GC leaks file descriptors on any
  * long-running driver that lists per trigger (the graft-blocks connector
  * lists ≥2× per micro-batch). Every local listing in the repo routes
  * through here so the close discipline lives in one place.
  */
object Dirs {

  /** Entry NAMES of `dir`, sorted; empty if `dir` is not a directory. */
  def listNames(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString).toVector.sorted
      finally s.close()
    }
  }

  /** True iff any file under `dir` (recursively — partitioned writes put
    * data files under `col=value/` subdirs) ends with `suffix`. */
  def hasFileWithSuffix(dir: String, suffix: String): Boolean = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) false
    else {
      val s = Files.walk(p)
      try s.iterator().asScala.exists { f =>
        Files.isRegularFile(f) && f.getFileName.toString.endsWith(suffix)
      }
      finally s.close()
    }
  }

  /** The numeric suffixes of entries named `<prefix><digits>`, e.g.
    * `chunk=17` → 17 for prefix "chunk=". Entries that are not a valid Int
    * suffix are SKIPPED, not parse errors — including all-digit suffixes
    * too long for Int (a stray `chunk=20260813120000` timestamp): anything
    * a caller of this helper did not itself write must not brick its
    * startup. Nine digits is the longest string guaranteed inside Int
    * range. */
  def numericSuffixes(dir: String, prefix: String): Seq[Int] =
    listNames(dir).collect {
      case n if n.startsWith(prefix) && {
        val sfx = n.drop(prefix.length)
        sfx.nonEmpty && sfx.length <= 9 && sfx.forall(_.isDigit)
      } => n.drop(prefix.length).toInt
    }
}
