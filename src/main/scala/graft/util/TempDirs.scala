package graft.util

import java.nio.file.{Files, Path}

/** Run-scoped temp directories: every query/bench/verify run that needs
  * scratch storage allocates under one JVM-lifetime root which a single
  * shutdown hook deletes recursively — repeated correctness/bench runs
  * stop leaking `graft_*` directories in the system temp dir.
  */
object TempDirs {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_run_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh scratch directory (as a string path) removed at JVM exit. */
  def scratch(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    try Files.deleteIfExists(p) catch { case _: java.io.IOException => () }
  }
}
