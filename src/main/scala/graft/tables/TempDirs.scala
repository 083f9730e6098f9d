package graft.tables

import java.nio.file.{Files, Path, Paths}

/** Registry of scratch directories (CC superstep labels, stored ANN
  * index builds) that must not outlive the JVM. Directories register
  * here instead of calling `File.deleteOnExit` — that API cannot
  * remove non-empty directories, so parquet scratch would survive it.
  * A single shutdown hook removes every registered root recursively;
  * callers that can prove a directory is dead earlier (e.g. a
  * superseded CC superstep) delete it eagerly via [[delete]].
  */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => deleteRecursively(Paths.get(p)))
    }, "graft-tempdir-cleanup"))
  }

  /** Create a fresh scratch directory removed at JVM exit. */
  def scratch(prefix: String): String = {
    hook
    val dir = Files.createTempDirectory(prefix).toString
    registered.add(dir)
    dir
  }

  /** Eagerly remove a directory (and deregister it if it was a
    * registered root — subpaths of a root are simply deleted). */
  def delete(path: String): Unit = {
    registered.remove(path)
    deleteRecursively(Paths.get(path))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively) finally children.close()
      }
      Files.deleteIfExists(p)
    }
  }
}
