package graft.util

import java.nio.file.{Files, Path}

/** The one recursive-delete helper (walk, reverse, deleteIfExists) —
  * previously copy-pasted at five sites; a future behavioral fix
  * (symlink handling, retries) now lands once.
  */
object Fs {

  def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toList.reverse.foreach(f => Files.deleteIfExists(f))
    } finally s.close()
  }

  /** Best-effort variant for cleanup paths where a failed delete must
    * never mask the primary result (drive teardown, shutdown hooks).
    */
  def deleteQuietly(p: Path): Unit =
    try { if (Files.exists(p)) deleteRecursively(p) }
    catch { case scala.util.control.NonFatal(_) => () }
}
