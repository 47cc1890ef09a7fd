package graft

import java.nio.file.{Files, Path}

/** Temp directories for the self-contained lake/index demos (d9/d10/
  * s9/u3-u7), deleted on JVM exit. Each demo materializes a full
  * table copy under /tmp; a bench run executes every demo 3× (warm-up
  * + 2 timed passes), so without cleanup one suite leaves dozens of
  * dataset copies behind. Deletion happens at JVM exit — not when the
  * demo returns — because the returned DataFrames lazily READ these
  * dirs; a caller may materialize them at any point in the session.
  */
object TempDirs {
  private val dirs = scala.collection.mutable.ArrayBuffer.empty[Path]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => cleanup()))

  /** A fresh temp dir that will be recursively deleted on JVM exit. */
  def create(prefix: String): String = synchronized {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    dirs += p
    p.toString
  }

  private def cleanup(): Unit = synchronized {
    dirs.foreach { root =>
      try {
        import scala.jdk.CollectionConverters._
        Files.walk(root).iterator().asScala.toSeq.reverseIterator
          .foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      } catch { case _: Exception => () } // best-effort: exit anyway
    }
    dirs.clear()
  }
}
