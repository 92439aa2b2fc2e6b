package graft

import java.nio.file.{Files, Path}

/** Process-scoped tmp-dir lifecycle shared by the replay and round-trip
  * fixtures: per-pid dirs avoid cross-process races, a JVM shutdown hook
  * removes them on clean exit, and `sweepDead` removes sibling dirs left
  * by UNCLEAN exits (SIGKILL skips shutdown hooks) whose owning pid is no
  * longer alive — so tmp accumulation stays bounded under any exit mode.
  */
object TmpDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  /** Register `dir` for recursive deletion at JVM exit (idempotent). */
  def deleteOnExit(dir: Path): Unit =
    if (registered.add(dir))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))

  def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }

  /** Delete sibling dirs under `parent` named `<prefix><pid>` or
    * `<prefix><pid>_…` whose pid is dead. Only the FULL pid-segment shape
    * is treated as pid-owned: leading digits followed by anything else
    * (e.g. a legacy `<prefix><hexhash>` dir whose hash happens to start
    * with digits) are NOT parsed as a pid — misreading one could delete a
    * directory still in use by a concurrently running older build. Live
    * processes are never touched; a recycled pid at worst defers cleanup
    * to a later sweep.
    */
  def sweepDead(parent: Path, prefix: String): Unit =
    if (Files.isDirectory(parent)) {
      val listing = Files.list(parent)
      try listing.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith(prefix)) {
          val rest = name.drop(prefix.length)
          val pidStr = rest.takeWhile(_.isDigit)
          val wholeSegment = pidStr.nonEmpty &&
            (rest.length == pidStr.length || rest.charAt(pidStr.length) == '_')
          if (wholeSegment) {
            val alive = ProcessHandle.of(pidStr.toLong)
              .map[java.lang.Boolean](h => h.isAlive).orElse(false)
            if (!alive) deleteRecursively(p)
          }
        }
      } finally listing.close()
    }
}
