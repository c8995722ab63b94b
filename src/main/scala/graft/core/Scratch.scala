package graft.core

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

/** Per-tag scratch directories with bounded lifetime.
  *
  * Several queries materialize a throwaway on-disk artifact per
  * execution (a re-versioned index, a format-roundtrip file, a
  * streaming landing dir). `Files.createTempDirectory` alone leaks
  * one directory per execution — under the warmed min-of-3 bench
  * that's 4 copies per query per run, unbounded across rounds
  * (ADVICE r7). This keeps exactly ONE live directory per tag:
  * requesting a fresh dir for a tag deletes the previous one (the
  * caller has finished with it — each query materializes its answer
  * before returning), and a JVM shutdown hook removes the survivors.
  *
  * Thread-safety: the map is concurrent; the delete of the PREVIOUS
  * dir only races with a concurrent request for the SAME tag, and
  * every tag is used by exactly one query (queries run sequentially
  * in both the bench and the Verify driver).
  */
object Scratch {
  private val live = new ConcurrentHashMap[String, Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    live.values.forEach(p => deleteRecursively(p))
    live.clear()
  }))

  /** A fresh empty scratch directory for `tag`, replacing (and
    * deleting) the tag's previous one if any. Returns its absolute
    * path as a string. */
  def dir(tag: String): String = {
    val fresh = Files.createTempDirectory(tag)
    val prev = live.put(tag, fresh)
    if (prev != null) deleteRecursively(prev)
    fresh.toString
  }

  /** Like [[dir]] but rooted at `base` when writable (e.g. /dev/shm
    * for streaming checkpoints), falling back to java.io.tmpdir. */
  def dirAt(base: String, tag: String): String = {
    val root = Paths.get(base)
    val fresh =
      if (Files.isWritable(root)) Files.createTempDirectory(root, tag)
      else Files.createTempDirectory(tag)
    val prev = live.put(tag, fresh)
    if (prev != null) deleteRecursively(prev)
    fresh.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    import scala.util.Try
    Try {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val s = Files.list(p)
        try s.forEach(deleteRecursively(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    }
  }
}
