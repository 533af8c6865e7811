package graft.queries

/** Per-invocation temp dirs for the gate queries that write real files
  * (sink round-trips, streaming inputs/checkpoints).
  *
  * Each call returns a FRESH directory — concurrent sessions in one JVM
  * can never race on a shared path (round-3 advice). To keep repeated
  * invocations (two bench passes, repeated Verify runs) from accumulating
  * table copies on disk, the PREVIOUS directory handed to the SAME thread
  * for the same tag is deleted on the next request.
  *
  * CALLER CONTRACT (the reclamation's correctness conditions): a query
  * function that takes a `fresh` dir must fully MATERIALIZE any DataFrame
  * reading from it before the same thread asks for that tag again — the
  * gate drivers (Verify/Bench/tests) write each result out before invoking
  * the next query, which satisfies this. A driver that re-invokes the same
  * tag from a thread POOL never reclaims eagerly (keys are per-thread);
  * those dirs are still reclaimed by the JVM shutdown hook below, which
  * recursively deletes every surviving entry (File.deleteOnExit would
  * silently skip non-empty dirs).
  */
object TempDirs {

  private val last = new java.util.concurrent.ConcurrentHashMap[String, java.io.File]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    last.values().forEach(deleteRecursively(_))
    last.clear()
  }, "graft-tempdirs-cleanup"))

  def fresh(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    val key = s"$tag:${Thread.currentThread().getId}"
    val prev = last.put(key, p.toFile)
    if (prev != null) deleteRecursively(prev)
    p.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
