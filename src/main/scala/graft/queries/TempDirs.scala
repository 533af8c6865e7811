package graft.queries

/** Per-invocation temp dirs for the gate queries that write real files
  * (sink round-trips, streaming inputs/checkpoints).
  *
  * Each call returns a FRESH directory — concurrent sessions in one JVM
  * can never race on a shared path (round-3 advice). To keep repeated
  * invocations (two bench passes, repeated Verify runs) from accumulating
  * table copies on disk, the PREVIOUS directory handed to the SAME thread
  * for the same tag is deleted on the next request: by then its consumer
  * query has been fully materialized, and another thread's directories are
  * never touched, so the no-race property is preserved. deleteOnExit covers
  * whatever the last invocation leaves.
  */
object TempDirs {

  private val last = new java.util.concurrent.ConcurrentHashMap[String, java.io.File]()

  def fresh(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    p.toFile.deleteOnExit()
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
