package graft.queries

import org.apache.spark.sql.Dataset

/** Registry for per-query scratch persists (round-5 advice: funnel and
  * token-budget caches accumulated in executor storage over a long-lived
  * 150+-query sweep).
  *
  * A query that persists an intermediate it cannot unpersist itself — the
  * returned DataFrame is still lazy, so the cache must outlive the builder
  * — registers it here; the gate drivers (Verify, Bench, test suites) call
  * `drain()` after each query's terminal action. Deliberately-SHARED caches
  * (the per-(session, corpus) shingle index, TextOps.scala) do NOT register:
  * cross-query reuse is their point, and they are bounded at one table per
  * corpus dir.
  *
  * Blocking=false on the unpersist: eviction is async, the next query does
  * not wait on executor cleanup.
  */
object ScratchCache {

  private val live = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Register an already-persisted dataset for the next drain; returns it. */
  def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    live += ds
    ds
  }

  /** Unpersist every registered dataset (async) and clear the registry. */
  def drain(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
