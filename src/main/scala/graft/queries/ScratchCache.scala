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

  /** Upper bound on simultaneously-registered scratch persists. The gate
    * drivers drain after every query, so they never approach it; the cap
    * exists for an EMBEDDING caller that issues many queries without ever
    * draining — its storage footprint stays bounded at MaxLive scratch
    * tables instead of growing with query count. Eviction is oldest-first
    * (registration order): a scratch persist's useful life is its own
    * query, so the oldest entry is always the safest to release — at worst
    * an evicted-but-still-referenced plan silently recomputes.
    */
  val MaxLive = 64

  private val live = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Register an already-persisted dataset for the next drain; returns it.
    * Past MaxLive the oldest registrations are unpersisted (async) and
    * dropped so the registry — and executor storage — stays bounded.
    */
  def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    live += ds
    while (live.size > MaxLive)
      live.remove(0).unpersist(false)
    ds
  }

  /** Number of currently-registered (not yet drained/evicted) datasets. */
  def liveCount: Int = synchronized(live.size)

  /** Unpersist every registered dataset (async) and clear the registry. */
  def drain(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
