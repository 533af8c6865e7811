package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyed per-(session, corpus) cache for derived tables that production
  * pipelines materialize ONCE and serve to every consumer: the shingle
  * inverted index, the LSH-verified near-dup pair set, LSH signature
  * tables, the refined IVF cell assignment. Rebuilding any of these per
  * query is the thing no 100 TB deployment would do — an index is built
  * once, then queried.
  *
  * Unlike [[ScratchCache]] (per-query scratch, drained after each query's
  * terminal action), entries here deliberately survive a whole sweep:
  * cross-query reuse is their point, and they are bounded at one table per
  * (kind, corpus dir) — all of them orders of magnitude smaller than the
  * corpus (signatures, pairs, assignments — never documents or vectors).
  *
  * Keyed by the SESSION OBJECT (identity equals) in a WeakHashMap, not its
  * identityHashCode: two live sessions can collide on a hash, and a string
  * key would pin every session's cached plans forever. Dead sessions GC
  * away with their entries; `unpersist`/`clearCache` only costs a
  * recompute, never correctness.
  */
object CorpusCache {

  private val cache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]()

  /** Return the cached table for `key`, building + persisting on first use. */
  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.synchronized {
      cache
        .computeIfAbsent(s, _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate(key, build.persist())
    }
}
