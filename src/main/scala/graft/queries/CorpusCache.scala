package graft.queries

import java.lang.ref.WeakReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

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
  * Reference discipline (what makes the GC story true, not just claimed):
  * the outer map is a WeakHashMap keyed by the SESSION OBJECT (identity
  * equals — two live sessions can collide on a hash, and a string key
  * would pin entries forever), and the VALUES hold the Datasets only
  * through WeakReferences. A Dataset strongly references its session, so
  * strong values would make every key reachable through its own value and
  * no session could ever be collected (the java.util.WeakHashMap javadoc's
  * value-refers-to-key warning). With weak values, a dead session GCs away
  * with its entries; a cleared reference on a LIVE session just means the
  * cheap plan object is re-derived — Spark's shared CacheManager still
  * recognizes the rebuilt (canonically identical) plan, so the persisted
  * blocks themselves are reused, not recomputed.
  *
  * External eviction is survivable, not just tolerated: `getOrBuild`
  * checks the entry's current storage level and re-persists one that a
  * `clearCache()`/`unpersist()` dropped — otherwise every later lookup
  * would silently return a never-again-cached plan and the self-join
  * consumers would recompute the whole build chain once per join side.
  */
object CorpusCache {

  private val cache = new java.util.WeakHashMap[
    SparkSession, scala.collection.mutable.Map[String, WeakReference[DataFrame]]]()

  /** Return the cached table for `key`, building + persisting on first
    * use, re-persisting after external eviction.
    */
  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.synchronized {
      val entries = cache.computeIfAbsent(s, _ => scala.collection.mutable.Map.empty)
      val cached = entries.get(key).flatMap(ref => Option(ref.get()))
      cached match {
        case Some(df) =>
          if (df.storageLevel == StorageLevel.NONE) df.persist()
          df
        case None =>
          val df = build.persist()
          entries(key) = new WeakReference(df)
          df
      }
    }
}
