package graft.queries

import org.apache.spark.sql.SparkSession

/** Memoized eager corpus preconditions (round-10 advice).
  *
  * Some queries enforce a data-shape assumption with a fail-fast scan at
  * DataFrame CONSTRUCTION time (the Bloom-capacity `.first()` discipline):
  * e.g. fusion_rrf's +100000 augment offset must not alias real vec_ids,
  * and er_entity_clusters' 60-bit node handles must be injective over the
  * name universe. Those checks are O(n) Spark jobs, and construction
  * happens far more often than the corpus changes — plan-only consumers
  * (ExplainDump, the plan-shape specs) build the DataFrame just to inspect
  * it, and the gate drivers rebuild per query. Memoizing per
  * (session, key) makes every construction after the first free while
  * keeping the guarantee: within one session a given corpus dir is checked
  * exactly once, and a NEW session (or a new dir) re-checks from scratch.
  *
  * A FAILED check is deliberately not memoized: the key is recorded only
  * after `check` returns, so a violating corpus throws on every
  * construction rather than once.
  *
  * Sessions are weak keys (the [[CorpusCache]] discipline): the memo must
  * not keep a stopped session reachable.
  */
object Preconditions {

  private val seen = new java.util.WeakHashMap[
    SparkSession, scala.collection.mutable.HashSet[String]]()

  private def keysOf(s: SparkSession): scala.collection.mutable.HashSet[String] =
    synchronized {
      val e = seen.get(s)
      if (e != null) e
      else { val n = scala.collection.mutable.HashSet.empty[String]; seen.put(s, n); n }
    }

  /** Run `check` (which throws on violation) once per (session, key);
    * later invocations with the same key on the same session are no-ops.
    */
  def once(s: SparkSession, key: String)(check: => Unit): Unit = {
    val needed = synchronized { !keysOf(s).contains(key) }
    if (needed) {
      check
      synchronized { keysOf(s).add(key) }
    }
  }

  /** Whether (session, key) has already passed — the spec witness. */
  private[queries] def passed(s: SparkSession, key: String): Boolean =
    synchronized { keysOf(s).contains(key) }

  // ---- memoized scalar values (round 12) ----------------------------------
  //
  // The same construction-time shape as `once`, but for a derived LONG the
  // caller needs (a corpus row count feeding a derived writer split): the
  // count job is parquet-meta-cheap but construction happens per invocation,
  // and the s19 plan trace should not carry a count job the corpus can't
  // have changed under (round-11 verdict #4). Weak session keys as above.

  private val vals = new java.util.WeakHashMap[
    SparkSession, scala.collection.mutable.HashMap[String, Long]]()

  private def valsOf(s: SparkSession): scala.collection.mutable.HashMap[String, Long] =
    synchronized {
      val e = vals.get(s)
      if (e != null) e
      else { val n = scala.collection.mutable.HashMap.empty[String, Long]; vals.put(s, n); n }
    }

  /** Compute `value` once per (session, key) and serve the memo afterwards.
    * A throwing compute is not memoized (the `once` discipline): the key is
    * recorded only after `value` returns.
    */
  def longOnce(s: SparkSession, key: String)(value: => Long): Long = {
    val hit = synchronized { valsOf(s).get(key) }
    hit match {
      case Some(v) => v
      case None =>
        val v = value
        synchronized { valsOf(s).update(key, v) }
        v
    }
  }
}
