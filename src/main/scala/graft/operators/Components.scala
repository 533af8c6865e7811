package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via min-label propagation with
  * pointer jumping.
  *
  * Each pass does two label improvements and then checks a fixpoint:
  *   1. neighbor step: label(v) := min(label(v), min over edges (v,u) of
  *      label(u)) — the classic propagation, shrinks the distance to the
  *      component minimum by one hop per pass;
  *   2. shortcut step (pointer jumping): label(v) := min(label(v),
  *      label(label(v))) — labels are themselves node ids, so chasing one
  *      pointer halves the remaining distance. Together the passes converge
  *      in O(log diameter), so the iteration cap is a safety rail, not a
  *      correctness bound (a fixed-iteration loop silently mislabels any
  *      component whose eccentricity from its min node exceeds the cap —
  *      e.g. a long near-dup chain A~B~C~… at larger corpus scale).
  *
  * Every iteration `localCheckpoint()`s the label table: each step references
  * the previous labels several times, and an unbroken lineage doubles the
  * Catalyst plan per iteration (2^n analysis blow-up). The materialized table
  * is one row per node *that has an edge* — orders of magnitude smaller than
  * the corpus in a dedup setting. The convergence probe reuses exactly that
  * materialized table (a limit-1 scan for a changed label), so it is a
  * control-flow decision, not a driver-side data funnel.
  */
object Components {

  /** Labels every node appearing in `edgesIn` (columns `i`, `j`, undirected —
    * symmetrized internally) with the minimum node id of its component.
    * Returns (node, label). Throws if the fixpoint is not reached within
    * `maxIter` passes (with pointer jumping that would take a component of
    * diameter > 2^maxIter).
    *
    * `stageDir` (default: the SPARK_GRAFT_STAGE_DIR env var, the same
    * scratch-bounding contract as CorpusCache's staged index mode — round
    * 15, extending it to the closure): when set, the symmetrized edge set
    * is PUBLISHED to parquet under it (rename-swapped, per-run salted)
    * and every pass reads the scan, instead of a localCheckpoint whose
    * pinned blocks compete with the join's execution memory for the whole
    * closure and whose build lineage (the caller's whole candidate/verify
    * chain) stays shuffle-file-resident until the query ends. Label state
    * keeps its checkpoint discipline either way — it is node-count-sized,
    * orders of magnitude under the edge set. The staged edge files are
    * deleted when the closure returns (the result is an eager checkpoint
    * with no lineage into them).
    */
  def connectedComponents(edgesIn: DataFrame, maxIter: Int = 50,
      stageDir: Option[String] = sys.env.get("SPARK_GRAFT_STAGE_DIR")): DataFrame = {
    // Symmetrize in a SINGLE pass over the caller's chain: explode each
    // pair into both directions inside one projection, then checkpoint the
    // result once. The earlier union-of-two-references shape re-executed
    // any non-exchange work above the last shuffle per branch (exchange
    // reuse only collapses the shuffles — the per-consumer SORTs of a
    // sort-merge join, e.g. the two-tier rescore fetch feeding
    // dedup_semantic, ran per branch: 967.6 s vs 346.5 s at n=10⁷,
    // round-10 probe), and the round-10 fix — checkpointing the
    // one-directional half first — held TWO eager checkpoints of the edge
    // set for the whole closure (~1.5× the block-manager storage, round-10
    // advice). The explode form needs neither: the caller's chain executes
    // exactly once, and the only materialization is the symmetric edge set
    // the iteration loop actually reads.
    // the symmetrized row count rides the checkpoint's own materialization
    // job as an observe metric (round-13 verdict #6: the previous
    // dedicated count() action — though it only re-read materialized
    // blocks — was one whole job per closure for a number the
    // materialization had already seen)
    val observed = edgesIn
      .select(explode(array(
        struct(col("i").as("i"), col("j").as("j")),
        struct(col("j").as("i"), col("i").as("j")))).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"))
      .observe("sym_edges", count(lit(1)).as("n"))
    val ses = edgesIn.sparkSession
    // staged mode: the edge set becomes a parquet artifact (rename-swapped
    // so no reader can see a partial publish), the build lineage becomes
    // GC-able, and zero edge blocks pin the block manager
    val stagedFin: Option[org.apache.hadoop.fs.Path] = stageDir.map { dir =>
      // branch line to stderr — same round-15 forensics discipline as
      // CorpusCache.materialize: the probe log must say which edge-state
      // mode a closure actually ran
      System.err.println(s"[components] staged edges dir=$dir")
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(ses.sessionState.newHadoopConf())
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/.tmp-cc-edges-$nonce")
      val fin = new org.apache.hadoop.fs.Path(s"$dir/cc-edges-$nonce")
      // small row groups (the repo's 8 MB local-split discipline): the
      // default 128 MB block size hands every reader task a row-group-
      // sized decompression buffer — 32 concurrent readers of the 50M-name
      // closure's edge files OOMed a default 8 GB heap on exactly that
      // (round-15 measurement); a row group is also the unsplittable unit,
      // so small groups are what lets maxPartitionBytes spread the
      // per-pass edge scans across cores at all
      observed.write.mode("overwrite")
        .option("parquet.block.size", 8L * 1024 * 1024)
        .parquet(tmp.toString)
      require(fs.rename(tmp, fin), s"cc staged publish: rename $tmp -> $fin failed")
      fin
    }
    val edges = stagedFin match {
      case Some(fin) => ses.read.parquet(fin.toString)
      case None => observed.localCheckpoint()
    }
    try {
      // Round 13 (round-12 verdict #2): localCheckpoint blocks are PINNED —
      // the truncated lineage makes them unevictable — so iteration state
      // competes with execution memory for the whole closure. Two levers
      // keep the closure inside a bounded heap at any edge volume:
      //   1. the label tables of a LARGE closure (derived threshold below)
      //      checkpoint at DISK_ONLY: label state is read exactly twice per
      //      pass (neighbor join + pointer join), so streaming it from
      //      local disk costs one read per use while freeing the unified
      //      region for the joins themselves — at 20M names this moves the
      //      closure from a 24 GB requirement to the default 8 GB heap
      //      (SCALE.md round 13);
      //   2. the PREVIOUS pass's pinned blocks are unpersisted eagerly once
      //      the next table is materialized (they are unreachable — the
      //      loop re-binds `labels`), capping live label state at ~2 tables
      //      instead of O(iterations).
      // The threshold derives from the runtime, not a constant: disk-back
      // when the symmetrized edge count at ~[[EdgeStateBytes]]/row would
      // claim more than a quarter of the JVM max heap (the label table is
      // bounded by the edge endpoints, and ≥2 tables + join scratch are
      // live at once). The gate fixtures stay memory-resident; the decision
      // reads the observe metric the eager checkpoint just published. The
      // count() fallback fires in staged mode (the parquet write runs its
      // own QueryExecution, so the metric never lands on this one — it is
      // then a parquet-metadata row count, one cheap job) or if a future
      // Spark stops publishing metrics for checkpoint jobs.
      val symEdges = observed.queryExecution.observedMetrics.get("sym_edges")
        .map(_.getAs[Long]("n")).getOrElse(edges.count())
      val big = symEdges * EdgeStateBytes > Runtime.getRuntime.maxMemory() / 4
      val lvl = if (big) StorageLevel.DISK_ONLY else StorageLevel.MEMORY_AND_DISK
      if (big) log.info(s"connectedComponents: $symEdges sym-edges -> DISK_ONLY label state")
      var labels = edges.select(col("i").as("node")).distinct()
        .withColumn("label", col("node"))
        .localCheckpoint(true, lvl)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val nbrMin = edges
          .join(labels, edges("j") === labels("node"))
          .groupBy(edges("i").as("n2")).agg(min(col("label")).as("nbr_min"))
        val stepped = labels.join(nbrMin, labels("node") === col("n2"), "left")
          .select(col("node"), col("label").as("prev"),
            least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        val ptr = labels.select(col("node").as("pn"), col("label").as("plabel"))
        val next = stepped.join(ptr, stepped("label") === col("pn"), "left")
          .select(stepped("node"), stepped("prev"),
            least(stepped("label"), coalesce(col("plabel"), stepped("label"))).as("label"))
          .localCheckpoint(true, lvl)
        converged = next.filter(col("label") =!= col("prev")).isEmpty
        releaseCheckpoint(labels)
        labels = next.select(col("node"), col("label"))
        iter += 1
      }
      require(converged,
        s"connectedComponents: no fixpoint after $maxIter passes (diameter > 2^$maxIter?)")
      // Iteration count is the scale observable for this operator (passes grow
      // with log component-diameter, each pass is a full join over the edge
      // set) — surface it so a production run can alert on diameter growth.
      // INFO on the normal path; WARN is reserved for a fixpoint that nearly
      // exhausted the cap (a diameter anomaly worth operator attention).
      if (iter >= maxIter - 5)
        log.warn(s"connectedComponents: fixpoint after $iter passes (cap $maxIter)")
      else
        log.info(s"connectedComponents: fixpoint after $iter passes")
      labels
    } finally {
      // the returned labels are an eager checkpoint with no lineage into
      // the staged edges — reclaim the scratch even on a failed fixpoint
      stagedFin.foreach { fin =>
        fin.getFileSystem(ses.sessionState.newHadoopConf()).delete(fin, true)
      }
    }
  }

  /** Conservative bytes/row of pinned label-iteration state (two long-ish
    * key columns in Tungsten rows + block-manager overhead), used only to
    * pick a storage level — never to size an allocation.
    */
  private val EdgeStateBytes = 64L

  /** Unpersist the pinned blocks behind a localCheckpoint'd frame (the
    * checkpoint RDD is the plan's LogicalRDD leaf). Blocking = false: the
    * caller has already materialized its successor, so reclamation can
    * proceed asynchronously.
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
