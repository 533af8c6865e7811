package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    */
  def connectedComponents(edgesIn: DataFrame, maxIter: Int = 50): DataFrame = {
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
    val edges = edgesIn
      .select(explode(array(
        struct(col("i").as("i"), col("j").as("j")),
        struct(col("j").as("i"), col("i").as("j")))).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"))
      .localCheckpoint()
    var labels = edges.select(col("i").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
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
        .localCheckpoint()
      converged = next.filter(col("label") =!= col("prev")).isEmpty
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
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
