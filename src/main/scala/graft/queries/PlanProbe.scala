package graft.queries

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, DynamicPruning}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.ShuffledJoin

/** Typed physical-plan probes for the optimizer gates (`j17_skew_join_aqe`,
  * `j18_dynamic_partition_pruning`, `s18_runtime_bloom_join`).
  *
  * The gates fold "did the mechanism fire?" into hash-gated results, so the
  * detection itself must be robust: substring-matching `plan.toString` for
  * markers like `isSkewJoin=true` or `dynamicpruning` silently flips a gate
  * FALSE if a minor Spark version renames the marker. These probes collect
  * the TYPED plan nodes instead (the s16 discipline —
  * `collect { case e: ShuffleExchangeExec => e }`): a rename cannot change
  * a node's class or its `isSkewJoin`/`partitionFilters` accessors without
  * a compile error here.
  */
object PlanProbe {

  /** Every node of the physical plan, descending through AQE wrappers:
    * `AdaptiveSparkPlanExec` re-roots its current plan and materialized
    * `QueryStageExec`s embed their stage bodies outside the child list, so
    * a plain `collect` on the outer tree never sees post-execution
    * re-plans (where the skew split lives).
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case q: QueryStageExec        => q +: allNodes(q.plan)
      case other                    => Seq(other)
    }

  /** True iff some shuffled join in the (post-execution, AQE-final) plan
    * was split by the skew optimizer — `ShuffledJoin.isSkewJoin` covers
    * both the sort-merge and shuffled-hash shapes AQE can pick.
    */
  def skewJoinFired(p: SparkPlan): Boolean =
    allNodes(p).exists {
      case j: ShuffledJoin => j.isSkewJoin
      case _               => false
    }

  /** True iff some file scan carries a runtime `DynamicPruning` predicate
    * in its PARTITION filters — the injected dim-subquery prune that keeps
    * a 100 TB date-partitioned fact from reading non-matching directories.
    */
  def dppFired(p: SparkPlan): Boolean =
    allNodes(p).exists {
      case f: FileSourceScanExec =>
        f.partitionFilters.exists(_.exists(_.isInstanceOf[DynamicPruning]))
      case _ => false
    }

  /** True iff the optimized logical plan carries an injected
    * `BloomFilterMightContain` (Spark's InjectRuntimeFilter) — the runtime
    * bloom prune on the big side of a selective shuffle join.
    */
  def bloomFilterInjected(optimized: LogicalPlan): Boolean =
    optimized.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])))
}
