package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate aggregates — the 100 TB replacements for exact operators
  * whose state doesn't fit: HyperLogLog++ for COUNT(DISTINCT) (constant
  * memory vs the expand-based exact path) and quantile sketches for
  * percentiles (single pass, mergeable).
  *
  * No DuckDB oracle: sketch results are implementation-defined, so the
  * driver records the weaker rows-only check. Accuracy vs the exact answers
  * is pinned by QueryInvariantSpec instead (≤5% HLL error, quantile within
  * rank tolerance).
  */
object Approx {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "approx_distinct_hll" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count(lit(1)).as("n_events"))
    }),

    "approx_percentiles" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("price_pcts"),
          count(lit(1)).as("n"))
    })
  )

  /** Intentionally empty: see scaladoc. */
  def oracleSql: Map[String, String] = Map.empty
}
