package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}

/** Incremental MERGE without Delta (ref: Incremental_load_template.sql:1-8 —
  * incremental_strategy='merge', unique_key=[order_id, product_id],
  * on_schema_change='sync_all_columns').
  *
  * Upsert = keep existing rows whose key is absent from the incoming batch
  * (left_anti), then append every incoming row; rewriting the output
  * idempotently gives dbt's merge semantics. `unionByName(allowMissing)` is
  * the sync_all_columns analog. At scale both sides shuffle once on the
  * unique key; the anti join carries only existing rows, never widens.
  */
object Merge {

  def upsert(existing: DataFrame, incoming: DataFrame, uniqueKey: Seq[String]): DataFrame =
    existing.join(incoming, uniqueKey, "left_anti")
      .unionByName(incoming, allowMissingColumns = true)

  /** dbt's "re-process the trailing window" pattern (template lines 13-15):
    * recompute rows with ts >= watermark and merge them over the target.
    */
  def incrementalWindow(target: DataFrame, source: DataFrame, uniqueKey: Seq[String],
                        tsCol: String, watermark: String): DataFrame =
    upsert(target, source.filter(col(tsCol) >= watermark), uniqueKey)

  /** VERSIONED CDC apply: merge a change batch into the target with
    * latest-version-wins per key — the Debezium/CDC-ingest semantics where
    * the winner is decided by the change's version (LSN, commit ts), NOT
    * by processing order. Order-independence is the point: micro-batches
    * may arrive split, coalesced, or replayed (at-least-once sources), and
    * any interleaving converges to the same table. One shuffle on the
    * unique key; requires (key, version) unique, which CDC logs guarantee.
    */
  def applyCdc(target: DataFrame, changes: DataFrame, uniqueKey: Seq[String],
               versionCol: String): DataFrame = {
    val w = Window.partitionBy(uniqueKey.map(col): _*)
      .orderBy(col(versionCol).desc)
    target.unionByName(changes, allowMissingColumns = true)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
