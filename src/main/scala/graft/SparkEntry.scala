package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from SURVEY.md §2
  * (plus the large-scale pipeline extensions); `oracleSql` carries the
  * DuckDB-equivalent SQL for every hash-checkable query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q0_flagship_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Filters.queries ++
      graft.queries.Joins.queries ++
      graft.queries.AggWindows.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.VectorOps.queries ++
      graft.queries.VectorOps.ivfQueries ++
      graft.queries.GlamiraShaped.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.TypedOps.queries ++
      graft.queries.Approx.queries ++
      graft.queries.SinkRoundTrip.queries ++
      graft.queries.StreamGate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.Filters.oracleSql ++
      graft.queries.Joins.oracleSql ++
      graft.queries.AggWindows.oracleSql ++
      graft.queries.Scalars.oracleSql ++
      graft.queries.Pipeline.oracleSql ++
      graft.queries.TextOps.oracleSql ++
      graft.queries.VectorOps.oracleSql ++
      graft.queries.VectorOps.ivfOracleSql ++
      graft.queries.GlamiraShaped.oracleSql ++
      graft.queries.Curation.oracleSql ++
      graft.queries.Analytics.oracleSql ++
      graft.queries.TypedOps.oracleSql ++
      graft.queries.Approx.oracleSql ++
      graft.queries.SinkRoundTrip.oracleSql ++
      graft.queries.StreamGate.oracleSql
}
