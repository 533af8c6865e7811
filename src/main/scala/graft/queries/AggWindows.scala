package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Aggregation and window/unnest operators (SURVEY.md §2.4–§2.5). */
object AggWindows {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // Output boundary: exact decimal math inside, DOUBLE out — see
  // Relational.asDouble for why (driver hash stringifies physical values).
  private def asDouble(c: Column): Column = c.cast(DoubleType)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: GROUP BY + CASE classification (ref: stg_customer.sql:3-14).
    "a1_group_case" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .withColumn("tier",
          when(col("n") >= 100, "HIGH").when(col("n") >= 50, "MID").otherwise("LOW"))
    }),

    // A2: COUNT(DISTINCT) per group + Unique/Multiple flag
    // (ref: stg_customer.sql:28-39, int_customer_email_qa.sql:12-18).
    "a2_count_distinct_flag" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .withColumn("cardinality",
          when(col("n_users") > 1, "Multiple").otherwise("Unique"))
    }),

    // A3: SELECT DISTINCT over a pair (ref: stg_customer.sql:41-47).
    "a3_distinct_pairs" -> ((s, dir) =>
      Tables.events(s, dir).select(col("user_id"), col("event_type")).distinct()),

    // A4: single-pass conditional-sum null profile + SAFE_DIVIDE rates
    // (ref: audit_null_rates_stg_order.sql:3-30). One scan, no joins.
    "a4_null_profile" -> ((s, dir) => {
      def nulls(c: String) = sum(when(col(c).isNull, 1).otherwise(0))
      Tables.events(s, dir).agg(
        count(lit(1)).as("total"),
        nulls("value").as("null_value"),
        nulls("props").as("null_props"),
        nulls("user_id").as("null_user"),
        sum(when(col("value") <= 0, 1).otherwise(0)).as("nonpos_value"))
        .withColumn("null_value_rate", round(try_divide(col("null_value"), col("total")), 6))
        .withColumn("nonpos_value_rate", round(try_divide(col("nonpos_value"), col("total")), 6))
    }),

    // A7: grouped accumulation with count + max merge
    // (ref: Source/step1_collect_product_urls.py:124-155).
    "a7_grouped_accumulate" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"), asDouble(max(dec(col("value")))).as("max_value"))
    }),

    // A8: arg-min selection by composite ranking key
    // (ref: Source/step1…:57-64,81-89): priority asc, value desc, id asc.
    "a8_argmin_ranking" -> ((s, dir) => {
      val priority = when(col("event_type") === "purchase", 1)
        .when(col("event_type") === "signup", 2).otherwise(3)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("priority").asc, dec(col("value")).desc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("priority", priority)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("best_event_id"), col("priority"))
    }),

    // Tumbling time-window aggregate in BATCH mode — the same window()
    // construct the streaming surface uses, oracle-checked here. Spark's
    // windows are epoch-aligned (1970-01-01 UTC), which the oracle mirrors
    // with integer-micros bucket arithmetic.
    "time_window_agg" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          asDouble(sum(col("value").cast(DecimalType(18, 2)))).as("sum_value"))
        .select(col("window.start").as("bucket_start"), col("event_type"),
          col("n"), col("sum_value"))
    }),

    // ROLLUP: hierarchical subtotals in one pass (grand total + per-flag +
    // per-(flag,status)) — Spark expands grouping sets map-side, one shuffle.
    "rollup_revenue" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec(col("l_extendedprice")))).as("total_ext"))
    }),

    // CUBE: all 2^k grouping combinations in one pass, with GROUPING flags
    // disambiguating real NULL keys from subtotal rows — the other half of
    // the grouping-sets family next to ROLLUP.
    "cube_revenue" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec(col("l_extendedprice")))).as("total_ext"),
          grouping(col("l_returnflag")).cast(IntegerType).as("g_flag"),
          grouping(col("l_linestatus")).cast(IntegerType).as("g_status"))
    }),

    // NTILE: quantile bucketing with a deterministic total order (value has
    // ties at 2 dp; event_id breaks them identically in both engines).
    "w6_ntile_quartiles" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(dec(col("value")).asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("quartile", ntile(4).over(w).cast(LongType)) // BIGINT like DuckDB's ntile
        .groupBy(col("event_type"), col("quartile"))
        .agg(count(lit(1)).as("n"), asDouble(max(dec(col("value")))).as("q_max"))
    }),

    // W7: fractional-rank windows — percent_rank ((rank-1)/(n-1)) and
    // cume_dist (rows ≤ current / n) over a deterministic total order.
    // Both engines compute the identical double from the same integer
    // operands, so no rounding is needed at the boundary.
    "w7_percent_windows" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(dec(col("value")).asc, col("event_id").asc)
      Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .filter(col("pct_rank") >= 0.99)
        .select(col("event_id"), col("event_type"), col("pct_rank"), col("cume"))
    }),

    // Pivot: long → wide with an explicit value list (explicit values keep
    // the output schema static — at scale an inferred pivot needs an extra
    // distinct pass and can explode the column count).
    "pivot_event_counts" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("value") > 150)            // sparse slice: empty cells exercise the NULL-to-0 fill
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        // fill ONLY the pivoted columns — a frame-wide fill would rewrite a
        // NULL user_id group key to 0 and diverge from the oracle's GROUP BY
        .na.fill(0L, Seq("view", "click", "purchase", "signup", "error"))
    }),

    // Unpivot: wide → long via stack (the inverse; also used internally by
    // the MinHash banding).
    // Ordered string aggregation (LISTAGG/string_agg): per-user event-type
    // trail in strict (ts, event_id) order. Determinism rule for ordered
    // aggs under a hash gate: the sort key must be a TOTAL order —
    // micro-truncated ts alone can tie, so event_id breaks every tie, and
    // the oracle sorts by the identical truncated key.
    "a9_listagg" -> ((s, dir) => {
      Tables.events(s, dir).filter(col("user_id").isNotNull)
        .groupBy("user_id")
        .agg(concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type"))).as("event_trail"),
          count(lit(1)).as("n_events"))
    }),

    "unpivot_event_counts" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("value") > 150)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("view", "click", "purchase", "signup", "error"))
        .selectExpr("user_id",
          "stack(5, 'view', view, 'click', click, 'purchase', purchase, " +
            "'signup', signup, 'error', error) AS (event_type, n)")
        .filter(col("n") > 0)
    }),

    // W2: ROW_NUMBER dedup keep-first (ref: mart_dim_location.sql:3-25).
    "w2_rownum_dedup" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id").asc)
      Tables.documents(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // W3: recency rank, top-2 per key (ref: customer_email_scd.sql:36-41).
    "w3_recency_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("user_id"), col("rn"), col("event_id"), col("event_type"))
    }),

    // W4: lateral UNNEST WITH OFFSET, outer semantics (ref: stg_order.sql:29-78):
    // a NULL array still yields one row with NULL pos/token — posexplode_outer
    // matches BigQuery's LEFT JOIN UNNEST ... WITH OFFSET.
    "w4_posexplode_offset" -> ((s, dir) => {
      val arr = when(col("doc_id") % 7 === 0, lit(null).cast(ArrayType(StringType)))
        .otherwise(split(col("text"), " "))
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .withColumn("arr", arr)
        .select(col("doc_id"), posexplode_outer(col("arr")).as(Seq("pos", "token")))
        .filter(col("pos") < 5 || col("pos").isNull)
    }),

    // W5: RANK-based dedup — ties all kept, unlike ROW_NUMBER
    // (ref: Incremental_load_template.sql:18-30).
    "w5_rank_ties" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("vi").desc)
      Tables.events(s, dir)
        .withColumn("vi", floor(col("value") / 100).cast(IntegerType))
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("event_id"), col("event_type"), col("vi"), col("rnk"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "a1_group_case" ->
      """SELECT user_id, n, CASE WHEN n >= 100 THEN 'HIGH' WHEN n >= 50 THEN 'MID'
        |  ELSE 'LOW' END AS tier
        |FROM (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)""".stripMargin,

    "a2_count_distinct_flag" ->
      """SELECT event_type, n_users,
        |  CASE WHEN n_users > 1 THEN 'Multiple' ELSE 'Unique' END AS cardinality
        |FROM (SELECT event_type, count(DISTINCT user_id) AS n_users
        |      FROM events GROUP BY event_type)""".stripMargin,

    "a3_distinct_pairs" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "a4_null_profile" ->
      """SELECT total, null_value, null_props, null_user, nonpos_value,
        |  round(null_value / total, 6) AS null_value_rate,
        |  round(nonpos_value / total, 6) AS nonpos_value_rate
        |FROM (SELECT count(*) AS total,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
        |  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user,
        |  CAST(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_value
        |FROM events)""".stripMargin,

    "a7_grouped_accumulate" ->
      """SELECT user_id, event_type, count(*) AS n,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
        |FROM events GROUP BY user_id, event_type""".stripMargin,

    "a8_argmin_ranking" ->
      """SELECT user_id, event_id AS best_event_id, priority
        |FROM (SELECT user_id, event_id, priority, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY priority ASC, CAST(value AS DECIMAL(18,2)) DESC, event_id ASC) AS rn
        |  FROM (SELECT *, CASE WHEN event_type = 'purchase' THEN 1
        |    WHEN event_type = 'signup' THEN 2 ELSE 3 END AS priority FROM events))
        |WHERE rn = 1""".stripMargin,

    "time_window_agg" ->
      """SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % CAST(21600000000 AS BIGINT)) AS bucket_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_ext
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "cube_revenue" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_ext,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "w6_ntile_quartiles" ->
      """SELECT event_type, quartile, count(*) AS n,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS q_max
        |FROM (SELECT event_type, value, ntile(4) OVER (
        |    PARTITION BY event_type
        |    ORDER BY CAST(value AS DECIMAL(18,2)) ASC, event_id ASC) AS quartile
        |  FROM events)
        |GROUP BY event_type, quartile""".stripMargin,

    "w7_percent_windows" ->
      """SELECT event_id, event_type, pct_rank, cume
        |FROM (SELECT event_id, event_type,
        |    percent_rank() OVER (PARTITION BY event_type
        |      ORDER BY CAST(value AS DECIMAL(18,2)) ASC, event_id ASC) AS pct_rank,
        |    cume_dist() OVER (PARTITION BY event_type
        |      ORDER BY CAST(value AS DECIMAL(18,2)) ASC, event_id ASC) AS cume
        |  FROM events WHERE value IS NOT NULL)
        |WHERE pct_rank >= 0.99""".stripMargin,

    "pivot_event_counts" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'view') AS view,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events WHERE value > 150 GROUP BY user_id""".stripMargin,

    "unpivot_event_counts" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events WHERE value > 150 GROUP BY user_id, event_type""".stripMargin,

    "a9_listagg" ->
      """SELECT user_id,
        |  string_agg(event_type, ','
        |    ORDER BY make_timestamp(epoch_us(ts)), event_id) AS event_trail,
        |  count(*) AS n_events
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY user_id""".stripMargin,

    "w2_rownum_dedup" ->
      """SELECT doc_id, lang, source
        |FROM (SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY doc_id ASC) AS rn
        |      FROM documents) WHERE rn = 1""".stripMargin,

    "w3_recency_rank" ->
      """SELECT user_id, rn, event_id, event_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn <= 2""".stripMargin,

    "w4_posexplode_offset" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE string_split(text, ' ') END AS arr
        |  FROM documents WHERE doc_id < 100),
        |padded AS (
        |  SELECT doc_id, arr,
        |    CASE WHEN arr IS NULL THEN [NULL] ELSE arr END AS parr
        |  FROM base),
        |exploded AS (
        |  SELECT doc_id, arr,
        |    unnest(parr) AS tok,
        |    generate_subscripts(parr, 1) AS gs
        |  FROM padded)
        |SELECT doc_id,
        |  CASE WHEN arr IS NULL THEN NULL ELSE gs - 1 END AS pos,
        |  CASE WHEN arr IS NULL THEN NULL ELSE tok END AS token
        |FROM exploded
        |WHERE (gs - 1 < 5) OR arr IS NULL""".stripMargin,

    "w5_rank_ties" ->
      """SELECT event_id, event_type, vi, rnk
        |FROM (SELECT event_id, event_type, vi, rank() OVER (
        |    PARTITION BY event_type ORDER BY vi DESC) AS rnk
        |  FROM (SELECT *, CAST(floor(value / 100) AS INTEGER) AS vi FROM events))
        |WHERE rnk <= 3""".stripMargin
  )
}
