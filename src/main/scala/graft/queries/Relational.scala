package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Core relational operators from SURVEY.md §2.1–§2.4, expressed over the
  * driver's testdata tables with DuckDB-oracle parity.
  *
  * Numeric discipline: monetary doubles are cast to DecimalType before any
  * SUM so aggregation is exact and order-independent — a double sum's low
  * bits depend on partial-aggregation order and would never hash-match the
  * oracle (and would be nondeterministic across cluster topologies).
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Output-boundary discipline: aggregation runs in exact decimal, but the
    * FINAL column is cast to DOUBLE. The driver's hasher stringifies cells;
    * a parquet decimal renders with its full scale ('61976731.30') while the
    * DuckDB result set surfaces as float64 ('61976731.3') — value-identical,
    * hash-different. One physical type on both sides ends that class of
    * mismatch; the oracle SQL applies the same CAST(... AS DOUBLE).
    */
  private def asDouble(c: Column): Column = c.cast(DoubleType)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship star-join slice (SURVEY §7.2 step 2: "line-item revenue in
    // USD by country and month" re-expressed over the testdata star schema):
    // fact ⋈ orders on the shuffle key, then three broadcast dim hops and a
    // currency-style conversion before an exact decimal rollup. Only the
    // lineitem⋈orders join shuffles; every dim is broadcast.
    "q0_flagship_star" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      // rate derives from the REGION (5 of them), not the key VALUE:
      // % 5 pins the domain so surrogate/shifted keys (hash keys in
      // production, id-shifted copies in the scale fixtures) can't
      // overflow the DECIMAL(3,1) — identity on the 0-4 reference keys
      val rate = (lit(1.0).cast(DecimalType(3, 1)) +
        (col("r_regionkey") % 5).cast(DecimalType(3, 1)) * lit(0.1).cast(DecimalType(3, 1)))
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      joined
        .withColumn("rate", rate)
        .groupBy(col("r_name"), year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(
          count(lit(1)).as("n_lines"),
          asDouble(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * col("rate")), 2))
            .as("revenue_usd"))
    }),

    // A-family: hash aggregate with exact decimal sums (ref: stg_customer.sql:3-14,
    // audit_null_rates; classic pricing-summary shape). Partial (map-side)
    // aggregation is automatic for sum/count — no shuffle of raw rows.
    "q1_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
          asDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          asDouble(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // SQL API surface: the same engine drives spark.sql over registered
    // views — one Catalyst plan whether declared via DataFrame or SQL text.
    "sql_api_surface" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("v_orders")
      Tables.customer(s, dir).createOrReplaceTempView("v_customer")
      s.sql(
        """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
          |FROM v_orders JOIN v_customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment, o_orderstatus""".stripMargin)
    }),

    // S1: filtered scan + narrow projection (ref: Source/step1_collect_product_urls.py:106-122).
    // Filter + projection both push down to the parquet scan.
    "s1_filtered_scan" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click") && col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    }),

    // S2: spillable distinct over one column (ref: connection_to_mongodb.py:68-84).
    // Spark hash-aggregate spills automatically (allowDiskUse equivalent).
    "s2_distinct_scan" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id")).distinct()
    }),

    // J2: inner equi-join + group (ref: stg_customer.sql:16-26). customer is the
    // small side → Catalyst broadcasts it (no shuffle of orders).
    "j2_join_inner" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
             asDouble(sum(dec(col("o_totalprice")))).as("total_price"))
    }),

    // J1: left outer broadcast join, dim side tiny (ref: stg_order.sql:80-85).
    "j1_join_left_broadcast" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "left")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
             asDouble(sum(dec(col("l_extendedprice")))).as("total_ext"))
    }),

    // W1: ROW_NUMBER latest-per-key, rn=1 (ref: mart_dim_customer.sql:24-40).
    // event_id desc tie-break keeps the result deterministic.
    "w1_latest_per_key" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
                col("ts").as("last_ts"), col("event_type").as("last_event_type"))
    }),

    // X11: JSON-in-string extraction + agg (ref: INSERT INTO….sql:38-53,
    // stg_product.sql:5-35). from_json with an explicit schema, not
    // get_json_object: one Jackson parse per row into a typed struct that
    // Catalyst can prune, instead of a per-path string scan.
    "x11_json_extract" -> ((s, dir) => {
      val propsSchema = StructType(Seq(StructField("k", LongType)))
      Tables.events(s, dir)
        .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"))
    }),

    // A6: scalar MAX subquery as filter (ref: mart_fact_order.sql:142). The
    // 1-row aggregate broadcast-joins against the fact — build side reduced
    // before the join exactly like the reference's fx_latest CTE.
    "a6_scalar_max" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val mx = li.agg(max(col("l_shipdate")).as("mx"))
      li.join(broadcast(mx), col("l_shipdate") === col("mx"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q0_flagship_star" ->
      """SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  count(*) AS n_lines,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |      * (CAST(1.0 AS DECIMAL(3,1)) + CAST(r_regionkey % 5 AS DECIMAL(3,1)) * CAST(0.1 AS DECIMAL(3,1)))), 2) AS DOUBLE)
        |    AS revenue_usd
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, year(o_orderdate), month(o_orderdate)""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "sql_api_surface" ->
      """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderstatus""".stripMargin,

    "s1_filtered_scan" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type IN ('view','click') AND value IS NOT NULL""".stripMargin,

    "s2_distinct_scan" ->
      "SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL",

    "j2_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "j1_join_left_broadcast" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_ext
        |FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,

    "w1_latest_per_key" ->
      """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
        |  event_type AS last_event_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,

    "x11_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "a6_scalar_max" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate = (SELECT max(l_shipdate) FROM lineitem)""".stripMargin
  )
}
