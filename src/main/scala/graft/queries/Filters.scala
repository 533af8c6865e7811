package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Projection / filter / predicate operators (SURVEY.md §2.2) plus scans,
  * sorts and set ops (§2.1, §2.7). Each query has an exact DuckDB oracle.
  */
object Filters {

  private val fakeNulls = Seq("null", "n/a", "na", "none", "undefined")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3: whole-table scan (the keyset-paginated export collapses to one
    // distributed read; ref: ETL/export_to_gcs.py:327-386).
    "s3_full_scan" -> ((s, dir) => Tables.events(s, dir)),

    // S7: JSON-in-string → typed re-ingest (ref: ETL/INSERT INTO….sql:1-148).
    "s7_typed_json" -> ((s, dir) => {
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables.events(s, dir)
        .withColumn("j", from_json(col("props"), schema))
        .select(col("event_id"), col("j.k").as("k"))
    }),

    // S13: corrupt-tolerant ingest — PERMISSIVE mode with a corrupt-record
    // column, the production posture for dirty JSON feeds: malformed rows
    // land in `_corrupt_record` with typed fields null, instead of aborting
    // the job (FAILFAST) or silently vanishing (DROPMALFORMED). Corruption
    // is planted deterministically (every 7th payload truncated mid-object)
    // so the gate proves the parser classifies EXACTLY the malformed rows —
    // a parser that tolerated the truncation or choked on a valid row
    // hash-fails.
    "s13_corrupt_json" -> ((s, dir) => {
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("_corrupt_record", StringType)))
      Tables.events(s, dir)
        .withColumn("js",
          when(col("event_id") % 7 === 0, concat(substring(col("props"), 1, 6), lit("{")))
            .otherwise(col("props")))
        .withColumn("j", from_json(col("js"), schema,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")))
        .select(col("event_id"), col("j.k").as("k"),
          col("j._corrupt_record").isNotNull.as("is_corrupt"))
    }),

    // F1: event-type filter at scan (ref: stg_order.sql:26).
    "f1_event_type_filter" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
    }),

    // F2: null/blank/sentinel filtering (ref: stg_product.sql:58-60).
    "f2_null_blank_filter" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "" &&
          !lower(trim(col("lang"))).isin(fakeNulls: _*) && col("n_chars") > 0)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // F3: fake-null classification (ref: stg_customer.sql:6-11). The dirty
    // column is synthesized deterministically from event_id so the oracle can
    // rebuild it; the classifier is the reference's CASE chain verbatim.
    "f3_fake_null_class" -> ((s, dir) => {
      val dirty = when(col("event_id") % 7 === 0, lit(null).cast(StringType))
        .when(col("event_id") % 7 === 1, lit(""))
        .when(col("event_id") % 7 === 2, lit("  "))
        .when(col("event_id") % 7 === 3, lit("null"))
        .when(col("event_id") % 7 === 4, lit("N/A"))
        .when(col("event_id") % 7 === 5, lit("none"))
        .otherwise(col("props"))
      val cls = when(col("dirty").isNull, "NULL")
        .when(trim(col("dirty")) === "", "EMPTY")
        .when(lower(trim(col("dirty"))).isin(fakeNulls: _*), "FAKE_NULL")
        .otherwise("VALID")
      Tables.events(s, dir)
        .withColumn("dirty", dirty)
        .withColumn("status", cls)
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
    }),

    // F4: wide rename/cast projection (ref: stg_order.sql:6-24). floor before
    // the int cast: Spark truncates double→int, DuckDB rounds — floor is the
    // portable spelling of the reference's SAFE_CAST semantics.
    "f4_cast_projection" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(
        col("l_orderkey").cast(StringType).as("order_id"),
        col("l_linenumber").cast(LongType).as("line_no"),
        floor(col("l_quantity")).cast(IntegerType).as("qty_int"),
        col("l_shipdate").cast(DateType).as("ship_date"),
        col("l_returnflag").as("return_flag"))
    }),

    // F5: URL normalization predicate (ref: Source/step1_collect_product_urls.py:34-47):
    // strip view-source:, repair ttps://, require an http(s) scheme else null.
    "f5_url_normalize" -> ((s, dir) => {
      val raw = when(col("doc_id") % 4 === 0,
          concat(lit("view-source:https://"), col("source"), lit(".example.com/p/"), col("doc_id")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("ttps://"), col("source"), lit(".example.com/p/"), col("doc_id")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("ftp://"), col("source"), lit(".example.com/p/"), col("doc_id")))
        .otherwise(concat(lit("https://"), col("source"), lit(".example.com/p/"), col("doc_id")))
      val stripped = regexp_replace(col("raw_url"), "^view-source:", "")
      val repaired = when(stripped.startsWith("ttps://"), concat(lit("h"), stripped)).otherwise(stripped)
      Tables.documents(s, dir)
        .withColumn("raw_url", raw)
        .withColumn("fixed", repaired)
        .withColumn("url_norm",
          when(col("fixed").startsWith("http://") || col("fixed").startsWith("https://"), col("fixed")))
        .select(col("doc_id"), col("url_norm"))
    }),

    // F6: coalescing field extraction (ref: Source/step1…:50-54, stg_product.sql:13-18).
    "f6_coalesce_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("pid", coalesce(
          get_json_object(col("props"), "$.product_id"),
          get_json_object(col("props"), "$.k"),
          lit("unknown")))
        .groupBy(col("pid")).agg(count(lit(1)).as("n"))
    }),

    // O1: global ORDER BY + LIMIT top-k (ref: stg_customer.sql:56). user_id
    // tie-break keeps the limit deterministic. TakeOrderedAndProject — no
    // global sort materialization at scale.
    "o1_topk_sort" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id").asc)
        .limit(20)
    }),

    // O4: UNION ALL (ref: models/example/my_first_dbt_model.sql:12-16).
    "o4_union_all" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), lit("purchase_branch").as("src"))
        .unionAll(ev.filter(col("event_type") === "signup")
          .select(col("event_id"), lit("signup_branch").as("src")))
    }),

    // X14: SELECT * EXCEPT(col) (ref: mart_fact_order.sql:210,219).
    "x14_drop_except" -> ((s, dir) =>
      Tables.orders(s, dir).drop("o_orderpriority")),

    // O5: INTERSECT / EXCEPT set semantics (distinct on both sides) — the
    // cohort algebra (viewed-and-bought vs viewed-never-bought). Both
    // compile to aggregate + join, no row-by-row comparison.
    "o5_set_ops" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val viewers = ev.filter(col("event_type") === "view" && col("user_id").isNotNull)
        .select(col("user_id"))
      val buyers = ev.filter(col("event_type") === "purchase" && col("user_id").isNotNull)
        .select(col("user_id"))
      viewers.intersect(buyers).withColumn("set_op", lit("viewed_and_bought"))
        .unionByName(viewers.except(buyers).withColumn("set_op", lit("viewed_never_bought")))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "s3_full_scan" -> "SELECT * FROM events",

    "s7_typed_json" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",

    // the planted truncation is the ONLY corruption, so classification must
    // equal the plant predicate and typed fields must null out exactly there
    "s13_corrupt_json" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 7 = 0 THEN NULL
        |       ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k,
        |  event_id % 7 = 0 AS is_corrupt
        |FROM events""".stripMargin,

    "f1_event_type_filter" ->
      "SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'",

    "f2_null_blank_filter" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE text IS NOT NULL AND trim(text) <> ''
        |  AND lower(trim(lang)) NOT IN ('null','n/a','na','none','undefined')
        |  AND n_chars > 0""".stripMargin,

    "f3_fake_null_class" ->
      """WITH d AS (
        |  SELECT CASE
        |    WHEN event_id % 7 = 0 THEN NULL
        |    WHEN event_id % 7 = 1 THEN ''
        |    WHEN event_id % 7 = 2 THEN '  '
        |    WHEN event_id % 7 = 3 THEN 'null'
        |    WHEN event_id % 7 = 4 THEN 'N/A'
        |    WHEN event_id % 7 = 5 THEN 'none'
        |    ELSE props END AS dirty
        |  FROM events)
        |SELECT CASE
        |    WHEN dirty IS NULL THEN 'NULL'
        |    WHEN trim(dirty) = '' THEN 'EMPTY'
        |    WHEN lower(trim(dirty)) IN ('null','n/a','na','none','undefined') THEN 'FAKE_NULL'
        |    ELSE 'VALID' END AS status,
        |  count(*) AS n
        |FROM d GROUP BY 1""".stripMargin,

    "f4_cast_projection" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS order_id,
        |  CAST(l_linenumber AS BIGINT) AS line_no,
        |  CAST(floor(l_quantity) AS INTEGER) AS qty_int,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  l_returnflag AS return_flag
        |FROM lineitem""".stripMargin,

    "f5_url_normalize" ->
      """WITH r AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 4 = 0 THEN concat('view-source:https://', source, '.example.com/p/', doc_id)
        |    WHEN doc_id % 4 = 1 THEN concat('ttps://', source, '.example.com/p/', doc_id)
        |    WHEN doc_id % 4 = 2 THEN concat('ftp://', source, '.example.com/p/', doc_id)
        |    ELSE concat('https://', source, '.example.com/p/', doc_id) END AS raw_url
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CASE WHEN starts_with(regexp_replace(raw_url, '^view-source:', ''), 'ttps://')
        |         THEN concat('h', regexp_replace(raw_url, '^view-source:', ''))
        |         ELSE regexp_replace(raw_url, '^view-source:', '') END AS fixed
        |  FROM r)
        |SELECT doc_id,
        |  CASE WHEN starts_with(fixed, 'http://') OR starts_with(fixed, 'https://')
        |       THEN fixed ELSE NULL END AS url_norm
        |FROM f""".stripMargin,

    "f6_coalesce_extract" ->
      """SELECT coalesce(json_extract_string(props, '$.product_id'),
        |                json_extract_string(props, '$.k'), 'unknown') AS pid,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "o1_topk_sort" ->
      """SELECT user_id, count(*) AS n FROM events GROUP BY user_id
        |ORDER BY n DESC, user_id ASC LIMIT 20""".stripMargin,

    "o4_union_all" ->
      """SELECT event_id, 'purchase_branch' AS src FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, 'signup_branch' AS src FROM events WHERE event_type = 'signup'""".stripMargin,

    "x14_drop_except" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders""".stripMargin,

    "o5_set_ops" ->
      """WITH viewers AS (
        |  SELECT user_id FROM events
        |  WHERE event_type = 'view' AND user_id IS NOT NULL),
        |buyers AS (
        |  SELECT user_id FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL)
        |SELECT user_id, 'viewed_and_bought' AS set_op
        |FROM (SELECT user_id FROM viewers INTERSECT SELECT user_id FROM buyers)
        |UNION ALL
        |SELECT user_id, 'viewed_never_bought' AS set_op
        |FROM (SELECT user_id FROM viewers EXCEPT SELECT user_id FROM buyers)""".stripMargin
  )
}
