package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Keys
import graft.operators.{Assertions, Merge, Scd2}

/** Pipeline-semantics operators (SURVEY.md §2.9 + §5): SCD2 snapshot,
  * incremental merge, dbt-test assertions, QA rule rollups, seed CSV source.
  */
object Pipeline {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Deterministic FX seed (shape of seeds/fx_to_usd_22_01_26.csv +
    * dbt_project.yml:49-58 column_types). Written to a temp CSV so the
    * Spark side genuinely exercises the typed CSV source (S9).
    */
  private val fxRows: Seq[(String, String, String, Double)] = Seq(
    ("2026-01-21", "USD", "USD", 1.0),
    ("2026-01-21", "USD", "EUR", 0.861),
    ("2026-01-22", "USD", "USD", 1.0),
    ("2026-01-22", "USD", "EUR", 0.854605),
    ("2026-01-22", "USD", "GBP", 0.73585),
    ("2026-01-22", "USD", "JPY", 113.9095),
    ("2026-01-22", "USD", "CNY", 6.34727),
    ("2026-01-22", "USD", "AUD", 1.38744),
    ("2026-01-22", "USD", "CAD", 1.25935),
    ("2026-01-22", "USD", "SEK", 9.14995))

  /** Written once per JVM to a unique temp path — a fixed shared name would
    * race between concurrent driver processes on one host. (local-mode
    * fixture: on a real cluster the seed would live on shared storage.)
    */
  private lazy val seedCsvPath: String = {
    val p = java.nio.file.Files.createTempFile("graft_seed_fx", ".csv")
    val body = "fx_date,base_code,currency_code,usd_to_ccy\n" +
      fxRows.map { case (d, b, c, r) => s"$d,$b,$c,$r" }.mkString("\n")
    java.nio.file.Files.writeString(p, body)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def writeSeedCsv(): String = seedCsvPath

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S9: seed CSV with explicit typed schema (ref: seeds/fx_to_usd_22_01_26.csv,
    // dbt_project.yml:49-58).
    "s9_seed_csv" -> ((s, dir) => {
      val path = writeSeedCsv()
      val schema = StructType(Seq(
        StructField("fx_date", DateType),
        StructField("base_code", StringType),
        StructField("currency_code", StringType),
        StructField("usd_to_ccy", DoubleType)))
      s.read.option("header", "true").schema(schema).csv(path)
        .filter(col("fx_date") === lit(java.sql.Date.valueOf("2026-01-22")))
    }),

    // U3a: dbt timestamp-strategy snapshot, first-run semantics (ref:
    // customer_email_scd.sql:5-12 — per-event unique_key means every row
    // opens its own version).
    "u3_scd2_firstrun" -> ((s, dir) => {
      val inc = Tables.events(s, dir)
        .filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
          unix_micros(col("ts")).as("ts_us"))
      Scd2.firstRun(inc, Seq("user_id", "event_id", "ts_us"), "ts")
        .select(col("event_id"), col("user_id"), col("dbt_scd_id"),
          col("dbt_valid_from"), col("dbt_valid_to"))
    }),

    // U3b: per-entity SCD2 state history via LEAD — the classic SCD2 shape
    // the reference approximates (mart_dim_customer latest-email resolution).
    "u3_scd2_history" -> ((s, dir) => {
      Scd2.entityHistory(Tables.events(s, dir),
          key = Seq("user_id"), stateCol = "event_type",
          ts = "ts", tieBreak = "event_id")
        .filter(col("user_id") < 30)
    }),

    // U4: incremental MERGE with a re-processed trailing window (ref:
    // Incremental_load_template.sql:1-15): target = loads before the 20th,
    // source batch re-processes everything from the 18th (2-day overlap).
    "u4_incremental_merge" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("event_type"), col("ts"))
      val target = ev.filter(col("ts") < lit("2024-01-20 00:00:00").cast(TimestampType))
      val batch = ev.withColumn("event_type", upper(col("event_type"))) // re-processed rows differ
      Merge.incrementalWindow(target, batch, Seq("event_id"), "ts", "2024-01-18 00:00:00")
    }),

    // U5: dbt schema tests as violation queries (ref: models/staging/schema.yml).
    // Deliberately duplicated key (user_id, event_type, floor(value/100)) so
    // the unique test has real violations to report.
    "u5_dbt_tests" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("bucket", floor(col("value") / 100).cast(IntegerType))
      val dup = Assertions.unique(ev, Seq("user_id", "event_type", "bucket"))
        .agg(count(lit(1)).as("n_violating_keys"), sum(col("n_dup")).as("n_violating_rows"))
      val nn = Assertions.notNull(ev, "props").agg(count(lit(1)).as("n_null_props"))
      val av = Assertions.acceptedValues(ev, "event_type",
          Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)).as("n_bad_event_type"))
      dup.crossJoin(nn).crossJoin(av)
    }),

    // CDC-style snapshot diff: classify rows between two table versions as
    // INSERT / DELETE / UPDATE via full-outer join on the key — the change
    // feed a downstream incremental consumer needs when the source has no
    // change log. One shuffle on the key; UNCHANGED rows are dropped before
    // any further movement.
    "cdc_snapshot_diff" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("event_type"), col("ts"))
      val old = ev.filter(col("ts") < lit("2024-01-20 00:00:00").cast(TimestampType))
      val neu = ev
        .filter(col("ts") < lit("2024-01-25 00:00:00").cast(TimestampType))  // inserts: 20th-25th
        .filter(col("event_id") % 13 =!= 0)                                   // deletes
        .withColumn("event_type",
          when(col("ts") >= lit("2024-01-18 00:00:00").cast(TimestampType),
            upper(col("event_type"))).otherwise(col("event_type")))           // updates: 18th-20th
      val o = old.select(col("event_id"), col("event_type").as("old_type"))
      val n = neu.select(col("event_id"), col("event_type").as("new_type"))
      o.join(n, Seq("event_id"), "full_outer")
        .withColumn("change_type",
          when(col("old_type").isNull, "INSERT")
            .when(col("new_type").isNull, "DELETE")
            .when(col("old_type") =!= col("new_type"), "UPDATE")
            .otherwise("UNCHANGED"))
        .filter(col("change_type") =!= "UNCHANGED")
        .select(col("event_id"), col("change_type"), col("old_type"), col("new_type"))
    }),

    // Sessionization (training-pipeline/event-analytics op): inactivity-gap
    // sessions via lag + running sum; the streaming twin with custom state
    // lives in graft.streaming.Sessionize (parity-tested). Gap compare in
    // exact micros — floor-of-seconds differs between engines at boundaries.
    "sess_sessionize" -> ((s, dir) => {
      graft.streaming.Sessionize.sessionizeBatch(
        Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id")), 30)
    }),

    // The NATIVE session_window aggregate (the engine's own gap-session
    // operator, usable in batch AND streaming) under the gate: sessions
    // merge while each event falls strictly inside the previous window end
    // (ts < prev_ts + gap), so the oracle's break condition is >= gap. The
    // window end is last-event-ts + gap by definition — both spelled
    // identically on micro-truncated timestamps.
    "sess_session_window" -> ((s, dir) => {
      Tables.events(s, dir).filter(col("user_id").isNotNull)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event_id"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("first_event_id"))
    }),

    // Skew tooling under the gate: two-phase salted aggregation on a
    // deliberately hot key (~70% of rows on one value) must equal the plain
    // GROUP BY the oracle runs. Sums accumulate in exact DECIMAL and cross
    // the output boundary as DOUBLE (double-order nondeterminism + the
    // driver's stringify-hash both forbid anything else).
    "skew_salted_agg" -> ((s, dir) => {
      val hot = Tables.events(s, dir)
        .withColumn("k",
          when(col("event_id") % 10 < 7, lit("hot")).otherwise(col("event_type")))
        .withColumn("v", dec(col("value")))
      graft.operators.Skew.saltedCountSum(hot, Seq("k"), "v", salts = 16)
        .select(col("k"), col("n"), col("sum_v").cast(DoubleType).as("sum_value"))
    }),

    // QA: validity-flag engine — email regex, IPv4 format, private/placeholder
    // IP exclusion, AND-rollup (ref: int_order_qa.sql:19-95,
    // int_customer_email_qa.sql:20-30). Email/ip synthesized deterministically
    // so every rule has passing and failing rows.
    "qa_validity_flags" -> ((s, dir) => {
      val email = when(col("user_id") % 7 === 0, concat(lit("u"), col("user_id"), lit("example.com")))
        .when(col("user_id") % 7 === 1, lit(""))
        .otherwise(concat(lit("u"), col("user_id"), lit("@example."),
          when(col("user_id") % 2 === 0, "com").otherwise("co.uk")))
      val ip = concat_ws(".",
        when(col("event_id") % 5 === 0, lit("10"))
          .when(col("event_id") % 5 === 1, lit("192"))
          .when(col("event_id") % 5 === 2, lit("8"))
          .when(col("event_id") % 5 === 3, lit("172"))
          .otherwise(lit("256")),                                   // invalid octet branch
        when(col("event_id") % 5 === 1, lit("168"))
          .when(col("event_id") % 5 === 3, lit("20"))
          .otherwise((col("event_id") % 200).cast(StringType)),
        (col("user_id") % 256).cast(StringType),
        (col("event_id") % 256).cast(StringType))
      Tables.events(s, dir)
        .withColumn("email", email).withColumn("ip", ip)
        .withColumn("email_ok",
          col("email").rlike("^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"))
        .withColumn("ip_ok",
          col("ip").rlike("^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$"))
        .withColumn("is_private_ip",
          col("ip").startsWith("10.") || col("ip").startsWith("192.168.") ||
            col("ip").startsWith("127.") || col("ip").rlike("^172\\.(1[6-9]|2[0-9]|3[01])\\."))
        .withColumn("is_row_valid", col("email_ok") && col("ip_ok") && !col("is_private_ip"))
        .groupBy(col("email_ok"), col("ip_ok"), col("is_private_ip"), col("is_row_valid"))
        .agg(count(lit(1)).as("n"))
    }),

    // QA: row-level rule engine with AND-rollup (ref: int_order_qa.sql:19-95).
    // Single-pass in-flight QA metrics via Spark's Observation API: the
    // profile rides along the SAME action that materializes the data (here
    // a noop-sink write of the filtered projection), so at 100 TB the
    // quality numbers cost ZERO extra scans — the production alternative to
    // a separate profiling job. The observed aggregates surface as a 1-row
    // result the oracle recomputes declaratively.
    "qa_observe_metrics" -> ((s, dir) => {
      val obs = org.apache.spark.sql.Observation()
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .observe(obs,
          count(lit(1)).as("n_rows"),
          sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_null_user"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
          sum(col("value").cast(DecimalType(18, 2))).as("sum_value"))
        .write.format("noop").mode("overwrite").save()
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
          m("n_null_user").asInstanceOf[Long],
          m("n_purchases").asInstanceOf[Long],
          m("sum_value").asInstanceOf[java.math.BigDecimal].doubleValue()))
        .toDF("n_rows", "n_null_user", "n_purchases", "sum_value")
    }),

    // QA: distribution-drift monitor (Population Stability Index) between
    // two snapshots of the value column — the retrain/alert trigger every
    // production feature pipeline computes between yesterday's and today's
    // data. Snapshot A = even event ids; snapshot B = odd ids with a
    // PLANTED heavy-tail shift (20% of B's rows scaled ×10 — the values
    // distribution is right-skewed, so a mild multiplier barely moves bin
    // mass) so the gate proves the monitor FIRES, not just runs. Ten
    // fixed-width bins over broadcast corpus bounds; out-of-range mass
    // lands in the clamp bin (least(…, 9)) exactly as production PSI
    // handles never-seen-before values; PSI = Σ (p_a − p_b)·ln(p_a/p_b)
    // with add-one count smoothing (no empty-bin infinities); per-bin
    // terms DECIMAL-cast before the 10-way sum. Scale shape: two shuffles
    // of bin-cardinality (10 rows) after map-side partial counts — the
    // corpus is scanned once per side and never reshuffled.
    "qa_drift_psi" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
      val a = ev.filter(col("event_id") % 2 === 0).select(col("value"))
      val b = ev.filter(col("event_id") % 2 =!= 0)
        .select(when(col("event_id") % 10 === 1, col("value") * lit(10.0d))
          .otherwise(col("value")).as("value"))
      val bounds = ev.agg(min(col("value")).as("mn"),
        (max(col("value")) * lit(1.5d)).as("mx"))
      def binCounts(df: DataFrame, tag: String): DataFrame =
        df.crossJoin(broadcast(bounds))
          .withColumn("bin", least(floor((col("value") - col("mn")) /
            (col("mx") - col("mn")) * 10.0d), lit(9.0d)).cast(IntegerType))
          .groupBy(col("bin")).agg(count(lit(1)).as(s"c_$tag"))
      val bins = binCounts(a, "a").join(binCounts(b, "b"), Seq("bin"), "full")
        .select(col("bin"), coalesce(col("c_a"), lit(0L)).as("ca"),
          coalesce(col("c_b"), lit(0L)).as("cb"))
      val totals = bins.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val pa = (col("ca") + lit(1.0d)) / (col("na") + lit(10.0d))
      val pb = (col("cb") + lit(1.0d)) / (col("nb") + lit(10.0d))
      bins.crossJoin(broadcast(totals))
        .withColumn("term", ((pa - pb) * log(pa / pb)).cast(DecimalType(28, 12)))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          round(sum(col("term")).cast(DoubleType), 6).as("psi"))
        .withColumn("drift_detected", col("psi") > lit(0.1d))
    }),

    "qa_row_rules" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val lineTotal = dec(col("l_quantity")) * dec(col("l_extendedprice"))
      li.select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") > 0).as("is_qty_positive"),
          (col("l_extendedprice") >= 0).as("is_price_nonneg"),
          (col("l_discount") >= 0 && col("l_discount") <= 1).as("is_discount_sane"),
          (lineTotal <= lit(100000000)).as("is_total_bounded"),
          col("l_shipdate").between(
            lit("1992-01-01 00:00:00").cast(TimestampType),
            lit("2030-01-01 00:00:00").cast(TimestampType)).as("is_date_sane"))
        .withColumn("is_row_valid",
          col("is_qty_positive") && col("is_price_nonneg") && col("is_discount_sane") &&
            col("is_total_bounded") && col("is_date_sane"))
    }),

    // Schema-drift repair (ref normalize_parquet_run.py:17-19,73-102) under
    // the oracle: a frame with a type-DRIFTING column (metric — long here,
    // string in another observed file schema), SUSPICIOUS-named columns
    // (event_id suffix, is_/key_ prefixes; the struct goes through the
    // to_json stringify arm), a FORCED column, and two untouched columns
    // proving the repair is selective. Runs the production Normalize.repair.
    "ingest_drift_repair" -> ((s, dir) => {
      val shaped = Tables.events(s, dir).select(
        col("event_id"),                                    // suspicious: suffix _id
        when(col("event_id") % 10 === 0, lit(null).cast(LongType))
          .otherwise(col("user_id")).as("metric"),          // drifting across files
        (col("event_id") % 2 === 0).as("is_mobile"),        // suspicious: prefix is_
        struct(col("event_type").as("t"), (col("event_id") % 5).as("k"))
          .as("key_props"),                                 // suspicious: prefix key_
        (col("event_id") % 97).as("seq_no"),                // forced
        col("value").as("amount"),                          // untouched DOUBLE
        concat(lit("n"), col("event_id") % 7).as("note"))   // untouched STRING
      graft.ingest.Normalize.repair(
        shaped,
        extraSchemas = Seq(StructType(Seq(StructField("metric", StringType)))),
        forced = Set("seq_no"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "s9_seed_csv" -> {
      val values = fxRows.map { case (d, b, c, r) => s"(DATE '$d', '$b', '$c', $r)" }
        .mkString(", ")
      s"""SELECT fx_date, base_code, currency_code, CAST(usd_to_ccy AS DOUBLE) AS usd_to_ccy
         |FROM (VALUES $values) t(fx_date, base_code, currency_code, usd_to_ccy)
         |WHERE fx_date = DATE '2026-01-22'""".stripMargin
    },

    "u3_scd2_firstrun" ->
      s"""SELECT event_id, user_id,
         |  ${Keys.duckdbSql(Seq("user_id", "event_id", "epoch_us(ts)"))} AS dbt_scd_id,
         |  ts AS dbt_valid_from, CAST(NULL AS TIMESTAMP) AS dbt_valid_to
         |FROM events WHERE event_type = 'signup'""".stripMargin,

    "u3_scd2_history" ->
      """SELECT user_id, event_type, ts AS valid_from, event_id,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL AS is_current
        |FROM events WHERE user_id < 30""".stripMargin,

    "u4_incremental_merge" ->
      """WITH target AS (
        |  SELECT event_id, event_type, ts FROM events
        |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
        |batch AS (
        |  SELECT event_id, upper(event_type) AS event_type, ts FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-18 00:00:00')
        |SELECT * FROM target WHERE NOT EXISTS
        |  (SELECT 1 FROM batch WHERE batch.event_id = target.event_id)
        |UNION ALL SELECT * FROM batch""".stripMargin,

    "u5_dbt_tests" ->
      """WITH ev AS (
        |  SELECT *, CAST(floor(value / 100) AS INTEGER) AS bucket FROM events),
        |dup AS (
        |  SELECT count(*) AS n_violating_keys, CAST(sum(n_dup) AS BIGINT) AS n_violating_rows
        |  FROM (SELECT user_id, event_type, bucket, count(*) AS n_dup
        |        FROM ev GROUP BY 1, 2, 3 HAVING count(*) > 1)),
        |nn AS (SELECT count(*) AS n_null_props FROM ev WHERE props IS NULL),
        |av AS (SELECT count(*) AS n_bad_event_type FROM ev
        |       WHERE event_type NOT IN ('view','click','purchase','signup','error')
        |          OR event_type IS NULL)
        |SELECT * FROM dup, nn, av""".stripMargin,

    "cdc_snapshot_diff" ->
      """WITH ev AS (SELECT event_id, event_type, ts FROM events),
        |old AS (SELECT event_id, event_type AS old_type FROM ev
        |        WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
        |neu AS (SELECT event_id,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-18 00:00:00'
        |         THEN upper(event_type) ELSE event_type END AS new_type
        |  FROM ev
        |  WHERE ts < TIMESTAMP '2024-01-25 00:00:00' AND event_id % 13 <> 0)
        |SELECT coalesce(old.event_id, neu.event_id) AS event_id,
        |  CASE WHEN old_type IS NULL THEN 'INSERT'
        |       WHEN new_type IS NULL THEN 'DELETE'
        |       WHEN old_type <> new_type THEN 'UPDATE'
        |       ELSE 'UNCHANGED' END AS change_type,
        |  old_type, new_type
        |FROM old FULL OUTER JOIN neu ON old.event_id = neu.event_id
        |WHERE CASE WHEN old_type IS NULL THEN 'INSERT'
        |       WHEN new_type IS NULL THEN 'DELETE'
        |       WHEN old_type <> new_type THEN 'UPDATE'
        |       ELSE 'UNCHANGED' END <> 'UNCHANGED'""".stripMargin,

    "sess_sessionize" ->
      graft.streaming.Sessionize.batchOracleSql(gapMinutes = 30),

    // declarative twin of the native session_window: gap-break at >= 30min
    // (window end is EXCLUSIVE: an event at exactly prev+gap starts a new
    // session), session_end = last event + gap
    "sess_session_window" ->
      """WITH e AS (
        |  SELECT user_id, make_timestamp(epoch_us(ts)) AS ts, event_id
        |  FROM events WHERE user_id IS NOT NULL),
        |d AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events, min(event_id) AS first_event_id
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "skew_salted_agg" ->
      """SELECT CASE WHEN event_id % 10 < 7 THEN 'hot' ELSE event_type END AS k,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1""".stripMargin,

    "qa_validity_flags" ->
      """WITH d AS (
        |  SELECT
        |    CASE WHEN user_id % 7 = 0 THEN concat('u', user_id, 'example.com')
        |         WHEN user_id % 7 = 1 THEN ''
        |         ELSE concat('u', user_id, '@example.',
        |           CASE WHEN user_id % 2 = 0 THEN 'com' ELSE 'co.uk' END) END AS email,
        |    concat_ws('.',
        |      CASE WHEN event_id % 5 = 0 THEN '10' WHEN event_id % 5 = 1 THEN '192'
        |           WHEN event_id % 5 = 2 THEN '8' WHEN event_id % 5 = 3 THEN '172'
        |           ELSE '256' END,
        |      CASE WHEN event_id % 5 = 1 THEN '168' WHEN event_id % 5 = 3 THEN '20'
        |           ELSE CAST(event_id % 200 AS VARCHAR) END,
        |      CAST(user_id % 256 AS VARCHAR),
        |      CAST(event_id % 256 AS VARCHAR)) AS ip
        |  FROM events),
        |f AS (
        |  SELECT
        |    regexp_matches(email, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$') AS email_ok,
        |    regexp_matches(ip, '^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$') AS ip_ok,
        |    (starts_with(ip, '10.') OR starts_with(ip, '192.168.') OR starts_with(ip, '127.')
        |     OR regexp_matches(ip, '^172\.(1[6-9]|2[0-9]|3[01])\.')) AS is_private_ip
        |  FROM d)
        |SELECT email_ok, ip_ok, is_private_ip,
        |  (email_ok AND ip_ok AND NOT is_private_ip) AS is_row_valid, count(*) AS n
        |FROM f GROUP BY 1, 2, 3, 4""".stripMargin,

    // the PSI twin: same planted shift, same bounds/bins/smoothing, the
    // same add-one probabilities and DECIMAL per-bin terms
    "qa_drift_psi" ->
      """WITH ev AS (SELECT event_id, value FROM events),
        |a AS (SELECT value FROM ev WHERE event_id % 2 = 0),
        |b AS (
        |  SELECT CASE WHEN event_id % 10 = 1 THEN value * 10.0
        |    ELSE value END AS value
        |  FROM ev WHERE event_id % 2 <> 0),
        |bounds AS (SELECT min(value) AS mn, max(value) * 1.5 AS mx FROM ev),
        |ba AS (
        |  SELECT CAST(least(floor((value - mn) / (mx - mn) * 10.0), 9.0) AS INTEGER) AS bin,
        |    count(*) AS ca
        |  FROM a, bounds GROUP BY 1),
        |bb AS (
        |  SELECT CAST(least(floor((value - mn) / (mx - mn) * 10.0), 9.0) AS INTEGER) AS bin,
        |    count(*) AS cb
        |  FROM b, bounds GROUP BY 1),
        |bins AS (
        |  SELECT coalesce(ba.bin, bb.bin) AS bin,
        |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM ba FULL JOIN bb ON ba.bin = bb.bin),
        |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM bins),
        |terms AS (
        |  SELECT CAST(((ca + 1.0) / (na + 10.0) - (cb + 1.0) / (nb + 10.0))
        |    * ln(((ca + 1.0) / (na + 10.0)) / ((cb + 1.0) / (nb + 10.0)))
        |    AS DECIMAL(28,12)) AS term, na, nb
        |  FROM bins, tot)
        |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS psi,
        |  round(CAST(sum(term) AS DOUBLE), 6) > 0.1 AS drift_detected
        |FROM terms""".stripMargin,

    // the in-flight observed metrics must equal the declarative aggregates
    "qa_observe_metrics" ->
      """SELECT count(*) AS n_rows,
        |  CAST(count(*) FILTER (user_id IS NULL) AS BIGINT) AS n_null_user,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events""".stripMargin,

    "qa_row_rules" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity > 0 AS is_qty_positive,
        |  l_extendedprice >= 0 AS is_price_nonneg,
        |  l_discount >= 0 AND l_discount <= 1 AS is_discount_sane,
        |  CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))
        |    <= 100000000 AS is_total_bounded,
        |  l_shipdate BETWEEN TIMESTAMP '1992-01-01' AND TIMESTAMP '2030-01-01' AS is_date_sane,
        |  (l_quantity > 0 AND l_extendedprice >= 0 AND l_discount >= 0 AND l_discount <= 1
        |   AND CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) <= 100000000
        |   AND l_shipdate BETWEEN TIMESTAMP '1992-01-01' AND TIMESTAMP '2030-01-01') AS is_row_valid
        |FROM lineitem""".stripMargin,

    // the repaired frame: drift/suspicious/forced columns as strings
    // (booleans lowercase, struct as compact to_json), untouched columns
    // keeping their native types
    "ingest_drift_repair" ->
      """SELECT CAST(event_id AS VARCHAR) AS event_id,
        |  CASE WHEN event_id % 10 = 0 THEN NULL ELSE CAST(user_id AS VARCHAR) END AS metric,
        |  CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END AS is_mobile,
        |  '{"t":"' || event_type || '","k":' || CAST(event_id % 5 AS VARCHAR) || '}' AS key_props,
        |  CAST(event_id % 97 AS VARCHAR) AS seq_no,
        |  value AS amount,
        |  'n' || CAST(event_id % 7 AS VARCHAR) AS note
        |FROM events""".stripMargin
  )
}
