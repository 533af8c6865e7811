package graft.glamira

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expr.FarmFingerprint
import graft.functions.LocaleNumeric

/** Staging models — Spark-first re-expression of the dbt staging layer.
  * Views in the reference (dbt_project.yml:37-38) = unmaterialized
  * DataFrames here: Catalyst fuses them into downstream plans exactly as
  * BigQuery inlines views.
  */
object Staging {

  private def ff(spark: org.apache.spark.sql.SparkSession): Unit =
    FarmFingerprint.register(spark)

  private def farm(c: Column): Column = call_function("farm_fingerprint", c)

  /** Production item_key: ABS(FARM_FINGERPRINT(preimage)) as STRING
    * (stg_order.sql:88-102).
    */
  private def farmItemKey(preimage: Column): Column =
    abs(call_function("farm_fingerprint", preimage)).cast(StringType)

  /** stg_order (stg_order.sql): checkout filter → double LEFT JOIN
    * UNNEST WITH OFFSET → locale price parse → FARM_FINGERPRINT item_key →
    * location join. posexplode_outer preserves rows with NULL/empty
    * cart_products with NULL offsets, matching BigQuery's outer UNNEST.
    */
  def stgOrder(summary: DataFrame, stgLocation: DataFrame): DataFrame =
    stgOrderDetailed(summary, stgLocation)
      // project to the reference's exact output list (stg_order.sql:87-131):
      // the unnest offsets feed the item_key pre-image but are NOT part of
      // the staging contract — downstream consumers must key on item_key
      .select(col("item_key"), col("location_key"), col("order_id"),
        col("time_stamp"), col("event_ts"), col("local_time"), col("collection"),
        col("ip"), col("user_agent"), col("resolution"), col("user_db_id"),
        col("device_id"), col("api_version"), col("store_id"),
        col("show_recommendation"), col("current_url"), col("referrer_url"),
        col("email_address"), col("product_id"), col("product_quantity"),
        col("product_price"), col("product_currency"), col("option_id"),
        col("option_label"), col("line_total_amount"))

  /** stg_order BEFORE the final staging projection: the full exploded
    * line-item/option grain including the unnest offsets — the audit/debug
    * view, and the frame the oracle gate projects from. `itemKey`
    * parameterizes the surrogate key: FARM_FINGERPRINT in production
    * (default; bit-parity gated by x1), the portable md5-64 under the
    * DuckDB oracle so the key itself is recomputable. Everything else —
    * checkout filter, wide SAFE_CAST projection, double outer unnest,
    * locale price parse, key pre-image, location join — is THE production
    * path; there is exactly one implementation of these semantics.
    */
  def stgOrderDetailed(summary: DataFrame, stgLocation: DataFrame,
      itemKey: Column => Column = farmItemKey): DataFrame = {
    ff(summary.sparkSession)
    val base = summary
      .filter(col("collection") === "checkout_success")
      .select(
        col("order_id").cast(StringType).as("order_id"),
        col("time_stamp").cast(LongType).as("time_stamp"),
        timestamp_seconds(col("time_stamp").cast(LongType)).as("event_ts"),
        col("local_time").cast(StringType).as("local_time"),
        col("collection").cast(StringType).as("collection"),
        col("ip").cast(StringType).as("ip"),
        col("user_agent").cast(StringType).as("user_agent"),
        col("resolution").cast(StringType).as("resolution"),
        col("user_id_db").try_cast(LongType).as("user_db_id"),   // SAFE_CAST + rename
        col("device_id").cast(StringType).as("device_id"),
        col("api_version").cast(StringType).as("api_version"),
        col("store_id").cast(StringType).as("store_id"),
        col("show_recommendation").cast(StringType).as("show_recommendation"),
        col("current_url").cast(StringType).as("current_url"),
        col("referrer_url").cast(StringType).as("referrer_url"),
        col("email_address").cast(StringType).as("email_address"),
        col("cart_products"))

    val lineItems = base
      .select(col("*"), posexplode_outer(col("cart_products")).as(Seq("cp_offset", "cp")))
      .withColumn("product_id", col("cp.product_id").try_cast(LongType))
      .withColumn("product_quantity", col("cp.amount").try_cast(LongType))
      .withColumn("product_price", LocaleNumeric.parseLocaleNumeric(col("cp.price")))
      .withColumn("product_currency", col("cp.currency").cast(StringType))
      .withColumn("option_array", col("cp.option"))
      .drop("cp", "cart_products")

    val options = lineItems
      .select(col("*"), posexplode_outer(col("option_array")).as(Seq("opt_offset", "opt")))
      .withColumn("option_id", col("opt.option_id").cast(StringType))
      .withColumn("option_label", col("opt.option_label").cast(StringType))
      .drop("opt", "option_array")

    // item_key pre-image exactly as stg_order.sql:88-102 (CONCAT + COALESCE
    // defaults '' for strings, -1 for offsets/timestamp).
    val preimage = concat(
      coalesce(col("order_id"), lit("")), lit("|"),
      coalesce(col("product_id").cast(StringType), lit("")), lit("|"),
      coalesce(col("option_id"), lit("")), lit("|"),
      coalesce(col("cp_offset"), lit(-1)).cast(StringType), lit("|"),
      coalesce(col("opt_offset"), lit(-1)).cast(StringType), lit("|"),
      coalesce(col("time_stamp"), lit(-1)).cast(StringType))

    val locations = stgLocation.select(
      col("ip").cast(StringType).as("ip"), col("location_key"))

    options
      .withColumn("item_key", itemKey(preimage))
      .withColumn("line_total_amount",
        col("product_quantity").cast(DecimalType(38, 9)) * col("product_price"))
      .join(locations, Seq("ip"), "left")
  }

  /** stg_customer (stg_customer.sql): fake-null user classification, email
    * base with Unique/Multiple flag, distinct email-user pairs.
    */
  def stgCustomer(summary: DataFrame): DataFrame = {
    val userCheck = summary
      .groupBy(col("user_id_db"))
      .agg(count(lit(1)).as("_one"))
      .withColumn("user_status",
        when(col("user_id_db").isNull, "NULL")
          .when(trim(col("user_id_db").cast(StringType)) === "", "EMPTY")
          .when(lower(trim(col("user_id_db").cast(StringType)))
            .isin("null", "n/a", "na", "none", "undefined"), "FAKE_NULL")
          .otherwise("VALID"))
      .select(col("user_id_db"), col("user_status"))

    val checkedUsers = userCheck
      .join(summary.select(col("email_address"), col("user_id_db")), Seq("user_id_db"))
      .filter(col("email_address").isNotNull && trim(col("email_address")) =!= "")

    val valid = checkedUsers.filter(col("user_status") === "VALID")

    val emailBase = valid
      .groupBy(col("email_address"))
      .agg(countDistinct(col("user_id_db").cast(StringType)).as("n_users"))
      .withColumn("has_email_multiple_user_ids",
        when(col("n_users") === 1, "Unique")
          .when(col("n_users") > 1, "Multiple")
          .otherwise("Unknown"))
      .select(col("email_address"), col("has_email_multiple_user_ids"))

    val emailUserPairs = valid
      .select(col("email_address"), col("user_id_db").cast(StringType).as("user_db_id"))
      .distinct()

    emailUserPairs.join(emailBase, Seq("email_address"))
      .select(col("email_address"),
        col("user_db_id").try_cast(LongType).as("user_db_id"),
        col("has_email_multiple_user_ids"))
      .orderBy(col("email_address"), col("user_db_id"))
  }

  /** stg_product (stg_product.sql): JSON flatten with multi-path id
    * coalesce, typed weights, FARM_FINGERPRINT product_key, sentinel filter.
    * The payload is parsed ONCE per row (`from_json` into a struct, field
    * reads off the struct) — the previous 13 independent `get_json_object`
    * calls each re-ran a full Jackson parse per row, ~13× the parse cost on
    * the product table at scale. Mirrors the gated x11_json_extract shape.
    * Semantics note: on (pathological but legal) duplicate JSON keys,
    * `from_json` keeps the LAST occurrence where `get_json_object` returned
    * the first — acceptable here because the crawler emits each product
    * field once (ref stg_product.sql flattens unique paths).
    */
  def stgProduct(productRaw: DataFrame,
      productKey: Column => Column = c => abs(call_function("farm_fingerprint", c)).cast(LongType))
      : DataFrame = {
    ff(productRaw.sparkSession)
    val productSchema = StructType(Seq(StructField("product", StructType(Seq(
      "product_id", "productId", "id", "_id", "gender", "category_name",
      "name", "product_type", "store_code", "attribute_set", "category",
      "material_design", "sku", "none_metal_weight", "fixed_silver_weight",
      "gold_weight").map(StructField(_, StringType))))))
    def jv(field: String): Column = col("_p").getField("product").getField(field)
    val typed = productRaw
      .filter(col("product_json").isNotNull)
      .withColumn("_p", from_json(col("product_json"), productSchema))
      .select(
        coalesce(jv("product_id"), jv("productId"), jv("id"), jv("_id")).as("product_id_str"),
        jv("gender").as("gender"),
        jv("category_name").as("category_name"),
        jv("name").as("product_name"),
        jv("product_type").as("product_type"),
        jv("store_code").as("store_code"),
        jv("attribute_set").as("attribute_set"),
        jv("category").as("category"),
        jv("material_design").as("material_design"),
        jv("sku").as("sku"),
        jv("none_metal_weight").try_cast(DecimalType(38, 9)).as("none_metal_weight"),
        jv("fixed_silver_weight").try_cast(DecimalType(38, 9)).as("fixed_silver_weight"),
        jv("gold_weight").try_cast(DecimalType(38, 9)).as("gold_weight"))
    typed
      .filter(col("product_id_str").isNotNull &&
        trim(col("product_id_str")) =!= "" && trim(col("product_id_str")) =!= "null")
      .withColumn("product_key", productKey(lower(trim(col("product_id_str")))))
      .withColumn("product_id", col("product_id_str").try_cast(LongType))
      .drop("product_id_str")
  }

  /** stg_location (stg_location.sql): FARM_FINGERPRINT location_key over
    * lower/trim country|region|city.
    */
  def stgLocation(ipLocationRaw: DataFrame): DataFrame = {
    ff(ipLocationRaw.sparkSession)
    val preimage = concat(
      coalesce(lower(trim(col("country_code").cast(StringType))), lit("")), lit("|"),
      coalesce(lower(trim(col("region").cast(StringType))), lit("")), lit("|"),
      coalesce(lower(trim(col("city").cast(StringType))), lit("")))
    ipLocationRaw.select(
      abs(call_function("farm_fingerprint", preimage)).cast(StringType).as("location_key"),
      col("ip").cast(StringType).as("ip"),
      col("country_code").cast(StringType).as("country_code"),
      col("country_name").cast(StringType).as("country_name"),
      col("region").cast(StringType).as("region"),
      col("city").cast(StringType).as("city"),
      col("isp").cast(StringType).as("isp"))
  }

  /** customer_email_scd snapshot feed (snapshots/customer_email_scd.sql):
    * orders joined to valid customers, per-user recency rank.
    */
  def customerEmailScdFeed(stgOrder: DataFrame, stgCustomer: DataFrame): DataFrame = {
    val fact = stgOrder.alias("o")
      .join(stgCustomer.select(col("user_db_id")).distinct().alias("c"),
        col("o.user_db_id") === col("c.user_db_id"))
      .filter(col("o.user_db_id").isNotNull &&
        col("o.email_address").isNotNull && trim(col("o.email_address")) =!= "")
      .select(
        col("o.user_db_id").as("user_db_id"),
        lower(trim(col("o.email_address"))).as("email_address"),
        col("o.time_stamp").as("time_stamp"),
        timestamp_seconds(col("o.time_stamp")).as("event_ts"),
        to_date(timestamp_seconds(col("o.time_stamp"))).as("date"),
        timestamp_seconds(col("o.time_stamp")).as("time"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_db_id")).orderBy(col("event_ts").desc)
    fact.withColumn("rn", row_number().over(w))
  }
}
