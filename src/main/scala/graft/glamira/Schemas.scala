package graft.glamira

import org.apache.spark.sql.types._

/** Explicit input schemas for the Glamira pipeline, the typed-layer
  * equivalent of ETL/summary_schema.json (see FIXTURES.md).
  */
object Schemas {

  val optionItem: StructType = StructType(Seq(      // summary_schema.json:14-23
    StructField("option_label", StringType),
    StructField("option_id", StringType),
    StructField("value_label", StringType),
    StructField("value_id", StringType)))

  val cartProduct: StructType = StructType(Seq(     // summary_schema.json:4-25
    StructField("product_id", StringType),
    StructField("amount", StringType),              // raw layer: string w/ junk
    StructField("price", StringType),               // locale junk, parsed in staging
    StructField("currency", StringType),
    StructField("option", ArrayType(optionItem))))

  val countlySummary: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("time_stamp", LongType),            // epoch seconds
    StructField("local_time", StringType),
    StructField("collection", StringType),          // event-type discriminator
    StructField("ip", StringType),
    StructField("user_agent", StringType),
    StructField("resolution", StringType),
    StructField("user_id_db", StringType),
    StructField("device_id", StringType),
    StructField("api_version", StringType),
    StructField("store_id", StringType),
    StructField("show_recommendation", StringType),
    StructField("current_url", StringType),
    StructField("referrer_url", StringType),
    StructField("email_address", StringType),
    StructField("cart_products", ArrayType(cartProduct))))

  /** Crawled catalog (Source/step2_crawl_product_names.py:46-67), consumed
    * as a JSON string per row (stg_product.sql:4-36).
    */
  val productRaw: StructType = StructType(Seq(
    StructField("product_json", StringType)))

  /** IP2Location output subset consumed by staging (stg_location.sql:15-20). */
  val ipLocationRaw: StructType = StructType(Seq(
    StructField("ip", StringType),
    StructField("country_code", StringType),
    StructField("country_name", StringType),
    StructField("region", StringType),
    StructField("city", StringType),
    StructField("isp", StringType)))

  /** FX seed (seeds/fx_to_usd_22_01_26.csv + dbt_project.yml:49-58). */
  val fxSeed: StructType = StructType(Seq(
    StructField("fx_date", DateType),
    StructField("base_code", StringType),
    StructField("currency_code", StringType),
    StructField("usd_to_ccy", DoubleType)))
}
