package graft.glamira

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Reference-shaped fixtures per FIXTURES.md §1-§4: nested cart_products
  * with 0/1/N items, 0/1/N options (NULL vs empty array distinct), locale
  * junk prices, ambiguous currencies with TLD-bearing URLs, fake-null user
  * ids, an unmapped-currency row, and a two-date FX seed.
  */
object GlamiraFixtures {

  private def opt(id: String, label: String) = Row(label, id, s"vl_$label", s"vi_$id")

  private def cart(pid: String, amount: String, price: String, ccy: String,
                   options: Seq[Row]): Row =
    Row(pid, amount, price, ccy, if (options == null) null else options)

  def summary(spark: SparkSession): DataFrame = {
    val rows = Seq(
      // o1: 2 cart products; first has 2 options, second has empty options
      Row("o1", 1700000000L, "2023-11-14 22:13:20", "checkout_success", "1.1.1.1",
        "ua", "1920x1080", "101", "d1", "v1", "s1", "true",
        "https://www.shop.co.uk/p/1", "https://ref", "A@X.com",
        Seq(
          cart("11", "2", "1.234,56", "$", Seq(opt("sz", "size"), opt("cl", "color"))),
          cart("12", "1", "1,234.56", "€", Seq.empty))),
      // o2: NULL cart_products (outer-unnest row must survive)
      Row("o2", 1700000100L, "2023-11-14 22:15:00", "checkout_success", "2.2.2.2",
        "ua", "800x600", "102", "d2", "v1", "s1", "false",
        "https://www.shop.de/p/2", null, "b@x.com", null),
      // o3: 1 cart product, NULL options array; arabic decimal; kr + .se TLD
      Row("o3", 1700000200L, "2023-11-14 22:16:40", "checkout_success", "3.3.3.3",
        "ua", "1024x768", "103", "d3", "v1", "s2", "true",
        "https://www.shop.se/p/3", null, "A@X.com",
        Seq(cart("13", "3", "99٫5", "kr", null))),
      // o4: fake-null user id; unmapped currency; space-grouped price
      Row("o4", 1700000300L, "2023-11-14 22:18:20", "checkout_success", "1.1.1.1",
        "ua", "1920x1080", "null", "d4", "v1", "s2", "true",
        "https://www.shop.com/p/4", null, "c@x.com",
        Seq(cart("14", "1", "1 234.56", "XYZ", Seq(opt("mt", "metal"))))),
      // o5: same user as o1, later timestamp, new email (SCD change)
      Row("o5", 1700000400L, "2023-11-14 22:20:00", "checkout_success", "2.2.2.2",
        "ua", "800x600", "101", "d5", "v1", "s1", "true",
        "https://www.shop.fr/p/5", null, "a2@x.com",
        Seq(cart("11", "1", "50", "€", Seq(opt("sz", "size"))))),
      // non-checkout event: must be filtered out of stg_order entirely
      Row("o6", 1700000500L, "2023-11-14 22:21:40", "view_product_detail", "1.1.1.1",
        "ua", "1920x1080", "101", "d6", "v1", "s1", "true",
        "https://www.shop.com/p/6", null, "a@x.com",
        Seq(cart("15", "1", "10", "usd", Seq.empty))))
    spark.createDataFrame(rows.asJava, Schemas.countlySummary)
  }

  def productRaw(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row("""{"product": {"product_id": "11", "name": "Ring A", "sku": "R-11", "gender": "f", "category_name": "rings", "product_type": "ring", "store_code": "uk", "attribute_set": "jewel", "category": "c1", "material_design": "gold", "gold_weight": "2.5"}}"""),
      Row("""{"product": {"productId": "12", "name": "Ring B", "sku": "R-12", "gold_weight": "not_a_number"}}"""),
      Row("""{"product": {"id": "13", "name": "Chain", "sku": "C-13"}}"""),
      Row("""{"product": {"_id": "14", "name": "Earring", "sku": "E-14"}}"""),
      Row("""{"product": {"product_id": "null", "name": "Bad"}}"""),   // sentinel filter
      Row("""{"product": {"product_id": "", "name": "Empty"}}"""),     // blank filter
      Row("""{"product": {"name": "NoId"}}"""))                        // all-id-paths-null filter
    spark.createDataFrame(rows.asJava, Schemas.productRaw)
  }

  def ipLocationRaw(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row("1.1.1.1", "US", "United States", "CA", "SF", "ispA"),
      Row("2.2.2.2", "US", "United States", "CA", "SF", "ispB"),  // same loc, diff ip → dedup
      Row("3.3.3.3", "SE", "Sweden", "AB", "Stockholm", "ispC"),
      Row("9.9.9.9", "DE", "Germany", "BE", "Berlin", "ispD"))    // unseen in orders
    spark.createDataFrame(rows.asJava, Schemas.ipLocationRaw)
  }

  def fxSeed(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row(java.sql.Date.valueOf("2026-01-21"), "USD", "EUR", 0.9),   // stale date: excluded
      Row(java.sql.Date.valueOf("2026-01-22"), "USD", "USD", 1.0),
      Row(java.sql.Date.valueOf("2026-01-22"), "USD", "EUR", 0.8),
      Row(java.sql.Date.valueOf("2026-01-22"), "USD", "GBP", 0.5),
      Row(java.sql.Date.valueOf("2026-01-22"), "USD", "SEK", 10.0))
    spark.createDataFrame(rows.asJava, Schemas.fxSeed)
  }
}
