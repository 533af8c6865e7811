package graft.glamira

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Currency normalization business logic, transcribed verbatim from
  * mart_fact_order.sql:21-121 (explicit-label map, symbol map, ambiguity
  * classification, URL-TLD inference for ambiguous '$'/'kr').
  */
object CurrencyRules {

  private val cleanLower: Map[Seq[String], String] = Map(
    Seq("usd $", "usd", "us$", "us $") -> "USD",
    Seq("cad $") -> "CAD", Seq("au $") -> "AUD", Seq("sgd $") -> "SGD",
    Seq("nzd $") -> "NZD", Seq("hkd $") -> "HKD", Seq("mxn $") -> "MXN",
    Seq("cop $") -> "COP", Seq("dop $") -> "DOP", Seq("gtq q") -> "GTQ",
    Seq("pen s/.", "s/.", "s/. ") -> "PEN",
    Seq("clp") -> "CLP", Seq("uyu") -> "UYU", Seq("chf") -> "CHF",
    Seq("lei") -> "RON", Seq("ft") -> "HUF", Seq("kč") -> "CZK",
    Seq("zł") -> "PLN", Seq("лв.", "лв") -> "BGN", Seq("kn") -> "HRK",
    Seq("din.", " din.", "din") -> "RSD", Seq("r$") -> "BRL")

  private val cleanSymbols: Map[String, String] = Map(
    "€" -> "EUR", "£" -> "GBP", "₺" -> "TRY", "₫" -> "VND", "₱" -> "PHP",
    "₹" -> "INR", "￥" -> "JPY", "₲" -> "PYG", "د.ك.‏" -> "KWD")

  private val tldCurrency: Seq[(String, String)] = Seq(
    "uk" -> "GBP", "de" -> "EUR", "fr" -> "EUR", "es" -> "EUR", "it" -> "EUR",
    "au" -> "AUD", "ca" -> "CAD", "nz" -> "NZD", "sg" -> "SGD", "se" -> "SEK",
    "no" -> "NOK", "dk" -> "DKK", "ch" -> "CHF", "jp" -> "JPY", "mx" -> "MXN",
    "br" -> "BRL", "pl" -> "PLN", "nl" -> "EUR", "ie" -> "EUR", "be" -> "EUR",
    "in" -> "INR", "ph" -> "PHP", "vn" -> "VND", "pt" -> "EUR")

  def urlHost(currentUrl: Column): Column =
    lower(trim(coalesce(regexp_extract(currentUrl, "://([^/]+)", 1), lit(""))))

  def urlTld(host: Column): Column =
    regexp_extract(host, "\\.([a-z]{2,})$", 1)

  /** mart_fact_order.sql:21-65 — NULL when empty, unmapped, or ambiguous. */
  def currencyCode(raw: Column): Column = {
    val norm = lower(trim(raw))
    val t = trim(raw)
    val base = when(raw.isNull || t === "", lit(null).cast(StringType))
    val labeled = cleanLower.foldLeft(base) { case (acc, (keys, code)) =>
      acc.when(norm.isin(keys: _*), code)
    }
    val symboled = cleanSymbols.foldLeft(labeled) { case (acc, (sym, code)) =>
      acc.when(t === sym, code)
    }
    symboled
      .when(t === "$", lit(null).cast(StringType))
      .when(norm === "kr", lit(null).cast(StringType))
      .otherwise(lit(null).cast(StringType))
  }

  /** mart_fact_order.sql:67-81 — UNKNOWN / CLEAN / AMBIGUOUS. */
  def currencyStatus(raw: Column): Column = {
    val norm = lower(trim(raw))
    val t = trim(raw)
    when(raw.isNull || t === "", "UNKNOWN")
      .when(norm.isin(cleanLower.keys.flatten.toSeq: _*), "CLEAN")
      .when(t.isin(cleanSymbols.keys.toSeq: _*), "CLEAN")
      .when(t === "$", "AMBIGUOUS")
      .when(norm === "kr", "AMBIGUOUS")
      .otherwise("UNKNOWN")
  }

  /** mart_fact_order.sql:88-121 — TLD inference for AMBIGUOUS rows only;
    * 'co.uk' host suffix checked before the generic TLD chain.
    */
  def inferredCurrency(code: Column, status: Column, host: Column, tld: Column): Column = {
    val amb = status === "AMBIGUOUS"
    val base = when(code.isNotNull, code)
      .when(amb && host.endsWith("co.uk"), "GBP")
    tldCurrency.foldLeft(base) { case (acc, (t, ccy)) =>
      acc.when(amb && tld === t, ccy)
    }.otherwise(lit(null).cast(StringType))
  }

  /** mart_fact_order.sql:123-131. */
  def statusFinal(code: Column, status: Column, inferred: Column): Column =
    when(code.isNotNull, status)
      .when(status === "AMBIGUOUS" && inferred.isNotNull, "INFERRED")
      .otherwise(status)

  // ---- DuckDB twins, generated from the SAME rule tables as the Column
  // chains above, so the full business map sits under the oracle gate and
  // cannot drift from the mart implementation. Branches are disjoint, so
  // map iteration order is immaterial.

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  def urlHostSql(url: String): String =
    s"lower(trim(coalesce(regexp_extract($url, '://([^/]+)', 1), '')))"

  def urlTldSql(host: String): String =
    s"regexp_extract($host, '\\.([a-z]{2,})$$', 1)"

  def currencyCodeSql(raw: String): String = {
    val norm = s"lower(trim($raw))"
    val t = s"trim($raw)"
    val labeled = cleanLower.map { case (keys, code) =>
      s"WHEN $norm IN (${keys.map(q).mkString(", ")}) THEN ${q(code)}" }
    val syms = cleanSymbols.map { case (sym, code) =>
      s"WHEN $t = ${q(sym)} THEN ${q(code)}" }
    (Seq(s"CASE WHEN $raw IS NULL OR $t = '' THEN NULL") ++ labeled ++ syms ++
      Seq(s"WHEN $t = '$$' THEN NULL", s"WHEN $norm = 'kr' THEN NULL",
        "ELSE NULL END")).mkString("\n    ")
  }

  def currencyStatusSql(raw: String): String = {
    val norm = s"lower(trim($raw))"
    val t = s"trim($raw)"
    val allLower = cleanLower.keys.flatten.map(q).mkString(", ")
    val allSyms = cleanSymbols.keys.map(q).mkString(", ")
    s"""CASE WHEN $raw IS NULL OR $t = '' THEN 'UNKNOWN'
       |    WHEN $norm IN ($allLower) THEN 'CLEAN'
       |    WHEN $t IN ($allSyms) THEN 'CLEAN'
       |    WHEN $t = '$$' THEN 'AMBIGUOUS'
       |    WHEN $norm = 'kr' THEN 'AMBIGUOUS'
       |    ELSE 'UNKNOWN' END""".stripMargin
  }

  def inferredCurrencySql(code: String, status: String, host: String, tld: String): String = {
    val amb = s"$status = 'AMBIGUOUS'"
    val chain = tldCurrency.map { case (t, ccy) =>
      s"WHEN $amb AND $tld = ${q(t)} THEN ${q(ccy)}" }
    (Seq(s"CASE WHEN $code IS NOT NULL THEN $code",
      s"WHEN $amb AND $host LIKE '%co.uk' THEN 'GBP'") ++ chain ++
      Seq("ELSE NULL END")).mkString("\n    ")
  }

  def statusFinalSql(code: String, status: String, inferred: String): String =
    s"""CASE WHEN $code IS NOT NULL THEN $status
       |    WHEN $status = 'AMBIGUOUS' AND $inferred IS NOT NULL THEN 'INFERRED'
       |    ELSE $status END""".stripMargin
}
