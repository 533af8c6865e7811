package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Surrogate-key construction (ref: stg_order.sql:88-102, stg_location.sql:4-12,
  * mart_dim_customer.sql:67 — ABS(FARM_FINGERPRINT(concat(parts, '|')))).
  *
  * Keys only need internal consistency (SURVEY §2.6 X1), so the default
  * implementation is a *portable* 64-bit hash both Spark and DuckDB can
  * compute: the first 15 hex digits of md5 read as a big-endian integer.
  * That keeps every surrogate key oracle-checkable. `xxhash64Key` is the
  * faster engine-internal variant for keys that never leave Spark.
  *
  * The '|'-joined, COALESCE-defaulted pre-image is centralized here because
  * any whitespace/NULL-default mismatch breaks every downstream join
  * silently (SURVEY §7.4 risk 1).
  */
object Keys {

  /** `coalesce(cast(c as string), default)` for each part, '|'-joined. */
  def preimage(parts: Seq[Column], default: String = ""): Column =
    concat_ws("|", parts.map(c => coalesce(c.cast("string"), lit(default))): _*)

  /** Portable 64-bit key: first 15 md5 hex digits as a non-negative long. */
  def md5Key64(pre: Column): Column =
    conv(substring(md5(pre), 1, 15), 16, 10).cast(LongType)

  def surrogateKey(parts: Column*): Column = md5Key64(preimage(parts))

  /** Engine-internal key — single hash pass, whole-stage codegen, no md5
    * string materialization. Not DuckDB-reproducible; use for intermediate
    * joins, not oracle-checked outputs.
    */
  def xxhash64Key(parts: Column*): Column = xxhash64(preimage(parts))

  /** DuckDB spelling of `md5Key64` over an arbitrary expression. */
  def md5Key64Sql(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** DuckDB spelling of `md5Key64(preimage(...))` for oracle statements. */
  def duckdbSql(parts: Seq[String], default: String = ""): String = {
    val pre = parts.map(p => s"coalesce(CAST($p AS VARCHAR), '$default')")
      .mkString("concat_ws('|', ", ", ", ")")
    md5Key64Sql(pre)
  }
}
