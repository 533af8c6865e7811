package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Locale-aware numeric repair + parse, transcribed branch-for-branch from
  * the reference's price cleaning (stg_order.sql:37-61):
  *
  *  1. normalize the Arabic decimal separator `٫` to `.`
  *  2. if both `,` and `.` appear: whichever comes first is the thousands
  *     separator — `1,234.56` drops commas; `1.234,56` drops dots and turns
  *     the comma into the decimal point
  *  3. if only `,` appears it is the decimal separator
  *  4. strip spaces, trim, then null-on-failure parse to NUMERIC(38,9)
  *     (BigQuery SAFE.PARSE_NUMERIC → Spark try_cast to DecimalType(38,9)).
  *
  * Pure `Column` expression tree — stays inside whole-stage codegen; no UDF.
  */
object LocaleNumeric {

  def repairLocaleNumeric(price: Column): Column = {
    val p = regexp_replace(price, "٫", ".")
    val hasComma = instr(p, ",") > 0
    val hasDot = instr(p, ".") > 0
    val commaFirst = instr(p, ",") < instr(p, ".")
    val repaired = when(hasComma && hasDot,
        when(commaFirst, regexp_replace(p, ",", ""))
          .otherwise(regexp_replace(regexp_replace(p, "\\.", ""), ",", ".")))
      .when(hasComma, regexp_replace(p, ",", "."))
      .otherwise(p)
    trim(regexp_replace(repaired, " ", ""))
  }

  def parseLocaleNumeric(price: Column): Column =
    try_cast(repairLocaleNumeric(price), DecimalType(38, 9))

  private def try_cast(c: Column, t: DecimalType): Column =
    c.try_cast(t)

  /** The same repair logic as DuckDB SQL over a column expression `col` —
    * used to build oracle statements that must match `parseLocaleNumeric`.
    */
  def duckdbSql(col: String): String = {
    val p = s"replace($col, '٫', '.')"
    s"""TRY_CAST(trim(replace(CASE
       |  WHEN strpos($p, ',') > 0 AND strpos($p, '.') > 0 THEN
       |    CASE WHEN strpos($p, ',') < strpos($p, '.')
       |         THEN replace($p, ',', '')
       |         ELSE replace(replace($p, '.', ''), ',', '.') END
       |  WHEN strpos($p, ',') > 0 THEN replace($p, ',', '.')
       |  ELSE $p END, ' ', '')) AS DECIMAL(38,9))""".stripMargin
  }
}
