package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt schema-test equivalents (ref: models/staging/schema.yml:8-66,
  * models/marts/schema.yml:4-31): each test returns the VIOLATION rows —
  * empty result = pass, exactly like dbt's count(*)-anti-query convention.
  * All are single-pass aggregates or anti-joins; nothing collects to the
  * driver, so they run unchanged at cluster scale.
  */
object Assertions {

  /** `unique` test: keys appearing more than once, with their counts. */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n_dup"))
      .filter(col("n_dup") > 1)

  /** `not_null` test: rows with a NULL in the column. */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  /** `accepted_values` test. */
  def acceptedValues(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.filter(!col(c).isin(values: _*) || col(c).isNull)

  /** `relationships` test: child keys with no parent (orphans). */
  def relationships(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame =
    child.join(parent.select(col(pk)), child(fk) === parent(pk), "left_anti")

  def passed(violations: DataFrame): Boolean = violations.isEmpty
}
