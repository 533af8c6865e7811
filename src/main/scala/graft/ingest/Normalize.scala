package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest normalization — the defensive-stringify + schema-drift layer
  * (ref: ETL/export_to_gcs.py:143-188, ETL/normalize_parquet_run.py:17-19,
  * 73-102). The reference survives 41M heterogeneous Mongo docs by (a)
  * stringifying every object column at export, (b) detecting columns whose
  * observed Arrow type drifts across files ∪ name-pattern "suspicious"
  * columns and force-casting them to string. Here both passes are plain
  * column projections — distributed, codegen'd, no per-row Python.
  */
object Normalize {

  // ref: normalize_parquet_run.py:17-19
  val suspiciousPrefixes: Seq[String] = Seq("is_", "has_", "key_", "cat_", "flag_")
  val suspiciousContains: Seq[String] = Seq("_id", "id_", "uuid", "guid", "code", "type", "search")
  val suspiciousSuffixes: Seq[String] = Seq("_id", "_code", "_type", "_key")

  /** Stable string form of any column (ref export stringify rules):
    * nested/array/map → JSON; binary → utf8 if clean else hex; timestamp →
    * ISO-UTC; everything else → plain cast.
    */
  def stringify(c: Column, dt: DataType): Column = dt match {
    case _: StructType | _: ArrayType | _: MapType => to_json(c)
    case BinaryType =>
      // decode-utf8-else-hex (export_to_gcs.py:166-170): valid utf8 decodes
      // as text, junk bytes fall back to hex (ANSI-safe: no throwing decode)
      when(c.isNull, lit(null).cast(StringType))
        .when(is_valid_utf8(c.cast(StringType)), c.cast(StringType))
        .otherwise(lower(hex(c)))
    case TimestampType => date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    case _ => c.cast(StringType)
  }

  /** Phase-1 export normalization: every column stringified. */
  def stringifyAll(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map(f => stringify(col(f.name), f.dataType).as(f.name)): _*)

  /** Columns whose type differs across observed schemas (ref
    * normalize_parquet_run.py:73-80 — same column, >1 Arrow type).
    */
  def driftingColumns(schemas: Seq[StructType]): Set[String] =
    schemas.flatMap(_.fields).groupBy(_.name)
      .collect { case (name, fs) if fs.map(_.dataType).distinct.size > 1 => name }
      .toSet

  /** Name-pattern heuristic (ref :83-91). */
  def suspiciousColumns(names: Seq[String]): Set[String] =
    names.filter { n =>
      val l = n.toLowerCase
      suspiciousPrefixes.exists(l.startsWith) ||
        suspiciousSuffixes.exists(l.endsWith) ||
        suspiciousContains.exists(l.contains)
    }.toSet

  /** Phase-2 repair: force-cast the drifty ∪ suspicious ∪ forced set to
    * string (ref :94-102; forced set per ETL/helper.txt:5-12).
    */
  def repair(df: DataFrame, extraSchemas: Seq[StructType] = Nil,
             forced: Set[String] = Set.empty): DataFrame = {
    val targets = driftingColumns(df.schema +: extraSchemas) ++
      suspiciousColumns(df.columns.toSeq) ++ forced
    df.select(df.schema.fields.map { f =>
      if (targets.contains(f.name)) stringify(col(f.name), f.dataType).as(f.name)
      else col(f.name)
    }: _*)
  }

  /** Typed re-ingest of a stringified frame (ref: ETL/INSERT INTO….sql):
    * JSON-encoded nested columns parse back with from_json; scalars
    * try_cast to the target type — null on failure, never a job abort.
    */
  def typedIngest(df: DataFrame, target: StructType): DataFrame =
    df.select(target.fields.map { f =>
      val c = col(f.name)
      f.dataType match {
        case _: StructType | _: ArrayType => from_json(c, f.dataType).as(f.name)
        case TimestampType => try_to_timestamp(c).as(f.name)
        case dt => c.try_cast(dt).as(f.name)
      }
    }: _*)
}
