package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst's parquet source handles column
  * pruning and predicate pushdown; at cluster scale the same call works
  * over a partitioned directory unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` normalization, adaptive to the generator's on-disk type.
    * Older drops wrote parquet TIMESTAMP(NANOS) — which Spark's
    * TimestampType (micros) refuses outright — so those read as long
    * (whole-microsecond values; `div 1000` is lossless). Current drops
    * write TIMESTAMP(MICROS, isAdjustedToUTC=false), surfacing as
    * TIMESTAMP_NTZ; cast to TimestampType under the UTC session zone
    * (value-preserving) so every downstream query and oracle sees one
    * type regardless of the generator vintage.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    val ts = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
      case _ =>
        org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType)
    }
    df.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
