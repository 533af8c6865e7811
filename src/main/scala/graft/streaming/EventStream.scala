package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (additive — the reference is pure batch,
  * SURVEY §2.8; its checkpoint/resume export loop maps naturally onto
  * `Trigger.AvailableNow` + checkpointLocation).
  *
  * The transformations are plain DataFrame functions so the identical logic
  * runs batch or streaming — one definition, two execution modes.
  */
object EventStream {

  /** events schema as written by `prepareStreamInput` (micros ts). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window aggregate: events per (window, type) with
    * exact decimal value sums. In append-mode deployments the 10-minute
    * watermark drops later data and bounds state; `runAvailableNow` below
    * deliberately runs it in COMPLETE mode for batch-parity demos, where the
    * watermark does not evict state — don't use that mode on an unbounded
    * stream.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Run the streaming aggregate over everything currently in `inputDir`
    * and stop — the batch-parity execution mode (AvailableNow processes the
    * backlog with checkpointed progress, then terminates).
    */
  def runAvailableNow(spark: SparkSession, inputDir: String, checkpoint: String,
                      queryName: String): StreamingQuery =
    windowedCounts(readStream(spark, inputDir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
