package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.streaming.EventStream

/** The Structured Streaming engine under the driver's DuckDB oracle gate:
  * the query below actually EXECUTES a streaming job (readStream →
  * watermarked windowed aggregate → AvailableNow memory sink) and returns
  * its result table, which the oracle recomputes with batch SQL. This is
  * the batch/stream unification claim made testable — same logic, same
  * answer, two execution engines, one hash gate.
  *
  * AvailableNow over a static backlog drops nothing at the watermark
  * (single logical batch), so the result is deterministic and equal to the
  * batch window aggregate.
  */
object StreamGate {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg" -> ((s, dir) => {
      val in = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ck").toString
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"), col("props"))
        .write.mode("overwrite").parquet(in)
      val q = EventStream.runAvailableNow(s, in, ckpt, "stream_window_agg_sink")
      q.awaitTermination(300000)
      s.table("stream_window_agg_sink")
        .select(col("window_start"), col("event_type"), col("n"),
          col("sum_value").cast(DoubleType).as("sum_value"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // batch twin of the streaming aggregate: epoch-aligned 1h windows
    "stream_window_agg" ->
      """SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % CAST(3600000000 AS BIGINT)) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin
  )
}
