package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** The typed Dataset API surface under the oracle gate: case-class
  * Encoders, `groupByKey`, and a custom `Aggregator` (the typed
  * counterpart of a Catalyst ImperativeAggregate — Spark plans it as a
  * regular partial/final aggregate, so it map-side combines and shuffles
  * only one buffer per key, exactly like the built-ins).
  *
  * Numeric discipline: the DataFrame layer converts `value` to exact long
  * cents (via the engine's DECIMAL(18,2) cast, the same rounding the
  * oracle applies) BEFORE entering typed code, so the Aggregator's buffer
  * is pure integer arithmetic — order-independent, hash-gate-safe.
  */
object TypedOps {

  /** (n, cents) running buffer; merge is associative+commutative. */
  private val sumCents: Aggregator[(String, Long), (Long, Long), (Long, Long)] =
    new Aggregator[(String, Long), (Long, Long), (Long, Long)] {
      def zero: (Long, Long) = (0L, 0L)
      def reduce(b: (Long, Long), a: (String, Long)): (Long, Long) =
        (b._1 + 1, b._2 + a._2)
      def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(b: (Long, Long)): (Long, Long) = b
      def bufferEncoder = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      def outputEncoder = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_aggregator" -> ((s, dir) => {
      import s.implicits._
      val cents = Tables.events(s, dir)
        .select(col("event_type"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
        .as[(String, Long)]
      cents.groupByKey(_._1)
        .agg(sumCents.toColumn.name("agg"))
        .toDF("event_type", "agg")
        .select(col("event_type"), col("agg._1").as("n_events"),
          (col("agg._2").cast(DoubleType) / 100.0d).as("total_value"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "typed_aggregator" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS DOUBLE) / 100.0
        |    AS total_value
        |FROM events GROUP BY event_type""".stripMargin
  )
}
