package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Sessionization: split each user's event stream into sessions separated
  * by inactivity gaps > `gapMinutes`.
  *
  * Two execution modes over one semantics:
  *  - `sessionizeBatch`: lag + running-sum windows — one shuffle on
  *    user_id, fully oracle-checkable SQL.
  *  - `sessionizeStream`: `flatMapGroupsWithState` with event-time timeout —
  *    the custom-state streaming form (SURVEY §2.8 additive surface);
  *    per-user state is one open session (constant memory per key).
  */
object Sessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessionState(start: Long, end: Long, n: Long, firstEventId: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long,
                     first_event_id: Long)

  /** Batch: session boundaries via lag-gap, ids via running sum (0-based per
    * user, ordered by ts with event_id tie-break), then per-session rollup.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(order))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(order.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), min(col("event_id")).as("first_event_id"))
  }

  /** DuckDB twin of [[sessionizeBatch]] (lag-gap → running-sum session ids
    * → per-session rollup) — THE single source for every oracle that gates
    * sessionization semantics, so the gap constant and tie-break order
    * cannot drift between gates. `where` filters the events feed
    * (e.g. "user_id IS NOT NULL" for the streaming gate, whose typed
    * Dataset cannot carry null keys); `includeIdx` keeps session_idx in
    * the projection.
    */
  def batchOracleSql(gapMinutes: Int, where: String = "TRUE",
                     includeIdx: Boolean = true): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    val idxCol = if (includeIdx) "session_idx, " else ""
    s"""WITH o AS (
       |  SELECT user_id, ts, event_id,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
       |  FROM events WHERE $where),
       |m AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |      OR epoch_us(ts) - epoch_us(prev_ts) > $gapUs THEN 1 ELSE 0 END AS new_session
       |  FROM o),
       |s AS (
       |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
       |    ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_idx
       |  FROM m)
       |SELECT user_id, ${idxCol}min(ts) AS session_start, max(ts) AS session_end,
       |  count(*) AS n_events, min(event_id) AS first_event_id
       |FROM s GROUP BY user_id, session_idx""".stripMargin
  }

  /** Timestamp ↔ microseconds without precision loss (getTime alone is
    * millis and silently drops the sub-milli digits the batch path keeps).
    */
  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** Streaming: one open-session state per user; a gap beyond the threshold
    * (or event-time timeout) closes and emits the session. Late/out-of-order
    * events within the watermark extend the open session.
    */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          def emit(s: SessionState) = Session(userId, fromMicros(s.start),
            fromMicros(s.end), s.n, s.firstEventId)
          if (evs.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(s))
          } else {
            val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            // The backward merge is BOUNDED: an in-watermark out-of-order
            // event within one gap of the open session's start pulls the
            // start back (batch semantics), but an event more than a gap
            // earlier belongs to its own EARLIER session — merging it would
            // glue sessions the batch twin keeps apart, with no bound on how
            // far back the open session could stretch.
            val (early, rest) = cur match {
              case Some(s) => sorted.partition(e => micros(e.ts) < s.start - gapUs)
              case None => (Seq.empty[Event], sorted)
            }
            // Chain-sessionize the early events among themselves; every
            // chain closes here — by construction the last one still ends
            // more than a gap before the open session's start.
            var earlyCur: Option[SessionState] = None
            early.foreach { e =>
              val t = micros(e.ts)
              earlyCur match {
                case Some(s) if t - s.end <= gapUs =>
                  earlyCur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1,
                    firstEventId = math.min(s.firstEventId, e.event_id)))
                case Some(s) =>
                  closed += emit(s)
                  earlyCur = Some(SessionState(t, t, 1, e.event_id))
                case None =>
                  earlyCur = Some(SessionState(t, t, 1, e.event_id))
              }
            }
            earlyCur.foreach(s => closed += emit(s))
            rest.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.end <= gapUs =>
                  // events are ascending among themselves, so only the state
                  // session can sit later than t; the partition above already
                  // bounded how far back t may reach
                  cur = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1,
                    firstEventId = math.min(s.firstEventId, e.event_id)))
                case Some(s) =>
                  closed += emit(s)
                  cur = Some(SessionState(t, t, 1, e.event_id))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.event_id))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end / 1000 + gapUs / 1000)
            }
            closed.result().iterator
          }
      }
  }
}
