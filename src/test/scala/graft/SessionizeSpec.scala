package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessionization: gap boundaries and tie-breaks") {
    val t0 = 1700000000000000L // micros
    def ts(us: Long) = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    val ev = Seq(
      (1L, ts(t0), 1L),
      (1L, ts(t0 + 1800000000L), 2L),        // exactly 30min gap → SAME session
      (1L, ts(t0 + 3600000001L), 3L),        // 30min + 1µs after #2 → new session
      (2L, ts(t0), 4L))
      .toDF("user_id", "ts", "event_id")
    val sess = Sessionize.sessionizeBatch(ev, 30).orderBy("user_id", "session_idx").collect()
    assert(sess.length === 3)
    assert(sess(0).getAs[Long]("n_events") === 2)   // user1 session 0: events 1,2
    assert(sess(1).getAs[Long]("n_events") === 1)   // user1 session 1: event 3
    assert(sess(2).getAs[Long]("user_id") === 2L)
  }

  test("streaming sessionization matches batch on closed sessions") {
    val inDir = java.nio.file.Files.createTempDirectory("sess_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sess_ck").toString
    val batchEvents = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_id"))
    batchEvents.write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_id LONG")
      .parquet(inDir)
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.Event]
    val q = Sessionize.sessionizeStream(stream, 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    val streamed = spark.table("sess_out")
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("first_event_id"))
      .collect().map(_.toString).toSet
    val batch = Sessionize.sessionizeBatch(batchEvents, 30)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("first_event_id"))
      .collect().map(_.toString).toSet

    assert(streamed.nonEmpty, "stream should close sessions under a 0s watermark")
    val missing = streamed -- batch
    assert(missing.isEmpty, s"streamed sessions not in batch: ${missing.take(3)}")
  }

  test("streaming: far-early out-of-order event starts its own session, not a backward merge") {
    // Two AvailableNow runs over one checkpoint: run 1 opens a session at
    // t0; run 2 delivers an in-watermark event 3 HOURS earlier. The bounded
    // backward merge must close that event as its own 1-event session —
    // the unbounded variant silently glued it onto the open session (no
    // emission at all), diverging from the batch twin.
    val inDir = java.nio.file.Files.createTempDirectory("sess_early_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("sess_early_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sess_early_ck").toString
    val t0us = 1700000000000000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)

    // file sink, not memory: only the file sink supports resuming from the
    // checkpoint, which this test needs to carry state across two runs
    def run(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_id LONG")
        .parquet(inDir)
        .withWatermark("ts", "10 hours") // far-early event must stay in-watermark
        .as[Sessionize.Event]
      val q = Sessionize.sessionizeStream(stream, 30)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }

    Seq((1L, ts(t0us), 10L), (1L, ts(t0us + 60L * 1000000), 11L))
      .toDF("user_id", "ts", "event_id").write.mode("append").parquet(inDir)
    run()
    assert(spark.read.parquet(outDir).isEmpty) // session still open

    Seq((1L, ts(t0us - 3L * 3600 * 1000000), 12L))
      .toDF("user_id", "ts", "event_id").write.mode("append").parquet(inDir)
    run()
    val emitted = spark.read.parquet(outDir).collect()
    assert(emitted.length === 1, s"expected the early event closed as its own session: ${emitted.toSeq}")
    assert(emitted.head.getAs[Long]("n_events") === 1)
    assert(emitted.head.getAs[Long]("first_event_id") === 12L)
  }
}
