package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.Sessionize.{Event, Session}

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("batch sessionization closes on gaps, keeps last session open") {
    val events = Seq(
      Event(1L, 0L, "a"), Event(1L, 1000L, "b"),          // session 1
      Event(1L, 100000L, "c"),                            // session 2 (open)
      Event(2L, 0L, "a")                                  // user 2 (open)
    ).toDS()
    val closed = Sessionize.sessions(events, gapMs = 30000L).collect()
    assert(closed.toSet == Set(Session(1L, 0L, 1000L, 2L)))
  }

  test("straggler older than the open session by > gap becomes its own closed session") {
    val events = Seq(
      Event(1L, 100000L, "a"),  // open session at 100000
      Event(1L, 10000L, "old")  // 90s older than session start, gap 30s
    ).toDS()
    val closed = Sessionize.sessions(events, gapMs = 30000L).collect()
    assert(closed.toSet == Set(Session(1L, 10000L, 10000L, 1L)))
  }

  test("streaming: state persists across micro-batches; gap in batch 2 closes batch-1 session") {
    val input = MemoryStream[Event](spark)
    val query = Sessionize.sessions(input.toDS(), gapMs = 30000L)
      .writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", tmpDir("sess-ckpt"))
      .start()
    try {
      input.addData(Event(1L, 0L, "a"), Event(1L, 1000L, "b"))
      query.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // nothing closed yet

      input.addData(Event(1L, 100000L, "c")) // gap > 30s: closes the first session
      query.processAllAvailable()
      val closed = spark.table("sessions_out").as[Session].collect()
      assert(closed.toSeq == Seq(Session(1L, 0L, 1000L, 2L)))

      input.addData(Event(1L, 99000L, "late")) // late straggler: joins open session, no close
      query.processAllAvailable()
      assert(spark.table("sessions_out").count() == 1)

      input.addData(Event(1L, 500000L, "d")) // closes session 2 (99000..100000, 2 events)
      query.processAllAvailable()
      assert(spark.table("sessions_out").as[Session].collect().toSet ==
        Set(Session(1L, 0L, 1000L, 2L), Session(1L, 99000L, 100000L, 2L)))
    } finally query.stop()
  }

  test("watermarked tumbling-window aggregation (append mode) over an event stream") {
    val input = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("bucket"), col("cnt"))
    val query = agg.writeStream
      .format("memory").queryName("win_out").outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("win-ckpt"))
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((ts("2024-01-01 00:01:00"), 1L), (ts("2024-01-01 00:05:00"), 2L))
      query.processAllAvailable()
      assert(spark.table("win_out").count() == 0) // window not finalized yet

      // advance watermark far past the first window -> it finalizes
      input.addData((ts("2024-01-01 01:00:00"), 3L))
      query.processAllAvailable()
      val rows = spark.table("win_out").as[(Long, Long)].collect().toMap
      val b0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
      assert(rows == Map(b0 -> 2L))
    } finally query.stop()
  }
}
