package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.TimeSeries

/** Streaming == batch for spike detection (VERDICT r5 task 8): bucket
  * counts maintained incrementally across micro-batches must yield the
  * exact flags the one-shot batch [[TimeSeries.spikeStats]] computes,
  * including a LATE event landing in an old bucket (no-watermark
  * semantics, like the reference's stats2). */
class StreamingSpikesSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_type", StringType), StructField("ts", LongType)))

  private def minute(m: Long): Long = m * 60L * 1000000000L // epoch nanos

  // type "a": a flat baseline with one hot bucket (a spike); type "b":
  // uniform (no spikes). chunk2 adds a LATE event into chunk1's first
  // bucket plus fresh buckets.
  private val chunk1: Seq[(String, Long)] =
    (0 until 8).flatMap(b => Seq.fill(2)(("a", minute(b * 10L)))) ++
      Seq.fill(20)(("a", minute(85L))) ++
      (0 until 6).map(b => ("b", minute(b * 10L))) :+
      ("b", minute(10L)) // bucket 1 at 2: enough baseline variance that
                         // the late +1 on bucket 0 is NOT a z>2 spike
  private val chunk2: Seq[(String, Long)] =
    Seq(("a", minute(1L)), ("b", minute(1L))) ++ // late: first buckets again
      (8 until 10).flatMap(b => Seq.fill(2)(("a", minute(b * 10L)))) ++
      (6 until 8).map(b => ("b", minute(b * 10L)))

  private def jsonLine(t: (String, Long)): String =
    s"""{"event_type":"${t._1}","ts":${t._2}}"""

  private def collectStats(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_type")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect().toSeq

  test("incremental bucket state (2 micro-batches, late row) == batch spikeStats") {
    val in = tmpDir("sp-in"); val state = tmpDir("sp-state"); val ckpt = tmpDir("sp-ckpt")
    def runAvailable(): Unit =
      StreamingSpikes.start(spark, in, schema, state, ckpt).awaitTermination()

    Files.write(Paths.get(in, "c1.jsonl"), chunk1.map(jsonLine).mkString("\n").getBytes)
    runAvailable()
    Files.write(Paths.get(in, "c2.jsonl"), chunk2.map(jsonLine).mkString("\n").getBytes)
    runAvailable()

    val batch = TimeSeries.spikeStats(
      (chunk1 ++ chunk2).toDF("event_type", "ts"), "event_type", "ts", minutes = 10)
    val streaming = StreamingSpikes.spikeStats(spark, state, "event_type")
    assert(collectStats(streaming) === collectStats(batch))
    graft.operators.Caching.releaseAll()

    // sanity on the planted shape: "a" flags its hot bucket, "b" is flat
    val byType = collectStats(streaming).map(r => r._1 -> r).toMap
    assert(byType("a")._4 >= 1L, "planted spike not flagged (z>2)")
    assert(byType("b")._4 == 0L, "flat series flagged a spike")
    graft.operators.Caching.releaseAll()
  }
}
