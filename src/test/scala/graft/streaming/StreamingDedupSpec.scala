package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Streaming exact dedup: first occurrence wins across micro-batches
  * (state store), duplicates within and across batches are dropped. */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicates dropped within and across micro-batches; state survives") {
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDS().toDF("doc_id", "text")
    val query = StreamingDedup.exactDedupStream(docs, "text")
      .writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("dedup-ckpt"))
      .start()

    input.addData((1L, "alpha"), (2L, "alpha"), (3L, "beta")) // in-batch dup
    query.processAllAvailable()
    input.addData((4L, "alpha"), (5L, "gamma")) // cross-batch dup
    query.processAllAvailable()
    query.stop()

    val got = spark.table("dedup_out").select("doc_id", "text")
      .as[(Long, String)].collect().toSet
    // EXACTLY one row per distinct text: size pins the in-batch dup drop
    // (doc 2), the membership check pins the cross-batch drop (doc 4)
    assert(got.size == 3)
    assert(got.map(_._2) == Set("alpha", "beta", "gamma"))
    assert(!got.contains((4L, "alpha")))
  }

  test("watermarked variant suppresses near-in-time duplicates") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val docs = input.toDS().toDF("doc_id", "ts", "text")
    val query = StreamingDedup.exactDedupStreamWatermarked(docs, "text", "ts", "10 minutes")
      .writeStream
      .format("memory")
      .queryName("dedup_wm_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("dedup-wm-ckpt"))
      .start()

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 00:01:00")
    input.addData((1L, t0, "alpha"), (2L, t1, "alpha"), (3L, t0, "beta"))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("dedup_wm_out").select("text").as[String].collect().toSeq
    assert(got.sorted == Seq("alpha", "beta"))
  }
}
