package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Bitmaps

/** Streaming bitmap state must equal the batch bitmap EXACTLY, and —
  * uniquely in the incremental family — survive a DOUBLE-APPLIED
  * increment unchanged: OR is idempotent, so at-least-once delivery
  * converges even without the batch-id marker. */
class IncrementalBitmapSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("id", LongType)))

  test("incremental (2 micro-batches, overlap) == batch; double-apply is a no-op") {
    val in = tmpDir("bm-in"); val state = tmpDir("bm-state"); val ckpt = tmpDir("bm-ckpt")
    val c1 = Seq(("a", 1L), ("a", 63L), ("b", 5L))
    val c2 = Seq(("a", 63L), ("a", 64L), ("b", 6L), ("c", 200L))
    def lines(ts: Seq[(String, Long)]) =
      ts.map(t => s"""{"g":"${t._1}","id":${t._2}}""").mkString("\n")
    def run(): Unit =
      IncrementalBitmap.start(spark, in, schema, state, ckpt, "g", "id")
        .awaitTermination()
    Files.write(Paths.get(in, "c1.jsonl"), lines(c1).getBytes)
    run()
    Files.write(Paths.get(in, "c2.jsonl"), lines(c2).getBytes)
    run()

    def snap() = IncrementalBitmap.state(spark, state)
      .orderBy("g", "word").as[(String, Long, Long)].collect().toSeq
    val streaming = snap()
    val batch = Bitmaps.bitmapState((c1 ++ c2).toDF("g", "id"), "g", "id")
      .orderBy("g", "word").as[(String, Long, Long)].collect().toSeq
    assert(streaming === batch) // word-for-word, bit-for-bit

    // at-least-once rehearsal: re-apply batch 2's increment under a FRESH
    // batch id (the marker can't skip it) — OR idempotence must keep the
    // state identical
    IncrementalBitmap.processBatch(c2.toDF("g", "id"), "g", "id", state,
      batchId = 99L)
    assert(snap() === streaming)

    val card = Bitmaps.cardinality(IncrementalBitmap.state(spark, state))
      .as[(String, Long)].collect().toMap
    assert(card === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }
}
