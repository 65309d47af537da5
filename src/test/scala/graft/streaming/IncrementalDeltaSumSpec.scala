package graft.streaming

import graft.SparkTestBase
import graft.operators.TimeSeries

/** Incremental == batch for the deltaSum day-span states: time-ordered
  * micro-batches folded through the bridge-rule merge must reproduce the
  * one-shot batch deltaSum exactly — including a batch that lands inside
  * an existing day (span extension), one that opens a new day, a key
  * that appears mid-stream, and a replayed batch id (idempotence). */
class IncrementalDeltaSumSpec extends SparkTestBase {
  import spark.implicits._

  private val DAY = 86400000000L

  test("incremental day-span folds == batch deltaSum; replay is a no-op") {
    val state = tmpDir("ds-state")
    // batch 1: key a day 0 (10 -> 4), key b day 0 (7)
    val b1 = Seq(("a", 0L, 1L, 10L), ("a", 2L, 2L, 4L), ("b", 1L, 1L, 7L))
    // batch 2: extends a's day 0 (4 -> 6: +2 inside-day bridge vs state
    // last 4), opens a's day 1 (9), new key c
    val b2 = Seq(("a", 5L, 3L, 6L), ("a", DAY + 1L, 4L, 9L), ("c", 3L, 1L, 2L))
    // batch 3: extends a day 1 (9 -> 5: +0), extends b day 0 (7 -> 11: +4)
    val b3 = Seq(("a", DAY + 9L, 5L, 5L), ("b", 8L, 2L, 11L))

    def fold(rows: Seq[(String, Long, Long, Long)], id: Long): Unit =
      IncrementalDeltaSum.processBatch(rows.toDF("k", "t", "id", "v"), state,
        "k", "t", "id", "v", batchId = id)

    fold(b1, 1L); fold(b2, 2L); fold(b3, 3L)

    val batch = TimeSeries.deltaSum((b1 ++ b2 ++ b3).toDF("k", "t", "id", "v"),
        "k", "t", "id", "v")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val served = IncrementalDeltaSum.read(spark, state)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(served === batch)
    // hand figures: a = 0+2 (day0) + 0 bridge(9>6? max(0,9-6)=3) ... the
    // batch recompute IS the spec; still pin one: b = max(0, 11-7) = 4
    assert(served.find(_._1 == "b").get._3 === 4L)

    // replaying batch 3 must not double-fold (marker idempotence)
    fold(b3, 3L)
    val replayed = IncrementalDeltaSum.read(spark, state)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(replayed === batch)
  }
}
