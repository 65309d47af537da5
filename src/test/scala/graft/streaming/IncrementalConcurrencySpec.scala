package graft.streaming

import graft.SparkTestBase
import graft.operators.TimeSeries

/** Incremental == batch for the sweep-line deltas: interval batches
  * folded through the plain SUM upsert must serve the exact peak
  * concurrency the one-shot batch computes — order-free (deltas are
  * additive), including a second batch that raises an existing key's
  * peak and introduces a new key, plus replay idempotence. */
class IncrementalConcurrencySpec extends SparkTestBase {
  import spark.implicits._

  test("delta folds across batches == batch maxIntersections; replay no-op") {
    val state = tmpDir("mc-state")
    val b1 = Seq(("a", 0L, 10L), ("a", 5L, 15L), ("b", 0L, 10L))
    // batch 2 arrives "out of order" time-wise: earlier intervals for a,
    // raising the peak at p=5 to 3; new key c
    val b2 = Seq(("a", 4L, 30L), ("b", 10L, 20L), ("c", 1L, 2L))

    def fold(rows: Seq[(String, Long, Long)], id: Long): Unit =
      IncrementalConcurrency.processBatch(rows.toDF("k", "s", "e"), state,
        "k", "s", "e", batchId = id)

    fold(b1, 1L); fold(b2, 2L)

    val batch = TimeSeries.maxIntersections((b1 ++ b2).toDF("k", "s", "e"),
        "k", "s", "e")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val served = IncrementalConcurrency.read(spark, state)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(served === batch)
    assert(served.find(_._1 == "a").get._2 === 3L) // raised peak visible

    fold(b2, 2L) // replayed batch id: marker makes it a no-op
    val replayed = IncrementalConcurrency.read(spark, state)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(replayed === batch)
  }
}
