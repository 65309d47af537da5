package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental == batch for the transition matrix, with the cross-batch
  * BRIDGE edge that makes it non-trivial: a user's chain continues from
  * their last event of the previous batch. */
class IncrementalTransitionsSpec extends SparkTestBase {
  import spark.implicits._

  private def batchMatrix(rows: Seq[(Long, Long, Long, String)]) =
    graft.operators.Funnel.transitionCounts(
      rows.toDF("user", "t", "id", "et"), "user", "t", "id", "et")

  test("bridged folds == batch matrix; replay no-op; fresh user in batch 2") {
    val state = tmpDir("tr-state")
    // user 1: A(1) B(2) | C(3) — bridge B->C; user 2 born in batch 2
    val b1 = Seq((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (2L, 1L, 3L, "A"))
    val b2 = Seq((1L, 3L, 4L, "C"), (2L, 2L, 5L, "B"), (2L, 3L, 6L, "A"))

    def fold(rows: Seq[(Long, Long, Long, String)], id: Long): Unit =
      IncrementalTransitions.processBatch(rows.toDF("user", "t", "id", "et"),
        state, batchId = id)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("from_type", "to_type")
        .as[(String, String, Long)].collect().toSeq

    fold(b1, 1L)
    assert(canon(IncrementalTransitions.read(spark, state)) == canon(batchMatrix(b1)))

    fold(b2, 2L)
    val all = canon(batchMatrix(b1 ++ b2))
    assert(canon(IncrementalTransitions.read(spark, state)) == all)
    // the bridge edge B->C exists only across the batch boundary
    assert(all.contains(("B", "C", 1L)))

    fold(b2, 2L) // replay: both state tables marker-skip
    assert(canon(IncrementalTransitions.read(spark, state)) == all)
  }
}
