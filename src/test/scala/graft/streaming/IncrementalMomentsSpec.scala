package graft.streaming

import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.operators.Profiling

/** Incremental == batch for the moment-sum artifact: power sums folded
  * across micro-batches under the plain SUM upsert must serve the exact
  * skew/kurt reads the one-shot batch computes — the streaming proof for
  * the whole moment-statistics family (x68/x74/x76/x83 share the
  * artifact shape). */
class IncrementalMomentsSpec extends SparkTestBase {
  import spark.implicits._

  test("power sums fold across batches == batch momentStats; replay no-op") {
    val state = tmpDir("mo-state")
    val b1 = Seq(("a", 1L), ("a", 2L), ("b", 5L))
    val b2 = Seq(("a", 3L), ("b", 5L), ("c", 7L)) // extends a to {1,2,3}

    def fold(rows: Seq[(String, Long)], id: Long): Unit =
      IncrementalMoments.processBatch(rows.toDF("g", "x"), state, "g",
        col("x"), batchId = id)

    fold(b1, 1L); fold(b2, 2L)

    def canon(df: org.apache.spark.sql.DataFrame) = df.orderBy("g")
      .as[(String, Long, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    val batch = canon(Profiling.momentStats((b1 ++ b2).toDF("g", "x"), "g", col("x")))
    val served = canon(IncrementalMoments.read(spark, state))
    assert(served === batch)
    // a = {1,2,3}: symmetric -> skew 0; b constant -> NULL reads
    val m = served.map(r => r._1 -> r).toMap
    assert(m("a")._7 === Some(0.0))
    assert(m("b")._7 === None)

    fold(b2, 2L) // replay: marker makes it a no-op
    assert(canon(IncrementalMoments.read(spark, state)) === batch)
  }
}
