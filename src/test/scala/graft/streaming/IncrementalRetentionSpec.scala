package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental == batch for the retention triangle, with the
  * out-of-order cases that make cohort maintenance non-trivial: a late
  * signup that MOVES a user's cohort earlier, and activity arriving
  * before its signup. */
class IncrementalRetentionSpec extends SparkTestBase {
  import spark.implicits._

  private def triangle(rows: Seq[(Long, Long, String)]) = {
    val ev = rows.toDF("user_id", "day", "event_type")
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.select("user_id", "day").distinct()
      .join(cohorts, "user_id")
      .filter(col("day") >= col("cohort_day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  test("state-served triangle == batch, across late signups and replay") {
    val state = tmpDir("ret-state")
    // b1: user 1 signs up day 10, active 10/11; user 2 ACTIVE day 12 but
    // signup not yet seen
    val b1 = Seq((1L, 10L, "signup"), (1L, 11L, "click"), (2L, 12L, "view"))
    // b2: user 2's signup arrives LATE with an EARLIER day (11); user 1
    // re-active day 13; user 2 also signs up again day 14 (min must win)
    val b2 = Seq((2L, 11L, "signup"), (1L, 13L, "click"), (2L, 14L, "signup"))

    def fold(rows: Seq[(Long, Long, String)], id: Long): Unit =
      IncrementalRetention.processBatch(rows.toDF("user_id", "day", "event_type"),
        state, batchId = id)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cohort_day", "offset")
        .as[(Long, Long, Long)].collect().toSeq

    fold(b1, 1L)
    assert(canon(IncrementalRetention.read(spark, state)) == canon(triangle(b1)))

    fold(b2, 2L)
    val all = canon(triangle(b1 ++ b2))
    assert(canon(IncrementalRetention.read(spark, state)) == all)
    // user 2's cohort re-anchored to day 11: its day-12 activity is
    // offset 1, day-14 signup activity offset 3
    assert(all.contains((11L, 1L, 1L)) && all.contains((11L, 3L, 1L)))

    fold(b2, 2L) // replay both state tables: marker no-op
    assert(canon(IncrementalRetention.read(spark, state)) == all)
  }
}
