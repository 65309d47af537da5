package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance for the cohort-retention family (R119's
  * triangle, R70's windows): two keyed state tables —
  *
  *  - `cohorts` (user → first signup day) under a MIN upsert: a LATE
  *    signup that predates the known one simply lowers the key's
  *    minimum, re-anchoring the user's cohort with no watermark;
  *  - `activity` (user, day) distinct pairs under the plain SUM upsert
  *    (the count measure is bookkeeping; the KEY SET is the artifact —
  *    re-observing a pair only bumps its count).
  *
  * The read joins the two states and rebuilds the triangle EXACTLY as
  * the batch operator — out-of-order arrival (activity before signup,
  * cohort moving earlier) is handled by construction, because offsets
  * are recomputed from current state rather than frozen at ingest.
  *
  * At 100 TB: state is O(users) + O(users × active days) rows — the
  * same distinct-pair economics as the R115 trailing-actives read; both
  * tables take the bucketed O(Δ) layout when user counts demand it.
  */
object IncrementalRetention {

  /** Fold one micro-batch of (user_id, day, event_type) rows. */
  def processBatch(events: DataFrame, stateDir: String,
      batchId: Long = -1L): Unit = {
    val coh = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("cohort_day"))
    MvPipeline.upsertWith(coh, s"$stateDir/cohorts", Seq("user_id"), {
      case "cohort_day" => min(col("cohort_day"))
      case other        => throw new IllegalArgumentException(other)
    }, batchId)
    val act = events.groupBy("user_id", "day").agg(count(lit(1)).as("cnt"))
    MvPipeline.upsert(act, s"$stateDir/activity", Seq("user_id", "day"), batchId)
  }

  /** The retention triangle served from state (identical read shape to
    * the batch x98 query). */
  def read(spark: SparkSession, stateDir: String): DataFrame = {
    val cohorts = MvPipeline.readState(spark, stateDir, "cohorts")
    val act = MvPipeline.readState(spark, stateDir, "activity")
      .select("user_id", "day")
    act.join(cohorts, "user_id")
      .filter(col("day") >= col("cohort_day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }
}
