package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TimeSeries

/** Incremental maintenance of [[TimeSeries.maxIntersections]] — the
  * streaming member of the sweep-line family (SURVEY R90).
  *
  * The artifact is [[TimeSeries.intervalDeltas]]: per `(k, point, ord)`
  * the NET ±1 delta sum, which is purely ADDITIVE — any batch arrival
  * order folds through the plain SUM upsert to the same state, no
  * ordering contract needed (unlike [[IncrementalDeltaSum]]'s span
  * states). State is O(distinct boundary points); the peak-concurrency
  * read runs [[TimeSeries.maxIntersectionsFromDeltas]]'s window pass
  * over the state, never over raw intervals.
  */
object IncrementalConcurrency {

  /** Fold one micro-batch of `(key, start, end)` intervals into the
    * delta state. */
  def processBatch(intervals: DataFrame, stateDir: String, keyCol: String,
      startCol: String, endCol: String, batchId: Long = -1L): Unit =
    MvPipeline.upsert(
      TimeSeries.intervalDeltas(intervals, keyCol, startCol, endCol),
      s"$stateDir/sweep_deltas", Seq("k", "p", "ord"), batchId)

  /** Current per-key peak concurrency served from the maintained
    * deltas. */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    TimeSeries.maxIntersectionsFromDeltas(
      MvPipeline.readState(spark, stateDir, "sweep_deltas"))
}
