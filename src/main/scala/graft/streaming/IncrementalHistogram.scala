package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Sketches

/** Continuously-maintained histogram sketch
  * ([[graft.operators.Sketches.histogram]]): per-(group, cents-bucket)
  * counts are purely ADDITIVE, so the state folds with the plain summed
  * upsert and any batching order converges counter-for-counter to the
  * batch sketch — the same economics as [[IncrementalCms]], but with a
  * deterministic QUANTILE read ([[Sketches.histogramQuantiles]]) served
  * from state in exact integer arithmetic. The fully-oracled streaming
  * percentile: where the t-digest path (x10) is engine-specific by
  * nature, this one's estimates replay bit-for-bit in any engine, at
  * the cost of O(value range × resolution) state per group. */
object IncrementalHistogram {

  /** Fold one micro-batch of values into the per-group bucket counts. */
  def processBatch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      stateDir: String, batchId: Long = -1L): Unit =
    MvPipeline.upsert(Sketches.histogram(df, groupCols, valueCol),
      s"$stateDir/histogram", groupCols :+ "bucket", batchId)

  /** Quantile estimates served from the maintained state. */
  def quantiles(spark: SparkSession, stateDir: String, groupCols: Seq[String],
      qs: Seq[(String, Int, Int)]): DataFrame =
    Sketches.histogramQuantiles(
      MvPipeline.readState(spark, stateDir, "histogram"), groupCols, qs)
}
