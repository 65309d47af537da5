package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.Profiling

/** Incremental maintenance of the [[Profiling.momentSums]] artifact —
  * the streaming proof that the whole moment-statistics family
  * (skew/kurt x74, and by the same artifact shape corr x68, linreg x76,
  * t-tests x83) maintains under the plain SUM upsert: every measure is
  * an additive int64 power sum, so batches fold in any order and the
  * reads ([[Profiling.momentReads]]) run unchanged over state.
  */
object IncrementalMoments {

  /** Fold one micro-batch's power sums into the keyed state. */
  def processBatch(rows: DataFrame, stateDir: String, groupCol: String,
      x: Column, batchId: Long = -1L): Unit =
    MvPipeline.upsert(Profiling.momentSums(rows, groupCol, x),
      s"$stateDir/moment_sums", Seq("g"), batchId)

  /** Current skewness/kurtosis served from the maintained sums. */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    Profiling.momentReads(
      MvPipeline.readState(spark, stateDir, "moment_sums"))
}
