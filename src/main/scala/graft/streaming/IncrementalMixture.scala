package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Sampling

/** Incremental maintenance of the source-mixture weights — the same
  * MV-state / decision-tail split as [[StreamingSpikes]], applied to
  * [[Sampling.mixtureWeights]]: per-source (docs, tokens) counts are
  * additive, so each micro-batch's [[Sampling.sourceTokenCounts]] folds
  * into a keyed state table via the replay-idempotent
  * [[MvPipeline.upsert]]; the temperature reweighting
  * ([[Sampling.mixtureWeightsFromCounts]]) runs over the maintained
  * state — O(sources) rows — whenever weights are read.
  *
  * Why this matters at 100 TB: mixture weights steer SAMPLING of a live,
  * growing corpus; recomputing token totals per corpus refresh is a full
  * scan, while this folds each ingest batch once — the reference's
  * push-based MV economics applied to the training-data pipeline.
  */
object IncrementalMixture {

  /** Fold one micro-batch of documents into the per-source count state. */
  def processBatch(docs: DataFrame, stateDir: String, batchId: Long = -1L,
      sourceCol: String = "source", textCol: String = "text"): Unit =
    MvPipeline.upsert(Sampling.sourceTokenCounts(docs, sourceCol, textCol),
      s"$stateDir/mixture_counts", Seq(sourceCol), batchId)

  /** Current mixture weights over the maintained state — identical ppm
    * arithmetic to the batch [[Sampling.mixtureWeights]]. */
  def weights(spark: SparkSession, stateDir: String,
      sourceCol: String = "source"): DataFrame =
    Sampling.mixtureWeightsFromCounts(
      MvPipeline.readState(spark, stateDir, "mixture_counts"), sourceCol)

  /** Continuous maintenance over a directory of JSON-line document files. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String,
      sourceCol: String = "source", textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateDir, batchId, sourceCol, textCol)
      }
      .start()
}
