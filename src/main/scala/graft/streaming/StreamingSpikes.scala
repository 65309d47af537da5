package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.TimeSeries

/** Streaming spike detection — the loop from reference MV to extension
  * analytics closed (VERDICT r5 task 8): [[TimeSeries.spikeStats]]
  * consumes the moral equivalent of the reference's `stats2` MV
  * (`/root/reference/README.md:103-129`, per-(key, 10-min-bucket) counts);
  * this maintains those bucket counts INCREMENTALLY, the way stats2
  * itself is maintained, and evaluates the spike decision over the
  * maintained state per micro-batch.
  *
  * Split of labor (mirrors the reference's MV-then-query architecture):
  *  - STATE: per-(type, bucket) counts are additive, so each micro-batch
  *    folds its [[TimeSeries.bucketCounts]] increment into a keyed state
  *    table via the replay-idempotent [[MvPipeline.upsert]] — the same
  *    no-watermark semantics as the 8 summaries (a late event still
  *    updates its OLD bucket, exactly like the reference).
  *  - DECISION: z-score flags need global per-type moments (n, s,
  *    Σcnt²), which are NOT incrementally composable from bucket deltas —
  *    but they are O(buckets) to recompute, and buckets ≪ events by
  *    construction. [[spikeStats]] runs the shared guarded int64 tail
  *    ([[TimeSeries.spikeStatsFromCounts]]) over the maintained state,
  *    so streaming and batch produce IDENTICAL flags (spec-pinned).
  *
  * 100 TB shape: the raw stream is scanned once per batch; state merge
  * shuffles O(types × touched buckets) counted rows; the decision pass
  * reads O(types × buckets) state rows, never events. */
object StreamingSpikes {

  /** Fold one micro-batch of events into the bucket-count state. */
  def processBatch(events: DataFrame, typeCol: String, tsNanosCol: String,
      minutes: Int, stateDir: String, batchId: Long = -1L): Unit =
    MvPipeline.upsert(TimeSeries.bucketCounts(events, typeCol, tsNanosCol, minutes),
      s"$stateDir/spike_buckets", Seq(typeCol, "bucket_start"), batchId)

  /** Spike flags over the maintained state — identical arithmetic to the
    * batch [[TimeSeries.spikeStats]] over the same events. */
  def spikeStats(spark: SparkSession, stateDir: String, typeCol: String): DataFrame =
    TimeSeries.spikeStatsFromCounts(
      MvPipeline.readState(spark, stateDir, "spike_buckets"), typeCol)

  /** Continuous maintenance over a directory of JSON-line event files. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String,
      typeCol: String = "event_type", tsNanosCol: String = "ts",
      minutes: Int = 10,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, typeCol, tsNanosCol, minutes, stateDir, batchId)
      }
      .start()
}
