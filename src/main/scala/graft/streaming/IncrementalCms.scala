package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Sketches

/** Continuously-maintained Count-Min sketch — the simplest member of the
  * incremental-sketch family: counters are ADDITIVE, so the state fold
  * is the plain summed [[MvPipeline.upsert]] on (i, pos) and the
  * maintained sketch equals the batch [[Sketches.countMin]] EXACTLY
  * under any batching (no trim rule, no order sensitivity — spec
  * asserts counter-for-counter equality). State ≤ d·w rows forever. */
object IncrementalCms {

  /** Fold one micro-batch of values into the counter state. */
  def processBatch(df: DataFrame, valueCol: String, stateDir: String,
      d: Int = 4, w: Int = 256, batchId: Long = -1L): Unit =
    MvPipeline.upsert(Sketches.countMin(df, valueCol, d, w),
      s"$stateDir/cms", Seq("i", "pos"), batchId)

  /** Point estimates for `probes` against the maintained state. */
  def estimate(spark: SparkSession, stateDir: String, probes: DataFrame,
      valueCol: String, d: Int = 4, w: Int = 256): DataFrame =
    Sketches.countMinEstimate(
      MvPipeline.readState(spark, stateDir, "cms"), probes, valueCol, d, w)

  /** Continuous maintenance over JSON-line files: items are the
    * whitespace tokens of `textCol`. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String, textCol: String = "text",
      d: Int = 4, w: Int = 256,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{col, explode}
        processBatch(
          batch.select(explode(graft.operators.TextOps.tokens(col(textCol))).as("item"))
            .filter(col("item") =!= ""),
          "item", stateDir, d, w, batchId)
      }
      .start()
}
