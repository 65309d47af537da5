package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Bitmaps

/** Continuously-maintained exact distinct-set bitmaps — the streaming
  * form of [[graft.operators.Bitmaps]] (ClickHouse `groupBitmapState`
  * maintained by a summing MV). State is (g, word, bits); the merge is
  * per-word OR — commutative, associative and IDEMPOTENT, the strongest
  * convergence in the incremental family: even an increment applied
  * twice (at-least-once delivery without the batch-id marker) leaves the
  * state exactly equal to the batch recompute, because x|x = x. The
  * marker protocol still skips true replays; idempotence is defense in
  * depth, and the spec asserts it directly.
  *
  * 100 TB shape: per batch one (g, word) aggregation over the BATCH
  * (map-side OR combine), then a merge of O(batch words) rows into
  * state; state is one int64 per 63 members per group forever. Reads
  * (cardinality, intersections) are joins over state — the fact stream
  * is never rescanned. */
object IncrementalBitmap {

  /** Fold one micro-batch into the per-(group, word) bitmap state. */
  def processBatch(df: DataFrame, groupCol: String, idCol: String,
      stateDir: String, batchId: Long = -1L): Unit =
    MvPipeline.upsertWith(Bitmaps.bitmapState(df, groupCol, idCol),
      s"$stateDir/bitmap", Seq("g", "word"), c => bit_or(col(c)), batchId)

  /** The maintained state, for the [[Bitmaps]] reads. */
  def state(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readState(spark, stateDir, "bitmap")

  /** Continuous maintenance over JSON-line files with `schema`. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String,
      groupCol: String, idCol: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, groupCol, idCol, stateDir, batchId)
      }
      .start()
}
