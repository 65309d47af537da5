package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuously-maintained heavy hitters — the streaming form of
  * [[graft.expressions.FreqAggExpr]]'s Misra-Gries summary: state is the
  * ≤k-row (item, est) table itself; each micro-batch folds its own MG
  * summary in with the mergeable-summaries rule expressed RELATIONALLY
  * (union → sum per item → if over k rows, subtract the (k+1)-th largest
  * estimate and drop non-positive — a window over ≤2k rows, trivial).
  * The deterministic error bound survives: after N tokens total, every
  * item above n/(k+1) is present and estimates sit within n/(k+1) of
  * truth, regardless of how the stream was batched.
  *
  * 100 TB shape: per batch one MG aggregation over the batch (O(k)
  * reducer state) + a merge over ≤2k state rows. The state table is KBs
  * forever — the entire point of a frequency sketch. */
object IncrementalHeavyHitters {

  /** Fold one micro-batch of items (string column `itemCol`) into the
    * ≤k-row summary state. */
  def processBatch(items: DataFrame, itemCol: String, stateDir: String,
      k: Int, batchId: Long = -1L): Unit = {
    val summary = items
      .filter(col(itemCol).isNotNull)
      .agg(graft.functions.heavyHitters(col(itemCol), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
    MvPipeline.upsertMerge(summary, s"$stateDir/heavy_hitters",
      (old, inc) => mgMerge(old, inc, k), batchId)
  }

  /** The mergeable-summaries combine over two ≤k-row summaries. */
  private def mgMerge(old: DataFrame, inc: DataFrame, k: Int): DataFrame = {
    val combined = old.unionByName(inc)
      .groupBy("item").agg(sum("est").as("est"))
    val ranked = combined.withColumn("rk",
      row_number().over(Window.partitionBy(lit(1)).orderBy(desc("est"), asc("item"))))
    // (k+1)-th largest estimate — 0 when ≤ k rows survive
    val sub = coalesce(
      max(when(col("rk") === k + 1, col("est"))), lit(0L))
    ranked
      .crossJoin(broadcast(ranked.agg(sub.as("sub"))))
      .filter(col("rk") <= k && col("est") - col("sub") > 0L)
      .select(col("item"), (col("est") - col("sub")).as("est"))
  }

  /** Current summary, sorted (est desc, item asc). */
  def summary(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readState(spark, stateDir, "heavy_hitters")
      .orderBy(desc("est"), asc("item"))

  /** Continuous maintenance over JSON-line files with `schema`; items
    * are the whitespace tokens of `textCol`. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String, textCol: String = "text",
      k: Int = 64, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(
          batch.select(explode(graft.operators.TextOps.tokens(col(textCol))).as("item"))
            .filter(col("item") =!= ""),
          "item", stateDir, k, batchId)
      }
      .start()
}
