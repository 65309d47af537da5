package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.functions.{md5Hash64, unitInterval}

/** Continuously-maintained KMV distinct sketch — the streaming form of
  * [[graft.operators.Sketches.kmvDistinct]], completing the sketch
  * family's incremental story (Misra-Gries: [[IncrementalHeavyHitters]];
  * KMV: here; HLL/t-digest stay Spark-internal): state is each group's
  * ≤k smallest hash positions, and the KMV union rule — keep the k
  * smallest of the union of distinct hashes — is ORDER-FREE, so any
  * batching of the stream converges to the batch sketch EXACTLY (not
  * just within bounds: the spec asserts equality, hash for hash).
  *
  * The estimate reads off the maintained state: (k−1)/u₍ₖ₎, exact kept
  * count under k — identical arithmetic to the batch operator.
  *
  * 100 TB shape: per batch one distinct-hash aggregation over the BATCH
  * (shuffle = batch distinct hashes) + a merge over ≤2k rows per group;
  * state is k×16 bytes per group forever. */
object IncrementalKmv {

  /** Fold one micro-batch into the per-group k-smallest-positions state. */
  def processBatch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      stateDir: String, k: Int = 64, batchId: Long = -1L): Unit = {
    val inc = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ md5Hash64(col(valueCol).cast("string")).as("h"): _*)
      .distinct()
      .withColumn("u", unitInterval(col("h")))
      .transform(keepKSmallest(groupCols, k))
    MvPipeline.upsertMerge(inc, s"$stateDir/kmv",
      (old, batch) => keepKSmallest(groupCols, k)(
        // union may repeat a hash seen in an earlier batch: DISTINCT first
        // (KMV is defined over the distinct hash set)
        old.unionByName(batch).distinct()),
      batchId)
  }

  private def keepKSmallest(groupCols: Seq[String], k: Int)(df: DataFrame): DataFrame =
    df.withColumn("_rk", row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(col("u"), col("h"))))
      .filter(col("_rk") <= k)
      .drop("_rk")

  /** The estimate over the maintained state — identical arithmetic to
    * the batch [[graft.operators.Sketches.kmvDistinct]]. */
  def estimate(spark: SparkSession, stateDir: String, groupCols: Seq[String],
      k: Int = 64): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("u"), col("h"))
    MvPipeline.readState(spark, stateDir, "kmv")
      .withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(groupCols.map(col): _*)))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("_n")).cast("long").as("sketch_n"),
        max(when(col("_rk") === k, col("u"))).as("uk"))
      .select(groupCols.map(col) :+
        col("sketch_n") :+
        when(col("sketch_n") < k, col("sketch_n").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("uk"))
          .as("approx_distinct"): _*)
  }

  /** Continuous maintenance over JSON-line files with `schema`. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String,
      groupCols: Seq[String], valueCol: String, k: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, groupCols, valueCol, stateDir, k, batchId)
      }
      .start()
}
