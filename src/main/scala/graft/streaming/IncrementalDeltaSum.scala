package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Incremental maintenance of [[TimeSeries.deltaSum]]'s per-day span
  * states — the streaming member of the deltaSum family (SURVEY R91).
  *
  * The state per `(k, day)` is the associative span tuple
  * `(n, first_t, first_id, first_v, last_t, last_id, last_v, inner)`;
  * two NON-INTERLEAVED spans merge as
  * `inner(a⊕b) = inner(a) + inner(b) + max(0, first_v(b) − last_v(a))`
  * with `a` the span whose `(first_t, first_id)` is smaller — so the
  * merge itself decides the order and stays associative-in-effect over
  * time-ordered arrivals. CONTRACT: within a `(k, day)`, later batches
  * carry later `(t, id)` than earlier ones (the log-tail ingestion shape
  * this engine streams from); interleaved arrival would need row-level
  * replay and is exactly what the artifact exists to avoid. Reads fold
  * the O(keys × days) state with [[TimeSeries.deltaSumFromDayStates]] —
  * never a stream rescan.
  */
object IncrementalDeltaSum {

  /** The per-(k, day) span tuple of one micro-batch. */
  def batchStates(rows: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy("k", "day").orderBy("t", "id")
    val wd = Window.partitionBy("k", "day").orderBy(col("t").desc, col("id").desc)
    rows.select(col(keyCol).as("k"), col(tsCol).as("t"), col(idCol).as("id"),
        col(valCol).as("v"))
      .withColumn("day", expr("t DIV 86400000000"))
      .withColumn("prev", lag(col("v"), 1).over(w))
      .withColumn("step", when(col("prev").isNull, lit(0L))
        .otherwise(greatest(col("v") - col("prev"), lit(0L))))
      .withColumn("rn_a", row_number().over(w))
      .withColumn("rn_d", row_number().over(wd))
      .groupBy("k", "day")
      .agg(count(lit(1)).as("n"),
        max(when(col("rn_a") === 1, col("t"))).as("first_t"),
        max(when(col("rn_a") === 1, col("id"))).as("first_id"),
        max(when(col("rn_a") === 1, col("v"))).as("first_v"),
        max(when(col("rn_d") === 1, col("t"))).as("last_t"),
        max(when(col("rn_d") === 1, col("id"))).as("last_id"),
        max(when(col("rn_d") === 1, col("v"))).as("last_v"),
        sum(col("step")).as("inner"))
  }

  /** Fold one micro-batch into the span state. The merge joins old and
    * new spans per `(k, day)`, orders them by `(first_t, first_id)`, and
    * applies the bridge rule — a plain projection over the joined row,
    * no window, no rescan. */
  def processBatch(rows: DataFrame, stateDir: String, keyCol: String,
      tsCol: String, idCol: String, valCol: String,
      batchId: Long = -1L): Unit = {
    val inc = batchStates(rows, keyCol, tsCol, idCol, valCol)
    MvPipeline.upsertMerge(inc, s"$stateDir/delta_day", (old, nw) => {
      val o = old.columns.foldLeft(old)((d, c) => d.withColumnRenamed(c, s"o_$c"))
      val j = o.join(nw,
        col("o_k") === col("k") && col("o_day") === col("day"), "full_outer")
      // span order by (first_t, first_id): a = earlier, b = later
      val bothExist = col("o_n").isNotNull && col("n").isNotNull
      val oldFirst = struct(col("o_first_t"), col("o_first_id")) <
        struct(col("first_t"), col("first_id"))
      def pick(first: Boolean, oc: String, nc: String) = {
        val merged = if (first) when(oldFirst, col(oc)).otherwise(col(nc))
        else when(oldFirst, col(nc)).otherwise(col(oc))
        when(!bothExist, coalesce(col(oc), col(nc))).otherwise(merged)
      }
      val bridge = when(!bothExist, lit(0L)).otherwise(
        when(oldFirst,
          greatest(col("first_v") - col("o_last_v"), lit(0L)))
          .otherwise(greatest(col("o_first_v") - col("last_v"), lit(0L))))
      j.select(
        coalesce(col("o_k"), col("k")).as("k"),
        coalesce(col("o_day"), col("day")).as("day"),
        (coalesce(col("o_n"), lit(0L)) + coalesce(col("n"), lit(0L))).as("n"),
        pick(first = true, "o_first_t", "first_t").as("first_t"),
        pick(first = true, "o_first_id", "first_id").as("first_id"),
        pick(first = true, "o_first_v", "first_v").as("first_v"),
        pick(first = false, "o_last_t", "last_t").as("last_t"),
        pick(first = false, "o_last_id", "last_id").as("last_id"),
        pick(first = false, "o_last_v", "last_v").as("last_v"),
        (coalesce(col("o_inner"), lit(0L)) + coalesce(col("inner"), lit(0L)) +
          bridge).as("inner"))
    }, batchId)
  }

  /** Current per-key deltaSum served from the maintained day states. */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    TimeSeries.deltaSumFromDayStates(
      MvPipeline.readState(spark, stateDir, "delta_day"), "k")
}
