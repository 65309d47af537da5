package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance for the map-combinator family (R75:
  * sumMap/minMap/maxMap) — the EXPLODED entry rows are the mergeable
  * artifact: state is one row per (group, map-key) carrying a SUM-,
  * MIN- and MAX-measure, each abelian (order-free, replay-safe under
  * the marker protocol), so micro-batches fold with one
  * `upsertWith` and never materialize a map in state. The map shape
  * exists only at READ time, where [[graft.functions.mapAgg]] runs the
  * IDENTICAL key-sorted assembly as the batch operator — state-served
  * maps are bit-identical to batch maps.
  *
  * At 100 TB: state size is O(groups × live map keys) rows of 4 int64s
  * — the same economics as the reference's SummingMergeTree maps;
  * per-batch cost is one Δ-sized aggregation + the keyed upsert (or the
  * bucketed O(Δ) variant for big key spaces).
  */
object IncrementalMapAgg {

  private val table = "map_entries"

  /** Aggregate one micro-batch to (group, map-key) entry deltas and fold
    * them into state. */
  def processBatch(rows: DataFrame, stateDir: String, groupCol: String,
      mapKeyCol: String, value: Column, batchId: Long = -1L): Unit = {
    val inc = rows
      .select(col(groupCol).as("g"), col(mapKeyCol).as("mk"), value.as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "mk")
      .agg(sum("v").as("s_sum"), min("v").as("s_min"), max("v").as("s_max"))
    MvPipeline.upsertWith(inc, s"$stateDir/$table", Seq("g", "mk"), {
      case "s_sum" => sum(col("s_sum"))
      case "s_min" => min(col("s_min"))
      case "s_max" => max(col("s_max"))
      case other   => throw new IllegalArgumentException(other)
    }, batchId)
  }

  /** Current sumMap/minMap/maxMap served from state — the same
    * key-sorted [[graft.functions.mapAgg]] read as the batch operator. */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readState(spark, stateDir, table)
      .groupBy("g")
      .agg(graft.functions.mapAgg(col("mk"), col("s_sum")).as("sum_map"),
        graft.functions.mapAgg(col("mk"), col("s_min")).as("min_map"),
        graft.functions.mapAgg(col("mk"), col("s_max")).as("max_map"))
}
