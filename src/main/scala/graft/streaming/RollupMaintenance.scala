package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Maintained ROLLUP LATTICE over a Z-set changelog (SURVEY.md §2.11
  * R155): coarser grouping-set aggregates of an incrementally-
  * maintained view, themselves maintained incrementally — from the
  * view's OWN changelog, never from the facts.
  *
  * The reference's storage layer expresses this as chained
  * materialized views (per-10-min summary → per-hour → per-day; the
  * `mv_*` cascade pattern of `/root/reference/README.md:24-189`),
  * each re-aggregating the finer table's inserts. Here the finer view
  * is a Z-set view (R145-R150): its changelog rows `(g, Δm, Δc)` are
  * signed, and every grouping-set projection of a signed sum is again
  * a signed sum — a LINEAR map commutes with the Z-set integral. So a
  * coarser view folds the SAME changelog delta under a projected
  * group key, and retractions (fact deletes, dim re-keys three joins
  * away) propagate through the whole lattice for free. Per-batch cost
  * is O(changelog Δ × lattice size) — the facts are never re-read,
  * and each rollup fold touches only the buckets its projected groups
  * hash into.
  *
  * The base view's multi-attribute group key is the family's
  * `\u0001`-joined concat (IncrementalJoinAggStar's group contract);
  * a grouping set is a subset of attribute POSITIONS (0-based) of
  * that tuple — `Seq()` is the grand total. State per set under
  * `rollupDir/s<i1>_<i2>.../` (`total` for the empty set): additive
  * `(g, m, c)` bucketed by g, zero rows purged at merge.
  *
  * Replay: the fold is a deterministic function of the base view's
  * COMMITTED changelog rows for `batchId`, so the per-bucket markers
  * make redelivery converge (the standard protocol). Run it after the
  * base `processBatch` commits, inside the same foreachBatch. Base
  * changelog compaction must not cross a batch the lattice has not
  * folded yet (compaction folds the prefix into one baseline row,
  * erasing per-batch attribution). */
object RollupMaintenance {

  private val rSchema = StructType(Seq(
    StructField("g", StringType), StructField("m", LongType),
    StructField("c", LongType)))

  /** Directory name of a grouping set. */
  def setName(set: Seq[Int]): String =
    if (set.isEmpty) "total" else "s" + set.mkString("_")

  /** Fold batch `batchId` of [[IncrementalJoinAggStar]]'s changelog at
    * `baseStateDir` into every rollup table. */
  def processStarBatch(spark: SparkSession, baseStateDir: String,
      rollupDir: String, sets: Seq[Seq[Int]], batchId: Long,
      numBuckets: Int = 16): Unit =
    processBatch(
      IncrementalJoinAggStar.changelog(spark, baseStateDir)
        .filter(col("batch") === batchId)
        .select(col("g"), col("dtotal").as("m"), col("drows").as("c")),
      rollupDir, sets, batchId, numBuckets)

  /** Fold one batch's signed changelog rows `(g, m, c)` into every
    * grouping-set table. `sets` indices must lie inside the base
    * view's group-tuple arity (an out-of-range index projects null and
    * would silently collapse groups — caller contract). */
  def processBatch(delta: DataFrame, rollupDir: String,
      sets: Seq[Seq[Int]], batchId: Long, numBuckets: Int = 16): Unit = {
    require(batchId >= 0, "rollup folds are batch-driven (batchId >= 0)")
    require(sets.nonEmpty && sets.forall(s => s.forall(_ >= 0) && s.distinct == s),
      "each grouping set: distinct non-negative positions")
    val d = delta.persist()
    try {
      val parts = split(col("g"), "\u0001")
      MvPipeline.applyConcurrently(sets.map { set => () =>
        val proj = d.select(
            concat_ws("\u0001", set.map(i => parts.getItem(i)): _*).as("g"),
            col("m"), col("c"))
          .groupBy("g").agg(sum("m").as("m"), sum("c").as("c"))
        MvPipeline.upsertBucketedMerge(proj, s"$rollupDir/${setName(set)}",
          mergeAdd, batchId, numBuckets, bucketKeys = Seq("g"))
      })
    } finally d.unpersist()
  }

  private def mergeAdd(old: DataFrame, nw: DataFrame): DataFrame = {
    val o = old.columns.foldLeft(old)((df, c) => df.withColumnRenamed(c, s"o_$c"))
    o.join(nw, col("o_g") === col("g"), "full_outer")
      .select(coalesce(col("o_g"), col("g")).as("g"),
        (coalesce(col("o_m"), lit(0L)) + coalesce(col("m"), lit(0L))).as("m"),
        (coalesce(col("o_c"), lit(0L)) + coalesce(col("c"), lit(0L))).as("c"))
      .filter(col("m") =!= 0 || col("c") =!= 0)
  }

  /** Serve one rollup: `(g, total, rows)` over groups with live rows. */
  def view(spark: SparkSession, rollupDir: String, set: Seq[Int]): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark,
        s"$rollupDir/${setName(set)}", rSchema)
      .filter(col("c") > 0)
      .select(col("g"), col("m").as("total"), col("c").as("rows"))
}
