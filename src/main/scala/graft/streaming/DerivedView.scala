package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Maintained DERIVED keyed view — view-OVER-view maintenance
  * (SURVEY.md §2.11 R164): a REPLACE-per-key table whose rows are an
  * arbitrary per-key function of one or more MAINTAINED base views
  * (e.g. conversion rate = purchases-per-segment ÷ views-per-segment,
  * two independently-maintained aggregates), recomputed each batch for
  * ONLY the keys the base changelogs touched. This is the second-order
  * composition step the linear lattice (R155) cannot express: the
  * lattice folds ONE changelog under a projection; a derived view may
  * join several views and apply any per-key function, because
  * REPLACE-per-key semantics only need the POST-state base rows of the
  * touched keys — never the deltas themselves.
  *
  * Contract: the caller names the batch's TOUCHED KEYS (the union of
  * the base views' changelog keys for this batch — each family engine
  * exposes its changelog) and supplies the CURRENT derived rows for
  * those keys (computed from bucket-pruned base reads, e.g.
  * `viewFor(touched)`). Keys present in `touched` but absent from
  * `derivedRows` DROP their row (the base aggregate vanished). Rows
  * must be a deterministic function of the bases' POST-batch state —
  * true by construction, since bases commit before derived folds (the
  * cascade order), so a crash-replay recomputes identical rows.
  * State: one bucketed `derived/` table keyed by `g` under the
  * standard staged protocol (stamped buckets skip on replay).
  *
  * Cost per batch: O(touched keys), never O(state) — the derived rows
  * are the caller's bucket-pruned reads, and the REPLACE merge
  * rewrites only the touched keys' buckets. */
object DerivedView {

  /** Fold one batch: REPLACE the `touched` keys' rows with
    * `derivedRows` (both keyed by a `g` column; `derivedRows` may
    * carry any further value columns, fixed across batches). */
  def processBatch(spark: SparkSession, touched: DataFrame,
      derivedRows: DataFrame, stateDir: String, batchId: Long = -1L,
      numBuckets: Int = 16): Unit = {
    val path = s"$stateDir/derived"
    MvPipeline.upsertBucketedStaged(spark, path,
      computeDelta = derivedRows.withColumn("_present", lit(1L))
        .unionByName(touched.select(col("g")).distinct()
          .join(derivedRows.select("g"), Seq("g"), "left_anti")
          .select(Seq(col("g")) ++
            derivedRows.columns.filterNot(_ == "g").toSeq.map(c =>
              lit(null).cast(derivedRows.schema(c).dataType).as(c)) :+
            lit(0L).as("_present"): _*)),
      mergeFn = mergeReplace, batchId = batchId, numBuckets = numBuckets,
      bucketKeys = Seq("g"))
  }

  /** REPLACE merge: every key in the delta is rewritten; `_present = 0`
    * markers (vanished keys) drop the row. */
  private def mergeReplace(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("_present")) old.drop("_present") else old
    o.join(inc.select("g").distinct(), Seq("g"), "left_anti")
      .unionByName(inc.filter(col("_present") === 1L).drop("_present"))
  }

  /** Serve the derived view (empty until the first fold). */
  def view(spark: SparkSession, stateDir: String,
      schema: StructType): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/derived", schema)

  /** Bucket-pruned point read (the family contract). */
  def viewFor(spark: SparkSession, stateDir: String, groups: Seq[String],
      schema: StructType, numBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    val gdf = groups.toDF("g")
    val ids = MvPipeline.bucketIdsOf(gdf, Seq("g"), numBuckets)
    MvPipeline.readBuckets(spark, s"$stateDir/derived", ids, schema)
      .join(broadcast(gdf), Seq("g"), "left_semi")
  }

  // ------------------------------------------------------------------
  // REPLACE-per-key bases (r12): the monotone views — cluster labels,
  // funnel levels, dup-span stats, extrema — have no Z-set changelog,
  // so view-over-view composition used to stop at the changelog-bearing
  // family. The versioned ship (ChangelogShip.shipVersioned) already
  // computes exactly the needed touched-row set as a snapshot diff;
  // the same device, kept beside the DERIVED state instead of a sink
  // watermark, turns any REPLACE view into a derived-view trigger.
  // ------------------------------------------------------------------

  /** The CHANGED rows of a REPLACE-per-key base since the last
    * [[commitReplaceBase]]: rows that appeared or changed carry
    * `_side = "new"`, prior rows that changed or vanished carry
    * `_side = "old"` — so the caller sees BOTH coordinates of a moved
    * key (a doc that switched cluster touches its old AND new label).
    * Unchanged rows appear on neither side. Deterministic function of
    * (snapshot, view): bases commit before derived folds, and the
    * snapshot only advances in [[commitReplaceBase]] AFTER the derived
    * fold commits, so a crash replay recomputes the identical diff
    * (same protocol as the ship's re-shipped block).
    *
    * Cost, stated honestly: the diff is O(base served view) per batch —
    * two null-safe anti-joins between view and snapshot. That is the
    * price of a base with NO changelog (the monotone REPLACE views);
    * a base that can name its own touched keys should hand them to
    * [[processBatch]] directly (the R164 changelog trigger) and skip
    * this device. The derived recompute and writes stay O(changed
    * keys) either way. */
  def replaceBaseDiff(view: DataFrame, markerDir: String,
      table: String): DataFrame = {
    val spark = view.sparkSession
    val fs = new org.apache.hadoop.fs.Path(markerDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior = readSnapshot(spark, fs, markerDir, table)
      .getOrElse(view.limit(0))
    val changedNew = view.join(prior,
      view.columns.map(c => view(c) <=> prior(c)).reduce(_ && _), "left_anti")
    val changedOld = prior.join(view,
      prior.columns.map(c => prior(c) <=> view(c)).reduce(_ && _), "left_anti")
    changedNew.withColumn("_side", lit("new"))
      .unionByName(changedOld.withColumn("_side", lit("old")))
  }

  /** Commit the base snapshot AFTER the derived fold for this batch
    * committed — the rename-aside swap (ChangelogShip's protocol): a
    * crash anywhere re-enters with the OLD snapshot, the diff
    * recomputes identically, and the derived fold's stamped buckets
    * skip. */
  def commitReplaceBase(view: DataFrame, markerDir: String,
      table: String): Unit = {
    val spark = view.sparkSession
    val snap = new org.apache.hadoop.fs.Path(s"$markerDir/_snapshot_$table")
    val fs = snap.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new org.apache.hadoop.fs.Path(snap.toString + ".old")
    val tmp = new org.apache.hadoop.fs.Path(snap.toString + ".tmp")
    view.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(aside, true)
    if (fs.exists(snap)) require(fs.rename(snap, aside), s"stage out $snap")
    require(fs.rename(tmp, snap), s"commit snapshot $snap")
    fs.delete(aside, true)
  }

  private def readSnapshot(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, markerDir: String,
      table: String): Option[DataFrame] = {
    val snap = new org.apache.hadoop.fs.Path(s"$markerDir/_snapshot_$table")
    val aside = new org.apache.hadoop.fs.Path(snap.toString + ".old")
    if (!fs.exists(snap) && fs.exists(aside))
      require(fs.rename(aside, snap), s"recover snapshot $aside")
    if (fs.exists(snap)) Some(spark.read.parquet(snap.toString)) else None
  }
}
