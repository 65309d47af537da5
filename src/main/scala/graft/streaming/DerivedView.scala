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
    MvPipeline.assertReadLayout(spark, s"$stateDir/derived", numBuckets, 1,
      "derived viewFor")
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
    * this device — and the clusterers now CAN: their folds stage a
    * per-batch [[MovedLog]] artifact (R176, `movedDir`), the O(moved)
    * trigger that retires this diff for the label family. The derived
    * recompute and writes stay O(changed keys) either way. */
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

/** MOVED-KEYS LOG (R176) — the O(moved) derived-view trigger for the
  * REPLACE-per-key bases, retiring the [[DerivedView.replaceBaseDiff]]
  * snapshot diff's O(served base view) per-batch cost (two anti-joins +
  * a full snapshot rewrite even when nothing moved). A base fold that
  * KNOWS which keys it moved — the clusterers' label deltas are exactly
  * that set — stages a durable per-op artifact `(id, old, new)` naming
  * BOTH coordinates of every moved row ([[MvPipeline.stageArtifact]]
  * inside the staged fold, so the artifact is written from PRE-batch
  * state before any bucket applies and a crash-replay finds it
  * byte-identical). The derived consumer reads ALL pending artifacts,
  * recomputes its rows for the touched keys, and sweeps the artifacts
  * only after its own fold committed.
  *
  * Consumer contract — AT-LEAST-ONCE, and that is CORRECT here: a
  * derived row is a deterministic function of the base's POST-state for
  * its key, so re-consuming an artifact (crash between the derived
  * commit and the sweep; a base replay re-staging a post-state-computed
  * artifact, which is empty or a subset) recomputes rows that are
  * already right — idempotence comes from recompute-from-post-state,
  * not from exactly-once delivery. One log dir per (BASE VIEW,
  * consumer) pair: the sweep is destructive (fan-out wants one dir per
  * consumer — [[IncrementalNearDup.processBatch]] takes the dir, not a
  * flag), and [[pending]] unions EVERY artifact in the dir under one
  * schema, so two base views sharing a dir would collide on batch-id
  * artifact names (exists-skip silently dropping one view's moves) and
  * mix id columns. The media engine additionally qualifies its
  * artifact names by view so its two folds fail safe, but the contract
  * stands: distinct views, distinct dirs.
  *
  * Cost: the trigger is O(moved keys) per batch — the artifact IS the
  * touched set — versus the snapshot diff's O(view). Bases that cannot
  * name their moved keys keep [[DerivedView.replaceBaseDiff]]. */
object MovedLog {

  /** Artifact path for a streaming fold (`_moved_b<id>`), a forget op
    * (`_moved_f<id>`), or ad-hoc (unique name; exactly-once only within
    * the one call that created it). */
  def artifactPath(movedDir: String, kind: String, id: Long): String =
    if (id >= 0) s"$movedDir/_moved_$kind$id"
    else s"$movedDir/_moved_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"

  /** Every pending moved row across the un-swept artifacts (empty frame
    * of `schema` when none). Re-listing per call — the consumer runs
    * between folds (single-writer discipline). */
  def pending(spark: SparkSession, movedDir: String,
      schema: StructType): DataFrame = {
    val names = pendingArtifacts(spark, movedDir)
    if (names.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(names: _*)
  }

  /** The un-swept artifact dirs (sorted for deterministic reads).
    * A `.tmp` staging leftover (crash mid-[[MvPipeline.stageArtifact]],
    * before the rename) is NOT pending — it is partial bytes the next
    * staging attempt overwrites; listing it would hand the consumer a
    * truncated parquet. */
  def pendingArtifacts(spark: SparkSession, movedDir: String): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(movedDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Nil
    else fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_moved_") &&
        !s.getPath.getName.endsWith(".tmp"))
      .map(_.getPath.toString).sorted.toSeq
  }

  /** Sweep CONSUMED artifacts — call only AFTER the consuming fold
    * committed. `upTo` bounds the sweep to the artifacts the consumer
    * actually read (an artifact staged by a concurrent later base fold
    * must survive); pass [[pendingArtifacts]]' result from before the
    * fold. */
  def sweep(spark: SparkSession, movedDir: String,
      consumed: Seq[String]): Unit = {
    if (consumed.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(movedDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    consumed.foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }
}
