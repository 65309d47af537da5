package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export a Z-set changelog to an external sink — connecting the
  * engine's maintained views to the reference's storage model: a
  * ClickHouse SummingMergeTree folds APPENDED signed increments at
  * merge time, so shipping the changelog (not the materialized view) is
  * the contract that lets the external table converge to the view with
  * append-only writes — retractions travel as −1-weighted rows, exactly
  * what the reference engine family's summing tables consume.
  *
  * Delivery contract, stated honestly: the ship is AT-LEAST-ONCE with
  * DETERMINISTIC batch blocks, which composes to exactly-once because a
  * changelog carries at most ONE row per (batch, key) — the watermark
  * marker advances only after the sink append returns, so a crash
  * between the two re-ships the same rows byte-identically, and the
  * duplicate blocks are removable downstream by (batch, key): ClickHouse
  * dedups identical insert blocks natively (`insert_deduplication`) or
  * via ReplacingMergeTree ORDER BY (batch, key); a warehouse without
  * either reads through `SELECT DISTINCT` / row_number-per-(batch, key)
  * (the spec's Derby reader does). For an idempotent sink this is plain
  * exactly-once.
  *
  * Interplay with changelog COMPACTION: compact only up to batches
  * already shipped — the baseline row is stamped at the floor, so with
  * floor ≤ watermark it never ships (the already-shipped history it
  * folds is already downstream). Compacting ABOVE the watermark would
  * ship a baseline that double-counts shipped prefixes. */
object ChangelogShip {

  /** Ship every changelog row with `batchCol` above the stored watermark
    * to `sink.table`, then advance the watermark (tmp + rename). Returns
    * rows shipped (0 = nothing pending). Single shipper per
    * (markerDir, table), the MvPipeline writer contract. */
  def ship(changelog: DataFrame, batchCol: String, sink: GraftSink,
      table: String, markerDir: String): Long = {
    val spark = changelog.sparkSession
    val marker = new Path(s"$markerDir/_shipped_$table")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = readWatermark(fs, marker)
    val pending = changelog.filter(col(batchCol) > last)
      .transform(graft.operators.Caching.persisted)
    try {
      val stats = pending.agg(count(lit(1)), max(col(batchCol))).collect().head
      val n = stats.getLong(0)
      if (n == 0) return 0L
      sink.write(pending, table)
      // advance the watermark by rename-ASIDE (never delete-then-rename):
      // a crash anywhere in this window leaves either the new marker or
      // the old one recoverable from `.old` (readWatermark restores it),
      // so the worst-case re-ship is the LAST block — never the whole
      // changelog from batch −1
      val tmp = new Path(s"$markerDir/_shipped_$table.tmp")
      val out = fs.create(tmp, true)
      try out.write(stats.getLong(1).toString.getBytes("UTF-8")) finally out.close()
      val aside = new Path(s"$markerDir/_shipped_$table.old")
      fs.delete(aside, true)
      if (fs.exists(marker)) require(fs.rename(marker, aside), s"stage out $marker")
      if (!fs.rename(tmp, marker)) {
        if (fs.exists(aside)) require(fs.rename(aside, marker), s"restore $aside")
        throw new IllegalStateException(s"advance watermark $marker failed; prior restored")
      }
      fs.delete(aside, true)
      n
    } finally graft.operators.Caching.releaseAll()
  }

  /** The last shipped batch id (−1 = nothing shipped yet). */
  def watermark(spark: SparkSession, markerDir: String, table: String): Long = {
    val marker = new Path(s"$markerDir/_shipped_$table")
    readWatermark(marker.getFileSystem(spark.sparkContext.hadoopConfiguration), marker)
  }

  /** VERSIONED ship for REPLACE-semantics views (R152): the monotone
    * views' outputs — cluster labels, funnel levels, dup-span stats —
    * REPLACE per key rather than sum, so a summing sink cannot consume
    * them. This mode ships `(key…, value…, version, is_deleted)` rows
    * that a ClickHouse `ReplacingMergeTree(version, is_deleted)` (or
    * any latest-version-wins reader) converges on: per key the highest
    * shipped version is the truth, `is_deleted = 1` removes the key
    * (the forget path travels too).
    *
    * What ships is the DIFF of the served view against the last-shipped
    * snapshot kept next to the watermark (`_snapshot_<table>`): changed
    * or new rows ship with the caller's `version` stamp; keys present
    * in the snapshot but gone from the view ship as deletion markers.
    * The block is a deterministic function of (snapshot, view), so the
    * delivery contract is the same at-least-once + downstream-dedup =
    * exactly-once composition as [[ship]]: a crash between the sink
    * append and the snapshot/watermark advance re-ships the SAME block
    * (latest-version-wins folds the duplicates); a crash between the
    * snapshot swap and the watermark advance re-enters with an empty
    * diff and just advances the watermark. `version` must increase
    * across calls (a call at or below the watermark is a no-op).
    * Returns rows shipped. */
  def shipVersioned(view: DataFrame, keyCols: Seq[String], sink: GraftSink,
      table: String, markerDir: String, version: Long): Long = {
    val spark = view.sparkSession
    val marker = new Path(s"$markerDir/_shipped_v_$table")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = readWatermark(fs, marker)
    if (version <= last) return 0L
    val snap = new Path(s"$markerDir/_snapshot_$table")
    val snapAside = new Path(snap.toString + ".old")
    if (!fs.exists(snap) && fs.exists(snapAside))
      require(fs.rename(snapAside, snap), s"recover snapshot $snapAside")
    val cur = view.transform(graft.operators.Caching.persisted)
    try {
      val valCols = cur.columns.filterNot(keyCols.contains).toSeq
      val prior =
        (if (fs.exists(snap)) spark.read.parquet(snap.toString) else cur.limit(0))
          .transform(graft.operators.Caching.persisted)
      val upserts = cur.join(prior,
        cur.columns.map(c => cur(c) <=> prior(c)).reduce(_ && _), "left_anti")
      val deletes = prior.select(keyCols.map(col): _*)
        .join(cur.select(keyCols.map(col): _*), keyCols, "left_anti")
      val block = upserts.select(keyCols.map(col) ++ valCols.map(col) ++
          Seq(lit(version).as("version"), lit(0L).as("is_deleted")): _*)
        .unionByName(deletes.select(keyCols.map(col) ++
          valCols.map(c => lit(null).cast(cur.schema(c).dataType).as(c)) ++
          Seq(lit(version).as("version"), lit(1L).as("is_deleted")): _*))
        .transform(graft.operators.Caching.persisted)
      val n = block.count()
      if (n > 0) {
        sink.write(block, table)
        // snapshot swap under the rename-aside protocol — a crash here
        // re-ships the identical block on re-entry (snapshot unchanged)
        val tmp = new Path(snap.toString + ".tmp")
        cur.write.mode("overwrite").parquet(tmp.toString)
        fs.delete(snapAside, true)
        if (fs.exists(snap)) require(fs.rename(snap, snapAside), s"stage out $snap")
        require(fs.rename(tmp, snap), s"commit snapshot $snap")
        fs.delete(snapAside, true)
      }
      // advance the watermark even for an empty diff (version consumed)
      val tmpM = new Path(marker.toString + ".tmp")
      val out = fs.create(tmpM, true)
      try out.write(version.toString.getBytes("UTF-8")) finally out.close()
      val mAside = new Path(marker.toString + ".old")
      fs.delete(mAside, true)
      if (fs.exists(marker)) require(fs.rename(marker, mAside), s"stage out $marker")
      if (!fs.rename(tmpM, marker)) {
        if (fs.exists(mAside)) require(fs.rename(mAside, marker), s"restore $mAside")
        throw new IllegalStateException(s"advance watermark $marker failed; prior restored")
      }
      fs.delete(mAside, true)
      n
    } finally graft.operators.Caching.releaseAll()
  }

  /** The last shipped REPLACE-mode version (−1 = nothing shipped). */
  def versionWatermark(spark: SparkSession, markerDir: String, table: String): Long = {
    val marker = new Path(s"$markerDir/_shipped_v_$table")
    readWatermark(marker.getFileSystem(spark.sparkContext.hadoopConfiguration), marker)
  }

  private def readWatermark(fs: org.apache.hadoop.fs.FileSystem, marker: Path): Long = {
    // crash recovery: a marker staged aside but never replaced means the
    // advance died mid-swap — restore it (degrades to re-shipping only
    // the last block, which downstream dedup folds)
    val aside = new Path(marker.toString + ".old")
    if (!fs.exists(marker) && fs.exists(aside))
      require(fs.rename(aside, marker), s"recover watermark $aside")
    if (!fs.exists(marker)) -1L
    else {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }
}
