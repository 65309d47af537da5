package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Deletion-EXACT unclustering for the streaming near-dup family — the
  * "right to be forgotten" / curation-delete operation (SURVEY.md §2.11
  * R147): remove a set of docs from a maintained clustering so that the
  * served labels equal the batch sweep over corpus-minus-forgotten.
  *
  * Forgetting is the one maintenance direction the monotone min-label
  * lattice cannot absorb: deleting a component's bridge doc SPLITS the
  * component, and deleting its min-id representative RAISES the
  * survivors' labels — both impossible under the per-key `min` merge the
  * batch folds use. This pass therefore runs outside the lattice, with
  * tombstone + REPLACE merges (both idempotent, so crash-replay under
  * the staged delta converges like every other fold).
  *
  * Exactness WITHOUT retained edges — the load-bearing argument: the
  * affected components' surviving members still hold their blocking rows
  * (bands / LSH buckets / hash chunks) and payload rows (gram hashes /
  * vectors / 64-bit hashes), so component-internal edges are RE-DERIVED:
  * candidates = blocking collisions among survivors, verified by the
  * SAME exact kernel as the folds. The re-derived candidate set equals
  * the original one restricted to survivors (blocking rows are
  * immutable), verification is deterministic, and a surviving pair
  * crossing into a DIFFERENT component is impossible (it would have
  * collided and verified when folded, merging the components then) — so
  * connected components over the re-derived edges are exactly the batch
  * clustering of the surviving docs, and untouched components need no
  * work at all.
  *
  * Horizon contract: exact only while the affected components' SURVIVORS
  * are live (un-compacted). A survivor whose payload rows were dropped
  * by retention compaction makes the split undecidable — the pass THROWS
  * rather than guess (forgetting a FULLY-frozen component, or a frozen
  * singleton, is still fine: pure tombstones, no relabel needed).
  *
  * Per-op cost: writes are O(affected components) — they touch the
  * forgotten and relabeled docs' buckets and the forgotten blocking
  * rows' mirror buckets — but the label projection at the top reads
  * the (kind, id, label) COLUMNS of every bucket of the main state
  * table, which is O(total state rows), not O(affected): mapping the
  * forgotten ids to their current components needs the id→label map,
  * and no id-bucketing prunes a probe by label. Parquet column pruning
  * keeps this to the three slim columns (the payload columns — vectors,
  * gram hashes — are never read), the same projection the folds pay
  * per batch; if forgets ever dominate, the upgrade is a label-only
  * side projection (or kind-partitioned layout) maintained like the
  * mirrors. Crash recovery: re-call with the same `opId` — the staged
  * delta is reused byte-identically; with the default ad-hoc id, a crash
  * mid-apply needs the SAME semantics re-requested (merges are
  * idempotent, so re-running the whole forget converges too — it just
  * recomputes the delta, which is safe here because a partially-applied
  * forget only ever has FEWER rows to act on). */
object ForgetMaintenance {

  /** Shared forget pass. `ids` is a 1-column frame of doc ids (any
    * numeric type). View-specific behavior arrives as closures over
    * STATE-SCHEMA frames: `candidates` re-derives blocking collisions
    * among the survivor rows it is given; `verify` applies the view's
    * exact kernel; `packL` lifts `(idCol, label)` rows back to state
    * rows; `mirrorOf` projects the forgotten docs' blocking rows to the
    * mirror table's shape. Returns the number of docs actually forgotten
    * (unknown ids are ignored). */
  def forget(spark: SparkSession, ids: DataFrame,
      path: String, bidxPath: String, idCol: String,
      stateSchema: org.apache.spark.sql.types.StructType,
      payloadKind: String,
      packL: DataFrame => DataFrame,
      mirrorOf: DataFrame => DataFrame,
      mirrorKeys: Seq[String],
      candidates: DataFrame => DataFrame,
      verify: (DataFrame, DataFrame) => DataFrame,
      opId: Long = -1L, numBuckets: Int = 16,
      driverThreshold: Long = 1000000L, maxIter: Int = 20): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (opId >= 0) s"_forget_$opId"
      else s"_forget_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    try {
      if (!(opId >= 0 && fs.exists(staged))) {
        val fIds = ids.select(col(ids.columns.head).cast("long").as(idCol))
          .distinct().transform(graft.operators.Caching.persisted)
        val lAll = MvPipeline.readBucketedStateOrEmpty(spark, path, stateSchema)
          .filter(col("kind") === "l").select(idCol, "label")
          .transform(graft.operators.Caching.persisted)
        val hit = lAll.join(fIds, Seq(idCol), "left_semi")
          .transform(graft.operators.Caching.persisted)
        // affected components by CURRENT label; members incl. forgotten
        val roots = hit.select("label").distinct()
        val members = lAll.join(roots, Seq("label"), "left_semi")
          .transform(graft.operators.Caching.persisted)
        val memberRows = MvPipeline.readBuckets(spark, path,
            MvPipeline.bucketIdsOf(members, Seq(idCol), numBuckets), stateSchema)
          .join(members.select(idCol), Seq(idCol), "left_semi")
          .transform(graft.operators.Caching.persisted)
        val survivors = members.join(fIds, Seq(idCol), "left_anti")
          .transform(graft.operators.Caching.persisted)
        val survRows = memberRows.join(fIds, Seq(idCol), "left_anti")
          .transform(graft.operators.Caching.persisted)

        // horizon guard: every survivor of an affected component must
        // still be live, or the split is undecidable
        val frozen = survivors
          .join(survRows.filter(col("kind") === payloadKind).select(idCol),
            Seq(idCol), "left_anti")
        if (!frozen.isEmpty) throw new IllegalStateException(
          "forget would split a component with compacted (frozen) survivors — " +
            "their payload rows are gone, so the exact split cannot be derived; " +
            "forget within the live horizon, or before compaction")

        // re-derive component-internal edges among survivors
        val edges = verify(candidates(survRows), survRows)
          .select(col("id1").cast("long"), col("id2").cast("long"))
          .transform(graft.operators.Caching.persisted)
        val cl = Dedup.clusters(edges, maxIter, driverThreshold)
          .withColumnRenamed("id", idCol)
        val newL = survivors.select(idCol)
          .join(cl, Seq(idCol), "left")
          .select(col(idCol), coalesce(col("cluster"), col(idCol)).as("label"))
        // minimal delta: only labels that actually change
        val lDelta = newL.join(lAll, Seq(idCol, "label"), "left_anti")

        val tmp = new Path(s"$path/$stagedName.tmp")
        fs.delete(tmp, true)
        hit.select(idCol).write.parquet(s"$tmp/x")
        lDelta.write.parquet(s"$tmp/l")
        mirrorOf(memberRows.join(fIds, Seq(idCol), "left_semi"))
          .write.parquet(s"$tmp/m")
        fs.delete(staged, true)
        require(fs.rename(tmp, staged), s"stage forget delta $staged")
      }

      val x = spark.read.parquet(s"$staged/x")
      val l = spark.read.parquet(s"$staged/l")
      val m = spark.read.parquet(s"$staged/m")
      val forgotten = x.count()

      // main table: tombstones + label replacements in one merge, applied
      // AD-HOC (marker-preserving — forget shares the state with a
      // streaming writer whose replay detection must survive)
      val incMain = x.select(lit("x").as("tbl"), col(idCol),
          lit(null).cast("long").as("label"))
        .unionByName(l.select(lit("l").as("tbl"), col(idCol), col("label")))
      MvPipeline.upsertBucketedMerge(incMain, path,
        mergeMain(spark, idCol, stateSchema, packL), -1L, numBuckets, Seq(idCol))
      // mirror: remove the forgotten docs' blocking rows
      MvPipeline.upsertBucketedMerge(m, bidxPath,
        removeRows, -1L, numBuckets, mirrorKeys)
      fs.delete(staged, true)
      forgotten
    } finally graft.operators.Caching.releaseAll()
  }

  /** Per-bucket main merge: drop every row of a tombstoned id, replace
    * the `l` rows of relabeled ids. Idempotent under re-application. */
  private def mergeMain(spark: SparkSession, idCol: String,
      stateSchema: org.apache.spark.sql.types.StructType,
      packL: DataFrame => DataFrame)(old: DataFrame, inc: DataFrame): DataFrame = {
    val lNew = inc.filter(col("tbl") === "l").select(idCol, "label")
    // init path hands an empty frame with the delta's schema — the
    // bucket then holds only the replacement labels (tombstones no-op)
    val o =
      if (old.columns.contains("kind")) old
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    val xIds = inc.filter(col("tbl") === "x").select(idCol).distinct()
    val kept = o.join(xIds, Seq(idCol), "left_anti")
    val keptL = kept.filter(col("kind") === "l")
      .join(lNew.select(idCol), Seq(idCol), "left_anti")
    kept.filter(col("kind") =!= "l").unionByName(keptL)
      .unionByName(packL(lNew))
  }

  /** Per-bucket mirror merge: set-minus the forgotten blocking rows
    * (full-row null-safe match). */
  private def removeRows(old: DataFrame, inc: DataFrame): DataFrame = {
    val cond = old.columns.map(c => old(c) <=> inc(c)).reduce(_ && _)
    old.join(inc, cond, "left_anti")
  }
}
