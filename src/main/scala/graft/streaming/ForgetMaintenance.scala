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
  * rows' mirror buckets. Label reads come from the slim
  * [[LabelMirror]] side table (r12 — the upgrade this contract used to
  * name): the forgotten ids' CURRENT labels are a bucket-PRUNED id-key
  * probe, and the affected-set discovery (members by label, which no
  * id-bucketing can prune) scans only the 2-column one-row-per-doc
  * mirror — the payload-dominated main table is never opened beyond
  * the affected members' buckets. Crash recovery: re-call with the same `opId` — the staged
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
      path: String, bidxPath: String, lblPath: String, idCol: String,
      stateSchema: org.apache.spark.sql.types.StructType,
      payloadKind: String,
      packL: DataFrame => DataFrame,
      mirrorOf: DataFrame => DataFrame,
      mirrorKeys: Seq[String],
      candidates: DataFrame => DataFrame,
      verify: (DataFrame, DataFrame) => DataFrame,
      opId: Long = -1L, numBuckets: Int = 16,
      driverThreshold: Long = 1000000L, maxIter: Int = 20,
      movedPath: Option[String] = None,
      movedKind: String = "f"): Long = {
    require(movedPath.isEmpty || opId >= 0,
      "movedPath requires a replay-stamped op id (>= 0): an ad-hoc forget " +
        "stages a FRESH uniquely-named artifact per re-run (no exists-skip), " +
        "so duplicate pending artifacts would accumulate (MovedLog.artifactPath)")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    LabelMirror.backfill(spark, path, lblPath, stateSchema, idCol, numBuckets)
    val stagedName =
      if (opId >= 0) s"_forget_$opId"
      else s"_forget_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    try {
      if (!(opId >= 0 && fs.exists(staged))) {
        val fIds = ids.select(col(ids.columns.head).cast("long").as(idCol))
          .distinct().transform(graft.operators.Caching.persisted)
        val lAll = LabelMirror.readAll(spark, lblPath, path, stateSchema, idCol)
          .transform(graft.operators.Caching.persisted)
        // id-keyed mirror probe: only the buckets the forgotten ids
        // hash into can hold their current labels
        val hit = MvPipeline.readBuckets(spark, lblPath,
            MvPipeline.bucketIdsOf(fIds, Seq(idCol), numBuckets),
            LabelMirror.schema(idCol))
          .join(fIds, Seq(idCol), "left_semi")
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
        // moved-keys log rows (R176), staged ATOMICALLY with x/l/m so
        // the pre-state old coordinates survive the apply: forgotten
        // docs drop (new = null), relabeled docs move old -> new
        if (movedPath.isDefined)
          hit.select(col(idCol), col("label").as("old_label"),
              lit(null).cast("long").as("new_label"))
            .unionByName(lDelta.select(col(idCol), col("label").as("new_label"))
              .join(lAll.withColumnRenamed("label", "old_label"),
                Seq(idCol), "left")
              .select(col(idCol), col("old_label"), col("new_label")))
            .write.parquet(s"$tmp/mv")
        fs.delete(staged, true)
        require(fs.rename(tmp, staged), s"stage forget delta $staged")
      }

      val x = spark.read.parquet(s"$staged/x")
      val l = spark.read.parquet(s"$staged/l")
      val m = spark.read.parquet(s"$staged/m")
      // durable moved artifact BEFORE applying (and before the staged
      // sweep): a crash-replay with the same opId finds it exists-skip
      movedPath.foreach { md =>
        require(fs.exists(new Path(s"$staged/mv")),
          s"staged forget delta $staged carries no moved log (staged " +
            "before movedPath was configured?) — re-run with a fresh opId")
        MvPipeline.stageArtifact(spark,
          MovedLog.artifactPath(md, movedKind, opId))(
          spark.read.parquet(s"$staged/mv"))
      }
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
      // label mirror: tombstones drop, relabeled ids REPLACE (idempotent)
      LabelMirror.applyForget(incMain, lblPath, idCol, numBuckets)
      fs.delete(staged, true)
      forgotten
    } finally graft.operators.Caching.releaseAll()
  }

  // ------------------------------------------------------------------
  // R151: user-forget for the BEHAVIORAL view family (funnels,
  // retention, transitions) — completing the deletion story the
  // clusterers (forget above), the ANN index (lightweight deletes),
  // and dup-spans (doc-local forget) started. User keys are the
  // corpus's long ids (the views' bucketing hashes the user column,
  // so the forget must probe with the same type).
  // ------------------------------------------------------------------

  private def longIds(ids: DataFrame, as: String): DataFrame =
    ids.select(col(ids.columns.head).cast("long").as(as)).distinct()

  /** Forget users from a Z-SET strict funnel view ("strictfunnel" or
    * "strictorderfunnel"): drop their `e`/`u`/`v` rows NOW and emit the
    * −1 changelog retraction for each current level, so the integral
    * stays equal to the served view and external ships converge (the
    * summing-sink contract). The users' historical `d` rows remain
    * until a [[IncrementalStrictFunnel.compactChangelog]] at a floor ≥
    * `opId` folds their net-zero weights away — the privacy completion
    * point, exactly like the ANN index's purge-at-compaction. Serve ≡
    * batch over events-minus-users immediately; re-running the same
    * forget is a no-op (merge idempotent, retraction rows identical).
    * Returns the number of users that had a served level. */
  def forgetStrictFunnel(spark: SparkSession, ids: DataFrame,
      stateDir: String, view: String = "strictfunnel", opId: Long = -1L,
      numBuckets: Int = 16): Long = {
    val path = s"$stateDir/$view"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return 0L
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "kind STRING, k INT, user BIGINT, t BIGINT, id BIGINT, et STRING, w BIGINT")
    val stagedName =
      if (opId >= 0) s"_forget_$opId"
      else s"_forget_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")
    try {
      if (!(opId >= 0 && fs.exists(staged))) {
        val users = longIds(ids, "user")
          .transform(graft.operators.Caching.persisted)
        val st = MvPipeline.readBuckets(spark, path,
          MvPipeline.bucketIdsOf(users, Seq("user"), numBuckets), schema)
        val hitV = st.filter(col("kind") === "v")
          .join(users, Seq("user"), "left_semi")
        val dRows = hitV.select(lit("d").as("kind"), col("k"), col("user"),
          lit(opId).cast("long").as("t"), lit(null).cast("long").as("id"),
          lit(null).cast("string").as("et"), lit(-1L).as("w"))
        val xRows = users.select(lit("x").as("kind"), lit(0).as("k"),
          col("user"), lit(null).cast("long").as("t"),
          lit(null).cast("long").as("id"), lit(null).cast("string").as("et"),
          lit(null).cast("long").as("w"))
        val tmp = new Path(s"$path/$stagedName.tmp")
        xRows.unionByName(dRows).write.mode("overwrite").parquet(tmp.toString)
        fs.delete(staged, true)
        require(fs.rename(tmp, staged), s"stage forget delta $staged")
      }
      val delta = spark.read.parquet(staged.toString)
        .transform(graft.operators.Caching.persisted)
      val forgotten = delta.filter(col("kind") === "d")
        .select("user").distinct().count()
      MvPipeline.upsertBucketedMerge(delta, path, mergeStrictForget,
        -1L, numBuckets, Seq("user"))
      fs.delete(staged, true)
      forgotten
    } finally graft.operators.Caching.releaseAll()
  }

  /** Per-bucket strict-funnel forget merge: drop the tombstoned users'
    * non-changelog rows, append the retraction `d` rows (distinct-union
    * — idempotent, replay-identical). */
  private def mergeStrictForget(old: DataFrame, inc: DataFrame): DataFrame = {
    val users = inc.filter(col("kind") === "x").select("user").distinct()
    val kept = old.filter(col("kind") === "d")
      .unionByName(inc.filter(col("kind") === "d")).distinct()
    old.filter(col("kind") =!= "d")
      .join(users, Seq("user"), "left_anti")
      .unionByName(kept)
  }

  /** Forget users from the MONOTONE funnel view
    * ([[IncrementalFunnel]]): a pure per-user row drop — frames,
    * retained events, conversion-latency rows, and the universe row all
    * go; the view is per-user with no cross-user structure, so serve ≡
    * batch over events-minus-users immediately, INCLUDING for users
    * already frozen by freeze-and-fold compaction (their summary rows
    * drop whole — no split to derive, so no horizon guard is needed,
    * unlike the clusterers). Idempotent; returns users that had rows. */
  def forgetFunnel(spark: SparkSession, ids: DataFrame,
      stateDir: String, numBuckets: Int = 16): Long = {
    val path = s"$stateDir/funnel"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return 0L
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "kind STRING, k INT, user BIGINT, t1 BIGINT, tk BIGINT")
    try {
      val users = longIds(ids, "user")
        .transform(graft.operators.Caching.persisted)
      val st = MvPipeline.readBuckets(spark, path,
        MvPipeline.bucketIdsOf(users, Seq("user"), numBuckets), schema)
      val forgotten = st.join(users, Seq("user"), "left_semi")
        .select("user").distinct().count()
      MvPipeline.upsertBucketedMerge(
        users.select(lit("x").as("kind"), lit(0).as("k"), col("user"),
          lit(null).cast("long").as("t1"), lit(null).cast("long").as("tk")),
        path,
        (old, inc) => old.join(inc.select("user").distinct(),
          Seq("user"), "left_anti"),
        -1L, numBuckets, Seq("user"))
      forgotten
    } finally graft.operators.Caching.releaseAll()
  }

  /** Forget users from [[IncrementalRetention]] state: drop their
    * cohort and activity rows — retention counts then equal the batch
    * recompute over events-minus-users exactly (counts are per-user
    * presence sums). Ad-hoc marker-preserving merges; idempotent. */
  def forgetRetention(spark: SparkSession, ids: DataFrame,
      stateDir: String): Long = {
    val fs = new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val users = longIds(ids, "user_id")
        .transform(graft.operators.Caching.persisted)
      var forgotten = 0L
      Seq("cohorts", "activity").foreach { t =>
        if (fs.exists(new Path(s"$stateDir/$t"))) {
          if (t == "cohorts")
            forgotten = spark.read.parquet(s"$stateDir/$t")
              .join(users, Seq("user_id"), "left_semi").count()
          MvPipeline.upsertMerge(users, s"$stateDir/$t",
            (old, inc) => old.join(inc, Seq("user_id"), "left_anti"), -1L)
        }
      }
      forgotten
    } finally graft.operators.Caching.releaseAll()
  }

  /** Forget users from [[IncrementalTransitions]] state — with the
    * honest CONSERVATIVE contract of the dup-spans forget: the user's
    * `last_event` row drops (no future transition will be attributed to
    * them), but the (from_type, to_type) COUNT matrix keeps their past
    * transitions — it is a user-anonymous aggregate with no per-user
    * decomposition (the design choice that keeps it O(type²), never
    * O(users)); subtracting one user exactly would need their event
    * history. Rebuild the view for count-exact removal. */
  def forgetTransitions(spark: SparkSession, ids: DataFrame,
      stateDir: String): Long = {
    val fs = new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$stateDir/last_event"))) return 0L
    try {
      val users = longIds(ids, "user")
        .transform(graft.operators.Caching.persisted)
      val forgotten = spark.read.parquet(s"$stateDir/last_event")
        .join(users, Seq("user"), "left_semi").count()
      MvPipeline.upsertMerge(users, s"$stateDir/last_event",
        (old, inc) => old.join(inc, Seq("user"), "left_anti"), -1L)
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
