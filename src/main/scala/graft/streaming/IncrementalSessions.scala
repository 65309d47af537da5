package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Incrementally-maintained SESSIONIZATION (SURVEY.md §2.11 R166) —
  * the maintained twin of the batch `sessionize_events` query
  * (queries/RelQueries.scala `sessionizeEvents`): per user, maximal
  * runs of events where consecutive gaps are `<= gap`, served as
  *
  *   (k, session_start, session_end, n_events)
  *
  * kept EXACT under the two corrections no append-only sessionizer can
  * produce: a LATE event can MERGE two existing sessions into one
  * (both old rows retract, the merged row asserts), and an event
  * DELETE can SPLIT a session (or shrink/empty it). Session identity
  * is its (start, end) span, so there is no stable per-session key to
  * upsert by — the view is a per-user SET of rows maintained by exact
  * row diff.
  *
  * The device is the family's "re-derive affected entities exactly"
  * member (the strict-funnel role, not the Z-set-bilinear role: the
  * session assignment is NOT linear in the event Z-set — one event can
  * reshape every session row of its user, so per-user re-derivation IS
  * the honest O(Δ) unit): each batch touches only the arriving/deleted
  * events' users, re-sessionizes THOSE users from their retained
  * events (one bucket-pruned read + one per-user window pass), and
  * ships the exact row diff vs the stored session rows. Per-batch cost
  * is O(events of touched users) — never O(state), and the
  * re-derivation is the same one-shuffle window plan the batch query
  * runs, restricted to the touched users.
  *
  * State under `stateDir/sessions/` (ONE staged kind-discriminated
  * delta, the family's crash-safe protocol):
  *   - `e/` retained events `(id, t, k)` bucketed by k
  *     ([[IncrementalJoinAggStar.mergeF]] — ids arrive once);
  *   - `v/` current session rows `(k, st, en, n)` bucketed by k
  *     (exact-row signed merge);
  *   - `c/` signed changelog `(b, k, st, en, n, w)` bucketed by k —
  *     the integral (sum w per row, keep > 0) IS the view, so external
  *     summing sinks and maintenance-time as-of reads work unchanged
  *     ([[changelog]] / [[viewAsOf]] / [[compactChangelog]]).
  *
  * Contracts: event ids arrive once and pin (t, k); deletes name
  * (id, k); delete-wins within batch; re-sent ids no-op. Gap semantics
  * are the batch query's exactly: a break when the gap STRICTLY
  * exceeds `gap` (a gap of exactly `gap` stays in-session); ties order
  * by (t, id). */
object IncrementalSessions {

  private val eSchema = StructType(Seq(StructField("id", LongType),
    StructField("t", LongType), StructField("k", LongType)))
  private val vSchema = StructType(Seq(StructField("k", LongType),
    StructField("st", LongType), StructField("en", LongType),
    StructField("n", LongType)))
  private val cSchema = StructType(Seq(StructField("b", LongType),
    StructField("k", LongType), StructField("st", LongType),
    StructField("en", LongType), StructField("n", LongType),
    StructField("w", LongType)))

  /** Sessionize `(id, t, k)` events — the batch plan (one shuffle by
    * k, one per-user sort), shared by the fold's per-touched-user
    * re-derivation, [[bootstrap]], and the spec model. */
  def sessionize(events: DataFrame, gap: Long): DataFrame = {
    val w = Window.partitionBy("k").orderBy("t", "id")
    events
      .withColumn("brk",
        when(col("t") - lag("t", 1).over(w) > gap, 1L).otherwise(0L))
      .withColumn("sx", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("k", "sx")
      .agg(min("t").as("st"), max("t").as("en"), count(lit(1)).as("n"))
      .select("k", "st", "en", "n")
  }

  /** Fold one CDC micro-batch. Frames may be empty; columns:
    * `events(id, t, k)`, `eventDels(id, k)`. */
  def processBatch(events: DataFrame, eventDels: DataFrame, gap: Long,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16): Unit = {
    val spark = events.sparkSession
    val path = s"$stateDir/sessions"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    def pruneRead(table: String, keys: DataFrame, schema: StructType): DataFrame =
      MvPipeline.readBuckets(spark, s"$path/$table",
        MvPipeline.bucketIdsOf(keys, Seq("k"), numBuckets), schema)

    def computeDelta(): DataFrame = {
      val emptyE = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], eSchema)
      val eIn =
        if (events.isEmpty) emptyE
        else events.select(col("id").cast("long").as("id"),
            col("t").cast("long").as("t"), col("k").cast("long").as("k"))
          .groupBy("id")
          .agg(min(struct(col("t"), col("k"))).as("x"))
          .select(col("id"), col("x.t").as("t"), col("x.k").as("k"))
          .transform(graft.operators.Caching.persisted)
      val delIn =
        if (eventDels.isEmpty) emptyE.select("id", "k")
        else eventDels.select(col("id").cast("long").as("id"),
            col("k").cast("long").as("k")).distinct()
          .transform(graft.operators.Caching.persisted)

      val touched = eIn.select("k").unionByName(delIn.select("k")).distinct()
        .transform(graft.operators.Caching.persisted)
      val e0 = pruneRead("e", touched, eSchema)
        .join(touched, Seq("k"), "left_semi")
        .transform(graft.operators.Caching.persisted)
      // signed event rows (the family's arrive-once / delete-by-id rules)
      val newE = eIn.join(e0.select("id"), Seq("id"), "left_anti")
        .join(delIn.select("id"), Seq("id"), "left_anti")
      val delE = e0.join(delIn.select("id"), Seq("id"), "left_semi")
      val ze = newE.withColumn("w", lit(1L))
        .unionByName(delE.withColumn("w", lit(-1L)))
        .transform(graft.operators.Caching.persisted)

      // post-state events of the touched users -> exact re-sessionize
      val e1 = e0.join(delIn.select("id"), Seq("id"), "left_anti")
        .unionByName(newE)
      val vNew = sessionize(e1, gap)
        .transform(graft.operators.Caching.persisted)
      val v0 = pruneRead("v", touched, vSchema)
        .join(touched, Seq("k"), "left_semi")
        .transform(graft.operators.Caching.persisted)
      def rowDiff(a: DataFrame, b: DataFrame): DataFrame = {
        val bb = b.select(col("k").as("k0"), col("st").as("st0"),
          col("en").as("en0"), col("n").as("n0"))
        a.join(bb, col("k") === col("k0") && col("st") === col("st0") &&
          col("en") === col("en0") && col("n") === col("n0"), "left_anti")
      }
      val zv = rowDiff(vNew, v0).withColumn("w", lit(1L))
        .unionByName(rowDiff(v0, vNew).withColumn("w", lit(-1L)))
        .transform(graft.operators.Caching.persisted)

      val nil = lit(null).cast("long")
      val eDelta =
        if (ze.isEmpty) Nil
        else Seq(ze.select(lit("e").as("tbl"), col("id"), col("t"),
          col("k"), nil.as("st"), nil.as("en"), nil.as("n"),
          nil.as("b"), col("w")))
      val vDelta =
        if (zv.isEmpty) Nil
        else Seq(
          zv.select(lit("v").as("tbl"), nil.as("id"), nil.as("t"),
            col("k"), col("st"), col("en"), col("n"), nil.as("b"), col("w")),
          zv.select(lit("c").as("tbl"), nil.as("id"), nil.as("t"),
            col("k"), col("st"), col("en"), col("n"),
            lit(batchId).as("b"), col("w")))
      val all = eDelta ++ vDelta
      if (all.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("tbl", org.apache.spark.sql.types.StringType),
            StructField("id", LongType), StructField("t", LongType),
            StructField("k", LongType), StructField("st", LongType),
            StructField("en", LongType), StructField("n", LongType),
            StructField("b", LongType), StructField("w", LongType))))
      else all.reduce(_ unionByName _)
    }

    try {
      if (!(batchId >= 0 && fs.exists(staged))) {
        val tmp = new Path(s"$path/$stagedName.tmp")
        computeDelta().write.mode("overwrite").parquet(tmp.toString)
        fs.delete(staged, true)
        require(fs.rename(tmp, staged), s"stage delta $staged")
      }
      val delta = spark.read.parquet(staged.toString).persist()
      val present = delta.select("tbl").distinct()
        .collect().map(_.getString(0)).toSet
      try MvPipeline.applyConcurrently(
        (if (present("e"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "e").select("id", "t", "k", "w"),
            s"$path/e", IncrementalJoinAggStar.mergeF, batchId, numBuckets,
            Seq("k")))
         else Nil) ++
        (if (present("v"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "v").select("k", "st", "en", "n", "w"),
            s"$path/v", mergeV, batchId, numBuckets, Seq("k")))
         else Nil) ++
        (if (present("c"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "c")
              .select("b", "k", "st", "en", "n", "w"),
            s"$path/c", (old, inc) => old.unionByName(inc).distinct(),
            batchId, numBuckets, Seq("k")))
         else Nil))
      finally delta.unpersist()
      if (fs.exists(new Path(path)))
        fs.listStatus(new Path(path))
          .filter(x => x.getPath.getName.startsWith("_delta_"))
          .foreach(x => fs.delete(x.getPath, true))
    } finally graft.operators.Caching.releaseAll()
  }

  /** Exact-row signed merge for the session-row set. */
  private[streaming] def mergeV(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("w")) old.drop("w") else old
    val plus = inc.filter(col("w") === 1L).drop("w")
    val minus = inc.filter(col("w") === -1L).drop("w")
    val cond = Seq("k", "st", "en", "n").map(c => o(c) <=> minus(c))
      .reduce(_ && _)
    o.join(minus, cond, "left_anti").unionByName(plus).distinct()
  }

  /** `(k, session_start, session_end, n_events)` == the batch
    * sessionize over the integrated events — live rows (`v/`) plus the
    * frozen floor (`vf/`, [[compactState]]). The distinct() is the
    * compaction crash rule: a crash between the freeze append and the
    * live-row rewrite leaves a row in BOTH tables; distinct masks the
    * window and the re-run converges (sessions of one user have unique
    * starts, so full-row distinct never merges real rows). */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/sessions/v",
        vSchema)
      .unionByName(MvPipeline.readBucketedStateOrEmpty(spark,
        s"$stateDir/sessions/vf", vSchema))
      .distinct()
      .select(col("k"), col("st").as("session_start"),
        col("en").as("session_end"), col("n").as("n_events"))

  /** [[view]] restricted to `users` — the bucket-pruned point read. */
  def viewFor(spark: SparkSession, stateDir: String, users: Seq[Long],
      numBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    val kdf = users.toDF("k")
    def pruned(table: String): DataFrame =
      MvPipeline.readBuckets(spark, s"$stateDir/sessions/$table",
        MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets), vSchema)
    pruned("v").unionByName(pruned("vf")).distinct()
      .join(broadcast(kdf), Seq("k"), "left_semi")
      .select(col("k"), col("st").as("session_start"),
        col("en").as("session_end"), col("n").as("n_events"))
  }

  /** Z-set changelog `(batch, k, session_start, session_end, n_events,
    * w)`; integral == view (a summing sink converges on the (row, w)
    * pairs exactly as for the aggregate views). */
  def changelog(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/sessions/c",
        cSchema)
      .select(col("b").as("batch"), col("k"),
        col("st").as("session_start"), col("en").as("session_end"),
        col("n").as("n_events"), col("w"))

  /** AS-OF read over MAINTENANCE time (the family contract). */
  def viewAsOf(spark: SparkSession, stateDir: String, batch: Long): DataFrame =
    changelog(spark, stateDir)
      .filter(col("batch") <= batch)
      .groupBy("k", "session_start", "session_end", "n_events")
      .agg(sum("w").as("w"))
      .filter(col("w") > 0)
      .drop("w")

  /** Changelog compaction: fold the prefix `<= upTo` into baseline
    * rows stamped `upTo` (net-zero rows vanish); as-of stays exact at
    * and above the floor. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    MvPipeline.transformBuckets(spark, s"$stateDir/sessions/c", old => {
      val pre = old.filter(col("b") <= upTo)
      val baseline = pre.groupBy("k", "st", "en", "n")
        .agg(sum("w").as("w"))
        .filter(col("w") =!= 0)
        .select(lit(upTo).as("b"), col("k"), col("st"), col("en"),
          col("n"), col("w"))
      old.filter(col("b") > upTo).unionByName(baseline)
    })

  /** FORGET a set of users (GDPR): delete every retained event of the
    * named users — ONE CDC batch through [[processBatch]], so their
    * session rows retract with −1 changelog rows, integral == view
    * holds through the forget, and replay is a no-op. Covers the LIVE
    * horizon only: if any named user has FROZEN rows ([[compactState]])
    * this THROWS (the R147 frozen-guard rule — a frozen session's
    * events are gone, so the live path cannot retract it exactly;
    * purge frozen history with a dedicated maintenance pass before
    * forgetting, or forget before freezing). */
  def forgetUsers(spark: SparkSession, users: Seq[Long], stateDir: String,
      batchId: Long, gap: Long, numBuckets: Int = 16): Unit = {
    import spark.implicits._
    val kdf = users.toDF("k")
    val frozen = MvPipeline.readBuckets(spark, s"$stateDir/sessions/vf",
        MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets), vSchema)
      .join(broadcast(kdf), Seq("k"), "left_semi")
    require(frozen.isEmpty,
      "forgetUsers: named users hold FROZEN session rows (beyond the " +
        "compaction horizon); the live CDC path cannot retract them")
    val dels = MvPipeline.readBuckets(spark, s"$stateDir/sessions/e",
        MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets), eSchema)
      .join(broadcast(kdf), Seq("k"), "left_semi")
      .select("id", "k")
    processBatch(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        eSchema),
      dels, gap, stateDir, batchId, numBuckets)
  }

  /** WATERMARK-EXACT state compaction — the bounded-state member of
    * the family (the [[IncrementalStrictFunnelBounded]] role): under
    * the contract that every FUTURE event time is `>= horizon` (and no
    * future delete names a frozen event),
    *
    *   - a session with `en + gap < horizon` is FROZEN: a future event
    *     at `t >= horizon` has `t − en > gap`, so it always BREAKS —
    *     no in-contract arrival can ever extend, merge into, or reshape
    *     the session. Its row moves `v/` → `vf/` (the immutable floor,
    *     excluded from every future diff) and its events leave `e/`;
    *   - a session still REACHABLE at the horizon (`en + gap >=
    *     horizon`) keeps its row in `v/` and ALL its events — a future
    *     event may merge with it, and the re-derivation needs the full
    *     run to recompute (start, n) exactly.
    *
    * View untouched (it serves `v/ ∪ vf/`); retained events bounded by
    * the horizon window plus the tail sessions that straddle it. The
    * fold never reads `vf/`, so post-compaction folds are exact within
    * the contract. Out-of-contract late events re-sessionize only the
    * RETAINED events (a pre-horizon event lands as its own or a merged
    * live session while the frozen floor keeps the historical row —
    * the documented divergence); deletes naming compacted events no-op
    * silently; [[forgetUsers]] on a frozen user throws. Crash-safe:
    * freeze-append is idempotent (distinct merge), the view's distinct
    * masks the append→rewrite window, and a re-run converges. */
  def compactState(spark: SparkSession, stateDir: String, horizon: Long,
      gap: Long, numBuckets: Int = 16): Unit = {
    val path = s"$stateDir/sessions"
    // 1. APPEND the frozen rows to vf/ (idempotent distinct merge)
    val frozen = MvPipeline.readBucketedStateOrEmpty(spark, s"$path/v",
        vSchema)
      .filter(col("en") + gap < horizon)
    if (!frozen.isEmpty)
      MvPipeline.upsertBucketedMerge(frozen, s"$path/vf",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets,
        Seq("k"))
    // 2. drop them from the live table
    MvPipeline.transformBuckets(spark, s"$path/v",
      old => old.filter(!(col("en") + gap < horizon)))
    // 3. drop the frozen sessions' events (per-bucket window is exact:
    //    e/ is bucketed by k, so a user's whole history is co-located)
    MvPipeline.transformBuckets(spark, s"$path/e", old => {
      val w = Window.partitionBy("k").orderBy("t", "id")
      old
        .withColumn("brk",
          when(col("t") - lag("t", 1).over(w) > gap, 1L).otherwise(0L))
        .withColumn("sx", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("sen", max("t").over(Window.partitionBy("k", "sx")))
        .filter(!(col("sen") + gap < horizon))
        .select("id", "t", "k")
    })
  }

  /** BOOTSTRAP a fresh state dir from a batch event table — the batch
    * sessionize plan once, instead of per-batch delta machinery. */
  def bootstrap(events: DataFrame, gap: Long, stateDir: String,
      baselineBatch: Long = 0L, numBuckets: Int = 16): Unit = {
    val spark = events.sparkSession
    val path = s"$stateDir/sessions"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(path)),
      s"bootstrap requires a fresh state dir, found $path")
    val eIn = events.select(col("id").cast("long").as("id"),
        col("t").cast("long").as("t"), col("k").cast("long").as("k"))
      .groupBy("id")
      .agg(min(struct(col("t"), col("k"))).as("x"))
      .select(col("id"), col("x.t").as("t"), col("x.k").as("k"))
      .transform(graft.operators.Caching.persisted)
    try {
      MvPipeline.upsertBucketedMerge(eIn, s"$path/e",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets,
        Seq("k"))
      val v = sessionize(eIn, gap).transform(graft.operators.Caching.persisted)
      MvPipeline.upsertBucketedMerge(v, s"$path/v",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets,
        Seq("k"))
      MvPipeline.upsertBucketedMerge(
        v.select(lit(baselineBatch).as("b"), col("k"), col("st"),
          col("en"), col("n"), lit(1L).as("w")),
        s"$path/c", (old, inc) => old.unionByName(inc).distinct(), -1L,
        numBuckets, Seq("k"))
    } finally graft.operators.Caching.releaseAll()
  }

  /** Continuous maintenance over a CDC stream: `kind` ∈ e | e_del;
    * fixed columns per kind (absent columns null). Single writer per
    * state dir. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      gap: Long, stateDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      numBuckets: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(
          batch.filter(col("kind") === "e"),
          batch.filter(col("kind") === "e_del"),
          gap, stateDir, batchId, numBuckets = numBuckets)
      }
      .start()
}
