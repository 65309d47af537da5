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

  /** Per-event measure column names — R161's multi-measure contract on
    * the sessions view: `numMeasures = 0` (the default) is the
    * count-only x129 surface; `M >= 1` carries `m, m2..mM` on events
    * and serves each measure's per-session SUM as `sm, sm2..smM`. */
  private def mColsOf(nM: Int): Seq[String] =
    if (nM <= 0) Nil else "m" +: (2 to nM).map(i => s"m$i")
  private def smColsOf(nM: Int): Seq[String] = mColsOf(nM).map("s" + _)
  private def eSchemaN(nM: Int) = StructType(
    Seq(StructField("id", LongType), StructField("t", LongType)) ++
      mColsOf(nM).map(c => StructField(c, LongType)) :+
      StructField("k", LongType))
  private def vSchemaN(nM: Int) = StructType(
    Seq(StructField("k", LongType), StructField("st", LongType),
      StructField("en", LongType), StructField("n", LongType)) ++
      smColsOf(nM).map(c => StructField(c, LongType)))
  private def cSchemaN(nM: Int) = StructType(
    StructField("b", LongType) +: vSchemaN(nM).fields.toSeq :+
      StructField("w", LongType))
  private val eSchema = eSchemaN(0)
  private val vSchema = vSchemaN(0)

  /** Sessionize `(id, t[, m..], k)` events — the batch plan (one
    * shuffle by k, one per-user sort), shared by the fold's
    * per-touched-user re-derivation, [[bootstrap]], and the spec
    * model. */
  def sessionize(events: DataFrame, gap: Long,
      numMeasures: Int = 0): DataFrame = {
    val w = Window.partitionBy("k").orderBy("t", "id")
    val aggs = Seq(min("t").as("st"), max("t").as("en"),
      count(lit(1)).as("n")) ++
      mColsOf(numMeasures).map(c => sum(col(c)).as(s"s$c"))
    events
      .withColumn("brk",
        when(col("t") - lag("t", 1).over(w) > gap, 1L).otherwise(0L))
      .withColumn("sx", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("k", "sx")
      .agg(aggs.head, aggs.tail: _*)
      .select("k" +: "st" +: "en" +: "n" +: smColsOf(numMeasures) map col: _*)
  }

  /** Fold one CDC micro-batch. Frames may be empty; columns:
    * `events(id, t[, m..mM], k)`, `eventDels(id, k)`. */
  def processBatch(events: DataFrame, eventDels: DataFrame, gap: Long,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16,
      numMeasures: Int = 0): Unit = {
    val spark = events.sparkSession
    val path = s"$stateDir/sessions"
    MvPipeline.assertAboveResumeFloor(spark, path, batchId)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    def pruneRead(table: String, keys: DataFrame, schema: StructType): DataFrame =
      MvPipeline.readBuckets(spark, s"$path/$table",
        MvPipeline.bucketIdsOf(keys, Seq("k"), numBuckets), schema)

    val mCols = mColsOf(numMeasures)
    val smCols = smColsOf(numMeasures)
    def computeDelta(): DataFrame = {
      val emptyE = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        eSchemaN(numMeasures))
      val eIn =
        if (events.isEmpty) emptyE
        else events.select(Seq(col("id").cast("long").as("id"),
              col("t").cast("long").as("t")) ++
              mCols.map(c => col(c).cast("long").as(c)) :+
              col("k").cast("long").as("k"): _*)
          .groupBy("id")
          .agg(min(struct(("t" +: mCols :+ "k").map(col): _*)).as("x"))
          .select(col("id") +: ("t" +: mCols :+ "k").map(c =>
            col(s"x.$c").as(c)): _*)
          .transform(graft.operators.Caching.persisted)
      val delIn =
        if (eventDels.isEmpty) emptyE.select("id", "k")
        else eventDels.select(col("id").cast("long").as("id"),
            col("k").cast("long").as("k")).distinct()
          .transform(graft.operators.Caching.persisted)

      val touched = eIn.select("k").unionByName(delIn.select("k")).distinct()
        .transform(graft.operators.Caching.persisted)
      val e0 = pruneRead("e", touched, eSchemaN(numMeasures))
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
      val vNew = sessionize(e1, gap, numMeasures)
        .transform(graft.operators.Caching.persisted)
      val v0 = pruneRead("v", touched, vSchemaN(numMeasures))
        .join(touched, Seq("k"), "left_semi")
        .transform(graft.operators.Caching.persisted)
      val vCols = Seq("k", "st", "en", "n") ++ smCols
      def rowDiff(a: DataFrame, b: DataFrame): DataFrame = {
        val bb = b.select(vCols.map(c => col(c).as(s"${c}0")): _*)
        a.join(bb, vCols.map(c => col(c) === col(s"${c}0")).reduce(_ && _),
          "left_anti")
      }
      val zv = rowDiff(vNew, v0).withColumn("w", lit(1L))
        .unionByName(rowDiff(v0, vNew).withColumn("w", lit(-1L)))
        .transform(graft.operators.Caching.persisted)

      val nil = lit(null).cast("long")
      val eDelta =
        if (ze.isEmpty) Nil
        else Seq(ze.select(Seq(lit("e").as("tbl"), col("id"), col("t")) ++
          mCols.map(col) ++
          Seq(col("k"), nil.as("st"), nil.as("en"), nil.as("n")) ++
          smCols.map(c => nil.as(c)) ++
          Seq(nil.as("b"), col("w")): _*))
      val vDelta =
        if (zv.isEmpty) Nil
        else Seq(
          zv.select(Seq(lit("v").as("tbl"), nil.as("id"), nil.as("t")) ++
            mCols.map(c => nil.as(c)) ++
            vCols.map(col) ++ Seq(nil.as("b"), col("w")): _*),
          zv.select(Seq(lit("c").as("tbl"), nil.as("id"), nil.as("t")) ++
            mCols.map(c => nil.as(c)) ++
            vCols.map(col) ++ Seq(lit(batchId).as("b"), col("w")): _*))
      val all = eDelta ++ vDelta
      if (all.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("tbl", org.apache.spark.sql.types.StringType),
            StructField("id", LongType), StructField("t", LongType)) ++
            mCols.map(c => StructField(c, LongType)) ++
            Seq(StructField("k", LongType), StructField("st", LongType),
              StructField("en", LongType), StructField("n", LongType)) ++
            smCols.map(c => StructField(c, LongType)) ++
            Seq(StructField("b", LongType), StructField("w", LongType))))
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
            delta.filter(col("tbl") === "e")
              .select(("id" +: "t" +: mCols) ++ Seq("k", "w") map col: _*),
            s"$path/e", IncrementalJoinAggStar.mergeF, batchId, numBuckets,
            Seq("k")))
         else Nil) ++
        (if (present("v"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "v")
              .select((Seq("k", "st", "en", "n") ++ smCols :+ "w").map(col): _*),
            s"$path/v", mergeV, batchId, numBuckets, Seq("k")))
         else Nil) ++
        (if (present("c"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "c")
              .select((Seq("b", "k", "st", "en", "n") ++ smCols :+ "w")
                .map(col): _*),
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
    // value columns are data-driven (smN measure sums may ride along)
    val cond = o.columns.map(c => o(c) <=> minus(c)).reduce(_ && _)
    o.join(minus, cond, "left_anti").unionByName(plus).distinct()
  }

  private def smOut(st: DataFrame): Seq[org.apache.spark.sql.Column] =
    st.columns.filter(_.matches("sm\\d*")).toSeq
      .sortBy(c => if (c == "sm") 1 else c.drop(2).toInt)
      .map(col)

  /** `(k, session_start, session_end, n_events[, sm..])` == the batch
    * sessionize over the integrated events — live rows (`v/`) plus the
    * frozen floor (`vf/`, [[compactState]]). The distinct() is the
    * compaction crash rule: a crash between the freeze append and the
    * live-row rewrite leaves a row in BOTH tables; distinct masks the
    * window and the re-run converges (sessions of one user have unique
    * starts, so full-row distinct never merges real rows). */
  def view(spark: SparkSession, stateDir: String,
      numMeasures: Int = 0): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
        s"$stateDir/sessions/v", vSchemaN(numMeasures))
      .unionByName(MvPipeline.readBucketedStateOrEmpty(spark,
        s"$stateDir/sessions/vf", vSchemaN(numMeasures)))
      .distinct()
    st.select(Seq(col("k"), col("st").as("session_start"),
      col("en").as("session_end"), col("n").as("n_events")) ++
      smOut(st): _*)
  }

  /** [[view]] restricted to `users` — the bucket-pruned point read. */
  def viewFor(spark: SparkSession, stateDir: String, users: Seq[Long],
      numBuckets: Int = 16, numMeasures: Int = 0): DataFrame = {
    import spark.implicits._
    MvPipeline.assertReadLayout(spark, s"$stateDir/sessions/v", numBuckets,
      1, "sessions viewFor")
    MvPipeline.assertReadLayout(spark, s"$stateDir/sessions/vf", numBuckets,
      1, "sessions viewFor")
    val kdf = users.toDF("k")
    def pruned(table: String): DataFrame =
      MvPipeline.readBuckets(spark, s"$stateDir/sessions/$table",
        MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets),
        vSchemaN(numMeasures))
    val st = pruned("v").unionByName(pruned("vf")).distinct()
      .join(broadcast(kdf), Seq("k"), "left_semi")
    st.select(Seq(col("k"), col("st").as("session_start"),
      col("en").as("session_end"), col("n").as("n_events")) ++
      smOut(st): _*)
  }

  /** Z-set changelog `(batch, k, session_start, session_end, n_events
    * [, sm..], w)`; integral == view (a summing sink converges on the
    * (row, w) pairs exactly as for the aggregate views). */
  def changelog(spark: SparkSession, stateDir: String,
      numMeasures: Int = 0): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/sessions/c", cSchemaN(numMeasures))
    st.select(Seq(col("b").as("batch"), col("k"),
      col("st").as("session_start"), col("en").as("session_end"),
      col("n").as("n_events")) ++ smOut(st) :+ col("w"): _*)
  }

  /** AS-OF read over MAINTENANCE time (the family contract). */
  def viewAsOf(spark: SparkSession, stateDir: String, batch: Long,
      numMeasures: Int = 0): DataFrame = {
    val cl = changelog(spark, stateDir, numMeasures)
      .filter(col("batch") <= batch)
    val keys = cl.columns.filterNot(c => c == "batch" || c == "w").toSeq
    cl.groupBy(keys.map(col): _*)
      .agg(sum("w").as("w"))
      .filter(col("w") > 0)
      .drop("w")
  }

  /** Changelog compaction: fold the prefix `<= upTo` into baseline
    * rows stamped `upTo` (net-zero rows vanish); as-of stays exact at
    * and above the floor. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    MvPipeline.transformBuckets(spark, s"$stateDir/sessions/c", old => {
      val pre = old.filter(col("b") <= upTo)
      val keys = old.columns.filterNot(c => c == "b" || c == "w").toSeq
      val baseline = pre.groupBy(keys.map(col): _*)
        .agg(sum("w").as("w"))
        .filter(col("w") =!= 0)
        .select(lit(upTo).as("b") +: keys.map(col) :+ col("w"): _*)
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
      batchId: Long, gap: Long, numBuckets: Int = 16,
      numMeasures: Int = 0): Unit = {
    import spark.implicits._
    val kdf = users.toDF("k")
    val frozen = MvPipeline.readBuckets(spark, s"$stateDir/sessions/vf",
        MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets),
        vSchemaN(numMeasures))
      .join(broadcast(kdf), Seq("k"), "left_semi")
    require(frozen.isEmpty,
      "forgetUsers: named users hold FROZEN session rows (beyond the " +
        "compaction horizon); the live CDC path cannot retract them")
    val dels = MvPipeline.readBuckets(spark, s"$stateDir/sessions/e",
        MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets),
        eSchemaN(numMeasures))
      .join(broadcast(kdf), Seq("k"), "left_semi")
      .select("id", "k")
    processBatch(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        eSchemaN(numMeasures)),
      dels, gap, stateDir, batchId, numBuckets, numMeasures)
  }

  /** SINGLE-CALL GDPR (r14, VERDICT r13 task 6): forget `users` across
    * BOTH horizons — frozen floor rows AND live events — in ONE staged
    * op, retiring the purgeFrozen-then-forgetUsers two-pass contract
    * (the last sharp edge in the forget family: callers had to know
    * which horizon a user's history lived in and sequence two batch
    * ids). The delta is exact WITHOUT re-sessionization: deleting ALL
    * of a user's retained events leaves them zero live sessions, so the
    * live diff is simply −(their current `v/` rows) + −(their `e/`
    * rows), and frozen rows retract directly (−`vf/`). Every retracted
    * session row ships a −1 changelog row stamped `batchId`, so
    * integral == view holds through the forget and external summing
    * sinks converge. A row duplicated across `v/`∪`vf/` (the compaction
    * crash window the serving distinct masks) emits one −1 changelog
    * row (the two sources' c rows are identical and the changelog merge
    * is distinct) — matching its single historical +1.
    *
    * Crash/replay: the standard staged protocol — one `_delta_b<id>`
    * staged from pre-state, four marker-guarded table applies, sweep
    * after all commit; a replay with the delta swept recomputes an
    * EMPTY delta (the users are gone) and no-ops. */
  def forgetUsersFully(spark: SparkSession, users: Seq[Long],
      stateDir: String, batchId: Long, numBuckets: Int = 16,
      numMeasures: Int = 0): Unit = {
    import spark.implicits._
    val path = s"$stateDir/sessions"
    MvPipeline.assertAboveResumeFloor(spark, path, batchId)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")
    val mCols = mColsOf(numMeasures)
    val smCols = smColsOf(numMeasures)
    if (!(batchId >= 0 && fs.exists(staged))) {
      val kdf = users.toDF("k")
      val ids = MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets)
      def hit(table: String, schema: StructType): DataFrame =
        MvPipeline.readBuckets(spark, s"$path/$table", ids, schema)
          .join(broadcast(kdf), Seq("k"), "left_semi")
      val liveE = hit("e", eSchemaN(numMeasures))
      val liveV = hit("v", vSchemaN(numMeasures))
      val frozen = hit("vf", vSchemaN(numMeasures))
      val nil = lit(null).cast("long")
      val vCols = Seq("k", "st", "en", "n") ++ smCols
      def rows(src: DataFrame, tbl: String, b: org.apache.spark.sql.Column) =
        src.select(Seq(lit(tbl).as("tbl"), nil.as("id"), nil.as("t")) ++
          mCols.map(c => nil.as(c)) ++ vCols.map(col) ++
          Seq(b.as("b"), lit(-1L).as("w")): _*)
      val delta =
        liveE.select(Seq(lit("e").as("tbl"), col("id"), col("t")) ++
            mCols.map(col) ++
            Seq(col("k"), nil.as("st"), nil.as("en"), nil.as("n")) ++
            smCols.map(c => nil.as(c)) ++
            Seq(nil.as("b"), lit(-1L).as("w")): _*)
          .unionByName(rows(liveV, "v", nil))
          .unionByName(rows(liveV, "c", lit(batchId)))
          .unionByName(rows(frozen, "vf", nil))
          .unionByName(rows(frozen, "c", lit(batchId)))
      val tmp = new Path(s"$path/$stagedName.tmp")
      delta.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(staged, true)
      require(fs.rename(tmp, staged), s"stage delta $staged")
    }
    val delta = spark.read.parquet(staged.toString).persist()
    try MvPipeline.applyConcurrently(Seq(
      () => MvPipeline.upsertBucketedMerge(
        delta.filter(col("tbl") === "e")
          .select(("id" +: "t" +: mCols) ++ Seq("k", "w") map col: _*),
        s"$path/e", IncrementalJoinAggStar.mergeF, batchId, numBuckets,
        Seq("k")),
      () => MvPipeline.upsertBucketedMerge(
        delta.filter(col("tbl") === "v")
          .select((Seq("k", "st", "en", "n") ++ smCols :+ "w").map(col): _*),
        s"$path/v", mergeV, batchId, numBuckets, Seq("k")),
      () => MvPipeline.upsertBucketedMerge(
        delta.filter(col("tbl") === "vf")
          .select((Seq("k", "st", "en", "n") ++ smCols :+ "w").map(col): _*),
        s"$path/vf", mergeV, batchId, numBuckets, Seq("k")),
      () => MvPipeline.upsertBucketedMerge(
        delta.filter(col("tbl") === "c")
          .select((Seq("b", "k", "st", "en", "n") ++ smCols :+ "w")
            .map(col): _*)
          .distinct(), // the v/vf crash-window duplicate collapses here
        s"$path/c", (old, inc) => old.unionByName(inc).distinct(),
        batchId, numBuckets, Seq("k"))))
    finally delta.unpersist()
    if (fs.exists(new Path(path)))
      fs.listStatus(new Path(path))
        .filter(x => x.getPath.getName.startsWith("_delta_"))
        .foreach(x => fs.delete(x.getPath, true))
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
      gap: Long, numBuckets: Int = 16, numMeasures: Int = 0): Unit = {
    val path = s"$stateDir/sessions"
    // 1. APPEND the frozen rows to vf/ (idempotent distinct merge)
    val frozen = MvPipeline.readBucketedStateOrEmpty(spark, s"$path/v",
        vSchemaN(numMeasures))
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
      val keep = old.columns.toSeq
      val w = Window.partitionBy("k").orderBy("t", "id")
      old
        .withColumn("brk",
          when(col("t") - lag("t", 1).over(w) > gap, 1L).otherwise(0L))
        .withColumn("sx", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("sen", max("t").over(Window.partitionBy("k", "sx")))
        .filter(!(col("sen") + gap < horizon))
        .select(keep.map(col): _*)
    })
  }

  /** PURGE the FROZEN history of `users` (the other half of the GDPR
    * story — [[forgetUsers]] covers the live horizon and throws on
    * frozen rows): the named users' `vf/` floor rows are removed and
    * matching −1 changelog rows ship, so the view drops them, the
    * integral stays == view, and external sinks converge. One staged
    * delta under the standard marker protocol — replay (same
    * `batchId`) is a no-op, a crash before any apply re-runs, a crash
    * between the two applies converges on re-run (each table skips its
    * stamped buckets). Run this BEFORE [[forgetUsers]] for a user with
    * both frozen and live history. */
  def purgeFrozen(spark: SparkSession, users: Seq[Long], stateDir: String,
      batchId: Long, numBuckets: Int = 16, numMeasures: Int = 0): Unit = {
    import spark.implicits._
    val path = s"$stateDir/sessions"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")
    val smCols = smColsOf(numMeasures)
    if (!(batchId >= 0 && fs.exists(staged))) {
      val kdf = users.toDF("k")
      val rows = MvPipeline.readBuckets(spark, s"$path/vf",
          MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets),
          vSchemaN(numMeasures))
        .join(broadcast(kdf), Seq("k"), "left_semi")
      val delta = rows.select(Seq(lit("vf").as("tbl")) ++
          (Seq("k", "st", "en", "n") ++ smCols).map(col) ++
          Seq(lit(null).cast("long").as("b"), lit(-1L).as("w")): _*)
        .unionByName(rows.select(Seq(lit("c").as("tbl")) ++
          (Seq("k", "st", "en", "n") ++ smCols).map(col) ++
          Seq(lit(batchId).as("b"), lit(-1L).as("w")): _*))
      val tmp = new Path(s"$path/$stagedName.tmp")
      delta.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(staged, true)
      require(fs.rename(tmp, staged), s"stage delta $staged")
    }
    val delta = spark.read.parquet(staged.toString).persist()
    // the staged file must SURVIVE a failed apply (a retry re-reads it;
    // recomputing from the partially-applied vf/ would lose the c rows)
    try MvPipeline.applyConcurrently(Seq(
      () => MvPipeline.upsertBucketedMerge(
        delta.filter(col("tbl") === "vf")
          .select((Seq("k", "st", "en", "n") ++ smCols :+ "w").map(col): _*),
        s"$path/vf", mergeV, batchId, numBuckets, Seq("k")),
      () => MvPipeline.upsertBucketedMerge(
        delta.filter(col("tbl") === "c")
          .select((Seq("b", "k", "st", "en", "n") ++ smCols :+ "w")
            .map(col): _*),
        s"$path/c", (old, inc) => old.unionByName(inc).distinct(),
        batchId, numBuckets, Seq("k"))))
    finally delta.unpersist()
    if (fs.exists(new Path(path)))
      fs.listStatus(new Path(path))
        .filter(x => x.getPath.getName.startsWith("_delta_"))
        .foreach(x => fs.delete(x.getPath, true))
  }

  /** RESHARD the state dir to `newBuckets` (R163's write-side knob):
    * offline op between committed batches into a FRESH `dstDir`; resume
    * folding with `numBuckets = newBuckets` and batch ids above the
    * last committed. */
  def reshard(spark: SparkSession, srcDir: String, dstDir: String,
      newBuckets: Int): Unit = {
    val src = s"$srcDir/sessions"
    val dst = s"$dstDir/sessions"
    Seq("e", "v", "vf", "c").foreach(t =>
      MvPipeline.reshardBucketed(spark, s"$src/$t", s"$dst/$t", newBuckets,
        Seq("k")))
    // replay safety: the destination carries no per-bucket stamps, so it
    // refuses batch ids at or below the last one committed here
    MvPipeline.writeResumeFloor(spark, dst,
      math.max(MvPipeline.maxBatchIn(spark, s"$src/c"),
        MvPipeline.maxStampUnder(spark, src)))
  }

  /** BOOTSTRAP a fresh state dir from a batch event table — the batch
    * sessionize plan once, instead of per-batch delta machinery. */
  def bootstrap(events: DataFrame, gap: Long, stateDir: String,
      baselineBatch: Long = 0L, numBuckets: Int = 16,
      numMeasures: Int = 0): Unit = {
    val spark = events.sparkSession
    val mCols = mColsOf(numMeasures)
    val path = s"$stateDir/sessions"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(path)),
      s"bootstrap requires a fresh state dir, found $path")
    val eIn = events.select(Seq(col("id").cast("long").as("id"),
        col("t").cast("long").as("t")) ++
        mCols.map(c => col(c).cast("long").as(c)) :+
        col("k").cast("long").as("k"): _*)
      .groupBy("id")
      .agg(min(struct(("t" +: mCols :+ "k").map(col): _*)).as("x"))
      .select(col("id") +: ("t" +: mCols :+ "k").map(c =>
        col(s"x.$c").as(c)): _*)
      .transform(graft.operators.Caching.persisted)
    try {
      MvPipeline.upsertBucketedMerge(eIn, s"$path/e",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets,
        Seq("k"))
      val v = sessionize(eIn, gap, numMeasures)
        .transform(graft.operators.Caching.persisted)
      MvPipeline.upsertBucketedMerge(v, s"$path/v",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets,
        Seq("k"))
      MvPipeline.upsertBucketedMerge(
        v.select(lit(baselineBatch).as("b") +:
          (Seq("k", "st", "en", "n") ++ smColsOf(numMeasures)).map(col) :+
          lit(1L).as("w"): _*),
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
      numBuckets: Int = 16, numMeasures: Int = 0)
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
          gap, stateDir, batchId, numBuckets = numBuckets,
          numMeasures = numMeasures)
      }
      .start()
}
