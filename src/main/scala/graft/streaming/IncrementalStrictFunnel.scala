package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Continuously-maintained STRICT funnels — the engine's
  * RETRACTION-bearing incremental views, past the monotone-lattice
  * family ([[IncrementalFunnel]], the near-dup clusterers): in both
  * strict modes a late-arriving event can KILL a previously-valid chain
  * (strict-dedup: a duplicate of a matched step inside a matched gap;
  * strict-order: ANY intervening event between matched consecutive
  * positions), so a user's level can go DOWN. No monotone delta rule
  * exists (the r9 scope note on [[IncrementalFunnel]] documents why),
  * and the reference engine family doesn't maintain these views
  * incrementally at all — it re-scans.
  *
  * Semantics maintained under Z-set (weighted-delta) semantics:
  *   - the VIEW is the batch [[Funnel.windowFunnelStrictDedup]] (or
  *     [[Funnel.windowFunnelStrictOrder]]) `(user, level)` relation;
  *   - each micro-batch emits a SIGNED delta: `-1` rows retracting
  *     previously-reported levels the batch invalidated (or deepened),
  *     `+1` rows asserting the new ones;
  *   - the materialized view is the running integral of those deltas,
  *     and equals the batch recompute after EVERY batch for ANY event
  *     arrival order.
  *
  * How: per-user levels are a GROUPED view whose group state is bounded
  * (the user's own retained events), so maintenance re-derives exactly
  * the groups a batch touches — the standard incremental strategy for
  * non-monotone per-key views (re-evaluate affected keys, diff against
  * their previous output, emit retraction pairs). Per batch:
  *   1. retained events of the BATCH'S users (state ∪ batch —
  *      user-keyed semi-joins against bucketed state, never a corpus
  *      scan). Strict-dedup retains only STEP-type events (set
  *      semantics suffice: every comparison in its scan is strict or
  *      min-based, so duplicate `(user, step, t)` rows can never change
  *      a level). Strict-order retains EVERY event — any type can abort
  *      a chain — deduplicated on the event id (at-least-once sources
  *      fold clean; ids are assumed unique, the corpus contract);
  *   2. re-run the single-pass batch scan on those users only;
  *   3. diff against their previous `v` rows → `+1`/`-1` changelog.
  *
  * State is ONE bucketed table `(kind, k, user, t, id, et, w)`
  * ([[MvPipeline.upsertBucketedStaged]], bucketed by `user`):
  *   - `e` rows: retained events (`t`, `id`, `et`; set);
  *   - `u` rows: the user universe (level-0 contract);
  *   - `v` rows: the materialized view, `k` = current level (replaced
  *     per affected user — idempotent because the staged delta is
  *     byte-identical on replay);
  *   - `d` rows: the Z-set changelog, `k` = level, `w` = ±1, `t` = the
  *     emitting batch id. Σw per (user, level) over all `d` rows equals
  *     the `v` materialization — the integral invariant the spec pins.
  *     (The invariant assumes distinct non-negative batch ids — the
  *     streaming contract; ad-hoc `batchId = -1` folds maintain `v`
  *     exactly but may collapse identical changelog rows.)
  *
  * 100 TB shape: cost per batch ∝ the batch's users' event history (the
  * same asymptotics the reference pays PER QUERY, paid here once per
  * arrival); writes touch only the batch users' buckets; reads are a
  * `v`-row scan. Strict-order's retained-event state is O(events of
  * users seen) — inherent to its semantics (any event matters) and
  * stated rather than hidden; bound it upstream by pre-filtering the
  * event types the product funnels over. */
object IncrementalStrictFunnel {

  /** Fold one micro-batch into the strict-DEDUP view; args as
    * [[Funnel.windowFunnelStrictDedup]]. */
  def processBatch(df: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16): Unit = {
    require(steps.nonEmpty)
    val users = df.select(lit("u").as("kind"), lit(0).as("k"),
      col(userCol).as("user"), lit(null).cast("long").as("t"),
      lit(null).cast("long").as("id"), lit(null).cast("string").as("et"),
      lit(null).cast("long").as("w"))
    // only step-type events matter in this mode; no id in its scan —
    // a zero sentinel (not null) keeps the set-dedup anti-join exact
    val evs = df.filter(col(typeCol).isin(steps: _*))
      .select(lit("e").as("kind"), lit(0).as("k"),
        col(userCol).as("user"), col(tsUsCol).cast("long").as("t"),
        lit(0L).as("id"), col(typeCol).as("et"),
        lit(null).cast("long").as("w"))
    maintain(df.sparkSession, users.unionByName(evs),
      s"$stateDir/strictfunnel",
      typed => Funnel.windowFunnelStrictDedup(
        typed, "user", "t", "et", steps, windowUs),
      batchId, numBuckets)
  }

  /** Fold one micro-batch into the strict-ORDER view; args as
    * [[Funnel.windowFunnelStrictOrder]] (the id column carries the
    * total-order tie break AND the at-least-once dedup key). */
  def processBatchStrictOrder(df: DataFrame, userCol: String,
      tsUsCol: String, idCol: String, typeCol: String, steps: Seq[String],
      windowUs: Long, stateDir: String, batchId: Long = -1L,
      numBuckets: Int = 16): Unit = {
    require(steps.nonEmpty)
    val users = df.select(lit("u").as("kind"), lit(0).as("k"),
      col(userCol).as("user"), lit(null).cast("long").as("t"),
      lit(null).cast("long").as("id"), lit(null).cast("string").as("et"),
      lit(null).cast("long").as("w"))
    // EVERY event is retained: any intervening type aborts a chain
    val evs = df.select(lit("e").as("kind"), lit(0).as("k"),
      col(userCol).as("user"), col(tsUsCol).cast("long").as("t"),
      col(idCol).cast("long").as("id"), col(typeCol).as("et"),
      lit(null).cast("long").as("w"))
    maintain(df.sparkSession, users.unionByName(evs),
      s"$stateDir/strictorderfunnel",
      typed => Funnel.windowFunnelStrictOrder(
        typed, "user", "t", "id", "et", steps, windowUs),
      batchId, numBuckets)
  }

  /** The shared affected-group re-derivation core: fold the projected
    * batch rows, re-derive batch users' levels via `derive` over their
    * retained `(user, t, id, et)` events, diff, changelog. */
  private def maintain(spark: SparkSession, inc: DataFrame, path: String,
      derive: DataFrame => DataFrame, batchId: Long, numBuckets: Int): Unit = {
    MvPipeline.upsertBucketedStaged(spark, path, {
      // PRUNED read (r10): maintenance only ever touches the BATCH's
      // users (every state reference below is an affected() semi-join or
      // a per-user anti-join against batch rows), so only their buckets
      // are read — not all of state
      val st = MvPipeline.readBuckets(spark, path,
          MvPipeline.bucketIdsOf(inc, Seq("user"), numBuckets), inc.schema)
        .transform(graft.operators.Caching.persisted)
      val batchUsers = inc.select("user").distinct()
        .transform(graft.operators.Caching.persisted)
      def affected(kind: String): DataFrame =
        st.filter(col("kind") === kind)
          .join(batchUsers, Seq("user"), "left_semi")

      // Δ state rows (set-minimal: only genuinely new events/users)
      val eDelta = inc.filter(col("kind") === "e")
        .select("kind", "k", "user", "t", "id", "et", "w").distinct()
        .join(affected("e").select("user", "t", "id", "et"),
          Seq("user", "t", "id", "et"), "left_anti")
      val uDelta = inc.filter(col("kind") === "u")
        .select("kind", "k", "user", "t", "id", "et", "w").distinct()
        .join(affected("u").select("user"), Seq("user"), "left_anti")

      // re-derive the affected users' levels from their FULL event sets
      val typed = affected("e").select("user", "t", "id", "et")
        .unionByName(inc.filter(col("kind") === "e")
          .select("user", "t", "id", "et"))
        .distinct()
      val chain = derive(typed)
      val uniAff = affected("u").select("user")
        .unionByName(inc.filter(col("kind") === "u").select("user"))
        .distinct()
      val newV = uniAff.join(chain, Seq("user"), "left")
        .select(col("user"),
          coalesce(col("level"), lit(0)).cast("int").as("level"))
        .transform(graft.operators.Caching.persisted)
      val oldV = affected("v")
        .select(col("user"), col("k").cast("int").as("level"))
        .transform(graft.operators.Caching.persisted)

      // the Z-set delta: retract replaced rows, assert changed ones
      val inserted = newV.join(oldV, Seq("user", "level"), "left_anti")
      val retracted = oldV.join(newV, Seq("user", "level"), "left_anti")
      def pack(kind: String, d: DataFrame, t: org.apache.spark.sql.Column,
          w: org.apache.spark.sql.Column): DataFrame =
        d.select(lit(kind).as("kind"), col("level").as("k"), col("user"),
          t.cast("long").as("t"), lit(null).cast("long").as("id"),
          lit(null).cast("string").as("et"), w.cast("long").as("w"))
      val vDelta = pack("v", inserted, lit(null), lit(null))
      val dDelta = pack("d", retracted, lit(batchId), lit(-1L))
        .unionByName(pack("d", inserted, lit(batchId), lit(1L)))

      eDelta.unionByName(uDelta).unionByName(vDelta).unionByName(dDelta)
    }, merge, batchId, numBuckets, Seq("user"))
    graft.operators.Caching.releaseAll()
  }

  /** Per-bucket merge: `e`/`u`/`d` rows are sets (distinct union — the
    * `d` changelog is append-only and replay-identical, so the set view
    * is exact); `v` rows REPLACE per user (deterministic because the
    * staged delta is byte-identical on replay). */
  private def merge(old: DataFrame, inc: DataFrame): DataFrame = {
    val all = old.unionByName(inc)
    val eud = all.filter(col("kind") =!= "v").distinct()
    val vOld = old.filter(col("kind") === "v")
      .join(inc.filter(col("kind") === "v").select("user").distinct(),
        Seq("user"), "left_anti")
    eud.unionByName(vOld).unionByName(inc.filter(col("kind") === "v"))
  }

  /** Continuous strict-dedup maintenance over JSON-line files. */
  def start(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      stateDir: String, checkpointDir: String,
      userCol: String, tsUsCol: String, typeCol: String,
      steps: Seq[String], windowUs: Long,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, userCol, tsUsCol, typeCol, steps, windowUs,
          stateDir, batchId)
      }
      .start()

  /** The materialized view: `(user, level)` == the batch strict funnel
    * over everything folded. `view` = "strictfunnel" (dedup mode,
    * default) or "strictorderfunnel". */
  def levels(spark: SparkSession, stateDir: String,
      view: String = "strictfunnel"): DataFrame =
    MvPipeline.readBucketedState(spark, s"$stateDir/$view")
      .filter(col("kind") === "v")
      .select(col("user"), col("k").cast("int").as("level"))

  /** The Z-set changelog: `(batch, user, level, w)` with w = ±1; its
    * per-(user, level) weight sum IS the materialized view. */
  def changelog(spark: SparkSession, stateDir: String,
      view: String = "strictfunnel"): DataFrame =
    MvPipeline.readBucketedState(spark, s"$stateDir/$view")
      .filter(col("kind") === "d")
      .select(col("t").as("batch"), col("user"),
        col("k").cast("int").as("level"), col("w"))

  /** Changelog compaction — the [[IncrementalJoinAgg.compactChangelog]]
    * contract for the funnel changelog: every `d` row with batch ≤
    * `upTo` folds into one baseline row per (user, level) stamped
    * `upTo` (net weight after assert/retract/re-assert cycles; zeros
    * drop); [[levelsAsOf]] stays exact at and above the floor. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long,
      view: String = "strictfunnel"): Unit =
    MvPipeline.transformBuckets(spark, s"$stateDir/$view", old => {
      val pre = old.filter(col("kind") === "d" && col("t") <= upTo)
      val baseline = pre.groupBy("user", "k")
        .agg(sum(col("w")).as("w"))
        .filter(col("w") =!= 0)
        .select(lit("d").as("kind"), col("k"), col("user"),
          lit(upTo).as("t"), lit(null).cast("long").as("id"),
          lit(null).cast("string").as("et"), col("w"))
      old.filter(!(col("kind") === "d" && col("t") <= upTo))
        .unionByName(baseline)
    })

  /** AS-OF (time-travel) read: the levels view exactly as it stood
    * after `batch` committed — the changelog integral truncated at the
    * batch (the integral==view invariant, applied to a prefix). Requires
    * the streaming mode's monotone batch ids; ad-hoc folds stamp −1 and
    * are not addressable, and batches below a [[compactChangelog]] floor
    * are no longer addressable. Cost: one changelog scan + a
    * (user, level) aggregate — no state is rewritten, no history table
    * is kept beyond the changelog the view already maintains. */
  def levelsAsOf(spark: SparkSession, stateDir: String, batch: Long,
      view: String = "strictfunnel"): DataFrame =
    changelog(spark, stateDir, view)
      .filter(col("batch") <= batch)
      .groupBy("user", "level")
      .agg(sum(col("w")).as("w"))
      .filter(col("w") > 0)
      .select(col("user"), col("level"))
}
