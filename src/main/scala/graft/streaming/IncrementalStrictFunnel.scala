package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Continuously-maintained STRICT-DEDUP `windowFunnel` — the engine's
  * first RETRACTION-bearing incremental view, past the monotone-lattice
  * family ([[IncrementalFunnel]], the near-dup clusterers): in
  * strict-dedup mode a late-arriving duplicate falling inside an
  * already-matched gap KILLS a previously-valid chain, so a user's level
  * can go DOWN. No monotone delta rule exists (the r9 scope note on
  * [[IncrementalFunnel]] documents why), and the reference engine family
  * doesn't maintain this view incrementally at all — it re-scans.
  *
  * Semantics maintained under Z-set (weighted-delta) semantics:
  *   - the VIEW is the batch
  *     [[Funnel.windowFunnelStrictDedup]] `(user, level)` relation;
  *   - each micro-batch emits a SIGNED delta: `-1` rows retracting
  *     previously-reported levels that the batch invalidated (or
  *     deepened), `+1` rows asserting the new ones;
  *   - the materialized view is the running integral of those deltas,
  *     and equals the batch recompute after EVERY batch for ANY event
  *     arrival order.
  *
  * How: per-user levels are a GROUPED view whose group state is bounded
  * (the user's own step-type events), so maintenance re-derives exactly
  * the groups a batch touches — the standard incremental strategy for
  * non-monotone per-key views (re-evaluate affected keys, diff against
  * their previous output, emit retraction pairs). Per batch:
  *   1. retained step events of the BATCH'S users (state ∪ batch —
  *      user-keyed semi-joins against bucketed state, never a corpus
  *      scan; set semantics suffice because every comparison in the
  *      strict-dedup scan is strict or min-based, so duplicate
  *      `(user, step, t)` rows can never change a level);
  *   2. re-run the single-pass strict-dedup scan on those users only;
  *   3. diff against their previous `v` rows → `+1`/`-1` changelog.
  *
  * State is ONE bucketed table `(kind, k, user, t, w)`
  * ([[MvPipeline.upsertBucketedStaged]], bucketed by `user`):
  *   - `e` rows: retained step-k events (set);
  *   - `u` rows: the user universe (level-0 contract);
  *   - `v` rows: the materialized view, `k` = current level (replaced
  *     per affected user — idempotent because the staged delta is
  *     byte-identical on replay);
  *   - `d` rows: the Z-set changelog, `k` = level, `w` = ±1, `t` = the
  *     emitting batch id. Σw per (user, level) over all `d` rows equals
  *     the `v` materialization — the integral invariant the spec pins.
  *
  * 100 TB shape: cost per batch ∝ the batch's users' event history (the
  * same asymptotics the reference pays PER QUERY, paid here once per
  * arrival); writes touch only the batch users' buckets; reads are a
  * `v`-row scan. */
object IncrementalStrictFunnel {

  /** Fold one micro-batch; args as [[Funnel.windowFunnelStrictDedup]]. */
  def processBatch(df: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16): Unit = {
    require(steps.nonEmpty)
    val spark = df.sparkSession
    val path = s"$stateDir/strictfunnel"
    val stepArr = array(steps.map(lit): _*)

    val users = df.select(lit("u").as("kind"), lit(0).as("k"),
      col(userCol).as("user"), lit(null).cast("long").as("t"),
      lit(null).cast("long").as("w"))
    val evs = steps.zipWithIndex.map { case (tp, i) =>
      df.filter(col(typeCol) === tp)
        .select(lit("e").as("kind"), lit(i + 1).as("k"),
          col(userCol).as("user"), col(tsUsCol).cast("long").as("t"),
          lit(null).cast("long").as("w"))
    }
    val inc = (users +: evs).reduce(_.unionByName(_))

    MvPipeline.upsertBucketedStaged(spark, path, {
      val st = MvPipeline.readBucketedStateOrEmpty(spark, path, inc.schema)
        .transform(graft.operators.Caching.persisted)
      val batchUsers = inc.select("user").distinct()
        .transform(graft.operators.Caching.persisted)
      def affected(kind: String): DataFrame =
        st.filter(col("kind") === kind)
          .join(batchUsers, Seq("user"), "left_semi")

      // Δ state rows (set-minimal: only genuinely new events/users)
      val eDelta = inc.filter(col("kind") === "e")
        .select("kind", "k", "user", "t", "w").distinct()
        .join(affected("e").select("k", "user", "t"),
          Seq("k", "user", "t"), "left_anti")
      val uDelta = inc.filter(col("kind") === "u")
        .select("kind", "k", "user", "t", "w").distinct()
        .join(affected("u").select("user"), Seq("user"), "left_anti")

      // re-derive the affected users' levels from their FULL event sets
      val allE = affected("e").select("k", "user", "t")
        .unionByName(inc.filter(col("kind") === "e").select("k", "user", "t"))
        .distinct()
      val typed = allE.select(col("user"),
        element_at(stepArr, col("k")).as("et"), col("t"))
      val chain = Funnel.windowFunnelStrictDedup(
        typed, "user", "t", "et", steps, windowUs)
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
      val vDelta = inserted.select(lit("v").as("kind"),
        col("level").as("k"), col("user"),
        lit(null).cast("long").as("t"), lit(null).cast("long").as("w"))
      val dDelta = retracted.select(lit("d").as("kind"),
          col("level").as("k"), col("user"),
          lit(batchId).as("t"), lit(-1L).as("w"))
        .unionByName(inserted.select(lit("d").as("kind"),
          col("level").as("k"), col("user"),
          lit(batchId).as("t"), lit(1L).as("w")))

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

  /** The materialized view: `(user, level)` == batch
    * [[Funnel.windowFunnelStrictDedup]] over everything folded. */
  def levels(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedState(spark, s"$stateDir/strictfunnel")
      .filter(col("kind") === "v")
      .select(col("user"), col("k").cast("int").as("level"))

  /** The Z-set changelog: `(batch, user, level, w)` with w = ±1; its
    * per-(user, level) weight sum IS the materialized view. */
  def changelog(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedState(spark, s"$stateDir/strictfunnel")
      .filter(col("kind") === "d")
      .select(col("t").as("batch"), col("user"),
        col("k").cast("int").as("level"), col("w"))
}
