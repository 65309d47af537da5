package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** WATERMARK-BOUNDED strict-dedup funnel (SURVEY.md §2.11 R153) — the
  * bounded-state alternative on the state-management menu: every other
  * maintained view here is exact-with-unbounded-late-data by design
  * (the reference's T3 semantics), which for the strict funnels means
  * retaining events forever (any late event can retract any chain).
  * This variant trades late-data completeness for a PROVABLE state
  * bound, the way Spark's own watermarked aggregations do:
  *
  *   - a WATERMARK `W = max(event time seen) − lateness` advances
  *     monotonically per fold; batch events with `t < W` (as of the
  *     previous fold) are DROPPED — the one documented divergence from
  *     [[IncrementalStrictFunnel]]: a beyond-horizon late event that
  *     would have retracted (or raised) a level simply never does;
  *   - [[compact]] FREEZES history: chains are at most `windowUs` long,
  *     so a chain touching any event newer than `C = W − windowUs`
  *     starts after `C − windowUs` — events at or before `C − windowUs`
  *     can never join a chain with future-admissible events. Their
  *     contribution folds into a per-user frozen-level floor (`z` row,
  *     monotone max — frozen levels never retract, late events that
  *     could have killed those chains are beyond the horizon by
  *     construction), and the event rows drop;
  *   - therefore retained events per user span at most
  *     `lateness + 2·windowUs` of event time after a compaction — state
  *     is O(users + events within the horizon window), never O(all
  *     time). Within the horizon, semantics are IDENTICAL to the exact
  *     view (including retractions), and the Z-set changelog/integral
  *     invariant is unchanged.
  *
  * State: the [[IncrementalStrictFunnel]] table extended with `z` rows
  * (user frozen floor, REPLACE-max per user) and a `w` row under the
  * sentinel user −1 (the watermark, REPLACE-max). Served level = the
  * `v` rows, maintained as `max(frozen floor, strict scan over
  * retained events)` per affected user. */
object IncrementalStrictFunnelBounded {

  private val SentinelUser = -1L

  /** Fold one micro-batch; events older than the watermark (as advanced
    * by PREVIOUS folds) are dropped. `lateness` in the same microsecond
    * unit as the timestamps. */
  def processBatch(df: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long, latenessUs: Long,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16): Unit = {
    require(steps.nonEmpty)
    val spark = df.sparkSession
    val path = s"$stateDir/strictfunnelbounded"
    val w0 = watermark(spark, stateDir, numBuckets)

    val kept = df.filter(col(tsUsCol).cast("long") >= lit(w0))
      .transform(graft.operators.Caching.persisted)
    val users = kept.select(lit("u").as("kind"), lit(0).as("k"),
      col(userCol).cast("long").as("user"), lit(null).cast("long").as("t"),
      lit(null).cast("long").as("id"), lit(null).cast("string").as("et"),
      lit(null).cast("long").as("w"))
    val evs = kept.filter(col(typeCol).isin(steps: _*))
      .select(lit("e").as("kind"), lit(0).as("k"),
        col(userCol).cast("long").as("user"), col(tsUsCol).cast("long").as("t"),
        lit(0L).as("id"), col(typeCol).as("et"),
        lit(null).cast("long").as("w"))
    val inc = users.unionByName(evs)

    MvPipeline.upsertBucketedStaged(spark, path, {
      val probe = inc.select("user")
        .unionByName(spark.range(1).select(lit(SentinelUser).as("user")))
      val st = MvPipeline.readBuckets(spark, path,
          MvPipeline.bucketIdsOf(probe, Seq("user"), numBuckets), inc.schema)
        .transform(graft.operators.Caching.persisted)
      val batchUsers = inc.select("user").distinct()
        .transform(graft.operators.Caching.persisted)
      def affected(kind: String): DataFrame =
        st.filter(col("kind") === kind)
          .join(batchUsers, Seq("user"), "left_semi")

      val eDelta = inc.filter(col("kind") === "e").distinct()
        .join(affected("e").select("user", "t", "id", "et"),
          Seq("user", "t", "id", "et"), "left_anti")
      val uDelta = inc.filter(col("kind") === "u").distinct()
        .join(affected("u").select("user"), Seq("user"), "left_anti")

      // re-derive affected users: strict scan over retained ∪ batch
      // events, floored by the frozen level
      val typed = affected("e").select("user", "t", "id", "et")
        .unionByName(inc.filter(col("kind") === "e")
          .select("user", "t", "id", "et"))
        .distinct()
      val chain = Funnel.windowFunnelStrictDedup(typed, "user", "t", "et",
        steps, windowUs)
      val uniAff = affected("u").select("user")
        .unionByName(inc.filter(col("kind") === "u").select("user"))
        .distinct()
      val frozen = affected("z").select(col("user"), col("k").as("zk"))
      val newV = uniAff.join(chain, Seq("user"), "left")
        .join(frozen, Seq("user"), "left")
        .select(col("user"),
          greatest(coalesce(col("level"), lit(0)),
            coalesce(col("zk"), lit(0))).cast("int").as("level"))
        .transform(graft.operators.Caching.persisted)
      val oldV = affected("v")
        .select(col("user"), col("k").cast("int").as("level"))
        .transform(graft.operators.Caching.persisted)

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

      // advance the watermark (monotone; deterministic per batch input)
      val wNew = kept.agg(max(col(tsUsCol).cast("long"))).collect().head
      val wDelta =
        if (wNew.isNullAt(0)) inc.limit(0)
        else spark.range(1).select(lit("w").as("kind"), lit(0).as("k"),
          lit(SentinelUser).as("user"),
          lit(math.max(w0, wNew.getLong(0) - latenessUs)).as("t"),
          lit(null).cast("long").as("id"), lit(null).cast("string").as("et"),
          lit(null).cast("long").as("w"))

      eDelta.unionByName(uDelta).unionByName(vDelta).unionByName(dDelta)
        .unionByName(wDelta)
    }, merge, batchId, numBuckets, Seq("user"))
    graft.operators.Caching.releaseAll()
  }

  /** Per-bucket merge: `e`/`u`/`d` sets; `v` REPLACE per user; `z` and
    * `w` REPLACE-max (both monotone). */
  private def merge(old: DataFrame, inc: DataFrame): DataFrame = {
    val all = old.unionByName(inc)
    val eud = all.filter(!col("kind").isin("v", "z", "w")).distinct()
    val vOld = old.filter(col("kind") === "v")
      .join(inc.filter(col("kind") === "v").select("user").distinct(),
        Seq("user"), "left_anti")
    val zw = all.filter(col("kind").isin("z", "w"))
      .groupBy("kind", "user")
      .agg(max(col("k")).as("k"), max(col("t")).as("t"))
      .select(col("kind"), col("k"), col("user"), col("t"),
        lit(null).cast("long").as("id"), lit(null).cast("string").as("et"),
        lit(null).cast("long").as("w"))
    eud.unionByName(vOld).unionByName(inc.filter(col("kind") === "v"))
      .unionByName(zw)
  }

  /** The current watermark (−Long.MaxValue-ish floor when none yet). */
  def watermark(spark: SparkSession, stateDir: String,
      numBuckets: Int = 16): Long = {
    import spark.implicits._
    val path = s"$stateDir/strictfunnelbounded"
    val probe = Seq(SentinelUser).toDF("user")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "kind STRING, k INT, user BIGINT, t BIGINT, id BIGINT, et STRING, w BIGINT")
    val r = MvPipeline.readBuckets(spark, path,
        MvPipeline.bucketIdsOf(probe, Seq("user"), numBuckets), schema)
      .filter(col("kind") === "w")
      .agg(max(col("t"))).collect().head
    if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
  }

  /** FREEZE-and-drop compaction: fold chains that can no longer interact
    * with admissible events into the per-user `z` floor and drop their
    * event rows. `C = watermark − windowUs`; the floor absorbs the
    * strict level over events ≤ C (max-merged with any prior floor —
    * the induction: chains entirely ≤ C either predate the previous
    * floor or lie fully within still-retained events), then events at
    * or before `C − windowUs` drop. Served levels are UNCHANGED; state
    * event-time span per user is bounded by `lateness + 2·windowUs`.
    * Idempotent; per-bucket marker protocol. */
  def compact(spark: SparkSession, stateDir: String, steps: Seq[String],
      windowUs: Long, numBuckets: Int = 16): Unit = {
    val wm = watermark(spark, stateDir, numBuckets)
    if (wm == Long.MinValue) return
    val cut = wm - windowUs
    MvPipeline.transformBuckets(spark, s"$stateDir/strictfunnelbounded", old => {
      val o = old.transform(graft.operators.Caching.persisted)
      val oldEvents = o.filter(col("kind") === "e" && col("t") <= lit(cut))
      val frozenNew = Funnel.windowFunnelStrictDedup(
        oldEvents.select("user", "t", "id", "et"), "user", "t", "et",
        steps, windowUs)
        .select(lit("z").as("kind"), col("level").cast("int").as("k"),
          col("user"), lit(null).cast("long").as("t"),
          lit(null).cast("long").as("id"), lit(null).cast("string").as("et"),
          lit(null).cast("long").as("w"))
      val z = o.filter(col("kind") === "z").unionByName(frozenNew)
        .groupBy("user").agg(max(col("k")).as("k"))
        .select(lit("z").as("kind"), col("k"), col("user"),
          lit(null).cast("long").as("t"), lit(null).cast("long").as("id"),
          lit(null).cast("string").as("et"), lit(null).cast("long").as("w"))
      o.filter(col("kind") =!= "z")
        .filter(!(col("kind") === "e" && col("t") <= lit(cut - windowUs)))
        .unionByName(z)
    })
    graft.operators.Caching.releaseAll()
  }

  /** `(user, level)` — equal to the exact view whenever no event beyond
    * the lateness horizon was dropped; otherwise the documented
    * divergence (dropped late events never retract or raise). */
  def levels(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedState(spark, s"$stateDir/strictfunnelbounded")
      .filter(col("kind") === "v")
      .select(col("user"), col("k").cast("int").as("level"))

  /** Z-set changelog; per-(user, level) weight sum IS the view. */
  def changelog(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedState(spark, s"$stateDir/strictfunnelbounded")
      .filter(col("kind") === "d")
      .select(col("t").as("batch"), col("user"),
        col("k").cast("int").as("level"), col("w"))
}
