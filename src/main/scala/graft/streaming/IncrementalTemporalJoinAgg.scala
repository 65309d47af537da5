package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incrementally-maintained AS-OF (temporal / SCD-2) join-aggregate
  * (SURVEY.md §2.11 R160) — each fact resolves the dimension VERSION
  * valid at the fact's event time,
  *
  *   SELECT d.vs AS g, sum(f.m), count(*)
  *   FROM facts f ASOF LEFT JOIN dim_versions d
  *     ON f.k = d.k AND f.t >= d.vf
  *   GROUP BY g
  *
  * — ClickHouse's `ASOF JOIN` over a slowly-changing dimension, which
  * the reference's consumers run ad-hoc over raw history and which no
  * summing summary can maintain: a LATE version retro-reassigns every
  * fact in its validity span, and a version DELETE makes those facts
  * fall back to the previous version (or the unmatched null group).
  * The repo's batch member is `asof_clicks` (operators/AsOfJoin.scala);
  * the oracled batch twin is **x123_asof_revenue** (DuckDB native
  * `ASOF LEFT JOIN`), multi-measure twin **x125_asof_measures**.
  *
  * Since the r11 consolidation this object is a THIN 1-BRANCH INSTANCE
  * of the multi-branch temporal star ([[IncrementalTemporalStar]],
  * R162) — the same relationship the equality-keyed binary/chain/N
  * engines ([[IncrementalJoinAgg]]/[[IncrementalJoinAggChain]]/
  * [[IncrementalJoinAggN]]) have to [[IncrementalJoinAggStar]]. One
  * maintenance code path carries the telescoped Δ-rule, the interval
  * Z-set diff, the staged-delta protocol, compaction, and forget; this
  * delegate only maps the single-key surface (`k`, dim table `d1/`,
  * raw nullable `g`) onto the star's (`k1`, `d{b}/`, encoded group).
  * Delta-rule semantics, contracts, and per-batch O(affected) cost are
  * documented ONCE on the star engine. State lives under
  * `stateDir/temporaljoinagg/` (the delegate's own namespace via the
  * star's `root` parameter): `f/` facts `(id, t, m[, m2..], k1)`
  * bucketed by k1, `d1/` version rows `(k, vl, vs)`, `a/` additive
  * aggregate + signed changelog.
  *
  * Contracts (the star's, 1-branch): fact ids arrive once and pin
  * (t, measures, k); fact deletes name (id, k); versions keyed by
  * (k, vf), replace-on-upsert, delete names the exact (k, vf);
  * delete-wins within batch; ties `vf <= t` inclusive. Multi-measure
  * per R161. */
object IncrementalTemporalJoinAgg {

  private val Root = "temporaljoinagg"

  private def mColsOf(nM: Int): Seq[String] = "m" +: (2 to nM).map(i => s"m$i")

  /** Fold one CDC micro-batch. Frames may be empty; columns:
    * `facts(id, t, m[, m2..mM], k)`, `factDels(id, k)`,
    * `dimUps(k, vf, vs)`, `dimDels(k, vf)`. `numMeasures > 1` sums
    * several measures independently under the SAME Z-set weights
    * (the R161 multi-measure contract). */
  def processBatch(facts: DataFrame, factDels: DataFrame,
      dimUps: DataFrame, dimDels: DataFrame,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16,
      numMeasures: Int = 1): Unit =
    IncrementalTemporalStar.processBatch(
      facts.withColumnRenamed("k", "k1"),
      factDels.withColumnRenamed("k", "k1"),
      Seq(dimUps), Seq(dimDels),
      stateDir, batchId, numBuckets, numMeasures, root = Root)

  /** `(g, total[, total2..], rows)` == the batch ASOF LEFT
    * join-aggregate; `g` is NULL for facts before their key's first
    * version (and for keyless facts). [[innerView]] is the ASOF INNER
    * projection. */
  def view(spark: SparkSession, stateDir: String,
      numMeasures: Int = 1): DataFrame =
    IncrementalTemporalStar.view(spark, stateDir, 1, numMeasures, Root)
      .withColumnRenamed("g1", "g")

  /** The ASOF INNER join-aggregate: [[view]] without the unmatched
    * (null-group) row. */
  def innerView(spark: SparkSession, stateDir: String,
      numMeasures: Int = 1): DataFrame =
    view(spark, stateDir, numMeasures).filter(col("g").isNotNull)

  /** [[view]] restricted to `groups` — the bucket-pruned point read:
    * only the `a/` buckets the named groups hash into are opened.
    * Named groups are non-null; the null (unmatched) group needs the
    * full [[view]]. */
  def viewFor(spark: SparkSession, stateDir: String, groups: Seq[String],
      numBuckets: Int = 16, numMeasures: Int = 1): DataFrame =
    IncrementalTemporalStar.viewFor(spark, stateDir,
        groups.map(g => Seq(Option(g))), 1, numBuckets, numMeasures, Root)
      .withColumnRenamed("g1", "g")

  /** Z-set changelog `(batch, g, dtotal[, dtotalN..], drows)`;
    * integral == view. */
  def changelog(spark: SparkSession, stateDir: String,
      numMeasures: Int = 1): DataFrame =
    IncrementalTemporalStar.changelog(spark, stateDir, 1, numMeasures, Root)
      .withColumnRenamed("g1", "g")

  /** AS-OF read over MAINTENANCE time: the aggregate as it stood after
    * `batch` committed (the family contract — orthogonal to the view's
    * own event-time as-of semantics). */
  def viewAsOf(spark: SparkSession, stateDir: String, batch: Long,
      numMeasures: Int = 1): DataFrame =
    IncrementalTemporalStar.viewAsOf(spark, stateDir, batch, 1,
        numMeasures, Root)
      .withColumnRenamed("g1", "g")

  /** FORGET a set of dimension keys (GDPR / user deletion): remove
    * every fact AND every version of the named keys from the view —
    * ONE CDC batch through [[processBatch]] (the star's device), so
    * −1 changelog rows ship, integral == view holds through the
    * forget, and replay (same `batchId`) is a no-op. Absent keys
    * no-op. */
  def forgetKeys(spark: SparkSession, keys: Seq[Long], stateDir: String,
      batchId: Long, numBuckets: Int = 16, numMeasures: Int = 1): Unit =
    IncrementalTemporalStar.forgetKeys(spark, 1, keys, stateDir, batchId,
      numBranches = 1, numBuckets = numBuckets, numMeasures = numMeasures,
      root = Root)

  /** WATERMARK-EXACT state compaction — the bounded-state member of
    * the temporal family: under the contract that every FUTURE fact
    * time and version valid-from is `>= horizon`, facts with
    * `t < horizon` leave `f/`, and per key the pre-horizon versions
    * collapse to the single prevailing one floored at `horizon − 1`
    * (never collides with a real at-horizon version; an in-contract
    * delete of that version falls back to the floor exactly). View
    * untouched; retained state bounded by the horizon window. The
    * documented divergence mirrors R153: an OUT-of-contract late fact
    * resolves the collapsed floor instead of its exact historical
    * version — callers pick the horizon as their lateness bound. */
  def compactState(spark: SparkSession, stateDir: String, horizon: Long): Unit =
    IncrementalTemporalStar.compactState(spark, stateDir, horizon, 1, Root)

  /** Changelog compaction: fold the prefix `<= upTo` into one baseline
    * row per group; as-of stays exact at and above the floor. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    IncrementalTemporalStar.compactChangelog(spark, stateDir, upTo, Root)

  /** BOOTSTRAP a fresh state dir from batch tables — ONE window pass
    * (the star's per-branch resolution) instead of per-batch delta
    * machinery. Continuation folds use batch ids above the baseline.
    * `facts(id, t, m[, m2..], k)`, `dims(k, vf, vs)`. */
  def bootstrap(facts: DataFrame, dims: DataFrame, stateDir: String,
      baselineBatch: Long = 0L, numBuckets: Int = 16,
      numMeasures: Int = 1): Unit =
    IncrementalTemporalStar.bootstrap(facts.withColumnRenamed("k", "k1"),
      Seq(dims), stateDir, baselineBatch, numBuckets, numMeasures,
      root = Root)

  /** The BATCH as-of aggregate `(g, total[, totalN..], rows)` — the
    * plan the maintained view must equal, kept INDEPENDENT of the
    * maintenance path on purpose (it is the spec model and the
    * x123/x125 reference plan): one shuffle by key, one event-time
    * sort, `last(vs, ignoreNulls)` carries the prevailing version onto
    * each fact (version rows sort BEFORE a fact at the same timestamp:
    * `vf <= t` inclusive ties). */
  def asOfAggregate(facts: DataFrame, dims: DataFrame,
      numMeasures: Int = 1): DataFrame = {
    val mCols = mColsOf(numMeasures)
    val f = facts.select(Seq(col("k"), col("t").as("us"),
      lit(1).as("isFact")) ++ mCols.map(col) :+
      lit(null).cast("string").as("v"): _*)
    val d = dims.select(Seq(col("k"), col("vf").as("us"),
      lit(0).as("isFact")) ++ mCols.map(c => lit(null).cast("long").as(c)) :+
      col("vs").as("v"): _*)
    val w = Window.partitionBy("k").orderBy("us", "isFact")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tAggs = mCols.zipWithIndex.map { case (c, i) =>
      sum(col(c)).as(if (i == 0) "total" else s"total${i + 1}") }
    f.unionByName(d)
      .withColumn("g", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("isFact") === 1)
      .groupBy("g")
      .agg(tAggs.head, (tAggs.tail :+ count(lit(1)).as("rows")): _*)
  }

  /** Continuous maintenance over a mixed CDC stream: `kind` ∈
    * fact | fact_del | d | d_del; fixed columns per kind (absent
    * columns null). Single writer per state dir. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      numMeasures: Int = 1, numBuckets: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(
          batch.filter(col("kind") === "fact"),
          batch.filter(col("kind") === "fact_del"),
          batch.filter(col("kind") === "d"),
          batch.filter(col("kind") === "d_del"),
          stateDir, batchId, numBuckets = numBuckets,
          numMeasures = numMeasures)
      }
      .start()
}
