package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Continuously-maintained BINARY join-aggregate (SURVEY.md §2.11
  * R145): the one-dimension aggregate
  *
  *   SELECT dim.g, sum(fact.m) AS total, count(*) AS pairs
  *   FROM fact JOIN dim USING (jk) GROUP BY dim.g
  *
  * maintained under micro-batches that may carry BOTH new facts
  * (append-only, absorbed once per primary key) and dimension rows
  * (UPSERT on the join key — re-keying a dimension's group attribute
  * MOVES every joined fact's contribution, a retraction).
  *
  * The reference engine family cannot maintain this: ClickHouse MVs see
  * only the inserted block of ONE table — a dim row arriving after its
  * facts never joins (`/root/reference/README.md` MV DDL is single-
  * source). The bilinear delta-join rule
  *
  *   Δ(F ⋈ D) = ΔF ⋈ D' ∪ F₀ ⋈ ΔD
  *
  * (ΔD Z-set signed: an upsert of (jk, g_new) over (jk, g_old)
  * contributes {+1·g_new, −1·g_old}; a group leaves the view when its
  * live pair count hits 0 — batch GROUP BY bit-for-bit) is, since
  * R150, served by [[IncrementalJoinAggStar]] as its DEPTH-1
  * single-branch instance — one maintenance code path for the whole
  * join-agg family (r10 VERDICT consolidation). State lives under
  * `stateDir/joinaggstar/`: `f/` facts `(id, m, k1=jk)` bucketed by
  * jk, `d1_1/` dim rows `(k=jk, vs=g)`, `a/` aggregate + changelog —
  * reads bucket-pruned, writes marker-guarded, O(Δ) both sides.
  *
  * Contracts (unchanged from R145): fact `id` is the at-least-once
  * absorption key (a re-sent id is dropped; ids are unique per logical
  * fact). Within one batch, duplicate fact ids keep the min-(jk, m)
  * row and duplicate dim jks keep the max-g row. Dim `g` may be null;
  * it groups under null like SQL GROUP BY. Ad-hoc folds (batchId < 0)
  * maintain exactly but may collapse identical changelog rows. */
object IncrementalJoinAgg {

  private val spec1 =
    IncrementalJoinAggStar.StarSpec(Seq(1), groupAttrs = Seq((1, 1)))

  /** Fold one micro-batch (facts and/or dims — either may be empty)
    * into the maintained join-aggregate. */
  def processBatch(facts: DataFrame, factJk: String, factId: String, factM: String,
      dims: DataFrame, dimJk: String, dimG: String,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16): Unit =
    IncrementalJoinAggStar.processBatch(spec1,
      facts, Seq(factJk), factId, factM,
      facts.select(col(factJk), col(factId)).limit(0), Seq(factJk), factId,
      Seq(Seq(dims)), Seq(Seq((dimJk, "", dimG))),
      stateDir, batchId, numBuckets)

  /** The materialized view: `(g, total, pairs)` == the batch join-agg
    * over everything folded (groups with zero live pairs excluded —
    * batch GROUP BY semantics). */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    IncrementalJoinAggStar.view(spark, stateDir)
      .select(col("g"), col("total"), col("rows").as("pairs"))

  /** The Z-set changelog: `(batch, g, dtotal, dpairs)`; its per-group
    * running sum IS the materialized aggregate. */
  def changelog(spark: SparkSession, stateDir: String): DataFrame =
    IncrementalJoinAggStar.changelog(spark, stateDir)
      .select(col("batch"), col("g"), col("dtotal"), col("drows").as("dpairs"))

  /** Changelog compaction: fold every changelog row with batch ≤ `upTo`
    * into ONE baseline row per group stamped `upTo` — the changelog is
    * the only part of this state that grows with HISTORY rather than
    * with live keys, and the integral invariant survives a prefix fold
    * exactly. [[viewAsOf]] stays exact for every `batch ≥ upTo`;
    * addressability BELOW the floor is what compaction spends. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    IncrementalJoinAggStar.compactChangelog(spark, stateDir, upTo)

  /** AS-OF (time-travel) read: the aggregate exactly as it stood after
    * `batch` committed — the changelog integral truncated at the batch.
    * Requires streaming-mode monotone batch ids; `batch` below a
    * compaction floor is no longer addressable. */
  def viewAsOf(spark: SparkSession, stateDir: String, batch: Long): DataFrame =
    IncrementalJoinAggStar.viewAsOf(spark, stateDir, batch)
      .select(col("g"), col("total"), col("rows").as("pairs"))

  /** Retained facts / current dims (diagnostics + rehearsals), in the
    * R145 column names. */
  def facts(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggstar/f",
      StructType.fromDDL("id BIGINT, m BIGINT, k1 BIGINT"))
      .select(col("k1").as("jk"), col("id"), col("m"))
  def dims(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggstar/d1_1",
      StructType.fromDDL("k BIGINT, vl BIGINT, vs STRING"))
      .select(col("k").as("jk"), col("vs").as("g"))

  /** Continuous maintenance over a MIXED change stream (the realistic
    * shape: one CDC topic carrying both tables' rows, discriminated by
    * `kindCol` = "fact" | "dim") — a single writer per state dir, per
    * the MvPipeline contract. */
  def start(spark: SparkSession, inputDir: String,
      schema: StructType, stateDir: String, checkpointDir: String,
      kindCol: String, jkCol: String, idCol: String, gCol: String, mCol: String,
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
        processBatch(
          batch.filter(col(kindCol) === "fact"), jkCol, idCol, mCol,
          batch.filter(col(kindCol) === "dim"), jkCol, gCol,
          stateDir, batchId)
      }
      .start()
}
