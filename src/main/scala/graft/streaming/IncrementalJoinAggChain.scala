package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Continuously-maintained TERNARY (chain) join-aggregate (SURVEY.md
  * §2.11 R146): the snowflake-chain aggregate
  *
  *   SELECT d2.g, sum(f.m) AS total, count(*) AS triples
  *   FROM fact f
  *   JOIN dim1 d1 ON f.k1 = d1.k1     -- e.g. lineitem → orders
  *   JOIN dim2 d2 ON d1.k2 = d2.k2    -- e.g. orders → customer
  *   GROUP BY d2.g
  *
  * maintained under micro-batches carrying ANY MIX of new facts, fact
  * DELETES, dim1 upserts (a k1→k2 re-key RE-ROUTES every joined fact to
  * a different d2 subtree), and dim2 upserts (re-grouping k2→g).
  *
  * Since R150 this is a THIN INSTANCE of [[IncrementalJoinAggStar]] —
  * the depth-2 single-branch star — so the bilinear Δ-rule it
  * introduced, the k2-bucketed d1 mirror, and the staged-delta
  * protocol are all served by the ONE star code path (r10 VERDICT
  * consolidation). State lives under `stateDir/joinaggstar/` in the
  * star layout: `f/` facts `(id, m, k1)` bucketed by k1; `d1_1/` link
  * rows `(k=k1, vl=k2)` + mirror `d1_1m/` bucketed by the VALUE;
  * `d1_2/` group rows `(k=k2, vs=g)`; `a/` aggregate + changelog.
  *
  * Contracts (unchanged from R146): fact `id` is the at-least-once
  * absorption key and always carries the same k1; deletes name
  * `(k1, id)`; a delete of an id re-sent in the SAME batch wins.
  * Within-batch dedup is deterministic: facts keep min (k1, m) per id,
  * dims keep max value per key. Dim values may be null — null k2 never
  * joins (SQL semantics); null g groups under null. Ad-hoc folds
  * (batchId < 0) maintain exactly but may collapse identical changelog
  * rows (the R143 caveat). */
object IncrementalJoinAggChain {

  private val spec2 =
    IncrementalJoinAggStar.StarSpec(Seq(2), groupAttrs = Seq((1, 2)))

  /** Fold one micro-batch (any of the four inputs may be empty) into the
    * maintained chain join-aggregate. */
  def processBatch(facts: DataFrame, factK1: String, factId: String, factM: String,
      factDels: DataFrame, delK1: String, delId: String,
      dims1: DataFrame, d1K1: String, d1K2: String,
      dims2: DataFrame, d2K2: String, d2G: String,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16): Unit =
    IncrementalJoinAggStar.processBatch(spec2,
      facts, Seq(factK1), factId, factM,
      factDels, Seq(delK1), delId,
      Seq(Seq(dims1, dims2)),
      Seq(Seq((d1K1, d1K2, ""), (d2K2, "", d2G))),
      stateDir, batchId, numBuckets)

  /** The materialized view: `(g, total, triples)` == the batch chain
    * join-aggregate over everything folded. */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    IncrementalJoinAggStar.view(spark, stateDir)
      .select(col("g"), col("total"), col("rows").as("triples"))

  /** The Z-set changelog `(batch, g, dtotal, dtriples)`; per-group
    * running sum IS the aggregate. */
  def changelog(spark: SparkSession, stateDir: String): DataFrame =
    IncrementalJoinAggStar.changelog(spark, stateDir)
      .select(col("batch"), col("g"), col("dtotal"), col("drows").as("dtriples"))

  /** Changelog compaction — prefix rows fold into one baseline per
    * group at `upTo`; as-of stays exact at and above the floor. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    IncrementalJoinAggStar.compactChangelog(spark, stateDir, upTo)

  /** AS-OF (time-travel) read: the aggregate exactly as it stood after
    * `batch` committed ([[IncrementalJoinAggStar.viewAsOf]]). */
  def viewAsOf(spark: SparkSession, stateDir: String, batch: Long): DataFrame =
    IncrementalJoinAggStar.viewAsOf(spark, stateDir, batch)
      .select(col("g"), col("total"), col("rows").as("triples"))

  /** Diagnostics / rehearsal reads, in the R146 column names. */
  def facts(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggstar/f",
      StructType.fromDDL("id BIGINT, m BIGINT, k1 BIGINT"))
      .select("k1", "id", "m")
  def dims1(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggstar/d1_1",
      StructType.fromDDL("k BIGINT, vl BIGINT, vs STRING"))
      .select(col("k").as("k1"), col("vl").as("k2"))
  def dims1Mirror(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggstar/d1_1m",
      StructType.fromDDL("k BIGINT, vl BIGINT, vs STRING"))
      .select(col("k").as("k1"), col("vl").as("k2"))
  def dims2(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggstar/d1_2",
      StructType.fromDDL("k BIGINT, vl BIGINT, vs STRING"))
      .select(col("k").as("k2"), col("vs").as("g"))

  /** Continuous maintenance over a MIXED CDC stream: `kindCol` ∈
    * "fact" | "fact_del" | "dim1" | "dim2"; each kind reads its own
    * column subset. Single writer per state dir (MvPipeline contract). */
  def start(spark: SparkSession, inputDir: String,
      schema: StructType, stateDir: String, checkpointDir: String,
      kindCol: String, k1Col: String, k2Col: String, idCol: String,
      gCol: String, mCol: String,
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
          batch.filter(col(kindCol) === "fact"), k1Col, idCol, mCol,
          batch.filter(col(kindCol) === "fact_del"), k1Col, idCol,
          batch.filter(col(kindCol) === "dim1"), k1Col, k2Col,
          batch.filter(col(kindCol) === "dim2"), k2Col, gCol,
          stateDir, batchId)
      }
      .start()
}
