package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ARBITRARY-depth incrementally-maintained snowflake-chain
  * join-aggregate (SURVEY.md §2.11 R149) — one engine for
  *
  *   SELECT dn.g, sum(f.m) AS total, count(*) AS rows
  *   FROM fact f
  *   JOIN dim1 ON f.k1 = dim1.k1          -- level 1: k1 → k2
  *   JOIN dim2 ON dim1.k2 = dim2.k2       -- level 2: k2 → k3
  *   ...
  *   JOIN dimN ON dim(N−1).kN = dimN.kN   -- level N: kN → g
  *   GROUP BY dn.g
  *
  * for ANY chain depth N ≥ 1, maintained under micro-batches carrying
  * new facts, fact DELETES, and upserts at EVERY level.
  *
  * Since R150 this is a THIN INSTANCE of [[IncrementalJoinAggStar]] —
  * a linear chain is a star with exactly ONE branch — so the telescoped
  * multilinear Δ-rule, the staged-delta protocol, the value-bucketed
  * level mirrors, and the bucket-pruned reads all live in ONE
  * maintenance code path (the r10 VERDICT's consolidation: three
  * parallel implementations of the same delta rule is tomorrow's
  * divergence bug). State lives under `stateDir/joinaggstar/` in the
  * star layout (level i = `d1_i`, mirror `d1_im`).
  *
  * Contracts (unchanged): fact ids arrive once and pin their k1;
  * deletes name (k1, id); delete-wins within a batch; within-batch
  * dedup keeps min-(k1, m) facts and max-value dims; ad-hoc folds may
  * collapse identical changelog rows. */
object IncrementalJoinAggN {

  private def chainSpec(n: Int) =
    IncrementalJoinAggStar.StarSpec(Seq(n), groupAttrs = Seq((1, n)))

  private def starCols(dimCols: Seq[(String, String)]): Seq[Seq[(String, String, String)]] = {
    val n = dimCols.size
    Seq(dimCols.zipWithIndex.map { case ((kc, vc), i) =>
      if (i == n - 1) (kc, "", vc) else (kc, vc, "")
    })
  }

  /** Fold one micro-batch. `dims(i)` is level i+1's upsert frame with
    * columns (keyCol, valCol); all but the last level's values are
    * numeric keys, the last level's value is the (string) group. Any
    * input may be empty, but the DEPTH (dims.size) is the view's
    * standing parameter and must not change across batches. */
  def processBatch(facts: DataFrame, factK: String, factId: String, factM: String,
      factDels: DataFrame, delK: String, delId: String,
      dims: Seq[DataFrame], dimCols: Seq[(String, String)],
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16): Unit = {
    val n = dims.size
    require(n >= 1, "at least one dim level")
    require(dimCols.size == n, "one (key, value) column pair per level")
    IncrementalJoinAggStar.processBatch(chainSpec(n),
      facts, Seq(factK), factId, factM,
      factDels, Seq(delK), delId,
      Seq(dims), starCols(dimCols),
      stateDir, batchId, numBuckets)
  }

  /** BOOTSTRAP a fresh state dir from the batch tables — the
    * [[IncrementalJoinAggStar.bootstrap]] contract: one N-way batch
    * join, baseline changelog at `baselineBatch` (the as-of floor);
    * refuses a live state dir. */
  def bootstrap(facts: DataFrame, factK: String, factId: String, factM: String,
      dims: Seq[DataFrame], dimCols: Seq[(String, String)],
      stateDir: String, baselineBatch: Long = 0L, numBuckets: Int = 16): Unit = {
    val n = dims.size
    require(n >= 1 && dimCols.size == n, "one (key, value) column pair per level")
    IncrementalJoinAggStar.bootstrap(chainSpec(n),
      facts, Seq(factK), factId, factM,
      Seq(dims), starCols(dimCols),
      stateDir, baselineBatch, numBuckets)
  }

  /** `(g, total, rows)` == the batch N-way chain join-aggregate. */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    IncrementalJoinAggStar.view(spark, stateDir)

  /** Z-set changelog `(batch, g, dtotal, drows)`. */
  def changelog(spark: SparkSession, stateDir: String): DataFrame =
    IncrementalJoinAggStar.changelog(spark, stateDir)

  /** AS-OF read — the changelog integral truncated at `batch`. */
  def viewAsOf(spark: SparkSession, stateDir: String, batch: Long): DataFrame =
    IncrementalJoinAggStar.viewAsOf(spark, stateDir, batch)

  /** Changelog compaction to a baseline floor at `upTo`. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    IncrementalJoinAggStar.compactChangelog(spark, stateDir, upTo)
}
