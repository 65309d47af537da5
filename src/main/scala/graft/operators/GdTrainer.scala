package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `stochasticLinearRegression` — the reference engine family's trainable
  * regression aggregate, as a batch-gradient-descent recurrence in EXACT
  * int64 arithmetic (the KMeansInt/PageRank trainer recipe: a fixed
  * iteration count of deterministic integer updates, so training replays
  * bit-for-bit as unrolled CTE stages in any engine).
  *
  * Model: `y ≈ (w1·x + w0)/10⁶` with e6-scaled integer weights. One
  * iteration = one full pass: `g1 = Σ resid·x`, `g0 = Σ resid` with
  * `resid = (w1·x + w0) DIV 10⁶ − y` (integer prediction on the e6
  * grid), then `w −= (g·(10⁶/etaDen)) DIV n` — learning rate η =
  * 1/etaDen applied to the mean gradient, DIV truncation (toward zero,
  * = DuckDB `//`) making every step grid-exact. Stability needs
  * η < 2/E[x²]: size etaDen to the feature's second moment.
  *
  * Shape per iteration: ONE broadcast of the 1-row weight frame into a
  * full-pass aggregation (the scalar-crossJoin pattern, allowlisted
  * BNLJ) — O(rows) with map-side partial aggregation, no per-row state.
  * The projected (x, y) frame is persisted via [[Caching]]; the weight
  * recurrence itself is LAZY (optimization r16): each 1-row frame feeds
  * exactly one consumer (the next iteration's broadcast), so the K-pass
  * chain is one linear plan the consuming action executes — no
  * per-iteration driver jobs (the r15 form `localCheckpoint`ed every
  * iteration).
  *
  * Overflow bounds (caller grids x, y): needs `max|w1·x| < 2⁶³` and
  * `n·max|resid·x| < 2⁶³` — at y in cents (≤10⁷), x ≤ 10², n ≤ 10⁹ all
  * figures sit well inside int64.
  */
object GdTrainer {

  /** Returns one row: `n, w0_e6, w1_e6, mae_cents` (final weights and
    * the mean absolute residual, `Σ|resid| DIV n`). `etaDen` must
    * divide 10⁶. Callers own a [[Caching.releaseAll]] after consuming
    * the result (the projected (x, y) frame is a tracked persist). */
  def fitLinear(df: DataFrame, x: Column, y: Column, iters: Int,
      etaDen: Long = 1000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(etaDen >= 1 && 1000000L % etaDen == 0,
      s"etaDen must be a positive divisor of 1e6, got $etaDen")
    val etaNum = 1000000L / etaDen
    val spark = df.sparkSession
    import spark.implicits._

    val d = Caching.persisted(
      df.select(x.cast("long").as("x"), y.cast("long").as("y"))
        .filter(col("x").isNotNull && col("y").isNotNull))
    val resid = expr("(w1*x + w0) DIV 1000000") - col("y")

    var w: DataFrame = Seq((0L, 0L)).toDF("w1", "w0")
    for (_ <- 1 to iters) {
      // carry w1/w0 through the agg (constants under the 1-row broadcast)
      // so each iteration is exactly one crossJoin + one aggregation.
      // The recurrence stays LAZY (optimization r16): each weight frame
      // is 1 row referenced exactly once by the next iteration, so the
      // whole K-pass chain is one plan executed by the consuming action —
      // the r15 form localCheckpoint'ed every iteration, paying K eager
      // driver jobs for lineage no deeper than K nested broadcasts.
      // (ADVICE r16, stated precisely: each loop pass still analyzes its
      // own O(k)-node prefix eagerly, so total ANALYSIS work is O(K²) —
      // cheap at this trainer's single-digit K, and what the change
      // removes is the K eager localCheckpoint driver JOBS, not the
      // analyzer passes. A caller wanting K in the hundreds should
      // reintroduce a periodic lineage cut.)
      val g = d.crossJoin(broadcast(w)).agg(
        count(lit(1)).as("n"),
        max(col("w1")).as("w1"), max(col("w0")).as("w0"),
        sum(resid * col("x")).as("g1"), sum(resid).as("g0"))
      w = g.select(
        (col("w1") - expr(s"(g1*$etaNum) DIV n")).as("w1"),
        (col("w0") - expr(s"(g0*$etaNum) DIV n")).as("w0"))
    }
    d.crossJoin(broadcast(w))
      .agg(count(lit(1)).as("n"),
        max(col("w0")).as("w0_e6"), max(col("w1")).as("w1_e6"),
        sum(abs(resid)).as("sabs"))
      .select(col("n"), col("w0_e6"), col("w1_e6"),
        expr("sabs DIV n").as("mae_cents"))
  }
}
