package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuously-maintained sequence matching — the streaming form of
  * [[graft.operators.Funnel.sequenceMatch]], and the incremental family's
  * first JOIN view: every other maintained summary here merges by an
  * abelian aggregate (SUM / XOR / OR / KMV-union), but the feasible-set
  * DP is a chain of joins, so its maintenance needs the bilinear delta
  * rule for joins (the classic incremental-view-maintenance identity,
  * see e.g. the DBSP formalism): with `Fk = Ek ⋈g Fk−1` over SETS,
  *
  *   ΔFk = ((ΔEk ⋈g Fk−1ⁿᵉʷ) ∪ (Ekᵒˡᵈ ⋈g ΔFk−1)) \ Fkᵒˡᵈ
  *
  * — new events join the full updated frontier, old events join only the
  * frontier's delta; anything already feasible is subtracted. Feasible
  * sets are MONOTONE (events are only added), so deltas never retract,
  * any batch split of the stream converges to the batch answer, and late
  * or OUT-OF-ORDER events are handled exactly: a stage-1 anchor arriving
  * after its stage-2 continuation still completes the chain, with no
  * watermark to drop it.
  *
  * State is ONE table `(kind, k, user, t)` — `f` rows are stage-k
  * feasible last-match times, `e` rows (k ≥ 2) the retained condition-k
  * events old deltas must re-join. Folding all stages inside a single
  * [[MvPipeline.upsertMerge]] makes the multi-stage update ATOMIC under
  * the marker protocol — a replayed batch skips wholesale, never
  * half-applies across stages.
  *
  * 100 TB shape: per batch, each stage joins the BATCH delta against
  * user-co-partitioned state (plus state-events against the previous
  * stage's delta) — cost is Δ-bound, not state-bound; the state rewrite
  * itself is the small-summary `upsertMerge` (a bucketed layout per
  * [[MvPipeline.upsertBucketed]] is the drop-in upgrade once `|state|`
  * outgrows it). Exact late-data handling is why `e`/`f` rows are kept
  * per condition type forever; bound retention by pre-filtering the
  * input stream if the product needs a horizon. */
object IncrementalSequence {

  /** Fold one micro-batch of raw events into the staged feasible-set
    * state. `conds` as in [[graft.operators.Funnel.sequenceMatch]]:
    * (eventType, maxGapUs from the previous matched event). */
  def processBatch(df: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, conds: Seq[(String, Option[Long])],
      stateDir: String, batchId: Long = -1L): Unit = {
    val inc = project(df, userCol, tsUsCol, typeCol, conds)
    val path = s"$stateDir/seq"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    // upsertMerge only calls mergeFn once state exists; seed the first
    // batch through the same fold against an empty state so within-batch
    // chains form from batch one
    val first = !fs.exists(new org.apache.hadoop.fs.Path(path))
    val increment = if (first) fold(empty(inc), inc, conds) else inc
    MvPipeline.upsertMerge(increment, path,
      (old, i) => fold(old, i, conds), batchId)
  }

  /** Users whose maintained stage-K feasible set is non-empty — the
    * state-served read of `sequenceMatch == 1`. */
  def matchedUsers(spark: SparkSession, stateDir: String,
      numConds: Int): DataFrame =
    MvPipeline.readState(spark, stateDir, "seq")
      .filter(col("kind") === "f" && col("k") === numConds)
      .select("user").distinct()

  /** Per-user progression depth served from state: the deepest stage k
    * whose feasible set contains the user (the funnel-levels read under
    * sequence-DP semantics — per-gap bounds, not windowFunnel's anchor
    * window). One scan of the f-rows, no joins. */
  def levels(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readState(spark, stateDir, "seq")
      .filter(col("kind") === "f")
      .groupBy("user")
      .agg(max(col("k")).as("level"))

  /** Raw events → `(kind='e', k, user, t)` rows, one per condition the
    * event's type participates in (a type may appear in several). */
  private def project(df: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, conds: Seq[(String, Option[Long])]): DataFrame =
    conds.zipWithIndex.map { case ((t, _), i) =>
      df.filter(col(typeCol) === t)
        .select(lit("e").as("kind"), lit(i + 1).as("k"),
          col(userCol).as("user"), col(tsUsCol).as("t"))
    }.reduce(_.unionByName(_))

  private def empty(like: DataFrame): DataFrame =
    like.sparkSession.createDataFrame(
      like.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      like.schema)

  /** The delta fold: old staged state + a batch's projected events →
    * next staged state. Pure set algebra — distincts, user-keyed joins,
    * anti-joins — per the rule in the class doc. */
  private def fold(old: DataFrame, inc: DataFrame,
      conds: Seq[(String, Option[Long])]): DataFrame = {
    def part(kind: String, k: Int): DataFrame =
      old.filter(col("kind") === kind && col("k") === k).select("user", "t")
    def gapJoin(ev: DataFrame, frontier: DataFrame, gap: Option[Long]): DataFrame = {
      val bound: Column = gap.fold(lit(true))(g => col("t") <= col("tp") + lit(g))
      ev.join(frontier.select(col("user"), col("t").as("tp")), "user")
        .filter(col("t") > col("tp") && bound)
        .select("user", "t")
    }
    var prevFNew: DataFrame = null
    var prevDF: DataFrame = null
    val parts = conds.zipWithIndex.flatMap { case ((_, gap), i) =>
      val k = i + 1
      val eOld = if (k == 1) part("f", 1) else part("e", k)
      val dE = inc.filter(col("k") === k).select("user", "t").distinct()
        .join(eOld, Seq("user", "t"), "left_anti")
      val eNew = eOld.unionByName(dE)
      val (fOld, dF) =
        if (k == 1) (eOld, dE) // F1 ≡ E1
        else {
          val fo = part("f", k)
          val d = gapJoin(dE, prevFNew, gap)
            .unionByName(gapJoin(eOld, prevDF, gap))
            .distinct()
            .join(fo, Seq("user", "t"), "left_anti")
          (fo, d)
        }
      val fNew = fOld.unionByName(dF)
      prevFNew = fNew
      prevDF = dF
      val fRows = fNew.select(lit("f").as("kind"), lit(k).as("k"),
        col("user"), col("t"))
      if (k == 1) Seq(fRows)
      else Seq(eNew.select(lit("e").as("kind"), lit(k).as("k"),
        col("user"), col("t")), fRows)
    }
    parts.reduce(_.unionByName(_))
  }

  /** Continuous maintenance over JSON-line files with `schema`. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String,
      userCol: String, tsUsCol: String, typeCol: String,
      conds: Seq[(String, Option[Long])],
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, userCol, tsUsCol, typeCol, conds, stateDir, batchId)
      }
      .start()
}
