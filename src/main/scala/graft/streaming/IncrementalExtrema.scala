package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incrementally-maintained EXACT per-group ORDER STATISTICS — min,
  * max, count, exact low-quantiles, top-N — under FULL Z-set inputs
  * (SURVEY.md §2.11 R154).
  *
  * The maintained join-aggregate family (R145-R150) carries sum/count
  * because those are group homomorphisms over (ℤ,+): a delete folds in
  * as a negative weight and the scalar state stays exact. MIN/MAX and
  * quantiles are NOT summable — when the current max is deleted, the
  * new max is some OTHER retained value that a scalar state cannot
  * produce. The reference's storage engine has exactly this blind
  * spot: a SummingMergeTree/`SimpleAggregateFunction(min|max)` summary
  * (the reference's MV pattern, `/root/reference/README.md:24-189`)
  * is append-only-correct and silently wrong under deletes. The exact
  * fix is the VALUE-MULTIPLICITY relation: state `(g, v) → w`, the
  * Z-set weight of value `v` in group `g`.
  *
  *   - Maintenance is linear: Δ(g,v,w) folds by weight addition; rows
  *     reaching w = 0 are purged at merge. O(Δ) per batch — the fold
  *     touches only the buckets the batch's groups hash into (the
  *     [[MvPipeline.upsertBucketedMerge]] staged protocol: stamped
  *     buckets skip on crash replay, the rest converge).
  *   - Serving is a query over the relation: min/max/count are one
  *     bucket-local aggregate; the exact q-quantile is the smallest v
  *     with cumulative weight ≥ ⌈q·n⌉ (q passed as an integer rational
  *     `qNum/qDen`, so target ranks are exact int64 — no doubles);
  *     top-N values by rank. Point reads for known groups are
  *     bucket-pruned ([[viewFor]]): a one-group lookup reads 1/B of
  *     state, never the table.
  *   - State size is O(distinct live (g,v)) — the inherent cost of
  *     EXACT order statistics under retraction (any structure serving
  *     exact delete-the-max must retain enough to name the runner-up;
  *     with weights this is the minimal such relation). The engine's
  *     approximate members (t-digest x10, histogram x41, KMV) remain
  *     the bounded-state alternatives; this is the exact member.
  *
  * The served rows REPLACE per group key, so external delivery
  * composes with [[graft.sinks.ChangelogShip.shipVersioned]] (R152)
  * with no extra machinery — the ship diffs view vs last-shipped
  * snapshot.
  *
  * Z-set contract: inserts arrive as w = +1 (or +k), deletes as
  * w = −1; a delete may arrive BEFORE its insert (the CDC
  * facts-before-dims shape) — the transiently negative row is retained
  * in state so the late insert cancels it, and serving reads only
  * rows with w > 0 (values currently present).
  */
object IncrementalExtrema {

  private[streaming] val vwSchema = StructType(Seq(
    StructField("g", StringType), StructField("v", LongType),
    StructField("w", LongType)))

  /** Fold one signed micro-batch `(g, v, w)` into the multiplicity
    * relation at `stateDir/extrema/`. Within-batch rows for the same
    * (g,v) pre-aggregate; zero-weight results still flow to the merge
    * (they may cancel existing state rows).
    *
    * SKEW-SAFE LAYOUT (`subBuckets = S > 1`, R173): plain `g`-keyed
    * bucketing concentrates a giant group's ENTIRE value multiset in
    * ONE bucket — that bucket's rewrite and any point read of the
    * group is O(group's distinct values) regardless of B, and reshard
    * cannot help (same key). With S > 1 rows route by
    * `(g, xxhash64(v) % S)`, splitting every group across up to S
    * buckets: the per-bucket bound under a dominant group drops ~S×
    * (expectation-level — two of the S sub-keys may hash-collide in
    * one physical bucket, chance ≈ S²/2B, leaving that bucket a small
    * multiple of |group|/S; NEVER |group| again), folds touching it
    * rewrite S smaller buckets concurrently, and
    * point reads MERGE-AT-READ over the group's ≤S buckets
    * ([[viewFor]] probes them all — still bounded, never O(state)).
    * The sub-bucket coordinate is derived from `v`, never stored. S is
    * a store-layout constant like `numBuckets`: fold and read with the
    * SAME (B, S) for the store's lifetime (reshard to change). */
  def processBatch(delta: DataFrame, stateDir: String, batchId: Long = -1L,
      numBuckets: Int = 16, subBuckets: Int = 1): Unit = {
    require(subBuckets >= 1, "subBuckets >= 1")
    val inc = delta.select(col("g").cast(StringType).as("g"),
        col("v").cast(LongType).as("v"), col("w").cast(LongType).as("w"))
      .groupBy("g", "v").agg(sum("w").as("w"))
    if (subBuckets == 1)
      MvPipeline.upsertBucketedMerge(inc, s"$stateDir/extrema", mergeVw,
        batchId, numBuckets, bucketKeys = Seq("g"))
    else
      MvPipeline.upsertBucketedMerge(
        inc.withColumn("sb", subBucketOf(col("v"), subBuckets)),
        s"$stateDir/extrema", mergeVwSb, batchId, numBuckets,
        bucketKeys = Seq("g", "sb"), subBuckets = subBuckets)
  }

  /** The derived sub-bucket coordinate: `xxhash64(v) % S`. */
  private[streaming] def subBucketOf(v: org.apache.spark.sql.Column,
      s: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(v), lit(s.toLong))

  /** [[mergeVw]] for sub-bucketed increments: the routing column rides
    * the increment but is never stored (recomputable from v). */
  private[streaming] def mergeVwSb(old: DataFrame, nw: DataFrame): DataFrame =
    mergeVw(old, nw.drop("sb"))

  /** Weight-add merge with zero purge — per bucket, exact. (Shared
    * with [[IncrementalJoinAggStar]]'s fact-grained extrema table.) */
  private[streaming] def mergeVw(old: DataFrame, nw: DataFrame): DataFrame = {
    val o = old.columns.foldLeft(old)((d, c) => d.withColumnRenamed(c, s"o_$c"))
    // null-safe on g: a LEFT star view's null-padded group is a real
    // key in this relation and must merge, not duplicate
    o.join(nw, col("o_g") <=> col("g") && col("o_v") === col("v"), "full_outer")
      .select(coalesce(col("o_g"), col("g")).as("g"),
        coalesce(col("o_v"), col("v")).as("v"),
        (coalesce(col("o_w"), lit(0L)) + coalesce(col("w"), lit(0L))).as("w"))
      .filter(col("w") =!= 0)
  }

  private def present(st: DataFrame): DataFrame = st.filter(col("w") > 0)

  /** Full-state read of the multiplicity relation (w ≠ 0 rows). */
  def relation(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/extrema", vwSchema)

  /** Per-group `(g, n, min_v, max_v)` over present values. */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    extremaOf(relation(spark, stateDir))

  /** [[view]] restricted to `groups` — the bucket-pruned point read:
    * only the buckets the named groups hash into are opened (same
    * (bucketKeys, numBuckets, subBuckets) the writer used). Under a
    * sub-bucketed layout the group's rows span ≤ subBuckets buckets;
    * the read probes them all and the aggregate merges — bounded by
    * S·|groups| bucket opens, never by state. */
  def viewFor(spark: SparkSession, stateDir: String, groups: Seq[String],
      numBuckets: Int = 16, subBuckets: Int = 1): DataFrame = {
    import spark.implicits._
    MvPipeline.assertReadLayout(spark, s"$stateDir/extrema", numBuckets,
      subBuckets, "extrema viewFor")
    val ids =
      if (subBuckets == 1)
        MvPipeline.bucketIdsOf(groups.toDF("g"), Seq("g"), numBuckets)
      else MvPipeline.bucketIdsOf(
        groups.flatMap(g => (0 until subBuckets).map(sb => (g, sb.toLong)))
          .toDF("g", "sb"),
        Seq("g", "sb"), numBuckets)
    val st = MvPipeline.readBuckets(spark, s"$stateDir/extrema", ids, vwSchema)
    extremaOf(st.join(broadcast(groups.toDF("g")), Seq("g"), "left_semi"))
  }

  private[streaming] def extremaOf(st: DataFrame): DataFrame =
    present(st).groupBy("g")
      .agg(sum("w").as("n"), min("v").as("min_v"), max("v").as("max_v"))

  /** Exact low-quantile per group: the smallest v whose cumulative
    * weight reaches ⌈(qNum/qDen)·n⌉ — all-integer rank arithmetic, so
    * the result is a value FROM the data (quantile-disc semantics; for
    * qNum/qDen = 1/2 this is the lower median). One column per
    * requested rational, named `q_<num>_<den>`. */
  def quantiles(spark: SparkSession, stateDir: String,
      qs: Seq[(Long, Long)]): DataFrame =
    quantilesOf(relation(spark, stateDir), qs)

  private[streaming] def quantilesOf(st: DataFrame, qs: Seq[(Long, Long)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n, d) => d > 0 && n > 0 && n <= d },
      "quantiles must be rationals in (0, 1]")
    val cum = present(st)
      .withColumn("cum", sum("w").over(Window.partitionBy("g").orderBy("v")))
      .withColumn("n", sum("w").over(Window.partitionBy("g")))
    val picks = qs.map { case (qn, qd) =>
      min(when(col("cum") >= expr(s"($qn * n + ${qd - 1}) DIV $qd"), col("v")))
        .as(s"q_${qn}_$qd")
    }
    cum.groupBy("g").agg(picks.head, picks.tail: _*)
  }

  /** Top-`k` present values per group, largest first:
    * `(g, v, w, rank)` — rank over DISTINCT values (the relation is
    * already value-distinct per group). */
  def topN(spark: SparkSession, stateDir: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    present(relation(spark, stateDir))
      .withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy(col("v").desc)))
      .filter(col("rank") <= k)
      .select("g", "v", "w", "rank")
  }

  /** [[topN]] restricted to `groups` — the bucket-pruned point read
    * (r14): only the named groups' buckets open (≤ S·|groups|, as
    * [[viewFor]]); each (g, v) pair lives in exactly ONE bucket under
    * either layout (v routes the sub-coordinate), so no re-aggregation
    * is needed before the rank. */
  def topNFor(spark: SparkSession, stateDir: String, groups: Seq[String],
      k: Int, numBuckets: Int = 16, subBuckets: Int = 1): DataFrame = {
    import spark.implicits._
    require(k >= 1, "k >= 1")
    MvPipeline.assertReadLayout(spark, s"$stateDir/extrema", numBuckets,
      subBuckets, "extrema topNFor")
    val ids =
      if (subBuckets == 1)
        MvPipeline.bucketIdsOf(groups.toDF("g"), Seq("g"), numBuckets)
      else MvPipeline.bucketIdsOf(
        groups.flatMap(g => (0 until subBuckets).map(sb => (g, sb.toLong)))
          .toDF("g", "sb"),
        Seq("g", "sb"), numBuckets)
    val st = MvPipeline.readBuckets(spark, s"$stateDir/extrema", ids, vwSchema)
      .join(broadcast(groups.toDF("g")), Seq("g"), "left_semi")
    present(st)
      .withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy(col("v").desc)))
      .filter(col("rank") <= k)
      .select("g", "v", "w", "rank")
  }
}
