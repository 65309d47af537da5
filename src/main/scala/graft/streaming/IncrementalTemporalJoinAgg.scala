package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incrementally-maintained AS-OF (temporal / SCD-2) join-aggregate
  * (SURVEY.md §2.11 R160) — the join predicate the equality-keyed
  * star family cannot express: each fact resolves the dimension
  * VERSION valid at the fact's event time,
  *
  *   SELECT d.vs AS g, sum(f.m), count(*)
  *   FROM facts f ASOF LEFT JOIN dim_versions d
  *     ON f.k = d.k AND f.t >= d.vf
  *   GROUP BY g
  *
  * — ClickHouse's `ASOF JOIN` over a slowly-changing dimension, which
  * the reference's consumers run ad-hoc over raw history and which no
  * summing summary can maintain: a LATE version (valid-from in the
  * past) retro-reassigns every fact in its validity span, and a
  * version DELETE makes those facts fall back to the PREVIOUS version
  * (or to the unmatched null group) — both are corrections no
  * append-only state can produce. The repo's batch member is
  * `asof_clicks` (operators/AsOfJoin.scala); this is its maintained
  * aggregate twin, oracled batch twin **x123_asof_revenue** (DuckDB
  * `ASOF LEFT JOIN`).
  *
  * The exact device: the as-of join IS an equi+range join against the
  * INTERVALIZED relation
  *
  *   I(D) = { (k, [vf, vf_next), vs) } ∪ { (k, (-inf, vf_min), NULL) }
  *
  * (one validity interval per version, ordered by `vf` within the
  * key, PLUS one null-padded head interval per key — the ASOF LEFT
  * completion, so I(D) partitions the full (k, t) line and every fact
  * matches EXACTLY one interval). The view is bilinear in (F, I(D)),
  * so the family's telescoped Δ-rule applies with inputs ordered
  * F < D:
  *
  *   Δview = ΔF ⋈ I(D_post)  +  F_pre ⋈ ΔI
  *
  *   - ΔF (signed fact rows) as-of-resolves against the POST-state
  *     versions of the batch facts' keys — a bucket-pruned read plus
  *     one max-(vf ≤ t) aggregate per fact;
  *   - ΔI is computed per TOUCHED key as the exact row diff
  *     I(D_post|k) − I(D_pre|k) (sort, lead(), head pad — O(versions
  *     of touched keys), bucket-pruned); retained facts of those keys
  *     range-join the signed intervals — each match retracts/asserts
  *     that fact's group contribution. A version insert splits its
  *     predecessor's interval (the unchanged sub-interval cancels in
  *     the diff, so only the span the new version CAPTURES ships);
  *     a delete re-extends the predecessor over the deleted span.
  *
  * Per-batch cost is O(facts of touched keys × changed intervals +
  * versions of touched keys) — the affected subtree, never O(state).
  *
  * State under `stateDir/temporaljoinagg/`, all fed from ONE staged
  * kind-discriminated delta (the standard crash-safe protocol —
  * stamped buckets skip on replay, the rest converge;
  * [[MvPipeline.upsertBucketedMerge]]):
  *   - `f/` retained facts `(id, t, m, k)` bucketed by k;
  *   - `d/` version rows `(k, vl, vs)` with `vl` = valid-from,
  *     bucketed by k (the star family's level row shape and signed
  *     merge, [[IncrementalJoinAggStar.mergeSigned]]);
  *   - `a/` kind-discriminated aggregate (`a` additive, `c` signed
  *     changelog; integral of `c` IS `a` — [[changelog]] /
  *     [[viewAsOf]] / [[compactChangelog]] are the family contract).
  *
  * Contracts: fact ids arrive once and pin (t, m, k); fact deletes
  * name the id (and `k`, for pruning) of a previously-arrived fact;
  * versions are keyed by `(k, vf)` — an upsert at an existing
  * valid-from REPLACES that version's attribute, a delete names the
  * exact `(k, vf)`; delete-wins within a batch on both inputs.
  * Version attributes should be non-null: a NULL `vs` is legal but
  * indistinguishable from the unmatched head group in the aggregate
  * (exactly as the batch ASOF LEFT JOIN would group it). Ties:
  * `vf <= t` — a version taking effect exactly at the fact's
  * timestamp captures it.
  *
  * MULTI-MEASURE (R161, shared contract with the star family): with
  * `numMeasures = M` the facts carry `m, m2..mM` and every measure
  * sums independently under the SAME Z-set weights — the delta rule
  * is linear in the measure vector, so one maintained as-of join
  * serves M summed columns (batch twin **x125_asof_measures**) with
  * zero extra exchanges. Readers take `numMeasures` only for the
  * empty-state fallback schema. */
object IncrementalTemporalJoinAgg {

  /** Internal measure column names for an M-measure view (R161's
    * multi-measure contract, shared with the star family). */
  private def mColsOf(nM: Int): Seq[String] = "m" +: (2 to nM).map(i => s"m$i")
  private def fSchemaN(nM: Int): StructType = StructType(
    Seq(StructField("id", LongType), StructField("t", LongType)) ++
      mColsOf(nM).map(c => StructField(c, LongType)) :+
      StructField("k", LongType))

  /** Fold one CDC micro-batch. Frames may be empty; columns:
    * `facts(id, t, m[, m2..mM], k)`, `factDels(id, k)`,
    * `dimUps(k, vf, vs)`, `dimDels(k, vf)`. `numMeasures > 1` sums
    * several measures independently under the SAME Z-set weights
    * (the R161 multi-measure contract — one maintained as-of join
    * serves M summed columns for the cost of one). */
  def processBatch(facts: DataFrame, factDels: DataFrame,
      dimUps: DataFrame, dimDels: DataFrame,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16,
      numMeasures: Int = 1): Unit = {
    val mCols = mColsOf(numMeasures)
    val spark = facts.sparkSession
    val path = s"$stateDir/temporaljoinagg"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    def pruneRead(table: String, keys: DataFrame, schema: StructType): DataFrame =
      MvPipeline.readBuckets(spark, s"$path/$table",
        MvPipeline.bucketIdsOf(keys, Seq("k"), numBuckets), schema)

    def computeDelta(): DataFrame = {
      val emptyF = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        fSchemaN(numMeasures))
      val fActive = !facts.isEmpty || !factDels.isEmpty
      val dActive = !dimUps.isEmpty || !dimDels.isEmpty

      // ---- normalize inputs (the star family's within-batch rules) ----
      val fIn =
        if (facts.isEmpty) emptyF
        else facts.select(Seq(col("id").cast("long").as("id"),
              col("t").cast("long").as("t")) ++
              mCols.map(c => col(c).cast("long").as(c)) :+
              col("k").cast("long").as("k"): _*)
          .groupBy("id")
          .agg(min(struct(col("t") +: mCols.map(col) :+ col("k"): _*)).as("s"))
          .select(col("id") +: ("t" +: mCols :+ "k").map(c =>
            col(s"s.$c").as(c)): _*)
          .transform(graft.operators.Caching.persisted)
      val delIn =
        if (factDels.isEmpty) emptyF.select("id", "k")
        else factDels.select(col("id").cast("long").as("id"),
            col("k").cast("long").as("k")).distinct()
          .transform(graft.operators.Caching.persisted)
      val dDelN =
        if (dimDels.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("k", LongType), StructField("vf", LongType))))
        else dimDels.select(col("k").cast("long").as("k"),
            col("vf").cast("long").as("vf")).distinct()
          .transform(graft.operators.Caching.persisted)
      // latest-wins per (k, vf) within the batch; delete-wins
      val dIn =
        if (dimUps.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("k", LongType), StructField("vf", LongType),
              StructField("vs", StringType))))
        else dimUps.select(col("k").cast("long").as("k"),
            col("vf").cast("long").as("vf"), col("vs").cast("string").as("vs"))
          .groupBy("k", "vf").agg(max("vs").as("vs"))
          .join(dDelN, Seq("k", "vf"), "left_anti")
          .transform(graft.operators.Caching.persisted)

      // ---- dim Z-set + interval delta for the TOUCHED keys ----
      val touchedK = dIn.select("k").unionByName(dDelN.select("k")).distinct()
        .transform(graft.operators.Caching.persisted)
      val d0k =
        if (!dActive)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            IncrementalJoinAggStar.dSchema)
        else pruneRead("d", touchedK, IncrementalJoinAggStar.dSchema)
          .join(touchedK, Seq("k"), "left_semi")
          .transform(graft.operators.Caching.persisted)
      // post-state versions of the touched keys: deletes drop the exact
      // (k, vf); upserts replace-or-add their (k, vf)
      val d1k =
        if (!dActive) d0k
        else d0k
          .join(dDelN.select(col("k"), col("vf").as("vl")), Seq("k", "vl"), "left_anti")
          .join(dIn.select(col("k"), col("vf").as("vl")), Seq("k", "vl"), "left_anti")
          .unionByName(dIn.select(col("k"), col("vf").as("vl"), col("vs")))
          .transform(graft.operators.Caching.persisted)
      // stored-table Z-set: exact row diff (null-safe on vs)
      def rowDiff(a: DataFrame, b: DataFrame): DataFrame = {
        val bb = b.select(col("k").as("k0"), col("vl").as("vl0"), col("vs").as("vs0"))
        a.join(bb, col("k") === col("k0") && col("vl") === col("vl0") &&
          col("vs") <=> col("vs0"), "left_anti")
      }
      val zd =
        if (!dActive)
          d0k.withColumn("w", lit(1L)).limit(0)
        else rowDiff(d1k, d0k).withColumn("w", lit(1L))
          .unionByName(rowDiff(d0k, d1k).withColumn("w", lit(-1L)))
          .transform(graft.operators.Caching.persisted)

      // I(D|touched): one row per version interval + the null-padded
      // head interval per key ((-inf, vf_min) — or the whole line for a
      // key with no versions). vf/vu NULL encode -inf/+inf.
      def intervalsOf(vers: DataFrame): DataFrame = {
        val w = Window.partitionBy("k").orderBy("vl")
        val v = vers.select(col("k"), col("vl").as("vf"),
          lead(col("vl"), 1).over(w).as("vu"), col("vs"))
        val pads = touchedK.join(
            vers.groupBy("k").agg(min("vl").as("vu")), Seq("k"), "left")
          .select(col("k"), lit(null).cast("long").as("vf"), col("vu"),
            lit(null).cast("string").as("vs"))
        v.unionByName(pads)
      }
      def iDiff(a: DataFrame, b: DataFrame): DataFrame = {
        val bb = b.select(col("k").as("k0"), col("vf").as("vf0"),
          col("vu").as("vu0"), col("vs").as("vs0"))
        a.join(bb, col("k") === col("k0") && col("vf") <=> col("vf0") &&
          col("vu") <=> col("vu0") && col("vs") <=> col("vs0"), "left_anti")
      }
      val zi =
        if (!dActive) intervalsOf(d0k).withColumn("w", lit(1L)).limit(0)
        else {
          val iPre = intervalsOf(d0k).transform(graft.operators.Caching.persisted)
          val iPost = intervalsOf(d1k).transform(graft.operators.Caching.persisted)
          iDiff(iPost, iPre).withColumn("w", lit(1L))
            .unionByName(iDiff(iPre, iPost).withColumn("w", lit(-1L)))
            .transform(graft.operators.Caching.persisted)
        }

      // ---- term 2: F_pre of the touched keys x signed intervals ----
      val t2 =
        if (!dActive) emptyF.select(mCols.map(col) ++
          Seq(lit(null).cast("string").as("g"), lit(1L).as("w")): _*).limit(0)
        else pruneRead("f", touchedK, fSchemaN(numMeasures))
          .join(touchedK, Seq("k"), "left_semi")
          .join(zi, Seq("k"))
          .filter((col("vf").isNull || col("vf") <= col("t")) &&
            (col("vu").isNull || col("t") < col("vu")))
          .select(mCols.map(col) ++ Seq(col("vs").as("g"), col("w")): _*)

      // ---- ΔF (signed, star rules) + term 1 against POST-state dims ----
      val zf =
        if (!fActive) emptyF.withColumn("w", lit(1L)).limit(0)
        else {
          val fKeys = fIn.select("k").unionByName(delIn.select("k"))
          val f0 = pruneRead("f", fKeys, fSchemaN(numMeasures))
            .transform(graft.operators.Caching.persisted)
          val newF = fIn.join(f0.select("id"), Seq("id"), "left_anti")
            .join(delIn.select("id"), Seq("id"), "left_anti")
          val delF = f0.join(delIn.select("id"), Seq("id"), "left_semi")
          newF.withColumn("w", lit(1L))
            .unionByName(delF.withColumn("w", lit(-1L)))
            .transform(graft.operators.Caching.persisted)
        }
      val t1 =
        if (!fActive) t2.limit(0)
        else {
          val zfK = zf.select("k").distinct()
            .transform(graft.operators.Caching.persisted)
          // post-state versions of the FACT keys: pre-state patched with
          // this batch's dim Z-set (state is not yet written)
          val dPost = pruneRead("d", zfK, IncrementalJoinAggStar.dSchema)
            .join(zfK, Seq("k"), "left_semi")
            .withColumn("w", lit(1L))
            .unionByName(zd.join(zfK, Seq("k"), "left_semi"))
            .groupBy("k", "vl", "vs").agg(sum("w").as("w"))
            .filter(col("w") > 0)
          zf.join(dPost.select(col("k").as("dk"), col("vl"), col("vs")),
              col("k") === col("dk") && col("vl") <= col("t"), "left")
            .groupBy("id", mCols :+ "w": _*)
            .agg(max(struct(col("vl"), col("vs"))).as("s"))
            .select(mCols.map(col) ++ Seq(col("s.vs").as("g"), col("w")): _*)
        }

      // ---- finished delta -> aggregate + changelog rows ----
      val mAggs = mCols.map(c => sum(col(c) * col("w")).as(s"d$c"))
      val finished = t1.unionByName(t2)
        .groupBy("g")
        .agg(mAggs.head, (mAggs.tail :+ sum(col("w")).as("dc")): _*)
        .filter((mCols.map(c => col(s"d$c") =!= 0) :+
          (col("dc") =!= 0)).reduce(_ || _))
        .transform(graft.operators.Caching.persisted)

      val nil = lit(null).cast("long")
      val nils = lit(null).cast("string")
      val extraM = mCols.drop(1)
      val fDelta =
        if (!fActive) Nil
        else Seq(zf.select(Seq(lit("f").as("tbl"), col("id"), col("t"),
          col("m")) ++ extraM.map(col) ++
          Seq(col("k"), nil.as("vl"), nils.as("vs"), nils.as("g"), nil.as("c"),
            nil.as("b"), col("w")): _*))
      val dDelta =
        if (zd.isEmpty) Nil
        else Seq(zd.select(Seq(lit("d").as("tbl"), nil.as("id"), nil.as("t"),
          nil.as("m")) ++ extraM.map(c => nil.as(c)) ++
          Seq(col("k"), col("vl"), col("vs"), nils.as("g"),
            nil.as("c"), nil.as("b"), col("w")): _*))
      val aDelta = finished.select(Seq(lit("a").as("tbl"), nil.as("id"),
        nil.as("t")) ++ mCols.map(c => col(s"d$c").as(c)) ++
        Seq(nil.as("k"), nil.as("vl"),
          nils.as("vs"), col("g"), col("dc").as("c"), nil.as("b"),
          nil.as("w")): _*)
      val cDelta = finished.select(Seq(lit("c").as("tbl"), nil.as("id"),
        nil.as("t")) ++ mCols.map(c => col(s"d$c").as(c)) ++
        Seq(nil.as("k"), nil.as("vl"),
          nils.as("vs"), col("g"), col("dc").as("c"), lit(batchId).as("b"),
          nil.as("w")): _*)
      (fDelta ++ dDelta ++ Seq(aDelta, cDelta)).reduce(_ unionByName _)
    }

    try {
      if (!(batchId >= 0 && fs.exists(staged))) {
        val tmp = new Path(s"$path/$stagedName.tmp")
        computeDelta().write.mode("overwrite").parquet(tmp.toString)
        fs.delete(staged, true)
        require(fs.rename(tmp, staged), s"stage delta $staged")
      }
      val delta = spark.read.parquet(staged.toString).persist()
      val present = delta.select("tbl").distinct()
        .collect().map(_.getString(0)).toSet
      try MvPipeline.applyConcurrently(
        (if (present("f"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "f")
              .select(("id" +: "t" +: mCols) ++ Seq("k", "w") map col: _*),
            s"$path/f", IncrementalJoinAggStar.mergeF, batchId, numBuckets,
            Seq("k")))
         else Nil) ++
        (if (present("d"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "d").select("k", "vl", "vs", "w"),
            s"$path/d", IncrementalJoinAggStar.mergeSigned, batchId,
            numBuckets, Seq("k")))
         else Nil) ++
        (if (present("a") || present("c"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl").isin("a", "c"))
              .select(Seq(col("tbl").as("kind"), col("g"), col("b"),
                col("m")) ++ mCols.drop(1).map(col) ++ Seq(col("c")): _*),
            s"$path/a", IncrementalJoinAggStar.mergeA, batchId, numBuckets,
            Seq("g")))
         else Nil))
      finally delta.unpersist()
      if (fs.exists(new Path(path)))
        fs.listStatus(new Path(path))
          .filter(s => s.getPath.getName.startsWith("_delta_"))
          .foreach(s => fs.delete(s.getPath, true))
    } finally graft.operators.Caching.releaseAll()
  }

  /** `(g, total, rows)` == the batch ASOF LEFT join-aggregate; `g` is
    * NULL for facts before their key's first version (and for keyless
    * facts). [[innerView]] is the ASOF INNER projection. */
  def view(spark: SparkSession, stateDir: String,
      numMeasures: Int = 1): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/temporaljoinagg/a",
      IncrementalJoinAggStar.aSchemaN(numMeasures))
    st.filter(col("kind") === "a" && col("c") > 0)
      .select(Seq(col("g"), col("m").as("total")) ++
        IncrementalJoinAggStar.extraTotals(st) ++
        Seq(col("c").as("rows")): _*)
  }

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
      numBuckets: Int = 16, numMeasures: Int = 1): DataFrame = {
    import spark.implicits._
    val gdf = groups.toDF("g")
    val ids = MvPipeline.bucketIdsOf(gdf, Seq("g"), numBuckets)
    val st = MvPipeline.readBuckets(spark, s"$stateDir/temporaljoinagg/a", ids,
      IncrementalJoinAggStar.aSchemaN(numMeasures))
    st.filter(col("kind") === "a" && col("c") > 0)
      .join(broadcast(gdf), Seq("g"), "left_semi")
      .select(Seq(col("g"), col("m").as("total")) ++
        IncrementalJoinAggStar.extraTotals(st) ++
        Seq(col("c").as("rows")): _*)
  }

  /** Z-set changelog `(batch, g, dtotal, drows)`; integral == view. */
  def changelog(spark: SparkSession, stateDir: String,
      numMeasures: Int = 1): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/temporaljoinagg/a",
      IncrementalJoinAggStar.aSchemaN(numMeasures))
    val extra = st.columns.filter(_.matches("m\\d+")).toSeq
      .sortBy(_.drop(1).toInt)
      .map(c => col(c).as(s"dtotal${c.drop(1)}"))
    st.filter(col("kind") === "c")
      .select(Seq(col("b").as("batch"), col("g"), col("m").as("dtotal")) ++
        extra ++ Seq(col("c").as("drows")): _*)
  }

  /** AS-OF read over MAINTENANCE time: the aggregate as it stood after
    * `batch` committed (the family contract — orthogonal to the view's
    * own event-time as-of semantics). */
  def viewAsOf(spark: SparkSession, stateDir: String, batch: Long,
      numMeasures: Int = 1): DataFrame = {
    val cl = changelog(spark, stateDir, numMeasures)
      .filter(col("batch") <= batch)
    val extra = cl.columns.filter(_.matches("dtotal\\d+")).toSeq
      .sortBy(_.drop(6).toInt)
      .map(c => sum(col(c)).as(s"total${c.drop(6)}"))
    cl.groupBy("g")
      .agg(sum(col("dtotal")).as("total"),
        extra :+ sum(col("drows")).as("rows"): _*)
      .filter(col("rows") > 0)
  }

  /** FORGET a set of dimension keys (GDPR / user deletion): remove
    * every fact AND every version of the named keys from the view.
    * This needs NO new machinery — it IS one CDC batch: the keys'
    * retained facts become fact deletes and their versions become
    * version deletes, fed through [[processBatch]], so the −1
    * changelog rows ship, integral == view holds through the forget,
    * external sinks converge, and replay (same `batchId`) is a no-op
    * under the standard staged protocol. Both state reads are
    * bucket-pruned to the forgotten keys' buckets. Absent keys no-op. */
  def forgetKeys(spark: SparkSession, keys: Seq[Long], stateDir: String,
      batchId: Long, numBuckets: Int = 16, numMeasures: Int = 1): Unit = {
    import spark.implicits._
    val path = s"$stateDir/temporaljoinagg"
    val kdf = keys.toDF("k")
    def pruned(table: String, schema: StructType): DataFrame =
      MvPipeline.readBuckets(spark, s"$path/$table",
        MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets), schema)
        .join(broadcast(kdf), Seq("k"), "left_semi")
    val factDels = pruned("f", fSchemaN(numMeasures)).select("id", "k")
    val dimDels = pruned("d", IncrementalJoinAggStar.dSchema)
      .select(col("k"), col("vl").as("vf"))
    processBatch(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        fSchemaN(numMeasures)),
      factDels,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("k", LongType), StructField("vf", LongType),
          StructField("vs", StringType)))),
      dimDels, stateDir, batchId, numBuckets, numMeasures)
  }

  /** WATERMARK-EXACT state compaction — the bounded-state member of
    * the temporal family (the [[IncrementalStrictFunnelBounded]] role):
    * under the watermark contract that every FUTURE fact time and
    * version valid-from is `>= horizon`,
    *
    *   - facts with `t < horizon` leave `f/` (their aggregate
    *     contributions are already materialized in `a/`, and no
    *     in-contract version arrival can re-capture them: a version at
    *     `vf >= horizon` only changes intervals at or above `vf`);
    *   - per key, versions with `vf < horizon` collapse to the single
    *     LATEST one, rewritten to `vf = horizon − 1` — it is exactly
    *     the prevailing version at the horizon, which future facts
    *     still need; its older siblings govern only dropped history.
    *     One tick BELOW the horizon so it can never collide with (or be
    *     shadowed by) a real at-horizon version, and so an in-contract
    *     DELETE of an at-horizon version falls back to it exactly as
    *     the uncompacted history would fall back to the same attribute.
    *
    * The view is untouched; retained state is bounded by the horizon
    * window. The documented divergence mirrors R153: an OUT-of-contract
    * late fact (t < horizon) resolves the collapsed floor version
    * instead of its exact historical one, and an out-of-contract late
    * version (vf < horizon) diffs against the compacted interval set —
    * callers pick the horizon as their lateness bound. */
  def compactState(spark: SparkSession, stateDir: String, horizon: Long): Unit = {
    val path = s"$stateDir/temporaljoinagg"
    MvPipeline.transformBuckets(spark, s"$path/f",
      old => old.filter(col("t") >= horizon))
    MvPipeline.transformBuckets(spark, s"$path/d", old => {
      val w = Window.partitionBy("k").orderBy(col("vl").desc)
      val floor = old.filter(col("vl") < horizon)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("k"), lit(horizon - 1).as("vl"), col("vs"))
      old.filter(col("vl") >= horizon).unionByName(floor)
    })
  }

  /** Changelog compaction: fold the prefix `<= upTo` into one baseline
    * row per group; as-of stays exact at and above the floor. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    MvPipeline.compactChangelogA(spark, s"$stateDir/temporaljoinagg/a", upTo)

  /** BOOTSTRAP a fresh state dir from batch tables — ONE window pass
    * (shuffle by k, sort by time, `last(vs) ignoring nulls`) instead of
    * per-batch delta machinery; writes facts, versions, the aggregate,
    * and one baseline changelog row per group stamped `baselineBatch`.
    * Continuation folds must use batch ids above the baseline. */
  def bootstrap(facts: DataFrame, dims: DataFrame, stateDir: String,
      baselineBatch: Long = 0L, numBuckets: Int = 16,
      numMeasures: Int = 1): Unit = {
    val spark = facts.sparkSession
    val mCols = mColsOf(numMeasures)
    val path = s"$stateDir/temporaljoinagg"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(path)),
      s"bootstrap requires a fresh state dir, found $path")
    val fIn = facts.select(Seq(col("id").cast("long").as("id"),
        col("t").cast("long").as("t")) ++
        mCols.map(c => col(c).cast("long").as(c)) :+
        col("k").cast("long").as("k"): _*)
      .groupBy("id")
      .agg(min(struct(col("t") +: mCols.map(col) :+ col("k"): _*)).as("s"))
      .select(col("id") +: ("t" +: mCols :+ "k").map(c => col(s"s.$c").as(c)): _*)
      .transform(graft.operators.Caching.persisted)
    val dIn = dims.select(col("k").cast("long").as("k"),
        col("vf").cast("long").as("vf"), col("vs").cast("string").as("vs"))
      .groupBy("k", "vf").agg(max("vs").as("vs"))
      .transform(graft.operators.Caching.persisted)
    try {
      MvPipeline.upsertBucketedMerge(fIn, s"$path/f",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets, Seq("k"))
      MvPipeline.upsertBucketedMerge(
        dIn.select(col("k"), col("vf").as("vl"), col("vs")), s"$path/d",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets, Seq("k"))
      val agg = asOfAggregate(fIn, dIn, numMeasures)
        .transform(graft.operators.Caching.persisted)
      val tCols = "total" +: (2 to numMeasures).map(i => s"total$i")
      def aggRows(kind: String, b: Column) = agg.select(
        Seq(lit(kind).as("kind"), col("g"), b.as("b")) ++
          tCols.zip(mCols).map { case (t, m) => col(t).as(m) } ++
          Seq(col("rows").as("c")): _*)
      val aRows = aggRows("a", lit(null).cast("long"))
        .unionByName(aggRows("c", lit(baselineBatch)))
      MvPipeline.upsertBucketedMerge(aRows, s"$path/a",
        IncrementalJoinAggStar.mergeA, -1L, numBuckets, Seq("g"))
    } finally graft.operators.Caching.releaseAll()
  }

  /** The BATCH as-of aggregate `(g, total, rows)` — the plan the
    * maintained view must equal: one shuffle by key, one event-time
    * sort, `last(vs, ignoreNulls)` carries the prevailing version onto
    * each fact (version rows sort BEFORE a fact at the same timestamp:
    * `vf <= t` inclusive ties). Used by [[bootstrap]] and as the spec /
    * x123 reference plan. */
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
