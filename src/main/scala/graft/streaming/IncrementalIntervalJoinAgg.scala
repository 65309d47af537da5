package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incrementally-maintained INTERVAL (overlap) join-aggregate
  * (SURVEY.md §2.11 R165) — the M:N range-join shape NEITHER temporal
  * engine expresses: explicit, possibly-OVERLAPPING validity windows,
  * each fact matching EVERY window that covers its event time,
  *
  *   SELECT i.vs AS g, sum(f.m), count(*)
  *   FROM facts f JOIN intervals i
  *     ON f.k = i.k AND i.s <= f.t AND f.t < i.e
  *   GROUP BY g
  *
  * — the "attributed revenue by campaign" query: campaigns carry
  * [start, end) windows per user/product key, a click inside two
  * concurrent campaigns counts toward BOTH (interval-join semantics,
  * unlike the as-of family where I(D) partitions the line and every
  * fact matches at most once). The repo's batch member is
  * `x36_interval_join` (operators/AsOfJoin.scala range join); the
  * oracled batch twin of THIS view is **x128_attributed_clicks**
  * (DuckDB direct range-predicate join).
  *
  * The view is BILINEAR in (F, I) and the intervals are EXPLICIT
  * rows — no intervalization or diffing is needed (the one device the
  * as-of family required). With inputs ordered F < I, the telescoped
  * Δ-rule is just
  *
  *   Δview = ΔF ⋈ I_post  +  F_pre ⋈ ΔI
  *
  *   - ΔF (signed fact rows, the family's arrive-once/delete-by-id
  *     Z-set) range-joins the POST-state intervals of the batch facts'
  *     KEYS — one bucket-pruned read of `i/` patched with this batch's
  *     interval Z-set;
  *   - ΔI (signed interval rows: upsert ships −old +new, delete ships
  *     −old; an upsert identical to the stored row ships NOTHING)
  *     range-joins the PRE-state retained facts of the touched
  *     intervals' keys — one bucket-pruned read of `f/`.
  *
  * Per-batch cost is O(facts of touched keys + intervals of fact keys
  * + actual matches) — the affected subtree, never O(state). Both
  * range joins carry the equi key `k`, so they plan as keyed joins
  * with a range residual, never a nested loop (plan-guarded).
  *
  * State under `stateDir/intervaljoinagg/` (ONE staged
  * kind-discriminated delta, the family's crash-safe protocol):
  *   - `f/` retained facts `(id, t, m[, m2..], k)` bucketed by k
  *     ([[IncrementalJoinAggStar.mergeF]]);
  *   - `i/` interval rows `(iid, k, s, e, vs)` bucketed by k
  *     (exact-row signed merge, [[mergeI]]);
  *   - `a/` additive aggregate + signed changelog keyed by the
  *     interval attribute `vs` ([[IncrementalJoinAggStar.mergeA]];
  *     integral of `c` IS `a` — the family contract).
  *
  * Contracts: fact ids arrive once and pin (t, m.., k); fact deletes
  * name (id, k). Intervals are keyed by `iid`; `iid` PINS `k` (an
  * upsert may move s/e/vs but never the key — re-key = delete + new
  * iid, exactly the fact contract); interval deletes name (iid, k);
  * delete-wins within batch on both inputs. Window semantics are
  * half-open `[s, e)` with `s <= t` inclusive. INNER join: facts
  * covered by no window contribute nothing (the x36 shape — there is
  * no meaningful "null window" group for overlapping intervals).
  * Multi-measure per R161: `numMeasures = M` sums `m, m2..mM`
  * independently under the same Z-set weights. */
object IncrementalIntervalJoinAgg {

  private def mColsOf(nM: Int): Seq[String] = "m" +: (2 to nM).map(i => s"m$i")
  private def fSchemaN(nM: Int): StructType = StructType(
    Seq(StructField("id", LongType), StructField("t", LongType)) ++
      mColsOf(nM).map(c => StructField(c, LongType)) :+
      StructField("k", LongType))
  private[streaming] val iSchema = StructType(Seq(
    StructField("iid", LongType), StructField("k", LongType),
    StructField("s", LongType), StructField("e", LongType),
    StructField("vs", StringType)))
  private val iDelSchema = StructType(Seq(
    StructField("iid", LongType), StructField("k", LongType)))

  /** Fold one CDC micro-batch. Frames may be empty; columns:
    * `facts(id, t, m[, m2..mM], k)`, `factDels(id, k)`,
    * `intUps(iid, k, s, e, vs)`, `intDels(iid, k)`. */
  def processBatch(facts: DataFrame, factDels: DataFrame,
      intUps: DataFrame, intDels: DataFrame,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16,
      numMeasures: Int = 1, maxWindowSpanUs: Option[Long] = None): Unit = {
    val mCols = mColsOf(numMeasures)
    val spark = facts.sparkSession
    val path = s"$stateDir/intervaljoinagg"
    maxWindowSpanUs.foreach(span =>
      enforceSpanContract(intUps, span, s"interval fold of $path"))
    MvPipeline.assertAboveResumeFloor(spark, path, batchId)
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
      val iActive = !intUps.isEmpty || !intDels.isEmpty

      // ---- normalize inputs (the family's within-batch rules) ----
      val fIn =
        if (facts.isEmpty) emptyF
        else facts.select(Seq(col("id").cast("long").as("id"),
              col("t").cast("long").as("t")) ++
              mCols.map(c => col(c).cast("long").as(c)) :+
              col("k").cast("long").as("k"): _*)
          .groupBy("id")
          .agg(min(struct(col("t") +: mCols.map(col) :+ col("k"): _*)).as("x"))
          .select(col("id") +: ("t" +: mCols :+ "k").map(c =>
            col(s"x.$c").as(c)): _*)
          .transform(graft.operators.Caching.persisted)
      val delIn =
        if (factDels.isEmpty) emptyF.select("id", "k")
        else factDels.select(col("id").cast("long").as("id"),
            col("k").cast("long").as("k")).distinct()
          .transform(graft.operators.Caching.persisted)
      val iDelN =
        if (intDels.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            iDelSchema)
        else intDels.select(col("iid").cast("long").as("iid"),
            col("k").cast("long").as("k")).distinct()
          .transform(graft.operators.Caching.persisted)
      // latest-wins per iid within the batch (deterministic min-struct,
      // the fact rule); delete-wins
      val iIn =
        if (intUps.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            iSchema)
        else intUps.select(col("iid").cast("long").as("iid"),
            col("k").cast("long").as("k"), col("s").cast("long").as("s"),
            col("e").cast("long").as("e"), col("vs").cast("string").as("vs"))
          .groupBy("iid")
          .agg(min(struct(col("k"), col("s"), col("e"), col("vs"))).as("x"))
          .select(col("iid"), col("x.k").as("k"), col("x.s").as("s"),
            col("x.e").as("e"), col("x.vs").as("vs"))
          .join(iDelN.select("iid"), Seq("iid"), "left_anti")
          .transform(graft.operators.Caching.persisted)

      // ---- interval Z-set: exact row diff of the touched iids ----
      val touchedI = iIn.select("iid", "k")
        .unionByName(iDelN.select("iid", "k")).distinct()
        .transform(graft.operators.Caching.persisted)
      val i0 =
        if (!iActive)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            iSchema)
        else pruneRead("i", touchedI.select("k"), iSchema)
          .join(touchedI.select("iid"), Seq("iid"), "left_semi")
          .transform(graft.operators.Caching.persisted)
      def rowDiff(a: DataFrame, b: DataFrame): DataFrame = {
        val bb = b.select(col("iid").as("iid0"), col("k").as("k0"),
          col("s").as("s0"), col("e").as("e0"), col("vs").as("vs0"))
        a.join(bb, col("iid") === col("iid0") && col("k") === col("k0") &&
          col("s") === col("s0") && col("e") === col("e0") &&
          col("vs") <=> col("vs0"), "left_anti")
      }
      val zi =
        if (!iActive) i0.withColumn("w", lit(1L)).limit(0)
        else rowDiff(iIn, i0).withColumn("w", lit(1L))
          .unionByName(rowDiff(i0, iIn).withColumn("w", lit(-1L)))
          .transform(graft.operators.Caching.persisted)

      // ---- ΔF (signed, family rules) + term 1 vs POST intervals ----
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
        if (!fActive)
          emptyF.select(mCols.map(col) ++
            Seq(lit(null).cast("string").as("g"), lit(1L).as("w")): _*).limit(0)
        else {
          val zfK = zf.select("k").distinct()
            .transform(graft.operators.Caching.persisted)
          // post-state intervals of the FACT keys: pre-state patched
          // with this batch's interval Z-set (state not yet written)
          val iPost = pruneRead("i", zfK, iSchema)
            .join(zfK, Seq("k"), "left_semi")
            .withColumn("w", lit(1L))
            .unionByName(zi.join(zfK, Seq("k"), "left_semi"))
            .groupBy("iid", "k", "s", "e", "vs").agg(sum("w").as("w"))
            .filter(col("w") > 0)
          zf.join(iPost.select(col("k").as("ik"), col("s"), col("e"),
              col("vs")),
              col("k") === col("ik") && col("s") <= col("t") &&
                col("t") < col("e"))
            .select(mCols.map(col) ++ Seq(col("vs").as("g"), col("w")): _*)
        }

      // ---- term 2: F_pre of the touched intervals' keys x ΔI ----
      val t2 =
        if (!iActive) t1.limit(0)
        else pruneRead("f", touchedI.select("k"), fSchemaN(numMeasures))
          .join(touchedI.select("k").distinct(), Seq("k"), "left_semi")
          .join(zi.select(col("k").as("ik"), col("s"), col("e"),
            col("vs"), col("w")),
            col("k") === col("ik") && col("s") <= col("t") &&
              col("t") < col("e"))
          .select(mCols.map(col) ++ Seq(col("vs").as("g"), col("w")): _*)

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
          Seq(col("k"), nil.as("iid"), nil.as("s"), nil.as("e"),
            nils.as("vs"), nils.as("g"), nil.as("c"), nil.as("b"),
            col("w")): _*))
      val iDelta =
        if (zi.isEmpty) Nil
        else Seq(zi.select(Seq(lit("i").as("tbl"), nil.as("id"), nil.as("t"),
          nil.as("m")) ++ extraM.map(c => nil.as(c)) ++
          Seq(col("k"), col("iid"), col("s"), col("e"), col("vs"),
            nils.as("g"), nil.as("c"), nil.as("b"), col("w")): _*))
      val aDelta = finished.select(Seq(lit("a").as("tbl"), nil.as("id"),
        nil.as("t")) ++ mCols.map(c => col(s"d$c").as(c)) ++
        Seq(nil.as("k"), nil.as("iid"), nil.as("s"), nil.as("e"),
          nils.as("vs"), col("g"), col("dc").as("c"), nil.as("b"),
          nil.as("w")): _*)
      val cDelta = finished.select(Seq(lit("c").as("tbl"), nil.as("id"),
        nil.as("t")) ++ mCols.map(c => col(s"d$c").as(c)) ++
        Seq(nil.as("k"), nil.as("iid"), nil.as("s"), nil.as("e"),
          nils.as("vs"), col("g"), col("dc").as("c"), lit(batchId).as("b"),
          nil.as("w")): _*)
      (fDelta ++ iDelta ++ Seq(aDelta, cDelta)).reduce(_ unionByName _)
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
        (if (present("i"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "i")
              .select("iid", "k", "s", "e", "vs", "w"),
            s"$path/i", mergeI, batchId, numBuckets, Seq("k")))
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
          .filter(x => x.getPath.getName.startsWith("_delta_"))
          .foreach(x => fs.delete(x.getPath, true))
    } finally graft.operators.Caching.releaseAll()
  }

  /** Exact-row signed merge for the interval table (iid is the primary
    * key; the Z-set's −rows name exact stored rows, so the anti-join is
    * idempotent under replay). */
  private[streaming] def mergeI(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("w")) old.drop("w") else old
    val plus = inc.filter(col("w") === 1L).drop("w")
    val minus = inc.filter(col("w") === -1L).drop("w")
    val cond = Seq("iid", "k", "s", "e", "vs").map(c => o(c) <=> minus(c))
      .reduce(_ && _)
    o.join(minus, cond, "left_anti").unionByName(plus).distinct()
  }

  /** `(g, total[, total2..], rows)` == the batch interval
    * join-aggregate over the current inputs. */
  def view(spark: SparkSession, stateDir: String,
      numMeasures: Int = 1): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/intervaljoinagg/a",
      IncrementalJoinAggStar.aSchemaN(numMeasures))
    st.filter(col("kind") === "a" && col("c") > 0)
      .select(Seq(col("g"), col("m").as("total")) ++
        IncrementalJoinAggStar.extraTotals(st) ++
        Seq(col("c").as("rows")): _*)
  }

  /** [[view]] restricted to `groups` — the bucket-pruned point read. */
  def viewFor(spark: SparkSession, stateDir: String, groups: Seq[String],
      numBuckets: Int = 16, numMeasures: Int = 1): DataFrame = {
    import spark.implicits._
    MvPipeline.assertReadLayout(spark, s"$stateDir/intervaljoinagg/a",
      numBuckets, 1, "interval viewFor")
    val gdf = groups.toDF("g")
    val ids = MvPipeline.bucketIdsOf(gdf, Seq("g"), numBuckets)
    val st = MvPipeline.readBuckets(spark, s"$stateDir/intervaljoinagg/a",
      ids, IncrementalJoinAggStar.aSchemaN(numMeasures))
    st.filter(col("kind") === "a" && col("c") > 0)
      .join(broadcast(gdf), Seq("g"), "left_semi")
      .select(Seq(col("g"), col("m").as("total")) ++
        IncrementalJoinAggStar.extraTotals(st) ++
        Seq(col("c").as("rows")): _*)
  }

  /** Z-set changelog `(batch, g, dtotal[, dtotalN..], drows)`;
    * integral == view (feeds [[graft.sinks.ChangelogShip]]). */
  def changelog(spark: SparkSession, stateDir: String,
      numMeasures: Int = 1): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/intervaljoinagg/a",
      IncrementalJoinAggStar.aSchemaN(numMeasures))
    val extra = st.columns.filter(_.matches("m\\d+")).toSeq
      .sortBy(_.drop(1).toInt)
      .map(c => col(c).as(s"dtotal${c.drop(1)}"))
    st.filter(col("kind") === "c")
      .select(Seq(col("b").as("batch"), col("g"), col("m").as("dtotal")) ++
        extra ++ Seq(col("c").as("drows")): _*)
  }

  /** AS-OF read over MAINTENANCE time (the family contract). */
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

  /** FORGET a set of keys (GDPR): remove every fact AND every interval
    * of the named keys — ONE CDC batch through [[processBatch]] (the
    * family device), so −1 changelog rows ship, integral == view holds
    * through the forget, and replay is a no-op. Absent keys no-op. */
  def forgetKeys(spark: SparkSession, keys: Seq[Long], stateDir: String,
      batchId: Long, numBuckets: Int = 16, numMeasures: Int = 1): Unit = {
    import spark.implicits._
    val path = s"$stateDir/intervaljoinagg"
    val kdf = keys.toDF("k")
    def pruned(table: String, schema: StructType): DataFrame =
      MvPipeline.readBuckets(spark, s"$path/$table",
        MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets), schema)
        .join(broadcast(kdf), Seq("k"), "left_semi")
    val factDels = pruned("f", fSchemaN(numMeasures)).select("id", "k")
    val intDels = pruned("i", iSchema).select("iid", "k")
    processBatch(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        fSchemaN(numMeasures)),
      factDels,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        iSchema),
      intDels, stateDir, batchId, numBuckets, numMeasures)
  }

  /** WATERMARK-EXACT state compaction — and on THIS view it needs no
    * floor at all: under the contract that every FUTURE fact time and
    * NEW interval's start is `>= horizon` (upserts/deletes may still
    * name any RETAINED iid),
    *
    *   - intervals CLOSED at the horizon (`e <= horizon`) leave `i/`:
    *     a future fact needs `t < e <= horizon <= t` — impossible.
    *     Intervals still OPEN at the horizon (`e > horizon`) are
    *     retained whole, including their pre-horizon span;
    *   - facts with `t < horizon` leave `f/` UNLESS a retained window
    *     still covers them: an uncovered old fact can never be matched
    *     (a future interval starts at `s >= horizon > t`) nor
    *     retracted (its only matches were with now-dropped intervals,
    *     whose deletes no-op) — its contributions are materialized in
    *     `a/`. A COVERED old fact must stay: deleting or replacing the
    *     straddling window that covers it retracts its match exactly.
    *
    * View untouched; retained state bounded by the horizon window PLUS
    * the coverage of still-open windows (the honest bound — an
    * always-open window pins its facts). Out-of-contract late arrivals
    * diverge silently (they miss matches against compacted rows); an
    * upsert naming a compacted-away iid behaves as a fresh insert.
    * Callers pick the horizon as their lateness bound.
    *
    * OPS GUARD (r13): the always-open-window bound is SURFACED instead
    * of silent — the returned [[PinReport]] names how many pre-horizon
    * facts stay pinned, the oldest pinned fact time (age = horizon −
    * oldest), and a sample of the pinning window ids, so "a forgotten
    * open window is quietly retaining a year of facts" is visible at
    * every compaction. `maxWindowSpanUs` DECLARES the caller's
    * window-span contract (every window satisfies e − s ≤ span): a
    * pinned fact with `t < horizon − span` can then only be covered by
    * an out-of-contract window, so its pin is PROVABLY EXPIRED and the
    * fact drops (counted in the report, with the violating windows
    * sampled) — the declared contract turns the unbounded pin into a
    * hard `span` bound. Retraction of an out-of-contract window after
    * its pins dropped diverges, exactly like any other contract
    * violation of this compaction. */
  def compactState(spark: SparkSession, stateDir: String, horizon: Long,
      maxWindowSpanUs: Option[Long] = None): PinReport = {
    val path = s"$stateDir/intervaljoinagg"
    MvPipeline.transformBuckets(spark, s"$path/i",
      old => old.filter(col("e") > horizon))
    // the retained (open) windows — read AFTER i/'s rewrite committed
    val openFull = MvPipeline.readBucketedStateOrEmpty(spark, s"$path/i", iSchema)
      .transform(graft.operators.Caching.persisted)
    val open = openFull
      .select(col("iid").as("oid"), col("k").as("ok"), col("s").as("os"),
        col("e").as("oe"))
    val expiredFloor = maxWindowSpanUs.map(span => horizon - span)
    try {
      // provably-expired pins counted BEFORE the rewrite drops them
      val dropped = expiredFloor.map { fl =>
        MvPipeline.readBucketedStateOrEmpty(spark, s"$path/f", fSchemaN(1))
          .select("id", "t", "k").filter(col("t") < fl)
          .join(open, col("k") === col("ok") && col("os") <= col("t") &&
            col("t") < col("oe"), "left_semi")
          .count()
      }.getOrElse(0L)
      MvPipeline.transformBuckets(spark, s"$path/f", old => {
        val covered = old.filter(col("t") < horizon)
          .join(open.drop("oid"), col("k") === col("ok") &&
            col("os") <= col("t") && col("t") < col("oe"), "left_semi")
        old.filter(col("t") >= horizon)
          .unionByName(expiredFloor.fold(covered)(fl =>
            covered.filter(col("t") >= fl)))
      })
      pinReport(spark, openFull, open,
        MvPipeline.readBucketedStateOrEmpty(spark, s"$path/f", fSchemaN(1))
          .select("id", "t", "k").filter(col("t") < horizon),
        horizon, maxWindowSpanUs, dropped)
    } finally graft.operators.Caching.releaseAll()
  }

  /** INGEST-side enforcement of the declared window-span contract
    * (r14): [[compactState]]'s `maxWindowSpanUs` drop is provably safe
    * only when no in-contract window is wider than the span — which
    * until now was declared, not enforced (an out-of-contract window's
    * later retraction diverged exactly like other contract
    * violations). A fold invoked with the span REFUSES a violating
    * window upsert before any state moves, so a deployment that
    * declares the span at every fold can never hold an out-of-contract
    * window, and the compaction's expired-pin drop is airtight instead
    * of best-effort. One bounded aggregation over the batch's interval
    * upserts (dim-side cadence, never the fact stream). */
  private[streaming] def enforceSpanContract(intUps: DataFrame, span: Long,
      where: String): Unit = {
    if (intUps.isEmpty) return
    val bad = intUps
      .select(col("iid").cast("long").as("iid"), col("s").cast("long").as("s"),
        col("e").cast("long").as("e"))
      .filter(col("e") - col("s") > span)
      .limit(5).collect()
    require(bad.isEmpty,
      s"$where: window upsert(s) wider than the declared " +
        s"maxWindowSpanUs=$span — refused before any state moved: " +
        bad.map(r => s"iid=${r.getLong(0)} span=${r.getLong(2) - r.getLong(1)}")
          .mkString(", "))
  }

  /** What the always-open-window bound currently costs — returned by
    * [[compactState]] (this engine's and the mixed star's). Ages are
    * in the caller's time unit: `horizon − oldestPinnedT`. */
  final case class PinReport(
      pinnedFacts: Long,
      oldestPinnedT: Option[Long],
      pinningWindowCount: Long,
      pinningWindowSample: Seq[Long],
      droppedExpiredPins: Long,
      outOfContractWindowCount: Long,
      outOfContractWindowSample: Seq[Long]) {
    def oldestPinnedAge(horizon: Long): Option[Long] =
      oldestPinnedT.map(horizon - _)
  }

  /** Build a [[PinReport]] from the post-rewrite pinned facts and the
    * open-window relation. (The mixed star assembles the SAME report
    * shape itself from its per-branch interval tables — a multi-branch
    * union this single-relation helper cannot express — so changes to
    * the report's semantics must land in both places:
    * IncrementalTemporalStar.compactState's ops-guard block.)
    * `openFull` carries (iid, k, s, e, ..); `open` its (oid, ok, os,
    * oe) projection; `pinned` the retained pre-horizon (id, t, k). */
  private[streaming] def pinReport(spark: SparkSession, openFull: DataFrame,
      open: DataFrame, pinned: DataFrame, horizon: Long,
      maxWindowSpanUs: Option[Long], dropped: Long): PinReport = {
    val p = pinned.transform(graft.operators.Caching.persisted)
    val stats = p.agg(count(lit(1)).as("n"), min(col("t")).as("t0"))
      .collect()(0) // 1-row stat (allowed)
    val pins = p.join(open, col("k") === col("ok") && col("os") <= col("t") &&
        col("t") < col("oe"))
      .select(col("oid")).distinct()
      .transform(graft.operators.Caching.persisted)
    val pinCount = pins.count()
    val pinSample = pins.orderBy("oid").limit(20)
      .collect().map(_.getLong(0)).toSeq
    val (oocCount, oocSample) = maxWindowSpanUs.map { span =>
      val ooc = openFull.filter(col("e") - col("s") > span)
        .select(col("iid")).distinct()
        .transform(graft.operators.Caching.persisted)
      (ooc.count(), ooc.orderBy("iid").limit(20)
        .collect().map(_.getLong(0)).toSeq)
    }.getOrElse((0L, Seq.empty[Long]))
    PinReport(stats.getLong(0),
      if (stats.isNullAt(1)) None else Some(stats.getLong(1)),
      pinCount, pinSample, dropped, oocCount, oocSample)
  }

  /** Changelog compaction (family contract). */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    MvPipeline.compactChangelogA(spark, s"$stateDir/intervaljoinagg/a", upTo)

  /** RESHARD the state dir to `newBuckets` (R163's write-side knob):
    * offline op between committed batches into a FRESH `dstDir`; resume
    * folding with `numBuckets = newBuckets` and batch ids above the
    * last committed. */
  def reshard(spark: SparkSession, srcDir: String, dstDir: String,
      newBuckets: Int): Unit = {
    val src = s"$srcDir/intervaljoinagg"
    val dst = s"$dstDir/intervaljoinagg"
    MvPipeline.reshardBucketed(spark, s"$src/f", s"$dst/f", newBuckets, Seq("k"))
    MvPipeline.reshardBucketed(spark, s"$src/i", s"$dst/i", newBuckets, Seq("k"))
    MvPipeline.reshardBucketed(spark, s"$src/a", s"$dst/a", newBuckets, Seq("g"))
    // replay safety: the destination carries no per-bucket stamps, so it
    // refuses batch ids at or below the last one committed here
    MvPipeline.writeResumeFloor(spark, dst,
      math.max(MvPipeline.maxBatchIn(spark, s"$src/a"),
        MvPipeline.maxStampUnder(spark, src)))
  }

  /** BOOTSTRAP a fresh state dir from batch tables — one range join
    * (the batch twin's plan, [[intervalAggregate]]) instead of
    * per-batch delta machinery. */
  def bootstrap(facts: DataFrame, intervals: DataFrame, stateDir: String,
      baselineBatch: Long = 0L, numBuckets: Int = 16,
      numMeasures: Int = 1, maxWindowSpanUs: Option[Long] = None): Unit = {
    val spark = facts.sparkSession
    val mCols = mColsOf(numMeasures)
    val path = s"$stateDir/intervaljoinagg"
    // the span contract is only airtight when EVERY ingest path checks
    // it — a bootstrapped wide window would outlive folds that declare
    // the span (the guard never re-examines retained state)
    maxWindowSpanUs.foreach(span =>
      enforceSpanContract(intervals, span, s"interval bootstrap of $path"))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(path)),
      s"bootstrap requires a fresh state dir, found $path")
    val fIn = facts.select(Seq(col("id").cast("long").as("id"),
        col("t").cast("long").as("t")) ++
        mCols.map(c => col(c).cast("long").as(c)) :+
        col("k").cast("long").as("k"): _*)
      .groupBy("id")
      .agg(min(struct(col("t") +: mCols.map(col) :+ col("k"): _*)).as("x"))
      .select(col("id") +: ("t" +: mCols :+ "k").map(c => col(s"x.$c").as(c)): _*)
      .transform(graft.operators.Caching.persisted)
    val iIn = intervals.select(col("iid").cast("long").as("iid"),
        col("k").cast("long").as("k"), col("s").cast("long").as("s"),
        col("e").cast("long").as("e"), col("vs").cast("string").as("vs"))
      .groupBy("iid")
      .agg(min(struct(col("k"), col("s"), col("e"), col("vs"))).as("x"))
      .select(col("iid"), col("x.k").as("k"), col("x.s").as("s"),
        col("x.e").as("e"), col("x.vs").as("vs"))
      .transform(graft.operators.Caching.persisted)
    try {
      MvPipeline.upsertBucketedMerge(fIn, s"$path/f",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets, Seq("k"))
      MvPipeline.upsertBucketedMerge(iIn, s"$path/i",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets, Seq("k"))
      val agg = intervalAggregate(fIn, iIn, numMeasures)
        .transform(graft.operators.Caching.persisted)
      val tCols = "total" +: (2 to numMeasures).map(i => s"total$i")
      def aggRows(kind: String, b: org.apache.spark.sql.Column) = agg.select(
        Seq(lit(kind).as("kind"), col("g"), b.as("b")) ++
          tCols.zip(mCols).map { case (tc, m) => col(tc).as(m) } ++
          Seq(col("rows").as("c")): _*)
      MvPipeline.upsertBucketedMerge(
        aggRows("a", lit(null).cast("long"))
          .unionByName(aggRows("c", lit(baselineBatch))),
        s"$path/a", IncrementalJoinAggStar.mergeA, -1L, numBuckets, Seq("g"))
    } finally graft.operators.Caching.releaseAll()
  }

  /** The BATCH interval join-aggregate `(g, total[, totalN..], rows)` —
    * the plan the maintained view must equal (equi key + range
    * residual, one aggregate). Used by [[bootstrap]], the spec model,
    * and the x128 reference plan. */
  def intervalAggregate(facts: DataFrame, intervals: DataFrame,
      numMeasures: Int = 1): DataFrame = {
    val mCols = mColsOf(numMeasures)
    val tAggs = mCols.zipWithIndex.map { case (c, i) =>
      sum(col(c)).as(if (i == 0) "total" else s"total${i + 1}") }
    facts.join(intervals.select(col("k").as("ik"), col("s"), col("e"),
        col("vs")),
        col("k") === col("ik") && col("s") <= col("t") &&
          col("t") < col("e"))
      .groupBy(col("vs").as("g"))
      .agg(tAggs.head, (tAggs.tail :+ count(lit(1)).as("rows")): _*)
  }

  /** Continuous maintenance over a mixed CDC stream: `kind` ∈
    * fact | fact_del | int | int_del; fixed columns per kind (absent
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
          batch.filter(col("kind") === "int"),
          batch.filter(col("kind") === "int_del"),
          stateDir, batchId, numBuckets = numBuckets,
          numMeasures = numMeasures)
      }
      .start()
}
