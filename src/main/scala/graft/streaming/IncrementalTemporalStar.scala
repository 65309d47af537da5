package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incrementally-maintained MULTI-BRANCH temporal (as-of) join-aggregate
  * (SURVEY.md §2.11 R162) — the "temporal star": each fact resolves
  * SEVERAL independent SCD-2 dimensions at its event time,
  *
  *   SELECT g1, .., gB, sum(f.m), count(*)
  *   FROM facts f
  *     ASOF LEFT JOIN d1 ON f.k1 = d1.k AND f.t >= d1.vf
  *     ...
  *     ASOF LEFT JOIN dB ON f.kB = dB.k AND f.t >= dB.vf
  *   GROUP BY g1, .., gB
  *
  * — the shape a real consumer query takes when a purchase must carry
  * both the user's segment AND the catalog's price tier as of purchase
  * time. Neither existing engine expresses it: the equality-keyed star
  * ([[IncrementalJoinAggStar]]) has no range predicate, and the
  * single-dimension temporal engine ([[IncrementalTemporalJoinAgg]],
  * R160) has exactly one version branch.
  *
  * The device is R160's, telescoped across branches: each branch's
  * as-of join is the equi+range join against its INTERVALIZED relation
  * I(D_b) (one validity interval per version + the null head pad, so
  * I(D_b) partitions the (k, t) line), making the view MULTILINEAR in
  * (F, I(D_1), .., I(D_B)). With inputs ordered F < D_1 < .. < D_B:
  *
  *   Δview = ΔF ⋈ I(D_1 post) ⋈ .. ⋈ I(D_B post)
  *         + Σ_b  F_pre ⋈ I(D_1 pre) .. I(D_{b-1} pre)
  *                      ⋈ ΔI_b ⋈ I(D_{b+1} post) .. I(D_B post)
  *
  * where ΔI_b is the per-touched-key exact interval-row diff (R160's
  * sort + lead + head pad). Because every I(D_j) partitions the line,
  * "⋈ I(D_j at s)" is an as-of RESOLUTION — at most one match per
  * fact — implemented as a bucket-pruned read of `d{j}/` for the
  * restricted facts' keys (patched with this batch's version Z-set for
  * post-state) plus one max-(vf ≤ t) aggregate. Per-batch cost is
  * O(facts of touched keys × branches + versions of touched keys),
  * never O(state).
  *
  * State under `stateDir/temporalstar/` (ONE staged kind-discriminated
  * delta, the family's crash-safe protocol):
  *   - `f/` facts `(id, t, m[, m2..], k1..kB)` bucketed by k1, plus
  *     per-branch mirrors `fm{b}` bucketed by k_b (b >= 2) — the
  *     ClickHouse-projection trade the equality star established:
  *     B slim fact copies buy bucket-pruned entry from any branch;
  *   - `d{b}/` per-branch version rows `(k, vl, vs)` bucketed by k
  *     ([[IncrementalJoinAggStar.mergeSigned]]);
  *   - `a/` additive aggregate + signed changelog keyed by the ENCODED
  *     group (branch attributes joined with \u0001, NULL as \u0000 —
  *     the equality star's multi-attr encoding; readers split it back
  *     into per-branch columns). Version attributes must not contain
  *     the two control characters (the family contract).
  *
  * Contracts are R160's per branch: fact ids arrive once and pin
  * (t, measures, keys); fact deletes name (id, k1..kB); versions are
  * keyed by (k, vf) with replace-on-upsert, delete names the exact
  * (k, vf); delete-wins within batch; ties `vf <= t` inclusive.
  * Multi-measure per R161: `numMeasures = M` sums `m, m2..mM`
  * independently under the same Z-set weights.
  *
  * A 1-branch instance is exactly the R160 view — and since the r11
  * consolidation [[IncrementalTemporalJoinAgg]] IS that instance (a
  * thin delegate over this engine with `root = "temporaljoinagg"`,
  * exactly as the equality-keyed binary/chain/N engines are instances
  * of [[IncrementalJoinAggStar]]); the batch twin is **x126_asof_star**
  * (DuckDB chained ASOF LEFT JOIN). Every public entry takes a `root`
  * (the table-directory name under `stateDir`) so delegates keep their
  * own state namespace.
  *
  * MIXED-SHAPE branches (SURVEY.md §2.11 R167): `intervalBranches`
  * names the branches whose dimension is an explicit OVERLAP-WINDOW
  * relation ([[IncrementalIntervalJoinAgg]]'s rows `(iid, k, s, e,
  * vs)`) instead of an SCD-2 version history — "revenue by as-of
  * segment, attributed within campaign windows" is ONE maintained view
  * with a temporal branch and an interval branch. The Δ-rule is the
  * SAME telescoped multilinear sum: an interval branch's relation is
  * already explicit signed rows (no intervalization device), its ΔR_b
  * is the exact row diff of the touched iids, and its per-branch
  * resolve is a FAN-OUT inner join (each covering window emits its own
  * tuple; facts covered by no window contribute nothing — the interval
  * engine's INNER contract) instead of the as-of max-(vf ≤ t)
  * collapse. Fan-out makes tuple multiplicity real: every interval
  * resolve carries the matched window's `iid` as a `_tag` column so a
  * later as-of resolve's group-collapse can never merge two
  * same-attribute tuples. `trackEnriched` under fan-out (R175) keeps
  * a SET-VALUED enriched relation — one row per live (fact ×
  * covering-window combination), keyed by the composite (id, window
  * tags) and maintained as a Z-weight relation ([[mergeRSet]], served
  * by [[enrichedFanoutView]]) — where the pure as-of mode keeps
  * REPLACE-per-id; `trackExtrema` stays exact (the e/ relation
  * is the tuple multiset, which fan-out legitimately multiplies).
  * Batch twins: **x130_mixed_attribution** (DuckDB ASOF LEFT JOIN +
  * range join in one query) and **x133_mixed_enriched** (the same
  * query un-aggregated, per (click, window) row). Reference anchor: the ad-hoc consumer
  * joins over summary tables (/root/reference/README.md:24-189) mix
  * exactly these dimension shapes. */
object IncrementalTemporalStar {

  /** Default table-directory name under `stateDir`. */
  private[streaming] val Root = "temporalstar"

  private val SEP = "\u0001"
  private val NUL = "\u0000"

  private def mColsOf(nM: Int): Seq[String] = "m" +: (2 to nM).map(i => s"m$i")
  private def kColsOf(nB: Int): Seq[String] = (1 to nB).map(b => s"k$b")
  private def fSchemaN(nB: Int, nM: Int): StructType = StructType(
    Seq(StructField("id", LongType), StructField("t", LongType)) ++
      mColsOf(nM).map(c => StructField(c, LongType)) ++
      kColsOf(nB).map(c => StructField(c, LongType)))
  private def delSchema(nB: Int): StructType = StructType(
    StructField("id", LongType) +:
      kColsOf(nB).map(c => StructField(c, LongType)))
  private val dUpSchema = StructType(Seq(StructField("k", LongType),
    StructField("vf", LongType), StructField("vs", StringType)))
  private val dDelSchema = StructType(Seq(StructField("k", LongType),
    StructField("vf", LongType)))
  private val iDelSchema = StructType(Seq(StructField("iid", LongType),
    StructField("k", LongType)))

  /** Encode per-branch resolved attributes into the stored group key. */
  private def encodeG(gCols: Seq[Column]): Column =
    concat_ws(SEP, gCols.map(c => coalesce(c, lit(NUL))): _*)

  /** Split a stored group key back into nullable per-branch columns. */
  private def decodeG(nB: Int): Seq[Column] =
    (1 to nB).map { b =>
      val e = element_at(split(col("g"), SEP, -1), b)
      when(e === NUL, lit(null).cast("string")).otherwise(e).as(s"g$b")
    }

  /** Fold one CDC micro-batch. `facts(id, t, m[, m2..], k1..kB)`,
    * `factDels(id, k1..kB)`; per TEMPORAL branch `dimUps(b)(k, vf,
    * vs)` / `dimDels(b)(k, vf)`; per INTERVAL branch (R167, `b ∈
    * intervalBranches`) `dimUps(b)(iid, k, s, e, vs)` / `dimDels(b)
    * (iid, k)` under the interval engine's contracts (iid pins k;
    * upsert = −old +new; delete-wins); frames may be empty. */
  def processBatch(facts: DataFrame, factDels: DataFrame,
      dimUps: Seq[DataFrame], dimDels: Seq[DataFrame],
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16,
      numMeasures: Int = 1, trackExtrema: Boolean = false,
      trackEnriched: Boolean = false, root: String = Root,
      intervalBranches: Set[Int] = Set.empty,
      maxWindowSpanUs: Option[Long] = None): Unit = {
    val nB = dimUps.size
    require(nB >= 1 && dimDels.size == nB, "one ups+dels frame per branch")
    require(intervalBranches.forall(b => b >= 1 && b <= nB),
      "interval branch ids must be in 1..B")
    maxWindowSpanUs.foreach(span => intervalBranches.toSeq.sorted.foreach(b =>
      IncrementalIntervalJoinAgg.enforceSpanContract(dimUps(b - 1), span,
        s"mixed-star interval branch $b of $stateDir/$root")))
    // ENRICHED under fan-out (R175): REPLACE-per-id has no meaning when
    // one fact maps to many tuples, so with interval branches the r/
    // table switches to the SET-VALUED layout — one row per live
    // (fact × covering-window combination), keyed (id, g, tg) where tg
    // encodes the matched window iids (the `_tag` vector), maintained
    // as a Z-weight relation ([[mergeRSet]]): the per-term signed tuple
    // rows integrate to multiplicity 1 exactly for live combinations,
    // so a window delete retracts just its rows, a retro version flip
    // moves every covering row's g, and a fact delete drops the id.
    def isInt(b: Int): Boolean = intervalBranches.contains(b)
    val mCols = mColsOf(numMeasures)
    val kCols = kColsOf(nB)
    val spark = facts.sparkSession
    val path = s"$stateDir/$root"
    MvPipeline.assertAboveResumeFloor(spark, path, batchId)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    def factTable(b: Int): String = if (b == 1) "f" else s"fm$b"
    def pruneRead(table: String, keys: DataFrame, keyCol: String,
        schema: StructType): DataFrame =
      MvPipeline.readBuckets(spark, s"$path/$table",
        MvPipeline.bucketIdsOf(keys.toDF(keyCol), Seq(keyCol), numBuckets),
        schema)

    def computeDelta(): DataFrame = {
      val emptyF = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        fSchemaN(nB, numMeasures))
      val fActive = !facts.isEmpty || !factDels.isEmpty
      val dActive = (0 until nB).map(i => !dimUps(i).isEmpty || !dimDels(i).isEmpty)

      // ---- normalize inputs (the family's within-batch rules) ----
      val fIn =
        if (facts.isEmpty) emptyF
        else facts.select(Seq(col("id").cast("long").as("id"),
              col("t").cast("long").as("t")) ++
              mCols.map(c => col(c).cast("long").as(c)) ++
              kCols.map(c => col(c).cast("long").as(c)): _*)
          .groupBy("id")
          .agg(min(struct(("t" +: mCols) ++ kCols map col: _*)).as("s"))
          .select(col("id") +: (("t" +: mCols) ++ kCols).map(c =>
            col(s"s.$c").as(c)): _*)
          .transform(graft.operators.Caching.persisted)
      val delIn =
        if (factDels.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            delSchema(nB))
        else factDels.select(col("id").cast("long").as("id") +:
            kCols.map(c => col(c).cast("long").as(c)): _*).distinct()
          .transform(graft.operators.Caching.persisted)

      // ---- per-branch version Z-set + interval Z-set (R160 verbatim;
      //      R167 interval branches carry explicit window rows instead) ----
      val dDelN = (0 until nB).map { i =>
        if (isInt(i + 1)) {
          if (dimDels(i).isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              iDelSchema)
          else dimDels(i).select(col("iid").cast("long").as("iid"),
              col("k").cast("long").as("k")).distinct()
            .transform(graft.operators.Caching.persisted)
        } else if (dimDels(i).isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            dDelSchema)
        else dimDels(i).select(col("k").cast("long").as("k"),
            col("vf").cast("long").as("vf")).distinct()
          .transform(graft.operators.Caching.persisted)
      }
      val dIn = (0 until nB).map { i =>
        if (isInt(i + 1)) {
          // latest-wins per iid (deterministic min-struct), delete-wins —
          // the interval engine's within-batch rules verbatim
          if (dimUps(i).isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              IncrementalIntervalJoinAgg.iSchema)
          else dimUps(i).select(col("iid").cast("long").as("iid"),
              col("k").cast("long").as("k"), col("s").cast("long").as("s"),
              col("e").cast("long").as("e"), col("vs").cast("string").as("vs"))
            .groupBy("iid")
            .agg(min(struct(col("k"), col("s"), col("e"), col("vs"))).as("x"))
            .select(col("iid"), col("x.k").as("k"), col("x.s").as("s"),
              col("x.e").as("e"), col("x.vs").as("vs"))
            .join(dDelN(i).select("iid"), Seq("iid"), "left_anti")
            .transform(graft.operators.Caching.persisted)
        } else if (dimUps(i).isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            dUpSchema)
        else dimUps(i).select(col("k").cast("long").as("k"),
            col("vf").cast("long").as("vf"), col("vs").cast("string").as("vs"))
          .groupBy("k", "vf").agg(max("vs").as("vs"))
          .join(dDelN(i), Seq("k", "vf"), "left_anti")
          .transform(graft.operators.Caching.persisted)
      }
      // interval branches: the touched (iid, k) pairs — iid scopes the
      // pre-state row read, k scopes the branch-term fact read
      val touchedI = (0 until nB).map { i =>
        if (!isInt(i + 1)) null
        else dIn(i).select("iid", "k").unionByName(dDelN(i).select("iid", "k"))
          .distinct()
          .transform(graft.operators.Caching.persisted)
      }
      val touchedK = (0 until nB).map { i =>
        if (isInt(i + 1))
          touchedI(i).select("k").distinct()
            .transform(graft.operators.Caching.persisted)
        else dIn(i).select("k").unionByName(dDelN(i).select("k")).distinct()
          .transform(graft.operators.Caching.persisted)
      }
      val d0k = (0 until nB).map { i =>
        if (isInt(i + 1)) {
          if (!dActive(i))
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              IncrementalIntervalJoinAgg.iSchema)
          else pruneRead(s"d${i + 1}", touchedK(i), "k",
              IncrementalIntervalJoinAgg.iSchema)
            .join(touchedI(i).select("iid"), Seq("iid"), "left_semi")
            .transform(graft.operators.Caching.persisted)
        } else if (!dActive(i))
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            IncrementalJoinAggStar.dSchema)
        else pruneRead(s"d${i + 1}", touchedK(i), "k",
            IncrementalJoinAggStar.dSchema)
          .join(touchedK(i), Seq("k"), "left_semi")
          .transform(graft.operators.Caching.persisted)
      }
      val d1k = (0 until nB).map { i =>
        if (isInt(i + 1)) null // no intervalization device on explicit rows
        else if (!dActive(i)) d0k(i)
        else d0k(i)
          .join(dDelN(i).select(col("k"), col("vf").as("vl")), Seq("k", "vl"), "left_anti")
          .join(dIn(i).select(col("k"), col("vf").as("vl")), Seq("k", "vl"), "left_anti")
          .unionByName(dIn(i).select(col("k"), col("vf").as("vl"), col("vs")))
          .transform(graft.operators.Caching.persisted)
      }
      def rowDiff(a: DataFrame, b: DataFrame): DataFrame = {
        val bb = b.select(col("k").as("k0"), col("vl").as("vl0"), col("vs").as("vs0"))
        a.join(bb, col("k") === col("k0") && col("vl") === col("vl0") &&
          col("vs") <=> col("vs0"), "left_anti")
      }
      def rowDiffI(a: DataFrame, b: DataFrame): DataFrame = {
        val bb = b.select(col("iid").as("iid0"), col("k").as("k0"),
          col("s").as("s0"), col("e").as("e0"), col("vs").as("vs0"))
        a.join(bb, col("iid") === col("iid0") && col("k") === col("k0") &&
          col("s") === col("s0") && col("e") === col("e0") &&
          col("vs") <=> col("vs0"), "left_anti")
      }
      // state-merge Z-set: temporal (k, vl, vs, w) version rows;
      // interval (iid, k, s, e, vs, w) window rows — for interval
      // branches this IS the join delta too (explicit rows, bilinear)
      val zd = (0 until nB).map { i =>
        if (isInt(i + 1)) {
          if (!dActive(i)) d0k(i).withColumn("w", lit(1L)).limit(0)
          else rowDiffI(dIn(i), d0k(i)).withColumn("w", lit(1L))
            .unionByName(rowDiffI(d0k(i), dIn(i)).withColumn("w", lit(-1L)))
            .transform(graft.operators.Caching.persisted)
        } else if (!dActive(i)) d0k(i).withColumn("w", lit(1L)).limit(0)
        else rowDiff(d1k(i), d0k(i)).withColumn("w", lit(1L))
          .unionByName(rowDiff(d0k(i), d1k(i)).withColumn("w", lit(-1L)))
          .transform(graft.operators.Caching.persisted)
      }
      def intervalsOf(vers: DataFrame, touched: DataFrame): DataFrame = {
        val w = Window.partitionBy("k").orderBy("vl")
        val v = vers.select(col("k"), col("vl").as("vf"),
          lead(col("vl"), 1).over(w).as("vu"), col("vs"))
        val pads = touched.join(
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
      val zi = (0 until nB).map { i =>
        if (isInt(i + 1)) null // interval branches: zd IS the join delta
        else if (!dActive(i))
          intervalsOf(d0k(i), touchedK(i)).withColumn("w", lit(1L)).limit(0)
        else {
          val iPre = intervalsOf(d0k(i), touchedK(i))
            .transform(graft.operators.Caching.persisted)
          val iPost = intervalsOf(d1k(i), touchedK(i))
            .transform(graft.operators.Caching.persisted)
          iDiff(iPost, iPre).withColumn("w", lit(1L))
            .unionByName(iDiff(iPre, iPost).withColumn("w", lit(-1L)))
            .transform(graft.operators.Caching.persisted)
        }
      }

      // ---- as-of RESOLUTION of branch j over a term frame ----
      // `fr` carries (id, t, mCols, k1..kB, w [, g_i, _tag_i...]); at
      // most one version matches (I(D_j) partitions the line), found as
      // the max-(vl <= t) row of the (optionally Z-set-patched)
      // pre-state. The group-collapse is safe under upstream interval
      // fan-out because every interval resolve tags its tuples with the
      // matched iid (in `keep` here), so no two distinct tuples share a
      // group.
      def resolve(fr: DataFrame, j: Int, post: Boolean): DataFrame = {
        val keep = fr.columns.toSeq
        val keys = fr.select(col(s"k$j").as("k")).distinct()
        val base = pruneRead(s"d$j", keys, "k", IncrementalJoinAggStar.dSchema)
          .join(keys, Seq("k"), "left_semi")
        val eff =
          if (post && dActive(j - 1))
            base.withColumn("w", lit(1L))
              .unionByName(zd(j - 1).join(keys, Seq("k"), "left_semi"))
              .groupBy("k", "vl", "vs").agg(sum("w").as("w"))
              .filter(col("w") > 0)
              .select("k", "vl", "vs")
          else base
        fr.join(eff.select(col("k").as("_dk"), col("vl").as("_vl"),
              col("vs").as("_vs")),
            col(s"k$j") === col("_dk") && col("_vl") <= col("t"), "left")
          .groupBy(keep.head, keep.tail: _*)
          .agg(max(struct(col("_vl"), col("_vs"))).as("_s"))
          .select(keep.map(col) :+ col("_s._vs").as(s"g$j"): _*)
      }

      // ---- interval RESOLUTION of branch j (R167): fan-out INNER join
      //      against the covering windows — every match emits its own
      //      tuple carrying the window attribute AND its iid as the
      //      multiplicity tag; facts covered by no window drop (the
      //      interval engine's INNER contract) ----
      def resolveI(fr: DataFrame, j: Int, post: Boolean): DataFrame = {
        val keep = fr.columns.toSeq
        val keys = fr.select(col(s"k$j").as("k")).distinct()
        val base = pruneRead(s"d$j", keys, "k",
            IncrementalIntervalJoinAgg.iSchema)
          .join(keys, Seq("k"), "left_semi")
        val eff =
          if (post && dActive(j - 1))
            base.withColumn("w", lit(1L))
              .unionByName(zd(j - 1).join(keys, Seq("k"), "left_semi"))
              .groupBy("iid", "k", "s", "e", "vs").agg(sum("w").as("w"))
              .filter(col("w") > 0)
              .select("iid", "k", "s", "e", "vs")
          else base
        fr.join(eff.select(col("k").as("_dk"), col("s").as("_s"),
              col("e").as("_e"), col("vs").as("_vs"), col("iid").as("_tid")),
            col(s"k$j") === col("_dk") && col("_s") <= col("t") &&
              col("t") < col("_e"))
          .select(keep.map(col) ++
            Seq(col("_vs").as(s"g$j"), col("_tid").as(s"_tag$j")): _*)
      }
      def resolveAny(fr: DataFrame, j: Int, post: Boolean): DataFrame =
        if (isInt(j)) resolveI(fr, j, post) else resolve(fr, j, post)

      // ---- ΔF term: signed fact rows resolved at POST on every branch ----
      val zf =
        if (!fActive) emptyF.withColumn("w", lit(1L)).limit(0)
        else {
          val fKeys = fIn.select("k1").unionByName(delIn.select("k1"))
          val f0 = pruneRead("f", fKeys, "k1", fSchemaN(nB, numMeasures))
            .transform(graft.operators.Caching.persisted)
          val newF = fIn.join(f0.select("id"), Seq("id"), "left_anti")
            .join(delIn.select("id"), Seq("id"), "left_anti")
          val delF = f0.join(delIn.select("id"), Seq("id"), "left_semi")
          newF.withColumn("w", lit(1L))
            .unionByName(delF.withColumn("w", lit(-1L)))
            .transform(graft.operators.Caching.persisted)
        }
      val t0 =
        if (!fActive) Nil
        else {
          var cur = zf
          for (j <- 1 to nB) cur = resolveAny(cur, j, post = true)
          Seq(cur)
        }

      // ---- branch terms: F_pre(touched k_b) x ΔI_b, others j<b PRE,
      //      j>b POST. For an interval branch ΔI_b is its signed
      //      explicit-row diff (zd); the join predicate is identical
      //      (s/e are non-null, so the null-tolerant bounds reduce to
      //      s <= t < e) and the iid rides along as the tag ----
      val tbs = (1 to nB).flatMap { b =>
        if (!dActive(b - 1)) Nil
        else {
          val fPre = pruneRead(factTable(b), touchedK(b - 1), s"k$b",
              fSchemaN(nB, numMeasures))
            .join(touchedK(b - 1).select(col("k").as(s"k$b")), Seq(s"k$b"),
              "left_semi")
          val ziSel =
            if (isInt(b)) zd(b - 1).select(col("k").as("_ik"),
              col("s").as("vf"), col("e").as("vu"), col("vs").as(s"g$b"),
              col("w"), col("iid").as(s"_tag$b"))
            else zi(b - 1).select(col("k").as("_ik"),
              col("vf"), col("vu"), col("vs").as(s"g$b"), col("w"))
          val tagCols = if (isInt(b)) Seq(col(s"_tag$b")) else Nil
          var cur = fPre.join(ziSel,
              col(s"k$b") === col("_ik") &&
                (col("vf").isNull || col("vf") <= col("t")) &&
                (col("vu").isNull || col("t") < col("vu")))
            .select((Seq("id", "t") ++ mCols ++ kCols).map(col) ++
              Seq(col("w"), col(s"g$b")) ++ tagCols: _*)
          for (j <- 1 until b) cur = resolveAny(cur, j, post = false)
          for (j <- b + 1 to nB) cur = resolveAny(cur, j, post = true)
          Seq(cur)
        }
      }

      // ---- finished delta -> aggregate + changelog rows ----
      val gOrder = (1 to nB).map(j => col(s"g$j"))
      // each term is a chain of up to B resolves (pruned read + join +
      // aggregate); with enriched tracking every term is consumed twice
      // (per-fact delta AND the aggregate), so cut the recompute here
      val rawTerms = (t0 ++ tbs).map(t =>
        if (trackEnriched) t.transform(graft.operators.Caching.persisted)
        else t)
      // ENRICHED-fact delta (trackEnriched): per touched fact, the term
      // rows' signed (id, tuple) Z-set integrates to the fact's POST
      // resolution — the net +1 tuple (term b's +row resolves j<b at
      // PRE, but when several branches move one fact in a batch, the
      // intermediate tuples cancel in the sum, leaving exactly old −1 /
      // final +1). Net>0 rows REPLACE the fact's enriched row; ids with
      // no surviving tuple (fact deletes) drop it.
      val rDelta =
        if (!trackEnriched) Nil
        else {
          // fan-out mode: the tuple key extends with the encoded window
          // tag vector (one iid per interval branch, branch order) — the
          // composite (id, g, tg) a set-valued enriched relation needs
          val intBs = intervalBranches.toSeq.sorted
          val tg: Column =
            if (intBs.isEmpty) lit(null).cast("string")
            else encodeG(intBs.map(b => col(s"_tag$b").cast("string")))
          val perFact = rawTerms.map(t =>
            t.select(Seq(col("id"), encodeG(gOrder).as("g"), tg.as("tg"),
              col("w")) ++ mCols.map(col): _*))
          if (perFact.isEmpty) Nil
          else Seq(perFact.reduce(_ unionByName _)
            .groupBy(Seq("id", "g", "tg") ++ mCols map (c => col(c)): _*)
            .agg(sum("w").as("w"))
            .filter(col("w") =!= 0))
        }
      val terms = rawTerms.map(t =>
        t.select(Seq(encodeG(gOrder).as("g"), col("w")) ++ mCols.map(col): _*))
      val finishedIn = {
        val u =
          if (terms.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              StructType(Seq(StructField("g", StringType),
                StructField("w", LongType)) ++
                mCols.map(c => StructField(c, LongType))))
          else terms.reduce(_ unionByName _)
        // consumed twice when extrema ride along (dAgg + the e-delta)
        if (trackExtrema) u.transform(graft.operators.Caching.persisted) else u
      }
      val mAggs = mCols.map(c => sum(col(c) * col("w")).as(s"d$c"))
      val finished = finishedIn
        .groupBy("g")
        .agg(mAggs.head, (mAggs.tail :+ sum(col("w")).as("dc")): _*)
        .filter((mCols.map(c => col(s"d$c") =!= 0) :+
          (col("dc") =!= 0)).reduce(_ || _))
        .transform(graft.operators.Caching.persisted)

      val nil = lit(null).cast("long")
      val nils = lit(null).cast("string")
      val nilKs = kCols.map(c => nil.as(c))
      val nilI = Seq(nil.as("iid"), nil.as("s"), nil.as("e"))
      val extraM = mCols.drop(1)
      val fDelta =
        if (!fActive) Nil
        else Seq(zf.select(Seq(lit("f").as("tbl"), col("id"), col("t"),
          col("m")) ++ extraM.map(col) ++ kCols.map(col) ++
          Seq(nil.as("k"), nil.as("vl"), nils.as("vs"), nils.as("g"),
            nil.as("c"), nil.as("b"), col("w")) ++ nilI: _*))
      val dDeltas = (1 to nB).flatMap { b =>
        if (zd(b - 1).isEmpty) Nil
        else if (isInt(b))
          Seq(zd(b - 1).select(Seq(lit(s"d$b").as("tbl"), nil.as("id"),
            nil.as("t"), nil.as("m")) ++ extraM.map(c => nil.as(c)) ++ nilKs ++
            Seq(col("k"), nil.as("vl"), col("vs"), nils.as("g"),
              nil.as("c"), nil.as("b"), col("w"),
              col("iid"), col("s"), col("e")): _*))
        else Seq(zd(b - 1).select(Seq(lit(s"d$b").as("tbl"), nil.as("id"),
          nil.as("t"), nil.as("m")) ++ extraM.map(c => nil.as(c)) ++ nilKs ++
          Seq(col("k"), col("vl"), col("vs"), nils.as("g"),
            nil.as("c"), nil.as("b"), col("w")) ++ nilI: _*))
      }
      // fact-grained extrema delta (R154's device on the as-of family):
      // the per-tuple term union projected to the (g, value)-multiset —
      // Δw per (g, m), the exact Z-set delta of IncrementalExtrema's
      // multiplicity relation, so min/max/order statistics stay exact
      // under retro-reassignments and version deletes
      val eDelta =
        if (!trackExtrema) Nil
        else Seq(finishedIn.groupBy("g", "m").agg(sum("w").as("dw"))
          .filter(col("dw") =!= 0)
          .select(Seq(lit("e").as("tbl"), nil.as("id"), nil.as("t"),
            col("m")) ++ extraM.map(c => nil.as(c)) ++ nilKs ++
            Seq(nil.as("k"), nil.as("vl"), nils.as("vs"), col("g"),
              nil.as("c"), nil.as("b"), col("dw").as("w")) ++ nilI: _*))
      val aDelta = finished.select(Seq(lit("a").as("tbl"), nil.as("id"),
        nil.as("t")) ++ mCols.map(c => col(s"d$c").as(c)) ++ nilKs ++
        Seq(nil.as("k"), nil.as("vl"), nils.as("vs"), col("g"),
          col("dc").as("c"), nil.as("b"), nil.as("w")) ++ nilI: _*)
      val cDelta = finished.select(Seq(lit("c").as("tbl"), nil.as("id"),
        nil.as("t")) ++ mCols.map(c => col(s"d$c").as(c)) ++ nilKs ++
        Seq(nil.as("k"), nil.as("vl"), nils.as("vs"), col("g"),
          col("dc").as("c"), lit(batchId).as("b"), nil.as("w")) ++ nilI: _*)
      // r rows ride the encoded window-tag vector in the `vs` slot (the
      // union table's kind-discriminated column reuse — `u` rows carry
      // dk in `m` the same way); null for the pure as-of mode
      val rRows = rDelta.map(r => r.select(Seq(lit("r").as("tbl"), col("id"),
        nil.as("t"), col("m")) ++ extraM.map(col) ++ nilKs ++
        Seq(nil.as("k"), nil.as("vl"), col("tg").as("vs"), col("g"),
          nil.as("c"), nil.as("b"), col("w")) ++ nilI: _*))
      (fDelta ++ dDeltas ++ Seq(aDelta, cDelta) ++ eDelta ++ rRows)
        .reduce(_ unionByName _)
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
        (if (present("f")) (1 to nB).map { b => () =>
          MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "f")
              .select((Seq("id", "t") ++ mCols ++ kCols :+ "w").map(col): _*),
            s"$path/${factTable(b)}", IncrementalJoinAggStar.mergeF, batchId,
            numBuckets, Seq(s"k$b"))
        } else Nil) ++
        (1 to nB).flatMap { b =>
          if (!present(s"d$b")) Nil
          else if (isInt(b))
            Seq(() => MvPipeline.upsertBucketedMerge(
              delta.filter(col("tbl") === s"d$b")
                .select("iid", "k", "s", "e", "vs", "w"),
              s"$path/d$b", IncrementalIntervalJoinAgg.mergeI, batchId,
              numBuckets, Seq("k")))
          else
            Seq(() => MvPipeline.upsertBucketedMerge(
              delta.filter(col("tbl") === s"d$b").select("k", "vl", "vs", "w"),
              s"$path/d$b", IncrementalJoinAggStar.mergeSigned, batchId,
              numBuckets, Seq("k")))
        } ++
        (if (present("a") || present("c"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl").isin("a", "c"))
              .select(Seq(col("tbl").as("kind"), col("g"), col("b"),
                col("m")) ++ mCols.drop(1).map(col) ++ Seq(col("c")): _*),
            s"$path/a", IncrementalJoinAggStar.mergeA, batchId, numBuckets,
            Seq("g")))
         else Nil) ++
        (if (present("e"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl") === "e")
              .select(col("g"), col("m").as("v"), col("w")),
            s"$path/e", IncrementalExtrema.mergeVw, batchId, numBuckets,
            Seq("g")))
         else Nil) ++
        (if (present("r")) {
          if (intervalBranches.isEmpty)
            Seq(() => MvPipeline.upsertBucketedMerge(
              delta.filter(col("tbl") === "r")
                .select(Seq(col("id"), col("g"), col("m")) ++
                  mCols.drop(1).map(col) ++ Seq(col("w")): _*),
              s"$path/r", mergeR, batchId, numBuckets, Seq("id")))
          else // fan-out: set-valued layout keyed (id, g, tg) — R175
            Seq(() => MvPipeline.upsertBucketedMerge(
              delta.filter(col("tbl") === "r")
                .select(Seq(col("id"), col("g"), col("vs").as("tg"),
                  col("m")) ++ mCols.drop(1).map(col) ++ Seq(col("w")): _*),
              s"$path/r", mergeRSet, batchId, numBuckets, Seq("id")))
        } else Nil))
      finally delta.unpersist()
      if (fs.exists(new Path(path)))
        fs.listStatus(new Path(path))
          .filter(s => s.getPath.getName.startsWith("_delta_"))
          .foreach(s => fs.delete(s.getPath, true))
    } finally graft.operators.Caching.releaseAll()
  }

  /** `(g1, .., gB, total[, total2..], rows)` == the batch chained ASOF
    * LEFT join-aggregate; `g_b` is NULL for facts before branch b's
    * first version. */
  def view(spark: SparkSession, stateDir: String, numBranches: Int,
      numMeasures: Int = 1, root: String = Root): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/$root/a",
      IncrementalJoinAggStar.aSchemaN(numMeasures))
    st.filter(col("kind") === "a" && col("c") > 0)
      .select(decodeG(numBranches) ++ Seq(col("m").as("total")) ++
        IncrementalJoinAggStar.extraTotals(st) ++
        Seq(col("c").as("rows")): _*)
  }

  /** [[view]] restricted to the named attribute tuples — the
    * bucket-pruned point read (family contract): only the `a/` buckets
    * the encoded groups hash into are opened. A `None` coordinate
    * names the branch's null (pre-first-version) group explicitly. */
  def viewFor(spark: SparkSession, stateDir: String,
      groups: Seq[Seq[Option[String]]], numBranches: Int,
      numBuckets: Int = 16, numMeasures: Int = 1,
      root: String = Root): DataFrame = {
    import spark.implicits._
    require(groups.forall(_.size == numBranches),
      "each group names every branch coordinate")
    MvPipeline.assertReadLayout(spark, s"$stateDir/$root/a", numBuckets, 1,
      "temporal-star viewFor")
    val gdf = groups.map(g => g.map(_.getOrElse(NUL)).mkString(SEP)).toDF("g")
    val ids = MvPipeline.bucketIdsOf(gdf, Seq("g"), numBuckets)
    val st = MvPipeline.readBuckets(spark, s"$stateDir/$root/a", ids,
      IncrementalJoinAggStar.aSchemaN(numMeasures))
    st.filter(col("kind") === "a" && col("c") > 0)
      .join(broadcast(gdf), Seq("g"), "left_semi")
      .select(decodeG(numBranches) ++ Seq(col("m").as("total")) ++
        IncrementalJoinAggStar.extraTotals(st) ++
        Seq(col("c").as("rows")): _*)
  }

  /** Z-set changelog; integral == view (per measure). */
  def changelog(spark: SparkSession, stateDir: String, numBranches: Int,
      numMeasures: Int = 1, root: String = Root): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/$root/a",
      IncrementalJoinAggStar.aSchemaN(numMeasures))
    val extra = st.columns.filter(_.matches("m\\d+")).toSeq
      .sortBy(_.drop(1).toInt)
      .map(c => col(c).as(s"dtotal${c.drop(1)}"))
    st.filter(col("kind") === "c")
      .select(Seq(col("b").as("batch")) ++ decodeG(numBranches) ++
        Seq(col("m").as("dtotal")) ++ extra ++ Seq(col("c").as("drows")): _*)
  }

  /** AS-OF read over MAINTENANCE time (the family contract). */
  def viewAsOf(spark: SparkSession, stateDir: String, batch: Long,
      numBranches: Int, numMeasures: Int = 1,
      root: String = Root): DataFrame = {
    val cl = changelog(spark, stateDir, numBranches, numMeasures, root)
      .filter(col("batch") <= batch)
    val gs = (1 to numBranches).map(b => s"g$b")
    val extra = cl.columns.filter(_.matches("dtotal\\d+")).toSeq
      .sortBy(_.drop(6).toInt)
      .map(c => sum(col(c)).as(s"total${c.drop(6)}"))
    cl.groupBy(gs.head, gs.tail: _*)
      .agg(sum(col("dtotal")).as("total"),
        extra :+ sum(col("drows")).as("rows"): _*)
      .filter(col("rows") > 0)
  }

  /** FORGET every fact and version of `keys` on `branch` (GDPR —
    * R160's one-CDC-batch device; no new machinery). Facts matching
    * the keys on that branch leave the view entirely; the OTHER
    * branches' versions for unrelated keys are untouched. */
  def forgetKeys(spark: SparkSession, branch: Int, keys: Seq[Long],
      stateDir: String, batchId: Long, numBranches: Int,
      numBuckets: Int = 16, numMeasures: Int = 1,
      trackExtrema: Boolean = false, trackEnriched: Boolean = false,
      root: String = Root, intervalBranches: Set[Int] = Set.empty): Unit = {
    import spark.implicits._
    val path = s"$stateDir/$root"
    val kdf = keys.toDF("k")
    val kc = s"k$branch"
    def prunedF: DataFrame =
      MvPipeline.readBuckets(spark,
          s"$path/${if (branch == 1) "f" else s"fm$branch"}",
          MvPipeline.bucketIdsOf(kdf.toDF(kc), Seq(kc), numBuckets),
          fSchemaN(numBranches, numMeasures))
        .join(broadcast(kdf.select(col("k").as(kc))), Seq(kc), "left_semi")
    val factDels = prunedF.select("id" +: kColsOf(numBranches) map col: _*)
    // an interval branch forgets its WINDOW rows (iid, k); a temporal
    // branch its version rows (k, vf) — same one-CDC-batch device
    val dimDels =
      if (intervalBranches.contains(branch))
        MvPipeline.readBuckets(spark, s"$path/d$branch",
            MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets),
            IncrementalIntervalJoinAgg.iSchema)
          .join(broadcast(kdf), Seq("k"), "left_semi")
          .select(col("iid"), col("k"))
      else MvPipeline.readBuckets(spark, s"$path/d$branch",
          MvPipeline.bucketIdsOf(kdf, Seq("k"), numBuckets),
          IncrementalJoinAggStar.dSchema)
        .join(broadcast(kdf), Seq("k"), "left_semi")
        .select(col("k"), col("vl").as("vf"))
    val noUp = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dUpSchema)
    val noUpI = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      IncrementalIntervalJoinAgg.iSchema)
    val noDel = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dDelSchema)
    val noDelI = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], iDelSchema)
    processBatch(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        fSchemaN(numBranches, numMeasures)),
      factDels,
      (1 to numBranches).map(b =>
        if (intervalBranches.contains(b)) noUpI else noUp),
      (1 to numBranches).map(b =>
        if (b == branch) dimDels
        else if (intervalBranches.contains(b)) noDelI else noDel),
      stateDir, batchId, numBuckets, numMeasures,
      // a store maintained with extrema/enriched tracking MUST forget
      // through the same flags, or the forgotten facts stay live in
      // e/ and r/ (the side tables only retract via their deltas)
      trackExtrema = trackExtrema, trackEnriched = trackEnriched,
      root = root, intervalBranches = intervalBranches)
  }

  /** REPLACE-per-fact merge for the enriched table: ids present in the
    * delta are replaced by their net-positive tuple (none survives a
    * fact delete — the id drops). */
  private[streaming] def mergeR(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("w")) old.drop("w") else old
    o.join(inc.select("id").distinct(), Seq("id"), "left_anti")
      .unionByName(inc.filter(col("w") > 0).drop("w"))
  }

  /** SET-VALUED enriched merge (R175, fan-out mode): Z-weight addition
    * keyed (id, g, tg) with zero purge — the delta is a PARTIAL diff
    * (a deleted window retracts only its own rows; the fact's other
    * window rows never appear), so per-key replacement would be wrong;
    * the weight integral is. Live combinations integrate to w = 1. */
  private[streaming] def mergeRSet(old: DataFrame, inc: DataFrame): DataFrame = {
    val ms = inc.columns.filter(c => c == "m" || c.matches("m\\d+")).toSeq
    val o = old.columns.foldLeft(old)((d, c) => d.withColumnRenamed(c, s"o_$c"))
    o.join(inc, col("o_id") === col("id") && col("o_g") <=> col("g") &&
        col("o_tg") <=> col("tg"), "full_outer")
      .select(Seq(coalesce(col("o_id"), col("id")).as("id"),
        coalesce(col("o_g"), col("g")).as("g"),
        coalesce(col("o_tg"), col("tg")).as("tg")) ++
        ms.map(c => coalesce(col(s"o_$c"), col(c)).as(c)) ++
        Seq((coalesce(col("o_w"), lit(0L)) +
          coalesce(col("w"), lit(0L))).as("w")): _*)
      .filter(col("w") =!= 0)
  }

  /** The maintained ENRICHED FACT TABLE (requires `trackEnriched`) —
    * each live fact with its B as-of-resolved attributes DENORMALIZED
    * onto it, kept correct as versions arrive late, replace, and
    * delete: the reference's log2-style materialization that
    * ClickHouse cannot update in place (consumers re-join instead).
    * REPLACE-per-id semantics — feeds [[graft.sinks.ChangelogShip
    * .shipVersioned]] with `keyCols = Seq("id")` for an external
    * ReplacingMergeTree-style enriched table. */
  def enrichedView(spark: SparkSession, stateDir: String, numBranches: Int,
      numMeasures: Int = 1, root: String = Root): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/$root/r",
      StructType(Seq(StructField("id", LongType),
        StructField("g", StringType)) ++
        mColsOf(numMeasures).map(c => StructField(c, LongType))))
    st.select(Seq(col("id")) ++ decodeG(numBranches) ++
      Seq(col("m")) ++ st.columns.filter(_.matches("m\\d+")).toSeq
        .sortBy(_.drop(1).toInt).map(col): _*)
  }

  /** The maintained SET-VALUED enriched relation under interval
    * FAN-OUT (R175; requires `trackEnriched` with `intervalBranches`):
    * one row per live (fact × covering-window combination) — the fact
    * id, its B resolved attributes, and one `win<b>` column per
    * interval branch naming the matched window, kept exact as versions
    * move, windows replace/delete, and facts delete. REPLACE-per-key
    * composable on (id, win<b>..) — the composite key the fan-out
    * demands where the as-of-only relation uses the id alone. */
  def enrichedFanoutView(spark: SparkSession, stateDir: String,
      numBranches: Int, intervalBranches: Set[Int],
      numMeasures: Int = 1, root: String = Root): DataFrame = {
    require(intervalBranches.nonEmpty,
      "use enrichedView for the pure as-of (no fan-out) relation")
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/$root/r",
      StructType(Seq(StructField("id", LongType),
        StructField("g", StringType), StructField("tg", StringType)) ++
        mColsOf(numMeasures).map(c => StructField(c, LongType)) :+
        StructField("w", LongType)))
    val intBs = intervalBranches.toSeq.sorted
    val winCols = intBs.zipWithIndex.map { case (b, i) =>
      element_at(split(col("tg"), SEP, -1), i + 1).cast("long").as(s"win$b")
    }
    st.filter(col("w") > 0)
      .select(Seq(col("id")) ++ decodeG(numBranches) ++ winCols ++
        Seq(col("m")) ++ st.columns.filter(_.matches("m\\d+")).toSeq
          .sortBy(_.drop(1).toInt).map(col): _*)
  }

  /** The BATCH twin of [[enrichedFanoutView]] — each fact joined to
    * every covering window of every interval branch (tags ride as
    * `_tag<b>`) with the as-of branches resolved; the x133 reference
    * plan and the bootstrap source for fan-out `trackEnriched`. */
  def enrichedFanoutBatch(facts: DataFrame, dims: Seq[DataFrame],
      intervalBranches: Set[Int]): DataFrame = {
    require(intervalBranches.nonEmpty, "use enrichedBatch without fan-out")
    resolvedFacts(facts, dims, intervalBranches)
  }

  /** Fact-grained EXTREMA over the maintained as-of join (requires
    * `trackExtrema`): per attribute tuple `(g1.., n, min_v, max_v)` of
    * the resolved fact measures — exact under retro-reassignments and
    * version deletes (the R154 contract on the as-of family). */
  def extremaView(spark: SparkSession, stateDir: String,
      numBranches: Int, root: String = Root): DataFrame =
    IncrementalExtrema.extremaOf(extremaRelation(spark, stateDir, root))
      .select(decodeG(numBranches) ++
        Seq(col("n"), col("min_v"), col("max_v")): _*)

  /** Exact low-quantiles of the resolved fact measures per attribute
    * tuple ([[IncrementalExtrema.quantiles]] integer-rational ranks). */
  def extremaQuantiles(spark: SparkSession, stateDir: String,
      numBranches: Int, qs: Seq[(Long, Long)],
      root: String = Root): DataFrame = {
    val q = IncrementalExtrema.quantilesOf(
      extremaRelation(spark, stateDir, root), qs)
    q.select(decodeG(numBranches) ++
      q.columns.filterNot(_ == "g").map(col): _*)
  }

  private def extremaRelation(spark: SparkSession, stateDir: String,
      root: String = Root): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/$root/e",
      IncrementalExtrema.vwSchema)

  /** WATERMARK-EXACT state compaction — R160's bounded-state contract
    * applied per branch: under the watermark contract that every
    * FUTURE fact time and version valid-from (on EVERY branch) is
    * `>= horizon`, facts with `t < horizon` leave `f/` AND every
    * mirror (their contributions are materialized; no in-contract
    * version arrival on any branch can re-capture them), and each
    * branch's pre-horizon versions collapse per key to the single
    * prevailing one rewritten to `vf = horizon − 1` (one tick below
    * the bound, so a real at-horizon version never collides with it
    * and an in-contract delete of that version falls back to the
    * floor exactly — R160's rule). View untouched; retained state
    * bounded by the horizon window on every table. Out-of-contract
    * late arrivals diverge exactly as R160 documents, per branch. */
  def compactState(spark: SparkSession, stateDir: String, horizon: Long,
      numBranches: Int, root: String = Root,
      intervalBranches: Set[Int] = Set.empty,
      maxWindowSpanUs: Option[Long] = None)
      : IncrementalIntervalJoinAgg.PinReport = {
    val path = s"$stateDir/$root"
    def fTable(b: Int) = s"$path/${if (b == 1) "f" else s"fm$b"}"
    // the declared window-span contract (r13 ops guard, the interval
    // engine's rule): a pinned fact older than horizon − span can only
    // be covered by an OUT-OF-CONTRACT window — its pin is provably
    // expired and the fact drops (reported, with violators sampled)
    val expiredFloor = maxWindowSpanUs.map(span => horizon - span)
    // 1. the PIN set first, from the still-OPEN (e > horizon) windows
    //    of every interval branch: a pre-horizon fact one of them
    //    covers can still have its matches retracted in-contract
    //    (deleting/replacing that open window), so it must stay
    //    resolvable on EVERY branch (R165's fact rule, lifted to the
    //    star). Computed and FORCED before any table is transformed —
    //    the frames' lineage reads the pre-sweep dirs.
    val pinned0: Option[DataFrame] =
      if (intervalBranches.isEmpty) None
      else Some(intervalBranches.toSeq.sorted.map { b =>
        val open = MvPipeline.readBucketedStateOrEmpty(spark, s"$path/d$b",
            IncrementalIntervalJoinAgg.iSchema)
          .filter(col("e") > horizon)
          .select(col("k").as("_ok"), col("s").as("_os"), col("e").as("_oe"))
        // fallback schema only matters for an empty dir; id/t/k_b exist
        // at every numMeasures
        MvPipeline.readBucketedStateOrEmpty(spark, fTable(b),
            fSchemaN(numBranches, 1))
          .select(col("id"), col("t"), col(s"k$b"))
          .filter(col("t") < horizon)
          .join(open, col(s"k$b") === col("_ok") &&
            col("_os") <= col("t") && col("t") < col("_oe"), "left_semi")
          .select("id", "t")
      }.reduce(_ unionByName _).distinct()
        .transform(graft.operators.Caching.persisted))
    val droppedExpired: Long = (pinned0, expiredFloor) match {
      case (Some(p), Some(fl)) => p.filter(col("t") < fl).count()
      case _ => 0L
    }
    val pinned: Option[DataFrame] = (pinned0, expiredFloor) match {
      case (Some(p), Some(fl)) => Some(p.filter(col("t") >= fl)
        .transform(graft.operators.Caching.persisted))
      case _ => pinned0
    }
    try {
      // 2. window sweep per interval branch: CLOSED windows (e <=
      //    horizon) leave UNLESS they cover a pinned fact on this
      //    branch — a later in-contract retraction (an open window
      //    deleted on a SIBLING interval branch, or a temporal
      //    version moved) re-resolves the pinned facts on every
      //    branch, and an interval resolve that silently misses a
      //    dropped closed cover would never generate the tuples it
      //    must retract (the two-interval-branch divergence the r12
      //    review caught). A retained closed window pins nothing
      //    itself (pinning needs an OPEN window), so it leaves at the
      //    first compaction after its pinning sibling closes.
      intervalBranches.toSeq.sorted.foreach { b =>
        val pf = pinned.map { p =>
          val f = MvPipeline.readBucketedStateOrEmpty(spark, fTable(b),
              fSchemaN(numBranches, 1))
            .join(p.select("id"), Seq("id"), "left_semi")
            .select(col(s"k$b").as("_pk"), col("t").as("_pt"))
            .distinct()
            .transform(graft.operators.Caching.persisted)
          f.count() // force before the dir is rewritten underneath
          f
        }
        MvPipeline.transformBuckets(spark, s"$path/d$b", old =>
          pf match {
            case None => old.filter(col("e") > horizon)
            case Some(p) => old.filter(col("e") > horizon)
              .unionByName(old.filter(col("e") <= horizon)
                .join(p, old("k") === col("_pk") &&
                  old("s") <= col("_pt") && col("_pt") < old("e"),
                  "left_semi"))
          })
      }
      // 3. a pinned pre-horizon fact must still resolve EXACTLY on the
      //    temporal branches when its window retracts, so the temporal
      //    floor moves down to the oldest pinned fact: versions with
      //    vl >= hEff keep exactly; below, the per-key prevailing one
      //    is rewritten to hEff − 1 (covers every retained fact — all
      //    have t >= hEff — with the same prevailing attribute)
      val hEff: Long =
        pinned.map { p =>
          val r = p.agg(min("t")).collect()(0) // 1-row stat (allowed)
          if (r.isNullAt(0)) horizon else math.min(horizon, r.getLong(0))
        }.getOrElse(horizon)
      (1 to numBranches).foreach { b =>
        MvPipeline.transformBuckets(spark, fTable(b), old =>
          pinned match {
            case None => old.filter(col("t") >= horizon)
            case Some(p) => old.filter(col("t") >= horizon)
              .unionByName(old.filter(col("t") < horizon)
                .join(p.select("id"), Seq("id"), "left_semi"))
          })
        if (!intervalBranches.contains(b))
          MvPipeline.transformBuckets(spark, s"$path/d$b", old => {
            val w = Window.partitionBy("k").orderBy(col("vl").desc)
            // floor one tick BELOW the horizon (R160's rule): never
            // collides with a real at-horizon version, and an
            // in-contract delete of that version falls back to the
            // floor exactly
            val floor = old.filter(col("vl") < hEff)
              .withColumn("rn", row_number().over(w))
              .filter(col("rn") === 1)
              .select(col("k"), lit(hEff - 1).as("vl"), col("vs"))
            old.filter(col("vl") >= hEff).unionByName(floor)
          })
      }
      // ---- ops-guard report (r13): pins, oldest pinned time, pinning
      //      window sample, contract outcome — the interval engine's
      //      PinReport shape, from the POST-sweep state (retained
      //      pre-horizon facts ARE the pin set) ----
      val fFinal = MvPipeline.readBucketedStateOrEmpty(spark, fTable(1),
          fSchemaN(numBranches, 1))
        .filter(col("t") < horizon)
        .select(Seq(col("id"), col("t")) ++
          intervalBranches.toSeq.sorted.map(b => col(s"k$b")): _*)
        .transform(graft.operators.Caching.persisted)
      val stats = fFinal.agg(count(lit(1)).as("n"), min(col("t")).as("t0"))
        .collect()(0) // 1-row stat (allowed)
      val openB = intervalBranches.toSeq.sorted.map { b =>
        b -> MvPipeline.readBucketedStateOrEmpty(spark, s"$path/d$b",
            IncrementalIntervalJoinAgg.iSchema)
          .filter(col("e") > horizon)
          .transform(graft.operators.Caching.persisted)
      }
      val pinWins =
        if (openB.isEmpty) None
        else Some(openB.map { case (b, o) =>
          fFinal.select(col("t"), col(s"k$b").as("k"))
            .join(o.select(col("iid").as("oid"), col("k").as("ok"),
              col("s").as("os"), col("e").as("oe")),
              col("k") === col("ok") && col("os") <= col("t") &&
                col("t") < col("oe"))
            .select("oid")
        }.reduce(_ unionByName _).distinct()
          .transform(graft.operators.Caching.persisted))
      val pinCount = pinWins.map(_.count()).getOrElse(0L)
      val pinSample = pinWins.map(_.orderBy("oid").limit(20)
        .collect().map(_.getLong(0)).toSeq).getOrElse(Seq.empty[Long])
      val (oocCount, oocSample) = maxWindowSpanUs.map { span =>
        if (openB.isEmpty) (0L, Seq.empty[Long])
        else {
          val ooc = openB.map(_._2).map(o =>
              o.filter(col("e") - col("s") > span).select("iid"))
            .reduce(_ unionByName _).distinct()
            .transform(graft.operators.Caching.persisted)
          (ooc.count(), ooc.orderBy("iid").limit(20)
            .collect().map(_.getLong(0)).toSeq)
        }
      }.getOrElse((0L, Seq.empty[Long]))
      IncrementalIntervalJoinAgg.PinReport(stats.getLong(0),
        if (stats.isNullAt(1)) None else Some(stats.getLong(1)),
        pinCount, pinSample, droppedExpired, oocCount, oocSample)
    } finally graft.operators.Caching.releaseAll()
  }

  /** RESHARD the whole state dir to `newBuckets` — the write-side
    * bucket-size knob ([[MvPipeline.reshardBucketed]] per table, fact
    * mirrors re-keyed by their own branch key). Offline op between
    * committed batches into a FRESH `dstDir`; resume folding with
    * `numBuckets = newBuckets` and batch ids above the last committed. */
  def reshard(spark: SparkSession, srcDir: String, dstDir: String,
      numBranches: Int, newBuckets: Int, root: String = Root): Unit = {
    val src = s"$srcDir/$root"
    val dst = s"$dstDir/$root"
    (1 to numBranches).foreach { b =>
      MvPipeline.reshardBucketed(spark,
        s"$src/${if (b == 1) "f" else s"fm$b"}",
        s"$dst/${if (b == 1) "f" else s"fm$b"}", newBuckets, Seq(s"k$b"))
      MvPipeline.reshardBucketed(spark, s"$src/d$b", s"$dst/d$b",
        newBuckets, Seq("k"))
    }
    MvPipeline.reshardBucketed(spark, s"$src/a", s"$dst/a", newBuckets, Seq("g"))
    MvPipeline.reshardBucketed(spark, s"$src/e", s"$dst/e", newBuckets, Seq("g"))
    MvPipeline.reshardBucketed(spark, s"$src/r", s"$dst/r", newBuckets, Seq("id"))
    // replay safety: the destination carries no per-bucket stamps, so it
    // refuses batch ids at or below the last one committed here
    MvPipeline.writeResumeFloor(spark, dst,
      math.max(MvPipeline.maxBatchIn(spark, s"$src/a"),
        MvPipeline.maxStampUnder(spark, src)))
  }

  /** Changelog compaction (family contract, data-driven measures). */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long,
      root: String = Root): Unit =
    MvPipeline.compactChangelogA(spark, s"$stateDir/$root/a", upTo)

  /** BOOTSTRAP from batch tables — B window passes (one per branch,
    * each the R160 one-shuffle resolution), which is also the batch
    * twin's plan ([[asOfAggregateStar]]). */
  def bootstrap(facts: DataFrame, dims: Seq[DataFrame], stateDir: String,
      baselineBatch: Long = 0L, numBuckets: Int = 16,
      numMeasures: Int = 1, trackExtrema: Boolean = false,
      trackEnriched: Boolean = false, root: String = Root,
      intervalBranches: Set[Int] = Set.empty,
      maxWindowSpanUs: Option[Long] = None): Unit = {
    val nB = dims.size
    val spark = facts.sparkSession
    val mCols = mColsOf(numMeasures)
    val kCols = kColsOf(nB)
    val path = s"$stateDir/$root"
    // bootstrap is an ingest path too (R180): a bootstrapped
    // out-of-contract window would outlive every later declared fold
    maxWindowSpanUs.foreach(span => intervalBranches.toSeq.sorted.foreach(b =>
      IncrementalIntervalJoinAgg.enforceSpanContract(dims(b - 1), span,
        s"mixed-star interval branch $b bootstrap of $path")))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(path)),
      s"bootstrap requires a fresh state dir, found $path")
    val fIn = facts.select(Seq(col("id").cast("long").as("id"),
        col("t").cast("long").as("t")) ++
        mCols.map(c => col(c).cast("long").as(c)) ++
        kCols.map(c => col(c).cast("long").as(c)): _*)
      .groupBy("id")
      .agg(min(struct(("t" +: mCols) ++ kCols map col: _*)).as("s"))
      .select(col("id") +: (("t" +: mCols) ++ kCols).map(c =>
        col(s"s.$c").as(c)): _*)
      .transform(graft.operators.Caching.persisted)
    val dIns = dims.zipWithIndex.map { case (d, i) =>
      if (intervalBranches.contains(i + 1))
        d.select(col("iid").cast("long").as("iid"),
            col("k").cast("long").as("k"), col("s").cast("long").as("s"),
            col("e").cast("long").as("e"), col("vs").cast("string").as("vs"))
          .groupBy("iid")
          .agg(min(struct(col("k"), col("s"), col("e"), col("vs"))).as("x"))
          .select(col("iid"), col("x.k").as("k"), col("x.s").as("s"),
            col("x.e").as("e"), col("x.vs").as("vs"))
          .transform(graft.operators.Caching.persisted)
      else d.select(col("k").cast("long").as("k"),
          col("vf").cast("long").as("vf"), col("vs").cast("string").as("vs"))
        .groupBy("k", "vf").agg(max("vs").as("vs"))
        .transform(graft.operators.Caching.persisted)
    }
    try {
      // independent dirs from persisted inputs: one concurrent wave
      // (the equality star's bootstrap fan-out, same argument)
      MvPipeline.applyConcurrently((1 to nB).flatMap { b =>
        Seq({ () =>
          MvPipeline.upsertBucketedMerge(fIn,
            s"$path/${if (b == 1) "f" else s"fm$b"}",
            (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets,
            Seq(s"k$b"))
        }: () => Unit, { () =>
          MvPipeline.upsertBucketedMerge(
            if (intervalBranches.contains(b)) dIns(b - 1)
            else dIns(b - 1).select(col("k"), col("vf").as("vl"), col("vs")),
            s"$path/d$b", (old, inc) => old.unionByName(inc).distinct(), -1L,
            numBuckets, Seq("k"))
        }: () => Unit)
      })
      val agg = asOfAggregateStar(fIn, dIns, numMeasures, intervalBranches)
        .transform(graft.operators.Caching.persisted)
      val gEnc = encodeG((1 to nB).map(b => col(s"g$b")))
      val tCols = "total" +: (2 to numMeasures).map(i => s"total$i")
      def aggRows(kind: String, b: Column) = agg.select(
        Seq(lit(kind).as("kind"), gEnc.as("g"), b.as("b")) ++
          tCols.zip(mCols).map { case (t, m) => col(t).as(m) } ++
          Seq(col("rows").as("c")): _*)
      MvPipeline.upsertBucketedMerge(
        aggRows("a", lit(null).cast("long"))
          .unionByName(aggRows("c", lit(baselineBatch))),
        s"$path/a", IncrementalJoinAggStar.mergeA, -1L, numBuckets, Seq("g"))
      lazy val resolved = resolvedFacts(fIn, dIns.zipWithIndex.map {
          case (d, i) =>
            if (intervalBranches.contains(i + 1)) d
            else d.select(col("k"), col("vf"), col("vs"))
        }, intervalBranches)
        .transform(graft.operators.Caching.persisted)
      if (trackExtrema)
        MvPipeline.upsertBucketedMerge(
          resolved
            .groupBy(encodeG((1 to nB).map(b => col(s"g$b"))).as("g"),
              col("m").as("v"))
            .agg(count(lit(1)).as("w")),
          s"$path/e", IncrementalExtrema.mergeVw, -1L, numBuckets, Seq("g"))
      if (trackEnriched) {
        if (intervalBranches.isEmpty)
          MvPipeline.upsertBucketedMerge(
            resolved.select(Seq(col("id"),
              encodeG((1 to nB).map(b => col(s"g$b"))).as("g")) ++
              mCols.map(col) :+ lit(1L).as("w"): _*),
            s"$path/r", mergeR, -1L, numBuckets, Seq("id"))
        else // fan-out: set-valued layout, one row per (fact, windows)
          MvPipeline.upsertBucketedMerge(
            resolved.select(Seq(col("id"),
              encodeG((1 to nB).map(b => col(s"g$b"))).as("g"),
              encodeG(intervalBranches.toSeq.sorted.map(b =>
                col(s"_tag$b").cast("string"))).as("tg")) ++
              mCols.map(col) :+ lit(1L).as("w"): _*),
            s"$path/r", mergeRSet, -1L, numBuckets, Seq("id"))
      }
    } finally graft.operators.Caching.releaseAll()
  }

  /** The BATCH chained-ASOF aggregate `(g1..gB, total[..], rows)` —
    * the plan the maintained view must equal: per branch ONE shuffle
    * by that branch's key + ONE event-time sort carrying the
    * prevailing version onto each fact (R160's window device), then
    * one aggregate over the resolved attributes. Used by [[bootstrap]]
    * and as the x126 reference plan. */
  def asOfAggregateStar(facts: DataFrame, dims: Seq[DataFrame],
      numMeasures: Int = 1,
      intervalBranches: Set[Int] = Set.empty): DataFrame = {
    val nB = dims.size
    val mCols = mColsOf(numMeasures)
    val gs = (1 to nB).map(b => s"g$b")
    val tAggs = mCols.zipWithIndex.map { case (c, i) =>
      sum(col(c)).as(if (i == 0) "total" else s"total${i + 1}") }
    resolvedFacts(facts, dims, intervalBranches)
      .groupBy(gs.head, gs.tail: _*)
      .agg(tAggs.head, (tAggs.tail :+ count(lit(1)).as("rows")): _*)
  }

  /** The BATCH enriched-fact relation — each fact with its B
    * as-of-resolved attributes `g1..gB` appended (the x127 reference
    * plan, and the bootstrap source for `trackEnriched`). */
  def enrichedBatch(facts: DataFrame, dims: Seq[DataFrame]): DataFrame =
    resolvedFacts(facts, dims, Set.empty)

  /** Each fact with its B resolved attributes `g1..gB` appended. A
    * temporal branch is one window pass (≤1 row per fact, null before
    * the first version); an interval branch (R167) is an equi-keyed
    * range join — ≥0 rows per fact, so the per-branch frames multiply
    * through the id-join into the tuple fan-out, and uncovered facts
    * drop (INNER). */
  private def resolvedFacts(facts: DataFrame, dims: Seq[DataFrame],
      intervalBranches: Set[Int]): DataFrame = {
    val nB = dims.size
    val resolved = (1 to nB).map { b =>
      if (intervalBranches.contains(b))
        facts.select(col("id"), col(s"k$b").as("_fk"), col("t"))
          .join(dims(b - 1).select(col("k").as("_wk"), col("s"), col("e"),
            col("vs"), col("iid")),
            col("_fk") === col("_wk") && col("s") <= col("t") &&
              col("t") < col("e"))
          .select(col("id"), col("vs").as(s"g$b"), col("iid").as(s"_tag$b"))
      else {
        val f = facts.select(col(s"k$b").as("k"), col("t").as("us"),
          lit(1).as("isFact"), col("id"), lit(null).cast("string").as("v"))
        val d = dims(b - 1).select(col("k"), col("vf").as("us"),
          lit(0).as("isFact"), lit(null).cast("long").as("id"),
          col("vs").as("v"))
        val w = Window.partitionBy("k").orderBy("us", "isFact")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        f.unionByName(d)
          .withColumn(s"g$b", last(col("v"), ignoreNulls = true).over(w))
          .filter(col("isFact") === 1)
          .select(col("id"), col(s"g$b"))
      }
    }
    resolved.foldLeft(facts)((acc, r) => acc.join(r, Seq("id")))
  }

  /** Continuous maintenance over a mixed CDC stream: `kind` ∈
    * fact | fact_del | d{b} | d{b}_del. Single writer per state dir. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String, numBranches: Int,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      numMeasures: Int = 1, numBuckets: Int = 16,
      trackExtrema: Boolean = false, trackEnriched: Boolean = false,
      intervalBranches: Set[Int] = Set.empty)
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
          (1 to numBranches).map(b => batch.filter(col("kind") === s"d$b")),
          (1 to numBranches).map(b => batch.filter(col("kind") === s"d${b}_del")),
          stateDir, batchId, numBuckets = numBuckets,
          numMeasures = numMeasures, trackExtrema = trackExtrema,
          trackEnriched = trackEnriched,
          intervalBranches = intervalBranches)
      }
      .start()
}
