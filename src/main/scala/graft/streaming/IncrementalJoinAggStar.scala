package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** STAR / DAG-shaped incrementally-maintained join-aggregate
  * (SURVEY.md §2.11 R150) — the shape [[IncrementalJoinAggN]] cannot
  * express: a fact joined to SEVERAL independent dimension BRANCHES,
  * each branch a chain of levels, with CROSS-BRANCH equality
  * constraints and literal filters over the attributes the branches
  * resolve. The in-repo witness is TPC-H Q5 (q5_region_revenue,
  * queries/RelQueries.scala; the reference consumes exactly such
  * multi-dimension reads over its summary tables,
  * `/root/reference/README.md:24-189`):
  *
  *   SELECT n_name, sum(revenue_cents), count(*)
  *   FROM lineitem                                      -- fact: k1 = l_orderkey, k2 = l_suppkey
  *   JOIN orders   ON l_orderkey  = o_orderkey          -- branch 1 level 1 (link o_custkey)
  *   JOIN customer ON o_custkey   = c_custkey           -- branch 1 level 2 (link + attr c_nationkey)
  *   JOIN nation   ON c_nationkey = n_nationkey         -- branch 1 level 3 (link n_regionkey, attr n_name)
  *   JOIN region   ON n_regionkey = r_regionkey         -- branch 1 level 4 (attr r_name)
  *   JOIN supplier ON l_suppkey   = s_suppkey           -- branch 2 level 1 (attr s_nationkey)
  *    AND s_nationkey = c_nationkey                     -- eqAttrs: (1,2) == (2,1)
  *   WHERE r_name = 'ASIA'                              -- litAttrs: (1,4) == "ASIA"
  *   GROUP BY n_name                                    -- groupAttrs: (1,3)
  *
  * Uniform level representation: every level row is `(k, vl, vs)` —
  * `vl` links to the branch's next level (null at the leaf), `vs` is
  * an optional STRING attribute contributed to the resolved tuple (a
  * level may carry both, e.g. customer's nationkey as link AND as the
  * comparand of the cross-branch equality). Constraints and grouping
  * are declarative over `(branch, level)` attribute positions, so the
  * filter/project is LINEAR and commutes with the Z-set sum — applying
  * it to every delta term is exact.
  *
  * Maintenance is the family's telescoped multilinear Δ-rule with the
  * inputs totally ordered F < branch 1 levels < … < branch B levels:
  * one Δ-term per input; inputs BEFORE the changed one at PRE-state,
  * inputs AFTER at POST-state (every pairwise overlap counted exactly
  * once; weights multiply, all Z-set). The term for ΔD at branch b
  * level i BACKWARD-restricts through branch b's value-bucketed level
  * mirrors down to the facts' k_b — served by a PER-BRANCH fact mirror
  * `fm{b}` (facts re-bucketed by each branch key; the index economics a
  * ClickHouse projection buys: B copies of the slim fact rows in
  * exchange for bucket-pruned entry from ANY branch) — then resolves
  * branch b below i at pre-state via the restricted link rows, the
  * signed Δ at i, branch b above i at post-state, branches < b entirely
  * at PRE-state and branches > b entirely at POST-state. Every state
  * read is bucket-pruned ([[MvPipeline.readBuckets]]); per-batch cost
  * is O(affected subtree × total levels), never O(state).
  *
  * State under `stateDir/joinaggstar/` — all fed from ONE staged delta
  * (the standard crash-safe protocol: stamped buckets skip on replay,
  * the rest converge):
  *   - `f/` retained facts `(id, m, k1..kB)` bucketed by k1; `fm{b}/`
  *     (b ≥ 2) the same rows bucketed by k{b};
  *   - `d{b}_{i}/` level rows `(k, vl, vs)` bucketed by k; `d{b}_{i}m/`
  *     the same rows bucketed by vl for i < depth (the backward walk's
  *     probe, signed maintenance moves rows across buckets);
  *   - `a/` kind-discriminated aggregate + signed changelog bucketed by
  *     g (`a` additive, `c` append-only; integral of `c` IS `a`).
  *
  * Contracts (the [[IncrementalJoinAggN]] ones, extended): fact ids
  * arrive once and pin ALL their branch keys; deletes name
  * `(id, k1..kB)` (CDC deletes carry their keys); delete-wins within a
  * batch; within-batch dedup keeps min-(k1..kB, m) facts and
  * max-(vl, vs) dim rows (struct comparison, nulls smallest). Group
  * attributes should be non-null (a multi-attribute group key is a
  * `\u0001`-joined concat, which skips nulls); equality constraints use
  * SQL `=` semantics — a null attribute fails the constraint and the
  * row drops, exactly as the batch join would.
  *
  * LEFT-JOIN branches (R156): a branch listed in `leftBranches` joins
  * LEFT at every level — a fact whose pointer is null or misses the
  * level's table resolves that level's attribute (and every level
  * above it) as NULL instead of dropping, exactly the SQL
  * `fact LEFT JOIN d1 LEFT JOIN d2 ...` chain. Bilinearity is restored
  * by maintaining the COMPLETED relation D-hat = D + {(k, null, null) :
  * k not in keys(D)}: a LEFT walk step IS the inner join against D-hat
  * restricted to the pointers present (pad nulls on miss), and the
  * Z-set delta of a level upsert gains one VIRTUAL -(k, null, null)
  * row per NEWLY-PRESENT key (the padded row it displaces) — re-keys
  * change no presence and ship no virtual row. Virtual rows feed the
  * delta TERMS only, never the stored level tables (state holds real
  * rows; completion is a read-time fiction). Corollaries under keyed
  * dims (at most 1 live row per key): SEMI join-aggregate == the inner
  * engine (no fan-out to de-duplicate), ANTI join-aggregate == the
  * left view's null-attributed group. With any left branch, a
  * multi-attribute group key switches to a null-preserving encoding
  * (each attr coalesced to a NUL sentinel before the concat); a
  * single-attribute group key serves SQL-style NULL `g` rows directly.
  * Constraint filters keep SQL `=` semantics: a null (padded)
  * comparand fails the constraint, as `WHERE` over a left join
  * would.
  *
  * MULTI-ROW levels (R159): a position in `multiRows` is a SET of
  * rows per key — a genuine 1-to-many / m:n join where a fact joining
  * two level rows contributes TWO resolved tuples (SQL join fan-out;
  * the aggregate counts tuples). Input contract flips from
  * latest-wins-per-key to set semantics: upsert rows are exact ADDS
  * (adding a present row no-ops), `dimDels` rows name the EXACT
  * (k, vl, vs) row to remove (removing an absent row no-ops;
  * delete-wins at row granularity) — so overlapping / replayed CDC
  * converges. The telescoped rule never assumed keyed levels; the
  * walks fan out naturally and the mirrors already hold row sets, so
  * the only changes are the Z-set construction (state-diffed adds and
  * removes) and row-granular post-state frames. On a LEFT branch,
  * presence is row-count >= 1: the virtual padded row is displaced
  * exactly when a key's count crosses 0 upward and restored when it
  * crosses to 0 — fan-out changes between positive counts ship no
  * virtual rows. */
object IncrementalJoinAggStar {

  /** Declarative view shape. `branchDepths(b-1)` = levels in branch b;
    * positions are 1-based `(branch, level)`. */
  final case class StarSpec(
      branchDepths: Seq[Int],
      groupAttrs: Seq[(Int, Int)],
      eqAttrs: Seq[((Int, Int), (Int, Int))] = Nil,
      litAttrs: Seq[((Int, Int), String)] = Nil,
      trackExtrema: Boolean = false,
      leftBranches: Set[Int] = Set.empty,
      trackDistinct: Option[String] = None,
      multiRows: Set[(Int, Int)] = Set.empty,
      numMeasures: Int = 1,
      valueSubBuckets: Int = 1) {
    require(branchDepths.nonEmpty && branchDepths.forall(_ >= 1),
      "every branch needs depth >= 1")
    require(groupAttrs.nonEmpty, "at least one group attribute")
    require(numMeasures >= 1, "numMeasures >= 1")
    // R173: `valueSubBuckets = S > 1` sub-buckets the VALUE-MULTIPLICITY
    // side relations (`e/` extrema, `u/` distinct) by (g, xxhash64(v)%S)
    // so ONE dominant group (a LEFT view's null group, a giant segment)
    // cannot concentrate its whole value multiset in one bucket — the
    // per-bucket bound under skew drops ~S× (expectation-level: two of
    // the S sub-keys may collide in one physical bucket, ≈S²/2B
    // chance, leaving a small multiple of |group|/S — never |group|),
    // at the cost of ≤S bucket
    // opens on a point read (merge-at-read; the aggregate/changelog
    // tables are immune — 1 row per group — and stay plain g-keyed). A
    // store-layout constant like numBuckets: fixed for the store's life.
    require(valueSubBuckets >= 1, "valueSubBuckets >= 1")
    /** Internal measure column names: `m` plus `m2..mM` (R161 —
      * multi-measure views, the reference's several-summed-columns
      * SummingMergeTree shape, e.g. stats2's blocked+visited). Every
      * measure sums independently under the SAME Z-set weights; the
      * tracked extrema relation follows the FIRST measure. */
    def mCols: Seq[String] = "m" +: (2 to numMeasures).map(i => s"m$i")
    val B: Int = branchDepths.size
    require(leftBranches.forall(b => b >= 1 && b <= B),
      "leftBranches outside the branch shape")
    require(trackDistinct.forall(c =>
      c == "m" || (1 to B).exists(b => c == s"k$b")),
      "trackDistinct names a fact column: m or k1..kB")
    multiRows.foreach { case (b, i) =>
      require(b >= 1 && b <= B && i >= 1 && i <= branchDepths(b - 1),
        s"multiRows position ($b,$i) outside the branch shape") }
    def positions: Seq[(Int, Int)] =
      (1 to B).flatMap(b => (1 to branchDepths(b - 1)).map(i => (b, i)))
    (groupAttrs ++ eqAttrs.flatMap(p => Seq(p._1, p._2)) ++ litAttrs.map(_._1))
      .foreach { case (b, i) =>
        require(b >= 1 && b <= B && i >= 1 && i <= branchDepths(b - 1),
          s"attribute position ($b,$i) outside the branch shape") }
  }

  private[streaming] val dSchema = StructType(Seq(
    StructField("k", LongType), StructField("vl", LongType),
    StructField("vs", StringType)))
  private[streaming] val aSchema = StructType(Seq(
    StructField("kind", StringType), StructField("g", StringType),
    StructField("b", LongType), StructField("m", LongType),
    StructField("c", LongType)))
  /** [[aSchema]] with the extra measure columns — the EMPTY-state
    * fallback for multi-measure views (a dims-only first batch writes
    * no `a/` files, so the reader must still resolve `m2..mM`).
    * Shared with the temporal family (same `a/` layout). */
  private[streaming] def aSchemaN(nM: Int): StructType = StructType(
    Seq(StructField("kind", StringType), StructField("g", StringType),
      StructField("b", LongType), StructField("m", LongType)) ++
      (2 to nM).map(i => StructField(s"m$i", LongType)) :+
      StructField("c", LongType))
  private def fSchema(nB: Int, nM: Int = 1): StructType = StructType(
    Seq(StructField("id", LongType)) ++
      ("m" +: (2 to nM).map(i => s"m$i")).map(c => StructField(c, LongType)) ++
      (1 to nB).map(b => StructField(s"k$b", LongType)))

  private def attrCol(p: (Int, Int)): Column = col(s"a_${p._1}_${p._2}")

  /** Constraint filter + group projection — applied identically to every
    * delta term (linear, so it commutes with the Z-set sum). */
  private def finish(spec: StarSpec, df: DataFrame): DataFrame = {
    var out = df
    spec.eqAttrs.foreach { case (x, y) => out = out.filter(attrCol(x) === attrCol(y)) }
    spec.litAttrs.foreach { case (x, v) => out = out.filter(attrCol(x) === lit(v)) }
    val g =
      if (spec.groupAttrs.size == 1) attrCol(spec.groupAttrs.head)
      else if (spec.leftBranches.isEmpty)
        concat_ws("\u0001", spec.groupAttrs.map(attrCol): _*)
      else
        // null-preserving: concat_ws SKIPS nulls, which would alias
        // ("A", null) with (null, "A") with ("A") -- under left branches
        // padded nulls are first-class group values, so coalesce each
        // attr to a NUL sentinel no real attribute carries
        concat_ws("\u0001",
          spec.groupAttrs.map(p => coalesce(attrCol(p), lit("\u0000"))): _*)
    out.select(Seq(g.as("g")) ++ spec.mCols.map(col) ++ Seq(col("w")) ++
      (if (spec.trackDistinct.isDefined) Seq(col("dk")) else Nil): _*)
  }

  /** Copy the tracked-distinct fact column to `dk` BEFORE the branch
    * walks consume the key columns (joinLevel reuses k_b as the moving
    * pointer, so the original value is gone after level 1). */
  private def withDk(spec: StarSpec, df: DataFrame): DataFrame =
    spec.trackDistinct.map(c => df.withColumn("dk", col(c))).getOrElse(df)

  /** Join `cur` to level (b, i)'s frame `fr` (`(k, vl, vs)`, plus `w`
    * when signed): advance branch b's pointer to `vl`, emit the level's
    * attribute, multiply weights when signed. */
  private def joinLevel(cur: DataFrame, b: Int, i: Int, fr0: DataFrame,
      signed: Boolean, left: Boolean = false): DataFrame = {
    require(!(signed && left),
      "signed joins run against the explicit completed Z-set, never LEFT")
    val kcol = s"k$b"
    // join by NAME (usingColumns), never by dataset refs — a term's walk
    // frame and its earlier backward-restrict can share lineage (both
    // derive from the same Δ frame), which dataset-qualified refs would
    // flag as an ambiguous self-join
    val fr = (if (signed) fr0.withColumnRenamed("w", "wz") else fr0)
      .withColumnRenamed("k", kcol)
      .withColumnRenamed("vl", "_vl")
      .withColumnRenamed("vs", "_vs")
    // LEFT = the inner join against the COMPLETED relation restricted to
    // the pointers present: unmatched (or null-pointer) rows continue
    // with null _vl/_vs — the padded row of the D-hat fiction
    val joined = cur.join(fr, Seq(kcol), if (left) "left" else "inner")
    val keep = cur.columns.filterNot(n => n == kcol || n == "w").map(col)
    joined.select(keep ++ Seq(
      col("_vl").as(kcol), col("_vs").as(s"a_${b}_$i"),
      (if (signed) col("w") * col("wz") else col("w")).as("w")): _*)
  }

  /** Fold one micro-batch. `dims(b-1)(i-1)` is branch b level i's upsert
    * frame; `dimCols(b-1)(i-1) = (keyCol, linkCol, attrCol)` with "" for
    * an absent link (leaf) / absent attribute. The SPEC is the view's
    * standing parameter and must not change across batches.
    *
    * `dimDels` (R157 — full CDC on every input): per-level DELETE
    * frames carrying the level's key column (same `keyCol` as the
    * upsert frame; other columns ignored). Deleting a present key
    * removes the level row — dependent facts DROP under an inner
    * branch (they dangle) and MOVE to the null-padded group under a
    * left one (the completed relation's virtual +(k, null, null));
    * deleting an absent key is a no-op. DELETE-WINS within a batch: a
    * key in both frames is deleted and its upsert discarded (a re-key
    * is a plain upsert — never delete+insert in one batch). A deleted
    * key may re-arrive in a later batch as a normal upsert. */
  def processBatch(spec: StarSpec,
      facts: DataFrame, factKs: Seq[String], factId: String, factM: String,
      factDels: DataFrame, delKs: Seq[String], delId: String,
      dims: Seq[Seq[DataFrame]], dimCols: Seq[Seq[(String, String, String)]],
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16,
      dimDels: Seq[Seq[DataFrame]] = null,
      factMs: Seq[String] = null,
      factChunks: Int = 1): Unit = {
    val nB = spec.B
    // R161 multi-measure: `factMs` names every measure source column
    // (defaults to the single `factM`)
    val mSrcs = if (factMs != null) factMs else Seq(factM)
    require(mSrcs.size == spec.numMeasures,
      s"factMs must name ${spec.numMeasures} measure columns")
    require(factKs.size == nB && delKs.size == nB, "one fact key per branch")
    require(dims.size == nB && dimCols.size == nB &&
      dims.zip(spec.branchDepths).forall { case (d, n) => d.size == n } &&
      dimCols.zip(spec.branchDepths).forall { case (d, n) => d.size == n },
      "one (frame, columns) pair per branch level")
    val spark = facts.sparkSession
    val path = s"$stateDir/joinaggstar"
    MvPipeline.assertAboveResumeFloor(spark, path, batchId)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    // SMALL-TABLE fast path: bucket pruning exists to avoid reading BIG
    // state, and its probe (bucketIdsOf) is a Spark job over the
    // caller's key frame — which in the walk terms is a large joined
    // intermediate. Pruning a nation/region-sized table with a job over
    // half the fact state is backwards: when the table's on-disk bytes
    // are under the threshold, read it whole (the joins restrict; extra
    // rows never change results) and skip the probe job entirely.
    // Real dimension tables at 100 TB exceed the threshold and keep the
    // pruned path; the decision costs one metadata listing per table
    // per fold (memoized).
    val smallTableBytes = 16L << 20
    val sizeMemo = scala.collection.mutable.Map.empty[String, Boolean]
    def isSmall(table: String): Boolean = sizeMemo.getOrElseUpdate(table, {
      val base = new Path(s"$path/$table")
      if (!fs.exists(base)) true
      else {
        val buckets = fs.listStatus(base).filter(s =>
          s.isDirectory && s.getPath.getName.startsWith("bucket="))
        var sum = 0L
        var i = 0
        while (i < buckets.length && sum < smallTableBytes) {
          sum += fs.listStatus(buckets(i).getPath).map(_.getLen).sum
          i += 1
        }
        sum < smallTableBytes
      }
    })
    def pruneRead(table: String, keys: DataFrame, keyCols: Seq[String],
        schema: StructType): DataFrame =
      if (isSmall(table))
        MvPipeline.readBucketedStateOrEmpty(spark, s"$path/$table", schema)
      else MvPipeline.readBuckets(spark, s"$path/$table",
        MvPipeline.bucketIdsOf(keys, keyCols, numBuckets), schema)

    def computeDelta(): DataFrame = {
      val kCols = (1 to nB).map(b => s"k$b")
      val emptyD = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dSchema)
      val emptyF = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fSchema(nB, spec.numMeasures))
      // EMPTY-INPUT GATING — the common streaming batch touches a few
      // inputs, not all of them: levels with no upserts get a canonical
      // empty frame (no normalize job, no pruned read) and, below,
      // contribute NO delta term and NO applied table — per-batch cost
      // scales with the inputs the batch actually carries, not with the
      // view's total shape
      val fActive = !facts.isEmpty || !factDels.isEmpty
      val delsIn: Seq[Seq[DataFrame]] =
        if (dimDels == null) dims.map(_.map(_ => emptyD))
        else {
          require(dimDels.size == nB &&
            dimDels.zip(spec.branchDepths).forall { case (d, n) => d.size == n },
            "one delete frame per branch level")
          dimDels
        }
      val active: Seq[Seq[Boolean]] = (1 to nB).map { b =>
        (1 to spec.branchDepths(b - 1)).map { i =>
          !dims(b - 1)(i - 1).isEmpty || !delsIn(b - 1)(i - 1).isEmpty
        }
      }
      // normalized deletes per level (delete-wins: upserts of a deleted
      // key/row are discarded below). Keyed levels delete by KEY; multi
      // levels (set semantics) delete the EXACT (k, vl, vs) row.
      val dDelN: Seq[Seq[DataFrame]] = (1 to nB).map { b =>
        (1 to spec.branchDepths(b - 1)).map { i =>
          val f = delsIn(b - 1)(i - 1)
          val multi = spec.multiRows((b, i))
          if (f.isEmpty) { if (multi) emptyD else emptyD.select("k") }
          else {
            val (kc, lc, ac) = dimCols(b - 1)(i - 1)
            if (multi)
              f.select(col(kc).cast("long").as("k"),
                  (if (lc.nonEmpty) col(lc).cast("long") else lit(null).cast("long")).as("vl"),
                  (if (ac.nonEmpty) col(ac).cast("string") else lit(null).cast("string")).as("vs"))
                .distinct()
                .transform(graft.operators.Caching.persisted)
            else
              f.select(col(kc).cast("long").as("k")).distinct()
                .transform(graft.operators.Caching.persisted)
          }
        }
      }

      val fIn =
        if (!facts.isEmpty)
          facts.select(Seq(col(factId).cast("long").as("id")) ++
              mSrcs.zip(spec.mCols).map { case (src, c) => col(src).cast("long").as(c) } ++
              factKs.zipWithIndex.map { case (c, b) => col(c).cast("long").as(s"k${b + 1}") }: _*)
            .groupBy("id")
            .agg(min(struct((kCols ++ spec.mCols).map(col): _*)).as("s"))
            .select(col("id") +: (kCols ++ spec.mCols).map(c => col(s"s.$c").as(c)): _*)
            .transform(graft.operators.Caching.persisted)
        else emptyF
      val delIn =
        if (!factDels.isEmpty)
          factDels.select(col(delId).cast("long").as("id") +:
              delKs.zipWithIndex.map { case (c, b) => col(c).cast("long").as(s"k${b + 1}") }: _*)
            .distinct()
            .transform(graft.operators.Caching.persisted)
        else emptyF.drop("m")
      // normalize every level to (k, vl, vs). Keyed levels:
      // deterministic latest-wins within the batch (max over the
      // (vl, vs) struct, nulls smallest). Multi levels (R159, set
      // semantics): every distinct row is an ADD — no latest-wins —
      // and delete-wins applies at ROW granularity.
      val dIns: Seq[Seq[DataFrame]] = (1 to nB).map { b =>
        (1 to spec.branchDepths(b - 1)).map { i =>
          if (dims(b - 1)(i - 1).isEmpty) emptyD
          else {
            val (kc, lc, ac) = dimCols(b - 1)(i - 1)
            val rows = dims(b - 1)(i - 1).select(col(kc).cast("long").as("k"),
              (if (lc.nonEmpty) col(lc).cast("long") else lit(null).cast("long")).as("vl"),
              (if (ac.nonEmpty) col(ac).cast("string") else lit(null).cast("string")).as("vs"))
            if (spec.multiRows((b, i))) {
              val dd = dDelN(b - 1)(i - 1)
              val cond = Seq("k", "vl", "vs").map(c => rows(c) <=> dd(c)).reduce(_ && _)
              rows.distinct()
                .join(dd, cond, "left_anti")
                .transform(graft.operators.Caching.persisted)
            } else
              rows
                .groupBy("k").agg(max(struct(col("vl"), col("vs"))).as("s"))
                .select(col("k"), col("s.vl").as("vl"), col("s.vs").as("vs"))
                // delete-wins: a key deleted in this batch keeps no upsert
                .join(dDelN(b - 1)(i - 1), Seq("k"), "left_anti")
                .transform(graft.operators.Caching.persisted)
          }
        }
      }

      // ΔF (signed) against the pre-state facts, pruned by k1
      val zf =
        if (fActive) {
          val fKeys = fIn.select("k1").unionByName(delIn.select("k1"))
          val f0 = pruneRead("f", fKeys, Seq("k1"), fSchema(nB, spec.numMeasures))
            .transform(graft.operators.Caching.persisted)
          val newF = fIn.join(f0.select("id"), Seq("id"), "left_anti")
            .join(delIn.select("id"), Seq("id"), "left_anti")
          val delF = f0.join(delIn.select("id"), Seq("id"), "left_semi")
          newF.select((col("id") +: kCols.map(col)) ++
              spec.mCols.map(col) ++ Seq(lit(1L).as("w")): _*)
            .unionByName(delF.select((col("id") +: kCols.map(col)) ++
              spec.mCols.map(col) ++ Seq(lit(-1L).as("w")): _*))
            .transform(graft.operators.Caching.persisted)
        } else emptyF.withColumn("w", lit(1L))
          .select((col("id") +: kCols.map(col)) ++ spec.mCols.map(col) ++
            Seq(col("w")): _*)

      // per level: pre-state rows for the upserted keys + the signed
      // Z-set. zdsAll holds (real, virtual): real rows feed both the
      // delta terms and the stored tables; virtual rows — the completed
      // relation's -(k, null, null) per NEWLY-PRESENT key of a LEFT
      // branch (the padded row the arrival displaces) — feed the delta
      // TERMS only, never state (completion is a read-time fiction, so
      // there is nothing on disk to retract). Re-keys (had_old) change
      // no presence and ship no virtual row, and every new key also
      // ships a real +1 row, so real-emptiness gates both.
      val zdsAll = (1 to nB).map { b =>
        (1 to spec.branchDepths(b - 1)).map { i =>
          val emptyZ = emptyD.withColumn("w", lit(1L))
          if (!active(b - 1)(i - 1)) (emptyZ, emptyZ)
          else if (spec.multiRows((b, i))) {
            // SET semantics (R159): the Z-set is +rows NOT already in
            // state and -rows PRESENT in state — an add of a present
            // row / a remove of an absent row is a no-op, so replaying
            // overlapping CDC converges
            val adds0 = dIns(b - 1)(i - 1)
            val rems0 = dDelN(b - 1)(i - 1)
            val touched = adds0.select("k").unionByName(rems0.select("k")).distinct()
            val d0 = pruneRead(s"d${b}_$i", touched, Seq("k"), dSchema)
              .transform(graft.operators.Caching.persisted)
            val o = d0.select(col("k").as("k0"), col("vl").as("vl0"),
              col("vs").as("vs0"))
            def rowEq(f: DataFrame) =
              f("k") <=> col("k0") && f("vl") <=> col("vl0") && f("vs") <=> col("vs0")
            val adds = adds0.join(o, rowEq(adds0), "left_anti")
              .transform(graft.operators.Caching.persisted)
            val rems = rems0.join(o, rowEq(rems0), "left_semi")
              .transform(graft.operators.Caching.persisted)
            val real = adds.select(col("k"), col("vl"), col("vs"), lit(1L).as("w"))
              .unionByName(rems.select(col("k"), col("vl"), col("vs"),
                lit(-1L).as("w")))
              .transform(graft.operators.Caching.persisted)
            // LEFT + multi: presence = row-count >= 1. The padded row is
            // displaced when a key's count crosses 0 -> +, restored when
            // it crosses -> 0 (never on mere fan-out changes)
            val virt =
              if (!spec.leftBranches(b)) emptyZ
              else {
                val oldC = d0.join(touched, Seq("k"), "left_semi")
                  .groupBy("k").agg(count(lit(1)).as("oc"))
                val addC = adds.groupBy("k").agg(count(lit(1)).as("ac"))
                val remC = rems.groupBy("k").agg(count(lit(1)).as("rc"))
                val counts = touched.join(oldC, Seq("k"), "left")
                  .join(addC, Seq("k"), "left").join(remC, Seq("k"), "left")
                  .select(col("k"), coalesce(col("oc"), lit(0L)).as("oc"),
                    (coalesce(col("oc"), lit(0L)) + coalesce(col("ac"), lit(0L)) -
                      coalesce(col("rc"), lit(0L))).as("nc"))
                counts.filter(col("oc") === 0L && col("nc") > 0L)
                  .select(col("k"), lit(null).cast("long").as("vl"),
                    lit(null).cast("string").as("vs"), lit(-1L).as("w"))
                  .unionByName(counts.filter(col("oc") > 0L && col("nc") === 0L)
                    .select(col("k"), lit(null).cast("long").as("vl"),
                      lit(null).cast("string").as("vs"), lit(1L).as("w")))
                  .transform(graft.operators.Caching.persisted)
              }
            (real, virt)
          }
          else {
            val touched = dIns(b - 1)(i - 1).select("k")
              .unionByName(dDelN(b - 1)(i - 1)).distinct()
            val d0 = pruneRead(s"d${b}_$i", touched, Seq("k"), dSchema)
              .transform(graft.operators.Caching.persisted)
            val up = dIns(b - 1)(i - 1)
              .join(d0.select(col("k"), col("vl").as("vl_old"),
                col("vs").as("vs_old")).withColumn("had_old", lit(true)), Seq("k"), "left")
              .withColumn("had_old", coalesce(col("had_old"), lit(false)))
              .filter(!col("had_old") ||
                !(col("vl") <=> col("vl_old")) || !(col("vs") <=> col("vs_old")))
              .transform(graft.operators.Caching.persisted)
            // a delete of a PRESENT key retracts the stored row; absent
            // keys no-op (nothing to retract, no presence change)
            val delRows = d0.join(dDelN(b - 1)(i - 1), Seq("k"), "left_semi")
              .transform(graft.operators.Caching.persisted)
            val real = up.select(col("k"), col("vl"), col("vs"), lit(1L).as("w"))
              .unionByName(up.filter(col("had_old"))
                .select(col("k"), col("vl_old").as("vl"), col("vs_old").as("vs"),
                  lit(-1L).as("w")))
              .unionByName(delRows.select(col("k"), col("vl"), col("vs"),
                lit(-1L).as("w")))
              .transform(graft.operators.Caching.persisted)
            val virt =
              if (!spec.leftBranches(b)) emptyZ
              else up.filter(!col("had_old"))
                .select(col("k"), lit(null).cast("long").as("vl"),
                  lit(null).cast("string").as("vs"), lit(-1L).as("w"))
                // presence LOST: the padded row comes back
                .unionByName(delRows.select(col("k"),
                  lit(null).cast("long").as("vl"),
                  lit(null).cast("string").as("vs"), lit(1L).as("w")))
                .transform(graft.operators.Caching.persisted)
            (real, virt)
          }
        }
      }
      val zds = zdsAll.map(_.map(_._1))
      // a level whose upserts were all no-ops contributes nothing either
      val termActive = (1 to nB).map { b =>
        (1 to spec.branchDepths(b - 1)).map { i =>
          active(b - 1)(i - 1) && !zds(b - 1)(i - 1).isEmpty
        }
      }
      val zfActive = fActive && !zf.isEmpty

      def preFrame(b: Int, i: Int, keys: DataFrame): DataFrame =
        pruneRead(s"d${b}_$i", keys, Seq("k"), dSchema)
      def postFrame(b: Int, i: Int, keys: DataFrame): DataFrame =
        if (!active(b - 1)(i - 1)) preFrame(b, i, keys)
        else if (spec.multiRows((b, i))) {
          // row-level: post = pre minus removed ROWS plus added rows.
          // dIns still carries adds of ALREADY-PRESENT rows (the no-ops
          // are diffed out only inside the Z-set construction), so the
          // union MUST dedupe — a duplicated row here would double every
          // walk tuple through it (the b5 double-retraction the
          // LEFT+multi random spec caught). Rows are sets; distinct is
          // the exact post state.
          val pre = preFrame(b, i, keys)
          val dd = dDelN(b - 1)(i - 1).select(col("k").as("k0"),
            col("vl").as("vl0"), col("vs").as("vs0"))
          pre.join(dd, pre("k") <=> col("k0") && pre("vl") <=> col("vl0") &&
              pre("vs") <=> col("vs0"), "left_anti")
            .unionByName(dIns(b - 1)(i - 1))
            .distinct()
        }
        else preFrame(b, i, keys)
          .join(dIns(b - 1)(i - 1).select("k")
            .unionByName(dDelN(b - 1)(i - 1)), Seq("k"), "left_anti")
          .unionByName(dIns(b - 1)(i - 1))

      /** Resolve branch b over `cur` from level `from` upward, pruning
        * each level's read by the live pointer keys. */
      def walkBranch(cur0: DataFrame, b: Int, from: Int,
          frameFor: (Int, DataFrame) => DataFrame): DataFrame = {
        val left = spec.leftBranches(b)
        var cur = cur0
        for (i <- from to spec.branchDepths(b - 1)) {
          // inner branch: null-pointer rows can never resolve — drop
          // them now; LEFT branch: they ride through with null padding
          // (the completed relation). Bucket probes always use the
          // non-null pointers only.
          val c = (if (left) cur else cur.filter(col(s"k$b").isNotNull))
            .transform(graft.operators.Caching.persisted)
          val probe = c.filter(col(s"k$b").isNotNull).select(col(s"k$b").as("k"))
          cur = joinLevel(c, b, i, frameFor(i, probe), signed = false,
            left = left)
        }
        cur
      }

      // T0: ΔF through every branch at POST-state (built only when the
      // batch carries fact changes — walk construction itself runs the
      // eager bucket-probe jobs)
      def t0(): DataFrame = (1 to nB).foldLeft(withDk(spec, zf.drop("id"))) { (cur, b) =>
        walkBranch(cur, b, 1, (i, keys) => postFrame(b, i, keys))
      }

      // T(b,i) per level: backward restrict at pre-state within branch b,
      // signed join at (b,i), post-state above it; branches < b at PRE,
      // branches > b at POST (the fixed telescoping order). Inactive
      // levels (no upserts, or all no-ops) contribute no term at all.
      // `chunkOf` restricts each term's PRE-STATE fact side (the
      // mega-wave chunking device below); identity = the whole subtree.
      def termsFor(chunkOf: DataFrame => DataFrame): Seq[DataFrame] =
        (1 to nB).flatMap { b =>
        (1 to spec.branchDepths(b - 1)).filter(i => termActive(b - 1)(i - 1)).map { i =>
          // backward: which pre-state branch-b rows reach ΔD(b,i)'s keys
          var need = zds(b - 1)(i - 1).select(col("k").as("v")).distinct()
          val links = new Array[DataFrame](i - 1)
          for (j <- (i - 1) to 1 by -1) {
            val lj = pruneRead(s"d${b}_${j}m",
              need.select(col("v").as("vl")), Seq("vl"), dSchema)
            val restricted = lj.join(need, lj("vl") === need("v"), "left_semi")
              .transform(graft.operators.Caching.persisted)
            links(j - 1) = restricted
            need = restricted.select(col("k").as("v")).distinct()
          }
          // pre-state facts reaching the lowest needed keys, via the
          // branch's fact (mirror) table
          val fTable = if (b == 1) "f" else s"fm$b"
          val fPart = chunkOf(
            if (i == 1) pruneRead(fTable,
              zds(b - 1)(0).select(col("k").as(s"k$b")), Seq(s"k$b"), fSchema(nB, spec.numMeasures))
            else pruneRead(fTable,
                need.select(col("v").as(s"k$b")), Seq(s"k$b"), fSchema(nB, spec.numMeasures))
              .join(need, col(s"k$b") === col("v"), "left_semi"))
          var cur = withDk(spec, fPart).select(
            (1 to nB).map(b2 => col(s"k$b2")) ++
            spec.mCols.map(col) ++ Seq(lit(1L).as("w")) ++
            (if (spec.trackDistinct.isDefined) Seq(col("dk")) else Nil): _*)
          // branch b at PRE-state below i (the restricted link rows)
          for (j <- 1 until i) cur = joinLevel(cur, b, j, links(j - 1), signed = false)
          // the signed join at (b, i) — weights multiply; for a LEFT
          // branch the Z-set is the COMPLETED relation's delta: real
          // +new/-old rows plus the virtual -(k, null, null) per newly
          // present key (so the join stays inner — the padding the
          // arrival displaces is retracted explicitly)
          val dz =
            if (spec.leftBranches(b))
              zds(b - 1)(i - 1).unionByName(zdsAll(b - 1)(i - 1)._2)
            else zds(b - 1)(i - 1)
          cur = joinLevel(cur, b, i, dz, signed = true)
          // branch b at POST-state above i
          cur = walkBranch(cur, b, i + 1, (i2, keys) => postFrame(b, i2, keys))
          // other branches: < b entirely PRE, > b entirely POST
          for (b2 <- 1 to nB if b2 != b)
            cur = walkBranch(cur, b2, 1, (i2, keys) =>
              if (b2 < b) preFrame(b2, i2, keys) else postFrame(b2, i2, keys))
          cur
        }
      }

      val finishedSchema = StructType(Seq(StructField("g", StringType)) ++
        spec.mCols.map(c => StructField(c, LongType)) ++
        Seq(StructField("w", LongType)) ++
        (if (spec.trackDistinct.isDefined)
          Seq(StructField("dk", LongType)) else Nil))
      val emptyFinished = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], finishedSchema)
      // the FINISHED delta relation (g, m, w) — shared by the summed
      // aggregate delta and (when tracked) the fact-grained extrema delta.
      // MEGA-WAVE chunking (r12 stretch): a dim flip admitting a large
      // slice of the corpus makes the delta terms' fact side O(affected
      // subtree) — honest work, but materializing it as ONE job is a
      // memory/shuffle cliff at 100×. With `factChunks = C > 1` the
      // PRE-STATE fact side of every term is partitioned by
      // xxhash64(id) % C (facts partition disjointly; the terms are
      // LINEAR in the fact relation, so per-chunk terms sum to the full
      // delta), each chunk's finished relation is pre-aggregated to the
      // (g, measures[, dk]) multiplicity rows and materialized as its
      // own bounded job under `<staged>.parts/`, and the one staged
      // delta is then assembled from the parts — so the apply, replay,
      // changelog (ONE `c` row per (g, batch)), and external-ship
      // contracts are byte-identical to the unchunked fold. Peak
      // shuffle per job is the chunk's subtree, not the wave's. T0
      // (the batch's OWN facts) rides chunk 0 — it is batch-bounded
      // already. Crash mid-parts recomputes them (the staged-delta
      // rename stays the atomic commit point).
      val finished =
        if (factChunks <= 1) {
          val activeTerms = (if (zfActive) Seq(t0()) else Nil) ++ termsFor(identity)
          if (activeTerms.isEmpty) emptyFinished
          else activeTerms.map(t => finish(spec, t)).reduce(_ unionByName _)
            .transform(graft.operators.Caching.persisted)
        } else {
          val partsDir = new Path(s"$path/$stagedName.parts")
          fs.delete(partsDir, true)
          val grpCols = Seq("g") ++ spec.mCols ++
            (if (spec.trackDistinct.isDefined) Seq("dk") else Nil)
          var wrote = false
          (0 until factChunks).foreach { c =>
            // chunk-scoped cache release: the walk intermediates of
            // chunk c drop before chunk c+1 materializes — otherwise
            // the per-chunk caches would accumulate back to the
            // unchunked working set; shared pre-chunk frames stay
            graft.operators.Caching.scoped {
              val chunkTerms = termsFor(f =>
                f.filter(pmod(xxhash64(col("id")), lit(factChunks.toLong)) === c))
              val activeC = (if (zfActive && c == 0) Seq(t0()) else Nil) ++ chunkTerms
              if (activeC.nonEmpty) {
                activeC.map(t => finish(spec, t)).reduce(_ unionByName _)
                  .groupBy(grpCols.map(col): _*).agg(sum("w").as("w"))
                  .filter(col("w") =!= 0)
                  .select(finishedSchema.fieldNames.map(col): _*)
                  .write.parquet(s"$partsDir/part=$c")
                wrote = true
              }
            }
          }
          if (!wrote) emptyFinished
          else spark.read.schema(finishedSchema).parquet(partsDir.toString)
            .transform(graft.operators.Caching.persisted)
        }
      val mAggs = spec.mCols.map(c => sum(col(c) * col("w")).as(s"d$c"))
      val dAgg = finished
        .groupBy("g")
        .agg(mAggs.head, (mAggs.tail :+ sum(col("w")).as("dc")): _*)
        .filter((spec.mCols.map(c => col(s"d$c") =!= 0) :+
          (col("dc") =!= 0)).reduce(_ || _))

      val nil = lit(null).cast("long")
      val nils = lit(null).cast("string")
      val nilKs = kCols.map(c => nil.as(c))
      val extraM = spec.mCols.drop(1)
      val fDelta = zf.select(Seq(lit("f").as("tbl"), col("id"), col("m")) ++
        extraM.map(col) ++
        kCols.map(col) ++ Seq(nil.as("k"), nil.as("vl"), nils.as("vs"),
          nils.as("g"), nil.as("c"), nil.as("b"), col("w")): _*)
      val dDeltas = (1 to nB).flatMap { b =>
        (1 to spec.branchDepths(b - 1)).filter(i => termActive(b - 1)(i - 1)).map { i =>
          zds(b - 1)(i - 1).select(Seq(lit(s"d${b}_$i").as("tbl"), nil.as("id"),
            nil.as("m")) ++ extraM.map(c => nil.as(c)) ++ nilKs ++
            Seq(col("k"), col("vl"), col("vs"),
              nils.as("g"), nil.as("c"), nil.as("b"), col("w")): _*)
        }
      }
      val aDelta = dAgg.select(Seq(lit("a").as("tbl"), nil.as("id")) ++
        spec.mCols.map(c => col(s"d$c").as(c)) ++ nilKs ++
        Seq(nil.as("k"), nil.as("vl"),
          nils.as("vs"), col("g"), col("dc").as("c"), nil.as("b"), nil.as("w")): _*)
      val cDelta = dAgg.select(Seq(lit("c").as("tbl"), nil.as("id")) ++
        spec.mCols.map(c => col(s"d$c").as(c)) ++ nilKs ++
        Seq(nil.as("k"), nil.as("vl"),
          nils.as("vs"), col("g"), col("dc").as("c"), lit(batchId).as("b"),
          nil.as("w")): _*)
      // fact-grained extrema delta: the SAME finished relation projected
      // to the (g, value)-multiset — Δw per (g, m), the exact Z-set
      // delta of IncrementalExtrema's multiplicity relation (value rides
      // the `m` column)
      val eDelta =
        if (!spec.trackExtrema) Nil
        else Seq(finished.groupBy("g", "m").agg(sum("w").as("dw"))
          .filter(col("dw") =!= 0)
          .select(Seq(lit("e").as("tbl"), nil.as("id"), col("m")) ++
            extraM.map(c => nil.as(c)) ++ nilKs ++
            Seq(nil.as("k"), nil.as("vl"), nils.as("vs"), col("g"),
              nil.as("c"), nil.as("b"), col("dw").as("w")): _*))
      // distinct-key delta: the finished relation projected to the
      // (g, dk)-multiset — the Z-set delta of the COUNT(DISTINCT dk)
      // multiplicity relation (dk rides the `m` column, like `e`)
      val uDelta =
        if (spec.trackDistinct.isEmpty) Nil
        else Seq(finished.groupBy("g", "dk").agg(sum("w").as("dw"))
          .filter(col("dw") =!= 0)
          .select(Seq(lit("u").as("tbl"), nil.as("id"), col("dk").as("m")) ++
            extraM.map(c => nil.as(c)) ++
            nilKs ++ Seq(nil.as("k"), nil.as("vl"), nils.as("vs"), col("g"),
              nil.as("c"), nil.as("b"), col("dw").as("w")): _*))
      (Seq(fDelta) ++ dDeltas ++ Seq(aDelta, cDelta) ++ eDelta ++ uDelta)
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
      val kCols = (1 to nB).map(b => s"k$b")
      // apply only the tables the staged delta actually carries (the
      // empty-input gating above omits untouched levels' rows, and the
      // discriminator set is deterministic per staged delta, so replay
      // applies the same table subset)
      val present = delta.select("tbl").distinct()
        .collect().map(_.getString(0)).toSet
      // independent marker-guarded tables — applied CONCURRENTLY (the
      // staged protocol never relies on table order)
      try MvPipeline.applyConcurrently(
        (if (present("f")) (1 to nB).map { b => () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "f")
            .select(((Seq("id") ++ spec.mCols) ++ kCols :+ "w").map(col): _*),
          s"$path/${if (b == 1) "f" else s"fm$b"}", mergeF, batchId,
          numBuckets, Seq(s"k$b")) } else Nil) ++
        (1 to nB).flatMap { b =>
          (1 to spec.branchDepths(b - 1)).flatMap { i =>
            if (!present(s"d${b}_$i")) Nil
            else {
              val rows = delta.filter(col("tbl") === s"d${b}_$i")
                .select("k", "vl", "vs", "w")
              Seq(() => MvPipeline.upsertBucketedMerge(rows, s"$path/d${b}_$i",
                mergeSigned, batchId, numBuckets, Seq("k"))) ++
              (if (i < spec.branchDepths(b - 1))
                Seq(() => MvPipeline.upsertBucketedMerge(rows, s"$path/d${b}_${i}m",
                  mergeSigned, batchId, numBuckets, Seq("vl")))
               else Nil)
            }
          }
        } ++
        (if (present("a") || present("c"))
          Seq(() => MvPipeline.upsertBucketedMerge(
            delta.filter(col("tbl").isin("a", "c"))
              .select(Seq(col("tbl").as("kind"), col("g"), col("b"), col("m")) ++
                spec.mCols.drop(1).map(col) ++ Seq(col("c")): _*),
            s"$path/a", mergeA, batchId, numBuckets, Seq("g")))
         else Nil) ++
        (if (present("e"))
          Seq(() => vwApply(
            delta.filter(col("tbl") === "e")
              .select(col("g"), col("m").as("v"), col("w")),
            s"$path/e", batchId, numBuckets, spec.valueSubBuckets))
         else Nil) ++
        (if (present("u"))
          Seq(() => vwApply(
            delta.filter(col("tbl") === "u")
              .select(col("g"), col("m").as("v"), col("w")),
            s"$path/u", batchId, numBuckets, spec.valueSubBuckets))
         else Nil))
      finally delta.unpersist()
      if (fs.exists(new Path(path)))
        fs.listStatus(new Path(path))
          .filter(s => s.getPath.getName.startsWith("_delta_"))
          .foreach(s => fs.delete(s.getPath, true))
    } finally graft.operators.Caching.releaseAll()
  }

  private[streaming] def mergeF(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("w")) old.drop("w") else old
    val plus = inc.filter(col("w") === 1L).drop("w")
    val minus = inc.filter(col("w") === -1L).select("id").distinct()
    o.unionByName(plus).distinct().join(minus, Seq("id"), "left_anti")
  }

  private[streaming] def mergeSigned(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("w")) old.drop("w") else old
    val plus = inc.filter(col("w") === 1L).drop("w")
    val minus = inc.filter(col("w") === -1L).drop("w")
    val cond = Seq("k", "vl", "vs").map(c => o(c) <=> minus(c)).reduce(_ && _)
    o.join(minus, cond, "left_anti").unionByName(plus).distinct()
  }

  private[streaming] def mergeA(old: DataFrame, inc: DataFrame): DataFrame = {
    val all = old.unionByName(inc)
    // measure columns are data-driven (R161 multi-measure views carry
    // m2..mM beside m); each sums independently under the same groups
    val ms = all.columns.filter(c => c == "m" || c.matches("m\\d+")).toSeq
    val aggs = ms.map(c => sum(col(c)).as(c))
    val a = all.filter(col("kind") === "a")
      .groupBy("g")
      .agg(aggs.head, (aggs.tail :+ sum(col("c")).as("c")): _*)
      .filter((ms.map(c => col(c) =!= 0) :+ (col("c") =!= 0)).reduce(_ || _))
      .select(Seq(lit("a").as("kind"), col("g"),
        lit(null).cast("long").as("b")) ++ ms.map(col) ++ Seq(col("c")): _*)
    a.unionByName(all.filter(col("kind") === "c").distinct())
  }

  /** BOOTSTRAP a fresh state dir from the batch tables — one B-way star
    * join (what the engine serves anyway) instead of per-batch delta
    * machinery; writes facts + per-branch mirrors, every level + its
    * mirror, the aggregate, and one baseline changelog row per group
    * stamped `baselineBatch` (the as-of floor). Continuation folds must
    * use batch ids ABOVE the baseline. Refuses a live state dir. */
  def bootstrap(spec: StarSpec,
      facts: DataFrame, factKs: Seq[String], factId: String, factM: String,
      dims: Seq[Seq[DataFrame]], dimCols: Seq[Seq[(String, String, String)]],
      stateDir: String, baselineBatch: Long = 0L, numBuckets: Int = 16,
      factMs: Seq[String] = null): Unit = {
    val nB = spec.B
    val mSrcs = if (factMs != null) factMs else Seq(factM)
    require(mSrcs.size == spec.numMeasures,
      s"factMs must name ${spec.numMeasures} measure columns")
    require(factKs.size == nB, "one fact key per branch")
    val spark = facts.sparkSession
    val path = s"$stateDir/joinaggstar"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(path)),
      s"bootstrap requires a fresh state dir, found $path")
    val kCols = (1 to nB).map(b => s"k$b")
    val fIn = facts.select(Seq(col(factId).cast("long").as("id")) ++
        mSrcs.zip(spec.mCols).map { case (src, c) => col(src).cast("long").as(c) } ++
        factKs.zipWithIndex.map { case (c, b) => col(c).cast("long").as(s"k${b + 1}") }: _*)
      .groupBy("id")
      .agg(min(struct((kCols ++ spec.mCols).map(col): _*)).as("s"))
      .select(col("id") +: (kCols ++ spec.mCols).map(c => col(s"s.$c").as(c)): _*)
      .transform(graft.operators.Caching.persisted)
    val dIns = (1 to nB).map { b =>
      (1 to spec.branchDepths(b - 1)).map { i =>
        val (kc, lc, ac) = dimCols(b - 1)(i - 1)
        val rows = dims(b - 1)(i - 1).select(col(kc).cast("long").as("k"),
          (if (lc.nonEmpty) col(lc).cast("long") else lit(null).cast("long")).as("vl"),
          (if (ac.nonEmpty) col(ac).cast("string") else lit(null).cast("string")).as("vs"))
        (if (spec.multiRows((b, i))) rows.distinct()
         else rows
           .groupBy("k").agg(max(struct(col("vl"), col("vs"))).as("s"))
           .select(col("k"), col("s.vl").as("vl"), col("s.vs").as("vs")))
          .transform(graft.operators.Caching.persisted)
      }
    }
    try {
      // fact mirrors + level tables are independent dirs fed from the
      // already-persisted inputs — one concurrent wave, not a serial
      // loop (the processBatch apply-fan-out argument; measured ~2x on
      // the bootstrap wall at small scale, where per-table job latency
      // dominates)
      MvPipeline.applyConcurrently(
        (1 to nB).map { b => () =>
          MvPipeline.upsertBucketedMerge(fIn,
            s"$path/${if (b == 1) "f" else s"fm$b"}",
            (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets,
            Seq(s"k$b"))
        } ++
        (for (b <- 1 to nB; i <- 1 to spec.branchDepths(b - 1)) yield {
          Seq({ () =>
            MvPipeline.upsertBucketedMerge(dIns(b - 1)(i - 1), s"$path/d${b}_$i",
              (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets,
              Seq("k"))
          }: () => Unit) ++
          (if (i < spec.branchDepths(b - 1)) Seq({ () =>
            MvPipeline.upsertBucketedMerge(dIns(b - 1)(i - 1),
              s"$path/d${b}_${i}m",
              (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets,
              Seq("vl"))
          }: () => Unit) else Nil)
        }).flatten)
      // the batch aggregate once, as rows + the baseline changelog
      var cur = withDk(spec, fIn.drop("id")).withColumn("w", lit(1L))
      for (b <- 1 to nB; i <- 1 to spec.branchDepths(b - 1)) {
        val left = spec.leftBranches(b)
        cur = joinLevel(
          if (left) cur else cur.filter(col(s"k$b").isNotNull), b, i,
          dIns(b - 1)(i - 1), signed = false, left = left)
      }
      val fin = finish(spec, cur).transform(graft.operators.Caching.persisted)
      val bAggs = spec.mCols.map(c => sum(col(c)).as(c))
      val agg = fin.groupBy("g")
        .agg(bAggs.head, (bAggs.tail :+ sum(col("w")).as("c")): _*)
        .filter(col("c") > 0)
        .transform(graft.operators.Caching.persisted)
      val aRows = agg.select(Seq(lit("a").as("kind"), col("g"),
          lit(null).cast("long").as("b")) ++ spec.mCols.map(col) ++
          Seq(col("c")): _*)
        .unionByName(agg.select(Seq(lit("c").as("kind"), col("g"),
          lit(baselineBatch).as("b")) ++ spec.mCols.map(col) ++
          Seq(col("c")): _*))
      // the aggregate and the tracked side relations read the SAME
      // persisted finished tuples into independent dirs — second wave
      MvPipeline.applyConcurrently(
        Seq({ () =>
          MvPipeline.upsertBucketedMerge(aRows, s"$path/a", mergeA, -1L,
            numBuckets, Seq("g"))
        }: () => Unit) ++
        (if (spec.trackExtrema) Seq({ () =>
          vwApply(
            fin.groupBy("g", "m").agg(sum("w").as("w"))
              .select(col("g"), col("m").as("v"), col("w")),
            s"$path/e", -1L, numBuckets, spec.valueSubBuckets)
        }: () => Unit) else Nil) ++
        (if (spec.trackDistinct.isDefined) Seq({ () =>
          vwApply(
            fin.groupBy("g", "dk").agg(sum("w").as("w"))
              .select(col("g"), col("dk").as("v"), col("w")),
            s"$path/u", -1L, numBuckets, spec.valueSubBuckets)
        }: () => Unit) else Nil))
    } finally graft.operators.Caching.releaseAll()
  }

  /** Write a value-multiplicity delta `(g, v, w)` under the spec's
    * layout: plain `g`-keyed buckets, or `(g, xxhash64(v) % S)` when
    * `valueSubBuckets = S > 1` (R173 — the skew-safe layout; the
    * sub-bucket coordinate is derived, never stored). */
  private def vwApply(rows: DataFrame, path: String, batchId: Long,
      numBuckets: Int, subBuckets: Int): Unit =
    if (subBuckets == 1)
      MvPipeline.upsertBucketedMerge(rows, path, IncrementalExtrema.mergeVw,
        batchId, numBuckets, Seq("g"))
    else
      MvPipeline.upsertBucketedMerge(
        rows.withColumn("sb",
          IncrementalExtrema.subBucketOf(col("v"), subBuckets)),
        path, IncrementalExtrema.mergeVwSb, batchId, numBuckets,
        Seq("g", "sb"), subBuckets = subBuckets)

  /** `(g, total, rows)` == the batch star join-aggregate.
    * `numMeasures` only shapes the empty-state fallback schema; once
    * `a/` files exist the measures come from the files themselves. */
  def view(spark: SparkSession, stateDir: String,
      numMeasures: Int = 1): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/joinaggstar/a", aSchemaN(numMeasures))
    st.filter(col("kind") === "a" && col("c") > 0)
      .select(Seq(col("g"), col("m").as("total")) ++
        extraTotals(st) ++ Seq(col("c").as("rows")): _*)
  }

  /** Renamed extra measure columns (`m2 -> total2`, ...) when the view
    * was maintained with `numMeasures > 1`. Shared with the temporal
    * family's readers (same `a/` layout). */
  private[streaming] def extraTotals(st: DataFrame) =
    st.columns.filter(_.matches("m\\d+")).toSeq.sortBy(_.drop(1).toInt)
      .map(c => col(c).as(s"total${c.drop(1)}"))

  /** [[view]] restricted to `groups` — the bucket-pruned point read:
    * only the `a/` buckets the named groups hash into are opened (same
    * (bucketKeys, numBuckets) the writer used). Named groups are
    * non-null; the LEFT views' null group needs the full [[view]]. */
  def viewFor(spark: SparkSession, stateDir: String, groups: Seq[String],
      numBuckets: Int = 16, numMeasures: Int = 1): DataFrame = {
    import spark.implicits._
    MvPipeline.assertReadLayout(spark, s"$stateDir/joinaggstar/a",
      numBuckets, 1, "star viewFor")
    val gdf = groups.toDF("g")
    val ids = MvPipeline.bucketIdsOf(gdf, Seq("g"), numBuckets)
    val st = MvPipeline.readBuckets(spark, s"$stateDir/joinaggstar/a", ids,
      aSchemaN(numMeasures))
    st.filter(col("kind") === "a" && col("c") > 0)
      .join(broadcast(gdf), Seq("g"), "left_semi")
      .select(Seq(col("g"), col("m").as("total")) ++
        extraTotals(st) ++ Seq(col("c").as("rows")): _*)
  }

  /** Z-set changelog `(batch, g, dtotal, drows)`; integral == view. */
  def changelog(spark: SparkSession, stateDir: String,
      numMeasures: Int = 1): DataFrame = {
    val st = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$stateDir/joinaggstar/a", aSchemaN(numMeasures))
    val extra = st.columns.filter(_.matches("m\\d+")).toSeq
      .sortBy(_.drop(1).toInt)
      .map(c => col(c).as(s"dtotal${c.drop(1)}"))
    st.filter(col("kind") === "c")
      .select(Seq(col("b").as("batch"), col("g"), col("m").as("dtotal")) ++
        extra ++ Seq(col("c").as("drows")): _*)
  }

  /** AS-OF read: the aggregate as it stood after `batch` committed —
    * the changelog integral truncated at the batch (the
    * [[IncrementalJoinAggChain.viewAsOf]] contract). */
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

  /** Fact-grained EXTREMA over the maintained join (requires
    * `spec.trackExtrema`): per group `(g, n, min_v, max_v)` of the
    * resolved fact measures — exact through dim re-keys, cross-branch
    * equality flips, and fact deletes, because the `e/` table is the
    * value-multiplicity relation fed by the same staged delta terms as
    * the sum (the [[IncrementalExtrema]] semantics over a multi-way
    * join — a maintained `MIN(measure) GROUP BY dim-attrs` under
    * retraction, which no scalar aggregate state can serve). */
  def extremaView(spark: SparkSession, stateDir: String): DataFrame =
    IncrementalExtrema.extremaOf(extremaRelation(spark, stateDir))

  /** Exact low-quantiles of the resolved fact measures per group —
    * [[IncrementalExtrema.quantiles]] semantics (integer rationals). */
  def extremaQuantiles(spark: SparkSession, stateDir: String,
      qs: Seq[(Long, Long)]): DataFrame =
    IncrementalExtrema.quantilesOf(extremaRelation(spark, stateDir), qs)

  private def extremaRelation(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggstar/e",
      IncrementalExtrema.vwSchema)

  /** Maintained exact `COUNT(DISTINCT <trackDistinct col>)` per group
    * (requires `spec.trackDistinct`, R158): `(g, n_distinct)` — the
    * number of distinct live values with positive multiplicity in the
    * resolved join, exact through fact deletes, dim re-keys, and
    * left-branch presence changes. The aggregate no scalar state can
    * carry (deleting the last fact of a value must decrement), and the
    * exact twin of the KMV/HLL sketches: state is O(distinct live
    * (g, value)) — the honest exact-count-distinct cost. */
  def distinctView(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggstar/u",
      IncrementalExtrema.vwSchema)
      .filter(col("w") > 0)
      .groupBy("g").agg(count(lit(1)).as("n_distinct"))

  /** Continuous maintenance over a MIXED CDC stream: `kindCol` ∈
    * "fact" | "fact_del" | "d{b}_{i}" | "d{b}_{i}_del" (e.g. "d1_2" =
    * branch 1 level 2 upsert, "d1_2_del" = its key delete).
    * Fact rows read `factKs`/`idCol`/`mCol`; dim rows read fixed
    * columns `k`/`vl`/`vs` (absent columns null); dim deletes read
    * `k`. Single writer per state dir (MvPipeline contract). */
  def start(spark: SparkSession, inputDir: String,
      schema: StructType, stateDir: String, checkpointDir: String,
      spec: StarSpec, kindCol: String, factKs: Seq[String], idCol: String,
      mCol: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      factMs: Seq[String] = null)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spec,
          batch.filter(col(kindCol) === "fact"), factKs, idCol, mCol,
          batch.filter(col(kindCol) === "fact_del"), factKs, idCol,
          (1 to spec.B).map { b =>
            (1 to spec.branchDepths(b - 1)).map { i =>
              batch.filter(col(kindCol) === s"d${b}_$i")
            }
          },
          (1 to spec.B).map { b =>
            (1 to spec.branchDepths(b - 1)).map(_ => ("k", "vl", "vs"))
          },
          stateDir, batchId,
          dimDels = (1 to spec.B).map { b =>
            (1 to spec.branchDepths(b - 1)).map { i =>
              batch.filter(col(kindCol) === s"d${b}_${i}_del")
            }
          },
          factMs = factMs)
      }
      .start()

  /** Changelog compaction: fold the prefix `<= upTo` into one baseline
    * row per group; as-of stays exact at and above the floor. */
  /** RESHARD the whole star state dir to `newBuckets` — the write-side
    * bucket-size knob ([[MvPipeline.reshardBucketed]] per table: facts
    * + per-branch mirrors by their branch key, level tables by k, value
    * mirrors by vl, aggregate/extrema/distinct by g). Offline op
    * between committed batches into a FRESH `dstDir`; resume folding
    * with `numBuckets = newBuckets` and batch ids above the last. */
  def reshard(spark: SparkSession, spec: StarSpec, srcDir: String,
      dstDir: String, newBuckets: Int): Unit = {
    val src = s"$srcDir/joinaggstar"
    val dst = s"$dstDir/joinaggstar"
    (1 to spec.B).foreach { b =>
      MvPipeline.reshardBucketed(spark,
        s"$src/${if (b == 1) "f" else s"fm$b"}",
        s"$dst/${if (b == 1) "f" else s"fm$b"}", newBuckets, Seq(s"k$b"))
      (1 to spec.branchDepths(b - 1)).foreach { i =>
        MvPipeline.reshardBucketed(spark, s"$src/d${b}_$i", s"$dst/d${b}_$i",
          newBuckets, Seq("k"))
        if (i < spec.branchDepths(b - 1))
          MvPipeline.reshardBucketed(spark, s"$src/d${b}_${i}m",
            s"$dst/d${b}_${i}m", newBuckets, Seq("vl"))
      }
    }
    MvPipeline.reshardBucketed(spark, s"$src/a", s"$dst/a", newBuckets,
      Seq("g"))
    // the value-multiplicity tables re-route by the spec's layout: the
    // sub-bucket coordinate is derived from v at reshard time exactly
    // as at write time
    Seq("e", "u").foreach { t =>
      if (spec.valueSubBuckets == 1)
        MvPipeline.reshardBucketed(spark, s"$src/$t", s"$dst/$t", newBuckets,
          Seq("g"))
      else {
        val srcT = new Path(s"$src/$t")
        val fs = srcT.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(!fs.exists(new Path(s"$dst/$t")),
          s"reshard requires a fresh destination, found $dst/$t")
        val any = fs.exists(srcT) && fs.listStatus(srcT)
          .exists(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
        if (any)
          MvPipeline.upsertBucketedMerge(
            MvPipeline.readBucketedState(spark, s"$src/$t")
              .withColumn("sb", IncrementalExtrema.subBucketOf(col("v"),
                spec.valueSubBuckets)),
            s"$dst/$t",
            // drop sb on BOTH sides: the init-merge's empty frame
            // carries the increment's schema (incl. sb)
            (old, inc) => old.drop("sb").unionByName(inc.drop("sb")), -1L,
            newBuckets, Seq("g", "sb"), subBuckets = spec.valueSubBuckets)
      }
    }
    // replay safety: the destination carries no per-bucket stamps, so it
    // refuses batch ids at or below the last one committed here
    MvPipeline.writeResumeFloor(spark, dst,
      math.max(MvPipeline.maxBatchIn(spark, s"$src/a"),
        MvPipeline.maxStampUnder(spark, src)))
  }

  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    MvPipeline.compactChangelogA(spark, s"$stateDir/joinaggstar/a", upTo)
}
