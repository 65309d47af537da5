package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Continuously-maintained N-ARY (chain) JOIN-aggregate — the TERNARY
  * generalization of [[IncrementalJoinAgg]] (SURVEY.md §2.11 R146): the
  * snowflake-chain aggregate
  *
  *   SELECT d2.g, sum(f.m) AS total, count(*) AS triples
  *   FROM fact f
  *   JOIN dim1 d1 ON f.k1 = d1.k1     -- e.g. lineitem → orders
  *   JOIN dim2 d2 ON d1.k2 = d2.k2    -- e.g. orders → customer
  *   GROUP BY d2.g
  *
  * maintained under micro-batches carrying ANY MIX of: new facts,
  * fact DELETES (the engine's first signed fact stream — a curation
  * pipeline's "forget these rows"), dim1 upserts (re-keying k1→k2
  * RE-ROUTES every joined fact to a different d2 subtree — the chain's
  * distinctive retraction, which the binary view cannot express), and
  * dim2 upserts (re-grouping k2→g).
  *
  * The bilinear Δ-join rule generalizes multilinearly by telescoping
  * (each input X' = X₀ + ΔX as a Z-set; weights MULTIPLY across joins):
  *
  *   Δ(F ⋈ D1 ⋈ D2) =  ΔF ⋈ D1' ⋈ D2'     (T1: post-state dims)
  *                   ∪  F₀ ⋈ ΔD1 ⋈ D2'     (T2: pre-facts, post-D2)
  *                   ∪  F₀ ⋈ D1₀ ⋈ ΔD2     (T3: everything pre-state)
  *
  * exact for any interleave — each pairwise overlap (a fact arriving
  * with its dims, both dims re-keyed at once) is counted exactly once
  * by the prime/naught staggering. ΔF is ±1-signed (delete retracts its
  * live contribution through T1's D1'⋈D2' probe); ΔD1/ΔD2 are the
  * upsert Z-sets {+new, −old}. All grouped measures fold ADDITIVELY; a
  * group leaves the served view when its live triple count hits 0 —
  * batch GROUP BY semantics bit-for-bit.
  *
  * State under `stateDir/joinaggchain/` — five bucketed tables fed from
  * ONE staged delta (the [[MvPipeline.upsertBucketedStaged]] protocol
  * inlined across tables; every per-bucket merge is idempotent under
  * re-application of the byte-identical staged rows, so a crash anywhere
  * in the table/bucket loop converges on replay):
  *   - `f/`   retained facts `(k1, id, m)`, bucketed by k1;
  *   - `d1/`  current link rows `(k1, k2)`, bucketed by k1;
  *   - `d1m/` the SAME link rows MIRRORED bucketed by k2 — T3 must find
  *     "which D1₀ rows point at an upserted d2 key" and no k1-bucketing
  *     can prune that probe (the near-dup `_bidx` mirror technique, here
  *     with SIGNED maintenance: a k1→k2 re-key moves the mirror row
  *     ACROSS buckets, so the delta carries {+(k1,k2_new), −(k1,k2_old)}
  *     and the merge is add/remove by null-safe pair match);
  *   - `d2/`  current group rows `(k2, g)`, bucketed by k2;
  *   - `a/`   kind-discriminated aggregate + signed changelog, bucketed
  *     by g (`a` rows additive, `c` rows append-only; running integral
  *     of `c` IS `a` — the R143/R145 invariant, pinned by the spec).
  *
  * 100 TB shape — O(Δ) on BOTH sides: every state read is BUCKET-PRUNED
  * ([[MvPipeline.readBuckets]]) to the batch's own keys, staged in three
  * phases because later terms' probe keys are only known from earlier
  * joins (k1-phase: f/d1 buckets of the batch's k1s; k2-phase: d2
  * buckets of the k2s the k1-phase surfaced + the batch's own k2s;
  * T3-phase: d1m buckets of ΔD2's k2s, then f buckets of the k1s THOSE
  * rows name). Writes touch only the batch keys' buckets. Nothing ever
  * scans a full table, so per-batch cost is bounded by batch footprint ×
  * bucket granularity — never by accumulated state.
  *
  * Contracts (the [[IncrementalJoinAgg]] ones, extended): fact `id` is
  * the at-least-once absorption key and always carries the same k1 (so
  * its dedup anti-join is co-bucketed); deletes name `(k1, id)` (CDC
  * deletes carry their key — an id-only delete would need an id-bucketed
  * mirror of f/, same technique, not built until needed); a delete of an
  * id re-sent in the SAME batch wins (the row never lands). Within-batch
  * dedup is deterministic: facts keep min (k1, m) per id, dims keep max
  * value per key. Dim values (k2, g) may be null — null k2 simply never
  * joins (SQL semantics); null g groups under null. Ad-hoc folds
  * (batchId < 0) maintain exactly but may collapse identical changelog
  * rows (the R143 caveat). */
object IncrementalJoinAggChain {

  private val fSchema = StructType(Seq(
    StructField("k1", LongType), StructField("id", LongType),
    StructField("m", LongType)))
  private val d1Schema = StructType(Seq(
    StructField("k1", LongType), StructField("k2", LongType)))
  private val d2Schema = StructType(Seq(
    StructField("k2", LongType), StructField("g", StringType)))
  private val aSchema = StructType(Seq(
    StructField("kind", StringType), StructField("g", StringType),
    StructField("b", LongType), StructField("m", LongType),
    StructField("c", LongType)))

  /** Fold one micro-batch (any of the four inputs may be empty) into the
    * maintained chain join-aggregate. */
  def processBatch(facts: DataFrame, factK1: String, factId: String, factM: String,
      factDels: DataFrame, delK1: String, delId: String,
      dims1: DataFrame, d1K1: String, d1K2: String,
      dims2: DataFrame, d2K2: String, d2G: String,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16): Unit = {
    val spark = facts.sparkSession
    val path = s"$stateDir/joinaggchain"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    def computeDelta(): DataFrame = {
      // deterministic within-batch absorption
      val fIn = facts.select(col(factK1).cast("long").as("k1"),
          col(factId).cast("long").as("id"), col(factM).cast("long").as("m"))
        .groupBy("id").agg(min(struct(col("k1"), col("m"))).as("s"))
        .select(col("id"), col("s.k1").as("k1"), col("s.m").as("m"))
        .transform(graft.operators.Caching.persisted)
      val delIn = factDels.select(col(delK1).cast("long").as("k1"),
          col(delId).cast("long").as("id")).distinct()
        .transform(graft.operators.Caching.persisted)
      val d1In = dims1.select(col(d1K1).cast("long").as("k1"),
          col(d1K2).cast("long").as("k2"))
        .groupBy("k1").agg(max(col("k2")).as("k2"))
        .transform(graft.operators.Caching.persisted)
      val d2In = dims2.select(col(d2K2).cast("long").as("k2"),
          col(d2G).cast("string").as("g"))
        .groupBy("k2").agg(max(col("g")).as("g"))
        .transform(graft.operators.Caching.persisted)

      // ---- k1 phase: pruned f/ and d1/ reads on the batch's own k1s
      val k1s = fIn.select("k1").unionByName(delIn.select("k1"))
        .unionByName(d1In.select("k1"))
      val f0 = MvPipeline.readBuckets(spark, s"$path/f",
          MvPipeline.bucketIdsOf(k1s, Seq("k1"), numBuckets), fSchema)
        .transform(graft.operators.Caching.persisted)
      val d10 = MvPipeline.readBuckets(spark, s"$path/d1",
          MvPipeline.bucketIdsOf(
            fIn.select("k1").unionByName(delIn.select("k1"))
              .unionByName(d1In.select("k1")), Seq("k1"), numBuckets), d1Schema)
        .transform(graft.operators.Caching.persisted)

      // ΔF: +1 genuinely-new facts (delete-wins within the batch),
      // −1 deletes that actually live in state (m resolved from f₀)
      val newF = fIn.join(f0.select("id"), Seq("id"), "left_anti")
        .join(delIn.select("id"), Seq("id"), "left_anti")
        .transform(graft.operators.Caching.persisted)
      val delF = f0.join(delIn.select("id"), Seq("id"), "left_semi")
        .transform(graft.operators.Caching.persisted)
      val zf = newF.select(col("k1"), col("id"), col("m"), lit(1L).as("w"))
        .unionByName(delF.select(col("k1"), col("id"), col("m"), lit(-1L).as("w")))
        .transform(graft.operators.Caching.persisted)

      // ΔD1 Z-set: upserts that change something, null-safe
      val d1Up = d1In
        .join(d10.select(col("k1"), col("k2").as("k2_old"))
          .withColumn("had_old", lit(true)), Seq("k1"), "left")
        .withColumn("had_old", coalesce(col("had_old"), lit(false)))
        .filter(!col("had_old") || !(col("k2") <=> col("k2_old")))
        .transform(graft.operators.Caching.persisted)
      val zd1 = d1Up.select(col("k1"), col("k2"), lit(1L).as("w"))
        .unionByName(d1Up.filter(col("had_old"))
          .select(col("k1"), col("k2_old").as("k2"), lit(-1L).as("w")))
        .transform(graft.operators.Caching.persisted)

      // D1' restricted to ΔF's k1s (all T1 ever probes)
      val d1Prime = d10.join(d1In.select("k1"), Seq("k1"), "left_anti")
        .unionByName(d1In)
        .transform(graft.operators.Caching.persisted)

      // T1/T2 partial joins up to k2 (weights ride along)
      val t1k2 = zf.join(d1Prime, Seq("k1"))
        .select(col("k2"), col("m"), col("w"))
        .transform(graft.operators.Caching.persisted)
      val t2k2 = f0.join(zd1.select(col("k1"), col("k2"), col("w")), Seq("k1"))
        .select(col("k2"), col("m"), col("w"))
        .transform(graft.operators.Caching.persisted)

      // ---- T3 probe: which D1₀ rows point at an upserted d2 key —
      // served by the k2-bucketed mirror, pruned to ΔD2's k2s
      val d1t = MvPipeline.readBuckets(spark, s"$path/d1m",
          MvPipeline.bucketIdsOf(d2In.select("k2"), Seq("k2"), numBuckets), d1Schema)
        .join(d2In.select("k2"), Seq("k2"), "left_semi")
        .transform(graft.operators.Caching.persisted)
      val f0t = MvPipeline.readBuckets(spark, s"$path/f",
          MvPipeline.bucketIdsOf(d1t.select("k1"), Seq("k1"), numBuckets), fSchema)
        .transform(graft.operators.Caching.persisted)

      // ---- k2 phase: pruned d2/ read on every k2 any term will probe
      val k2s = t1k2.select("k2").unionByName(t2k2.select("k2"))
        .unionByName(d2In.select("k2")).filter(col("k2").isNotNull)
      val d20 = MvPipeline.readBuckets(spark, s"$path/d2",
          MvPipeline.bucketIdsOf(k2s, Seq("k2"), numBuckets), d2Schema)
        .transform(graft.operators.Caching.persisted)

      // ΔD2 Z-set + D2'
      val d2Up = d2In
        .join(d20.select(col("k2"), col("g").as("g_old"))
          .withColumn("had_old", lit(true)), Seq("k2"), "left")
        .withColumn("had_old", coalesce(col("had_old"), lit(false)))
        .filter(!col("had_old") || !(col("g") <=> col("g_old")))
        .transform(graft.operators.Caching.persisted)
      val zd2 = d2Up.select(col("k2"), col("g"), lit(1L).as("w"))
        .unionByName(d2Up.filter(col("had_old"))
          .select(col("k2"), col("g_old").as("g"), lit(-1L).as("w")))
        .transform(graft.operators.Caching.persisted)
      val d2Prime = d20.join(d2In.select("k2"), Seq("k2"), "left_anti")
        .unionByName(d2In)
        .transform(graft.operators.Caching.persisted)

      // ---- the three telescoped terms (weights multiply)
      val t1 = t1k2.join(d2Prime, Seq("k2")).select(col("g"), col("m"), col("w"))
      val t2 = t2k2.join(d2Prime, Seq("k2")).select(col("g"), col("m"), col("w"))
      val t3 = f0t.join(d1t, Seq("k1")).join(zd2, Seq("k2"))
        .select(col("g"), col("m"), col("w"))
      val dAgg = t1.unionByName(t2).unionByName(t3)
        .groupBy("g")
        .agg(sum(col("m") * col("w")).as("dm"), sum(col("w")).as("dc"))
        .filter(col("dm") =!= 0 || col("dc") =!= 0)

      val nil = lit(null).cast("long")
      val nils = lit(null).cast("string")
      val fDelta = zf.select(lit("f").as("tbl"), col("k1"), nil.as("k2"),
        col("id"), nils.as("g"), col("m"), nil.as("c"), nil.as("b"), col("w"))
      val d1Delta = zd1.select(lit("d1").as("tbl"), col("k1"), col("k2"),
        nil.as("id"), nils.as("g"), nil.as("m"), nil.as("c"), nil.as("b"), col("w"))
      val d2Delta = zd2.select(lit("d2").as("tbl"), nil.as("k1"), col("k2"),
        nil.as("id"), col("g"), nil.as("m"), nil.as("c"), nil.as("b"), col("w"))
      val aDelta = dAgg.select(lit("a").as("tbl"), nil.as("k1"), nil.as("k2"),
        nil.as("id"), col("g"), col("dm").as("m"), col("dc").as("c"),
        nil.as("b"), nil.as("w"))
      val cDelta = dAgg.select(lit("c").as("tbl"), nil.as("k1"), nil.as("k2"),
        nil.as("id"), col("g"), col("dm").as("m"), col("dc").as("c"),
        lit(batchId).as("b"), nil.as("w"))
      fDelta.unionByName(d1Delta).unionByName(d2Delta)
        .unionByName(aDelta).unionByName(cDelta)
    }

    try {
      if (!(batchId >= 0 && fs.exists(staged))) {
        val tmp = new Path(s"$path/$stagedName.tmp")
        computeDelta().write.mode("overwrite").parquet(tmp.toString)
        fs.delete(staged, true)
        require(fs.rename(tmp, staged), s"stage delta $staged")
      }
      val delta = spark.read.parquet(staged.toString).persist()
      // five independent marker-guarded tables — applied CONCURRENTLY
      // (the staged protocol never relies on table order; the mirror
      // consumes the SAME signed rows bucketed by k2: the −1 row routes
      // the removal to the OLD k2's bucket, the +1 row the insert to
      // the new one — cross-bucket moves handled by signs)
      try MvPipeline.applyConcurrently(Seq(
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "f").select("k1", "id", "m", "w"),
          s"$path/f", mergeF, batchId, numBuckets, Seq("k1")),
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "d1").select("k1", "k2", "w"),
          s"$path/d1", mergeSigned(Seq("k1", "k2")), batchId, numBuckets, Seq("k1")),
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "d1").select("k1", "k2", "w"),
          s"$path/d1m", mergeSigned(Seq("k1", "k2")), batchId, numBuckets, Seq("k2")),
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "d2").select("k2", "g", "w"),
          s"$path/d2", mergeSigned(Seq("k2", "g")), batchId, numBuckets, Seq("k2")),
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl").isin("a", "c"))
            .select(col("tbl").as("kind"), col("g"), col("b"), col("m"), col("c")),
          s"$path/a", mergeA, batchId, numBuckets, Seq("g"))))
      finally delta.unpersist()
      if (fs.exists(new Path(path)))
        fs.listStatus(new Path(path))
          .filter(s => s.getPath.getName.startsWith("_delta_"))
          .foreach(s => fs.delete(s.getPath, true))
    } finally graft.operators.Caching.releaseAll()
  }

  /** Per-bucket fact merge over signed rows: +1 rows insert (distinct
    * guards replay), −1 rows remove by id. Init-with-merge hands an
    * empty `old` carrying the delta's `w` column — dropped defensively. */
  private def mergeF(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("w")) old.drop("w") else old
    val plus = inc.filter(col("w") === 1L).drop("w")
    val minus = inc.filter(col("w") === -1L).select("id").distinct()
    o.unionByName(plus).distinct().join(minus, Seq("id"), "left_anti")
  }

  /** Per-bucket signed set merge for dim tables: remove the −1 rows
    * (null-safe full-row match — dim values may be null), add the +1
    * rows. Re-applying the same delta is a no-op. */
  private def mergeSigned(cols: Seq[String])(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("w")) old.drop("w") else old
    val plus = inc.filter(col("w") === 1L).drop("w")
    val minus = inc.filter(col("w") === -1L).drop("w")
    val cond = cols.map(c => o(c) <=> minus(c)).reduce(_ && _)
    o.join(minus, cond, "left_anti").unionByName(plus).distinct()
  }

  /** Per-bucket aggregate/changelog merge — identical contract to
    * [[IncrementalJoinAgg]]'s: additive per group, cancelled groups
    * dropped, changelog append-only. */
  private def mergeA(old: DataFrame, inc: DataFrame): DataFrame = {
    val all = old.unionByName(inc)
    val a = all.filter(col("kind") === "a")
      .groupBy("g")
      .agg(sum(col("m")).as("m"), sum(col("c")).as("c"))
      .filter(col("m") =!= 0 || col("c") =!= 0)
      .select(lit("a").as("kind"), col("g"), lit(null).cast("long").as("b"),
        col("m"), col("c"))
    a.unionByName(all.filter(col("kind") === "c").distinct())
  }

  /** The materialized view: `(g, total, triples)` == the batch chain
    * join-aggregate over everything folded. */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggchain/a", aSchema)
      .filter(col("kind") === "a" && col("c") > 0)
      .select(col("g"), col("m").as("total"), col("c").as("triples"))

  /** The Z-set changelog `(batch, g, dtotal, dtriples)`; per-group
    * running sum IS the aggregate. */
  def changelog(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggchain/a", aSchema)
      .filter(col("kind") === "c")
      .select(col("b").as("batch"), col("g"), col("m").as("dtotal"),
        col("c").as("dtriples"))

  /** Changelog compaction — the [[IncrementalJoinAgg.compactChangelog]]
    * contract for the chain view: prefix rows fold into one baseline
    * per group at `upTo`; as-of stays exact at and above the floor. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    MvPipeline.transformBuckets(spark, s"$stateDir/joinaggchain/a", old => {
      val pre = old.filter(col("kind") === "c" && col("b") <= upTo)
      val baseline = pre.groupBy("g")
        .agg(sum(col("m")).as("m"), sum(col("c")).as("c"))
        .filter(col("m") =!= 0 || col("c") =!= 0)
        .select(lit("c").as("kind"), col("g"), lit(upTo).as("b"),
          col("m"), col("c"))
      old.filter(!(col("kind") === "c" && col("b") <= upTo))
        .unionByName(baseline)
    })

  /** AS-OF (time-travel) read: the aggregate exactly as it stood after
    * `batch` committed — the changelog integral truncated at the batch.
    * Requires streaming-mode monotone batch ids (ad-hoc folds stamp −1).
    * No state rewritten; no history kept beyond the changelog (bound it
    * with [[compactChangelog]]); `batch` below a compaction floor is no
    * longer addressable. */
  def viewAsOf(spark: SparkSession, stateDir: String, batch: Long): DataFrame =
    changelog(spark, stateDir)
      .filter(col("batch") <= batch)
      .groupBy("g")
      .agg(sum(col("dtotal")).as("total"), sum(col("dtriples")).as("triples"))
      .filter(col("triples") > 0)

  /** Diagnostics / rehearsal reads. */
  def facts(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggchain/f", fSchema)
  def dims1(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggchain/d1", d1Schema)
  def dims1Mirror(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggchain/d1m", d1Schema)
  def dims2(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggchain/d2", d2Schema)

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
