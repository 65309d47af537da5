package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Continuously-maintained JOIN-aggregate — the engine's first BINARY
  * incremental view (SURVEY.md §2.11 R145/R146), past the per-key views
  * (funnels, clusterers): the star-join aggregate
  *
  *   SELECT dim.g, sum(fact.m) AS total, count(*) AS pairs
  *   FROM fact JOIN dim USING (jk) GROUP BY dim.g
  *
  * maintained under micro-batches that may carry BOTH new facts
  * (append-only, absorbed once per primary key) and dimension rows
  * (UPSERT on the join key — re-keying a dimension's group attribute
  * MOVES every joined fact's contribution, a retraction).
  *
  * The reference engine family cannot maintain this: ClickHouse MVs see
  * only the inserted block of ONE table — a dim row arriving after its
  * facts never joins (`/root/reference/README.md` MV DDL is single-
  * source). Here the classic bilinear delta-join rule runs per batch,
  * entirely Δ-against-state:
  *
  *   Δ(F ⋈ D) = ΔF ⋈ D₀  ∪  F₀ ⋈ ΔD  ∪  ΔF ⋈ ΔD
  *
  * with ΔD under Z-SET (signed) semantics — an upsert of (jk, g_new)
  * over existing (jk, g_old) contributes {+1·(jk,g_new), −1·(jk,g_old)},
  * so the aggregated delta carries the retraction and the grouped sums
  * fold ADDITIVELY (the non-monotone view becomes a monotone fold over
  * signed deltas — the R143 changelog idea applied to a binary operator).
  * `pairs` (the live joined-pair count) is maintained alongside `total`;
  * a group leaves the served view exactly when `pairs` hits 0, which
  * reproduces batch GROUP BY semantics bit-for-bit.
  *
  * State under `stateDir/joinagg/` — three bucketed tables plus one
  * staged delta per batch (the [[MvPipeline.upsertBucketedStaged]]
  * protocol inlined across tables; a crash anywhere converges on replay
  * because the staged delta is byte-identical and every per-bucket merge
  * is marker-guarded):
  *   - `f/` retained facts `(jk, id, m)`, bucketed by jk;
  *   - `d/` current dimension rows `(jk, g)`, bucketed by jk (replaced
  *     per jk);
  *   - `a/` kind-discriminated `(kind, g, b, m, c)` bucketed by g:
  *     `a` rows = the materialized aggregate (additive merge), `c` rows
  *     = the signed changelog (batch, g, Δtotal, Δpairs) whose running
  *     integral IS the aggregate — the invariant the spec pins.
  *
  * 100 TB shape — O(Δ) on BOTH sides of the fold (the "named next
  * upgrade" of the r10 staged-delta work, implemented here natively):
  * writes touch only the batch keys' buckets (per-bucket markers), and
  * reads are BUCKET-PRUNED ([[MvPipeline.readBuckets]]): every delta
  * term probes f/ and d/ with the batch's join keys only, so the fold
  * reads the buckets those keys hash into — bounded by the bucket
  * count, never by accumulated state. A fact whose dimension hasn't
  * arrived waits in f/ at zero cost until the F₀ ⋈ ΔD term picks it up.
  * The dedup/compare anti-joins are jk-co-bucketed with the pre-reads,
  * and the aggregate shuffle is bounded by touched-group cardinality.
  *
  * Contracts: fact `id` is the at-least-once absorption key (a re-sent
  * id is dropped; ids are unique per logical fact — the corpus
  * contract). Within one batch, duplicate fact ids keep the
  * min-(jk, m) row and duplicate dim jks keep the max-g row —
  * deterministic absent a version column (with one, order by it
  * upstream). Dim `g` may be null; it groups under null like SQL
  * GROUP BY. Ad-hoc folds (batchId < 0) maintain `a`/`f`/`d` exactly
  * but may collapse identical changelog rows (the R143 caveat). */
object IncrementalJoinAgg {

  private val fSchema = StructType(Seq(
    StructField("jk", LongType), StructField("id", LongType),
    StructField("m", LongType)))
  private val dSchema = StructType(Seq(
    StructField("jk", LongType), StructField("g", StringType)))

  /** Fold one micro-batch (facts and/or dims — either may be empty)
    * into the maintained join-aggregate. */
  def processBatch(facts: DataFrame, factJk: String, factId: String, factM: String,
      dims: DataFrame, dimJk: String, dimG: String,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16): Unit = {
    val spark = facts.sparkSession
    val path = s"$stateDir/joinagg"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    def computeDelta(): DataFrame = {
      // deterministic at-least-once absorption within the batch
      val fIn = facts.select(col(factJk).cast("long").as("jk"),
          col(factId).cast("long").as("id"), col(factM).cast("long").as("m"))
        .groupBy("id").agg(min(struct(col("jk"), col("m"))).as("s"))
        .select(col("id"), col("s.jk").as("jk"), col("s.m").as("m"))
        .transform(graft.operators.Caching.persisted)
      val dIn = dims.select(col(dimJk).cast("long").as("jk"), col(dimG).cast("string").as("g"))
        .groupBy("jk").agg(max(col("g")).as("g"))
        .transform(graft.operators.Caching.persisted)

      // read-side pruning: only the buckets the batch's join keys hash
      // into can hold matching or conflicting state rows
      val touched = fIn.select("jk").unionByName(dIn.select("jk")).distinct()
        .select(pmod(xxhash64(col("jk")), lit(numBuckets.toLong)).as("b")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val f0 = MvPipeline.readBuckets(spark, s"$path/f", touched, fSchema)
        .transform(graft.operators.Caching.persisted)
      val d0 = MvPipeline.readBuckets(spark, s"$path/d", touched, dSchema)
        .transform(graft.operators.Caching.persisted)

      // ΔF: genuinely-new facts (same id ⇒ same jk ⇒ same pruned bucket)
      val newF = fIn.join(f0.select("id"), Seq("id"), "left_anti")
        .transform(graft.operators.Caching.persisted)
      // ΔD under Z-set semantics: upserts that CHANGE something. A
      // prior row's existence is tracked by an explicit flag (its g may
      // legitimately be null), and the change test is null-safe.
      val dUp = dIn
        .join(d0.select(col("jk"), col("g").as("g_old"))
          .withColumn("had_old", lit(true)), Seq("jk"), "left")
        .withColumn("had_old", coalesce(col("had_old"), lit(false)))
        .filter(!col("had_old") || !(col("g") <=> col("g_old")))
        .transform(graft.operators.Caching.persisted)
      val zPlus = dUp.select(col("jk"), col("g"), lit(1L).as("w"))
      val zMinus = dUp.filter(col("had_old"))
        .select(col("jk"), col("g_old").as("g"), lit(-1L).as("w"))
      val zd = zPlus.unionByName(zMinus)
        .transform(graft.operators.Caching.persisted)

      // the bilinear delta — every term Δ-against-(pruned)-state
      val t1 = newF.join(d0, Seq("jk")).select(col("g"), col("m"), lit(1L).as("w"))
      val t2 = f0.join(zd, Seq("jk")).select(col("g"), col("m"), col("w"))
      val t3 = newF.join(zd, Seq("jk")).select(col("g"), col("m"), col("w"))
      val dAgg = t1.unionByName(t2).unionByName(t3)
        .groupBy("g")
        .agg(sum(col("m") * col("w")).as("dm"), sum(col("w")).as("dc"))
        .filter(col("dm") =!= 0 || col("dc") =!= 0)

      val nil = lit(null).cast("long")
      val nils = lit(null).cast("string")
      val fDelta = newF.select(lit("f").as("tbl"), col("jk"), col("id"),
        nils.as("g"), col("m"), nil.as("c"), nil.as("b"))
      val dDelta = dUp.select(lit("d").as("tbl"), col("jk"), nil.as("id"),
        col("g"), nil.as("m"), nil.as("c"), nil.as("b"))
      val aDelta = dAgg.select(lit("a").as("tbl"), nil.as("jk"), nil.as("id"),
        col("g"), col("dm").as("m"), col("dc").as("c"), nil.as("b"))
      val cDelta = dAgg.select(lit("c").as("tbl"), nil.as("jk"), nil.as("id"),
        col("g"), col("dm").as("m"), col("dc").as("c"), lit(batchId).as("b"))
      fDelta.unionByName(dDelta).unionByName(aDelta).unionByName(cDelta)
    }

    try {
      // stage once, byte-identically; a replay reuses the exact rows, so
      // partially-applied buckets from a crash converge (stamped skip)
      if (!(batchId >= 0 && fs.exists(staged))) {
        val tmp = new Path(s"$path/$stagedName.tmp")
        computeDelta().write.mode("overwrite").parquet(tmp.toString)
        fs.delete(staged, true)
        require(fs.rename(tmp, staged), s"stage delta $staged")
      }
      val delta = spark.read.parquet(staged.toString).persist()
      // three independent marker-guarded tables — applied CONCURRENTLY
      try MvPipeline.applyConcurrently(Seq(
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "f").select("jk", "id", "m"),
          s"$path/f", mergeF, batchId, numBuckets, Seq("jk")),
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "d").select("jk", "g"),
          s"$path/d", mergeD, batchId, numBuckets, Seq("jk")),
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

  /** Per-bucket fact merge: the staged delta holds only genuinely-new
    * ids, so a set union suffices; distinct guards replay. */
  private def mergeF(old: DataFrame, inc: DataFrame): DataFrame =
    old.unionByName(inc).distinct()

  /** Per-bucket dim merge: REPLACE per jk (the upsert). */
  private def mergeD(old: DataFrame, inc: DataFrame): DataFrame =
    old.join(inc.select("jk").distinct(), Seq("jk"), "left_anti")
      .unionByName(inc)

  /** Per-bucket aggregate/changelog merge: `a` rows fold additively per
    * group (dropping fully-cancelled groups — pairs AND total at zero);
    * `c` rows are an append-only set (replay-identical, batch-stamped). */
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

  /** The materialized view: `(g, total, pairs)` == the batch join-agg
    * over everything folded (groups with zero live pairs excluded —
    * batch GROUP BY semantics). */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinagg/a",
      StructType(Seq(StructField("kind", StringType), StructField("g", StringType),
        StructField("b", LongType), StructField("m", LongType), StructField("c", LongType))))
      .filter(col("kind") === "a" && col("c") > 0)
      .select(col("g"), col("m").as("total"), col("c").as("pairs"))

  /** The Z-set changelog: `(batch, g, dtotal, dpairs)`; its per-group
    * running sum IS the materialized aggregate. */
  def changelog(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinagg/a",
      StructType(Seq(StructField("kind", StringType), StructField("g", StringType),
        StructField("b", LongType), StructField("m", LongType), StructField("c", LongType))))
      .filter(col("kind") === "c")
      .select(col("b").as("batch"), col("g"), col("m").as("dtotal"), col("c").as("dpairs"))

  /** Changelog compaction: fold every changelog row with batch ≤ `upTo`
    * into ONE baseline row per group stamped `upTo` — the changelog is
    * the only part of this state that grows with HISTORY rather than
    * with live keys, and the integral invariant survives a prefix fold
    * exactly. [[viewAsOf]] stays exact for every `batch ≥ upTo`;
    * addressability BELOW the floor is what compaction spends
    * (documented, the caller picks the floor). Idempotent; per-bucket
    * marker protocol, crash-safe. */
  def compactChangelog(spark: SparkSession, stateDir: String, upTo: Long): Unit =
    MvPipeline.transformBuckets(spark, s"$stateDir/joinagg/a", old => {
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
      .agg(sum(col("dtotal")).as("total"), sum(col("dpairs")).as("pairs"))
      .filter(col("pairs") > 0)

  /** Retained facts / current dims (diagnostics + rehearsals). */
  def facts(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinagg/f", fSchema)
  def dims(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinagg/d", dSchema)

  /** Continuous maintenance over a MIXED change stream (the realistic
    * shape: one CDC topic carrying both tables' rows, discriminated by
    * `kindCol` = "fact" | "dim") — a single writer per state dir, per
    * the MvPipeline contract. */
  def start(spark: SparkSession, inputDir: String,
      schema: StructType, stateDir: String, checkpointDir: String,
      kindCol: String, jkCol: String, idCol: String, gCol: String, mCol: String,
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
          batch.filter(col(kindCol) === "fact"), jkCol, idCol, mCol,
          batch.filter(col(kindCol) === "dim"), jkCol, gCol,
          stateDir, batchId)
      }
      .start()
}
