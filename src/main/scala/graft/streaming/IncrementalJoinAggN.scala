package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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
  * new facts, fact DELETES, and upserts at EVERY level — subsuming
  * [[IncrementalJoinAgg]] (N = 1) and [[IncrementalJoinAggChain]]
  * (N = 2) as instances of the same telescoped multilinear rule:
  *
  *   Δ(F ⋈ D1 ⋈ … ⋈ DN)
  *     = ΔF ⋈ D1' ⋈ … ⋈ DN'
  *     ∪ (for each level i)  F₀ ⋈ D1₀ ⋈ … ⋈ D(i−1)₀ ⋈ ΔDi ⋈ D(i+1)' ⋈ … ⋈ DN'
  *
  * (inputs BELOW the changed level at pre-state, inputs ABOVE at
  * post-state — every pairwise overlap counted exactly once; weights
  * multiply, all Z-set). Term i is computed by a BACKWARD restrict —
  * from ΔDi's keys, walk mirrors of levels i−1 … 1 (each level's link
  * rows mirrored bucketed by their VALUE — the [[IncrementalJoinAggChain]]
  * `d1m` technique applied per level) down to the facts' buckets — then
  * a FORWARD join up through the post-state levels. Every read is
  * bucket-pruned; per-batch cost is O(affected subtree × depth), never
  * O(state). The staged-delta/idempotent-merge protocol is the family's
  * standard one; crash anywhere converges on replay.
  *
  * Uniform level representation: level i < N rows are `(k, vl)` (link
  * to the next key), level N rows are `(k, vs)` (the group attribute) —
  * one physical schema `(k, vl, vs)` for every level, so the engine is
  * a loop, not N hand-written joins. Contracts as the ternary view:
  * fact ids arrive once and pin their k1; deletes name (k1, id);
  * within-batch dedup keeps min-(k1, m) facts and max-value dims;
  * ad-hoc folds may collapse identical changelog rows. */
object IncrementalJoinAggN {

  private val fSchema = StructType(Seq(
    StructField("k", LongType), StructField("id", LongType),
    StructField("m", LongType)))
  private val dSchema = StructType(Seq(
    StructField("k", LongType), StructField("vl", LongType),
    StructField("vs", StringType)))
  private val aSchema = StructType(Seq(
    StructField("kind", StringType), StructField("g", StringType),
    StructField("b", LongType), StructField("m", LongType),
    StructField("c", LongType)))

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
    val spark = facts.sparkSession
    val path = s"$stateDir/joinaggn"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    def pruneRead(table: String, keys: DataFrame, keyCols: Seq[String],
        schema: StructType): DataFrame =
      MvPipeline.readBuckets(spark, s"$path/$table",
        MvPipeline.bucketIdsOf(keys, keyCols, numBuckets), schema)

    def computeDelta(): DataFrame = {
      val fIn = facts.select(col(factK).cast("long").as("k"),
          col(factId).cast("long").as("id"), col(factM).cast("long").as("m"))
        .groupBy("id").agg(min(struct(col("k"), col("m"))).as("s"))
        .select(col("id"), col("s.k").as("k"), col("s.m").as("m"))
        .transform(graft.operators.Caching.persisted)
      val delIn = factDels.select(col(delK).cast("long").as("k"),
          col(delId).cast("long").as("id")).distinct()
        .transform(graft.operators.Caching.persisted)
      // normalize every level to (k, vl, vs); latest-wins within batch
      val dIns: Seq[DataFrame] = dims.zipWithIndex.map { case (df, i) =>
        val (kc, vc) = dimCols(i)
        val base =
          if (i == n - 1)
            df.select(col(kc).cast("long").as("k"),
              lit(null).cast("long").as("vl"), col(vc).cast("string").as("vs"))
          else
            df.select(col(kc).cast("long").as("k"),
              col(vc).cast("long").as("vl"), lit(null).cast("string").as("vs"))
        base.groupBy("k").agg(max(col("vl")).as("vl"), max(col("vs")).as("vs"))
          .transform(graft.operators.Caching.persisted)
      }

      // ΔF (signed) against the pruned pre-state facts
      val fKeys = fIn.select("k").unionByName(delIn.select("k"))
      val f0 = pruneRead("f", fKeys, Seq("k"), fSchema)
        .transform(graft.operators.Caching.persisted)
      val newF = fIn.join(f0.select("id"), Seq("id"), "left_anti")
        .join(delIn.select("id"), Seq("id"), "left_anti")
      val delF = f0.join(delIn.select("id"), Seq("id"), "left_semi")
      val zf = newF.select(col("k"), col("id"), col("m"), lit(1L).as("w"))
        .unionByName(delF.select(col("k"), col("id"), col("m"), lit(-1L).as("w")))
        .transform(graft.operators.Caching.persisted)

      // per level: pre-state rows for that level's upserted keys, the
      // signed Z-set, and a post-state resolver restricted on demand
      val d0ForUpsert: Seq[DataFrame] = (0 until n).map { i =>
        pruneRead(s"d${i + 1}", dIns(i).select("k"), Seq("k"), dSchema)
          .transform(graft.operators.Caching.persisted)
      }
      val zds: Seq[DataFrame] = (0 until n).map { i =>
        val up = dIns(i)
          .join(d0ForUpsert(i).select(col("k"), col("vl").as("vl_old"),
            col("vs").as("vs_old")).withColumn("had_old", lit(true)), Seq("k"), "left")
          .withColumn("had_old", coalesce(col("had_old"), lit(false)))
          .filter(!col("had_old") ||
            !(col("vl") <=> col("vl_old")) || !(col("vs") <=> col("vs_old")))
          .transform(graft.operators.Caching.persisted)
        up.select(col("k"), col("vl"), col("vs"), lit(1L).as("w"))
          .unionByName(up.filter(col("had_old"))
            .select(col("k"), col("vl_old").as("vl"), col("vs_old").as("vs"),
              lit(-1L).as("w")))
          .transform(graft.operators.Caching.persisted)
      }

      /** Join `cur` (k = the NEXT key to resolve, m, w) forward through
        * levels `from..n` at POST-state, returning (g, m, w). */
      def forward(cur0: DataFrame, from: Int): DataFrame = {
        var cur = cur0
        for (i <- from until n) {
          val c = cur.filter(col("k").isNotNull)
            .transform(graft.operators.Caching.persisted)
          val d0 = pruneRead(s"d${i + 1}", c.select("k"), Seq("k"), dSchema)
          val dPrime = d0.join(dIns(i).select("k"), Seq("k"), "left_anti")
            .unionByName(dIns(i))
          cur =
            if (i == n - 1) c.join(dPrime, Seq("k"))
              .select(col("vs").as("g"), col("m"), col("w"))
            else c.join(dPrime, Seq("k"))
              .select(col("vl").as("k"), col("m"), col("w"))
        }
        cur
      }

      // T0: ΔF through every post-state level
      val t0 = forward(zf.select(col("k"), col("m"), col("w")), 0)

      // T_i per level: backward restrict at pre-state, signed join at
      // level i, forward at post-state above it
      val terms = (0 until n).map { i =>
        // backward: which pre-state level-j rows reach ΔDi's keys
        var need = zds(i).select(col("k").as("v")).distinct()
        val links = new Array[DataFrame](i) // pre-state rows of levels j < i
        for (j <- (i - 1) to 0 by -1) {
          // mirror rows are the SAME (k, vl, vs) rows bucketed by vl, so
          // bucket pruning on the needed VALUES is exact; restrict to
          // rows whose value is actually needed
          val lj = pruneRead(s"d${j + 1}m", need, Seq("v"), dSchema)
          val restricted = lj
            .join(need, lj("vl") === need("v"), "left_semi")
            .transform(graft.operators.Caching.persisted)
          links(j) = restricted
          need = restricted.select(col("k").as("v")).distinct()
        }
        // facts reaching the lowest needed keys (ΔDi's own keys if i = 0)
        val fPart =
          if (i == 0) pruneRead("f", zds(0).select("k"), Seq("k"), fSchema)
          else pruneRead("f", need.select(col("v").as("k")), Seq("k"), fSchema)
            .join(need, col("k") === col("v"), "left_semi")
        // forward at PRE-state through levels 1..i−1
        var cur = fPart.select(col("k"), col("m"), lit(1L).as("w"))
        for (j <- 0 until i)
          cur = cur.join(links(j), Seq("k"))
            .select(col("vl").as("k"), col("m"), col("w"))
        // the signed join at level i (weights multiply)
        val zi = zds(i).withColumnRenamed("w", "wz")
        val atI =
          if (i == n - 1) cur.join(zi, Seq("k"))
            .select(col("vs").as("g"), col("m"), (col("w") * col("wz")).as("w"))
          else cur.join(zi, Seq("k"))
            .select(col("vl").as("k"), col("m"), (col("w") * col("wz")).as("w"))
        // forward at POST-state through the levels above
        if (i == n - 1) atI else forward(atI, i + 1)
      }

      val dAgg = (t0 +: terms).reduce(_ unionByName _)
        .groupBy("g")
        .agg(sum(col("m") * col("w")).as("dm"), sum(col("w")).as("dc"))
        .filter(col("dm") =!= 0 || col("dc") =!= 0)

      val nil = lit(null).cast("long")
      val nils = lit(null).cast("string")
      val fDelta = zf.select(lit("f").as("tbl"), col("k"), nil.as("vl"),
        nils.as("vs"), col("id"), nils.as("g"), col("m"), nil.as("c"),
        nil.as("b"), col("w"))
      val dDeltas = (0 until n).map { i =>
        zds(i).select(lit(s"d${i + 1}").as("tbl"), col("k"), col("vl"),
          col("vs"), nil.as("id"), nils.as("g"), nil.as("m"), nil.as("c"),
          nil.as("b"), col("w"))
      }
      val aDelta = dAgg.select(lit("a").as("tbl"), nil.as("k"), nil.as("vl"),
        nils.as("vs"), nil.as("id"), col("g"), col("dm").as("m"),
        col("dc").as("c"), nil.as("b"), nil.as("w"))
      val cDelta = dAgg.select(lit("c").as("tbl"), nil.as("k"), nil.as("vl"),
        nils.as("vs"), nil.as("id"), col("g"), col("dm").as("m"),
        col("dc").as("c"), lit(batchId).as("b"), nil.as("w"))
      (Seq(fDelta) ++ dDeltas ++ Seq(aDelta, cDelta)).reduce(_ unionByName _)
    }

    try {
      if (!(batchId >= 0 && fs.exists(staged))) {
        val tmp = new Path(s"$path/$stagedName.tmp")
        computeDelta().write.mode("overwrite").parquet(tmp.toString)
        fs.delete(staged, true)
        require(fs.rename(tmp, staged), s"stage delta $staged")
      }
      val delta = spark.read.parquet(staged.toString)
        .persist()
      // independent marker-guarded tables — applied CONCURRENTLY (the
      // staged protocol never relies on table order)
      try MvPipeline.applyConcurrently(
        Seq(() => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "f").select("k", "id", "m", "w"),
          s"$path/f", mergeF, batchId, numBuckets, Seq("k"))) ++
        (1 to n).flatMap { i =>
          val rows = delta.filter(col("tbl") === s"d$i").select("k", "vl", "vs", "w")
          Seq(() => MvPipeline.upsertBucketedMerge(rows, s"$path/d$i",
            mergeSigned, batchId, numBuckets, Seq("k"))) ++
          // mirror (levels below the top only — the backward walk's probe)
          (if (i < n) Seq(() => MvPipeline.upsertBucketedMerge(rows, s"$path/d${i}m",
            mergeSigned, batchId, numBuckets, Seq("vl"))) else Nil)
        } ++
        Seq(() => MvPipeline.upsertBucketedMerge(
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

  private def mergeF(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("w")) old.drop("w") else old
    val plus = inc.filter(col("w") === 1L).drop("w")
    val minus = inc.filter(col("w") === -1L).select("id").distinct()
    o.unionByName(plus).distinct().join(minus, Seq("id"), "left_anti")
  }

  private def mergeSigned(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("w")) old.drop("w") else old
    val plus = inc.filter(col("w") === 1L).drop("w")
    val minus = inc.filter(col("w") === -1L).drop("w")
    val cond = Seq("k", "vl", "vs").map(c => o(c) <=> minus(c)).reduce(_ && _)
    o.join(minus, cond, "left_anti").unionByName(plus).distinct()
  }

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

  /** BOOTSTRAP: initialize a FRESH state dir from the batch tables —
    * the corpus enters through one N-way batch join (what the engine
    * would serve anyway) instead of per-batch delta machinery (measured
    * on the near-dup family at ~10× the batch cost per slice; the
    * depth-3 rehearsal's corpus-quarter folds ran 25-79 s where the
    * batch recompute is sub-second). Writes facts, every level and its
    * mirror, the aggregate, and ONE baseline changelog row per group
    * stamped `baselineBatch` — the as-of floor (history before the
    * bootstrap does not exist, exactly like a changelog compaction at
    * that floor). Continuation folds must use batch ids ABOVE
    * `baselineBatch`. Refuses a live state dir. */
  def bootstrap(facts: DataFrame, factK: String, factId: String, factM: String,
      dims: Seq[DataFrame], dimCols: Seq[(String, String)],
      stateDir: String, baselineBatch: Long = 0L, numBuckets: Int = 16): Unit = {
    val n = dims.size
    require(n >= 1 && dimCols.size == n, "one (key, value) column pair per level")
    val spark = facts.sparkSession
    val path = s"$stateDir/joinaggn"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(path)),
      s"bootstrap requires a fresh state dir, found $path")
    val fIn = facts.select(col(factK).cast("long").as("k"),
        col(factId).cast("long").as("id"), col(factM).cast("long").as("m"))
      .groupBy("id").agg(min(struct(col("k"), col("m"))).as("s"))
      .select(col("id"), col("s.k").as("k"), col("s.m").as("m"))
      .transform(graft.operators.Caching.persisted)
    val dIns = dims.zipWithIndex.map { case (df, i) =>
      val (kc, vc) = dimCols(i)
      val base =
        if (i == n - 1) df.select(col(kc).cast("long").as("k"),
          lit(null).cast("long").as("vl"), col(vc).cast("string").as("vs"))
        else df.select(col(kc).cast("long").as("k"),
          col(vc).cast("long").as("vl"), lit(null).cast("string").as("vs"))
      base.groupBy("k").agg(max(col("vl")).as("vl"), max(col("vs")).as("vs"))
        .transform(graft.operators.Caching.persisted)
    }
    MvPipeline.upsertBucketedMerge(fIn.select("k", "id", "m"), s"$path/f",
      (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets, Seq("k"))
    for (i <- 1 to n) {
      MvPipeline.upsertBucketedMerge(dIns(i - 1), s"$path/d$i",
        (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets, Seq("k"))
      if (i < n)
        MvPipeline.upsertBucketedMerge(dIns(i - 1), s"$path/d${i}m",
          (old, inc) => old.unionByName(inc).distinct(), -1L, numBuckets, Seq("vl"))
    }
    // the batch aggregate once, as both the materialized rows and the
    // baseline changelog row per group
    var cur = fIn.select(col("k"), col("m"))
    for (i <- 0 until n)
      cur =
        if (i == n - 1) cur.join(dIns(i), Seq("k"))
          .select(col("vs").as("g"), col("m"))
        else cur.join(dIns(i), Seq("k")).select(col("vl").as("k"), col("m"))
    val agg = cur.groupBy("g")
      .agg(sum(col("m")).as("m"), count(lit(1)).as("c"))
      .transform(graft.operators.Caching.persisted)
    val aRows = agg.select(lit("a").as("kind"), col("g"),
        lit(null).cast("long").as("b"), col("m"), col("c"))
      .unionByName(agg.select(lit("c").as("kind"), col("g"),
        lit(baselineBatch).as("b"), col("m"), col("c")))
    MvPipeline.upsertBucketedMerge(aRows, s"$path/a", mergeA, -1L,
      numBuckets, Seq("g"))
    graft.operators.Caching.releaseAll()
  }

  /** `(g, total, rows)` == the batch N-way chain join-aggregate. */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggn/a", aSchema)
      .filter(col("kind") === "a" && col("c") > 0)
      .select(col("g"), col("m").as("total"), col("c").as("rows"))

  /** Z-set changelog `(batch, g, dtotal, drows)`. */
  def changelog(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/joinaggn/a", aSchema)
      .filter(col("kind") === "c")
      .select(col("b").as("batch"), col("g"), col("m").as("dtotal"),
        col("c").as("drows"))
}
