package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}

import graft.functions.{dotProduct, l2Norm, pround6}
import graft.operators.Similarity

/** Continuously-maintained EMBEDDING near-dup clustering — the cosine
  * member of the streaming dedup family, completing the symmetry with
  * [[IncrementalNearDup]] (text MinHash): semantic duplicates (re-encoded
  * crawls, template paraphrases) are caught at ingest without re-running
  * the batch LSH sweep over the whole vector corpus.
  *
  * Semantics maintained: the batch
  * [[Similarity.embeddingNearDupPairsLsh]] → clusters view — candidates
  * from OR-of-`numTables` hyperplane-LSH buckets INSIDE each `label`
  * block (the SAME deterministic hyperplanes as batch, so candidates are
  * identical), verified by exact cosine (round(cos,6) ≥ threshold), each
  * vector labeled with its component's MIN vec_id, singletons labeling
  * themselves. High-threshold regime only, exactly like batch (recall
  * 1−(1−p^bits)^tables per pair; NOT complete at low thresholds — the
  * documented [[Similarity.embeddingNearDupPairs]] contract).
  *
  * Maintenance is [[LabelMaintenance]]'s monotone min-label lattice; per
  * batch everything is Δ-against-state:
  *   1. normalize + bucket the BATCH vectors only;
  *   2. candidates = ΔB ⋈ (B ∪ ΔB) on (blk, table_idx, bucket);
  *   3. verify by exact cosine over stored vectors (state is O(docs ×
  *      dim) — the vectors ARE the verification corpus, same asymptotics
  *      as the batch pipeline's persisted frame);
  *   4. relabel only the components a verified new edge touches
  *      ([[LabelMaintenance.relabelDelta]]).
  *
  * State is ONE table `(kind, vec_id, blk, table_idx, bucket, v, norm,
  * label)` in the BUCKETED layout ([[MvPipeline.upsertBucketedStaged]],
  * bucketed by `vec_id`): `b` rows = bucket index, `v` rows = normalized
  * vectors, `l` rows = labels. Per batch the write is the staged delta
  * (batch b/v rows + affected labels) — bytes rewritten ∝ touched
  * buckets, not total state; every per-bucket merge is a semilattice op
  * (b/v set-union, per-vec min label), so replay re-application is
  * idempotent and re-sent ids cannot create conflicting label rows. */
object IncrementalEmbedNearDup {

  private[streaming] val stateSchema = StructType(Seq(
    StructField("kind", StringType), StructField("vec_id", LongType),
    StructField("blk", LongType), StructField("table_idx", IntegerType),
    StructField("bucket", LongType), StructField("v", ArrayType(DoubleType)),
    StructField("norm", DoubleType), StructField("label", LongType)))

  private[streaming] val bidxSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("blk", LongType),
    StructField("table_idx", IntegerType), StructField("bucket", LongType)))

  private val probeKeys = Seq("blk", "table_idx", "bucket")

  /** Fold one micro-batch of `(vec_id, embedding, label)` vectors into
    * the maintained state. LSH parameters as
    * [[Similarity.embeddingNearDupPairsLsh]]. */
  def processBatch(embeddings: DataFrame, threshold: Double,
      numTables: Int = 8, bitsPerTable: Int = 6, dim: Int = 64,
      stateDir: String, batchId: Long = -1L,
      driverThreshold: Long = 1000000L, maxIter: Int = 20,
      numBuckets: Int = 16, movedDir: Option[String] = None): Unit = {
    require(movedDir.isEmpty || batchId >= 0,
      "movedDir requires a replay-stamped batch id (>= 0): an ad-hoc fold " +
        "stages a FRESH uniquely-named artifact per re-run (no exists-skip), " +
        "so duplicate pending artifacts would accumulate (MovedLog.artifactPath)")
    val spark = embeddings.sparkSession
    val path = s"$stateDir/embneardup"
    val bidx = s"$stateDir/embneardup_bidx"
    val lbl = s"$stateDir/embneardup_lbl"
    backfillBidx(spark, path, bidx, numBuckets)
    LabelMirror.backfill(spark, path, lbl, stateSchema, "vec_id", numBuckets)
    MvPipeline.upsertBucketedStaged(spark, path, {
      val tables = (0 until numTables).map { t =>
        Similarity.lshBucket(col("v"),
          Similarity.hyperplanes(bitsPerTable, dim, seed = 1000L + t))
      }
      val e = embeddings.filter(col("embedding").isNotNull)
        .select(col("vec_id").cast("long"), col("label").cast("long").as("blk"),
          Similarity.asDouble(col("embedding")).as("v"))
        .withColumn("norm", l2Norm(col("v")))
        .transform(graft.operators.Caching.persisted)
      val newB = e.select(col("vec_id"), col("blk"),
        posexplode(array(tables: _*)).as(Seq("table_idx", "bucket")))
        .select(col("vec_id"), col("blk"),
          col("table_idx").cast("int"), col("bucket").cast("long"))
        .transform(graft.operators.Caching.persisted)
      val newV = e.select(col("vec_id"), col("blk"), col("v"), col("norm"))

      // persisted per-kind projections: lineage cut against the N-bucket
      // union scan being re-serialized per reference (see
      // [[IncrementalNearDup]] — measured plan explosion without it)
      // PRUNED bucket-index read: probe only the state buckets the
      // batch's (blk, table, bucket) triples hash into
      val oldB = MvPipeline.readBuckets(spark, bidx,
          MvPipeline.bucketIdsOf(newB, probeKeys, numBuckets), bidxSchema)
        .transform(graft.operators.Caching.persisted)
      // labels from the slim (vec_id, label) mirror (r12, [[LabelMirror]])
      val oldL = LabelMirror.readAll(spark, lbl, path, stateSchema, "vec_id")
        .transform(graft.operators.Caching.persisted)

      val allB = oldB.unionByName(newB)
      val cand = newB.as("a")
        .join(allB.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.table_idx") === col("b.table_idx") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(least(col("a.vec_id"), col("b.vec_id")).as("id1"),
          greatest(col("a.vec_id"), col("b.vec_id")).as("id2"))
        .distinct()
        .transform(graft.operators.Caching.persisted)

      // PRUNED verification read (two-phase): stored vectors only from
      // the buckets the candidate ids hash into
      val candIds = cand.select(col("id1").as("vec_id"))
        .unionByName(cand.select(col("id2").as("vec_id")))
      val oldV = MvPipeline.readBuckets(spark, path,
          MvPipeline.bucketIdsOf(candIds, Seq("vec_id"), numBuckets), stateSchema)
        .filter(col("kind") === "v")
        .select("vec_id", "blk", "v", "norm")
        .transform(graft.operators.Caching.persisted)

      // exact cosine verification against stored vectors — identical
      // rounding contract to the batch pipeline (pround6 before threshold)
      val allV = oldV.unionByName(newV)
        .transform(graft.operators.Caching.persisted)
      val edges = cand
        .join(allV.select(col("vec_id").as("id1"), col("v").as("v1"),
          col("norm").as("n1")), "id1")
        .join(allV.select(col("vec_id").as("id2"), col("v").as("v2"),
          col("norm").as("n2")), "id2")
        .select(col("id1"), col("id2"),
          pround6(dotProduct(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("cos"))
        .filter(col("cos") >= threshold)
        .select(col("id1"), col("id2"))
        .transform(graft.operators.Caching.persisted)

      val selfSeeds = e.select(col("vec_id").as("doc_id"),
        col("vec_id").as("label"))
      val lAll = oldL.withColumnRenamed("vec_id", "doc_id")
        .unionByName(selfSeeds)
      // one Δ row per doc, and ONLY rows that differ from state (changed
      // labels + new vectors) — unchanged components don't touch buckets
      val lDelta = LabelMaintenance
        .relabelDelta(edges, lAll, driverThreshold, maxIter)
        .unionByName(selfSeeds)
        .groupBy("doc_id").agg(min("label").as("label"))
        .join(oldL.withColumnRenamed("vec_id", "doc_id"),
          Seq("doc_id", "label"), "left_anti")
        .withColumnRenamed("doc_id", "vec_id")

      packB(newB).unionByName(packV(newV)).unionByName(packL(lDelta))
    }, merge, batchId, numBuckets, Seq("vec_id"),
      secondaries = Seq(MvPipeline.StagedSecondary(bidx,
        d => d.filter(col("kind") === "b")
          .select("vec_id", "blk", "table_idx", "bucket"),
        (old, inc) => old.unionByName(inc).distinct(),
        probeKeys),
        LabelMirror.secondary(lbl, "vec_id")),
      // moved-keys log (R176): see [[IncrementalNearDup.movedOf]]
      artifacts = movedDir.toSeq.map { md =>
        (MovedLog.artifactPath(md, "b", batchId), (d: DataFrame) =>
          IncrementalNearDup.movedOf(spark, d.filter(col("kind") === "l")
            .select(col("vec_id"), col("label").as("new_label")),
            lbl, "vec_id", numBuckets))
      })
    graft.operators.Caching.releaseAll()
  }

  /** One-time mirror build for a legacy state dir (see
    * [[IncrementalNearDup.backfillBidx]]'s contract). */
  private def backfillBidx(spark: SparkSession, path: String, bidx: String,
      numBuckets: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasBuckets(p: String): Boolean = {
      val b = new org.apache.hadoop.fs.Path(p)
      fs.exists(b) && fs.listStatus(b)
        .exists(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
    }
    if (hasBuckets(path) && !hasBuckets(bidx))
      // atomic (buildFresh): a crashed partial mirror must not pass the
      // existence guard — pruned candidate reads would silently miss
      MvPipeline.buildFresh(spark, bidx) { tmp =>
        MvPipeline.upsertBucketedMerge(
          MvPipeline.readBucketedState(spark, path)
            .filter(col("kind") === "b")
            .select("vec_id", "blk", "table_idx", "bucket"),
          tmp, (old, inc) => old.unionByName(inc).distinct(),
          -1L, numBuckets, probeKeys)
      }
  }

  /** Per-bucket semilattice merge: b/v rows set-union, labels per-vec
    * `min` — idempotent under delta re-application. */
  private def merge(old: DataFrame, inc: DataFrame): DataFrame = {
    val all = old.unionByName(inc)
    val bv = all.filter(col("kind") =!= "l").distinct()
    val l = all.filter(col("kind") === "l")
      .groupBy("vec_id").agg(min("label").as("label"))
    bv.unionByName(packL(l))
  }

  private def packB(b: DataFrame): DataFrame =
    b.select(lit("b").as("kind"), col("vec_id"), col("blk"),
      col("table_idx"), col("bucket"),
      lit(null).cast("array<double>").as("v"), lit(null).cast("double").as("norm"),
      lit(null).cast("bigint").as("label"))

  private def packV(v: DataFrame): DataFrame =
    v.select(lit("v").as("kind"), col("vec_id"), col("blk"),
      lit(null).cast("int").as("table_idx"), lit(null).cast("bigint").as("bucket"),
      col("v"), col("norm"), lit(null).cast("bigint").as("label"))

  private def packL(l: DataFrame): DataFrame =
    l.select(lit("l").as("kind"), col("vec_id"),
      lit(null).cast("bigint").as("blk"),
      lit(null).cast("int").as("table_idx"), lit(null).cast("bigint").as("bucket"),
      lit(null).cast("array<double>").as("v"), lit(null).cast("double").as("norm"),
      col("label"))

  /** `(vec_id, cluster)` for every vector seen — cluster = min vec_id of
    * the near-dup component (the batch pairs→clusters read from state). */
  def labels(spark: SparkSession, stateDir: String): DataFrame =
    LabelMirror.readAll(spark, s"$stateDir/embneardup_lbl",
      s"$stateDir/embneardup", stateSchema, "vec_id")
      .select(col("vec_id"), col("label").as("cluster"))

  /** The retained set: component representatives. */
  def representatives(spark: SparkSession, stateDir: String): DataFrame =
    labels(spark, stateDir).filter(col("vec_id") === col("cluster"))
      .select("vec_id")

  /** Continuous maintenance over JSON-line files with `schema`
    * (`(vec_id, embedding, label)` rows). */
  def start(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      stateDir: String, checkpointDir: String, threshold: Double,
      numTables: Int = 8, bitsPerTable: Int = 6, dim: Int = 64,
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
        processBatch(batch, threshold, numTables, bitsPerTable, dim,
          stateDir, batchId)
      }
      .start()

  /** Retention compaction — same horizon contract as
    * [[IncrementalNearDup.compact]]: frozen vectors drop their `v`
    * (vector) and `b` (bucket-index) rows — the O(docs × dim) bulk —
    * and keep `l`, so reads stay exact and live members still bridge
    * new arrivals into frozen components; future pairs whose only
    * witness is a frozen vector are missed (documented). */
  def compact(spark: SparkSession, stateDir: String,
      frozen: org.apache.spark.sql.Column): Long = {
    def sweep(dir: String, keep: org.apache.spark.sql.Column): Long = {
      val base = new org.apache.hadoop.fs.Path(dir)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(base)) return 0L
      fs.listStatus(base)
        .filter(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
        .map(b => MvPipeline.expireState(spark, b.getPath.toString, keep))
        .sum
    }
    sweep(s"$stateDir/embneardup", col("kind") === "l" || !frozen) +
      sweep(s"$stateDir/embneardup_bidx", !frozen)
  }

  /** BOOTSTRAP: initialize a FRESH state dir from the one-shot batch
    * sweep ([[IncrementalNearDup.bootstrap]]'s contract for the cosine
    * member): pairs from [[Similarity.embeddingNearDupPairsLsh]] (the
    * SAME deterministic hyperplane tables as the folds ⇒ identical
    * candidates), components once, state rows + probe mirror written
    * directly; folds continue exactly on top. Refuses a live dir. */
  def bootstrap(embeddings: DataFrame, threshold: Double,
      numTables: Int = 8, bitsPerTable: Int = 6, dim: Int = 64,
      stateDir: String, numBuckets: Int = 16, maxIter: Int = 20,
      driverThreshold: Long = 1000000L): Unit = {
    val spark = embeddings.sparkSession
    val path = s"$stateDir/embneardup"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(path)),
      s"bootstrap requires a fresh state dir, found $path")
    val tables = (0 until numTables).map { t =>
      Similarity.lshBucket(col("v"),
        Similarity.hyperplanes(bitsPerTable, dim, seed = 1000L + t))
    }
    val e = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id").cast("long"), col("label").cast("long").as("blk"),
        Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2Norm(col("v")))
      .transform(graft.operators.Caching.persisted)
    val b = e.select(col("vec_id"), col("blk"),
        posexplode(array(tables: _*)).as(Seq("table_idx", "bucket")))
      .select(col("vec_id"), col("blk"),
        col("table_idx").cast("int"), col("bucket").cast("long"))
      .transform(graft.operators.Caching.persisted)
    val v = e.select(col("vec_id"), col("blk"), col("v"), col("norm"))
    val pairs = Similarity.embeddingNearDupPairsLsh(embeddings, threshold,
      numTables, bitsPerTable, dim).select("id1", "id2")
    val cl = graft.operators.Dedup.clusters(pairs, maxIter, driverThreshold)
      .withColumnRenamed("id", "vec_id")
    val l = e.select("vec_id").distinct()
      .join(cl, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("cluster"), col("vec_id")).as("label"))
    MvPipeline.upsertBucketedMerge(
      packB(b).unionByName(packV(v)).unionByName(packL(l)),
      path, merge, -1L, numBuckets, Seq("vec_id"))
    MvPipeline.upsertBucketedMerge(
      b.select("vec_id", "blk", "table_idx", "bucket"),
      s"$stateDir/embneardup_bidx",
      (old, inc) => old.unionByName(inc).distinct(),
      -1L, numBuckets, probeKeys)
    LabelMirror.write(l, s"$stateDir/embneardup_lbl", "vec_id", numBuckets)
    graft.operators.Caching.releaseAll()
  }

  /** Deletion-EXACT forget ([[ForgetMaintenance]], R147): remove vectors
    * so [[labels]] equals the batch x6 pairs→clusters sweep over
    * corpus-minus-forgotten. `threshold` must match the folds'. Exact
    * while affected components' survivors are live; throws otherwise. */
  def forget(spark: SparkSession, stateDir: String, ids: DataFrame,
      threshold: Double, opId: Long = -1L, numBuckets: Int = 16,
      driverThreshold: Long = 1000000L, maxIter: Int = 20,
      movedDir: Option[String] = None): Long =
    ForgetMaintenance.forget(spark, ids,
      s"$stateDir/embneardup", s"$stateDir/embneardup_bidx",
      s"$stateDir/embneardup_lbl", "vec_id",
      stateSchema, payloadKind = "v", packL = packL,
      mirrorOf = rows => rows.filter(col("kind") === "b")
        .select("vec_id", "blk", "table_idx", "bucket"),
      mirrorKeys = probeKeys,
      candidates = rows => {
        val b = rows.filter(col("kind") === "b")
          .select("vec_id", "blk", "table_idx", "bucket")
        b.as("a").join(b.as("b"),
            col("a.blk") === col("b.blk") &&
              col("a.table_idx") === col("b.table_idx") &&
              col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
          .distinct()
      },
      verify = (cand, rows) => {
        val v = rows.filter(col("kind") === "v").select("vec_id", "v", "norm")
        cand
          .join(v.select(col("vec_id").as("id1"), col("v").as("v1"),
            col("norm").as("n1")), "id1")
          .join(v.select(col("vec_id").as("id2"), col("v").as("v2"),
            col("norm").as("n2")), "id2")
          .filter(pround6(dotProduct(col("v1"), col("v2")) /
            (col("n1") * col("n2"))) >= threshold)
          .select(col("id1"), col("id2"))
      },
      opId = opId, numBuckets = numBuckets,
      driverThreshold = driverThreshold, maxIter = maxIter,
      movedPath = movedDir)
}
