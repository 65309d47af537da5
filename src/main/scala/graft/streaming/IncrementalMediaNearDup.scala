package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.operators.TextOps

/** Continuously-maintained PERCEPTUAL near-dup clustering over 64-bit
  * fingerprints — the image/audio member completing the streaming dedup
  * family's batch/streaming matrix (text MinHash [[IncrementalNearDup]],
  * embedding cosine [[IncrementalEmbedNearDup]], and now the
  * [[graft.operators.Dedup.hammingPairs]] family: aHash64 images,
  * audioHash64 WAVs, or any other 64-bit fingerprint).
  *
  * Semantics maintained: connected components over verified pairs
  * (Hamming(simhash) ≤ maxHamming), labels = component-min doc id — the
  * batch `Dedup.imageNearDupPairs/audioNearDupPairs → clusters` view.
  * Candidates are blocked EXACTLY like batch: equal 16-bit chunks
  * (complete for maxHamming ≤ 3 by pigeonhole), Δ-against-state — the
  * batch's chunks join the maintained chunk index plus within-batch
  * chunks; verification is exact Hamming over stored hashes; relabeling
  * is the shared [[LabelMaintenance]] monotone min-label lattice.
  *
  * State is ONE table `(kind, doc_id, chunk_idx, chunk, simhash, label)`
  * in the bucketed layout ([[MvPipeline.upsertBucketedStaged]], bucketed
  * by `doc_id`): `c` rows = chunk block index, `h` rows = fingerprints,
  * `l` rows = labels. Per batch the write is the staged delta (batch
  * c/h rows + changed labels only); per-bucket merges are semilattice
  * ops (c/h set-union, per-doc min label) — idempotent under replay.
  * Hashing the payloads happens BEFORE the fold (one codegen'd
  * projection; payload bytes never enter state — state is 8 bytes + 4
  * chunk rows per doc, tiny next to the media corpus). */
object IncrementalMediaNearDup {

  private[streaming] val stateSchema = StructType(Seq(
    StructField("kind", StringType), StructField("doc_id", LongType),
    StructField("chunk_idx", IntegerType), StructField("chunk", LongType),
    StructField("simhash", LongType), StructField("label", LongType)))

  private[streaming] val bidxSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("chunk_idx", IntegerType),
    StructField("chunk", LongType)))

  private val probeKeys = Seq("chunk_idx", "chunk")

  /** Fold one micro-batch of `(doc_id, payload: binary BMP)` images into
    * the `imgneardup` state (batch twin: x46's pair view → clusters). */
  def processBatchImages(media: DataFrame, maxHamming: Int = 3,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16,
      movedDir: Option[String] = None): Unit =
    processHashes(media.select(col("doc_id"),
        graft.functions.imageAHash(col("payload")).as("simhash")),
      "imgneardup", maxHamming, stateDir, batchId, numBuckets,
      movedDir = movedDir)

  /** Fold one micro-batch of `(doc_id, payload: binary PCM16 WAV)` into
    * the `audneardup` state (batch twin: x49's pair view → clusters). */
  def processBatchAudio(media: DataFrame, maxHamming: Int = 3,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16,
      movedDir: Option[String] = None): Unit =
    processHashes(media.select(col("doc_id"),
        graft.functions.audioHash(col("payload")).as("simhash")),
      "audneardup", maxHamming, stateDir, batchId, numBuckets,
      movedDir = movedDir)

  /** The generic fold: `(doc_id, simhash)` rows (null hashes = malformed
    * payloads, dropped — the batch decoders' barrier) into the named
    * state table. Public so any 64-bit fingerprint family (e.g. text
    * SimHash) can be maintained the same way. */
  def processHashes(hashes: DataFrame, view: String, maxHamming: Int,
      stateDir: String, batchId: Long = -1L, numBuckets: Int = 16,
      driverThreshold: Long = 1000000L, maxIter: Int = 20,
      movedDir: Option[String] = None): Unit = {
    require(movedDir.isEmpty || batchId >= 0,
      "movedDir requires a replay-stamped batch id (>= 0): an ad-hoc fold " +
        "stages a FRESH uniquely-named artifact per re-run (no exists-skip), " +
        "so duplicate pending artifacts would accumulate (MovedLog.artifactPath)")
    val spark = hashes.sparkSession
    val path = s"$stateDir/$view"
    val bidx = s"$stateDir/${view}_bidx"
    val lbl = s"$stateDir/${view}_lbl"
    backfillBidx(spark, path, bidx, numBuckets)
    LabelMirror.backfill(spark, path, lbl, stateSchema, "doc_id", numBuckets)
    MvPipeline.upsertBucketedStaged(spark, path, {
      val newH = hashes.filter(col("simhash").isNotNull)
        .select(col("doc_id").cast("long").as("doc_id"), col("simhash"))
        .transform(graft.operators.Caching.persisted)
      val chunkCols = (0 until 4).map(c =>
        shiftright(col("simhash"), 16 * c).bitwiseAND(0xffffL))
      val newC = newH.select(col("doc_id"),
        posexplode(array(chunkCols: _*)).as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx").cast("int"),
          col("chunk").cast("long"))
        .transform(graft.operators.Caching.persisted)

      // persisted per-kind projections: lineage cut against the N-bucket
      // union scan (see [[IncrementalNearDup]])
      // PRUNED chunk-index read: probe only the state buckets the
      // batch's (chunk_idx, chunk) pairs hash into
      val oldC = MvPipeline.readBuckets(spark, bidx,
          MvPipeline.bucketIdsOf(newC, probeKeys, numBuckets), bidxSchema)
        .transform(graft.operators.Caching.persisted)
      // labels from the slim (doc_id, label) mirror (r12, [[LabelMirror]])
      val oldL = LabelMirror.readAll(spark, lbl, path, stateSchema, "doc_id")
        .transform(graft.operators.Caching.persisted)

      val allC = oldC.unionByName(newC)
      val cand = newC.as("a")
        .join(allC.as("b"),
          col("a.chunk_idx") === col("b.chunk_idx") &&
            col("a.chunk") === col("b.chunk") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("id1"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("id2"))
        .distinct()
        .transform(graft.operators.Caching.persisted)

      // PRUNED verification read (two-phase): stored hashes only from
      // the buckets the candidate ids hash into
      val candIds = cand.select(col("id1").as("doc_id"))
        .unionByName(cand.select(col("id2").as("doc_id")))
      val oldH = MvPipeline.readBuckets(spark, path,
          MvPipeline.bucketIdsOf(candIds, Seq("doc_id"), numBuckets), stateSchema)
        .filter(col("kind") === "h").select("doc_id", "simhash")
        .transform(graft.operators.Caching.persisted)

      // exact Hamming verification over stored hashes — identical kernel
      // to the batch pair view (bit_count of xor)
      val allH = oldH.unionByName(newH)
      val edges = cand
        .join(allH.select(col("doc_id").as("id1"), col("simhash").as("h1")), "id1")
        .join(allH.select(col("doc_id").as("id2"), col("simhash").as("h2")), "id2")
        .filter(TextOps.hamming(col("h1"), col("h2")) <= maxHamming)
        .select(col("id1").cast("long"), col("id2").cast("long"))
        .transform(graft.operators.Caching.persisted)

      val selfSeeds = newH.select(col("doc_id"), col("doc_id").as("label"))
      val lAll = oldL.unionByName(selfSeeds)
      val lDelta = LabelMaintenance
        .relabelDelta(edges, lAll, driverThreshold, maxIter)
        .unionByName(selfSeeds)
        .groupBy("doc_id").agg(min("label").as("label"))
        .join(oldL, Seq("doc_id", "label"), "left_anti")

      packC(newC).unionByName(packH(newH)).unionByName(packL(lDelta))
    }, merge, batchId, numBuckets, Seq("doc_id"),
      secondaries = Seq(MvPipeline.StagedSecondary(bidx,
        d => d.filter(col("kind") === "c")
          .select("doc_id", "chunk_idx", "chunk"),
        (old, inc) => old.unionByName(inc).distinct(),
        probeKeys),
        LabelMirror.secondary(lbl, "doc_id")),
      // moved-keys log (R176): see [[IncrementalNearDup.movedOf]].
      // Artifact names are VIEW-qualified — this engine maintains two
      // views (img/aud) under one stateDir, and un-qualified batch-id
      // names would exists-skip the second view's moves if a caller
      // pointed both at one dir (the MovedLog contract still wants
      // distinct dirs per view; the qualifier makes the mistake safe)
      artifacts = movedDir.toSeq.map { md =>
        (MovedLog.artifactPath(md, s"${view}_b", batchId), (d: DataFrame) =>
          IncrementalNearDup.movedOf(spark, d.filter(col("kind") === "l")
            .select(col("doc_id"), col("label").as("new_label")),
            lbl, "doc_id", numBuckets))
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
            .filter(col("kind") === "c")
            .select("doc_id", "chunk_idx", "chunk"),
          tmp, (old, inc) => old.unionByName(inc).distinct(),
          -1L, numBuckets, probeKeys)
      }
  }

  /** Per-bucket semilattice merge: c/h rows set-union, labels per-doc
    * `min` — idempotent under delta re-application. */
  private def merge(old: DataFrame, inc: DataFrame): DataFrame = {
    val all = old.unionByName(inc)
    val ch = all.filter(col("kind") =!= "l").distinct()
    val l = all.filter(col("kind") === "l")
      .groupBy("doc_id").agg(min("label").as("label"))
    ch.unionByName(packL(l))
  }

  private def packC(c: DataFrame): DataFrame =
    c.select(lit("c").as("kind"), col("doc_id"), col("chunk_idx"),
      col("chunk"), lit(null).cast("bigint").as("simhash"),
      lit(null).cast("bigint").as("label"))

  private def packH(h: DataFrame): DataFrame =
    h.select(lit("h").as("kind"), col("doc_id"),
      lit(null).cast("int").as("chunk_idx"), lit(null).cast("bigint").as("chunk"),
      col("simhash"), lit(null).cast("bigint").as("label"))

  private def packL(l: DataFrame): DataFrame =
    l.select(lit("l").as("kind"), col("doc_id"),
      lit(null).cast("int").as("chunk_idx"), lit(null).cast("bigint").as("chunk"),
      lit(null).cast("bigint").as("simhash"), col("label"))

  /** Continuous maintenance over a directory of parquet files carrying
    * `(doc_id, payload)` rows (media payloads are binary — parquet, not
    * JSON lines, is the transport). `hash` picks the fingerprint:
    * [[processBatchImages]]'s aHash64 or [[processBatchAudio]]'s
    * audioHash64 semantics via the view name. */
  def start(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      stateDir: String, checkpointDir: String,
      media: String, // "image" | "audio"
      maxHamming: Int = 3,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(media == "image" || media == "audio", s"unknown media $media")
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (media == "image")
          processBatchImages(batch, maxHamming, stateDir, batchId)
        else processBatchAudio(batch, maxHamming, stateDir, batchId)
      }
      .start()
  }

  /** `(doc_id, label)` for every payload seen — label = min doc id of
    * the Hamming component (batch pairs→clusters served from state). */
  def labels(spark: SparkSession, stateDir: String, view: String): DataFrame =
    LabelMirror.readAll(spark, s"$stateDir/${view}_lbl",
      s"$stateDir/$view", stateSchema, "doc_id")

  /** The retained set: component representatives. */
  def representatives(spark: SparkSession, stateDir: String,
      view: String): DataFrame =
    labels(spark, stateDir, view).filter(col("doc_id") === col("label"))
      .select("doc_id")

  /** Retention compaction — same horizon contract as
    * [[IncrementalNearDup.compact]]: frozen docs drop their `c`/`h`
    * rows, keep `l`; future pairs whose only witness is frozen are
    * missed (documented). */
  def compact(spark: SparkSession, stateDir: String, view: String,
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
    sweep(s"$stateDir/$view", col("kind") === "l" || !frozen) +
      sweep(s"$stateDir/${view}_bidx", !frozen)
  }

  /** Deletion-EXACT forget ([[ForgetMaintenance]], R147): remove docs so
    * [[labels]] equals the batch x46/x49 pairs→clusters sweep over
    * corpus-minus-forgotten. `maxHamming` must match the folds'. Exact
    * while affected components' survivors are live; throws otherwise. */
  def forget(spark: SparkSession, stateDir: String, view: String,
      ids: DataFrame, maxHamming: Int = 3, opId: Long = -1L,
      numBuckets: Int = 16, driverThreshold: Long = 1000000L,
      maxIter: Int = 20, movedDir: Option[String] = None): Long =
    ForgetMaintenance.forget(spark, ids,
      s"$stateDir/$view", s"$stateDir/${view}_bidx",
      s"$stateDir/${view}_lbl", "doc_id",
      stateSchema, payloadKind = "h", packL = packL,
      mirrorOf = rows => rows.filter(col("kind") === "c")
        .select("doc_id", "chunk_idx", "chunk"),
      mirrorKeys = probeKeys,
      candidates = rows => {
        val c = rows.filter(col("kind") === "c")
          .select("doc_id", "chunk_idx", "chunk")
        c.as("a").join(c.as("b"),
            col("a.chunk_idx") === col("b.chunk_idx") &&
              col("a.chunk") === col("b.chunk") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
          .distinct()
      },
      verify = (cand, rows) => {
        val h = rows.filter(col("kind") === "h").select("doc_id", "simhash")
        cand
          .join(h.select(col("doc_id").as("id1"), col("simhash").as("h1")), "id1")
          .join(h.select(col("doc_id").as("id2"), col("simhash").as("h2")), "id2")
          .filter(TextOps.hamming(col("h1"), col("h2")) <= maxHamming)
          .select(col("id1"), col("id2"))
      },
      opId = opId, numBuckets = numBuckets,
      driverThreshold = driverThreshold, maxIter = maxIter,
      movedPath = movedDir, movedKind = s"${view}_f")
}
