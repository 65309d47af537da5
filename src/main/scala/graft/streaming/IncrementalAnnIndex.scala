package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Similarity

/** Incremental maintenance of the IVF-PQ index — the claim in
  * [[Similarity.ivfPqTopK]]'s docstring ("encode runs once at ingest and
  * is stored with the row") made real code: each micro-batch of arriving
  * embeddings is [[Similarity.encodeIvfPq]]-encoded (cell + 8 PQ codes —
  * a pure map pass against the PINNED codebooks, so encoding commutes
  * with batching trivially) and appended to the index state; queries run
  * [[Similarity.searchIvfPqEncoded]] against the accumulated state and
  * never pay the encode again.
  *
  * Replay idempotence for an APPEND-only state (the sum-merge marker of
  * [[MvPipeline.upsert]] doesn't apply): each batch writes its own
  * `batch=<id>` subdirectory with overwrite — a replayed batch rewrites
  * the same directory to the same rows. Precondition, as with
  * [[IncrementalIndex]]: a vec_id arrives in exactly one batch.
  *
  * 100 TB shape: encode is stateless codegen'd projection work sharded
  * across executors; the index grows as 8-byte codes + vectors
  * partitioned by arrival batch (repartition by `bucket` at compaction
  * time to get probe-side partition pruning). */
object IncrementalAnnIndex {

  /** Recover from a crash mid-compaction (rename-aside protocol, shared
    * with [[compact]] and called by every state access so a pending
    * `.old` never lingers into appends or reads). Commit point is the
    * rename of the rewritten copy into `base/compacted`:
    *  - `.old` next to a committed base (has `compacted`) is garbage;
    *  - `.old` next to a missing/uncommitted base IS the live index. If
    *    the crash hit between stage-out and commit, [[processBatch]]
    *    calls during the window may have appended `batch=`/`adhoc=` dirs
    *    into the recreated base — those are checkpointed increments, so
    *    they are folded INTO the aside copy (a replayed id overwrites
    *    its identical dir) before the aside is restored, never deleted. */
  private def recover(fs: org.apache.hadoop.fs.FileSystem, base: Path, aside: Path): Unit =
    if (fs.exists(aside)) {
      if (fs.exists(new Path(base, "compacted"))) fs.delete(aside, true)
      else {
        if (fs.exists(base)) {
          fs.listStatus(base).filter(_.isDirectory).foreach { st =>
            val dst = new Path(aside, st.getPath.getName)
            if (fs.exists(dst)) fs.delete(dst, true)
            require(fs.rename(st.getPath, dst), s"salvage ${st.getPath} into $aside")
          }
          fs.delete(base, true)
        }
        require(fs.rename(aside, base), s"recover $aside")
      }
    }

  private def recovered(spark: SparkSession, stateDir: String): (org.apache.hadoop.fs.FileSystem, Path) = {
    val base = new Path(s"$stateDir/ann_index")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, base, new Path(s"$stateDir/ann_index.old"))
    (fs, base)
  }

  /** Encode one micro-batch and append it to the index state. */
  def processBatch(embeddings: DataFrame, stateDir: String, batchId: Long = -1L,
      dim: Int = 64): Unit = {
    recovered(embeddings.sparkSession, stateDir)
    val part = if (batchId >= 0) s"batch=$batchId" else s"adhoc=${java.util.UUID.randomUUID}"
    Similarity.encodeIvfPq(embeddings, dim = dim)
      .write.mode("overwrite").parquet(s"$stateDir/ann_index/$part")
  }

  /** The accumulated encoded index, minus any tombstoned ids. */
  def readIndex(spark: SparkSession, stateDir: String): DataFrame = {
    val (fs, base) = recovered(spark, stateDir)
    val parts = fs.listStatus(base).filter(_.isDirectory).map(_.getPath.toString)
    require(parts.nonEmpty, s"empty index state at $base")
    val idx = parts.map(spark.read.parquet(_)).reduce(_ unionByName _)
    forgotten(spark, stateDir) match {
      // no broadcast HINT on the tombstone side: the outstanding set is
      // unbounded between compactions (many/large forgets could exceed
      // the broadcast limit and fail every read until compact() runs),
      // so let AQE pick — it broadcasts small tombstone sets anyway and
      // degrades to a shuffled anti-join for pathological ones
      case Some(f) => idx.join(f, Seq("vec_id"), "left_anti")
      case None => idx
    }
  }

  /** Lightweight deletes — the ANN member of the R147 forget family,
    * with MergeTree lightweight-DELETE economics: forgetting writes an
    * O(ids) tombstone part NOW (no index parts rewritten), every read
    * masks tombstoned ids, and the next [[compact]] purges them
    * physically and clears the tombstones. Exactness is structural —
    * index rows are independent, so search over corpus-minus-forgotten
    * equals the batch search bit-for-bit the moment the tombstone
    * lands. A replayed `batch=` dir re-inserting a forgotten id stays
    * masked (tombstones survive until the purge actually happened); an
    * id re-sent AFTER compaction is a new vector by the views' standing
    * id contract. */
  def forget(spark: SparkSession, stateDir: String, ids: DataFrame): Unit = {
    recovered(spark, stateDir)
    ids.select(org.apache.spark.sql.functions
        .col(ids.columns.head).cast("long").as("vec_id")).distinct()
      .write.mode("overwrite")
      .parquet(s"$stateDir/ann_forgotten/op=${java.util.UUID.randomUUID}")
  }

  private def forgotten(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val base = new Path(s"$stateDir/ann_forgotten")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return None
    val parts = fs.listStatus(base).filter(_.isDirectory).map(_.getPath.toString)
    if (parts.isEmpty) None
    else Some(parts.map(spark.read.parquet(_)).reduce(_ unionByName _).distinct())
  }

  /** Compact the per-batch append directories into ONE table partitioned
    * by `bucket` — after this, a probe for cells {3, 7, 11} prunes to
    * those partitions at the scan (the 100 TB read-path win; run it on
    * whatever cadence the batch-dir count warrants). */
  def compact(spark: SparkSession, stateDir: String): Unit = {
    val base = new Path(s"$stateDir/ann_index")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new Path(s"$stateDir/ann_index.old")
    recover(fs, base, aside)
    val merged = readIndex(spark, stateDir).persist()
    merged.count() // materialize before replacing the dirs being read
    val tmp = new Path(s"$stateDir/ann_index.tmp")
    try merged.write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)
    finally merged.unpersist()
    require(fs.rename(base, aside), s"stage out $base")
    fs.mkdirs(base)
    require(fs.rename(tmp, new Path(base, "compacted")), s"commit compaction for $base")
    fs.delete(aside, true)
    // the rewrite above read through the tombstone mask, so forgotten
    // rows are now physically gone — clear the tombstones. A crash
    // before this point leaves them in place (reads stay masked, the
    // next compaction purges again); after it, the anti-join is a no-op
    // either way: deleting them is pure space reclamation
    fs.delete(new Path(s"$stateDir/ann_forgotten"), true)
  }

  /** IVF-PQ search over the maintained index — identical arithmetic to
    * the batch [[Similarity.ivfPqTopK]] over the same vectors. */
  def search(spark: SparkSession, stateDir: String, queryPred: Column, k: Int,
      nprobe: Int = 3, refine: Int = 4, dim: Int = 64): DataFrame =
    Similarity.searchIvfPqEncoded(
      graft.operators.Caching.persisted(readIndex(spark, stateDir)),
      queryPred, k, nprobe = nprobe, refine = refine, dim = dim)

  /** Continuous maintenance over a directory of JSON-line embedding
    * files (`{"vec_id": …, "embedding": [64 doubles]}`). */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String, dim: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateDir, batchId, dim)
      }
      .start()
}
