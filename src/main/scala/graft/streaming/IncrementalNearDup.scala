package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Continuously-maintained MinHash-LSH NEAR-dup clustering — the missing
  * streaming half of [[graft.operators.Dedup]]: [[StreamingDedup]] drops
  * exact copies as they arrive, but a training-data pipeline also wants
  * "this crawl re-fetched yesterday's page with a new timestamp footer"
  * caught at ingest, without re-running the batch LSH sweep over the
  * whole corpus per day.
  *
  * Semantics maintained: the batch x11/x25 clustering — connected
  * components over verified pairs (round(Jaccard,4) ≥ threshold), each
  * doc labeled with its component's MIN doc id, singletons labeling
  * themselves. Cluster labels form the same monotone lattice as
  * [[IncrementalFunnel]]'s greedy frames: docs are only added and labels
  * only DECREASE (a merge relabels to the smaller min), so maintenance
  * needs no retractions and any batch split converges to the batch
  * answer.
  *
  * Per micro-batch, everything is Δ-against-state:
  *   1. gram-hash + banded signatures for the BATCH docs only (the same
  *      [[Dedup.gramSets]]/[[Dedup.bandRows]] kernels as batch, so
  *      candidates are identical);
  *   2. candidates = ΔB ⋈ (B ∪ ΔB) on (band_idx, band_key) — new docs
  *      against the maintained band index plus within-batch pairs; old-old
  *      pairs were found in earlier batches;
  *   3. verify candidates by exact Jaccard over gram-hash arrays (new
  *      docs' from the batch, old docs' from state — retaining `gh` per
  *      doc is what makes cross-batch verification EXACT rather than
  *      trust-the-bands approximate; state is O(docs × grams-per-doc),
  *      the same asymptotics as the batch pipeline's shuffle);
  *   4. relabel ONLY the affected subgraph: components (by current label)
  *      touching a verified new edge, plus the new docs — min-label
  *      propagation to fixpoint over affected star edges (doc → label)
  *      and new edges. Old clusters are stars (diameter 2 through their
  *      representative), so convergence is a handful of rounds bounded
  *      by the batch's bridge structure, and untouched clusters cost
  *      zero.
  *
  * State is ONE table `(kind, doc_id, band_idx, band_key, gh, label)`
  * folded atomically by [[MvPipeline.upsertMerge]]:
  *   `b` rows = band index, `g` rows = gram-hash arrays, `l` rows =
  *   current labels. Doc ids are assumed unique across the stream (ingest
  *   dedupes ids upstream; re-sending an id re-pairs it harmlessly but
  *   double-counts its bands).
  *
  * 100 TB shape: candidate generation is a shuffle on band keys of the
  * BATCH only against a bucketed band index; verification touches only
  * colliding pairs; relabeling touches only affected components. Nothing
  * scans the corpus, and per-batch cost is proportional to batch size ×
  * collision rate — the property that lets ingest-time near-dup run
  * continuously where the batch sweep runs weekly. */
object IncrementalNearDup {

  /** Fold one micro-batch of `(idCol, textCol)` docs into the maintained
    * near-dup state. LSH parameters as [[Dedup.minhashLshPairs]]. */
  def processBatch(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 8, numBands: Int = 4,
      threshold: Double = 0.8, stateDir: String, batchId: Long = -1L,
      maxIter: Int = 20): Unit = {
    require(numHashes % numBands == 0, "numHashes must divide into bands")
    val spark = docs.sparkSession
    val g = Dedup.gramSets(docs, idCol, textCol, shingleN)
      .transform(graft.operators.Caching.persisted)
    val bands = Dedup.bandRows(g, numHashes, numBands)
    val inc = pack(g, bands)
    val path = s"$stateDir/neardup"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = !fs.exists(new org.apache.hadoop.fs.Path(path))
    val increment =
      if (first) fold(empty(inc), inc, threshold, maxIter) else inc
    MvPipeline.upsertMerge(increment, path,
      (old, i) => fold(old, i, threshold, maxIter), batchId)
    graft.operators.Caching.releaseAll()
  }

  /** `(doc_id, label)` for every doc seen — label = min doc id of the
    * near-dup component (the batch x11/x25 read served from state). */
  def labels(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readState(spark, stateDir, "neardup")
      .filter(col("kind") === "l")
      .select(col("doc_id"), col("label"))

  /** The retained set: docs that are their own component's representative
    * (what a dedup pass keeps). */
  def representatives(spark: SparkSession, stateDir: String): DataFrame =
    labels(spark, stateDir).filter(col("doc_id") === col("label"))
      .select("doc_id")

  /** Batch-doc signature frames → state-schema rows (labels seeded to
    * self; the fold lowers them). */
  private def pack(g: DataFrame, bands: DataFrame): DataFrame = {
    val gRows = g.select(lit("g").as("kind"), col("doc_id"),
      lit(null).cast("int").as("band_idx"),
      lit(null).cast("string").as("band_key"),
      col("gh"), lit(null).cast("long").as("label"))
    val bRows = bands.select(lit("b").as("kind"), col("doc_id"),
      col("band_idx"), col("band_key"),
      lit(null).cast("array<long>").as("gh"),
      lit(null).cast("long").as("label"))
    val lRows = g.select(lit("l").as("kind"), col("doc_id"),
      lit(null).cast("int").as("band_idx"),
      lit(null).cast("string").as("band_key"),
      lit(null).cast("array<long>").as("gh"),
      col("doc_id").cast("long").as("label"))
    gRows.unionByName(bRows).unionByName(lRows)
  }

  private def empty(like: DataFrame): DataFrame =
    like.sparkSession.createDataFrame(
      like.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      like.schema)

  /** Old state + batch rows → next state, per the Δ rule in the class
    * doc. */
  private def fold(old: DataFrame, inc: DataFrame, threshold: Double,
      maxIter: Int, driverThreshold: Long = 1000000L): DataFrame = {
    val oldB = old.filter(col("kind") === "b")
      .select("doc_id", "band_idx", "band_key")
    val oldG = old.filter(col("kind") === "g").select("doc_id", "gh")
    val oldL = old.filter(col("kind") === "l").select("doc_id", "label")

    val newB = inc.filter(col("kind") === "b")
      .select("doc_id", "band_idx", "band_key")
    val newG = inc.filter(col("kind") === "g").select("doc_id", "gh")
      .transform(graft.operators.Caching.persisted)

    // 2. candidates: new docs vs (state ∪ batch); normalize to id1 < id2
    val allB = oldB.unionByName(newB)
    val cand = newB.as("a")
      .join(allB.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id2"))
      .distinct()

    // 3. exact verification over gram hashes from state ∪ batch
    val allG = oldG.unionByName(newG)
    val edges = Dedup.verifyJaccard(cand, allG, threshold)
      .select(col("id1").cast("long"), col("id2").cast("long"))
      .transform(graft.operators.Caching.persisted)

    // 4. affected-subgraph relabel ([[LabelMaintenance]]): only the
    // components a verified new edge touches are rewritten; a
    // no-collision batch passes labels through with zero relabel jobs
    val lAll = oldL.unionByName(
      inc.filter(col("kind") === "l").select("doc_id", "label"))
    val lNew = LabelMaintenance.relabel(edges, lAll, driverThreshold, maxIter)

    val bAll = allB.select(lit("b").as("kind"), col("doc_id"),
      col("band_idx"), col("band_key"),
      lit(null).cast("array<long>").as("gh"), lit(null).cast("long").as("label"))
    val gAll = allG.select(lit("g").as("kind"), col("doc_id"),
      lit(null).cast("int").as("band_idx"), lit(null).cast("string").as("band_key"),
      col("gh"), lit(null).cast("long").as("label"))
    val lRows = lNew.select(lit("l").as("kind"), col("doc_id"),
      lit(null).cast("int").as("band_idx"), lit(null).cast("string").as("band_key"),
      lit(null).cast("array<long>").as("gh"), col("label"))
    bAll.unionByName(gAll).unionByName(lRows)
  }

  /** Continuous maintenance over JSON-line files with `schema`. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String,
      idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 8, numBands: Int = 4,
      threshold: Double = 0.8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, idCol, textCol, shingleN, numHashes, numBands,
          threshold, stateDir, batchId)
      }
      .start()
}
