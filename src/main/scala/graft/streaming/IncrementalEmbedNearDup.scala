package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *   4. relabel only the components a verified new edge touches.
  *
  * State is ONE table `(kind, vec_id, blk, table_idx, bucket, v, norm,
  * label)` folded atomically by [[MvPipeline.upsertMerge]]: `b` rows =
  * bucket index, `v` rows = normalized vectors, `l` rows = labels. */
object IncrementalEmbedNearDup {

  /** Fold one micro-batch of `(vec_id, embedding, label)` vectors into
    * the maintained state. LSH parameters as
    * [[Similarity.embeddingNearDupPairsLsh]]. */
  def processBatch(embeddings: DataFrame, threshold: Double,
      numTables: Int = 8, bitsPerTable: Int = 6, dim: Int = 64,
      stateDir: String, batchId: Long = -1L,
      driverThreshold: Long = 1000000L, maxIter: Int = 20): Unit = {
    val spark = embeddings.sparkSession
    val tables = (0 until numTables).map { t =>
      Similarity.lshBucket(col("v"),
        Similarity.hyperplanes(bitsPerTable, dim, seed = 1000L + t))
    }
    val e = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id").cast("long"), col("label").cast("long").as("blk"),
        Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2Norm(col("v")))
      .transform(graft.operators.Caching.persisted)
    val bands = e.select(col("vec_id"), col("blk"),
      posexplode(array(tables: _*)).as(Seq("table_idx", "bucket")))
    val inc = pack(e, bands)
    val path = s"$stateDir/embneardup"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = !fs.exists(new org.apache.hadoop.fs.Path(path))
    val increment =
      if (first) fold(empty(inc), inc, threshold, driverThreshold, maxIter)
      else inc
    MvPipeline.upsertMerge(increment, path,
      (old, i) => fold(old, i, threshold, driverThreshold, maxIter), batchId)
    graft.operators.Caching.releaseAll()
  }

  /** `(vec_id, cluster)` for every vector seen — cluster = min vec_id of
    * the near-dup component (the batch pairs→clusters read from state). */
  def labels(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readState(spark, stateDir, "embneardup")
      .filter(col("kind") === "l")
      .select(col("vec_id"), col("label").as("cluster"))

  /** The retained set: component representatives. */
  def representatives(spark: SparkSession, stateDir: String): DataFrame =
    labels(spark, stateDir).filter(col("vec_id") === col("cluster"))
      .select("vec_id")

  private def pack(e: DataFrame, bands: DataFrame): DataFrame = {
    val vRows = e.select(lit("v").as("kind"), col("vec_id"), col("blk"),
      lit(null).cast("int").as("table_idx"), lit(null).cast("long").as("bucket"),
      col("v"), col("norm"), lit(null).cast("long").as("label"))
    val bRows = bands.select(lit("b").as("kind"), col("vec_id"), col("blk"),
      col("table_idx").cast("int"), col("bucket").cast("long"),
      lit(null).cast("array<double>").as("v"), lit(null).cast("double").as("norm"),
      lit(null).cast("long").as("label"))
    val lRows = e.select(lit("l").as("kind"), col("vec_id"), col("blk"),
      lit(null).cast("int").as("table_idx"), lit(null).cast("long").as("bucket"),
      lit(null).cast("array<double>").as("v"), lit(null).cast("double").as("norm"),
      col("vec_id").as("label"))
    vRows.unionByName(bRows).unionByName(lRows)
  }

  private def empty(like: DataFrame): DataFrame =
    like.sparkSession.createDataFrame(
      like.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      like.schema)

  private def fold(old: DataFrame, inc: DataFrame, threshold: Double,
      driverThreshold: Long, maxIter: Int): DataFrame = {
    val oldB = old.filter(col("kind") === "b")
      .select("vec_id", "blk", "table_idx", "bucket")
    val oldV = old.filter(col("kind") === "v").select("vec_id", "blk", "v", "norm")
    val oldL = old.filter(col("kind") === "l").select("vec_id", "label")

    val newB = inc.filter(col("kind") === "b")
      .select("vec_id", "blk", "table_idx", "bucket")
    val newV = inc.filter(col("kind") === "v").select("vec_id", "blk", "v", "norm")
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

    val lAll = oldL.unionByName(inc.filter(col("kind") === "l")
      .select("vec_id", "label"))
      .withColumnRenamed("vec_id", "doc_id")
    val lNew = LabelMaintenance.relabel(edges, lAll, driverThreshold, maxIter)
      .withColumnRenamed("doc_id", "vec_id")

    val bAll = allB.select(lit("b").as("kind"), col("vec_id"), col("blk"),
      col("table_idx"), col("bucket"),
      lit(null).cast("array<double>").as("v"), lit(null).cast("double").as("norm"),
      lit(null).cast("long").as("label"))
    val vAll = allV.select(lit("v").as("kind"), col("vec_id"), col("blk"),
      lit(null).cast("int").as("table_idx"), lit(null).cast("long").as("bucket"),
      col("v"), col("norm"), lit(null).cast("long").as("label"))
    val lRows = lNew.select(lit("l").as("kind"), col("vec_id"),
      lit(null).cast("long").as("blk"),
      lit(null).cast("int").as("table_idx"), lit(null).cast("long").as("bucket"),
      lit(null).cast("array<double>").as("v"), lit(null).cast("double").as("norm"),
      col("label"))
    bAll.unionByName(vAll).unionByName(lRows)
  }
}
