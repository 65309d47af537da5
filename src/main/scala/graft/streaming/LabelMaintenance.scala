package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Dedup

/** Slim `(id, label)` SIDE PROJECTION of a clusterer's labels (r12) —
  * the upgrade the forget contract named (ForgetMaintenance's per-op
  * id→label map used to project the label COLUMNS of every bucket of
  * the payload-dominated main state table, and the folds paid the same
  * projection per batch). The mirror is its own bucketed table
  * (`{view}_lbl`, bucketed by the id so id-keyed probes prune), fed
  * from the SAME staged delta as the band/chunk mirrors
  * ([[MvPipeline.StagedSecondary]]) — one row and 16 bytes per doc,
  * read without touching a payload bucket.
  *
  * Replay admissibility — why a STATE-DERIVED projection is safe here
  * despite the StagedSecondary determinism contract: the mirror's merge
  * is the SAME per-id `min` semilattice the main table folds its `l`
  * rows with, so a replay-after-sweep recomputed delta (whose label
  * rows and bucket routing may differ from the original's) can only
  * re-assert current-or-higher labels, which the min-merge absorbs —
  * harmlessness comes from the lattice, not from stamped-bucket
  * routing. Forget REPLACES labels (they can raise) under the same
  * single-writer between-batches discipline as the main table. */
object LabelMirror {

  def schema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType), StructField("label", LongType)))

  /** The staged secondary feeding the mirror from the main delta's `l`
    * rows (per-id min merge — see the replay note above). */
  def secondary(lblPath: String, idCol: String): MvPipeline.StagedSecondary =
    MvPipeline.StagedSecondary(lblPath,
      d => d.filter(col("kind") === "l").select(idCol, "label"),
      mergeMin(idCol), Seq(idCol))

  def mergeMin(idCol: String)(old: DataFrame, inc: DataFrame): DataFrame =
    old.unionByName(inc).groupBy(idCol).agg(min("label").as("label"))

  /** Every `(id, label)` row, from the mirror alone — the full-label
    * read the folds' relabel and the forget's affected-set discovery
    * need (O(docs) rows but 2 slim columns; the payload table's buckets
    * are never opened). Falls back to the MAIN table's projection for a
    * legacy dir whose mirror was never built (read-only paths must not
    * write; the folds/forgets backfill on their next write). */
  def readAll(spark: SparkSession, lblPath: String, mainPath: String,
      mainSchema: StructType, idCol: String): DataFrame =
    if (hasBuckets(spark, lblPath))
      MvPipeline.readBucketedStateOrEmpty(spark, lblPath, schema(idCol))
    else
      MvPipeline.readBucketedStateOrEmpty(spark, mainPath, mainSchema)
        .filter(col("kind") === "l").select(idCol, "label")

  /** One-time mirror build for a legacy state dir; no-op when the
    * mirror exists or the view is fresh. ATOMIC via
    * [[MvPipeline.buildFresh]]: the build lands under a side name and
    * renames into place, so a crash mid-backfill leaves NO mirror and
    * the next call rebuilds — a partial mirror passing the existence
    * guard would silently serve a subset of every label read. */
  def backfill(spark: SparkSession, mainPath: String, lblPath: String,
      mainSchema: StructType, idCol: String, numBuckets: Int): Unit =
    if (hasBuckets(spark, mainPath) && !hasBuckets(spark, lblPath))
      MvPipeline.buildFresh(spark, lblPath) { tmp =>
        MvPipeline.upsertBucketedMerge(
          MvPipeline.readBucketedState(spark, mainPath)
            .filter(col("kind") === "l").select(idCol, "label"),
          tmp, mergeMin(idCol), -1L, numBuckets, Seq(idCol))
      }

  /** Direct write for bootstrap (fresh dir; same min merge). */
  def write(l: DataFrame, lblPath: String, idCol: String,
      numBuckets: Int): Unit =
    MvPipeline.upsertBucketedMerge(l.select(idCol, "label"), lblPath,
      mergeMin(idCol), -1L, numBuckets, Seq(idCol))

  /** Apply a forget delta `(tbl, id, label)` — `x` rows tombstone, `l`
    * rows REPLACE (forget labels can raise, so min is wrong here;
    * idempotent under re-application like the main table's forget
    * merge). */
  def applyForget(inc: DataFrame, lblPath: String, idCol: String,
      numBuckets: Int): Unit =
    MvPipeline.upsertBucketedMerge(inc, lblPath, { (old, inc) =>
      val o =
        if (old.columns.contains("tbl")) old.limit(0).select(idCol, "label")
        else old
      val lNew = inc.filter(col("tbl") === "l").select(idCol, "label")
      val gone = inc.select(idCol).distinct() // x ∪ l ids both re-resolve
      o.join(gone, Seq(idCol), "left_anti").unionByName(lNew)
    }, -1L, numBuckets, Seq(idCol))

  private def hasBuckets(spark: SparkSession, p: String): Boolean = {
    val b = new org.apache.hadoop.fs.Path(p)
    val fs = b.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(b) && fs.listStatus(b)
      .exists(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
  }
}

/** Shared min-label cluster maintenance for the streaming near-dup
  * family ([[IncrementalNearDup]] text MinHash, [[IncrementalEmbedNearDup]]
  * embedding cosine, [[IncrementalMediaNearDup]] perceptual hashes):
  * given the batch's VERIFIED new edges and the current labels, relabel
  * only the components a new edge touches. Labels form a monotone
  * lattice (docs are only added, labels only decrease toward the
  * component min), so maintenance never retracts and any batch split
  * converges to the batch clustering.
  *
  * Old clusters are STARS (every member points at its representative), so
  * the affected subgraph is (new edges ∪ affected star edges) and its
  * diameter stays small; below `driverThreshold` total rows it union-finds
  * on the driver in one primitive collect job (the
  * [[Dedup.clusters]] driver-path economics), above it falls back to
  * relational min-label fixpoint iteration (which THROWS on
  * non-convergence — wrong labels must never reach persistent state,
  * the [[Dedup.clusters]] rule). */
object LabelMaintenance {

  /** `edges`: verified (id1, id2) Long pairs. `lAll`: current
    * (doc_id, label) for every doc incl. this batch's self-seeds.
    * Returns the updated full (doc_id, label) frame. */
  def relabel(edges: DataFrame, lAll: DataFrame, driverThreshold: Long,
      maxIter: Int): DataFrame = {
    val roots = touchedRoots(edges, lAll)
    val affected = lAll.join(roots, Seq("label"), "left_semi")
      .transform(graft.operators.Caching.persisted)
    val stars = affected.filter(col("doc_id") =!= col("label"))
    val (nEdges, nStars) = sizes(edges, stars)
    if (nEdges == 0) return lAll // no collisions: nothing to relabel
    val untouched = lAll.join(roots, Seq("label"), "left_anti")
    untouched.unionByName(
      relabelAffected(edges, affected, stars, nEdges, nStars, driverThreshold, maxIter))
  }

  /** [[relabel]] restricted to its Δ: ONLY the affected docs' (possibly
    * lowered) labels, nothing for untouched components — what a bucketed
    * min-merge fold upserts (labels only DECREASE down the lattice, so
    * per-key `min(label)` is the exact merge and re-applying the same Δ
    * is idempotent). Empty when the batch verified no edges. */
  def relabelDelta(edges: DataFrame, lAll: DataFrame, driverThreshold: Long,
      maxIter: Int): DataFrame = {
    val affected = lAll.join(touchedRoots(edges, lAll), Seq("label"), "left_semi")
      .transform(graft.operators.Caching.persisted)
    val stars = affected.filter(col("doc_id") =!= col("label"))
    val (nEdges, nStars) = sizes(edges, stars)
    if (nEdges == 0) return lAll.limit(0)
    relabelAffected(edges, affected, stars, nEdges, nStars, driverThreshold, maxIter)
  }

  /** Edge + star-row counts in ONE job (r9 hygiene: three separate
    * `count()` jobs per batch collapsed): both sides feed the same
    * threshold decision and union-find sizing, and callers persist
    * `edges`, so the union costs one pass over cached frames. An empty
    * edge set short-circuits the affected side via AQE's empty-relation
    * propagation (`roots` is empty), keeping the no-collision batch at
    * one trivial job. */
  private def sizes(edges: DataFrame, stars: DataFrame): (Long, Long) = {
    val r = edges.select(lit(1L).as("e"), lit(0L).as("s"))
      .unionByName(stars.select(lit(0L).as("e"), lit(1L).as("s")))
      .agg(coalesce(sum("e"), lit(0L)), coalesce(sum("s"), lit(0L)))
      .collect().head
    (r.getLong(0), r.getLong(1))
  }

  /** Components touching a new edge, by current label of either end. */
  private def touchedRoots(edges: DataFrame, lAll: DataFrame): DataFrame =
    edges.select(col("id1").as("doc_id"))
      .unionByName(edges.select(col("id2").as("doc_id")))
      .join(lAll, "doc_id").select(col("label")).distinct()

  /** Relabel the affected subgraph only (callers computed + persisted
    * `affected` and counted `edges`/`stars` via [[sizes]]). */
  private def relabelAffected(edges: DataFrame, affected: DataFrame,
      stars: DataFrame, nEdges: Long, nStars: Long,
      driverThreshold: Long, maxIter: Int): DataFrame = {
    if (nEdges + nStars <= driverThreshold) {
      // one collect job over both cached frames: new edges ∪ star edges
      // feed the same union-find, so there is no reason to fetch them
      // in two jobs
      val (ea, eb) = Dedup.collectPairsPrimitive(
        edges.select(col("id1"), col("id2")).unionByName(
          stars.select(col("doc_id").as("id1"), col("label").as("id2"))),
        (nEdges + nStars).toInt)
      val lbl = Dedup.unionFindMinLabels(ea, eb)
      val spark = edges.sparkSession
      import spark.implicits._
      val lblDf = lbl.toSeq.toDF("doc_id", "nlabel")
      // docs absent from the edge/star graph keep their old label
      affected.join(broadcast(lblDf), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("nlabel"), col("label")).as("label"))
    } else {
      // genuinely huge affected subgraph: min-label propagation to
      // fixpoint over star edges (doc ↔ label) + new edges (undirected)
      val und = edges
        .unionByName(edges.select(col("id2").as("id1"), col("id1").as("id2")))
        .unionByName(stars.select(col("doc_id").as("id1"), col("label").as("id2")))
        .unionByName(stars.select(col("label").as("id1"), col("doc_id").as("id2")))
      var labels = affected.localCheckpoint()
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val neighborMin = und.join(labels.withColumnRenamed("doc_id", "nid"),
            und("id2") === col("nid"))
          .groupBy(und("id1").as("doc_id"))
          .agg(min("label").as("nlabel"))
        // the changed-flag rides the checkpointed rows, so the
        // convergence check is a scan of cached blocks — not the
        // former per-iteration self-join job (r12 hygiene)
        val next = labels.as("l")
          .join(neighborMin.as("n"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
            (coalesce(col("nlabel"), col("label")) < col("label")).as("chg"))
          .localCheckpoint()
        converged = next.filter(col("chg")).isEmpty
        graft.operators.Caching.releaseCheckpoint(labels)
        labels = next
        i += 1
      }
      // mirror Dedup.clusters: NEVER commit possibly-wrong labels to
      // persistent state — a non-converged fixpoint would silently
      // diverge from the ==batch contract forever
      if (!converged) throw new IllegalStateException(
        s"relabel did not converge in $maxIter iterations " +
          s"($nEdges edges, $nStars star rows); retry with higher maxIter")
      labels.drop("chg")
    }
  }
}
