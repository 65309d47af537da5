package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

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
        val next = labels.as("l")
          .join(neighborMin.as("n"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
          .localCheckpoint()
        converged = next.as("a").join(labels.as("b"), "doc_id")
          .filter(col("a.label") =!= col("b.label")).isEmpty
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
      labels
    }
  }
}
