package graft.streaming

import graft.SparkTestBase
import graft.operators.{Dedup, Similarity}

/** The maintained embedding near-dup clustering must equal the batch
  * embeddingNearDupPairsLsh → clusters pipeline after EVERY batch —
  * including a bridge vector merging two established clusters (min-label
  * lattice, no retraction) — and on the real corpus under any split. */
class IncrementalEmbedNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  /** 2-D plane embedded in 64-dim: angle → unit-ish vector; scaling one
    * member checks norm handling (cosine is scale-invariant). */
  private def vec(deg: Double, scale: Float = 1f): Array[Float] = {
    val r = math.toRadians(deg)
    val a = new Array[Float](dim)
    a(0) = (math.cos(r) * scale).toFloat
    a(1) = (math.sin(r) * scale).toFloat
    a
  }

  private def batchTruth(vs: Seq[(Long, Array[Float], Long)],
      threshold: Double): Map[Long, Long] = {
    val df = vs.toDF("vec_id", "embedding", "label")
    val pairs = Similarity.embeddingNearDupPairsLsh(df, threshold, dim = dim)
      .select("id1", "id2")
    val comp = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    graft.operators.Caching.releaseAll()
    vs.map { case (id, _, _) => id -> comp.getOrElse(id, id) }.toMap
  }

  private def served(state: String): Map[Long, Long] =
    IncrementalEmbedNearDup.labels(spark, state)
      .as[(Long, Long)].collect().toMap

  test("bridge vector merges two established clusters; == batch each step") {
    val state = tmpDir("end-state")
    // cos(0°,6°)=0.995 ≥ 0.98; cos(0°,30°)=0.866 < 0.98; bridge at 15°:
    // cos to both sides ≈ 0.966 < 0.98 — so use 0.95: bridge≈0.966 ≥,
    // A-B 0.866 <. Same block (blk=1) so LSH buckets decide candidates.
    val t = 0.95
    val clA = Seq((10L, vec(0), 1L), (11L, vec(3, 2f), 1L))
    val clB = Seq((20L, vec(30), 1L), (21L, vec(33, 0.5f), 1L))
    val bridge = Seq((15L, vec(15), 1L))
    val md = tmpDir("end-mv")
    def fold(b: Seq[(Long, Array[Float], Long)], id: Long): Unit =
      IncrementalEmbedNearDup.processBatch(b.toDF("vec_id", "embedding", "label"),
        t, dim = dim, stateDir = state, batchId = id, movedDir = Some(md))

    fold(clA, 0L)
    assert(served(state) === batchTruth(clA, t))
    fold(clB, 1L)
    assert(served(state) === batchTruth(clA ++ clB, t))
    assert(served(state) === Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    MovedLog.sweep(spark, md, MovedLog.pendingArtifacts(spark, md))
    fold(bridge, 2L)
    assert(served(state) === batchTruth(clA ++ clB ++ bridge, t))
    // bridge at 15°: within 0.95 of both 0-3° and 30-33° members → one
    // component, labels decrease 20/21 → 10
    assert(served(state) === Map(10L -> 10L, 11L -> 10L, 15L -> 10L,
      20L -> 10L, 21L -> 10L))
    // the moved log (R176, vec_id column) carries the merge coordinates
    val movedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("old_label",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("new_label",
        org.apache.spark.sql.types.LongType)))
    assert(MovedLog.pending(spark, md, movedSchema)
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap ===
      Map(15L -> (None, Some(10L)), 20L -> (Some(20L), Some(10L)),
        21L -> (Some(20L), Some(10L))))
    val reps = IncrementalEmbedNearDup.representatives(spark, state)
      .as[Long].collect().toSet
    assert(reps === Set(10L))
  }

  test("real corpus 2-way split folds to batch truth") {
    val state = tmpDir("end-rc-state")
    val vs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter("embedding IS NOT NULL")
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect().toSeq
      .map { case (id, v, b) => (id, v, b.toLong) }
    val (b1, b2) = vs.partition(_._1 % 2 == 0)
    def fold(b: Seq[(Long, Array[Float], Long)], id: Long): Unit =
      IncrementalEmbedNearDup.processBatch(b.toDF("vec_id", "embedding", "label"),
        0.9, dim = dim, stateDir = state, batchId = id)
    fold(b1, 0L)
    assert(served(state) === batchTruth(b1, 0.9))
    fold(b2, 1L)
    assert(served(state) === batchTruth(vs, 0.9))
    // replaying the last batch id is a no-op (marker idempotence)
    fold(b2, 1L)
    assert(served(state) === batchTruth(vs, 0.9))
  }
}
