package graft.streaming

import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.operators.{Dedup, MediaCodecs}

/** The maintained perceptual clustering must equal the batch
  * hammingPairs → clusters view after EVERY batch — including a bridge
  * fingerprint merging two ESTABLISHED clusters whose members are
  * pairwise FARTHER than maxHamming (merge only via the bridge), and
  * real image/audio payloads hashed by the same codegen'd projections as
  * the batch x46/x49 views. */
class IncrementalMediaNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private def served(state: String, view: String): Map[Long, Long] =
    IncrementalMediaNearDup.labels(spark, state, view)
      .as[(Long, Long)].collect().toMap

  private def batchClusters(hashes: Seq[(Long, Long)],
      maxHamming: Int): Map[Long, Long] = {
    val pairs = Dedup.hammingPairs(hashes.toDF("doc_id", "simhash"), maxHamming)
    val comp = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    graft.operators.Caching.releaseAll()
    hashes.map { case (id, _) => id -> comp.getOrElse(id, id) }.toMap
  }

  test("hand-built hashes: established clusters merge only via a late bridge") {
    val state = tmpDir("media-nd")
    // exact Hamming geometry: A-cluster at bits {0,1}, B-cluster at bits
    // {4,5} — d(A,B) = 4 > 3, so no direct pair; bridge = 0 is d=2 from
    // both, so the merge happens ONLY through it
    val a = (1L << 0) | (1L << 1)   // 3
    val b = (1L << 4) | (1L << 5)   // 48
    val far = (1L << 10) | (1L << 20) | (1L << 30) | (1L << 40) | (1L << 50)
    val b1 = Seq(20L -> a, 21L -> a)              // cluster {20,21}
    val b2 = Seq(30L -> b, 31L -> b, 40L -> far)  // cluster {30,31} + singleton
    val b3 = Seq(25L -> 0L)                       // the bridge

    val md = tmpDir("media-nd-mv")
    val movedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("old_label",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("new_label",
        org.apache.spark.sql.types.LongType)))
    def movedNow(): Map[Long, (Option[Long], Option[Long])] =
      MovedLog.pending(spark, md, movedSchema)
        .as[(Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    def fold(h: Seq[(Long, Long)], id: Long): Unit =
      IncrementalMediaNearDup.processHashes(h.toDF("doc_id", "simhash"),
        "fp", maxHamming = 3, stateDir = state, batchId = id,
        movedDir = Some(md))

    fold(b1, 0L)
    assert(served(state, "fp") === batchClusters(b1, 3))
    MovedLog.sweep(spark, md, MovedLog.pendingArtifacts(spark, md))
    fold(b2, 1L)
    assert(served(state, "fp") === batchClusters(b1 ++ b2, 3))
    assert(served(state, "fp") === Map(20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 40L -> 40L)) // two ESTABLISHED clusters
    MovedLog.sweep(spark, md, MovedLog.pendingArtifacts(spark, md))
    fold(b3, 2L)
    assert(served(state, "fp") === batchClusters(b1 ++ b2 ++ b3, 3))
    // the bridge merges B INTO A: labels only decrease (30/31: 30 → 20)
    assert(served(state, "fp") === Map(20L -> 20L, 21L -> 20L, 25L -> 20L,
      30L -> 20L, 31L -> 20L, 40L -> 40L))
    // the moved log (R176) names both coordinates of the merge: the
    // bridge first-seen (old null), the losing cluster's members moved
    assert(movedNow() === Map(25L -> (None, Some(20L)),
      30L -> (Some(30L), Some(20L)), 31L -> (Some(30L), Some(20L))))
    // replaying the last batch id is a no-op (marker idempotence) — and
    // the staged artifact exists-skips, so the pending log is unchanged
    fold(b3, 2L)
    assert(served(state, "fp") === batchClusters(b1 ++ b2 ++ b3, 3))
    assert(movedNow() === Map(25L -> (None, Some(20L)),
      30L -> (Some(30L), Some(20L)), 31L -> (Some(30L), Some(20L))))
    MovedLog.sweep(spark, md, MovedLog.pendingArtifacts(spark, md))
    assert(IncrementalMediaNearDup.representatives(spark, state, "fp")
      .as[Long].collect().toSet === Set(20L, 40L))
    // forget the representative through the same log: its old
    // coordinate drops (new null), survivors re-derive under 21
    IncrementalMediaNearDup.forget(spark, state, "fp",
      Seq(20L).toDF("doc_id"), maxHamming = 3, opId = 50L,
      movedDir = Some(md))
    assert(served(state, "fp") === Map(21L -> 21L, 25L -> 21L,
      30L -> 21L, 31L -> 21L, 40L -> 40L))
    assert(movedNow() === Map(20L -> (Some(20L), None),
      21L -> (Some(20L), Some(21L)), 25L -> (Some(20L), Some(21L)),
      30L -> (Some(20L), Some(21L)), 31L -> (Some(20L), Some(21L))))
  }

  test("image payloads: fold == batch x46-family clusters; malformed dropped") {
    val state = tmpDir("media-img")
    // the batch spec's controllable corpus: base, one-cell perturbation
    // (near-dup), md5-scattered distinct image, malformed payload
    def bmp(seed: Int, perturbCell: Int): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val cellBase = Array.tabulate(64)(c => md.digest(s"$seed:$c".getBytes)(0) & 0xff)
      MediaCodecs.encodeBmp(16, 16, { k =>
        val cell = ((k / 48) / 2) * 8 + (((k % 48) / 3) / 2)
        val base = (cellBase(cell) + k * 11) % 256
        if (cell == perturbCell) (base + 120) % 256 else base
      })
    }
    val b1 = Seq((0L, bmp(7, -1)), (2L, bmp(99, -1)))
    val b2 = Seq((1L, bmp(7, 2)), (3L, "notanimage".getBytes))
    IncrementalMediaNearDup.processBatchImages(b1.toDF("doc_id", "payload"),
      stateDir = state, batchId = 0L)
    IncrementalMediaNearDup.processBatchImages(b2.toDF("doc_id", "payload"),
      stateDir = state, batchId = 1L)
    // cross-batch pair 0–1 found; malformed 3 absent (null hash barrier)
    assert(served(state, "imgneardup") === Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    // equals the batch pairs→clusters view over all decodable payloads
    val pairs = Dedup.imageNearDupPairs((b1 ++ b2).toDF("doc_id", "payload"))
    val comp = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    graft.operators.Caching.releaseAll()
    assert(served(state, "imgneardup") ===
      Seq(0L, 1L, 2L).map(id => id -> comp.getOrElse(id, id)).toMap)
  }

  test("audio payloads: fold == batch x49-family clusters") {
    val state = tmpDir("media-aud")
    def wav(seed: Int, perturbWin: Int): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val base = Array.tabulate(64)(w => md.digest(s"$seed:$w".getBytes)(0) & 0xff)
      MediaCodecs.encodeWavPcm16(16000, Array.tabulate(256) { k =>
        val w = k / 4
        (base(w) * 8 - 1024 + (k % 4) * 64 + (if (w == perturbWin) 400 else 0)).toShort
      })
    }
    val b1 = Seq((0L, wav(7, -1)), (2L, wav(99, -1)))
    val b2 = Seq((1L, wav(7, 5)))
    IncrementalMediaNearDup.processBatchAudio(b1.toDF("doc_id", "payload"),
      stateDir = state, batchId = 0L)
    IncrementalMediaNearDup.processBatchAudio(b2.toDF("doc_id", "payload"),
      stateDir = state, batchId = 1L)
    assert(served(state, "audneardup") === Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    // compaction: freeze 0 — label read exact; 1 keeps bridging through
    // its own live hash, a NEW copy of the family still joins via 1
    IncrementalMediaNearDup.compact(spark, state, "audneardup",
      col("doc_id") === 0L)
    assert(served(state, "audneardup") === Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    IncrementalMediaNearDup.processBatchAudio(
      Seq((5L, wav(7, 5))).toDF("doc_id", "payload"),
      stateDir = state, batchId = 2L)
    assert(served(state, "audneardup")(5L) === 0L)
  }

  test("TEXT SimHash maintained through the generic fingerprint fold == the batch x3 pipeline") {
    // the docstring's claim ("any 64-bit fingerprint family") with
    // evidence: the real documents corpus, hashed by the batch x3
    // SimHash kernel, folded in two id-split batches through
    // processHashes — maintained clustering == simhashPairs → clusters
    val state = tmpDir("txt-sh")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val hashes = Dedup.simhashes(docs)
      .as[(Long, Long)].collect().toSeq
    graft.operators.Caching.releaseAll()
    val (even, odd) = hashes.partition(_._1 % 2 == 0)
    IncrementalMediaNearDup.processHashes(even.toDF("doc_id", "simhash"),
      "txtneardup", maxHamming = 3, stateDir = state, batchId = 0L)
    assert(served(state, "txtneardup") === batchClusters(even, 3))
    IncrementalMediaNearDup.processHashes(odd.toDF("doc_id", "simhash"),
      "txtneardup", maxHamming = 3, stateDir = state, batchId = 1L)
    assert(served(state, "txtneardup") === batchClusters(hashes, 3))
    assert(served(state, "txtneardup").exists { case (id, l) => id != l },
      "corpus fixture must contain at least one real near-dup pair")
  }
}
