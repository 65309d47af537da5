package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.streaming.IncrementalEmbedNearDup

/** Streaming EMBEDDING near-dup rehearsal (dev aid, completing the
  * evidence matrix beside [[NearDupRehearsal]] text and
  * [[FunnelRehearsal]]): folds the embeddings corpus into
  * [[IncrementalEmbedNearDup]] state batch by batch on the bucketed
  * layout, timing each fold and measuring bytes rewritten
  * ([[StateBytes]]), then checks the maintained clustering equals the
  * batch `embeddingNearDupPairsLsh → clusters` sweep and measures
  * steady-state write amplification plus retention compaction.
  *
  * {{{ sbt "runMain graft.tools.EmbedNearDupRehearsal /root/testdata/sf0.1 4 64" }}}
  */
object EmbedNearDupRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val buckets = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val threshold = 0.9
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label")).cache()
    val n = emb.count()
    val state = java.nio.file.Files
      .createTempDirectory("embneardup-rehearsal").toString
    val stateDir = new java.io.File(s"$state/embneardup")
    println(s"[rehearsal] $n vectors from $dir in $nBatches batches, B=$buckets, cos ≥ $threshold")

    (0 until nBatches).foreach { b =>
      val batch = emb.filter(pmod(col("vec_id"), lit(nBatches)) === b)
      val bn = batch.count()
      val before = StateBytes.snapshot(stateDir)
      Thread.sleep(1100)
      val t0 = System.nanoTime()
      IncrementalEmbedNearDup.processBatch(batch, threshold,
        stateDir = state, batchId = b.toLong, numBuckets = buckets)
      println(f"[rehearsal] batch $b%d: $bn%d vectors folded in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      StateBytes.report(s"batch $b writes", stateDir, before)
    }

    // steady-state: 5 fresh vectors against full accumulated state
    val tiny = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        col("embedding"), col("label"))
    val beforeTiny = StateBytes.snapshot(stateDir)
    Thread.sleep(1100)
    val tT = System.nanoTime()
    IncrementalEmbedNearDup.processBatch(tiny, threshold,
      stateDir = state, batchId = nBatches.toLong, numBuckets = buckets)
    println(f"[rehearsal] 5-vector steady-state fold: ${(System.nanoTime() - tT) / 1e9}%.2f s")
    StateBytes.report("5-vector batch writes", stateDir, beforeTiny)

    // retention compaction: freeze the older half
    val bytesBefore = StateBytes.dirBytes(stateDir)
    val dropped = IncrementalEmbedNearDup.compact(spark, state,
      col("vec_id") < lit(n / 2))
    val bytesAfter = StateBytes.dirBytes(stateDir)
    println(f"[rehearsal] compact(older half): $dropped%d rows dropped, " +
      f"${bytesBefore / 1024}%d -> ${bytesAfter / 1024}%d KiB " +
      f"(-${100.0 * (bytesBefore - bytesAfter) / bytesBefore}%.0f%%)")

    // maintained labels ≡ batch sweep over the same corpus + tiny batch
    val all = emb.unionByName(tiny)
    val t1 = System.nanoTime()
    val pairs = Similarity.embeddingNearDupPairsLsh(all, threshold)
    val comp = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.Caching.releaseAll()
    println(f"[rehearsal] full batch sweep: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val served = IncrementalEmbedNearDup.labels(spark, state).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = all.filter(col("embedding").isNotNull)
      .select("vec_id").collect().map(_.getLong(0))
    val truth = ids.map(id => id -> comp.getOrElse(id, id)).toMap
    val diff = truth.count { case (k, v) => served.get(k) != Some(v) }
    println(s"[rehearsal] labels: ${served.size} served, $diff diverge from batch"
      + (if (diff == 0) " — EXACT MATCH" else " — MISMATCH, investigate"))
    spark.stop()
  }
}
