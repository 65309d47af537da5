package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.streaming.IncrementalMediaNearDup

/** Streaming MEDIA near-dup rehearsal (dev aid): folds the synthesized
  * BMP and WAV corpora (the same deterministic generators the batch
  * x46/x49 family tests use, planted near-dup groups of 4) into
  * [[IncrementalMediaNearDup]] batch by batch, measuring bytes
  * rewritten, then checks the maintained clustering equals the batch
  * `imageNearDupPairs/audioNearDupPairs → clusters` sweep exactly.
  *
  * {{{ sbt "runMain graft.tools.MediaNearDupRehearsal /root/testdata/sf0.1 4" }}}
  */
object MediaNearDupRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))

    def run(name: String, media: org.apache.spark.sql.DataFrame,
        fold: (org.apache.spark.sql.DataFrame, String, Long) => Unit,
        pairs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        view: String): Unit = {
      val m = media.cache()
      val n = m.count()
      val state = java.nio.file.Files
        .createTempDirectory(s"media-rehearsal-$name").toString
      val stateDir = new java.io.File(s"$state/$view")
      println(s"[rehearsal] $name: $n payloads in $nBatches batches")
      (0 until nBatches).foreach { b =>
        val batch = m.filter(pmod(col("doc_id"), lit(nBatches)) === b)
        val before = StateBytes.snapshot(stateDir)
        Thread.sleep(1100)
        val t0 = System.nanoTime()
        fold(batch, state, b.toLong)
        println(f"[rehearsal] $name batch $b%d (${batch.count()}%d) folded in ${(System.nanoTime() - t0) / 1e9}%.2f s")
        StateBytes.report(s"$name batch $b writes", stateDir, before)
      }
      val comp = Dedup.clusters(pairs(m)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.operators.Caching.releaseAll()
      val served = IncrementalMediaNearDup.labels(spark, state, view)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val truth = served.keys.map(id => id -> comp.getOrElse(id, id)).toMap
      val diff = truth.count { case (k, v) => served.get(k) != Some(v) }
      println(s"[rehearsal] $name labels: ${served.size} served, $diff diverge"
        + (if (diff == 0) " — EXACT MATCH" else " — MISMATCH, investigate"))
      m.unpersist()
    }

    run("image", Multimodal.synthesizeBmpNearDups(docs),
      (b, s, id) => IncrementalMediaNearDup.processBatchImages(b,
        stateDir = s, batchId = id),
      m => Dedup.imageNearDupPairs(m), "imgneardup")
    run("audio", Multimodal.synthesizeWavNearDups(docs),
      (b, s, id) => IncrementalMediaNearDup.processBatchAudio(b,
        stateDir = s, batchId = id),
      m => Dedup.audioNearDupPairs(m), "audneardup")
    spark.stop()
  }
}
