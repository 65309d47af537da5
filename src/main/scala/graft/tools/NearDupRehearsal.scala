package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.IncrementalNearDup

/** Streaming near-dup rehearsal (dev aid, not part of the driver
  * contract): folds the documents corpus into [[IncrementalNearDup]]
  * state batch by batch, timing each fold, then runs the batch
  * MinHash-LSH sweep over the SAME corpus and checks the maintained
  * labels equal the batch clustering. Evidence for ARCHITECTURE §4's
  * Δ-bound claim: per-batch fold cost should track BATCH size (plus the
  * touched-component term), not accumulated corpus size — the property
  * that makes ingest-time near-dup viable where the batch sweep is a
  * periodic full-corpus job.
  *
  * {{{ sbt "runMain graft.tools.NearDupRehearsal /root/testdata/sf0.1 5" }}}
  */
object NearDupRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val buckets = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val state = java.nio.file.Files
      .createTempDirectory("neardup-rehearsal").toString

    println(s"[rehearsal] $n docs from $dir in $nBatches batches")
    val stateDir = new java.io.File(s"$state/neardup")
    (0 until nBatches).foreach { b =>
      val batch = docs.filter(pmod(col("doc_id"), lit(nBatches)) === b)
      val bn = batch.count()
      val before = StateBytes.snapshot(stateDir)
      Thread.sleep(1100) // fs timestamp granularity
      val t0 = System.nanoTime()
      IncrementalNearDup.processBatch(batch, "doc_id", "text",
        threshold = 0.5, stateDir = state, batchId = b.toLong,
        numBuckets = buckets)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[rehearsal] batch $b%d: $bn%d docs folded in $dt%.2f s")
      StateBytes.report(s"batch $b writes", stateDir, before)
    }

    // steady-state write shape: a TINY batch against the full accumulated
    // state — the bucketed layout's whole point is that this rewrites
    // only the buckets the 5 docs hash into, not O(state)
    val tiny = docs.limit(5)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
    // read-side pruning evidence (r10): candidate generation probes the
    // band_key-bucketed index mirror with ONLY the batch's band keys
    val tinyBands = Dedup.bandRows(
      Dedup.gramSets(tiny, "doc_id", "text", 3), 8, 4)
    val probed = graft.streaming.MvPipeline
      .bucketIdsOf(tinyBands, Seq("band_key"), buckets).length
    println(s"[rehearsal] 5-doc probe: band-index READ prunes to $probed/$buckets buckets")
    val beforeTiny = StateBytes.snapshot(stateDir)
    Thread.sleep(1100)
    val tTiny0 = System.nanoTime()
    IncrementalNearDup.processBatch(tiny, "doc_id", "text",
      threshold = 0.5, stateDir = state, batchId = nBatches.toLong,
      numBuckets = buckets)
    println(f"[rehearsal] 5-doc steady-state fold: ${(System.nanoTime() - tTiny0) / 1e9}%.2f s")
    StateBytes.report("5-doc batch writes", stateDir, beforeTiny)

    // label-read economics (r12, the LabelMirror upgrade): the folds'
    // and forget's full-label read now scans the slim (doc_id, label)
    // mirror instead of projecting the label columns out of every
    // payload bucket — measure both against the same state
    def timeCount(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = df.count()
      (c, (System.nanoTime() - t0) / 1e9)
    }
    val (nMirror, tMirror) = timeCount(
      graft.streaming.MvPipeline.readBucketedState(spark, s"$state/neardup_lbl"))
    val (nMain, tMain) = timeCount(
      graft.streaming.MvPipeline.readBucketedState(spark, s"$state/neardup")
        .filter(col("kind") === "l").select("doc_id", "label"))
    println(f"[rehearsal] label read: mirror $nMirror%d rows in $tMirror%.2f s " +
      f"vs main-table projection $nMain%d rows in $tMain%.2f s")

    // forget cost: 5 real corpus docs — the id→label probe prunes to
    // the buckets the ids hash into; writes touch only affected
    // components. The final exactness check below runs against the
    // batch sweep over corpus-MINUS-forgotten (deletion-exactness at
    // this SF, not just in the unit fixtures).
    val forgottenIds = docs.select("doc_id")
      .filter(pmod(col("doc_id"), lit(37L)) === 3).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val fIds = spark.createDataFrame(
      spark.sparkContext.parallelize(forgottenIds.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
    val fProbe = graft.streaming.MvPipeline
      .bucketIdsOf(fIds, Seq("doc_id"), buckets).length
    val tF0 = System.nanoTime()
    val nForgot = IncrementalNearDup.forget(spark, state, fIds,
      threshold = 0.5, opId = 1000L, numBuckets = buckets)
    println(f"[rehearsal] forget(5 docs): $nForgot%d forgotten in " +
      f"${(System.nanoTime() - tF0) / 1e9}%.2f s; id→label probe read " +
      f"$fProbe%d/$buckets%d buckets")

    // retention compaction: freeze the older half of the corpus — grams
    // and bands drop, labels stay (reads exact for everything ever seen)
    val rowsBefore = graft.streaming.MvPipeline.readBucketedState(spark, s"$state/neardup").count()
    val bytesBefore = StateBytes.dirBytes(stateDir)
    val tC0 = System.nanoTime()
    val droppedRows = IncrementalNearDup.compact(spark, state, col("doc_id") < lit(n / 2))
    val rowsAfter = graft.streaming.MvPipeline.readBucketedState(spark, s"$state/neardup").count()
    val bytesAfter = StateBytes.dirBytes(stateDir)
    println(f"[rehearsal] compact(older half): $rowsBefore%d -> $rowsAfter%d rows " +
      f"($droppedRows%d dropped), ${bytesBefore / 1024}%d -> ${bytesAfter / 1024}%d KiB " +
      f"(-${100.0 * (bytesBefore - bytesAfter) / bytesBefore}%.0f%%) in ${(System.nanoTime() - tC0) / 1e9}%.2f s")

    val t1 = System.nanoTime()
    val survivors = docs.filter(!col("doc_id").isin(forgottenIds: _*))
    val pairs = Dedup.minhashLshPairs(survivors, "doc_id", "text", threshold = 0.5)
    val comp = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.Caching.releaseAll()
    val tBatch = (System.nanoTime() - t1) / 1e9
    println(f"[rehearsal] full batch sweep (minus forgotten): $tBatch%.2f s")

    val served = IncrementalNearDup.labels(spark, state).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = survivors.select("doc_id").collect().map(_.getLong(0))
    val truth = ids.map(id => id -> comp.getOrElse(id, id)).toMap
    val diff = truth.count { case (k, v) => served.get(k) != Some(v) }
    println(s"[rehearsal] labels: ${served.size} served, $diff diverge from batch"
      + (if (diff == 0) " — EXACT MATCH" else " — MISMATCH, investigate"))
    spark.stop()
  }
}
