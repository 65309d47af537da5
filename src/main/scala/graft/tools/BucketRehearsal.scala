package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rehearsal for the bucketed big-state merge
  * ([[graft.streaming.MvPipeline.upsertBucketed]], VERDICT r6 task 3):
  * builds the postings-detail state over the sf corpus, then folds a
  * SMALL batch and measures bytes actually rewritten — demonstrating
  * bytes-rewritten ∝ touched buckets, vs the plain upsert's O(state)
  * full rewrite. Results recorded in ARCHITECTURE §4.
  *
  * {{{ sbt "runMain graft.tools.BucketRehearsal /root/testdata/sf0.1" }}}
  */
object BucketRehearsal {
  private def dirBytes(d: File): Long =
    if (!d.exists()) 0L
    else d.listFiles().map(f => if (f.isDirectory) dirBytes(f) else f.length()).sum

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, dir)
    val base = Seq.fill(3)(java.util.UUID.randomUUID.toString.take(8)).mkString("-")
    val bucketedDir = s"/tmp/bucket_rehearsal_$base/bucketed"
    val plainDir = s"/tmp/bucket_rehearsal_$base/plain"

    // batch 0: the full corpus; batch 1: 5 docs (the steady-state shape —
    // a micro-batch is tiny relative to accumulated state)
    val big = docs.filter(col("doc_id") >= 5)
    val small = docs.filter(col("doc_id") < 5)

    graft.streaming.IncrementalIndex.processBatchBucketed(big, bucketedDir,
      batchId = 0L, numBuckets = buckets)
    graft.streaming.IncrementalIndex.processBatch(big, plainDir, batchId = 0L)

    def mtimes(d: File): Map[String, Long] =
      d.listFiles().filter(_.getName.matches("bucket=\\d+"))
        .map(b => b.getName -> b.listFiles().map(_.lastModified).max).toMap
    val postings = new File(s"$bucketedDir/postings")
    val docLens = new File(s"$bucketedDir/doc_lens")
    val beforeP = mtimes(postings); val beforeL = mtimes(docLens)
    val stateP = dirBytes(postings); val stateL = dirBytes(docLens)
    Thread.sleep(1100)

    val t0 = System.nanoTime()
    graft.streaming.IncrementalIndex.processBatchBucketed(small, bucketedDir,
      batchId = 1L, numBuckets = buckets)
    val tBucketed = (System.nanoTime() - t0) / 1e9

    def report(name: String, d: File, before: Map[String, Long], state: Long): Unit = {
      val after = mtimes(d)
      val rw = after.keySet.filter(b => !before.contains(b) || after(b) > before(b))
      val rwBytes = rw.toSeq.map(b => dirBytes(new File(d, b))).sum
      println(f"  bucketed $name%-9s state ${state / 1024}%5d KiB / ${before.size}%3d buckets; " +
        f"5-doc batch rewrote ${rw.size}%3d buckets = ${rwBytes / 1024}%5d KiB " +
        f"(${100.0 * rwBytes / state}%.1f%% of state)")
    }
    println(f"REHEARSAL sf=$dir buckets=$buckets  (bucketed fold of the 5-doc batch: $tBucketed%.1f s)")
    report("postings", postings, beforeP, stateP)
    report("doc_lens", docLens, beforeL, stateL)

    val plainPostings = new File(s"$plainDir/postings")
    val plainBytes = dirBytes(plainPostings)
    val t1 = System.nanoTime()
    graft.streaming.IncrementalIndex.processBatch(small, plainDir, batchId = 1L)
    val tPlain = (System.nanoTime() - t1) / 1e9
    val plainRewritten = dirBytes(plainPostings) // full swap = full rewrite
    println(f"  plain    postings  state ${plainBytes / 1024}%5d KiB; same batch rewrote " +
      f"${plainRewritten / 1024}%d KiB (100%% of state); plain fold $tPlain%.1f s")
    spark.stop()
  }
}
