package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalDupSpans

/** Substring-duplication-span maintenance rehearsal (dev aid): folds the
  * sf0.1 documents corpus in id-ordered batches and checks the served
  * stats against the batch `duplicateSpanStats` sweep after every fold,
  * then drives a steady-state probe whose one doc COPIES a slice of a
  * batch-0 doc — the retroactive case: a doc folded at the start gets
  * its spans updated by a 5-doc batch at the end, with reads and writes
  * pruned to the affected buckets.
  *
  * {{{ sbt "runMain graft.tools.DupSpansRehearsal /root/testdata/sf0.1 4" }}}
  */
object DupSpansRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val buckets = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text")).cache()
    val n = docs.count()
    val maxId = docs.agg(max("doc_id")).collect().head.getLong(0)
    val span = maxId / nBatches + 1
    println(s"[rehearsal] $n docs, $nBatches batches, B=$buckets, k=40")

    val state = java.nio.file.Files.createTempDirectory("dupspans-rehearsal").toString
    def batchOf(i: Int): DataFrame = docs.filter((col("doc_id") / span).cast("int") === i)

    def servedStats(): Map[Long, Seq[Long]] = {
      val t0 = System.nanoTime()
      val m = IncrementalDupSpans.stats(spark, state).collect()
        .map(r => r.getLong(0) -> (1 until 6).map(r.getLong).toSeq).toMap
      println(f"[rehearsal]   served read: ${(System.nanoTime() - t0) / 1e9}%.2f s (${m.size} flagged docs)")
      m
    }
    def batchStats(d: DataFrame): Map[Long, Seq[Long]] = {
      val t0 = System.nanoTime()
      val m = graft.operators.Dedup.duplicateSpanStats(d, "doc_id", "text", 40)
        .collect().map(r => r.getLong(0) -> (1 until 6).map(r.getLong).toSeq).toMap
      graft.operators.Caching.releaseAll()
      println(f"[rehearsal]   batch sweep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      m
    }

    var folded = docs.limit(0)
    for (i <- 0 until nBatches) {
      val b = batchOf(i).cache()
      val t0 = System.nanoTime()
      IncrementalDupSpans.processBatch(b, "doc_id", "text", 40, state, i.toLong,
        numBuckets = buckets)
      println(f"[rehearsal] batch $i: fold ${(System.nanoTime() - t0) / 1e9}%.2f s (${b.count()} docs)")
      folded = folded.unionByName(b)
      val (got, want) = (servedStats(), batchStats(folded))
      require(got == want, s"batch $i diverged: ${got.size} vs ${want.size} flagged docs")
      println(s"[rehearsal]   batch $i exact (${got.size} flagged docs)")
    }

    // steady-state probe with a forced RETRO hit: one new doc copies
    // chars [10, 110) of the lowest-id doc long enough to donate them
    val donor = folded.filter(length(col("text")) >= 150)
      .orderBy("doc_id").limit(1)
      .as[(Long, String)].collect().head
    println(s"[rehearsal] probe donor: doc ${donor._1} (folded in batch 0)")
    val probe = Seq(
      (maxId + 1L, "p1 " + donor._2.substring(10, 110) + " p1end"),
      (maxId + 2L, ("q" * 80)),
      (maxId + 3L, "r unique probe doc with no duplication at all, " + ("s" * 40)),
      (maxId + 4L, "t" + ("u" * 60) + "t"),
      (maxId + 5L, "v probe " + ("w" * 50))).toDF("doc_id", "text")
    val touched = probe.select(pmod(xxhash64(col("doc_id")), lit(buckets.toLong)))
      .distinct().count()
    val t1 = System.nanoTime()
    IncrementalDupSpans.processBatch(probe, "doc_id", "text", 40, state,
      nBatches.toLong, numBuckets = buckets)
    println(f"[rehearsal] steady-state probe: 5 docs (1 retro hit), fold " +
      f"${(System.nanoTime() - t1) / 1e9}%.2f s, $touched/$buckets doc buckets in the batch")
    folded = folded.unionByName(probe)
    val (got, want) = (servedStats(), batchStats(folded))
    require(got == want, "post-probe stats diverged from the batch sweep")
    require(got.contains(donor._1), "the retro donor must now be flagged")
    println(s"[rehearsal]   probe exact incl. retroactive update of doc ${donor._1}; done")
    spark.stop()
  }
}
