package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Similarity

/** Incremental == batch for the IVF-PQ index: vectors encoded and
  * appended across micro-batches must answer searches exactly as the
  * one-shot batch path over the union corpus — encode is a pure map
  * against pinned codebooks, so the only thing to prove is the state
  * plumbing (append layout, replay idempotence, search over state). */
class IncrementalAnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  private def vec(seed: Int): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(64)(rnd.nextGaussian())
  }

  private val chunk1 = (0L until 30L).map(i => (i, vec(i.toInt)))
  private val chunk2 = (30L until 60L).map(i => (i, vec(i.toInt)))

  private def jsonLine(t: (Long, Seq[Double])): String =
    s"""{"vec_id":${t._1},"embedding":[${t._2.mkString(",")}]}"""

  test("incremental (2 micro-batches) index answers searches == batch; replay idempotent") {
    val in = tmpDir("ann-in"); val state = tmpDir("ann-state"); val ckpt = tmpDir("ann-ckpt")
    def runAvailable(): Unit =
      IncrementalAnnIndex.start(spark, in, schema, state, ckpt).awaitTermination()

    Files.write(Paths.get(in, "c1.jsonl"), chunk1.map(jsonLine).mkString("\n").getBytes)
    runAvailable()
    Files.write(Paths.get(in, "c2.jsonl"), chunk2.map(jsonLine).mkString("\n").getBytes)
    runAvailable()

    val batch = Similarity.ivfPqTopK(
      (chunk1 ++ chunk2).toDF("vec_id", "embedding"), col("vec_id") < 5, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    graft.operators.Caching.releaseAll()
    val streaming = IncrementalAnnIndex.search(spark, state, col("vec_id") < 5, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    graft.operators.Caching.releaseAll()
    assert(streaming === batch)
    assert(streaming.nonEmpty)

    // replayed batch id rewrites the same directory: index size unchanged
    val before = IncrementalAnnIndex.readIndex(spark, state).count()
    IncrementalAnnIndex.processBatch(chunk2.toDF("vec_id", "embedding"), state, batchId = 1L)
    assert(IncrementalAnnIndex.readIndex(spark, state).count() === before)

    // compaction: one bucket-partitioned table, same search answers
    IncrementalAnnIndex.compact(spark, state)
    val dirs = new java.io.File(s"$state/ann_index/compacted").list().toSeq
    assert(dirs.exists(_.startsWith("bucket=")), s"not bucket-partitioned: $dirs")
    val afterCompact = IncrementalAnnIndex.search(spark, state, col("vec_id") < 5, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    graft.operators.Caching.releaseAll()
    assert(afterCompact === batch)

    // crash window: index renamed aside, commit never happened (simulated
    // by renaming ann_index -> ann_index.old by hand). The next compact
    // must restore the aside copy — the index is never unreadable.
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(s"$state/ann_index")
    val aside = new org.apache.hadoop.fs.Path(s"$state/ann_index.old")
    require(fs.rename(base, aside))
    IncrementalAnnIndex.compact(spark, state)
    assert(!fs.exists(aside))
    val afterRecover = IncrementalAnnIndex.search(spark, state, col("vec_id") < 5, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    graft.operators.Caching.releaseAll()
    assert(afterRecover === batch)

    // crash window WITH concurrent appends: base staged aside, commit never
    // happened, and a processBatch lands new increments into the recreated
    // (uncommitted) base. Recovery must fold those increments into the
    // restored copy — nothing checkpointed is ever deleted.
    require(fs.rename(base, aside))
    fs.mkdirs(base) // what compact() had done just before the crash
    val chunk3 = (60L until 70L).map(i => (i, vec(i.toInt)))
    // Written straight into the uncommitted base (a writer that raced the
    // crash, before any recovery ran) — the worst case for salvage.
    Similarity.encodeIvfPq(chunk3.toDF("vec_id", "embedding"))
      .write.mode("overwrite").parquet(s"$state/ann_index/batch=2")
    IncrementalAnnIndex.compact(spark, state)
    assert(!fs.exists(aside))
    assert(IncrementalAnnIndex.readIndex(spark, state).count() === 70)
    val batch3 = Similarity.ivfPqTopK(
      (chunk1 ++ chunk2 ++ chunk3).toDF("vec_id", "embedding"), col("vec_id") < 5, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    graft.operators.Caching.releaseAll()
    val afterSalvage = IncrementalAnnIndex.search(spark, state, col("vec_id") < 5, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    graft.operators.Caching.releaseAll()
    assert(afterSalvage === batch3)
  }

  test("forget: tombstone masks searches immediately; compaction purges physically") {
    val state = tmpDir("ann-fg")
    IncrementalAnnIndex.processBatch(chunk1.toDF("vec_id", "embedding"), state, 0L)
    IncrementalAnnIndex.processBatch(chunk2.toDF("vec_id", "embedding"), state, 1L)

    // forget id 3 (a corpus member AND one of the query vectors): search
    // must equal the batch path over corpus-minus-forgotten at once
    IncrementalAnnIndex.forget(spark, state, Seq(3L).toDF("vec_id"))
    val batchMinus = Similarity.ivfPqTopK(
      (chunk1 ++ chunk2).filterNot(_._1 == 3L).toDF("vec_id", "embedding"),
      col("vec_id") < 5, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    graft.operators.Caching.releaseAll()
    def served(): Set[(Long, Long, Long, Double)] = {
      val r = IncrementalAnnIndex.search(spark, state, col("vec_id") < 5, k = 3)
        .as[(Long, Long, Long, Double)].collect().toSet
      graft.operators.Caching.releaseAll()
      r
    }
    assert(served() === batchMinus)
    assert(IncrementalAnnIndex.readIndex(spark, state).filter("vec_id = 3").isEmpty)

    // a replayed batch re-inserting the forgotten id stays masked
    IncrementalAnnIndex.processBatch(chunk1.toDF("vec_id", "embedding"), state, 0L)
    assert(served() === batchMinus)

    // compaction purges physically and clears the tombstones; searches
    // unchanged, and the RAW compacted files no longer hold the id
    IncrementalAnnIndex.compact(spark, state)
    assert(!new java.io.File(s"$state/ann_forgotten").exists(),
      "tombstones must clear after the purge")
    assert(spark.read.parquet(s"$state/ann_index/compacted")
      .filter("vec_id = 3").isEmpty, "forgotten row must be physically gone")
    assert(served() === batchMinus)

    // unknown ids are a harmless no-op
    IncrementalAnnIndex.forget(spark, state, Seq(9999L).toDF("vec_id"))
    assert(served() === batchMinus)
  }
}
