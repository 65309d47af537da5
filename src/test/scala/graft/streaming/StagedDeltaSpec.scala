package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The staged-delta bucketed upsert ([[MvPipeline.upsertBucketedStaged]])
  * exists for one reason: views whose per-batch delta is computed from
  * the WHOLE pre-batch state (near-dup candidates join the full band
  * index; funnel frames re-min against full retained events) would,
  * under a naive bucketed port, recompute a SMALLER delta on
  * crash-replay — already-merged buckets show post-batch state, so their
  * contribution to the recomputed delta vanishes and unstamped buckets
  * permanently miss their rows. These tests pin the protocol: the staged
  * delta is re-USED verbatim on replay (never recomputed), stamped
  * buckets skip via their marker, unstamped buckets converge, and
  * staged files are swept after full application. */
class StagedDeltaSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 4
  private def mkDelta(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("id", "v")

  // per-key min merge — the views' semilattice shape
  private def mergeMin(calls: AtomicInteger)(old: DataFrame, inc: DataFrame): DataFrame = {
    calls.incrementAndGet()
    old.unionByName(inc).groupBy("id").agg(min("v").as("v"))
  }

  private def bucketOf(id: Long): Long =
    spark.range(1).select(pmod(xxhash64(lit(id)), lit(B.toLong))).head().getLong(0)

  private def readAll(path: String): Map[Long, Long] =
    MvPipeline.readBucketedState(spark, path)
      .as[(Long, Long)].collect().toMap

  test("mid-apply crash replay reuses the STAGED delta; computeDelta is not re-evaluated") {
    val path = tmpDir("staged") + "/view"
    val calls = new AtomicInteger(0)
    // two ids in provably different buckets
    val ids = (1L to 50L).groupBy(bucketOf).values.map(_.head).take(2).toSeq
    val (idA, idB) = (ids.head, ids(1))
    val delta = Seq(idA -> 10L, idB -> 20L)

    // --- simulate the crashed first attempt: stage the delta exactly as
    // upsertBucketedStaged would, then apply it to idA's bucket ONLY
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(s"$path/_delta_b7")
    mkDelta(delta).write.parquet(staged.toString + ".tmp")
    assert(fs.rename(new org.apache.hadoop.fs.Path(staged.toString + ".tmp"), staged))
    MvPipeline.upsertMerge(mkDelta(delta.filter(_._1 == idA)),
      s"$path/bucket=${bucketOf(idA)}", mergeMin(calls)(_, _), batchId = 7L,
      initWithMerge = true)
    assert(readAll(path) === Map(idA -> 10L))

    // --- replay batch 7: computeDelta MUST NOT run (the staged copy is
    // the only exact delta) — prove it by making recomputation throw
    MvPipeline.upsertBucketedStaged(spark, path,
      { throw new IllegalStateException("delta recomputed on replay") },
      mergeMin(calls)(_, _), batchId = 7L, numBuckets = B, bucketKeys = Seq("id"))

    // both buckets now hold the original delta; idA's bucket was skipped
    // by its marker (merge ran once for it: the simulated first attempt,
    // once for idB's bucket on replay)
    assert(readAll(path) === Map(idA -> 10L, idB -> 20L))
    assert(calls.get() === 2)
    // staged deltas swept after full application
    assert(!fs.exists(staged))

    // --- replay again with nothing staged: the delta is recomputed, but
    // every bucket is stamped with batch 7, so no merge runs and the
    // recomputed (even poisoned) delta cannot corrupt state
    MvPipeline.upsertBucketedStaged(spark, path,
      mkDelta(Seq(idA -> 999L, idB -> 999L)),
      mergeMin(calls)(_, _), batchId = 7L, numBuckets = B, bucketKeys = Seq("id"))
    assert(readAll(path) === Map(idA -> 10L, idB -> 20L))
    assert(calls.get() === 2)
  }

  test("crash-point sweep: replay converges from EVERY partially-applied prefix") {
    // ids covering all 4 buckets, several per bucket
    val ids = (1L to 200L).groupBy(bucketOf)
    assert(ids.size === B, "need every bucket populated")
    val delta = ids.values.flatMap(_.take(2)).toSeq.sorted.map(id => id -> (id * 10))
    val byBucket = delta.groupBy { case (id, _) => bucketOf(id) }.toSeq.sortBy(_._1)

    byBucket.indices.foreach { k =>
      // simulate a crash after the first k buckets applied
      val path = tmpDir(s"staged-crash-$k") + "/view"
      val calls = new AtomicInteger(0)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staged = new org.apache.hadoop.fs.Path(s"$path/_delta_b3")
      mkDelta(delta).write.parquet(staged.toString + ".tmp")
      assert(fs.rename(new org.apache.hadoop.fs.Path(staged.toString + ".tmp"), staged))
      byBucket.take(k).foreach { case (b, rows) =>
        MvPipeline.upsertMerge(mkDelta(rows), s"$path/bucket=$b",
          mergeMin(calls)(_, _), batchId = 3L, initWithMerge = true)
      }
      // replay: staged delta must finish the job without recomputation
      MvPipeline.upsertBucketedStaged(spark, path,
        { throw new IllegalStateException(s"recomputed at crash point $k") },
        mergeMin(calls)(_, _), batchId = 3L, numBuckets = B, bucketKeys = Seq("id"))
      assert(readAll(path) === delta.toMap, s"diverged at crash point $k")
      // exactly one merge per bucket total: k simulated + (n-k) on replay
      assert(calls.get() === byBucket.size, s"double-merge at crash point $k")
    }
  }

  test("fresh buckets fold their first increment THROUGH the merge (normalization)") {
    val path = tmpDir("staged-init") + "/view"
    val calls = new AtomicInteger(0)
    // duplicate keys in one delta: a raw write would persist both rows
    MvPipeline.upsertBucketedStaged(spark, path,
      mkDelta(Seq(5L -> 50L, 5L -> 30L)),
      mergeMin(calls)(_, _), batchId = 0L, numBuckets = B, bucketKeys = Seq("id"))
    assert(readAll(path) === Map(5L -> 30L))
  }

  test("secondary table applies from the same staged delta; crash before it converges") {
    val root = tmpDir("staged-sec")
    val path = s"$root/view"
    val sec = s"$root/view_idx"
    val mainCalls = new AtomicInteger(0)
    val secCalls = new AtomicInteger(0)
    val ids = (1L to 50L).groupBy(bucketOf).values.map(_.head).take(2).toSeq
    val (idA, idB) = (ids.head, ids(1))
    val delta = Seq(idA -> 10L, idB -> 20L)

    // crashed first attempt: delta staged, MAIN table fully applied,
    // secondary never reached, sweep never reached
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(s"$path/_delta_b9")
    mkDelta(delta).write.parquet(staged.toString + ".tmp")
    assert(fs.rename(new org.apache.hadoop.fs.Path(staged.toString + ".tmp"), staged))
    delta.foreach { case (id, v) =>
      MvPipeline.upsertMerge(mkDelta(Seq(id -> v)),
        s"$path/bucket=${bucketOf(id)}", mergeMin(mainCalls)(_, _),
        batchId = 9L, initWithMerge = true)
    }

    // replay: computeDelta must NOT run; main buckets skip via markers;
    // the secondary applies the staged rows (bucketed by its own key)
    MvPipeline.upsertBucketedStaged(spark, path,
      { throw new IllegalStateException("recomputed despite staged delta") },
      mergeMin(mainCalls)(_, _), batchId = 9L, numBuckets = B,
      bucketKeys = Seq("id"),
      secondaries = Seq(MvPipeline.StagedSecondary(sec,
        d => d.select("id", "v"), mergeMin(secCalls)(_, _), Seq("v"))))

    assert(readAll(path) === delta.toMap)
    assert(readAll(sec) === delta.toMap)
    assert(mainCalls.get() === 2, "main buckets must not re-merge on replay")
    assert(secCalls.get() === 2)
    assert(!fs.exists(staged), "staged delta swept only after ALL tables applied")

    // full replay with nothing staged: the delta is recomputed (the
    // secondary's CONTRACT is that its rows — including its bucket-key
    // columns — are a deterministic function of the batch input, so the
    // recompute routes to the same buckets), every bucket of BOTH
    // tables is stamped, and no merge re-runs
    MvPipeline.upsertBucketedStaged(spark, path,
      mkDelta(delta),
      mergeMin(mainCalls)(_, _), batchId = 9L, numBuckets = B,
      bucketKeys = Seq("id"),
      secondaries = Seq(MvPipeline.StagedSecondary(sec,
        d => d.select("id", "v"), mergeMin(secCalls)(_, _), Seq("v"))))
    assert(readAll(path) === delta.toMap)
    assert(readAll(sec) === delta.toMap)
    assert(mainCalls.get() === 2 && secCalls.get() === 2)
  }
}
