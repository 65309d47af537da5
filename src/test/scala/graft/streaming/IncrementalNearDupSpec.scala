package graft.streaming

import graft.SparkTestBase
import graft.operators.Dedup

/** The maintained near-dup clustering must equal the batch
  * minhashLshPairs → clusters pipeline after EVERY batch — including a
  * later bridge doc MERGING two clusters discovered in different earlier
  * batches (the min-label lattice's only-decrease case) and singletons
  * labeling themselves. */
class IncrementalNearDupSpec extends SparkTestBase {
  import spark.implicits._

  // Controllable near-dups: long shared token runs with small suffix
  // edits keep exact Jaccard high; distinct vocabularies keep it zero.
  private val base = (0 until 40).map(i => s"tok$i").mkString(" ")
  private val docs: Seq[(Long, String)] = Seq(
    1L -> s"$base alpha",
    2L -> s"$base beta",          // near-dup of 1
    10L -> ("x " * 30).trim,
    11L -> ("x " * 29 + "y").trim, // near-dup of 10
    20L -> (0 until 40).map(i => s"z$i").mkString(" "), // singleton
    5L -> s"$base gamma delta"    // near-dup of 1 AND 2: arrives last
  )

  private def batchLabels(ds: Seq[(Long, String)],
      threshold: Double = 0.5): Map[Long, Long] = {
    val df = ds.toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text",
      shingleN = 3, numHashes = 8, numBands = 4, threshold = threshold)
    val comp = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    graft.operators.Caching.releaseAll()
    ds.map { case (id, _) => id -> comp.getOrElse(id, id) }.toMap
  }

  private def served(state: String): Map[Long, Long] =
    IncrementalNearDup.labels(spark, state).as[(Long, Long)].collect().toMap

  test("incremental == batch after each batch; cross-batch merge via late bridge") {
    val state = tmpDir("nd-state")
    // b1: first members of two future clusters + the singleton
    val b1 = docs.filter(d => Set(1L, 10L, 20L).contains(d._1))
    // b2: completes both pairs in separate clusters
    val b2 = docs.filter(d => Set(2L, 11L).contains(d._1))
    // b3: doc 5 bridges INTO cluster {1,2} (labels must stay 1, doc 5
    // joins); exercises old-old labels flowing to a new doc
    val b3 = docs.filter(d => Set(5L).contains(d._1))

    def fold(b: Seq[(Long, String)], id: Long): Unit =
      IncrementalNearDup.processBatch(b.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.5, stateDir = state, batchId = id)

    fold(b1, 0L)
    assert(served(state) === batchLabels(b1))
    assert(served(state) === Map(1L -> 1L, 10L -> 10L, 20L -> 20L))

    fold(b2, 1L)
    assert(served(state) === batchLabels(b1 ++ b2))
    assert(served(state) === Map(1L -> 1L, 2L -> 1L, 10L -> 10L,
      11L -> 10L, 20L -> 20L))

    fold(b3, 2L)
    assert(served(state) === batchLabels(docs))
    assert(served(state)(5L) === 1L)
    // replaying the last batch id is a no-op (marker idempotence)
    fold(b3, 2L)
    assert(served(state) === batchLabels(docs))

    // representatives read = min-id per component + singletons
    val reps = IncrementalNearDup.representatives(spark, state)
      .as[Long].collect().toSet
    assert(reps === Set(1L, 10L, 20L))
  }

  test("legacy state without the probe index is backfilled; pruned reads stay exact") {
    val state = tmpDir("nd-bidx-state")
    def fold(b: Seq[(Long, String)], id: Long): Unit =
      IncrementalNearDup.processBatch(b.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.5, stateDir = state, batchId = id)
    val b1 = docs.filter(d => Set(1L, 10L, 20L).contains(d._1))
    fold(b1, 0L)
    // simulate a state dir from before the probe-bucketed index mirror:
    // delete it wholesale
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bidx = new org.apache.hadoop.fs.Path(s"$state/neardup_bidx")
    assert(fs.exists(bidx), "secondary apply must have built the index")
    assert(fs.delete(bidx, true))
    // the next fold backfills the mirror and must still find the
    // CROSS-BATCH pair (2 pairs with 1 from state via the rebuilt index)
    val b2 = docs.filter(d => Set(2L, 11L).contains(d._1))
    fold(b2, 1L)
    assert(fs.exists(bidx), "fold must rebuild the missing index mirror")
    assert(served(state) === batchLabels(b1 ++ b2))
    assert(served(state)(2L) === 1L, "cross-batch pair must survive backfill")
  }

  test("bridge doc merges two ESTABLISHED clusters; old labels decrease") {
    val state = tmpDir("nd-merge-state")
    // token-range docs: shingle-Jaccard of range [a,b) vs [c,d) is exact
    // arithmetic — J(A,bridge) = J(B,bridge) ≈ 0.77 ≥ 0.6 (and band
    // collision near-certain at that J), J(A,B) ≈ 0.58 < 0.6 so exact
    // verification REJECTS the direct A-B pair: merge only via bridge
    def rng(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")
    val clA = Seq(30L -> rng(0, 40), 31L -> (rng(0, 40) + " extra"))
    val clB = Seq(40L -> rng(10, 50), 41L -> (rng(10, 50) + " other"))
    val bridge = Seq(35L -> rng(5, 45))
    def fold(b: Seq[(Long, String)], id: Long): Unit =
      IncrementalNearDup.processBatch(b.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.6, stateDir = state, batchId = id)
    fold(clA, 0L)
    fold(clB, 1L)
    assert(served(state) === batchLabels(clA ++ clB, 0.6))
    assert(served(state) === Map(30L -> 30L, 31L -> 30L,
      40L -> 40L, 41L -> 40L)) // two separate established clusters
    fold(bridge, 2L)
    assert(served(state) === batchLabels(clA ++ clB ++ bridge, 0.6))
    // the bridge merges B INTO A: 40/41 relabel 40 → 30 (decrease only)
    assert(served(state) === Map(30L -> 30L, 31L -> 30L, 35L -> 30L,
      40L -> 30L, 41L -> 30L))
  }

  test("retention compaction: labels survive, grams/bands drop, horizon contract holds") {
    import org.apache.spark.sql.functions.col
    val state = tmpDir("nd-compact-state")
    def fold(b: Seq[(Long, String)], id: Long): Unit =
      IncrementalNearDup.processBatch(b.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.5, stateDir = state, batchId = id)
    def stateRows(kind: String): Long =
      MvPipeline.readBucketedState(spark, s"$state/neardup")
        .filter(col("kind") === kind).count()

    // b1: 1–2 a near-dup pair, 10 a singleton
    fold(docs.filter(d => Set(1L, 2L, 10L).contains(d._1)), 0L)
    assert(served(state) === Map(1L -> 1L, 2L -> 1L, 10L -> 10L))

    // freeze doc 1 only: its g/b rows drop, every l row stays
    val gBefore = stateRows("g")
    val dropped = IncrementalNearDup.compact(spark, state, col("doc_id") === 1L)
    assert(dropped > 0)
    assert(stateRows("g") === gBefore - 1)
    assert(served(state) === Map(1L -> 1L, 2L -> 1L, 10L -> 10L))

    // a new doc pairing with the LIVE member (2) still inherits the
    // frozen component's label through 2's surviving l row
    fold(docs.filter(_._1 == 5L), 1L) // near-dup of 1 AND 2
    assert(served(state)(5L) === 1L)

    // freeze the whole 1/2/5 family; a future near-dup of it has no live
    // witness left and must label itself — the DOCUMENTED horizon loss,
    // == the batch sweep over (live ∪ new) docs plus pre-compaction edges
    IncrementalNearDup.compact(spark, state, col("doc_id") <= 5L)
    fold(Seq(7L -> (docs.toMap.apply(1L) + " seven")), 2L)
    assert(served(state) === Map(1L -> 1L, 2L -> 1L, 5L -> 1L,
      7L -> 7L, 10L -> 10L))
    // within the horizon: live docs still pair (11 joins 10's component)
    fold(docs.filter(_._1 == 11L), 3L)
    assert(served(state)(11L) === 10L)
  }

  test("start(): readStream json → state across restarts (checkpointed batch ids)") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val in = tmpDir("nd-in"); val state = tmpDir("nd-e2e-state")
    val ckpt = tmpDir("nd-e2e-ckpt")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def lines(ds: Seq[(Long, String)]) = ds.map { case (id, t) =>
      s"""{"doc_id":$id,"text":"${t.replace("\"", "")}"}"""
    }.mkString("\n")
    def run(): Unit =
      IncrementalNearDup.start(spark, in, schema, state, ckpt,
        "doc_id", "text", threshold = 0.5).awaitTermination()

    val b1 = docs.filter(d => Set(1L, 10L, 20L).contains(d._1))
    Files.write(Paths.get(in, "b1.jsonl"), lines(b1).getBytes)
    run()
    assert(served(state) === batchLabels(b1))

    // restart with new files only: the checkpoint advances the batch id,
    // earlier files are not re-read, cross-batch pairing still lands
    val b2 = docs.filter(d => Set(2L, 11L).contains(d._1))
    Files.write(Paths.get(in, "b2.jsonl"), lines(b2).getBytes)
    run()
    assert(served(state) === batchLabels(b1 ++ b2))
    assert(served(state) === Map(1L -> 1L, 2L -> 1L, 10L -> 10L,
      11L -> 10L, 20L -> 20L))
  }
}
