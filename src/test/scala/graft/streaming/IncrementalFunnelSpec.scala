package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Funnel

/** The maintained funnel view must equal batch windowFunnel after EVERY
  * batch — including a stage-1 anchor arriving AFTER its continuations
  * (late anchor: greedy lattice, no watermark drop), a chain split across
  * batches, and a late mid-chain event that DECREASES a greedy frame and
  * must re-unlock an already-retained deeper event. */
class IncrementalFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("u", LongType), StructField("et", StringType),
    StructField("t", LongType)))
  private val steps = Seq("view", "click", "purchase")
  private val windowUs = 100L

  test("incremental == batch after each batch; late anchor, cross-batch chain, greedy re-min") {
    val in = tmpDir("fun-in"); val state = tmpDir("fun-state"); val ckpt = tmpDir("fun-ckpt")
    // batch 1: u1's continuations BEFORE any anchor; u3 partial chain;
    // u4 has events but never a step-1 (level-0 row)
    val b1 = Seq((1L, "click", 10L), (1L, "purchase", 20L),
      (3L, "view", 0L), (3L, "click", 60L), (4L, "other", 5L))
    // batch 2: u1's anchor arrives LATE and must chain through batch-1's
    // retained events; u2 ships a whole chain in one batch; u3's
    // purchase@150 is out of u3's anchor window (0+100) via click@60? no —
    // 150 > 100, dead for anchor 0
    val b2 = Seq((1L, "view", 0L),
      (2L, "view", 0L), (2L, "click", 10L), (2L, "purchase", 20L),
      (3L, "purchase", 150L))
    // batch 3: u3's LATE click@30 DECREASES the stage-2 greedy frame
    // (60 → 30)… still doesn't rescue purchase@150 (window), but a new
    // anchor view@80 does: 80 < 150 ≤ 180 needs a click in (80, 180] —
    // click@90 arrives too. Also u5: same-instant step events must NOT
    // chain (strict t ordering).
    val b3 = Seq((3L, "click", 30L), (3L, "view", 80L), (3L, "click", 90L),
      (5L, "view", 7L), (5L, "click", 7L))

    def lines(ts: Seq[(Long, String, Long)]) =
      ts.map(t => s"""{"u":${t._1},"et":"${t._2}","t":${t._3}}""").mkString("\n")
    def run(): Unit =
      IncrementalFunnel.start(spark, in, schema, state, ckpt,
        "u", "t", "et", steps, windowUs).awaitTermination()
    def served(): Map[Long, Int] =
      IncrementalFunnel.levels(spark, state)
        .as[(Long, Int)].collect().toMap
    def batchTruth(evs: Seq[(Long, String, Long)]): Map[Long, Int] =
      Funnel.windowFunnel(evs.toDF("u", "et", "t"), "u", "t", "et",
        steps, windowUs).as[(Long, Int)].collect().toMap

    Files.write(Paths.get(in, "b1.jsonl"), lines(b1).getBytes)
    run()
    assert(served() === batchTruth(b1))
    assert(served() === Map(1L -> 0, 3L -> 2, 4L -> 0))

    Files.write(Paths.get(in, "b2.jsonl"), lines(b2).getBytes)
    run()
    assert(served() === batchTruth(b1 ++ b2))
    // late anchor completed u1's retained chain across batches
    assert(served() === Map(1L -> 3, 2L -> 3, 3L -> 2, 4L -> 0))

    Files.write(Paths.get(in, "b3.jsonl"), lines(b3).getBytes)
    run()
    assert(served() === batchTruth(b1 ++ b2 ++ b3))
    // new anchor + retained deep event: u3 reaches 3; ties don't chain
    assert(served() === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 0, 5L -> 1))
  }

  test("freeze-and-fold compaction: reads stay exact, frozen state drops") {
    val state = tmpDir("fun-cmp-state")
    // b1 all before t=60; with W=100, cutoff=160 freezes every b1 anchor
    val b1 = Seq((1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      (2L, "view", 0L), (2L, "click", 50L))
    // b2 strictly after the cutoff (the horizon contract): u2 completes a
    // NEW chain, u3 is fresh
    val b2 = Seq((2L, "view", 200L), (2L, "click", 210L), (2L, "purchase", 220L),
      (3L, "view", 300L), (3L, "click", 310L))
    def fold(b: Seq[(Long, String, Long)], id: Long): Unit =
      IncrementalFunnel.processBatch(b.toDF("u", "et", "t"),
        "u", "t", "et", steps, windowUs, state, id)

    fold(b1, 0L)
    IncrementalFunnel.compact(spark, state, steps.size, windowUs, 160L)
    // every b1 anchor frozen: no live frames or retained step events left
    val st = MvPipeline.readBucketedState(spark, s"$state/funnel")
    assert(st.filter("kind = 'f'").count() === 0)
    assert(st.filter("kind = 'e'").count() === 0)
    assert(st.filter("kind = 'c'").count() === 2) // u1 level 3, u2 level 2

    fold(b2, 1L)
    val lv = IncrementalFunnel.levels(spark, state)
      .as[(Long, Int)].collect().toMap
    val bat = Funnel.windowFunnel((b1 ++ b2).toDF("u", "et", "t"),
      "u", "t", "et", steps, windowUs).as[(Long, Int)].collect().toMap
    assert(lv === bat)
    assert(lv === Map(1L -> 3, 2L -> 3, 3L -> 2))
    // latency merges the compacted summary (u1) with live frames (u2)
    val lat = IncrementalFunnel.conversionLatency(spark, state, steps.size)
      .as[(Long, Long, Long)].collect().toSet
    val batLat = Funnel.conversionLatency((b1 ++ b2).toDF("u", "et", "t"),
      "u", "t", "et", steps, windowUs).as[(Long, Long, Long)].collect().toSet
    assert(lat === batLat)
  }

  test("arbitrary 3-way split of a random stream folds to batch truth") {
    val rnd = new scala.util.Random(9)
    val types = Seq("view", "click", "purchase", "other")
    val evs = Seq.fill(120)((rnd.nextInt(8).toLong,
      types(rnd.nextInt(types.size)), rnd.nextLong(300).max(0)))
    val splits = Seq(evs.take(40), evs.slice(40, 80), evs.drop(80))
    val state = tmpDir("fun-rnd-state")
    splits.zipWithIndex.foreach { case (b, i) =>
      IncrementalFunnel.processBatch(b.toDF("u", "et", "t"),
        "u", "t", "et", steps, windowUs, state, i.toLong)
    }
    val inc = IncrementalFunnel.levels(spark, state)
      .as[(Long, Int)].collect().toMap
    val bat = Funnel.windowFunnel(evs.toDF("u", "et", "t"),
      "u", "t", "et", steps, windowUs).as[(Long, Int)].collect().toMap
    assert(inc === bat)
    // replaying the last batch id is a no-op (marker idempotence)
    IncrementalFunnel.processBatch(splits.last.toDF("u", "et", "t"),
      "u", "t", "et", steps, windowUs, state, (splits.size - 1).toLong)
    assert(IncrementalFunnel.levels(spark, state)
      .as[(Long, Int)].collect().toMap === bat)
    // state-served conversion latency == batch over the same stream
    val incLat = IncrementalFunnel.conversionLatency(spark, state, steps.size)
      .as[(Long, Long, Long)].collect().toSet
    val batLat = Funnel.conversionLatency(evs.toDF("u", "et", "t"),
      "u", "t", "et", steps, windowUs).as[(Long, Long, Long)].collect().toSet
    assert(incLat === batLat)
  }
}
