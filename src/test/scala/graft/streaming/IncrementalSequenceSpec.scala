package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Funnel

/** The maintained sequence view must equal batch sequenceMatch after
  * EVERY batch — including out-of-order arrival (a stage-1 anchor landing
  * after its continuations: monotone feasible sets, no watermark drop)
  * and a greedy-killer chain split across batches. */
class IncrementalSequenceSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("u", LongType), StructField("et", StringType),
    StructField("t", LongType)))
  private val conds = Seq(("view", None), ("click", Some(50L)),
    ("purchase", Some(50L)))

  test("incremental == batch after each batch; out-of-order and greedy-killer") {
    val in = tmpDir("seq-in"); val state = tmpDir("seq-state"); val ckpt = tmpDir("seq-ckpt")
    // batch 1: u1's CONTINUATIONS arrive before any anchor; u3 partial
    val b1 = Seq((1L, "click", 10L), (1L, "purchase", 20L),
      (3L, "view", 0L), (3L, "click", 1L))
    // batch 2: u1's anchor arrives LATE and must complete the old chain;
    // u2 ships a whole chain in one batch
    val b2 = Seq((1L, "view", 0L),
      (2L, "view", 0L), (2L, "click", 10L), (2L, "purchase", 20L))
    // batch 3: u3's greedy killer — click@40 (reachable from view@0)
    // rescues purchase@80, which batch-1's click@1 strands
    val b3 = Seq((3L, "click", 40L), (3L, "purchase", 80L))

    def lines(ts: Seq[(Long, String, Long)]) =
      ts.map(t => s"""{"u":${t._1},"et":"${t._2}","t":${t._3}}""").mkString("\n")
    def run(): Unit =
      IncrementalSequence.start(spark, in, schema, state, ckpt,
        "u", "t", "et", conds).awaitTermination()
    def served(): Set[Long] =
      IncrementalSequence.matchedUsers(spark, state, conds.size)
        .as[Long].collect().toSet
    def batchTruth(evs: Seq[(Long, String, Long)]): Set[Long] =
      Funnel.sequenceMatch(evs.toDF("u", "et", "t"), "u", "t", "et", conds)
        .filter("matched = 1").select("user").as[Long].collect().toSet

    Files.write(Paths.get(in, "b1.jsonl"), lines(b1).getBytes)
    run()
    assert(served() === batchTruth(b1))
    assert(served() === Set.empty)

    Files.write(Paths.get(in, "b2.jsonl"), lines(b2).getBytes)
    run()
    assert(served() === batchTruth(b1 ++ b2))
    assert(served() === Set(1L, 2L)) // late anchor completed u1's old chain

    Files.write(Paths.get(in, "b3.jsonl"), lines(b3).getBytes)
    run()
    assert(served() === batchTruth(b1 ++ b2 ++ b3))
    assert(served() === Set(1L, 2L, 3L)) // cross-batch feasible-set rescue

    // levels read: deepest feasible stage per user with any stage-1 entry
    val lv = IncrementalSequence.levels(spark, state)
      .as[(Long, Int)].collect().toMap
    assert(lv === Map(1L -> 3, 2L -> 3, 3L -> 3))
  }
}
