package graft.streaming

import graft.SparkTestBase
import graft.operators.Funnel

/** The retraction-bearing maintained strict-dedup funnel must equal the
  * batch operator after EVERY batch — in particular when a LATE
  * duplicate lands inside an already-matched gap and RETRACTS a
  * previously-reported chain (the case no monotone delta rule can
  * express) — and its Z-set changelog must integrate to the
  * materialized view. */
class IncrementalStrictFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private val steps = Seq("signup", "click", "purchase")
  private val W = 100L

  private def fold(state: String, b: Seq[(Long, Long, String)], id: Long): Unit =
    IncrementalStrictFunnel.processBatch(b.toDF("u", "t", "et"),
      "u", "t", "et", steps, W, state, id)

  private def served(state: String): Map[Long, Int] =
    IncrementalStrictFunnel.levels(spark, state)
      .as[(Long, Int)].collect().toMap

  private def batch(evs: Seq[(Long, Long, String)]): Map[Long, Int] = {
    val m = Funnel.windowFunnelStrictDedup(evs.toDF("u", "t", "et"),
      "u", "t", "et", steps, W).as[(Long, Int)].collect().toMap
    graft.operators.Caching.releaseAll()
    m
  }

  private def integralEqualsView(state: String): Unit = {
    val integral = IncrementalStrictFunnel.changelog(spark, state)
      .groupBy("user", "level")
      .agg(org.apache.spark.sql.functions.sum("w").as("s"))
      .filter("s <> 0")
      .select("user", "level").as[(Long, Int)].collect().toMap
    assert(integral === served(state), "Z-set integral must equal the view")
  }

  test("late dup retracts a reported chain; changelog carries -1/+1; fold == batch") {
    val state = tmpDir("sf-state")
    val b1 = Seq((1L, 0L, "signup"), (1L, 10L, "click"), (1L, 20L, "purchase"))
    fold(state, b1, 0L)
    assert(served(state) === batch(b1))
    assert(served(state) === Map(1L -> 3))
    assert(IncrementalStrictFunnel.changelog(spark, state)
      .as[(Long, Long, Int, Long)].collect().toSet ===
      Set((0L, 1L, 3, 1L)))

    // the LATE duplicate click@15 falls strictly inside the matched gap
    // (10, 20): the scan's chain dies at stage 2 — the level DROPS
    val b2 = Seq((1L, 15L, "click"))
    fold(state, b2, 1L)
    assert(served(state) === batch(b1 ++ b2))
    assert(served(state) === Map(1L -> 2))
    // batch 1's delta RETRACTED (1, level 3) and asserted (1, level 2)
    assert(IncrementalStrictFunnel.changelog(spark, state)
      .filter("batch = 1").as[(Long, Long, Int, Long)].collect().toSet ===
      Set((1L, 1L, 3, -1L), (1L, 1L, 2, 1L)))
    integralEqualsView(state)

    // replaying the batch id is a no-op (marker idempotence — the
    // changelog must NOT double-retract)
    fold(state, b2, 1L)
    assert(served(state) === Map(1L -> 2))
    integralEqualsView(state)

    // a later clean re-completion RAISES the level again (+1 after -1)
    val b3 = Seq((1L, 200L, "signup"), (1L, 210L, "click"), (1L, 220L, "purchase"))
    fold(state, b3, 2L)
    assert(served(state) === batch(b1 ++ b2 ++ b3))
    assert(served(state) === Map(1L -> 3))
    integralEqualsView(state)

    // AS-OF reads reproduce the view at every past batch — including
    // the retraction batch (levels went 3 → 2 → 3 across the history)
    def asOf(b: Long): Map[Long, Int] =
      IncrementalStrictFunnel.levelsAsOf(spark, state, b)
        .as[(Long, Int)].collect().toMap
    assert(asOf(0L) === Map(1L -> 3))
    assert(asOf(1L) === Map(1L -> 2))
    assert(asOf(2L) === Map(1L -> 3))

    // changelog compaction at floor 1 folds the assert/retract cycle
    // (+3, −3, +2) into the single net row; as-of ≥ floor exact
    val before = IncrementalStrictFunnel.changelog(spark, state).count()
    IncrementalStrictFunnel.compactChangelog(spark, state, 1L)
    assert(IncrementalStrictFunnel.changelog(spark, state).count() < before)
    assert(asOf(1L) === Map(1L -> 2))
    assert(asOf(2L) === Map(1L -> 3))
    integralEqualsView(state)
    // idempotent; maintenance continues exactly after the fold
    IncrementalStrictFunnel.compactChangelog(spark, state, 1L)
    assert(asOf(2L) === Map(1L -> 3))
    val b4 = Seq((1L, 215L, "click"))
    fold(state, b4, 3L)
    assert(served(state) === batch(b1 ++ b2 ++ b3 ++ b4))
    integralEqualsView(state)
  }

  test("strict-ORDER mode: a late INTERVENING event retracts a reported chain") {
    val state = tmpDir("so-state")
    def foldO(b: Seq[(Long, Long, Long, String)], id: Long): Unit =
      IncrementalStrictFunnel.processBatchStrictOrder(
        b.toDF("u", "t", "id", "et"), "u", "t", "id", "et", steps, W,
        state, id)
    def servedO: Map[Long, Int] =
      IncrementalStrictFunnel.levels(spark, state, "strictorderfunnel")
        .as[(Long, Int)].collect().toMap
    def batchO(evs: Seq[(Long, Long, Long, String)]): Map[Long, Int] = {
      val m = Funnel.windowFunnelStrictOrder(evs.toDF("u", "t", "id", "et"),
        "u", "t", "id", "et", steps, W).as[(Long, Int)].collect().toMap
      graft.operators.Caching.releaseAll()
      m
    }

    // consecutive clean chain → level 3
    val b1 = Seq((1L, 0L, 1L, "signup"), (1L, 10L, 2L, "click"),
      (1L, 20L, 3L, "purchase"))
    foldO(b1, 0L)
    assert(servedO === batchO(b1))
    assert(servedO === Map(1L -> 3))

    // late event of an UNRELATED type lands between click and purchase:
    // the consecutive-position requirement breaks — level RETRACTS to 2
    val b2 = Seq((1L, 15L, 9L, "pageview"))
    foldO(b2, 1L)
    assert(servedO === batchO(b1 ++ b2))
    assert(servedO === Map(1L -> 2))
    assert(IncrementalStrictFunnel.changelog(spark, state, "strictorderfunnel")
      .filter("batch = 1").as[(Long, Long, Int, Long)].collect().toSet ===
      Set((1L, 1L, 3, -1L), (1L, 1L, 2, 1L)))
    // re-sending the same event id is absorbed by the set dedup
    foldO(b2, 2L)
    assert(servedO === Map(1L -> 2))
    val integral = IncrementalStrictFunnel
      .changelog(spark, state, "strictorderfunnel")
      .groupBy("user", "level")
      .agg(org.apache.spark.sql.functions.sum("w").as("s"))
      .filter("s <> 0").select("user", "level")
      .as[(Long, Int)].collect().toMap
    assert(integral === servedO)
  }

  test("arbitrary 3-way split of a random dup-heavy stream == batch truth") {
    val rnd = new scala.util.Random(17)
    val types = Seq("signup", "click", "purchase", "other")
    // small time range + few users → dense dups, the non-monotone regime
    val evs = Seq.fill(150)((rnd.nextInt(6).toLong,
      rnd.nextLong(120).max(0), types(rnd.nextInt(types.size))))
    val splits = Seq(evs.take(50), evs.slice(50, 100), evs.drop(100))
    val state = tmpDir("sf-rnd-state")
    splits.zipWithIndex.foreach { case (b, i) =>
      fold(state, b, i.toLong)
      assert(served(state) === batch(evs.take(50 * (i + 1))),
        s"diverged after batch $i")
    }
    integralEqualsView(state)
  }
}
