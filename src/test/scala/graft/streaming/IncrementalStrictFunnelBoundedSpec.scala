package graft.streaming

import graft.SparkTestBase

/** R153: the watermark-bounded strict funnel must equal the EXACT view
  * whenever nothing beyond the lateness horizon arrives, must drop (and
  * only drop) beyond-horizon late events — the documented divergence —
  * must keep retraction semantics for in-horizon late events, and must
  * keep served levels bit-identical across a freeze-and-drop compaction
  * that provably bounds the retained event span. */
class IncrementalStrictFunnelBoundedSpec extends SparkTestBase {
  import spark.implicits._

  private val steps = Seq("signup", "click", "purchase")
  private val W = 100L
  private val LATE = 300L

  private def fold(state: String, b: Seq[(Long, Long, String)], id: Long): Unit =
    IncrementalStrictFunnelBounded.processBatch(b.toDF("u", "t", "et"),
      "u", "t", "et", steps, W, LATE, state, id, numBuckets = 4)

  private def served(state: String): Map[Long, Int] =
    IncrementalStrictFunnelBounded.levels(spark, state)
      .as[(Long, Int)].collect().toMap

  private def integralEqualsView(state: String): Unit = {
    val integral = IncrementalStrictFunnelBounded.changelog(spark, state)
      .groupBy("user", "level")
      .agg(org.apache.spark.sql.functions.sum("w").as("s"))
      .filter("s <> 0").select("user", "level")
      .as[(Long, Int)].collect().toMap
    assert(integral === served(state), "Z-set integral must equal the view")
  }

  test("within the horizon: identical to the exact view, including retractions") {
    val bounded = tmpDir("sfb1"); val exact = tmpDir("sfb1x")
    def foldBoth(b: Seq[(Long, Long, String)], id: Long): Unit = {
      fold(bounded, b, id)
      IncrementalStrictFunnel.processBatch(b.toDF("u", "t", "et"),
        "u", "t", "et", steps, W, exact, id, numBuckets = 4)
      val (got, want) = (served(bounded),
        IncrementalStrictFunnel.levels(spark, exact).as[(Long, Int)].collect().toMap)
      assert(got === want, s"batch $id diverged from the exact view")
    }
    foldBoth(Seq((1L, 0L, "signup"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 0L, "signup")), 0L)
    assert(served(bounded) === Map(1L -> 3, 2L -> 1))
    // in-horizon late dup RETRACTS exactly as the exact view does
    foldBoth(Seq((1L, 15L, "click")), 1L)
    assert(served(bounded) === Map(1L -> 2, 2L -> 1))
    // replay is a no-op
    fold(bounded, Seq((1L, 15L, "click")), 1L)
    assert(served(bounded) === Map(1L -> 2, 2L -> 1))
    integralEqualsView(bounded)
  }

  test("beyond-horizon late event is DROPPED: the documented divergence from the exact view") {
    val bounded = tmpDir("sfb2")
    fold(bounded, Seq((1L, 0L, "signup"), (1L, 10L, "click"),
      (1L, 20L, "purchase")), 0L)
    assert(served(bounded) === Map(1L -> 3))
    // advance the clock far past the horizon
    fold(bounded, Seq((2L, 1000L, "signup")), 1L)
    assert(IncrementalStrictFunnelBounded.watermark(spark, bounded, 4) === 1000L - LATE)
    // a duplicate click@15 is now BELOW the watermark: the exact view
    // would retract user 1 to level 2; the bounded view drops the event
    fold(bounded, Seq((1L, 15L, "click")), 2L)
    assert(served(bounded) === Map(1L -> 3, 2L -> 1),
      "beyond-horizon late event must be dropped, never retract")
    integralEqualsView(bounded)
  }

  test("compaction freezes history, preserves levels and spanning chains, bounds state") {
    val bounded = tmpDir("sfb3")
    // old complete chain (user 1), old partial (user 2), and a chain
    // that will SPAN the compaction cut (user 3 starts before, ends after)
    fold(bounded, Seq(
      (1L, 0L, "signup"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 0L, "signup"), (2L, 5L, "click"),
      (3L, 950L, "signup")), 0L)
    fold(bounded, Seq((4L, 1250L, "signup")), 1L) // watermark → 950
    assert(served(bounded) === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1))

    val before = MvPipeline.readBucketedState(spark, s"$bounded/strictfunnelbounded")
      .filter("kind = 'e'").count()
    IncrementalStrictFunnelBounded.compact(spark, bounded, steps, W, 4)
    val after = MvPipeline.readBucketedState(spark, s"$bounded/strictfunnelbounded")
      .filter("kind = 'e'").count()
    assert(after < before, "compaction must drop frozen events")
    // users 1/2's events (≤ cut − window) dropped; user 3's event at 950
    // (> cut − window = 900) retained — its chain can still extend
    assert(MvPipeline.readBucketedState(spark, s"$bounded/strictfunnelbounded")
      .filter("kind = 'e' AND user IN (1, 2)").count() === 0L)
    assert(served(bounded) === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1),
      "served levels must be unchanged by compaction")
    // idempotent
    IncrementalStrictFunnelBounded.compact(spark, bounded, steps, W, 4)
    assert(served(bounded) === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1))

    // the spanning chain completes AFTER compaction
    fold(bounded, Seq((3L, 990L, "click"), (3L, 1020L, "purchase")), 2L)
    assert(served(bounded) === Map(1L -> 3, 2L -> 2, 3L -> 3, 4L -> 1))
    // frozen floors never retract: an admissible event cannot reach
    // inside a frozen chain's gap (it predates the watermark by more
    // than the window), and a fresh partial chain can't lower the floor
    fold(bounded, Seq((1L, 1500L, "signup")), 3L)
    assert(served(bounded)(1L) === 3)
    integralEqualsView(bounded)
  }
}
