package graft.streaming

import graft.SparkTestBase
import graft.operators.Funnel

/** R151: user-forget across the behavioral view family. Z-set views
  * (both strict funnel modes) forget by dropping the user's rows and
  * emitting the −1 changelog — serve ≡ batch over events-minus-user
  * immediately, integral == view throughout, and a changelog compaction
  * at/above the forget purges the user's history rows entirely. The
  * monotone funnel and retention forget by pure row drop (≡ batch over
  * events-minus-user, including frozen funnel users); transitions
  * drops the user's open end with the documented conservative count
  * contract. All idempotent under re-application. */
class BehavioralForgetSpec extends SparkTestBase {
  import spark.implicits._

  private val steps = Seq("signup", "click", "purchase")
  private val W = 100L

  test("strict-dedup funnel: forget == batch minus user; integral holds; compaction purges") {
    val state = tmpDir("bf-sd")
    val evs = Seq(
      (1L, 0L, "signup"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 0L, "signup"), (2L, 5L, "click"),
      (3L, 0L, "signup"))
    IncrementalStrictFunnel.processBatch(evs.toDF("u", "t", "et"),
      "u", "t", "et", steps, W, state, 0L)
    def served: Map[Long, Int] =
      IncrementalStrictFunnel.levels(spark, state)
        .as[(Long, Int)].collect().toMap
    assert(served === Map(1L -> 3, 2L -> 2, 3L -> 1))

    val n = ForgetMaintenance.forgetStrictFunnel(spark,
      Seq(2L).toDF("user"), state, opId = 1L)
    assert(n === 1L)
    val remaining = evs.filterNot(_._1 == 2L)
    val want = Funnel.windowFunnelStrictDedup(remaining.toDF("u", "t", "et"),
      "u", "t", "et", steps, W).as[(Long, Int)].collect().toMap
    graft.operators.Caching.releaseAll()
    assert(served === want)
    assert(served === Map(1L -> 3, 3L -> 1))

    // integral == view after the retraction
    val integral = IncrementalStrictFunnel.changelog(spark, state)
      .groupBy("user", "level")
      .agg(org.apache.spark.sql.functions.sum("w").as("s"))
      .filter("s <> 0").select("user", "level")
      .as[(Long, Int)].collect().toMap
    assert(integral === served)

    // replaying the same forget op is a no-op
    ForgetMaintenance.forgetStrictFunnel(spark, Seq(2L).toDF("user"), state, opId = 1L)
    assert(served === Map(1L -> 3, 3L -> 1))

    // the user's e rows are GONE now; their d history rows purge at the
    // compaction floor (net weight zero folds away) — privacy completion
    val st = MvPipeline.readBucketedState(spark, s"$state/strictfunnel")
    assert(st.filter("user = 2 AND kind <> 'd'").count() === 0L)
    IncrementalStrictFunnel.compactChangelog(spark, state, 1L)
    assert(MvPipeline.readBucketedState(spark, s"$state/strictfunnel")
      .filter("user = 2").count() === 0L, "compaction must purge the forgotten user's changelog")
    assert(served === Map(1L -> 3, 3L -> 1))

    // maintenance continues exactly: user 2 re-appearing is a NEW user
    IncrementalStrictFunnel.processBatch(
      Seq((2L, 200L, "signup")).toDF("u", "t", "et"),
      "u", "t", "et", steps, W, state, 2L)
    assert(served === Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("strict-order funnel: forget via the view parameter") {
    val state = tmpDir("bf-so")
    val evs = Seq((1L, 0L, 1L, "signup"), (1L, 10L, 2L, "click"),
      (1L, 20L, 3L, "purchase"), (2L, 0L, 4L, "signup"))
    IncrementalStrictFunnel.processBatchStrictOrder(
      evs.toDF("u", "t", "id", "et"), "u", "t", "id", "et", steps, W, state, 0L)
    def served: Map[Long, Int] =
      IncrementalStrictFunnel.levels(spark, state, "strictorderfunnel")
        .as[(Long, Int)].collect().toMap
    assert(served === Map(1L -> 3, 2L -> 1))
    val n = ForgetMaintenance.forgetStrictFunnel(spark,
      Seq(1L).toDF("user"), state, view = "strictorderfunnel", opId = 1L)
    assert(n === 1L)
    assert(served === Map(2L -> 1))
    val integral = IncrementalStrictFunnel.changelog(spark, state, "strictorderfunnel")
      .groupBy("user", "level")
      .agg(org.apache.spark.sql.functions.sum("w").as("s"))
      .filter("s <> 0").select("user", "level")
      .as[(Long, Int)].collect().toMap
    assert(integral === served)
  }

  test("monotone funnel: forget drops live AND frozen users exactly") {
    val state = tmpDir("bf-mf")
    val evs = Seq(
      (1L, 0L, "signup"), (1L, 10L, "click"),
      (2L, 0L, "signup"), (2L, 10L, "click"), (2L, 20L, "purchase"),
      (3L, 5L, "other"))
    IncrementalFunnel.processBatch(evs.toDF("u", "t", "et"),
      "u", "t", "et", steps, W, state, 0L)
    def served: Map[Long, Int] =
      IncrementalFunnel.levels(spark, state)
        .as[(Long, Int)].collect().toMap
    assert(served === Map(1L -> 2, 2L -> 3, 3L -> 0))

    // freeze user 2's history (all anchors older than the horizon)
    IncrementalFunnel.compact(spark, state, steps.size, W, cutoffUs = 1000L)
    assert(served === Map(1L -> 2, 2L -> 3, 3L -> 0))

    // forget one live and one frozen user in one op
    val n = ForgetMaintenance.forgetFunnel(spark, Seq(1L, 2L).toDF("user"), state)
    assert(n === 2L)
    assert(served === Map(3L -> 0))
    // idempotent; unknown ids ignored
    assert(ForgetMaintenance.forgetFunnel(spark, Seq(1L, 99L).toDF("user"), state) === 0L)
    assert(served === Map(3L -> 0))
  }

  test("retention: forget == batch triangle minus user") {
    val state = tmpDir("bf-rt")
    val evs = Seq(
      (10L, "signup", 0L), (10L, "click", 0L), (10L, "click", 1L),
      (20L, "signup", 0L), (20L, "click", 2L),
      (30L, "signup", 1L), (30L, "click", 1L))
      .toDF("user_id", "event_type", "day")
    IncrementalRetention.processBatch(evs, state, 0L)
    def served: Map[(Long, Long), Long] =
      IncrementalRetention.read(spark, state)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    assert(served === Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L))
    val n = ForgetMaintenance.forgetRetention(spark, Seq(10L).toDF("user_id"), state)
    assert(n === 1L)
    assert(served === Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L))
    // idempotent
    ForgetMaintenance.forgetRetention(spark, Seq(10L).toDF("user_id"), state)
    assert(served === Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L))
  }

  test("transitions: forget drops the open end; counts stay (conservative contract)") {
    val state = tmpDir("bf-tr")
    val evs = Seq((1L, 0L, 1L, "a"), (1L, 10L, 2L, "b"), (2L, 0L, 3L, "a"))
      .toDF("user", "t", "id", "et")
    IncrementalTransitions.processBatch(evs, state, 0L)
    def served: Map[(String, String), Long] =
      IncrementalTransitions.read(spark, state)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    assert(served === Map(("a", "b") -> 1L, ("b", "<end>") -> 1L, ("a", "<end>") -> 1L))
    val n = ForgetMaintenance.forgetTransitions(spark, Seq(1L).toDF("user"), state)
    assert(n === 1L)
    // user 1's open end is gone; the aggregated a→b count remains — the
    // documented conservative semantics (no per-user decomposition kept)
    assert(served === Map(("a", "b") -> 1L, ("a", "<end>") -> 1L))
    // no future bridge from the forgotten end: user 1's next event
    // starts fresh rather than bridging from the dropped "b"
    IncrementalTransitions.processBatch(
      Seq((1L, 20L, 4L, "c")).toDF("user", "t", "id", "et"), state, 1L)
    assert(served === Map(("a", "b") -> 1L, ("a", "<end>") -> 1L, ("c", "<end>") -> 1L))
  }
}
