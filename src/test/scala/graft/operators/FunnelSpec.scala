package graft.operators

import graft.SparkTestBase

/** Funnel / retention on planted event sequences (timestamps in µs). */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private val DAY = 86400000000L
  private val steps = Seq("signup", "click", "purchase")

  test("windowFunnel: levels, window cutoff, and the late-anchor rescue") {
    val events = Seq(
      // u1 completes the chain inside the window
      (1L, "signup", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      // u2 clicks but purchases AFTER the window -> level 2
      (2L, "signup", 0L), (2L, "click", 10L), (2L, "purchase", 8 * DAY),
      // u3: first anchor's window misses, a LATER anchor completes ->
      // level 3 only because every step-1 occurrence anchors a chain
      (3L, "signup", 0L), (3L, "signup", 7 * DAY),
      (3L, "click", 7 * DAY + 10L), (3L, "purchase", 7 * DAY + 20L),
      // u4 purchase precedes click -> strictly-increasing chain stops at 2
      (4L, "signup", 0L), (4L, "purchase", 5L), (4L, "click", 10L),
      // u5 never signs up -> level 0
      (5L, "click", 0L), (5L, "purchase", 10L)
    ).toDF("user_id", "event_type", "t_us")

    val lv = Funnel.windowFunnel(events, "user_id", "t_us", "event_type",
      steps, windowUs = 7 * DAY).as[(Long, Int)].collect().toMap
    assert(lv === Map(1L -> 3, 2L -> 2, 3L -> 3, 4L -> 2, 5L -> 0))
  }

  test("sequenceMatch: per-gap bounds, feasible-set beats greedy, unbounded gaps") {
    val events = Seq(
      // u1: view -> click(+10) -> purchase(+10), all inside 1h gaps
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      // u2: the greedy killer — both clicks are view-reachable, but the
      // earliest (t=1) strands the purchase (80 > 1+50); only the later
      // click (t=40) reaches it
      (2L, "view", 0L), (2L, "click", 1L), (2L, "click", 40L),
      (2L, "purchase", 80L),
      // u3: purchase exceeds its gap from the matched click -> no match
      (3L, "view", 0L), (3L, "click", 10L), (3L, "purchase", 1000L),
      // u4: right types, wrong order
      (4L, "purchase", 0L), (4L, "click", 10L), (4L, "view", 20L),
      // u5: no view at all
      (5L, "click", 0L), (5L, "purchase", 10L)
    ).toDF("user_id", "event_type", "t_us")

    val m = Funnel.sequenceMatch(events, "user_id", "t_us", "event_type",
        Seq(("view", None), ("click", Some(50L)), ("purchase", Some(50L))))
      .as[(Long, Int)].collect().toMap
    assert(m === Map(1L -> 1, 2L -> 1, 3L -> 0, 4L -> 0, 5L -> 0))

    // unbounded gaps: pure subsequence containment
    val m2 = Funnel.sequenceMatch(events, "user_id", "t_us", "event_type",
        Seq(("view", None), ("purchase", None)))
      .as[(Long, Int)].collect().toMap
    assert(m2 === Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 0))
  }

  test("conversionLatency: min over anchors, only full-chain completers appear") {
    val events = Seq(
      (1L, "signup", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      // u2 never completes -> absent
      (2L, "signup", 0L), (2L, "click", 10L),
      // u3: anchor@0 window misses; anchor@7d completes in 20µs -> 20, 1 anchor
      (3L, "signup", 0L), (3L, "signup", 7 * DAY),
      (3L, "click", 7 * DAY + 10L), (3L, "purchase", 7 * DAY + 20L),
      // u4: two completing anchors (0 -> 500, 100 -> 200); min latency 100
      (4L, "signup", 0L), (4L, "signup", 100L),
      (4L, "click", 150L), (4L, "purchase", 200L), (4L, "purchase", 500L)
    ).toDF("user_id", "event_type", "t_us")

    val r = Funnel.conversionLatency(events, "user_id", "t_us", "event_type",
        steps, windowUs = 7 * DAY)
      .as[(Long, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r === Map(1L -> ((20L, 1L)), 3L -> ((20L, 1L)), 4L -> ((100L, 2L))))
  }

  test("sequenceCount2: non-overlapping greedy chains via the bracket identity") {
    val events = Seq(
      // u1: A B A B -> 2 chains
      (1L, "view", 0L), (1L, "purchase", 1L), (1L, "view", 2L), (1L, "purchase", 3L),
      // u2: A B B A -> 1 (second B unmatched, trailing A unmatched)
      (2L, "view", 0L), (2L, "purchase", 1L), (2L, "purchase", 2L), (2L, "view", 3L),
      // u3: A A B B -> 2 (both As matched in order)
      (3L, "view", 0L), (3L, "view", 1L), (3L, "purchase", 2L), (3L, "purchase", 3L),
      // u4: B A B -> 1 (leading B unmatched)
      (4L, "purchase", 0L), (4L, "view", 1L), (4L, "purchase", 2L),
      // u5: same-instant pair never matches (strict t2 > t1)
      (5L, "view", 7L), (5L, "purchase", 7L),
      // u6: only purchases -> 0
      (6L, "purchase", 0L), (6L, "purchase", 1L)
    ).toDF("user_id", "event_type", "t_us")

    val r = Funnel.sequenceCount2(events, "user_id", "t_us", "event_type",
        "view", "purchase")
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L, 6L -> 0L))
  }

  test("retention: cohort day from first signup, half-open condition windows") {
    val events = Seq(
      // u1: signup day 0; click on day 1 (retained), purchase day 6 (converted)
      (1L, "signup", 0L), (1L, "click", DAY + 5L), (1L, "purchase", 6 * DAY),
      // u2: signup day 0; click on day 0 (NOT day-1 retention), no purchase
      (2L, "signup", 100L), (2L, "click", 200L),
      // u3: signup day 2; purchase exactly at the 7-day bound -> excluded
      (3L, "signup", 2 * DAY), (3L, "purchase", 9 * DAY),
      // u4: no signup -> no cohort row
      (4L, "click", 0L)
    ).toDF("user_id", "event_type", "t_us")

    val r = Funnel.retention(events, "user_id", "t_us", "event_type", "signup",
        Seq(("ret_click_d1", "click", DAY, 2 * DAY),
          ("ret_purchase_d7", "purchase", 0L, 7 * DAY)))
      .orderBy("cohort_day")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq((0L, 2L, 1L, 1L), (2L, 1L, 0L, 0L)))
  }

  test("windowFunnelStrictOrder: intervening event aborts; window cuts deep steps") {
    val W = 10L
    val events = Seq(
      // u1: clean consecutive chain -> 3
      (1L, 0L, 1L, "signup"), (1L, 1L, 2L, "click"), (1L, 2L, 3L, "purchase"),
      // u2: view intervenes between signup and click -> aborts at 1
      (2L, 0L, 1L, "signup"), (2L, 1L, 2L, "view"), (2L, 2L, 3L, "click"),
      // u3: click is consecutive but outside the window -> 1
      (3L, 0L, 1L, "signup"), (3L, 20L, 2L, "click"),
      // u4: no anchor -> 0
      (4L, 5L, 1L, "view")
    ).toDF("user_id", "t_us", "event_id", "event_type")
    val r = Funnel.windowFunnelStrictOrder(events, "user_id", "t_us",
        "event_id", "event_type", Seq("signup", "click", "purchase"), W)
      .orderBy("user").as[(Long, Int)].collect().toSeq
    assert(r === Seq((1L, 3), (2L, 1), (3L, 1), (4L, 0)))
  }

  test("windowFunnelStrictDedup: matched-step repeat kills the chain, scan not feasibility") {
    val W = 100L
    val events = Seq(
      // u1: A B B' C — the scan's A-B chain dies at B' (dup of matched
      // click inside (B, C)) -> level 2; feasibility would report 3
      (1L, 0L, "signup"), (1L, 1L, "click"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // u2: clean A B C -> 3
      (2L, 0L, "signup"), (2L, 1L, "click"), (2L, 2L, "purchase"),
      // u3: A A' B — anchor A dies (signup dup in (0,2)); anchor A'
      // survives (gap (1,2) clean) -> level 2
      (3L, 0L, "signup"), (3L, 1L, "signup"), (3L, 2L, "click"),
      // u4: A B A' C — dup of matched SIGNUP inside (B, C) kills it -> 2
      (4L, 0L, "signup"), (4L, 1L, "click"), (4L, 2L, "signup"), (4L, 3L, "purchase")
    ).toDF("user_id", "t_us", "event_type")
    val r = Funnel.windowFunnelStrictDedup(events, "user_id", "t_us",
        "event_type", Seq("signup", "click", "purchase"), W)
      .orderBy("user").as[(Long, Int)].collect().toSeq
    assert(r === Seq((1L, 2), (2L, 3), (3L, 2), (4L, 2)))
  }

  test("nextNodeCounts: total-order successor, tie broken by id, terminal <end>") {
    val events = Seq(
      // u1: signup(t=0) -> click(t=1); a same-instant pair at t=5 where
      // the id tiebreak decides: signup(id=10) then view(id=11)
      (1L, 0L, 1L, "signup"), (1L, 1L, 2L, "click"),
      (1L, 5L, 10L, "signup"), (1L, 5L, 11L, "view"),
      // u2: trailing signup with no successor -> <end>
      (2L, 3L, 20L, "click"), (2L, 9L, 21L, "signup")
    ).toDF("user_id", "t_us", "event_id", "event_type")
    val r = Funnel.nextNodeCounts(events, "user_id", "t_us", "event_id",
        "event_type", "signup")
      .orderBy("next_type").as[(String, Long)].collect().toSeq
    assert(r === Seq(("<end>", 1L), ("click", 1L), ("view", 1L)))
  }
}
