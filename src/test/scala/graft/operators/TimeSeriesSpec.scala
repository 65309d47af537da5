package graft.operators

import graft.SparkTestBase

/** Hand-computed z-score spike detection ([[TimeSeries.spikeStats]]). */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private val bucketNs = 600L * 1000000000L // 10 minutes

  test("spikeStats flags a planted spike with exact integer decisions") {
    // type "a": 10 buckets of 1 event + one bucket of 12.
    // n=11, s=22, ss=154; spike dev = 12*11-22 = 110, varNum = 11*154-22² = 1210
    // dev² = 12100 > 9*1210 = 10890 → z3; z = 110/sqrt(1210) = 3.16227…→ 3.1623
    val a = (0 until 10).map(i => ("a", i * bucketNs + 5L)) ++
      (0 until 12).map(k => ("a", 10 * bucketNs + k.toLong))
    // type "b": constant counts → varNum = 0 → no z, null max
    val b = (0 until 6).map(i => ("b", i * bucketNs + 7L))
    val df = (a ++ b).toDF("event_type", "ts")

    val got = TimeSeries.spikeStats(df, "event_type", "ts", minutes = 10)
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
    assert(got(0) === (("a", 11L, 22L, 1L, 1L, Some(3.1623))))
    assert(got(1) === (("b", 6L, 6L, 0L, 0L, None)))
    Caching.releaseAll()
  }

  test("bucketCounts floors epoch nanos to the bucket start second") {
    val df = Seq(("x", bucketNs - 1L), ("x", bucketNs), ("x", bucketNs + 1L))
      .toDF("event_type", "ts")
    val got = TimeSeries.bucketCounts(df, "event_type", "ts", minutes = 10)
      .orderBy("bucket_start")
      .as[(String, Long, Long)].collect()
    assert(got === Array(("x", 0L, 1L), ("x", 600L, 2L)))
  }

  test("patternSearch: planted exact shape ranks first; gapped windows excluded") {
    import org.apache.spark.sql.functions.col
    def minuteN(m: Long): Long = m * 60L * 1000000000L
    // buckets (10-min): counts [1,3,1, 2,5, …gap…, 2,5] for type "t":
    // pattern (2,5) occurs exactly at buckets 3-4; the second (2,5) pair
    // spans a GAP (bucket 6 missing) so it must NOT form a window
    val events =
      Seq.fill(1)(("t", minuteN(0))) ++ Seq.fill(3)(("t", minuteN(10))) ++
        Seq.fill(1)(("t", minuteN(20))) ++ Seq.fill(2)(("t", minuteN(30))) ++
        Seq.fill(5)(("t", minuteN(40))) ++
        Seq.fill(2)(("t", minuteN(70))) ++ Seq.fill(5)(("t", minuteN(90)))
    val got = TimeSeries.patternSearch(events.toDF("event_type", "ts"),
        "event_type", "ts", minutes = 10, pattern = Seq(2L, 5L), k = 3)
      .orderBy("rn").as[(String, Long, Long, Long)].collect()
    assert(got.head == (("t", 1800L, 0L, 1L))) // exact match at bucket 30min
    // no window may start at the gapped pair (bucket 70min): starts are
    // only contiguous-bucket positions
    assert(!got.exists(_._2 == 4200L))
    graft.operators.Caching.releaseAll()
  }

  test("decayedSum: exact power-of-2 day decay anchored at the corpus max day") {
    import spark.implicits._
    val DAY = 86400000000L
    val rows = Seq(
      ("a", 2 * DAY, 1.00), // age 0: 100 cents -> 100_000_000 e6
      ("a", 1 * DAY, 1.00), // age 1: -> 50_000_000
      ("a", 0L, 0.01),      // age 2: 1 cent -> 1_000_000 DIV 4 = 250_000
      ("b", 2 * DAY, 0.02)  // age 0: 2 cents -> 2_000_000
    ).toDF("g", "t_us", "v")
    val r = graft.operators.TimeSeries.decayedSum(rows, "g", "t_us",
        graft.functions.cents(org.apache.spark.sql.functions.col("v")))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    assert(r === Seq(("a", 3L, 201L, 150250000L), ("b", 1L, 2L, 2000000L)))

    // state-served read: the same figures off a maintained (g, day)
    // summary — one row per (g, day) makes per-day folding a no-op, so
    // the equivalence is exact
    import org.apache.spark.sql.functions._
    val summary = rows
      .groupBy(col("g"), expr("t_us DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.cents(col("v"))).as("sum_cents"))
    val served = graft.operators.TimeSeries.decayedSumFromDaySummary(summary, "g")
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    assert(served === r)
  }

  test("maxIntersections: peak concurrency, earliest peak, back-to-back excluded") {
    import spark.implicits._
    val iv = Seq(
      // k=a: [0,10) [5,15) [10,20): peak 2, first reached at p=5; the
      //      end at 10 closes BEFORE the start at 10 opens (ord order),
      //      so the stack never reaches 3
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 10L, 20L),
      // k=b: back-to-back [0,10) [10,20) never overlap -> peak 1 at 0
      ("b", 0L, 10L), ("b", 10L, 20L),
      // k=c: two identical intervals open simultaneously -> tie-peers
      //      share the post-batch count 2 at p=0
      ("c", 0L, 10L), ("c", 0L, 10L)
    ).toDF("k", "s", "e")
    val r = TimeSeries.maxIntersections(iv, "k", "s", "e")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(r === Seq(("a", 2L, 5L), ("b", 1L, 0L), ("c", 2L, 0L)))
  }

  test("deltaSum: positive steps only, first row zero, day states fold exactly") {
    import spark.implicits._
    val DAY = 86400000000L
    // k=a day0: 10,4,6 (inner 2); day1: 9,5 (inner 0); bridge max(0,9-6)=3
    // direct steps: 0,0,2,3,0 -> 5
    val rows = Seq(
      ("a", 0L, 1L, 10L), ("a", 1L, 2L, 4L), ("a", 2L, 3L, 6L),
      ("a", DAY, 4L, 9L), ("a", DAY + 1L, 5L, 5L),
      // k=b: a tie timestamp resolved by the id tiebreak: (t=0,id=1,v=7)
      //      then (t=0,id=2,v=9) -> step 2
      ("b", 0L, 2L, 9L), ("b", 0L, 1L, 7L)
    ).toDF("k", "t", "id", "v")
    val direct = TimeSeries.deltaSum(rows, "k", "t", "id", "v")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(direct === Seq(("a", 5L, 5L), ("b", 2L, 2L)))

    // mergeable read: fold per-day (first, last, inner) states
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k", "day").orderBy("t", "id")
    val states = rows
      .withColumn("day", expr("t DIV 86400000000"))
      .withColumn("prev", lag(col("v"), 1).over(w))
      .withColumn("step", when(col("prev").isNull, lit(0L))
        .otherwise(greatest(col("v") - col("prev"), lit(0L))))
      .withColumn("rn_a", row_number().over(w))
      .withColumn("rn_d", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("k", "day").orderBy(col("t").desc, col("id").desc)))
      .groupBy("k", "day")
      .agg(count(lit(1)).as("n"),
        max(when(col("rn_a") === 1, col("v"))).as("first_v"),
        max(when(col("rn_d") === 1, col("v"))).as("last_v"),
        sum(col("step")).as("inner"))
    val folded = TimeSeries.deltaSumFromDayStates(states, "k")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(folded === direct)
  }

  test("lttb: pinned ends, per-bucket area argmax vs next-bucket average, passthrough") {
    import spark.implicits._
    // n=8, B=6 -> mid rn 2..7, bk = 0,0,1,2,2,3; planted peaks at t=2
    // (bk0) and t=5 (bk2) must win their buckets; singleton buckets pass
    val big = Seq((0L, 0L), (1L, 0L), (2L, 100L), (3L, 0L), (4L, 0L),
      (5L, 50L), (6L, 0L), (7L, 0L)).map { case (t, v) => ("big", t, v, t) }
    val sm = Seq(("sm", 0L, 5L, 0L), ("sm", 1L, 6L, 1L)) // n=2 <= B
    val df = (big ++ sm).toDF("g", "t", "v", "id")
    val r = TimeSeries.lttb(df, "g", "t", "v", "id", nBuckets = 6)
      .orderBy("g", "sel").as[(String, Int, Long, Long)].collect().toSeq
    assert(r === Seq(
      ("big", 0, 0L, 0L), ("big", 1, 2L, 100L), ("big", 2, 3L, 0L),
      ("big", 3, 5L, 50L), ("big", 4, 6L, 0L), ("big", 5, 7L, 0L),
      ("sm", 0, 0L, 5L), ("sm", 1, 1L, 6L)))
    Caching.releaseAll()
  }

  test("sparkbar: integer heights, bucket-ordered glyphs, single-bucket full block") {
    import spark.implicits._
    val counts = Seq(("a", 0L, 1L), ("a", 2L, 14L), ("a", 1L, 7L), ("b", 5L, 5L))
      .toDF("k", "day", "cnt")
    val r = TimeSeries.sparkbar(counts, "k", "day", "cnt")
      .orderBy("k").as[(String, Long, String)].collect().toSeq
    // a: mx=14 -> h = 0, 7*7/14=3, 7 in day order -> lowest, mid, full
    assert(r === Seq(("a", 3L, "▁▄█"), ("b", 1L, "█")))
  }

  test("periodDetect: planted period-3 wins; changePoint finds the step") {
    import spark.implicits._
    // period 3: spikes at buckets 0, 3, 6 of a 9-bucket series
    val per = Seq(10L, 1L, 1L, 10L, 1L, 1L, 10L, 1L, 1L).zipWithIndex
      .map { case (c, b) => ("p", b.toLong, c) }
    val rp = TimeSeries.periodDetect(per.toDF("k", "b", "cnt"),
        "k", "b", "cnt", maxLag = 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rp.head._1 == "p" && rp.head._2 == 9L && rp.head._3 == 3L)

    // step at bucket 3 of [0,0,0,10,10,10]: dev = |6·cum − idx·30| peaks
    // at idx 3 (bucket 2) with 90
    val st = Seq(0L, 0L, 0L, 10L, 10L, 10L).zipWithIndex
      .map { case (c, b) => ("s", b.toLong, c) }
    val rc = TimeSeries.changePoint(st.toDF("k", "b", "cnt"), "k", "b", "cnt")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rc === Seq(("s", 6L, 2L, 90L)))
  }

  test("intervalCoverage: overlaps merge, containment counts once, islands split") {
    import spark.implicits._
    val iv = Seq(
      // k=a: [0,10) ∪ [5,20) merge -> [0,20); [20,25) touches END-exclusive
      //      boundary (20 > pm=20 is false) -> SAME island -> [0,25);
      //      [40,50) is a gap -> island 2. covered = 25 + 10 = 35
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L), ("a", 40L, 50L),
      // k=b: [0,100) contains [10,20) and duplicates -> one island, 100
      ("b", 0L, 100L), ("b", 10L, 20L), ("b", 10L, 20L),
      // k=c: single point-ish interval
      ("c", 7L, 8L)
    ).toDF("k", "s", "e")
    val r = graft.operators.TimeSeries.intervalCoverage(iv, "k", "s", "e")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(r === Seq(("a", 35L, 2L), ("b", 100L, 1L), ("c", 1L, 1L)))
  }
}
