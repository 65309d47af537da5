package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** The maintained INTERVAL (overlap) join-aggregate must equal the
  * batch range-join recompute over the integrated inputs after EVERY
  * batch — including the M:N shapes the as-of family cannot express: a
  * fact covered by TWO concurrent windows counts toward both, a window
  * replace moves every covered fact at once, and a window delete
  * retracts exactly its matches (other overlapping windows keep
  * theirs). */
class IncrementalIntervalJoinAggSpec extends SparkTestBase {
  import spark.implicits._

  private type Fact = (Long, Long, Long, Long)         // id, t, m, k
  private type Ival = (Long, Long, Long, Long, String) // iid, k, s, e, vs

  /** Reference model: batch range join-aggregate in plain Scala. */
  private def model(facts: Iterable[Fact], ivals: Iterable[Ival])
      : Map[String, (Long, Long)] = {
    val byK = ivals.groupBy(_._2)
    facts.flatMap { case (_, t, m, k) =>
      byK.getOrElse(k, Nil).collect {
        case (_, _, s, e, vs) if s <= t && t < e => (vs, m)
      }
    }.groupBy(_._1)
      .map { case (g, ms) => g -> (ms.map(_._2).sum, ms.size.toLong) }
  }

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalIntervalJoinAgg.view(spark, state)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def integral(state: String): Map[String, (Long, Long)] =
    IncrementalIntervalJoinAgg.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("c"))
      .filter(col("c") > 0)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private val noF = Seq.empty[Fact].toDF("id", "t", "m", "k")
  private val noFD = Seq.empty[(Long, Long)].toDF("id", "k")
  private val noI = Seq.empty[Ival].toDF("iid", "k", "s", "e", "vs")
  private val noID = Seq.empty[(Long, Long)].toDF("iid", "k")

  private def fold(state: String, id: Long,
      facts: Seq[Fact] = Nil, factDels: Seq[(Long, Long)] = Nil,
      intUps: Seq[Ival] = Nil, intDels: Seq[(Long, Long)] = Nil): Unit =
    IncrementalIntervalJoinAgg.processBatch(
      if (facts.isEmpty) noF else facts.toDF("id", "t", "m", "k"),
      if (factDels.isEmpty) noFD else factDels.toDF("id", "k"),
      if (intUps.isEmpty) noI else intUps.toDF("iid", "k", "s", "e", "vs"),
      if (intDels.isEmpty) noID else intDels.toDF("iid", "k"),
      state, id, numBuckets = 4)

  test("half-open [s,e) bounds; overlap double-counts; unmatched facts drop") {
    val state = tmpDir("ija")
    fold(state, 0L, intUps = Seq(
      (1L, 1L, 100L, 200L, "a"),
      (2L, 1L, 150L, 300L, "b"),   // overlaps a on [150, 200)
      (3L, 2L, 0L, 50L, "c")))
    fold(state, 1L, facts = Seq(
      (10L, 100L, 1L, 1L),   // t == s inclusive -> a
      (11L, 175L, 2L, 1L),   // inside BOTH a and b -> counts twice
      (12L, 200L, 4L, 1L),   // t == a.e exclusive -> b only
      (13L, 350L, 8L, 1L),   // after every window -> drops
      (14L, 25L, 16L, 2L),   // key 2 -> c
      (15L, 25L, 32L, 3L)))  // key with no windows -> drops
    assert(served(state) === Map(
      "a" -> (3L, 2L), "b" -> (6L, 2L), "c" -> (16L, 1L)))
    // bucket-pruned point read: named groups only, absent names empty
    assert(IncrementalIntervalJoinAgg.viewFor(spark, state, Seq("b", "zz"),
        numBuckets = 4)
      .as[(String, Long, Long)].collect().toSeq === Seq(("b", 6L, 2L)))
  }

  test("window replace moves its covered facts; identical upsert no-ops") {
    val state = tmpDir("ija-rep")
    fold(state, 0L, intUps = Seq((1L, 1L, 100L, 200L, "a")),
      facts = Seq((10L, 120L, 1L, 1L), (11L, 250L, 2L, 1L)))
    assert(served(state) === Map("a" -> (1L, 1L)))
    // widen the window and relabel: fact 11 enters, group moves to z
    fold(state, 1L, intUps = Seq((1L, 1L, 100L, 300L, "z")))
    assert(served(state) === Map("z" -> (3L, 2L)))
    // re-sending the identical row ships an empty Z-set
    fold(state, 2L, intUps = Seq((1L, 1L, 100L, 300L, "z")))
    assert(served(state) === Map("z" -> (3L, 2L)))
    // shrink: fact 11 leaves again
    fold(state, 3L, intUps = Seq((1L, 1L, 100L, 200L, "z")))
    assert(served(state) === Map("z" -> (1L, 1L)))
  }

  test("window delete retracts only its matches; overlapping peer keeps its own") {
    val state = tmpDir("ija-del")
    fold(state, 0L,
      intUps = Seq((1L, 1L, 100L, 200L, "a"), (2L, 1L, 150L, 250L, "b")),
      facts = Seq((10L, 175L, 1L, 1L), (11L, 220L, 2L, 1L)))
    assert(served(state) === Map("a" -> (1L, 1L), "b" -> (3L, 2L)))
    fold(state, 1L, intDels = Seq((1L, 1L)))
    assert(served(state) === Map("b" -> (3L, 2L)))
    fold(state, 2L, intDels = Seq((1L, 1L)))     // absent delete no-ops
    assert(served(state) === Map("b" -> (3L, 2L)))
    // in-batch upsert+delete of one iid: delete-wins, net absent
    fold(state, 3L, intUps = Seq((5L, 1L, 0L, 999L, "x")),
      intDels = Seq((5L, 1L)))
    assert(served(state) === Map("b" -> (3L, 2L)))
  }

  test("fact deletes retract across EVERY covering window; re-sent id no-ops") {
    val state = tmpDir("ija-fd")
    fold(state, 0L,
      intUps = Seq((1L, 1L, 0L, 100L, "a"), (2L, 1L, 50L, 150L, "b")),
      facts = Seq((10L, 75L, 1L, 1L), (11L, 25L, 2L, 1L)))
    assert(served(state) === Map("a" -> (3L, 2L), "b" -> (1L, 1L)))
    fold(state, 1L, factDels = Seq((10L, 1L)))   // covered by a AND b
    assert(served(state) === Map("a" -> (2L, 1L)))
    // same id inserted and deleted in one batch nets absent
    fold(state, 2L, facts = Seq((12L, 60L, 4L, 1L)), factDels = Seq((12L, 1L)))
    assert(served(state) === Map("a" -> (2L, 1L)))
    fold(state, 3L, facts = Seq((11L, 25L, 2L, 1L)), factDels = Seq((99L, 1L)))
    assert(served(state) === Map("a" -> (2L, 1L)))
  }

  test("random CDC interleave ≡ model after every batch; integral == view; as-of") {
    val rnd = new scala.util.Random(321)
    val state = tmpDir("ija-rand")
    var liveF = Map.empty[Long, Fact]
    var liveI = Map.empty[Long, Ival]
    var nextId = 0L
    val history = scala.collection.mutable.ArrayBuffer
      .empty[Map[String, (Long, Long)]]
    for (b <- 0 until 12) {
      val fs = (0 until rnd.nextInt(6)).map { _ =>
        nextId += 1
        (nextId, rnd.nextInt(1000).toLong, 1L + rnd.nextInt(9),
          1L + rnd.nextInt(4))
      }
      val fd = liveF.keys.toSeq.sorted
        .filter(_ => rnd.nextDouble() < 0.15)
        .map(id => (id, liveF(id)._4))
      // upserts: half new iids, half replacing live ones (same k — the
      // iid-pins-k contract); windows overlap freely
      val newUps = (0 until rnd.nextInt(3)).map { _ =>
        nextId += 1
        (nextId, 1L + rnd.nextInt(4), rnd.nextInt(800).toLong,
          (800 + rnd.nextInt(400)).toLong, s"w${rnd.nextInt(4)}")
      }
      val repUps = liveI.values.toSeq.sortBy(_._1)
        .filter(_ => rnd.nextDouble() < 0.2)
        .map { case (iid, k, _, _, _) =>
          (iid, k, rnd.nextInt(800).toLong,
            (800 + rnd.nextInt(400)).toLong, s"w${rnd.nextInt(4)}")
        }
      val iUp = newUps ++ repUps
      val iDel = liveI.values.toSeq.sortBy(_._1)
        .filter(_ => rnd.nextDouble() < 0.15)
        .map(i => (i._1, i._2))
      fold(state, b.toLong, facts = fs, factDels = fd, intUps = iUp,
        intDels = iDel)
      val iDelSet = iDel.map(_._1).toSet
      liveF = (liveF ++ fs.map(f => f._1 -> f)) -- fd.map(_._1) --
        fs.map(_._1).intersect(fd.map(_._1))
      // within-batch latest-wins per iid is deterministic min-struct
      liveI = (liveI ++ iUp.groupBy(_._1).map { case (iid, rows) =>
        iid -> rows.minBy(r => (r._2, r._3, r._4, r._5))
      }) -- iDelSet
      val want = model(liveF.values, liveI.values)
      assert(served(state) === want, s"batch $b view diverged")
      assert(integral(state) === want, s"batch $b integral != view")
      history += want
    }
    for (b <- Seq(3, 7, 11)) {
      val got = IncrementalIntervalJoinAgg.viewAsOf(spark, state, b.toLong)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === history(b), s"as-of batch $b diverged")
    }
    IncrementalIntervalJoinAgg.compactChangelog(spark, state, 7L)
    assert(integral(state) === history.last)
    val got9 = IncrementalIntervalJoinAgg.viewAsOf(spark, state, 9L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got9 === history(9))
  }

  test("multi-measure (R161): both sums move together through replace and delete") {
    val state = tmpDir("ija-mm")
    def foldMM(id: Long, facts: Seq[(Long, Long, Long, Long, Long)] = Nil,
        factDels: Seq[(Long, Long)] = Nil, intUps: Seq[Ival] = Nil,
        intDels: Seq[(Long, Long)] = Nil): Unit =
      IncrementalIntervalJoinAgg.processBatch(
        if (facts.isEmpty) Seq.empty[(Long, Long, Long, Long, Long)]
          .toDF("id", "t", "m", "m2", "k")
        else facts.toDF("id", "t", "m", "m2", "k"),
        if (factDels.isEmpty) noFD else factDels.toDF("id", "k"),
        if (intUps.isEmpty) noI else intUps.toDF("iid", "k", "s", "e", "vs"),
        if (intDels.isEmpty) noID else intDels.toDF("iid", "k"),
        state, id, numBuckets = 4, numMeasures = 2)
    def servedMM: Map[String, (Long, Long, Long)] =
      IncrementalIntervalJoinAgg.view(spark, state, numMeasures = 2)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    foldMM(0L, intUps = Seq((1L, 1L, 0L, 100L, "a"), (2L, 1L, 50L, 150L, "b")),
      facts = Seq((10L, 75L, 3L, 30L, 1L), (11L, 120L, 5L, 50L, 1L)))
    assert(servedMM === Map("a" -> (3L, 30L, 1L), "b" -> (8L, 80L, 2L)))
    // replace window b narrower: fact 11 leaves BOTH measures at once
    foldMM(1L, intUps = Seq((2L, 1L, 50L, 100L, "b")))
    assert(servedMM === Map("a" -> (3L, 30L, 1L), "b" -> (3L, 30L, 1L)))
    // fact delete retracts from every covering window, both measures
    foldMM(2L, factDels = Seq((10L, 1L)))
    assert(servedMM === Map.empty)
  }

  test("replaying a committed batch id is a no-op") {
    val state = tmpDir("ija-replay")
    fold(state, 0L, intUps = Seq((1L, 1L, 0L, 100L, "a")),
      facts = Seq((10L, 10L, 5L, 1L)))
    fold(state, 1L, facts = Seq((11L, 20L, 7L, 1L)))
    val before = served(state)
    fold(state, 1L, facts = Seq((11L, 20L, 7L, 1L)))
    assert(served(state) === before)
  }

  test("forgetKeys removes the keys' facts and windows in one CDC batch") {
    val state = tmpDir("ija-fg")
    fold(state, 0L,
      intUps = Seq((1L, 1L, 0L, 100L, "a"), (2L, 2L, 0L, 100L, "a")),
      facts = Seq((10L, 10L, 1L, 1L), (11L, 10L, 2L, 2L)))
    assert(served(state) === Map("a" -> (3L, 2L)))
    IncrementalIntervalJoinAgg.forgetKeys(spark, Seq(1L), state, 1L,
      numBuckets = 4)
    assert(served(state) === Map("a" -> (2L, 1L)))
    assert(integral(state) === served(state), "integral through the forget")
    // replay of the forget batch is a no-op
    IncrementalIntervalJoinAgg.forgetKeys(spark, Seq(1L), state, 1L,
      numBuckets = 4)
    assert(served(state) === Map("a" -> (2L, 1L)))
  }

  test("state compaction is EXACT in-contract (no floor needed)") {
    val state = tmpDir("ija-comp")
    val twin = tmpDir("ija-comp-twin")
    def both(id: Long, facts: Seq[Fact] = Nil,
        intUps: Seq[Ival] = Nil, intDels: Seq[(Long, Long)] = Nil): Unit = {
      fold(state, id, facts = facts, intUps = intUps, intDels = intDels)
      fold(twin, id, facts = facts, intUps = intUps, intDels = intDels)
    }
    both(0L, intUps = Seq(
      (1L, 1L, 0L, 100L, "a"),     // closed before the horizon -> drops
      (2L, 1L, 200L, 400L, "b"),   // OPEN at the horizon -> retained
      (3L, 2L, 0L, 150L, "c")),    // closed -> drops
      facts = Seq((10L, 50L, 1L, 1L), (11L, 250L, 2L, 1L),
        (12L, 100L, 4L, 2L)))
    IncrementalIntervalJoinAgg.compactState(spark, state, 300L)
    assert(served(state) === served(twin), "compaction changed the view")
    val fRows = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$state/intervaljoinagg/f", null)
    // facts 10 (t=50) and 12 (t=100) predate the horizon and are covered
    // only by DROPPED windows -> gone; fact 11 (t=250) predates the
    // horizon but sits inside the RETAINED straddling window 2 -> stays
    // (deleting that window must retract its match exactly)
    assert(fRows.count() === 1L, "only the straddle-covered fact survives")
    val iRows = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$state/intervaljoinagg/i", null)
    assert(iRows.count() === 1L, "only the open window survives")
    // in-contract continuation: a fact at t >= horizon still lands in
    // the retained open window; a new window starting at the horizon
    // captures it too — ≡ the uncompacted twin
    both(1L, facts = Seq((13L, 350L, 8L, 1L)),
      intUps = Seq((4L, 1L, 300L, 500L, "d")))
    assert(served(state) === served(twin), "post-compaction fold diverged")
    // deleting the retained open window still retracts exactly
    both(2L, intDels = Seq((2L, 1L)))
    assert(served(state) === served(twin), "open-window delete diverged")
  }

  test("r13 ops guard: compaction reports the pin set; a declared max span drops provably-expired pins") {
    val state = tmpDir("ija-pin")
    // window 2 is open at the horizon and spans 4000 — an always-open
    // shape; windows 5/6 are modest straddlers
    fold(state, 0L, intUps = Seq(
      (2L, 1L, 0L, 4000L, "b"),    // span 4000: pins EVERYTHING it covers
      (5L, 2L, 250L, 400L, "c"),   // span 150: in-contract straddler
      (6L, 2L, 260L, 410L, "d")),  // second straddler, same fact
      facts = Seq(
        (10L, 10L, 1L, 1L),   // ancient, covered only by window 2
        (11L, 280L, 2L, 2L),  // recent pre-horizon, covered by 5 AND 6
        (12L, 500L, 4L, 1L))) // post-horizon
    // no contract: everything covered stays pinned, and the report says so
    val r1 = IncrementalIntervalJoinAgg.compactState(spark, state, 300L)
    assert(r1.pinnedFacts === 2L && r1.oldestPinnedT === Some(10L))
    assert(r1.oldestPinnedAge(300L) === Some(290L))
    assert(r1.pinningWindowCount === 3L &&
      r1.pinningWindowSample === Seq(2L, 5L, 6L))
    assert(r1.droppedExpiredPins === 0L && r1.outOfContractWindowCount === 0L)
    // declared contract span 200: fact 10 (t=10 < 300-200) can only be
    // covered by an out-of-contract window -> its pin drops; fact 11
    // (t=280) stays; window 2 is named as the violator
    val state2 = tmpDir("ija-pin2")
    fold(state2, 0L, intUps = Seq(
      (2L, 1L, 0L, 4000L, "b"), (5L, 2L, 250L, 400L, "c"),
      (6L, 2L, 260L, 410L, "d")),
      facts = Seq((10L, 10L, 1L, 1L), (11L, 280L, 2L, 2L),
        (12L, 500L, 4L, 1L)))
    val r2 = IncrementalIntervalJoinAgg.compactState(spark, state2, 300L,
      maxWindowSpanUs = Some(200L))
    assert(r2.droppedExpiredPins === 1L, "fact 10's pin is provably expired")
    assert(r2.pinnedFacts === 1L && r2.oldestPinnedT === Some(280L))
    assert(r2.outOfContractWindowCount === 1L &&
      r2.outOfContractWindowSample === Seq(2L))
    val fRows = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$state2/intervaljoinagg/f", null)
    assert(fRows.filter("id = 10").count() === 0L, "expired pin dropped")
    assert(fRows.filter("id = 11").count() === 1L, "in-contract pin kept")
    // the view is untouched by the report/contract machinery
    assert(served(state2) === served(state))
  }

  test("r14 ingest guard: a fold declaring maxWindowSpanUs refuses a wider window before any state moves") {
    val state = tmpDir("ija-span")
    def foldSpan(id: Long, intUps: Seq[Ival], facts: Seq[Fact] = Nil): Unit =
      IncrementalIntervalJoinAgg.processBatch(
        if (facts.isEmpty) noF else facts.toDF("id", "t", "m", "k"),
        noFD,
        if (intUps.isEmpty) noI else intUps.toDF("iid", "k", "s", "e", "vs"),
        noID, state, id, numBuckets = 4, maxWindowSpanUs = Some(200L))
    // in-contract windows fold normally under the declared span
    foldSpan(0L, Seq((1L, 1L, 0L, 150L, "a"), (2L, 1L, 100L, 300L, "b")),
      facts = Seq((10L, 120L, 5L, 1L)))
    val before = served(state)
    assert(before.nonEmpty)
    // a violating upsert is refused, names the violator, and leaves
    // the state byte-identical (nothing staged, nothing applied)
    val ex = intercept[IllegalArgumentException] {
      foldSpan(1L, Seq((3L, 1L, 0L, 500L, "c")))
    }
    assert(ex.getMessage.contains("iid=3") &&
      ex.getMessage.contains("maxWindowSpanUs=200"))
    assert(served(state) === before)
    assert(!new java.io.File(s"$state/intervaljoinagg/_delta_b1").exists(),
      "the refused fold must not leave a staged delta")
    // with every fold declaring the span, the compaction's expired-pin
    // drop is airtight: no out-of-contract window can exist
    val r = IncrementalIntervalJoinAgg.compactState(spark, state, 400L,
      maxWindowSpanUs = Some(200L))
    assert(r.outOfContractWindowCount === 0L)
    // bootstrap is an ingest path too: a bootstrapped wide window
    // would outlive every later declared fold
    val exB = intercept[IllegalArgumentException] {
      IncrementalIntervalJoinAgg.bootstrap(
        Seq((10L, 120L, 5L, 1L)).toDF("id", "t", "m", "k"),
        Seq((9L, 1L, 0L, 900L, "w")).toDF("iid", "k", "s", "e", "vs"),
        tmpDir("ija-span-bs"), numBuckets = 4,
        maxWindowSpanUs = Some(200L))
    }
    assert(exB.getMessage.contains("iid=9") &&
      exB.getMessage.contains("bootstrap"))
    // the mixed star's interval branches share the guard
    val st2 = tmpDir("ts-span")
    val exS = intercept[IllegalArgumentException] {
      IncrementalTemporalStar.processBatch(
        Seq((100L, 120L, 1L, 1L)).toDF("id", "t", "m", "k1"),
        Seq.empty[(Long, Long)].toDF("id", "k1"),
        dimUps = Seq(Seq((7L, 1L, 0L, 9000L, "w")).toDF("iid", "k", "s", "e", "vs")),
        dimDels = Seq(Seq.empty[(Long, Long)].toDF("iid", "k")),
        stateDir = st2, batchId = 0L, numBuckets = 4,
        intervalBranches = Set(1), maxWindowSpanUs = Some(200L))
    }
    assert(exS.getMessage.contains("iid=7") &&
      exS.getMessage.contains("branch 1"))
  }

  test("events-as-CDC fold serves the x128 batch twin exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import org.apache.spark.sql.functions._
    val state = tmpDir("ija-x128")
    val ev = graft.Tables.events(spark, dir)
    val facts = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"), col("user_id").as("k"))
    val ints = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("iid"), col("user_id").as("k"),
        expr("ts DIV 1000").as("s"),
        expr("ts DIV 1000 + 600000000").as("e"),
        concat(lit("b"), (graft.functions.cents(col("value")) % 5)
          .cast("string")).as("vs"))
    // 3 out-of-order slices; windows land AFTER the clicks they capture
    for (i <- 0 until 3)
      IncrementalIntervalJoinAgg.processBatch(
        facts.filter(col("id") % 3 === (2 - i)), noFD,
        ints.filter(col("iid") % 3 === i), noID,
        state, i.toLong, numBuckets = 4)
    val twin = graft.queries.ExtQueries.x128AttributedClicks(spark, dir)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(served(state) === twin)
  }

  test("bootstrap from batch tables, then continue with deltas") {
    val state = tmpDir("ija-bs")
    IncrementalIntervalJoinAgg.bootstrap(
      Seq((10L, 50L, 1L, 1L), (11L, 250L, 2L, 1L), (12L, 10L, 4L, 2L))
        .toDF("id", "t", "m", "k"),
      Seq((1L, 1L, 0L, 100L, "a"), (2L, 1L, 200L, 300L, "b"),
        (3L, 2L, 0L, 100L, "a"))
        .toDF("iid", "k", "s", "e", "vs"),
      state, baselineBatch = 0L, numBuckets = 4)
    assert(served(state) === Map("a" -> (5L, 2L), "b" -> (2L, 1L)))
    // continuation: a window replace AND a fact delete fold exactly
    fold(state, 1L, factDels = Seq((12L, 2L)),
      intUps = Seq((2L, 1L, 200L, 260L, "z")))
    assert(served(state) === Map("a" -> (1L, 1L), "z" -> (2L, 1L)))
    assert(IncrementalIntervalJoinAgg.viewAsOf(spark, state, 0L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap ===
      Map("a" -> (5L, 2L), "b" -> (2L, 1L)))
  }

  test("reshard to a new bucket count; folding continues exactly (R163)") {
    val state = tmpDir("ija-rs")
    val state8 = tmpDir("ija-rs8")
    fold(state, 0L, intUps = Seq((1L, 1L, 0L, 100L, "a"), (2L, 1L, 50L, 150L, "b")),
      facts = Seq((10L, 75L, 1L, 1L), (11L, 120L, 2L, 1L)))
    IncrementalIntervalJoinAgg.reshard(spark, state, state8, newBuckets = 8)
    assert(served(state8) === served(state), "reshard changed the view")
    // continue at the NEW count through a window replace + fact delete
    IncrementalIntervalJoinAgg.processBatch(noF,
      Seq((11L, 1L)).toDF("id", "k"),
      Seq((1L, 1L, 0L, 130L, "z")).toDF("iid", "k", "s", "e", "vs"),
      noID, state8, 1L, numBuckets = 8)
    assert(served(state8) === Map("z" -> (1L, 1L), "b" -> (1L, 1L)))
    // point reads prune at the new count
    assert(IncrementalIntervalJoinAgg.viewFor(spark, state8, Seq("z"),
        numBuckets = 8)
      .as[(String, Long, Long)].collect().toSeq === Seq(("z", 1L, 1L)))
  }

  test("start(): mixed CDC stream end-to-end (AvailableNow)") {
    import org.apache.spark.sql.types._
    val in = tmpDir("ija-in")
    val state = tmpDir("ija-st")
    val ckpt = tmpDir("ija-ck")
    val schema = StructType(Seq(
      StructField("kind", StringType), StructField("id", LongType),
      StructField("t", LongType), StructField("m", LongType),
      StructField("k", LongType), StructField("iid", LongType),
      StructField("s", LongType), StructField("e", LongType),
      StructField("vs", StringType)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b0.json"),
      Seq(
        """{"kind":"int","iid":1,"k":1,"s":0,"e":100,"vs":"a"}""",
        """{"kind":"fact","id":10,"t":10,"m":5,"k":1}""",
        """{"kind":"fact","id":11,"t":50,"m":7,"k":1}""",
        """{"kind":"fact_del","id":10,"k":1}""",
        """{"kind":"int_del","iid":9,"k":1}""")
        .mkString("\n").getBytes("UTF-8"))
    val q = IncrementalIntervalJoinAgg.start(spark, in, schema, state, ckpt,
      numBuckets = 4)
    q.awaitTermination()
    assert(served(state) === Map("a" -> (7L, 1L)))
  }
}
