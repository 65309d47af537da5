package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** R167: the MIXED-SHAPE star — one maintained view with a temporal
  * (as-of, ≤1 match, LEFT) branch AND an interval (overlap-window,
  * ≥0 matches, INNER fan-out) branch — must equal the batch
  * ASOF-plus-range-join recompute over the integrated inputs after
  * EVERY batch, under any interleave of the six CDC inputs. The
  * fan-out multiplicity must survive a LATER as-of resolve (the
  * `_tag` device), and each side's corrections move only their own
  * coordinate. */
class IncrementalMixedStarSpec extends SparkTestBase {
  import spark.implicits._

  private type Fact = (Long, Long, Long, Long, Long)  // id, t, m, k1, k2
  private type Ver = (Long, Long, String)             // k, vf, vs
  private type Win = (Long, Long, Long, Long, String) // iid, k, s, e, vs

  /** Reference model: as-of resolve on branch 1, fan-out window match
    * on branch 2 (INNER), in plain Scala. */
  private def model(facts: Iterable[Fact], v1: Iterable[Ver],
      w2: Iterable[Win]): Map[(Option[String], String), (Long, Long)] = {
    def res(k: Long, t: Long): Option[String] =
      v1.filter(v => v._1 == k && v._2 <= t) match {
        case vs if vs.isEmpty => None
        case vs               => Some(vs.maxBy(_._2)._3)
      }
    val tuples = for {
      (_, t, m, k1, k2) <- facts.toSeq
      (_, wk, s, e, vs) <- w2 if wk == k2 && s <= t && t < e
    } yield ((res(k1, t), vs), m)
    tuples.groupBy(_._1)
      .map { case (g, ts) => g -> (ts.map(_._2).sum, ts.size.toLong) }
  }

  private def served(state: String)
      : Map[(Option[String], String), (Long, Long)] =
    IncrementalTemporalStar.view(spark, state, numBranches = 2)
      .as[(Option[String], String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  private def integral(state: String)
      : Map[(Option[String], String), (Long, Long)] =
    IncrementalTemporalStar.changelog(spark, state, numBranches = 2)
      .groupBy("g1", "g2")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("c"))
      .filter(col("c") > 0)
      .as[(Option[String], String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  private val noF = Seq.empty[Fact].toDF("id", "t", "m", "k1", "k2")
  private val noFD = Seq.empty[(Long, Long, Long)].toDF("id", "k1", "k2")
  private val noD = Seq.empty[Ver].toDF("k", "vf", "vs")
  private val noDD = Seq.empty[(Long, Long)].toDF("k", "vf")
  private val noW = Seq.empty[Win].toDF("iid", "k", "s", "e", "vs")
  private val noWD = Seq.empty[(Long, Long)].toDF("iid", "k")

  private def fold(state: String, id: Long,
      facts: Seq[Fact] = Nil, factDels: Seq[(Long, Long, Long)] = Nil,
      d1Ups: Seq[Ver] = Nil, d1Dels: Seq[(Long, Long)] = Nil,
      w2Ups: Seq[Win] = Nil, w2Dels: Seq[(Long, Long)] = Nil): Unit =
    IncrementalTemporalStar.processBatch(
      if (facts.isEmpty) noF else facts.toDF("id", "t", "m", "k1", "k2"),
      if (factDels.isEmpty) noFD else factDels.toDF("id", "k1", "k2"),
      Seq(if (d1Ups.isEmpty) noD else d1Ups.toDF("k", "vf", "vs"),
        if (w2Ups.isEmpty) noW else w2Ups.toDF("iid", "k", "s", "e", "vs")),
      Seq(if (d1Dels.isEmpty) noDD else d1Dels.toDF("k", "vf"),
        if (w2Dels.isEmpty) noWD else w2Dels.toDF("iid", "k")),
      state, id, numBuckets = 4, intervalBranches = Set(2))

  test("fan-out, uncovered drop, null as-of coordinate, point read") {
    val state = tmpDir("mstar")
    fold(state, 0L, d1Ups = Seq((1L, 100L, "a")),
      w2Ups = Seq((1L, 1L, 0L, 300L, "p"), (2L, 1L, 200L, 400L, "q")))
    fold(state, 1L, facts = Seq(
      (10L, 50L, 1L, 1L, 1L),   // pre-version, in p only -> (null, p)
      (11L, 250L, 2L, 1L, 1L),  // post-version, in p AND q -> fan-out x2
      (12L, 500L, 4L, 1L, 1L),  // covered by no window -> contributes nothing
      (13L, 250L, 8L, 2L, 1L))) // k1=2 unversioned, in p and q
    assert(served(state) === Map(
      (None, "p") -> ((9L, 2L)), // facts 10 and 13 both land in p
      (Some("a"), "p") -> ((2L, 1L)), (Some("a"), "q") -> ((2L, 1L)),
      (None, "q") -> ((8L, 1L))))
    // bucket-pruned point read over the encoded tuples
    val point = IncrementalTemporalStar.viewFor(spark, state,
        Seq(Seq(Some("a"), Some("q")), Seq(None, Some("p")),
          Seq(Some("zz"), Some("zz"))),
        numBranches = 2, numBuckets = 4)
      .as[(Option[String], String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(point === Map(
      (Some("a"), "q") -> ((2L, 1L)), (None, "p") -> ((9L, 2L))))
  }

  test("window upsert/delete retro-attributes; late version moves only its coordinate") {
    val state = tmpDir("mstar-retro")
    fold(state, 0L, d1Ups = Seq((1L, 100L, "a")),
      w2Ups = Seq((1L, 1L, 0L, 1000L, "p")))
    fold(state, 1L, facts = Seq(
      (10L, 150L, 1L, 1L, 1L), (11L, 700L, 2L, 1L, 1L)))
    assert(served(state) === Map((Some("a"), "p") -> ((3L, 2L))))
    // a SECOND concurrent window arrives late: both facts now count twice
    fold(state, 2L, w2Ups = Seq((2L, 1L, 0L, 1000L, "q")))
    assert(served(state) === Map(
      (Some("a"), "p") -> ((3L, 2L)), (Some("a"), "q") -> ((3L, 2L))))
    // upsert window 1 to a narrower span + new label: only fact 10 stays
    fold(state, 3L, w2Ups = Seq((1L, 1L, 0L, 500L, "r")))
    assert(served(state) === Map(
      (Some("a"), "r") -> ((1L, 1L)), (Some("a"), "q") -> ((3L, 2L))))
    // a LATE as-of version splits the q group; the r group is untouched
    fold(state, 4L, d1Ups = Seq((1L, 600L, "b")))
    assert(served(state) === Map(
      (Some("a"), "r") -> ((1L, 1L)), (Some("a"), "q") -> ((1L, 1L)),
      (Some("b"), "q") -> ((2L, 1L))))
    // delete window 2: its attributions retract exactly
    fold(state, 5L, w2Dels = Seq((2L, 1L)))
    assert(served(state) === Map((Some("a"), "r") -> ((1L, 1L))))
    assert(integral(state) === served(state), "integral != view")
  }

  test("same-vs fan-out survives a LATER as-of resolve (tag multiplicity)") {
    // interval branch FIRST: its fan-out tuples pass through the
    // temporal resolve's group-collapse — without the iid tag, two
    // identical-vs windows would merge into one tuple
    val state = tmpDir("mstar-tag")
    IncrementalTemporalStar.processBatch(
      Seq((10L, 250L, 3L, 1L, 1L)).toDF("id", "t", "m", "k1", "k2"),
      noFD,
      Seq(Seq((1L, 1L, 0L, 300L, "p"), (2L, 1L, 200L, 400L, "p"))
          .toDF("iid", "k", "s", "e", "vs"),
        Seq((1L, 100L, "a")).toDF("k", "vf", "vs")),
      Seq(noWD, noDD),
      state, 0L, numBuckets = 4, intervalBranches = Set(1))
    val got = IncrementalTemporalStar.view(spark, state, numBranches = 2)
      .as[(String, Option[String], Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // ONE fact in TWO same-label windows: m counts twice, rows = 2
    assert(got === Map(("p", Some("a")) -> ((6L, 2L))))
  }

  test("same-batch cross-input arrivals honor pre/post order") {
    val state = tmpDir("mstar-same")
    fold(state, 0L, facts = Seq((10L, 100L, 1L, 1L, 1L)))
    assert(served(state) === Map.empty) // no window yet: INNER drops it
    // one batch: new fact + first version + first window covering both
    fold(state, 1L, facts = Seq((11L, 200L, 2L, 1L, 1L)),
      d1Ups = Seq((1L, 150L, "a")),
      w2Ups = Seq((1L, 1L, 0L, 1000L, "p")))
    assert(served(state) === Map(
      (None, "p") -> ((1L, 1L)), (Some("a"), "p") -> ((2L, 1L))))
  }

  test("random mixed-CDC interleave ≡ model after every batch") {
    val rnd = new scala.util.Random(11)
    val state = tmpDir("mstar-rand")
    var liveF = Map.empty[Long, Fact]
    var v1 = Map.empty[(Long, Long), String]
    var w2 = Map.empty[Long, Win]
    var nextId = 0L
    var nextIid = 100L
    for (b <- 0 until 10) {
      val fs = (0 until rnd.nextInt(4)).map { _ =>
        nextId += 1
        (nextId, rnd.nextInt(1000).toLong, 1L + rnd.nextInt(5),
          1L + rnd.nextInt(3), 1L + rnd.nextInt(3))
      }
      val fd = liveF.values.toSeq.sortBy(_._1)
        .filter(_ => rnd.nextDouble() < 0.2).map(f => (f._1, f._4, f._5))
      val u1 = (0 until rnd.nextInt(3)).map(_ =>
        (1L + rnd.nextInt(3), rnd.nextInt(10).toLong * 100,
          s"a${rnd.nextInt(3)}"))
      val x1 = v1.keys.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.15)
      // window upserts may MOVE s/e/vs of a live iid (iid pins k)
      val u2 = (0 until rnd.nextInt(3)).map { _ =>
        val reuse = w2.nonEmpty && rnd.nextDouble() < 0.3
        val iid = if (reuse) {
            val keys = w2.keys.toSeq.sorted
            keys(rnd.nextInt(keys.size))
          } else { nextIid += 1; nextIid }
        val k = if (reuse) w2(iid)._2 else 1L + rnd.nextInt(3)
        val s = rnd.nextInt(800).toLong
        (iid, k, s, s + 100L + rnd.nextInt(400), s"w${rnd.nextInt(3)}")
      }
      val x2 = w2.keys.toSeq.sorted
        .filter(_ => rnd.nextDouble() < 0.15)
        .map(iid => (iid, w2(iid)._2))
      fold(state, b.toLong, fs, fd, u1, x1, u2, x2)
      liveF = (liveF ++ fs.map(f => f._1 -> f)) -- fd.map(_._1)
      v1 = (v1 ++ u1.groupBy(v => (v._1, v._2))
        .map { case (kv, r) => kv -> r.map(_._3).max }) -- x1
      val u2n = u2.groupBy(_._1).map { case (iid, rows) => iid -> rows.min }
      w2 = (w2 ++ u2n) -- x2.map(_._1)
      val want = model(liveF.values,
        v1.map { case ((k, vf), vs) => (k, vf, vs) }, w2.values)
      assert(served(state) === want, s"batch $b diverged")
      assert(integral(state) === want, s"batch $b integral diverged")
    }
    // replay the last batch: a strict no-op
    val before = served(state)
    fold(state, 9L)
    assert(served(state) === before, "replay changed the view")
  }

  test("bootstrap ≡ fold; compaction pins window-covered facts and keeps the view") {
    val state = tmpDir("mstar-bs")
    val facts = Seq((10L, 120L, 2L, 1L, 1L), (11L, 170L, 3L, 1L, 2L),
      (12L, 700L, 5L, 2L, 2L))
    val vers = Seq((1L, 100L, "a"), (1L, 150L, "b"), (2L, 650L, "c"))
    val wins = Seq((1L, 1L, 0L, 200L, "p"), (2L, 2L, 100L, 800L, "q"))
    IncrementalTemporalStar.bootstrap(
      facts.toDF("id", "t", "m", "k1", "k2"),
      Seq(vers.toDF("k", "vf", "vs"),
        wins.toDF("iid", "k", "s", "e", "vs")),
      state, baselineBatch = 0L, numBuckets = 4,
      intervalBranches = Set(2))
    val want0 = model(facts, vers, wins)
    assert(served(state) === want0)
    // continuation folds cleanly on the bootstrapped store
    fold(state, 1L, facts = Seq((13L, 150L, 7L, 2L, 1L)))
    assert(served(state) === model(facts :+ (13L, 150L, 7L, 2L, 1L),
      vers, wins))
    // compact at horizon 600: window p (e=200 <= 600) leaves with its
    // matches materialized; window q straddles and PINS facts 11, 13
    // (t < 600, covered) — and the as-of floor must follow them down,
    // so the late-arriving delete of q still retracts (b, q)/(null, q)
    // exactly
    IncrementalTemporalStar.compactState(spark, state, 600L,
      numBranches = 2, intervalBranches = Set(2))
    assert(served(state) === model(facts :+ (13L, 150L, 7L, 2L, 1L),
      vers, wins), "compaction changed the view")
    fold(state, 2L, w2Dels = Seq((2L, 2L)))
    assert(served(state) === model(facts :+ (13L, 150L, 7L, 2L, 1L),
      vers, Seq(wins.head)), "post-compaction window delete diverged")
    assert(integral(state) === served(state), "integral != view")
  }

  test("r13 ops guard: compaction reports the pin set; declared max span drops provably-expired pins") {
    def seed(state: String): Unit = fold(state, 0L,
      facts = Seq(
        (10L, 10L, 1L, 1L, 1L),   // ancient, covered only by window 2
        (11L, 280L, 2L, 1L, 2L),  // recent pre-horizon, in window 5
        (12L, 500L, 4L, 1L, 1L)), // post-horizon
      d1Ups = Seq((1L, 0L, "a")),
      w2Ups = Seq((2L, 1L, 0L, 4000L, "w"),   // span 4000: always-open shape
        (5L, 2L, 250L, 400L, "x")))           // span 150: in-contract
    val s1 = tmpDir("mstar-pin1"); val s2 = tmpDir("mstar-pin2")
    seed(s1); seed(s2)
    val before = served(s1)
    // no contract: both pre-horizon covered facts pinned, report says so
    val r1 = IncrementalTemporalStar.compactState(spark, s1, 300L,
      numBranches = 2, intervalBranches = Set(2))
    assert(r1.pinnedFacts === 2L && r1.oldestPinnedT === Some(10L))
    assert(r1.oldestPinnedAge(300L) === Some(290L))
    assert(r1.pinningWindowCount === 2L &&
      r1.pinningWindowSample === Seq(2L, 5L))
    assert(r1.droppedExpiredPins === 0L && r1.outOfContractWindowCount === 0L)
    assert(served(s1) === before, "compaction changed the view")
    // declared span 200: fact 10 (t < 300-200) can only be pinned by an
    // out-of-contract window -> drops; window 2 named as the violator
    val r2 = IncrementalTemporalStar.compactState(spark, s2, 300L,
      numBranches = 2, intervalBranches = Set(2),
      maxWindowSpanUs = Some(200L))
    assert(r2.droppedExpiredPins === 1L && r2.pinnedFacts === 1L)
    assert(r2.oldestPinnedT === Some(280L))
    assert(r2.outOfContractWindowCount === 1L &&
      r2.outOfContractWindowSample === Seq(2L))
    assert(served(s2) === before, "contracted compaction changed the view")
    // the surviving pin still retracts exactly when its window goes
    fold(s2, 1L, w2Dels = Seq((5L, 2L)))
    fold(s1, 1L, w2Dels = Seq((5L, 2L)))
    assert(served(s2) === served(s1), "post-compaction retraction diverged")
  }

  test("forget keys on either branch shape (GDPR one-CDC-batch device)") {
    val state = tmpDir("mstar-forget")
    fold(state, 0L, facts = Seq((10L, 150L, 1L, 1L, 1L),
        (11L, 250L, 2L, 2L, 2L)),
      d1Ups = Seq((1L, 100L, "a"), (2L, 100L, "b")),
      w2Ups = Seq((1L, 1L, 0L, 300L, "p"), (2L, 2L, 0L, 300L, "q")))
    assert(served(state) === Map(
      (Some("a"), "p") -> ((1L, 1L)), (Some("b"), "q") -> ((2L, 1L))))
    // forget k=1 through the INTERVAL branch: its fact and windows go
    IncrementalTemporalStar.forgetKeys(spark, branch = 2, Seq(1L), state,
      batchId = 1L, numBranches = 2, numBuckets = 4,
      intervalBranches = Set(2))
    assert(served(state) === Map((Some("b"), "q") -> ((2L, 1L))))
    // forget k=2 through the TEMPORAL branch on the same mixed store
    IncrementalTemporalStar.forgetKeys(spark, branch = 1, Seq(2L), state,
      batchId = 2L, numBranches = 2, numBuckets = 4,
      intervalBranches = Set(2))
    assert(served(state) === Map.empty)
    assert(integral(state) === served(state), "integral != view")
  }

  test("events-as-CDC fold serves the x130 batch twin exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import org.apache.spark.sql.functions.{concat, expr, get_json_object, lit}
    val state = tmpDir("mstar-x130")
    val ev = graft.Tables.events(spark, dir)
    val facts = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"),
        col("user_id").as("k1"), col("user_id").as("k2"))
    val seg = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    val wins = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("iid"), col("user_id").as("k"),
        expr("ts DIV 1000").as("s"),
        expr("ts DIV 1000 + 600000000").as("e"),
        concat(lit("b"), (graft.functions.cents(col("value")) % 5)
          .cast("string")).as("vs"))
    // facts in 3 slices; versions land with slice 1, windows with
    // slice 2 — each retro-attributes the earlier slices' facts
    val fSlices = Seq(facts.filter("id % 3 = 0"), facts.filter("id % 3 = 1"),
      facts.filter("id % 3 = 2"))
    fSlices.zipWithIndex.foreach { case (sl, i) =>
      IncrementalTemporalStar.processBatch(sl, noFD,
        Seq(if (i == 1) seg else noD, if (i == 2) wins else noW),
        Seq(noDD, noWD), state, i.toLong, numBuckets = 4,
        intervalBranches = Set(2))
    }
    val twin = graft.queries.ExtQueries.x130MixedAttribution(spark, dir)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val got = served(state).map { case ((g1, g2), v) =>
      (g1.getOrElse("(none)"), g2) -> v }
    assert(got === twin)
  }

  test("extrema under fan-out: the tuple multiset legitimately multiplies") {
    val state = tmpDir("mstar-ex")
    fold0(state, trackEnriched = false)
    // one fact in two windows: the (g, m) multiset legitimately carries
    // the fact's measure TWICE (one tuple per window)
    val ex = IncrementalTemporalStar.extremaView(spark, state,
        numBranches = 2)
      .as[(Option[String], String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(ex === Map(
      (Some("a"), "p") -> ((1L, 3L, 3L)), (Some("a"), "q") -> ((1L, 3L, 3L))))
  }

  /** R175: the SET-VALUED enriched relation under fan-out — one row
    * per live (fact × covering window), exact through late versions,
    * window replaces/deletes, and fact deletes, ≡ the batch twin after
    * every fold. */
  test("R175 set-valued enriched facts: late version + window delete update the relation exactly") {
    val state = tmpDir("mstar-enr")
    def enriched(): Set[(Long, Option[String], String, Long, Long)] =
      IncrementalTemporalStar.enrichedFanoutView(spark, state,
          numBranches = 2, intervalBranches = Set(2))
        .as[(Long, Option[String], String, Long, Long)].collect().toSet
    def twin(fs: Seq[Fact], v1: Seq[Ver], w2: Seq[Win])
        : Set[(Long, Option[String], String, Long, Long)] =
      IncrementalTemporalStar.enrichedFanoutBatch(
          fs.toDF("id", "t", "m", "k1", "k2"),
          Seq(v1.toDF("k", "vf", "vs"), w2.toDF("iid", "k", "s", "e", "vs")),
          intervalBranches = Set(2))
        .select(col("id"), col("g1"), col("g2"), col("_tag2"), col("m"))
        .as[(Long, Option[String], String, Long, Long)].collect().toSet
    def foldE(id: Long, facts: Seq[Fact] = Nil,
        factDels: Seq[(Long, Long, Long)] = Nil,
        d1Ups: Seq[Ver] = Nil, w2Ups: Seq[Win] = Nil,
        w2Dels: Seq[(Long, Long)] = Nil): Unit =
      IncrementalTemporalStar.processBatch(
        if (facts.isEmpty) noF else facts.toDF("id", "t", "m", "k1", "k2"),
        if (factDels.isEmpty) noFD else factDels.toDF("id", "k1", "k2"),
        Seq(if (d1Ups.isEmpty) noD else d1Ups.toDF("k", "vf", "vs"),
          if (w2Ups.isEmpty) noW else w2Ups.toDF("iid", "k", "s", "e", "vs")),
        Seq(noDD, if (w2Dels.isEmpty) noWD else w2Dels.toDF("iid", "k")),
        state, id, numBuckets = 4, intervalBranches = Set(2),
        trackEnriched = true)

    // batch 0: fact 10 lands in two concurrent windows -> TWO rows
    var fs = Seq((10L, 250L, 3L, 1L, 1L), (11L, 500L, 5L, 1L, 2L))
    var v1 = Seq((1L, 100L, "a"))
    var w2 = Seq((1L, 1L, 0L, 300L, "p"), (2L, 1L, 200L, 400L, "q"),
      (3L, 2L, 450L, 600L, "r"))
    foldE(0L, facts = fs, d1Ups = v1, w2Ups = w2)
    assert(enriched() === twin(fs, v1, w2))
    assert(enriched() === Set(
      (10L, Some("a"), "p", 1L, 3L), (10L, Some("a"), "q", 2L, 3L),
      (11L, Some("a"), "r", 3L, 5L)))

    // LATE VERSION at vf=200: fact 10 (t=250) retro-reassigns to "b" on
    // BOTH its window rows; fact 11 (t=500) too
    v1 = v1 :+ (1L, 200L, "b")
    foldE(1L, d1Ups = Seq((1L, 200L, "b")))
    assert(enriched() === twin(fs, v1, w2))
    assert(enriched().forall(_._2 === Some("b")))

    // WINDOW DELETE: window q goes — exactly fact 10's q-row retracts,
    // its p-row stays (per-key replacement would have lost it)
    w2 = w2.filterNot(_._1 == 2L)
    foldE(2L, w2Dels = Seq((2L, 1L)))
    assert(enriched() === twin(fs, v1, w2))
    assert(enriched() === Set(
      (10L, Some("b"), "p", 1L, 3L), (11L, Some("b"), "r", 3L, 5L)))

    // WINDOW REPLACE (upsert same iid, new attrs): −old +new
    foldE(3L, w2Ups = Seq((3L, 2L, 450L, 700L, "r2")))
    w2 = w2.filterNot(_._1 == 3L) :+ (3L, 2L, 450L, 700L, "r2")
    assert(enriched() === twin(fs, v1, w2))

    // FACT DELETE drops every row of the id
    foldE(4L, factDels = Seq((10L, 1L, 1L)))
    fs = fs.filterNot(_._1 == 10L)
    assert(enriched() === twin(fs, v1, w2))
    assert(enriched().map(_._1) === Set(11L))

    // replay of a stamped batch: strict no-op
    foldE(4L, factDels = Seq((10L, 1L, 1L)))
    assert(enriched() === twin(fs, v1, w2))

    // bootstrap twin: a fresh store bootstrapped from the integrated
    // inputs serves the identical relation
    val bs = tmpDir("mstar-enr-bs")
    IncrementalTemporalStar.bootstrap(
      fs.toDF("id", "t", "m", "k1", "k2"),
      Seq(v1.toDF("k", "vf", "vs"), w2.toDF("iid", "k", "s", "e", "vs")),
      bs, baselineBatch = 0L, numBuckets = 4,
      trackEnriched = true, intervalBranches = Set(2))
    assert(IncrementalTemporalStar.enrichedFanoutView(spark, bs,
        numBranches = 2, intervalBranches = Set(2))
      .as[(Long, Option[String], String, Long, Long)].collect().toSet ===
      enriched())
    // and the relation is SQL-consumable through the catalog (R172)
    SqlCatalog.register(spark, Seq(SqlCatalog.temporalEnrichedFanout(
      "mstar_enr_sql", state, numBranches = 2, intervalBranches = Set(2))))
    assert(spark.sql("SELECT id, g1, g2, win2, m FROM mstar_enr_sql")
      .as[(Long, Option[String], String, Long, Long)].collect().toSet ===
      enriched())
  }

  private def fold0(state: String, trackEnriched: Boolean): Unit =
    IncrementalTemporalStar.processBatch(
      Seq((10L, 250L, 3L, 1L, 1L)).toDF("id", "t", "m", "k1", "k2"),
      noFD,
      Seq(Seq((1L, 100L, "a")).toDF("k", "vf", "vs"),
        Seq((1L, 1L, 0L, 300L, "p"), (2L, 1L, 200L, 400L, "q"))
          .toDF("iid", "k", "s", "e", "vs")),
      Seq(noDD, noWD),
      state, 0L, numBuckets = 4, intervalBranches = Set(2),
      trackExtrema = true, trackEnriched = trackEnriched)

  test("reshard carries the interval branch: folds continue at the new count; pre-reshard id refused") {
    val state = tmpDir("mstar-rs4"); val state8 = tmpDir("mstar-rs8")
    var fs = Seq.empty[(Long, Long, Long, Long, Long)]
    var v1 = Seq.empty[(Long, Long, String)]
    var w2 = Seq.empty[(Long, Long, Long, Long, String)]
    fold(state, 0L, facts = Seq((10L, 50L, 1L, 1L, 1L), (11L, 250L, 2L, 1L, 1L)),
      d1Ups = Seq((1L, 100L, "a")),
      w2Ups = Seq((1L, 1L, 0L, 300L, "p"), (2L, 1L, 200L, 400L, "q")))
    fs = Seq((10L, 50L, 1L, 1L, 1L), (11L, 250L, 2L, 1L, 1L))
    v1 = Seq((1L, 100L, "a")); w2 = Seq((1L, 1L, 0L, 300L, "p"), (2L, 1L, 200L, 400L, "q"))
    assert(served(state) === model(fs, v1, w2))

    IncrementalTemporalStar.reshard(spark, state, state8, numBranches = 2,
      newBuckets = 8)
    assert(served(state8) === served(state), "reshard changed the view")
    // the destination refuses the pre-reshard batch id (resume floor)
    assertThrows[IllegalArgumentException] {
      IncrementalTemporalStar.processBatch(noF, noFD, Seq(noD, noW),
        Seq(noDD, noWD), state8, 0L, numBuckets = 8,
        intervalBranches = Set(2))
    }
    // continue BOTH stores through STATE-DEPENDENT paths: a window
    // DELETE must retract its matches from the RESHARDED interval rows,
    // and a late version re-resolves retained facts from the resharded
    // version table
    def step(id: Long, d1U: Seq[(Long, Long, String)],
        w2D: Seq[(Long, Long)]): Unit = {
      fold(state, id, d1Ups = d1U, w2Dels = w2D)
      IncrementalTemporalStar.processBatch(noF, noFD,
        Seq(if (d1U.isEmpty) noD else d1U.toDF("k", "vf", "vs"), noW),
        Seq(noDD, if (w2D.isEmpty) noWD else w2D.toDF("iid", "k")),
        state8, id, numBuckets = 8, intervalBranches = Set(2))
      v1 = v1 ++ d1U
      w2 = w2.filterNot(w => w2D.contains((w._1, w._2)))
      assert(served(state) === model(fs, v1, w2), s"batch $id (B=4)")
      assert(served(state8) === served(state), s"batch $id diverged at B=8")
    }
    step(1L, d1U = Seq((1L, 200L, "b")), w2D = Nil)  // late version
    step(2L, d1U = Nil, w2D = Seq((2L, 1L)))          // window delete
  }

  test("TWO interval branches: compaction retains a pinned fact's CLOSED sibling cover, so open-window deletes retract exactly") {
    // the r12 review scenario: fact f(t=50) covered on branch 1 by an
    // OPEN window (pins f through the horizon-100 compaction) and on
    // branch 2 by a CLOSED one (e=60 <= horizon). Dropping the closed
    // cover would make the post-compaction delete of the OPEN window
    // under-retract: the branch-1 term re-resolves f on branch 2, finds
    // no cover, and the (p, q) tuple it must retract is never generated.
    def fold2i(state: String, id: Long,
        facts: Seq[(Long, Long, Long, Long, Long)] = Nil,
        w1Ups: Seq[(Long, Long, Long, Long, String)] = Nil,
        w1Dels: Seq[(Long, Long)] = Nil,
        w2Ups: Seq[(Long, Long, Long, Long, String)] = Nil,
        w2Dels: Seq[(Long, Long)] = Nil): Unit =
      IncrementalTemporalStar.processBatch(
        if (facts.isEmpty) noF else facts.toDF("id", "t", "m", "k1", "k2"),
        noFD,
        Seq(if (w1Ups.isEmpty) noW else w1Ups.toDF("iid", "k", "s", "e", "vs"),
          if (w2Ups.isEmpty) noW else w2Ups.toDF("iid", "k", "s", "e", "vs")),
        Seq(if (w1Dels.isEmpty) noWD else w1Dels.toDF("iid", "k"),
          if (w2Dels.isEmpty) noWD else w2Dels.toDF("iid", "k")),
        state, id, numBuckets = 4, intervalBranches = Set(1, 2))
    def served2(state: String): Map[(String, String), (Long, Long)] =
      IncrementalTemporalStar.view(spark, state, numBranches = 2)
        .as[(String, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

    val compacted = tmpDir("mstar-2i-c"); val twin = tmpDir("mstar-2i-t")
    def both(id: Long)(f: (String, Long) => Unit): Unit = {
      f(compacted, id); f(twin, id)
    }
    both(0L)((st, id) => fold2i(st, id,
      facts = Seq((10L, 50L, 7L, 1L, 1L), (11L, 150L, 3L, 1L, 1L)),
      w1Ups = Seq((1L, 1L, 40L, 200L, "p")),
      w2Ups = Seq((2L, 1L, 45L, 60L, "q"), (3L, 1L, 120L, 400L, "r"))))
    // f10 -> (p, q); f11 -> (p, r)
    assert(served2(compacted) === Map(("p", "q") -> (7L, 1L),
      ("p", "r") -> (3L, 1L)))
    IncrementalTemporalStar.compactState(spark, compacted, horizon = 100L,
      numBranches = 2, intervalBranches = Set(1, 2))
    assert(served2(compacted) === served2(twin), "compaction changed the view")
    // in-contract delete of the OPEN branch-1 window: BOTH facts lose
    // their only branch-1 cover -> the view empties; the compacted
    // store must retract f10's (p, q) via the RETAINED closed cover q
    both(1L)((st, id) => fold2i(st, id, w1Dels = Seq((1L, 1L))))
    assert(served2(twin) === Map.empty)
    assert(served2(compacted) === served2(twin),
      "compacted store under-retracted: the closed sibling cover was dropped")
  }
}
