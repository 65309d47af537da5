package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** The maintained MULTI-BRANCH temporal (as-of) join-aggregate must
  * equal the batch chained-ASOF recompute over the integrated inputs
  * after EVERY batch — with each branch's corrections (late-version
  * retro-reassignment, version-delete fallback) moving ONLY that
  * branch's group coordinate, and cross-branch same-batch arrivals
  * honoring the telescoped pre/post input order. */
class IncrementalTemporalStarSpec extends SparkTestBase {
  import spark.implicits._

  private type Fact = (Long, Long, Long, Long, Long)  // id, t, m, k1, k2
  private type Ver = (Long, Long, String)             // k, vf, vs

  /** Reference model: chained batch ASOF LEFT aggregate in plain Scala. */
  private def model(facts: Iterable[Fact],
      v1: Iterable[Ver], v2: Iterable[Ver])
      : Map[(Option[String], Option[String]), (Long, Long)] = {
    def res(vers: Iterable[Ver], k: Long, t: Long): Option[String] =
      vers.filter(v => v._1 == k && v._2 <= t) match {
        case vs if vs.isEmpty => None
        case vs               => Some(vs.maxBy(_._2)._3)
      }
    facts.groupBy { case (_, t, _, k1, k2) => (res(v1, k1, t), res(v2, k2, t)) }
      .map { case (g, fs) => g -> (fs.map(_._3).sum, fs.size.toLong) }
  }

  private def served(state: String)
      : Map[(Option[String], Option[String]), (Long, Long)] =
    IncrementalTemporalStar.view(spark, state, numBranches = 2)
      .as[(Option[String], Option[String], Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  private def integral(state: String)
      : Map[(Option[String], Option[String]), (Long, Long)] =
    IncrementalTemporalStar.changelog(spark, state, numBranches = 2)
      .groupBy("g1", "g2")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("c"))
      .filter(col("c") > 0)
      .as[(Option[String], Option[String], Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  private val noF = Seq.empty[Fact].toDF("id", "t", "m", "k1", "k2")
  private val noFD = Seq.empty[(Long, Long, Long)].toDF("id", "k1", "k2")
  private val noD = Seq.empty[Ver].toDF("k", "vf", "vs")
  private val noDD = Seq.empty[(Long, Long)].toDF("k", "vf")

  private def fold(state: String, id: Long,
      facts: Seq[Fact] = Nil, factDels: Seq[(Long, Long, Long)] = Nil,
      d1Ups: Seq[Ver] = Nil, d1Dels: Seq[(Long, Long)] = Nil,
      d2Ups: Seq[Ver] = Nil, d2Dels: Seq[(Long, Long)] = Nil): Unit =
    IncrementalTemporalStar.processBatch(
      if (facts.isEmpty) noF else facts.toDF("id", "t", "m", "k1", "k2"),
      if (factDels.isEmpty) noFD else factDels.toDF("id", "k1", "k2"),
      Seq(if (d1Ups.isEmpty) noD else d1Ups.toDF("k", "vf", "vs"),
        if (d2Ups.isEmpty) noD else d2Ups.toDF("k", "vf", "vs")),
      Seq(if (d1Dels.isEmpty) noDD else d1Dels.toDF("k", "vf"),
        if (d2Dels.isEmpty) noDD else d2Dels.toDF("k", "vf")),
      state, id, numBuckets = 4)

  test("each branch resolves independently; per-branch null groups") {
    val state = tmpDir("tstar")
    fold(state, 0L, d1Ups = Seq((1L, 100L, "a")), d2Ups = Seq((1L, 200L, "x")))
    fold(state, 1L, facts = Seq(
      (10L, 50L, 1L, 1L, 1L),   // before both -> (null, null)
      (11L, 150L, 2L, 1L, 1L),  // after d1 only -> (a, null)
      (12L, 250L, 4L, 1L, 1L),  // after both -> (a, x)
      (13L, 250L, 8L, 2L, 1L))) // k1=2 has no versions -> (null, x)
    assert(served(state) === Map(
      (None, None) -> ((1L, 1L)), (Some("a"), None) -> ((2L, 1L)),
      (Some("a"), Some("x")) -> ((4L, 1L)), (None, Some("x")) -> ((8L, 1L))))
    // bucket-pruned point read: named tuples only, incl. an explicit
    // null coordinate; absent names empty
    val point = IncrementalTemporalStar.viewFor(spark, state,
        Seq(Seq(Some("a"), Some("x")), Seq(None, Some("x")),
          Seq(Some("zz"), Some("zz"))),
        numBranches = 2, numBuckets = 4)
      .as[(Option[String], Option[String], Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(point === Map(
      (Some("a"), Some("x")) -> ((4L, 1L)), (None, Some("x")) -> ((8L, 1L))))
  }

  test("a late version on one branch moves ONLY that coordinate") {
    val state = tmpDir("tstar-late")
    fold(state, 0L, d1Ups = Seq((1L, 100L, "a")), d2Ups = Seq((1L, 100L, "x")))
    fold(state, 1L, facts = Seq(
      (10L, 120L, 1L, 1L, 1L), (11L, 170L, 2L, 1L, 1L),
      (12L, 300L, 4L, 1L, 1L)))
    assert(served(state) === Map((Some("a"), Some("x")) -> ((7L, 3L))))
    // LATE tier version at 150 captures facts 11, 12 on branch 2 only
    fold(state, 2L, d2Ups = Seq((1L, 150L, "y")))
    assert(served(state) === Map(
      (Some("a"), Some("x")) -> ((1L, 1L)),
      (Some("a"), Some("y")) -> ((6L, 2L))))
    // delete it: both fall back to x; branch 1 never moved
    fold(state, 3L, d2Dels = Seq((1L, 150L)))
    assert(served(state) === Map((Some("a"), Some("x")) -> ((7L, 3L))))
    assert(integral(state) === served(state), "integral != view")
  }

  test("both branches and facts in the SAME batch honor pre/post order") {
    val state = tmpDir("tstar-same")
    fold(state, 0L, facts = Seq((10L, 100L, 1L, 1L, 1L)))
    assert(served(state) === Map((None, None) -> ((1L, 1L))))
    // one batch: a new fact + first versions on BOTH branches, capturing
    // the retained fact too (cross-term: d1's term sees d2 at POST)
    fold(state, 1L, facts = Seq((11L, 200L, 2L, 1L, 1L)),
      d1Ups = Seq((1L, 50L, "a")), d2Ups = Seq((1L, 150L, "x")))
    assert(served(state) === Map(
      (Some("a"), None) -> ((1L, 1L)),
      (Some("a"), Some("x")) -> ((2L, 1L))))
  }

  test("random 6-input CDC interleave ≡ model after every batch") {
    val rnd = new scala.util.Random(7)
    val state = tmpDir("tstar-rand")
    var liveF = Map.empty[Long, Fact]
    var v1 = Map.empty[(Long, Long), String]
    var v2 = Map.empty[(Long, Long), String]
    var nextId = 0L
    for (b <- 0 until 10) {
      val fs = (0 until rnd.nextInt(4)).map { _ =>
        nextId += 1
        (nextId, rnd.nextInt(1000).toLong, 1L + rnd.nextInt(5),
          1L + rnd.nextInt(3), 1L + rnd.nextInt(3))
      }
      val fd = liveF.values.toSeq.sortBy(_._1)
        .filter(_ => rnd.nextDouble() < 0.2).map(f => (f._1, f._4, f._5))
      def ups(tag: String) = (0 until rnd.nextInt(3)).map(_ =>
        (1L + rnd.nextInt(3), rnd.nextInt(10).toLong * 100,
          s"$tag${rnd.nextInt(3)}"))
      def dels(live: Map[(Long, Long), String]) = live.keys.toSeq.sorted
        .filter(_ => rnd.nextDouble() < 0.15)
      val (u1, u2) = (ups("a"), ups("x"))
      val (x1, x2) = (dels(v1), dels(v2))
      fold(state, b.toLong, fs, fd, u1, x1, u2, x2)
      liveF = (liveF ++ fs.map(f => f._1 -> f)) -- fd.map(_._1)
      v1 = (v1 ++ u1.groupBy(v => (v._1, v._2))
        .map { case (kv, r) => kv -> r.map(_._3).max }) -- x1
      v2 = (v2 ++ u2.groupBy(v => (v._1, v._2))
        .map { case (kv, r) => kv -> r.map(_._3).max }) -- x2
      val want = model(liveF.values,
        v1.map { case ((k, vf), vs) => (k, vf, vs) },
        v2.map { case ((k, vf), vs) => (k, vf, vs) })
      assert(served(state) === want, s"batch $b diverged")
      assert(integral(state) === want, s"batch $b integral diverged")
    }
    // replay the last batch: a strict no-op
    val before = served(state)
    fold(state, 9L)
    assert(served(state) === before, "replay changed the view")
  }

  test("a 1-branch instance serves exactly the R160 single-dim view") {
    val s1 = tmpDir("tstar-one")
    val s2 = tmpDir("tstar-ref")
    val facts = Seq((10L, 120L, 1L, 1L), (11L, 170L, 2L, 1L),
      (12L, 300L, 4L, 2L))
    val vers = Seq((1L, 100L, "a"), (1L, 150L, "b"), (2L, 250L, "c"))
    // star instance, B = 1
    IncrementalTemporalStar.processBatch(
      facts.map { case (id, t, m, k) => (id, t, m, k) }
        .toDF("id", "t", "m", "k1"),
      Seq.empty[(Long, Long)].toDF("id", "k1"),
      Seq(vers.toDF("k", "vf", "vs")), Seq(noDD), s1, 0L, numBuckets = 4)
    // reference: the single-dimension temporal engine on the same inputs
    IncrementalTemporalJoinAgg.processBatch(
      facts.toDF("id", "t", "m", "k"),
      Seq.empty[(Long, Long)].toDF("id", "k"),
      vers.toDF("k", "vf", "vs"), noDD, s2, 0L, numBuckets = 4)
    val got = IncrementalTemporalStar.view(spark, s1, numBranches = 1)
      .as[(Option[String], Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ref = IncrementalTemporalJoinAgg.view(spark, s2)
      .as[(Option[String], Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === ref)
  }

  test("events-as-CDC fold serves the x126 batch twin exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import org.apache.spark.sql.functions.{concat, expr, get_json_object, lit}
    val state = tmpDir("tstar-x126")
    val ev = graft.Tables.events(spark, dir)
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"),
        col("user_id").as("k1"), col("user_id").as("k2"))
    val seg = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    val tier = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("t"), (get_json_object(col("props"), "$.k").cast("int") % 3)
          .cast("string")).as("vs"))
    // facts in 3 slices; seg versions land with slice 1, tier with slice 2
    // (each retro-reassigns the earlier slices' facts on its own branch)
    val fSlices = Seq(facts.filter("id % 3 = 0"), facts.filter("id % 3 = 1"),
      facts.filter("id % 3 = 2"))
    fSlices.zipWithIndex.foreach { case (sl, i) =>
      IncrementalTemporalStar.processBatch(sl, noFD,
        Seq(if (i == 1) seg else noD, if (i == 2) tier else noD),
        Seq(noDD, noDD), state, i.toLong, numBuckets = 4,
        trackEnriched = true)
    }
    val twin = graft.queries.ExtQueries.x126AsofStar(spark, dir)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val got = served(state).map { case ((g1, g2), v) =>
      (g1.getOrElse("(none)"), g2.getOrElse("(none)")) -> v }
    assert(got === twin)
    // the maintained enriched table equals the per-fact x127 twin — the
    // live delta path built it through two branch-wide retro waves
    val enrTwin = graft.queries.ExtQueries.x127EnrichedFacts(spark, dir)
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val enrGot = IncrementalTemporalStar.enrichedView(spark, state,
        numBranches = 2)
      .as[(Long, Option[String], Option[String], Long)].collect()
      .map(r => r._1 -> (r._2.getOrElse("(none)"),
        r._3.getOrElse("(none)"), r._4)).toMap
    assert(enrGot === enrTwin)
  }

  test("bootstrap; continuation, as-of, compaction, forget on one branch") {
    val state = tmpDir("tstar-bs")
    IncrementalTemporalStar.bootstrap(
      Seq((10L, 120L, 2L, 1L, 1L), (11L, 170L, 3L, 1L, 2L),
        (12L, 400L, 5L, 2L, 2L)).toDF("id", "t", "m", "k1", "k2"),
      Seq(Seq((1L, 100L, "a"), (2L, 300L, "b")).toDF("k", "vf", "vs"),
        Seq((2L, 150L, "x")).toDF("k", "vf", "vs")),
      state, baselineBatch = 0L, numBuckets = 4)
    assert(served(state) === Map(
      (Some("a"), None) -> ((2L, 1L)), (Some("a"), Some("x")) -> ((3L, 1L)),
      (Some("b"), Some("x")) -> ((5L, 1L))))
    // continuation: new fact + fact delete
    fold(state, 1L, facts = Seq((13L, 500L, 7L, 2L, 1L)),
      factDels = Seq((10L, 1L, 1L)))
    assert(served(state) === Map(
      (Some("a"), Some("x")) -> ((3L, 1L)), (Some("b"), None) -> ((7L, 1L)),
      (Some("b"), Some("x")) -> ((5L, 1L))))
    // maintenance-time as-of reconstructs the bootstrap baseline
    val asOf0 = IncrementalTemporalStar.viewAsOf(spark, state, 0L,
        numBranches = 2)
      .as[(Option[String], Option[String], Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(asOf0 === Map(
      (Some("a"), None) -> ((2L, 1L)), (Some("a"), Some("x")) -> ((3L, 1L)),
      (Some("b"), Some("x")) -> ((5L, 1L))))
    IncrementalTemporalStar.compactChangelog(spark, state, 0L)
    assert(integral(state) === served(state), "compacted integral != view")
    // forget k=2 on branch 1: its facts leave; branch-2 versions stay
    IncrementalTemporalStar.forgetKeys(spark, branch = 1, Seq(2L), state,
      batchId = 2L, numBranches = 2, numBuckets = 4)
    assert(served(state) === Map((Some("a"), Some("x")) -> ((3L, 1L))))
    assert(integral(state) === served(state), "integral != view after forget")
  }

  test("reshard to 2x buckets: folds continue exactly; point reads prune at the new count") {
    val state = tmpDir("tstar-rs")        // B=4 throughout (the twin)
    val state8 = tmpDir("tstar-rs8")      // resharded to B=8 mid-stream
    def foldAt(s: String, id: Long, buckets: Int, fs: Seq[Fact] = Nil,
        d1: Seq[Ver] = Nil, d2: Seq[Ver] = Nil): Unit =
      IncrementalTemporalStar.processBatch(
        if (fs.isEmpty) noF else fs.toDF("id", "t", "m", "k1", "k2"),
        noFD, Seq(if (d1.isEmpty) noD else d1.toDF("k", "vf", "vs"),
          if (d2.isEmpty) noD else d2.toDF("k", "vf", "vs")),
        Seq(noDD, noDD), s, id, numBuckets = buckets)
    foldAt(state, 0L, 4, d1 = Seq((1L, 100L, "a")), d2 = Seq((1L, 50L, "x")))
    foldAt(state, 1L, 4, fs = Seq((10L, 120L, 1L, 1L, 1L),
      (11L, 300L, 2L, 1L, 1L)))
    // reshard 4 -> 8 into the fresh dir, then drive BOTH stores with the
    // same continuation — incl. a late version (the state-dependent path)
    IncrementalTemporalStar.reshard(spark, state, state8, numBranches = 2,
      newBuckets = 8)
    assert(served(state8) === served(state), "reshard changed the view")
    // r12 resume floor: replaying the PRE-reshard batch id against the
    // new store is refused (no per-bucket stamps survive a reshard) —
    // the restart-replays-last-committed hazard fails loudly instead of
    // re-applying
    val refused = intercept[IllegalArgumentException] {
      foldAt(state8, 1L, 8, fs = Seq((99L, 999L, 9L, 1L, 1L)))
    }
    assert(refused.getMessage.contains("resume floor"))
    assert(served(state8) === served(state), "refused replay mutated state")
    for ((s, b) <- Seq((state, 4), (state8, 8))) {
      foldAt(s, 2L, b, fs = Seq((12L, 400L, 4L, 1L, 1L)),
        d1 = Seq((1L, 200L, "b")))
    }
    assert(served(state8) === served(state), "post-reshard fold diverged")
    // point read at the NEW bucket count
    val point = IncrementalTemporalStar.viewFor(spark, state8,
        Seq(Seq(Some("b"), Some("x"))), numBranches = 2, numBuckets = 8)
      .as[(Option[String], Option[String], Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(point === served(state).filter(_._1 == (Some("b"), Some("x"))))
  }

  test("compactState bounds every table; in-contract folds stay exact") {
    val state = tmpDir("tstar-cs")
    val twin = tmpDir("tstar-cs-twin")
    def foldBoth(id: Long, fs: Seq[Fact] = Nil,
        d1: Seq[Ver] = Nil, d2: Seq[Ver] = Nil): Unit =
      Seq(state, twin).foreach { s =>
        IncrementalTemporalStar.processBatch(
          if (fs.isEmpty) noF else fs.toDF("id", "t", "m", "k1", "k2"),
          noFD, Seq(if (d1.isEmpty) noD else d1.toDF("k", "vf", "vs"),
            if (d2.isEmpty) noD else d2.toDF("k", "vf", "vs")),
          Seq(noDD, noDD), s, id, numBuckets = 4)
      }
    foldBoth(0L, d1 = Seq((1L, 100L, "a"), (1L, 300L, "b")),
      d2 = Seq((1L, 50L, "x")))
    foldBoth(1L, fs = Seq((10L, 120L, 1L, 1L, 1L), (11L, 350L, 2L, 1L, 1L)))
    // compact at 300: fact 10 leaves f/ and fm2; d1's 100-version
    // floors to 299 BESIDE the real 300-version (one tick below — an
    // in-contract delete of the 300 falls back to it exactly); d2's
    // 50-version floors to 299
    IncrementalTemporalStar.compactState(spark, state, 300L, numBranches = 2)
    assert(served(state) === served(twin), "compaction changed the view")
    def rows(tbl: String): Long =
      MvPipeline.readBucketedStateOrEmpty(spark, s"$state/temporalstar/$tbl",
        IncrementalJoinAggStar.dSchema).count()
    assert(rows("d1") === 2L, "d1 holds the at-horizon version + the floor")
    assert(rows("d2") === 1L, "d2 should hold only the floored version")
    // in-contract continuation (t, vf >= horizon) ≡ the uncompacted twin
    foldBoth(2L, fs = Seq((12L, 400L, 4L, 1L, 1L)),
      d2 = Seq((1L, 380L, "y")))
    foldBoth(3L, fs = Seq((13L, 390L, 8L, 1L, 1L)))
    assert(served(state) === served(twin), "in-contract fold diverged")
  }

  test("an equality dim is the degenerate vf=0 temporal branch (≡ R150 star)") {
    // an upsert-keyed equality dimension IS an SCD-2 dim whose every
    // version sits at vf=0 (fact times are >= 0): upsert = replace at
    // (k, 0), delete = delete (k, 0); the equality star's INNER join
    // corresponds to the temporal LEFT view's non-null groups, its
    // dropped dangling facts to the null head group
    val sT = tmpDir("tstar-eq")
    val sE = tmpDir("tstar-eq-ref")
    val eqSpec = IncrementalJoinAggStar.StarSpec(Seq(1), groupAttrs = Seq((1, 1)))
    def foldBoth(id: Long, fs: Seq[(Long, Long, Long)],
        fd: Seq[(Long, Long)], ups: Seq[(Long, String)],
        dels: Seq[Long]): Unit = {
      IncrementalTemporalStar.processBatch(
        fs.map { case (k, fid, m) => (fid, 1L, m, k) }
          .toDF("id", "t", "m", "k1"),
        fd.map { case (k, fid) => (fid, k) }.toDF("id", "k1"),
        Seq(ups.map { case (k, vs) => (k, 0L, vs) }.toDF("k", "vf", "vs")),
        Seq(dels.map(k => (k, 0L)).toDF("k", "vf")),
        sT, id, numBuckets = 4)
      IncrementalJoinAggStar.processBatch(eqSpec,
        fs.toDF("k1", "id", "m"), Seq("k1"), "id", "m",
        fd.toDF("k1", "id"), Seq("k1"), "id",
        Seq(Seq(ups.map { case (k, vs) =>
          (k, Option.empty[Long], Some(vs)) }.toDF("k", "vl", "vs"))),
        Seq(Seq(("k", "vl", "vs"))), sE, id, numBuckets = 4,
        dimDels = Seq(Seq(dels.map(k =>
          (k, Option.empty[Long], Option.empty[String])).toDF("k", "vl", "vs"))))
    }
    // interleave: facts before dims, dim replace, dim delete, fact delete
    foldBoth(0L, fs = Seq((10L, 1L, 3L), (20L, 2L, 5L)), Nil, Nil, Nil)
    foldBoth(1L, Nil, Nil, ups = Seq((10L, "A"), (20L, "B")), Nil)
    foldBoth(2L, fs = Seq((10L, 3L, 7L)), Nil, ups = Seq((20L, "C")), Nil)
    foldBoth(3L, Nil, fd = Seq((10L, 1L)), Nil, dels = Seq(20L))
    val got = IncrementalTemporalStar.view(spark, sT, numBranches = 1)
      .as[(Option[String], Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ref = IncrementalJoinAggStar.view(spark, sE)
      .as[(String, Long, Long)].collect()
      .map(r => Option(r._1) -> (r._2, r._3)).toMap
    // non-null groups identical; the temporal null group holds exactly
    // the facts the equality star dropped (customer 20's fact 2, m=5)
    assert(got.filter(_._1.isDefined) === ref)
    assert(got(None) === ((5L, 1L)))
  }

  test("tracked extrema: min/max/median stay exact under retro-reassignment") {
    val state = tmpDir("tstar-ext")
    def foldE(id: Long, fs: Seq[Fact] = Nil,
        fd: Seq[(Long, Long, Long)] = Nil,
        d1: Seq[Ver] = Nil, d1d: Seq[(Long, Long)] = Nil): Unit =
      IncrementalTemporalStar.processBatch(
        if (fs.isEmpty) noF else fs.toDF("id", "t", "m", "k1", "k2"),
        if (fd.isEmpty) noFD else fd.toDF("id", "k1", "k2"),
        Seq(if (d1.isEmpty) noD else d1.toDF("k", "vf", "vs"), noD),
        Seq(if (d1d.isEmpty) noDD else d1d.toDF("k", "vf"), noDD),
        state, id, numBuckets = 4, trackExtrema = true)
    def extrema(): Map[(Option[String], Option[String]), (Long, Long, Long)] =
      IncrementalTemporalStar.extremaView(spark, state, numBranches = 2)
        .as[(Option[String], Option[String], Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    foldE(0L, d1 = Seq((1L, 100L, "a")))
    foldE(1L, fs = Seq((10L, 120L, 5L, 1L, 1L), (11L, 170L, 9L, 1L, 1L),
      (12L, 300L, 3L, 1L, 1L)))
    assert(extrema() === Map((Some("a"), None) -> ((3L, 3L, 9L))))
    // LATE version at 150 moves facts 11 (max=9) and 12 (min=3) to b:
    // a's extrema must FALL BACK to the one remaining value
    foldE(2L, d1 = Seq((1L, 150L, "b")))
    assert(extrema() === Map(
      (Some("a"), None) -> ((1L, 5L, 5L)),
      (Some("b"), None) -> ((2L, 3L, 9L))))
    // delete b's max fact: runner-up takes over
    foldE(3L, fd = Seq((11L, 1L, 1L)))
    assert(extrema() === Map(
      (Some("a"), None) -> ((1L, 5L, 5L)),
      (Some("b"), None) -> ((1L, 3L, 3L))))
    // version delete folds b back into a; quantiles over the merged set
    foldE(4L, d1d = Seq((1L, 150L)))
    assert(extrema() === Map((Some("a"), None) -> ((2L, 3L, 5L))))
    val med = IncrementalTemporalStar.extremaQuantiles(spark, state,
        numBranches = 2, qs = Seq((1L, 2L)))
      .as[(Option[String], Option[String], Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(med === Map((Some("a"), None) -> 3L))
    // bootstrap materializes e/ too (the family's r11 bootstrap rule)
    val bs = tmpDir("tstar-ext-bs")
    IncrementalTemporalStar.bootstrap(
      Seq((10L, 120L, 5L, 1L, 1L), (11L, 170L, 9L, 1L, 1L))
        .toDF("id", "t", "m", "k1", "k2"),
      Seq(Seq((1L, 100L, "a")).toDF("k", "vf", "vs"),
        Seq.empty[Ver].toDF("k", "vf", "vs")),
      bs, baselineBatch = 0L, numBuckets = 4, trackExtrema = true)
    val bsExt = IncrementalTemporalStar.extremaView(spark, bs, numBranches = 2)
      .as[(Option[String], Option[String], Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(bsExt === Map((Some("a"), None) -> ((2L, 5L, 9L))))
  }

  test("enriched fact table: denormalized rows stay correct as versions move") {
    val state = tmpDir("tstar-enr")
    def foldE(id: Long, fs: Seq[Fact] = Nil,
        fd: Seq[(Long, Long, Long)] = Nil,
        d1: Seq[Ver] = Nil, d2: Seq[Ver] = Nil): Unit =
      IncrementalTemporalStar.processBatch(
        if (fs.isEmpty) noF else fs.toDF("id", "t", "m", "k1", "k2"),
        if (fd.isEmpty) noFD else fd.toDF("id", "k1", "k2"),
        Seq(if (d1.isEmpty) noD else d1.toDF("k", "vf", "vs"),
          if (d2.isEmpty) noD else d2.toDF("k", "vf", "vs")),
        Seq(noDD, noDD), state, id, numBuckets = 4, trackEnriched = true)
    def enriched(): Map[Long, (Option[String], Option[String], Long)] =
      IncrementalTemporalStar.enrichedView(spark, state, numBranches = 2)
        .as[(Long, Option[String], Option[String], Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    foldE(0L, fs = Seq((10L, 120L, 1L, 1L, 1L), (11L, 300L, 2L, 1L, 1L)),
      d1 = Seq((1L, 100L, "a")))
    assert(enriched() === Map(
      10L -> ((Some("a"), None, 1L)), 11L -> ((Some("a"), None, 2L))))
    // BOTH branches move in ONE batch: fact 11 crosses both boundaries —
    // the intermediate tuples must cancel, leaving exactly the final row
    foldE(1L, d1 = Seq((1L, 200L, "b")), d2 = Seq((1L, 250L, "x")))
    assert(enriched() === Map(
      10L -> ((Some("a"), None, 1L)), 11L -> ((Some("b"), Some("x"), 2L))))
    // fact delete drops its enriched row; untouched rows stay
    foldE(2L, fd = Seq((10L, 1L, 1L)))
    assert(enriched() === Map(11L -> ((Some("b"), Some("x"), 2L))))
    // a version delete re-resolves the survivor backward
    IncrementalTemporalStar.processBatch(noF, noFD,
      Seq(noD, noD), Seq(Seq((1L, 200L)).toDF("k", "vf"), noDD),
      state, 3L, numBuckets = 4, trackEnriched = true)
    assert(enriched() === Map(11L -> ((Some("a"), Some("x"), 2L))))
    // the REPLACE view ships versioned: external table converges incl.
    // the delete and the re-resolution
    val db = "enrtstar"
    val sink = new graft.sinks.JdbcClickHouseSink(
      s"jdbc:derby:memory:$db;create=true", "app", "")
    val n = graft.sinks.ChangelogShip.shipVersioned(
      IncrementalTemporalStar.enrichedView(spark, state, numBranches = 2),
      Seq("id"), sink, "enr_facts", state, version = 4L)
    assert(n > 0)
    import org.apache.spark.sql.functions.{max_by, struct}
    val ext = spark.read.format("jdbc")
      .option("url", s"jdbc:derby:memory:$db;create=true")
      .option("dbtable", "enr_facts").load()
      .groupBy("id")
      .agg(max_by(struct(col("g1"), col("g2"), col("m"), col("is_deleted")),
        col("version")).as("s"))
      .filter("s.is_deleted = 0")
      .select(col("id"), col("s.g1"), col("s.g2"), col("s.m"))
      .as[(Long, Option[String], Option[String], Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(ext === enriched())
  }

  test("the rollup lattice folds the temporal star's changelog (R155 composition)") {
    // the star lattice's contract is "any U+0001-encoded Z-set
    // changelog"; the temporal star's stored group IS that encoding, so
    // grouping-set projections (by-seg, by-tier, grand total) maintain
    // from its changelog alone — facts never re-read, retro-reassignment
    // retractions propagate through the lattice for free
    val state = tmpDir("tstar-lattice")
    val rollup = tmpDir("tstar-lattice-r")
    val sets = Seq(Seq(0), Seq(1), Seq.empty[Int])
    def encodedChangelog(batch: Long) =
      MvPipeline.readBucketedStateOrEmpty(spark, s"$state/temporalstar/a",
          IncrementalJoinAggStar.aSchemaN(1))
        .filter(col("kind") === "c" && col("b") === batch)
        .select(col("g"), col("m"), col("c"))
    def foldAndRoll(id: Long, fs: Seq[Fact] = Nil,
        d1: Seq[Ver] = Nil, d2: Seq[Ver] = Nil): Unit = {
      fold(state, id, facts = fs, d1Ups = d1, d2Ups = d2)
      RollupMaintenance.processBatch(encodedChangelog(id), rollup, sets, id,
        numBuckets = 4)
    }
    foldAndRoll(0L, d1 = Seq((1L, 100L, "a")), d2 = Seq((1L, 50L, "x")))
    foldAndRoll(1L, fs = Seq((10L, 120L, 1L, 1L, 1L), (11L, 300L, 2L, 1L, 1L),
      (12L, 80L, 4L, 2L, 1L)))
    // late seg version: a retraction wave through the lattice
    foldAndRoll(2L, d1 = Seq((1L, 200L, "b")))
    def latticeView(set: Seq[Int]): Map[Seq[Option[String]], (Long, Long)] =
      RollupMaintenance.view(spark, rollup, set)
        .as[(String, Long, Long)].collect()
        .map { r =>
          val parts =
            if (set.isEmpty) Seq.empty[Option[String]]
            else r._1.split("\u0001", -1).toSeq
              .map(p => if (p == "\u0000") None else Some(p))
          parts -> (r._2, r._3)
        }.toMap
    val base = served(state)
    def proj(f: ((Option[String], Option[String])) => Seq[Option[String]]) =
      base.groupBy { case (g, _) => f(g) }
        .map { case (g, rows) =>
          g -> (rows.values.map(_._1).sum, rows.values.map(_._2).sum) }
    assert(latticeView(Seq(0)) === proj { case (g1, _) => Seq(g1) })
    assert(latticeView(Seq(1)) === proj { case (_, g2) => Seq(g2) })
    assert(latticeView(Seq.empty) === proj(_ => Seq.empty))
  }

  test("start(): mixed 2-branch CDC stream end-to-end (AvailableNow)") {
    import org.apache.spark.sql.types._
    val in = tmpDir("tstar-in"); val state = tmpDir("tstar-st")
    val ckpt = tmpDir("tstar-ck")
    val schema = StructType(Seq(
      StructField("kind", StringType), StructField("id", LongType),
      StructField("t", LongType), StructField("m", LongType),
      StructField("k1", LongType), StructField("k2", LongType),
      StructField("k", LongType), StructField("vf", LongType),
      StructField("vs", StringType)))
    java.nio.file.Files.write(java.nio.file.Paths.get(in, "b0.json"),
      ("""{"kind":"fact","id":1,"t":120,"m":100,"k1":10,"k2":10}""" + "\n" +
       """{"kind":"d1","k":10,"vf":100,"vs":"a"}""" + "\n").getBytes("UTF-8"))
    val q = IncrementalTemporalStar.start(spark, in, schema, state, ckpt,
      numBranches = 2)
    q.awaitTermination()
    assert(served(state) === Map((Some("a"), None) -> ((100L, 1L))))
    // second file: a LATE branch-2 version captures the retained fact,
    // plus a branch-1 version delete pushing it back to the null group
    java.nio.file.Files.write(java.nio.file.Paths.get(in, "b1.json"),
      ("""{"kind":"d2","k":10,"vf":110,"vs":"x"}""" + "\n" +
       """{"kind":"d1_del","k":10,"vf":100}""" + "\n").getBytes("UTF-8"))
    val q2 = IncrementalTemporalStar.start(spark, in, schema, state, ckpt,
      numBranches = 2)
    q2.awaitTermination()
    assert(served(state) === Map((None, Some("x")) -> ((100L, 1L))))
    assert(integral(state) === served(state))
  }

  test("forget on branch 2 walks the fact MIRROR table") {
    val state = tmpDir("tstar-fg2")
    fold(state, 0L, facts = Seq((10L, 120L, 1L, 1L, 7L), (11L, 130L, 2L, 2L, 8L)),
      d1Ups = Seq((1L, 100L, "a"), (2L, 100L, "b")),
      d2Ups = Seq((7L, 50L, "x"), (8L, 50L, "y")))
    assert(served(state) === Map(
      (Some("a"), Some("x")) -> ((1L, 1L)), (Some("b"), Some("y")) -> ((2L, 1L))))
    // forget k2=7: its fact leaves (found via fm2), d2's versions for 7
    // leave; branch-1 state for OTHER keys untouched
    IncrementalTemporalStar.forgetKeys(spark, branch = 2, Seq(7L), state,
      batchId = 1L, numBranches = 2, numBuckets = 4)
    assert(served(state) === Map((Some("b"), Some("y")) -> ((2L, 1L))))
    assert(integral(state) === served(state), "integral != view after forget")
  }

  test("multi-measure temporal star: both measures move together") {
    val state = tmpDir("tstar-mm")
    IncrementalTemporalStar.processBatch(
      Seq((10L, 120L, 1L, 10L, 1L, 1L), (11L, 170L, 2L, 20L, 1L, 1L))
        .toDF("id", "t", "m", "m2", "k1", "k2"),
      noFD, Seq(Seq((1L, 100L, "a")).toDF("k", "vf", "vs"), noD),
      Seq(noDD, noDD), state, 0L, numBuckets = 4, numMeasures = 2)
    // late branch-2 version captures fact 11: both measures move
    IncrementalTemporalStar.processBatch(
      Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("id", "t", "m", "m2", "k1", "k2"),
      noFD, Seq(noD, Seq((1L, 150L, "x")).toDF("k", "vf", "vs")),
      Seq(noDD, noDD), state, 1L, numBuckets = 4, numMeasures = 2)
    val got = IncrementalTemporalStar.view(spark, state, numBranches = 2,
        numMeasures = 2)
      .select("g1", "g2", "total", "total2", "rows")
      .as[(Option[String], Option[String], Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got === Map(
      (Some("a"), None) -> ((1L, 10L, 1L)),
      (Some("a"), Some("x")) -> ((2L, 20L, 1L))))
  }
}
