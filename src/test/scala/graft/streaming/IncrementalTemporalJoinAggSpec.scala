package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** The maintained AS-OF (SCD-2) join-aggregate must equal the batch
  * ASOF LEFT join recompute over the integrated inputs after EVERY
  * batch — including the corrections no append-only state can serve: a
  * LATE version retro-reassigning every fact in its validity span, and
  * a version DELETE making those facts fall back to the PREVIOUS
  * version (or to the unmatched null group). */
class IncrementalTemporalJoinAggSpec extends SparkTestBase {
  import spark.implicits._

  private type Fact = (Long, Long, Long, Long)        // id, t, m, k
  private type Ver = (Long, Long, String)             // k, vf, vs

  /** Reference model: batch ASOF LEFT aggregate in plain Scala. */
  private def model(facts: Iterable[Fact], vers: Iterable[Ver])
      : Map[Option[String], (Long, Long)] = {
    val byK = vers.groupBy(_._1)
    facts.groupBy { case (_, t, _, k) =>
      byK.getOrElse(k, Nil).filter(_._2 <= t) match {
        case Nil => None
        case vs  => Some(vs.maxBy(_._2)._3)
      }
    }.map { case (g, fs) => g -> (fs.map(_._3).sum, fs.size.toLong) }
  }

  private def served(state: String): Map[Option[String], (Long, Long)] =
    IncrementalTemporalJoinAgg.view(spark, state)
      .as[(Option[String], Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def integral(state: String): Map[Option[String], (Long, Long)] =
    IncrementalTemporalJoinAgg.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("c"))
      .filter(col("c") > 0)
      .as[(Option[String], Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private val noF = Seq.empty[Fact].toDF("id", "t", "m", "k")
  private val noFD = Seq.empty[(Long, Long)].toDF("id", "k")
  private val noD = Seq.empty[Ver].toDF("k", "vf", "vs")
  private val noDD = Seq.empty[(Long, Long)].toDF("k", "vf")

  private def fold(state: String, id: Long,
      facts: Seq[Fact] = Nil, factDels: Seq[(Long, Long)] = Nil,
      dimUps: Seq[Ver] = Nil, dimDels: Seq[(Long, Long)] = Nil): Unit =
    IncrementalTemporalJoinAgg.processBatch(
      if (facts.isEmpty) noF else facts.toDF("id", "t", "m", "k"),
      if (factDels.isEmpty) noFD else factDels.toDF("id", "k"),
      if (dimUps.isEmpty) noD else dimUps.toDF("k", "vf", "vs"),
      if (dimDels.isEmpty) noDD else dimDels.toDF("k", "vf"),
      state, id, numBuckets = 4)

  test("facts resolve the version valid at their time; ties vf<=t inclusive") {
    val state = tmpDir("tja")
    fold(state, 0L, dimUps = Seq((1L, 100L, "a"), (1L, 200L, "b")))
    fold(state, 1L, facts = Seq(
      (10L, 50L, 5L, 1L),   // before first version -> null group
      (11L, 100L, 7L, 1L),  // exactly at vf=100 -> a (inclusive)
      (12L, 150L, 11L, 1L), // within [100,200) -> a
      (13L, 200L, 13L, 1L), // exactly at vf=200 -> b
      (14L, 999L, 17L, 2L)))// key with no versions -> null group
    assert(served(state) === Map(
      None -> (22L, 2L), Some("a") -> (18L, 2L), Some("b") -> (13L, 1L)))
    // bucket-pruned point read: named groups only, absent names empty
    assert(IncrementalTemporalJoinAgg.viewFor(spark, state, Seq("a", "zz"),
        numBuckets = 4)
      .as[(String, Long, Long)].collect().toSeq === Seq(("a", 18L, 2L)))
  }

  test("LATE version retro-reassigns exactly the facts in its span") {
    val state = tmpDir("tja-late")
    fold(state, 0L, dimUps = Seq((1L, 100L, "a")))
    fold(state, 1L, facts = Seq(
      (10L, 120L, 1L, 1L), (11L, 170L, 2L, 1L), (12L, 300L, 4L, 1L)))
    assert(served(state) === Map(Some("a") -> (7L, 3L)))
    // late version at vf=150: captures [150, inf) -> facts 11, 12 move
    fold(state, 2L, dimUps = Seq((1L, 150L, "b")))
    assert(served(state) === Map(Some("a") -> (1L, 1L), Some("b") -> (6L, 2L)))
    // even later HEAD version at vf=50: captures only [50, 100)
    fold(state, 3L, dimUps = Seq((1L, 50L, "c")))
    assert(served(state) === Map(Some("a") -> (1L, 1L), Some("b") -> (6L, 2L)))
  }

  test("version delete falls back to the predecessor; head delete to null") {
    val state = tmpDir("tja-del")
    fold(state, 0L,
      dimUps = Seq((1L, 100L, "a"), (1L, 200L, "b")),
      facts = Seq((10L, 150L, 1L, 1L), (11L, 250L, 2L, 1L)))
    assert(served(state) === Map(Some("a") -> (1L, 1L), Some("b") -> (2L, 1L)))
    fold(state, 1L, dimDels = Seq((1L, 200L)))     // b's span reverts to a
    assert(served(state) === Map(Some("a") -> (3L, 2L)))
    fold(state, 2L, dimDels = Seq((1L, 100L)))     // last version: all null
    assert(served(state) === Map(None -> (3L, 2L)))
    fold(state, 3L, dimDels = Seq((1L, 100L)))     // absent delete no-ops
    assert(served(state) === Map(None -> (3L, 2L)))
  }

  test("version replace at the same valid-from moves its whole span") {
    val state = tmpDir("tja-rep")
    fold(state, 0L, dimUps = Seq((1L, 100L, "a")),
      facts = Seq((10L, 150L, 1L, 1L), (11L, 250L, 2L, 1L)))
    fold(state, 1L, dimUps = Seq((1L, 100L, "z")))
    assert(served(state) === Map(Some("z") -> (3L, 2L)))
    // re-sending the identical version is a no-op (empty interval diff)
    fold(state, 2L, dimUps = Seq((1L, 100L, "z")))
    assert(served(state) === Map(Some("z") -> (3L, 2L)))
  }

  test("fact deletes retract; in-batch insert+delete nets out; re-sent id no-ops") {
    val state = tmpDir("tja-fd")
    fold(state, 0L, dimUps = Seq((1L, 0L, "a")),
      facts = Seq((10L, 10L, 1L, 1L), (11L, 20L, 2L, 1L)))
    fold(state, 1L, factDels = Seq((10L, 1L)))
    assert(served(state) === Map(Some("a") -> (2L, 1L)))
    // same id inserted and deleted in one batch: delete-wins, net absent
    fold(state, 2L, facts = Seq((12L, 30L, 4L, 1L)), factDels = Seq((12L, 1L)))
    assert(served(state) === Map(Some("a") -> (2L, 1L)))
    // re-sent live id no-ops; absent-id delete no-ops
    fold(state, 3L, facts = Seq((11L, 20L, 2L, 1L)), factDels = Seq((99L, 1L)))
    assert(served(state) === Map(Some("a") -> (2L, 1L)))
  }

  test("random CDC interleave ≡ model after every batch; integral == view; as-of") {
    val rnd = new scala.util.Random(123)
    val state = tmpDir("tja-rand")
    var liveF = Map.empty[Long, Fact]
    var liveV = Map.empty[(Long, Long), String]
    var nextId = 0L
    val history = scala.collection.mutable.ArrayBuffer
      .empty[Map[Option[String], (Long, Long)]]
    for (b <- 0 until 12) {
      val nF = rnd.nextInt(6)
      val fs = (0 until nF).map { _ =>
        nextId += 1
        (nextId, rnd.nextInt(1000).toLong, 1L + rnd.nextInt(9),
          1L + rnd.nextInt(4))
      }
      val fd = liveF.keys.toSeq.sorted
        .filter(_ => rnd.nextDouble() < 0.15)
        .map(id => (id, liveF(id)._4))
      val dUp = (0 until rnd.nextInt(4)).map { _ =>
        (1L + rnd.nextInt(4), (rnd.nextInt(10) * 100).toLong,
          s"v${rnd.nextInt(5)}")
      }
      val dDel = liveV.keys.toSeq.sorted
        .filter(_ => rnd.nextDouble() < 0.2)
      fold(state, b.toLong, facts = fs, factDels = fd, dimUps = dUp,
        dimDels = dDel)
      // model update: delete-wins within the batch on both inputs
      val dDelSet = dDel.toSet
      liveF = (liveF ++ fs.map(f => f._1 -> f)) -- fd.map(_._1) --
        fs.map(_._1).intersect(fd.map(_._1))
      // within-batch latest-wins is deterministic max(vs), like the engine
      liveV = (liveV -- dDelSet) ++
        dUp.groupBy(v => (v._1, v._2))
          .map { case (kv, rows) => kv -> rows.map(_._3).max }
          .filterNot { case (kv, _) => dDelSet(kv) }
      val want = model(liveF.values,
        liveV.toSeq.map { case ((k, vf), vs) => (k, vf, vs) })
      assert(served(state) === want, s"batch $b view diverged")
      assert(integral(state) === want, s"batch $b integral != view")
      history += want
    }
    // maintenance-time as-of reads reproduce every committed point
    for (b <- Seq(3, 7, 11)) {
      val got = IncrementalTemporalJoinAgg.viewAsOf(spark, state, b.toLong)
        .as[(Option[String], Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === history(b), s"as-of batch $b diverged")
    }
    // compaction preserves the view and later as-ofs
    IncrementalTemporalJoinAgg.compactChangelog(spark, state, 7L)
    assert(integral(state) === history.last)
    val got9 = IncrementalTemporalJoinAgg.viewAsOf(spark, state, 9L)
      .as[(Option[String], Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got9 === history(9))
  }

  test("replaying a committed batch id is a no-op") {
    val state = tmpDir("tja-replay")
    fold(state, 0L, dimUps = Seq((1L, 0L, "a")),
      facts = Seq((10L, 10L, 5L, 1L)))
    fold(state, 1L, facts = Seq((11L, 20L, 7L, 1L)))
    val before = served(state)
    fold(state, 1L, facts = Seq((11L, 20L, 7L, 1L)))
    assert(served(state) === before)
  }

  test("bootstrap from batch tables, then continue with deltas") {
    val state = tmpDir("tja-bs")
    IncrementalTemporalJoinAgg.bootstrap(
      Seq((10L, 150L, 1L, 1L), (11L, 250L, 2L, 1L), (12L, 50L, 4L, 2L))
        .toDF("id", "t", "m", "k"),
      Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("k", "vf", "vs"),
      state, baselineBatch = 0L, numBuckets = 4)
    assert(served(state) === Map(
      None -> (4L, 1L), Some("a") -> (1L, 1L), Some("b") -> (2L, 1L)))
    assert(integral(state) === served(state))
    // continuation: late version + fact delete against bootstrapped state
    fold(state, 1L, dimUps = Seq((2L, 0L, "c")), factDels = Seq((11L, 1L)))
    assert(served(state) === Map(Some("a") -> (1L, 1L), Some("c") -> (4L, 1L)))
    assert(integral(state) === served(state))
  }

  test("forgetKeys removes a key's facts AND versions as one CDC batch") {
    val state = tmpDir("tja-forget")
    fold(state, 0L,
      dimUps = Seq((1L, 100L, "a"), (2L, 100L, "b")),
      facts = Seq((10L, 150L, 1L, 1L), (11L, 150L, 2L, 2L),
        (12L, 50L, 4L, 1L)))
    assert(served(state) === Map(
      None -> (4L, 1L), Some("a") -> (1L, 1L), Some("b") -> (2L, 1L)))
    IncrementalTemporalJoinAgg.forgetKeys(spark, Seq(1L), state, 1L,
      numBuckets = 4)
    assert(served(state) === Map(Some("b") -> (2L, 1L)))
    assert(integral(state) === served(state), "integral != view through forget")
    // replaying the committed forget batch is a no-op; absent keys no-op
    IncrementalTemporalJoinAgg.forgetKeys(spark, Seq(1L), state, 1L,
      numBuckets = 4)
    IncrementalTemporalJoinAgg.forgetKeys(spark, Seq(99L), state, 2L,
      numBuckets = 4)
    assert(served(state) === Map(Some("b") -> (2L, 1L)))
    // forgotten facts and versions left no state rows
    assert(IncrementalTemporalJoinAgg.view(spark, state).count() === 1L)
  }

  test("compactState bounds state; in-contract folds stay ≡ the uncompacted twin") {
    val state = tmpDir("tja-comp")
    val twin = tmpDir("tja-comp-twin")
    def both(id: Long, facts: Seq[Fact] = Nil, dimUps: Seq[Ver] = Nil): Unit = {
      fold(state, id, facts = facts, dimUps = dimUps)
      fold(twin, id, facts = facts, dimUps = dimUps)
    }
    both(0L,
      dimUps = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "c"),
        (2L, 150L, "x")),
      facts = Seq((10L, 120L, 1L, 1L), (11L, 250L, 2L, 1L),
        (12L, 400L, 4L, 1L), (13L, 500L, 8L, 2L)))
    val before = served(state)
    IncrementalTemporalJoinAgg.compactState(spark, state, horizon = 300L)
    // the view is untouched; old facts left f/, old versions collapsed
    assert(served(state) === before)
    val fRows = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$state/temporaljoinagg/f", null)
    assert(fRows.count() === 2L) // ids 12, 13 (t >= 300) retained
    val dRows = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$state/temporaljoinagg/d1", null)
    // key 1: real version at vf=300 retained PLUS the floor ("b")
    // rewritten one tick below the horizon; key 2: floor (x) at 299
    assert(dRows.count() === 3L)
    // in-contract continuation (all times >= horizon): late version at
    // exactly the horizon boundary, facts, a fact delete — ≡ twin
    both(1L, dimUps = Seq((1L, 350L, "d"), (2L, 300L, "y")),
      facts = Seq((14L, 360L, 16L, 1L), (15L, 320L, 32L, 2L)))
    assert(served(state) === served(twin), "post-compaction fold diverged")
    fold(state, 2L, factDels = Seq((12L, 1L)))
    fold(twin, 2L, factDels = Seq((12L, 1L)))
    assert(served(state) === served(twin), "post-compaction delete diverged")
    // IN-CONTRACT delete of the at-horizon version, with a fact at
    // t=310 landing in the reopened span: the floor at horizon−1 is
    // the exact fallback (the uncompacted history falls back to the
    // same prevailing attribute "b")
    fold(state, 3L, facts = Seq((17L, 310L, 128L, 1L)),
      dimDels = Seq((1L, 300L)))
    fold(twin, 3L, facts = Seq((17L, 310L, 128L, 1L)),
      dimDels = Seq((1L, 300L)))
    assert(served(state) === served(twin),
      "at-horizon version delete must fall back to the floor exactly")
    assert(served(state)(Some("b")) === (130L, 2L),
      "the reopened span resolves the floor's attribute")
    // the DOCUMENTED divergence: an out-of-contract late fact (t <
    // horizon) sees only the compacted history — t=120 resolves
    // nothing before the 299 floor (null group) where the twin
    // resolves the historical "a"
    fold(state, 4L, facts = Seq((16L, 120L, 64L, 1L)))
    fold(twin, 4L, facts = Seq((16L, 120L, 64L, 1L)))
    val s4 = served(state); val t4 = served(twin)
    assert(t4(Some("a")) === (65L, 2L), "twin resolves the exact history")
    assert(s4(None) === (64L, 1L), "compacted lands in the null group")
    assert(s4(Some("a")) === (1L, 1L))
  }

  test("events-as-CDC fold serves the x123 batch twin exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import org.apache.spark.sql.functions._
    val state = tmpDir("tja-x123")
    val ev = graft.Tables.events(spark, dir)
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"), col("user_id").as("k"))
    val dims = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    // 3 out-of-order slices; versions land AFTER the facts they govern
    for (i <- 0 until 3)
      IncrementalTemporalJoinAgg.processBatch(
        facts.filter(col("id") % 3 === (2 - i)), noFD,
        dims.filter(col("k") % 3 === i), noDD,
        state, i.toLong, numBuckets = 4)
    val twin = graft.queries.ExtQueries.x123AsofRevenue(spark, dir)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val got = served(state).map { case (g, v) => g.getOrElse("(none)") -> v }
    assert(got === twin)
  }
}
