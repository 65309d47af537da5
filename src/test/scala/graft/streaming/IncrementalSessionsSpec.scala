package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** The maintained sessionization must equal the batch sessionize
  * recompute over the integrated events after EVERY batch — including
  * the two corrections no append-only sessionizer can produce: a LATE
  * event MERGING two existing sessions into one, and an event DELETE
  * SPLITTING (or emptying) a session. */
class IncrementalSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private type Ev = (Long, Long, Long) // id, t, k
  private val gap = 100L

  /** Reference model: batch sessionize in plain Scala (break when the
    * gap STRICTLY exceeds `gap`; ties order by (t, id)). */
  private def model(events: Iterable[Ev]): Set[(Long, Long, Long, Long)] =
    events.groupBy(_._3).flatMap { case (k, es) =>
      val sorted = es.toSeq.sortBy(e => (e._2, e._1))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Seq[Ev]]
      for (e <- sorted) {
        if (sessions.nonEmpty && e._2 - sessions.last.last._2 <= gap)
          sessions(sessions.size - 1) = sessions.last :+ e
        else sessions += Seq(e)
      }
      sessions.map(s =>
        (k, s.map(_._2).min, s.map(_._2).max, s.size.toLong))
    }.toSet

  private def served(state: String): Set[(Long, Long, Long, Long)] =
    IncrementalSessions.view(spark, state)
      .as[(Long, Long, Long, Long)].collect().toSet

  private def integral(state: String): Set[(Long, Long, Long, Long)] =
    IncrementalSessions.changelog(spark, state)
      .groupBy("k", "session_start", "session_end", "n_events")
      .agg(org.apache.spark.sql.functions.sum("w").as("w"))
      .filter(col("w") > 0)
      .select("k", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

  private val noE = Seq.empty[Ev].toDF("id", "t", "k")
  private val noD = Seq.empty[(Long, Long)].toDF("id", "k")

  private def fold(state: String, id: Long, events: Seq[Ev] = Nil,
      dels: Seq[(Long, Long)] = Nil): Unit =
    IncrementalSessions.processBatch(
      if (events.isEmpty) noE else events.toDF("id", "t", "k"),
      if (dels.isEmpty) noD else dels.toDF("id", "k"),
      gap, state, id, numBuckets = 4)

  test("gap semantics: strict break; a gap of exactly `gap` stays in-session") {
    val state = tmpDir("ses")
    fold(state, 0L, events = Seq(
      (1L, 0L, 1L), (2L, 100L, 1L),   // gap == 100 -> same session
      (3L, 201L, 1L),                 // gap == 101 -> break
      (4L, 0L, 2L)))
    assert(served(state) === Set(
      (1L, 0L, 100L, 2L), (1L, 201L, 201L, 1L), (2L, 0L, 0L, 1L)))
    assert(IncrementalSessions.viewFor(spark, state, Seq(2L), numBuckets = 4)
      .as[(Long, Long, Long, Long)].collect().toSet ===
      Set((2L, 0L, 0L, 1L)))
  }

  test("a LATE event merges two sessions; the changelog retracts both old rows") {
    val state = tmpDir("ses-merge")
    fold(state, 0L, events = Seq((1L, 0L, 1L), (2L, 250L, 1L)))
    assert(served(state) === Set((1L, 0L, 0L, 1L), (1L, 250L, 250L, 1L)))
    // t=120 bridges: 0 -> 120 (gap 120 > 100? no wait 120-0=120 > 100
    // breaks) — bridge at t=100 and t=180 instead
    fold(state, 1L, events = Seq((3L, 100L, 1L), (4L, 180L, 1L)))
    assert(served(state) === Set((1L, 0L, 250L, 4L)))
    val cl = IncrementalSessions.changelog(spark, state)
      .filter(col("batch") === 1L)
      .select("session_start", "session_end", "n_events", "w")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(cl === Set((0L, 0L, 1L, -1L), (250L, 250L, 1L, -1L),
      (0L, 250L, 4L, 1L)), "merge = two retractions + one assertion")
  }

  test("an event delete splits a session; deleting the last event empties it") {
    val state = tmpDir("ses-split")
    fold(state, 0L, events = Seq(
      (1L, 0L, 1L), (2L, 100L, 1L), (3L, 200L, 1L)))
    assert(served(state) === Set((1L, 0L, 200L, 3L)))
    fold(state, 1L, dels = Seq((2L, 1L)))     // middle event: split
    assert(served(state) === Set((1L, 0L, 0L, 1L), (1L, 200L, 200L, 1L)))
    fold(state, 2L, dels = Seq((1L, 1L), (3L, 1L)))
    assert(served(state) === Set.empty)
    assert(integral(state) === Set.empty, "integral empties too")
  }

  test("re-sent ids no-op; in-batch insert+delete nets out; absent delete no-ops") {
    val state = tmpDir("ses-idem")
    fold(state, 0L, events = Seq((1L, 0L, 1L), (2L, 50L, 1L)))
    val before = served(state)
    fold(state, 1L, events = Seq((1L, 0L, 1L), (3L, 60L, 1L)),
      dels = Seq((3L, 1L), (99L, 1L)))
    assert(served(state) === before)
  }

  test("random CDC interleave ≡ model after every batch; integral == view; as-of") {
    val rnd = new scala.util.Random(777)
    val state = tmpDir("ses-rand")
    var live = Map.empty[Long, Ev]
    var nextId = 0L
    val history = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Long, Long, Long)]]
    for (b <- 0 until 12) {
      val es = (0 until rnd.nextInt(8)).map { _ =>
        nextId += 1
        (nextId, rnd.nextInt(1200).toLong, 1L + rnd.nextInt(3))
      }
      val ds = live.keys.toSeq.sorted
        .filter(_ => rnd.nextDouble() < 0.2)
        .map(id => (id, live(id)._3))
      fold(state, b.toLong, events = es, dels = ds)
      live = (live ++ es.map(e => e._1 -> e)) -- ds.map(_._1) --
        es.map(_._1).intersect(ds.map(_._1))
      val want = model(live.values)
      assert(served(state) === want, s"batch $b view diverged")
      assert(integral(state) === want, s"batch $b integral != view")
      history += want
    }
    for (b <- Seq(3, 7, 11)) {
      val got = IncrementalSessions.viewAsOf(spark, state, b.toLong)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === history(b), s"as-of batch $b diverged")
    }
    IncrementalSessions.compactChangelog(spark, state, 7L)
    assert(integral(state) === history.last)
    assert(IncrementalSessions.viewAsOf(spark, state, 9L)
      .as[(Long, Long, Long, Long)].collect().toSet === history(9))
  }

  test("replaying a committed batch id is a no-op") {
    val state = tmpDir("ses-replay")
    fold(state, 0L, events = Seq((1L, 0L, 1L)))
    fold(state, 1L, events = Seq((2L, 50L, 1L)))
    val before = served(state)
    fold(state, 1L, events = Seq((2L, 50L, 1L)))
    assert(served(state) === before)
  }

  test("forgetUsers retracts the users' sessions; replay no-ops; others keep") {
    val state = tmpDir("ses-fg")
    fold(state, 0L, events = Seq(
      (1L, 0L, 1L), (2L, 50L, 1L), (3L, 0L, 2L)))
    IncrementalSessions.forgetUsers(spark, Seq(1L), state, 1L, gap,
      numBuckets = 4)
    assert(served(state) === Set((2L, 0L, 0L, 1L)))
    assert(integral(state) === served(state), "integral through the forget")
    IncrementalSessions.forgetUsers(spark, Seq(1L), state, 1L, gap,
      numBuckets = 4)
    assert(served(state) === Set((2L, 0L, 0L, 1L)))
  }

  test("compaction freezes closed sessions; in-contract folds stay exact") {
    val state = tmpDir("ses-comp")
    val twin = tmpDir("ses-comp-twin")
    def both(id: Long, events: Seq[Ev] = Nil,
        dels: Seq[(Long, Long)] = Nil): Unit = {
      fold(state, id, events = events, dels = dels)
      fold(twin, id, events = events, dels = dels)
    }
    both(0L, events = Seq(
      (1L, 0L, 1L), (2L, 50L, 1L),   // u1 session [0,50]x2  -> frozen
      (3L, 500L, 1L),                // u1 session [500,500] -> live
      (4L, 40L, 2L),                 // u2 session [40,40]   -> frozen
      (5L, 400L, 3L)))               // u3 session [400,400] -> live
    // horizon 300: frozen iff en + gap < 300
    IncrementalSessions.compactState(spark, state, 300L, gap, numBuckets = 4)
    assert(served(state) === served(twin), "compaction changed the view")
    val eRows = MvPipeline.readBucketedStateOrEmpty(spark,
      s"$state/sessions/e", null)
    assert(eRows.count() === 2L, "only the live sessions' events survive")
    // in-contract continuation: a t >= horizon event MERGES with the
    // retained live session exactly (its full run was kept)
    both(1L, events = Seq((6L, 550L, 1L)))
    assert(served(state) === served(twin), "post-compaction merge diverged")
    // forget of a LIVE user works and matches the twin
    IncrementalSessions.forgetUsers(spark, Seq(3L), state, 2L, gap,
      numBuckets = 4)
    IncrementalSessions.forgetUsers(spark, Seq(3L), twin, 2L, gap,
      numBuckets = 4)
    assert(served(state) === served(twin), "live forget diverged")
    // forget of a FROZEN user throws (the frozen-guard rule)...
    intercept[IllegalArgumentException] {
      IncrementalSessions.forgetUsers(spark, Seq(2L), state, 3L, gap,
        numBuckets = 4)
    }
    // ...until purgeFrozen removes the floor rows and ships −1 changelog
    // rows; then the live forget passes and the user is fully gone
    val before2 = served(state)
    IncrementalSessions.purgeFrozen(spark, Seq(2L), state, 3L, numBuckets = 4)
    assert(served(state) === before2.filterNot(_._1 == 2L))
    assert(integral(state) === served(state), "integral through the purge")
    // replay of the purge batch is a no-op
    IncrementalSessions.purgeFrozen(spark, Seq(2L), state, 3L, numBuckets = 4)
    assert(served(state) === before2.filterNot(_._1 == 2L))
    IncrementalSessions.forgetUsers(spark, Seq(2L), state, 5L, gap,
      numBuckets = 4)
    assert(!served(state).exists(_._1 == 2L))
    // the DOCUMENTED divergence: an out-of-contract late event (t <
    // horizon) re-sessionizes only the retained events beside the
    // frozen floor, where the twin merges the full history
    fold(state, 4L, events = Seq((7L, 100L, 1L)))
    fold(twin, 4L, events = Seq((7L, 100L, 1L)))
    assert(served(twin).filter(_._1 == 1L) === Set(
      (1L, 0L, 100L, 3L), (1L, 500L, 550L, 2L)))
    assert(served(state).filter(_._1 == 1L) === Set(
      (1L, 0L, 50L, 2L), (1L, 100L, 100L, 1L), (1L, 500L, 550L, 2L)))
  }

  test("forgetUsersFully (r14): a user spanning the frozen floor forgets in ONE call") {
    val state = tmpDir("ses-ff")
    fold(state, 0L, events = Seq(
      (1L, 0L, 1L), (2L, 50L, 1L),   // u1 frozen session [0,50]x2
      (3L, 500L, 1L),                // u1 live session   [500,500]
      (4L, 40L, 2L),                 // u2 frozen session [40,40]
      (5L, 400L, 3L)))               // u3 live session   [400,400]
    IncrementalSessions.compactState(spark, state, 300L, gap, numBuckets = 4)
    // u1 holds BOTH frozen floor rows and live rows: the two-pass API
    // refuses (frozen guard), the single-call forget handles both
    intercept[IllegalArgumentException] {
      IncrementalSessions.forgetUsers(spark, Seq(1L), state, 1L, gap,
        numBuckets = 4)
    }
    val asOf0 = IncrementalSessions.viewAsOf(spark, state, 0L)
      .as[(Long, Long, Long, Long)].collect().toSet
    IncrementalSessions.forgetUsersFully(spark, Seq(1L), state, 1L,
      numBuckets = 4)
    assert(served(state) === Set((2L, 40L, 40L, 1L), (3L, 400L, 400L, 1L)))
    assert(integral(state) === served(state),
      "-1 changelog rows must land for BOTH horizons")
    // maintenance-time as-of still shows the pre-forget rows
    assert(IncrementalSessions.viewAsOf(spark, state, 0L)
      .as[(Long, Long, Long, Long)].collect().toSet === asOf0)
    // replay of the committed op id is a no-op (stamped buckets +
    // empty recomputed delta)
    IncrementalSessions.forgetUsersFully(spark, Seq(1L), state, 1L,
      numBuckets = 4)
    assert(served(state) === Set((2L, 40L, 40L, 1L), (3L, 400L, 400L, 1L)))
    // a frozen-only and a live-only user forget through the same call
    IncrementalSessions.forgetUsersFully(spark, Seq(2L, 3L), state, 2L,
      numBuckets = 4)
    assert(served(state) === Set.empty)
    assert(integral(state) === Set.empty)
    // retained events of forgotten users are gone (GDPR: no residue)
    assert(MvPipeline.readBucketedStateOrEmpty(spark,
      s"$state/sessions/e", null).count() === 0L)
  }

  test("events-as-CDC fold rolls up to the x129 batch twin (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import org.apache.spark.sql.functions._
    val state = tmpDir("ses-x129")
    val g = 30L * 60L * 1000000L
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        col("user_id").as("k"))
    // 3 out-of-order slices: later batches land events BETWEEN earlier
    // ones, forcing real cross-batch session merges
    for (i <- 0 until 3)
      IncrementalSessions.processBatch(
        ev.filter(col("id") % 3 === (2 - i)), noD, g, state, i.toLong,
        numBuckets = 4)
    val got = IncrementalSessions.view(spark, state)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_sessions"), max("n_events").as("max_events"),
        max(col("session_end") - col("session_start")).as("longest_us"),
        sum("n_events").as("total_events"))
      .select(col("k").as("user_id"), col("n_sessions"),
        col("max_events"), col("longest_us"), col("total_events"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val twin = graft.queries.ExtQueries.x129UserSessions(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === twin)
  }

  test("multi-measure (R161): per-session sums ride the merge/split exactly") {
    val state = tmpDir("ses-mm")
    def foldMM(id: Long, events: Seq[(Long, Long, Long, Long)] = Nil,
        dels: Seq[(Long, Long)] = Nil): Unit =
      IncrementalSessions.processBatch(
        if (events.isEmpty) Seq.empty[(Long, Long, Long, Long)]
          .toDF("id", "t", "m", "k")
        else events.toDF("id", "t", "m", "k"),
        if (dels.isEmpty) noD else dels.toDF("id", "k"),
        gap, state, id, numBuckets = 4, numMeasures = 1)
    def servedMM: Set[(Long, Long, Long, Long, Long)] =
      IncrementalSessions.view(spark, state, numMeasures = 1)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    foldMM(0L, events = Seq((1L, 0L, 7L, 1L), (2L, 250L, 11L, 1L)))
    assert(servedMM === Set((1L, 0L, 0L, 1L, 7L), (1L, 250L, 250L, 1L, 11L)))
    // bridge MERGES the sessions: the merged row carries the TOTAL sum
    foldMM(1L, events = Seq((3L, 100L, 13L, 1L), (4L, 180L, 17L, 1L)))
    assert(servedMM === Set((1L, 0L, 250L, 4L, 48L)))
    // deleting the bridge SPLITS it back; each side keeps its own sum
    foldMM(2L, dels = Seq((3L, 1L), (4L, 1L)))
    assert(servedMM === Set((1L, 0L, 0L, 1L, 7L), (1L, 250L, 250L, 1L, 11L)))
    // changelog integral carries the measure too
    val integ = IncrementalSessions.changelog(spark, state, numMeasures = 1)
      .groupBy("k", "session_start", "session_end", "n_events", "sm")
      .agg(org.apache.spark.sql.functions.sum("w").as("w"))
      .filter(col("w") > 0)
      .select("k", "session_start", "session_end", "n_events", "sm")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(integ === servedMM)
  }

  test("derived per-user stats (R164 over R166) track merges, splits, forgets") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val state = tmpDir("ses-dv")
    val derived = tmpDir("ses-dv-d")
    val dvSchema = StructType(Seq(StructField("g", StringType),
      StructField("n_sessions", LongType), StructField("max_events", LongType),
      StructField("total_events", LongType)))
    // the cascade: sessions commit, then the derived view folds the
    // changelog-touched users' POST-state rollup
    def cascade(id: Long, events: Seq[Ev] = Nil,
        dels: Seq[(Long, Long)] = Nil): Unit = {
      fold(state, id, events = events, dels = dels)
      val touched = IncrementalSessions.changelog(spark, state)
        .filter(col("batch") === id)
        .select(col("k").cast("string").as("g")).distinct()
      val users = touched.as[String].collect().map(_.toLong).toSeq
      val rows = IncrementalSessions.viewFor(spark, state, users,
          numBuckets = 4)
        .groupBy(col("k").cast("string").as("g"))
        .agg(count(lit(1)).as("n_sessions"),
          max("n_events").as("max_events"),
          sum("n_events").as("total_events"))
      DerivedView.processBatch(spark, touched, rows, derived, id,
        numBuckets = 4)
    }
    def servedDv: Map[String, (Long, Long, Long)] =
      DerivedView.view(spark, derived, dvSchema)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def want: Map[String, (Long, Long, Long)] =
      served(state).toSeq.groupBy(_._1).map { case (k, ss) =>
        k.toString -> (ss.size.toLong, ss.map(_._4).max, ss.map(_._4).sum)
      }
    cascade(0L, events = Seq((1L, 0L, 1L), (2L, 250L, 1L), (3L, 0L, 2L)))
    assert(servedDv === want)
    cascade(1L, events = Seq((4L, 100L, 1L), (5L, 180L, 1L))) // merge
    assert(servedDv === want)
    assert(servedDv("1") === (1L, 4L, 4L), "merged into one 4-event session")
    cascade(2L, dels = Seq((4L, 1L)))                          // split
    assert(servedDv === want)
    // forget through the cascade: the user's derived row drops
    IncrementalSessions.forgetUsers(spark, Seq(2L), state, 3L, gap,
      numBuckets = 4)
    val touched3 = IncrementalSessions.changelog(spark, state)
      .filter(col("batch") === 3L)
      .select(col("k").cast("string").as("g")).distinct()
    DerivedView.processBatch(spark, touched3,
      IncrementalSessions.viewFor(spark, state, Seq(2L), numBuckets = 4)
        .groupBy(col("k").cast("string").as("g"))
        .agg(count(lit(1)).as("n_sessions"),
          max("n_events").as("max_events"),
          sum("n_events").as("total_events")),
      derived, 3L, numBuckets = 4)
    assert(servedDv === want)
    assert(!servedDv.contains("2"), "forgotten user's derived row dropped")
  }

  test("bootstrap from a batch table, then continue with deltas") {
    val state = tmpDir("ses-bs")
    IncrementalSessions.bootstrap(
      Seq((1L, 0L, 1L), (2L, 80L, 1L), (3L, 300L, 1L), (4L, 0L, 2L))
        .toDF("id", "t", "k"),
      gap, state, baselineBatch = 0L, numBuckets = 4)
    assert(served(state) === Set(
      (1L, 0L, 80L, 2L), (1L, 300L, 300L, 1L), (2L, 0L, 0L, 1L)))
    // continuation: a bridge event merges the bootstrapped sessions
    fold(state, 1L, events = Seq((5L, 170L, 1L), (6L, 260L, 1L)))
    assert(served(state) === Set((1L, 0L, 300L, 5L), (2L, 0L, 0L, 1L)))
    assert(IncrementalSessions.viewAsOf(spark, state, 0L)
      .as[(Long, Long, Long, Long)].collect().toSet === Set(
      (1L, 0L, 80L, 2L), (1L, 300L, 300L, 1L), (2L, 0L, 0L, 1L)))
  }

  test("reshard to a new bucket count; folding continues exactly (R163)") {
    val state = tmpDir("ses-rs")
    val state8 = tmpDir("ses-rs8")
    fold(state, 0L, events = Seq((1L, 0L, 1L), (2L, 250L, 1L), (3L, 0L, 2L)))
    IncrementalSessions.reshard(spark, state, state8, newBuckets = 8)
    assert(served(state8) === served(state), "reshard changed the view")
    // continue at the NEW count through a cross-batch merge
    IncrementalSessions.processBatch(
      Seq((4L, 100L, 1L), (5L, 180L, 1L)).toDF("id", "t", "k"),
      noD, gap, state8, 1L, numBuckets = 8)
    assert(served(state8) === Set((1L, 0L, 250L, 4L), (2L, 0L, 0L, 1L)))
    assert(IncrementalSessions.viewFor(spark, state8, Seq(1L), numBuckets = 8)
      .as[(Long, Long, Long, Long)].collect().toSet ===
      Set((1L, 0L, 250L, 4L)))
  }

  test("start(): CDC stream end-to-end (AvailableNow)") {
    import org.apache.spark.sql.types._
    val in = tmpDir("ses-in")
    val state = tmpDir("ses-st")
    val ckpt = tmpDir("ses-ck")
    val schema = StructType(Seq(
      StructField("kind", StringType), StructField("id", LongType),
      StructField("t", LongType), StructField("k", LongType)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b0.json"),
      Seq(
        """{"kind":"e","id":1,"t":0,"k":1}""",
        """{"kind":"e","id":2,"t":90,"k":1}""",
        """{"kind":"e","id":3,"t":400,"k":1}""",
        """{"kind":"e_del","id":3,"k":1}""")
        .mkString("\n").getBytes("UTF-8"))
    val q = IncrementalSessions.start(spark, in, schema, gap, state, ckpt,
      numBuckets = 4)
    q.awaitTermination()
    assert(served(state) === Set((1L, 0L, 90L, 2L)))
  }
}
