package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** MULTI-MEASURE temporal (as-of) views — R161's contract on the
  * SCD-2 family: several independently-summed measures per as-of-
  * resolved group under ONE maintained join. Every measure must move
  * together through retro-reassignments, version deletes, fact
  * deletes, and forgets, because they share the same Z-set weights. */
class IncrementalTemporalJoinAggMultiMeasureSpec extends SparkTestBase {
  import spark.implicits._

  private type Fact = (Long, Long, Long, Long, Long)  // id, t, m, m2, k
  private type Ver = (Long, Long, String)             // k, vf, vs

  private def model(facts: Iterable[Fact], vers: Iterable[Ver])
      : Map[Option[String], (Long, Long, Long)] = {
    val byK = vers.groupBy(_._1)
    facts.groupBy { case (_, t, _, _, k) =>
      byK.getOrElse(k, Nil).filter(_._2 <= t) match {
        case Nil => None
        case vs  => Some(vs.maxBy(_._2)._3)
      }
    }.map { case (g, fs) =>
      g -> (fs.map(_._3).sum, fs.map(_._4).sum, fs.size.toLong) }
  }

  private def served(state: String): Map[Option[String], (Long, Long, Long)] =
    IncrementalTemporalJoinAgg.view(spark, state, numMeasures = 2)
      .select("g", "total", "total2", "rows")
      .as[(Option[String], Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  private def integral(state: String): Map[Option[String], (Long, Long, Long)] =
    IncrementalTemporalJoinAgg.changelog(spark, state, numMeasures = 2)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("dtotal2").as("t2"),
        org.apache.spark.sql.functions.sum("drows").as("c"))
      .filter(col("c") > 0)
      .as[(Option[String], Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  private val noF = Seq.empty[Fact].toDF("id", "t", "m", "m2", "k")
  private val noFD = Seq.empty[(Long, Long)].toDF("id", "k")
  private val noD = Seq.empty[Ver].toDF("k", "vf", "vs")
  private val noDD = Seq.empty[(Long, Long)].toDF("k", "vf")

  private def fold(state: String, id: Long,
      facts: Seq[Fact] = Nil, factDels: Seq[(Long, Long)] = Nil,
      dimUps: Seq[Ver] = Nil, dimDels: Seq[(Long, Long)] = Nil): Unit =
    IncrementalTemporalJoinAgg.processBatch(
      if (facts.isEmpty) noF else facts.toDF("id", "t", "m", "m2", "k"),
      if (factDels.isEmpty) noFD else factDels.toDF("id", "k"),
      if (dimUps.isEmpty) noD else dimUps.toDF("k", "vf", "vs"),
      if (dimDels.isEmpty) noDD else dimDels.toDF("k", "vf"),
      state, id, numBuckets = 4, numMeasures = 2)

  test("both measures retro-reassign and fall back together; integral == view") {
    val state = tmpDir("tja-mm")
    fold(state, 0L, dimUps = Seq((1L, 100L, "a")))
    fold(state, 1L, facts = Seq(
      (10L, 120L, 1L, 10L, 1L), (11L, 170L, 2L, 20L, 1L),
      (12L, 300L, 4L, 40L, 1L)))
    assert(served(state) === Map(Some("a") -> ((7L, 70L, 3L))))
    // LATE version at vf=150 captures facts 11 and 12: BOTH measures move
    fold(state, 2L, dimUps = Seq((1L, 150L, "b")))
    assert(served(state) === Map(
      Some("a") -> ((1L, 10L, 1L)), Some("b") -> ((6L, 60L, 2L))))
    // version delete falls them back: both measures return to a
    fold(state, 3L, dimDels = Seq((1L, 150L)))
    assert(served(state) === Map(Some("a") -> ((7L, 70L, 3L))))
    // fact delete retracts both measures
    fold(state, 4L, factDels = Seq((11L, 1L)))
    assert(served(state) === Map(Some("a") -> ((5L, 50L, 2L))))
    assert(integral(state) === served(state), "integral != view")
    // maintenance-time as-of carries every measure
    val asOf2 = IncrementalTemporalJoinAgg
      .viewAsOf(spark, state, 2L, numMeasures = 2)
      .select("g", "total", "total2", "rows")
      .as[(Option[String], Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(asOf2 === Map(
      Some("a") -> ((1L, 10L, 1L)), Some("b") -> ((6L, 60L, 2L))))
    // changelog compaction preserves per-measure integrals
    IncrementalTemporalJoinAgg.compactChangelog(spark, state, 2L)
    assert(integral(state) === served(state), "compacted integral != view")
    // point read carries every measure
    val point = IncrementalTemporalJoinAgg
      .viewFor(spark, state, Seq("a"), numBuckets = 4, numMeasures = 2)
      .select("g", "total", "total2", "rows")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(point === Map("a" -> ((5L, 50L, 2L))))
  }

  test("random 4-input CDC interleave ≡ model after every batch (both measures)") {
    val rnd = new scala.util.Random(42)
    val state = tmpDir("tja-mm-rand")
    var liveF = Map.empty[Long, Fact]
    var liveV = Map.empty[(Long, Long), String]
    var nextId = 0L
    for (b <- 0 until 10) {
      val fs = (0 until rnd.nextInt(4)).map { _ =>
        nextId += 1
        (nextId, rnd.nextInt(1000).toLong, rnd.nextInt(5).toLong,
          rnd.nextInt(9).toLong, 1L + rnd.nextInt(3))
      }
      val fd = liveF.values.toSeq.sortBy(_._1)
        .filter(_ => rnd.nextDouble() < 0.2).map(f => (f._1, f._5))
      val du = (0 until rnd.nextInt(3)).map(_ =>
        (1L + rnd.nextInt(3), rnd.nextInt(10).toLong * 100,
          s"v${rnd.nextInt(4)}"))
      val dd = liveV.keys.toSeq.sorted
        .filter(_ => rnd.nextDouble() < 0.15).map { case (k, vf) => (k, vf) }
      fold(state, b.toLong, fs, fd, du, dd)
      liveF = (liveF ++ fs.map(f => f._1 -> f)) -- fd.map(_._1)
      // delete-wins within batch on versions (the engine contract)
      liveV = (liveV ++ du.groupBy(v => (v._1, v._2))
        .map { case (kv, rows) => kv -> rows.map(_._3).max }) -- dd
      val want = model(liveF.values,
        liveV.map { case ((k, vf), vs) => (k, vf, vs) })
      assert(served(state) === want, s"batch $b diverged")
      assert(integral(state) === want, s"batch $b integral diverged")
    }
  }

  test("events-as-CDC fold serves the x125 batch twin exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import org.apache.spark.sql.functions.{concat, expr, get_json_object, lit}
    val state = tmpDir("tja-mm-x125")
    val ev = graft.Tables.events(spark, dir)
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"),
        get_json_object(col("props"), "$.k").cast("long").as("m2"),
        col("user_id").as("k"))
    val dims = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    // facts in 3 slices; versions land with slice 1 (retro-reassigning
    // slice 0's facts through the live delta path)
    val fSlices = Seq(facts.filter("id % 3 = 0"), facts.filter("id % 3 = 1"),
      facts.filter("id % 3 = 2"))
    fSlices.zipWithIndex.foreach { case (sl, i) =>
      IncrementalTemporalJoinAgg.processBatch(sl, noFD,
        if (i == 1) dims else noD, noDD, state, i.toLong,
        numBuckets = 4, numMeasures = 2)
    }
    val twin = graft.queries.ExtQueries.x125AsofMeasures(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val got = served(state).map { case (g, v) => g.getOrElse("(none)") -> v }
    assert(got === twin)
  }

  test("bootstrap with two measures; continuation and forget retract both") {
    val state = tmpDir("tja-mm-bs")
    IncrementalTemporalJoinAgg.bootstrap(
      Seq((10L, 120L, 2L, 7L, 1L), (11L, 170L, 3L, 11L, 1L),
        (12L, 400L, 5L, 13L, 2L)).toDF("id", "t", "m", "m2", "k"),
      Seq((1L, 100L, "a"), (2L, 300L, "b")).toDF("k", "vf", "vs"),
      state, baselineBatch = 0L, numBuckets = 4, numMeasures = 2)
    assert(served(state) === Map(
      Some("a") -> ((5L, 18L, 2L)), Some("b") -> ((5L, 13L, 1L))))
    fold(state, 1L, facts = Seq((13L, 500L, 7L, 17L, 2L)),
      factDels = Seq((10L, 1L)))
    assert(served(state) === Map(
      Some("a") -> ((3L, 11L, 1L)), Some("b") -> ((12L, 30L, 2L))))
    // forget key 2: its facts AND versions leave; integral == view holds
    IncrementalTemporalJoinAgg.forgetKeys(spark, Seq(2L), state, 2L,
      numBuckets = 4, numMeasures = 2)
    assert(served(state) === Map(Some("a") -> ((3L, 11L, 1L))))
    assert(integral(state) === served(state), "integral != view after forget")
  }
}
