package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.IncrementalJoinAgg

/** The shipped changelog must let an append-only external table converge
  * to the maintained view: per-group sums over the shipped rows equal
  * the served aggregate after every ship, retractions travel as signed
  * rows, the watermark makes re-ships a no-op, and a crash between the
  * sink append and the watermark advance (simulated by rolling the
  * marker back) re-ships byte-identical blocks that a (batch, key)
  * dedup read removes — the documented at-least-once + dedup =
  * exactly-once composition. */
class ChangelogShipSpec extends SparkTestBase {
  import spark.implicits._

  private def derbyUrl(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def readBack(db: String, table: String) =
    spark.read.format("jdbc")
      .option("url", derbyUrl(db)).option("dbtable", table).load()

  /** Downstream fold: dedup identical re-shipped blocks by (batch, g),
    * then integrate — what ReplacingMergeTree + sum does in ClickHouse. */
  private def folded(db: String, table: String): Map[String, (Long, Long)] =
    readBack(db, table).distinct()
      .groupBy("g").agg(sum("dtotal").as("t"), sum("dpairs").as("p"))
      .filter(col("p") > 0)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAgg.view(spark, state)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("shipped signed increments converge an append-only JDBC table to the view") {
    val state = tmpDir("cs1")
    val db = "changelog1"
    val sink = new JdbcClickHouseSink(derbyUrl(db), "app", "")
    def fold(fb: Seq[(Long, Long, Long)], db2: Seq[(Long, String)], id: Long): Unit =
      IncrementalJoinAgg.processBatch(fb.toDF("jk", "id", "m"), "jk", "id", "m",
        db2.toDF("jk", "g"), "jk", "g", state, id, numBuckets = 4)
    def shipNow(): Long = ChangelogShip.ship(
      IncrementalJoinAgg.changelog(spark, state), "batch", sink, "agg_cl", state)

    // batch 0 + ship
    fold(Seq((10L, 1L, 100L), (20L, 2L, 30L)), Seq((10L, "A"), (20L, "A")), 0L)
    assert(shipNow() > 0)
    assert(folded(db, "agg_cl") === served(state))
    assert(ChangelogShip.watermark(spark, state, "agg_cl") === 0L)

    // batch 1 RETRACTS (re-key A→B): the −1 rows travel; external folds
    fold(Nil, Seq((10L, "B")), 1L)
    assert(shipNow() > 0)
    assert(folded(db, "agg_cl") === served(state))
    assert(served(state) === Map("A" -> (30L, 1L), "B" -> (100L, 1L)))

    // nothing pending: re-ship is a no-op (watermark)
    assert(shipNow() === 0L)
    assert(folded(db, "agg_cl") === served(state))

    // crash between append and watermark advance: roll the marker back
    // by hand — the re-ship appends DUPLICATE blocks; the dedup read
    // still folds to the view, and raw rows prove the duplicates exist
    val rawBefore = readBack(db, "agg_cl").count()
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$state/_shipped_agg_cl")
    fs.delete(marker, true)
    val out = fs.create(marker, true)
    try out.write("0".getBytes("UTF-8")) finally out.close()
    assert(shipNow() > 0) // re-ships batch 1
    assert(readBack(db, "agg_cl").count() > rawBefore, "duplicates must exist raw")
    assert(folded(db, "agg_cl") === served(state), "dedup fold removes them")
    assert(ChangelogShip.watermark(spark, state, "agg_cl") === 1L)

    // compaction BELOW the watermark never re-ships folded history
    IncrementalJoinAgg.compactChangelog(spark, state, 1L)
    assert(shipNow() === 0L)
    fold(Seq((20L, 3L, 7L)), Nil, 2L)
    assert(shipNow() > 0)
    assert(folded(db, "agg_cl") === served(state))
  }

  test("temporal-star changelog ships: external table converges across a retro-reassignment") {
    import graft.streaming.IncrementalTemporalStar
    val state = tmpDir("cs-tstar")
    val db = "changelogts"
    val sink = new JdbcClickHouseSink(derbyUrl(db), "app", "")
    val noFD = Seq.empty[(Long, Long, Long)].toDF("id", "k1", "k2")
    val noD = Seq.empty[(Long, Long, String)].toDF("k", "vf", "vs")
    val noDD = Seq.empty[(Long, Long)].toDF("k", "vf")
    def fold(id: Long, fs: Seq[(Long, Long, Long, Long, Long)],
        d1: Seq[(Long, Long, String)], d2: Seq[(Long, Long, String)]): Unit =
      IncrementalTemporalStar.processBatch(
        if (fs.isEmpty)
          Seq.empty[(Long, Long, Long, Long, Long)]
            .toDF("id", "t", "m", "k1", "k2")
        else fs.toDF("id", "t", "m", "k1", "k2"),
        noFD, Seq(if (d1.isEmpty) noD else d1.toDF("k", "vf", "vs"),
          if (d2.isEmpty) noD else d2.toDF("k", "vf", "vs")),
        Seq(noDD, noDD), state, id, numBuckets = 4)
    def shipNow(): Long = ChangelogShip.ship(
      IncrementalTemporalStar.changelog(spark, state, numBranches = 2),
      "batch", sink, "tstar_cl", state)
    def folded(): Map[(Option[String], Option[String]), (Long, Long)] =
      readBack(db, "tstar_cl").distinct()
        .groupBy("g1", "g2").agg(sum("dtotal").as("t"), sum("drows").as("c"))
        .filter(col("c") > 0)
        .as[(Option[String], Option[String], Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    def served(): Map[(Option[String], Option[String]), (Long, Long)] =
      IncrementalTemporalStar.view(spark, state, numBranches = 2)
        .as[(Option[String], Option[String], Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    fold(0L, fs = Seq((10L, 120L, 1L, 1L, 1L), (11L, 300L, 2L, 1L, 1L)),
      d1 = Seq((1L, 100L, "a")), d2 = Nil)
    assert(shipNow() > 0)
    assert(folded() === served())
    // a LATE tier version retro-reassigns fact 11: the −1/+1 rows travel
    fold(1L, Nil, Nil, d2 = Seq((1L, 200L, "x")))
    assert(shipNow() > 0)
    assert(folded() === served())
    assert(served() === Map(
      (Some("a"), None) -> ((1L, 1L)),
      (Some("a"), Some("x")) -> ((2L, 1L))))
    assert(shipNow() === 0L, "watermark should make the re-ship a no-op")
  }

  test("versioned REPLACE ship: a levels view converges a latest-version-wins reader, incl. forget-deletes and the crash-window duplicate") {
    import graft.streaming.{ForgetMaintenance, IncrementalStrictFunnel}
    val state = tmpDir("cs3")
    val db = "changelog3"
    val sink = new JdbcClickHouseSink(derbyUrl(db), "app", "")
    val steps = Seq("signup", "click", "purchase")
    def fold(b: Seq[(Long, Long, String)], id: Long): Unit =
      IncrementalStrictFunnel.processBatch(b.toDF("u", "t", "et"),
        "u", "t", "et", steps, 100L, state, id)
    // REPLACE-per-key view ("user" is reserved in Derby — alias it)
    def levelsView = IncrementalStrictFunnel.levels(spark, state)
      .select(col("user").as("uid"), col("level"))
    def shipV(v: Long): Long = ChangelogShip.shipVersioned(
      levelsView, Seq("uid"), sink, "lvl", state, v)
    // the downstream contract: latest version per key wins; deleted keys drop
    def foldedV: Map[Long, Int] = readBack(db, "lvl").distinct()
      .groupBy("uid")
      .agg(max_by(struct(col("level"), col("is_deleted")), col("version")).as("s"))
      .filter("s.is_deleted = 0")
      .select(col("uid"), col("s.level"))
      .as[(Long, Int)].collect().toMap
    def servedV: Map[Long, Int] =
      levelsView.as[(Long, Int)].collect().toMap

    fold(Seq((1L, 0L, "signup"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 0L, "signup")), 0L)
    assert(shipV(0L) === 2L)
    assert(foldedV === servedV)
    assert(servedV === Map(1L -> 3, 2L -> 1))
    // replay below the watermark is a no-op
    assert(shipV(0L) === 0L)

    // a RETRACTION replaces: the late dup drops user 1 to level 2 —
    // only the changed key ships
    fold(Seq((1L, 15L, "click")), 1L)
    assert(shipV(1L) === 1L)
    assert(foldedV === servedV)
    assert(servedV === Map(1L -> 2, 2L -> 1))

    // forget travels as a deletion marker
    ForgetMaintenance.forgetStrictFunnel(spark, Seq(2L).toDF("user"), state, opId = 2L)
    assert(shipV(2L) === 1L)
    assert(foldedV === servedV)
    assert(servedV === Map(1L -> 2))

    // crash window: the sink append of version 3 lands but snapshot +
    // watermark do not — simulate by saving the snapshot, shipping, then
    // restoring snapshot + watermark and replaying the same version
    fold(Seq((3L, 0L, "signup")), 3L)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = new org.apache.hadoop.fs.Path(s"$state/_snapshot_lvl")
    val backup = new org.apache.hadoop.fs.Path(s"$state/_snap_backup")
    org.apache.hadoop.fs.FileUtil.copy(fs, snap, fs, backup, false,
      spark.sparkContext.hadoopConfiguration)
    assert(shipV(3L) === 1L) // the "crashed" attempt: append happened
    fs.delete(snap, true)
    require(fs.rename(backup, snap))
    val marker = new org.apache.hadoop.fs.Path(s"$state/_shipped_v_lvl")
    val out = fs.create(marker, true)
    try out.write("2".getBytes("UTF-8")) finally out.close()
    val rawBefore = readBack(db, "lvl").count()
    assert(shipV(3L) === 1L) // replay appends the identical block
    assert(readBack(db, "lvl").count() > rawBefore, "duplicates must exist raw")
    assert(foldedV === servedV, "latest-version-wins folds the duplicates")
    assert(servedV === Map(1L -> 2, 3L -> 1))
    assert(ChangelogShip.versionWatermark(spark, state, "lvl") === 3L)

    // no view change: the next version ships nothing but is consumed
    assert(shipV(4L) === 0L)
    assert(ChangelogShip.versionWatermark(spark, state, "lvl") === 4L)
  }

  test("sessions changelog ships: external summing table converges across a merge") {
    import graft.streaming.IncrementalSessions
    val state = tmpDir("cs-ses")
    val db = "changelog_ses"
    val sink = new JdbcClickHouseSink(derbyUrl(db), "app", "")
    def fold(events: Seq[(Long, Long, Long)], id: Long): Unit =
      IncrementalSessions.processBatch(events.toDF("id", "t", "k"),
        Seq.empty[(Long, Long)].toDF("id", "k"), gap = 100L,
        stateDir = state, batchId = id, numBuckets = 4)
    def shipNow(): Long = ChangelogShip.ship(
      IncrementalSessions.changelog(spark, state), "batch", sink,
      "ses_cl", state)
    def foldedExt: Set[(Long, Long, Long, Long)] =
      readBack(db, "ses_cl").distinct()
        .groupBy("k", "session_start", "session_end", "n_events")
        .agg(sum("w").as("w")).filter(col("w") > 0)
        .select("k", "session_start", "session_end", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
    def servedSes: Set[(Long, Long, Long, Long)] =
      IncrementalSessions.view(spark, state)
        .as[(Long, Long, Long, Long)].collect().toSet

    fold(Seq((1L, 0L, 1L), (2L, 250L, 1L)), 0L)
    assert(shipNow() > 0)
    assert(foldedExt === servedSes)
    // a bridge MERGES the two sessions: the −1/−1/+1 rows travel and
    // the external summing fold converges to the single merged row
    fold(Seq((3L, 100L, 1L), (4L, 180L, 1L)), 1L)
    assert(shipNow() > 0)
    assert(foldedExt === servedSes)
    assert(servedSes === Set((1L, 0L, 250L, 4L)))
    assert(shipNow() === 0L, "nothing pending after the watermark")
  }

  test("versioned ship serves a sessions rollup: a merge REPLACES, a forget DELETES") {
    import graft.streaming.IncrementalSessions
    val state = tmpDir("cs-ses-v")
    val db = "changelog_ses_v"
    val sink = new JdbcClickHouseSink(derbyUrl(db), "app", "")
    def fold(events: Seq[(Long, Long, Long)], id: Long): Unit =
      IncrementalSessions.processBatch(events.toDF("id", "t", "k"),
        Seq.empty[(Long, Long)].toDF("id", "k"), gap = 100L,
        stateDir = state, batchId = id, numBuckets = 4)
    // REPLACE-per-user rollup over the maintained session rows
    def rollup = IncrementalSessions.view(spark, state)
      .groupBy(col("k").as("uid"))
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("total_events"))
    def shipV(v: Long): Long = ChangelogShip.shipVersioned(
      rollup, Seq("uid"), sink, "ses_roll", state, v)
    def foldedV: Map[Long, (Long, Long)] = readBack(db, "ses_roll").distinct()
      .groupBy("uid")
      .agg(max_by(struct(col("n_sessions"), col("total_events"),
        col("is_deleted")), col("version")).as("s"))
      .filter("s.is_deleted = 0")
      .select(col("uid"), col("s.n_sessions"), col("s.total_events"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def servedV: Map[Long, (Long, Long)] =
      rollup.as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

    fold(Seq((1L, 0L, 1L), (2L, 250L, 1L), (3L, 0L, 2L)), 0L)
    assert(shipV(0L) === 2L)
    assert(foldedV === servedV)
    assert(servedV === Map(1L -> (2L, 2L), 2L -> (1L, 1L)))
    // a cross-batch MERGE replaces user 1's rollup row (2 sessions -> 1)
    fold(Seq((4L, 100L, 1L), (5L, 180L, 1L)), 1L)
    assert(shipV(1L) === 1L)
    assert(foldedV === servedV)
    assert(servedV === Map(1L -> (1L, 4L), 2L -> (1L, 1L)))
    // a forget travels as a deletion marker
    IncrementalSessions.forgetUsers(spark, Seq(2L), state, 2L, gap = 100L,
      numBuckets = 4)
    assert(shipV(2L) === 1L)
    assert(foldedV === servedV)
    assert(servedV === Map(1L -> (1L, 4L)))
  }

  test("parquet sink: the same contract over files") {
    val state = tmpDir("cs2"); val out = tmpDir("cs2out")
    val sink = new ParquetSink(out)
    IncrementalJoinAgg.processBatch(
      Seq((10L, 1L, 100L)).toDF("jk", "id", "m"), "jk", "id", "m",
      Seq((10L, "A")).toDF("jk", "g"), "jk", "g", state, 0L, numBuckets = 4)
    assert(ChangelogShip.ship(
      IncrementalJoinAgg.changelog(spark, state), "batch", sink, "cl", state) === 1L)
    val ext = spark.read.parquet(s"$out/cl").distinct()
      .groupBy("g").agg(sum("dtotal").as("t"), sum("dpairs").as("p"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(ext === served(state))
  }

  test("versioned ship serves the star COUNT(DISTINCT) view: a distinct DECREASE replaces, a vanished group deletes") {
    import graft.streaming.IncrementalJoinAggStar
    import IncrementalJoinAggStar.StarSpec
    val state = tmpDir("cs4")
    val db = "changelog4"
    val sink = new JdbcClickHouseSink(derbyUrl(db), "app", "")
    val spec = StarSpec(Seq(1), groupAttrs = Seq((1, 1)),
      trackDistinct = Some("k1"))
    def fold(fb: Seq[(Long, Long, Long)], dels: Seq[(Long, Long)], ups: Seq[(Long, String)],
        id: Long): Unit =
      IncrementalJoinAggStar.processBatch(spec,
        fb.toDF("k1", "id", "m"), Seq("k1"), "id", "m",
        dels.toDF("k1", "id"), Seq("k1"), "id",
        Seq(Seq(ups.toDF("k", "vs")
          .select(col("k"), lit(null).cast("long").as("vl"), col("vs")))),
        Seq(Seq(("k", "vl", "vs"))), state, id, numBuckets = 4)
    def dView = IncrementalJoinAggStar.distinctView(spark, state)
    def shipV(v: Long): Long =
      ChangelogShip.shipVersioned(dView, Seq("g"), sink, "ndist", state, v)
    def foldedV: Map[String, Long] = readBack(db, "ndist").distinct()
      .groupBy("g")
      .agg(max_by(struct(col("n_distinct"), col("is_deleted")), col("version")).as("s"))
      .filter("s.is_deleted = 0")
      .select(col("g"), col("s.n_distinct"))
      .as[(String, Long)].collect().toMap
    def servedD: Map[String, Long] = dView.as[(String, Long)].collect().toMap

    // customers 500, 501 in group A; 502 in B
    fold(Seq((500L, 1L, 10L), (500L, 2L, 20L), (501L, 3L, 30L), (502L, 4L, 40L)),
      Nil, Seq((500L, "A"), (501L, "A"), (502L, "B")), 0L)
    assert(shipV(0L) === 2L)
    assert(foldedV === servedD)
    assert(servedD === Map("A" -> 2L, "B" -> 1L))
    // the last fact of customer 501 goes: A's distinct DECREASES — the
    // REPLACE a summing sink cannot express; only A ships
    fold(Nil, Seq((501L, 3L)), Nil, 1L)
    assert(shipV(1L) === 1L)
    assert(foldedV === servedD)
    assert(servedD === Map("A" -> 1L, "B" -> 1L))
    // group B vanishes (its only fact deleted): a deletion marker ships
    fold(Nil, Seq((502L, 4L)), Nil, 2L)
    assert(shipV(2L) === 1L)
    assert(foldedV === servedD)
    assert(servedD === Map("A" -> 1L))
    // no change: empty diff still consumes the version
    assert(shipV(3L) === 0L)
    assert(foldedV === servedD)
  }
}
