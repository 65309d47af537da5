package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.dns.DnsFixtures
import graft.ingest.Querylog
import graft.views.Summaries

/** End-to-end MV-equivalence (SURVEY.md §5.4): the streaming fan-out run in
  * two chunks must produce exactly the state a single batch pass computes —
  * the core incremental-view contract of the reference's MVs. */
class MvPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val aB64 = DnsFixtures.b64(DnsFixtures.aAnswerCompressed)

  private def line(t: String, qh: String, ip: String, filtered: Boolean): String =
    s"""{"T":"$t","QH":"$qh","QT":"A","QC":"IN","CP":"","IP":"$ip","Elapsed":1,""" +
      s""""Result":{"IsFiltered":$filtered},"Answer":"$aB64"}"""

  private val chunk1 = Seq(
    line("2024-01-01T00:01:00Z", "ads.example.com", "10.0.0.1", filtered = true),
    line("2024-01-01T00:02:00Z", "good.example.org", "10.0.0.1", filtered = false),
    line("2024-01-01T00:03:00Z", "good.example.org", "10.0.0.2", filtered = false)
  )
  // chunk2 revisits the same keys (forces real merges) + a late row in an
  // old bucket (no-watermark semantics: must still land in its bucket)
  private val chunk2 = Seq(
    line("2024-01-01T00:14:00Z", "ads.example.com", "10.0.0.1", filtered = true),
    line("2024-01-01T00:01:30Z", "ads.example.com", "10.0.0.2", filtered = true),
    line("2024-01-01T00:15:00Z", "new.example.net", "10.0.0.3", filtered = false)
  )

  test("incremental (2 micro-batches) == batch, across all 8 views") {
    val in = tmpDir("mv-in")
    val state = tmpDir("mv-state")
    val ckpt = tmpDir("mv-ckpt")

    def runAvailable(): Unit = {
      val q = MvPipeline.start(spark, in, state, ckpt)
      q.awaitTermination()
    }

    Files.write(Paths.get(in, "chunk1.jsonl"), chunk1.mkString("\n").getBytes)
    runAvailable()
    Files.write(Paths.get(in, "chunk2.jsonl"), chunk2.mkString("\n").getBytes)
    runAvailable()

    val batchLog2 = Querylog.parse((chunk1 ++ chunk2).toDF("value"))
    Summaries.all.foreach { case (name, view) =>
      val keys = Summaries.keys(name)
      val batchView = view(batchLog2)
      val expected = batchView.orderBy(keys.head, keys.tail: _*).collect().toSeq
      val got = MvPipeline.readState(spark, state, name)
        .select(batchView.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
        .orderBy(keys.head, keys.tail: _*).collect().toSeq
      assert(got == expected, s"view $name diverged")
    }
  }

  test("replayed batch id is merged exactly once (idempotent upsert)") {
    import spark.implicits._
    val state = tmpDir("mv-idem")
    val inc = Seq(("a.com", 1L), ("b.com", 2L)).toDF("QH", "count")
    MvPipeline.upsert(inc, s"$state/v", Seq("QH"), batchId = 7L)
    MvPipeline.upsert(inc, s"$state/v", Seq("QH"), batchId = 7L) // replay: skipped
    val m1 = MvPipeline.readState(spark, state, "v").as[(String, Long)].collect().toMap
    assert(m1 == Map("a.com" -> 1L, "b.com" -> 2L))
    MvPipeline.upsert(inc, s"$state/v", Seq("QH"), batchId = 8L) // new batch: merged
    val m2 = MvPipeline.readState(spark, state, "v").as[(String, Long)].collect().toMap
    assert(m2 == Map("a.com" -> 2L, "b.com" -> 4L))
  }

  test("ad-hoc merge preserves the committed batch id (replay stays armed)") {
    import spark.implicits._
    val state = tmpDir("mv-adhoc")
    val inc = Seq(("a.com", 1L)).toDF("QH", "count")
    MvPipeline.upsert(inc, s"$state/v", Seq("QH"), batchId = 7L)
    // an ad-hoc backfill/compaction fold (negative id) between the
    // stream's batches must NOT stamp -1 over the committed id — a
    // subsequent REPLAY of batch 7 would otherwise re-merge
    MvPipeline.upsert(inc, s"$state/v", Seq("QH"), batchId = -1L)
    MvPipeline.upsert(inc, s"$state/v", Seq("QH"), batchId = 7L) // replay: must skip
    val m = MvPipeline.readState(spark, state, "v").as[(String, Long)].collect().toMap
    assert(m == Map("a.com" -> 2L)) // batch 7 once + one ad-hoc merge
  }

  test("concurrent writer committing mid-merge is detected and the merge aborts") {
    val path = s"${tmpDir("mv-collide")}/t"
    MvPipeline.upsert(Seq((1L, 10L)).toDF("k", "v"), path, Seq("k"), batchId = 0L)

    // simulate a second writer violating the single-writer contract: its
    // commit lands between this merge's state read and the dir swap (the
    // lost-update window). The tampered marker stands in for the other
    // writer's committed marker; data files stay readable so the abort
    // path itself is what's exercised.
    val ex = intercept[IllegalStateException] {
      MvPipeline.upsertMerge(Seq((1L, 5L)).toDF("k", "v"), path, (old, inc) => {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val out = fs.create(new org.apache.hadoop.fs.Path(path, "_graft_batch"), true)
        try out.write("7\nanother-writer-token".getBytes("UTF-8")) finally out.close()
        old.unionByName(inc).groupBy("k")
          .agg(org.apache.spark.sql.functions.sum("v").as("v"))
      }, batchId = 2L)
    }
    assert(ex.getMessage.contains("concurrent writer"))
    // the other writer's state survives untouched — no last-write-wins
    assert(spark.read.parquet(path).as[(Long, Long)].collect().toMap === Map(1L -> 10L))
    // and the state dir is live (restored, not left renamed aside)
    assert(!new java.io.File(path + ".old").exists())

    // an uncontended retry then folds cleanly
    MvPipeline.upsert(Seq((1L, 5L)).toDF("k", "v"), path, Seq("k"), batchId = 2L)
    assert(spark.read.parquet(path).as[(Long, Long)].collect().toMap === Map(1L -> 15L))
  }

  test("late row updated its old 10-minute bucket") {
    // separate state from the previous test is fine: rebuild quickly
    val in = tmpDir("mv-in2"); val state = tmpDir("mv-state2"); val ckpt = tmpDir("mv-ckpt2")
    Files.write(Paths.get(in, "c1.jsonl"), chunk1.mkString("\n").getBytes)
    MvPipeline.start(spark, in, state, ckpt).awaitTermination()
    Files.write(Paths.get(in, "c2.jsonl"), chunk2.mkString("\n").getBytes)
    MvPipeline.start(spark, in, state, ckpt).awaitTermination()
    val bucket0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val s = MvPipeline.readState(spark, state, "stats2")
      .as[(String, Long, Long, Long)].collect()
      .map { case (ip, b, bl, vi) => ((ip, b), (bl, vi)) }.toMap
    // 10.0.0.2's late 00:01:30 blocked row joined its 00:00 bucket
    assert(s(("10.0.0.2", bucket0)) == (1L, 1L))
  }

  test("expireState: TTL rewrite preserves the replay marker; no-op when nothing expires") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmpDir("ttl-state"); val path = s"$dir/view"
    // commit batch 7 through the normal upsert path
    MvPipeline.upsert(Seq(("a", 1L, 1L), ("b", 9L, 2L)).toDF("k", "day", "cnt"),
      path, Seq("k", "day"), batchId = 7L)

    assert(MvPipeline.expireState(spark, path, col("day") >= 5L) === 1L)
    val left = spark.read.parquet(path).as[(String, Long, Long)].collect().toSeq
    assert(left === Seq(("b", 9L, 2L)))

    // replay of batch 7 must STILL be skipped (marker id survived expiry)
    MvPipeline.upsert(Seq(("b", 9L, 100L)).toDF("k", "day", "cnt"),
      path, Seq("k", "day"), batchId = 7L)
    assert(spark.read.parquet(path).as[(String, Long, Long)].collect().toSeq
      === Seq(("b", 9L, 2L)))

    // nothing expires -> no rewrite, 0 reported
    assert(MvPipeline.expireState(spark, path, col("day") >= 0L) === 0L)
    // a NEW batch still applies normally after expiry
    MvPipeline.upsert(Seq(("b", 9L, 3L)).toDF("k", "day", "cnt"),
      path, Seq("k", "day"), batchId = 8L)
    assert(spark.read.parquet(path).as[(String, Long, Long)].collect().toSeq
      === Seq(("b", 9L, 5L)))
  }

  test("stateDigest: order/partition/column-order invariant, content-sensitive") {
    import spark.implicits._
    def digest(df: org.apache.spark.sql.DataFrame): Long =
      MvPipeline.stateDigest(df).as[Long].collect().head
    val a = Seq(("x", 1L), ("y", 2L), ("z", 3L)).toDF("k", "v")
    val shuffled = Seq(("z", 3L), ("x", 1L), ("y", 2L)).toDF("k", "v")
      .repartition(7)
    val reordered = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("v", "k")
    assert(digest(a) === digest(shuffled))
    assert(digest(a) === digest(reordered)) // name-sorted canonical form
    val changed = Seq(("x", 1L), ("y", 2L), ("z", 4L)).toDF("k", "v")
    assert(digest(a) !== digest(changed))
    assert(digest(a.limit(0)) === 0L) // empty table digests to 0
  }

  test("floor markers ignore foreign files sharing the prefix (no NumberFormatException)") {
    val d = tmpDir("floor-marker")
    MvPipeline.writeFloorMarker(spark, d, "_resume_floor_b", 5L)
    // a copy-tool artifact with a non-numeric suffix must be ignored by
    // read AND prune, never a NumberFormatException on every later batch
    assert(new java.io.File(d, "_resume_floor_b5.bak").createNewFile())
    assert(MvPipeline.resumeFloor(spark, d) === 5L)
    MvPipeline.writeFloorMarker(spark, d, "_resume_floor_b", 7L,
      pruneOlder = true)
    assert(MvPipeline.resumeFloor(spark, d) === 7L)
    assert(new java.io.File(d, "_resume_floor_b5.bak").exists,
      "pruneOlder must not touch non-conforming names")
    assert(!new java.io.File(d, "_resume_floor_b5").exists,
      "the real older marker is pruned")
    MvPipeline.assertAboveResumeFloor(spark, d, 8L) // above: passes
    intercept[IllegalArgumentException] {
      MvPipeline.assertAboveResumeFloor(spark, d, 7L)
    }
  }

  test("maxStampUnder recovers the committed floor when the changelog was fully compacted away") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("stamp-floor")
    // batch 4 inserts group g1; batch 5 nets it to zero; compacting the
    // full prefix then drops the all-zero baseline — no b-bearing rows
    // remain, so the changelog-derived floor (maxBatchIn) is -1, but the
    // per-bucket replay stamps still carry 5 (the writeResumeFloor
    // fallback path, ADVICE r12)
    val up = Seq(("c", "g1", 4L, 5L, 1L)).toDF("kind", "g", "b", "m", "c")
    MvPipeline.upsertBucketedMerge(up, s"$root/a",
      (o, i) => o.unionByName(i), 4L, 4, Seq("g"))
    val dn = Seq(("c", "g1", 5L, -5L, -1L)).toDF("kind", "g", "b", "m", "c")
    MvPipeline.upsertBucketedMerge(dn, s"$root/a",
      (o, i) => o.unionByName(i), 5L, 4, Seq("g"))
    MvPipeline.compactChangelogA(spark, s"$root/a", 5L)
    assert(MvPipeline.maxBatchIn(spark, s"$root/a") === -1L,
      "compaction dropped every b-bearing row")
    assert(MvPipeline.maxStampUnder(spark, root) === 5L,
      "bucket stamps survive compaction")
    MvPipeline.writeResumeFloor(spark, root,
      math.max(MvPipeline.maxBatchIn(spark, s"$root/a"),
        MvPipeline.maxStampUnder(spark, root)))
    assert(MvPipeline.resumeFloor(spark, root) === 5L)
    intercept[IllegalArgumentException] {
      MvPipeline.assertAboveResumeFloor(spark, root, 5L)
    }
  }
}
