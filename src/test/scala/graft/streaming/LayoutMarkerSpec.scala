package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Self-describing bucketed-state layout (SURVEY §2.11 R177, VERDICT
  * r13 task 1): the `_layout` marker written at every bucketed table
  * root must make a caller-side routing mismatch — wrong numBuckets,
  * wrong subBuckets — a REFUSAL instead of a silently empty or partial
  * answer, on both the write path (folds) and the read path (viewFor +
  * SQL point-read TVF registration). */
class LayoutMarkerSpec extends SparkTestBase {
  import spark.implicits._

  test("writer: first fold adopts the marker; a fold at different constants is refused") {
    val st = tmpDir("lay-w")
    val path = s"$st/t"
    def fold(id: Long, b: Int): Unit =
      MvPipeline.upsertBucketedMerge(Seq(("a", 1L)).toDF("g", "m"), path,
        (old, inc) => old.unionByName(inc), id, b, Seq("g"))
    fold(0L, 8)
    assert(MvPipeline.readLayoutMarker(spark, path) ===
      Some(MvPipeline.Layout(8, 1, Seq("g"))))
    // wrong bucket count, wrong keys: both refused before any write
    intercept[IllegalArgumentException] { fold(1L, 16) }
    intercept[IllegalArgumentException] {
      MvPipeline.upsertBucketedMerge(Seq(("a", 1L)).toDF("g", "m"), path,
        (old, inc) => old.unionByName(inc), 1L, 8, Seq("m"))
    }
    // same constants: fine
    fold(1L, 8)
  }

  test("reader: viewFor and TVF registration refuse a (B, S) mismatch; legacy dirs pass") {
    val st = tmpDir("lay-r")
    // extrema folded SUB-BUCKETED at (B=8, S=2)
    IncrementalExtrema.processBatch(
      Seq(("g1", 5L, 1L), ("g1", 9L, 1L)).toDF("g", "v", "w"),
      st, 0L, numBuckets = 8, subBuckets = 2)
    // matching read works and is exact
    assert(IncrementalExtrema.viewFor(spark, st, Seq("g1"),
      numBuckets = 8, subBuckets = 2)
      .as[(String, Long, Long, Long)].collect().toSeq ===
      Seq(("g1", 2L, 5L, 9L)))
    // wrong B, wrong S (the S=1 read would aggregate a FRACTION of the
    // group): both refused
    intercept[IllegalArgumentException] {
      IncrementalExtrema.viewFor(spark, st, Seq("g1"),
        numBuckets = 16, subBuckets = 2)
    }
    intercept[IllegalArgumentException] {
      IncrementalExtrema.viewFor(spark, st, Seq("g1"),
        numBuckets = 8, subBuckets = 1)
    }
    // the SQL TVF constructors check at REGISTRATION (before any query)
    intercept[IllegalArgumentException] {
      SqlCatalog.extremaPointRead("lay_bad_s", s"$st/extrema",
        numBuckets = 8, subBuckets = 1).register(spark)
    }
    intercept[IllegalArgumentException] {
      SqlCatalog.extremaPointRead("lay_bad_b", s"$st/extrema",
        numBuckets = 16, subBuckets = 2).register(spark)
    }
    SqlCatalog.extremaPointRead("lay_ok", s"$st/extrema",
      numBuckets = 8, subBuckets = 2).register(spark)
    assert(spark.sql("SELECT * FROM lay_ok('g1')")
      .as[(String, Long, Long, Long)].collect().toSeq ===
      Seq(("g1", 2L, 5L, 9L)))
    // legacy dir (marker removed by hand): reads pass unchecked, and
    // the next fold re-adopts the marker
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$st/extrema/_layout"), false)
    assert(IncrementalExtrema.viewFor(spark, st, Seq("g1"),
      numBuckets = 8, subBuckets = 2).count() === 1L)
    IncrementalExtrema.processBatch(
      Seq(("g2", 1L, 1L)).toDF("g", "v", "w"), st, 1L,
      numBuckets = 8, subBuckets = 2)
    assert(MvPipeline.readLayoutMarker(spark, s"$st/extrema")
      .contains(MvPipeline.Layout(8, 2, Seq("g", "sb"))))
  }

  test("reshard writes the destination marker at the new count; stale-B reads are refused") {
    val src = tmpDir("lay-rs-src"); val dst = tmpDir("lay-rs-dst")
    IncrementalSessions.bootstrap(
      Seq((1L, 10L, 7L), (2L, 12L, 7L), (3L, 100L, 9L))
        .toDF("id", "t", "k"),
      gap = 5L, src, numBuckets = 4)
    IncrementalSessions.reshard(spark, src, dst, newBuckets = 8)
    assert(MvPipeline.readLayoutMarker(spark, s"$dst/sessions/v") ===
      Some(MvPipeline.Layout(8, 1, Seq("k"))))
    // reading the resharded store at the OLD bucket count is refused
    intercept[IllegalArgumentException] {
      IncrementalSessions.viewFor(spark, dst, Seq(7L), numBuckets = 4)
    }
    assert(IncrementalSessions.viewFor(spark, dst, Seq(7L), numBuckets = 8)
      .count() === 1L)
    intercept[IllegalArgumentException] {
      SqlCatalog.sessionsPointRead("lay_rs_bad", dst, numBuckets = 4)
        .register(spark)
    }
    SqlCatalog.sessionsPointRead("lay_rs_ok", dst, numBuckets = 8)
      .register(spark)
    assert(spark.sql("SELECT * FROM lay_rs_ok(7)").count() === 1L)
  }

  test("describe surfaces each table's (layout_buckets, layout_sub) from the marker") {
    val sA = tmpDir("lay-d"); val cd = tmpDir("lay-d-c")
    IncrementalExtrema.processBatch(
      Seq(("g1", 5L, 1L)).toDF("g", "v", "w"), sA, 0L,
      numBuckets = 4, subBuckets = 2)
    val cat = ViewCatalog.Catalog(bases = Seq(
      ViewCatalog.Stage("ex", Seq(sA))((_, _) => ())))
    val rep = ViewCatalog.describe(spark, cat, cd).collect()
      .map(r => r.getString(2) -> (r.getLong(10), r.getLong(11))).toMap
    assert(rep("extrema") === ((4L, 2L)))
  }

  test("as-of floor view (ADVICE r13): <fn>_floor names the earliest exact upto") {
    val st = tmpDir("lay-f")
    def fold(id: Long, g: String, m: Long): Unit =
      IncrementalJoinAgg.processBatch(
        Seq((1L, id * 10 + 1, m)).toDF("jk", "id", "m"), "jk", "id", "m",
        Seq((1L, g)).toDF("jk", "g"), "jk", "g", st, id, numBuckets = 4)
    fold(0L, "s1", 5L); fold(1L, "s1", 7L); fold(2L, "s1", 9L)
    SqlCatalog.aggAsOfRead("lay_asof", s"$st/joinaggstar/a", numBuckets = 4)
      .register(spark)
    assert(spark.sql("SELECT floor FROM lay_asof_floor")
      .as[Long].head() === 0L)
    // compaction raises the floor; re-register (the catalog's re-bind
    // contract — registration resolves the file listing) and the view
    // tracks it; an upto AT the floor still answers exactly (the
    // baseline row is stamped there)
    IncrementalJoinAgg.compactChangelog(spark, st, 1L)
    SqlCatalog.aggAsOfRead("lay_asof", s"$st/joinaggstar/a", numBuckets = 4)
      .register(spark)
    assert(spark.sql("SELECT floor FROM lay_asof_floor")
      .as[Long].head() === 1L)
    assert(spark.sql("SELECT total FROM lay_asof('s1', 1)")
      .as[Long].head() === 12L)
  }
}
