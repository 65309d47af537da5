package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Consistent backup/restore (R181): a between-batches copy of the
  * maintained state must restore to a tree every read and every
  * RESUMED fold treats as the original — layout markers, replay
  * stamps, and floors ride along; in-flight protocol artifacts refuse
  * the backup; a tampered backup refuses the restore. */
class StateBackupSpec extends SparkTestBase {
  import spark.implicits._

  private val dSchema = StructType(Seq(StructField("g", StringType),
    StructField("v", LongType)))

  test("backup -> destroy -> restore: reads identical, folds resume; refusals on dirty/tampered state") {
    val sE = tmpDir("bk-ex"); val sD = tmpDir("bk-d")
    val bk = tmpDir("bk-dst")

    // two families' state: an extrema value-multiset + a derived
    // REPLACE table (bucketed layouts, markers, stamps)
    IncrementalExtrema.processBatch(
      Seq(("g1", 5L, 1L), ("g1", 9L, 2L), ("g2", 3L, 1L)).toDF("g", "v", "w"),
      sE, 0L, numBuckets = 4)
    DerivedView.processBatch(spark,
      Seq("a", "b").toDF("g"),
      Seq(("a", 1L), ("b", 2L)).toDF("g", "v"), sD, 0L, numBuckets = 4)
    def exView() = IncrementalExtrema.view(spark, sE)
      .as[(String, Long, Long, Long)].collect().toSet
    def dView() = DerivedView.view(spark, sD, dSchema)
      .as[(String, Long)].collect().toSet
    val ex0 = exView(); val d0 = dView()
    assert(ex0.nonEmpty && d0 === Set(("a", 1L), ("b", 2L)))

    val rep = StateBackup.backup(spark, Seq(sE, sD), bk)
    assert(rep.dirs === 2 && rep.files > 0 && rep.bytes > 0)
    assert(StateBackup.verify(spark, bk))

    // destroy the originals entirely, restore, and read again
    val fs = new org.apache.hadoop.fs.Path(sE)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(sE), true)
    fs.delete(new org.apache.hadoop.fs.Path(sD), true)
    val rep2 = StateBackup.restore(spark, bk)
    assert(rep2.files === rep.files && rep2.bytes === rep.bytes)
    assert(exView() === ex0 && dView() === d0)

    // the restored state FOLDS ON: layout marker + replay stamps are
    // part of the tree, so batch 1 routes and stamps exactly as if the
    // backup never happened — and a replay of batch 0 still no-ops
    IncrementalExtrema.processBatch(
      Seq(("g2", 7L, 1L)).toDF("g", "v", "w"), sE, 1L, numBuckets = 4)
    assert(exView() === (ex0 - (("g2", 1L, 3L, 3L)) + (("g2", 2L, 3L, 7L))))
    // wrong-layout read still refused after restore (the marker rode along)
    intercept[IllegalArgumentException] {
      IncrementalExtrema.viewFor(spark, sE, Seq("g1"), numBuckets = 8)
    }

    // restore over a NON-EMPTY live target refuses without force,
    // proceeds with it (and re-verifies) when forced
    intercept[IllegalArgumentException] { StateBackup.restore(spark, bk) }
    StateBackup.restore(spark, bk, force = true)
    assert(exView() === ex0, "forced restore rewound to the backup point")

    // positional replacement targets: restore into a staging clone
    val cE = tmpDir("bk-clone-e"); val cD = tmpDir("bk-clone-d")
    StateBackup.restore(spark, bk, over = Seq(cE, cD))
    assert(IncrementalExtrema.view(spark, cE)
      .as[(String, Long, Long, Long)].collect().toSet === ex0)

    // a dir with an in-flight staged delta refuses the backup (crash
    // mid-fold is not a clean point-in-time); force copies anyway
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$sE/extrema/_delta_b9"))
    val ex = intercept[IllegalArgumentException] {
      StateBackup.backup(spark, Seq(sE), tmpDir("bk-dirty"))
    }
    assert(ex.getMessage.contains("_delta_b9"))
    val bkF = tmpDir("bk-forced")
    StateBackup.backup(spark, Seq(sE), bkF, force = true)
    assert(StateBackup.verify(spark, bkF))
    fs.delete(new org.apache.hadoop.fs.Path(s"$sE/extrema/_delta_b9"), true)

    // tamper: delete one backed-up file -> verify false, restore refused
    val victim = fs.listStatus(new org.apache.hadoop.fs.Path(s"$bk/0/extrema"))
      .filter(_.isDirectory).head.getPath
    val f = fs.listStatus(victim).head.getPath
    fs.delete(f, false)
    assert(!StateBackup.verify(spark, bk))
    intercept[IllegalArgumentException] {
      StateBackup.restore(spark, bk, force = true)
    }

    // a backup destination must be empty
    intercept[IllegalArgumentException] {
      StateBackup.backup(spark, Seq(sD), bk)
    }
  }

  test("streaming resume after restore: the (state, floors, offsets) triple folds on exactly") {
    // the scaladoc contract made executable: back up state + catalog
    // floors + the streaming CHECKPOINT in one call, lose everything,
    // restore — the resumed stream re-discovers the post-backup input
    // as a fresh batch and converges to the exact pre-disaster views
    val in = tmpDir("bks-in"); val ckpt = tmpDir("bks-ckpt")
    val cat = tmpDir("bks-cat"); val sA = tmpDir("bks-state")
    val bk = tmpDir("bks-triple")
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("v", LongType), StructField("w", LongType)))
    val catalog = ViewCatalog.Catalog(bases = Seq(
      ViewCatalog.Stage("ex", Seq(sA))((b, id) =>
        IncrementalExtrema.processBatch(b.select("g", "v", "w"), sA, id,
          numBuckets = 4))))
    def run(): Unit =
      ViewCatalog.start(spark, in, schema, catalog, cat, ckpt)
        .awaitTermination()
    def view(): Set[(String, Long, Long, Long)] =
      IncrementalExtrema.view(spark, sA)
        .as[(String, Long, Long, Long)].collect().toSet

    java.nio.file.Files.write(java.nio.file.Paths.get(in, "b0.jsonl"),
      """{"g":"g1","v":5,"w":1}
        |{"g":"g1","v":9,"w":2}""".stripMargin.getBytes)
    run()
    val v0 = view()
    assert(v0 === Set(("g1", 3L, 5L, 9L)))
    assert(ViewCatalog.completedFloor(spark, cat) === 0L)

    StateBackup.backup(spark, Seq(sA, cat, ckpt), bk)

    java.nio.file.Files.write(java.nio.file.Paths.get(in, "b1.jsonl"),
      """{"g":"g2","v":7,"w":1}""".getBytes)
    run()
    val v1 = view()
    assert(v1 === v0 + (("g2", 1L, 7L, 7L)))
    assert(ViewCatalog.completedFloor(spark, cat) === 1L)

    // disaster: all three trees gone; restore the consistent triple
    val fs = new org.apache.hadoop.fs.Path(sA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(sA, cat, ckpt).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    StateBackup.restore(spark, bk)
    assert(view() === v0, "restore rewound to the backup point")
    assert(ViewCatalog.completedFloor(spark, cat) === 0L)

    // resume: the rewound checkpoint has not seen b1.jsonl — the
    // stream re-offers it as the next batch and the cascade converges
    // to the exact pre-disaster state
    run()
    assert(view() === v1)
    assert(ViewCatalog.completedFloor(spark, cat) === 1L)
  }

  test("scheduled backups as a catalog maintenance op: every Nth committed batch writes a verifiable snapshot") {
    // the nightly-backup pattern: a Maintenance tier op fires AFTER the
    // completion floor advanced (post-batch state is quiescent — no
    // staged deltas to refuse), writing each snapshot to its own
    // batch-stamped destination; a crash loses only the trigger and a
    // partial backup is detectable (no manifest ⇒ verify false), never
    // silently restorable
    val cat = tmpDir("bkm-cat"); val sA = tmpDir("bkm-state")
    val bk = tmpDir("bkm-dst")
    val catalog = ViewCatalog.Catalog(
      bases = Seq(ViewCatalog.Stage("ex", Seq(sA))((b, id) =>
        IncrementalExtrema.processBatch(b.select("g", "v", "w"), sA, id,
          numBuckets = 4))),
      maintenance = Seq(ViewCatalog.Maintenance("backup", every = 2)(bid =>
        StateBackup.backup(spark, Seq(sA, cat), s"$bk/b$bid"))))
    def batch(rows: Seq[(String, Long, Long)]) = rows.toDF("g", "v", "w")
    def view(dir: String): Set[(String, Long, Long, Long)] =
      IncrementalExtrema.view(spark, dir)
        .as[(String, Long, Long, Long)].collect().toSet

    ViewCatalog.runBatch(spark, catalog, cat, batch(Seq(("g1", 5L, 1L))), 0L)
    assert(StateBackup.verify(spark, s"$bk/b0"), "batch 0 backup written")
    val v0 = view(sA)
    ViewCatalog.runBatch(spark, catalog, cat, batch(Seq(("g1", 9L, 2L))), 1L)
    assert(!new java.io.File(s"$bk/b1").exists, "off-cadence batch: no backup")
    ViewCatalog.runBatch(spark, catalog, cat, batch(Seq(("g2", 3L, 1L))), 2L)
    assert(StateBackup.verify(spark, s"$bk/b2"))
    val v2 = view(sA)
    // each snapshot restores to ITS batch's state (staging clones)
    val c0 = tmpDir("bkm-c0"); val c0cat = tmpDir("bkm-c0cat")
    StateBackup.restore(spark, s"$bk/b0", over = Seq(c0, c0cat))
    assert(view(c0) === v0 && v0 != v2)
    assert(ViewCatalog.completedFloor(spark, c0cat) === 0L,
      "the floor rides with its snapshot")
    val c2 = tmpDir("bkm-c2"); val c2cat = tmpDir("bkm-c2cat")
    StateBackup.restore(spark, s"$bk/b2", over = Seq(c2, c2cat))
    assert(view(c2) === v2)
    assert(ViewCatalog.completedFloor(spark, c2cat) === 2L)
  }
}
