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

  test("differential backup: only changed buckets copied, restore(base+incr) byte-identical and folds on, same-length corruption refused by checksum") {
    val sE = tmpDir("inc-ex")
    IncrementalExtrema.processBatch(
      Seq(("g1", 5L, 1L), ("g2", 3L, 1L), ("g3", 8L, 1L), ("g4", 6L, 1L))
        .toDF("g", "v", "w"), sE, 0L, numBuckets = 4)
    def exView() = IncrementalExtrema.view(spark, sE)
      .as[(String, Long, Long, Long)].collect().toSet

    val base = tmpDir("inc-base")
    val rep0 = StateBackup.backup(spark, Seq(sE), base)
    assert(rep0.copiedFiles === rep0.files && rep0.copiedBytes === rep0.bytes,
      "a full backup copies everything it names")

    // two folds touching ONE group — a strict subset of the buckets
    IncrementalExtrema.processBatch(
      Seq(("g1", 7L, 1L)).toDF("g", "v", "w"), sE, 1L, numBuckets = 4)
    IncrementalExtrema.processBatch(
      Seq(("g1", 2L, 1L)).toDF("g", "v", "w"), sE, 2L, numBuckets = 4)
    val v2 = exView()

    val incr = tmpDir("inc-delta")
    val rep1 = StateBackup.backupIncremental(spark, Seq(sE), incr, base)
    assert(rep1.files > 0 && rep1.copiedFiles > 0, "touched buckets copied")
    assert(rep1.copiedFiles < rep1.files,
      s"incremental copied ${rep1.copiedFiles} of ${rep1.files} named files" +
        " — must be a strict subset when most buckets are untouched")
    // the incremental dir physically holds exactly the copied subset
    val fs = new org.apache.hadoop.fs.Path(incr)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def countFiles(p: org.apache.hadoop.fs.Path): Long = {
      if (!fs.exists(p)) return 0L
      val it = fs.listFiles(p, true); var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      n
    }
    assert(countFiles(new org.apache.hadoop.fs.Path(s"$incr/0")) === rep1.copiedFiles)
    assert(StateBackup.verify(spark, incr))
    assert(StateBackup.verify(spark, incr, deep = true),
      "deep verify re-hashes every byte through the chain")

    // a no-change incremental re-copies ONLY the small _-named marker
    // files (the coarse-mtime always-copy rule, ADVICE r15); every
    // parquet part rides as a chain pointer
    val incr2 = tmpDir("inc-nochange")
    val rep2 = StateBackup.backupIncremental(spark, Seq(sE), incr2, incr)
    assert(rep2.files === rep1.files)
    assert(rep2.copiedFiles < rep2.files)
    val copied2 = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$incr2/0"), true)
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) buf += it.next().getPath.getName
      buf.toSeq
    }
    assert(copied2.nonEmpty && copied2.forall(_.startsWith("_")),
      s"only markers copy on a no-change incremental, got $copied2")
    assert(StateBackup.verify(spark, incr2, deep = true))

    // disaster: restore from the two-level chain, byte-identical + folds on
    fs.delete(new org.apache.hadoop.fs.Path(sE), true)
    val rep3 = StateBackup.restore(spark, incr2)
    assert(rep3.files === rep1.files)
    assert(exView() === v2, "restore(base+incr+incr) reproduces the tree")
    IncrementalExtrema.processBatch(
      Seq(("g2", 9L, 1L)).toDF("g", "v", "w"), sE, 3L, numBuckets = 4)
    val v3 = exView()
    assert(v3 !== v2, "the restored state folds on")

    // tamper: SAME-LENGTH bit corruption in the BASE layer — shallow
    // verify (listing) stays green, the checksum catches it: deep
    // verify false, restore refused, live target untouched
    val victims = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$base/0"), true)
      val buf = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.Path]()
      while (it.hasNext) { val s = it.next(); if (s.getLen > 0) buf += s.getPath }
      buf.toSeq
    }
    victims.foreach { f =>
      val len = fs.getFileStatus(f).getLen.toInt
      val in = fs.open(f)
      val bytes = try { val b = new Array[Byte](len); in.readFully(b); b }
        finally in.close()
      bytes(len / 2) = (bytes(len / 2) ^ 0x5a).toByte
      val out = fs.create(f, true)
      try out.write(bytes) finally out.close()
    }
    assert(StateBackup.verify(spark, incr2),
      "same-length corruption is invisible to the listing check")
    assert(!StateBackup.verify(spark, incr2, deep = true),
      "deep verify catches same-length corruption")
    intercept[IllegalArgumentException] {
      StateBackup.restore(spark, incr2, force = true)
    }
    assert(exView() === v3, "refused restore left the live target intact")
    assert(!new java.io.File(s"$sE.restoring").exists,
      "refused restore swept its staging dir")

    // chaining to a damaged base is refused outright — corrupt the
    // LENGTH of a base file so the chain's shallow gate trips
    // a DATA file: markers always re-copy per layer, so only parquet
    // parts still chain-point into the base where the corruption sits
    val f0 = victims.find(!_.getName.startsWith("_")).get
    val out = fs.create(f0, true)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    assert(!StateBackup.verify(spark, incr2))
    intercept[IllegalArgumentException] {
      StateBackup.backupIncremental(spark, Seq(sE), tmpDir("inc-bad2"), incr2)
    }
  }

  test("v1 (pre-r15) manifests verify and restore read-only; incremental chaining to a v1 base is refused") {
    val sE = tmpDir("v1-src")
    IncrementalExtrema.processBatch(
      Seq(("g1", 5L, 1L), ("g2", 3L, 1L)).toDF("g", "v", "w"),
      sE, 0L, numBuckets = 4)
    def exView() = IncrementalExtrema.view(spark, sE)
      .as[(String, Long, Long, Long)].collect().toSet
    val v0 = exView()

    // take a v2 backup, then rewrite its manifest in the v1 format
    // (header-less: `dirs=<n>`, dir rows, blank, `<key>\t<len>`) —
    // exactly what an r14-written backup dir holds on disk
    val bk = tmpDir("v1-bk")
    StateBackup.backup(spark, Seq(sE), bk)
    val conf = spark.sparkContext.hadoopConfiguration
    val manP = new org.apache.hadoop.fs.Path(s"$bk/_backup_manifest")
    val fs = manP.getFileSystem(conf)
    val v2Lines = {
      val in = fs.open(manP)
      try scala.io.Source.fromInputStream(in).getLines().toVector
      finally in.close()
    }
    assert(v2Lines.head === "graft-backup v2")
    val blank = v2Lines.indexOf("")
    val v1Lines = v2Lines.slice(1, 2) ++ v2Lines.slice(3, blank + 1) ++
      v2Lines.drop(blank + 1).map { l =>
        val parts = l.split("\t"); s"${parts(0)}\t${parts(1)}"
      }
    val out = fs.create(manP, true)
    try out.write(v1Lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()

    // read-only surface works: verify (shallow AND deep — no hashes
    // recorded, so deep degrades to the listing check) and restore
    assert(StateBackup.verify(spark, bk),
      "a v1 backup must still verify after the v2 upgrade")
    assert(StateBackup.verify(spark, bk, deep = true),
      "deep verify on v1 skips the absent hashes instead of failing")
    fs.delete(new org.apache.hadoop.fs.Path(sE), true)
    StateBackup.restore(spark, bk)
    assert(exView() === v0, "restore from a v1 backup reproduces the tree")

    // ...but the restored state is live again: folds continue
    IncrementalExtrema.processBatch(
      Seq(("g1", 9L, 1L)).toDF("g", "v", "w"), sE, 1L, numBuckets = 4)
    assert(exView() !== v0)

    // chaining is refused with a clear message — v1 recorded no mtimes,
    // so the (len, mtime) change fingerprint cannot discriminate
    val ex = intercept[IllegalArgumentException] {
      StateBackup.backupIncremental(spark, Seq(sE), tmpDir("v1-inc"), bk)
    }
    assert(ex.getMessage.contains("v1"))
  }

  test("incremental fingerprint: small _-named marker files always copy (coarse-mtime rewrite safety)") {
    // a state dir shaped like the engine's: one fresh-UUID data file
    // (fingerprint shortcut applies) + one constant-length in-place
    // marker (`_fps_*` / floor analogue)
    val src = tmpDir("mk-src")
    val conf = spark.sparkContext.hadoopConfiguration
    val srcP = new org.apache.hadoop.fs.Path(src)
    val fs = srcP.getFileSystem(conf)
    def put(name: String, bytes: Array[Byte]): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$src/$name"), true)
      try out.write(bytes) finally out.close()
    }
    put("part-uuid1.parquet", Array.fill[Byte](256)(7))
    put("_resume_floor_b", "41".getBytes("UTF-8"))

    val base = tmpDir("mk-base")
    StateBackup.backup(spark, Seq(src), base)

    // rewrite the marker IN PLACE: same length, different bytes, and the
    // SAME mtime (fs.setTimes pins it — the coarse-granularity store's
    // worst case, where (len, mtime) cannot see the change)
    val markerP = new org.apache.hadoop.fs.Path(s"$src/_resume_floor_b")
    val mtime0 = fs.getFileStatus(markerP).getModificationTime
    put("_resume_floor_b", "52".getBytes("UTF-8"))
    fs.setTimes(markerP, mtime0, -1)

    val incr = tmpDir("mk-incr")
    val rep = StateBackup.backupIncremental(spark, Seq(src), incr, base)
    assert(rep.copiedFiles === 1L,
      "the marker copies despite its unchanged (len, mtime); the data " +
        "file rides as a chain pointer")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$incr/0/_resume_floor_b")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$incr/0/part-uuid1.parquet")))

    // restore from the incremental carries the NEW marker bytes — the
    // stale-pointer bake-in the always-copy rule prevents
    fs.delete(srcP, true)
    StateBackup.restore(spark, incr)
    val in = fs.open(markerP)
    val got = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(got === "52")
  }

  test("scheduled backups with retention: auto full/incremental cadence, chain cap, chain-aware pruning") {
    val sA = tmpDir("auto-state"); val root = tmpDir("auto-root")
    def fold(id: Long, g: String, v: Long): Unit =
      IncrementalExtrema.processBatch(Seq((g, v, 1L)).toDF("g", "v", "w"),
        sA, id, numBuckets = 4)
    def view(dir: String): Set[(String, Long, Long, Long)] =
      IncrementalExtrema.view(spark, dir)
        .as[(String, Long, Long, Long)].collect().toSet

    // seed several groups so later single-group folds leave untouched
    // parquet buckets for the incremental to point at (markers always
    // copy, so an incremental's saving shows only on data files)
    IncrementalExtrema.processBatch(
      Seq(("g1", 5L, 1L), ("g3", 2L, 1L), ("g4", 4L, 1L), ("g5", 6L, 1L))
        .toDF("g", "v", "w"), sA, 0L, numBuckets = 4)
    val (d0, r0) = StateBackup.backupAuto(spark, Seq(sA), root, 0L, maxChain = 2)
    assert(r0.copiedFiles === r0.files, "first backup is a full")
    assert(StateBackup.chainDepth(spark, d0) === 1)
    fold(1L, "g1", 7L)
    val (d1, r1) = StateBackup.backupAuto(spark, Seq(sA), root, 1L, maxChain = 2)
    assert(r1.copiedFiles < r1.files, "second chains incrementally to the full")
    assert(StateBackup.chainDepth(spark, d1) === 2)
    fold(2L, "g2", 3L)
    val (d2, r2) = StateBackup.backupAuto(spark, Seq(sA), root, 2L, maxChain = 2)
    assert(r2.copiedFiles === r2.files, "chain at maxChain re-anchors with a FULL")
    assert(StateBackup.chainDepth(spark, d2) === 1)
    val v2 = view(sA)
    fold(3L, "g2", 9L)
    val (d3, r3) = StateBackup.backupAuto(spark, Seq(sA), root, 3L, maxChain = 2)
    assert(r3.copiedFiles < r3.files)
    val v3 = view(sA)

    // a rewound/duplicate id must refuse, not silently re-chain
    intercept[IllegalArgumentException] {
      StateBackup.backupAuto(spark, Seq(sA), root, 3L)
    }

    // retention keep=2: b3 (kept) chains to b2 (kept anyway); b0/b1 go
    val deleted = StateBackup.pruneBackups(spark, root, keep = 2)
    assert(deleted === Seq(d0, d1))
    assert(StateBackup.listBackups(spark, root) === Seq(d2, d3))
    // every kept point still restores exactly
    val c2 = tmpDir("auto-c2"); val c3 = tmpDir("auto-c3")
    StateBackup.restore(spark, d2, over = Seq(c2))
    StateBackup.restore(spark, d3, over = Seq(c3))
    assert(view(c2) === v2)
    assert(view(c3) === v3)
    assert(v2 != v3)

    // keep=1 with an incremental newest: its base SURVIVES (chain-aware)
    assert(StateBackup.pruneBackups(spark, root, keep = 1) === Nil,
      "b2 is b3's base — retention must not delete it")
    assert(StateBackup.verify(spark, d3, deep = true))

    // consolidate the newest chain into a SYNTHETIC FULL inside the
    // root: later incrementals chain onto it (recorded source mtimes
    // carried over), and the old chain becomes prunable
    val d4 = s"$root/b000000000004"
    val rc = StateBackup.consolidate(spark, d3, d4)
    assert(rc.files === r3.files && StateBackup.chainDepth(spark, d4) === 1)
    assert(StateBackup.verify(spark, d4, deep = true))
    fold(5L, "g1", 11L)
    val v5 = view(sA)
    val (d5, r5) = StateBackup.backupAuto(spark, Seq(sA), root, 5L, maxChain = 2)
    assert(r5.copiedFiles < r5.files,
      "the next incremental chains onto the consolidated full")
    assert(StateBackup.pruneBackups(spark, root, keep = 1) === Seq(d2, d3),
      "consolidation freed the old chain for retention")
    val c5 = tmpDir("auto-c5")
    StateBackup.restore(spark, d5, over = Seq(c5))
    assert(view(c5) === v5)
  }

  test("in-flight refusal: checkpoint-manager temp orphans allowlisted, crashed-restore staging refused") {
    val d = tmpDir("ckpt-allow")
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(("a", 1L)).toDF("g", "v").write.parquet(s"$d/t")
    // a crashed streaming checkpoint's rename-based commit leaves
    // `.<name>.<uuid>.tmp` orphans — an IDLE deployment may carry them
    // forever, so they must not force-gate its backups
    val orphan = new org.apache.hadoop.fs.Path(
      s"$d/t/.2.delta.${java.util.UUID.randomUUID()}.tmp")
    fs.create(orphan, true).close()
    assert(StateBackup.inFlightArtifacts(spark, d).isEmpty)
    val bk = tmpDir("ckpt-allow-bk")
    StateBackup.backup(spark, Seq(d), bk) // no force needed
    assert(StateBackup.verify(spark, bk, deep = true))

    // a crashed RESTORE's staging dir IS in-flight (half-swapped state)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$d/t.restoring"))
    val ex = intercept[IllegalArgumentException] {
      StateBackup.backup(spark, Seq(d), tmpDir("ckpt-allow-bk2"))
    }
    assert(ex.getMessage.contains(".restoring"))
    // a PLAIN .tmp (engine swap leftover) still refuses
    fs.delete(new org.apache.hadoop.fs.Path(s"$d/t.restoring"), true)
    fs.create(new org.apache.hadoop.fs.Path(s"$d/t/part.tmp"), true).close()
    intercept[IllegalArgumentException] {
      StateBackup.backup(spark, Seq(d), tmpDir("ckpt-allow-bk3"))
    }

    // a restore-to-original crashed in the aside-swap window leaves the
    // STATE DIR MISSING with .restoring/.replaced SIBLINGS — that must
    // still gate the next backup (recording the missing dir as an empty
    // tree would let retention later prune the good backups)
    val gone = tmpDir("ckpt-gone-state")
    fs.delete(new org.apache.hadoop.fs.Path(gone), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$gone.restoring"))
    assert(StateBackup.inFlightArtifacts(spark, gone).nonEmpty)
    intercept[IllegalArgumentException] {
      StateBackup.backup(spark, Seq(gone), tmpDir("ckpt-gone-bk"))
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$gone.restoring"), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$gone.replaced"))
    assert(StateBackup.inFlightArtifacts(spark, gone).nonEmpty)
    fs.delete(new org.apache.hadoop.fs.Path(s"$gone.replaced"), true)
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
