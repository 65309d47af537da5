package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** View-over-view maintenance (R164): a derived keyed table recomputed
  * each batch for ONLY the keys the base views' changelogs touched
  * must equal the full per-key recompute over the base views after
  * every batch — through base retractions that move keys, empty them
  * on one side, and empty them everywhere (the row-drop path). */
class DerivedViewSpec extends SparkTestBase {
  import spark.implicits._

  private val dSchema = StructType(Seq(StructField("g", StringType),
    StructField("rev", LongType), StructField("purchases", LongType),
    StructField("views", LongType)))

  // two independently-maintained base views over the SAME segment key:
  // A = revenue + purchase count per segment; B = view count per segment
  private def foldBase(state: String, id: Long,
      facts: Seq[(Long, Long, Long)], dims: Seq[(Long, String)]): Unit =
    IncrementalJoinAgg.processBatch(
      facts.toDF("jk", "id", "m"), "jk", "id", "m",
      dims.toDF("jk", "g"), "jk", "g", state, id, numBuckets = 4)

  test("derived conversion view ≡ per-key recompute after every batch") {
    val sA = tmpDir("dv-a"); val sB = tmpDir("dv-b"); val sD = tmpDir("dv-d")

    def roll(id: Long): Unit = {
      // touched = union of the bases' changelog keys for THIS batch
      val touched = IncrementalJoinAgg.changelog(spark, sA)
        .filter(col("batch") === id).select("g")
        .unionByName(IncrementalJoinAgg.changelog(spark, sB)
          .filter(col("batch") === id).select("g"))
        .distinct()
      // derived rows: bucket-prunable post-state reads of both bases
      val a = IncrementalJoinAgg.view(spark, sA)
        .join(touched, Seq("g"), "left_semi")
        .select(col("g"), col("total").as("rev"),
          col("pairs").as("purchases"))
      val b = IncrementalJoinAgg.view(spark, sB)
        .join(touched, Seq("g"), "left_semi")
        .select(col("g"), col("pairs").as("views"))
      DerivedView.processBatch(spark, touched, a.join(b, Seq("g"), "full_outer"),
        sD, id, numBuckets = 4)
    }
    def served(): Map[String, (Option[Long], Option[Long], Option[Long])] =
      DerivedView.view(spark, sD, dSchema)
        .as[(String, Option[Long], Option[Long], Option[Long])].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def expected(): Map[String, (Option[Long], Option[Long], Option[Long])] = {
      val a = IncrementalJoinAgg.view(spark, sA)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val b = IncrementalJoinAgg.view(spark, sB)
        .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
      (a.keySet ++ b.keySet).map { g =>
        g -> (a.get(g).map(_._1), a.get(g).map(_._2), b.get(g))
      }.toMap
    }

    // batch 0: both bases fill; derived = full outer of their keys
    foldBase(sA, 0L, Seq((10L, 1L, 100L), (20L, 2L, 30L)),
      Seq((10L, "s1"), (20L, "s2")))
    foldBase(sB, 0L, Seq((10L, 1L, 1L), (10L, 2L, 1L), (30L, 3L, 1L)),
      Seq((10L, "s1"), (30L, "s3")))
    roll(0L)
    assert(served() === expected())
    assert(served()("s3") === ((None, None, Some(1L))))
    // batch 1: a re-key in A empties s2 there — its derived row must
    // update (A side nulls); s1 untouched in B stays
    foldBase(sA, 1L, Nil, Seq((20L, "s1")))
    foldBase(sB, 1L, Nil, Nil)
    roll(1L)
    assert(served() === expected())
    assert(!served().contains("s2"), "s2 vanished from BOTH bases -> dropped")
    // batch 2: empty s3 in B too — the derived row DROPS entirely
    foldBase(sA, 2L, Nil, Nil)
    foldBase(sB, 2L, Nil, Seq((30L, "s1")))
    roll(2L)
    assert(served() === expected())
    assert(!served().contains("s3"))
    // replay the last derived fold: a strict no-op (staged protocol)
    val before = served()
    roll(2L)
    assert(served() === before, "replay changed the derived view")
    // point read prunes to the named keys
    val p = DerivedView.viewFor(spark, sD, Seq("s1"), dSchema, numBuckets = 4)
      .as[(String, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(p === served().filter(_._1 == "s1"))
  }

  test("derived view over a REPLACE-per-key base (near-dup labels): merge, forget, replay") {
    // r12: the monotone REPLACE views have no changelog — the snapshot
    // diff (the versioned ship's device) is the trigger instead. A
    // cluster-SIZE view maintained over the near-dup id→label base must
    // track a cross-cluster merge (old label drops via the diff's old
    // side) and a forget (labels raise to the next survivor).
    val nd = tmpDir("dv-nd"); val sD = tmpDir("dv-nd-d")
    val mk = tmpDir("dv-nd-mk")
    val sizeSchema = StructType(Seq(StructField("g", LongType),
      StructField("n_members", LongType)))
    def rng(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")
    def fold(b: Seq[(Long, String)], id: Long): Unit =
      IncrementalNearDup.processBatch(b.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.6, stateDir = nd, batchId = id)
    def roll(id: Long, commit: Boolean = true): Unit = {
      val base = IncrementalNearDup.labels(spark, nd)
      val diff = DerivedView.replaceBaseDiff(base, mk, "labels")
      // BOTH sides of every moved doc: a merged-away label is touched
      // through its docs' OLD rows and found memberless -> row drops
      val touched = diff.select(col("label").as("g")).distinct()
      val rows = base
        .join(touched.select(col("g").as("label")), Seq("label"), "left_semi")
        .groupBy("label").agg(count(lit(1)).as("n_members"))
        .select(col("label").as("g"), col("n_members"))
      DerivedView.processBatch(spark, touched, rows, sD, id, numBuckets = 4)
      if (commit) DerivedView.commitReplaceBase(base, mk, "labels")
    }
    def served(): Map[Long, Long] =
      DerivedView.view(spark, sD, sizeSchema).as[(Long, Long)].collect().toMap
    def expected(): Map[Long, Long] =
      IncrementalNearDup.labels(spark, nd)
        .groupBy("label").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap

    fold(Seq(30L -> rng(0, 40), 31L -> (rng(0, 40) + " extra")), 0L)
    roll(0L)
    assert(served() === expected() && served() === Map(30L -> 2L))
    fold(Seq(40L -> rng(10, 50), 41L -> (rng(10, 50) + " other")), 1L)
    roll(1L)
    assert(served() === expected() && served() === Map(30L -> 2L, 40L -> 2L))
    // the bridge merges B INTO A: label 40 vanishes, label 30 grows —
    // and the derived fold first runs WITHOUT its snapshot commit (the
    // crash window), then replays: the diff recomputes identically and
    // the stamped buckets skip
    fold(Seq(35L -> rng(5, 45)), 2L)
    roll(2L, commit = false)
    assert(served() === expected() && served() === Map(30L -> 5L))
    roll(2L) // crash-replay of the SAME derived batch, then commit
    assert(served() === Map(30L -> 5L))
    roll(3L) // committed base, empty diff: a strict no-op
    assert(served() === Map(30L -> 5L))
    // forget the representative: the component re-derives under the
    // next survivor; label 30 drops, label 31 carries the 4 remaining
    IncrementalNearDup.forget(spark, nd, Seq(30L).toDF("doc_id"),
      threshold = 0.6, opId = 100L)
    roll(4L)
    assert(served() === expected() && served() === Map(31L -> 4L))
  }

  test("moved-log trigger (R176): O(moved) derived view ≡ recompute through merge, crash replay, forget") {
    // the same cluster-SIZE view as the snapshot-diff test, but the
    // trigger is the base fold's staged moved-keys artifact — no
    // snapshot, no O(view) anti-joins; consumption is at-least-once
    // (re-consuming recomputes post-state rows, a no-op)
    val nd = tmpDir("ml-nd"); val sD = tmpDir("ml-d"); val md = tmpDir("ml-mv")
    val sizeSchema = StructType(Seq(StructField("g", LongType),
      StructField("n_members", LongType)))
    val movedSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("old_label", LongType), StructField("new_label", LongType)))
    def rng(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")
    def fold(b: Seq[(Long, String)], id: Long): Unit =
      IncrementalNearDup.processBatch(b.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
        threshold = 0.6, stateDir = nd, batchId = id, movedDir = Some(md))
    def roll(id: Long, sweep: Boolean = true): Unit = {
      val consumed = MovedLog.pendingArtifacts(spark, md)
      val moved = MovedLog.pending(spark, md, movedSchema)
      val touched = moved.select(col("old_label").as("g"))
        .unionByName(moved.select(col("new_label").as("g")))
        .filter(col("g").isNotNull).distinct()
      val rows = IncrementalNearDup.labels(spark, nd)
        .join(touched.select(col("g").as("label")), Seq("label"), "left_semi")
        .groupBy("label").agg(count(lit(1)).as("n_members"))
        .select(col("label").as("g"), col("n_members"))
      DerivedView.processBatch(spark, touched, rows, sD, id, numBuckets = 4)
      if (sweep) MovedLog.sweep(spark, md, consumed)
    }
    def served(): Map[Long, Long] =
      DerivedView.view(spark, sD, sizeSchema).as[(Long, Long)].collect().toMap
    def expected(): Map[Long, Long] =
      IncrementalNearDup.labels(spark, nd)
        .groupBy("label").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap

    fold(Seq(30L -> rng(0, 40), 31L -> (rng(0, 40) + " extra")), 0L)
    roll(0L)
    assert(served() === expected() && served() === Map(30L -> 2L))
    fold(Seq(40L -> rng(10, 50), 41L -> (rng(10, 50) + " other")), 1L)
    roll(1L)
    assert(served() === expected() && served() === Map(30L -> 2L, 40L -> 2L))
    // the bridge merges B INTO A — the moved log names BOTH coordinates
    // of every moved doc (40/41: 40 -> 30) and the bridge's first-seen
    // row (old null)
    fold(Seq(35L -> rng(5, 45)), 2L)
    val mv = MovedLog.pending(spark, md, movedSchema)
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(mv === Map(35L -> (None, Some(30L)), 40L -> (Some(40L), Some(30L)),
      41L -> (Some(40L), Some(30L))))
    // crash window: derived fold commits, sweep does NOT run
    roll(2L, sweep = false)
    assert(served() === expected() && served() === Map(30L -> 5L))
    assert(MovedLog.pendingArtifacts(spark, md).nonEmpty,
      "un-swept artifacts must survive the fold")
    // replay: same artifacts re-consumed, stamped buckets skip, THEN sweep
    roll(2L)
    assert(served() === Map(30L -> 5L))
    assert(MovedLog.pendingArtifacts(spark, md).isEmpty)
    roll(3L) // nothing pending: a strict no-op
    assert(served() === Map(30L -> 5L))
    // forget the representative through the SAME log: label 30 drops
    // via the forgotten doc's old coordinate, survivors re-derive at 31
    IncrementalNearDup.forget(spark, nd, Seq(30L).toDF("doc_id"),
      threshold = 0.6, opId = 100L, movedDir = Some(md))
    roll(4L)
    assert(served() === expected() && served() === Map(31L -> 4L))
    assert(MovedLog.pendingArtifacts(spark, md).isEmpty)
    // a crash mid-stageArtifact leaves a '_moved_*.tmp' partial — it is
    // NOT pending (a consumer reading it would see truncated parquet)
    val fs = new org.apache.hadoop.fs.Path(md)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$md/_moved_b9.tmp"))
    assert(MovedLog.pendingArtifacts(spark, md).isEmpty,
      "a .tmp staging leftover must not be consumable")
  }

  test("moved-log trigger over FUNNEL levels (R176, the behavioral member): histogram ≡ recompute") {
    // a per-LEVEL user histogram (the conversion dashboard) maintained
    // over the funnel's REPLACE-per-user levels — the fold logs each
    // user's pre/post level, so the derived view touches only moved
    // levels (old decrements drop emptied rows, new increments land)
    val fn = tmpDir("ml-fn"); val sD = tmpDir("ml-fn-d"); val md = tmpDir("ml-fn-mv")
    val histSchema = StructType(Seq(StructField("g", LongType),
      StructField("n_users", LongType)))
    val movedSchema = StructType(Seq(StructField("user", LongType),
      StructField("old_level", IntegerType), StructField("new_level", IntegerType)))
    def fold(rows: Seq[(Long, Long, String)], id: Long): Unit =
      IncrementalFunnel.processBatch(rows.toDF("user", "t", "typ"),
        "user", "t", "typ", steps = Seq("a", "b", "c"), windowUs = 100L,
        stateDir = fn, batchId = id, movedDir = Some(md))
    def roll(id: Long): Unit = {
      val consumed = MovedLog.pendingArtifacts(spark, md)
      val moved = MovedLog.pending(spark, md, movedSchema)
      val touched = moved.select(col("old_level").cast("long").as("g"))
        .unionByName(moved.select(col("new_level").cast("long").as("g")))
        .filter(col("g").isNotNull).distinct()
      val rows = IncrementalFunnel.levels(spark, fn)
        .join(touched.select(col("g").cast("int").as("level")),
          Seq("level"), "left_semi")
        .groupBy("level").agg(count(lit(1)).as("n_users"))
        .select(col("level").cast("long").as("g"), col("n_users"))
      DerivedView.processBatch(spark, touched, rows, sD, id, numBuckets = 4)
      MovedLog.sweep(spark, md, consumed)
    }
    def served(): Map[Long, Long] =
      DerivedView.view(spark, sD, histSchema).as[(Long, Long)].collect().toMap
    def expected(): Map[Long, Long] =
      IncrementalFunnel.levels(spark, fn)
        .groupBy("level").agg(count(lit(1)).as("n"))
        .as[(Int, Long)].collect().map { case (l, n) => l.toLong -> n }.toMap

    // user 1 anchors (level 1); user 2 reaches level 2
    fold(Seq((1L, 10L, "a"), (2L, 10L, "a"), (2L, 20L, "b")), 0L)
    roll(0L)
    assert(served() === expected() && served() === Map(1L -> 1L, 2L -> 1L))
    // user 1 advances 1 -> 3: level 1 empties (row DROPS via the old
    // coordinate), level 3 appears
    fold(Seq((1L, 30L, "b"), (1L, 40L, "c")), 1L)
    roll(1L)
    assert(served() === expected() && served() === Map(2L -> 1L, 3L -> 1L))
    // a no-move batch (duplicate event): empty artifact, derived no-op
    fold(Seq((2L, 20L, "b")), 2L)
    roll(2L)
    assert(served() === expected() && served() === Map(2L -> 1L, 3L -> 1L))
    // a NULL user is a real funnel key (the fold routes and serves it)
    // — its level move must reach the artifact through the null-safe
    // joins, or the level-1 row would silently never appear
    IncrementalFunnel.processBatch(
      Seq((Option.empty[Long], 50L, "a")).toDF("user", "t", "typ"),
      "user", "t", "typ", steps = Seq("a", "b", "c"), windowUs = 100L,
      stateDir = fn, batchId = 3L, movedDir = Some(md))
    roll(3L)
    assert(served() === expected() &&
      served() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("movedDir refuses ad-hoc (un-stamped) folds and forgets (ADVICE r13)") {
    val nd = tmpDir("ml-adhoc"); val md = tmpDir("ml-adhoc-mv")
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      IncrementalNearDup.processBatch(docs, "doc_id", "text",
        threshold = 0.6, stateDir = nd, batchId = -1L, movedDir = Some(md))
    }
    intercept[IllegalArgumentException] {
      IncrementalFunnel.processBatch(
        Seq((1L, 10L, "a")).toDF("user", "t", "typ"),
        "user", "t", "typ", steps = Seq("a", "b"), windowUs = 100L,
        stateDir = tmpDir("ml-adhoc-fn"), batchId = -1L, movedDir = Some(md))
    }
    // the fold still runs stamped, and forget refuses the ad-hoc op id
    IncrementalNearDup.processBatch(docs, "doc_id", "text",
      threshold = 0.6, stateDir = nd, batchId = 0L, movedDir = Some(md))
    intercept[IllegalArgumentException] {
      IncrementalNearDup.forget(spark, nd, Seq(1L).toDF("doc_id"),
        threshold = 0.6, opId = -1L, movedDir = Some(md))
    }
  }

  test("artifact staging refuses a partially-applied replay window (ADVICE r13)") {
    val base = tmpDir("art-guard"); val md = tmpDir("art-guard-mv")
    val path = s"$base/t"
    val art = s"$md/_moved_b5"
    def fold(batchId: Long, artifacts: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)]): Unit =
      MvPipeline.upsertBucketedStaged(spark, path,
        computeDelta = Seq((1L, 10L), (2L, 20L)).toDF("g", "m"),
        mergeFn = (old, inc) => old.unionByName(inc)
          .groupBy("g").agg(sum("m").as("m")),
        batchId = batchId, numBuckets = 4, bucketKeys = Seq("g"),
        artifacts = artifacts)
    // batch 5 applies fully WITHOUT an artifact (delta swept, buckets
    // stamped 5); then a hand-restored staged delta + a NEW artifact
    // config simulates the crash-mid-apply-then-reconfigure window
    fold(5L, Nil)
    Seq((1L, 10L), (2L, 20L)).toDF("g", "m").write
      .parquet(s"$path/_delta_b5")
    intercept[IllegalArgumentException] { fold(5L, Seq(art -> identity)) }
    // the artifact was NOT staged by the refused call
    assert(!new java.io.File(art).exists())
    // a fresh batch id (no bucket stamped 6) stages its artifact fine
    fold(6L, Seq(s"$md/_moved_b6" -> identity))
    assert(new java.io.File(s"$md/_moved_b6").exists())
  }

  test("bucket-pruned replace-base diff (R178): ≡ the full diff, unchanged buckets never read, crash drills") {
    // base = a bucketed REPLACE-per-key table that cannot name its
    // moved keys (DerivedView's own state is exactly that shape);
    // consumer = a parity histogram over its values, maintained through
    // the BUCKETED diff and compared to the full recompute every batch
    val sB = tmpDir("bd-base"); val mk = tmpDir("bd-mk"); val sD = tmpDir("bd-d")
    val bSchema = StructType(Seq(StructField("g", StringType),
      StructField("v", LongType)))
    val histSchema = StructType(Seq(StructField("g", LongType),
      StructField("n_keys", LongType)))
    val basePath = s"$sB/derived"
    def foldBase(rows: Seq[(String, Long)], id: Long): Unit =
      DerivedView.processBatch(spark,
        rows.map(_._1).toDF("g"), rows.toDF("g", "v"), sB, id, numBuckets = 4)
    def dropKey(g: String, id: Long): Unit =
      DerivedView.processBatch(spark, Seq(g).toDF("g"),
        Seq.empty[(String, Long)].toDF("g", "v"), sB, id, numBuckets = 4)
    def baseView() = DerivedView.view(spark, sB, bSchema)
    def diffBucketed() = DerivedView.replaceBaseDiffBucketed(
      spark, basePath, mk, "base", bSchema)
    def roll(id: Long, commit: Boolean = true): Unit = {
      val diff = diffBucketed()
      val touched = diff.select(pmod(col("v"), lit(2L)).as("g"))
        .filter(col("g").isNotNull).distinct()
      val rows = baseView()
        .join(touched.select(col("g").as("p")),
          pmod(col("v"), lit(2L)) === col("p"), "left_semi")
        .groupBy(pmod(col("v"), lit(2L)).as("g"))
        .agg(count(lit(1)).as("n_keys"))
      DerivedView.processBatch(spark, touched, rows, sD, id, numBuckets = 4)
      if (commit) DerivedView.commitReplaceBaseBucketed(spark, basePath, mk, "base")
    }
    def served(): Map[Long, Long] =
      DerivedView.view(spark, sD, histSchema).as[(Long, Long)].collect().toMap
    def expected(): Map[Long, Long] =
      baseView().groupBy(pmod(col("v"), lit(2L)).as("g"))
        .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap

    // batch 0: enough keys to touch every bucket; the first diff is
    // all-new and equals the full-device diff on the same state
    val k0 = (0 until 12).map(i => s"k$i" -> i.toLong)
    foldBase(k0, 0L)
    val full = DerivedView.replaceBaseDiff(baseView(), tmpDir("bd-mk2"), "x")
      .as[(String, Long, String)].collect().toSet
    assert(diffBucketed().as[(String, Long, String)].collect().toSet === full)
    roll(0L)
    assert(served() === expected())
    // batch 1: ONE key moves parity — only its bucket's files changed,
    // so the prune set is a strict subset of the 4 buckets
    foldBase(Seq("k3" -> 30L), 1L)
    val changed = DerivedView.replaceBaseChangedBuckets(spark, basePath, mk, "base")
    assert(changed.nonEmpty && changed.size < 4,
      s"one-key batch must not flag every bucket: $changed")
    val d1 = diffBucketed().as[(String, Long, String)].collect().toSet
    assert(d1 === Set(("k3", 30L, "new"), ("k3", 3L, "old")))
    roll(1L)
    assert(served() === expected())
    // no-change batch: zero changed buckets, empty diff, derived no-op
    assert(DerivedView.replaceBaseChangedBuckets(spark, basePath, mk, "base").isEmpty)
    assert(diffBucketed().isEmpty)
    // crash BEFORE the snapshot commit: the diff recomputes identically
    foldBase(Seq("k4" -> 41L), 2L)
    val d2a = diffBucketed().as[(String, Long, String)].collect().toSet
    roll(2L, commit = false)
    assert(diffBucketed().as[(String, Long, String)].collect().toSet === d2a,
      "pre-commit replay must see the identical diff")
    roll(2L) // replay: stamped derived buckets skip, then commit
    assert(served() === expected())
    // crash MID-commit, protocol-faithful: the derived fold for batch 3
    // COMMITS first (commit runs only after it), then the commit dies
    // after swapping ONE changed bucket into the snapshot (the
    // fingerprint file has NOT advanced) — the replay re-diffs the SAME
    // recorded prune set, the swapped bucket's contribution is now a
    // harmless empty subset, the stamped derived buckets skip, and the
    // completed commit converges
    foldBase(Seq("k5" -> 50L, "k6" -> 61L), 3L)
    val pend = DerivedView.replaceBaseChangedBuckets(spark, basePath, mk, "base")
    assert(pend.nonEmpty)
    roll(3L, commit = false) // the derived fold commits; snapshot untouched
    assert(served() === expected())
    val b0 = pend.head
    spark.read.parquet(s"$basePath/bucket=$b0")
      .write.mode("overwrite").parquet(s"$mk/_snapbkt_base/bucket=$b0.swp")
    val fsX = new org.apache.hadoop.fs.Path(mk)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsX.delete(new org.apache.hadoop.fs.Path(s"$mk/_snapbkt_base/bucket=$b0"), true)
    require(fsX.rename(
      new org.apache.hadoop.fs.Path(s"$mk/_snapbkt_base/bucket=$b0.swp"),
      new org.apache.hadoop.fs.Path(s"$mk/_snapbkt_base/bucket=$b0")))
    assert(DerivedView.replaceBaseChangedBuckets(spark, basePath, mk, "base")
      === pend, "mid-commit crash must not shrink the recorded prune set")
    roll(3L) // replay: subset diff, stamped derived buckets skip, commit
    assert(served() === expected())
    assert(DerivedView.replaceBaseChangedBuckets(spark, basePath, mk, "base").isEmpty)
    // a key DROP rewrites its bucket — the old row diffs out and the
    // emptied parity row drops from the derived view
    dropKey("k5", 4L)
    val d4 = diffBucketed().as[(String, Long, String)].collect().toSet
    assert(d4 === Set(("k5", 50L, "old")))
    roll(4L)
    assert(served() === expected())
    // a stale '.tmp' from a crash mid-copy is swept by the next
    // diff/commit's recovery pass — it must not linger forever (it
    // would permanently trip StateBackup's in-flight refusal)
    fsX.mkdirs(new org.apache.hadoop.fs.Path(s"$mk/_snapbkt_base/bucket=0.tmp"))
    diffBucketed().count()
    assert(!new java.io.File(s"$mk/_snapbkt_base/bucket=0.tmp").exists(),
      "stale .tmp must be swept by recovery")
  }
}
