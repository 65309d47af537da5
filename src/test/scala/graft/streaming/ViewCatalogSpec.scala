package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.sinks.{ChangelogShip, JdbcClickHouseSink}

/** Catalog orchestration (r12): one CDC source bound to two base views
  * (join-agg revenue, sessions), a derived view and a rollup lattice
  * over the first base's changelog, and an external ship — run under
  * ONE batch-id domain by [[ViewCatalog]]. After every batch each view
  * must equal its independent fold (same slices, no catalog) — checked
  * by content AND by [[MvPipeline.stateDigest]] — and a crash between
  * stages must leave the completion floor unmoved so the replay re-runs
  * the cascade and converges; a fully-applied batch must skip
  * wholesale. */
class ViewCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private val gap = 100L
  private val dSchema = StructType(Seq(StructField("g", StringType),
    StructField("total", LongType), StructField("pairs", LongType)))

  // CDC rows: (tbl, jk, id, m, g, t) — facts/dims feed the revenue
  // view, ev/evdel feed sessions; one frame, stages slice it
  private type Cdc = (String, Long, Long, Long, String, Long)
  private def cdc(rows: Seq[Cdc]) =
    rows.toDF("tbl", "jk", "id", "m", "g", "t")

  private def foldRevenue(state: String)(b: org.apache.spark.sql.DataFrame,
      id: Long): Unit =
    IncrementalJoinAgg.processBatch(
      b.filter(col("tbl") === "fact").select("jk", "id", "m"),
      "jk", "id", "m",
      b.filter(col("tbl") === "dim").select("jk", "g"),
      "jk", "g", state, id, numBuckets = 4)

  private def foldSessions(state: String)(b: org.apache.spark.sql.DataFrame,
      id: Long): Unit =
    IncrementalSessions.processBatch(
      b.filter(col("tbl") === "ev").select(col("id"), col("t"),
        col("jk").as("k")),
      b.filter(col("tbl") === "evdel").select(col("id"), col("jk").as("k")),
      gap = gap, stateDir = state, batchId = id, numBuckets = 4)

  private def foldDerived(base: String, state: String)(id: Long): Unit = {
    val touched = IncrementalJoinAgg.changelog(spark, base)
      .filter(col("batch") === id).select("g").distinct()
    val rows = IncrementalJoinAgg.view(spark, base)
      .join(touched, Seq("g"), "left_semi")
    DerivedView.processBatch(spark, touched, rows, state, id, numBuckets = 4)
  }

  private def foldRollup(base: String, state: String)(id: Long): Unit =
    RollupMaintenance.processBatch(
      IncrementalJoinAgg.changelog(spark, base).filter(col("batch") === id)
        .select(col("g"), col("dtotal").as("m"), col("dpairs").as("c")),
      state, Seq(Seq(0), Seq()), id, numBuckets = 4)

  private def derbyUrl(db: String) = s"jdbc:derby:memory:$db;create=true"
  private def folded(db: String, table: String): Map[String, (Long, Long)] =
    spark.read.format("jdbc").option("url", derbyUrl(db))
      .option("dbtable", table).load().distinct()
      .groupBy("g").agg(sum("dtotal").as("t"), sum("dpairs").as("p"))
      .filter(col("p") > 0)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def viewA(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAgg.view(spark, state)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  private def viewS(state: String): Set[(Long, Long, Long, Long)] =
    IncrementalSessions.view(spark, state)
      .as[(Long, Long, Long, Long)].collect().toSet
  private def viewD(state: String): Map[String, (Long, Long)] =
    DerivedView.view(spark, state, dSchema)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  private def viewR(state: String, set: Seq[Int]): Map[String, (Long, Long)] =
    RollupMaintenance.view(spark, state, set)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def digest(df: org.apache.spark.sql.DataFrame): Long =
    MvPipeline.stateDigest(df).as[Long].collect().head

  test("catalog: cascade ≡ independent folds; crash mid-cascade converges; floor skips replays") {
    val sA = tmpDir("vc-a"); val sB = tmpDir("vc-b")
    val sD = tmpDir("vc-d"); val sR = tmpDir("vc-r")
    val cat = tmpDir("vc-cat")
    val db = "vcat1"
    val sink = new JdbcClickHouseSink(derbyUrl(db), "app", "")

    val catalog = ViewCatalog.Catalog(
      bases = Seq(
        ViewCatalog.Stage("revenue")(foldRevenue(sA)),
        ViewCatalog.Stage("sessions")(foldSessions(sB))),
      derived = Seq(
        ViewCatalog.Stage("avg")((_, id) => foldDerived(sA, sD)(id)),
        ViewCatalog.Stage("rollup")((_, id) => foldRollup(sA, sR)(id))),
      ships = Seq(ViewCatalog.Stage("ship")((_, _) =>
        ChangelogShip.ship(IncrementalJoinAgg.changelog(spark, sA),
          "batch", sink, "cat_cl", sA))))

    // independent twin: the SAME slices folded directly, no catalog
    val tA = tmpDir("vc-ta"); val tB = tmpDir("vc-tb")
    val tD = tmpDir("vc-td"); val tR = tmpDir("vc-tr")
    def twin(b: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      foldRevenue(tA)(b, id); foldSessions(tB)(b, id)
      foldDerived(tA, tD)(id); foldRollup(tA, tR)(id)
    }
    def assertConverged(): Unit = {
      assert(viewA(sA) === viewA(tA))
      assert(viewS(sB) === viewS(tB))
      assert(viewD(sD) === viewD(tD))
      assert(viewD(sD) === viewA(sA), "derived ≡ per-key recompute of base")
      assert(viewR(sR, Seq(0)) === viewR(tR, Seq(0)))
      assert(viewR(sR, Seq(0)) === viewA(sA), "depth-1 rollup ≡ base view")
      assert(folded(db, "cat_cl") === viewA(sA), "shipped table ≡ view")
      // order-free digests agree table-wise (the anti-entropy check)
      assert(digest(IncrementalJoinAgg.view(spark, sA)) ===
        digest(IncrementalJoinAgg.view(spark, tA)))
      assert(digest(IncrementalSessions.view(spark, sB)) ===
        digest(IncrementalSessions.view(spark, tB)))
      assert(digest(DerivedView.view(spark, sD, dSchema)) ===
        digest(DerivedView.view(spark, tD, dSchema)))
    }

    // batch 0: both bases fill; user 7 gets two gap-separated sessions
    val b0 = cdc(Seq(("fact", 10L, 1L, 100L, "", 0L),
      ("fact", 20L, 2L, 30L, "", 0L),
      ("dim", 10L, 0L, 0L, "s1", 0L), ("dim", 20L, 0L, 0L, "s2", 0L),
      ("ev", 7L, 1L, 0L, "", 0L), ("ev", 7L, 2L, 0L, "", 250L)))
    assert(ViewCatalog.runBatch(spark, catalog, cat, b0, 0L))
    twin(b0, 0L)
    assertConverged()
    assert(viewA(sA) === Map("s1" -> (100L, 1L), "s2" -> (30L, 1L)))
    assert(viewS(sB).size === 2)

    // batch 1: dim re-key s2→s1 (retraction travels the whole cascade)
    val b1 = cdc(Seq(("dim", 20L, 0L, 0L, "s1", 0L)))
    assert(ViewCatalog.runBatch(spark, catalog, cat, b1, 1L))
    twin(b1, 1L)
    assertConverged()
    assert(viewA(sA) === Map("s1" -> (130L, 2L)))
    assert(viewR(sR, Seq()) === Map("" -> (130L, 2L)))

    // batch 2 CRASHES between stages: bases + derived applied, rollup
    // and ship not — the floor must not advance
    val bomb = catalog.copy(derived = catalog.derived.take(1) :+
      ViewCatalog.Stage("bomb")((_, _) =>
        throw new RuntimeException("injected crash")))
    val b2 = cdc(Seq(("fact", 10L, 3L, 50L, "", 0L),
      ("ev", 7L, 3L, 0L, "", 100L), ("ev", 7L, 4L, 0L, "", 180L)))
    intercept[RuntimeException] {
      ViewCatalog.runBatch(spark, bomb, cat, b2, 2L)
    }
    assert(ViewCatalog.completedFloor(spark, cat) === 1L,
      "crash mid-cascade must leave the floor unmoved")
    assert(viewA(sA)("s1") === ((180L, 3L)), "stages before the crash applied")

    // replay of batch 2 through the FULL catalog: applied stages skip
    // via their own stamps/watermarks, the rest converge (the merged
    // user-7 session — the cross-batch −1/−1/+1 — lands exactly once)
    assert(ViewCatalog.runBatch(spark, catalog, cat, b2, 2L))
    twin(b2, 2L)
    assertConverged()
    assert(viewS(sB) === Set((7L, 0L, 250L, 4L)), "sessions merged")

    // fully-applied replay skips wholesale; nothing moves
    val dA = digest(IncrementalJoinAgg.view(spark, sA))
    assert(!ViewCatalog.runBatch(spark, catalog, cat, b2, 2L))
    assert(digest(IncrementalJoinAgg.view(spark, sA)) === dA)

    // the operational audit is clean catalog-wide
    val violations = Seq(sA, sB, sD, sR).flatMap(d =>
      graft.tools.StateAudit.audit(spark, d))
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("catalog with a REPLACE-base tier: snapshot commits ride AFTER their derived consumers") {
    // R168 inside R170: a near-dup clustering is the base (REPLACE
    // labels, no changelog); a cluster-size derived view folds off the
    // snapshot diff, and the snapshot COMMIT is a `commits`-tier stage
    // — so a crash between the derived fold and the commit replays the
    // identical diff and the stamped buckets skip (the cascade order
    // the runner exists to enforce)
    val nd = tmpDir("vcr-nd"); val sD = tmpDir("vcr-d")
    val mk = tmpDir("vcr-mk"); val cat = tmpDir("vcr-cat")
    val sizeSchema = StructType(Seq(StructField("g", LongType),
      StructField("n_members", LongType)))
    def rng(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")
    def base() = IncrementalNearDup.labels(spark, nd)

    val catalog = ViewCatalog.Catalog(
      bases = Seq(ViewCatalog.Stage("neardup")((b, id) =>
        IncrementalNearDup.processBatch(b, "doc_id", "text",
          shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.6,
          stateDir = nd, batchId = id, numBuckets = 4))),
      derived = Seq(ViewCatalog.Stage("sizes")((_, id) => {
        val diff = DerivedView.replaceBaseDiff(base(), mk, "labels")
        val touched = diff.select(col("label").as("g")).distinct()
        val rows = base()
          .join(touched.select(col("g").as("label")), Seq("label"), "left_semi")
          .groupBy("label").agg(count(lit(1)).as("n_members"))
          .select(col("label").as("g"), col("n_members"))
        DerivedView.processBatch(spark, touched, rows, sD, id, numBuckets = 4)
      })),
      commits = Seq(ViewCatalog.Stage("snap")((_, _) =>
        DerivedView.commitReplaceBase(base(), mk, "labels"))))

    def servedSizes(): Map[Long, Long] =
      DerivedView.view(spark, sD, sizeSchema).as[(Long, Long)].collect().toMap
    def expected(): Map[Long, Long] =
      base().groupBy("label").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap

    val b0 = Seq(30L -> rng(0, 40), 31L -> (rng(0, 40) + " extra"),
      40L -> rng(10, 50), 41L -> (rng(10, 50) + " other"))
      .toDF("doc_id", "text")
    assert(ViewCatalog.runBatch(spark, catalog, cat, b0, 0L))
    assert(servedSizes() === expected() &&
      servedSizes() === Map(30L -> 2L, 40L -> 2L))

    // crash between the derived fold and the snapshot commit, on the
    // batch whose bridge MERGES cluster 40 into 30 — the diff's OLD
    // side is what finds label 40 memberless and drops its row, and
    // the uncommitted snapshot is what makes the replayed diff
    // identical
    val bomb = catalog.copy(commits =
      ViewCatalog.Stage("bomb")((_, _) => throw new RuntimeException("boom"))
        +: catalog.commits)
    val b1 = Seq(35L -> rng(5, 45)).toDF("doc_id", "text")
    intercept[RuntimeException] { ViewCatalog.runBatch(spark, bomb, cat, b1, 1L) }
    assert(ViewCatalog.completedFloor(spark, cat) === 0L)
    assert(servedSizes() === expected() && servedSizes() === Map(30L -> 5L),
      "derived fold before the crash applied the merge")
    // replay through the full catalog: the base fold skips (stamped),
    // the diff recomputes IDENTICALLY against the uncommitted snapshot,
    // the derived fold's stamped buckets skip, and the commit lands
    assert(ViewCatalog.runBatch(spark, catalog, cat, b1, 1L))
    assert(servedSizes() === Map(30L -> 5L))
    // the committed snapshot makes the next batch's diff empty: a
    // no-op batch leaves everything in place
    assert(ViewCatalog.runBatch(spark, catalog, cat,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 2L))
    assert(servedSizes() === Map(30L -> 5L))
  }

  test("concurrentTiers: intra-tier fan-out ≡ serial cascade; crash still holds the floor") {
    val sA = tmpDir("vcc-a"); val sB = tmpDir("vcc-b")
    val sD = tmpDir("vcc-d"); val sR = tmpDir("vcc-r")
    val cat = tmpDir("vcc-cat")
    // serial twin dirs
    val tA = tmpDir("vcc-ta"); val tB = tmpDir("vcc-tb")
    val tD = tmpDir("vcc-td"); val tR = tmpDir("vcc-tr")
    def catalogOf(a: String, b: String, d: String, r: String) =
      ViewCatalog.Catalog(
        bases = Seq(ViewCatalog.Stage("revenue")(foldRevenue(a)),
          ViewCatalog.Stage("sessions")(foldSessions(b))),
        derived = Seq(ViewCatalog.Stage("avg")((_, id) => foldDerived(a, d)(id)),
          ViewCatalog.Stage("rollup")((_, id) => foldRollup(a, r)(id))))
    val conc = catalogOf(sA, sB, sD, sR)
    val twin = catalogOf(tA, tB, tD, tR)
    val catT = tmpDir("vcc-catT")

    val b0 = cdc(Seq(("fact", 10L, 1L, 100L, "", 0L),
      ("fact", 20L, 2L, 30L, "", 0L),
      ("dim", 10L, 0L, 0L, "s1", 0L), ("dim", 20L, 0L, 0L, "s2", 0L),
      ("ev", 7L, 1L, 0L, "", 0L), ("ev", 7L, 2L, 0L, "", 250L)))
    val b1 = cdc(Seq(("dim", 20L, 0L, 0L, "s1", 0L),
      ("ev", 7L, 3L, 0L, "", 100L)))
    Seq(b0 -> 0L, b1 -> 1L).foreach { case (b, id) =>
      assert(ViewCatalog.runBatch(spark, conc, cat, b, id,
        concurrentTiers = true))
      assert(ViewCatalog.runBatch(spark, twin, catT, b, id))
      assert(digest(IncrementalJoinAgg.view(spark, sA)) ===
        digest(IncrementalJoinAgg.view(spark, tA)))
      assert(digest(IncrementalSessions.view(spark, sB)) ===
        digest(IncrementalSessions.view(spark, tB)))
      assert(digest(DerivedView.view(spark, sD, dSchema)) ===
        digest(DerivedView.view(spark, tD, dSchema)))
      assert(viewR(sR, Seq(0)) === viewR(tR, Seq(0)))
    }

    // crash INSIDE a concurrent tier: the pool awaits every stage, the
    // first failure rethrows, the floor stays — and the replay (still
    // concurrent) converges
    val bomb = conc.copy(derived = conc.derived :+
      ViewCatalog.Stage("bomb")((_, _) =>
        throw new RuntimeException("concurrent crash")))
    val b2 = cdc(Seq(("fact", 10L, 3L, 50L, "", 0L)))
    intercept[RuntimeException] {
      ViewCatalog.runBatch(spark, bomb, cat, b2, 2L, concurrentTiers = true)
    }
    assert(ViewCatalog.completedFloor(spark, cat) === 1L)
    assert(ViewCatalog.runBatch(spark, conc, cat, b2, 2L,
      concurrentTiers = true))
    assert(ViewCatalog.runBatch(spark, twin, catT, b2, 2L))
    assert(digest(IncrementalJoinAgg.view(spark, sA)) ===
      digest(IncrementalJoinAgg.view(spark, tA)))
    assert(viewD(sD) === viewD(tD) && viewR(sR, Seq()) === viewR(tR, Seq()))
  }

  test("concurrentTiers: overlapping declared state dirs refused; disjoint declared tier runs") {
    val sA = tmpDir("vci-a"); val sB = tmpDir("vci-b")
    val cat = tmpDir("vci-cat")
    val b0 = cdc(Seq(("fact", 10L, 1L, 100L, "", 0L),
      ("dim", 10L, 0L, 0L, "s1", 0L), ("ev", 7L, 1L, 0L, "", 0L)))
    // disjoint declarations: runs
    val ok = ViewCatalog.Catalog(bases = Seq(
      ViewCatalog.Stage("revenue", Seq(sA))(foldRevenue(sA)),
      ViewCatalog.Stage("sessions", Seq(sB))(foldSessions(sB))))
    assert(ViewCatalog.runBatch(spark, ok, cat, b0, 0L,
      concurrentTiers = true))
    assert(viewA(sA) === Map("s1" -> (100L, 1L)))
    // same dir twice in one tier: refused BEFORE any stage runs
    val same = ViewCatalog.Catalog(bases = Seq(
      ViewCatalog.Stage("one", Seq(sA))(foldRevenue(sA)),
      ViewCatalog.Stage("two", Seq(sA))((_, _) => fail("must not run"))))
    val e1 = intercept[IllegalArgumentException] {
      ViewCatalog.runBatch(spark, same, tmpDir("vci-c2"), b0, 0L,
        concurrentTiers = true)
    }
    assert(e1.getMessage.contains("overlapping state dirs"))
    // nesting counts as overlap (one stage's root contains the other's
    // table dir); trailing slashes normalize
    val nested = ViewCatalog.Catalog(bases = Seq(
      ViewCatalog.Stage("root", Seq(sA + "/"))((_, _) => fail("must not run")),
      ViewCatalog.Stage("leaf", Seq(sA + "/joinagg"))((_, _) =>
        fail("must not run"))))
    intercept[IllegalArgumentException] {
      ViewCatalog.runBatch(spark, nested, tmpDir("vci-c3"), b0, 0L,
        concurrentTiers = true)
    }
    // one stage may list several related dirs for itself
    val selfMulti = ViewCatalog.Catalog(bases = Seq(
      ViewCatalog.Stage("revenue", Seq(sA, sA + "/joinagg"))(foldRevenue(sA))))
    assert(ViewCatalog.runBatch(spark, selfMulti, tmpDir("vci-c4"),
      cdc(Seq(("fact", 10L, 2L, 30L, "", 0L))), 0L, concurrentTiers = true))
    // serial mode is unchecked (cascade order serializes the writes):
    // two stages declaring one dir run fine back to back
    val serialShared = ViewCatalog.Catalog(bases = Seq(
      ViewCatalog.Stage("one", Seq(sA))((_, _) => ()),
      ViewCatalog.Stage("two", Seq(sA))((_, _) => ())))
    assert(ViewCatalog.runBatch(spark, serialShared, tmpDir("vci-c5"),
      cdc(Seq(("fact", 10L, 9L, 1L, "", 0L))), 0L))
  }

  test("maintenance tier (r13): scheduled changelog compaction rides the cadence; reads unchanged") {
    val sA = tmpDir("vcm-a"); val tA = tmpDir("vcm-t"); val cd = tmpDir("vcm-c")
    var ran = Seq.empty[Long]
    val cat = ViewCatalog.Catalog(
      bases = Seq(ViewCatalog.Stage("rev", Seq(sA))(foldRevenue(sA))),
      maintenance = Seq(ViewCatalog.Maintenance("compact", every = 2) { bid =>
        ran :+= bid
        if (bid >= 2) IncrementalJoinAgg.compactChangelog(spark, sA, bid - 2)
      }))
    (0 to 5).foreach { i =>
      val b = cdc(Seq(
        ("fact", 10L + (i % 3), 100L + i, 10L + i, "", 0L),
        ("dim", 10L + (i % 3), 0L, 0L, s"s${i % 3}", 0L)))
      ViewCatalog.runBatch(spark, cat, cd, b, i.toLong)
      foldRevenue(tA)(b, i.toLong)
    }
    assert(ran === Seq(0L, 2L, 4L), "cadence: every 2nd committed batch")
    assert(viewA(sA) === viewA(tA))
    // history below the last floor (4 - 2 = 2) folded into the baseline
    val bs = IncrementalJoinAgg.changelog(spark, sA)
      .select("batch").distinct().as[Long].collect().toSet
    assert(bs.nonEmpty && bs.min >= 2L, s"uncompacted prefix survived: $bs")
    // as-of reads at/above the floor stay exact vs the uncompacted twin
    (2 to 5).foreach { b =>
      assert(digest(IncrementalJoinAgg.viewAsOf(spark, sA, b.toLong)) ===
        digest(IncrementalJoinAgg.viewAsOf(spark, tA, b.toLong)),
        s"as-of $b diverged after compaction")
    }
  }

  test("moved-log derived tier (R176): base stages the log, derived consumes, commits sweep — floor-replay safe") {
    val nd = tmpDir("vcml-nd"); val sD = tmpDir("vcml-d")
    val md = tmpDir("vcml-mv"); val cd = tmpDir("vcml-c")
    val sizeSchema = StructType(Seq(StructField("g", LongType),
      StructField("n_members", LongType)))
    val movedSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("old_label", LongType), StructField("new_label", LongType)))
    def rng(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")
    val cat = ViewCatalog.Catalog(
      bases = Seq(ViewCatalog.Stage("nd", Seq(nd, md))((b, id) =>
        IncrementalNearDup.processBatch(b.select("doc_id", "text"),
          "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
          threshold = 0.6, stateDir = nd, batchId = id,
          movedDir = Some(md)))),
      derived = Seq(ViewCatalog.Stage("sizes", Seq(sD))((_, id) => {
        val moved = MovedLog.pending(spark, md, movedSchema)
        val touched = moved.select(col("old_label").as("g"))
          .unionByName(moved.select(col("new_label").as("g")))
          .filter(col("g").isNotNull).distinct()
        val rows = IncrementalNearDup.labels(spark, nd)
          .join(touched.select(col("g").as("label")), Seq("label"), "left_semi")
          .groupBy("label").agg(count(lit(1)).as("n_members"))
          .select(col("label").as("g"), col("n_members"))
        DerivedView.processBatch(spark, touched, rows, sD, id, numBuckets = 4)
      })),
      commits = Seq(ViewCatalog.Stage("sweep")((_, _) =>
        MovedLog.sweep(spark, md, MovedLog.pendingArtifacts(spark, md)))))
    def sizes(): Map[Long, Long] =
      DerivedView.view(spark, sD, sizeSchema).as[(Long, Long)].collect().toMap
    ViewCatalog.runBatch(spark, cat, cd,
      Seq(30L -> rng(0, 40), 31L -> (rng(0, 40) + " extra"))
        .toDF("doc_id", "text"), 0L)
    assert(sizes() === Map(30L -> 2L))
    ViewCatalog.runBatch(spark, cat, cd,
      Seq(40L -> rng(10, 50)).toDF("doc_id", "text"), 1L)
    assert(sizes() === Map(30L -> 2L, 40L -> 1L))
    // the bridge merges the clusters; then a wholesale floor-replay of
    // the same batch must skip (false) and change nothing
    val bridge = Seq(35L -> rng(5, 45)).toDF("doc_id", "text")
    assert(ViewCatalog.runBatch(spark, cat, cd, bridge, 2L))
    assert(sizes() === Map(30L -> 4L))
    assert(MovedLog.pendingArtifacts(spark, md).isEmpty, "commits swept")
    assert(!ViewCatalog.runBatch(spark, cat, cd, bridge, 2L))
    assert(sizes() === Map(30L -> 4L))
  }

  test("describe (r13): ops report from listings — tables, stamps, pending artifacts") {
    val sA = tmpDir("vcd-a"); val md = tmpDir("vcd-mv"); val cd = tmpDir("vcd-c")
    val cat = ViewCatalog.Catalog(
      bases = Seq(ViewCatalog.Stage("rev", Seq(sA, md))(foldRevenue(sA))))
    ViewCatalog.runBatch(spark, cat, cd, cdc(Seq(
      ("fact", 10L, 100L, 5L, "", 0L), ("dim", 10L, 0L, 0L, "s1", 0L))), 0L)
    MvPipeline.stageArtifact(spark, s"$md/_moved_b0")(
      Seq((1L, 2L, 3L)).toDF("doc_id", "old_label", "new_label"))
    val rep = ViewCatalog.describe(spark, cat, cd).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r).toMap
    // the join-agg namespace's aggregate table: live buckets, the
    // committed batch's replay stamp, no staged leftovers
    val a = rep((sA, "joinaggstar/a"))
    assert(a.getLong(3) > 0 && a.getLong(4) > 0, "buckets + bytes")
    assert(a.getLong(6) === 0L, "max replay stamp = the committed batch")
    assert(a.getLong(7) === 0L, "no staged leftovers after a clean fold")
    // the bare moved-log dir stays visible through its pending artifact;
    // a stray plain FILE named _moved_* is NOT pending (it is not
    // consumable by MovedLog.pendingArtifacts — ADVICE r13)
    val mdFs = new org.apache.hadoop.fs.Path(md)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    mdFs.create(new org.apache.hadoop.fs.Path(s"$md/_moved_stray"), true).close()
    val rep1b = ViewCatalog.describe(spark, cat, cd).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r).toMap
    val mv = rep1b((md, "."))
    assert(mv.getLong(8) === 1L, "pending moved artifact visible")
    assert(mv.getLong(3) === 0L, "a marker dir has no buckets")
    assert(ViewCatalog.completedFloor(spark, cd) === 0L)
    // the reshard resume floor is stamped at the FAMILY NAMESPACE root,
    // one level above the tables — the report must still surface it
    MvPipeline.writeResumeFloor(spark, s"$sA/joinaggstar", 7L)
    // a crashed atomic backfill's '<table>.bf' partial is NOT live state
    val fs = new org.apache.hadoop.fs.Path(sA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$sA/joinaggstar/lbl.bf/bucket=0"))
    val rep2 = ViewCatalog.describe(spark, cat, cd).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r).toMap
    assert(rep2((sA, "joinaggstar/a")).getLong(9) === 7L,
      "namespace-root resume floor surfaced on the table rows")
    assert(!rep2.contains((sA, "joinaggstar/lbl.bf")),
      "a .bf backfill partial must not report as a live table")
  }

  test("pluggable multi-source readers (r14): a json dir and a TailFileProvider source share one batch-id domain") {
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val inF = tmpDir("vcp-facts"); val tailF = s"${tmpDir("vcp-tail")}/dims.log"
    val cat = tmpDir("vcp-cat"); val ckpt = tmpDir("vcp-ckpt")
    val sA = tmpDir("vcp-a")
    val fSchema = StructType(Seq(StructField("jk", LongType),
      StructField("id", LongType), StructField("m", LongType)))
    // facts keep the JSON-dir shorthand; dims arrive over a CUSTOM
    // streaming provider (the byte-offset file tailer) whose build
    // PROJECTS raw "jk,g" lines into the catalog's column shape —
    // the _src/union/offset machinery must not care about the format
    val sources = Seq(
      ViewCatalog.Source("facts", inF, fSchema),
      ViewCatalog.Source("dims") { s =>
        s.readStream.format(classOf[TailFileProvider].getName).load(tailF)
          .select(split(col("value"), ",").getItem(0).cast("long").as("jk"),
            split(col("value"), ",").getItem(1).as("g"))
      })
    val stage = ViewCatalog.Stage("rev", Seq(sA)) { (b, id) =>
      IncrementalJoinAgg.processBatch(
        b.filter(col("_src") === "facts").select("jk", "id", "m"),
        "jk", "id", "m",
        b.filter(col("_src") === "dims").select("jk", "g"),
        "jk", "g", sA, id, numBuckets = 4)
    }
    val catalog = ViewCatalog.Catalog(bases = Seq(stage))
    def runOnce(): Unit = {
      val q = ViewCatalog.startMulti(spark, sources, catalog, cat, ckpt)
      q.awaitTermination(); ()
    }
    Files.write(Paths.get(s"$inF/b0.json"),
      ("""{"jk":1,"id":10,"m":5}""" + "\n" +
        """{"jk":2,"id":11,"m":7}""" + "\n").getBytes)
    Files.write(Paths.get(tailF), "1,s1\n2,s2\n".getBytes)
    runOnce()
    def served(): Map[String, Long] =
      IncrementalJoinAgg.view(spark, sA)
        .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(served() === Map("s1" -> 5L, "s2" -> 7L))
    val floor0 = ViewCatalog.completedFloor(spark, cat)
    assert(floor0 >= 0L)
    // both feeds advance: the tailer resumes MID-FILE from its byte
    // offset, the json source from its file offset, under ONE checkpoint
    Files.write(Paths.get(s"$inF/b1.json"),
      ("""{"jk":1,"id":12,"m":3}""" + "\n").getBytes)
    Files.write(Paths.get(tailF), "3,s3\n".getBytes,
      StandardOpenOption.APPEND)
    runOnce()
    assert(served() === Map("s1" -> 8L, "s2" -> 7L))
    assert(ViewCatalog.completedFloor(spark, cat) > floor0)
    // a batch source is refused at build time
    intercept[IllegalArgumentException] {
      ViewCatalog.startMulti(spark,
        Seq(ViewCatalog.Source("bad")(s => Seq(1L).toDF("jk"))),
        catalog, cat, tmpDir("vcp-ckpt2"))
    }
  }

  test("startMulti (R174): two sources at different cadences ≡ the single-stream twin; crash drill across the source boundary") {
    import java.nio.file.{Files, Paths}
    val inF = tmpDir("vcm-facts"); val inD = tmpDir("vcm-dims")
    val cat = tmpDir("vcm-cat"); val ckpt = tmpDir("vcm-ckpt")
    val sA = tmpDir("vcm-a"); val tA = tmpDir("vcm-ta")
    val fSchema = StructType(Seq(StructField("jk", LongType),
      StructField("id", LongType), StructField("m", LongType)))
    val dSchemaSrc = StructType(Seq(StructField("jk", LongType),
      StructField("g", StringType)))
    // ONE star view fed by BOTH sources: the fact slice and the dim
    // slice of the SAME composite batch (the joined domain)
    def revenueStage(state: String) =
      ViewCatalog.Stage("revenue", Seq(state))((b, id) =>
        IncrementalJoinAgg.processBatch(
          b.filter(col("_src") === "facts").select("jk", "id", "m"),
          "jk", "id", "m",
          b.filter(col("_src") === "dims").select("jk", "g"),
          "jk", "g", state, id, numBuckets = 4))
    val catalog = ViewCatalog.Catalog(bases = Seq(revenueStage(sA)))
    val sources = Seq(
      ViewCatalog.Source("facts", inF, fSchema),
      ViewCatalog.Source("dims", inD, dSchemaSrc))
    def run(c: ViewCatalog.Catalog = catalog): Unit =
      ViewCatalog.startMulti(spark, sources, c, cat, ckpt).awaitTermination()
    // the single-stream twin folds the same per-batch slices directly
    def twin(facts: Seq[(Long, Long, Long)], dims: Seq[(Long, String)],
        id: Long): Unit =
      IncrementalJoinAgg.processBatch(facts.toDF("jk", "id", "m"),
        "jk", "id", "m", dims.toDF("jk", "g"), "jk", "g", tA, id,
        numBuckets = 4)
    def assertSame(): Unit =
      assert(digest(IncrementalJoinAgg.view(spark, sA)) ===
        digest(IncrementalJoinAgg.view(spark, tA)))

    // batch 0: facts ONLY — the slow dim feed has nothing yet and must
    // not stall the fact fold (its slice is empty)
    Files.write(Paths.get(inF, "f0.jsonl"),
      """{"jk":10,"id":1,"m":100}
        |{"jk":20,"id":2,"m":30}""".stripMargin.getBytes)
    run()
    twin(Seq((10L, 1L, 100L), (20L, 2L, 30L)), Nil, 0L)
    assertSame()
    assert(viewA(sA) === Map.empty, "no dims yet: inner join serves nothing")
    assert(ViewCatalog.completedFloor(spark, cat) === 0L)

    // batch 1: BOTH sources advance — dims d0 joins the retained facts,
    // facts f1 lands in the same composite batch
    Files.write(Paths.get(inD, "d0.jsonl"),
      """{"jk":10,"g":"s1"}
        |{"jk":20,"g":"s2"}""".stripMargin.getBytes)
    Files.write(Paths.get(inF, "f1.jsonl"), """{"jk":10,"id":3,"m":7}""".getBytes)
    run()
    twin(Seq((10L, 3L, 7L)), Seq((10L, "s1"), (20L, "s2")), 1L)
    assertSame()
    assert(viewA(sA) === Map("s1" -> (107L, 2L), "s2" -> (30L, 1L)))

    // batch 2 CRASHES across the source boundary: the composite batch
    // carries a dim re-key AND a fact; the bomb fires after the fold —
    // floor unmoved, checkpointed per-source offsets replay the SAME
    // composite batch, the stamped fold skips and the cascade converges
    Files.write(Paths.get(inD, "d1.jsonl"), """{"jk":20,"g":"s1"}""".getBytes)
    Files.write(Paths.get(inF, "f2.jsonl"), """{"jk":20,"id":4,"m":9}""".getBytes)
    val bomb = catalog.copy(derived = Seq(ViewCatalog.Stage("bomb")((_, _) =>
      throw new RuntimeException("multi-source crash"))))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ViewCatalog.startMulti(spark, sources, bomb, cat, ckpt)
        .awaitTermination()
    }
    assert(ViewCatalog.completedFloor(spark, cat) === 1L,
      "crash mid-cascade: floor unmoved")
    run() // replay through the full catalog
    twin(Seq((20L, 4L, 9L)), Seq((20L, "s1")), 2L)
    assertSame()
    assert(viewA(sA) === Map("s1" -> (146L, 4L)))
    assert(ViewCatalog.completedFloor(spark, cat) === 2L)
  }

  test("start(): one JSON-lines CDC stream drives the whole catalog across restarts") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.IntegerType
    val in = tmpDir("vcs-in"); val cat = tmpDir("vcs-cat")
    val sA = tmpDir("vcs-a"); val sB = tmpDir("vcs-b")
    val sD = tmpDir("vcs-d"); val ckpt = tmpDir("vcs-ckpt")
    val schema = StructType(Seq(StructField("tbl", StringType),
      StructField("jk", LongType), StructField("id", LongType),
      StructField("m", LongType), StructField("g", StringType),
      StructField("t", LongType)))
    val catalog = ViewCatalog.Catalog(
      bases = Seq(ViewCatalog.Stage("revenue")(foldRevenue(sA)),
        ViewCatalog.Stage("sessions")(foldSessions(sB))),
      derived = Seq(ViewCatalog.Stage("avg")((_, id) => foldDerived(sA, sD)(id))))
    def lines(rows: Seq[Cdc]) = rows.map { case (tbl, jk, id, m, g, t) =>
      s"""{"tbl":"$tbl","jk":$jk,"id":$id,"m":$m,"g":"$g","t":$t}"""
    }.mkString("\n")
    def run(): Unit =
      ViewCatalog.start(spark, in, schema, catalog, cat, ckpt)
        .awaitTermination()

    Files.write(Paths.get(in, "b0.jsonl"), lines(Seq(
      ("fact", 10L, 1L, 100L, "", 0L), ("dim", 10L, 0L, 0L, "s1", 0L),
      ("ev", 7L, 1L, 0L, "", 0L))).getBytes)
    run()
    assert(viewA(sA) === Map("s1" -> (100L, 1L)))
    assert(viewD(sD) === viewA(sA))
    assert(ViewCatalog.completedFloor(spark, cat) === 0L)

    // restart with a new file only: the checkpoint advances the batch
    // id past the floor, the whole cascade folds the increment
    Files.write(Paths.get(in, "b1.jsonl"), lines(Seq(
      ("fact", 10L, 2L, 30L, "", 0L), ("ev", 7L, 2L, 0L, "", 50L))).getBytes)
    run()
    assert(viewA(sA) === Map("s1" -> (130L, 2L)))
    assert(viewD(sD) === viewA(sA))
    assert(viewS(sB) === Set((7L, 0L, 50L, 2L)))
    assert(ViewCatalog.completedFloor(spark, cat) === 1L)
  }
}
