package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase

/** R172: every maintained-view family is consumable via `spark.sql`
  * with the read contract baked in, point reads are SQL table functions
  * whose literal calls PARTITION-PRUNE to one bucket, ad-hoc joins of
  * registered views work, and the [[ViewCatalog]] `sql` tier re-binds
  * the surface after every batch so SQL reads track the folds. */
class SqlCatalogSpec extends SparkTestBase {
  import spark.implicits._

  /** The one-bucket pruning proof: the executed plan's FileScan must
    * carry a PartitionFilters entry pinning `bucket` to the writer's
    * hash of the probed key. */
  private def assertPrunedTo(q: org.apache.spark.sql.DataFrame,
      bucket: Long): Unit = {
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(raw"\(bucket#\d+ = $bucket\)".r.findFirstIn(plan).isDefined,
      s"expected partition filter (bucket = $bucket) in:\n$plan")
  }

  private def bucketOf(g: String, b: Int): Long =
    MvPipeline.bucketIdsOf(Seq(g).toDF("g"), Seq("g"), b).head

  test("joinAgg: SQL ≡ engine read; TVF point read ≡ viewFor and prunes to one bucket") {
    val state = tmpDir("sqlc-ja")
    val facts = Seq((10L, 1L, 100L), (20L, 2L, 30L), (10L, 3L, 7L))
      .toDF("jk", "id", "m")
    val dims = Seq((10L, "s1"), (20L, "s2")).toDF("jk", "g")
    IncrementalJoinAgg.processBatch(facts, "jk", "id", "m", dims, "jk", "g",
      state, 0L, numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.joinAgg("sqlc_rev", state),
      SqlCatalog.aggPointRead("sqlc_rev_for", s"$state/joinaggstar/a",
        numBuckets = 4)))
    val viaSql = spark.sql("SELECT g, total, pairs FROM sqlc_rev ORDER BY g")
      .as[(String, Long, Long)].collect().toSeq
    val viaEngine = IncrementalJoinAgg.view(spark, state).orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(viaSql === viaEngine)
    assert(viaSql === Seq(("s1", 107L, 2L), ("s2", 30L, 1L)))
    // the TVF == the Scala bucket-pruned point read, and it PRUNES
    val q = spark.sql("SELECT g, total, rows FROM sqlc_rev_for('s1')")
    assert(q.as[(String, Long, Long)].collect().toSeq === Seq(("s1", 107L, 2L)))
    val scalaPoint = IncrementalJoinAggStar.viewFor(spark, state, Seq("s1"),
      numBuckets = 4).as[(String, Long, Long)].collect().toSeq
    assert(scalaPoint === Seq(("s1", 107L, 2L)))
    assertPrunedTo(q, bucketOf("s1", 4))
    // absent group: empty, still pruned
    assert(spark.sql("SELECT * FROM sqlc_rev_for('zz')").isEmpty)
  }

  test("as-of surface: starAsOf frame + aggAsOfRead TVF ≡ viewAsOf across batches, pruned") {
    val state = tmpDir("sqlc-asof")
    val dims = Seq((10L, "s1"), (20L, "s2")).toDF("jk", "g")
    IncrementalJoinAgg.processBatch(
      Seq((10L, 1L, 100L), (20L, 2L, 30L)).toDF("jk", "id", "m"),
      "jk", "id", "m", dims, "jk", "g", state, 0L, numBuckets = 4)
    IncrementalJoinAgg.processBatch(
      Seq((10L, 3L, 7L)).toDF("jk", "id", "m"),
      "jk", "id", "m", dims.limit(0), "jk", "g", state, 1L, numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.star("sqlc_asof_live", state),
      SqlCatalog.starAsOf("sqlc_asof0", state, 0L),
      SqlCatalog.aggAsOfRead("sqlc_asof_for", s"$state/joinaggstar/a",
        numBuckets = 4)))
    // the pinned-batch frame == the Scala as-of read, and differs from live
    val viaSql = spark.sql(
        "SELECT g, total, rows FROM sqlc_asof0 ORDER BY g")
      .as[(String, Long, Long)].collect().toSeq
    val viaEngine = IncrementalJoinAggStar.viewAsOf(spark, state, 0L)
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(viaSql === viaEngine)
    assert(viaSql === Seq(("s1", 100L, 1L), ("s2", 30L, 1L)))
    assert(spark.sql("SELECT total FROM sqlc_asof_live WHERE g = 's1'")
      .as[Long].collect().toSeq === Seq(107L))
    // the TVF truncates at any upto, pruned to the group's one bucket
    val q0 = spark.sql("SELECT g, total, rows FROM sqlc_asof_for('s1', 0)")
    assert(q0.as[(String, Long, Long)].collect().toSeq === Seq(("s1", 100L, 1L)))
    assertPrunedTo(q0, bucketOf("s1", 4))
    assert(spark.sql("SELECT total FROM sqlc_asof_for('s1', 1)")
      .as[Long].collect().toSeq === Seq(107L))
    // a group absent at the asked batch answers no row
    assert(spark.sql("SELECT * FROM sqlc_asof_for('zz', 1)").isEmpty)
  }

  test("temporal star: SQL ≡ engine (null-sentinel decode); TVF takes per-branch coordinates incl. NULL") {
    val state = tmpDir("sqlc-ts")
    val noFD = Seq.empty[(Long, Long, Long)].toDF("id", "k1", "k2")
    val noDD = Seq.empty[(Long, Long)].toDF("k", "vf")
    IncrementalTemporalStar.processBatch(
      Seq.empty[(Long, Long, Long, Long, Long)].toDF("id", "t", "m", "k1", "k2"),
      noFD,
      Seq(Seq((1L, 100L, "a")).toDF("k", "vf", "vs"),
        Seq((1L, 200L, "x")).toDF("k", "vf", "vs")),
      Seq(noDD, noDD), state, 0L, numBuckets = 4)
    IncrementalTemporalStar.processBatch(
      Seq((10L, 50L, 1L, 1L, 1L), (11L, 150L, 2L, 1L, 1L),
        (12L, 250L, 4L, 1L, 1L), (13L, 250L, 8L, 2L, 1L))
        .toDF("id", "t", "m", "k1", "k2"),
      noFD,
      Seq(Seq.empty[(Long, Long, String)].toDF("k", "vf", "vs"),
        Seq.empty[(Long, Long, String)].toDF("k", "vf", "vs")),
      Seq(noDD, noDD), state, 1L, numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.temporalStar("sqlc_ts", state, numBranches = 2),
      SqlCatalog.temporalStarPointRead("sqlc_ts_for", state, numBranches = 2,
        numBuckets = 4),
      SqlCatalog.temporalStarAsOfRead("sqlc_ts_asof", state, numBranches = 2,
        numBuckets = 4)))
    val viaSql = spark
      .sql("SELECT g1, g2, total, rows FROM sqlc_ts ORDER BY total")
      .as[(Option[String], Option[String], Long, Long)].collect().toSeq
    val viaEngine = IncrementalTemporalStar.view(spark, state, 2)
      .orderBy("total")
      .as[(Option[String], Option[String], Long, Long)].collect().toSeq
    assert(viaSql === viaEngine)
    assert(viaSql === Seq((None, None, 1L, 1L), (Some("a"), None, 2L, 1L),
      (Some("a"), Some("x"), 4L, 1L), (None, Some("x"), 8L, 1L)))
    // named tuple
    assert(spark.sql("SELECT total, rows FROM sqlc_ts_for('a', 'x')")
      .as[(Long, Long)].collect().toSeq === Seq((4L, 1L)))
    // NULL coordinate names the pre-first-version group exactly
    val qNull = spark.sql(
      "SELECT g1, g2, total, rows FROM sqlc_ts_for(CAST(NULL AS STRING), 'x')")
    assert(qNull.as[(Option[String], Option[String], Long, Long)]
      .collect().toSeq === Seq((None, Some("x"), 8L, 1L)))
    // pruning: the encoded key's bucket (the engine's SEP/NUL encoding)
    val enc = "\u0000\u0001x"
    assertPrunedTo(qNull, bucketOf(enc, 4))
    // as-of TVF over the same encoded-group layout: before the facts'
    // batch the group answers no row; at it, the live tuple — pruned
    assert(spark.sql("SELECT * FROM sqlc_ts_asof('a', 'x', 0)").isEmpty)
    val qAsof = spark.sql("SELECT total, rows FROM sqlc_ts_asof('a', 'x', 1)")
    assert(qAsof.as[(Long, Long)].collect().toSeq === Seq((4L, 1L)))
    assertPrunedTo(qAsof, bucketOf("a\u0001x", 4))
  }

  test("sessions: SQL view unions the frozen floor; TVF point read prunes both tables") {
    val state = tmpDir("sqlc-se")
    val noDel = Seq.empty[(Long, Long)].toDF("id", "k")
    IncrementalSessions.processBatch(
      Seq((1L, 0L, 7L), (2L, 50L, 7L), (3L, 400L, 7L), (4L, 10L, 9L))
        .toDF("id", "t", "k"),
      noDel, gap = 100L, stateDir = state, batchId = 0L, numBuckets = 4)
    // freeze everything ending before 300: user 7's first session
    IncrementalSessions.compactState(spark, state, horizon = 300L,
      gap = 100L, numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.sessions("sqlc_sess", state),
      SqlCatalog.sessionsPointRead("sqlc_sess_for", state, numBuckets = 4)))
    val viaSql = spark.sql(
      "SELECT k, session_start, session_end, n_events FROM sqlc_sess ORDER BY k, session_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val viaEngine = IncrementalSessions.view(spark, state)
      .orderBy("k", "session_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaSql === viaEngine)
    assert(viaSql === Seq((7L, 0L, 50L, 2L), (7L, 400L, 400L, 1L),
      (9L, 10L, 10L, 1L)))
    val q = spark.sql(
      "SELECT k, session_start, session_end, n_events FROM sqlc_sess_for(7)")
    assert(q.orderBy("session_start").as[(Long, Long, Long, Long)]
      .collect().toSeq === Seq((7L, 0L, 50L, 2L), (7L, 400L, 400L, 1L)))
    val expected = MvPipeline.bucketIdsOf(Seq(7L).toDF("k"), Seq("k"), 4).head
    assertPrunedTo(q, expected)
    val plan = q.queryExecution.executedPlan.toString
    assert(raw"\(bucket#\d+ = $expected\)".r.findAllIn(plan).size >= 2,
      s"both the live and frozen scans must prune:\n$plan")
  }

  test("extrema: view + quantiles ≡ engine; TVF per-group aggregate prunes") {
    val state = tmpDir("sqlc-ex")
    IncrementalExtrema.processBatch(
      Seq(("g1", 5L, 1L), ("g1", 9L, 2L), ("g2", 3L, 1L)).toDF("g", "v", "w"),
      state, 0L, numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.extrema("sqlc_ex", state),
      SqlCatalog.extremaQuantiles("sqlc_exq", state, Seq((1L, 2L))),
      SqlCatalog.extremaPointRead("sqlc_ex_for", s"$state/extrema",
        numBuckets = 4)))
    assert(spark.sql("SELECT g, n, min_v, max_v FROM sqlc_ex ORDER BY g")
      .as[(String, Long, Long, Long)].collect().toSeq ===
      IncrementalExtrema.view(spark, state).orderBy("g")
        .as[(String, Long, Long, Long)].collect().toSeq)
    assert(spark.sql("SELECT g, q_1_2 FROM sqlc_exq ORDER BY g")
      .as[(String, Long)].collect().toSeq ===
      IncrementalExtrema.quantiles(spark, state, Seq((1L, 2L))).orderBy("g")
        .as[(String, Long)].collect().toSeq)
    val q = spark.sql("SELECT g, n, min_v, max_v FROM sqlc_ex_for('g1')")
    assert(q.as[(String, Long, Long, Long)].collect().toSeq ===
      Seq(("g1", 3L, 5L, 9L)))
    assertPrunedTo(q, bucketOf("g1", 4))
    // R173 sub-bucketed store: the TVF must carry the writer's layout —
    // the sub-aware registration merges the group's ≤S buckets exactly
    val st2 = tmpDir("sqlc-ex-sb")
    IncrementalExtrema.processBatch(
      Seq(("g1", 5L, 1L), ("g1", 9L, 2L), ("g1", 100L, 1L), ("g2", 3L, 1L))
        .toDF("g", "v", "w"),
      st2, 0L, numBuckets = 4, subBuckets = 2)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.extremaPointRead("sqlc_ex_sb_for", s"$st2/extrema",
        numBuckets = 4, subBuckets = 2)))
    val qSb = spark.sql("SELECT g, n, min_v, max_v FROM sqlc_ex_sb_for('g1')")
    assert(qSb.as[(String, Long, Long, Long)].collect().toSeq ===
      Seq(("g1", 4L, 5L, 100L)))
    assert(qSb.queryExecution.executedPlan.toString
      .contains("PartitionFilters"), "sub-bucketed TVF must still prune")
    // the Scala twin agrees (merge-at-read over the group's buckets)
    assert(IncrementalExtrema.viewFor(spark, st2, Seq("g1"),
      numBuckets = 4, subBuckets = 2)
      .as[(String, Long, Long, Long)].collect().toSeq ===
      Seq(("g1", 4L, 5L, 100L)))
    // r14 TOP-K point read: TVF ≡ topNFor ≡ topN-filtered, both
    // layouts, k live through one registration
    SqlCatalog.register(spark, Seq(
      SqlCatalog.extremaTopKRead("sqlc_ex_topk", s"$state/extrema",
        numBuckets = 4),
      SqlCatalog.extremaTopKRead("sqlc_ex_sb_topk", s"$st2/extrema",
        numBuckets = 4, subBuckets = 2)))
    val tk = spark.sql("SELECT * FROM sqlc_ex_topk('g1', 2) ORDER BY rank")
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(tk === Seq(("g1", 9L, 2L, 1), ("g1", 5L, 1L, 2)))
    assert(tk === IncrementalExtrema.topNFor(spark, state, Seq("g1"), 2,
      numBuckets = 4).orderBy("rank")
      .as[(String, Long, Long, Int)].collect().toSeq)
    assert(tk === IncrementalExtrema.topN(spark, state, 2)
      .filter($"g" === "g1").orderBy("rank")
      .as[(String, Long, Long, Int)].collect().toSeq)
    assertPrunedTo(
      spark.sql("SELECT * FROM sqlc_ex_topk('g1', 2)"), bucketOf("g1", 4))
    val tkSb = spark.sql("SELECT * FROM sqlc_ex_sb_topk('g1', 3) ORDER BY rank")
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(tkSb === Seq(("g1", 100L, 1L, 1), ("g1", 9L, 2L, 2),
      ("g1", 5L, 1L, 3)))
    assert(tkSb === IncrementalExtrema.topNFor(spark, st2, Seq("g1"), 3,
      numBuckets = 4, subBuckets = 2).orderBy("rank")
      .as[(String, Long, Long, Int)].collect().toSeq)
    // k is live: a different k through the SAME registration
    assert(spark.sql("SELECT count(1) FROM sqlc_ex_sb_topk('g1', 1)")
      .as[Long].head() === 1L)
  }

  test("star distinct point read: TVF ≡ distinctView, pruned, sub-bucket aware") {
    val state = tmpDir("sqlc-ud")
    val u = Seq(("g1", 5L, 2L), ("g1", 6L, 1L), ("g2", 5L, 1L))
      .toDF("g", "v", "w")
    MvPipeline.upsertBucketedMerge(u, s"$state/joinaggstar/u",
      IncrementalExtrema.mergeVw, -1L, 4, Seq("g"))
    SqlCatalog.register(spark, Seq(
      SqlCatalog.starDistinctPointRead("sqlc_ud_for",
        s"$state/joinaggstar/u", numBuckets = 4)))
    val q = spark.sql("SELECT g, n_distinct FROM sqlc_ud_for('g1')")
    assert(q.as[(String, Long)].collect().toSeq === Seq(("g1", 2L)))
    assertPrunedTo(q, bucketOf("g1", 4))
    assert(q.as[(String, Long)].collect().toSeq ===
      IncrementalJoinAggStar.distinctView(spark, state)
        .filter(col("g") === "g1").as[(String, Long)].collect().toSeq)
    // the R173 sub-bucketed u/ layout needs the sub-aware registration
    val st2 = tmpDir("sqlc-ud-sb")
    MvPipeline.upsertBucketedMerge(
      u.withColumn("sb", IncrementalExtrema.subBucketOf(col("v"), 2)),
      s"$st2/joinaggstar/u", IncrementalExtrema.mergeVwSb, -1L, 4,
      Seq("g", "sb"), subBuckets = 2) // declared: the R177 marker records S
    SqlCatalog.register(spark, Seq(
      SqlCatalog.starDistinctPointRead("sqlc_ud_sb_for",
        s"$st2/joinaggstar/u", numBuckets = 4, subBuckets = 2)))
    assert(spark.sql("SELECT g, n_distinct FROM sqlc_ud_sb_for('g1')")
      .as[(String, Long)].collect().toSeq === Seq(("g1", 2L)))
  }

  test("rollup / derived / summary / labels / funnel levels register and read ≡ engine") {
    // rollup
    val rl = tmpDir("sqlc-rl")
    RollupMaintenance.processBatch(
      Seq(("s1", 5L, 1L), ("s2", 3L, 1L)).toDF("g", "m", "c"),
      rl, Seq(Seq(0), Seq()), 0L, numBuckets = 4)
    // derived
    val dv = tmpDir("sqlc-dv")
    val dSchema = StructType(Seq(StructField("g", StringType),
      StructField("n", LongType)))
    DerivedView.processBatch(spark, Seq("s1").toDF("g"),
      Seq(("s1", 4L)).toDF("g", "n"), dv, 0L, numBuckets = 4)
    // summary (the reference's literal keyed tables)
    val mv = tmpDir("sqlc-mv")
    MvPipeline.upsert(Seq(("k1", 5L), ("k2", 2L)).toDF("k", "n"),
      s"$mv/mv_counts", Seq("k"), 0L)
    // near-dup labels
    val nd = tmpDir("sqlc-nd")
    def rng(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")
    IncrementalNearDup.processBatch(
      Seq(30L -> rng(0, 40), 31L -> (rng(0, 40) + " tail")).toDF("doc_id", "text"),
      "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
      threshold = 0.6, stateDir = nd, batchId = 0L, numBuckets = 4)
    // funnel levels
    val fu = tmpDir("sqlc-fu")
    IncrementalFunnel.processBatch(
      Seq((1L, "view", 0L), (1L, "click", 10L), (2L, "view", 5L))
        .toDF("u", "et", "t"),
      "u", "t", "et", Seq("view", "click"), windowUs = 100L, fu, 0L,
      numBuckets = 4)

    SqlCatalog.register(spark, Seq(
      SqlCatalog.rollup("sqlc_rl", rl, Seq(0)),
      SqlCatalog.derived("sqlc_dv", dv, dSchema),
      SqlCatalog.summary("sqlc_mv", mv, "mv_counts"),
      SqlCatalog.nearDupLabels("sqlc_nd", nd),
      SqlCatalog.funnelLevels("sqlc_fu", fu)))

    assert(spark.sql("SELECT g, total, rows FROM sqlc_rl ORDER BY g")
      .as[(String, Long, Long)].collect().toSeq ===
      RollupMaintenance.view(spark, rl, Seq(0)).orderBy("g")
        .as[(String, Long, Long)].collect().toSeq)
    assert(spark.sql("SELECT g, n FROM sqlc_dv").as[(String, Long)]
      .collect().toSeq === Seq(("s1", 4L)))
    assert(spark.sql("SELECT k, n FROM sqlc_mv ORDER BY k")
      .as[(String, Long)].collect().toSeq === Seq(("k1", 5L), ("k2", 2L)))
    assert(spark.sql("SELECT doc_id, label FROM sqlc_nd ORDER BY doc_id")
      .as[(Long, Long)].collect().toSeq ===
      IncrementalNearDup.labels(spark, nd).orderBy("doc_id")
        .as[(Long, Long)].collect().toSeq)
    assert(spark.sql("SELECT user, level FROM sqlc_fu ORDER BY user")
      .as[(Long, Int)].collect().toSeq === Seq((1L, 2L), (2L, 1L)))
  }

  test("ad-hoc SQL join of two registered views (the reference's consumer-join UX)") {
    val sA = tmpDir("sqlc-jA"); val sB = tmpDir("sqlc-jB")
    IncrementalJoinAgg.processBatch(
      Seq((10L, 1L, 100L), (20L, 2L, 30L)).toDF("jk", "id", "m"),
      "jk", "id", "m", Seq((10L, "s1"), (20L, "s2")).toDF("jk", "g"),
      "jk", "g", sA, 0L, numBuckets = 4)
    IncrementalExtrema.processBatch(
      Seq(("s1", 11L, 1L), ("s1", 44L, 1L), ("s2", 7L, 1L)).toDF("g", "v", "w"),
      sB, 0L, numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.joinAgg("sqlc_j_rev", sA),
      SqlCatalog.extrema("sqlc_j_ex", sB)))
    val joined = spark.sql(
      """SELECT r.g, r.total, e.max_v
         FROM sqlc_j_rev r JOIN sqlc_j_ex e ON r.g = e.g
         ORDER BY r.g""").as[(String, Long, Long)].collect().toSeq
    assert(joined === Seq(("s1", 100L, 44L), ("s2", 30L, 7L)))
  }

  test("ViewCatalog sql tier: registrations re-bind after every batch (fresh state visible)") {
    val sA = tmpDir("sqlc-vc"); val cat = tmpDir("sqlc-vc-cat")
    val catalog = ViewCatalog.Catalog(
      bases = Seq(ViewCatalog.Stage("rev", Seq(sA))((b, id) =>
        IncrementalJoinAgg.processBatch(
          b.filter(col("tbl") === "fact").select("jk", "id", "m"),
          "jk", "id", "m",
          b.filter(col("tbl") === "dim").select("jk", "g"),
          "jk", "g", sA, id, numBuckets = 4))),
      sql = Seq(SqlCatalog.joinAgg("sqlc_vc_rev", sA)))
    def cdc(rows: Seq[(String, Long, Long, Long, String)]) =
      rows.toDF("tbl", "jk", "id", "m", "g")
    assert(ViewCatalog.runBatch(spark, catalog, cat,
      cdc(Seq(("fact", 10L, 1L, 100L, ""), ("dim", 10L, 0L, 0L, "s1"))), 0L))
    assert(spark.sql("SELECT g, total FROM sqlc_vc_rev").as[(String, Long)]
      .collect().toSeq === Seq(("s1", 100L)))
    // the next batch's fold is visible through the SAME SQL name — the
    // re-registration freshness contract
    assert(ViewCatalog.runBatch(spark, catalog, cat,
      cdc(Seq(("fact", 10L, 2L, 30L, ""))), 1L))
    assert(spark.sql("SELECT g, total FROM sqlc_vc_rev").as[(String, Long)]
      .collect().toSeq === Seq(("s1", 130L)))
    // a replayed (skipped) batch still re-binds for a fresh session
    spark.catalog.dropTempView("sqlc_vc_rev")
    assert(!ViewCatalog.runBatch(spark, catalog, cat,
      cdc(Seq(("fact", 10L, 2L, 30L, ""))), 1L))
    assert(spark.sql("SELECT g, total FROM sqlc_vc_rev").as[(String, Long)]
      .collect().toSeq === Seq(("s1", 130L)))
  }

  test("bm25 TVF (r14): SQL(query, k) ≡ searchBm25Bucketed on the same maintained state") {
    val st = tmpDir("sqlc-bm25")
    val docs = Seq(
      (1L, "spark merge spark vector"),
      (2L, "vector store and merge policy"),
      (3L, "wholly unrelated text here"),
      (4L, "spark spark spark"),
      (5L, "merge"))
      .toDF("doc_id", "text")
    IncrementalIndex.processBatchBucketed(docs, st, batchId = 0L,
      numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.bm25Read("sqlc_bm25", st, numBuckets = 4)))
    val terms = Seq("spark", "vector", "merge")
    val expect = IncrementalIndex.searchBm25Bucketed(spark, st, terms, 3)
      .as[(Long, Long, Long)].collect().toSeq
    val got = spark.sql(
      "SELECT * FROM sqlc_bm25('spark vector merge', 3) " +
        "ORDER BY score_e6 DESC, doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expect, "TVF must be bit-identical to the Scala entry")
    assert(expect.nonEmpty && expect.head._2 === 3L,
      "doc 1 matches all three terms")
    // k is a live parameter: a different k through the SAME registration
    assert(spark.sql("SELECT count(1) FROM sqlc_bm25('spark vector merge', 1)")
      .as[Long].head() === 1L)
    // an unseen-terms query answers empty, not an error
    assert(spark.sql("SELECT * FROM sqlc_bm25('zzz', 5)").isEmpty)
    // a fold of new docs is visible after re-registration (the re-bind
    // contract), and the TVF tracks the changed idf/totals. The Scala
    // entry persists its state reads (Caching contract): release before
    // re-reading rewritten state, as Bench/Verify do between queries —
    // without it the cache manager plan-matches the STALE in-memory
    // relation over the same paths
    graft.operators.Caching.releaseAll()
    IncrementalIndex.processBatchBucketed(
      Seq((6L, "vector vector")).toDF("doc_id", "text"), st, batchId = 1L,
      numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.bm25Read("sqlc_bm25", st, numBuckets = 4)))
    val expect2 = IncrementalIndex.searchBm25Bucketed(spark, st, terms, 6)
      .as[(Long, Long, Long)].collect().toSeq
    val got2 = spark.sql(
      "SELECT * FROM sqlc_bm25('spark vector merge', 6) " +
        "ORDER BY score_e6 DESC, doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got2 === expect2)
  }

  test("phrase TVF (r14): SQL(phrase) ≡ searchPhrase for 1/2/3-term phrases, pruned bucketed read") {
    val st = tmpDir("sqlc-phrase")
    val docs = Seq(
      (1L, "hash table join hash table probe hash table"),
      (2L, "table hash"),
      (3L, "hash join table"),
      (4L, "table table table"),
      (5L, "nothing relevant"))
      .toDF("doc_id", "text")
    IncrementalIndex.processBatchPositionalBucketed(docs, st, batchId = 0L,
      numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.phraseRead("sqlc_phrase", st, numBuckets = 4)))
    def scalaAns(phrase: Seq[String]): Seq[(Long, Long)] =
      IncrementalIndex.searchPhraseBucketed(spark, st, phrase, numBuckets = 4)
        .as[(Long, Long)].collect().toSeq.sorted
    def sqlAns(phrase: String): Seq[(Long, Long)] =
      spark.sql(s"SELECT * FROM sqlc_phrase('$phrase') ORDER BY doc_id")
        .as[(Long, Long)].collect().toSeq
    for (p <- Seq(Seq("hash", "table"), Seq("hash", "table", "join"),
        Seq("table"), Seq("table", "hash"))) {
      assert(sqlAns(p.mkString(" ")) === scalaAns(p), s"phrase $p diverged")
    }
    assert(sqlAns("hash table") === Seq(1L -> 3L),
      "doc 1 carries three overlapping-start occurrences")
    // a repeated-term phrase folds through the same map lookup
    assert(sqlAns("table table") === scalaAns(Seq("table", "table")))
    assert(sqlAns("table table") === Seq(4L -> 2L))
    // unseen terms and the empty phrase answer empty, not an error
    assert(spark.sql("SELECT * FROM sqlc_phrase('zz yy')").isEmpty)
    assert(spark.sql("SELECT * FROM sqlc_phrase('')").isEmpty)
    // new docs visible after a fold + re-bind
    graft.operators.Caching.releaseAll()
    IncrementalIndex.processBatchPositionalBucketed(
      Seq((6L, "hash table again")).toDF("doc_id", "text"), st, batchId = 1L,
      numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.phraseRead("sqlc_phrase", st, numBuckets = 4)))
    assert(sqlAns("hash table") === scalaAns(Seq("hash", "table")))
    assert(sqlAns("hash table").exists(_._1 == 6L))
    // a wrong bucket count is refused at registration (R177 layout)
    intercept[IllegalArgumentException] {
      SqlCatalog.register(spark, Seq(
        SqlCatalog.phraseRead("sqlc_phrase_bad", st, numBuckets = 8)))
    }
    // the term-membership predicate reaches the parquet scan as a
    // pushed In filter on a literal call (r14: array_contains over the
    // same foldable array is NOT source-translatable and read every
    // row group)
    val plan = spark.sql("SELECT * FROM sqlc_phrase('hash table')")
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(token"),
      s"membership filter must push to the scan:\n$plan")
    // a phrase longer than the registration's maxTerms degrades to a
    // correct unpruned scan (the size disjunct), never a wrong answer
    SqlCatalog.register(spark, Seq(
      SqlCatalog.phraseRead("sqlc_phrase_m2", st, numBuckets = 4,
        maxTerms = 2)))
    assert(spark.sql("SELECT * FROM sqlc_phrase_m2('hash table join') ORDER BY doc_id")
      .as[(Long, Long)].collect().toSeq ===
      scalaAns(Seq("hash", "table", "join")))
  }

  test("retrieval TVF literal calls partition-prune to the terms' bucket dirs; free/over-length paths stay correct (r15)") {
    // many distinct tokens spread the postings over all 4 buckets
    val st = tmpDir("sqlc-prune")
    val docs = (1L to 40L)
      .map(i => (i, s"tok$i extra$i spark")).toDF("doc_id", "text")
    IncrementalIndex.processBatchBucketed(docs, st, batchId = 0L,
      numBuckets = 4)
    IncrementalIndex.processBatchPositionalBucketed(docs, st, batchId = 0L,
      numBuckets = 4)
    SqlCatalog.register(spark, Seq(
      SqlCatalog.bm25Read("sqlc_pbm", st, numBuckets = 4),
      SqlCatalog.phraseRead("sqlc_pph", st, numBuckets = 4)))

    def scanParts(df: org.apache.spark.sql.DataFrame,
        pathPart: String): Seq[Int] = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case f: FileSourceScanExec => Seq(f)
        case other =>
          other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.exists(_.toString.contains(pathPart)))
        .map(_.selectedPartitions.partitionCount)
    }
    // all 4 bucket dirs exist (otherwise "fewer than 4" proves nothing)
    assert(scanParts(spark.sql("SELECT * FROM sqlc_pbm_postings"),
      "postings") === Seq(4))

    // the terms' buckets + at most the xxhash64(NULL) filler bucket —
    // never all 4 (the literal-call dir-pruning contract)
    val termBuckets = MvPipeline.bucketIdsOf(
      Seq("spark", "tok3").toDF("g"), Seq("g"), 4).toSet
    val fillerBucket = spark.sql("SELECT pmod(xxhash64(CAST(NULL AS STRING)), 4L)")
      .head().getLong(0)
    val allowed = termBuckets + fillerBucket
    assert(allowed.size < 4, "test corpus must leave at least one unprobed bucket")
    val bm = spark.sql("SELECT * FROM sqlc_pbm('spark tok3', 3)")
    scanParts(bm, "postings").foreach { c =>
      assert(c <= allowed.size && c < 4,
        s"literal bm25 call opened $c bucket dirs, allowed ${allowed.size}")
    }
    val ph = spark.sql("SELECT * FROM sqlc_pph('tok3 extra3')")
    scanParts(ph, "positional").foreach { c =>
      assert(c <= allowed.size && c < 4,
        s"literal phrase call opened $c bucket dirs")
    }
    // ...and the pruned plans still answer exactly the Scala entries
    assert(bm.orderBy(desc("score_e6"), col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq ===
      IncrementalIndex.searchBm25Bucketed(spark, st, Seq("spark", "tok3"), 3)
        .as[(Long, Long, Long)].collect().toSeq)
    assert(ph.as[(Long, Long)].collect().toSeq === Seq(3L -> 1L))

    // free parameter: no dir pruning is expressible (the IN list cannot
    // fold), but the call still answers correctly through a lateral join
    val lateral = spark.sql(
      "SELECT r.* FROM (SELECT 'tok3 extra3' AS p) t, LATERAL sqlc_pph(t.p) r")
    assert(lateral.as[(Long, Long)].collect().toSeq === Seq(3L -> 1L))

    // bm25 over maxTerms REFUSES (r15 fix) — pass-through would have
    // silently scored every token of every doc; phrase stays correct
    // via its outer re-check, just unpruned
    SqlCatalog.register(spark, Seq(
      SqlCatalog.bm25Read("sqlc_pbm2", st, numBuckets = 4, maxTerms = 2),
      SqlCatalog.phraseRead("sqlc_pph2", st, numBuckets = 4, maxTerms = 2)))
    val over = intercept[Exception] {
      spark.sql("SELECT * FROM sqlc_pbm2('spark tok3 tok4', 2)").collect()
    }
    assert(over.getMessage.contains("at most 2 query terms") ||
      Option(over.getCause).exists(_.getMessage.contains("at most 2 query terms")),
      s"expected the maxTerms refusal, got: ${over.getMessage}")
    assert(spark.sql("SELECT * FROM sqlc_pph2('tok3 extra3 spark')")
      .as[(Long, Long)].collect().toSeq === Seq(3L -> 1L))
  }

  test("registerStateTable refuses swap leftovers (stale partition values must not register)") {
    val d = tmpDir("sqlc-dirty")
    Seq(("g1", 1L)).toDF("g", "v").write.parquet(s"$d/t/bucket=0")
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$d/t/bucket=1.tmp"))
    val e = intercept[IllegalArgumentException] {
      SqlCatalog.registerStateTable(spark, "sqlc_dirty", s"$d/t",
        StructType(Seq(StructField("g", StringType),
          StructField("v", LongType))))
    }
    assert(e.getMessage.contains("bucket=1.tmp"))
    // a never-folded table registers empty instead of erroring
    SqlCatalog.registerStateTable(spark, "sqlc_absent", s"$d/absent",
      StructType(Seq(StructField("g", StringType),
        StructField("v", LongType))))
    assert(spark.sql("SELECT * FROM sqlc_absent").isEmpty)
  }
}
