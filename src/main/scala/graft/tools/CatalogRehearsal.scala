package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sinks.{ChangelogShip, JdbcClickHouseSink}
import graft.streaming._

/** View-CATALOG rehearsal (r12, VERDICT task 7 — dev aid, not part of
  * the driver contract): binds the sf events corpus as ONE CDC source
  * to a catalog of two base views (cohort revenue join-agg, per-user
  * sessions), a derived view and a rollup lattice over the revenue
  * changelog, and an external Derby ship — folded batch-by-batch
  * through [[ViewCatalog.runBatch]] under one batch-id domain, with an
  * injected CRASH between the derived and rollup stages of one batch.
  *
  * Verifies, batch-wise and at close: every view ≡ an independent twin
  * fold of the same slices (content + [[MvPipeline.stateDigest]]), the
  * crash leaves the completion floor unmoved and the replay converges,
  * a fully-applied batch skips wholesale, the shipped table folds to
  * the view, and [[StateAudit]] is clean catalog-wide — the evidence
  * ARCHITECTURE §4 cites for the operability layer.
  *
  * {{{ sbt "runMain graft.tools.CatalogRehearsal /root/testdata/sf0.1 5" }}}
  */
object CatalogRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val gapNs = 30L * 60 * 1000000000L // 30 min in epoch-nanos
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .cache()
    val n = ev.count()
    println(s"[catalog] $n events from $dir in $nBatches batches")

    val root = java.nio.file.Files.createTempDirectory("catalog-rehearsal").toString
    val sA = s"$root/rev"; val sB = s"$root/ses"
    val sD = s"$root/der"; val sR = s"$root/roll"; val cat = s"$root/cat"
    val tA = s"$root/t_rev"; val tB = s"$root/t_ses"
    val tD = s"$root/t_der"; val tR = s"$root/t_roll"
    val db = "catreh"
    val sink = new JdbcClickHouseSink(s"jdbc:derby:memory:$db;create=true", "app", "")
    val dSchema = StructType(Seq(StructField("g", StringType),
      StructField("total", LongType), StructField("pairs", LongType)))

    // stage bodies, parameterized by target dirs so the catalog and the
    // independent twin run EXACTLY the same folds
    def foldRevenue(state: String)(b: DataFrame, id: Long): Unit =
      IncrementalJoinAgg.processBatch(
        b.select(pmod(col("user_id"), lit(50L)).as("jk"),
          col("event_id").as("id"), graft.functions.cents(col("value")).as("m")),
        "jk", "id", "m",
        // cohort dim rows ride batch 0 of the same CDC domain
        (if (id == 0L) (0L until 50L).map(k => (k, s"cohort${k % 7}")).toDF("jk", "g")
         else Seq.empty[(Long, String)].toDF("jk", "g")),
        "jk", "g", state, id, numBuckets = 16)
    def foldSessions(state: String)(b: DataFrame, id: Long): Unit =
      IncrementalSessions.processBatch(
        b.select(col("event_id").as("id"), col("ts").as("t"),
          col("user_id").as("k")),
        Seq.empty[(Long, Long)].toDF("id", "k"),
        gap = gapNs, stateDir = state, batchId = id, numBuckets = 16)
    def foldDerived(base: String, state: String)(id: Long): Unit = {
      val touched = IncrementalJoinAgg.changelog(spark, base)
        .filter(col("batch") === id).select("g").distinct()
      DerivedView.processBatch(spark, touched,
        IncrementalJoinAgg.view(spark, base)
          .join(touched, Seq("g"), "left_semi"),
        state, id, numBuckets = 16)
    }
    def foldRollup(base: String, state: String)(id: Long): Unit =
      RollupMaintenance.processBatch(
        IncrementalJoinAgg.changelog(spark, base).filter(col("batch") === id)
          .select(col("g"), col("dtotal").as("m"), col("dpairs").as("c")),
        state, Seq(Seq(0), Seq()), id, numBuckets = 16)

    def catalogFor(a: String, b: String, d: String, r: String,
        table: String): ViewCatalog.Catalog = ViewCatalog.Catalog(
      bases = Seq(ViewCatalog.Stage("revenue")(foldRevenue(a)),
        ViewCatalog.Stage("sessions")(foldSessions(b))),
      derived = Seq(ViewCatalog.Stage("derived")((_, id) => foldDerived(a, d)(id)),
        ViewCatalog.Stage("rollup")((_, id) => foldRollup(a, r)(id))),
      ships = Seq(ViewCatalog.Stage("ship")((_, _) =>
        ChangelogShip.ship(IncrementalJoinAgg.changelog(spark, a),
          "batch", sink, table, a))))
    val catalog = catalogFor(sA, sB, sD, sR, "cat_cl")
    // concurrent-tier twin: same stages into its own dirs
    val cA = s"$root/c_rev"; val cB = s"$root/c_ses"
    val cD = s"$root/c_der"; val cR = s"$root/c_roll"; val cCat = s"$root/c_cat"
    val catalogC = catalogFor(cA, cB, cD, cR, "cat_cl_c")
    // crash variant: dies AFTER derived, BEFORE rollup/ship
    val crashing = catalog.copy(derived = catalog.derived.take(1) :+
      ViewCatalog.Stage("bomb")((_, _) =>
        throw new RuntimeException("injected crash")))

    def digest(df: DataFrame): Long =
      MvPipeline.stateDigest(df).as[Long].collect().head
    def assertConverged(tag: String): Unit = {
      val pairs = Seq(
        "revenue" -> (IncrementalJoinAgg.view(spark, sA),
          IncrementalJoinAgg.view(spark, tA)),
        "sessions" -> (IncrementalSessions.view(spark, sB),
          IncrementalSessions.view(spark, tB)),
        "derived" -> (DerivedView.view(spark, sD, dSchema),
          DerivedView.view(spark, tD, dSchema)),
        "rollup0" -> (RollupMaintenance.view(spark, sR, Seq(0)),
          RollupMaintenance.view(spark, tR, Seq(0))),
        "rollupT" -> (RollupMaintenance.view(spark, sR, Seq()),
          RollupMaintenance.view(spark, tR, Seq())))
      pairs.foreach { case (name, (c, t)) =>
        val (dc, dt) = (digest(c), digest(t))
        require(dc == dt, s"$tag: $name catalog digest $dc != twin $dt")
      }
      val shipped = spark.read.format("jdbc")
        .option("url", s"jdbc:derby:memory:$db").option("dbtable", "cat_cl")
        .load().distinct()
        .groupBy("g").agg(sum("dtotal").as("total"), sum("dpairs").as("pairs"))
        .filter(col("pairs") > 0)
      val vd = digest(IncrementalJoinAgg.view(spark, sA))
      val sd = digest(shipped.select("g", "total", "pairs"))
      require(vd == sd, s"$tag: shipped fold digest $sd != view $vd")
      println(s"[catalog] $tag: 5 view digests + shipped fold all ≡ twin")
    }

    val crashAt = nBatches - 2
    (0 until nBatches).foreach { i =>
      val b = ev.filter(pmod(col("event_id"), lit(nBatches.toLong)) === i)
      val t0 = System.nanoTime()
      if (i == crashAt) {
        try { ViewCatalog.runBatch(spark, crashing, cat, b, i.toLong); ??? }
        catch { case _: RuntimeException => }
        require(ViewCatalog.completedFloor(spark, cat) == i - 1L,
          "crash must leave the floor unmoved")
        println(f"[catalog] batch $i%d: CRASH injected after derived " +
          f"(floor still ${i - 1}%d); replaying through the full cascade")
      }
      val ran = ViewCatalog.runBatch(spark, catalog, cat, b, i.toLong)
      require(ran, s"batch $i unexpectedly skipped")
      val dt = (System.nanoTime() - t0) / 1e9
      // concurrent-tier twin: the SAME batch with intra-tier fan-out
      val tC0 = System.nanoTime()
      require(ViewCatalog.runBatch(spark, catalogC, cCat, b, i.toLong,
        concurrentTiers = true), s"concurrent batch $i skipped")
      val dtC = (System.nanoTime() - tC0) / 1e9
      // twin: same slices, direct calls
      foldRevenue(tA)(b, i.toLong); foldSessions(tB)(b, i.toLong)
      foldDerived(tA, tD)(i.toLong); foldRollup(tA, tR)(i.toLong)
      println(f"[catalog] batch $i%d: ${b.count()}%d events through 5 stages " +
        f"in $dt%.1f s serial, $dtC%.1f s concurrentTiers")
      assertConverged(s"batch $i")
      require(digest(IncrementalJoinAgg.view(spark, cA)) ==
        digest(IncrementalJoinAgg.view(spark, sA)) &&
        digest(IncrementalSessions.view(spark, cB)) ==
        digest(IncrementalSessions.view(spark, sB)) &&
        digest(DerivedView.view(spark, cD, dSchema)) ==
        digest(DerivedView.view(spark, sD, dSchema)),
        s"batch $i: concurrentTiers store diverged from serial")
      graft.operators.Caching.releaseAll()
    }

    // fully-applied replay skips wholesale
    val bLast = ev.filter(pmod(col("event_id"), lit(nBatches.toLong)) === (nBatches - 1))
    require(!ViewCatalog.runBatch(spark, catalog, cat, bLast, (nBatches - 1).toLong),
      "fully-applied batch must skip")
    println("[catalog] fully-applied replay skipped wholesale (floor)")

    val violations = Seq(sA, sB, sD, sR).flatMap(d => StateAudit.audit(spark, d))
    require(violations.isEmpty, violations.mkString("\n"))
    println("[catalog] StateAudit clean catalog-wide; rehearsal PASSED")
    spark.stop()
  }
}
