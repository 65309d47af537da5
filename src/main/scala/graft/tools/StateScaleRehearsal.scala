package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{IncrementalJoinAggN, IncrementalNearDup}

/** STATE-scale rehearsal for the bucketed STREAMING folds (r10 VERDICT
  * task 5; dev aid, not part of the driver contract): the r10/r11
  * rehearsals prove ≡-batch and bucket economics at sf0.1 — this one
  * proves the ECONOMICS HOLD AS STATE GROWS. For the near-dup fold and
  * the chain join-agg fold, enter a 1× corpus and an N× id-shifted
  * corpus (bootstrap — the sanctioned corpus-entry path), then fold the
  * IDENTICAL probe batch into each and measure wall time, shuffle-write
  * bytes, and the bucket directories actually rewritten (filesystem
  * diff, not the analytic key count). The claim under test: per-batch
  * cost ∝ batch, not accumulated state — wall/shuffle stay near-flat
  * and the touched-bucket count is IDENTICAL while state grows N×.
  *
  * {{{ sbt "runMain graft.tools.StateScaleRehearsal /root/testdata/sf0.1 10" }}}
  */
object StateScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    // optional section filter: all | neardup | joinagg | star
    val which = args.drop(2).headOption.getOrElse("all")
    def sectionOn(name: String): Boolean = which == "all" || which == name
    // optional bucket-count override for the star section — the
    // bucket-size control knob: at N x state, N x buckets keeps the
    // per-bucket bytes (and so the probe's read cost) at the 1x level
    val starBuckets = args.drop(3).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

    /** Per-bucket content signature across every `bucket=<n>` dir under
      * `root` — the filesystem truth of what a fold rewrote. */
    def bucketSigs(root: String): Map[String, Long] = {
      def walk(p: Path): Seq[Path] = {
        if (!fs.exists(p)) return Nil
        val st = fs.listStatus(p).filter(_.isDirectory)
        st.filter(_.getPath.getName.matches("bucket=\\d+")).map(_.getPath).toSeq ++
          st.filterNot(_.getPath.getName.matches("bucket=\\d+"))
            .flatMap(s => walk(s.getPath))
      }
      walk(new Path(root)).map { b =>
        val sig = fs.listStatus(b).map(f =>
          s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
          .sorted.mkString("|").hashCode.toLong
        b.toString -> sig
      }.toMap
    }

    def measure(label: String, stateRoot: String)(fold: => Unit): Unit = {
      val before = bucketSigs(stateRoot)
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      shuffleBytes.set(0)
      val t0 = System.nanoTime()
      fold
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      val after = bucketSigs(stateRoot)
      val changed = after.count { case (p, s) => before.get(p).forall(_ != s) }
      println(f"STATESCALE $label%-28s fold ${sec}%7.2f s  shuffleWrite ${shuffleBytes.get / 1048576.0}%8.1f MiB  buckets rewritten $changed%d/${after.size}%d")
      graft.operators.Caching.releaseAll()
    }

    // ---------------------------------------------------- near-dup ----
    // identical probe batch at both scales: 10 fresh-id docs, half
    // sampled from the corpus (guaranteed near-dup collisions), half
    // unique synthetic texts — SMALL so the touched-bucket fraction is
    // the signal (a batch of B+ distinct ids trivially covers every
    // bucket; real steady-state batches are probe-sized)
    val docs = graft.Tables.documents(spark, dir)
    val probeDocs = docs.orderBy("doc_id").limit(5)
      .select((col("doc_id") + 900000000000L).as("doc_id"), col("text"))
      .unionByName((1 to 5).map(i =>
          (900000100000L + i, s"unique probe text nr $i with enough words to shingle properly and not collide"))
        .toDF("doc_id", "text"))
      .cache()
    probeDocs.count()

    if (sectionOn("neardup")) Seq(1, copies).foreach { n =>
      val corpus = (0 until n)
        .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L)))
        .reduce(_ unionByName _)
      val state = java.nio.file.Files.createTempDirectory(s"ssr-nd-$n").toString
      val t0 = System.nanoTime()
      IncrementalNearDup.bootstrap(corpus, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8,
        stateDir = state, numBuckets = 64)
      println(f"STATESCALE neardup ${n}x bootstrap ${(System.nanoTime() - t0) / 1e9}%7.2f s (${corpus.count()}%d docs)")
      measure(s"neardup probe @${n}x state", state) {
        IncrementalNearDup.processBatch(probeDocs, "doc_id", "text",
          shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8,
          stateDir = state, batchId = 1000L, numBuckets = 64)
      }
    }

    // ------------------------------------------- chain join-agg ----
    // identical probe batch at both scales: 200 new facts under 3 new
    // orders + 5 customer re-segments (small key sets — see above)
    val facts = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k"),
        (monotonically_increasing_id() + 1L).as("id"),
        graft.functions.cents(col("l_extendedprice")).as("m"))
    val d1 = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("v"))
    val d2 = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"), col("c_mktsegment").as("v"))
    val maxOrd = d1.agg(max("k")).collect().head.getLong(0)
    val probeF = (1L to 200L).map(i =>
      (maxOrd + 1L + (i % 3), 950000000000L + i, 100L + i)).toDF("k", "id", "m")
    val probeD1 = (0L until 3L).map(i => (maxOrd + 1L + i, 1L + i)).toDF("k", "v")
    val probeD2 = d2.orderBy("k").limit(5)
      .select(col("k"), concat(lit("SEG_"), col("k")).as("v"))
    val noDel = probeF.select("k", "id").limit(0)

    if (sectionOn("joinagg")) Seq(1, copies).foreach { n =>
      // every copy gets its own orders AND customers (keys shifted on
      // both levels), so the probe's 50 base-copy re-segments affect the
      // SAME subtree size at both scales — the probe is identical work,
      // only the accumulated state differs
      val f = (0 until n).map(i => facts
          .select((col("k") + lit(i.toLong * 100000000L)).as("k"),
            (col("id") + lit(i.toLong * 10000000000L)).as("id"), col("m")))
        .reduce(_ unionByName _)
      val o = (0 until n).map(i => d1
          .select((col("k") + lit(i.toLong * 100000000L)).as("k"),
            (col("v") + lit(i.toLong * 100000000L)).as("v")))
        .reduce(_ unionByName _)
      val c = (0 until n).map(i => d2
          .select((col("k") + lit(i.toLong * 100000000L)).as("k"), col("v")))
        .reduce(_ unionByName _)
      val state = java.nio.file.Files.createTempDirectory(s"ssr-ja-$n").toString
      val t0 = System.nanoTime()
      IncrementalJoinAggN.bootstrap(f, "k", "id", "m",
        Seq(o, c), Seq(("k", "v"), ("k", "v")), state, 0L, numBuckets = 16)
      println(f"STATESCALE joinagg ${n}x bootstrap ${(System.nanoTime() - t0) / 1e9}%7.2f s (${f.count()}%d facts)")
      measure(s"joinagg probe @${n}x state", state) {
        IncrementalJoinAggN.processBatch(probeF, "k", "id", "m", noDel, "k", "id",
          Seq(probeD1, probeD2), Seq(("k", "v"), ("k", "v")),
          state, 1000L, numBuckets = 16)
      }
    }

    // ------------------------------------------------ star join-agg ----
    // the r11 family code path (Q5 shape: 4-level branch + supplier
    // branch, cross-branch equality, literal filter). Identical probe at
    // both scales: 3 new lineitems under one new order/customer/supplier
    // chain + 5 BASE-COPY customer re-keys (each copy owns its keys, so
    // the re-key subtree is the same size at 1x and Nx).
    import graft.streaming.IncrementalJoinAggStar
    val starSpec = IncrementalJoinAggStar.StarSpec(Seq(4, 1),
      groupAttrs = Seq((1, 3)), eqAttrs = Seq(((1, 2), (2, 1))),
      litAttrs = Seq(((1, 4), "ASIA")))
    val sFacts = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k1"), col("l_suppkey").as("k2"),
        (monotonically_increasing_id() + 1L).as("id"),
        graft.functions.cents(col("l_extendedprice")).as("m"))
    val sD11 = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("vl"),
        lit(null).cast("string").as("vs"))
    val sD12 = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"),
        col("c_nationkey").cast("long").as("vl"),
        col("c_nationkey").cast("string").as("vs"))
    val sD13 = graft.Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"),
        col("n_regionkey").cast("long").as("vl"), col("n_name").as("vs"))
    val sD14 = graft.Tables.region(spark, dir)
      .select(col("r_regionkey").cast("long").as("k"),
        lit(null).cast("long").as("vl"), col("r_name").as("vs"))
    val sD21 = graft.Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("k"),
        lit(null).cast("long").as("vl"),
        col("s_nationkey").cast("string").as("vs"))
    val sMaxOrd = sD11.agg(max("k")).collect().head.getLong(0)
    val sMaxCust = sD12.agg(max("k")).collect().head.getLong(0)
    val sMaxSupp = sD21.agg(max("k")).collect().head.getLong(0)
    val sMaxNat = sD13.agg(max("k")).collect().head.getLong(0)
    val sProbeF = (1L to 3L).map(i =>
      (990000000001L, 990000000001L, 970000000000L + i, 100L * i))
      .toDF("k1", "k2", "id", "m")
    val sProbeO = Seq((990000000001L, 990000000001L, null.asInstanceOf[String]))
      .toDF("k", "vl", "vs")
    val sProbeC = Seq((990000000001L, 0L, "0")).toDF("k", "vl", "vs")
    val sProbeS = Seq((990000000001L, null.asInstanceOf[java.lang.Long], "0"))
      .toDF("k", "vl", "vs").select(col("k"), col("vl").cast("long"), col("vs"))
    val sRekeyC = sD12.orderBy("k").limit(5)
      .select(col("k"), ((col("vl") + 1L) % (sMaxNat + 1L)).as("vl"),
        ((col("vl") + 1L) % (sMaxNat + 1L)).cast("string").as("vs"))
      .cache()
    sRekeyC.count()
    val sNoF = sProbeF.limit(0); val sNoDel = sProbeF.select("k1", "k2", "id").limit(0)
    val sNoD = sD13.limit(0)

    if (sectionOn("star")) Seq(1, copies).foreach { n =>
      val f = (0 until n).map(i => sFacts
          .select((col("k1") + lit(i.toLong * 100000000L)).as("k1"),
            (col("k2") + lit(i.toLong * 100000000L)).as("k2"),
            (col("id") + lit(i.toLong * 10000000000L)).as("id"), col("m")))
        .reduce(_ unionByName _)
      val o = (0 until n).map(i => sD11
          .select((col("k") + lit(i.toLong * 100000000L)).as("k"),
            (col("vl") + lit(i.toLong * 100000000L)).as("vl"), col("vs")))
        .reduce(_ unionByName _)
      val c = (0 until n).map(i => sD12
          .select((col("k") + lit(i.toLong * 100000000L)).as("k"),
            col("vl"), col("vs")))
        .reduce(_ unionByName _)
      val su = (0 until n).map(i => sD21
          .select((col("k") + lit(i.toLong * 100000000L)).as("k"),
            col("vl"), col("vs")))
        .reduce(_ unionByName _)
      val state = java.nio.file.Files.createTempDirectory(s"ssr-star-$n").toString
      val t0 = System.nanoTime()
      IncrementalJoinAggStar.bootstrap(starSpec,
        f, Seq("k1", "k2"), "id", "m",
        Seq(Seq(o, c, sD13, sD14), Seq(su)),
        Seq(Seq.fill(4)(("k", "vl", "vs")), Seq(("k", "vl", "vs"))),
        state, 0L, numBuckets = starBuckets)
      println(f"STATESCALE star ${n}x bootstrap ${(System.nanoTime() - t0) / 1e9}%7.2f s (${f.count()}%d facts)")
      measure(s"star probe @${n}x state B=$starBuckets", state) {
        IncrementalJoinAggStar.processBatch(starSpec,
          sProbeF, Seq("k1", "k2"), "id", "m", sNoDel, Seq("k1", "k2"), "id",
          Seq(Seq(sProbeO, sProbeC.unionByName(sRekeyC), sNoD, sNoD), Seq(sProbeS)),
          Seq(Seq.fill(4)(("k", "vl", "vs")), Seq(("k", "vl", "vs"))),
          state, 1000L, numBuckets = starBuckets)
      }
    }
    // ------------------------------------------- temporal join-agg ----
    // R160: identical probe at both scales — 10 new purchases, 3 LATE
    // versions (each retro-reassigns the base-copy user's facts in its
    // span), and 1 version delete, all on BASE-COPY users (per-copy
    // keys are disjoint, so the affected subtree is the same size at
    // 1x and Nx; only accumulated state differs).
    import graft.streaming.IncrementalTemporalJoinAgg
    val ev = graft.Tables.events(spark, dir)
    val tFacts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"), col("user_id").as("k"))
    val tDims = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))

    if (sectionOn("temporal")) {
      val (tMin, tMax) = tFacts.agg(min("t"), max("t")).as[(Long, Long)]
        .collect().head
      val users = tFacts.select("k").distinct().orderBy("k").limit(2)
        .as[Long].collect()
      val delVf = tDims.filter(col("k") === users(0)).agg(min("vf"))
        .as[Long].collect().head
      val mid = tMin + (tMax - tMin) / 2
      val tProbeF = (1L to 10L).map(i =>
        (980000000000L + i, tMin + i * 1000L, 100L + i, users((i % 2).toInt)))
        .toDF("id", "t", "m", "k")
      val tProbeUp = Seq((users(0), mid, "late1"), (users(1), mid + 7L, "late2"),
        (users(0), tMin + 1L, "late3")).toDF("k", "vf", "vs")
      val tProbeDel = Seq((users(0), delVf)).toDF("k", "vf")
      val tNoF = tProbeF.limit(0); val tNoFD = tProbeF.select("id", "k").limit(0)
      Seq(1, copies).foreach { n =>
        val f = (0 until n).map(i => tFacts
            .select((col("id") + lit(i.toLong * 10000000000L)).as("id"),
              col("t"), col("m"),
              (col("k") + lit(i.toLong * 1000000000L)).as("k")))
          .reduce(_ unionByName _)
        val d = (0 until n).map(i => tDims
            .select((col("k") + lit(i.toLong * 1000000000L)).as("k"),
              col("vf"), col("vs")))
          .reduce(_ unionByName _)
        val state = java.nio.file.Files.createTempDirectory(s"ssr-tja-$n").toString
        val t0 = System.nanoTime()
        IncrementalTemporalJoinAgg.bootstrap(f, d, state, 0L, numBuckets = 16)
        println(f"STATESCALE temporal ${n}x bootstrap ${(System.nanoTime() - t0) / 1e9}%7.2f s (${f.count()}%d facts)")
        measure(s"temporal probe @${n}x state", state) {
          IncrementalTemporalJoinAgg.processBatch(tProbeF, tNoFD,
            tProbeUp, tProbeDel, state, 1000L, numBuckets = 16)
        }
      }
    }

    // ------------------------------------------- temporal STAR ----
    // R162: the 2-branch as-of view (seg from views, tier from clicks),
    // identical probe at both scales — 10 new purchases + a LATE version
    // and a version delete on EACH branch, all on base-copy users.
    if (sectionOn("temporalstar")) {
      import graft.streaming.IncrementalTemporalStar
      val tDims2 = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
          concat(lit("t"), (get_json_object(col("props"), "$.k").cast("int") % 3)
            .cast("string")).as("vs"))
      val (tMin, tMax) = tFacts.agg(min("t"), max("t")).as[(Long, Long)]
        .collect().head
      // pick probe users that carry versions on BOTH branches (a fact
      // key with no view/click events would make min(vf) NULL)
      val users = tFacts.select("k")
        .join(tDims.select("k"), Seq("k"), "left_semi")
        .join(tDims2.select("k"), Seq("k"), "left_semi")
        .distinct().orderBy("k").limit(2)
        .as[Long].collect()
      require(users.length == 2, "need 2 users with versions on both branches")
      val del1 = tDims.filter(col("k") === users(0)).agg(min("vf"))
        .as[Long].collect().head
      val del2 = tDims2.filter(col("k") === users(1)).agg(min("vf"))
        .as[Long].collect().head
      val mid = tMin + (tMax - tMin) / 2
      val pF = (1L to 10L).map(i =>
        (985000000000L + i, tMin + i * 1000L, 100L + i,
          users((i % 2).toInt), users(((i + 1) % 2).toInt)))
        .toDF("id", "t", "m", "k1", "k2")
      val pU1 = Seq((users(0), mid, "late1")).toDF("k", "vf", "vs")
      val pU2 = Seq((users(1), mid + 7L, "late2")).toDF("k", "vf", "vs")
      val pD1 = Seq((users(0), del1)).toDF("k", "vf")
      val pD2 = Seq((users(1), del2)).toDF("k", "vf")
      val noFD2 = pF.select("id", "k1", "k2").limit(0)
      Seq(1, copies).foreach { n =>
        val f = (0 until n).map(i => tFacts
            .select((col("id") + lit(i.toLong * 10000000000L)).as("id"),
              col("t"), col("m"),
              (col("k") + lit(i.toLong * 1000000000L)).as("k1"),
              (col("k") + lit(i.toLong * 1000000000L)).as("k2")))
          .reduce(_ unionByName _)
        def shifted(d: DataFrame) = (0 until n).map(i => d
            .select((col("k") + lit(i.toLong * 1000000000L)).as("k"),
              col("vf"), col("vs")))
          .reduce(_ unionByName _)
        val state = java.nio.file.Files.createTempDirectory(s"ssr-tstar-$n").toString
        val t0 = System.nanoTime()
        IncrementalTemporalStar.bootstrap(f,
          Seq(shifted(tDims), shifted(tDims2)), state, 0L, numBuckets = 16)
        println(f"STATESCALE temporalstar ${n}x bootstrap ${(System.nanoTime() - t0) / 1e9}%7.2f s (${f.count()}%d facts)")
        measure(s"temporalstar probe @${n}x state", state) {
          IncrementalTemporalStar.processBatch(pF, noFD2,
            Seq(pU1, pU2), Seq(pD1, pD2), state, 1000L, numBuckets = 16)
        }
      }
    }
    // ------------------------------------------- MIXED star (r12) ----
    // R167: branch 1 = as-of (views -> segment), branch 2 = interval
    // (purchase windows, fan-out) on ONE maintained view. Identical
    // probe at both scales — 10 new clicks + a LATE version on the
    // as-of branch + a window replace AND delete on the interval
    // branch, all on base-copy users.
    if (sectionOn("mixedstar")) {
      import graft.streaming.IncrementalTemporalStar
      val mFacts = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
          graft.functions.cents(col("value")).as("m"),
          col("user_id").as("k1"), col("user_id").as("k2"))
      val mInts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("iid"), col("user_id").as("k"),
          expr("ts DIV 1000").as("s"),
          expr("ts DIV 1000 + 600000000").as("e"),
          concat(lit("b"), (graft.functions.cents(col("value")) % 5)
            .cast("string")).as("vs"))
      val users = mFacts.select(col("k1").as("k"))
        .join(tDims.select("k"), Seq("k"), "left_semi")
        .join(mInts.select("k"), Seq("k"), "left_semi")
        .distinct().orderBy("k").limit(2).as[Long].collect()
      require(users.length == 2, "need 2 users with clicks, views, and windows")
      val (tMin2, tMax2) = mFacts.agg(min("t"), max("t")).as[(Long, Long)]
        .collect().head
      val mid2 = tMin2 + (tMax2 - tMin2) / 2
      val rep = mInts.filter(col("k") === users(0)).orderBy("iid").limit(1)
        .as[(Long, Long, Long, Long, String)].collect().head
      val del = mInts.filter(col("k") === users(1)).orderBy("iid").limit(1)
        .select("iid", "k").as[(Long, Long)].collect().head
      val pF = (1L to 10L).map(i =>
        (986000000000L + i, rep._3 + i * 1000L, 100L + i,
          users((i % 2).toInt), users((i % 2).toInt)))
        .toDF("id", "t", "m", "k1", "k2")
      val pU1 = Seq((users(0), mid2, "late1")).toDF("k", "vf", "vs")
      val pU2 = Seq(
        (rep._1, rep._2, rep._3, rep._4 + 300000000L, "rep"),
        (986100000001L, users(1), rep._3, rep._3 + 600000000L, "new"))
        .toDF("iid", "k", "s", "e", "vs")
      val pD1 = Seq.empty[(Long, Long)].toDF("k", "vf")
      val pD2 = Seq(del).toDF("iid", "k")
      val noFD2 = pF.select("id", "k1", "k2").limit(0)
      Seq(1, copies).foreach { n =>
        val f = (0 until n).map(i => mFacts
            .select((col("id") + lit(i.toLong * 10000000000L)).as("id"),
              col("t"), col("m"),
              (col("k1") + lit(i.toLong * 1000000000L)).as("k1"),
              (col("k2") + lit(i.toLong * 1000000000L)).as("k2")))
          .reduce(_ unionByName _)
        val d1s = (0 until n).map(i => tDims
            .select((col("k") + lit(i.toLong * 1000000000L)).as("k"),
              col("vf"), col("vs")))
          .reduce(_ unionByName _)
        val d2s = (0 until n).map(i => mInts
            .select((col("iid") + lit(i.toLong * 10000000000L)).as("iid"),
              (col("k") + lit(i.toLong * 1000000000L)).as("k"),
              col("s"), col("e"), col("vs")))
          .reduce(_ unionByName _)
        val state = java.nio.file.Files.createTempDirectory(s"ssr-mstar-$n").toString
        val t0 = System.nanoTime()
        IncrementalTemporalStar.bootstrap(f, Seq(d1s, d2s), state, 0L,
          numBuckets = 16, intervalBranches = Set(2))
        println(f"STATESCALE mixedstar ${n}x bootstrap ${(System.nanoTime() - t0) / 1e9}%7.2f s (${f.count()}%d facts)")
        measure(s"mixedstar probe @${n}x state", state) {
          IncrementalTemporalStar.processBatch(pF, noFD2,
            Seq(pU1, pU2), Seq(pD1, pD2), state, 1000L, numBuckets = 16,
            intervalBranches = Set(2))
        }
      }
    }

    // ------------------------------------------- interval join-agg ----
    // R165: clicks against 10-minute purchase windows (x128's shape),
    // identical probe at both scales — 10 new clicks on base-copy
    // users, one window replace, one window delete, two new windows.
    if (sectionOn("interval")) {
      import graft.streaming.IncrementalIntervalJoinAgg
      val iFacts = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
          graft.functions.cents(col("value")).as("m"), col("user_id").as("k"))
      val iInts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("iid"), col("user_id").as("k"),
          expr("ts DIV 1000").as("s"),
          expr("ts DIV 1000 + 600000000").as("e"),
          concat(lit("b"), (graft.functions.cents(col("value")) % 5)
            .cast("string")).as("vs"))
      // probe users that carry BOTH clicks and windows
      val users = iFacts.select("k")
        .join(iInts.select("k"), Seq("k"), "left_semi")
        .distinct().orderBy("k").limit(2).as[Long].collect()
      require(users.length == 2, "need 2 users with clicks and windows")
      val rep = iInts.filter(col("k") === users(0))
        .orderBy("iid").limit(1)
        .as[(Long, Long, Long, Long, String)].collect().head
      val del = iInts.filter(col("k") === users(1))
        .orderBy("iid").limit(1)
        .select("iid", "k").as[(Long, Long)].collect().head
      val pF = (1L to 10L).map(i =>
        (987000000000L + i, rep._3 + i * 1000L, 100L + i,
          users((i % 2).toInt)))
        .toDF("id", "t", "m", "k")
      val pUp = Seq(
        (rep._1, rep._2, rep._3, rep._4 + 300000000L, "rep"),
        (987100000001L, users(0), rep._3, rep._3 + 600000000L, "new1"),
        (987100000002L, users(1), rep._3, rep._3 + 600000000L, "new2"))
        .toDF("iid", "k", "s", "e", "vs")
      val pDel = Seq(del).toDF("iid", "k")
      val noFD = pF.select("id", "k").limit(0)
      Seq(1, copies).foreach { n =>
        val f = (0 until n).map(i => iFacts
            .select((col("id") + lit(i.toLong * 10000000000L)).as("id"),
              col("t"), col("m"),
              (col("k") + lit(i.toLong * 1000000000L)).as("k")))
          .reduce(_ unionByName _)
        val iv = (0 until n).map(i => iInts
            .select((col("iid") + lit(i.toLong * 10000000000L)).as("iid"),
              (col("k") + lit(i.toLong * 1000000000L)).as("k"),
              col("s"), col("e"), col("vs")))
          .reduce(_ unionByName _)
        val state = java.nio.file.Files.createTempDirectory(s"ssr-ija-$n").toString
        val t0 = System.nanoTime()
        IncrementalIntervalJoinAgg.bootstrap(f, iv, state, 0L, numBuckets = 16)
        println(f"STATESCALE interval ${n}x bootstrap ${(System.nanoTime() - t0) / 1e9}%7.2f s (${f.count()}%d facts)")
        measure(s"interval probe @${n}x state", state) {
          IncrementalIntervalJoinAgg.processBatch(pF, noFD, pUp, pDel,
            state, 1000L, numBuckets = 16)
        }
      }
    }

    // ------------------------------------------------- sessions ----
    // R166: identical probe at both scales — 10 new events on 2
    // base-copy users (some bridging existing sessions — real merges)
    // and 2 deletes of their earliest retained events (real splits).
    if (sectionOn("sessions")) {
      import graft.streaming.IncrementalSessions
      val gapUs = 30L * 60L * 1000000L
      val sEv = ev.select(col("event_id").as("id"),
        expr("ts DIV 1000").as("t"), col("user_id").as("k"))
      val users = sEv.select("k").distinct().orderBy("k").limit(2)
        .as[Long].collect()
      val anchor = sEv.filter(col("k") === users(0)).agg(min("t"))
        .as[Long].collect().head
      val dels = users.toSeq.map { u =>
        sEv.filter(col("k") === u).orderBy("t", "id")
          .select("id", "k").as[(Long, Long)].collect().head
      }
      val pE = (1L to 10L).map(i =>
        (989000000000L + i, anchor + i * (gapUs / 2), users((i % 2).toInt)))
        .toDF("id", "t", "k")
      val pD = dels.toDF("id", "k")
      Seq(1, copies).foreach { n =>
        val e = (0 until n).map(i => sEv
            .select((col("id") + lit(i.toLong * 10000000000L)).as("id"),
              col("t"),
              (col("k") + lit(i.toLong * 1000000000L)).as("k")))
          .reduce(_ unionByName _)
        val state = java.nio.file.Files.createTempDirectory(s"ssr-ses-$n").toString
        val t0 = System.nanoTime()
        IncrementalSessions.bootstrap(e, gapUs, state, 0L, numBuckets = 16)
        println(f"STATESCALE sessions ${n}x bootstrap ${(System.nanoTime() - t0) / 1e9}%7.2f s (${e.count()}%d events)")
        measure(s"sessions probe @${n}x state", state) {
          IncrementalSessions.processBatch(pE, pD, gapUs, state, 1000L,
            numBuckets = 16)
        }
      }
    }
    // ---- SKEWED value-multiplicity layout (R173): a planted 10^6-value
    //      dominant group (the LEFT-null-group / giant-segment shape)
    //      folded under the plain g-keyed layout vs valueSubBuckets=8.
    //      Claims under test: (a) the plain layout concentrates the
    //      whole group in ONE bucket whose rewrite is O(group) every
    //      touching batch; (b) sub-bucketing drops the per-bucket bound
    //      ~S x and the touching batch rewrites S smaller buckets
    //      CONCURRENTLY; (c) point reads/quantiles unchanged-exact. ----
    if (sectionOn("skew")) {
      import graft.streaming.IncrementalExtrema
      val giantN = 1000000
      val giant = spark.range(giantN.toLong)
        .select(lit("giant").as("g"), col("id").as("v"), lit(1L).as("w"))
      val rest = spark.range(1000L)
        .select(concat(lit("s"), (col("id") % 20).cast("string")).as("g"),
          col("id").as("v"), lit(1L).as("w"))
      val probe = spark.range(500L) // touches the giant group: 250 dels + 250 adds
        .select(lit("giant").as("g"),
          when(col("id") < 250, col("id")).otherwise(col("id") + giantN).as("v"),
          when(col("id") < 250, lit(-1L)).otherwise(lit(1L)).as("w"))
      def giantBuckets(state: String): Seq[Long] = {
        val base = new java.io.File(s"$state/extrema")
        base.listFiles().filter(_.getName.matches("bucket=\\d+")).toSeq
          .map(d => spark.read.parquet(d.toString)
            .filter(col("g") === "giant").count()).filter(_ > 0)
      }
      Seq(1, 8).foreach { s =>
        val state = java.nio.file.Files.createTempDirectory(s"ssr-skew-$s").toString
        val t0 = System.nanoTime()
        IncrementalExtrema.processBatch(giant.unionByName(rest), state, 0L,
          numBuckets = 16, subBuckets = s)
        println(f"STATESCALE skew S=$s%d seed-fold ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        val pb = giantBuckets(state)
        println(s"STATESCALE skew S=$s giant per-bucket rows: " +
          s"n=${pb.size} max=${pb.max} (sum=${pb.sum})")
        measure(s"skew probe fold S=$s (touches the giant group)", state) {
          IncrementalExtrema.processBatch(probe, state, 1L,
            numBuckets = 16, subBuckets = s)
        }
        val t1 = System.nanoTime()
        val pt = IncrementalExtrema.viewFor(spark, state,
            Seq("giant", "s3"), numBuckets = 16, subBuckets = s)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).sortBy(_._1).toSeq
        println(f"STATESCALE skew S=$s%d point-read ${(System.nanoTime() - t1) / 1e9}%7.2f s -> $pt")
      }
    }
    spark.stop()
  }
}
