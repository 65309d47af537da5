package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalJoinAggStar
import graft.streaming.IncrementalJoinAggStar.StarSpec

/** MEGA-WAVE chunking rehearsal (r12 stretch — dev aid): the Q5 star's
  * region-rename wave (a literal flip three joins from the facts that
  * admits whole nations — the honest affected-subtree worst case) folded
  * twice against IDENTICAL pre-wave state copies: once unchunked, once
  * with `factChunks = C`, which partitions every delta term's pre-state
  * fact side by xxhash64(id) % C and materializes each chunk's
  * pre-aggregated part as its own bounded job before assembling the ONE
  * staged delta. Verifies both folds serve the identical view (and both
  * equal the 6-table batch recompute), and measures the bound that
  * motivates the knob: the LARGEST SINGLE-STAGE shuffle write — the
  * per-job working-set proxy that becomes a memory cliff at 100× —
  * drops with C while total work stays the wave's honest cost.
  *
  * {{{ sbt "runMain graft.tools.ChunkedWaveRehearsal /root/testdata/sf0.1 4" }}}
  */
object ChunkedWaveRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chunks = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val buckets = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage shuffle-write tracking: total and single-stage peak
    val total = new AtomicLong; val peak = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        total.addAndGet(w)
        peak.getAndUpdate(p => math.max(p, w))
      }
    })
    def measured[T](label: String)(body: => T): T = {
      // drain in-flight stage events from the previous window
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      total.set(0); peak.set(0)
      // the wave's real working set is the CACHED `finished` relation
      // (one row per affected fact-tuple under the unchunked fold; the
      // pre-aggregated parts under the chunked one) — sample the RDD
      // storage high-water mark through the fold
      val peakCached = new AtomicLong
      @volatile var sampling = true
      val sampler = new Thread(() => while (sampling) {
        val cur = spark.sparkContext.getRDDStorageInfo
          .map(i => i.memSize + i.diskSize).sum
        peakCached.getAndUpdate(p => math.max(p, cur))
        Thread.sleep(50)
      })
      sampler.setDaemon(true); sampler.start()
      val t0 = System.nanoTime()
      val r = body
      sampling = false; sampler.join()
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      println(f"[chunkwave] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  " +
        f"shuffle total ${total.get / 1048576.0}%8.1f MiB  " +
        f"peak stage ${peak.get / 1048576.0}%8.1f MiB  " +
        f"peak cached ${peakCached.get / 1048576.0}%8.1f MiB")
      r
    }

    val spec = StarSpec(Seq(4, 1), groupAttrs = Seq((1, 3)),
      eqAttrs = Seq(((1, 2), (2, 1))), litAttrs = Seq(((1, 4), "ASIA")))
    val facts = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k1"), col("l_suppkey").as("k2"),
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"), col("l_quantity")))
          .cast("long").as("id"),
        graft.functions.cents(col("l_extendedprice")).as("m"))
      .cache()
    val d11 = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("vl"),
        lit(null).cast("string").as("vs")).cache()
    val d12 = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"),
        col("c_nationkey").cast("long").as("vl"),
        col("c_nationkey").cast("string").as("vs")).cache()
    val d13 = graft.Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"),
        col("n_regionkey").cast("long").as("vl"), col("n_name").as("vs")).cache()
    val d14 = graft.Tables.region(spark, dir)
      .select(col("r_regionkey").cast("long").as("k"),
        lit(null).cast("long").as("vl"), col("r_name").as("vs")).cache()
    val d21 = graft.Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("k"),
        lit(null).cast("long").as("vl"),
        col("s_nationkey").cast("string").as("vs")).cache()
    println(s"[chunkwave] ${facts.count()} facts from $dir; C=$chunks, B=$buckets")

    val root = java.nio.file.Files.createTempDirectory("chunkwave").toString
    val sU = s"$root/unchunked"; val sC = s"$root/chunked"
    val noF = facts.limit(0); val noDel = facts.select("k1", "k2", "id").limit(0)
    val noD = d13.limit(0)

    def fold(state: String, fb: DataFrame, l14: DataFrame, id: Long,
        fc: Int): Unit =
      IncrementalJoinAggStar.processBatch(spec,
        fb, Seq("k1", "k2"), "id", "m", noDel, Seq("k1", "k2"), "id",
        Seq(Seq(if (id == 0) d11 else noD, if (id == 0) d12 else noD,
          if (id == 0) d13 else noD, l14), Seq(if (id == 0) d21 else noD)),
        Seq(Seq.fill(4)(("k", "vl", "vs")), Seq(("k", "vl", "vs"))),
        state, id, numBuckets = buckets, factChunks = fc)

    // pre-wave state once, then an exact filesystem copy
    measured("initial corpus fold") { fold(sU, facts, d14, 0L, 1) }
    val fs = new Path(sU).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(FileUtil.copy(fs, new Path(sU), fs, new Path(sC), false,
      spark.sparkContext.hadoopConfiguration), "state copy failed")

    // the wave: first non-ASIA region renames to ASIA
    val flip = d14.filter(col("vs") =!= "ASIA").orderBy("k").limit(1)
      .select(col("k"), col("vl"), lit("ASIA").as("vs")).cache()
    flip.count()
    measured(s"wave unchunked") { fold(sU, noF, flip, 1L, 1) }
    measured(s"wave factChunks=$chunks") { fold(sC, noF, flip, 1L, chunks) }

    def served(state: String): Map[String, (Long, Long)] =
      IncrementalJoinAggStar.view(spark, state).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (vU, vC) = (served(sU), served(sC))
    require(vU == vC, s"chunked wave diverged: ${vU.size} vs ${vC.size} groups")
    val d14Post = d14.join(flip.select("k"), Seq("k"), "left_anti").unionByName(flip)
    val want = facts
      .join(d11.select(col("k").as("k1"), col("vl").as("ck")), Seq("k1"))
      .join(d12.select(col("k").as("ck"), col("vl").as("nk"),
        col("vs").as("cnat")), Seq("ck"))
      .join(d13.select(col("k").as("nk"), col("vl").as("rk"),
        col("vs").as("nname")), Seq("nk"))
      .join(d14Post.select(col("k").as("rk"), col("vs").as("rname")), Seq("rk"))
      .join(d21.select(col("k").as("k2"), col("vs").as("snat")), Seq("k2"))
      .filter(col("cnat") === col("snat") && col("rname") === "ASIA")
      .groupBy("nname").agg(sum("m").as("t"), count(lit(1)).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(vU == want, "unchunked wave diverged from the batch recompute")
    println(s"[chunkwave] both waves ≡ batch recompute (${vU.size} nations); " +
      "changelog row sets identical: " + {
        val cU = IncrementalJoinAggStar.changelog(spark, sU).collect().toSet
        val cCk = IncrementalJoinAggStar.changelog(spark, sC).collect().toSet
        require(cU == cCk, "changelogs diverged"); "yes"
      })
    println("[chunkwave] PASSED")
    spark.stop()
  }
}
