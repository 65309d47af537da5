package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalJoinAggStar
import graft.streaming.IncrementalJoinAggStar.StarSpec

/** LEFT-star rehearsal on the real corpus: the x120 view — revenue
  * cents by nation over `orders LEFT JOIN (customers with c_acctbal >=
  * 0) LEFT JOIN nation` — maintained with the customer dimension
  * arriving one batch LATE relative to its orders, so the NULL-padded
  * group is large from the first fold and drains through the completed
  * relation's virtual retraction as each customer slice lands (the
  * left engine's distinctive traffic; an inner view would simply have
  * no rows to show until the dim arrives). Then: a re-key wave
  * (customers move nations — pure regroup, no null traffic), the FINAL
  * dim slice (the biggest null-to-named migration), a fact-delete wave
  * that hits the null group too, and a steady-state probe. Served view
  * checked against the batch LEFT-join recompute after every fold.
  *
  * {{{ sbt "runMain graft.tools.LeftStarRehearsal /root/testdata/sf0.1 4" }}}
  */
object LeftStarRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val buckets = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one LEFT branch: customer (link to nation, no attr) -> nation (attr)
    val spec = StarSpec(Seq(2), groupAttrs = Seq((1, 2)), leftBranches = Set(1))

    val facts = graft.Tables.orders(spark, dir)
      .select(col("o_custkey").as("k1"), col("o_orderkey").as("id"),
        graft.functions.cents(col("o_totalprice")).as("m"))
      .cache()
    // the PARTIAL dimension: negative-balance customers never exist
    val d11 = graft.Tables.customer(spark, dir)
      .filter(col("c_acctbal") >= 0)
      .select(col("c_custkey").cast("long").as("k"),
        col("c_nationkey").cast("long").as("vl"),
        lit(null).cast("string").as("vs")).cache()
    val d12 = graft.Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"),
        lit(null).cast("long").as("vl"), col("n_name").as("vs")).cache()
    val (nF, nC) = (facts.count(), d11.count())
    val maxCust = d11.agg(max("k")).collect().head.getLong(0)
    val maxNat = d12.agg(max("k")).collect().head.getLong(0)
    val spanC = maxCust / nBatches + 1
    println(s"[rehearsal] $nF orders, $nC live customers (partial dim), $nBatches batches, B=$buckets")

    val state = java.nio.file.Files.createTempDirectory("leftstar-rehearsal").toString
    val noF = facts.limit(0); val noDel = facts.select("k1", "id").limit(0)
    val noD = d12.limit(0)

    // orders sliced by custkey; customers arrive ONE BATCH LATE (slice
    // i's customers land with batch i+1), nations up front — so every
    // batch closes with a populated null group
    def factsOf(i: Int) = facts.filter((col("k1") / spanC).cast("int") === i)
    def d11Of(i: Int) =
      if (i == 0) noD else d11.filter((col("k") / spanC).cast("int") === i - 1)

    def fold(fb: DataFrame, dels: DataFrame, l11: DataFrame, l12: DataFrame,
        id: Long, tag: String): Unit = {
      val t0 = System.nanoTime()
      IncrementalJoinAggStar.processBatch(spec,
        fb, Seq("k1"), "id", "m", dels, Seq("k1"), "id",
        Seq(Seq(l11, l12)), Seq(Seq(("k", "vl", "vs"), ("k", "vl", "vs"))),
        state, id, numBuckets = buckets)
      println(f"[rehearsal] $tag: fold ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def servedView(): Map[String, (Long, Long)] =
      IncrementalJoinAggStar.view(spark, state).collect()
        .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
          (r.getLong(1), r.getLong(2))).toMap
    def batchView(f: DataFrame, c: DataFrame, n: DataFrame): Map[String, (Long, Long)] =
      f.join(c.select(col("k").as("k1"), col("vl").as("nk")), Seq("k1"), "left")
        .join(n.select(col("k").as("nk"), col("vs").as("nname")), Seq("nk"), "left")
        .groupBy("nname").agg(sum("m").as("t"), count(lit(1)).as("p"))
        .collect().map(r2 => (if (r2.isNullAt(0)) null else r2.getString(0)) ->
          (r2.getLong(1), r2.getLong(2))).toMap
    def check(f: DataFrame, c: DataFrame, n: DataFrame, tag: String): Unit = {
      val (got, want) = (servedView(), batchView(f, c, n))
      require(got == want, s"$tag diverged: ${got.size} vs ${want.size} groups")
      val nullRows = got.get(null).map(_._2).getOrElse(0L)
      println(s"[rehearsal]   $tag exact (${got.size} groups, null group holds $nullRows orders)")
    }

    var fAll = noF; var c11 = noD; var c12 = noD
    for (i <- 0 until nBatches) {
      val (fb, l11) = (factsOf(i), d11Of(i))
      val l12 = if (i == 0) d12 else noD
      fold(fb, noDel, l11, l12, i.toLong, s"batch $i (dim one behind)")
      fAll = fAll.unionByName(fb); c11 = c11.unionByName(l11)
      c12 = c12.unionByName(l12)
      check(fAll, c11, c12, s"batch $i")
    }

    def upsert(cur: DataFrame, up: DataFrame): DataFrame =
      cur.join(up.select("k"), Seq("k"), "left_anti").unionByName(up)

    // re-key wave: present customers k % 9 == 0 move to the next nation
    // — regroup only, presence unchanged, no null traffic
    val rekeyC = c11.filter(col("k") % 9 === 0)
      .select(col("k"), ((col("vl") + 1L) % (maxNat + 1L)).as("vl"), col("vs"))
      .cache()
    val nReC = rekeyC.count()
    fold(noF, noDel, rekeyC, noD, nBatches.toLong,
      s"re-key wave ($nReC customers)")
    c11 = upsert(c11, rekeyC)
    check(fAll, c11, c12, "re-key wave")

    // the FINAL dim slice: the largest null-to-named migration — every
    // arriving key ships its virtual -(k, null, null) retraction
    val lastSlice = d11.filter((col("k") / spanC).cast("int") === nBatches - 1)
    val nLast = lastSlice.count()
    fold(noF, noDel, lastSlice, noD, nBatches + 1L,
      s"final dim slice ($nLast customers arrive)")
    c11 = upsert(c11, lastSlice)
    check(fAll, c11, c12, "final dim slice")

    // delete wave — hits named AND null-grouped facts
    val dels = fAll.filter(col("id") % 17 === 0).select("k1", "id").cache()
    val nDel = dels.count()
    fold(noF, dels, noD, noD, nBatches + 2L, s"delete wave ($nDel orders)")
    fAll = fAll.join(dels.select("id"), Seq("id"), "left_anti")
    check(fAll, c11, c12, "delete wave")

    // steady-state probe: 2 new orders — one resolvable, one pointing at
    // a customer that will never exist (permanent null-group member)
    val pF = Seq((maxCust + 50L, 90000001L, 111L), (1L, 90000002L, 222L))
      .toDF("k1", "id", "m")
    val touched = pF.select(pmod(xxhash64(col("k1")), lit(buckets.toLong)).as("b"))
      .distinct().count()
    fold(pF, noDel, noD, noD, nBatches + 3L,
      s"steady-state probe (2 orders; ~$touched/$buckets key-buckets)")
    fAll = fAll.unionByName(pF)
    check(fAll, c11, c12, "steady-state probe")

    val audit = StateAudit.audit(spark, state)
    require(audit.isEmpty, s"state audit found: $audit")
    println("[rehearsal] StateAudit clean; done")
    spark.stop()
  }
}
