package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalJoinAggStar
import graft.streaming.IncrementalJoinAggStar.StarSpec

/** Star-engine rehearsal on the real corpus: the x118 Q5 star —
  * revenue-cents by NATION over `lineitem ⋈ (orders→customer→nation→
  * region) ⋈ supplier` with the cross-branch `s_nationkey =
  * c_nationkey` equality and the `r_name = 'ASIA'` literal filter —
  * maintained under: out-of-order arrival batches slicing the big
  * tables on DIFFERENT keys (facts before their supplier, orders
  * before their customer), a BRANCH-1 re-key wave (customers moved to
  * the next nation — re-groups AND flips the equality), a BRANCH-2
  * re-key wave (suppliers moved — flips the equality from the other
  * side), a literal-filter flip (a region renamed into ASIA, admitting
  * whole nations three joins from the facts), a fact-delete wave, and
  * a steady-state probe with its touched-bucket fraction. Served view
  * checked against the batch 6-table recompute after every fold.
  *
  * {{{ sbt "runMain graft.tools.StarRehearsal /root/testdata/sf0.1 4" }}}
  */
object StarRehearsal {
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
    // branch 1: orders → customer (link + eq attr) → nation → region
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
    // branch 2: supplier (eq attr)
    val d21 = graft.Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("k"),
        lit(null).cast("long").as("vl"),
        col("s_nationkey").cast("string").as("vs")).cache()
    val (nF, nO, nC, nS) = (facts.count(), d11.count(), d12.count(), d21.count())
    val maxOrd = d11.agg(max("k")).collect().head.getLong(0)
    val maxCust = d12.agg(max("k")).collect().head.getLong(0)
    val maxSupp = d21.agg(max("k")).collect().head.getLong(0)
    val maxNat = d13.agg(max("k")).collect().head.getLong(0)
    val spanO = maxOrd / nBatches + 1
    val spanC = maxCust / nBatches + 1
    val spanS = maxSupp / nBatches + 1
    println(s"[rehearsal] $nF facts, $nO orders, $nC customers, $nS suppliers, $nBatches batches, B=$buckets")

    val state = java.nio.file.Files.createTempDirectory("star-rehearsal").toString
    val noF = facts.limit(0); val noDel = facts.select("k1", "k2", "id").limit(0)
    val noD = d13.limit(0)

    // facts slightly AHEAD of their order's batch for k1 % 3 == 0 (the
    // out-of-order jitter); orders by orderkey, customers by custkey,
    // suppliers by suppkey — four different slicings, so eq pairs and
    // chains complete out of order
    def factsOf(i: Int) = facts.filter(
      ((col("k1") / spanO).cast("int") === i && (col("k1") % 3 =!= 0 || lit(i) === 0)) ||
      ((col("k1") / spanO).cast("int") === i + 1 && col("k1") % 3 === 0))
    def d11Of(i: Int) = d11.filter((col("k") / spanO).cast("int") === i)
    def d12Of(i: Int) = d12.filter((col("k") / spanC).cast("int") === i)
    def d21Of(i: Int) = d21.filter((col("k") / spanS).cast("int") === i)
    def smallOf(i: Int, d: DataFrame) = if (i == 0) d else noD // nation/region up front

    def fold(fb: DataFrame, dels: DataFrame, l11: DataFrame, l12: DataFrame,
        l13: DataFrame, l14: DataFrame, l21: DataFrame, id: Long, tag: String): Unit = {
      val t0 = System.nanoTime()
      IncrementalJoinAggStar.processBatch(spec,
        fb, Seq("k1", "k2"), "id", "m", dels, Seq("k1", "k2"), "id",
        Seq(Seq(l11, l12, l13, l14), Seq(l21)),
        Seq(Seq.fill(4)(("k", "vl", "vs")), Seq(("k", "vl", "vs"))),
        state, id, numBuckets = buckets)
      println(f"[rehearsal] $tag: fold ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def servedView(): Map[String, (Long, Long)] =
      IncrementalJoinAggStar.view(spark, state).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def batchView(f: DataFrame, o: DataFrame, c: DataFrame, n: DataFrame,
        r: DataFrame, s: DataFrame): Map[String, (Long, Long)] =
      f.join(o.select(col("k").as("k1"), col("vl").as("ck")), Seq("k1"))
        .join(c.select(col("k").as("ck"), col("vl").as("nk"),
          col("vs").as("cnat")), Seq("ck"))
        .join(n.select(col("k").as("nk"), col("vl").as("rk"),
          col("vs").as("nname")), Seq("nk"))
        .join(r.select(col("k").as("rk"), col("vs").as("rname")), Seq("rk"))
        .join(s.select(col("k").as("k2"), col("vs").as("snat")), Seq("k2"))
        .filter(col("cnat") === col("snat") && col("rname") === "ASIA")
        .groupBy("nname").agg(sum("m").as("t"), count(lit(1)).as("p"))
        .collect().map(r2 => r2.getString(0) -> (r2.getLong(1), r2.getLong(2))).toMap
    def check(f: DataFrame, o: DataFrame, c: DataFrame, n: DataFrame,
        r: DataFrame, s: DataFrame, tag: String): Unit = {
      val (got, want) = (servedView(), batchView(f, o, c, n, r, s))
      require(got == want, s"$tag diverged: ${got.size} vs ${want.size} groups")
      println(s"[rehearsal]   $tag exact (${got.size} nations)")
    }

    var fAll = noF; var c11 = noD; var c12 = noD; var c13 = noD
    var c14 = noD; var c21 = noD
    for (i <- 0 until nBatches) {
      val (fb, l11, l12, l21) = (factsOf(i), d11Of(i), d12Of(i), d21Of(i))
      val (l13, l14) = (smallOf(i, d13), smallOf(i, d14))
      fold(fb, noDel, l11, l12, l13, l14, l21, i.toLong, s"batch $i")
      fAll = fAll.unionByName(fb); c11 = c11.unionByName(l11)
      c12 = c12.unionByName(l12); c13 = c13.unionByName(l13)
      c14 = c14.unionByName(l14); c21 = c21.unionByName(l21)
      check(fAll, c11, c12, c13, c14, c21, s"batch $i")
    }

    def upsert(cur: DataFrame, up: DataFrame): DataFrame =
      cur.join(up.select("k"), Seq("k"), "left_anti").unionByName(up)

    // BRANCH-1 re-key: customers k % 9 == 0 move to the next nation —
    // re-routes their subtree's group AND flips the cross-branch
    // equality against their suppliers
    val rekeyC = d12.filter(col("k") % 9 === 0)
      .select(col("k"), ((col("vl") + 1L) % (maxNat + 1L)).as("vl"),
        ((col("vl") + 1L) % (maxNat + 1L)).cast("string").as("vs")).cache()
    val nReC = rekeyC.count()
    fold(noF, noDel, noD, rekeyC, noD, noD, noD, nBatches.toLong,
      s"branch-1 re-key wave ($nReC customers)")
    c12 = upsert(c12, rekeyC)
    check(fAll, c11, c12, c13, c14, c21, "branch-1 re-key wave")

    // BRANCH-2 re-key: suppliers k % 7 == 0 move to the next nation —
    // the equality flips from the OTHER side
    val rekeyS = d21.filter(col("k") % 7 === 0)
      .select(col("k"), col("vl"),
        ((col("vs").cast("long") + 1L) % (maxNat + 1L)).cast("string").as("vs")).cache()
    val nReS = rekeyS.count()
    fold(noF, noDel, noD, noD, noD, noD, rekeyS, nBatches + 1L,
      s"branch-2 re-key wave ($nReS suppliers)")
    c21 = upsert(c21, rekeyS)
    check(fAll, c11, c12, c13, c14, c21, "branch-2 re-key wave")

    // literal-filter flip: the first non-ASIA region renames to ASIA —
    // whole nations enter the view three joins from the facts
    val flip = d14.filter(col("vs") =!= "ASIA").orderBy("k").limit(1)
      .select(col("k"), col("vl"), lit("ASIA").as("vs")).cache()
    fold(noF, noDel, noD, noD, noD, flip, noD, nBatches + 2L,
      "region rename wave (literal-filter flip)")
    c14 = upsert(c14, flip)
    check(fAll, c11, c12, c13, c14, c21, "region rename wave")

    // delete wave
    val dels = fAll.filter(col("id") % 17 === 0).select("k1", "k2", "id").cache()
    val nDel = dels.count()
    fold(noF, dels, noD, noD, noD, noD, noD, nBatches + 3L,
      s"delete wave ($nDel facts)")
    fAll = fAll.join(dels.select("id"), Seq("id"), "left_anti")
    check(fAll, c11, c12, c13, c14, c21, "delete wave")

    // steady-state probe: 3 new lineitems under one new order + one new
    // supplier; the fold's write set is the probe keys' buckets
    val pF = (1L to 3L).map(i => (maxOrd + 1L, maxSupp + 1L, 30000000L + i, 100L * i))
      .toDF("k1", "k2", "id", "m")
    val pO = Seq((maxOrd + 1L, maxCust + 1L, null.asInstanceOf[String])).toDF("k", "vl", "vs")
    val pC = Seq((maxCust + 1L, 0L, "0")).toDF("k", "vl", "vs")
    val pS = Seq((maxSupp + 1L, null.asInstanceOf[java.lang.Long], "0")).toDF("k", "vl", "vs")
      .select(col("k"), col("vl").cast("long"), col("vs"))
    val touched = pF.select(pmod(xxhash64(col("k1")), lit(buckets.toLong)).as("b"))
      .unionByName(pF.select(pmod(xxhash64(col("k2")), lit(buckets.toLong)).as("b")))
      .unionByName(pO.select(pmod(xxhash64(col("k")), lit(buckets.toLong)).as("b")))
      .unionByName(pC.select(pmod(xxhash64(col("k")), lit(buckets.toLong)).as("b")))
      .unionByName(pS.select(pmod(xxhash64(col("k")), lit(buckets.toLong)).as("b")))
      .distinct().count()
    fold(pF, noDel, pO, pC, noD, noD, pS, nBatches + 4L,
      s"steady-state probe (3 facts, 1 order, 1 customer, 1 supplier; ~$touched/$buckets key-buckets)")
    fAll = fAll.unionByName(pF); c11 = c11.unionByName(pO)
    c12 = upsert(c12, pC); c21 = c21.unionByName(pS)
    check(fAll, c11, c12, c13, c14, c21, "steady-state probe")

    val audit = StateAudit.audit(spark, state)
    require(audit.isEmpty, s"state audit found: $audit")
    println("[rehearsal] StateAudit clean; done")
    spark.stop()
  }
}
