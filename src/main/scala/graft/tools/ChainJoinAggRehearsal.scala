package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalJoinAggChain

/** Chain join-aggregate maintenance rehearsal (dev aid): maintains
  * revenue-by-market-segment over `lineitem ⋈ orders ⋈ customer`
  * ([[IncrementalJoinAggChain]]) with all three tables arriving in
  * interleaved batches sliced on DIFFERENT keys (facts+links by
  * orderkey, customers by custkey), so most chains complete only when
  * their d2 row lands batches later. Then three retraction waves: a
  * dim1 RE-KEY slice (orders re-routed to different customers — the
  * chain-only retraction), a dim2 re-group slice (customers moved to a
  * new segment), and a fact DELETE slice (signed facts). After every
  * fold the served view is checked against the batch recompute over
  * everything absorbed, and touched-bucket fractions are printed — the
  * O(Δ) evidence.
  *
  * {{{ sbt "runMain graft.tools.ChainJoinAggRehearsal /root/testdata/sf0.1 4" }}}
  */
object ChainJoinAggRehearsal {
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

    val facts = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k1"),
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"), col("l_quantity")))
          .cast("long").as("id"),
        graft.functions.cents(col("l_extendedprice")).as("m"))
      .cache()
    val d1 = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k1"), col("o_custkey").as("k2")).cache()
    val d2 = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("k2"), col("c_mktsegment").as("g")).cache()
    val (nF, nD1, nD2) = (facts.count(), d1.count(), d2.count())
    val maxK1 = d1.agg(max("k1")).collect().head.getLong(0)
    val maxK2 = d2.agg(max("k2")).collect().head.getLong(0)
    val span1 = maxK1 / nBatches + 1
    val span2 = maxK2 / nBatches + 1
    println(s"[rehearsal] $nF facts, $nD1 orders, $nD2 customers, $nBatches batches, B=$buckets")

    val state = java.nio.file.Files.createTempDirectory("chainagg-rehearsal").toString
    val noF = facts.limit(0); val noDel = facts.select("k1", "id").limit(0)
    val noD1 = d1.limit(0); val noD2 = d2.limit(0)

    // facts+links sliced by orderkey (a third of facts pulled one batch
    // early); customers sliced by CUSTKEY — chains complete out of order
    def factsOf(i: Int) = facts.filter(
      ((col("k1") / span1).cast("int") === i && (col("k1") % 3 =!= 0 || lit(i) === 0)) ||
      ((col("k1") / span1).cast("int") === i + 1 && col("k1") % 3 === 0))
    def d1Of(i: Int) = d1.filter((col("k1") / span1).cast("int") === i)
    def d2Of(i: Int) = d2.filter((col("k2") / span2).cast("int") === i)

    def servedView(): Map[String, (Long, Long)] = {
      val t0 = System.nanoTime()
      val m = IncrementalJoinAggChain.view(spark, state).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      println(f"[rehearsal]   view read: ${(System.nanoTime() - t0) / 1e9}%.2f s (${m.size} groups)")
      m
    }
    def batchView(f: DataFrame, dd1: DataFrame, dd2: DataFrame): Map[String, (Long, Long)] = {
      val t0 = System.nanoTime()
      val m = f.join(dd1, Seq("k1")).join(dd2, Seq("k2"))
        .groupBy("g").agg(sum("m").as("t"), count(lit(1)).as("p"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      println(f"[rehearsal]   batch recompute: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      m
    }
    def bucketsOf(df: DataFrame, key: String): Long =
      df.select(pmod(xxhash64(col(key)), lit(buckets.toLong))).distinct().count()
    def check(f: DataFrame, dd1: DataFrame, dd2: DataFrame, tag: String): Map[String, (Long, Long)] = {
      val (got, want) = (servedView(), batchView(f, dd1, dd2))
      require(got == want, s"$tag diverged: ${got.size} vs ${want.size} groups")
      println(s"[rehearsal]   $tag exact: view == batch recompute (${got.size} groups)")
      got
    }

    var foldedF = noF
    var curD1 = noD1
    var curD2 = noD2
    for (i <- 0 until nBatches) {
      val (fb, d1b, d2b) = (factsOf(i), d1Of(i), d2Of(i))
      val t0 = System.nanoTime()
      IncrementalJoinAggChain.processBatch(fb, "k1", "id", "m",
        noDel, "k1", "id", d1b, "k1", "k2", d2b, "k2", "g",
        state, i.toLong, numBuckets = buckets)
      println(f"[rehearsal] batch $i: fold ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(${fb.count()} facts, ${d1b.count()} links, ${d2b.count()} customers)")
      foldedF = foldedF.unionByName(fb)
      curD1 = curD1.unionByName(d1b)
      curD2 = curD2.unionByName(d2b)
      check(foldedF, curD1, curD2, s"batch $i")
    }

    // wave 1: RE-ROUTE — re-key every slot-0 order with k1 % 7 == 0 to
    // the NEXT customer (mod corpus): their facts move between segments
    // with no fact or customer row in the batch
    val rekey1 = d1.filter((col("k1") / span1).cast("int") === 0 && col("k1") % 7 === 0)
      .select(col("k1"), (col("k2") % lit(maxK2) + 1L).as("k2")).cache()
    val n1 = rekey1.count()
    val t1 = System.nanoTime()
    IncrementalJoinAggChain.processBatch(noF, "k1", "id", "m", noDel, "k1", "id",
      rekey1, "k1", "k2", noD2, "k2", "g", state, nBatches.toLong, numBuckets = buckets)
    println(f"[rehearsal] dim1 re-route wave: $n1 re-keys, fold ${(System.nanoTime() - t1) / 1e9}%.2f s, " +
      f"wrote ${bucketsOf(rekey1, "k1")}/$buckets d1 buckets")
    curD1 = curD1.join(rekey1.select("k1"), Seq("k1"), "left_anti").unionByName(rekey1)
    check(foldedF, curD1, curD2, "re-route wave")

    // wave 2: RE-GROUP — move every customer with k2 % 11 == 0 to a new
    // segment: whole subtrees change groups
    val rekey2 = d2.filter(col("k2") % 11 === 0)
      .select(col("k2"), lit("9-REGROUPED").as("g")).cache()
    val n2 = rekey2.count()
    val t2 = System.nanoTime()
    IncrementalJoinAggChain.processBatch(noF, "k1", "id", "m", noDel, "k1", "id",
      noD1, "k1", "k2", rekey2, "k2", "g", state, nBatches + 1L, numBuckets = buckets)
    println(f"[rehearsal] dim2 re-group wave: $n2 re-groups, fold ${(System.nanoTime() - t2) / 1e9}%.2f s")
    curD2 = curD2.join(rekey2.select("k2"), Seq("k2"), "left_anti").unionByName(rekey2)
    check(foldedF, curD1, curD2, "re-group wave")

    // wave 3: DELETE — forget every fact with id % 13 == 0 (signed facts)
    val dels = foldedF.filter(col("id") % 13 === 0).select("k1", "id").cache()
    val n3 = dels.count()
    val t3 = System.nanoTime()
    IncrementalJoinAggChain.processBatch(noF, "k1", "id", "m", dels, "k1", "id",
      noD1, "k1", "k2", noD2, "k2", "g", state, nBatches + 2L, numBuckets = buckets)
    println(f"[rehearsal] delete wave: $n3 forgotten facts, fold ${(System.nanoTime() - t3) / 1e9}%.2f s")
    foldedF = foldedF.join(dels.select("id"), Seq("id"), "left_anti")
    check(foldedF, curD1, curD2, "delete wave")

    // steady-state probe: 5 NEW orders for one NEW customer, 3 facts each
    val probeD2 = Seq((maxK2 + 1L, "P-PROBE")).toDF("k2", "g")
    val probeD1 = (1L to 5L).map(i => (maxK1 + i, maxK2 + 1L)).toDF("k1", "k2")
    val probeF = (1L to 5L).flatMap(i => (1L to 3L).map(l =>
      (maxK1 + i, 10000000L + i * 8 + l, 1000L * i + l))).toDF("k1", "id", "m")
    val touchedP = probeF.select("k1").unionByName(probeD1.select("k1")).distinct()
      .select(pmod(xxhash64(col("k1")), lit(buckets.toLong))).distinct().count()
    val t4 = System.nanoTime()
    IncrementalJoinAggChain.processBatch(probeF, "k1", "id", "m", noDel, "k1", "id",
      probeD1, "k1", "k2", probeD2, "k2", "g", state, nBatches + 3L, numBuckets = buckets)
    println(f"[rehearsal] steady-state probe: 5 orders / 15 facts / 1 customer, " +
      f"fold ${(System.nanoTime() - t4) / 1e9}%.2f s, $touchedP/$buckets k1 buckets written")
    foldedF = foldedF.unionByName(probeF)
    curD1 = curD1.unionByName(probeD1)
    curD2 = curD2.unionByName(probeD2)
    val gotP = check(foldedF, curD1, curD2, "steady-state probe")

    val integral = IncrementalJoinAggChain.changelog(spark, state)
      .groupBy("g").agg(sum("dtotal").as("t"), sum("dtriples").as("p"))
      .filter(col("p") =!= 0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(integral == gotP, "changelog integral != served view")
    println("[rehearsal] changelog integral == served view; done")
    spark.stop()
  }
}
