package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalJoinAggN

/** Depth-3 rehearsal of the generic chain engine on the real corpus:
  * revenue-cents by NATION over
  * `lineitem ⋈ orders ⋈ customer ⋈ nation` — four joined tables, three
  * maintained dim levels (orderkey→custkey→nationkey→name). Batches
  * slice the three big tables on DIFFERENT keys so chains complete out
  * of order; then a MIDDLE-level re-key wave (customers moved to the
  * next nation — two joins from both the facts and the group rows), a
  * fact-delete wave, and a steady-state probe. Served view checked
  * against the batch 4-way recompute after every fold; the state dirs
  * pass [[StateAudit]] at close.
  *
  * {{{ sbt "runMain graft.tools.ChainNRehearsal /root/testdata/sf0.1 4" }}}
  */
object ChainNRehearsal {
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
      .select(col("l_orderkey").as("k"),
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"), col("l_quantity")))
          .cast("long").as("id"),
        graft.functions.cents(col("l_extendedprice")).as("m"))
      .cache()
    val d1 = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("v")).cache()
    val d2 = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"),
        col("c_nationkey").cast("long").as("v")).cache()
    val d3 = graft.Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name").as("v")).cache()
    val (nF, n1, n2, n3) = (facts.count(), d1.count(), d2.count(), d3.count())
    val maxK1 = d1.agg(max("k")).collect().head.getLong(0)
    val maxK2 = d2.agg(max("k")).collect().head.getLong(0)
    val maxNat = d3.agg(max("k")).collect().head.getLong(0)
    val span1 = maxK1 / nBatches + 1
    val span2 = maxK2 / nBatches + 1
    println(s"[rehearsal] $nF facts, $n1 orders, $n2 customers, $n3 nations, $nBatches batches, B=$buckets")

    val state = java.nio.file.Files.createTempDirectory("chainn-rehearsal").toString
    val noF = facts.limit(0); val noDel = facts.select("k", "id").limit(0)
    val noL = d1.limit(0); val noG = d3.limit(0)

    def factsOf(i: Int) = facts.filter(
      ((col("k") / span1).cast("int") === i && (col("k") % 3 =!= 0 || lit(i) === 0)) ||
      ((col("k") / span1).cast("int") === i + 1 && col("k") % 3 === 0))
    def d1Of(i: Int) = d1.filter((col("k") / span1).cast("int") === i)
    def d2Of(i: Int) = d2.filter((col("k") / span2).cast("int") === i)
    def d3Of(i: Int) = if (i == 0) d3 else noG // nations arrive up front

    def fold(fb: DataFrame, dels: DataFrame, l1: DataFrame, l2: DataFrame,
        l3: DataFrame, id: Long, tag: String): Unit = {
      val t0 = System.nanoTime()
      IncrementalJoinAggN.processBatch(fb, "k", "id", "m", dels, "k", "id",
        Seq(l1, l2, l3), Seq(("k", "v"), ("k", "v"), ("k", "v")),
        state, id, numBuckets = buckets)
      println(f"[rehearsal] $tag: fold ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def servedView(): Map[String, (Long, Long)] =
      IncrementalJoinAggN.view(spark, state).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def batchView(f: DataFrame, a: DataFrame, b: DataFrame, c: DataFrame): Map[String, (Long, Long)] =
      f.join(a.select(col("k"), col("v").as("k2")), Seq("k"))
        .join(b.select(col("k").as("k2"), col("v").as("k3")), Seq("k2"))
        .join(c.select(col("k").as("k3"), col("v").as("g")), Seq("k3"))
        .groupBy("g").agg(sum("m").as("t"), count(lit(1)).as("p"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def check(f: DataFrame, a: DataFrame, b: DataFrame, c: DataFrame, tag: String): Unit = {
      val (got, want) = (servedView(), batchView(f, a, b, c))
      require(got == want, s"$tag diverged: ${got.size} vs ${want.size} groups")
      println(s"[rehearsal]   $tag exact (${got.size} nations)")
    }

    var fAll = noF; var c1 = noL; var c2 = noL; var c3 = noG
    for (i <- 0 until nBatches) {
      val (fb, l1, l2, l3) = (factsOf(i), d1Of(i), d2Of(i), d3Of(i))
      fold(fb, noDel, l1, l2, l3, i.toLong, s"batch $i")
      fAll = fAll.unionByName(fb); c1 = c1.unionByName(l1)
      c2 = c2.unionByName(l2); c3 = c3.unionByName(l3)
      check(fAll, c1, c2, c3, s"batch $i")
    }

    // MIDDLE-level re-key: every customer with k % 9 == 0 moves to the
    // next nation — the subtree re-route two joins from both endpoints
    val rekey = d2.filter(col("k") % 9 === 0)
      .select(col("k"), ((col("v") + 1L) % (maxNat + 1L)).as("v")).cache()
    val nRe = rekey.count()
    fold(noF, noDel, noL, rekey, noG, nBatches.toLong, s"middle re-key wave ($nRe customers)")
    c2 = c2.join(rekey.select("k"), Seq("k"), "left_anti").unionByName(rekey)
    check(fAll, c1, c2, c3, "middle re-key wave")

    // delete wave
    val dels = fAll.filter(col("id") % 17 === 0).select("k", "id").cache()
    val nDel = dels.count()
    fold(noF, dels, noL, noL, noG,
      nBatches + 1L, s"delete wave ($nDel facts)")
    fAll = fAll.join(dels.select("id"), Seq("id"), "left_anti")
    check(fAll, c1, c2, c3, "delete wave")

    // steady-state probe: 3 new orders for one new customer in nation 0
    val pF = (1L to 3L).map(i => (maxK1 + i, 20000000L + i, 100L * i)).toDF("k", "id", "m")
    val pL1 = (1L to 3L).map(i => (maxK1 + i, maxK2 + 1L)).toDF("k", "v")
    val pL2 = Seq((maxK2 + 1L, 0L)).toDF("k", "v")
    fold(pF, noDel, pL1, pL2, noG, nBatches + 2L, "steady-state probe (3 facts, 1 customer)")
    fAll = fAll.unionByName(pF); c1 = c1.unionByName(pL1); c2 = c2.unionByName(pL2)
    check(fAll, c1, c2, c3, "steady-state probe")

    val audit = StateAudit.audit(spark, state)
    require(audit.isEmpty, s"state audit found: $audit")
    println("[rehearsal] StateAudit clean; done")
    spark.stop()
  }
}
