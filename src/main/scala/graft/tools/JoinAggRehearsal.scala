package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalJoinAgg

/** Join-aggregate maintenance rehearsal (dev aid, not part of the driver
  * contract): maintains revenue-by-order-priority over
  * `lineitem ⋈ orders` ([[IncrementalJoinAgg]]) with the corpus arriving
  * in interleaved batches where a third of the FACTS land one batch
  * BEFORE their dimension rows (the out-of-order case a single-source MV
  * engine cannot join), then an upsert wave re-keys a slice of orders to
  * a new priority (the retraction case). After every batch the served
  * view is checked against the batch join+GROUP BY recompute over
  * everything absorbed so far, and the fold's touched-bucket fraction is
  * printed — the O(Δ) evidence for reads and writes.
  *
  * {{{ sbt "runMain graft.tools.JoinAggRehearsal /root/testdata/sf0.1 4" }}}
  */
object JoinAggRehearsal {
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

    // facts: one row per lineitem, measure = exact cents revenue. This
    // corpus is TPC-H-ISH: (l_orderkey, l_linenumber) is NOT unique, so
    // the absorption id is a synthesized row number over a near-total
    // order (dev-tool scale; a real pipeline has a real fact pk)
    val facts = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("jk"),
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"), col("l_quantity")))
          .cast("long").as("id"),
        graft.functions.cents(col("l_extendedprice")).as("m"))
      .cache()
    // dims: one row per order, group attr = priority
    val dims = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("jk"), col("o_orderpriority").as("g"))
      .cache()
    val (nF, nD) = (facts.count(), dims.count())
    val maxJk = dims.agg(max("jk")).collect().head.getLong(0)
    val span = maxJk / nBatches + 1
    println(s"[rehearsal] $nF facts, $nD dims, $nBatches batches, B=$buckets")

    val state = java.nio.file.Files.createTempDirectory("joinagg-rehearsal").toString
    def slot(jk: org.apache.spark.sql.Column) = (jk / span).cast("int")

    // facts of batch i = orderkey slot i, EXCEPT a deterministic third
    // (jk % 3 == 0) which are PULLED FORWARD into batch i-1 (they arrive
    // before their dim); dims of batch i = slot i exactly
    def factsOf(i: Int) = facts.filter(
      (slot(col("jk")) === i && (col("jk") % 3 =!= 0 || lit(i) === 0)) ||
      (slot(col("jk")) === i + 1 && col("jk") % 3 === 0))
    def dimsOf(i: Int) = dims.filter(slot(col("jk")) === i)

    def servedView(): Map[String, (Long, Long)] = {
      val t0 = System.nanoTime()
      val m = IncrementalJoinAgg.view(spark, state).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      println(f"[rehearsal]   view read from state: ${(System.nanoTime() - t0) / 1e9}%.2f s (${m.size} groups)")
      m
    }
    def batchView(fUpTo: org.apache.spark.sql.DataFrame,
        dCur: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] = {
      val t0 = System.nanoTime()
      val m = fUpTo.join(dCur, Seq("jk"))
        .groupBy("g").agg(sum("m").as("t"), count(lit(1)).as("p"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      println(f"[rehearsal]   batch join+agg recompute: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      m
    }

    var foldedF = facts.limit(0)
    var curD = dims.limit(0)
    for (i <- 0 until nBatches) {
      val (fb, db) = (factsOf(i), dimsOf(i))
      val touched = fb.select("jk").unionByName(db.select("jk")).distinct()
        .select(pmod(xxhash64(col("jk")), lit(buckets.toLong))).distinct().count()
      val t0 = System.nanoTime()
      IncrementalJoinAgg.processBatch(fb, "jk", "id", "m", db, "jk", "g",
        state, i.toLong, numBuckets = buckets)
      println(f"[rehearsal] batch $i: fold ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        f"touched $touched/$buckets buckets (${fb.count()} facts, ${db.count()} dims)")
      foldedF = foldedF.unionByName(fb)
      curD = curD.unionByName(db)
      val (got, want) = (servedView(), batchView(foldedF, curD))
      require(got == want, s"batch $i diverged: ${got.size} vs ${want.size} groups")
      println(s"[rehearsal]   view == batch recompute (${got.size} groups)")
    }

    // upsert wave: re-key every slot-0 order with jk % 5 == 0 to a new
    // priority — retractions against the oldest, coldest state
    val rekey = dims.filter(slot(col("jk")) === 0 && col("jk") % 5 === 0)
      .select(col("jk"), concat(lit("9-REKEYED-"), col("g")).as("g"))
      .cache()
    val nRe = rekey.count()
    val touched = rekey.select(pmod(xxhash64(col("jk")), lit(buckets.toLong)))
      .distinct().count()
    val t0 = System.nanoTime()
    IncrementalJoinAgg.processBatch(facts.limit(0), "jk", "id", "m",
      rekey, "jk", "g", state, nBatches.toLong, numBuckets = buckets)
    println(f"[rehearsal] upsert wave: $nRe re-keys, fold ${(System.nanoTime() - t0) / 1e9}%.2f s, touched $touched/$buckets buckets")
    curD = curD.join(rekey.select("jk"), Seq("jk"), "left_anti").unionByName(rekey)
    val (got, want) = (servedView(), batchView(foldedF, curD))
    require(got == want, "post-upsert view diverged from batch recompute")
    println(s"[rehearsal]   retraction wave exact: view == batch recompute (${got.size} groups)")

    // steady-state probe: 5 NEW orders (fresh keys past the corpus) with
    // 3 facts each — the continuous-operation batch shape; touched
    // buckets (reads AND writes) bounded by batch keys, not state
    import spark.implicits._
    val probeD = (1L to 5L).map(i => (maxJk + i, "P-PROBE")).toDF("jk", "g")
    val probeF = (1L to 5L).flatMap(i => (1L to 3L).map(l =>
      (maxJk + i, 10000000L + i * 8 + l, 1000L * i + l))).toDF("jk", "id", "m")
    val touchedP = probeF.select("jk").unionByName(probeD.select("jk")).distinct()
      .select(pmod(xxhash64(col("jk")), lit(buckets.toLong))).distinct().count()
    val t1 = System.nanoTime()
    IncrementalJoinAgg.processBatch(probeF, "jk", "id", "m", probeD, "jk", "g",
      state, nBatches.toLong + 1, numBuckets = buckets)
    println(f"[rehearsal] steady-state probe: 5 orders / 15 facts, fold ${(System.nanoTime() - t1) / 1e9}%.2f s, touched $touchedP/$buckets buckets")
    foldedF = foldedF.unionByName(probeF)
    curD = curD.unionByName(probeD)
    val (gotP, wantP) = (servedView(), batchView(foldedF, curD))
    require(gotP == wantP, "post-probe view diverged from batch recompute")
    println(s"[rehearsal]   steady-state fold exact (${gotP.size} groups)")

    // changelog integral invariant over the whole run
    val integral = IncrementalJoinAgg.changelog(spark, state)
      .groupBy("g").agg(sum("dtotal").as("t"), sum("dpairs").as("p"))
      .filter(col("p") =!= 0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(integral == gotP, "changelog integral != served view")
    println("[rehearsal] changelog integral == served view; done")
    spark.stop()
  }
}
