package graft.streaming

import graft.SparkTestBase
import graft.streaming.IncrementalJoinAggStar.StarSpec
import org.apache.spark.sql.functions.col

/** MULTI-MEASURE star views (R161): several independently-summed
  * measures per group under ONE maintained join — the reference's
  * several-summed-columns SummingMergeTree shape (stats2's
  * blocked+visited, /root/reference/README.md:104-127). Every measure
  * must move together through re-keys, deletes, and retractions,
  * because they share the same Z-set weights. */
class IncrementalJoinAggStarMultiMeasureSpec extends SparkTestBase {
  import spark.implicits._

  // depth-2 single branch: facts (k1, id, m=blocked, m2=visited),
  // d1_1 (k -> link), d1_2 (k -> attr g)
  private val spec = StarSpec(Seq(2), groupAttrs = Seq((1, 2)),
    numMeasures = 2)

  private type Fact = (Long, Long, Long, Long) // k1, id, blocked, visited

  private def fold(state: String, fb: Seq[Fact], dels: Seq[(Long, Long)],
      l1: Seq[(Long, Long)], l2: Seq[(Long, String)], id: Long,
      sp: StarSpec = spec): Unit =
    IncrementalJoinAggStar.processBatch(sp,
      fb.toDF("k1", "id", "m", "mv"), Seq("k1"), "id", null,
      dels.toDF("k1", "id"), Seq("k1"), "id",
      Seq(Seq(
        l1.map { case (k, v) => (k, Some(v), None: Option[String]) }
          .toDF("k", "vl", "vs"),
        l2.map { case (k, v) => (k, None: Option[Long], Some(v)) }
          .toDF("k", "vl", "vs"))),
      Seq(Seq(("k", "vl", "vs"), ("k", "vl", "vs"))),
      state, id, numBuckets = 4, factMs = Seq("m", "mv"))

  private def served(state: String): Map[String, (Long, Long, Long)] =
    IncrementalJoinAggStar.view(spark, state, numMeasures = 2)
      .select("g", "total", "total2", "rows")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("both measures sum independently; re-keys and deletes move them together") {
    val state = tmpDir("mm-star")
    fold(state,
      fb = Seq((10L, 1L, 1L, 0L), (10L, 2L, 0L, 1L), (20L, 3L, 1L, 0L)),
      dels = Nil, l1 = Seq((10L, 500L), (20L, 501L)),
      l2 = Seq((500L, "A"), (501L, "B")), id = 0L)
    assert(served(state) === Map("A" -> (1L, 1L, 2L), "B" -> (1L, 0L, 1L)))
    // re-key order 10 -> customer 501 (B): BOTH measures move
    fold(state, Nil, Nil, Seq((10L, 501L)), Nil, 1L)
    assert(served(state) === Map("B" -> (2L, 1L, 3L)))
    // fact delete retracts both measures
    fold(state, Nil, Seq((10L, 1L)), Nil, Nil, 2L)
    assert(served(state) === Map("B" -> (1L, 1L, 2L)))
    // bucket-pruned point read carries every measure
    val point = IncrementalJoinAggStar
      .viewFor(spark, state, Seq("B"), numBuckets = 4, numMeasures = 2)
      .select("g", "total", "total2", "rows")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(point === Map("B" -> (1L, 1L, 2L)))
    // changelog carries per-measure deltas; integral == view
    val integ = IncrementalJoinAggStar.changelog(spark, state, numMeasures = 2)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("dtotal2").as("t2"),
        org.apache.spark.sql.functions.sum("drows").as("c"))
      .filter(col("c") > 0)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(integ === served(state), "integral != view")
    // maintenance-time as-of carries every measure
    val asOf1 = IncrementalJoinAggStar.viewAsOf(spark, state, 1L, numMeasures = 2)
      .select("g", "total", "total2", "rows")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(asOf1 === Map("B" -> (2L, 1L, 3L)))
    // changelog compaction preserves per-measure integrals
    IncrementalJoinAggStar.compactChangelog(spark, state, 1L)
    val integ2 = IncrementalJoinAggStar.changelog(spark, state, numMeasures = 2)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("dtotal2").as("t2"),
        org.apache.spark.sql.functions.sum("drows").as("c"))
      .filter(col("c") > 0)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(integ2 === served(state), "compacted integral != view")
  }

  test("random interleave ≡ model after every batch (both measures)") {
    val rnd = new scala.util.Random(77)
    val state = tmpDir("mm-star-rand")
    var liveF = Map.empty[Long, Fact]
    var l1 = Map.empty[Long, Long]     // order -> cust
    var l2 = Map.empty[Long, String]   // cust -> seg
    var nextId = 0L
    for (b <- 0 until 10) {
      val fs = (0 until rnd.nextInt(5)).map { _ =>
        nextId += 1
        (1L + rnd.nextInt(6), nextId, rnd.nextInt(5).toLong,
          rnd.nextInt(3).toLong)
      }
      val dels = liveF.values.toSeq.sortBy(_._2)
        .filter(_ => rnd.nextDouble() < 0.2).map(f => (f._1, f._2))
      val u1 = (0 until rnd.nextInt(3)).map(_ =>
        (1L + rnd.nextInt(6), 100L + rnd.nextInt(4)))
      val u2 = (0 until rnd.nextInt(3)).map(_ =>
        (100L + rnd.nextInt(4), s"S${rnd.nextInt(3)}"))
      fold(state, fs, dels, u1, u2, b.toLong)
      liveF = (liveF ++ fs.map(f => f._2 -> f)) -- dels.map(_._2)
      l1 = l1 ++ u1.groupBy(_._1).map { case (k, r) => k -> r.map(_._2).max }
      l2 = l2 ++ u2.groupBy(_._1).map { case (k, r) => k -> r.map(_._2).max }
      val want = liveF.values.toSeq
        .flatMap { case (k1, _, mb, mv) =>
          l1.get(k1).flatMap(l2.get).map(g => (g, mb, mv))
        }
        .groupBy(_._1)
        .map { case (g, rows) =>
          g -> (rows.map(_._2).sum, rows.map(_._3).sum, rows.size.toLong)
        }
      assert(served(state) === want, s"batch $b diverged")
    }
  }

  test("power-sum measures serve exact moments over the maintained join") {
    // the IncrementalMoments device lifted onto a JOIN: m = x, m2 = x²
    // are both additive int64 power sums, so avg/variance per join-
    // resolved group are read-time rationals over ONE maintained view —
    // and a dim re-key moves a key's whole power-sum block exactly
    val state = tmpDir("mm-star-moments")
    val xs = Seq((10L, 1L, 3L), (10L, 2L, 5L), (20L, 3L, 8L), (20L, 4L, 10L))
    fold(state, xs.map { case (k, id, x) => (k, id, x, x * x) },
      dels = Nil, l1 = Seq((10L, 500L), (20L, 501L)),
      l2 = Seq((500L, "A"), (501L, "B")), id = 0L)
    def moments(state: String): Map[String, (Double, Double)] =
      served(state).map { case (g, (s1, s2, n)) =>
        val mean = s1.toDouble / n
        g -> (mean, s2.toDouble / n - mean * mean)
      }
    assert(moments(state) === Map(
      "A" -> ((4.0, 1.0)),       // {3,5}: mean 4, var 1
      "B" -> ((9.0, 1.0))))      // {8,10}: mean 9, var 1
    // re-key order 20 -> customer 500 (A): the whole power-sum block moves
    fold(state, Nil, Nil, Seq((20L, 500L)), Nil, 1L)
    val all = Seq(3L, 5L, 8L, 10L)
    val mean = all.sum.toDouble / all.size
    val varA = all.map(x => x * x).sum.toDouble / all.size - mean * mean
    assert(moments(state) === Map("A" -> ((mean, varA))))
  }

  test("lineitem-as-CDC fold serves the x124 batch twin exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    import org.apache.spark.sql.functions.lit
    val state = tmpDir("mm-star-x124")
    // the synthetic lineitem has NO small natural key (duplicate
    // (orderkey, linenumber) pairs); a row_number over a TOTAL column
    // order is the deterministic fact id (the ChainNRehearsal device)
    val facts = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long").as("k1"),
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(
            col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_extendedprice"), col("l_quantity")))
          .cast("long").as("id"),
        graft.functions.cents(col("l_extendedprice")).as("m"),
        col("l_quantity").cast("long").as("mv"))
      .cache()
    val ord = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").cast("long").as("k"),
        col("o_custkey").cast("long").as("vl"),
        lit(null).cast("string").as("vs"))
    val cust = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"),
        lit(null).cast("long").as("vl"), col("c_mktsegment").as("vs"))
    val noD = cust.limit(0)
    // facts in 3 slices out of order vs the dims (dims land with slice 1)
    val slices = Seq(facts.filter("id % 3 = 0"), facts.filter("id % 3 = 1"),
      facts.filter("id % 3 = 2"))
    slices.zipWithIndex.foreach { case (sl, i) =>
      IncrementalJoinAggStar.processBatch(spec,
        sl, Seq("k1"), "id", null,
        facts.select("k1", "id").limit(0), Seq("k1"), "id",
        Seq(Seq(if (i == 1) ord else noD, if (i == 1) cust else noD)),
        Seq(Seq(("k", "vl", "vs"), ("k", "vl", "vs"))),
        state, i.toLong, numBuckets = 4, factMs = Seq("m", "mv"))
    }
    val twin = graft.queries.ExtQueries.x124SegmentMeasures(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(served(state) === twin)
  }

  test("reshard to 2x buckets carries every table and measure; folds continue") {
    val s4 = tmpDir("mm-star-rs4")
    val s8 = tmpDir("mm-star-rs8")
    def foldAt(s: String, id: Long, buckets: Int, fb: Seq[Fact],
        l1: Seq[(Long, Long)], l2: Seq[(Long, String)]): Unit =
      IncrementalJoinAggStar.processBatch(spec,
        fb.toDF("k1", "id", "m", "mv"), Seq("k1"), "id", null,
        fb.map(f => (f._1, f._2)).toDF("k1", "id").limit(0), Seq("k1"), "id",
        Seq(Seq(
          l1.map { case (k, v) => (k, Some(v), None: Option[String]) }
            .toDF("k", "vl", "vs"),
          l2.map { case (k, v) => (k, None: Option[Long], Some(v)) }
            .toDF("k", "vl", "vs"))),
        Seq(Seq(("k", "vl", "vs"), ("k", "vl", "vs"))),
        s, id, numBuckets = buckets, factMs = Seq("m", "mv"))
    foldAt(s4, 0L, 4, Seq((10L, 1L, 1L, 7L), (20L, 2L, 2L, 11L)),
      Seq((10L, 500L), (20L, 501L)), Seq((500L, "A"), (501L, "B")))
    IncrementalJoinAggStar.reshard(spark, spec, s4, s8, newBuckets = 8)
    assert(served(s8) === served(s4), "reshard changed the view")
    // r12 resume floor: the pre-reshard batch id is refused on the new
    // store (markers gone — replay must fail loudly, not re-apply)
    val refused = intercept[IllegalArgumentException] {
      foldAt(s8, 0L, 8, Seq((30L, 9L, 9L, 9L)), Nil, Nil)
    }
    assert(refused.getMessage.contains("resume floor"))
    // continuation on both stores: a re-key (the value-mirror-dependent
    // path) and a new fact
    for ((s, b) <- Seq((s4, 4), (s8, 8)))
      foldAt(s, 1L, b, Seq((20L, 3L, 4L, 13L)), Seq((10L, 501L)), Nil)
    assert(served(s8) === served(s4), "post-reshard fold diverged")
    assert(served(s8) === Map("B" -> ((7L, 31L, 3L))))
  }

  test("bootstrap with two measures, then continue") {
    val state = tmpDir("mm-star-bs")
    IncrementalJoinAggStar.bootstrap(spec,
      Seq((10L, 1L, 2L, 7L), (20L, 2L, 3L, 11L)).toDF("k1", "id", "m", "mv"),
      Seq("k1"), "id", null,
      Seq(Seq(
        Seq((10L, Some(500L), None: Option[String]),
          (20L, Some(500L), None: Option[String])).toDF("k", "vl", "vs"),
        Seq((500L, None: Option[Long], Some("A"))).toDF("k", "vl", "vs"))),
      Seq(Seq(("k", "vl", "vs"), ("k", "vl", "vs"))),
      state, baselineBatch = 0L, numBuckets = 4, factMs = Seq("m", "mv"))
    assert(served(state) === Map("A" -> (5L, 18L, 2L)))
    fold(state, Seq((10L, 3L, 1L, 1L)), Seq((20L, 2L)), Nil, Nil, 1L)
    assert(served(state) === Map("A" -> (3L, 8L, 2L)))
  }
}
