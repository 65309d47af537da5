package graft.streaming

import graft.SparkTestBase
import IncrementalJoinAggStar.StarSpec

/** Maintained exact COUNT(DISTINCT) over the star join (R158): the
  * (g, dk)-multiplicity relation fed by the same finished delta as the
  * sum must serve the exact distinct count through fact deletes
  * (deleting the LAST fact of a value decrements, deleting one of two
  * does not — the case no scalar distinct-state can serve), dim
  * re-keys (the value's multiplicity MOVES between groups), left-branch
  * presence changes (the null group has distinct counts too), random
  * signed interleaves, bootstrap, and replay. Also pins the bootstrap
  * fix for trackExtrema (the e/ table now materializes at bootstrap). */
class IncrementalJoinAggStarDistinctSpec extends SparkTestBase {
  import spark.implicits._

  private type Dim = (Long, Option[Long], Option[String])

  // fact(k1=custkey); branch = customer(link nation) -> nation(attr);
  // distinct over k1 = "distinct customers per nation"
  private val specD = StarSpec(Seq(2), groupAttrs = Seq((1, 2)),
    trackDistinct = Some("k1"))
  private val specDL = specD.copy(leftBranches = Set(1))

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAggStar.view(spark, state)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        (r.getLong(1), r.getLong(2))).toMap
  private def distinct(state: String): Map[String, Long] =
    IncrementalJoinAggStar.distinctView(spark, state)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        r.getLong(1)).toMap

  private def fold(spec: StarSpec, state: String,
      fb: Seq[(Long, Long, Long)], dels: Seq[(Long, Long)],
      ups: Map[(Int, Int), Seq[Dim]], id: Long): Unit = {
    val d = (1 to spec.B).map { b =>
      (1 to spec.branchDepths(b - 1)).map { i =>
        ups.getOrElse((b, i), Seq.empty[Dim]).toDF("k", "vl", "vs")
      }
    }
    val dc = (1 to spec.B).map { b =>
      (1 to spec.branchDepths(b - 1)).map(_ => ("k", "vl", "vs"))
    }
    IncrementalJoinAggStar.processBatch(spec,
      fb.toDF("k1", "id", "m"), Seq("k1"), "id", "m",
      dels.toDF("k1", "id"), Seq("k1"), "id",
      d, dc, state, id, numBuckets = 4)
  }

  /** model: live facts id -> (custkey, m); levels as maps. */
  private def expected(spec: StarSpec, facts: Map[Long, (Long, Long)],
      l1: Map[Long, Long], l2: Map[Long, String]):
      (Map[String, (Long, Long)], Map[String, Long]) = {
    val left = spec.leftBranches(1)
    val rows = facts.values.toSeq.flatMap { case (ck, m) =>
      (l1.get(ck).flatMap(l2.get), left) match {
        case (Some(n), _) => Some((n, ck, m))
        case (None, true) => Some((null: String, ck, m))
        case (None, false) => None
      }
    }
    (rows.groupBy(_._1).map { case (g, rs) =>
      g -> (rs.map(_._3).sum, rs.size.toLong) },
     rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).distinct.size.toLong })
  }

  test("distinct decrements only when the LAST fact of a value goes; re-keys move multiplicities") {
    val state = tmpDir("stardist1")
    // customers 500, 501 -> nation A; 502 -> B; cust 500 places 2 orders
    fold(specD, state,
      Seq((500L, 1L, 10L), (500L, 2L, 20L), (501L, 3L, 30L), (502L, 4L, 40L)),
      Nil, Map(
        (1, 1) -> Seq((500L, Some(7L), None), (501L, Some(7L), None),
          (502L, Some(8L), None)),
        (1, 2) -> Seq((7L, None, Some("A")), (8L, None, Some("B")))), 0L)
    assert(served(state) === Map("A" -> (60L, 3L), "B" -> (40L, 1L)))
    assert(distinct(state) === Map("A" -> 2L, "B" -> 1L))
    // delete ONE of customer 500's orders: count drops, distinct holds
    fold(specD, state, Nil, Seq((500L, 1L)), Map.empty, 1L)
    assert(served(state) === Map("A" -> (50L, 2L), "B" -> (40L, 1L)))
    assert(distinct(state) === Map("A" -> 2L, "B" -> 1L))
    // delete the LAST order: distinct finally decrements
    fold(specD, state, Nil, Seq((500L, 2L)), Map.empty, 2L)
    assert(distinct(state) === Map("A" -> 1L, "B" -> 1L))
    // re-key: customer 501 moves to nation B — multiplicity moves whole
    fold(specD, state, Nil, Nil,
      Map((1, 1) -> Seq((501L, Some(8L), None): Dim)), 3L)
    assert(distinct(state) === Map("B" -> 2L))
    assert(served(state) === Map("B" -> (70L, 2L)))
    // replay no-op
    fold(specD, state, Nil, Nil,
      Map((1, 1) -> Seq((501L, Some(8L), None): Dim)), 3L)
    assert(distinct(state) === Map("B" -> 2L))
  }

  test("left branch: the null group carries distinct counts; arrivals move them") {
    val state = tmpDir("stardist-l")
    fold(specDL, state,
      Seq((500L, 1L, 10L), (500L, 2L, 20L), (501L, 3L, 30L)),
      Nil, Map((1, 2) -> Seq((7L, None, Some("A")))), 0L)
    // no customer rows yet: both customers dangle in the null group
    assert(distinct(state) === Map((null: String) -> 2L))
    // customer 500 arrives: its multiplicity (2 orders, 1 distinct)
    // moves to A; 501 stays null
    fold(specDL, state, Nil, Nil,
      Map((1, 1) -> Seq((500L, Some(7L), None): Dim)), 1L)
    assert(distinct(state) === Map("A" -> 1L, (null: String) -> 1L))
    assert(served(state) === Map("A" -> (30L, 2L), (null: String) -> (30L, 1L)))
  }

  test("random signed interleave: distinct view == model after every batch (inner and left)") {
    for ((spec, tag) <- Seq((specD, "inner"), (specDL, "left"))) {
      val state = tmpDir(s"stardist-rnd-$tag")
      val rnd = new scala.util.Random(71)
      var facts = Map.empty[Long, (Long, Long)]
      var l1 = Map.empty[Long, Long]; var l2 = Map.empty[Long, String]
      var nextId = 0L
      for (b <- 0L until 6L) {
        val fb = Seq.fill(rnd.nextInt(4)) {
          nextId += 1
          (500L + rnd.nextInt(4), nextId, rnd.nextInt(50).toLong)
        }
        val dels = facts.toSeq.sortBy(_._1).take(rnd.nextInt(2))
          .map { case (id, (ck, _)) => (ck, id) }
        val ups = Map(
          (1, 1) -> Seq.fill(rnd.nextInt(3))(
            (500L + rnd.nextInt(4).toLong, Some(7L + rnd.nextInt(3)), None): Dim),
          (1, 2) -> Seq.fill(rnd.nextInt(2))(
            (7L + rnd.nextInt(3).toLong, None, Some(s"N${rnd.nextInt(3)}")): Dim))
        fold(spec, state, fb, dels, ups, b)
        val delIds = dels.map(_._2).toSet
        facts = (facts ++ fb.filterNot(r => facts.contains(r._2) || delIds(r._2))
          .groupBy(_._2).map { case (id, rows) =>
            id -> rows.map(r => (r._1, r._3)).min }) -- delIds
        l1 = l1 ++ ups((1, 1)).groupBy(_._1)
          .map { case (k, rows) => k -> rows.map(_._2.get).max }
        l2 = l2 ++ ups((1, 2)).groupBy(_._1)
          .map { case (k, rows) => k -> rows.map(_._3.get).max }
        val (wantView, wantDist) = expected(spec, facts, l1, l2)
        assert(served(state) === wantView, s"[$tag] batch $b view diverged")
        assert(distinct(state) === wantDist, s"[$tag] batch $b distinct diverged")
      }
    }
  }

  test("orders-as-CDC fold serves the x121 batch twin exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    import org.apache.spark.sql.functions.{col, lit}
    val state = tmpDir("stardist-x121")
    val specC = StarSpec(Seq(2), groupAttrs = Seq((1, 2)),
      trackDistinct = Some("k1"))
    val facts = graft.Tables.orders(spark, dir)
      .select(col("o_custkey").as("k1"), col("o_orderkey").as("id"),
        graft.functions.cents(col("o_totalprice")).as("m"))
    val cust = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("k"),
        col("c_nationkey").cast("long").as("vl"),
        lit(null).cast("string").as("vs"))
    val nat = graft.Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"),
        lit(null).cast("long").as("vl"), col("n_name").as("vs"))
    val noD = nat.limit(0)
    // facts in 3 slices out of order vs the dims (dims land with slice 1)
    val slices = Seq(facts.filter("id % 3 = 0"), facts.filter("id % 3 = 1"),
      facts.filter("id % 3 = 2"))
    slices.zipWithIndex.foreach { case (s, i) =>
      IncrementalJoinAggStar.processBatch(specC,
        s, Seq("k1"), "id", "m",
        facts.select("k1", "id").limit(0), Seq("k1"), "id",
        Seq(Seq(if (i == 1) cust else noD, if (i == 1) nat else noD)),
        Seq(Seq(("k", "vl", "vs"), ("k", "vl", "vs"))),
        state, i.toLong, numBuckets = 4)
    }
    val twin = graft.queries.ExtQueries.x121NationDistinct(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val v = served(state)
    val d = distinct(state)
    val got = v.map { case (g, (total, n)) => g -> (d(g), n, total) }
    assert(got === twin)
  }

  test("bootstrap materializes the distinct AND extrema relations; continuation exact") {
    val specB = specD.copy(trackExtrema = true)
    val state = tmpDir("stardist-bs")
    val f0 = Seq((500L, 1L, 10L), (500L, 2L, 20L), (501L, 3L, 30L))
    val d = Seq(Seq(
      Seq((500L, Some(7L), Option.empty[String]),
        (501L, Some(7L), Option.empty[String])).toDF("k", "vl", "vs"),
      Seq((7L, Option.empty[Long], Some("A"))).toDF("k", "vl", "vs")))
    IncrementalJoinAggStar.bootstrap(specB,
      f0.toDF("k1", "id", "m"), Seq("k1"), "id", "m",
      d, Seq(Seq(("k", "vl", "vs"), ("k", "vl", "vs"))), state,
      baselineBatch = 0L, numBuckets = 4)
    assert(distinct(state) === Map("A" -> 2L))
    // the r11 bootstrap fix: extrema relation exists from batch tables
    assert(IncrementalJoinAggStar.extremaView(spark, state)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap === Map("A" -> ((3L, 10L, 30L))))
    // continuation: delete the max-order AND customer 500's 2nd order —
    // extrema falls back, distinct holds (one order left per customer)
    fold(specB, state, Nil, Seq((501L, 3L), (500L, 2L)), Map.empty, 1L)
    assert(distinct(state) === Map("A" -> 1L))
    assert(IncrementalJoinAggStar.extremaView(spark, state)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap === Map("A" -> ((1L, 10L, 10L))))
  }

  test("R173: valueSubBuckets spreads a dominant group's u/ and e/ over S buckets; serves ≡ plain; reshard re-routes") {
    import org.apache.spark.sql.functions.col
    val S = 8; val B = 16
    val specS = specD.copy(trackExtrema = true, valueSubBuckets = S)
    val specP = specD.copy(trackExtrema = true)
    val plain = tmpDir("stardist-p"); val sub = tmpDir("stardist-s")
    // B=16 here (not the suite's 4): the S sub-keys need room in the
    // physical bucket space to spread — S ≪ B is the layout contract
    def foldB(spec: StarSpec, state: String, fb: Seq[(Long, Long, Long)],
        dels: Seq[(Long, Long)], ups: Map[(Int, Int), Seq[Dim]],
        id: Long): Unit =
      IncrementalJoinAggStar.processBatch(spec,
        fb.toDF("k1", "id", "m"), Seq("k1"), "id", "m",
        dels.toDF("k1", "id"), Seq("k1"), "id",
        (1 to spec.B).map(b => (1 to spec.branchDepths(b - 1)).map(i =>
          ups.getOrElse((b, i), Seq.empty[Dim]).toDF("k", "vl", "vs"))),
        (1 to spec.B).map(b => (1 to spec.branchDepths(b - 1)).map(_ =>
          ("k", "vl", "vs"))),
        state, id, numBuckets = B)
    // 2000 customers in ONE nation: the dominant-group shape — every
    // (g, customer) multiplicity row lands in nation A's key
    val facts = (0 until 2000).map(i => (i.toLong, i.toLong, i.toLong % 97))
    val links = (0 until 2000).map(i => (i.toLong, Some(7L), None): Dim)
    val ups = Map((1, 1) -> links,
      (1, 2) -> Seq((7L, None, Some("A")): Dim))
    foldB(specP, plain, facts, Nil, ups, 0L)
    foldB(specS, sub, facts, Nil, ups, 0L)
    def perBucket(state: String, table: String): Seq[Long] = {
      val base = new java.io.File(s"$state/joinaggstar/$table")
      base.listFiles().filter(_.getName.matches("bucket=\\d+")).toSeq
        .map(d => spark.read.parquet(d.toString)
          .filter(col("g") === "A").count())
        .filter(_ > 0)
    }
    assert(perBucket(plain, "u").size === 1, "plain: one bucket holds all")
    val subU = perBucket(sub, "u")
    assert(subU.size >= S / 2 && subU.max <= 2000L / 3,
      s"u/ per-bucket bound must drop S-fold-ish: $subU")
    assert(subU.sum === 2000L)
    assert(perBucket(sub, "e").size >= S / 2, "e/ spreads too")
    // serves unchanged-exact
    assert(distinct(sub) === distinct(plain) && distinct(sub) === Map("A" -> 2000L))
    assert(IncrementalJoinAggStar.extremaView(spark, sub).collect().toSeq ===
      IncrementalJoinAggStar.extremaView(spark, plain).collect().toSeq)
    // a delete folds through the sub layout exactly (touches 1 value)
    foldB(specS, sub, Nil, Seq((1999L, 1999L)), Map.empty, 1L)
    foldB(specP, plain, Nil, Seq((1999L, 1999L)), Map.empty, 1L)
    assert(distinct(sub) === distinct(plain) && distinct(sub) === Map("A" -> 1999L))
    // reshard re-derives the routing coordinate; serves survive
    val dst = tmpDir("stardist-rs")
    IncrementalJoinAggStar.reshard(spark, specS, sub, dst, newBuckets = 8)
    assert(distinct(dst) === distinct(sub))
    assert(IncrementalJoinAggStar.extremaView(spark, dst).collect().toSeq ===
      IncrementalJoinAggStar.extremaView(spark, sub).collect().toSeq)
    val dstU = perBucket(dst, "u")
    assert(dstU.sum === 1999L && dstU.size > 1,
      s"resharded u/ keeps the sub-bucket spread: $dstU")
  }
}
