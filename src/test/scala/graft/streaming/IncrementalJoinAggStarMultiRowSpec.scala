package graft.streaming

import graft.SparkTestBase
import IncrementalJoinAggStar.StarSpec

/** Multi-row (fan-out) dimension levels (R159): a level in
  * `multiRows` is a SET of rows per key — a fact joining 2 level rows
  * contributes 2 resolved tuples (SQL join fan-out), adds of present
  * rows and removes of absent rows no-op (overlapping CDC replays
  * converge), deletes name the EXACT row. Checked: fan-out at the
  * fact edge and mid-chain, exact-row removal, duplicate-add no-op,
  * random interleave against a set-semantics model, replay, and the
  * orders-by-lineitem corpus fold against the x122 batch twin. */
class IncrementalJoinAggStarMultiRowSpec extends SparkTestBase {
  import spark.implicits._

  private type Dim = (Long, Option[Long], Option[String])

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAggStar.view(spark, state)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        (r.getLong(1), r.getLong(2))).toMap

  private def fold(spec: StarSpec, state: String,
      fb: Seq[(Long, Long, Long)], dels: Seq[(Long, Long)],
      ups: Map[(Int, Int), Seq[Dim]], dDels: Map[(Int, Int), Seq[Dim]],
      id: Long): Unit = {
    val d = (1 to spec.B).map { b =>
      (1 to spec.branchDepths(b - 1)).map { i =>
        ups.getOrElse((b, i), Seq.empty[Dim]).toDF("k", "vl", "vs")
      }
    }
    val dc = (1 to spec.B).map { b =>
      (1 to spec.branchDepths(b - 1)).map(_ => ("k", "vl", "vs"))
    }
    val dd = (1 to spec.B).map { b =>
      (1 to spec.branchDepths(b - 1)).map { i =>
        dDels.getOrElse((b, i), Seq.empty[Dim]).toDF("k", "vl", "vs")
      }
    }
    IncrementalJoinAggStar.processBatch(spec,
      fb.toDF("k1", "id", "m"), Seq("k1"), "id", "m",
      dels.toDF("k1", "id"), Seq("k1"), "id",
      d, dc, state, id, numBuckets = 4, dimDels = dd)
  }

  // one branch, depth 1, MULTI: rows (k, -, tag)
  private val spec1 = StarSpec(Seq(1), groupAttrs = Seq((1, 1)),
    multiRows = Set((1, 1)))

  test("fan-out at the fact edge: per-row tuples; exact-row removal; duplicate add + absent remove no-op; replay") {
    val state = tmpDir("starmr1")
    // fact 1 (k1=10) joins TWO tag rows -> contributes to both groups
    fold(spec1, state, Seq((10L, 1L, 100L), (20L, 2L, 7L)), Nil, Map(
      (1, 1) -> Seq((10L, None, Some("red")), (10L, None, Some("blue")),
        (20L, None, Some("red")))), Map.empty, 0L)
    assert(served(state) === Map("red" -> (107L, 2L), "blue" -> (100L, 1L)))
    // duplicate add is a no-op (set semantics)
    fold(spec1, state, Nil, Nil,
      Map((1, 1) -> Seq((10L, None, Some("red")): Dim)), Map.empty, 1L)
    assert(served(state) === Map("red" -> (107L, 2L), "blue" -> (100L, 1L)))
    // remove the EXACT (10, red) row: fact 1 keeps its blue tuple
    fold(spec1, state, Nil, Nil, Map.empty,
      Map((1, 1) -> Seq((10L, None, Some("red")): Dim)), 2L)
    assert(served(state) === Map("red" -> (7L, 1L), "blue" -> (100L, 1L)))
    // absent-row remove is a no-op
    fold(spec1, state, Nil, Nil, Map.empty,
      Map((1, 1) -> Seq((10L, None, Some("green")): Dim)), 3L)
    assert(served(state) === Map("red" -> (7L, 1L), "blue" -> (100L, 1L)))
    // a third row fans fact 1 wider; replay of the same batch converges
    fold(spec1, state, Nil, Nil,
      Map((1, 1) -> Seq((10L, None, Some("green")): Dim)), Map.empty, 4L)
    fold(spec1, state, Nil, Nil,
      Map((1, 1) -> Seq((10L, None, Some("green")): Dim)), Map.empty, 4L)
    assert(served(state) ===
      Map("red" -> (7L, 1L), "blue" -> (100L, 1L), "green" -> (100L, 1L)))
    // add-and-remove of the SAME row in one batch: delete-wins
    fold(spec1, state, Nil, Nil,
      Map((1, 1) -> Seq((20L, None, Some("blue")): Dim)),
      Map((1, 1) -> Seq((20L, None, Some("blue")): Dim)), 5L)
    assert(served(state) ===
      Map("red" -> (7L, 1L), "blue" -> (100L, 1L), "green" -> (100L, 1L)))
    // fact delete removes ALL its fan-out tuples
    fold(spec1, state, Nil, Seq((10L, 1L)), Map.empty, Map.empty, 6L)
    assert(served(state) === Map("red" -> (7L, 1L)))
  }

  // depth 2: level 1 MULTI (links only), level 2 keyed (attr) — the
  // m:n bridge table shape (fact -> bridge -> dimension)
  private val spec2 = StarSpec(Seq(2), groupAttrs = Seq((1, 2)),
    multiRows = Set((1, 1)))

  test("mid-chain fan-out (bridge table): links multiply; keyed re-key above moves ALL fanned tuples") {
    val state = tmpDir("starmr2")
    // fact 1 bridges to dims 7 and 8
    fold(spec2, state, Seq((10L, 1L, 100L)), Nil, Map(
      (1, 1) -> Seq((10L, Some(7L), None), (10L, Some(8L), None)),
      (1, 2) -> Seq((7L, None, Some("A")), (8L, None, Some("B")))),
      Map.empty, 0L)
    assert(served(state) === Map("A" -> (100L, 1L), "B" -> (100L, 1L)))
    // keyed level re-attr above the fan-out: dim 8 renames B -> C
    fold(spec2, state, Nil, Nil,
      Map((1, 2) -> Seq((8L, None, Some("C")): Dim)), Map.empty, 1L)
    assert(served(state) === Map("A" -> (100L, 1L), "C" -> (100L, 1L)))
    // remove one bridge row: only that path retracts
    fold(spec2, state, Nil, Nil, Map.empty,
      Map((1, 1) -> Seq((10L, Some(7L), None): Dim)), 2L)
    assert(served(state) === Map("C" -> (100L, 1L)))
    // both dims now reachable again via two NEW bridge rows in the same
    // batch as a second fact — cross-input overlap in one batch
    fold(spec2, state, Seq((11L, 2L, 5L)), Nil, Map(
      (1, 1) -> Seq((10L, Some(7L), None), (11L, Some(8L), None))),
      Map.empty, 3L)
    assert(served(state) === Map("A" -> (100L, 1L), "C" -> (105L, 2L)))
  }

  test("random interleave (row adds/removes + fact churn) == set-semantics model after every batch; integral == view") {
    val state = tmpDir("starmr-rnd")
    val rnd = new scala.util.Random(97)
    var facts = Map.empty[Long, (Long, Long)]    // id -> (k1, m)
    var rows = Set.empty[(Long, String)]          // (k, tag)
    var nextId = 0L
    for (b <- 0L until 7L) {
      val fb = Seq.fill(rnd.nextInt(3)) {
        nextId += 1
        (rnd.nextInt(4).toLong, nextId, rnd.nextInt(50).toLong)
      }
      val dels = facts.toSeq.sortBy(_._1).take(rnd.nextInt(2))
        .map { case (id, (k, _)) => (k, id) }
      val adds = Seq.fill(rnd.nextInt(3))(
        (rnd.nextInt(4).toLong, s"t${rnd.nextInt(3)}"))
      val rems = Seq.fill(rnd.nextInt(2))(
        (rnd.nextInt(4).toLong, s"t${rnd.nextInt(3)}"))
      fold(spec1, state, fb, dels,
        Map((1, 1) -> adds.map(r => (r._1, None, Some(r._2)): Dim)),
        Map((1, 1) -> rems.map(r => (r._1, None, Some(r._2)): Dim)), b)
      val delIds = dels.map(_._2).toSet
      facts = (facts ++ fb.filterNot(r => facts.contains(r._2) || delIds(r._2))
        .groupBy(_._2).map { case (id, rs) => id -> rs.map(r => (r._1, r._3)).min })
        .-- (delIds)
      // delete-wins at row granularity, then set add/remove
      val remSet = rems.toSet
      rows = (rows ++ adds.filterNot(remSet)) -- remSet
      val want = facts.values.toSeq
        .flatMap { case (k, m) => rows.filter(_._1 == k).map(r => (r._2, m)) }
        .groupBy(_._1)
        .map { case (g, ms) => g -> (ms.map(_._2).sum, ms.size.toLong) }
      assert(served(state) === want, s"batch $b diverged from the set model")
    }
    val integral = IncrementalJoinAggStar.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("p"))
      .filter("p <> 0")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(integral === served(state))
  }

  test("LEFT + multi: padding displaced only when the row count crosses zero; fan-out changes ship no null traffic") {
    val specLM = StarSpec(Seq(1), groupAttrs = Seq((1, 1)),
      leftBranches = Set(1), multiRows = Set((1, 1)))
    val state = tmpDir("starmr-lm")
    // no rows yet: both facts pad into the null group
    fold(specLM, state, Seq((10L, 1L, 100L), (20L, 2L, 7L)), Nil,
      Map.empty, Map.empty, 0L)
    assert(served(state) === Map((null: String) -> (107L, 2L)))
    // FIRST row for key 10: count 0 -> 1, padding retracts, one tuple
    fold(specLM, state, Nil, Nil,
      Map((1, 1) -> Seq((10L, None, Some("red")): Dim)), Map.empty, 1L)
    assert(served(state) === Map("red" -> (100L, 1L), (null: String) -> (7L, 1L)))
    // SECOND row: fan-out grows, NO null traffic
    fold(specLM, state, Nil, Nil,
      Map((1, 1) -> Seq((10L, None, Some("blue")): Dim)), Map.empty, 2L)
    assert(served(state) ===
      Map("red" -> (100L, 1L), "blue" -> (100L, 1L), (null: String) -> (7L, 1L)))
    // remove one of two: still present, no padding
    fold(specLM, state, Nil, Nil, Map.empty,
      Map((1, 1) -> Seq((10L, None, Some("red")): Dim)), 3L)
    assert(served(state) === Map("blue" -> (100L, 1L), (null: String) -> (7L, 1L)))
    // remove the LAST row: count 1 -> 0, padding returns
    fold(specLM, state, Nil, Nil, Map.empty,
      Map((1, 1) -> Seq((10L, None, Some("blue")): Dim)), 4L)
    assert(served(state) === Map((null: String) -> (107L, 2L)))
    // add-two-remove-one in ONE batch for a fresh key: net crossing 0->1
    fold(specLM, state, Nil, Nil,
      Map((1, 1) -> Seq((20L, None, Some("x")), (20L, None, Some("y")))),
      Map((1, 1) -> Seq((20L, None, Some("y")): Dim)), 5L)
    assert(served(state) ===
      Map("x" -> (7L, 1L), (null: String) -> (100L, 1L)))
  }

  test("LEFT + multi random interleave == set model after every batch") {
    val specLM = StarSpec(Seq(1), groupAttrs = Seq((1, 1)),
      leftBranches = Set(1), multiRows = Set((1, 1)))
    val state = tmpDir("starmr-lm-rnd")
    val rnd = new scala.util.Random(131)
    var facts = Map.empty[Long, (Long, Long)]
    var rows = Set.empty[(Long, String)]
    var nextId = 0L
    for (b <- 0L until 7L) {
      val fb = Seq.fill(rnd.nextInt(3)) {
        nextId += 1
        (rnd.nextInt(4).toLong, nextId, rnd.nextInt(50).toLong)
      }
      val dels = facts.toSeq.sortBy(_._1).take(rnd.nextInt(2))
        .map { case (id, (k, _)) => (k, id) }
      val adds = Seq.fill(rnd.nextInt(3))(
        (rnd.nextInt(4).toLong, s"t${rnd.nextInt(3)}"))
      val rems = Seq.fill(rnd.nextInt(3))(
        (rnd.nextInt(4).toLong, s"t${rnd.nextInt(3)}"))
      fold(specLM, state, fb, dels,
        Map((1, 1) -> adds.map(r => (r._1, None, Some(r._2)): Dim)),
        Map((1, 1) -> rems.map(r => (r._1, None, Some(r._2)): Dim)), b)
      val delIds = dels.map(_._2).toSet
      facts = (facts ++ fb.filterNot(r => facts.contains(r._2) || delIds(r._2))
        .groupBy(_._2).map { case (id, rs) => id -> rs.map(r => (r._1, r._3)).min })
        .-- (delIds)
      val remSet = rems.toSet
      rows = (rows ++ adds.filterNot(remSet)) -- remSet
      val want = facts.values.toSeq
        .flatMap { case (k, m) =>
          val mine = rows.filter(_._1 == k)
          if (mine.isEmpty) Seq(((null: String), m))
          else mine.toSeq.map(r => (r._2, m))
        }
        .groupBy(_._1)
        .map { case (g, ms) => g -> (ms.map(_._2).sum, ms.size.toLong) }
      assert(served(state) === want, s"batch $b diverged from the LEFT set model")
    }
  }

  test("orders-by-lineitem fold serves the x122 fan-out twin exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    import org.apache.spark.sql.functions.{col, lit}
    val state = tmpDir("starmr-x122")
    val facts = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k1"), col("o_orderkey").as("id"),
        graft.functions.cents(col("o_totalprice")).as("m"))
    val items = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long").as("k"),
        lit(null).cast("long").as("vl"), col("l_returnflag").as("vs"))
    val noD = items.limit(0)
    // lineitems sliced on a DIFFERENT axis than orders (linenumber vs
    // orderkey) so most orders' fan-out assembles across batches
    val fSlices = Seq(facts.filter("id % 2 = 0"), facts.filter("id % 2 = 1"), facts.limit(0))
    val iSlices = Seq(noD,
      graft.Tables.lineitem(spark, dir).filter("l_linenumber <= 2")
        .select(col("l_orderkey").cast("long").as("k"),
          lit(null).cast("long").as("vl"), col("l_returnflag").as("vs")),
      graft.Tables.lineitem(spark, dir).filter("l_linenumber > 2")
        .select(col("l_orderkey").cast("long").as("k"),
          lit(null).cast("long").as("vl"), col("l_returnflag").as("vs")))
    for (i <- 0 until 3) {
      IncrementalJoinAggStar.processBatch(spec1,
        fSlices(i), Seq("k1"), "id", "m",
        facts.select("k1", "id").limit(0), Seq("k1"), "id",
        Seq(Seq(iSlices(i))), Seq(Seq(("k", "vl", "vs"))),
        state, i.toLong, numBuckets = 4)
    }
    val twin = graft.queries.ExtQueries.x122FanoutRevenue(spark, dir)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._2)).toMap
    assert(served(state) === twin)
  }
}
