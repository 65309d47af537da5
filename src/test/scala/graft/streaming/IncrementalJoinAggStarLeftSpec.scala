package graft.streaming

import graft.SparkTestBase
import IncrementalJoinAggStar.StarSpec

/** LEFT-join branches (R156): the maintained view must equal the batch
  * LEFT-join recompute after every batch — in particular the left
  * engine's distinctive retraction, which the inner engine never
  * produces: a dim key ARRIVING moves dangling facts OUT of the
  * null-padded group (the completed relation's virtual -(k,null,null)
  * row). Covers single-level left, a chained left branch with
  * mid-chain dangle, mixed inner+left specs, multi-attribute
  * null-preserving group keys, deletes in the null group, random
  * interleaves against an exact model, replay, and bootstrap. */
class IncrementalJoinAggStarLeftSpec extends SparkTestBase {
  import spark.implicits._

  private type Dim = (Long, Option[Long], Option[String])

  /** Exact LEFT-aware batch model: a left branch resolves a missing
    * level (or a null pointer) as None-attributes from that level UP,
    * instead of dropping the fact. */
  private case class Model(spec: StarSpec,
      facts: Map[Long, (Vector[Long], Long)] = Map.empty,
      levels: Vector[Vector[Map[Long, (Option[Long], Option[String])]]]) {
    private implicit val dimOrd: Ordering[(Option[Long], Option[String])] =
      Ordering.Tuple2(Ordering.Option[Long], Ordering.Option[String])
    def fold(fb: Seq[(Vector[Long], Long, Long)], dels: Seq[Long],
        ups: Map[(Int, Int), Seq[Dim]]): Model = {
      val delIds = dels.toSet
      val fAbs = fb.groupBy(_._2).map { case (id, rows) =>
        id -> rows.map(r => (r._1, r._3)).minBy(t => (t._1, t._2))(
          Ordering.Tuple2(Ordering.Implicits.seqOrdering[Vector, Long], Ordering.Long))
      }
      val kept = (facts ++ fAbs.filterNot { case (id, _) =>
        facts.contains(id) || delIds.contains(id) }) -- delIds
      val nl = levels.zipWithIndex.map { case (branch, bi) =>
        branch.zipWithIndex.map { case (lvl, li) =>
          val abs = ups.getOrElse((bi + 1, li + 1), Nil).groupBy(_._1)
            .map { case (k, rows) => k -> rows.map(r => (r._2, r._3)).max }
          lvl ++ abs
        }
      }
      Model(spec, kept, nl)
    }
    /** None = the (inner) branch dangles and the fact drops;
      * Some(attrs) = per-level attributes, None-padded under left. */
    private def resolve(ks: Vector[Long], b: Int): Option[Vector[Option[String]]] = {
      val left = spec.leftBranches(b)
      var k: Option[Long] = Some(ks(b - 1))
      val attrs = Vector.newBuilder[Option[String]]
      for (i <- 1 to spec.branchDepths(b - 1)) {
        k.flatMap(levels(b - 1)(i - 1).get) match {
          case Some((vl, vs)) => attrs += vs; k = vl
          case None =>
            if (!left) return None
            attrs += None; k = None
        }
      }
      Some(attrs.result())
    }
    def resolvedPairs: Seq[(Vector[Option[String]], Long)] =
      facts.values.toSeq.flatMap { case (ks, m) =>
        val branches = (1 to spec.B).map(b => resolve(ks, b))
        if (branches.exists(_.isEmpty)) None
        else {
          val a = branches.map(_.get)
          def attr(p: (Int, Int)) = a(p._1 - 1)(p._2 - 1)
          val eqOk = spec.eqAttrs.forall { case (x, y) =>
            (attr(x), attr(y)) match {
              case (Some(u), Some(v)) => u == v
              case _ => false
            }
          }
          val litOk = spec.litAttrs.forall { case (x, v) => attr(x).contains(v) }
          if (eqOk && litOk) Some(spec.groupAttrs.map(attr).toVector -> m)
          else None
        }
      }
    /** Group encoding mirrors the engine: single attr = the attr
      * itself (null allowed); multi-attr under left = NUL-coalesced
      * \u0001-concat. */
    private def enc(gs: Vector[Option[String]]): String =
      if (gs.size == 1) gs.head.orNull
      else gs.map(_.getOrElse("\u0000")).mkString("\u0001")
    def view: Map[String, (Long, Long)] =
      resolvedPairs.groupBy(p => enc(p._1))
        .map { case (g, ms) => g -> (ms.map(_._2).sum, ms.size.toLong) }
  }

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAggStar.view(spark, state)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        (r.getLong(1), r.getLong(2))).toMap

  private def dimsDf(spec: StarSpec, ups: Map[(Int, Int), Seq[Dim]]) = (
    (1 to spec.B).map { b =>
      (1 to spec.branchDepths(b - 1)).map { i =>
        ups.getOrElse((b, i), Seq.empty[Dim]).toDF("k", "vl", "vs")
      }
    },
    (1 to spec.B).map { b =>
      (1 to spec.branchDepths(b - 1)).map(_ => ("k", "vl", "vs"))
    })

  private def fold(spec: StarSpec, state: String,
      fb: Seq[(Long, Long, Long, Long)], dels: Seq[(Long, Long, Long)],
      ups: Map[(Int, Int), Seq[Dim]], id: Long): Unit = {
    val (d, dc) = dimsDf(spec, ups)
    IncrementalJoinAggStar.processBatch(spec,
      fb.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
      dels.toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      d, dc, state, id, numBuckets = 4)
  }

  // fact(k1, k2); branch 1 = link -> (attr), LEFT; branch 2 = (attr),
  // inner; group by branch 1's top attr
  private val specL = StarSpec(Seq(2, 1), groupAttrs = Seq((1, 2)),
    leftBranches = Set(1))

  test("left branch: dangling facts serve as the NULL group; the dim ARRIVAL retracts the padding") {
    val state = tmpDir("starl1")
    var m = Model(specL, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
    def step(fb: Seq[(Long, Long, Long, Long)], dels: Seq[(Long, Long, Long)],
        ups: Map[(Int, Int), Seq[Dim]], id: Long): Unit = {
      fold(specL, state, fb, dels, ups, id)
      m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), dels.map(_._3), ups)
      assert(served(state) === m.view, s"batch $id diverged")
    }
    // branch 2 (inner) resolves; branch 1 entirely missing: NULL group
    step(Seq((10L, 70L, 1L, 100L), (20L, 70L, 2L, 50L)), Nil,
      Map((2, 1) -> Seq((70L, None, Some("S")))), 0L)
    assert(served(state) === Map((null: String) -> (150L, 2L)))
    // level 1 arrives for order 10 only — fact 1 STAYS null-grouped
    // (level 2 still missing: mid-chain dangle), fact 2 stays dangling
    // at level 1
    step(Nil, Nil, Map((1, 1) -> Seq((10L, Some(500L), None))), 1L)
    assert(served(state) === Map((null: String) -> (150L, 2L)))
    // level 2 arrives: fact 1 moves NULL -> "A" (the virtual
    // retraction two levels from the facts); fact 2 still null
    step(Nil, Nil, Map((1, 2) -> Seq((500L, None, Some("A")))), 2L)
    assert(served(state) === Map((null: String) -> (50L, 1L), "A" -> (100L, 1L)))
    // fact 2's chain completes via a different customer
    step(Nil, Nil, Map(
      (1, 1) -> Seq((20L, Some(501L), None)),
      (1, 2) -> Seq((501L, None, Some("B")))), 3L)
    assert(served(state) === Map("A" -> (100L, 1L), "B" -> (50L, 1L)))
    // re-key: order 10 re-routes to customer 501 — regroup A -> B, no
    // presence change, no null traffic
    step(Nil, Nil, Map((1, 1) -> Seq((10L, Some(501L), None))), 4L)
    assert(served(state) === Map("B" -> (150L, 2L)))
    // a NEW fact pointing at a missing order re-opens the null group;
    // deleting it empties the group again; replay is a no-op
    step(Seq((30L, 70L, 3L, 7L)), Nil, Map.empty, 5L)
    assert(served(state) === Map("B" -> (150L, 2L), (null: String) -> (7L, 1L)))
    step(Nil, Seq((30L, 70L, 3L)), Map.empty, 6L)
    assert(served(state) === Map("B" -> (150L, 2L)))
    fold(specL, state, Nil, Seq((30L, 70L, 3L)), Map.empty, 6L)
    assert(served(state) === Map("B" -> (150L, 2L)))
    // a fact with a NULL branch-2 key would drop (inner); with a NULL
    // branch-1 key it pads — branch 1 is the left one
    val (dN, dcN) = dimsDf(specL, Map.empty)
    IncrementalJoinAggStar.processBatch(specL,
      Seq((Option.empty[Long], Some(70L), 4L, 9L))
        .toDF("k1", "k2", "id", "m"),
      Seq("k1", "k2"), "id", "m",
      Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      dN, dcN, state, 7L, numBuckets = 4)
    assert(served(state) === Map("B" -> (150L, 2L), (null: String) -> (9L, 1L)))
  }

  test("ANTI-join corollary: the null group IS the facts-without-match aggregate") {
    // one left branch of depth 1, no other branches: view = left join;
    // null group = anti join, non-null groups = semi/inner join
    val spec = StarSpec(Seq(1), groupAttrs = Seq((1, 1)), leftBranches = Set(1))
    val state = tmpDir("starl-anti")
    val (d, dc) = dimsDf(spec, Map((1, 1) -> Seq((10L, None, Some("X")))))
    IncrementalJoinAggStar.processBatch(spec,
      Seq((10L, 1L, 5L), (11L, 2L, 3L), (12L, 3L, 2L)).toDF("k1", "id", "m"),
      Seq("k1"), "id", "m",
      Seq.empty[(Long, Long)].toDF("k1", "id"), Seq("k1"), "id",
      d, dc, state, 0L, numBuckets = 4)
    assert(served(state) === Map("X" -> (5L, 1L), (null: String) -> (5L, 2L)))
  }

  test("mixed inner+left with multi-attribute group: null-preserving encoding") {
    // group by (inner branch 1 attr, LEFT branch 2 attr): ("A", null)
    // and ("B", null) must stay distinct groups
    val spec = StarSpec(Seq(1, 1), groupAttrs = Seq((1, 1), (2, 1)),
      leftBranches = Set(2))
    val state = tmpDir("starl-g2")
    val (d, dc) = dimsDf(spec, Map(
      (1, 1) -> Seq((10L, None, Some("A")), (20L, None, Some("B"))),
      (2, 1) -> Seq((70L, None, Some("X")))))
    IncrementalJoinAggStar.processBatch(spec,
      Seq((10L, 70L, 1L, 100L), (10L, 71L, 2L, 50L), (20L, 71L, 3L, 7L))
        .toDF("k1", "k2", "id", "m"),
      Seq("k1", "k2"), "id", "m",
      Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      d, dc, state, 0L, numBuckets = 4)
    assert(served(state) === Map(
      "A\u0001X" -> (100L, 1L),
      "A\u0001\u0000" -> (50L, 1L),
      "B\u0001\u0000" -> (7L, 1L)))
    // supplier 71 arrives: BOTH null-padded groups retract and regroup
    val (d2, dc2) = dimsDf(spec, Map((2, 1) -> Seq((71L, None, Some("Y")): Dim)))
    IncrementalJoinAggStar.processBatch(spec,
      Seq.empty[(Long, Long, Long, Long)].toDF("k1", "k2", "id", "m"),
      Seq("k1", "k2"), "id", "m",
      Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      d2, dc2, state, 1L, numBuckets = 4)
    assert(served(state) === Map(
      "A\u0001X" -> (100L, 1L),
      "A\u0001Y" -> (50L, 1L),
      "B\u0001Y" -> (7L, 1L)))
  }

  test("random interleave == LEFT model after every batch; changelog integral == view; inner spec unchanged by the flag") {
    val state = tmpDir("starl-rnd")
    val rnd = new scala.util.Random(23)
    var m = Model(specL, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
    var nextId = 0L
    for (b <- 0L until 6L) {
      val fb = Seq.fill(rnd.nextInt(4)) {
        nextId += 1
        (rnd.nextInt(5).toLong, 70L + rnd.nextInt(2), nextId, rnd.nextInt(50).toLong)
      }
      val dels = m.facts.toSeq.sortBy(_._1).take(rnd.nextInt(2))
        .map { case (id, (ks, _)) => (ks(0), ks(1), id) }
      // sparse dim arrivals: most facts stay dangling for a while — the
      // left engine's whole point
      val ups = Map(
        (1, 1) -> Seq.fill(rnd.nextInt(2))(
          (rnd.nextInt(5).toLong, Some(500L + rnd.nextInt(3)), None): Dim),
        (1, 2) -> Seq.fill(rnd.nextInt(2))(
          (500L + rnd.nextInt(3).toLong, None, Some(s"N${rnd.nextInt(3)}")): Dim),
        (2, 1) -> Seq.fill(rnd.nextInt(2))(
          (70L + rnd.nextInt(2).toLong, None, Some(s"S${rnd.nextInt(2)}")): Dim))
      fold(specL, state, fb, dels, ups, b)
      m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), dels.map(_._3), ups)
      assert(served(state) === m.view, s"batch $b diverged from the LEFT model")
    }
    val integral = IncrementalJoinAggStar.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("p"))
      .filter("p <> 0")
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(integral === served(state))
  }

  test("bootstrap with a left branch: dangling facts land in the null group; continuation stays exact") {
    val state = tmpDir("starl-bs")
    var m = Model(specL, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
    val f0 = Seq((10L, 70L, 1L, 100L), (20L, 70L, 2L, 50L))
    val ups0: Map[(Int, Int), Seq[Dim]] = Map(
      (1, 1) -> Seq((10L, Some(500L), None)),
      (1, 2) -> Seq((500L, None, Some("A"))),
      (2, 1) -> Seq((70L, None, Some("S"))))
    val (d0, dc0) = dimsDf(specL, ups0)
    IncrementalJoinAggStar.bootstrap(specL,
      f0.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
      d0, dc0, state, baselineBatch = 0L, numBuckets = 4)
    m = m.fold(f0.map(r => (Vector(r._1, r._2), r._3, r._4)), Nil, ups0)
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (100L, 1L), (null: String) -> (50L, 1L)))
    // continuation: order 20's chain completes — the bootstrapped null
    // padding retracts through the incremental path
    fold(specL, state, Nil, Nil, Map(
      (1, 1) -> Seq((20L, Some(501L), None): Dim),
      (1, 2) -> Seq((501L, None, Some("B")): Dim)), 1L)
    m = m.fold(Nil, Nil, Map(
      (1, 1) -> Seq((20L, Some(501L), None): Dim),
      (1, 2) -> Seq((501L, None, Some("B")): Dim)))
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (100L, 1L), "B" -> (50L, 1L)))
  }
}
