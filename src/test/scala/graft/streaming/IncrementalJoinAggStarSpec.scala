package graft.streaming

import graft.SparkTestBase
import IncrementalJoinAggStar.StarSpec

/** The star join-aggregate must equal the batch multi-branch recompute
  * after every batch for any interleave of facts, deletes, and upserts
  * on EVERY branch — including the star's distinctive retractions: a
  * re-key on one branch flipping a CROSS-BRANCH equality that the other
  * branch's attributes participate in, and a literal-filter attribute
  * flip (the Q5 `r_name = 'ASIA'` shape) deep in a 4-level branch. */
class IncrementalJoinAggStarSpec extends SparkTestBase {
  import spark.implicits._

  // scripted + random shape: fact(k1, k2); branch 1 = link → (attr);
  // branch 2 = (attr); group by (1,2)'s attr, constrained equal to
  // (2,1)'s attr — "revenue per nation where customer-nation ==
  // supplier-nation"
  private val spec21 = StarSpec(Seq(2, 1), groupAttrs = Seq((1, 2)),
    eqAttrs = Seq(((1, 2), (2, 1))))

  private type Dim = (Long, Option[Long], Option[String])

  /** Reference model: exact batch semantics incl. the engine's
    * within-batch dedup (min-(ks,m) facts, max-(vl,vs) dims). */
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
    private def resolve(ks: Vector[Long], b: Int): Option[Vector[Option[String]]] = {
      var k: Option[Long] = Some(ks(b - 1))
      val attrs = Vector.newBuilder[Option[String]]
      for (i <- 1 to spec.branchDepths(b - 1)) {
        k.flatMap(levels(b - 1)(i - 1).get) match {
          case Some((vl, vs)) => attrs += vs; k = vl
          case None => return None
        }
      }
      Some(attrs.result())
    }
    def resolvedPairs: Seq[(String, Long)] =
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
          if (eqOk && litOk) attr(spec.groupAttrs.head).map(g => g -> m) else None
        }
      }
    def view: Map[String, (Long, Long)] =
      resolvedPairs.groupBy(_._1)
        .map { case (g, ms) => g -> (ms.map(_._2).sum, ms.size.toLong) }
    /** Expected fact-grained extrema: (n, min, max) per group. */
    def extrema: Map[String, (Long, Long, Long)] =
      resolvedPairs.groupBy(_._1).map { case (g, ms) =>
        g -> (ms.size.toLong, ms.map(_._2).min, ms.map(_._2).max)
      }
  }

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAggStar.view(spark, state)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def dimsDf(spec: StarSpec, ups: Map[(Int, Int), Seq[Dim]]) = (
    (1 to spec.B).map { b =>
      (1 to spec.branchDepths(b - 1)).map { i =>
        ups.getOrElse((b, i), Seq.empty[Dim]).toDF("k", "vl", "vs")
      }
    },
    (1 to spec.B).map { b =>
      (1 to spec.branchDepths(b - 1)).map(_ => ("k", "vl", "vs"))
    })

  private def fold21(state: String, fb: Seq[(Long, Long, Long, Long)],
      dels: Seq[(Long, Long, Long)], ups: Map[(Int, Int), Seq[Dim]],
      id: Long): Unit = {
    val (d, dc) = dimsDf(spec21, ups)
    IncrementalJoinAggStar.processBatch(spec21,
      fb.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
      dels.toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      d, dc, state, id, numBuckets = 4)
  }

  test("two branches + cross-branch equality: out-of-order arrival, re-keys on BOTH branches, delete, replay") {
    val state = tmpDir("star1")
    var m = Model(spec21, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
    def step(fb: Seq[(Long, Long, Long, Long)], dels: Seq[(Long, Long, Long)],
        ups: Map[(Int, Int), Seq[Dim]], id: Long): Unit = {
      fold21(state, fb, dels, ups, id)
      m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), dels.map(_._3), ups)
      assert(served(state) === m.view, s"batch $id diverged")
    }

    // facts first: order 10 → supplier 70, order 20 → supplier 71
    step(Seq((10L, 70L, 1L, 100L), (10L, 70L, 2L, 50L), (20L, 71L, 3L, 7L)),
      Nil, Map.empty, 0L)
    assert(served(state) === Map.empty)
    // branch 1 level 1 (order → customer), still no attrs anywhere
    step(Nil, Nil, Map((1, 1) -> Seq((10L, Some(500L), None), (20L, Some(501L), None))), 1L)
    assert(served(state) === Map.empty)
    // customers get nations; supplier 70 matches, 71 doesn't (eq fails)
    step(Nil, Nil, Map(
      (1, 2) -> Seq((500L, None, Some("A")), (501L, None, Some("B"))),
      (2, 1) -> Seq((70L, None, Some("A")), (71L, None, Some("C")))), 2L)
    assert(served(state) === Map("A" -> (150L, 2L)))
    // branch 2 re-attr: supplier 71 moves C → B, turning the eq ON for
    // fact 3 (a cross-branch retraction-free enable)
    step(Nil, Nil, Map((2, 1) -> Seq((71L, None, Some("B")))), 3L)
    assert(served(state) === Map("A" -> (150L, 2L), "B" -> (7L, 1L)))
    // branch 1 level 1 re-key: order 10 re-routes to customer 501 (B),
    // which BREAKS the equality for facts 1-2 (supplier 70 is A) —
    // the star's distinctive cross-branch retraction
    step(Nil, Nil, Map((1, 1) -> Seq((10L, Some(501L), None))), 4L)
    assert(served(state) === Map("B" -> (7L, 1L)))
    // supplier 70 follows to B: facts 1-2 return, now grouped under B
    step(Nil, Nil, Map((2, 1) -> Seq((70L, None, Some("B")))), 5L)
    assert(served(state) === Map("B" -> (157L, 3L)))
    // bucket-pruned point read: named groups only, absent names empty
    assert(IncrementalJoinAggStar.viewFor(spark, state, Seq("B", "ZZZ"),
        numBuckets = 4)
      .as[(String, Long, Long)].collect().toSeq === Seq(("B", 157L, 3L)))
    // fact delete + replay no-op
    step(Nil, Seq((10L, 70L, 1L)), Map.empty, 6L)
    assert(served(state) === Map("B" -> (57L, 2L)))
    fold21(state, Nil, Seq((10L, 70L, 1L)), Map.empty, 6L)
    assert(served(state) === Map("B" -> (57L, 2L)))
    // group-emptying: delete the rest
    step(Nil, Seq((10L, 70L, 2L), (20L, 71L, 3L)), Map.empty, 7L)
    assert(served(state) === Map.empty)
  }

  test("mega-wave chunking: factChunks > 1 ≡ the unchunked fold, incl. extrema/distinct/changelog") {
    // a depth-2 branch so the wave is a literal flip 2 joins from the
    // facts: every fact under the flipped attr re-routes — the
    // affected-subtree shape the chunked materialization bounds. The
    // fold with factChunks = 3 partitions each term's PRE-STATE fact
    // side by xxhash64(id) % 3 and assembles ONE staged delta from the
    // pre-aggregated parts, so every state table — view, changelog
    // (exactly one c row per (g, batch): the external-ship dedup
    // contract), extrema and distinct multiplicities — must be
    // row-identical to the unchunked store after every batch.
    val specW = StarSpec(Seq(2), groupAttrs = Seq((1, 2)),
      trackExtrema = true, trackDistinct = Some("k1"))
    val s1 = tmpDir("star-w1"); val s3 = tmpDir("star-w3")
    def fold(state: String, chunks: Int)(
        fb: Seq[(Long, Long, Long)], dels: Seq[(Long, Long)],
        ups: Map[(Int, Int), Seq[Dim]], id: Long): Unit = {
      val (d, dc) = dimsDf(specW, ups)
      IncrementalJoinAggStar.processBatch(specW,
        fb.toDF("k1", "id", "m"), Seq("k1"), "id", "m",
        dels.toDF("k1", "id"), Seq("k1"), "id",
        d, dc, state, id, numBuckets = 4, factChunks = chunks)
    }
    def rows(state: String): (Map[String, (Long, Long)],
        Set[(Long, String, Long, Long)], Seq[(String, Long)],
        Seq[(String, Long)]) = (
      served(state),
      IncrementalJoinAggStar.changelog(spark, state)
        .as[(Long, String, Long, Long)].collect().toSet,
      IncrementalJoinAggStar.extremaView(spark, state)
        .select("g", "max_v").as[(String, Long)].collect().toSeq.sorted,
      IncrementalJoinAggStar.distinctView(spark, state)
        .as[(String, Long)].collect().toSeq.sorted)
    def step(fb: Seq[(Long, Long, Long)], dels: Seq[(Long, Long)],
        ups: Map[(Int, Int), Seq[Dim]], id: Long): Unit = {
      fold(s1, 1)(fb, dels, ups, id)
      fold(s3, 3)(fb, dels, ups, id)
      val (v1, c1, e1, u1) = rows(s1)
      val (v3, c3, e3, u3) = rows(s3)
      assert(v3 === v1, s"batch $id: view diverged")
      assert(c3 === c1, s"batch $id: changelog diverged")
      assert(e3 === e1, s"batch $id: extrema diverged")
      assert(u3 === u1, s"batch $id: distinct diverged")
    }

    // 30 facts across 6 orders -> 2 customers -> 1 shared region attr
    val facts = (1 to 30).map(i =>
      ((i % 6).toLong + 10L, i.toLong, (i * 7).toLong))
    step(facts, Nil, Map(
      (1, 1) -> (0 to 5).map(o => (o + 10L, Some(500L + o % 2), None)),
      (1, 2) -> Seq((500L, None, Some("R1")), (501L, None, Some("R2")))), 0L)
    // the WAVE: flip the level-2 attr both customers point at variants
    // of — every fact in R1 re-routes (the region-rename shape)
    step(Nil, Nil, Map((1, 2) -> Seq((500L, None, Some("R9")))), 1L)
    // mixed batch THROUGH the chunked path: new facts + deletes + a
    // level-1 re-key in one fold
    step(Seq((15L, 100L, 999L)), Seq((10L, 6L)),
      Map((1, 1) -> Seq((11L, Some(501L), None))), 2L)
    // replay the wave batch on the CHUNKED store: strict no-op
    val before = rows(s3)
    fold(s3, 3)(Nil, Nil, Map((1, 2) -> Seq((500L, None, Some("R9")))), 1L)
    assert(rows(s3) === before, "chunked replay changed state")
    // and the parts dir is swept with the staged delta
    val fs = new org.apache.hadoop.fs.Path(s3)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$s3/joinaggstar"))
      .map(_.getPath.getName).filter(_.startsWith("_delta_"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("random interleave == model after every batch; changelog integral == view") {
    val state = tmpDir("star2")
    val rnd = new scala.util.Random(17)
    var m = Model(spec21, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
    var nextId = 0L
    for (b <- 0L until 6L) {
      val fb = Seq.fill(rnd.nextInt(4)) {
        nextId += 1
        (rnd.nextInt(5).toLong, 70L + rnd.nextInt(3), nextId, rnd.nextInt(50).toLong)
      }
      val dels = m.facts.toSeq.sortBy(_._1).take(rnd.nextInt(2))
        .map { case (id, (ks, _)) => (ks(0), ks(1), id) }
      val ups = Map(
        (1, 1) -> Seq.fill(rnd.nextInt(3))(
          (rnd.nextInt(5).toLong, Some(500L + rnd.nextInt(3)), None): Dim),
        (1, 2) -> Seq.fill(rnd.nextInt(3))(
          (500L + rnd.nextInt(3).toLong, None, Some(s"N${rnd.nextInt(3)}")): Dim),
        (2, 1) -> Seq.fill(rnd.nextInt(3))(
          (70L + rnd.nextInt(3).toLong, None, Some(s"N${rnd.nextInt(3)}")): Dim))
      fold21(state, fb, dels, ups, b)
      m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), dels.map(_._3), ups)
      assert(served(state) === m.view, s"batch $b diverged from the model")
    }
    val integral = IncrementalJoinAggStar.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("p"))
      .filter("p <> 0")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(integral === served(state))
  }

  // the full Q5 shape: branch 1 = orders → customer → nation → region,
  // branch 2 = supplier; eq (1,2)==(2,1) on nationkey-as-string, lit
  // filter on the region name, group by the nation name
  private val specQ5 = StarSpec(Seq(4, 1), groupAttrs = Seq((1, 3)),
    eqAttrs = Seq(((1, 2), (2, 1))), litAttrs = Seq(((1, 4), "ASIA")))

  private def foldQ5(state: String, fb: Seq[(Long, Long, Long, Long)],
      dels: Seq[(Long, Long, Long)], ups: Map[(Int, Int), Seq[Dim]],
      id: Long): Unit = {
    val (d, dc) = dimsDf(specQ5, ups)
    IncrementalJoinAggStar.processBatch(specQ5,
      fb.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
      dels.toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      d, dc, state, id, numBuckets = 4)
  }

  test("Q5 shape: deep branch with mid-level re-key and a literal-filter flip 3 joins from the facts") {
    val state = tmpDir("star3")
    var m = Model(specQ5, levels = Vector(
      Vector(Map.empty, Map.empty, Map.empty, Map.empty), Vector(Map.empty)))
    def step(fb: Seq[(Long, Long, Long, Long)], dels: Seq[(Long, Long, Long)],
        ups: Map[(Int, Int), Seq[Dim]], id: Long): Unit = {
      foldQ5(state, fb, dels, ups, id)
      m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), dels.map(_._3), ups)
      assert(served(state) === m.view, s"batch $id diverged")
    }
    // full chains: orders 10,20 → customers 500,501 → nations 3,4 →
    // regions 90(ASIA),91(EU); suppliers 70(nat 3), 71(nat 4)
    step(Seq((10L, 70L, 1L, 100L), (20L, 71L, 2L, 7L)), Nil, Map(
      (1, 1) -> Seq((10L, Some(500L), None), (20L, Some(501L), None)),
      (1, 2) -> Seq((500L, Some(3L), Some("3")), (501L, Some(4L), Some("4"))),
      (1, 3) -> Seq((3L, Some(90L), Some("CHINA")), (4L, Some(91L), Some("FRANCE"))),
      (1, 4) -> Seq((90L, None, Some("ASIA")), (91L, None, Some("EUROPE"))),
      (2, 1) -> Seq((70L, None, Some("3")), (71L, None, Some("4")))), 0L)
    assert(served(state) === Map("CHINA" -> (100L, 1L)))
    // literal-filter flip three joins from the facts: region 91 renames
    // EUROPE → ASIA, admitting FRANCE
    step(Nil, Nil, Map((1, 4) -> Seq((91L, None, Some("ASIA")))), 1L)
    assert(served(state) === Map("CHINA" -> (100L, 1L), "FRANCE" -> (7L, 1L)))
    // mid-level re-key: customer 500 moves to nation 4 — breaks the eq
    // (supplier 70 is nation 3) AND would re-group; fact 1 drops
    step(Nil, Nil, Map((1, 2) -> Seq((500L, Some(4L), Some("4")))), 2L)
    assert(served(state) === Map("FRANCE" -> (7L, 1L)))
    // supplier 70 follows to nation 4: fact 1 returns under FRANCE
    step(Nil, Nil, Map((2, 1) -> Seq((70L, None, Some("4")))), 3L)
    assert(served(state) === Map("FRANCE" -> (107L, 2L)))
    // nation 4 re-links to region 90 and renames: regroup + still ASIA
    step(Nil, Nil, Map((1, 3) -> Seq((4L, Some(90L), Some("GERMANY")))), 4L)
    assert(served(state) === Map("GERMANY" -> (107L, 2L)))
  }

  test("multi-attribute group key: nation x segment from two branches") {
    // group by (branch-1 attr, branch-2 attr) — exercises the
    // \u0001-joined concat group path; no constraints
    val specG2 = StarSpec(Seq(2, 1), groupAttrs = Seq((1, 2), (2, 1)))
    val state = tmpDir("starg2")
    val ups: Map[(Int, Int), Seq[Dim]] = Map(
      (1, 1) -> Seq((10L, Some(500L), None), (20L, Some(501L), None)),
      (1, 2) -> Seq((500L, None, Some("A")), (501L, None, Some("B"))),
      (2, 1) -> Seq((70L, None, Some("X")), (71L, None, Some("Y"))))
    val (d, dc) = dimsDf(specG2, ups)
    IncrementalJoinAggStar.processBatch(specG2,
      Seq((10L, 70L, 1L, 100L), (10L, 71L, 2L, 50L), (20L, 70L, 3L, 7L))
        .toDF("k1", "k2", "id", "m"),
      Seq("k1", "k2"), "id", "m",
      Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      d, dc, state, 0L, numBuckets = 4)
    assert(served(state) === Map(
      "A\u0001X" -> (100L, 1L), "A\u0001Y" -> (50L, 1L), "B\u0001X" -> (7L, 1L)))
    // a branch-2 re-attr moves one composite group exactly
    val (d2, dc2) = dimsDf(specG2, Map((2, 1) -> Seq((71L, None, Some("X")): Dim)))
    IncrementalJoinAggStar.processBatch(specG2,
      Seq.empty[(Long, Long, Long, Long)].toDF("k1", "k2", "id", "m"),
      Seq("k1", "k2"), "id", "m",
      Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      d2, dc2, state, 1L, numBuckets = 4)
    assert(served(state) === Map(
      "A\u0001X" -> (150L, 2L), "B\u0001X" -> (7L, 1L)))
  }

  test("trackExtrema: maintained MIN/MAX over the join — delete-the-max, re-keys, and random interleave") {
    val specE = spec21.copy(trackExtrema = true)
    val state = tmpDir("stare")
    var m = Model(specE, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
    def foldE(fb: Seq[(Long, Long, Long, Long)], dels: Seq[(Long, Long, Long)],
        ups: Map[(Int, Int), Seq[Dim]], id: Long): Unit = {
      val (d, dc) = dimsDf(specE, ups)
      IncrementalJoinAggStar.processBatch(specE,
        fb.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
        dels.toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
        d, dc, state, id, numBuckets = 4)
      m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), dels.map(_._3), ups)
      val got = IncrementalJoinAggStar.extremaView(spark, state)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got === m.extrema, s"batch $id extrema diverged")
      assert(served(state) === m.view, s"batch $id sum diverged")
    }
    // two facts in one group; both branches resolve, eq holds
    foldE(Seq((10L, 70L, 1L, 100L), (10L, 70L, 2L, 40L)), Nil, Map(
      (1, 1) -> Seq((10L, Some(500L), None)),
      (1, 2) -> Seq((500L, None, Some("A"))),
      (2, 1) -> Seq((70L, None, Some("A")))), 0L)
    assert(IncrementalJoinAggStar.extremaView(spark, state)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      === Map("A" -> ((2L, 40L, 100L))))
    // DELETE THE MAX: fact 1 (m=100) goes; max must fall back to 40 —
    // the case a scalar max-state cannot serve
    foldE(Nil, Seq((10L, 70L, 1L)), Map.empty, 1L)
    assert(IncrementalJoinAggStar.extremaView(spark, state)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      === Map("A" -> ((1L, 40L, 40L))))
    // a dim re-key MOVES the remaining value to group B (supplier follows)
    foldE(Nil, Nil, Map(
      (1, 2) -> Seq((500L, None, Some("B")): Dim),
      (2, 1) -> Seq((70L, None, Some("B")): Dim)), 2L)
    assert(IncrementalJoinAggStar.extremaView(spark, state)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      === Map("B" -> ((1L, 40L, 40L))))
    // random interleave stays exact (duplicate measures included), and
    // the exact median over the maintained relation matches the model
    val rnd = new scala.util.Random(54)
    var nextId = 100L
    for (b <- 3L until 8L) {
      val fb = Seq.fill(rnd.nextInt(4)) {
        nextId += 1
        (rnd.nextInt(5).toLong, 70L + rnd.nextInt(3), nextId, rnd.nextInt(8).toLong)
      }
      val dels = m.facts.toSeq.sortBy(_._1).take(rnd.nextInt(2))
        .map { case (id, (ks, _)) => (ks(0), ks(1), id) }
      val ups = Map(
        (1, 1) -> Seq.fill(rnd.nextInt(3))(
          (rnd.nextInt(5).toLong, Some(500L + rnd.nextInt(3)), None): Dim),
        (1, 2) -> Seq.fill(rnd.nextInt(3))(
          (500L + rnd.nextInt(3).toLong, None, Some(s"N${rnd.nextInt(3)}")): Dim),
        (2, 1) -> Seq.fill(rnd.nextInt(3))(
          (70L + rnd.nextInt(3).toLong, None, Some(s"N${rnd.nextInt(3)}")): Dim))
      foldE(fb, dels, ups, b)
    }
    val medians = IncrementalJoinAggStar.extremaQuantiles(spark, state, Seq((1L, 2L)))
      .as[(String, Long)].collect().toMap
    val expMed = m.resolvedPairs.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      g -> sorted((sorted.size - 1) / 2)
    }
    assert(medians === expMed)
  }

  test("DIAMOND shape: one shared dim table feeds a level on BOTH branches in the same batch") {
    // customer→nation and supplier→nation converge on the SAME nation
    // table: model it as two levels fed the same upserts. A nation
    // rename is then ONE logical change arriving at TWO inputs of one
    // batch — the pairwise-overlap rule must count the joint effect
    // exactly once per term pair. Group by the customer-side nation
    // name, constrained equal to the supplier-side resolution of the
    // same table.
    val specD = StarSpec(Seq(2, 2), groupAttrs = Seq((1, 2)),
      eqAttrs = Seq(((1, 2), (2, 2))))
    val state = tmpDir("stard")
    var m = Model(specD, levels =
      Vector(Vector(Map.empty, Map.empty), Vector(Map.empty, Map.empty)))
    def step(fb: Seq[(Long, Long, Long, Long)],
        ups: Map[(Int, Int), Seq[Dim]], id: Long): Unit = {
      val (d, dc) = dimsDf(specD, ups)
      IncrementalJoinAggStar.processBatch(specD,
        fb.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
        Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"),
        Seq("k1", "k2"), "id", d, dc, state, id, numBuckets = 4)
      m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), Nil, ups)
      assert(served(state) === m.view, s"batch $id diverged")
    }
    val nations0: Seq[Dim] = Seq((100L, None, Some("A")), (200L, None, Some("B")))
    step(Seq((1L, 9L, 1L, 10L), (2L, 8L, 2L, 5L)), Map(
      (1, 1) -> Seq((1L, Some(100L), None), (2L, Some(200L), None)),
      (1, 2) -> nations0,
      (2, 1) -> Seq((9L, Some(100L), None), (8L, Some(200L), None)),
      (2, 2) -> nations0), 0L)
    assert(served(state) === Map("A" -> (10L, 1L), "B" -> (5L, 1L)))
    // the diamond wave: nation 100 renames A→Z, applied to BOTH levels
    // in one batch — both branches' resolutions move together, the
    // equality stays satisfied, the group relabels exactly
    val rename: Seq[Dim] = Seq((100L, None, Some("Z")))
    step(Nil, Map((1, 2) -> rename, (2, 2) -> rename), 1L)
    assert(served(state) === Map("Z" -> (10L, 1L), "B" -> (5L, 1L)))
    // a HALF-fed diamond is an inconsistent world: renaming only the
    // customer-side copy breaks the equality and the fact drops — the
    // engine treats the two levels as distinct inputs (honest Z-set
    // semantics; the shared-table caller must feed both)
    val half: Seq[Dim] = Seq((200L, None, Some("B2")))
    step(Nil, Map((1, 2) -> half), 2L)
    assert(served(state) === Map("Z" -> (10L, 1L)))
    // feeding the supplier-side copy reconciles the world: fact returns
    step(Nil, Map((2, 2) -> half), 3L)
    assert(served(state) === Map("Z" -> (10L, 1L), "B2" -> (5L, 1L)))
    // replay of the last batch (the foreachBatch redelivery shape) is a no-op
    val (dR, dcR) = dimsDf(specD, Map((2, 2) -> half))
    IncrementalJoinAggStar.processBatch(specD,
      Seq.empty[(Long, Long, Long, Long)].toDF("k1", "k2", "id", "m"),
      Seq("k1", "k2"), "id", "m",
      Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"),
      Seq("k1", "k2"), "id", dR, dcR, state, 3L, numBuckets = 4)
    assert(served(state) === Map("Z" -> (10L, 1L), "B2" -> (5L, 1L)))
  }

  test("start(): mixed CDC stream end-to-end via foreachBatch") {
    import org.apache.spark.sql.types._
    val in = tmpDir("stars-in"); val state = tmpDir("stars-st")
    val ckpt = tmpDir("stars-ck")
    val schema = StructType(Seq(
      StructField("kind", StringType), StructField("k1", LongType),
      StructField("k2", LongType), StructField("id", LongType),
      StructField("m", LongType), StructField("k", LongType),
      StructField("vl", LongType), StructField("vs", StringType)))
    val rows = Seq(
      """{"kind":"fact","k1":10,"k2":70,"id":1,"m":100}""",
      """{"kind":"fact","k1":10,"k2":70,"id":2,"m":50}""",
      """{"kind":"d1_1","k":10,"vl":500}""",
      """{"kind":"d1_2","k":500,"vs":"A"}""",
      """{"kind":"d2_1","k":70,"vs":"A"}""",
      """{"kind":"fact_del","k1":10,"k2":70,"id":2}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b0.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    val q = IncrementalJoinAggStar.start(spark, in, schema, state, ckpt,
      spec21, "kind", Seq("k1", "k2"), "id", "m")
    q.awaitTermination()
    assert(served(state) === Map("A" -> (100L, 1L)))
  }

  test("bootstrap: batch-table initialization, exact continuation with cross-branch retractions") {
    val state = tmpDir("star4")
    var m = Model(spec21, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
    val f0 = Seq((10L, 70L, 1L, 100L), (10L, 70L, 2L, 50L), (20L, 71L, 3L, 7L))
    val ups0: Map[(Int, Int), Seq[Dim]] = Map(
      (1, 1) -> Seq((10L, Some(500L), None), (20L, Some(501L), None)),
      (1, 2) -> Seq((500L, None, Some("A")), (501L, None, Some("B"))),
      (2, 1) -> Seq((70L, None, Some("A")), (71L, None, Some("B"))))
    val (d0, dc0) = dimsDf(spec21, ups0)
    IncrementalJoinAggStar.bootstrap(spec21,
      f0.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
      d0, dc0, state, baselineBatch = 0L, numBuckets = 4)
    m = m.fold(f0.map(r => (Vector(r._1, r._2), r._3, r._4)), Nil, ups0)
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (150L, 2L), "B" -> (7L, 1L)))

    // continuation probes the bootstrapped mirrors: branch-2 re-attr
    // breaks the eq for fact 3, plus a delete
    fold21(state, Nil, Seq((10L, 70L, 1L)),
      Map((2, 1) -> Seq((71L, None, Some("C")))), 1L)
    m = m.fold(Nil, Seq(1L), Map((2, 1) -> Seq((71L, None, Some("C")): Dim)))
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (50L, 1L)))

    val integral = IncrementalJoinAggStar.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("p"))
      .filter("p <> 0")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(integral === served(state))

    // as-of floor: the baseline batch is addressable, pre-history is not
    val asOf0 = IncrementalJoinAggStar.viewAsOf(spark, state, 0L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(asOf0 === Map("A" -> (150L, 2L), "B" -> (7L, 1L)))

    assertThrows[IllegalArgumentException] {
      IncrementalJoinAggStar.bootstrap(spec21,
        f0.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
        d0, dc0, state, numBuckets = 4)
    }
  }
}
