package graft.streaming

import graft.SparkTestBase
import IncrementalJoinAggStar.StarSpec

/** Dimension DELETES (R157) — full CDC on every star input: deleting a
  * present level key removes the stored row, so dependent facts DROP
  * under an inner branch and MOVE to the null-padded group under a
  * LEFT one (the completed relation's virtual +(k, null, null));
  * deleting an absent key is a no-op; delete-wins within a batch; a
  * deleted key may re-arrive later as a plain upsert. Checked against
  * exact models after every batch, including random signed
  * interleaves, replay, and the mixed-CDC streaming entry. */
class IncrementalJoinAggStarDimDelSpec extends SparkTestBase {
  import spark.implicits._

  private type Dim = (Long, Option[Long], Option[String])

  /** LEFT-aware model with level deletes (delete-wins within the
    * batch). */
  private case class Model(spec: StarSpec,
      facts: Map[Long, (Vector[Long], Long)] = Map.empty,
      levels: Vector[Vector[Map[Long, (Option[Long], Option[String])]]]) {
    private implicit val dimOrd: Ordering[(Option[Long], Option[String])] =
      Ordering.Tuple2(Ordering.Option[Long], Ordering.Option[String])
    def fold(fb: Seq[(Vector[Long], Long, Long)], dels: Seq[Long],
        ups: Map[(Int, Int), Seq[Dim]],
        dDels: Map[(Int, Int), Seq[Long]] = Map.empty): Model = {
      val delIds = dels.toSet
      val fAbs = fb.groupBy(_._2).map { case (id, rows) =>
        id -> rows.map(r => (r._1, r._3)).minBy(t => (t._1, t._2))(
          Ordering.Tuple2(Ordering.Implicits.seqOrdering[Vector, Long], Ordering.Long))
      }
      val kept = (facts ++ fAbs.filterNot { case (id, _) =>
        facts.contains(id) || delIds.contains(id) }) -- delIds
      val nl = levels.zipWithIndex.map { case (branch, bi) =>
        branch.zipWithIndex.map { case (lvl, li) =>
          val gone = dDels.getOrElse((bi + 1, li + 1), Nil).toSet
          val abs = ups.getOrElse((bi + 1, li + 1), Nil)
            .filterNot(r => gone(r._1)).groupBy(_._1)
            .map { case (k, rows) => k -> rows.map(r => (r._2, r._3)).max }
          (lvl -- gone) ++ abs
        }
      }
      Model(spec, kept, nl)
    }
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
    def view: Map[String, (Long, Long)] =
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
          if (eqOk && litOk) Some(attr(spec.groupAttrs.head).orNull -> m)
          else None
        }
      }.groupBy(_._1)
        .map { case (g, ms) => g -> (ms.map(_._2).sum, ms.size.toLong) }
  }

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAggStar.view(spark, state)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        (r.getLong(1), r.getLong(2))).toMap

  private def fold(spec: StarSpec, state: String,
      fb: Seq[(Long, Long, Long, Long)], dels: Seq[(Long, Long, Long)],
      ups: Map[(Int, Int), Seq[Dim]], dDels: Map[(Int, Int), Seq[Long]],
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
        dDels.getOrElse((b, i), Seq.empty[Long]).toDF("k")
      }
    }
    IncrementalJoinAggStar.processBatch(spec,
      fb.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
      dels.toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      d, dc, state, id, numBuckets = 4, dimDels = dd)
  }

  // branch 1 = link -> attr (chain), branch 2 = attr; group by (1,2)
  private val specI = StarSpec(Seq(2, 1), groupAttrs = Seq((1, 2)))
  private val specL = specI.copy(leftBranches = Set(1))

  test("inner branch: deleting a mid-chain key drops dependent facts; re-upsert restores; absent-key delete no-ops; replay") {
    val state = tmpDir("stardd-i")
    var m = Model(specI, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
    def step(fb: Seq[(Long, Long, Long, Long)], dels: Seq[(Long, Long, Long)],
        ups: Map[(Int, Int), Seq[Dim]], dDels: Map[(Int, Int), Seq[Long]],
        id: Long): Unit = {
      fold(specI, state, fb, dels, ups, dDels, id)
      m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), dels.map(_._3),
        ups, dDels)
      assert(served(state) === m.view, s"batch $id diverged")
    }
    step(Seq((10L, 70L, 1L, 100L), (20L, 70L, 2L, 50L)), Nil, Map(
      (1, 1) -> Seq((10L, Some(500L), None), (20L, Some(501L), None)),
      (1, 2) -> Seq((500L, None, Some("A")), (501L, None, Some("B"))),
      (2, 1) -> Seq((70L, None, Some("S")))), Map.empty, 0L)
    assert(served(state) === Map("A" -> (100L, 1L), "B" -> (50L, 1L)))
    // delete customer 500 (mid-chain): fact 1 dangles and DROPS
    step(Nil, Nil, Map.empty, Map((1, 1) -> Seq(10L)), 1L)
    assert(served(state) === Map("B" -> (50L, 1L)))
    // absent-key delete: pure no-op
    step(Nil, Nil, Map.empty, Map((1, 1) -> Seq(999L), (1, 2) -> Seq(888L)), 2L)
    assert(served(state) === Map("B" -> (50L, 1L)))
    // re-upsert the deleted key, pointing somewhere new: fact 1 returns
    step(Nil, Nil, Map((1, 1) -> Seq((10L, Some(501L), None): Dim)), Map.empty, 3L)
    assert(served(state) === Map("B" -> (150L, 2L)))
    // delete the LEAF level's key: both facts drop (attr gone)
    step(Nil, Nil, Map.empty, Map((1, 2) -> Seq(501L)), 4L)
    assert(served(state) === Map.empty)
    // replay of the delete batch is a no-op
    fold(specI, state, Nil, Nil, Map.empty, Map((1, 2) -> Seq(501L)), 4L)
    assert(served(state) === m.view)
    // DELETE-WINS: upsert and delete of the same key in one batch
    step(Nil, Nil, Map((1, 2) -> Seq((501L, None, Some("B2")): Dim)),
      Map((1, 2) -> Seq(501L)), 5L)
    assert(served(state) === Map.empty)
  }

  test("left branch: deleting a key MOVES dependents to the null group (virtual +padding); delete under dangle") {
    val state = tmpDir("stardd-l")
    var m = Model(specL, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
    def step(fb: Seq[(Long, Long, Long, Long)], dels: Seq[(Long, Long, Long)],
        ups: Map[(Int, Int), Seq[Dim]], dDels: Map[(Int, Int), Seq[Long]],
        id: Long): Unit = {
      fold(specL, state, fb, dels, ups, dDels, id)
      m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), dels.map(_._3),
        ups, dDels)
      assert(served(state) === m.view, s"batch $id diverged")
    }
    step(Seq((10L, 70L, 1L, 100L), (20L, 70L, 2L, 50L)), Nil, Map(
      (1, 1) -> Seq((10L, Some(500L), None), (20L, Some(501L), None)),
      (1, 2) -> Seq((500L, None, Some("A")), (501L, None, Some("B"))),
      (2, 1) -> Seq((70L, None, Some("S")))), Map.empty, 0L)
    assert(served(state) === Map("A" -> (100L, 1L), "B" -> (50L, 1L)))
    // GDPR-style: customer 500's nation row stays but the customer row
    // goes — fact 1 moves A -> NULL (never drops: left semantics)
    step(Nil, Nil, Map.empty, Map((1, 1) -> Seq(10L)), 1L)
    assert(served(state) === Map((null: String) -> (100L, 1L), "B" -> (50L, 1L)))
    // deleting the leaf under an already-dangling chain: fact 2 moves
    // B -> NULL; fact 1 unaffected (its pointer never reaches level 2)
    step(Nil, Nil, Map.empty, Map((1, 2) -> Seq(501L)), 2L)
    assert(served(state) ===
      Map((null: String) -> (150L, 2L)))
    // re-arrivals drain the null group back out
    step(Nil, Nil, Map(
      (1, 1) -> Seq((10L, Some(500L), None): Dim),
      (1, 2) -> Seq((501L, None, Some("B")): Dim)), Map.empty, 3L)
    assert(served(state) === Map("A" -> (100L, 1L), "B" -> (50L, 1L)))
  }

  test("random signed interleave (upserts + dim deletes + fact deletes) == model after every batch; integral == view") {
    for ((spec, tag) <- Seq((specI, "inner"), (specL, "left"))) {
      val state = tmpDir(s"stardd-rnd-$tag")
      val rnd = new scala.util.Random(41)
      var m = Model(spec, levels = Vector(Vector(Map.empty, Map.empty), Vector(Map.empty)))
      var nextId = 0L
      for (b <- 0L until 6L) {
        val fb = Seq.fill(rnd.nextInt(4)) {
          nextId += 1
          (rnd.nextInt(5).toLong, 70L + rnd.nextInt(2), nextId, rnd.nextInt(50).toLong)
        }
        val dels = m.facts.toSeq.sortBy(_._1).take(rnd.nextInt(2))
          .map { case (id, (ks, _)) => (ks(0), ks(1), id) }
        val ups = Map(
          (1, 1) -> Seq.fill(rnd.nextInt(3))(
            (rnd.nextInt(5).toLong, Some(500L + rnd.nextInt(3)), None): Dim),
          (1, 2) -> Seq.fill(rnd.nextInt(3))(
            (500L + rnd.nextInt(3).toLong, None, Some(s"N${rnd.nextInt(3)}")): Dim),
          (2, 1) -> Seq.fill(rnd.nextInt(2))(
            (70L + rnd.nextInt(2).toLong, None, Some(s"S${rnd.nextInt(2)}")): Dim))
        val dDels = Map(
          (1, 1) -> Seq.fill(rnd.nextInt(2))(rnd.nextInt(5).toLong),
          (1, 2) -> Seq.fill(rnd.nextInt(2))(500L + rnd.nextInt(3)))
        // delete-wins inside the engine; mirror it in the model input
        val upsEff = ups.map { case (p, rows) =>
          p -> rows.filterNot(r => dDels.getOrElse(p, Nil).contains(r._1))
        }
        fold(spec, state, fb, dels, ups, dDels, b)
        m = m.fold(fb.map(r => (Vector(r._1, r._2), r._3, r._4)), dels.map(_._3),
          upsEff, dDels)
        assert(served(state) === m.view, s"[$tag] batch $b diverged")
      }
      val integral = IncrementalJoinAggStar.changelog(spark, state)
        .groupBy("g")
        .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
          org.apache.spark.sql.functions.sum("drows").as("p"))
        .filter("p <> 0")
        .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
          (r.getLong(1), r.getLong(2))).toMap
      assert(integral === served(state), s"[$tag] integral diverged")
    }
  }

  test("start(): mixed CDC stream carries d{b}_{i}_del rows") {
    import org.apache.spark.sql.types._
    val in = tmpDir("stardd-in"); val state = tmpDir("stardd-st")
    val ckpt = tmpDir("stardd-ck")
    val schema = StructType(Seq(
      StructField("kind", StringType), StructField("k1", LongType),
      StructField("k2", LongType), StructField("id", LongType),
      StructField("m", LongType), StructField("k", LongType),
      StructField("vl", LongType), StructField("vs", StringType)))
    val b0 = Seq(
      """{"kind":"fact","k1":10,"k2":70,"id":1,"m":100}""",
      """{"kind":"fact","k1":20,"k2":70,"id":2,"m":50}""",
      """{"kind":"d1_1","k":10,"vl":500}""",
      """{"kind":"d1_1","k":20,"vl":501}""",
      """{"kind":"d1_2","k":500,"vs":"A"}""",
      """{"kind":"d1_2","k":501,"vs":"B"}""",
      """{"kind":"d2_1","k":70,"vs":"S"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b0.json"),
      b0.mkString("\n").getBytes("UTF-8"))
    val q = IncrementalJoinAggStar.start(spark, in, schema, state, ckpt,
      specI, "kind", Seq("k1", "k2"), "id", "m")
    q.awaitTermination()
    assert(served(state) === Map("A" -> (100L, 1L), "B" -> (50L, 1L)))
    // second file: delete customer 10's link row via the CDC kind
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b1.json"),
      Seq("""{"kind":"d1_1_del","k":10}""").mkString("\n").getBytes("UTF-8"))
    val q2 = IncrementalJoinAggStar.start(spark, in, schema, state, ckpt,
      specI, "kind", Seq("k1", "k2"), "id", "m")
    q2.awaitTermination()
    assert(served(state) === Map("B" -> (50L, 1L)))
  }
}
