package graft.streaming

import graft.SparkTestBase

/** The depth-generic chain join-aggregate must equal the batch N-way
  * recompute after every batch at depth 3 (four joined tables) for any
  * interleave of facts, deletes, and upserts at EVERY level — a middle-
  * level re-key re-routes entire subtrees two joins away from both the
  * facts and the group attribute. At depth 2 it must serve exactly what
  * the hand-written ternary view serves for the same op sequence. */
class IncrementalJoinAggNSpec extends SparkTestBase {
  import spark.implicits._

  private case class Model(
      facts: Map[Long, (Long, Long)] = Map.empty,   // id -> (k1, m)
      levels: Vector[Map[Long, Either[Long, String]]]) {
    def fold(fb: Seq[(Long, Long, Long)], dels: Seq[(Long, Long)],
        ups: Seq[Seq[(Long, Either[Long, String])]]): Model = {
      val delIds = dels.map(_._2).toSet
      val fAbs = fb.groupBy(_._2).map { case (id, rows) =>
        val (k, m) = rows.map(r => (r._1, r._3)).min
        id -> (k, m)
      }
      val kept = (facts ++ fAbs.filterNot { case (id, _) =>
        facts.contains(id) || delIds.contains(id) }) -- delIds
      val nl = levels.zipWithIndex.map { case (lvl, i) =>
        val abs = ups(i).groupBy(_._1).map { case (k, rows) =>
          // max-value within batch, matching the view's dedup
          k -> rows.map(_._2).maxBy {
            case Left(l) => (1, l, ""); case Right(s) => (0, 0L, s) }
        }
        lvl ++ abs
      }
      Model(kept, nl.toVector)
    }
    def view: Map[String, (Long, Long)] = {
      def resolve(k: Long, lvl: Int): Option[String] =
        levels(lvl).get(k).flatMap {
          case Left(next) => resolve(next, lvl + 1)
          case Right(g) => Some(g)
        }
      facts.values.toSeq
        .flatMap { case (k1, m) => resolve(k1, 0).map(g => g -> m) }
        .groupBy(_._1)
        .map { case (g, ms) => g -> (ms.map(_._2).sum, ms.size.toLong) }
    }
  }

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAggN.view(spark, state)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def foldN(state: String, fb: Seq[(Long, Long, Long)],
      dels: Seq[(Long, Long)], l1: Seq[(Long, Long)], l2: Seq[(Long, Long)],
      l3: Seq[(Long, String)], id: Long): Unit =
    IncrementalJoinAggN.processBatch(
      fb.toDF("k", "id", "m"), "k", "id", "m",
      dels.toDF("k", "id"), "k", "id",
      Seq(l1.toDF("k", "v"), l2.toDF("k", "v"), l3.toDF("k", "v")),
      Seq(("k", "v"), ("k", "v"), ("k", "v")),
      state, id, numBuckets = 4)

  test("depth 3: arrival-order independence and a MIDDLE-level re-key re-routing subtrees") {
    val state = tmpDir("jn1")
    var m = Model(levels = Vector(Map.empty, Map.empty, Map.empty))
    def step(fb: Seq[(Long, Long, Long)], dels: Seq[(Long, Long)],
        l1: Seq[(Long, Long)], l2: Seq[(Long, Long)], l3: Seq[(Long, String)],
        id: Long): Unit = {
      foldN(state, fb, dels, l1, l2, l3, id)
      m = m.fold(fb, dels, Seq(
        l1.map { case (k, v) => (k, Left(v): Either[Long, String]) },
        l2.map { case (k, v) => (k, Left(v): Either[Long, String]) },
        l3.map { case (k, v) => (k, Right(v): Either[Long, String]) }))
      assert(served(state) === m.view, s"batch $id diverged")
    }

    // chains complete out of order: facts, then level 2, then 3, then 1
    step(Seq((10L, 1L, 100L), (10L, 2L, 50L), (20L, 3L, 7L)), Nil, Nil, Nil, Nil, 0L)
    assert(served(state) === Map.empty)
    step(Nil, Nil, Nil, Seq((500L, 9000L)), Nil, 1L)
    step(Nil, Nil, Nil, Nil, Seq((9000L, "A")), 2L)
    assert(served(state) === Map.empty) // level 1 still missing
    step(Nil, Nil, Seq((10L, 500L), (20L, 600L)), Nil, Nil, 3L)
    assert(served(state) === Map("A" -> (150L, 2L)))
    step(Nil, Nil, Nil, Seq((600L, 9001L)), Seq((9001L, "B")), 4L)
    assert(served(state) === Map("A" -> (150L, 2L), "B" -> (7L, 1L)))

    // MIDDLE-level re-key: 500 → 9001 moves the k1=10 subtree A → B,
    // two joins away from both the facts and the group rows
    step(Nil, Nil, Nil, Seq((500L, 9001L)), Nil, 5L)
    assert(served(state) === Map("B" -> (157L, 3L)))
    // top-level re-group empties B's group
    step(Nil, Nil, Nil, Nil, Seq((9001L, "C"), (9000L, "C")), 6L)
    assert(served(state) === Map("C" -> (157L, 3L)))
    // fact delete at depth 3
    step(Nil, Seq((10L, 1L)), Nil, Nil, Nil, 7L)
    assert(served(state) === Map("C" -> (57L, 2L)))
    // replay is a no-op
    foldN(state, Nil, Seq((10L, 1L)), Nil, Nil, Nil, 7L)
    assert(served(state) === Map("C" -> (57L, 2L)))
  }

  test("depth 3 random interleave == model after every batch") {
    val state = tmpDir("jn2")
    val rnd = new scala.util.Random(11)
    var m = Model(levels = Vector(Map.empty, Map.empty, Map.empty))
    var nextId = 0L
    for (b <- 0L until 6L) {
      val fb = Seq.fill(rnd.nextInt(4)) {
        nextId += 1; (rnd.nextInt(6).toLong, nextId, rnd.nextInt(50).toLong)
      }
      val dels = m.facts.keys.toSeq.sorted.take(rnd.nextInt(2))
        .map(id => (m.facts(id)._1, id))
      val l1 = Seq.fill(rnd.nextInt(3))((rnd.nextInt(6).toLong, 100L + rnd.nextInt(4)))
      val l2 = Seq.fill(rnd.nextInt(3))((100L + rnd.nextInt(4).toLong, 200L + rnd.nextInt(3)))
      val l3 = Seq.fill(rnd.nextInt(3))((200L + rnd.nextInt(3).toLong, s"G${rnd.nextInt(3)}"))
      foldN(state, fb, dels, l1, l2, l3, b)
      m = m.fold(fb, dels, Seq(
        l1.map { case (k, v) => (k, Left(v): Either[Long, String]) },
        l2.map { case (k, v) => (k, Left(v): Either[Long, String]) },
        l3.map { case (k, v) => (k, Right(v): Either[Long, String]) }))
      assert(served(state) === m.view, s"batch $b diverged from the model")
    }
    // changelog integral == view
    val integral = IncrementalJoinAggN.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("p"))
      .filter("p <> 0")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(integral === served(state))
  }

  test("bootstrap: batch-table initialization, exact continuation with retractions") {
    val state = tmpDir("jn4")
    var m = Model(levels = Vector(Map.empty, Map.empty, Map.empty))
    val f0 = Seq((10L, 1L, 100L), (10L, 2L, 50L), (20L, 3L, 7L))
    val l1 = Seq((10L, 500L), (20L, 600L))
    val l2 = Seq((500L, 900L), (600L, 901L))
    val l3 = Seq((900L, "A"), (901L, "B"))
    IncrementalJoinAggN.bootstrap(
      f0.toDF("k", "id", "m"), "k", "id", "m",
      Seq(l1.toDF("k", "v"), l2.toDF("k", "v"), l3.toDF("k", "v")),
      Seq(("k", "v"), ("k", "v"), ("k", "v")), state,
      baselineBatch = 0L, numBuckets = 4)
    m = m.fold(f0, Nil, Seq(
      l1.map { case (k, v) => (k, Left(v): Either[Long, String]) },
      l2.map { case (k, v) => (k, Left(v): Either[Long, String]) },
      l3.map { case (k, v) => (k, Right(v): Either[Long, String]) }))
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (150L, 2L), "B" -> (7L, 1L)))

    // continuation: a middle-level re-key RETRACTS against bootstrapped
    // state (probes the bootstrapped mirrors), plus a delete
    foldN(state, Nil, Seq((10L, 1L)), Nil, Seq((500L, 901L)), Nil, 1L)
    m = m.fold(Nil, Seq((10L, 1L)),
      Seq(Nil, Seq((500L, Left(901L): Either[Long, String])), Nil))
    assert(served(state) === m.view)
    assert(served(state) === Map("B" -> (57L, 2L)))

    // changelog integral == view across the baseline + live rows
    val integral = IncrementalJoinAggN.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("drows").as("p"))
      .filter("p <> 0")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(integral === served(state))

    // refuses a live dir
    assertThrows[IllegalArgumentException] {
      IncrementalJoinAggN.bootstrap(f0.toDF("k", "id", "m"), "k", "id", "m",
        Seq(l1.toDF("k", "v"), l2.toDF("k", "v"), l3.toDF("k", "v")),
        Seq(("k", "v"), ("k", "v"), ("k", "v")), state, numBuckets = 4)
    }
  }

  test("depth 2 instance serves exactly what the hand-written ternary view serves") {
    val stateN = tmpDir("jn3n"); val stateC = tmpDir("jn3c")
    val rnd = new scala.util.Random(5)
    var nextId = 0L
    for (b <- 0L until 4L) {
      val fb = Seq.fill(rnd.nextInt(4)) {
        nextId += 1; (rnd.nextInt(5).toLong, nextId, rnd.nextInt(40).toLong)
      }
      val l1 = Seq.fill(rnd.nextInt(3))((rnd.nextInt(5).toLong, 100L + rnd.nextInt(3)))
      val l2 = Seq.fill(rnd.nextInt(3))((100L + rnd.nextInt(3).toLong, s"S${rnd.nextInt(3)}"))
      IncrementalJoinAggN.processBatch(
        fb.toDF("k", "id", "m"), "k", "id", "m",
        Seq.empty[(Long, Long)].toDF("k", "id"), "k", "id",
        Seq(l1.toDF("k", "v"), l2.toDF("k", "v")),
        Seq(("k", "v"), ("k", "v")), stateN, b, numBuckets = 4)
      IncrementalJoinAggChain.processBatch(
        fb.toDF("k1", "id", "m"), "k1", "id", "m",
        Seq.empty[(Long, Long)].toDF("k1", "id"), "k1", "id",
        l1.toDF("k1", "k2"), "k1", "k2",
        l2.toDF("k2", "g"), "k2", "g", stateC, b, numBuckets = 4)
      val n = served(stateN)
      val c = IncrementalJoinAggChain.view(spark, stateC)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(n === c, s"batch $b: depth-2 N-engine diverged from the ternary view")
    }
  }
}
