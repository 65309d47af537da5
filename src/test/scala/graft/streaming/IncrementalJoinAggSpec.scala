package graft.streaming

import graft.SparkTestBase

/** The maintained join-aggregate must equal the batch join+GROUP BY
  * after EVERY batch, for ANY interleaving of fact and dim arrivals —
  * including facts arriving BEFORE their dimension (the case a
  * single-source MV engine can never join) and dimension UPSERTS that
  * RETRACT previously-reported group contributions. The Z-set changelog
  * must integrate to the served aggregate. */
class IncrementalJoinAggSpec extends SparkTestBase {
  import spark.implicits._

  // scenario model: facts (jk, id, m) absorbed once per id; dims (jk, g)
  // latest-wins across batches, max-g within a batch
  private case class Model(
      facts: Map[Long, (Long, Long)] = Map.empty, // id -> (jk, m)
      dims: Map[Long, String] = Map.empty) {      // jk -> g
    def fold(fb: Seq[(Long, Long, Long)], db: Seq[(Long, String)]): Model = {
      val fAbs = fb.groupBy(_._2).map { case (id, rows) =>
        val (jk, m) = rows.map(r => (r._1, r._3)).min
        id -> (jk, m)
      }
      val dAbs = db.groupBy(_._1).map { case (jk, rows) => jk -> rows.map(_._2).max }
      Model(facts ++ fAbs.filterNot { case (id, _) => facts.contains(id) }, dims ++ dAbs)
    }
    def view: Map[String, (Long, Long)] =
      facts.values.toSeq
        .flatMap { case (jk, m) => dims.get(jk).map(g => g -> m) }
        .groupBy(_._1)
        .map { case (g, ms) => g -> (ms.map(_._2).sum, ms.size.toLong) }
  }

  private def fold(state: String, fb: Seq[(Long, Long, Long)],
      db: Seq[(Long, String)], id: Long): Unit =
    IncrementalJoinAgg.processBatch(
      fb.toDF("jk", "id", "m"), "jk", "id", "m",
      db.toDF("jk", "g"), "jk", "g",
      state, id, numBuckets = 4)

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAgg.view(spark, state)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def integralEqualsView(state: String): Unit = {
    val integral = IncrementalJoinAgg.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("dpairs").as("p"))
      .filter("p <> 0")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(integral === served(state), "Z-set integral must equal the view")
  }

  test("facts before dims: contributions appear when the dim arrives") {
    val state = tmpDir("ja1")
    var m = Model()
    // batch 0: facts only — nothing joins yet
    val f0 = Seq((10L, 1L, 100L), (10L, 2L, 50L), (20L, 3L, 7L))
    fold(state, f0, Nil, 0L); m = m.fold(f0, Nil)
    assert(served(state) === m.view)
    assert(served(state) === Map.empty)
    // batch 1: dim for jk=10 arrives — its two waiting facts join
    fold(state, Nil, Seq((10L, "A")), 1L); m = m.fold(Nil, Seq((10L, "A")))
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (150L, 2L)))
    // batch 2: a third fact for jk=10 and the jk=20 dim together
    val f2 = Seq((10L, 4L, 1L))
    fold(state, f2, Seq((20L, "B")), 2L); m = m.fold(f2, Seq((20L, "B")))
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (151L, 3L), "B" -> (7L, 1L)))
    integralEqualsView(state)

    // AS-OF reads reproduce the view at every past batch
    def asOf(b: Long): Map[String, (Long, Long)] =
      IncrementalJoinAgg.viewAsOf(spark, state, b)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(asOf(0L) === Map.empty)
    assert(asOf(1L) === Map("A" -> (150L, 2L)))
    assert(asOf(2L) === served(state))

    // changelog compaction at floor 2: the A rows from batches 1 and 2
    // fold to one baseline; as-of at/above the floor and the integral
    // stay exact (addressability below the floor is what's spent)
    val rowsBefore = IncrementalJoinAgg.changelog(spark, state).count()
    IncrementalJoinAgg.compactChangelog(spark, state, 2L)
    assert(IncrementalJoinAgg.changelog(spark, state).count() < rowsBefore)
    assert(asOf(2L) === served(state))
    integralEqualsView(state)
    // idempotent re-run; a later batch still folds exactly
    IncrementalJoinAgg.compactChangelog(spark, state, 2L)
    assert(asOf(2L) === served(state))
    fold(state, Seq((20L, 9L, 5L)), Nil, 3L); m = m.fold(Seq((20L, 9L, 5L)), Nil)
    assert(served(state) === m.view)
    integralEqualsView(state)
  }

  test("dim upsert RETRACTS: totals move groups, emptied group leaves the view") {
    val state = tmpDir("ja2")
    fold(state, Seq((10L, 1L, 100L), (20L, 2L, 30L)),
      Seq((10L, "A"), (20L, "A")), 0L)
    assert(served(state) === Map("A" -> (130L, 2L)))
    // re-key jk=10 from A to B: A keeps only the jk=20 fact
    fold(state, Nil, Seq((10L, "B")), 1L)
    assert(served(state) === Map("A" -> (30L, 1L), "B" -> (100L, 1L)))
    // the changelog carries the signed move
    val d1 = IncrementalJoinAgg.changelog(spark, state)
      .filter("batch = 1").as[(Long, String, Long, Long)].collect().toSet
    assert(d1 === Set((1L, "A", -100L, -1L), (1L, "B", 100L, 1L)))
    integralEqualsView(state)
    // re-key jk=20 to B as well: group A now has ZERO live pairs — it
    // must leave the served view entirely (batch GROUP BY semantics)
    fold(state, Nil, Seq((20L, "B")), 2L)
    assert(served(state) === Map("B" -> (130L, 2L)))
    assert(!served(state).contains("A"))
    integralEqualsView(state)
    // and a NEW fact under a re-keyed dim lands in the new group
    fold(state, Seq((10L, 9L, 5L)), Nil, 3L)
    assert(served(state) === Map("B" -> (135L, 3L)))
    integralEqualsView(state)
  }

  test("replay, re-sent facts, and within-batch dup dims are absorbed") {
    val state = tmpDir("ja3")
    val f0 = Seq((10L, 1L, 100L))
    fold(state, f0, Seq((10L, "A")), 0L)
    assert(served(state) === Map("A" -> (100L, 1L)))
    // replaying the same batch id is a no-op (staged delta + markers)
    fold(state, f0, Seq((10L, "A")), 0L)
    assert(served(state) === Map("A" -> (100L, 1L)))
    integralEqualsView(state)
    // a re-sent fact id (at-least-once) must not double-count, even in
    // a NEW batch; an unchanged dim upsert must not churn the changelog
    fold(state, f0, Seq((10L, "A")), 1L)
    assert(served(state) === Map("A" -> (100L, 1L)))
    assert(IncrementalJoinAgg.changelog(spark, state)
      .filter("batch = 1").count() === 0L)
    // within-batch duplicate dim rows: deterministic max-g winner
    val state2 = tmpDir("ja3b")
    fold(state2, Seq((10L, 1L, 10L)), Seq((10L, "A"), (10L, "C"), (10L, "B")), 0L)
    assert(served(state2) === Map("C" -> (10L, 1L)))
  }

  test("random 3-way interleaved split == batch after every batch; ad-hoc fold") {
    val state = tmpDir("ja4")
    // deterministic pseudo-random scenario: 60 facts over 12 join keys,
    // dims arriving late and re-keyed twice
    def h(i: Long, salt: Long): Long = {
      var x = i * 2654435761L + salt * 40503L
      x ^= x >>> 16; x * 0x9E3779B97F4A7C15L >>> 40
    }
    val allFacts = (1L to 60L).map(i => (h(i, 1) % 12, i, h(i, 2) % 1000))
    val allDims = (0L until 12L).map(jk => (jk, s"g${h(jk, 3) % 4}")) ++
      (0L until 6L).map(jk => (jk, s"g${h(jk, 4) % 4}")) // re-keys for half
    val fParts = Seq(allFacts.take(20), allFacts.slice(20, 40), allFacts.drop(40))
    val dParts = Seq(allDims.take(6), allDims.slice(6, 12), allDims.drop(12))
    var m = Model()
    for (i <- 0 until 3) {
      fold(state, fParts(i), dParts(i), i.toLong)
      m = m.fold(fParts(i), dParts(i))
      assert(served(state) === m.view, s"batch $i diverged from batch recompute")
      integralEqualsView(state)
    }
    // an AD-HOC fold (batchId = -1) maintains the aggregate exactly
    val fx = Seq((3L, 1000L, 77L))
    fold(state, fx, Nil, -1L)
    m = m.fold(fx, Nil)
    assert(served(state) === m.view)
  }

  test("start(): mixed CDC stream end-to-end (AvailableNow)") {
    import org.apache.spark.sql.types._
    val in = tmpDir("ja-in"); val state = tmpDir("ja-st"); val ckpt = tmpDir("ja-ck")
    val schema = StructType(Seq(
      StructField("kind", StringType), StructField("jk", LongType),
      StructField("id", LongType), StructField("g", StringType),
      StructField("m", LongType)))
    java.nio.file.Files.write(java.nio.file.Paths.get(in, "b0.json"),
      ("""{"kind":"fact","jk":10,"id":1,"m":100}""" + "\n" +
       """{"kind":"fact","jk":20,"id":2,"m":30}""" + "\n" +
       """{"kind":"dim","jk":10,"g":"A"}""" + "\n").getBytes("UTF-8"))
    val q = IncrementalJoinAgg.start(spark, in, schema, state, ckpt,
      "kind", "jk", "id", "g", "m")
    q.awaitTermination()
    assert(served(state) === Map("A" -> (100L, 1L)))
    // second file: the waiting fact's dim + an upsert retraction
    java.nio.file.Files.write(java.nio.file.Paths.get(in, "b1.json"),
      ("""{"kind":"dim","jk":20,"g":"B"}""" + "\n" +
       """{"kind":"dim","jk":10,"g":"B"}""" + "\n").getBytes("UTF-8"))
    val q2 = IncrementalJoinAgg.start(spark, in, schema, state, ckpt,
      "kind", "jk", "id", "g", "m")
    q2.awaitTermination()
    assert(served(state) === Map("B" -> (130L, 2L)))
    integralEqualsView(state)
  }
}
