package graft.streaming

import graft.SparkTestBase

/** The maintained CHAIN join-aggregate (fact ⋈ dim1 ⋈ dim2 GROUP BY
  * d2.g) must equal the batch recompute after EVERY batch, for any
  * interleaving of fact inserts, fact DELETES, dim1 re-keys (which
  * re-route facts to a different d2 subtree), and dim2 re-groups. The
  * signed changelog must integrate to the served view, and the
  * k2-bucketed dim1 mirror must stay row-identical to dim1 across
  * cross-bucket re-keys. */
class IncrementalJoinAggChainSpec extends SparkTestBase {
  import spark.implicits._

  /** Scenario model mirroring the documented contracts: facts absorbed
    * once per id (min (k1, m) within a batch; same-batch delete wins),
    * deletes drop live ids, dims latest-wins (max within a batch). */
  private case class Model(
      facts: Map[Long, (Long, Long)] = Map.empty, // id -> (k1, m)
      d1: Map[Long, Long] = Map.empty,            // k1 -> k2
      d2: Map[Long, String] = Map.empty) {        // k2 -> g
    def fold(fb: Seq[(Long, Long, Long)], dels: Seq[(Long, Long)],
        d1b: Seq[(Long, Long)], d2b: Seq[(Long, String)]): Model = {
      val delIds = dels.map(_._2).toSet
      val fAbs = fb.groupBy(_._2).map { case (id, rows) =>
        val (k1, m) = rows.map(r => (r._1, r._3)).min
        id -> (k1, m)
      }
      val kept = facts ++ fAbs.filterNot { case (id, _) =>
        facts.contains(id) || delIds.contains(id) }
      val d1Abs = d1b.groupBy(_._1).map { case (k1, rows) => k1 -> rows.map(_._2).max }
      val d2Abs = d2b.groupBy(_._1).map { case (k2, rows) => k2 -> rows.map(_._2).max }
      Model(kept -- delIds, d1 ++ d1Abs, d2 ++ d2Abs)
    }
    def view: Map[String, (Long, Long)] =
      facts.values.toSeq
        .flatMap { case (k1, m) =>
          d1.get(k1).flatMap(k2 => d2.get(k2)).map(g => g -> m) }
        .groupBy(_._1)
        .map { case (g, ms) => g -> (ms.map(_._2).sum, ms.size.toLong) }
  }

  private def fold(state: String, fb: Seq[(Long, Long, Long)],
      dels: Seq[(Long, Long)], d1b: Seq[(Long, Long)],
      d2b: Seq[(Long, String)], id: Long): Unit =
    IncrementalJoinAggChain.processBatch(
      fb.toDF("k1", "id", "m"), "k1", "id", "m",
      dels.toDF("k1", "id"), "k1", "id",
      d1b.toDF("k1", "k2"), "k1", "k2",
      d2b.toDF("k2", "g"), "k2", "g",
      state, id, numBuckets = 4)

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAggChain.view(spark, state)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def integralEqualsView(state: String): Unit = {
    val integral = IncrementalJoinAggChain.changelog(spark, state)
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("dtotal").as("t"),
        org.apache.spark.sql.functions.sum("dtriples").as("p"))
      .filter("p <> 0")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(integral === served(state), "Z-set integral must equal the view")
  }

  private def mirrorEqualsDim1(state: String): Unit = {
    val d1 = IncrementalJoinAggChain.dims1(spark, state)
      .as[(Long, Long)].collect().sorted.toSeq
    val d1m = IncrementalJoinAggChain.dims1Mirror(spark, state)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(d1m === d1, "k2-bucketed mirror must stay row-identical to dim1")
  }

  test("chain completes only when BOTH dims arrive; any arrival order") {
    val state = tmpDir("jac1")
    var m = Model()
    // facts first — nothing joins
    val f0 = Seq((10L, 1L, 100L), (10L, 2L, 50L), (20L, 3L, 7L))
    fold(state, f0, Nil, Nil, Nil, 0L); m = m.fold(f0, Nil, Nil, Nil)
    assert(served(state) === Map.empty)
    // dim1 arrives — still no group attribute, nothing joins
    fold(state, Nil, Nil, Seq((10L, 500L), (20L, 600L)), Nil, 1L)
    m = m.fold(Nil, Nil, Seq((10L, 500L), (20L, 600L)), Nil)
    assert(served(state) === Map.empty)
    // dim2 for k2=500 completes the chain for the two k1=10 facts
    fold(state, Nil, Nil, Nil, Seq((500L, "A")), 2L)
    m = m.fold(Nil, Nil, Nil, Seq((500L, "A")))
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (150L, 2L)))
    // everything at once for a new subtree
    val f3 = Seq((30L, 4L, 9L))
    fold(state, f3, Nil, Seq((30L, 700L)), Seq((700L, "C"), (600L, "B")), 3L)
    m = m.fold(f3, Nil, Seq((30L, 700L)), Seq((700L, "C"), (600L, "B")))
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (150L, 2L), "B" -> (7L, 1L), "C" -> (9L, 1L)))
    integralEqualsView(state)
    mirrorEqualsDim1(state)
  }

  test("dim1 re-key RE-ROUTES facts between d2 subtrees (the chain retraction)") {
    val state = tmpDir("jac2")
    var m = Model()
    val f0 = Seq((10L, 1L, 100L), (10L, 2L, 50L), (20L, 3L, 7L))
    val init = (Seq((10L, 500L), (20L, 600L)), Seq((500L, "A"), (600L, "B")))
    fold(state, f0, Nil, init._1, init._2, 0L); m = m.fold(f0, Nil, init._1, init._2)
    assert(served(state) === Map("A" -> (150L, 2L), "B" -> (7L, 1L)))
    // re-key k1=10 from k2=500 (group A) to k2=600 (group B): both its
    // facts move A → B without any fact or d2 row in the batch
    fold(state, Nil, Nil, Seq((10L, 600L)), Nil, 1L)
    m = m.fold(Nil, Nil, Seq((10L, 600L)), Nil)
    assert(served(state) === m.view)
    assert(served(state) === Map("B" -> (157L, 3L)))
    integralEqualsView(state)
    mirrorEqualsDim1(state) // the re-key moved a mirror row across buckets
    // re-key to a k2 with NO d2 row: contributions vanish until it lands
    fold(state, Nil, Nil, Seq((10L, 900L)), Nil, 2L)
    m = m.fold(Nil, Nil, Seq((10L, 900L)), Nil)
    assert(served(state) === Map("B" -> (7L, 1L)))
    fold(state, Nil, Nil, Nil, Seq((900L, "D")), 3L)
    m = m.fold(Nil, Nil, Nil, Seq((900L, "D")))
    assert(served(state) === m.view)
    assert(served(state) === Map("B" -> (7L, 1L), "D" -> (150L, 2L)))
    integralEqualsView(state)
  }

  test("dim2 re-group moves a whole subtree; emptied group leaves the view") {
    val state = tmpDir("jac3")
    var m = Model()
    val f0 = Seq((10L, 1L, 100L), (20L, 2L, 30L))
    val init = (Seq((10L, 500L), (20L, 600L)), Seq((500L, "A"), (600L, "A")))
    fold(state, f0, Nil, init._1, init._2, 0L); m = m.fold(f0, Nil, init._1, init._2)
    assert(served(state) === Map("A" -> (130L, 2L)))
    fold(state, Nil, Nil, Nil, Seq((500L, "B")), 1L)
    m = m.fold(Nil, Nil, Nil, Seq((500L, "B")))
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (30L, 1L), "B" -> (100L, 1L)))
    // empty group A entirely
    fold(state, Nil, Nil, Nil, Seq((600L, "B")), 2L)
    m = m.fold(Nil, Nil, Nil, Seq((600L, "B")))
    assert(served(state) === Map("B" -> (130L, 2L)))
    assert(!served(state).contains("A"), "emptied group must leave the view")
    integralEqualsView(state)
  }

  test("fact DELETE retracts its live contribution; same-batch add+delete is a no-op") {
    val state = tmpDir("jac4")
    var m = Model()
    val f0 = Seq((10L, 1L, 100L), (10L, 2L, 50L))
    fold(state, f0, Nil, Seq((10L, 500L)), Seq((500L, "A")), 0L)
    m = m.fold(f0, Nil, Seq((10L, 500L)), Seq((500L, "A")))
    assert(served(state) === Map("A" -> (150L, 2L)))
    // delete id=1 — A loses 100
    fold(state, Nil, Seq((10L, 1L)), Nil, Nil, 1L)
    m = m.fold(Nil, Seq((10L, 1L)), Nil, Nil)
    assert(served(state) === m.view)
    assert(served(state) === Map("A" -> (50L, 1L)))
    // same-batch add + delete of id=9: never lands
    fold(state, Seq((10L, 9L, 77L)), Seq((10L, 9L)), Nil, Nil, 2L)
    m = m.fold(Seq((10L, 9L, 77L)), Seq((10L, 9L)), Nil, Nil)
    assert(served(state) === Map("A" -> (50L, 1L)))
    // delete the last joined fact — group empties and leaves the view
    fold(state, Nil, Seq((10L, 2L)), Nil, Nil, 3L)
    m = m.fold(Nil, Seq((10L, 2L)), Nil, Nil)
    assert(served(state) === Map.empty)
    integralEqualsView(state)
    // a deleted id re-sent LATER is a new fact (ids are absorption keys
    // for at-least-once delivery, not tombstones)
    fold(state, Seq((10L, 2L, 5L)), Nil, Nil, Nil, 4L)
    m = m.fold(Seq((10L, 2L, 5L)), Nil, Nil, Nil)
    assert(served(state) === Map("A" -> (5L, 1L)))
  }

  test("replaying a batch id is a no-op (at-least-once delivery)") {
    val state = tmpDir("jac5")
    fold(state, Seq((10L, 1L, 100L)), Nil, Seq((10L, 500L)), Seq((500L, "A")), 0L)
    val f1 = Seq((10L, 2L, 11L))
    fold(state, f1, Nil, Nil, Seq((500L, "B")), 1L)
    val before = served(state)
    val clBefore = IncrementalJoinAggChain.changelog(spark, state).count()
    fold(state, f1, Nil, Nil, Seq((500L, "B")), 1L) // replay
    assert(served(state) === before)
    assert(IncrementalJoinAggChain.changelog(spark, state).count() === clBefore,
      "replay must not duplicate changelog rows")
    assert(before === Map("B" -> (111L, 2L)))
  }

  test("random interleave of all four inputs ≡ batch recompute after every batch") {
    val state = tmpDir("jac6")
    val rnd = new scala.util.Random(42)
    var m = Model()
    var nextId = 0L
    val history = scala.collection.mutable.Map[Long, Map[String, (Long, Long)]]()
    for (b <- 0L until 6L) {
      val fb = Seq.fill(rnd.nextInt(5)) {
        nextId += 1
        (rnd.nextInt(8).toLong, nextId, rnd.nextInt(100).toLong)
      }
      // delete a random LIVE fact sometimes
      val dels = m.facts.toSeq.sortBy(_._1).take(rnd.nextInt(2))
        .map { case (id, (k1, _)) => (k1, id) }
      val d1b = Seq.fill(rnd.nextInt(4))(
        (rnd.nextInt(8).toLong, 100L + rnd.nextInt(5).toLong))
      val d2b = Seq.fill(rnd.nextInt(3))(
        (100L + rnd.nextInt(5).toLong, s"G${rnd.nextInt(4)}"))
      fold(state, fb, dels, d1b, d2b, b)
      m = m.fold(fb, dels, d1b, d2b)
      assert(served(state) === m.view, s"batch $b diverged from the model")
      history(b) = m.view
    }
    integralEqualsView(state)
    mirrorEqualsDim1(state)
    // AS-OF reads: the truncated changelog integral reproduces the view
    // as it stood after every past batch
    for (b <- 0L until 6L) {
      val asOf = IncrementalJoinAggChain.viewAsOf(spark, state, b)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(asOf === history(b), s"asOf($b) diverged from the batch-$b view")
    }
    // changelog compaction at floor 3: as-of at/above the floor and the
    // integral survive; history below the floor is spent (documented)
    val rowsBefore = IncrementalJoinAggChain.changelog(spark, state).count()
    IncrementalJoinAggChain.compactChangelog(spark, state, 3L)
    assert(IncrementalJoinAggChain.changelog(spark, state).count() <= rowsBefore)
    for (b <- 3L until 6L) {
      val asOf = IncrementalJoinAggChain.viewAsOf(spark, state, b)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(asOf === history(b), s"post-compaction asOf($b) diverged")
    }
    integralEqualsView(state)
  }

  test("crash between table applies: replay re-applies the staged delta and converges") {
    import org.apache.spark.sql.functions.{col, lit}
    val state = tmpDir("jac8")
    val path = s"$state/joinaggstar"
    // hand-stage the delta a healthy batch 0 would have computed from
    // empty state (one fact + its two dim rows + the aggregate) in the
    // STAR engine's staged layout (the chain is its depth-2 single-
    // branch instance since R150), then simulate a crash that applied
    // ONLY the f table before dying
    val delta = Seq(
      ("f", Some(1L), Some(100L), Some(10L), None: Option[Long],
        None: Option[Long], None: Option[String], None: Option[String],
        None: Option[Long], None: Option[Long], Some(1L)),
      ("d1_1", None, None, None, Some(10L), Some(500L), None, None,
        None, None, Some(1L)),
      ("d1_2", None, None, None, Some(500L), None, Some("A"), None,
        None, None, Some(1L)),
      ("a", None, Some(100L), None, None, None, None, Some("A"),
        Some(1L), None, None),
      ("c", None, Some(100L), None, None, None, None, Some("A"),
        Some(1L), Some(0L), None))
      .toDF("tbl", "id", "m", "k1", "k", "vl", "vs", "g", "c", "b", "w")
    delta.write.parquet(s"$path/_delta_b0")
    MvPipeline.upsertBucketedMerge(
      spark.read.parquet(s"$path/_delta_b0").filter(col("tbl") === "f")
        .select("id", "m", "k1", "w"),
      s"$path/f", (old, inc) => {
        val o = if (old.columns.contains("w")) old.drop("w") else old
        o.unionByName(inc.filter(col("w") === 1L).drop("w")).distinct()
      }, 0L, 4, Seq("k1"))
    // the replay: same batch id, inputs IRRELEVANT (the staged delta is
    // reused byte-identically); f buckets skip via markers, the other
    // four tables apply, the staged file sweeps
    val empty = Seq.empty[(Long, Long, Long)].toDF("k1", "id", "m")
    IncrementalJoinAggChain.processBatch(
      empty, "k1", "id", "m",
      Seq.empty[(Long, Long)].toDF("k1", "id"), "k1", "id",
      Seq.empty[(Long, Long)].toDF("k1", "k2"), "k1", "k2",
      Seq.empty[(Long, String)].toDF("k2", "g"), "k2", "g",
      state, 0L, numBuckets = 4)
    assert(served(state) === Map("A" -> (100L, 1L)))
    mirrorEqualsDim1(state)
    integralEqualsView(state)
    assert(!new java.io.File(s"$path/_delta_b0").exists(),
      "staged delta must sweep after full application")
    assert(new java.io.File(path).exists(), "star layout state dir expected")
  }

  test("start(): mixed CDC stream end-to-end via foreachBatch") {
    import org.apache.spark.sql.types._
    val in = tmpDir("jac7in"); val state = tmpDir("jac7st"); val ckpt = tmpDir("jac7ck")
    val schema = StructType(Seq(
      StructField("kind", StringType), StructField("k1", LongType),
      StructField("k2", LongType), StructField("id", LongType),
      StructField("g", StringType), StructField("m", LongType)))
    val rows = Seq(
      """{"kind":"fact","k1":10,"id":1,"m":100}""",
      """{"kind":"fact","k1":10,"id":2,"m":50}""",
      """{"kind":"dim1","k1":10,"k2":500}""",
      """{"kind":"dim2","k2":500,"g":"A"}""",
      """{"kind":"fact_del","k1":10,"id":2}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b0.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    val q = IncrementalJoinAggChain.start(spark, in, schema, state, ckpt,
      "kind", "k1", "k2", "id", "g", "m")
    q.awaitTermination()
    assert(served(state) === Map("A" -> (100L, 1L)))
    integralEqualsView(state)
  }
}
