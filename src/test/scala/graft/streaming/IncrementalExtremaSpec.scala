package graft.streaming

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Exact order statistics (min/max/count/quantiles/top-N) maintained
  * under full Z-set inputs must equal the batch recompute over the
  * integrated multiset after EVERY batch — including the case scalar
  * aggregate states cannot serve: deleting the current max must fall
  * back to the retained runner-up. */
class IncrementalExtremaSpec extends SparkTestBase {
  import spark.implicits._

  // model: per group, value -> multiplicity (Z-set integral)
  private type Model = Map[String, Map[Long, Long]]
  private def fold(m: Model, batch: Seq[(String, Long, Long)]): Model =
    batch.foldLeft(m) { case (acc, (g, v, w)) =>
      val gm = acc.getOrElse(g, Map.empty)
      val nw = gm.getOrElse(v, 0L) + w
      val gm2 = if (nw == 0) gm - v else gm.updated(v, nw)
      if (gm2.isEmpty) acc - g else acc.updated(g, gm2)
    }
  private def presentOf(m: Model): Map[String, Seq[(Long, Long)]] =
    m.map { case (g, vm) =>
      g -> vm.toSeq.filter(_._2 > 0).sortBy(_._1)
    }.filter(_._2.nonEmpty)

  private def expectView(m: Model): Map[String, (Long, Long, Long)] =
    presentOf(m).map { case (g, vs) =>
      g -> (vs.map(_._2).sum, vs.map(_._1).min, vs.map(_._1).max)
    }
  private def expectQuantile(m: Model, qn: Long, qd: Long): Map[String, Long] =
    presentOf(m).map { case (g, vs) =>
      val n = vs.map(_._2).sum
      val target = (qn * n + qd - 1) / qd
      var cum = 0L
      g -> vs.collectFirst {
        case (v, w) if { cum += w; cum >= target } => v
      }.get
    }

  private def served(state: String): Map[String, (Long, Long, Long)] =
    IncrementalExtrema.view(spark, state)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  private def foldBatch(state: String, batch: Seq[(String, Long, Long)],
      id: Long): Unit =
    IncrementalExtrema.processBatch(batch.toDF("g", "v", "w"), state, id,
      numBuckets = 4)

  test("delete-the-max falls back to the retained runner-up; min likewise") {
    val state = tmpDir("extrema")
    foldBatch(state, Seq(("a", 10L, 1L), ("a", 7L, 1L), ("a", 3L, 1L)), 0L)
    assert(served(state) === Map("a" -> (3L, 3L, 10L)))
    foldBatch(state, Seq(("a", 10L, -1L), ("a", 3L, -1L)), 1L)
    // scalar max-state would still say 10; the relation serves 7
    assert(served(state) === Map("a" -> (1L, 7L, 7L)))
  }

  test("random signed interleave ≡ model after every batch; quantiles and topN exact") {
    val state = tmpDir("extrema")
    val rnd = new scala.util.Random(154)
    var model: Model = Map.empty
    var live: Vector[(String, Long)] = Vector.empty // insertable pool mirror
    for (b <- 0 until 6) {
      val ins = Seq.fill(30) {
        val r = (s"g${rnd.nextInt(4)}", rnd.nextInt(20).toLong)
        live = live :+ r; (r._1, r._2, 1L)
      }
      val dels = (0 until math.min(10, live.size / 3)).map { _ =>
        val i = rnd.nextInt(live.size)
        val r = live(i); live = live.patch(i, Nil, 1)
        (r._1, r._2, -1L)
      }
      val batch = rnd.shuffle(ins ++ dels)
      model = fold(model, batch)
      foldBatch(state, batch, b.toLong)
      assert(served(state) === expectView(model), s"batch $b view")
      val qs = Seq((1L, 2L), (9L, 10L))
      val got = IncrementalExtrema.quantiles(spark, state, qs)
        .as[(String, Long, Long)].collect()
      assert(got.map(r => r._1 -> r._2).toMap === expectQuantile(model, 1L, 2L),
        s"batch $b median")
      assert(got.map(r => r._1 -> r._3).toMap === expectQuantile(model, 9L, 10L),
        s"batch $b p90")
      val top = IncrementalExtrema.topN(spark, state, 2)
        .as[(String, Long, Long, Int)].collect()
      val expTop = presentOf(model).map { case (g, vs) =>
        g -> vs.sortBy(-_._1).take(2).map(_._1)
      }
      assert(top.groupBy(_._1).map { case (g, rows) =>
        g -> rows.sortBy(_._4).map(_._2).toSeq
      } === expTop, s"batch $b topN")
    }
  }

  test("delete before insert: negative row retained, cancels on arrival; absent from view") {
    val state = tmpDir("extrema")
    foldBatch(state, Seq(("a", 5L, -1L), ("a", 9L, 1L)), 0L)
    assert(served(state) === Map("a" -> (1L, 9L, 9L)))
    // the negative row is in state, not in the served view
    val rel = IncrementalExtrema.relation(spark, state)
      .as[(String, Long, Long)].collect().toSet
    assert(rel === Set(("a", 5L, -1L), ("a", 9L, 1L)))
    foldBatch(state, Seq(("a", 5L, 1L)), 1L) // late insert cancels to zero
    assert(IncrementalExtrema.relation(spark, state)
      .as[(String, Long, Long)].collect().toSet === Set(("a", 9L, 1L)))
  }

  test("zero-weight rows purge at merge; emptied groups disappear") {
    val state = tmpDir("extrema")
    foldBatch(state, Seq(("a", 1L, 1L), ("b", 2L, 1L)), 0L)
    foldBatch(state, Seq(("b", 2L, -1L)), 1L)
    assert(served(state) === Map("a" -> (1L, 1L, 1L)))
    assert(IncrementalExtrema.relation(spark, state)
      .filter("g = 'b'").count() === 0L)
  }

  test("replay of a stamped batch is a no-op") {
    val state = tmpDir("extrema")
    foldBatch(state, Seq(("a", 4L, 1L)), 0L)
    foldBatch(state, Seq(("a", 4L, 1L)), 0L) // same batch id: buckets stamped, skip
    assert(served(state) === Map("a" -> (1L, 4L, 4L)))
  }

  test("orders-as-CDC fold serves the x119 batch twin exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val state = tmpDir("extrema-x119")
    val o = graft.Tables.orders(spark, dir)
      .select(org.apache.spark.sql.functions.col("o_custkey"),
        graft.functions.cents(org.apache.spark.sql.functions.col("o_totalprice")).as("v"))
      .join(org.apache.spark.sql.functions.broadcast(
          graft.Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select(org.apache.spark.sql.functions.col("c_mktsegment").as("g"),
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.lit(1L).as("w"))
    // arrive in 3 slices on the value — order must not matter
    val slices = Seq(o.filter("v % 3 = 0"), o.filter("v % 3 = 1"), o.filter("v % 3 = 2"))
    slices.zipWithIndex.foreach { case (s, i) =>
      IncrementalExtrema.processBatch(s, state, i.toLong, numBuckets = 4)
    }
    val twin = graft.queries.ExtQueries.x119SegmentOrderStats(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val v = served(state)
    val med = IncrementalExtrema.quantiles(spark, state, Seq((1L, 2L)))
      .as[(String, Long)].collect().toMap
    val got = v.map { case (g, (n, mn, mx)) => g -> (mn, mx, n, med(g)) }
    assert(got === twin)
  }

  test("bucket-pruned point read equals the full view for the named groups") {
    val state = tmpDir("extrema")
    val batch = (0 until 100).map(i => (s"g${i % 10}", i.toLong, 1L))
    foldBatch(state, batch, 0L)
    val full = served(state)
    val pruned = IncrementalExtrema.viewFor(spark, state, Seq("g3", "g7"),
        numBuckets = 4)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(pruned === Map("g3" -> full("g3"), "g7" -> full("g7")))
  }

  test("R173 sub-buckets: a planted giant group's per-bucket rows drop ~S×; reads unchanged-exact") {
    val plain = tmpDir("extrema-plain"); val sub = tmpDir("extrema-sub")
    val B = 16; val S = 8
    // one dominant group (20k distinct values) beside small ones — the
    // LEFT-null-group / dominant-segment shape
    val giant = (0 until 20000).map(i => ("giant", i.toLong, 1L))
    val small = (0 until 30).map(i => (s"s${i % 3}", i.toLong, 1L))
    def foldInto(state: String, s: Int, batch: Seq[(String, Long, Long)],
        id: Long): Unit =
      IncrementalExtrema.processBatch(batch.toDF("g", "v", "w"), state, id,
        numBuckets = B, subBuckets = s)
    foldInto(plain, 1, giant ++ small, 0L)
    foldInto(sub, S, giant ++ small, 0L)
    // a second signed batch: delete the giant's max + add new values —
    // the fold re-routes by the same derived coordinate
    val b1 = Seq(("giant", 19999L, -1L), ("giant", 50000L, 1L),
      ("s0", 999L, 1L))
    foldInto(plain, 1, b1, 1L)
    foldInto(sub, S, b1, 1L)
    // per-bucket bound: the giant group concentrates in ONE bucket under
    // the plain layout; sub-bucketing spreads it over S buckets
    def giantPerBucket(state: String): Seq[Long] = {
      val base = new java.io.File(s"$state/extrema")
      base.listFiles().filter(_.getName.matches("bucket=\\d+")).toSeq
        .map(d => spark.read.parquet(d.toString)
          .filter(col("g") === "giant").count())
        .filter(_ > 0)
    }
    val plainCounts = giantPerBucket(plain)
    val subCounts = giantPerBucket(sub)
    assert(plainCounts.size === 1 && plainCounts.head === 20000L,
      s"plain layout concentrates the group: $plainCounts")
    // expectation-level spread: up to S buckets, minus hash collisions
    // of the S sub-keys in the B space (documented contract)
    assert(subCounts.size >= S / 2,
      s"sub layout spreads over ~S buckets: $subCounts")
    assert(subCounts.max <= plainCounts.head / 3,
      s"per-bucket bound must drop: max ${subCounts.max} vs ${plainCounts.head}")
    assert(subCounts.sum === 20000L, "no rows lost or duplicated")
    // reads unchanged-exact: view, point read, quantiles, topN
    assert(served(sub) === served(plain))
    val pointSub = IncrementalExtrema.viewFor(spark, sub, Seq("giant", "s0"),
        numBuckets = B, subBuckets = S)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(pointSub === Map("giant" -> served(plain)("giant"),
      "s0" -> served(plain)("s0")))
    assert(pointSub("giant") === ((20000L, 0L, 50000L)),
      "delete-the-max fell back exactly through the sub-bucketed merge")
    val qSub = IncrementalExtrema.quantiles(spark, sub, Seq((1L, 2L), (9L, 10L)))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val qPlain = IncrementalExtrema.quantiles(spark, plain, Seq((1L, 2L), (9L, 10L)))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(qSub === qPlain)
    // replay of a stamped batch is still a no-op under the sub layout
    foldInto(sub, S, b1, 1L)
    assert(served(sub) === served(plain))
  }
}
