package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables

/** Accuracy floors for the two sketch queries that CANNOT be
  * oracle-hashed (HLL and t-digest values are engine-specific): pin each
  * approximation against its exact counterpart so a silent regression to
  * garbage (wrong column, broken rsd, swapped percentiles) fails here
  * even though the driver's check is rows-only. */
class SketchAccuracySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("x8: approx_count_distinct within 10% of exact per event_type") {
    val cmp = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getAs[String]("event_type")}: approx $approx vs exact $exact")
    }
  }

  test("x16: KMV distinct within 3 standard errors of exact per event_type") {
    val k = 64
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("exact"))
    val kmv = graft.operators.Sketches.kmvDistinct(
      Tables.events(spark, dir), Seq("event_type"), "user_id", k)
    val cmp = kmv.join(exact, "event_type").collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      val e = r.getAs[Long]("exact").toDouble
      val a = r.getAs[Double]("approx_distinct")
      // KMV std error ≈ 1/√(k−2); 3σ bound, exact when the group is small
      val tol = if (e < k) 0.0 else 3.0 * e / math.sqrt(k - 2.0)
      assert(math.abs(a - e) <= math.max(tol, 0.001),
        s"${r.getAs[String]("event_type")}: kmv $a vs exact $e (tol $tol)")
    }
  }

  test("kmv set algebra: exact under k; estimator within 3σ on planted overlap") {
    import spark.implicits._
    // planted: A = 0..999, B = 500..1499 -> |A∩B| = 500, |A∪B| = 1500,
    // jaccard = 1/3. Also a small pair fully visible at k (exact path).
    val big = ((0L until 1000L).map(("A", _)) ++ (500L until 1500L).map(("B", _)) ++
      (0L until 20L).map(("C", _)) ++ (10L until 30L).map(("D", _)))
      .toDF("g", "v")
    val pairs = Seq(("A", "B"), ("C", "D")).toDF("g1", "g2")
    val r = graft.operators.Sketches.kmvSetAlgebra(big, "g", "v", pairs, k = 64)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap

    val cd = r(("C", "D")) // union 30 < k: everything exact
    assert(cd.getAs[Long]("jaccard_ppm") === 10L * 1000000L / 30L)
    assert(cd.getAs[Double]("union_est") === 30.0)
    assert(cd.getAs[Double]("inter_est") === 10.0)

    val ab = r(("A", "B")) // estimator path: 3σ bounds, σ ≈ 1/√(k−2)
    val se = 1.0 / math.sqrt(62.0)
    assert(math.abs(ab.getAs[Double]("union_est") - 1500.0) / 1500.0 <= 3 * se)
    assert(math.abs(ab.getAs[Double]("inter_est") - 500.0) / 500.0 <= 6 * se)
    val j = ab.getAs[Long]("jaccard_ppm").toDouble / 1e6
    assert(math.abs(j - 1.0 / 3.0) <= 3 * se)
  }

  test("x15: IVF cell stats partition the whole corpus") {
    val emb = Tables.embeddings(spark, dir)
    val stats = graft.operators.Similarity.cellStats(emb).collect()
    assert(stats.map(_.getAs[Long]("vecs")).sum === emb.count())
    // every cell id must come from the codebook's range
    val ids = stats.map(_.getAs[Int]("bucket"))
    assert(ids.distinct.length === ids.length)
    assert(ids.forall(b => b >= 0 && b < graft.operators.IvfCodebook.centers.size))
  }

  test("x10: approx_percentile within the exact p25-p75 band and ordered") {
    val cmp = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        percentile(col("value"), lit(0.5)).as("p50_exact"),
        approx_percentile(col("value"), lit(0.5), lit(1000)).as("p50_approx"),
        percentile(col("value"), lit(0.95)).as("p95_exact"),
        approx_percentile(col("value"), lit(0.95), lit(1000)).as("p95_approx"),
        min("value").as("lo"), max("value").as("hi"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      val spread = r.getAs[Double]("hi") - r.getAs[Double]("lo")
      assert(math.abs(r.getAs[Double]("p50_approx") - r.getAs[Double]("p50_exact")) <= 0.05 * spread)
      assert(math.abs(r.getAs[Double]("p95_approx") - r.getAs[Double]("p95_exact")) <= 0.05 * spread)
      assert(r.getAs[Double]("p50_approx") <= r.getAs[Double]("p95_approx"))
    }
  }

  test("heavy hitters (Misra-Gries): deterministic guarantees vs exact token counts") {
    import spark.implicits._
    val k = 64
    val toks = Tables.documents(spark, dir)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
    val n = toks.count()
    val exact = toks.groupBy("t").count().as[(String, Long)].collect().toMap
    // force multiple partitions so the MERGEABLE combine rule actually runs
    val sk = toks.repartition(8)
      .agg(graft.functions.heavyHitters(col("t"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
    assert(sk.nonEmpty && sk.size <= k)
    val slack = n / (k + 1)
    // guarantee 1: every item above n/(k+1) is PRESENT
    exact.foreach { case (t, c) =>
      if (c > slack) assert(sk.contains(t), s"frequent '$t' ($c > $slack) missing")
    }
    // guarantee 2: two-sided estimate bound, est ≤ true ≤ est + n/(k+1)
    sk.foreach { case (t, est) =>
      val true_ = exact.getOrElse(t, 0L)
      assert(est <= true_, s"'$t' overestimated: $est > $true_")
      assert(true_ - est <= slack, s"'$t' underestimated past the bound")
    }
  }

  test("weighted heavy hitters: MG guarantees vs exact WEIGHTED counts on an adversarial vocab") {
    import spark.implicits._
    val k = 4 // far under the vocabulary so evictions actually fire
    // 40 distinct light items (weight 1-3) + 3 heavy items
    val rows = (1 to 40).map(i => (s"light$i", (i % 3 + 1).toLong)) ++
      Seq(("heavyA", 500L), ("heavyB", 300L), ("heavyA", 250L), ("heavyC", 120L))
    val df = rows.toDF("t", "w")
    val totalW = rows.map(_._2).sum
    val exact = rows.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val sk = df.repartition(8)
      .agg(graft.functions.heavyHittersWeighted(col("t"), col("w"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
    assert(sk.nonEmpty && sk.size <= k)
    val slack = totalW / (k + 1)
    exact.foreach { case (t, w) =>
      if (w > slack) assert(sk.contains(t), s"heavy '$t' ($w > $slack) missing")
    }
    sk.foreach { case (t, est) =>
      val true_ = exact.getOrElse(t, 0L)
      assert(est <= true_, s"'$t' overestimated: $est > $true_")
      assert(true_ - est <= slack, s"'$t' underestimated past the bound")
    }
  }
}
