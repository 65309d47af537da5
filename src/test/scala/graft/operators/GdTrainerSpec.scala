package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact-int GD trainer + categorical-association specs. */
class GdTrainerSpec extends SparkTestBase {
  import spark.implicits._

  test("fitLinear replays the integer recurrence exactly on a hand dataset") {
    // y = 3x in cents-like units; the recurrence is simulated in plain
    // Scala with the same truncating arithmetic
    val rows = (1L to 8L).map(x => (x, 3L * x))
    val df = rows.toDF("x", "y")
    var (w1, w0) = (0L, 0L)
    val n = rows.size.toLong
    for (_ <- 1 to 3) {
      val resid = rows.map { case (x, y) => (w1 * x + w0) / 1000000L - y }
      val g1 = resid.zip(rows).map { case (r, (x, _)) => r * x }.sum
      val g0 = resid.sum
      w1 -= (g1 * 1000L) / n
      w0 -= (g0 * 1000L) / n
    }
    val out = GdTrainer.fitLinear(df, col("x"), col("y"), iters = 3)
      .select("w1_e6", "w0_e6").as[(Long, Long)].head()
    assert(out == ((w1, w0)))
  }

  test("fitLinear approaches the true slope on a noiseless line") {
    // y = 2_000_000-scaled: slope w1_e6 should head toward 2e6 within
    // the iteration budget (monotone progress from 0, no overshoot at
    // this eta)
    val df = (1L to 50L).map(x => (x, 2L * x)).toDF("x", "y")
    val w1 = GdTrainer.fitLinear(df, col("x"), col("y"), iters = 60)
      .select("w1_e6").as[Long].head()
    assert(w1 > 1500000L && w1 <= 2100000L, s"w1_e6=$w1")
  }

  test("contingency margins and chi2 ingredients are exact on a 2x2 table") {
    // cells: (a1,b1)=30 (a1,b2)=10 (a2,b1)=10 (a2,b2)=30 -> N=80
    val rows =
      Seq.fill(30)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
        Seq.fill(10)(("a2", "b1")) ++ Seq.fill(30)(("a2", "b2"))
    val cells = Profiling.contingency(rows.toDF("u", "v"), "u", "v")
    val m = cells.select("a", "b", "o", "r", "c", "n", "t_e6")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(m(("a1", "b1"))._3 == 30 && m(("a1", "b1"))._4 == 40 &&
      m(("a1", "b1"))._5 == 40 && m(("a1", "b1"))._6 == 80)
    // t_e6 for o=30, r=c=40: 10^6*900/1600 = 562500
    assert(m(("a1", "b1"))._7 == 562500L)
    assert(m(("a1", "b2"))._7 == 62500L) // 10^6*100/1600

    val v = Profiling.cramersV(cells)
      .select("n", "chi2_over_n_e6", "v2_e6", "v_e3")
      .as[(Long, Long, Long, Long)].head()
    // sum t = 2*562500 + 2*62500 = 1250000; chi2/N = 0.25; V = 0.5
    assert(v == ((80L, 250000L, 250000L, 500L)))
  }

  test("corrMatrix: one-pass pair reads match the known correlations") {
    // y = 2x (corr 1), z = -x (corr -1 with x, -1 with... z vs y also -1)
    val df = (1L to 10L).map(x => (x, 2 * x, -x)).toDF("x", "y", "z")
    val r = Profiling.corrMatrix(df,
        Seq(("x", col("x")), ("y", col("y")), ("z", col("z"))))
      .select("col_a", "col_b", "corr4")
      .as[(String, String, Option[Double])].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r(("x", "y")) == Some(1.0))
    assert(r(("x", "z")) == Some(-1.0))
    assert(r(("y", "z")) == Some(-1.0))
  }

  test("corrMatrix NULLs a pair with a zero-variance side") {
    val df = (1L to 5L).map(x => (x, 7L)).toDF("x", "y")
    val r = Profiling.corrMatrix(df, Seq(("x", col("x")), ("y", col("y"))))
      .select("corr4").as[Option[Double]].head()
    assert(r.isEmpty)
  }

  test("theilsU: functional dependence scores 1e6, degenerate H(a)=0 NULLs U") {
    // a fully determined by b: H(a|b) = 0 -> U = 1.0
    val dep = (Seq.fill(4)(("a1", "b1")) ++ Seq.fill(4)(("a2", "b2"))).toDF("u", "v")
    val r = Profiling.theilsU(dep, "u", "v")
      .select("n", "hx_bits", "hxy_bits", "u_e6")
      .as[(Long, Long, Long, Option[Long])].head()
    assert(r == ((8L, 8L, 0L, Some(1000000L))))

    val degen = Seq.fill(6)(("a1", "b1")).toDF("u", "v")
    val u = Profiling.theilsU(degen, "u", "v").select("u_e6").as[Option[Long]].head()
    assert(u.isEmpty)
  }

  test("cramersV NULLs V on a single-category dimension instead of throwing") {
    val rows = Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a1", "b2"))
    val v = Profiling.cramersV(Profiling.contingency(rows.toDF("u", "v"), "u", "v"))
      .select("v2_e6").as[Option[Long]].head()
    assert(v.isEmpty)
  }
}
