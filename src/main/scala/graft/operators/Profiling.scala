package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling (engine utility): per-column row/null/
  * exact-distinct counts and min/max, computed in ONE aggregation pass
  * over the table (all columns' aggregates in a single `agg`; Spark plans
  * the multi-distinct via Expand) and unpivoted to a row per column.
  * min/max are rendered as strings AFTER native-type aggregation, so
  * numeric columns profile numerically and the output schema stays
  * uniform.
  *
  * At 100 TB: exact distincts make this a heavy statement by design (the
  * cheap daily variant swaps `countDistinct` for `approx_count_distinct`
  * — x8's HLL — with no shape change); everything else is partial+final
  * aggregation with O(columns) state.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Per-group covariance/correlation — the reference engine family's
    * `covarPop`/`corr` surface, structured the engine's way: the ARTIFACT
    * is the five raw moment sums (n, Σx, Σy, Σxy, Σx², Σy²) over
    * caller-gridded INTEGER columns — exact int64, purely ADDITIVE
    * (partial-mergeable, incrementally maintainable under the plain SUM
    * upsert, the same economics as every summary here); the correlation
    * is a READ over those sums in one fixed IEEE expression (the n·Σ
    * cross-products overflow int64 at ~10⁶ rows/group, so exactness ends
    * at the sums — the honest boundary, documented rather than papered
    * over), rounded with pround4 for oracle parity.
    *
    * Caller grids x/y (e.g. cents DIV 100) so Σx² stays inside int64 at
    * the target group size: the bound is n·max(x²) < 2⁶³. */
  def corrMoments(df: DataFrame, groupCol: String,
      x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): DataFrame = {
    import graft.functions.pround4
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val m = df.select(col(groupCol).as("g"), x.as("x"), y.as("y"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val varx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val vary = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    // zero variance -> corr undefined -> NULL (ANSI would throw on the
    // division; NULL is also the cleaner caller contract)
    m.withColumn("corr4", when(varx > 0 && vary > 0, pround4(
      (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
        (sqrt(varx) * sqrt(vary)))))
  }

  /** `boundingRatio` — the engine family's bounding-box slope: per
    * group, `(max(y) − min(y)) / (max(x) − min(x))` over integer-gridded
    * columns. The artifact is the four int64 extrema (mergeable under
    * min/max upsert); the ratio is one fixed-IEEE read with pround4,
    * NULL when the x-extent is zero. */
  def boundingRatio(df: DataFrame, groupCol: String,
      x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): DataFrame = {
    import graft.functions.pround4
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    df.select(col(groupCol).as("g"), x.as("x"), y.as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .withColumn("ratio4", when(col("max_x") > col("min_x"), pround4(
        d(col("max_y") - col("min_y")) / d(col("max_x") - col("min_x")))))
  }

  /** `mannWhitneyUTest` — the rank-sum test STATISTIC, exact. All rank
    * arithmetic stays integer by working with DOUBLED tie-averaged
    * ranks: for a row of value v, `2·avgrank = 2·rank(v) + cnt_eq(v) − 1`
    * (rank() = 1 + #smaller; a tie group of size m starting at rank r
    * averages r + (m−1)/2). Then `U2_A = Σ_A 2·avgrank − n_A(n_A+1)`
    * (the doubled U) and `U2_B = 2·n_A·n_B − U2_A` by the rank-sum
    * identity — every figure int64, fully oracle-replayable; the p-value
    * is a caller-side normal lookup, deliberately NOT computed here
    * (erfc is not reproducible across engines).
    *
    * Shape: one shuffle on the group for the two rank windows, one
    * aggregation — O(rows). Rows not in either sample are excluded
    * BEFORE ranking (they must not shift ranks). */
  def mannWhitneyU(df: DataFrame, groupCol: String, valueCol: String,
      sampleCol: String, aLabel: String, bLabel: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val in = df
      .filter(col(sampleCol).isin(aLabel, bLabel) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(sampleCol).as("s"),
        col(valueCol).as("v"))
    val ranked = in
      .withColumn("rk", rank().over(Window.partitionBy("g").orderBy("v")))
      .withColumn("ceq", count(lit(1)).over(Window.partitionBy("g", "v")))
      .withColumn("r2", lit(2L) * col("rk") + col("ceq") - lit(1L))
    ranked.groupBy("g")
      .agg(
        sum(when(col("s") === aLabel, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("s") === bLabel, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("s") === aLabel, col("r2")).otherwise(0L)).as("r2_a"))
      .withColumn("u2_a", col("r2_a") - col("n_a") * (col("n_a") + 1L))
      .withColumn("u2_b", lit(2L) * col("n_a") * col("n_b") - col("u2_a"))
      .drop("r2_a")
  }

  /** `arrayAUC` — ROC-AUC as a READ over [[mannWhitneyU]]'s doubled-rank
    * artifact: AUC = U_pos / (n_pos·n_neg) exactly (ties contribute ½ via
    * the tie-averaged ranks), so `auc4 = u2_a / (2·n_a·n_b)` in one
    * guarded IEEE division — the probabilistic interpretation of the
    * rank-sum statistic, zero new machinery. NULL when either class is
    * empty. */
  def rocAuc(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String, posLabel: String, negLabel: String): DataFrame = {
    import graft.functions.pround4
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    mannWhitneyU(df, groupCol, scoreCol, labelCol, posLabel, negLabel)
      .withColumn("auc4", when(col("n_a") > 0L && col("n_b") > 0L,
        pround4(d(col("u2_a")) / d(lit(2L) * col("n_a") * col("n_b")))))
  }

  /** `kolmogorovSmirnovTest` — the KS STATISTIC, exact as a rational:
    * over discrete observations the supremum of |F_a − F_b| is attained
    * at an observed point, so
    * `D = max |cum_a·n_b − cum_b·n_a| / (n_a·n_b)` with every term int64
    * (numerator and denominator returned alongside the pround4 read —
    * the exact figure survives the oracle, the rounded one is for
    * humans). One distinct-value aggregation + one window cumsum, state
    * O(distinct values). p-values caller-side (same contract as
    * [[mannWhitneyU]]). */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
      sampleCol: String, aLabel: String, bLabel: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.pround4
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val h = df
      .filter(col(sampleCol).isin(aLabel, bLabel) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(sampleCol).as("s"),
        col(valueCol).as("v"))
      .groupBy("g", "v")
      .agg(sum(when(col("s") === aLabel, 1L).otherwise(0L)).as("ca"),
        sum(when(col("s") === bLabel, 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy("g").orderBy("v")
    val t = h.groupBy("g").agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    h.withColumn("cum_a", sum("ca").over(w))
      .withColumn("cum_b", sum("cb").over(w))
      .join(broadcast(t), "g")
      .withColumn("dev",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
      .groupBy("g")
      .agg(min("n_a").as("n_a"), min("n_b").as("n_b"),
        max("dev").as("d_num"))
      .withColumn("d_den", col("n_a") * col("n_b"))
      .withColumn("d4", when(col("d_den") > 0,
        pround4(d(col("d_num")) / d(col("d_den")))))
  }

  /** Two-proportion z STATISTIC — conversion-rate comparison in the
    * moment architecture: artifact = four int64 counts (trials and
    * successes per sample), read = the pooled z in one guarded
    * fixed-IEEE expression (pool computed once, every division under
    * its guard — the ANSI x/0 rule). */
  def proportionZ(df: DataFrame, groupCol: String, sampleCol: String,
      aLabel: String, bLabel: String,
      success: org.apache.spark.sql.Column): DataFrame = {
    import graft.functions.pround4
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val m = df.filter(col(sampleCol).isin(aLabel, bLabel))
      .select(col(groupCol).as("g"), col(sampleCol).as("s"),
        when(success, 1L).otherwise(0L).as("ok"))
      .groupBy("g")
      .agg(
        sum(when(col("s") === aLabel, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("s") === aLabel, col("ok")).otherwise(0L)).as("x_a"),
        sum(when(col("s") === bLabel, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("s") === bLabel, col("ok")).otherwise(0L)).as("x_b"))
    m.withColumn("p1", when(col("n_a") > 0L, d(col("x_a")) / d(col("n_a"))))
      .withColumn("p2", when(col("n_b") > 0L, d(col("x_b")) / d(col("n_b"))))
      .withColumn("pp", when(col("n_a") + col("n_b") > 0L,
        d(col("x_a") + col("x_b")) / d(col("n_a") + col("n_b"))))
      .withColumn("se2", when(col("n_a") > 0L && col("n_b") > 0L,
        col("pp") * (lit(1.0) - col("pp")) *
          (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b")))))
      .withColumn("z4", when(col("n_a") > 0L && col("n_b") > 0L &&
        col("se2") > 0, pround4((col("p1") - col("p2")) / sqrt(col("se2")))))
      .drop("p1", "p2", "pp", "se2")
  }

  /** Spearman rank correlation — rank both columns with the SAME doubled
    * tie-averaged ranks as [[mannWhitneyU]] (integers, so the rank
    * transform is exact and engine-identical), then reuse the
    * [[corrMoments]] artifact+read verbatim: corr is scale-invariant, so
    * doubling ranks changes nothing mathematically, and BOTH engines run
    * the identical integer sums and the identical fixed-IEEE read.
    * Overflow bound: Σ(2n)² per group ⇒ n³ ≲ 2⁶¹ — ~10⁶ rows/group;
    * beyond that, pre-bucket values into a coarser grid first. */
  def spearmanCorr(df: DataFrame, groupCol: String,
      x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val in = df.select(col(groupCol).as("g"), x.as("xv"), y.as("yv"))
      .filter(col("xv").isNotNull && col("yv").isNotNull)
    def r2(c: String) =
      lit(2L) * rank().over(Window.partitionBy("g").orderBy(c)) +
        count(lit(1)).over(Window.partitionBy("g", c)) - lit(1L)
    val ranked = in.withColumn("rx", r2("xv")).withColumn("ry", r2("yv"))
    corrMoments(ranked, "g", col("rx"), col("ry"))
      .withColumnRenamed("corr4", "rho4")
  }

  /** `studentTTest` / `welchTTest` — the two-sample location-test
    * STATISTICS in the moment-artifact architecture: state = six int64
    * conditional sums (n, Σx, Σx² per sample — SUM-upsert-maintainable),
    * reads = the pooled-variance (Student) and unpooled (Welch) t in one
    * fixed-IEEE expression each: means computed once, the corrected sums
    * `q = Σx² − Σx·mean` chained through both reads, pround4 at the
    * boundary. p-values are caller-side by the same contract as
    * [[mannWhitneyU]] (no cross-engine erfc). Guards: each sample needs
    * n ≥ 2 and a positive variance term, else NULL. */
  def tTestMoments(df: DataFrame, groupCol: String, valueCol: String,
      sampleCol: String, aLabel: String, bLabel: String): DataFrame = {
    import graft.functions.pround4
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val m = df
      .filter(col(sampleCol).isin(aLabel, bLabel) && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(sampleCol).as("s"),
        col(valueCol).as("v"))
      .groupBy("g")
      .agg(
        sum(when(col("s") === aLabel, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("s") === aLabel, col("v")).otherwise(0L)).as("s1_a"),
        sum(when(col("s") === aLabel, col("v") * col("v")).otherwise(0L)).as("s2_a"),
        sum(when(col("s") === bLabel, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("s") === bLabel, col("v")).otherwise(0L)).as("s1_b"),
        sum(when(col("s") === bLabel, col("v") * col("v")).otherwise(0L)).as("s2_b"))
    // every division sits under a guard: ANSI-on Spark throws on x/0
    // even for doubles, so degenerate samples must SKIP the division,
    // not clean up after it; the guards are mirrored verbatim in SQL
    m.withColumn("ma", when(col("n_a") > 0L, d(col("s1_a")) / d(col("n_a"))))
      .withColumn("mb", when(col("n_b") > 0L, d(col("s1_b")) / d(col("n_b"))))
      .withColumn("qa", d(col("s2_a")) - d(col("s1_a")) * col("ma"))
      .withColumn("qb", d(col("s2_b")) - d(col("s1_b")) * col("mb"))
      .withColumn("sp2", when(col("n_a") + col("n_b") > 2L,
        (col("qa") + col("qb")) / d(col("n_a") + col("n_b") - 2L)))
      .withColumn("t_student4",
        when(col("n_a") > 1L && col("n_b") > 1L && col("sp2") > 0, pround4(
          (col("ma") - col("mb")) /
            sqrt(col("sp2") * (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b")))))))
      .withColumn("vna",
        when(col("n_a") > 1L, col("qa") / d(col("n_a") - 1L) / d(col("n_a"))))
      .withColumn("vnb",
        when(col("n_b") > 1L, col("qb") / d(col("n_b") - 1L) / d(col("n_b"))))
      .withColumn("t_welch4", when(col("vna") + col("vnb") > 0,
        pround4((col("ma") - col("mb")) / sqrt(col("vna") + col("vnb")))))
      .drop("ma", "mb", "qa", "qb", "sp2", "vna", "vnb")
  }

  /** `simpleLinearRegression` — slope/intercept READS over the SAME
    * artifact [[corrMoments]] maintains (n, Σx, Σy, Σxy, Σx²): the
    * moments are the state, every regression statistic is a cheap read —
    * `slope = (n·Σxy − Σx·Σy)/(n·Σx² − Σx²)`, `intercept =
    * (Σy − slope·Σx)/n`, each ONE fixed IEEE expression with the raw
    * (unrounded) slope feeding the intercept so both engines chain the
    * identical doubles; pround4 only at the output boundary. Zero x
    * variance → NULL by contract (vertical line). */
  def linRegRead(moments: DataFrame): DataFrame = {
    import graft.functions.pround4
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    moments
      .withColumn("varx",
        d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
      .withColumn("slope_raw", when(col("varx") > 0,
        (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / col("varx")))
      .withColumn("slope4", pround4(col("slope_raw")))
      .withColumn("icept4",
        pround4((d(col("sy")) - col("slope_raw") * d(col("sx"))) / d(col("n"))))
      .drop("varx", "slope_raw")
  }

  /** Higher central moments — the engine family's `skewPop`/`kurtPop`,
    * structured exactly like [[corrMoments]]: the ARTIFACT is the five
    * additive int64 raw power sums (n, Σx, Σx², Σx³, Σx⁴) over a
    * caller-gridded INTEGER column — partial-mergeable and incrementally
    * maintainable under the plain SUM upsert; skewness and kurtosis are
    * READS in one fixed IEEE expression each. Parity discipline: the
    * mean is computed ONCE and reused (both engines see the identical
    * double), every product associates left-to-right, and `m2^1.5` is
    * spelled `m2·sqrt(m2)` — sqrt is correctly-rounded IEEE-754 in both
    * engines while `pow(x, 1.5)` carries no such guarantee; pround4 for
    * the boundary-digit round. Zero variance → NULL reads by contract.
    *
    * Grid bound: n·max(x⁴) < 2⁶³ — e.g. a ≤10³ dollars grid holds to
    * ~9·10⁶ rows/group; re-grid coarser for bigger groups. */
  def momentStats(df: DataFrame, groupCol: String,
      x: org.apache.spark.sql.Column): DataFrame =
    momentReads(momentSums(df, groupCol, x))

  /** The ARTIFACT half of [[momentStats]]: the five additive int64 power
    * sums per group — every measure a plain SUM, so the state maintains
    * incrementally under [[graft.streaming.MvPipeline.upsert]]
    * ([[graft.streaming.IncrementalMoments]]). */
  def momentSums(df: DataFrame, groupCol: String,
      x: org.apache.spark.sql.Column): DataFrame =
    df.select(col(groupCol).as("g"), x.as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))

  /** The READ half of [[momentStats]] — runs identically over the batch
    * sums or the incrementally maintained state. */
  def momentReads(m: DataFrame): DataFrame = {
    import graft.functions.pround4
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    m.withColumn("mean", d(col("s1")) / d(col("n")))
      .withColumn("m2",
        d(col("s2")) / d(col("n")) - col("mean") * col("mean"))
      .withColumn("m3",
        d(col("s3")) / d(col("n")) -
          lit(3.0) * col("mean") * (d(col("s2")) / d(col("n"))) +
          lit(2.0) * col("mean") * col("mean") * col("mean"))
      .withColumn("m4",
        d(col("s4")) / d(col("n")) -
          lit(4.0) * col("mean") * (d(col("s3")) / d(col("n"))) +
          lit(6.0) * col("mean") * col("mean") * (d(col("s2")) / d(col("n"))) -
          lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
      .withColumn("skew4",
        when(col("m2") > 0, pround4(col("m3") / (col("m2") * sqrt(col("m2"))))))
      .withColumn("kurt4",
        when(col("m2") > 0, pround4(col("m4") / (col("m2") * col("m2")))))
      .drop("mean", "m2", "m3", "m4")
  }

  /** `contingency` cells — the shared artifact under the categorical-
    * association family (`cramersV`/`contingency` in the reference engine
    * family): per (a, b) cell the observed count plus row/column/grand
    * margins, and the cell's e6-scaled χ² ingredient `t_e6 =
    * ⌊10⁶·o²/(r·c)⌋` (via the Σo²/(r·c) identity, `χ² = N·(Σt − 1)` —
    * no (o−e)² subtraction, so every figure stays a nonneg int64). The
    * two-step split `(o² DIV rc)·10⁶ + ((o² % rc)·10⁶) DIV rc` keeps the
    * scaling inside int64 for N up to ~10⁹ rows.
    *
    * Shape: one hash aggregation to cells, then margins as windows OVER
    * THE CELLS frame — k_a·k_b rows (tiny by construction: association
    * tests are for low-cardinality dims), so the unpartitioned total
    * window is a deliberate single-partition pass over a frame that
    * fits anywhere. */
  def contingency(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
      .withColumn("r", sum("o").over(Window.partitionBy("a")))
      .withColumn("c", sum("o").over(Window.partitionBy("b")))
      .withColumn("n", sum("o").over(Window.partitionBy()))
      .withColumn("t_e6",
        expr("(o*o DIV (r*c))*1000000 + ((o*o % (r*c))*1000000) DIV (r*c)"))
  }

  /** `cramersV` — the one-row READ over [[contingency]] cells: χ²/N from
    * Σt_e6 (floored cells can dip a hair under 10⁶ at independence, so
    * the χ² figure is clamped at 0), V² by integer division with the
    * degenerate 1-category case NULLed (ANSI would throw), and `v_e3 =
    * ⌊√(10⁶·V²)⌋` — sqrt is correctly rounded in both engines, the one
    * float op that replays. */
  def cramersV(cells: DataFrame): DataFrame =
    cells.agg(
        max("n").as("n"), count(lit(1)).as("n_cells"),
        countDistinct(col("a")).as("ka"), countDistinct(col("b")).as("kb"),
        sum("t_e6").as("st"))
      .withColumn("chi2_over_n_e6", greatest(col("st") - lit(1000000L), lit(0L)))
      .withColumn("chi2_e6", col("n") * col("chi2_over_n_e6"))
      .withColumn("v2_e6", expr(
        "CASE WHEN least(ka-1, kb-1) > 0 THEN chi2_over_n_e6 DIV least(ka-1, kb-1) END"))
      .withColumn("v_e3", floor(sqrt(col("v2_e6").cast("double"))).cast("long"))
      .select("n", "n_cells", "chi2_over_n_e6", "chi2_e6", "v2_e6", "v_e3")

  /** `corrMatrix` — every pairwise correlation of k integer-gridded
    * columns in ONE aggregation pass (the reference engine family's
    * matrix combinator): the single wide row carries n, per-column
    * Σx/Σx², and Σxy per pair — k(k+3)/2 + 1 additive int64 measures,
    * all partial-mergeable — then explodes to one row per (i < j) pair
    * with the [[corrMoments]] fixed-IEEE read applied verbatim. k
    * passes of a per-pair operator would rescan the fact table
    * k(k−1)/2 times; this scans once and shuffles one row.
    *
    * Caller grids columns (cents/DIV) exactly as for corrMoments; the
    * int64 exactness boundary (n·max(x²) < 2⁶³) applies per pair. */
  def corrMatrix(df: DataFrame, cols: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    import graft.functions.pround4
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val proj = df.select(cols.map { case (n, c) => c.as(n) }: _*)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i)._1, cols(j)._1)
    val aggs =
      cols.map { case (n, _) => sum(col(n)).as(s"s_$n") } ++
        cols.map { case (n, _) => sum(col(n) * col(n)).as(s"ss_$n") } ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") }
    val allAggs = count(lit(1)).as("n") +: aggs
    val wide = proj.agg(allAggs.head, allAggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"s_$a").as("sx"), col(s"s_$b").as("sy"),
        col(s"ss_$a").as("sxx"), col(s"ss_$b").as("syy"),
        col(s"sp_${a}_$b").as("sxy"))
    }
    val varx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val vary = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    wide.select(col("n"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"), col("n"),
        col("p.sx").as("sx"), col("p.sy").as("sy"), col("p.sxy").as("sxy"),
        col("p.sxx").as("sxx"), col("p.syy").as("syy"))
      .withColumn("corr4", when(varx > 0 && vary > 0, pround4(
        (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(varx) * sqrt(vary)))))
  }

  /** `theilsU` — the DIRECTED member of the categorical-association
    * family (with [[cramersV]]): U(a|b) = (H(a) − H(a|b)) / H(a), every
    * entropy taken on [[categoricalEntropy]]'s floor-log₂ grid so the
    * whole statistic is a ratio of int64 bit-counts:
    * `hx = N·bits(N) − Σ_a n_a·bits(n_a)` and
    * `hxy = Σ_ab n_ab·(bits(n_b) − bits(n_ab))` (the N-scaled
    * conditional entropy). On the floor grid the mutual information
    * `hx − hxy` can dip below 0 at independence (each sum floors
    * independently), so it is clamped — exactly like cramersV's χ².
    * Degenerate H(a) = 0 (single category) NULLs U.
    *
    * Shape: one hash agg to cells, two tiny aggregates (per-a totals,
    * cell sum), one 1-row combine — association dims are
    * low-cardinality by construction. */
  def theilsU(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
      .withColumn("nb", sum("o").over(Window.partitionBy("b")))
    val na = cells.groupBy("a").agg(sum("o").as("na"))
    val hx = na.agg(sum("na").as("n"),
        sum(col("na") * length(expr("bin(na)")).cast("long")).as("sa"))
      .select(col("n"),
        (col("n") * length(expr("bin(n)")).cast("long") - col("sa")).as("hx_bits"))
    val hxy = cells.agg(
      sum(col("o") * (length(expr("bin(nb)")).cast("long") -
        length(expr("bin(o)")).cast("long"))).as("hxy_bits"))
    hx.crossJoin(broadcast(hxy))
      .withColumn("mi_bits",
        greatest(col("hx_bits") - col("hxy_bits"), lit(0L)))
      .withColumn("u_e6",
        when(col("hx_bits") > 0, expr("(mi_bits*1000000) DIV hx_bits")))
      .select("n", "hx_bits", "hxy_bits", "mi_bits", "u_e6")
  }

  /** Per-key categorical `entropy` at integer floor-log₂ resolution —
    * the x60 `length(bin(n))` recipe applied to the entropy aggregate
    * (IEEE logs are un-oracleable; the bit-count grid is exact in any
    * engine). With per-value counts n_i summing to N, the N-scaled
    * entropy Σ n_i·log₂(N/n_i) becomes
    * `ent_bits = N·bits(N) − Σ n_i·bits(n_i)` (bits = floor log₂ + 1;
    * the +1s cancel), within one bit/row of the IEEE figure — the
    * resolution that ranks a DGA-ish client (every domain distinct,
    * ent_bits ≈ N·⌊log₂N⌋) far above a two-domain one (ent_bits ≈ N).
    *
    * Shape: two hash aggregations ((key, value) counts, then per-key
    * sums — both partial+final, map-side combined); Σ n_i·bits(n_i)
    * folds in the first pass so no per-key value list ever exists.
    * All int64: N·bits(N) < 2⁶³ for any realistic N. */
  def categoricalEntropy(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol), col(valCol))
      .agg(count(lit(1)).as("c"))
      .select(col(keyCol), col("c"),
        (col("c") * length(expr("bin(c)")).cast("long")).as("cb"))
      .groupBy(col(keyCol))
      .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"),
        sum("cb").as("scb"))
      .withColumn("ent_bits",
        col("n") * length(expr("bin(n)")).cast("long") - col("scb"))
      .drop("scb")
}
