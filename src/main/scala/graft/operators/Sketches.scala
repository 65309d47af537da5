package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{md5Hash64, topK, unitInterval}

/** Deterministic distinct-count sketching (SURVEY.md §2.11 R11).
  *
  * Spark's built-in `approx_count_distinct` (HLL++) is the default 100 TB
  * cardinality path, but its register layout is engine-specific — the
  * driver oracle can only rows-check it (x8). The K-MINIMUM-VALUES sketch
  * here has the same mergeable-sketch algebra (union = keep the k smallest;
  * partial aggregation map-side, exactly what the native bounded-heap
  * [[graft.expressions.TopKAggExpr]] already does) yet every step is
  * deterministic IEEE/integer arithmetic on md5-derived hashes, so the
  * whole estimator replays bit-for-bit in DuckDB SQL (x16) — an
  * oracle-checkable approximate-distinct with standard error ~1/√k.
  *
  * Estimator (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", 2002): map each distinct value to a uniform position
  * u ∈ (0,1) via a 64-bit hash; with u₍ₖ₎ the k-th smallest position,
  * distinct ≈ (k−1)/u₍ₖ₎; fall back to the exact kept count when a group
  * holds fewer than k distinct values.
  */
object Sketches {

  /** KMV approximate distinct count of `valueCol` per `groupCols`.
    *
    * Scale shape: the pre-aggregation `distinct` shuffles (group, 8-byte
    * hash) pairs — never the values; the sketch itself is a bounded top-k
    * aggregate (k rows per group × partition shuffle, ObjectHashAggregate
    * partial+final). The estimate depends only on the VALUE of u₍ₖ₎, so
    * tie order between equal positions cannot affect it. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 64): DataFrame = {
    val h = md5Hash64(col(valueCol).cast("string"))
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ h.as("h"): _*)
      .distinct() // KMV is defined over DISTINCT hash values
      .withColumn("u", unitInterval(col("h")))
      .groupBy(groupCols.map(col): _*)
      // score = -u: the bounded heap keeps the k LARGEST scores = k smallest u
      .agg(topK(col("h"), -col("u"), k).as("kept"))
      .select(
        groupCols.map(col) :+
          size(col("kept")).cast("long").as("sketch_n") :+
          when(size(col("kept")) < k, size(col("kept")).cast("double"))
            .otherwise(lit((k - 1).toDouble) / -element_at(col("kept"), k).getField("score"))
            .as("approx_distinct"): _*)
  }

  /** `uniqUpTo(N)` — ClickHouse's bounded exact-distinct: the EXACT
    * distinct count while it is ≤ N, saturating at N+1 ("N+") beyond —
    * the common dashboard contract ("show exact small counts, cap the
    * tail") at O(N) state per group instead of O(distinct). Same
    * k-smallest-hash keep rule as the KMV sketch with k = N+1: the kept
    * set IS the distinct set until it saturates, so the answer is exact
    * by construction, deterministic, and trivially mergeable (k-smallest
    * of union — [[graft.streaming.IncrementalKmv]]'s maintained state
    * serves this read with k = N+1). */
  def uniqUpTo(df: DataFrame, groupCols: Seq[String], valueCol: String,
      n: Int): DataFrame = {
    val h = md5Hash64(col(valueCol).cast("string"))
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ h.as("h"): _*)
      .distinct()
      .withColumn("u", unitInterval(col("h")))
      .groupBy(groupCols.map(col): _*)
      .agg(topK(col("h"), -col("u"), n + 1).as("kept"))
      .select(groupCols.map(col) :+
        size(col("kept")).cast("long").as("uniq_up_to"): _*)
  }

  /** KMV SET ALGEBRA — the approximate counterpart of [[Bitmaps]]' exact
    * reads, closing the sketch family's set-operation story: for each
    * requested `(g1, g2)` pair, estimate |A∪B|, |A∩B| and Jaccard from
    * the two groups' k-sized KMV sketches alone (the classic KMV
    * estimator: union sketch = k smallest of S_A ∪ S_B; ρ = fraction of
    * union-sketch hashes present in BOTH; |A∪B| ≈ (k−1)/u₍ₖ₎; |A∩B| ≈
    * ρ·|A∪B|). When the union sketch is under k the sets are fully
    * visible and every figure is EXACT.
    *
    * Deterministic end-to-end (md5 positions, integer ρ in ppm, one
    * fixed IEEE expression per estimate) — unlike HLL the whole
    * computation replays in SQL, and the sketch rows are exactly the
    * state [[graft.streaming.IncrementalKmv]] maintains, so these reads
    * also serve from continuously-maintained state.
    *
    * Scale shape: sketches build on the mergeable bounded-heap `topK`
    * aggregate (O(k) state per group, map-side partial merge — the
    * [[kmvDistinct]] recipe, no per-group sort); pair work is
    * O(pairs × 2k) rows — `pairs` (a `(g1, g2)` frame) is caller-chosen
    * precisely so a 10⁶-group table never implies 10¹² pairs. */
  def kmvSetAlgebra(df: DataFrame, groupCol: String, valueCol: String,
      pairs: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Sketch build on the mergeable bounded-heap aggregate (the kmvDistinct
    // recipe): O(k) state per group with map-side partial merge, instead of a
    // row_number window that sorts every distinct hash inside each group —
    // whose cost is the group's distinct cardinality and whose sort runs
    // single-partition under group skew. Heap order (score desc = u asc,
    // id asc = h asc) matches the old window's (u, h) exactly; u = −(−u) is
    // bit-exact, so the estimator and the oracle are unchanged.
    val sk = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), md5Hash64(col(valueCol).cast("string")).as("h"))
      .distinct()
      .withColumn("u", unitInterval(col("h")))
      .groupBy("g")
      .agg(topK(col("h"), -col("u"), k).as("kept"))
      .select(col("g"), explode(col("kept")).as("kv"))
      .select(col("g"), col("kv.id").as("h"), negate(col("kv.score")).as("u"))
      .transform(Caching.persisted)
    val a = pairs.join(sk.withColumnRenamed("g", "g1"), Seq("g1"))
      .select(col("g1"), col("g2"), col("h"), col("u"), lit("a").as("side"))
    val b = pairs.join(sk.withColumnRenamed("g", "g2"), Seq("g2"))
      .select(col("g1"), col("g2"), col("h"), col("u"), lit("b").as("side"))
    a.unionByName(b)
      // one exchange for the whole pair stage (optimization r16, guide
      // §2.4): (g1, g2) partitioning satisfies the sides aggregation
      // (subset of its grouping keys), the rank window, AND the final
      // per-pair aggregation — the r15 plan re-shuffled between the
      // aggregation and the window
      .repartition(col("g1"), col("g2"))
      .groupBy("g1", "g2", "h", "u")
      .agg(countDistinct("side").as("sides"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("g1", "g2").orderBy("u", "h")))
      .filter(col("rk") <= k)
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("m"),
        sum(when(col("sides") === 2, 1L).otherwise(0L)).as("n_both"),
        max(when(col("rk") === k, col("u"))).as("uk"))
      .select(col("g1"), col("g2"),
        expr("n_both * 1000000 DIV m").as("jaccard_ppm"),
        when(col("m") < k, col("m").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("uk")).as("union_est"),
        when(col("m") < k, col("n_both").cast("double"))
          .otherwise(col("n_both").cast("double") / lit(k.toDouble) *
            (lit((k - 1).toDouble) / col("uk"))).as("inter_est"))
  }

  /** The d hashed counter positions of a string value — shared by the
    * sketch build, the point-estimate probe, and (being md5-derived
    * exact integers) the DuckDB oracle. */
  private[operators] def cmsPositions(value: org.apache.spark.sql.Column,
      d: Int, w: Int): Seq[org.apache.spark.sql.Column] =
    (0 until d).map(i =>
      pmod(md5Hash64(concat(value.cast("string"), lit(s":cms$i"))), lit(w.toLong)))

  /** COUNT-MIN sketch build: a d×w counter matrix as its (i, pos, cnt)
    * row set — frequency POINT estimates to go with KMV's distinct and
    * Misra-Gries' top-k (the remaining member of the mergeable-sketch
    * family). Counters are purely ADDITIVE, so unlike MG the sketch —
    * and every estimate read from it — is deterministic under ANY
    * partitioning/batching and replays exactly in SQL (oracle x41);
    * the streaming form is a plain summed upsert
    * ([[graft.streaming.IncrementalCms]]).
    *
    * Scale shape: one explode(d)+count aggregation; the sketch is ≤ d·w
    * rows (KBs) regardless of stream size; estimates never touch the
    * data again. */
  def countMin(df: DataFrame, valueCol: String, d: Int = 4, w: Int = 256): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(posexplode(array(cmsPositions(col(valueCol), d, w): _*)).as(Seq("i", "pos")))
      .groupBy("i", "pos").agg(count(lit(1)).as("cnt"))

  /** Point estimates for `probes` (a frame with distinct `valueCol`
    * rows) against a built sketch: min over the d counters —
    * `true ≤ est ≤ true + εN` with ε = e/w at the standard depth. */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, valueCol: String,
      d: Int = 4, w: Int = 256): DataFrame =
    probes
      .select(col(valueCol), posexplode(array(cmsPositions(col(valueCol), d, w): _*))
        .as(Seq("i", "pos")))
      .join(sketch, Seq("i", "pos"), "left") // unseen probe → empty counter = 0
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Fixed-resolution HISTOGRAM sketch: per-group counts of the exact
    * CENTS bucket (`floor(v·100 + 0.5)`, the money rule applied to the
    * value axis) — the deterministic, fully-ORACLED member of the
    * approximate-percentile family. Where t-digest's centroids are
    * engine-specific (x10 is rows-only by nature), a fixed grid makes
    * the whole sketch exact integer state: additive counters ⇒ mergeable
    * under any partitioning AND incrementally maintainable with a plain
    * summed upsert ([[graft.streaming.IncrementalHistogram]]); the
    * quantile read is pure integer arithmetic. Error is the grid
    * resolution (≤ half a cent), not a probabilistic bound; state is
    * O(distinct buckets) = O(value range × 100) per group. */
  def histogram(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ graft.functions.cents(col(valueCol)).as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Quantile read over a [[histogram]] (or its maintained state):
    * for each rational q = nu/de, the smallest bucket whose running
    * count reaches `ceil(nu·n / de)` — rank arithmetic in exact int64
    * (`(nu·n + de − 1) DIV de`), cumulative counts via one window per
    * group, so every engine computes the identical bucket.
    * @param qs (label, numerator, denominator) */
  def histogramQuantiles(hist: DataFrame, groupCols: Seq[String],
      qs: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE window pass (optimization r16, guide §2.4): the cumulative count
    // and the group total ride the same partitionBy exchange (the
    // unordered total needs no extra sort), replacing the r15
    // groupBy-total + join-back — which cost two more exchanges AND
    // re-derived the whole hist subtree into both branches. The rank
    // arithmetic and the min-bucket selection are unchanged int64.
    val w = Window.partitionBy(groupCols.map(col): _*)
    hist
      .withColumn("cum", sum("cnt").over(w.orderBy("bucket")))
      .withColumn("n", sum("cnt").over(w))
      .select(groupCols.map(col) :+ col("n") :+ col("cum") :+ col("bucket") :+
        explode(array(qs.map { case (l, nu, de) =>
          struct(lit(l).as("q"), lit(nu.toLong).as("nu"), lit(de.toLong).as("de"))
        }: _*)).as("qq"): _*)
      .filter(col("cum") >= expr("(qq.nu * n + qq.de - 1) DIV qq.de"))
      .withColumn("q", col("qq.q"))
      .groupBy((groupCols :+ "q").map(col): _*)
      .agg(min("n").as("n"), min("bucket").as("est_cents"))
  }

  /** `quantileExactWeighted` — the engine family's exact weighted
    * quantile: the smallest value whose cumulative WEIGHT reaches
    * `ceil(q·W)`, all rank arithmetic in exact int64. Structurally
    * [[histogramQuantiles]] with counts generalized to integer weights:
    * weights first aggregate per distinct value (the mergeable O(distinct)
    * state — a plain SUM upsert maintains it incrementally), then the
    * identical window-cumsum read. Weight 0 rows legitimately contribute
    * nothing; negative weights are the caller's contract violation. */
  def quantileExactWeighted(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String,
      qs: Seq[(String, Int, Int)]): DataFrame =
    histogramQuantiles(
      df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
        .groupBy((groupCols :+ valueCol).map(col): _*)
        .agg(sum(col(weightCol)).as("cnt"))
        .withColumnRenamed(valueCol, "bucket"),
      groupCols, qs)

  /** Tukey-fence outlier counts — robust outlier detection EXACT on the
    * integer grid: Q1/Q3 via the same ceil-rank selection as
    * [[exactMedian]], fences `Q1 − 1.5·IQR` / `Q3 + 1.5·IQR` carried as
    * DOUBLED integers (`low2 = 5·Q1 − 3·Q3`, `high2 = 5·Q3 − 3·Q1` —
    * the ×1.5 half-grid rational cleared the same way the rank tests
    * clear tie-halves), outliers counted against `2·v`. One count-cumsum
    * pass for the quartiles (O(distinct) state), one broadcast join back
    * for the counts. */
  def tukeyOutliers(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
    val h = base.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    // group total via a second window aggregate on the cum exchange
    // (optimization r16, the histogramQuantiles recipe) — drops the r15
    // groupBy-total + broadcast-join pair; identical ceil-rank fences
    val w = Window.partitionBy("g")
    val q = h.withColumn("cum", sum("cnt").over(w.orderBy("v")))
      .withColumn("n", sum("cnt").over(w))
      .groupBy("g")
      .agg(min("n").as("n"),
        min(when(col("cum") >= expr("(n + 3) DIV 4"), col("v"))).as("q1"),
        min(when(col("cum") >= expr("(3 * n + 3) DIV 4"), col("v"))).as("q3"))
      .withColumn("low2", lit(5L) * col("q1") - lit(3L) * col("q3"))
      .withColumn("high2", lit(5L) * col("q3") - lit(3L) * col("q1"))
    base.join(broadcast(q), "g")
      .groupBy("g")
      .agg(min("n").as("n"), min("q1").as("q1"), min("q3").as("q3"),
        sum(when(col("v") * 2L < col("low2"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("v") * 2L > col("high2"), 1L).otherwise(0L)).as("n_high"))
  }

  /** Exact per-group median of an integer column via count-cumsum rank
    * selection — O(distinct values) state, not O(rows): the smallest
    * value whose cumulative count reaches `(n+1) DIV 2` (= ceil(n/2),
    * the lower median — a DELIBERATE choice: the midpoint average of an
    * even split is a non-grid rational, and every engine agrees on a
    * grid point). Returns `(g, n, med)`. */
  def exactMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    // group total as a second window aggregate on the same exchange
    // (optimization r16, the histogramQuantiles recipe): the r15
    // groupBy-total + join-back pair of exchanges is gone; identical
    // ceil-rank selection
    val w = Window.partitionBy("g")
    h.withColumn("cum", sum("cnt").over(w.orderBy("v")))
      .withColumn("n", sum("cnt").over(w))
      .filter(col("cum") >= expr("(n + 1) DIV 2"))
      .groupBy("g").agg(min("n").as("n"), min("v").as("med"))
  }

  /** `medianAbsoluteDeviation` — the robust-scale statistic, EXACT on
    * the integer grid: median of `|x − median(x)|`, both medians via
    * [[exactMedian]]'s ceil-rank selection. The first median is a tiny
    * per-group scalar (one row per group, broadcast-joined back), so the
    * whole figure costs two count-cumsum passes — no per-row windows
    * over raw data, O(distinct) state each pass. */
  def madExact(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("c"))
    val med = exactMedian(base, "g", "c") // (g, n, med) — one tiny row/group
    // the second ceil-rank pass CARRIES (n, med) through its aggregation
    // keys, so the median subtree is evaluated once (the broadcast join)
    // and never re-joined — without this the med branch is duplicated
    // into both passes and the plan doubles its exchanges
    val dev = base.join(broadcast(med), "g")
      .withColumn("dev", abs(col("c") - col("med")))
    val h = dev.groupBy("g", "n", "med", "dev").agg(count(lit(1)).as("cnt"))
    h.withColumn("cum",
        sum("cnt").over(Window.partitionBy("g").orderBy("dev")))
      .filter(col("cum") >= expr("(n + 1) DIV 2"))
      .groupBy("g")
      .agg(min("n").as("n"), min("med").as("med"), min("dev").as("mad"))
  }
}
