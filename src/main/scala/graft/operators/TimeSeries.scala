package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{bucketStartSecFromNanos, pround4}

/** Time-series anomaly detection over the event stream (SURVEY.md §2.11
  * extension family): per-(type, time-bucket) counts scored against the
  * type's own count distribution — the spike-detection pass an operator of
  * the reference system would run over `stats2`-style bucketed summaries
  * (cf. `/root/reference/README.md:103-129`, the 10-minute `stats2` MV this
  * operator consumes the moral equivalent of).
  *
  * Cross-engine determinism: the flag thresholds are EXACT int64
  * arithmetic. With per-type bucket count `n`, sum `s`, sum-of-squares
  * `ss` (all int64) and a bucket's count `cnt`,
  *
  *   z = (cnt − s/n) / sqrt(var),  var = (n·ss − s²)/n²
  *     = dev / sqrt(varNum),       dev = cnt·n − s, varNum = n·ss − s²
  *
  * so `z > t  ⇔  dev > 0 ∧ dev² > t²·varNum` — pure integer compares, no
  * IEEE in the decision. The reported `max_z4` does one double division +
  * correctly-rounded sqrt with pround4, the established parity form.
  *
  * Overflow headroom — the binding terms are the SQUARES, not dev/varNum
  * themselves: the decision needs `cnt²`, `dev²` and `9·varNum` in int64,
  * i.e. cnt, |dev| ≤ ⌊√(2⁶³−1)⌋ ≈ 3.04e9 and n·ss ≤ (2⁶³−1)/9 ≈ 1.02e18 —
  * e.g. millions of buckets × thousands of events/bucket sits within ~2%
  * of the varNum bound, and a single hot bucket (cnt ≈ s) pushes dev
  * toward s·n, far past the dev² bound. This deployment runs Spark 4's
  * default ANSI mode (`spark.sql.ansi.enabled=true`), where int64
  * overflow throws a generic ArithmeticException; the per-row guards
  * below turn that into a named `raise_error` with the offending type,
  * and would equally prevent the silent wrap of an ANSI-off deployment.
  * Every per-row product — including cnt² inside the sum-of-squares
  * aggregation — is formed only after its operands are proven to fit;
  * the threshold quotients use integral `DIV`, so the decision never
  * leaves int64 (a float divide would admit ~2^11 ULP of slack near
  * 2⁶³). The only unguarded overflow left is the aggregate SUM itself
  * exceeding int64, which ANSI still fails loudly.
  *
  * 100 TB design: two shuffles, both on aggregated data — the bucket
  * aggregation shuffles O(types × buckets) counted rows (map-side partial
  * combine does the heavy lifting on the raw scan), and the per-type stats
  * (one row per type) broadcast back onto the buckets. The raw stream is
  * scanned exactly once.
  */
object TimeSeries {

  /** Per-(typeCol, bucket) counts from an epoch-nanos Long timestamp. */
  def bucketCounts(events: DataFrame, typeCol: String, tsNanosCol: String,
      minutes: Int): DataFrame =
    events
      .groupBy(col(typeCol), bucketStartSecFromNanos(tsNanosCol, minutes).as("bucket_start"))
      .agg(count(lit(1)).as("cnt"))

  /** Time-series PATTERN search (the similarity-search side of the
    * time-series family, next to [[spikeStats]]' anomaly side): slide a
    * length-L window over each type's CONTIGUOUS bucket-count series and
    * rank windows by exact-int64 squared euclidean distance to a pinned
    * query pattern — "find when traffic looked like THIS". Top-k per
    * type, (distance, bucket_start) tie-break.
    *
    * Exactness: counts and pattern are int64, so every squared diff and
    * sum is exact integer arithmetic (headroom: |cnt − p| ≤ 3·10⁹ per
    * element before dist² leaves int64 — far beyond any bucket count);
    * windows with missing buckets are EXCLUDED by the contiguity check
    * (lead(bucket_start, L−1) = start + (L−1)·step), not zero-filled —
    * a gap is absence of data, not a zero observation.
    *
    * Scale shape: one bucket aggregation (map-side combined), one
    * shuffle on type for the lead window, rank over O(buckets) rows —
    * the raw stream is scanned once; the pattern broadcast is literal. */
  def patternSearch(events: DataFrame, typeCol: String, tsNanosCol: String,
      minutes: Int, pattern: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = pattern.size
    require(L > 0 && k > 0)
    val step = minutes * 60L
    val w = Window.partitionBy(typeCol).orderBy("bucket_start")
    val withLeads = bucketCounts(events, typeCol, tsNanosCol, minutes)
      .select(Seq(col(typeCol), col("bucket_start")) ++
        (0 until L).map(i => lead("cnt", i).over(w).as(s"c$i")) :+
        lead("bucket_start", L - 1).over(w).as("end_start"): _*)
      .filter(col("end_start") === col("bucket_start") + lit((L - 1) * step))
    val dist = (0 until L).map { i =>
      val d = col(s"c$i") - lit(pattern(i)); d * d
    }.reduceLeft(_ + _)
    withLeads
      .select(col(typeCol), col("bucket_start"), dist.as("dist2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(typeCol).orderBy(col("dist2"), col("bucket_start"))))
      .filter(col("rn") <= k)
      .select(col(typeCol), col("bucket_start"), col("dist2"), col("rn").cast("long").as("rn"))
  }

  /** Per-type spike summary: bucket population, z>2 / z>3 spike counts
    * (exact integer decisions), and the maximum z-score (pround4). */
  def spikeStats(events: DataFrame, typeCol: String, tsNanosCol: String,
      minutes: Int): DataFrame =
    spikeStatsFromCounts(bucketCounts(events, typeCol, tsNanosCol, minutes), typeCol)

  /** [[spikeStats]] from an ALREADY-AGGREGATED (typeCol, bucket_start,
    * cnt) frame — the shared decision tail, so the batch path and the
    * incrementally-maintained streaming path
    * ([[graft.streaming.StreamingSpikes]]) run the exact same guarded
    * int64 arithmetic on their bucket counts. */
  def spikeStatsFromCounts(bucketed: DataFrame, typeCol: String): DataFrame = {
    def overflowError: Column =
      raise_error(concat(lit("TimeSeries.spikeStats: int64 headroom exceeded for "),
        col(typeCol).cast("string"))).cast("long")
    val b = bucketed.transform(Caching.persisted)
    // cnt is guarded BEFORE it is squared — under ANSI-on an unguarded
    // cnt·cnt with cnt > ⌊√(2⁶³−1)⌋ would throw a generic
    // ArithmeticException out of the aggregation instead of this named
    // error (and would wrap silently under ANSI-off, poisoning ss)
    val cntSq = when(col("cnt") <= lit(3037000499L), col("cnt") * col("cnt"))
      .otherwise(overflowError)
    val stats = b.groupBy(typeCol).agg(
      count(lit(1)).as("n"),
      sum("cnt").as("s"),
      sum(cntSq).as("ss"))
    // operand-level guards: each product is formed only after its inputs
    // are proven to fit; the quotient threshold uses integral DIV (a
    // long/long `/` in Spark is a DOUBLE divide whose rounding admits
    // operands past the bound by up to ~2048·n near 2⁶³)
    val maxDivN = expr(s"${Long.MaxValue}L DIV greatest(n, 1L)")
    val safeOperands =
      col("cnt") <= maxDivN && // cnt·n (dev)
        col("ss") <= maxDivN // n·ss (varNum; s² ≤ n·ss by Cauchy-Schwarz)
    val dev = col("cnt") * col("n") - col("s")
    val varNum = col("n") * col("ss") - col("s") * col("s")
    val safeSquares =
      col("varnum") >= 0L && // negative ⇒ upstream wrap; never square it
        abs(col("dev")) <= lit(3037000499L) && // ⌊√(2⁶³−1)⌋: dev² fits
        col("varnum") <= lit(Long.MaxValue / 9) // t²·varNum fits for t ≤ 3
    def guarded(flag: Column): Column =
      when(safeSquares, flag).otherwise(overflowError)
    b.join(broadcast(stats), typeCol)
      .select(col(typeCol), col("n"), col("s"),
        when(safeOperands, dev).otherwise(overflowError).as("dev"),
        when(safeOperands, varNum).otherwise(overflowError).as("varnum"))
      .groupBy(typeCol)
      .agg(
        max("n").as("n_buckets"),
        max("s").as("total_events"),
        sum(guarded(when(col("dev") > 0 && col("dev") * col("dev") > lit(4L) * col("varnum"), 1L)
          .otherwise(0L))).as("z2_cnt"),
        sum(guarded(when(col("dev") > 0 && col("dev") * col("dev") > lit(9L) * col("varnum"), 1L)
          .otherwise(0L))).as("z3_cnt"),
        max(when(col("varnum") > 0,
          pround4(col("dev").cast("double") / sqrt(col("varnum").cast("double")))))
          .as("max_z4"))
  }

  /** Exponentially-decayed ("trending") sums — the reference engine
    * family's `exponentialTimeDecayedSum` surface, made EXACT: weight is
    * a power of two per day of age (half-life = 1 day), so each row's
    * contribution is `cents·10⁶ DIV 2^age_days` — integer shift and
    * truncating division, no IEEE decay anywhere, and the figure replays
    * bit-for-bit in SQL. Age is relative to the CORPUS max day (a
    * deterministic anchor — never wall-clock), capped at 62 so the shift
    * stays in-range (a 62-day-old row contributes < 10⁻¹² of its value —
    * zero after truncation for any real magnitude). Dividing PER ROW
    * before summing keeps every intermediate bounded by the plain sum at
    * any corpus size.
    *
    * Shape: one 1-row max-day broadcast + one hash aggregation —
    * summary-sized output, stream scanned once. */
  def decayedSum(events: DataFrame, groupCol: String, tsUsCol: String,
      valueCents: Column): DataFrame = {
    val day = expr(s"$tsUsCol DIV 86400000000")
    val mx = events.agg(max(day).as("mx"))
    // 1-row scalar broadcast (the allowlisted BNLJ shape, cf. x27/x40)
    events.crossJoin(broadcast(mx))
      .select(col(groupCol),
        valueCents.as("c"),
        expr(s"CAST(LEAST(mx - ($tsUsCol DIV 86400000000), 62L) AS INT)").as("age"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col("c")).as("sum_cents"),
        sum(expr("c * 1000000L DIV shiftleft(1L, age)")).as("decayed_e6"))
  }

  /** `exponentialTimeDecayedAvg` — the average read over the
    * [[decayedSum]] artifact: the same exact power-of-2 day weights
    * accumulate a numerator `Σ c·10⁶ DIV 2^age` AND a denominator
    * `Σ 10⁶ DIV 2^age` (the decayed row count, e6-scaled), so the
    * decayed mean is one integer division of two like-scaled int64 sums
    * — `davg_cents = decayed_e6 DIV weight_e6`. A group whose every row
    * is ≥ 62 days stale has weight 0: the avg is NULLed (ANSI division
    * guard), which is also the honest answer for a fully-decayed group.
    * Same shape as decayedSum: one 1-row max-day scalar broadcast, one
    * aggregation. */
  def decayedAvg(events: DataFrame, groupCol: String, tsUsCol: String,
      valueCents: Column): DataFrame = {
    val day = expr(s"$tsUsCol DIV 86400000000")
    val mx = events.agg(max(day).as("mx"))
    events.crossJoin(broadcast(mx))
      .select(col(groupCol),
        valueCents.as("c"),
        expr(s"CAST(LEAST(mx - ($tsUsCol DIV 86400000000), 62L) AS INT)").as("age"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(expr("c * 1000000L DIV shiftleft(1L, age)")).as("decayed_e6"),
        sum(expr("1000000L DIV shiftleft(1L, age)")).as("weight_e6"))
      .withColumn("davg_cents",
        when(col("weight_e6") > 0, expr("decayed_e6 DIV weight_e6")))
  }

  /** `ORDER BY … WITH FILL` + `INTERPOLATE` — the gap-filling read
    * every dashboard needs: per key, the COMPLETE integer grid
    * [min, max] of positions, absent points zero-filled and a carry
    * column rolled forward (`last_value IGNORE NULLS` under an explicit
    * ROWS frame — both engines agree on it; the RANGE default would
    * not matter here since grid positions are unique, but explicit is
    * the house rule). The grid is built once from the global 1-row
    * range (scalar broadcast, the allowlisted BNLJ shape) crossed with
    * the distinct keys — O(keys · span) rows, generated not scanned.
    *
    * Output: (key, pos, countCol zero-filled, `<carryCol>_filled`). */
  def gapFill(points: DataFrame, keyCol: String, posCol: String,
      countCol: String, carryCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rng = points.agg(min(col(posCol)).as("_mn"), max(col(posCol)).as("_mx"))
    val grid = points.select(col(keyCol)).distinct()
      .crossJoin(broadcast(rng))
      .select(col(keyCol), explode(sequence(col("_mn"), col("_mx"))).as(posCol))
    val w = Window.partitionBy(keyCol).orderBy(posCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(points, Seq(keyCol, posCol), "left")
      .withColumn(countCol, coalesce(col(countCol), lit(0L)))
      .withColumn(s"${carryCol}_filled",
        last(col(carryCol), ignoreNulls = true).over(w))
      .drop(carryCol)
  }

  /** Merged-interval coverage — the reference engine family's
    * `intervalLengthSum`: per key, the total length of the UNION of
    * `[s, e)` intervals (overlaps and containments counted once) and the
    * number of disjoint islands. The classic gaps-and-islands rewrite,
    * exact in integer units: running `max(e)` over the `(s, e)`-ordered
    * prefix (ROWS frame — explicit, because the RANGE default would let
    * tie-peers see their own ends), a new island wherever `s` clears
    * every earlier end, then `max(e) − min(s)` per island. Identical
    * duplicate rows are order-interchangeable, so the (s, e) sort is
    * deterministic without a unique tiebreak.
    *
    * Shape: one shuffle on the key, two window passes over each key's
    * rows, one aggregation — O(intervals) everything; per-key row counts
    * bound the window memory (AQE skew-splits hot keys). */
  def intervalCoverage(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy("k").orderBy("s", "e")
    df.select(col(keyCol).as("k"), col(startCol).as("s"), col(endCol).as("e"))
      .withColumn("pm", max(col("e")).over(
        byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("nw", when(col("pm").isNull || col("s") > col("pm"), 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("nw")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("k", "island")
      .agg((max(col("e")) - min(col("s"))).as("len"))
      .groupBy("k")
      .agg(sum(col("len")).as("covered"), count(lit(1)).as("n_islands"))
  }

  /** [[decayedSum]] served from a maintained `(group, day, n, sum_cents)`
    * day summary instead of the fact stream — the reference's MV
    * economics applied to decay: the summary is plain additive state
    * (`MvPipeline.upsert` SUM merge), and because the decay weight is
    * constant WITHIN a day, folding a whole day's cents before decaying
    * changes nothing: `Σᵢ(cᵢ·10⁶ DIV 2ᵃ)` vs `(Σᵢcᵢ)·10⁶ DIV 2ᵃ` differ
    * only in truncation points — we define day granularity as the
    * contract (both the operator and this read truncate once per
    * (group, day) when fed the same summary; the spec pins the
    * equivalence on per-day-folded input). Reads are O(summary), the
    * stream is never rescanned. */
  def decayedSumFromDaySummary(dayCents: DataFrame, groupCol: String): DataFrame = {
    val mx = dayCents.agg(max(col("day")).as("mx"))
    dayCents.crossJoin(broadcast(mx))
      .select(col(groupCol), col("n"), col("sum_cents"),
        expr("CAST(LEAST(mx - day, 62L) AS INT)").as("age"))
      .groupBy(groupCol)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        sum(expr("sum_cents * 1000000L DIV shiftleft(1L, age)")).as("decayed_e6"))
  }

  /** Peak concurrency — the reference engine family's `maxIntersections`
    * / `maxIntersectionsPosition`: per key, the maximum number of
    * half-open `[s, e)` intervals open at once, and the EARLIEST point
    * where that peak is reached. Classic sweep-line as a window
    * aggregate: each interval contributes `(s, +1)` and `(e, −1)`
    * deltas; the running sum over `(point, ord)` — ends ordered BEFORE
    * starts at the same point, so back-to-back intervals never overlap —
    * is the live count. Tie-peers inside one `(point, ord)` group share
    * a sign, so the engine-default RANGE cumulative frame (peers see
    * each other) reads the count AFTER the whole batch of simultaneous
    * opens/closes — exactly the post-event concurrency, identical in
    * both engines. The peak position filters to `+1` rows (a close can
    * never set a new peak) and takes the minimum point.
    *
    * Shape: one narrow 2-row-per-interval explode, one shuffle on the
    * key for the window pass, one aggregation — O(intervals), stream
    * scanned once; per-key row counts bound window memory. */
  def maxIntersections(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame =
    maxIntersectionsFromDeltas(intervalDeltas(df, keyCol, startCol, endCol))

  /** The sweep-line DELTA table of an interval set — `(k, p, ord, d)`
    * with `d` summed per distinct point: +1 per start, −1 per end, ends
    * ordered before starts. This IS the mergeable artifact: deltas are
    * additive, so batches fold under a plain SUM upsert
    * ([[graft.streaming.IncrementalConcurrency]]) and the state is
    * O(distinct boundary points), not O(intervals). */
  def intervalDeltas(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame =
    df.select(col(keyCol).as("k"),
        explode(array(
          struct(col(startCol).as("p"), lit(1L).as("d"), lit(1).as("ord")),
          struct(col(endCol).as("p"), lit(-1L).as("d"), lit(0).as("ord")))).as("x"))
      .select(col("k"), col("x.p").as("p"), col("x.d").as("d"), col("x.ord").as("ord"))
      .groupBy("k", "p", "ord").agg(sum("d").as("d"))

  /** The peak-concurrency READ over [[intervalDeltas]] (or its
    * maintained state). RANGE default frame on purpose: same-sign
    * tie-peers share the post-batch count (see [[maxIntersections]]
    * scaladoc); DuckDB's default frame matches. */
  def maxIntersectionsFromDeltas(deltas: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sweep = Window.partitionBy("k").orderBy("p", "ord")
    deltas
      .withColumn("cum", sum(col("d")).over(sweep))
      .withColumn("mx", max(col("cum")).over(Window.partitionBy("k")))
      .groupBy("k")
      .agg(first(col("mx")).as("max_conc"),
        min(when(col("cum") === col("mx") && col("d") > 0L, col("p"))).as("at_p"))
  }

  /** `seriesPeriodDetect` — dominant-period detection over a bucketed
    * count series, EXACT in int64: no FFT, no floats — the figure is the
    * raw autocorrelation of the B-scaled mean-centered series,
    * `d_t = B·c_t − S` (integers by construction), `R(L) = Σ d_t·d_{t+L}`
    * per candidate lag via a bounded band self-join, and the winning lag
    * the `max_by` under the total (R, −lag) order (smallest lag on
    * ties). Caller contract: contiguous bucket indices per key (densify
    * first — a silent gap would alias lags). Overflow bound:
    * `B³·max(c)² < 2⁶³` on the centered scale.
    *
    * Shape: one scalar aggregation, one banded self-join (each row meets
    * ≤ maxLag partners — O(B·maxLag) pairs), one aggregation. */
  def periodDetect(counts: DataFrame, keyCol: String, bucketCol: String,
      cntCol: String, maxLag: Int): DataFrame = {
    val base = counts.select(col(keyCol).as("k"), col(bucketCol).as("b"),
      col(cntCol).as("cnt"))
    val scal = base.groupBy("k")
      .agg(count(lit(1)).as("nb"), sum("cnt").as("s"))
    val d = base.join(broadcast(scal), "k")
      .withColumn("d", col("nb") * col("cnt") - col("s"))
      .select(col("k"), col("b"), col("d"), col("nb"))
    val pairs = d.as("l").join(d.as("r"),
      col("l.k") === col("r.k") &&
        col("r.b") > col("l.b") && col("r.b") <= col("l.b") + maxLag)
      .select(col("l.k").as("k"), (col("r.b") - col("l.b")).as("lag"),
        (col("l.d") * col("r.d")).as("prod"), col("l.nb").as("nb"))
    pairs.groupBy("k", "lag").agg(min("nb").as("nb"), sum("prod").as("r"))
      .groupBy("k")
      .agg(min("nb").as("n_buckets"),
        max_by(col("lag"), struct(col("r"), (-col("lag")).as("nl"))).as("best_lag"),
        max("r").as("best_r"))
  }

  /** CUSUM change-point detection, EXACT in int64: the bucket where the
    * cumulative count deviates most from the uniform ramp —
    * `dev_t = |B·cum_t − t·S|` (both terms integer on the B-scaled
    * grid), argmax under the total (dev, −t) order (earliest bucket on
    * ties). Same densified-bucket contract as [[periodDetect]].
    * One window pass over O(buckets) rows per key. */
  def changePoint(counts: DataFrame, keyCol: String, bucketCol: String,
      cntCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("b")
    counts.select(col(keyCol).as("k"), col(bucketCol).as("b"),
        col(cntCol).as("cnt"))
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("nb", count(lit(1)).over(Window.partitionBy("k")))
      .withColumn("s", sum("cnt").over(Window.partitionBy("k")))
      .withColumn("dev", abs(col("nb") * col("cum") - col("idx") * col("s")))
      .groupBy("k")
      .agg(min("nb").as("n_buckets"),
        max_by(col("b"), struct(col("dev"), (-col("idx")).as("ni"))).as("cp_bucket"),
        max("dev").as("max_dev"))
  }

  /** `sparkbar` — the engine family's inline bar-chart render, made
    * oracle-exact: per key, bucket counts normalize to eight block
    * heights with INTEGER arithmetic (`h = cnt·7 DIV max_cnt` — no
    * float rescale to diverge on), each height maps through a literal
    * glyph array, and the glyphs concatenate in bucket order via the
    * deterministic sorted-collect recipe. Empty buckets are the
    * caller's densify contract (a missing bucket renders nothing —
    * LEFT-join a calendar first if gaps must show). */
  def sparkbar(df: DataFrame, keyCol: String, bucketCol: String,
      cntCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocks = array(Seq("▁", "▂", "▃", "▄",
      "▅", "▆", "▇", "█").map(lit): _*)
    df.select(col(keyCol).as("k"), col(bucketCol).as("b"),
        col(cntCol).as("cnt"))
      .withColumn("mx", max("cnt").over(Window.partitionBy("k")))
      .withColumn("h", expr("cnt * 7 DIV mx"))
      .withColumn("ch", element_at(blocks, (col("h") + 1).cast("int")))
      .groupBy("k")
      .agg(count(lit(1)).as("n_buckets"),
        expr("array_join(transform(sort_array(collect_list(struct(b, ch))), s -> s.ch), '')")
          .as("bar"))
  }

  /** `largestTriangleThreeBuckets` — the LTTB chart-downsampling
    * aggregate, EXACT and sequential-faithful: first/last points pinned;
    * the middle positions split into `nBuckets − 2` equal-position
    * buckets; bucket k's pick maximizes the triangle area with the
    * PREVIOUSLY SELECTED point and the NEXT bucket's average (the last
    * pick uses the last point). The per-bucket dependency chain is
    * unrolled into `nBuckets − 2` plan stages (the x52/x53 iterative
    * recipe): each stage joins the 1-row-per-key previous pick
    * (broadcast) to the bucket's candidates and takes a `max_by` under
    * the TOTAL order (area, −t, −v) — deterministic on area ties.
    *
    * Exactness: the next-bucket average `(Σx/c, Σy/c)` is rational, so
    * the comparison multiplies the doubled area through by `c`:
    * `a = |(x_prev·c − Σx)(y − y_prev) − (x_prev − x)(Σy − y_prev·c)|` —
    * all int64 (bound: t_span·points_per_bucket·v_span < 2⁶³). Keys with
    * n ≤ nBuckets pass through whole. Returns `(g, sel, t, v)` with
    * `sel` the output position.
    *
    * Scale shape: one window pass for positions, one bucket aggregation,
    * then B−2 broadcast joins against 1-row/key picks — the series data
    * is scanned once per bucket stage but each stage filters to its own
    * bucket, so total candidate work is O(points); the position pass is
    * persisted to keep the unrolled stages from recomputing it. */
  def lttb(df: DataFrame, keyCol: String, tCol: String, vCol: String,
      idCol: String, nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets >= 3, "lttb needs at least first + one middle + last")
    val base = df.select(col(keyCol).as("g"), col(tCol).as("t"),
        col(vCol).as("v"), col(idCol).as("id"))
      .filter(col("t").isNotNull && col("v").isNotNull)
    val pos = Caching.persisted(base
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("t", "id")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .drop("id"))
    val small = pos.filter(col("n") <= nBuckets)
      .select(col("g"), (col("rn") - 1).cast("int").as("sel"), col("t"), col("v"))
    val big = pos.filter(col("n") > nBuckets)
    val mid = big.filter(col("rn") > 1 && col("rn") < col("n"))
      .withColumn("bk", expr(s"(rn - 2) * ${nBuckets - 2} DIV (n - 2)"))
    // persisted (optimization r17): every stage's next-bucket average is
    // a filter of THIS aggregation, but the per-stage `bk = k+1` filter
    // pushes below the groupBy, so the stages' subtrees differ and
    // ReuseExchange cannot share them — unpersisted, each of the B−3
    // stages re-ran the full scan + shuffle of the bucket aggregation.
    // One O(keys × buckets) cached table serves all stages.
    val midAgg = Caching.persisted(mid.groupBy("g", "bk")
      .agg(count(lit(1)).as("c"), sum("t").as("sx"), sum("v").as("sy")))
    val first = big.filter(col("rn") === 1).select(col("g"), col("t"), col("v"))
    val last = big.filter(col("rn") === col("n")).select(col("g"), col("t"), col("v"))

    var prev = first
    var picks = Vector(first)
    for (k <- 0 until nBuckets - 2) {
      val nxt =
        if (k < nBuckets - 3)
          midAgg.filter(col("bk") === (k + 1))
            .select(col("g"), col("c"), col("sx"), col("sy"))
        else
          last.select(col("g"), lit(1L).as("c"), col("t").as("sx"),
            col("v").as("sy"))
      // persist every pick: stage k's lineage is embedded in stage k+1's
      // broadcast AND in the final union, so without the cache the pick
      // chain re-executes quadratically (measured 21s → ~1s at sf0.1)
      val pick = Caching.persisted(mid.filter(col("bk") === k)
        .join(broadcast(prev.select(col("g"), col("t").as("px"), col("v").as("py"))), "g")
        .join(broadcast(nxt), "g")
        .withColumn("a", abs(
          (col("px") * col("c") - col("sx")) * (col("v") - col("py")) -
            (col("px") - col("t")) * (col("sy") - col("py") * col("c"))))
        .groupBy("g")
        .agg(max_by(struct(col("t"), col("v")),
          struct(col("a"), (-col("t")).as("nt"), (-col("v")).as("nv"))).as("p"))
        .select(col("g"), col("p.t").as("t"), col("p.v").as("v")))
      picks = picks :+ pick
      prev = pick
    }
    picks = picks :+ last
    val bigOut = picks.zipWithIndex.map { case (d, i) =>
      d.select(col("g"), lit(i).as("sel"), col("t"), col("v"))
    }.reduce(_.union(_))
    small.union(bigOut)
  }

  /** `deltaSum` — the reference engine family's positive-delta
    * accumulator: per key, the sum of increases of an ordered series
    * (counter-reset-tolerant rate reads). The order MUST be total —
    * `(t, id)` with a unique id tiebreak — or the lag pairs are
    * nondeterministic and the figure un-oracleable. Exact int64 (cents
    * in, cents out); first row of a key contributes 0 by definition.
    *
    * Shape: one shuffle on the key, one lag pass, one aggregation. At
    * 100 TB the same figure is served from a day summary instead — see
    * [[deltaSumFromDaySummary]]: the state `(first, last, inner)` merges
    * associatively across ordered day spans, so per-day partial states
    * maintain under append without re-reading the stream. */
  def deltaSum(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("t", "id")
    df.select(col(keyCol).as("k"), col(tsCol).as("t"), col(idCol).as("id"),
        col(valCol).as("v"))
      .withColumn("prev", lag(col("v"), 1).over(w))
      .withColumn("step",
        when(col("prev").isNull, lit(0L))
          .otherwise(greatest(col("v") - col("prev"), lit(0L))))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("step")).as("delta_sum"))
  }

  /** [[deltaSum]] served from per-day partial states — the mergeable
    * form. A day's state under the `(t, id)` order is
    * `(first_v, last_v, inner)` where `inner` is the deltaSum within the
    * day; two ADJACENT spans merge as
    * `inner(a⊕b) = inner(a) + inner(b) + max(0, first_v(b) − last_v(a))`
    * — associative over ordered spans, so day states fold left-to-right
    * with a lag window over O(days) rows. Same economics as
    * [[decayedSumFromDaySummary]]: maintain O(keys × days) state under
    * append, never rescan the stream to read. */
  def deltaSumFromDayStates(dayStates: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy("day")
    dayStates
      .withColumn("prev_last", lag(col("last_v"), 1).over(w))
      .withColumn("bridge",
        when(col("prev_last").isNull, lit(0L))
          .otherwise(greatest(col("first_v") - col("prev_last"), lit(0L))))
      .groupBy(keyCol)
      .agg(sum(col("n")).as("n"),
        sum(col("inner") + col("bridge")).as("delta_sum"))
  }
}
