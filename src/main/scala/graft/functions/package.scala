package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.SparkShim
import org.apache.spark.sql.functions._

import graft.expressions.{AudioHashExpr, DotProductExpr, FreqAggExpr, GraftExtensions, ImageAHashExpr, IsIPv4, IsIPv6, IvfProbesExpr, L2NormExpr, LshBucketExpr, MapAggExpr, NearestCellExpr, ParseDnsAnswer, PqEncodeExpr, PqEncodeResidualExpr, PqLutExpr, TopKAggExpr, VecScaleExpr}

/** Column-level function surface of the engine (SURVEY.md §2.9).
  *
  * Everything expressible with built-in `org.apache.spark.sql.functions` is a
  * pure-Column composition; the three functions Spark genuinely lacks — DNS
  * wire parse, strict IPv4/IPv6 string predicates
  * (`/root/reference/src/collector.py:29-41`, `/root/reference/README.md:148`)
  * — are native codegen'd Catalyst expressions over the pure `graft.dns`
  * kernel ([[graft.expressions]]), so they stay inside WholeStageCodegen
  * instead of breaking it at a UDF boundary.
  */
package object functions {

  private def ncol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    SparkShim.column(e)
  private def nexpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    SparkShim.expression(c)

  // ---------------------------------------------------------------- net ----

  /** Strict dotted-quad predicate — ClickHouse `isIPv4String` / netaddr
    * `valid_ipv4` semantics. */
  def is_ipv4(c: Column): Column = ncol(IsIPv4(nexpr(c)))

  /** Pure-string IPv6 predicate (never resolves). */
  def is_ipv6(c: Column): Column = ncol(IsIPv6(nexpr(c)))

  /** Last label of a dotted name — ClickHouse
    * `arrayRotateRight(splitByChar('.',QH),1)[1]`
    * (`/root/reference/README.md:145`) re-expressed with built-ins only:
    * `element_at(split(qh, '\\.'), -1)`. */
  def tld(qh: Column): Column = element_at(split(qh, "\\.", -1), -1)

  /** Generic "last token" for a custom separator (harness recasts the TLD
    * logic over space-separated columns of the test corpus). */
  def lastToken(c: Column, sepRegex: String): Column =
    element_at(split(c, sepRegex, -1), -1)

  /** The reference's compound TLD-eligibility filter
    * (`/root/reference/README.md:148`): multi-label AND not an IP literal. */
  def tldEligible(qh: Column): Column =
    size(split(qh, "\\.", -1)) > 1 && !is_ipv4(qh) && !is_ipv6(qh)

  // ---------------------------------------------------------------- dns ----

  /** Parse a base64 DNS wire message into (rcode, rdatas, rdatas6, cnames) —
    * the collector's `parse_dns_record` (`/root/reference/src/collector.py:29-41`)
    * as one fused column function: single parse, struct-of-arrays out.
    * Malformed input → null struct (caller decides drop vs default),
    * mirroring the per-row exception barrier (collector.py:76-78).
    * try_to_binary (not unbase64): invalid base64 must become null for the
    * corrupt-record channel, not an ANSI runtime error killing the batch. */
  def parse_answer(b64: Column): Column =
    ncol(ParseDnsAnswer(nexpr(try_to_binary(b64, lit("base64")))))

  // --------------------------------------------------------------- time ----

  /** Floor an epoch-nanosecond Long column (named `colName`) to
    * `minutes`-minute buckets, returning epoch seconds — ClickHouse
    * `toStartOfInterval(t, toIntervalMinute(m))`
    * (`/root/reference/README.md:122`). Integer `DIV` only: epoch-nanos
    * exceed 2^53, so any double arithmetic would corrupt low bits. */
  def bucketStartSecFromNanos(colName: String, minutes: Int): Column = {
    val wNanos = minutes * 60L * 1000000000L
    expr(s"($colName DIV $wNanos) * ${minutes * 60L}").cast("long")
  }

  /** Same bucketing over a TimestampType column (seconds fit doubles exactly,
    * so `floor` is safe here). */
  def bucketStartSec(ts: Column, minutes: Int): Column = {
    val w = minutes * 60L
    (floor(unix_timestamp(ts) / w) * w).cast("long")
  }

  // ------------------------------------------------------- parity round ----

  /** Cross-engine-deterministic rounding: `floor(x·10ⁿ + 0.5)/10ⁿ`.
    * Built-in `round(x, n)` implementations disagree on boundary doubles
    * (Spark rounds the shortest decimal repr via BigDecimal, DuckDB
    * multiplies and rounds: 0.48625 → 0.4863 vs 0.4862). This form is the
    * same IEEE expression in any engine, so identical inputs give identical
    * outputs — which is what oracle parity needs. (Negative values round
    * half-toward-minus-infinity; irrelevant for parity.) */
  def pround(c: Column, decimals: Int): Column = {
    val f = math.pow(10, decimals)
    floor(c * f + 0.5) / f
  }
  def pround4(c: Column): Column = pround(c, 4)
  def pround6(c: Column): Column = pround(c, 6)

  /** Exact integer cents: `floor(x·100 + 0.5)` as int64. Both engines run
    * the identical IEEE multiply+add+floor, after which every downstream op
    * (sums, products) is exact int64 arithmetic — no double→DECIMAL cast
    * appears anywhere. That cast is the round-1/round-2 driver-red class:
    * the driver's DuckDB casts boundary doubles to DECIMAL differently from
    * both Spark and local DuckDB 1.0, so cast-parity tuning is untestable
    * locally; integer cents sidestep engine decimal semantics entirely.
    * Headroom: cents ≤ 1e7 per value, ×100 for discount-products ≤ 1e9 per
    * row — int64 sums hold to ~9e9 rows per group. Non-finite input
    * (NaN/±Inf) maps to NULL on BOTH engines — without the guard Spark's
    * NaN→long cast and DuckDB's CAST(floor(NaN) AS BIGINT) disagree
    * (silent 0 / ANSI error vs conversion error). */
  def cents(c: Column): Column =
    when(isnan(c) || abs(c) === lit(Double.PositiveInfinity), lit(null).cast("long"))
      .otherwise(floor(c * 100d + 0.5).cast("long"))

  /** The DuckDB-side fragment equivalent to [[cents]]. (DuckDB `floor`
    * returns DOUBLE and `sum(BIGINT)` returns HUGEINT — oracle SQL must
    * CAST both the cents and the final sum back to BIGINT.) */
  def centsSql(x: String): String =
    s"CASE WHEN isnan($x) OR isinf($x) THEN NULL ELSE CAST(floor(($x) * 100.0 + 0.5) AS BIGINT) END"

  /** The DuckDB-side fragment equivalent to [[pround]]. */
  def duckRound(exprSql: String, decimals: Int): String = {
    val f = math.pow(10, decimals).toLong
    s"floor(($exprSql) * $f.0 + 0.5) / $f.0"
  }

  /** Dotted-quad IPv4 → numeric (the engine family's `IPv4StringToNum`):
    * `a·2²⁴ + b·2¹⁶ + c·2⁸ + d`, all codegen'd builtins (split + casts).
    * No validity screen, but NULL-total on malformed input even under
    * ANSI: `try_element_at`/`try_cast` turn a short quad or non-numeric
    * octet into NULL (which propagates through the sum) instead of the
    * INVALID_ARRAY_INDEX / cast error plain element_at+cast would throw.
    * Gate with `is_ipv4` when "1.2.3.4.5" must also be rejected — the
    * arithmetic here happily sums the first four octets of a 5-quad. */
  def ipv4Num(ip: Column): Column = {
    val p = split(ip, "\\.")
    try_element_at(p, lit(1)).try_cast("long") * lit(16777216L) +
      try_element_at(p, lit(2)).try_cast("long") * lit(65536L) +
      try_element_at(p, lit(3)).try_cast("long") * lit(256L) +
      try_element_at(p, lit(4)).try_cast("long")
  }

  /** Numeric IPv4 → its /prefix network address rendered as
    * `a.b.c.d/prefix` (`IPv4NumToString(IPv4CIDRToRange(...))`): mask by
    * integer division (2³²⁻ᵖ), rebuild octets with DIV/% — exact int64,
    * replayable in any engine. */
  def cidrString(num: Column, prefix: Int): Column = {
    require(prefix >= 0 && prefix <= 32, s"bad prefix $prefix")
    val net = num - (num % lit(1L << (32 - prefix)))
    concat(
      (shiftright(net, 24) % lit(256L)).cast("string"), lit("."),
      (shiftright(net, 16) % lit(256L)).cast("string"), lit("."),
      (shiftright(net, 8) % lit(256L)).cast("string"), lit("."),
      (net % lit(256L)).cast("string"), lit(s"/$prefix"))
  }

  // -------------------------------------------------------------- hash ----

  /** Oracle-reproducible 64-bit hash: the first 16 hex chars of md5 as a
    * signed long (hi/lo 32-bit halves via `conv`, joined bitwise so no ANSI
    * overflow). ~3× the cost of xxhash64 but derivable in any engine with
    * md5+substr — used where a cross-engine oracle must replay the hash
    * (SimHash signatures; same rationale as the md5-windowed MinHash). */
  def md5Hash64(c: Column): Column = {
    val m = md5(c)
    val hi = conv(substring(m, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(m, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** Signed int64 → uniform (0,1) position: `(h + 2⁶³) / 2⁶⁴` (both
    * constants exactly representable doubles; both engines run the
    * identical long→double cast, add, divide). ONE copy of the arithmetic
    * shared by the KMV sketch and the sampling/split operators — its SQL
    * mirror is `ExtQueries.duckUnitInterval`. */
  def unitInterval(h: Column): Column =
    (h.cast("double") + lit(9223372036854775808.0)) / lit(1.8446744073709552e19)

  // ------------------------------------------------------------ vectors ----

  /** Dot product of two `array<double>` columns — a native codegen'd
    * expression ([[graft.expressions.DotProductExpr]]), replacing the
    * round-1 `aggregate(zip_with(...))` form: Spark's higher-order
    * functions are CodegenFallback (interpreted lambda + intermediate
    * array per row), which dominated the pair-heavy similarity queries.
    * Identical accumulation order → bit-identical results. */
  def dotProduct(a: Column, b: Column): Column =
    ncol(DotProductExpr(nexpr(a), nexpr(b)))

  /** L2 norm (native codegen'd expression). */
  def l2Norm(a: Column): Column = ncol(L2NormExpr(nexpr(a)))

  /** Element-wise `a / d` (native codegen'd; the divisor evaluates once
    * per row — the `transform` HOF form re-evaluated an embedded l2Norm
    * per ELEMENT, O(dim²) interpreted work on every normalization pass). */
  def vecScale(a: Column, d: Column): Column = ncol(VecScaleExpr(nexpr(a), nexpr(d)))

  /** Sign-random-projection bucket id against a literal hyperplane matrix
    * ([[graft.expressions.LshBucketExpr]]) — same bit order as the
    * `aggregate`-HOF fold it replaces (plane 0 = MSB), fully codegen'd. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    ncol(LshBucketExpr(nexpr(v), planes))

  /** Per-subspace PQ codes against a pinned codebook carried as plan DATA
    * ([[graft.expressions.PqEncodeExpr]]) — constant expression size in
    * codebook k, unlike the retired literal-CASE recipe. */
  def pqEncode(nv: Column, sub: Seq[Seq[Seq[Double]]]): Column =
    ncol(PqEncodeExpr(nexpr(nv), sub))

  /** Query-side ADC lookup table (array of m·ksub dots) against a pinned
    * codebook carried as plan data ([[graft.expressions.PqLutExpr]]). */
  def pqLut(nv: Column, sub: Seq[Seq[Seq[Double]]]): Column =
    ncol(PqLutExpr(nexpr(nv), sub))

  /** Residual PQ codes (IVFADC) of `nv − c(bucket)` against a pinned
    * residual codebook ([[graft.expressions.PqEncodeResidualExpr]]). */
  def pqEncodeResidual(nv: Column, bucket: Column, centers: Seq[Seq[Double]],
      sub: Seq[Seq[Seq[Double]]]): Column =
    ncol(PqEncodeResidualExpr(nexpr(nv), nexpr(bucket), centers, sub))

  /** 64-bit perceptual average-hash of a BMP binary column
    * ([[graft.expressions.ImageAHashExpr]]) — decode + 8×8 cell-sum hash
    * as one codegen'd per-row kernel; null for malformed images. */
  def imageAHash(payload: Column): Column = ncol(ImageAHashExpr(nexpr(payload)))

  /** 64-bit perceptual energy-envelope hash of a PCM16 WAV binary column
    * ([[graft.expressions.AudioHashExpr]]). */
  def audioHash(payload: Column): Column = ncol(AudioHashExpr(nexpr(payload)))

  /** Nearest IVF cell id against a pinned centroid matrix carried as plan
    * data ([[graft.expressions.NearestCellExpr]]) — bit-identical
    * arithmetic and tie-break to the literal when-chain it replaces. */
  def nearestCell(nv: Column, centers: Seq[Seq[Double]]): Column =
    ncol(NearestCellExpr(nexpr(nv), centers))

  /** The `nprobe` nearest IVF cell ids in (dist², id) order
    * ([[graft.expressions.IvfProbesExpr]]). */
  def ivfProbes(nv: Column, centers: Seq[Seq[Double]], nprobe: Int): Column =
    ncol(IvfProbesExpr(nexpr(nv), centers, nprobe))

  /** Cosine similarity of two dense double vectors. `try_divide`: a
    * zero-norm (degenerate) vector yields NULL similarity rather than an
    * ANSI divide-by-zero error killing the job — callers treat null score
    * as "no similarity" (filters reject it, top-k skips it). */
  def cosineSim(a: Column, b: Column): Column =
    try_divide(dotProduct(a, b), l2Norm(a) * l2Norm(b))

  /** Exact bounded top-k aggregate: array of (id, score) structs ordered
    * score desc, id asc — [[graft.expressions.TopKAggExpr]], a native
    * `TypedImperativeAggregate` over a mutable primitive buffer. */
  def topK(id: Column, score: Column, k: Int): Column =
    ncol(TopKAggExpr(nexpr(id), nexpr(score), k).toAggregateExpression())

  /** Z-ORDER value of two non-negative long columns: interleave the low
    * `bits` bits (a → even positions, b → odd), so lexicographic order
    * on the result approximates locality in BOTH dimensions — the
    * multi-column clustering key for write-time layout
    * ([[graft.operators.ZOrder]]): files/row-groups sorted by z carry
    * tight min/max stats on each dimension, and a 2-dim filter skips
    * row groups that a single-column sort could only prune on its lead
    * column. Pure shifts/masks/ors — codegen'd, and replayable in any
    * engine with bitwise SQL. */
  def zOrder2(a: Column, b: Column, bits: Int = 16): Column =
    zOrderN(Seq(a, b), bits)

  /** N-dimensional Z-ORDER value: bit `i` of dimension `d` lands at
    * position `i·n + d` (dim 0 → lowest position of each group), the
    * direct generalization of [[zOrder2]] — log-data reads routinely
    * filter 3 dimensions (client × domain × time), and a 3-dim z layout
    * bounds ALL THREE per row group. `n·bits` must fit a signed long;
    * narrow `bits` as dimensions grow (range-fold each dim first). */
  def zOrderN(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.size >= 2, "zOrderN needs at least 2 dimensions")
    require(cols.size * bits <= 63, s"${cols.size} dims x $bits bits overflow a signed long")
    val n = cols.size
    (for { i <- 0 until bits; (c, d) <- cols.zipWithIndex } yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + d))
      .reduceLeft(_ bitwiseOR _)
  }

  /** Approximate heavy hitters (Misra-Gries, ≤ k counters): array of
    * (item, est) structs ordered est desc, item asc —
    * [[graft.expressions.FreqAggExpr]]. Every item with true frequency
    * above n/(k+1) is guaranteed present; estimates are within n/(k+1)
    * below the true count (pinned in SketchAccuracySpec). */
  def heavyHitters(item: Column, k: Int): Column =
    ncol(FreqAggExpr(nexpr(item), k).toAggregateExpression())

  /** `topKWeighted` — weighted Misra-Gries over (item, long weight)
    * pairs, same buffer/guarantees scaled to total weight W
    * ([[graft.expressions.WeightedFreqAggExpr]]); exact when the
    * group's vocabulary fits k counters. */
  def heavyHittersWeighted(item: Column, weight: Column, k: Int): Column =
    ncol(graft.expressions.WeightedFreqAggExpr(nexpr(item), nexpr(weight), k)
      .toAggregateExpression())

  /** Key-wise map aggregation (ClickHouse sumMap/minMap/maxMap): each row
    * contributes (key, value); result is key-sorted (key, val) entries
    * with values folded under `op` ∈ sum|min|max —
    * [[graft.expressions.MapAggExpr]]. Deterministic (commutative folds +
    * sorted output), hence oracle-hashable, unlike the sketch aggs. */
  def mapAgg(key: Column, value: Column, op: String = "sum"): Column =
    ncol(MapAggExpr(nexpr(key), nexpr(value), MapAggExpr.opOf(op))
      .toAggregateExpression())

  // ------------------------------------------------------- registration ----

  /** Register the native functions for `spark.sql(...)` use on a live
    * session; new sessions can instead set
    * `spark.sql.extensions=graft.expressions.GraftExtensions`. */
  def registerAll(spark: SparkSession): Unit = GraftExtensions.register(spark)
}
