package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer Lloyd's k-means over an embedding corpus — the TRAINER
  * behind the ANN family's codebooks (SURVEY.md §2.11): x12/x33/x48 run
  * over PINNED centroids (the production shape — a build-time fit frozen
  * as data); this operator is where such centroids come from, expressed so
  * the whole fit replays bit-for-bit in any engine.
  *
  * Exactness: embeddings are quantized once to int64 "e6" units
  * (`floor(x·1e6 + 0.5)`, the money rule on the embedding axis). Distances
  * are exact integer Σ(v−c)²; centroid updates are integer means
  * (`sum DIV count` — Spark's `DIV` and DuckDB's `//` both truncate toward
  * zero, verified, so the recurrence is engine-identical); argmin ties
  * break to the lowest centroid id. No IEEE accumulation order anywhere —
  * the one thing that makes a float k-means un-oracleable.
  *
  * Scale shape (the classic distributed Lloyd's): the quantized corpus is
  * long-form `(vec_id, dim, v)` — persisted once, reused every iteration.
  * Each iteration is (1) a BROADCAST join against the O(k·dim) centroid
  * table + one hash aggregation to `(vec_id, cid, dist)` with map-side
  * combine, (2) an argmin by `min(struct(d, cid))` — an aggregate, not a
  * window, so no per-vector sort — and (3) a per-(cid, dim) sum for the
  * new means. Nothing is ever collected to the driver; centroids stay a
  * DataFrame end-to-end, and rank lineage is cut per iteration with
  * `localCheckpoint` (O(k·dim) rows). Per-iteration shuffle volume is
  * O(N·k) distance rows + O(N·dim) update rows — the textbook k-means
  * cost, independent of iteration count. (Optimization r16 note: a
  * vec_id co-partition of the cached corpus — which would let the
  * assignment aggregations and the update join skip their exchanges —
  * was measured at sf0.1 and REGRESSED min-of-2 sweeps by ~+0.6 s per
  * trainer: pinning the cached partitioning forces sort-merge machinery
  * where the planner otherwise broadcasts the O(N)-row assignment side
  * and lets AQE size the aggregation exchanges; reverted, decision
  * recorded here.)
  *
  * Overflow bounds (int64): |v| ≤ 1e6 ⇒ per-dim squared diff ≤ 4e12,
  * per-pair dist ≤ dim·4e12 ≈ 3e15 at dim 768; per-(cid,dim) sums are
  * |v|·N. Inertia is reported in e6-scaled units so corpus-level sums stay
  * bounded at any N. Empty clusters keep their previous centroid (the
  * deterministic rule, applied identically in the oracle).
  *
  * Both trainers return a tracked `localCheckpoint` — callers own a
  * [[Caching.releaseAll]] after consuming the result (see
  * [[Caching.trackCheckpoint]]).
  */
object KMeansInt {

  /** Long-form e6-quantized embeddings `(vec_id, i, v)`. */
  def quantized(embs: DataFrame, vecCol: String): DataFrame =
    embs
      .select(col("vec_id"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        floor(col("x").cast("double") * lit(1000000.0) + lit(0.5)).cast("long").as("v"))

  /** One assignment pass: each vector's nearest centroid by exact integer
    * squared L2, ties to the lowest cid. `cdf` is `(cid, i, c)`. */
  private def assign(qv: DataFrame, cdf: DataFrame): DataFrame =
    qv.join(broadcast(cdf), "i")
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d").as("d"))

  /** One PQ assignment pass: nearest centroid PER SUBSPACE (`sub = i DIV
    * subDim`) by exact integer squared L2 over that subspace's dims only,
    * ties to the lowest cid. Same join as [[assign]] — the subspace split
    * is a grouping key, not m separate jobs. */
  private def assignPq(qv: DataFrame, cdf: DataFrame): DataFrame =
    qv.join(broadcast(cdf), "i")
      .groupBy(col("vec_id"), col("sub"), col("cid"))
      .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d"))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d"), col("cid"))).as("m"))
      .select(col("vec_id"), col("sub"),
        col("m.cid").as("cid"), col("m.d").as("d"))

  /** The PQ TRAINER: k-means per `subDim`-wide subspace — where the
    * x33/x48 codebooks come from, completing the trained-artifact loop
    * (R68 trains coarse IVF centroids; this trains the product codebooks).
    * A PQ codebook is m INDEPENDENT per-subspace fits; expressing `sub`
    * as a grouping key trains all of them in the SAME broadcast join +
    * aggregations a single fit costs — per iteration one O(N·k·m)
    * distance aggregation and one O(N·dim) mean update, not m jobs.
    * Centroid row (cid, i) holds subspace `i DIV subDim`'s entry `cid`,
    * so the table is the concatenated codebook family. Same exact-integer
    * recurrence, tie, and empty-cluster rules as [[fit]], so the whole
    * training replays bit-for-bit in the oracle.
    *
    * Returns final per-(sub, cid) stats `(sub, cid, n, centroid_sum,
    * inertia_e6)`, ordered. */
  def fitPq(spark: SparkSession, embs: DataFrame, vecCol: String,
      subDim: Int, k: Int, iters: Int): DataFrame = {
    val qv = Caching.persisted(quantized(embs, vecCol)
      .withColumn("sub", expr(s"i DIV $subDim")))
    val init = embs.select("vec_id").orderBy("vec_id").limit(k)
      .select(col("vec_id"),
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int").as("cid"))
    var c = qv.join(init, "vec_id")
      .select(col("cid"), col("i"), col("v").as("c"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val a = assignPq(qv, c)
      val sums = qv.join(a.select("vec_id", "sub", "cid"), Seq("vec_id", "sub"))
        .groupBy("cid", "i")
        .agg(expr("sum(v) DIV count(1)").as("cnew"))
      val prev = c
      c = c.join(sums, Seq("cid", "i"), "left")
        .select(col("cid"), col("i"), coalesce(col("cnew"), col("c")).as("c"))
        .localCheckpoint()
      Caching.releaseCheckpoint(prev) // superseded iteration's checkpoint
    }
    Caching.trackCheckpoint(c) // final codebook: released post-query
    val fin = assignPq(qv, c)
    val stats = fin.groupBy("sub", "cid").agg(
      count(lit(1)).as("n"),
      sum(expr("d DIV 1000000")).as("inertia_e6"))
    val csum = c.withColumn("sub", expr(s"i DIV $subDim"))
      .groupBy("sub", "cid").agg(sum("c").as("centroid_sum"))
    stats.join(csum, Seq("sub", "cid"))
      .select(col("sub"), col("cid"), col("n"),
        col("centroid_sum"), col("inertia_e6"))
      .orderBy("sub", "cid")
  }

  /** Fit `iters` Lloyd's iterations from the k lowest-`vec_id` vectors as
    * seeds; returns per-cluster stats of the FINAL assignment:
    * `(cid, n, centroid_sum, inertia_e6)` — size, the centroid's summed e6
    * coordinates (the compact fingerprint of k·dim values), and e6-scaled
    * inertia. One row per non-empty final cluster, ordered by cid. */
  def fit(spark: SparkSession, embs: DataFrame, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val qv = Caching.persisted(quantized(embs, vecCol))
    val init = embs.select("vec_id").orderBy("vec_id").limit(k)
      .select(col("vec_id"),
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int").as("cid"))
    var c = qv.join(init, "vec_id")
      .select(col("cid"), col("i"), col("v").as("c"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val a = assign(qv, c)
      val sums = qv.join(a.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "i")
        .agg(expr("sum(v) DIV count(1)").as("cnew"))
      val prev = c
      c = c.join(sums, Seq("cid", "i"), "left")
        .select(col("cid"), col("i"), coalesce(col("cnew"), col("c")).as("c"))
        .localCheckpoint() // cut lineage: next plan starts from O(k·dim) rows
      Caching.releaseCheckpoint(prev) // superseded iteration's checkpoint
    }
    Caching.trackCheckpoint(c) // final centroids: released post-query
    val fin = assign(qv, c)
    val stats = fin.groupBy("cid").agg(
      count(lit(1)).as("n"),
      sum(expr("d DIV 1000000")).as("inertia_e6"))
    val csum = c.groupBy("cid").agg(sum("c").as("centroid_sum"))
    stats.join(csum, "cid")
      .select(col("cid"), col("n"), col("centroid_sum"), col("inertia_e6"))
      .orderBy("cid")
  }
}
