package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over corpus-derived graphs (SURVEY.md §2.11 extension
  * family): weighted PageRank with a FIXED iteration count in exact int64
  * arithmetic, so the result replays bit-for-bit in any engine — the
  * iterative-computation member of the pipeline-operator family (vocabulary
  * importance for tokenizer/stopword decisions is the training-data use;
  * the same kernel ranks domains on a click graph).
  *
  * Scale shape: the corpus is touched ONCE — edge extraction is a per-doc
  * projection (adjacent-token zip) + one hash aggregation shuffling
  * `(src, dst, count)` tuples, never texts. Each PageRank iteration is then
  * one shuffle join of the O(V) rank table against the O(E) edge table plus
  * one hash aggregation — independent of corpus size. Rank lineage is cut
  * per iteration with `localCheckpoint` (O(V) rows), so K iterations never
  * stack K joins into one Catalyst plan.
  *
  * Exactness: ranks are integer "picoranks" (total mass T = 1e12). Each
  * edge carries its out-weight share in ppm — `(c·1e6) DIV W(u)`, bounded
  * ≤ 1e6 — so the per-edge contribution `(r·share) DIV 1e6` stays below
  * 1e18 regardless of corpus size (raw `r·c` would overflow int64 once an
  * edge count passes ~9e6 at 100 TB). Truncation leaks ≤ |E|·1e-6 of mass
  * per iteration — deterministic, identical in every engine, and irrelevant
  * to ordering at vocabulary scale. Dangling nodes (no out-edges) simply
  * leak their mass: the standard simplification, applied identically on
  * both sides of the oracle.
  */
object Graph {

  /** Directed token-adjacency edges `(src, dst, c)` of a corpus: one row
    * per DISTINCT adjacent pair with its occurrence count. Adjacent-token
    * zip is two slices of the per-doc token array (codegen'd), then one
    * count aggregation with map-side combine. */
  def tokenEdges(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(TextOps.tokens(col(textCol)).as("w"))
      .select(
        slice(col("w"), lit(1), size(col("w")) - 1).as("a"),
        expr("slice(w, 2, size(w) - 1)").as("b"))
      .select(explode(arrays_zip(col("a"), col("b"))).as("p"))
      .select(col("p.a").as("src"), col("p.b").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))

  /** Total rank mass: 1e12 "picoranks" — small enough that every product
    * in the update rule stays inside int64 (see class doc). */
  val TotalMass: Long = 1000000000000L

  /** Weighted PageRank over an edge table `(src, dst, c)`, damping 85/100,
    * `iters` fixed iterations. Returns `(token, rank_e12)` for every node
    * (sources and sinks alike). Exact int64 arithmetic throughout:
    *
    *   r0(v)    = T DIV n
    *   share    = (c · 1e6) DIV W(src)           (per-edge, precomputed)
    *   s(v)     = Σ_{u→v} (r(u) · share) DIV 1e6
    *   r'(v)    = (15·(T DIV n)) DIV 100 + (85·s(v)) DIV 100
    *
    * Iteration shape (optimization r16, guide §2.4/§3.1): the rank table
    * is O(V) — the small side by construction — so each iteration joins
    * `ew ⋈ broadcast(r)`: the O(E) edge table never shuffles, the whole
    * K-iteration recurrence is ONE lazy plan (K nested broadcast stages,
    * no per-iteration driver job), and the per-iteration left join that
    * re-attached dangling nodes is replaced by a UNION with the
    * once-computed no-in-edge node set (their rank is exactly `base`
    * every iteration — same int64 value, join eliminated). Measured at
    * sf0.1: x52 2.94 s → see OPTIMIZATION_r16.md; plan went from
    * 5 eager checkpoint jobs × (2 shuffle joins + 1 agg) to 1 lazy job
    * with 5 broadcast+agg stages.
    *
    * `broadcastNodesMax` guards the broadcast: past it (V too big for a
    * broadcast relation — the 100 TB click-graph case) the recurrence
    * falls back to the r15 shuffle-join + per-iteration `localCheckpoint`
    * form, whose final state is a tracked checkpoint. Both paths compute
    * identical int64 ranks; callers own a [[Caching.releaseAll]] after
    * consuming the result.
    *
    * Broadcast-path memory (ADVICE r16): the lazy plan holds one
    * broadcast relation of ≤ `broadcastNodesMax` rank rows ALIVE PER
    * ITERATION (no lineage cut), so peak driver+executor footprint
    * scales as `iters × O(V ≤ max)` — at the 4M default and ~32 B/row
    * that is ~130 MB × iters. Size `broadcastNodesMax` down when raising
    * `iters` well past the engine's single-digit defaults, or the
    * fallback path (O(V) checkpoint per iteration, lineage cut) is the
    * right shape. */
  def pageRank(spark: SparkSession, edges: DataFrame, iters: Int,
      broadcastNodesMax: Long = 4000000L): DataFrame = {
    // per-edge ppm share of the source's out-weight; persisted — it is
    // joined once per iteration
    val outw = edges.groupBy("src").agg(sum("c").as("wout"))
    val ewBase = edges.join(outw, "src")
      .select(col("src"), col("dst"),
        expr("(c * 1000000L) DIV wout").as("share_ppm"))
    // node set straight from the raw edges (outw keeps every src, so the
    // join drops no endpoint — same set, one join fewer to compute)
    val nodes = Caching.persisted(
      edges.select(col("src").as("token"))
        .union(edges.select(col("dst").as("token"))).distinct())
    // one O(V) scalar job at build time (the BPE trained-artifact pattern):
    // n parameterizes every iteration's base term as a literal — and
    // decides the path BEFORE the edge cache is laid down, so the dst
    // pre-partition below is paid only where it helps
    val n = nodes.count()
    val base = 15L * (TotalMass / n) / 100L
    // BROADCAST PATH ONLY: partitioned by dst BEFORE the persist — every
    // iteration's contribution aggregation groups by dst, so the cached
    // partitioning satisfies it and the per-iteration exchange disappears
    // (guide §2.4 "two operations keyed the same way share one
    // exchange"); the edge shuffle is paid once at build, not once per
    // iteration. The FALLBACK path joins ew by src each iteration (the
    // join re-shuffles regardless), so a dst build exchange would be pure
    // cost there (ADVICE r16) — it caches ewBase as produced.
    val ew = Caching.persisted(
      if (n <= broadcastNodesMax) ewBase.repartition(col("dst")) else ewBase)

    var r = nodes.select(col("token"), lit(TotalMass / n).as("r"))
    if (n <= broadcastNodesMax) {
      // nodes with no in-edge receive no contribution in ANY iteration:
      // their rank is the constant base term, re-attached by union below
      val noIn = Caching.persisted(
        nodes.join(ew.select(col("dst").as("token")).distinct(),
          Seq("token"), "left_anti"))
      for (_ <- 1 to iters) {
        val s = ew.join(broadcast(r), ew("src") === r("token"))
          .select(col("dst"), expr("(r * share_ppm) DIV 1000000L").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("s"))
          .select(col("dst").as("token"),
            (lit(base) + expr("(85L * s) DIV 100L")).as("r"))
        r = s.union(noIn.select(col("token"), lit(base).as("r")))
      }
      r.select(col("token"), col("r").as("rank_e12"))
    } else {
      for (_ <- 1 to iters) {
        val s = ew.join(r, ew("src") === r("token"))
          .select(col("dst"), expr("(r * share_ppm) DIV 1000000L").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("s"))
        val prev = r
        r = nodes.join(s, nodes("token") === s("dst"), "left")
          .select(col("token"),
            (lit(base) + expr("(85L * coalesce(s, 0L)) DIV 100L")).as("r"))
          .localCheckpoint() // cut lineage: next plan starts from O(V) rows
        Caching.releaseCheckpoint(prev) // superseded iteration (no-op on iter 1)
      }
      Caching.trackCheckpoint(r) // final state: released post-query by releaseAll
      r.select(col("token"), col("r").as("rank_e12"))
    }
  }
}
