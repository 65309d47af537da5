package graft.plans

import graft.SparkTestBase
import graft.tools.PlanSweep

/** Plan regression guard over EVERY harness query (VERDICT r5 task 3):
  * fails if any query plans a CartesianProduct, an unexpected
  * BroadcastNestedLoopJoin, or a CodegenFallback expression outside the
  * justified allowlist. Plans are BUILT, not executed — fallback
  * expressions and join strategy are decided at planning time, so the
  * whole sweep is seconds. The measured per-query evidence table
  * (exchanges / wscg spans, which need execution) lives in
  * ARCHITECTURE §3, produced by [[graft.tools.PlanSweep]]. */
class PlanGuardSpec extends SparkTestBase {

  /** Every class here is justified per-ROW or per-GROUP work — none sits
    * in a per-PAIR hot path (the scale killer the guard exists for):
    *  - JsonToStructs: the single-parse querylog decode (S2) — inherent
    *    to `from_json`, one parse per input line by design.
    *  - Percentile / ApproximatePercentile / HyperLogLogPlusPlus /
    *    CollectList / TopKAggExpr: TypedImperativeAggregates — they run
    *    inside ObjectHashAggregate with mutable buffers; "fallback" is
    *    how Spark classifies ALL imperative aggregates, not a codegen
    *    break in the projection pipeline.
    *  - ArrayFilter / ArrayTransform / ArrayExists / ArraySort (+ their
    *    LambdaFunction / NamedLambdaVariable children): higher-order
    *    lambdas in corpus-prep projections (cast-to-double, NaN screen,
    *    per-doc chunk assembly) — evaluated once per row, never per
    *    candidate pair; the per-pair kernels are the native codegen'd
    *    expressions (VecKernels / ArrKernels / LshBucketExpr). */
  private val allowedFallbacks = Set(
    "JsonToStructs",
    "Percentile", "ApproximatePercentile", "HyperLogLogPlusPlus",
    "CollectList", "TopKAggExpr", "FreqAggExpr", "WeightedFreqAggExpr", "MapAggExpr",
    "PivotFirst", // Spark's own pivot lowering — imperative agg, values-bounded buffer
    "ArrayFilter", "ArrayTransform", "ArrayExists", "ArraySort",
    // ArrayForall + MapFromEntries: the phrase TVF's per-DOC adjacency
    // fold (SqlCatalog.phraseRead) — one map build + one forall per
    // MATCHED doc, never per candidate pair
    "ArrayForAll", "MapFromEntries",
    "LambdaFunction", "NamedLambdaVariable")

  /** Non-equi joins whose broadcast side is provably tiny:
    * x5/x9 broadcast the QUERY set against `vec_id =!= qid` (a non-equi
    * predicate has no hash join); x27 broadcasts the 1-row n_docs
    * aggregate (TextAnalysis.scala scalar crossJoin); x40 broadcasts the
    * 1-row token-budget aggregate (Sampling.mixtureSample); x45
    * broadcasts the 1-row (n_docs, total_len) aggregate
    * (InvertedIndex.bm25TopK scalar crossJoin). */
  private val allowedBnlj = Map(
    "x5_embed_topk" -> 1, "x9_topk_agg" -> 1, "x27_tfidf_topk" -> 1,
    "x64_decayed_sum" -> 1, // 1-row max-day scalar broadcast
    "x95_trailing_actives" -> 1, // 1-row max-day scalar broadcast (d <= mx cut)
    "x99_rfm_segments" -> 7, // all 1-row scalar crossJoins: max-day + 3 quartile-threshold tables (one per RFM dimension, some doubled by AQE stage reuse)
    "x40_mixture_sample" -> 1, "x45_bm25_topk" -> 1,
    // the SQL twin of x45: the TVF body's CROSS JOIN of the 1-row
    // (n_docs, total_len) totals aggregate
    "x136_sql_bm25" -> 1,
    // all 1-row weight-frame scalar broadcasts: since the r16 lazy
    // recurrence the 4 per-iteration crossJoins live in the SAME plan as
    // the final mae read (one BNLJ per GD pass, each over a 1-row frame)
    "x105_sgd_linreg" -> 5,
    "x106_theils_u" -> 1, // 1-row hx × 1-row hxy combine (Profiling.theilsU)
    "x107_decayed_avg" -> 1, // 1-row max-day scalar broadcast (as x64)
    "x115_gap_fill" -> 1) // 1-row grid-range scalar broadcast (TimeSeries.gapFill)

  test("no cartesian, no unlisted BNLJ, no unlisted CodegenFallback in any harness query") {
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      val a = PlanSweep.audit(df.queryExecution.executedPlan, explainStr = "")
      assert(a.cartesians == 0, s"$name plans a CartesianProduct")
      assert(a.bnlj <= allowedBnlj.getOrElse(name, 0),
        s"$name plans ${a.bnlj} BroadcastNestedLoopJoin(s); allowed ${allowedBnlj.getOrElse(name, 0)}")
      val bad = a.fallbacks.toSet -- allowedFallbacks
      assert(bad.isEmpty, s"$name has unlisted CodegenFallback exprs: ${bad.mkString(", ")}")
      graft.operators.Caching.releaseAll()
    }
  }
}
