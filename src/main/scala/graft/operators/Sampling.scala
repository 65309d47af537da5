package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{md5Hash64, unitInterval}

/** Deterministic sampling and dataset splitting (SURVEY.md §2.11 R17) —
  * the reproducibility-critical half of a training-data pipeline: the
  * same row lands in the same sample/split on every rerun, on any
  * cluster size, in any engine, because membership is a pure function of
  * the row's id (md5-derived uniform position, the same primitive as
  * [[Sketches]]), not of RNG state, partitioning, or row order.
  * `df.sample()` guarantees none of those things.
  *
  * Scale shape: both operators are stateless row-wise filters/projections
  * — no shuffle, fully codegen'd, pushed into the scan's batch loop.
  */
object Sampling {

  /** Uniform (0,1) position of `id` under `salt` (distinct salts give
    * independent samples) — [[graft.functions.unitInterval]] over the
    * salted md5 hash. */
  private def uniformPos(id: Column, salt: String): Column =
    unitInterval(md5Hash64(concat(id.cast("string"), lit(salt))))

  /** Keep each row iff its id's uniform position < `fraction` —
    * a deterministic Bernoulli(fraction) sample. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = ":sample"): DataFrame =
    df.filter(uniformPos(col(idCol), salt) < fraction)

  /** Assign every row a train/val/test split by uniform-position
    * thresholds (train: u < trainFrac; val: u < trainFrac+valFrac;
    * else test) — disjoint, exhaustive, and stable under any reordering
    * or re-partitioning of the input. */
  def assignSplit(df: DataFrame, idCol: String, trainFrac: Double,
      valFrac: Double, salt: String = ":split"): DataFrame = {
    val u = uniformPos(col(idCol), salt)
    df.withColumn("split",
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test"))
  }

  /** Per-stratum deterministic Bernoulli sample (SURVEY.md §2.11 R24):
    * keep a row iff its id's uniform position < its stratum's fraction —
    * different sampling rates per group (the rebalancing move of corpus
    * curation), same reproducibility guarantees as
    * [[deterministicSample]]. Stateless row-wise filter: no shuffle, the
    * rate table folds into one codegen'd CASE chain. */
  def stratifiedSample(df: DataFrame, idCol: String, stratCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = ":strat"): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(stratCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(uniformPos(col(idCol), salt) < frac)
  }

  /** N-gram-level decontamination stats (SURVEY.md §2.11 R23) — the
    * standard eval-overlap check one level deeper than
    * [[contaminationStats]]'s exact-text match: a TEST doc is contaminated
    * if ANY of its word `n`-grams appears in ANY TRAIN doc. Shape: both
    * sides explode to (doc, 16-byte md5(gram)) after map-side distinct;
    * the semi-join shuffles gram hashes, never texts, and the hit set
    * collapses to distinct test doc ids before the per-group count. The
    * train side is NOT broadcast (unlike exact-text hashes, the distinct
    * gram set is ~tokens-sized at 100 TB); AQE may still choose broadcast
    * when it fits. */
  def ngramContaminationStats(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, trainFrac: Double, valFrac: Double, n: Int = 8): DataFrame = {
    val sp = Caching.persisted(
      assignSplit(df, idCol, trainFrac, valFrac)
        .select(col(groupCol), col(idCol), col("split"),
          TextOps.shingles(TextOps.tokens(col(textCol)), n).as("grams")))
    val trainGrams = sp.filter(col("split") === "train")
      .select(explode(col("grams")).as("g"))
      .select(md5(col("g")).as("gh")).distinct()
    val hits = sp.filter(col("split") === "test")
      .select(col(idCol), explode(col("grams")).as("g"))
      .select(col(idCol), md5(col("g")).as("gh"))
      .join(trainGrams, Seq("gh"), "left_semi")
      .select(idCol).distinct()
      .withColumn("hit", lit(1L))
    sp.filter(col("split") === "test")
      .join(hits, Seq(idCol), "left")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("test_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("contaminated_ngram"))
  }

  /** Benchmark-decontamination stats: per-`groupCol` count of TEST-split
    * rows whose exact `textCol` md5 also appears in the TRAIN split —
    * the overlap an eval must rule out. At 100 TB the train side
    * collapses to a broadcast of distinct 16-byte hashes; texts never
    * shuffle. */
  def contaminationStats(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, trainFrac: Double, valFrac: Double): DataFrame = {
    val sp = Caching.persisted(
      assignSplit(df, idCol, trainFrac, valFrac)
        .select(col(groupCol), col("split"), md5(col(textCol)).as("h")))
    val train = sp.filter(col("split") === "train")
      .select(col("h")).distinct().withColumn("in_train", lit(1L))
    sp.filter(col("split") === "test")
      .join(broadcast(train), Seq("h"), "left")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("test_docs"),
        sum(coalesce(col("in_train"), lit(0L))).as("contaminated"))
  }

  /** Bloom-filter contamination PRE-FILTER — the 100 TB scale path for
    * [[contaminationStats]]: instead of broadcasting every distinct train
    * text hash (100s of GB at corpus scale), broadcast an `mBits`-slot
    * Bloom bitmap (KB-MB) and probe the test split against it; exact
    * verification then touches only the bitmap's candidates. Bloom
    * membership has NO false negatives (a contaminated doc's k positions
    * are all set by its own train twin — same text ⇒ same positions), so
    * `contaminated ≤ bloom_candidates` always, and
    * `false_positives = bloom_candidates − contaminated` measures the
    * filter's realized fp rate at this fill factor.
    *
    * The bitmap is encoded RELATIONALLY as its set-position table
    * (≤ mBits rows — the oracle-replayable form; a production run ships
    * the same bits as a real bitmap). Positions are double-hashed from
    * two md5-derived int64s, `pos_i = (pa + i·pb) mod m` — deterministic
    * exact integer arithmetic on both engines.
    *
    * Returns per `groupCol`: (test_docs, bloom_candidates, contaminated,
    * false_positives). */
  def bloomContaminationStats(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, trainFrac: Double, valFrac: Double,
      mBits: Int = 65536, k: Int = 3): DataFrame = {
    import graft.functions.md5Hash64
    val m = lit(mBits.toLong)
    val sp = Caching.persisted(
      assignSplit(df, idCol, trainFrac, valFrac)
        .select(col(idCol).as("id"), col(groupCol), col("split"),
          md5(col(textCol)).as("h"),
          pmod(md5Hash64(col(textCol)), m).as("pa"),
          pmod(md5Hash64(concat(col(textCol), lit(":b2"))), m).as("pb")))
    val posCols = (0 until k).map(i => pmod(col("pa") + lit(i.toLong) * col("pb"), m))
    val bits = sp.filter(col("split") === "train")
      .select(explode(array(posCols: _*)).as("pos")).distinct()
      .withColumn("hit", lit(1L))
    val perDoc = Caching.persisted(sp.filter(col("split") === "test")
      .select(col(groupCol), col("id"), col("h"), explode(array(posCols: _*)).as("pos"))
      .join(broadcast(bits), Seq("pos"), "left")
      .groupBy(col(groupCol), col("id"), col("h"))
      .agg((sum(coalesce(col("hit"), lit(0L))) === k).cast("long").as("candidate")))
    // Exact verification consults the train-hash set ONLY for bloom
    // SURVIVORS — the filter's whole point. No false negatives means every
    // contaminated doc IS a candidate, so restricting the exact check to
    // candidates counts the same set; the big train side joins unhinted
    // (candidates are tiny — the optimizer broadcasts them, never the
    // corpus-sized hash set).
    val trainH = sp.filter(col("split") === "train")
      .select(col("h")).distinct().withColumn("in_train", lit(1L))
    val contam = perDoc.filter(col("candidate") === 1L)
      .join(trainH, Seq("h"), "left")
      .groupBy(groupCol)
      .agg(sum(coalesce(col("in_train"), lit(0L))).as("contaminated"))
    perDoc.groupBy(groupCol)
      .agg(count(lit(1)).as("test_docs"),
        sum(col("candidate")).as("bloom_candidates"))
      .join(contam, Seq(groupCol), "left")
      .select(col(groupCol), col("test_docs"), col("bloom_candidates"),
        coalesce(col("contaminated"), lit(0L)).as("contaminated"),
        (col("bloom_candidates") - coalesce(col("contaminated"), lit(0L)))
          .as("false_positives"))
  }

  /** Deterministic per-group RESERVOIR sample: the k rows with the
    * smallest salted md5-uniform positions in each group — a
    * uniform-without-replacement k-sample with the same reproducibility
    * guarantees as [[deterministicSample]] (rerun-, cluster-size- and
    * engine-stable) plus a HARD per-group bound: the eval-set
    * constructor ("exactly k docs per language for human review").
    *
    * Scale shape: the native bounded-heap aggregate
    * ([[graft.expressions.TopKAggExpr]]) keeps k candidates per
    * (group × partition) map-side — k rows per partition cross the
    * shuffle, never the group (a rank window would sort whole groups on
    * single partitions). */
  def reservoirSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: String = ":res"): DataFrame =
    df.select(col(groupCol), col(idCol))
      .withColumn("_u", uniformPos(col(idCol), salt))
      .groupBy(groupCol)
      .agg(graft.functions.topK(col(idCol), -col("_u"), k).as("kept"))
      .select(col(groupCol), explode(col("kept")).as("e"))
      .select(col(groupCol), col("e.id").as(idCol))

  /** Mixture-weight-GUIDED sampling — the composition that turns
    * [[mixtureWeights]] into an actual corpus: pick the largest total
    * token budget `T` every source can serve at its target share
    * (`T = min_s tokens_s·10⁶ DIV w_ppm_s`, exact int64), derive each
    * source's Bernoulli rate `r_s = min(1, w_ppm_s·T / (10⁶·tokens_s))`,
    * and keep rows by the deterministic md5-uniform membership test —
    * reproducible on any cluster size / engine, like every sampler here.
    * The sampled corpus's expected per-source token mass matches the
    * temperature-scaled target distribution, with the binding source
    * kept whole (rate 1).
    *
    * Scale shape: one count aggregation (O(sources)), a 1-row budget
    * broadcast, then a stateless codegen'd row filter — no data shuffle. */
  def mixtureSample(df: DataFrame, sourceCol: String, textCol: String,
      idCol: String, salt: String = ":mix"): DataFrame = {
    val w = Caching.persisted(
      mixtureWeights(df, sourceCol, textCol).filter(col("weight_ppm") > 0))
    val rates = w
      .crossJoin(broadcast(
        w.agg(min(expr("(tokens * 1000000) DIV weight_ppm")).as("budget_t"))))
      .select(col(sourceCol),
        least(lit(1.0), (col("weight_ppm") * col("budget_t")).cast("double")
          / (col("tokens").cast("double") * lit(1000000.0))).as("rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(uniformPos(col(idCol), salt) < col("rate"))
  }

  /** Temperature-scaled mixture weights per data source — the
    * domain-reweighting pass of a training-data pipeline (sample sources
    * proportionally to `tokens^alpha`; alpha < 1 upweights small
    * domains, the standard multilingual/multi-source mitigation).
    * alpha is fixed at 0.5 so the power is a single correctly-rounded
    * IEEE `sqrt` — every downstream step is exact int64:
    * `w = floor(sqrt(tokens)·1e6 + 0.5)`, `weight_ppm = w·1e6 DIV Σw`.
    *
    * Returns one row per source: `(source, docs, tokens, weight_ppm)`.
    *
    * Scale shape: one partial+final hash aggregation over the corpus
    * (shuffle = O(sources) counted rows); the normalization window runs
    * on the aggregate, whose cardinality is the number of sources —
    * small by construction — so its single-partition exchange is free. */
  def mixtureWeights(df: DataFrame, sourceCol: String,
      textCol: String): DataFrame =
    mixtureWeightsFromCounts(sourceTokenCounts(df, sourceCol, textCol), sourceCol)

  /** The corpus aggregation half of [[mixtureWeights]]: per-source doc and
    * token counts. Both measures are ADDITIVE, so this is also the
    * incremental-maintenance increment ([[graft.streaming.IncrementalMixture]]
    * folds it into state with the MvPipeline upsert). */
  def sourceTokenCounts(df: DataFrame, sourceCol: String,
      textCol: String): DataFrame =
    df.groupBy(sourceCol)
      .agg(count(lit(1)).as("docs"),
        // null text counts as 0 tokens on BOTH engines. Under this
        // deployment (Spark 4, ANSI on) size(NULL) is NULL and sum skips
        // it — same as DuckDB — so per-row the engines already agree; the
        // CASE exists for the all-null-source edge, where sum over zero
        // non-null rows yields NULL tokens and the sqrt/ppm math below
        // would propagate NULL instead of the intended 0
        sum(when(col(textCol).isNull, lit(0L))
          .otherwise(size(TextOps.tokens(col(textCol))).cast("long"))).as("tokens"))

  /** The decision half of [[mixtureWeights]], over an already-aggregated
    * (source, docs, tokens) frame — shared verbatim by the batch path and
    * the incrementally-maintained streaming state, so both produce
    * identical ppm weights. */
  def mixtureWeightsFromCounts(perSource: DataFrame, sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weighted = perSource
      .withColumn("w", floor(sqrt(col("tokens").cast("double")) * 1e6 + 0.5).cast("long"))
    // int64 headroom: w ≤ 1e12 for 1e12 tokens/source, ×1e6 ≤ 1e18 < 2^63
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    weighted
      .withColumn("total_w", sum("w").over(all))
      .select(col(sourceCol), col("docs"), col("tokens"),
        expr("(w * 1000000) DIV total_w").as("weight_ppm"))
  }
}
