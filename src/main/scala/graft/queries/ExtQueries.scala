package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Multimodal, Similarity, Sketches, TextAnalysis, TextOps}

/** Harness wrappers + DuckDB oracles for the LLM-data-pipeline extension
  * operators (SURVEY.md §2.11) over the `documents` / `embeddings` tables.
  *
  * Oracle-parity approach: the hash primitive everywhere is md5 (identical
  * builtin in Spark and DuckDB), ratios are rounded to fixed decimals on
  * BOTH sides, and thresholds compare the *rounded* values so the two
  * engines make identical inclusion decisions. Operators whose primitives
  * aren't SQL-reproducible (xxhash64 SimHash, seeded hyperplane LSH, HLL)
  * are declared without an oracle → the driver's weaker rows-only check.
  */
object ExtQueries {

  // --------------------------------------------------------------- dedup ----

  def x1ExactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(s, dir), "doc_id", "text").orderBy("text_md5")

  def x2MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8)
      .orderBy("id1", "id2")

  def x3Simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir), maxHamming = 3)
      .orderBy("id1", "id2")

  def x4NgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), shingleN = 3, threshold = 0.01)
      .orderBy("id1", "id2")

  /** Directed n-gram containment pairs
    * ([[graft.operators.Dedup.ngramContainmentPairs]]): the partial-copy
    * detector — |grams(a)∩grams(b)|/|grams(a)| ≥ 0.5 within
    * (lang, source) blocks, both directions (the asymmetry IS the
    * signal; the corpus's planted swallow pair scores 1.0 one way). */
  def x61NgramContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainmentPairs(Tables.documents(s, dir),
        shingleN = 3, threshold = 0.5)
      .orderBy("id1", "id2")

  /** Duplicate clusters: connected components over the MinHash-LSH pairs —
    * (doc, min-id-of-component) for every doc in some near-dup pair. */
  def x11DedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.clusters(
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8))
      .orderBy("id")

  /** Representative selection over the x11 clusters ([[Dedup
    * .representatives]]): per duplicate cluster, its size and the
    * highest-quality member (ties to lowest id) — the keep-best curation
    * step. Oracle = the shared x11 cluster CTE + the shared quality
    * formula + a window argmax. */
  def x25ClusterReps(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val clusterMap = Dedup.clusters(
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8))
    Dedup.representatives(clusterMap, TextAnalysis.quality(docs),
        idCol = "doc_id", scoreCol = "quality_score")
      .orderBy("cluster")
  }

  // ---------------------------------------------------------- similarity ----

  private def embAsDouble(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), Similarity.asDouble(col("embedding")).as("v"))

  def x5EmbedTopk(s: SparkSession, dir: String): DataFrame = {
    val e = embAsDouble(s, dir)
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
    Similarity.bruteTopK(q, e.select("vec_id", "v"), k = 5).orderBy("qid", "rn")
  }

  /** Same semantics as [[x5EmbedTopk]] through the native bounded-heap
    * top-k aggregate (graft.expressions.TopKAggExpr, partial aggregation
    * map-side) — shares x5's oracle, proving the custom aggregate exact. */
  def x9TopkAgg(s: SparkSession, dir: String): DataFrame = {
    val e = embAsDouble(s, dir)
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
    Similarity.bruteTopKAgg(q, e.select("vec_id", "v"), k = 5).orderBy("qid", "rn")
  }

  def x6EmbedNeardup(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupPairs(Tables.embeddings(s, dir), threshold = 0.4)
      .orderBy("id1", "id2")

  /** Duplicate clusters over EMBEDDING near-dup pairs — the same
    * connected-components operator as [[x11DedupClusters]] composed over
    * [[Similarity.embeddingNearDupPairs]] instead of MinHash pairs,
    * proving the operators compose; oracle = recursive-CTE transitive
    * closure over the exact pair SQL. */
  def x14EmbedClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.clusters(
      Similarity.embeddingNearDupPairs(Tables.embeddings(s, dir), threshold = 0.4))
      .orderBy("id")

  def x7AnnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(s, dir), col("vec_id") < 10, k = 5, numBits = 8)
      .orderBy("qid", "rn")

  /** IVF-pruned ANN over the PINNED codebook ([[graft.operators
    * .IvfCodebook]] — a build-time KMeans fit frozen as literal data, the
    * production IVF shape): cell assignment, probe choice and exact
    * rescoring all replay in the DuckDB oracle with the centroid matrix
    * embedded as double literals (x7's recipe). The live-fit
    * [[Similarity.ivfTopK]] keeps its recall spec in SimilaritySpec. */
  def x12AnnIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopKPinned(Tables.embeddings(s, dir), col("vec_id") < 10, k = 5)
      .orderBy("qid", "rn")

  /** Deterministic training-data sharding ([[graft.operators.Sharding]]):
    * per-shard doc counts + key range prove stable assignment and balance;
    * the md5-derived keys replay in the DuckDB oracle. */
  /** IVF-PQ ANN over the pinned cell + production-geometry 8×256 PQ
    * codebook ([[Similarity.ivfPqTopK]]): 8-byte PQ codes score
    * candidates via a per-query LUT (the 100 TB bytes-per-candidate cut),
    * exact rescoring of the top-`refine·k` restores full-precision
    * ranking. The codebook is pinned DATA on both sides — a plan
    * reference object in the codegen'd encode/LUT kernels, a parquet
    * relation in the oracle — so the full pipeline replays in DuckDB. */
  def x33AnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    graft.operators.PqCodebook256.ensureParquet(s) // the oracle-side codebook relation
    Similarity.ivfPqTopK(Tables.embeddings(s, dir), col("vec_id") < 10, k = 5)
      .orderBy("qid", "rn")
  }

  /** IVFADC ANN ([[Similarity.ivfAdcTopK]]): the published production
    * refinement of x33 — PQ codes encode the CELL RESIDUAL against the
    * pinned residual codebook, and ADC adds the per-probe
    * `dot(q, c_cell)` base term. Same pinned-data determinism, full
    * DuckDB replay. */
  def x48AnnIvfAdc(s: SparkSession, dir: String): DataFrame = {
    graft.operators.PqCodebookResidual256.ensureParquet(s)
    Similarity.ivfAdcTopK(Tables.embeddings(s, dir), col("vec_id") < 10, k = 5)
      .orderBy("qid", "rn")
  }

  /** SemDeDup-style semantic pruning over the pinned IVF cells
    * ([[Similarity.semanticPrune]]): per-vector keep/prune decision with
    * the exact int64 alignment tie-break — every stage pinned-literal
    * deterministic, full DuckDB replay. */
  def x34SemanticPrune(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticPrune(Tables.embeddings(s, dir), threshold = 0.4)
      .orderBy("vec_id")

  def x13ShardStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sharding.assignShards(Tables.documents(s, dir), "doc_id", numShards = 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("docs"),
        min("sort_key").as("min_key"), max("sort_key").as("max_key"))
      .orderBy("shard")

  /** Per-cell stats of the pinned IVF codebook ([[Similarity.cellStats]])
    * — the embedding-clustering surface, oracle-checked: occupancy,
    * exact-int64 summed centroid alignment, vec_id range per cell. */
  def x15IvfCells(s: SparkSession, dir: String): DataFrame =
    Similarity.cellStats(Tables.embeddings(s, dir)).orderBy("bucket")

  /** KMV approximate distinct users per event type
    * ([[graft.operators.Sketches.kmvDistinct]]) — the deterministic,
    * oracle-checkable counterpart of [[x8ApproxUsers]]'s HLL++. */
  def x16KmvDistinct(s: SparkSession, dir: String): DataFrame =
    Sketches.kmvDistinct(Tables.events(s, dir), Seq("event_type"), "user_id")
      .orderBy("event_type")

  /** End-to-end training-data CURATION pipeline — the composition a real
    * 100 TB corpus pass runs: quality-filter (rounded score ≥ 0.5) →
    * exact dedup (keep min doc_id per text) → deterministic shard
    * assignment → per-shard stats. Every stage is an existing operator
    * ([[TextAnalysis.quality]], [[Dedup.exact]],
    * [[graft.operators.Sharding]]); the oracle replays the whole chain,
    * proving the operators compose without semantic drift. */
  def x17Curate(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val qs = TextAnalysis.quality(d).select(col("doc_id"), col("quality_score"))
    // fan-out point: kept feeds both the dedup branch and the final join —
    // persist or each branch re-derives the documents⋈quality subtree
    // from its own scan (the repo-wide alias-broken-exchange-reuse rule)
    val kept = graft.operators.Caching.persisted(
      d.join(qs, "doc_id").filter(col("quality_score") >= 0.5))
    val keepIds = Dedup.exact(kept, "doc_id", "text").select(col("keep_id").as("doc_id"))
    val curated = kept.join(keepIds, "doc_id")
    graft.operators.Sharding.assignShards(curated, "doc_id", numShards = 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("total_chars"))
      .orderBy("shard")
  }

  /** Deterministic train/val/test split stats
    * ([[graft.operators.Sampling.assignSplit]]): membership is a pure
    * function of doc_id, so the split replays exactly in SQL — the
    * reproducibility property `df.sample()` cannot give. */
  def x18SplitStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.assignSplit(Tables.documents(s, dir), "doc_id",
        trainFrac = 0.8, valFrac = 0.1)
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("docs"), min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("split", "lang")

  /** Benchmark-decontamination check: per-lang count of TEST-split docs
    * whose exact text (md5) also appears in the TRAIN split — the overlap
    * a training pipeline must detect before evaluation claims anything.
    * Composes [[graft.operators.Sampling.assignSplit]] with hash
    * matching; at 100 TB the train side collapses to a distinct-hash
    * broadcast (16-byte keys), never the texts. */
  def x19Contamination(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.contaminationStats(Tables.documents(s, dir),
        "doc_id", "text", "lang", trainFrac = 0.8, valFrac = 0.1)
      .orderBy("lang")

  /** Bloom-filter contamination pre-filter
    * ([[graft.operators.Sampling.bloomContaminationStats]]): the KB-size
    * bitmap stand-in for the distinct-hash broadcast, with its realized
    * false-positive count measured against the exact check — every
    * position md5-deterministic, full DuckDB replay. */
  def x35BloomContamination(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.bloomContaminationStats(Tables.documents(s, dir),
        "doc_id", "text", "lang", trainFrac = 0.8, valFrac = 0.1)
      .orderBy("lang")

  /** Bucketed interval join ([[graft.operators.AsOfJoin.intervalJoin]]):
    * clicks within 10 minutes after each purchase, per user — the range
    * join recast as an equi-join on (key, length-bucket) so it never
    * plans a nested-loop. Timestamps compared at exact integer
    * microseconds; click values as exact cents. */
  def x36IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("p_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts DIV 1000").as("c_us"),
        graft.functions.cents(col("value")).as("c_cents"))
    graft.operators.AsOfJoin.intervalJoin(purchases, clicks, Seq("user_id"),
        "p_us", "c_us", length = 600000000L) // 10 min in µs
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n_clicks"), sum("c_cents").as("click_cents"))
      .orderBy("event_id")
  }

  /** Edit-distance fuzzy match — the remaining dedup-family member
    * (character-level, catches typo-grade near-dups that token shingles
    * miss): for each probe doc, the same-lang doc with the minimum
    * levenshtein distance between 40-char text prefixes, deterministic
    * (distance, candidate-id) tie-break. Blocking on `lang` bounds the
    * O(block²) DP pair cost exactly like the n-gram-Jaccard blocker; at
    * 100 TB the prefix cap bounds the per-pair DP at 40×40 cells.
    * `levenshtein` is the standard DP on both engines → full replay. */
  def x37FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), substring(col("text"), 1, 40).as("p"))
    val probes = d.filter(col("doc_id") < 20)
      .select(col("doc_id").as("qid"), col("lang"), col("p").as("qp"))
    probes.join(d, Seq("lang"))
      .filter(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id"),
        levenshtein(col("qp"), col("p")).cast("long").as("dist"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("dist"), col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("qid"), col("doc_id").as("best_id"), col("dist"))
      .orderBy("qid")
  }

  /** Heavy hitters via the Misra-Gries aggregate
    * ([[graft.functions.heavyHitters]], [[graft.expressions.FreqAggExpr]]):
    * top tokens by estimated frequency. ORACLE-VALID because the test
    * corpus vocabulary (~31 tokens) is under k=64 — with no evictions the
    * summary holds EXACT counts and the merge rule never fires
    * destructively, so the sketch output equals the exact groupBy the SQL
    * mirror runs. The bounded-memory regime (vocab ≫ k), where results
    * become merge-order-dependent like HLL, is pinned against exact
    * counts in SketchAccuracySpec instead. */
  def x38HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
    toks.agg(graft.functions.heavyHitters(col("t"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("token"), col("e.est").as("cnt"))
      .orderBy(desc("cnt"), asc("token")).limit(20)
  }

  /** Pinned-weight classifier scoring ([[TextAnalysis.classifierScore]]):
    * rational-sigmoid model application as a pure projection — the
    * engine-exact form of a learned quality filter. */
  def x39QualityClassifier(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.classifierScore(Tables.documents(s, dir))
      .orderBy("doc_id")

  /** Mixture-guided sampling ([[graft.operators.Sampling.mixtureSample]]):
    * per-source kept docs/tokens after sampling the corpus toward the
    * temperature-scaled target shares — the full rebalancing composition
    * (weights → budget → rates → deterministic membership), every stage
    * exact or identical-IEEE, full DuckDB replay. */
  def x40MixtureSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.mixtureSample(Tables.documents(s, dir),
        "source", "text", "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("kept_docs"),
        sum(when(col("text").isNull, lit(0L))
          .otherwise(size(graft.operators.TextOps.tokens(col("text"))).cast("long")))
          .as("kept_tokens"))
      .orderBy("source")

  /** Column profile of the documents table ([[graft.operators.Profiling]])
    * — one aggregation pass, a row per column; exact distincts so the
    * oracle replays it (the 100 TB variant swaps in HLL). */
  def x20Profile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.profile(Tables.documents(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      .orderBy("col_name")

  /** Per-(shard, bin) stats of contiguous 4000-char packing over the
    * deterministic shard order ([[graft.operators.Packing]] over
    * [[graft.operators.Sharding]]) — batch construction for training,
    * whole assignment replayed in SQL. */
  def x21PackStats(s: SparkSession, dir: String): DataFrame = {
    val sharded = graft.operators.Sharding.assignShards(
      Tables.documents(s, dir), "doc_id", numShards = 8)
    graft.operators.Packing.contiguousPack(sharded,
        partCols = Seq("shard"), orderCols = Seq("sort_key", "doc_id"),
        sizeCol = "n_chars", budget = 4000L)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("total_chars"))
      .orderBy("shard", "bin")
  }

  /** Per-doc Gopher-style repetition metrics
    * ([[graft.operators.TextAnalysis.repetition]]): duplicate-token /
    * duplicate-bigram fractions, top-token share, composite flag. */
  def x22Repetition(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.repetition(Tables.documents(s, dir))
      .orderBy("doc_id")

  /** N-gram-level decontamination
    * ([[graft.operators.Sampling.ngramContaminationStats]]): per-lang
    * count of test-split docs sharing ANY word 8-gram with the train
    * split — the eval-overlap rule one level deeper than x19's
    * exact-text check. */
  def x23NgramContamination(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.ngramContaminationStats(Tables.documents(s, dir),
        "doc_id", "text", "lang", trainFrac = 0.8, valFrac = 0.1, n = 8)
      .orderBy("lang")

  /** Stratified deterministic sampling
    * ([[graft.operators.Sampling.stratifiedSample]]): per-lang rates
    * (en 0.5, de 0.25, fr 0.1, rest 0.05), per-lang kept-doc stats. */
  def x24StratSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSample(Tables.documents(s, dir),
        "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.1), defaultFraction = 0.05)
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("lang")

  /** Time-series spike detection ([[graft.operators.TimeSeries
    * .spikeStats]]): per-type 10-minute bucket counts z-scored against the
    * type's own distribution — spike flags are exact int64 comparisons
    * (dev² vs t²·varNum), only the reported max z touches IEEE (pround4). */
  def x30Anomaly(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.spikeStats(Tables.events(s, dir),
        "event_type", "ts", minutes = 10)
      .orderBy("event_type")

  /** Temperature-scaled source mixture weights ([[graft.operators
    * .Sampling.mixtureWeights]]): tokens^0.5 reweighting, exact int64
    * normalization (ppm via integer DIV). */
  def x31MixtureWeights(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.mixtureWeights(Tables.documents(s, dir),
        "source", "text")
      .orderBy("source")

  /** Inverted-index head ([[graft.operators.InvertedIndex.topPostings]]):
    * the 20 highest-df tokens with XOR posting-set fingerprints — df, tf
    * and the per-doc md5 hashes all replay exactly in SQL. topPostings
    * already returns totally-ordered rows (TakeOrderedAndProject on
    * (df desc, token asc) — token is unique within the head), so no
    * re-sort here. */
  def x32InvertedIndex(s: SparkSession, dir: String): DataFrame =
    graft.operators.InvertedIndex.topPostings(Tables.documents(s, dir),
        "doc_id", "text", k = 20)

  /** Count-Min point estimates ([[Sketches.countMin]]): build the d×w
    * additive counter sketch over all document tokens, then estimate
    * every distinct token's frequency from the sketch alone — additive
    * counters make the whole thing deterministic and SQL-replayable,
    * unlike MG/HLL. */
  def x41Cms(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.operators.Caching.persisted(Tables.documents(s, dir)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
      .filter(col("t") =!= ""))
    val sketch = Sketches.countMin(toks, "t")
    Sketches.countMinEstimate(sketch, toks.distinct(), "t")
      .select(col("t").as("token"), col("est"))
      .orderBy("token")
  }

  /** Deterministic per-language reservoir
    * ([[graft.operators.Sampling.reservoirSample]]): exactly 10 docs per
    * lang by smallest salted md5-uniform position — the reproducible
    * eval-set constructor, bounded-heap aggregated. */
  def x42Reservoir(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.reservoirSample(Tables.documents(s, dir),
        "lang", "doc_id", k = 10)
      .orderBy("lang", "doc_id")

  /** Time-series pattern search ([[graft.operators.TimeSeries
    * .patternSearch]]): top-5 10-minute windows per event type whose
    * 8-bucket count shape is nearest (exact int64 squared euclidean) to
    * a pinned flat-ish query pattern. */
  def x43TsMatch(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.patternSearch(Tables.events(s, dir),
        "event_type", "ts", minutes = 10,
        pattern = Seq(12L, 12L, 12L, 12L, 12L, 12L, 12L, 12L), k = 5)
      .orderBy("event_type", "rn")

  /** Z-order key parity ([[graft.functions.zOrder2]], the
    * [[graft.operators.ZOrder]] clustering key): interleaved-bit values
    * over (user_id, 16-bit folded time bucket) — pure shifts/masks, so
    * the write-layout key replays exactly in SQL (the measured pruning
    * effect lives in ZOrderSpec; this pins the key arithmetic). */
  def x44ZOrderKey(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_id") < 5000)
      .withColumn("b16", pmod(expr("((ts DIV 1000) DIV 600000000)"), lit(65536L)))
      .select(col("event_id"),
        graft.functions.zOrder2(col("user_id"), col("b16")).as("z"))
      .orderBy("event_id")

  /** 3-dim Z-order key ([[graft.functions.zOrderN]], R57 generalized):
    * interleaved bits of (user, md5-folded event type, 16-bit time
    * bucket) — the (client × domain × time) read pattern's clustering
    * key. Same pure shift/mask arithmetic, replays exactly in SQL; the
    * measured 3-dim row-group pruning lives in ZOrderSpec. */
  def x47ZOrder3(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_id") < 5000)
      .withColumn("b16", pmod(expr("((ts DIV 1000) DIV 600000000)"), lit(65536L)))
      .withColumn("tid", pmod(graft.functions.md5Hash64(col("event_type")), lit(256L)))
      .select(col("event_id"),
        graft.functions.zOrderN(Seq(col("user_id"), col("tid"), col("b16")), bits = 16).as("z"))
      .orderBy("event_id")

  /** BM25 ranked retrieval over the inverted index ([[graft.operators
    * .InvertedIndex.bm25TopK]]) — the read path the maintained index
    * serves (VERDICT r6 task 2): the search consumes ONLY the postings
    * detail and doc-length summaries (persisted here, maintained state in
    * [[graft.streaming.IncrementalIndex.searchBm25]]); the corpus is
    * never rescanned by the scoring plan. Exact-rational k1=6/5, b=3/4
    * scoring with e6-quantized int64 term sums → full DuckDB replay. */
  def x45Bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val postings = graft.operators.Caching.persisted(
      graft.operators.InvertedIndex.postingsDetail(docs, "doc_id", "text"))
    // dl = Σ_token tf — identical to docLengths' full second
    // tokenize+explode of the corpus, read instead from the postings
    // already built one line up (optimization r16, guide §1.2 "don't
    // compute things twice"); the maintained-state read path
    // (IncrementalIndex.searchBm25) keeps its own dl state
    val lens = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    graft.operators.InvertedIndex.bm25TopK(postings, lens,
      Seq("spark", "vector", "merge"), k = 20)
  }

  /** Histogram-sketch quantiles ([[Sketches.histogram]] +
    * [[Sketches.histogramQuantiles]]): the fully-ORACLED member of the
    * approximate-percentile family — exact cents-grid counters, integer
    * rank arithmetic, so unlike t-digest (x10, rows-only by nature) the
    * estimates replay bit-for-bit in DuckDB. Also incrementally
    * maintainable ([[graft.streaming.IncrementalHistogram]]). */
  def x51HistQuantiles(s: SparkSession, dir: String): DataFrame = {
    val hist = graft.operators.Caching.persisted(
      Sketches.histogram(Tables.events(s, dir), Seq("event_type"), "value"))
    Sketches.histogramQuantiles(hist, Seq("event_type"),
      Seq(("q25", 1, 4), ("q50", 1, 2), ("q75", 3, 4), ("q95", 19, 20)))
      .orderBy("event_type", "q")
  }

  /** Token-graph PageRank ([[graft.operators.Graph.pageRank]]): weighted
    * PageRank over the corpus's token-adjacency graph, 5 fixed iterations
    * in exact int64 picorank arithmetic — the iterative-computation member
    * of the extension family; replays bit-for-bit in DuckDB as 5 unrolled
    * CTE stages. */
  def x52TokenPagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = graft.operators.Graph.tokenEdges(Tables.documents(s, dir), "text")
    graft.operators.Graph.pageRank(s, edges, iters = 5)
      .orderBy(col("rank_e12").desc, col("token"))
  }

  /** Exact-integer k-means fit ([[graft.operators.KMeansInt]]): 2 Lloyd's
    * iterations over the e6-quantized embeddings from the 4 lowest-vec_id
    * seeds — the TRAINER behind the pinned IVF/PQ codebooks, replayed
    * bit-for-bit in DuckDB as unrolled assignment/update stages. */
  def x53KmeansFit(s: SparkSession, dir: String): DataFrame =
    graft.operators.KMeansInt.fit(s, Tables.embeddings(s, dir), "embedding",
      k = 4, iters = 2)

  /** windowFunnel ([[graft.operators.Funnel.windowFunnel]]): users by the
    * deepest signup → click → purchase chain completed within 1 day of
    * ANY signup anchor — the ClickHouse behavioral-aggregate surface,
    * exact integer-µs comparisons, full DuckDB replay. */
  def x54WindowFunnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.windowFunnel(
        Tables.events(s, dir).withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_type",
        Seq("signup", "click", "purchase"), windowUs = 86400000000L)
      .groupBy("level").agg(count(lit(1)).as("n_users"))
      .orderBy("level")

  /** retention ([[graft.operators.Funnel.retention]]): cohorts by first
    * signup day; day-1 click retention and 7-day purchase conversion per
    * cohort — exact integer-µs day arithmetic, full DuckDB replay. */
  def x55Retention(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.retention(
        Tables.events(s, dir).withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_type", anchorType = "signup",
        conds = Seq(
          ("ret_click_d1", "click", 86400000000L, 172800000000L),
          ("ret_purchase_d7", "purchase", 0L, 604800000000L)))
      .orderBy("cohort_day")

  /** sequenceMatch ([[graft.operators.Funnel.sequenceMatch]]): users whose
    * events contain a view → click (≤1 h later) → purchase (≤1 day after
    * that click) chain — per-gap bounds, so the feasible-set DP (not
    * windowFunnel's greedy anchor walk) decides the match; full DuckDB
    * replay of the stage chain. */
  def x56SequenceMatch(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.sequenceMatch(
        Tables.events(s, dir).withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_type",
        Seq(("view", None), ("click", Some(3600000000L)),
          ("purchase", Some(86400000000L))))
      .groupBy("matched").agg(count(lit(1)).as("n_users"))
      .orderBy("matched")

  /** groupBitmap retention ([[graft.operators.Bitmaps]]): day-keyed exact
    * user bitmaps (63-bit packed words, OR-merged), then per-day active
    * users and next-day returning users read ENTIRELY from bitmap state —
    * |day| and |day ∩ day+1| as popcounts over word joins, the fact
    * stream scanned once to build the state. Exact (unlike HLL x8), and
    * the same word layout replays in DuckDB. */
  def x57BitmapRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(expr("(ts DIV 1000) DIV 86400000000").as("day"), col("user_id"))
    val st = graft.operators.Caching.persisted(
      graft.operators.Bitmaps.bitmapState(ev, "day", "user_id"))
    graft.operators.Bitmaps.cardinality(st)
      .join(graft.operators.Bitmaps.adjacentAndCardinality(st, 1L), "g")
      .select(col("g").as("day"), col("card").as("n_users"),
        col("card_and").as("n_returning"))
      .orderBy("day")
  }

  /** PQ trainer ([[graft.operators.KMeansInt.fitPq]]): 4 per-subspace
    * codebooks (subDim 16, k=4, 2 Lloyd's iterations) fit simultaneously
    * over the embeddings corpus — the trained-artifact path behind the
    * x33/x48 pinned codebooks, exact-int recurrence, full DuckDB replay
    * of every iteration. */
  def x58PqTrain(s: SparkSession, dir: String): DataFrame =
    graft.operators.KMeansInt.fitPq(s, Tables.embeddings(s, dir),
      "embedding", subDim = 16, k = 4, iters = 2)

  /** sumMap ([[graft.functions.mapAgg]], [[graft.expressions.MapAggExpr]]):
    * per-day map of event_type → summed value cents as ONE native map
    * aggregation (partials merge map-side; one shuffle row per
    * (day × partition), not per (day, type) pair), exploded to rows for
    * the oracle. Exact int64 cents; key-sorted entries make the agg
    * deterministic and hashable. */
  def x59SumMap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .groupBy(expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .agg(graft.functions.mapAgg(col("event_type"),
        graft.functions.cents(col("value"))).as("m"))
      .select(col("day"), explode(col("m")).as("e"))
      .select(col("day"), col("e.key").as("event_type"),
        col("e.val").as("sum_cents"))
      .orderBy("day", "event_type")

  /** Bigram-LM surprisal scoring
    * ([[graft.operators.TextAnalysis.bigramSurprisal]]): the CCNet-style
    * quality filter at exact integer floor-log₂ resolution
    * (`length(bin(count))` — no IEEE logs), scored over the documents
    * corpus; full DuckDB replay. */
  def x60BigramSurprisal(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.bigramSurprisal(Tables.documents(s, dir))
      .orderBy("doc_id")

  /** sequenceCount ([[graft.operators.Funnel.sequenceCount2]]): users by
    * their number of non-overlapping view → purchase chains — the
    * sequential greedy scan made relational via the bracket-matching
    * identity (one window cumsum + max); full DuckDB replay. */
  def x62SequenceCount(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.sequenceCount2(
        Tables.events(s, dir).withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_type", "view", "purchase")
      .groupBy("n_matches").agg(count(lit(1)).as("n_users"))
      .orderBy("n_matches")

  /** KMV set algebra ([[graft.operators.Sketches.kmvSetAlgebra]]): the
    * approximate twin of x57's exact bitmaps — adjacent-day user-set
    * union/intersection/Jaccard estimated from k=64 md5-KMV sketches,
    * fully deterministic (integer ρ ppm, one fixed IEEE expression per
    * estimate) and DuckDB-replayable, unlike HLL (x8). */
  def x63KmvSetAlgebra(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(expr("(ts DIV 1000) DIV 86400000000").as("day"), col("user_id"))
    val days = ev.select(col("day")).distinct()
    val pairs = days.select(col("day").as("g1"), (col("day") + 1).as("g2"))
      .join(days.select(col("day").as("g2")), Seq("g2"), "left_semi")
    graft.operators.Sketches.kmvSetAlgebra(ev, "day", "user_id", pairs, k = 64)
      .select(col("g1").as("day"), col("g2").as("next_day"),
        col("jaccard_ppm"), col("union_est"), col("inter_est"))
      .orderBy("day")
  }

  /** Decayed/trending sums ([[graft.operators.TimeSeries.decayedSum]]):
    * per-type exponentially-decayed value totals with EXACT power-of-2
    * day weights (`cents·10⁶ DIV 2^age`), anchored at the corpus max day
    * — the deterministic, oracle-replayable form of
    * exponentialTimeDecayedSum. */
  def x64DecayedSum(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.decayedSum(
        Tables.events(s, dir).filter(col("value").isNotNull)
          .withColumn("t_us", expr("ts DIV 1000")),
        "event_type", "t_us", graft.functions.cents(col("value")))
      .orderBy("event_type")

  /** Pivot/reshape surface: per-day event counts pivoted to one column
    * per event type — `Dataset.pivot` with EXPLICIT values (dynamic
    * value discovery would make the schema data-dependent and
    * un-oracleable); replays as conditional counts. */
  def x65PivotDaily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  /** Document novelty ([[graft.operators.TextAnalysis.novelty]]): each
    * doc's share of corpus-first n-grams — the dedup-priority /
    * marginal-contribution metric, exact integer ppm; full DuckDB
    * replay. */
  def x66Novelty(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.novelty(Tables.documents(s, dir))
      .orderBy("doc_id")

  /** Interval coverage ([[graft.operators.TimeSeries.intervalCoverage]]):
    * per-user time-on-site — each event opens a 30-minute presence
    * interval, overlaps merge (intervalLengthSum semantics), exact
    * integer-µs gaps-and-islands; full DuckDB replay. */
  def x67IntervalCoverage(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.intervalCoverage(
        Tables.events(s, dir)
          .select(col("user_id"), expr("ts DIV 1000").as("s"),
            expr("ts DIV 1000 + 1800000000").as("e")),
        "user_id", "s", "e")
      .select(col("k").as("user_id"),
        expr("covered DIV 1000000").as("covered_sec"), col("n_islands"))
      .orderBy("user_id")

  /** Correlation moments ([[graft.operators.Profiling.corrMoments]]):
    * price (dollar grid) × quantity per return flag — exact additive
    * int64 moment sums + one fixed-IEEE corr read, full DuckDB replay. */
  def x68CorrMoments(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.corrMoments(
        Tables.lineitem(s, dir)
          .withColumn("xc", graft.functions.cents(col("l_extendedprice"))),
        "l_returnflag",
        expr("xc DIV 100"), col("l_quantity").cast("long"))
      .withColumnRenamed("g", "l_returnflag")
      .orderBy("l_returnflag")

  /** Conversion latency ([[graft.operators.Funnel.conversionLatency]]):
    * per converting user, the fastest signup → click → purchase chain
    * inside a 1-day anchor window, in seconds (integer DIV) — plus how
    * many anchors converted; full DuckDB replay of the stage chain. */
  def x69ConversionLatency(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.conversionLatency(
        Tables.events(s, dir).withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_type",
        Seq("signup", "click", "purchase"), windowUs = 86400000000L)
      .select(col("user").as("user_id"),
        expr("latency_us DIV 1000000").as("latency_sec"), col("n_anchors"))
      .orderBy("user_id")

  /** argMax surface (ClickHouse's most-used pair aggregate): per type,
    * the user holding the max value — `max_by` keyed by a TOTAL order
    * struct (cents, user_id), because a bare max_by on a tied key is
    * nondeterministic and therefore un-oracleable; ties break to the
    * highest user id, mirrored exactly in the SQL's ORDER BY. */
  def x70ArgMax(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .withColumn("c", graft.functions.cents(col("value")))
      .filter(col("c").isNotNull)
      .groupBy("event_type")
      .agg(
        max_by(col("user_id"), struct(col("c"), col("user_id"))).as("top_user"),
        max(col("c")).as("top_cents"))
      .orderBy("event_type")

  /** uniqUpTo ([[graft.operators.Sketches.uniqUpTo]]): exact distinct
    * users per (type, day) while ≤ 40, saturating at 41 — bounded-state
    * exact counting; the saturation cap replays as LEAST in SQL. */
  def x71UniqUpTo(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.uniqUpTo(
        Tables.events(s, dir)
          .withColumn("day", expr("(ts DIV 1000) DIV 86400000000")),
        Seq("event_type", "day"), "user_id", n = 40)
      .orderBy("event_type", "day")

  /** Peak concurrency ([[graft.operators.TimeSeries.maxIntersections]]):
    * per user, the max number of 30-minute event intervals open at once
    * and the EARLIEST microsecond the peak is reached — the sweep-line
    * as a window aggregate, fully replayed by DuckDB's identical default
    * RANGE cumulative frame. */
  def x72MaxIntersections(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.maxIntersections(
        Tables.events(s, dir)
          .select(col("user_id"), expr("ts DIV 1000").as("s"),
            expr("ts DIV 1000 + 1800000000").as("e")),
        "user_id", "s", "e")
      .select(col("k").as("user_id"), col("max_conc"), col("at_p"))
      .orderBy("user_id")

  /** deltaSum ([[graft.operators.TimeSeries.deltaSum]]): per user, the
    * sum of positive cents increases under the total (ts, event_id)
    * order — counter-reset-tolerant accumulation, exact int64. */
  def x73DeltaSum(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.deltaSum(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("c", graft.functions.cents(col("value")))
          .filter(col("c").isNotNull)
          .withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_id", "c")
      .select(col("k").as("user_id"), col("n"), col("delta_sum"))
      .orderBy("user_id")

  /** Higher moments ([[graft.operators.Profiling.momentStats]]):
    * skewness/kurtosis of the dollars grid per event type — exact
    * additive int64 power sums + two fixed-IEEE reads, full replay. */
  def x74MomentStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.momentStats(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("xc", graft.functions.cents(col("value"))),
        "event_type", expr("xc DIV 100"))
      .withColumnRenamed("g", "event_type")
      .orderBy("event_type")

  /** quantileExactWeighted ([[graft.operators.Sketches
    * .quantileExactWeighted]]): per return flag, the price cents at the
    * quantity-weighted quartiles — exact int64 rank arithmetic over
    * per-value weight sums, full DuckDB replay. */
  def x75WeightedQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.quantileExactWeighted(
        Tables.lineitem(s, dir)
          .withColumn("vc", graft.functions.cents(col("l_extendedprice")))
          .withColumn("w", col("l_quantity").cast("long")),
        Seq("l_returnflag"), "vc", "w",
        Seq(("q25", 1, 4), ("q50", 1, 2), ("q75", 3, 4)))
      .select(col("l_returnflag"), col("q"), col("n").as("w_total"),
        col("est_cents").as("value_cents"))
      .orderBy("l_returnflag", "q")

  /** simpleLinearRegression ([[graft.operators.Profiling.linRegRead]]):
    * quantity regressed on dollars per return flag — reads over the x68
    * moment artifact, raw slope chained into the intercept, pround4 at
    * the boundary; full DuckDB replay. */
  def x76LinReg(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.linRegRead(
        graft.operators.Profiling.corrMoments(
          Tables.lineitem(s, dir)
            .withColumn("xc", graft.functions.cents(col("l_extendedprice"))),
          "l_returnflag",
          expr("xc DIV 100"), col("l_quantity").cast("long")))
      .select(col("g").as("l_returnflag"), col("n"), col("slope4"), col("icept4"))
      .orderBy("l_returnflag")

  /** Mann-Whitney U ([[graft.operators.Profiling.mannWhitneyU]]): per
    * day, the doubled-rank U statistics comparing click vs error value
    * distributions — all-integer rank arithmetic, full DuckDB replay. */
  def x77MannWhitney(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.mannWhitneyU(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("day", expr("(ts DIV 1000) DIV 86400000000"))
          .withColumn("c", graft.functions.cents(col("value"))),
        "day", "c", "event_type", "click", "error")
      .withColumnRenamed("g", "day")
      .orderBy("day")

  /** groupUniqArray-sorted (the engine family's array-aggregation
    * surface, made deterministic): per (type, day), the DISTINCT user
    * ids sorted ascending and comma-joined — distinct first, sort before
    * stringify (numeric order, not lexicographic), so both engines emit
    * the identical string. */
  def x78GroupConcat(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"), col("user_id"))
      .distinct()
      .groupBy("event_type", "day")
      .agg(
        concat_ws(",", sort_array(collect_list(col("user_id"))).cast("array<string>"))
          .as("users"),
        count(lit(1)).as("n_users"))
      .orderBy("event_type", "day")

  /** Spearman rank correlation ([[graft.operators.Profiling
    * .spearmanCorr]]): dollars vs quantity per return flag over doubled
    * tie-averaged ranks — integer rank transform + the x68 moment read. */
  def x79Spearman(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.spearmanCorr(
        Tables.lineitem(s, dir)
          .withColumn("xc", graft.functions.cents(col("l_extendedprice"))),
        "l_returnflag",
        expr("xc DIV 100"), col("l_quantity").cast("long"))
      .withColumnRenamed("g", "l_returnflag")
      .orderBy("l_returnflag")

  /** Median absolute deviation ([[graft.operators.Sketches.madExact]]):
    * per event type, the exact lower-median of cents and the exact MAD
    * around it — two count-cumsum rank selections, full replay. */
  def x80Mad(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.madExact(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("c", graft.functions.cents(col("value"))),
        "event_type", "c")
      .withColumnRenamed("g", "event_type")
      .select(col("event_type"), col("n"), col("med").as("median_cents"),
        col("mad").as("mad_cents"))
      .orderBy("event_type")

  /** sequenceNextNode ([[graft.operators.Funnel.nextNodeCounts]]): the
    * distribution of what users do immediately after a signup, under the
    * total (ts, event_id) order; anchors with no successor count as
    * `<end>`. */
  def x81NextNode(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.nextNodeCounts(
        Tables.events(s, dir).withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_id", "event_type", "signup")
      .orderBy("next_type")

  /** boundingRatio ([[graft.operators.Profiling.boundingRatio]]): per
    * event type, the bounding-box slope of cents over elapsed seconds —
    * four int64 extrema + one fixed-IEEE read. */
  def x82BoundingRatio(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.boundingRatio(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("sec", expr("(ts DIV 1000) DIV 1000000"))
          .withColumn("c", graft.functions.cents(col("value"))),
        "event_type", col("sec"), col("c"))
      .withColumnRenamed("g", "event_type")
      .orderBy("event_type")

  /** Student/Welch t statistics ([[graft.operators.Profiling
    * .tTestMoments]]): click vs error dollars per day — six int64
    * conditional sums + two fixed-IEEE reads, full replay. */
  def x83TTest(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.tTestMoments(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("day", expr("(ts DIV 1000) DIV 86400000000"))
          .withColumn("xc", graft.functions.cents(col("value")))
          .withColumn("dollars", expr("xc DIV 100")),
        "day", "dollars", "event_type", "click", "error")
      .withColumnRenamed("g", "day")
      .orderBy("day")

  /** Strict-order windowFunnel ([[graft.operators.Funnel
    * .windowFunnelStrictOrder]]): signup→click→purchase where any
    * intervening event aborts the chain — level distribution. */
  def x84FunnelStrict(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.windowFunnelStrictOrder(
        Tables.events(s, dir).withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_id", "event_type",
        Seq("signup", "click", "purchase"), windowUs = 86400000000L)
      .groupBy("level").agg(count(lit(1)).as("n_users"))
      .orderBy("level")

  /** groupBitAnd/Or/Xor: the bitwise aggregate surface over cents per
    * event type — exact int64 in any engine. */
  def x85BitOps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .withColumn("c", graft.functions.cents(col("value")))
      .groupBy("event_type")
      .agg(expr("bit_and(c)").as("band"), expr("bit_or(c)").as("bor"),
        expr("bit_xor(c)").as("bxor"))
      .orderBy("event_type")

  /** ROC-AUC ([[graft.operators.Profiling.rocAuc]]): value cents as the
    * score, purchase vs view as the classes, per day — the U statistic's
    * probabilistic read, tie-aware via doubled ranks. */
  def x86RocAuc(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.rocAuc(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("day", expr("(ts DIV 1000) DIV 86400000000"))
          .withColumn("c", graft.functions.cents(col("value"))),
        "day", "c", "event_type", "purchase", "view")
      .withColumnRenamed("g", "day")
      .orderBy("day")

  /** LTTB downsampling ([[graft.operators.TimeSeries.lttb]]): each
    * event type's (second, cents) series reduced to 6 visually-dominant
    * points — sequential-faithful picks, exact integer areas, replayed
    * as 4 unrolled CTE stages. */
  def x87Lttb(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.lttb(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("sec", expr("(ts DIV 1000) DIV 1000000"))
          .withColumn("c", graft.functions.cents(col("value"))),
        "event_type", "sec", "c", "event_id", nBuckets = 6)
      .select(col("g").as("event_type"), col("sel"), col("t").as("sec"),
        col("v").as("cents"))
      .orderBy("event_type", "sel")

  /** Kolmogorov-Smirnov ([[graft.operators.Profiling.ksTest]]): click vs
    * error value distributions per day — exact rational D plus the
    * rounded read. */
  def x88KsTest(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.ksTest(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("day", expr("(ts DIV 1000) DIV 86400000000"))
          .withColumn("c", graft.functions.cents(col("value"))),
        "day", "c", "event_type", "click", "error")
      .withColumnRenamed("g", "day")
      .orderBy("day")

  /** Tukey outliers ([[graft.operators.Sketches.tukeyOutliers]]): per
    * event type, exact quartiles on the cents grid and the fence-breaker
    * counts with doubled-integer fences. */
  def x89Tukey(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.tukeyOutliers(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("c", graft.functions.cents(col("value"))),
        "event_type", "c")
      .withColumnRenamed("g", "event_type")
      .orderBy("event_type")

  /** Two-proportion z ([[graft.operators.Profiling.proportionZ]]): the
    * share of ≥$100 values among views vs clicks per day — four int64
    * counts + one guarded fixed-IEEE read. */
  def x90ProportionZ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.proportionZ(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("day", expr("(ts DIV 1000) DIV 86400000000"))
          .withColumn("c", graft.functions.cents(col("value"))),
        "day", "event_type", "view", "click", col("c") >= 10000L)
      .withColumnRenamed("g", "day")
      .orderBy("day")

  /** sparkbar ([[graft.operators.TimeSeries.sparkbar]]): each event
    * type's daily volume as an 8-level block-glyph bar — integer height
    * normalization, ordered glyph concat, engine-identical strings. */
  def x91Sparkbar(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.sparkbar(
        Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("(ts DIV 1000) DIV 86400000000").as("day"))
          .agg(count(lit(1)).as("cnt")),
        "event_type", "day", "cnt")
      .withColumnRenamed("k", "event_type")
      .orderBy("event_type")

  /** Calibration buckets ([[graft.operators.TextAnalysis.calibration]]):
    * score deciles vs the long-document share in exact ppm. */
  def x92Calibration(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.calibration(Tables.documents(s, dir))
      .orderBy("bucket")

  /** Period detection ([[graft.operators.TimeSeries.periodDetect]]):
    * the dominant daily-volume period per event type via exact integer
    * autocorrelation — no FFT, no floats. */
  def x93PeriodDetect(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.periodDetect(
        Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("(ts DIV 1000) DIV 86400000000").as("day"))
          .agg(count(lit(1)).as("cnt")),
        "event_type", "day", "cnt", maxLag = 10)
      .withColumnRenamed("k", "event_type")
      .orderBy("event_type")

  /** Change point ([[graft.operators.TimeSeries.changePoint]]): the day
    * where each type's cumulative volume deviates most from the uniform
    * ramp — integer CUSUM, earliest bucket on ties. */
  def x94ChangePoint(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.changePoint(
        Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("(ts DIV 1000) DIV 86400000000").as("day"))
          .agg(count(lit(1)).as("cnt")),
        "event_type", "day", "cnt")
      .withColumnRenamed("k", "event_type")
      .orderBy("event_type")

  /** Trailing-7-day active users — the classic rolling-distinct metric,
    * EXACT via bounded fan-out: each (day, user) pair contributes to the
    * 7 target days it falls inside (explode of a 7-element sequence —
    * shuffle carries distinct pairs ×7, never raw events), then one
    * distinct-count per target day; future-partial windows past the
    * corpus max day are cut. At 100 TB the same shape holds: the
    * fan-out factor is the window length, a constant. */
  def x95TrailingActives(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(expr("(ts DIV 1000) DIV 86400000000").as("day"), col("user_id"))
      .distinct()
    val mx = ev.agg(max("day").as("mx"))
    ev.withColumn("d", explode(expr("sequence(day, day + 6)")))
      .join(broadcast(mx), col("d") <= col("mx"))
      .groupBy(col("d").as("day"))
      .agg(countDistinct(col("user_id")).as("active_7d"))
      .orderBy("day")
  }

  /** Audience overlap — pairwise Jaccard between event-type user sets,
    * exact integer ppm: distinct (type, user) pairs self-joined on the
    * user key (co-partitioned shuffle), per-type sizes broadcast back;
    * |A∩B|, |A∪B| = |A|+|B|−|A∩B|, all int64. */
  def x96AudienceOverlap(s: SparkSession, dir: String): DataFrame = {
    val tu = Tables.events(s, dir)
      .select(col("event_type").as("et"), col("user_id")).distinct()
    val sizes = tu.groupBy("et").agg(count(lit(1)).as("sz"))
    val inter = tu.as("a").join(tu.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.et") < col("b.et"))
      .groupBy(col("a.et").as("et_a"), col("b.et").as("et_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.withColumnRenamed("et", "et_a")
        .withColumnRenamed("sz", "n_a")), "et_a")
      .join(broadcast(sizes.withColumnRenamed("et", "et_b")
        .withColumnRenamed("sz", "n_b")), "et_b")
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .withColumn("jac_ppm", expr("n_inter * 1000000 DIV n_union"))
      .select("et_a", "et_b", "n_a", "n_b", "n_inter", "n_union", "jac_ppm")
      .orderBy("et_a", "et_b")
  }

  /** Strict-dedup windowFunnel ([[graft.operators.Funnel
    * .windowFunnelStrictDedup]]): signup→click→purchase where a repeated
    * current-step event inside a gap aborts that chain — exact
    * feasible-set semantics (greedy is unsound in this mode). */
  def x97FunnelDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.windowFunnelStrictDedup(
        Tables.events(s, dir).withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_type",
        Seq("signup", "click", "purchase"), windowUs = 86400000000L)
      .groupBy("level").agg(count(lit(1)).as("n_users"))
      .orderBy("level")

  /** Retention triangle — the cohort × day-offset matrix behind every
    * retention curve: users cohorted by FIRST signup day, then for each
    * later day-offset the count of cohort users active that day (any
    * event). All integer-day arithmetic; the anchor join is user-keyed
    * (broadcastable cohort map at these SFs, co-partitioned shuffle at
    * 100 TB). Complements [[graft.operators.Funnel.retention]]'s fixed
    * condition windows with the full unrolled matrix. */
  def x98RetentionTriangle(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("(ts DIV 1000) DIV 86400000000").as("day"),
        col("event_type"))
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.select(col("user_id"), col("day")).distinct()
      .join(cohorts, "user_id")
      .filter(col("day") >= col("cohort_day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "offset")
  }

  /** RFM segmentation — recency/frequency/monetary quartile scores per
    * purchasing user, all THREE dimensions bucketed by the same
    * ceil-rank thresholds as [[graft.operators.Sketches.exactMedian]]
    * (NTILE is rank-order nondeterministic on ties — threshold
    * bucketing is the oracleable form), then segment counts. Exact
    * int64 end to end: recency in days, frequency in events, monetary
    * in cents. */
  def x99RfmSegments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .withColumn("day", expr("(ts DIV 1000) DIV 86400000000"))
      .withColumn("c", graft.functions.cents(col("value")))
    val mx = ev.agg(max("day").as("mx"))
    val rfm = ev.crossJoin(broadcast(mx))
      .groupBy("user_id")
      .agg((min(col("mx")) - max(col("day"))).as("r"),
        count(lit(1)).as("f"), sum(col("c")).as("m"))
    // quartile thresholds per dimension: the value at ceil-rank n/4, n/2,
    // 3n/4 over THAT dimension's distribution; score = 1 + #thresholds
    // strictly below the value (ties share a score — deterministic).
    // Optimization r17 (guide §2.4, the r16 exact-rank recipe): the value
    // at ceil-rank k of a sorted multiset is the smallest v whose
    // cumulative count reaches k, so the three per-dimension
    // row_number-over-everything windows (each an unbounded
    // single-partition sort of O(users) rows — the scale-killer) are
    // replaced by ONE melted value histogram (dim, v, cnt): cum-sum and
    // total ride one partitionBy(dim) window exchange over O(distinct
    // values) rows, and the ceil-rank selection is the same int64
    // arithmetic. Identical thresholds, one pass instead of three.
    val dims = Seq("r", "f", "m")
    val w = Window.partitionBy("dim")
    val pivots = dims.flatMap(d => Seq(
      min(when(col("dim") === d, col("q1"))).as(s"${d}_q1"),
      min(when(col("dim") === d, col("q2"))).as(s"${d}_q2"),
      min(when(col("dim") === d, col("q3"))).as(s"${d}_q3")))
    val th = rfm
      .select(explode(array(dims.map(d =>
        struct(lit(d).as("dim"), col(d).as("v"))): _*)).as("dv"))
      .groupBy(col("dv.dim").as("dim"), col("dv.v").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(w.orderBy("v")))
      .withColumn("n", sum("cnt").over(w))
      .groupBy("dim")
      .agg(min(when(col("cum") >= expr("(n + 3) DIV 4"), col("v"))).as("q1"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v"))).as("q2"),
        min(when(col("cum") >= expr("(3 * n + 3) DIV 4"), col("v"))).as("q3"))
      .groupBy()
      .agg(pivots.head, pivots.tail: _*)
    def score(d: String) =
      (lit(1) + when(col(d) > col(s"${d}_q1"), 1).otherwise(0) +
        when(col(d) > col(s"${d}_q2"), 1).otherwise(0) +
        when(col(d) > col(s"${d}_q3"), 1).otherwise(0)).as(s"${d}_score")
    rfm.crossJoin(broadcast(th))
      .select(col("user_id"), score("r"), score("f"), score("m"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Conversion-latency histogram — the distribution read over the x69
    * conversion figures (reads compose over reads, the engine-family
    * habit): converting users bucketed by whole hours to convert. */
  def x100LatencyHistogram(s: SparkSession, dir: String): DataFrame =
    x69ConversionLatency(s, dir)
      .withColumn("hr", expr("latency_sec DIV 3600"))
      .groupBy("hr")
      .agg(count(lit(1)).as("n_users"), sum("n_anchors").as("n_anchors"))
      .orderBy("hr")

  /** Deterministic synthetic DNS domain per event — the shared corpus for
    * the blocklist/entropy reads (the IngestQueries habit: derive the
    * corpus from id arithmetic so the oracle replays it in closed form).
    * 4 labels: `h{event_id%97}.d{user_id%23}.{event_type}.net`. */
  private def synthDomain =
    concat(lit("h"), pmod(col("event_id"), lit(97)).cast("string"),
      lit(".d"), pmod(col("user_id"), lit(23)).cast("string"),
      lit("."), col("event_type"), lit(".net"))

  /** Blocklist suffix match ([[graft.operators.Blocklist.suffixMatch]]):
    * AdGuard-rule hit accounting — per rule, queries and distinct clients
    * matched at any label boundary (exact domain or subdomain). The rule
    * set mixes registrable-level rules with one exact 4-label rule so both
    * join paths are exercised; the oracle replays the label-boundary
    * suffix semantics as a `'%.'||rule` LIKE join (no wildcard can match
    * inside a label on either side). */
  def x101BlocklistMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).withColumn("domain", synthDomain)
    val rules = ((0 to 22).filter(_ % 4 == 0)
      .flatMap(k => Seq("click", "view").map(t => s"d$k.$t.net"))
      :+ "h7.d3.error.net").toDF("rule")
    graft.operators.Blocklist.suffixMatch(ev, "domain", rules, "rule", maxLabels = 4)
      .groupBy("rule")
      .agg(count(lit(1)).as("n_queries"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("rule")
  }

  /** Per-client domain entropy
    * ([[graft.operators.Profiling.categoricalEntropy]]): the DGA /
    * DNS-tunneling detector read — clients whose query-domain
    * distribution is near-uniform over many distinct names score
    * `ent_bits ≈ N·⌊log₂N⌋`, repeat-visitors score ≈ N; exact integers
    * on the floor-log₂ grid (the x60 `length(bin(n))` recipe). */
  def x102DomainEntropy(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.categoricalEntropy(
        Tables.events(s, dir).withColumn("domain", synthDomain),
        "user_id", "domain")
      .orderBy("user_id")

  /** Contingency cells ([[graft.operators.Profiling.contingency]]):
    * event-type × day-of-week association table with margins and the
    * e6-scaled χ² ingredient per cell — all int64. */
  def x103Contingency(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.contingency(
        Tables.events(s, dir)
          .withColumn("dow", expr("((ts DIV 1000) DIV 86400000000) % 7")),
        "event_type", "dow")
      .orderBy("a", "b")

  /** cramersV ([[graft.operators.Profiling.cramersV]]): the one-row
    * association read over the x103 cells (reads compose over reads) —
    * χ² and Cramér's V on the e6/e3 integer grids. */
  def x104CramersV(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.cramersV(
        graft.operators.Profiling.contingency(
          Tables.events(s, dir)
            .withColumn("dow", expr("((ts DIV 1000) DIV 86400000000) % 7")),
          "event_type", "dow"))
      .orderBy("n")

  /** stochasticLinearRegression ([[graft.operators.GdTrainer.fitLinear]]):
    * 4 batch-GD iterations fitting cents(extendedprice) from quantity,
    * every step exact on the e6 integer grid — the trained artifact
    * replays as 4 unrolled CTE stages. η = 1/1000 < 2/E[x²] (E[x²] ≈ 858
    * for quantity 1..50), so the recurrence is stable. */
  def x105SgdLinreg(s: SparkSession, dir: String): DataFrame =
    graft.operators.GdTrainer.fitLinear(
        Tables.lineitem(s, dir),
        col("l_quantity").cast("long"),
        graft.functions.cents(col("l_extendedprice")),
        iters = 4, etaDen = 1000L)
      .orderBy("n")

  /** theilsU ([[graft.operators.Profiling.theilsU]]): the DIRECTED
    * association read — U(event_type | day-of-week) as a ratio of
    * floor-log₂ integer entropies, clamped at independence. */
  def x106TheilsU(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.theilsU(
        Tables.events(s, dir)
          .withColumn("dow", expr("((ts DIV 1000) DIV 86400000000) % 7")),
        "event_type", "dow")
      .orderBy("n")

  /** exponentialTimeDecayedAvg ([[graft.operators.TimeSeries.decayedAvg]]):
    * the decayed-mean read over the x64 artifact — numerator and
    * denominator carry the SAME exact power-of-2 day weights, so the
    * trending average is one integer division. */
  def x107DecayedAvg(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.decayedAvg(
        Tables.events(s, dir).filter(col("value").isNotNull)
          .withColumn("t_us", expr("ts DIV 1000")),
        "event_type", "t_us", graft.functions.cents(col("value")))
      .orderBy("event_type")

  /** groupArrayIntersect ([[graft.operators.SetOps.groupIntersect]]):
    * per event type, the users active on EVERY day-of-week — cross-row
    * set intersection by the counting identity, rendered sorted for
    * determinism. */
  def x108GroupIntersect(s: SparkSession, dir: String): DataFrame =
    graft.operators.SetOps.groupIntersect(
        Tables.events(s, dir)
          .withColumn("dow", expr("((ts DIV 1000) DIV 86400000000) % 7")),
        "event_type", "dow", "user_id")
      .orderBy("g")

  /** Subnet rollup ([[graft.functions.ipv4Num]]/[[graft.functions.cidrString]]):
    * clients aggregated at /24 — the reference's per-client stats rolled
    * to network blocks (the ops question "which NETWORK hammers the
    * resolver"), numeric mask arithmetic end to end. Synthetic client
    * IP per event: `10.{user_id%64}.{user_id DIV 64}.{event_id%251}`. */
  def x109SubnetRollup(s: SparkSession, dir: String): DataFrame = {
    val ip = concat(lit("10."), pmod(col("user_id"), lit(64)).cast("string"),
      lit("."), expr("user_id DIV 64").cast("string"),
      lit("."), pmod(col("event_id"), lit(251)).cast("string"))
    Tables.events(s, dir)
      .withColumn("subnet", graft.functions.cidrString(graft.functions.ipv4Num(ip), 24))
      .groupBy("subnet")
      .agg(count(lit(1)).as("n_queries"),
        countDistinct(pmod(col("event_id"), lit(251))).as("n_hosts"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("subnet")
  }

  /** topKWeighted ([[graft.functions.heavyHittersWeighted]]): per day,
    * event types by TOTAL value weight from the weighted Misra-Gries
    * buffer — exact here (vocab 5 < k = 8 counters: no eviction in any
    * partial, absorb is plain addition), so the sketch read IS the exact
    * weighted ranking; adversarial vocabularies are pinned in
    * SketchAccuracySpec. */
  def x110TopKWeighted(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .withColumn("day", expr("(ts DIV 1000) DIV 86400000000"))
      .withColumn("c", graft.functions.cents(col("value")))
      .filter(col("c").isNotNull)
      .groupBy("day")
      .agg(graft.functions.heavyHittersWeighted(col("event_type"), col("c"), 8).as("hh"))
      .select(col("day"), explode(col("hh")).as("e"))
      .select(col("day"), col("e.item").as("event_type"), col("e.est").as("w_cents"))
      .orderBy(col("day"), desc("w_cents"), col("event_type"))

  /** minMap/maxMap ([[graft.functions.mapAgg]] min/max modes): per day,
    * the value extremes per event type as key-sorted map entries —
    * zipped (both maps share the sorted key set) and exploded for the
    * oracle. */
  def x111MinMaxMap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .withColumn("day", expr("(ts DIV 1000) DIV 86400000000"))
      .withColumn("c", graft.functions.cents(col("value")))
      .filter(col("c").isNotNull)
      .groupBy("day")
      .agg(graft.functions.mapAgg(col("event_type"), col("c"), "min").as("mn"),
        graft.functions.mapAgg(col("event_type"), col("c"), "max").as("mx"))
      .select(col("day"), explode(arrays_zip(col("mn"), col("mx"))).as("z"))
      .select(col("day"), col("z.mn.key").as("event_type"),
        col("z.mn.val").as("min_cents"), col("z.mx.val").as("max_cents"))
      .orderBy("day", "event_type")

  /** corrMatrix ([[graft.operators.Profiling.corrMatrix]]): all pairwise
    * correlations of (dollars, quantity, discount-cents) in ONE scan —
    * the wide moment row exploded to (i, j) pair reads. */
  def x112CorrMatrix(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.corrMatrix(
        Tables.lineitem(s, dir)
          .withColumn("xc", graft.functions.cents(col("l_extendedprice")))
          .withColumn("dc", graft.functions.cents(col("l_discount"))),
        Seq(
          ("dollars" , expr("xc DIV 100")),
          ("quantity", col("l_quantity").cast("long")),
          ("disc_c"  , col("dc"))))
      .orderBy("col_a", "col_b")

  /** Bitmap churn ([[graft.operators.Bitmaps.adjacentChurn]]): per day,
    * users LOST to and GAINED from the next day — `bitmapAndnot` both
    * directions over the same exact bitmap state as x57, fact stream
    * never rescanned. */
  def x113BitmapChurn(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(expr("(ts DIV 1000) DIV 86400000000").as("day"), col("user_id"))
    graft.operators.Bitmaps.adjacentChurn(
        graft.operators.Bitmaps.bitmapState(ev, "day", "user_id"), 1L)
      .select(col("g").as("day"), col("lost"), col("gained"))
      .orderBy("day")
  }

  /** Transition matrix ([[graft.operators.Funnel.transitionCounts]]):
    * the first-order Markov flow map over per-user event streams —
    * every (from → to) adjacency under the total (t, id) order, last
    * events flowing to `<end>`. */
  def x114TransitionMatrix(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.transitionCounts(
        Tables.events(s, dir).withColumn("t_us", expr("ts DIV 1000")),
        "user_id", "t_us", "event_id", "event_type")
      .orderBy("from_type", "to_type")

  /** WITH FILL gap filling ([[graft.operators.TimeSeries.gapFill]]):
    * daily counts of high-value events (cents ≥ 25000) per type over
    * the COMPLETE day grid — absent days zero-filled, the max-cents
    * figure carried forward. The threshold manufactures real gaps at
    * both driver SFs. */
  def x115GapFill(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .withColumn("c", graft.functions.cents(col("value")))
      .filter(col("c") >= 25000)
      .groupBy(col("event_type"), expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"), max("c").as("mx"))
    graft.operators.TimeSeries.gapFill(p, "event_type", "day", "cnt", "mx")
      .orderBy("event_type", "day")
  }

  /** HLL++ approximate distinct users — ERROR-BANDED since r15 (VERDICT
    * r14 task 2): the sketch register values are engine-specific, so
    * the query emits the EXACT distinct count beside a `within_3rsd`
    * flag asserting the HLL++ estimate sits inside 3× its published
    * relative standard deviation (rsd = 0.05, the Spark default) of the
    * exact value — turning the old rows-only check into a full
    * hash-matched pass/fail: the oracle recomputes the exact count and
    * expects the flag to be 1, so a broken sketch (wrong column, broken
    * rsd, garbage registers) flips the flag and reds the hash. The HLL
    * aggregation still runs at full scale — it IS the thing under
    * test — only its raw estimate stays out of the compared columns. */
  def x8ApproxUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.05).as("approx_users"))
      .select(col("event_type"), col("exact_users"),
        when(abs(col("approx_users") - col("exact_users"))
          <= lit(3 * 0.05) * col("exact_users"), 1L).otherwise(0L)
          .as("within_3rsd"))
      .orderBy("event_type")

  /** Approximate percentiles (Greenwald-Khanna registers) — the 100 TB
    * swap for [[RelQueries.pctValue]]'s exact sort-based percentile.
    * ERROR-BANDED since r15, like [[x8ApproxUsers]]: sketch values are
    * engine-specific, so the query emits the exact row count beside
    * per-percentile band flags asserting each approx value lies between
    * the EXACT interpolated percentiles at rank ± 5/accuracy (Spark
    * guarantees rank error ≤ 1/accuracy for accuracy = 1000; the 5×
    * slack absorbs interpolation-vs-element rank boundary effects and
    * is still a 0.5-percentile band). The oracle expects both flags = 1,
    * so a regression to garbage reds the hash instead of passing a
    * rows-only check. */
  def x10ApproxPct(s: SparkSession, dir: String): DataFrame = {
    val eps = 0.005
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        approx_percentile(col("value"), lit(0.5), lit(1000)).as("p50a"),
        approx_percentile(col("value"), lit(0.95), lit(1000)).as("p95a"),
        percentile(col("value"), lit(0.5 - eps)).as("p50lo"),
        percentile(col("value"), lit(0.5 + eps)).as("p50hi"),
        percentile(col("value"), lit(0.95 - eps)).as("p95lo"),
        percentile(col("value"), lit(0.95 + eps)).as("p95hi"))
      .select(col("event_type"), col("n_rows"),
        when(col("p50a").between(col("p50lo"), col("p50hi")), 1L)
          .otherwise(0L).as("p50_in_band"),
        when(col("p95a").between(col("p95lo"), col("p95hi")), 1L)
          .otherwise(0L).as("p95_in_band"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------- text analysis ----

  def taLangStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("total_chars"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("lang")

  def taTokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("lang")
      .agg(count(lit(1)).as("total_tokens"), countDistinct(col("token")).as("distinct_tokens"))
      .orderBy("lang")

  def taQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(Tables.documents(s, dir)).orderBy("doc_id")

  def taLangid(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.langId(TextOps.tokens(col("text"))).as("lang_pred"))
      .orderBy("doc_id")

  def taFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(Tables.documents(s, dir)).orderBy("doc_id")

  /** ASCII class alternation shared with the oracle: letters | digits |
    * punctuation runs — a BPE-ish pre-tokenizer (ASCII classes only, so
    * Java regex and RE2 agree exactly). */
  private val bpeRe = "[a-zA-Z]+|[0-9]+|[^ a-zA-Z0-9]+"

  /** Token counting two ways (whitespace + BPE-ish regex) per doc. */
  def taBpeTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(bpeRe), lit(0))).cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  /** Content-defined chunking + chunk-level dedup ([[Dedup.cdcChunks]] +
    * [[Dedup.chunkDupStats]]): repeated token-span chunks across the
    * corpus — the scalable substring-dedup signal. */
  def x28CdcChunks(s: SparkSession, dir: String): DataFrame =
    Dedup.chunkDupStats(Dedup.cdcChunks(Tables.documents(s, dir), "doc_id", "text"))
      .orderBy("chunk_md5")

  /** Exact substring-duplication spans ([[Dedup.duplicateSpanStats]],
    * k = 40): cross-document repeated 40-char windows merged into maximal
    * per-doc spans — the character-level train-data substring-dedup pass
    * (R144). All-int output (window/span counts, duplicated chars, exact
    * ppm), so the DuckDB replay hash-matches bit-for-bit. */
  def x116DuplicateSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateSpanStats(Tables.documents(s, dir), "doc_id", "text", k = 40)
      .orderBy("doc_id")

  /** Batch twin of the maintained CHAIN join-aggregate (R146): exact
    * revenue-cents + joined-triple count per market segment over
    * `lineitem ⋈ orders ⋈ customer` — the query
    * [[graft.streaming.IncrementalJoinAggChain]] maintains, as an
    * oracled batch read anchoring the view to the driver gate. The
    * 100 TB side (lineitem) shuffles once on the order key; the slim
    * customer projection broadcasts; orders⋈lineitem is the
    * co-bucketable fact-fact edge (BucketedJoinSpec's zero-exchange
    * layout applies at scale). */
  /** Batch twin of the maintained STAR join-aggregate (R150): the Q5
    * star — lineitem joined to TWO independent branches (orders→
    * customer→nation→region and supplier) with the cross-branch
    * equality `s_nationkey = c_nationkey` and the region literal
    * filter — exact revenue cents + joined-row count per nation, the
    * view [[graft.streaming.IncrementalJoinAggStar]] maintains,
    * anchored to the driver gate. Plan shape as q5_region_revenue:
    * every dimension broadcasts; lineitem (the 100 TB side) shuffles
    * exactly once, on the final group key. */
  def x118StarRevenue(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val c = Tables.customer(s, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey", "n_name")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        graft.functions.cents(col("l_extendedprice")).as("cst"))
      .join(broadcast(o.join(broadcast(c), col("o_custkey") === col("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("cst")).as("revenue_cents"), count(lit(1)).as("n_rows"))
      .orderBy("n_name")
  }

  /** Batch twin of the maintained exact order-statistics view
    * ([[graft.streaming.IncrementalExtrema]], R154): per market
    * segment over orders — min/max/count and the exact LOW-MEDIAN of
    * the order total in cents. The plan aggregates to the
    * value-multiplicity relation `(seg, v) → w` FIRST (a parallel
    * groupBy), so the rank window runs over O(distinct values) rows,
    * never O(orders) — the same relation the incremental view
    * maintains, and the only window shape that survives a 100× fact
    * scale-up with a 5-value partition key. All-integer rank
    * arithmetic (`(n+1) DIV 2`), so both engines pick the identical
    * value from the data. */
  def x119SegmentOrderStats(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), graft.functions.cents(col("o_totalprice")).as("v"))
      .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("seg")
    o.groupBy("seg", "v").agg(count(lit(1)).as("w"))
      .withColumn("cum", sum("w").over(w.orderBy("v")))
      .withColumn("n", sum("w").over(w))
      .groupBy("seg")
      .agg(min("v").as("min_cents"), max("v").as("max_cents"),
        max("n").as("n_orders"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v")))
          .as("median_lo_cents"))
      .orderBy("seg")
  }

  /** Batch twin of the MULTI-MEASURE star view
    * ([[graft.streaming.IncrementalJoinAggStar]] with `numMeasures > 1`,
    * R161): TWO independently-summed measures (revenue cents AND
    * quantity) per market segment under ONE maintained join — the
    * reference's several-summed-columns SummingMergeTree shape
    * (stats2's blocked+visited). Same plan as x117: the customer
    * dimension broadcasts; lineitem (the 100 TB side) shuffles once,
    * on the group key — a second measure costs zero extra exchanges. */
  def x124SegmentMeasures(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        graft.functions.cents(col("l_extendedprice")).as("cst"),
        col("l_quantity").cast("long").as("qty"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("cst")).as("revenue_cents"), sum(col("qty")).as("qty_sum"),
        count(lit(1)).as("n_rows"))
      .orderBy("c_mktsegment")

  def x117ChainRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), graft.functions.cents(col("l_extendedprice")).as("c"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("c")).as("revenue_cents"), count(lit(1)).as("triples"))
      .orderBy("c_mktsegment")

  /** Batch twin of the LEFT-join star view
    * ([[graft.streaming.IncrementalJoinAggStar]] with `leftBranches`,
    * R156): revenue per nation over orders LEFT JOIN the
    * non-negative-balance customers LEFT JOIN nation — the
    * "fact against a PARTIAL dimension" shape (122/1500 sf0.01
    * customers carry negative balances), so the null-padded group is
    * genuinely populated and the chained left join dangles mid-branch
    * exactly like the engine's completed-relation walk. NULLs are
    * coalesced to a sentinel in BOTH engines so the oracle's sort/hash
    * never compares bare NULL group keys. Plan shape at 100 TB: both
    * dimensions broadcast; orders (the big side) shuffles once, on the
    * group key. */
  def x120LeftRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .filter(col("c_acctbal") >= 0)
      .select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
    Tables.orders(s, dir)
      .select(col("o_custkey"), graft.functions.cents(col("o_totalprice")).as("v"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(coalesce(col("n_name"), lit("UNRESOLVED")).as("nation"))
      .agg(sum(col("v")).as("revenue_cents"), count(lit(1)).as("n_orders"))
      .orderBy("nation")
  }

  /** Batch twin of the maintained exact COUNT(DISTINCT) star view
    * ([[graft.streaming.IncrementalJoinAggStar.distinctView]], R158):
    * distinct ordering customers + order count + exact revenue cents
    * per nation. Spark's distinct aggregate partial-deduplicates
    * map-side on (nation, custkey) before the final count, the same
    * multiplicity relation the incremental view maintains — the only
    * exact-distinct plan that survives 100× facts on a 25-value group
    * key. Dims broadcast; orders shuffles once. */
  def x121NationDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_custkey"), graft.functions.cents(col("o_totalprice")).as("v"))
      .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"), sum(col("v")).as("revenue_cents"))
      .orderBy("nation")

  /** Batch twin of the MULTI-ROW (fan-out) star level
    * ([[graft.streaming.IncrementalJoinAggStar]] `multiRows`, R159):
    * each order's total attributed to every DISTINCT return flag among
    * its lineitems — a genuine m:n bridge join (orders ⋈
    * DISTINCT(orderkey, returnflag)), where one fact fans out to
    * multiple resolved tuples and the aggregate counts TUPLES, exactly
    * the SQL join semantics the engine maintains. The bridge
    * de-duplicates BEFORE the join (set semantics = the engine's level
    * contract), so the big side never inflates. */
  def x122FanoutRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), graft.functions.cents(col("o_totalprice")).as("v"))
      .join(Tables.lineitem(s, dir).select("l_orderkey", "l_returnflag").distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("v")).as("revenue_cents"))
      .orderBy("flag")

  /** Batch twin of the AS-OF (temporal / SCD-2) join-aggregate
    * ([[graft.streaming.IncrementalTemporalJoinAgg]], R160): each
    * purchase resolves the user's segment AS OF the purchase time —
    * the latest prior `view` event's props.k-derived segment — and
    * revenue aggregates per segment; purchases before any view land in
    * the `(none)` sentinel group (ASOF LEFT semantics; the sentinel
    * sidesteps the Spark-asc-nulls-first vs DuckDB-nulls-last sort
    * divergence). The plan IS the engine's bootstrap plan
    * ([[graft.streaming.IncrementalTemporalJoinAgg.asOfAggregate]]):
    * one shuffle by user, one event-time sort carrying the prevailing
    * version onto each fact via `last(ignoreNulls)` — no self-join, no
    * per-fact probe; oracled against DuckDB's native `ASOF LEFT
    * JOIN`. */
  def x123AsofRevenue(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"), col("user_id").as("k"))
    val dims = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    graft.streaming.IncrementalTemporalJoinAgg.asOfAggregate(facts, dims)
      .select(coalesce(col("g"), lit("(none)")).as("seg"),
        col("total").as("revenue_cents"), col("rows").as("purchases"))
      .orderBy("seg")
  }

  /** Batch twin of the MULTI-MEASURE temporal view
    * ([[graft.streaming.IncrementalTemporalJoinAgg]] with
    * `numMeasures > 1`, R161's contract on the as-of family): TWO
    * independently-summed measures (revenue cents AND the purchase's
    * `props.$.k` int) per as-of-resolved segment — x123's join with a
    * second summed column, zero extra exchanges (the same one-window
    * plan). */
  def x125AsofMeasures(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"),
        get_json_object(col("props"), "$.k").cast("long").as("m2"),
        col("user_id").as("k"))
    val dims = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    graft.streaming.IncrementalTemporalJoinAgg
      .asOfAggregate(facts, dims, numMeasures = 2)
      .select(coalesce(col("g"), lit("(none)")).as("seg"),
        col("total").as("revenue_cents"), col("total2").as("k_sum"),
        col("rows").as("purchases"))
      .orderBy("seg")
  }

  /** Batch twin of the MULTI-BRANCH temporal view
    * ([[graft.streaming.IncrementalTemporalStar]], R162): each purchase
    * resolves TWO independent SCD-2 dimensions as of purchase time —
    * the user's segment (from view events) AND the user's tier (from
    * click events) — the chained ASOF LEFT JOIN no single-dimension
    * engine expresses. Oracled against DuckDB's native chained
    * `ASOF LEFT JOIN`. Plan: one shuffle + one event-time sort per
    * branch (the R160 window device, B times), then one aggregate. */
  def x126AsofStar(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"),
        col("user_id").as("k1"), col("user_id").as("k2"))
    val seg = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    val tier = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("t"), (get_json_object(col("props"), "$.k").cast("int") % 3)
          .cast("string")).as("vs"))
    graft.streaming.IncrementalTemporalStar
      .asOfAggregateStar(facts, Seq(seg, tier))
      .select(coalesce(col("g1"), lit("(none)")).as("seg"),
        coalesce(col("g2"), lit("(none)")).as("tier"),
        col("total").as("revenue_cents"), col("rows").as("purchases"))
      .orderBy("seg", "tier")
  }

  /** Batch twin of the maintained ENRICHED FACT TABLE
    * ([[graft.streaming.IncrementalTemporalStar]] `trackEnriched`):
    * every purchase row with BOTH of its as-of-resolved attributes
    * denormalized onto it — the per-fact (not aggregated) projection
    * of x126, the reference's log2-style materialization. Oracled
    * per-row against DuckDB's chained ASOF LEFT JOIN. */
  def x127EnrichedFacts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"),
        col("user_id").as("k1"), col("user_id").as("k2"))
    val seg = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    val tier = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("t"), (get_json_object(col("props"), "$.k").cast("int") % 3)
          .cast("string")).as("vs"))
    graft.streaming.IncrementalTemporalStar
      .enrichedBatch(facts, Seq(seg, tier))
      .select(col("id"),
        coalesce(col("g1"), lit("(none)")).as("seg"),
        coalesce(col("g2"), lit("(none)")).as("tier"),
        col("m").as("value_cents"))
      .orderBy("id")
  }

  /** Batch twin of the INTERVAL (overlap, M:N) join-aggregate
    * ([[graft.streaming.IncrementalIntervalJoinAgg]], R165): each
    * purchase opens a 10-minute attribution window labeled by its
    * value band, every click inside a window counts toward that band —
    * a click covered by TWO concurrent windows counts twice (interval
    * semantics, unlike the as-of family's at-most-one match). Plan:
    * one equi-keyed join with a range residual + one aggregate; exact
    * integer µs and cents throughout. */
  def x128AttributedClicks(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val facts = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"), col("user_id").as("k"))
    val ints = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("iid"), col("user_id").as("k"),
        expr("ts DIV 1000").as("s"),
        expr("ts DIV 1000 + 600000000").as("e"),
        concat(lit("b"), (graft.functions.cents(col("value")) % 5)
          .cast("string")).as("vs"))
    graft.streaming.IncrementalIntervalJoinAgg.intervalAggregate(facts, ints)
      .select(col("g").as("band"), col("total").as("click_cents"),
        col("rows").as("matches"))
      .orderBy("band")
  }

  /** Batch twin of the MIXED-SHAPE star (R167,
    * [[graft.streaming.IncrementalTemporalStar]] with
    * `intervalBranches`): each click resolves the user's segment AS OF
    * click time (temporal branch, ≤1 match, LEFT) AND fans out into
    * every 10-minute purchase attribution window covering it (interval
    * branch, ≥0 matches, INNER) — "revenue by as-of segment attributed
    * within campaign windows", the composition neither pure engine
    * expresses. A click inside two concurrent windows counts toward
    * both bands; clicks covered by no window contribute nothing.
    * Oracled against DuckDB's native ASOF LEFT JOIN + range join in
    * one query. Plan: one shuffle + one event-time sort for the
    * temporal branch, one equi-keyed range-residual join for the
    * window branch, one aggregate. */
  def x130MixedAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val facts = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"),
        col("user_id").as("k1"), col("user_id").as("k2"))
    val seg = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    val wins = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("iid"), col("user_id").as("k"),
        expr("ts DIV 1000").as("s"),
        expr("ts DIV 1000 + 600000000").as("e"),
        concat(lit("b"), (graft.functions.cents(col("value")) % 5)
          .cast("string")).as("vs"))
    graft.streaming.IncrementalTemporalStar
      .asOfAggregateStar(facts, Seq(seg, wins), intervalBranches = Set(2))
      .select(coalesce(col("g1"), lit("(none)")).as("seg"),
        col("g2").as("band"),
        col("total").as("click_cents"), col("rows").as("matches"))
      .orderBy("seg", "band")
  }

  /** Batch twin of the SET-VALUED enriched facts under fan-out (R175,
    * [[graft.streaming.IncrementalTemporalStar.enrichedFanoutView]]):
    * the x130 mixed-attribution query UN-AGGREGATED — one row per
    * (click, covering window): the click id, its as-of segment, the
    * window's band AND id, and the click value. The composite
    * (click_id, window_id) key is exactly what the maintained relation
    * REPLACEs on. Oracled against the same DuckDB ASOF LEFT + range
    * join, un-aggregated. */
  def x133MixedEnriched(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val facts = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        graft.functions.cents(col("value")).as("m"),
        col("user_id").as("k1"), col("user_id").as("k2"))
    val seg = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
        concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")).as("vs"))
    val wins = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("iid"), col("user_id").as("k"),
        expr("ts DIV 1000").as("s"),
        expr("ts DIV 1000 + 600000000").as("e"),
        concat(lit("b"), (graft.functions.cents(col("value")) % 5)
          .cast("string")).as("vs"))
    graft.streaming.IncrementalTemporalStar
      .enrichedFanoutBatch(facts, Seq(seg, wins), intervalBranches = Set(2))
      .select(col("id").as("click_id"),
        coalesce(col("g1"), lit("(none)")).as("seg"),
        col("g2").as("band"), col("_tag2").as("window_id"),
        col("m").as("value_cents"))
      .orderBy("click_id", "window_id")
  }

  // -------------------------------------------- SQL catalog (R172) ----

  /** Shared maintained state behind the SQL-catalog queries (x131/
    * x132): the orders×customer revenue view and the per-segment
    * order-value extrema relation, folded ONCE per sf dir per process
    * into temp state and registered as Spark SQL temp views + the
    * bucket-pruned point-read table function
    * ([[graft.streaming.SqlCatalog]]). Registration re-binds on every
    * call (plan construction only) so the names always point at THIS
    * dir's state — the driver and bench interleave sf dirs. */
  private val sqlCatalogState = scala.collection.mutable.Map[String, String]()
  private def sqlCatalogViews(s: SparkSession, dir: String): Unit = sqlCatalogState.synchronized {
    val state = sqlCatalogState.getOrElseUpdate(dir, {
      val st = java.nio.file.Files.createTempDirectory("sqlcat").toString
      val orders = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      // one maintained join-aggregate fold (the engine pays its staged
      // crash-safe protocol — the honest cost of "maintained", timed in
      // the bench under this query's name) + one keyed summary upsert
      // BOOTSTRAP (not per-batch delta machinery) builds the fresh
      // state — the engine's own backfill path: one star join + state
      // writes; continuation folds would use batch ids above 0. A
      // deterministic order subset bounds the one-time cost the first
      // SQL-catalog query pays (the oracle mirrors the filter); the
      // fold-cost-at-scale evidence lives in the rehearsals, not here
      graft.streaming.IncrementalJoinAggStar.bootstrap(
        graft.streaming.IncrementalJoinAggStar.StarSpec(Seq(1),
          groupAttrs = Seq((1, 1))),
        orders.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_custkey").as("jk"), col("o_orderkey").as("id"),
            graft.functions.cents(col("o_totalprice")).as("m")),
        Seq("jk"), "id", "m",
        Seq(Seq(cust.select(col("c_custkey").as("jk"),
          col("c_mktsegment").as("g")))),
        Seq(Seq(("jk", "", "g"))),
        st, baselineBatch = 0L, numBuckets = 2)
      graft.streaming.MvPipeline.upsert(
        cust.groupBy(col("c_mktsegment").as("g"))
          .agg(count(lit(1)).as("n_customers")),
        s"$st/mv_segment_customers", Seq("g"), 0L)
      st
    })
    graft.streaming.SqlCatalog.register(s, Seq(
      graft.streaming.SqlCatalog.joinAgg("x131_rev", state),
      graft.streaming.SqlCatalog.summary("x131_seg", state,
        "mv_segment_customers"),
      graft.streaming.SqlCatalog.aggPointRead("x131_rev_for",
        s"$state/joinaggstar/a", numBuckets = 2)))
  }

  /** Shared TWO-BATCH maintained state behind the SQL as-of queries
    * (x134/x135): batch 0 bootstraps the `o_orderkey % 10 = 0` orders,
    * batch 1 folds the `% 10 = 5` subset through the star's own
    * processBatch — so the changelog carries two distinct batch
    * stamps and an as-of read at 0 differs from the live view. Its own
    * state dir: x131/x132 pin the SINGLE-batch live view. */
  private val sqlAsOfState = scala.collection.mutable.Map[String, String]()
  private def sqlAsOfViews(s: SparkSession, dir: String): Unit = sqlAsOfState.synchronized {
    val state = sqlAsOfState.getOrElseUpdate(dir, {
      val st = java.nio.file.Files.createTempDirectory("sqlasof").toString
      val orders = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val spec = graft.streaming.IncrementalJoinAggStar.StarSpec(Seq(1),
        groupAttrs = Seq((1, 1)))
      def factsOf(rem: Int) = orders.filter(col("o_orderkey") % 10 === rem)
        .select(col("o_custkey").as("jk"), col("o_orderkey").as("id"),
          graft.functions.cents(col("o_totalprice")).as("m"))
      graft.streaming.IncrementalJoinAggStar.bootstrap(spec,
        factsOf(0), Seq("jk"), "id", "m",
        Seq(Seq(cust.select(col("c_custkey").as("jk"),
          col("c_mktsegment").as("g")))),
        Seq(Seq(("jk", "", "g"))),
        st, baselineBatch = 0L, numBuckets = 2)
      graft.streaming.IncrementalJoinAggStar.processBatch(spec,
        factsOf(5), Seq("jk"), "id", "m",
        factDels = orders.limit(0)
          .select(col("o_custkey").as("jk"), col("o_orderkey").as("id")),
        delKs = Seq("jk"), delId = "id",
        dims = Seq(Seq(cust.limit(0).select(col("c_custkey").as("jk"),
          col("c_mktsegment").as("g")))),
        dimCols = Seq(Seq(("jk", "", "g"))),
        stateDir = st, batchId = 1L, numBuckets = 2)
      st
    })
    graft.streaming.SqlCatalog.register(s, Seq(
      graft.streaming.SqlCatalog.star("x134_rev_live", state),
      graft.streaming.SqlCatalog.starAsOf("x134_rev_asof0", state, 0L),
      graft.streaming.SqlCatalog.aggAsOfRead("x134_asof_for",
        s"$state/joinaggstar/a", numBuckets = 2)))
  }

  /** UNTIMED bench state prebuild (VERDICT r13 task 2): force the
    * once-per-(process, dir) maintained-state builds behind the
    * SQL-surface queries (x131/x132, x134/x135 — and the retrieval
    * TVF's index state) so the TIMED readings measure the warm READ,
    * not a one-time bootstrap. `graft.Bench` calls this before its
    * timed sweep and reports the cost as `state_build_s`; outside the
    * bench the builds stay lazy (first query pays, as documented). */
  def prebuildBenchState(s: SparkSession, dir: String): Unit = {
    // The 6 view families are INDEPENDENT (disjoint temp state dirs,
    // disjoint registered names), so their one-time folds overlap from a
    // thread pool (optimization r17, guide §2.6: concurrent jobs
    // back-fill executors idled by each fold's staged single-job tail) —
    // previously they folded sequentially under ONE object-level lock
    // (now per-family locks, see each builder). Caching.isolated gives
    // each build its own persist registry so a fold's releaseAll cannot
    // drop a sibling's mid-flight frames (the ViewCatalog
    // concurrentTiers rule). Failures propagate after all complete.
    val builds: Seq[() => Unit] = Seq(
      () => sqlBm25Views(s, dir), // largest fold first (pool head start)
      () => sqlCatalogViews(s, dir),
      () => sqlAsOfViews(s, dir),
      () => sqlTopKViews(s, dir),
      () => sqlSessionsViews(s, dir),
      () => sqlTemporalAsOfViews(s, dir))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(builds.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(builds.map(b =>
          scala.concurrent.Future(graft.operators.Caching.isolated(b())))),
        scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()
  }

  /** Shared TWO-BATCH maintained TEMPORAL-STAR state behind the
    * branch-coordinate as-of TVF (x140): batch 0 folds the
    * `event_id % 10 = 0` purchases plus ALL view-derived SCD versions,
    * batch 1 folds the `% 10 = 5` purchases — so an as-of read at
    * batch 0 differs from the live view and the DuckDB oracle can
    * recompute it as a native ASOF JOIN over the batch-0 fact subset
    * (the engine's as-of resolution is arrival-order-free, so all
    * versions landing in batch 0 is the x123 semantics exactly). */
  private val sqlTemporalState = scala.collection.mutable.Map[String, String]()
  private def sqlTemporalAsOfViews(s: SparkSession, dir: String): Unit = sqlTemporalState.synchronized {
    val state = sqlTemporalState.getOrElseUpdate(dir, {
      val st = java.nio.file.Files.createTempDirectory("sqltemp").toString
      val ev = Tables.events(s, dir)
      def factsOf(rem: Int) = ev.filter(col("event_type") === "purchase" &&
          col("event_id") % 10 === rem)
        .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
          graft.functions.cents(col("value")).as("m"),
          col("user_id").as("k1"))
      val dims = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("k"), expr("ts DIV 1000").as("vf"),
          concat(lit("s"), (get_json_object(col("props"), "$.k").cast("int") % 5)
            .cast("string")).as("vs"))
      val noFD = factsOf(0).limit(0).select("id", "k1")
      val noDD = dims.limit(0).select("k", "vf")
      graft.streaming.IncrementalTemporalStar.processBatch(
        factsOf(0), noFD, Seq(dims), Seq(noDD),
        st, batchId = 0L, numBuckets = 2)
      graft.streaming.IncrementalTemporalStar.processBatch(
        factsOf(5), noFD, Seq(dims.limit(0)), Seq(noDD),
        st, batchId = 1L, numBuckets = 2)
      st
    })
    graft.streaming.SqlCatalog.register(s, Seq(
      graft.streaming.SqlCatalog.temporalStarAsOfRead("x140_asof_for",
        state, numBranches = 1, numBuckets = 2)))
  }

  /** SQL as-of POINT read on the TEMPORAL family (R172's last
    * pass(T)-only TVF, driver-oracled r14): `x140_asof_for('s1', 0)` —
    * segment s1's revenue as of batch 0, from the maintained temporal
    * star's changelog, pruned to the encoded group's bucket. Oracle:
    * DuckDB's native ASOF JOIN over the batch-0 fact subset. */
  def x140SqlTemporalAsof(s: SparkSession, dir: String): DataFrame = {
    sqlTemporalAsOfViews(s, dir)
    s.sql("""SELECT g1 AS seg, total AS revenue_cents, rows AS purchases
      FROM x140_asof_for('s1', 0) ORDER BY seg""")
  }

  /** Shared maintained SESSIONS state behind the SQL point-read TVF
    * (x139): one sessionization fold of the events table (the x129
    * semantics: 30-minute strict gap, epoch-µs), so `sessionsPointRead`
    * is driver-oracled against the DuckDB per-user recompute. */
  private val sqlSessionsState = scala.collection.mutable.Map[String, String]()
  private def sqlSessionsViews(s: SparkSession, dir: String): Unit = sqlSessionsState.synchronized {
    val state = sqlSessionsState.getOrElseUpdate(dir, {
      val st = java.nio.file.Files.createTempDirectory("sqlsess").toString
      val ev = Tables.events(s, dir)
        .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
          col("user_id").as("k"))
      graft.streaming.IncrementalSessions.processBatch(ev,
        ev.limit(0).select("id", "k"), gap = 30L * 60L * 1000000L,
        stateDir = st, batchId = 0L, numBuckets = 4)
      st
    })
    graft.streaming.SqlCatalog.register(s, Seq(
      graft.streaming.SqlCatalog.sessionsPointRead("x139_sessions", state,
        numBuckets = 4)))
  }

  /** Maintained SESSIONS through SQL (R172's point-read surface,
    * driver-oracled r14): the `x139_sessions(7)` TABLE FUNCTION call —
    * user 7's session rows from the maintained live ∪ frozen state,
    * pruned to the user's bucket. Oracle: the x129 DuckDB
    * sessionization recompute filtered to the user, un-aggregated. */
  def x139SqlSessions(s: SparkSession, dir: String): DataFrame = {
    sqlSessionsViews(s, dir)
    s.sql("""SELECT k AS user_id, session_start, session_end, n_events
      FROM x139_sessions(7) ORDER BY session_start""")
  }

  /** Shared maintained EXTREMA state behind the SQL top-k TVF (x138):
    * one value-multiset fold over (order priority, exact cents), so the
    * r14 `extremaTopKRead` point read is driver-oracled against the
    * DuckDB window recompute. */
  private val sqlTopKState = scala.collection.mutable.Map[String, String]()
  private def sqlTopKViews(s: SparkSession, dir: String): Unit = sqlTopKState.synchronized {
    val state = sqlTopKState.getOrElseUpdate(dir, {
      val st = java.nio.file.Files.createTempDirectory("sqltopk").toString
      graft.streaming.IncrementalExtrema.processBatch(
        Tables.orders(s, dir)
          .select(col("o_orderpriority").as("g"),
            graft.functions.cents(col("o_totalprice")).as("v"))
          .groupBy("g", "v").agg(count(lit(1)).as("w")),
        st, batchId = 0L, numBuckets = 4)
      st
    })
    graft.streaming.SqlCatalog.register(s, Seq(
      graft.streaming.SqlCatalog.extremaTopKRead("x138_topk",
        s"$state/extrema", numBuckets = 4)))
  }

  /** Maintained exact TOP-K through SQL (r14): the
    * `x138_topk('1-URGENT', 5)` TABLE FUNCTION call — the group's 5
    * largest live order values from the extrema value-multiset state,
    * pruned to the group's bucket. Oracle: the DuckDB window recompute
    * over the same exact-cents relation. */
  def x138SqlTopK(s: SparkSession, dir: String): DataFrame = {
    sqlTopKViews(s, dir)
    s.sql("""SELECT g, v, w, rank
      FROM x138_topk('1-URGENT', 5) ORDER BY rank""")
  }

  /** Shared maintained INDEX state behind the SQL retrieval TVF
    * (x136): the bucketed postings + doc-length tables folded once per
    * (process, sf dir) from the documents corpus
    * ([[graft.streaming.IncrementalIndex.processBatchBucketed]]). */
  private val sqlBm25State = scala.collection.mutable.Map[String, String]()
  private def sqlBm25Views(s: SparkSession, dir: String): Unit = sqlBm25State.synchronized {
    val state = sqlBm25State.getOrElseUpdate(dir, {
      val st = java.nio.file.Files.createTempDirectory("sqlbm25").toString
      // the two index folds write DISJOINT tables (postings/doc_lens vs
      // positional) from the same corpus — overlap them (guide §2.6);
      // each keeps its own persist registry (optimization r17)
      val folds: Seq[() => Unit] = Seq(
        () => graft.streaming.IncrementalIndex.processBatchBucketed(
          Tables.documents(s, dir), st, batchId = 0L, numBuckets = 8),
        () => graft.streaming.IncrementalIndex.processBatchPositionalBucketed(
          Tables.documents(s, dir), st, batchId = 0L, numBuckets = 8))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(folds.map(f =>
            scala.concurrent.Future(graft.operators.Caching.isolated(f())))),
          scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
      st
    })
    graft.streaming.SqlCatalog.register(s, Seq(
      graft.streaming.SqlCatalog.bm25Read("x136_bm25", state, numBuckets = 8),
      graft.streaming.SqlCatalog.phraseRead("x137_phrase", state, numBuckets = 8)))
  }

  /** Per-QUERY BM25 retrieval through SQL (VERDICT r13 task 4): the
    * `x136_bm25('spark vector merge', 20)` TABLE FUNCTION call over the
    * maintained posting state — query-dependent idf computed in the
    * body, parameters confined to WHERE (the aggregating-TVF rule), the
    * exact-rational e6 scoring of x45, so the SQL surface answers
    * exactly what [[graft.streaming.IncrementalIndex.searchBm25Bucketed]]
    * answers. Oracle: the x45 DuckDB recompute (same terms, same k). */
  def x136SqlBm25(s: SparkSession, dir: String): DataFrame = {
    sqlBm25Views(s, dir)
    s.sql("""SELECT doc_id, matched, score_e6
      FROM x136_bm25('spark vector merge', 20)
      ORDER BY score_e6 DESC, doc_id""")
  }

  /** Per-QUERY exact PHRASE search through SQL (r14): the
    * `x137_phrase('table hash')` TABLE FUNCTION call over the maintained
    * bucketed positional state — the variable-length adjacency chain
    * folded by higher-order array functions in a non-aggregating outer
    * select ([[graft.streaming.SqlCatalog.phraseRead]]), answering
    * exactly what [[graft.streaming.IncrementalIndex.searchPhrase]]
    * answers. Oracle: the x50 DuckDB recompute (same phrase). */
  def x137SqlPhrase(s: SparkSession, dir: String): DataFrame = {
    sqlBm25Views(s, dir)
    s.sql("""SELECT doc_id, occurrences
      FROM x137_phrase('table hash') ORDER BY doc_id""")
  }

  /** SQL TIME-TRAVEL over a maintained view (R172 as-of surface): the registered
    * as-of frame (changelog integral truncated at batch 0) joined
    * ad-hoc against the live view — what changed since batch 0, per
    * segment, asked in plain SQL. Oracle: DuckDB recomputes both
    * epochs from the base tables (batch 0 = `% 10 = 0` orders; live =
    * `% 10 IN (0, 5)`). */
  def x134SqlAsof(s: SparkSession, dir: String): DataFrame = {
    sqlAsOfViews(s, dir)
    s.sql("""SELECT a.g AS segment, a.total AS rev_b0, v.total AS rev_live,
        a.rows AS orders_b0, v.rows AS orders_live
      FROM x134_rev_asof0 a JOIN x134_rev_live v ON a.g = v.g
      ORDER BY segment""")
  }

  /** SQL as-of POINT read (R172 as-of surface): the table-function call
    * `x134_asof_for('BUILDING', 0)` — routing hash constant-folds to
    * ONE bucket, `b <= 0` truncates the changelog — the bucket-pruned
    * time-travel read in one SQL expression. */
  def x135SqlAsofPoint(s: SparkSession, dir: String): DataFrame = {
    sqlAsOfViews(s, dir)
    s.sql("""SELECT g AS segment, total AS revenue_cents, rows AS orders
      FROM x134_asof_for('BUILDING', 0) ORDER BY segment""")
  }

  /** The SQL-queryable catalog surface (R172): revenue-by-segment and
    * order-value extrema are MAINTAINED views served as registered
    * Spark SQL temp views, and the query is an AD-HOC `spark.sql` JOIN
    * of the two — the reference's literal consumer UX (users SQL-join
    * summary tables, `/root/reference/README.md:24-189`). The oracle
    * recomputes both views from the base tables in one DuckDB query. */
  def x131SqlCatalog(s: SparkSession, dir: String): DataFrame = {
    sqlCatalogViews(s, dir)
    s.sql("""SELECT r.g AS segment, r.total AS revenue_cents,
        r.pairs AS orders, c.n_customers
      FROM x131_rev r JOIN x131_seg c ON r.g = c.g
      ORDER BY segment""")
  }

  /** The SQL-native bucket-pruned POINT READ (R172): a SQL table
    * function call with a literal segment — the body's routing hash
    * constant-folds into a partition filter, so ONE `a/` bucket is
    * opened (SqlCatalogSpec pins the PartitionFilters evidence; here
    * the driver pins the ANSWER against a plain filtered recompute). */
  def x132SqlPointread(s: SparkSession, dir: String): DataFrame = {
    sqlCatalogViews(s, dir)
    s.sql("""SELECT g AS segment, total AS revenue_cents, rows AS orders
      FROM x131_rev_for('BUILDING') ORDER BY segment""")
  }

  /** Batch twin of the incrementally-maintained SESSIONIZATION
    * ([[graft.streaming.IncrementalSessions]], R166): per-user session
    * statistics over the maintained session-row set — count, largest
    * session, longest span, total events. Same 30-minute strict-gap
    * semantics as `sessionize_events`; the maintained view's
    * per-session rows roll up to exactly this. */
  def x129UserSessions(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id").as("id"), expr("ts DIV 1000").as("t"),
        col("user_id").as("k"))
    graft.streaming.IncrementalSessions
      .sessionize(ev, 30L * 60L * 1000000L)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_sessions"), max(col("n")).as("max_events"),
        max(col("en") - col("st")).as("longest_us"),
        sum(col("n")).as("total_events"))
      .select(col("k").as("user_id"), col("n_sessions"), col("max_events"),
        col("longest_us"), col("total_events"))
      .orderBy("user_id")
  }

  /** TF-IDF top-3 keywords per doc ([[TextAnalysis.tfidfTopK]]): the
    * keyword-extraction pass; log-free rational idf so the score is exact
    * int64 arithmetic + one IEEE division on both engines. */
  def x27TfidfTopk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopK(Tables.documents(s, dir), k = 3)
      .orderBy("doc_id", "rn")

  /** PII detection/redaction over the deterministic dirty corpus
    * ([[TextAnalysis.synthesizePii]] + [[TextAnalysis.pii]]): per-doc
    * match counts + redacted-text md5, both fully replayable in SQL. */
  def x26Pii(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pii(TextAnalysis.synthesizePii(Tables.documents(s, dir)))
      .orderBy("doc_id")

  // ----------------------------------------------------------- multimodal ----

  def mmMediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.features(s, Multimodal.synthesize(Tables.documents(s, dir)))
      .orderBy("doc_id")

  /** REAL codec round-trip ([[graft.operators.MediaCodecs]]): per doc a
    * deterministic BMP (even ids) or PCM16 WAV (odd ids) is ENCODED to
    * actual format bytes and DECODED back inside a typed partition-local
    * pass; the oracle recomputes the expected features from the
    * generating formula — a hash match proves the full byte layout (BMP
    * row padding, RIFF chunk walk, endianness) round-trips exactly.
    * Output (all exact int64): image → (w, h, meanB/G/R_e6);
    * audio → (rate, n_samples, duration_us, energy). */
  def mm2CodecRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.MediaCodecs
    Tables.documents(s, dir).select("doc_id").as[Long].mapPartitions { it =>
      it.map { id =>
        if (id % 2 == 0) {
          val w = (4 + (id % 4) * 2).toInt
          val h = (2 + (id % 3)).toInt
          val bytes = MediaCodecs.encodeBmp(w, h, k => ((id * 31 + k * 7) % 256).toInt)
          val info = MediaCodecs.decodeBmp(bytes).get
          (id, "image", info.width.toLong, info.height.toLong,
            info.meanE6(0), info.meanE6(1), info.meanE6(2))
        } else {
          val n = (8 + id % 8).toInt
          val samples = Array.tabulate(n)(i => (((id * 13 + i * 5) % 2001) - 1000).toShort)
          val bytes = MediaCodecs.encodeWavPcm16(16000, samples)
          val info = MediaCodecs.decodeWav(bytes).get
          (id, "audio", info.sampleRate.toLong, info.nSamples,
            info.durationUs, info.energy, 0L)
        }
      }
    }.toDF("doc_id", "media_type", "m1", "m2", "m3", "m4", "m5")
      .orderBy("doc_id")
  }

  /** REAL resize + frame-sample round-trip — the two remaining
    * multimodal verbs as actual byte-level codecs
    * ([[graft.operators.MediaCodecs.resizeBmpNearest]] /
    * `wavFrameEnergies`), oracle-replayed from the generating formulas:
    * even ids encode a deterministic `w0`×`h0` BMP, nearest-neighbor
    * resize to 5×3, decode back → dims + exact per-channel e6 means
    * (the oracle recomputes each target pixel's source byte via the
    * floor mapping `sy = y·h0 DIV 3, sx = x·w0 DIV 5`); odd ids encode
    * PCM16 WAV, sample every 2nd full 8-sample frame → exact int64
    * frame energies. A hash match proves resize's pixel addressing
    * (stride, padding, channel order) and the frame walk exactly. */
  def mm3ResizeFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.MediaCodecs
    Tables.documents(s, dir).select("doc_id").as[Long].mapPartitions { it =>
      it.flatMap { id =>
        if (id % 2 == 0) {
          val w0 = (8 + (id % 4) * 2).toInt
          val h0 = (4 + (id % 3)).toInt
          val bytes = MediaCodecs.encodeBmp(w0, h0, k => ((id * 31 + k * 7) % 256).toInt)
          val resized = MediaCodecs.resizeBmpNearest(bytes, 5, 3).get
          val info = MediaCodecs.decodeBmp(resized).get
          Iterator.single((id, "image", 0L, info.width.toLong, info.height.toLong,
            info.meanE6(0), info.meanE6(1), info.meanE6(2)))
        } else {
          val n = (24 + id % 8).toInt
          val samples = Array.tabulate(n)(i => (((id * 13 + i * 5) % 2001) - 1000).toShort)
          val bytes = MediaCodecs.encodeWavPcm16(16000, samples)
          MediaCodecs.wavFrameEnergies(bytes, 8, 2).get.iterator.map {
            case (f, e) => (id, "audio", f.toLong, e, 8L, 0L, 0L, 0L)
          }
        }
      }
    }.toDF("doc_id", "media_type", "idx", "v1", "v2", "v3", "v4", "v5")
      .orderBy("doc_id", "idx")
  }

  /** REAL PNG round-trip ([[graft.operators.PngCodec]], r15 — VERDICT
    * r14 task 3): per doc a deterministic RGB image is ENCODED to
    * actual PNG bytes — zlib DEFLATE over per-row filtered scanlines,
    * with the filter type CYCLING through all five spec filters
    * (None/Sub/Up/Average/Paeth, `row % 5`) so every unfilter path
    * runs — and DECODED back (CRC-verified chunk walk, Inflater,
    * filter reconstruction) inside a typed partition-local pass. The
    * oracle recomputes the per-channel e6 means from the GENERATING
    * pixel formula and never parses bytes: any slip in the filter
    * math, the zlib framing, or the scanline addressing diverges the
    * decoded means and reds the hash. */
  def mm4PngRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.PngCodec
    Tables.documents(s, dir).select("doc_id").as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (8 + (id % 4) * 2).toInt
        val h = (4 + (id % 3)).toInt
        val rgb = Array.tabulate(w * h * 3)(k => ((id * 31 + k * 7) % 256).toByte)
        val bytes = PngCodec.encode(w, h, rgb, row => row % 5)
        val (dw, dh, means) = PngCodec.decodeMeans(bytes).get
        (id, dw.toLong, dh.toLong, means(0), means(1), means(2))
      }
    }.toDF("doc_id", "w", "h", "mean_r_e6", "mean_g_e6", "mean_b_e6")
      .orderBy("doc_id")
  }

  /** REAL baseline-JPEG round-trip ([[graft.operators.JpegCodec]], r16
    * — VERDICT r15 task 1): per doc a deterministic smooth-gradient RGB
    * image (three per-channel linear ramps, no value wraps) is ENCODED
    * to actual baseline JPEG bytes — quality-90 Annex-K quantization,
    * standard Huffman tables, 4:4:4 on even ids and 4:2:0 (2×2-mean
    * chroma downsample) on odd, DRI/RSTn segmentation every 5th doc —
    * and DECODED back (marker walk, Huffman, dequant, IDCT, upsample,
    * YCbCr→RGB) inside a typed partition-local pass. JPEG is LOSSY, so
    * the hashed columns are the FORMULA means (closed-form int64,
    * oracle-replayable) plus in-plan error-band flags asserting the
    * DECODED means land within 3 gray levels (e6-scaled) of the
    * formula — the x8/x10 device: the oracle expects every flag = 1,
    * so a decoder that drifts (wrong dequant, broken upsample, IDCT
    * bug) reds the hash even though the oracle cannot replay lossy
    * bytes. */
  def mm5JpegRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.JpegCodec
    Tables.documents(s, dir).select("doc_id").as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (16 + (id % 3) * 8).toInt // 16 / 24 / 32
        val h = (16 + (id % 2) * 8).toInt // 16 / 24
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = (y * w + x) * 3
            rgb(o) = (16 + id % 16 + x * 4 + y * 2).toByte
            rgb(o + 1) = (32 + id % 8 + x * 2 + y * 4).toByte
            rgb(o + 2) = (64 + id % 32 + x + y * 3).toByte
            x += 1
          }
          y += 1
        }
        val bytes = JpegCodec.encode(w, h, rgb, quality = 90,
          subsample420 = id % 2 == 1,
          restartInterval = if (id % 5 == 0) 2 else 0)
        val (dw, dh, decoded) = JpegCodec.decodeMeans(bytes).get
        val sums = new Array[Long](3)
        var i = 0
        while (i < rgb.length) { sums(i % 3) += rgb(i) & 0xff; i += 1 }
        val formula = sums.map(_ * 1000000L / (w * h))
        def band(c: Int): Long =
          if (dw == w && dh == h &&
            math.abs(decoded(c) - formula(c)) <= 3000000L) 1L else 0L
        (id, w.toLong, h.toLong, formula(0), formula(1), formula(2),
          band(0), band(1), band(2))
      }
    }.toDF("doc_id", "w", "h", "mean_r_e6", "mean_g_e6", "mean_b_e6",
      "band_r", "band_g", "band_b")
      .orderBy("doc_id")
  }

  /** Perceptual image near-dup ([[Dedup.imageNearDupPairs]], the
    * multimodal member of the dedup family): real 24-bit BMPs with
    * PLANTED near-identical groups ([[Multimodal.synthesizeBmpNearDups]])
    * are decoded and average-hashed in one codegen'd projection, then
    * Hamming-blocked exactly like SimHash. All-integer cell sums and the
    * padding-free 16×16 layout make the full decode+hash+pair pipeline
    * replayable in SQL. */
  def x46ImageNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.imageNearDupPairs(
      Multimodal.synthesizeBmpNearDups(Tables.documents(s, dir)), maxHamming = 3)
      .orderBy("id1", "id2")

  /** Exact phrase search over the positional inverted index
    * ([[graft.operators.InvertedIndex.phraseSearch]]): per-doc
    * occurrence counts of the phrase "table hash", served from the
    * positional postings (persisted here; maintained state in
    * [[graft.streaming.IncrementalIndex.searchPhrase]]) — the corpus is
    * never rescanned by the matching plan. */
  def x50PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val pos = graft.operators.Caching.persisted(
      graft.operators.InvertedIndex.positionalPostings(
        Tables.documents(s, dir), "doc_id", "text"))
    graft.operators.InvertedIndex.phraseSearch(pos, Seq("table", "hash"))
  }

  /** Perceptual audio near-dup ([[Dedup.audioNearDupPairs]]): real PCM16
    * WAVs with planted near-identical groups
    * ([[Multimodal.synthesizeWavNearDups]]), decoded and energy-envelope
    * hashed in one codegen'd projection, Hamming-blocked like SimHash —
    * the audio member of the dedup family. All-integer window energies
    * make the full pipeline SQL-replayable. */
  def x49AudioNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.audioNearDupPairs(
      Multimodal.synthesizeWavNearDups(Tables.documents(s, dir)), maxHamming = 3)
      .orderBy("id1", "id2")

  // -------------------------------------------------------------- oracles ----

  /** Rounded quality score fragment shared by the ta_quality and
    * x17_curate oracles — ONE source of truth for the formula
    * ([[TextAnalysis.quality]]'s mirror). */
  private val duckQs: String =
    "floor((least(len(string_split(text,' ')), 100) / 100.0 * 0.5" +
      " + (len(list_distinct(string_split(text,' '))) / len(string_split(text,' '))) * 0.3" +
      " + (1.0 - len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','is','to','in'))) / len(string_split(text,' '))) * 0.2)" +
      " * 10000.0 + 0.5) / 10000.0"

  /** DuckDB 3-gram builder fragment (1-indexed lists; mirrors
    * [[TextOps.shingles]] with n=3). */
  private val duckGrams =
    "list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)])"

  /** Shared MinHash-LSH → connected-components CTE chain (the
    * [[x11DedupClusters]] pipeline mirror, used by the x11 and x25
    * oracles): a full `WITH RECURSIVE` prefix ending in
    * `clust(id, cluster)`. Callers append more CTEs with a leading comma
    * or SELECT from `clust` directly. */
  private val duckClusterCtes: String =
    s"""WITH RECURSIVE g AS (
       |  SELECT doc_id, $duckGrams AS grams
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |  WHERE len(w) >= 3
       |),
       |sig AS (
       |  SELECT doc_id, grams,
       |    [list_min([substr(md5(x), 1 + 4*k, 4) for x in grams]) for k in range(0, 8)] AS sig
       |  FROM g
       |),
       |band AS (
       |  SELECT doc_id, i AS band_idx, sig[2*i+1]||sig[2*i+2] AS band_key
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS i)
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM band a JOIN band b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |),
       |verified AS (
       |  SELECT id1, id2
       |  FROM cand JOIN g g1 ON g1.doc_id = id1 JOIN g g2 ON g2.doc_id = id2
       |  WHERE ${graft.functions.duckRound(
             "len(list_intersect(g1.grams, g2.grams)) * 1.0 / (len(g1.grams) + len(g2.grams) - len(list_intersect(g1.grams, g2.grams)))", 4)} >= 0.8
       |),
       |und AS (SELECT id1 AS a, id2 AS b FROM verified UNION ALL SELECT id2, id1 FROM verified),
       |reach AS (
       |  SELECT a, b FROM und
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
       |),
       |clust AS (
       |  SELECT n.id, least(n.id, min(r.b)) AS cluster
       |  FROM (SELECT DISTINCT a AS id FROM und) n LEFT JOIN reach r ON r.a = n.id
       |  GROUP BY n.id
       |)""".stripMargin

  /** DuckDB mirror of the SimHash pipeline ([[Dedup.simhashes]] +
    * [[Dedup.simhashPairs]]): per-token 64-bit hash rebuilt nibble-by-nibble
    * from md5 hex (HUGEINT arithmetic — the value equals
    * graft.functions.md5Hash64's signed long bit-for-bit), per-doc per-bit
    * strict-majority vote, fingerprint folded back to signed BIGINT,
    * 16-bit-chunk pigeonhole blocking, Hamming ≤ 3. Generated: 16 nibble
    * terms + 64 bit-count sums + 64 majority cases. The [1:255] slice
    * mirrors maxTokens and never truncates on this corpus (max 31 distinct
    * tokens/doc), so list_distinct order is irrelevant — all downstream
    * folds are order-insensitive sums. */
  private val duckSimhashPairs: String = {
    val hexDig = "'0123456789abcdef'"
    val hTerms = (0 until 16).map(i =>
      s"CAST(instr($hexDig, substr(m, ${i + 1}, 1))-1 AS HUGEINT) * ${BigInt(16).pow(15 - i)}::HUGEINT")
      .mkString(" + ")
    val cSums = (0 until 64).map(b =>
      s"sum(CASE WHEN (h // ${BigInt(2).pow(b)}::HUGEINT) % 2 = 1 THEN 1 ELSE 0 END) AS c$b")
      .mkString(", ")
    val fpSum = (0 until 64).map(b =>
      s"CASE WHEN c$b*2 > n THEN ${BigInt(2).pow(b)}::HUGEINT ELSE 0::HUGEINT END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text,' '))[1:255]) AS tok FROM documents
       |),
       |th AS (
       |  SELECT doc_id, $hTerms AS h FROM (SELECT doc_id, md5(tok) AS m FROM toks)
       |),
       |sig AS (
       |  SELECT doc_id, count(*) AS n, $cSums FROM th GROUP BY doc_id
       |),
       |fp AS (
       |  SELECT doc_id, CAST(fph - CASE WHEN fph >= ${BigInt(2).pow(63)}::HUGEINT THEN ${BigInt(2).pow(64)}::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS simhash
       |  FROM (SELECT doc_id, ($fpSum) AS fph FROM sig)
       |),
       |chunk AS (
       |  SELECT doc_id, simhash, i AS chunk_idx, (simhash >> (16*i)) & 65535 AS chunk
       |  FROM fp, (SELECT unnest([0,1,2,3]) AS i)
       |)
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM chunk a JOIN chunk b ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY id1, id2""".stripMargin
  }

  /** DuckDB mirror of the image near-dup (x46): regenerates every pixel
    * byte from the planting formula (file byte 54+k IS pixel byte k for
    * the padding-free 16×16 layout), folds the 8×8 cell sums, sets bit
    * i·8+j iff 64·cell > total (the aHash64 rule, pure int), packs the
    * signed-64 hash via HUGEINT (the x3 recipe), then the identical
    * 16-bit-chunk blocking + bit_count Hamming tail. */
  private val duckImageNearDup: String = {
    val pows = (0 until 64).map(c => s"${BigInt(2).pow(c)}::HUGEINT").mkString("[", ", ", "]")
    val hexDig = "'0123456789abcdef'"
    s"""WITH px0 AS (
       |  SELECT d.doc_id, u.k,
       |    ((u.k // 48) // 2) * 8 + (((u.k % 48) // 3) // 2) AS cell
       |  FROM documents d CROSS JOIN (SELECT unnest(range(768)) AS k) u
       |),
       |px1 AS (
       |  SELECT doc_id, k, cell,
       |    (instr($hexDig, substr(mh, 1, 1)) - 1) * 16
       |      + (instr($hexDig, substr(mh, 2, 1)) - 1) AS b
       |  FROM (SELECT doc_id, k, cell,
       |          md5(CAST(doc_id // 4 AS VARCHAR) || ':' || CAST(cell AS VARCHAR)) AS mh
       |        FROM px0)
       |),
       |px AS (
       |  SELECT doc_id, cell,
       |    CASE WHEN doc_id % 4 > 0 AND cell = doc_id % 4 - 1
       |         THEN ((b + k * 11) % 256 + 120) % 256
       |         ELSE (b + k * 11) % 256 END AS p
       |  FROM px1
       |),
       |cells AS (SELECT doc_id, cell, CAST(sum(p) AS BIGINT) AS cs FROM px GROUP BY doc_id, cell),
       |tot AS (SELECT doc_id, CAST(sum(cs) AS BIGINT) AS total FROM cells GROUP BY doc_id),
       |bits AS (
       |  SELECT c.doc_id, c.cell, CASE WHEN c.cs * 64 > t.total THEN 1 ELSE 0 END AS bit
       |  FROM cells c JOIN tot t USING (doc_id)
       |),
       |fp AS (
       |  SELECT doc_id, CAST(fph - CASE WHEN fph >= ${BigInt(2).pow(63)}::HUGEINT THEN ${BigInt(2).pow(64)}::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS simhash
       |  FROM (SELECT doc_id, sum(CASE WHEN bit = 1 THEN $pows[cell + 1] ELSE 0::HUGEINT END) AS fph
       |        FROM bits GROUP BY doc_id)
       |),
       |chunk AS (
       |  SELECT doc_id, simhash, i AS chunk_idx, (simhash >> (16*i)) & 65535 AS chunk
       |  FROM fp, (SELECT unnest([0,1,2,3]) AS i)
       |)
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM chunk a JOIN chunk b ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY id1, id2""".stripMargin
  }

  /** DuckDB mirror of the window funnel (x54): same greedy minimal
    * continuation per signup anchor, exact integer-µs comparisons. */
  private val duckWindowFunnel: String =
    """WITH e AS (
      |  SELECT user_id AS u, event_type AS et, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events
      |),
      |s1 AS (SELECT u, t AS t1, t AS tk FROM e WHERE et = 'signup'),
      |s2 AS (
      |  SELECT s1.u, t1, min(e.t) AS tk FROM s1 JOIN e USING (u)
      |  WHERE e.et = 'click' AND e.t > s1.tk AND e.t <= t1 + 86400000000
      |  GROUP BY s1.u, t1
      |),
      |s3 AS (
      |  SELECT s2.u, t1, min(e.t) AS tk FROM s2 JOIN e USING (u)
      |  WHERE e.et = 'purchase' AND e.t > s2.tk AND e.t <= t1 + 86400000000
      |  GROUP BY s2.u, t1
      |),
      |lv AS (
      |  SELECT u, max(l) AS level FROM (
      |    SELECT DISTINCT u, 0 AS l FROM e
      |    UNION ALL SELECT DISTINCT u, 1 FROM s1
      |    UNION ALL SELECT DISTINCT u, 2 FROM s2
      |    UNION ALL SELECT DISTINCT u, 3 FROM s3
      |  ) GROUP BY u
      |)
      |SELECT level, CAST(count(*) AS BIGINT) AS n_users
      |FROM lv GROUP BY 1 ORDER BY level""".stripMargin

  /** DuckDB mirror of the sequence match (x56): the same feasible-set
    * stage chain — DISTINCT (user, t) per stage, per-gap upper bounds
    * relative to the previous matched event. */
  private val duckSequenceMatch: String =
    """WITH e AS (
      |  SELECT user_id AS u, event_type AS et, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events
      |),
      |s1 AS (SELECT DISTINCT u, t FROM e WHERE et = 'view'),
      |s2 AS (
      |  SELECT DISTINCT e.u, e.t FROM e JOIN s1 ON e.u = s1.u
      |  WHERE e.et = 'click' AND e.t > s1.t AND e.t <= s1.t + 3600000000
      |),
      |s3 AS (
      |  SELECT DISTINCT e.u, e.t FROM e JOIN s2 ON e.u = s2.u
      |  WHERE e.et = 'purchase' AND e.t > s2.t AND e.t <= s2.t + 86400000000
      |),
      |m AS (
      |  SELECT u, CASE WHEN u IN (SELECT u FROM s3) THEN 1 ELSE 0 END AS matched
      |  FROM (SELECT DISTINCT u FROM e)
      |)
      |SELECT matched, CAST(count(*) AS BIGINT) AS n_users
      |FROM m GROUP BY 1 ORDER BY matched""".stripMargin

  /** DuckDB mirror of the bitmap retention (x57): identical 63-bit word
    * layout (DuckDB's `<<` raises on 1<<63, hence 63 bits/word on both
    * engines), popcounts over the same word joins. */
  private val duckBitmapRetention: String =
    """WITH st AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS g,
      |    user_id // 63 AS word,
      |    bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS bits
      |  FROM events GROUP BY 1, 2
      |),
      |card AS (SELECT g, CAST(sum(bit_count(bits)) AS BIGINT) AS n_users
      |         FROM st GROUP BY 1),
      |nxt AS (SELECT a.g,
      |          CAST(sum(bit_count(COALESCE(a.bits & b.bits, 0))) AS BIGINT)
      |            AS n_returning
      |        FROM st a LEFT JOIN st b ON b.g = a.g + 1 AND b.word = a.word
      |        GROUP BY a.g)
      |SELECT card.g AS day, n_users, n_returning
      |FROM card JOIN nxt ON card.g = nxt.g ORDER BY day""".stripMargin

  /** DuckDB mirror of the bigram surprisal (x60): identical tokenization,
    * lead-window bigrams, and the same `length(bin(count))` exact
    * floor-log₂ — the trick that makes an LM-style score hashable. */
  private val duckBigramSurprisal: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |tk AS (SELECT doc_id, unnest([{'pos': i, 'tok': w[i]} for i in range(1, len(w) + 1)]) AS u FROM t),
      |bg0 AS (SELECT doc_id, u.tok AS w1,
      |          lead(u.tok) OVER (PARTITION BY doc_id ORDER BY u.pos) AS w2 FROM tk),
      |bg AS (SELECT doc_id, w1, w2 FROM bg0 WHERE w2 IS NOT NULL),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      |sc AS (SELECT bg.doc_id, length(bin(c1.c1)) - length(bin(c12.c12)) AS bits
      |       FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(bits) AS BIGINT) AS total_bits,
      |  CAST(sum(bits) AS BIGINT) * 1000 // count(*) AS bits_e3
      |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of the KMV set algebra (x63): same md5 sketches, the
    * same union-rank/ρ/uk estimator expressions term for term. */
  private val duckKmvSetAlgebra: String =
    s"""WITH e AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS g, user_id
       |  FROM events WHERE user_id IS NOT NULL
       |),
       |m0 AS (SELECT g, md5(CAST(user_id AS VARCHAR)) AS mm FROM e),
       |hh AS (SELECT g, ${duckNibbleFold("mm")} AS hu FROM m0),
       |dh AS (SELECT DISTINCT g, ${duckSigned("hu")} AS h FROM hh),
       |du AS (SELECT g, h, ${duckUnitInterval("h")} AS u FROM dh),
       |sk AS (
       |  SELECT g, h, u FROM (
       |    SELECT g, h, u, ROW_NUMBER() OVER (PARTITION BY g ORDER BY u, h) AS rn
       |    FROM du) WHERE rn <= 64
       |),
       |days AS (SELECT DISTINCT g FROM e),
       |pairs AS (SELECT a.g AS g1, a.g + 1 AS g2 FROM days a JOIN days b ON b.g = a.g + 1),
       |un AS (
       |  SELECT g1, g2, h, u, count(DISTINCT side) AS sides FROM (
       |    SELECT p.g1, p.g2, s.h, s.u, 'a' AS side FROM pairs p JOIN sk s ON s.g = p.g1
       |    UNION ALL
       |    SELECT p.g1, p.g2, s.h, s.u, 'b' FROM pairs p JOIN sk s ON s.g = p.g2
       |  ) GROUP BY 1, 2, 3, 4
       |),
       |r AS (SELECT g1, g2, sides, u,
       |        ROW_NUMBER() OVER (PARTITION BY g1, g2 ORDER BY u, h) AS rk FROM un),
       |f AS (SELECT g1, g2, count(*) AS m,
       |        sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS n_both,
       |        max(CASE WHEN rk = 64 THEN u END) AS uk
       |      FROM r WHERE rk <= 64 GROUP BY 1, 2)
       |SELECT g1 AS day, g2 AS next_day,
       |  CAST(n_both AS BIGINT) * 1000000 // CAST(m AS BIGINT) AS jaccard_ppm,
       |  CASE WHEN m < 64 THEN CAST(m AS DOUBLE) ELSE 63.0 / uk END AS union_est,
       |  CASE WHEN m < 64 THEN CAST(n_both AS DOUBLE)
       |       ELSE CAST(n_both AS DOUBLE) / 64.0 * (63.0 / uk) END AS inter_est
       |FROM f ORDER BY day""".stripMargin

  /** DuckDB mirror of the decayed sums (x64): same cents, same max-day
    * anchor, the same per-row `· 10⁶ // 2^age` truncation. */
  private val duckDecayedSum: String =
    s"""WITH e AS (
       |  SELECT event_type, ${graft.functions.centsSql("value")} AS c,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
       |  FROM events WHERE value IS NOT NULL
       |),
       |m AS (SELECT max(day) AS mx FROM e)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(c) AS BIGINT) AS sum_cents,
       |  CAST(sum(c * 1000000 // (1::BIGINT << CAST(LEAST(mx - day, 62) AS INT))) AS BIGINT) AS decayed_e6
       |FROM e, m GROUP BY 1 ORDER BY event_type""".stripMargin

  /** DuckDB mirror of the novelty scores (x66): same distinct grams,
    * same min-doc_id first-occurrence rule, same integer ppm. */
  private val duckNovelty: String =
    s"""WITH g AS (
       |  SELECT doc_id, unnest($duckGrams) AS gram
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |  WHERE len(w) >= 3
       |),
       |fo AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
       |  CAST(sum(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) * 1000000
       |    // CAST(count(*) AS BIGINT) AS novelty_ppm
       |FROM g JOIN fo USING (gram) GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  /** DuckDB mirror of the interval coverage (x67): same (s, e)-ordered
    * ROWS-frame running max, island flags, per-island spans. */
  private val duckIntervalCoverage: String =
    """WITH iv AS (
      |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
      |         epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
      |  FROM events
      |),
      |w AS (SELECT k, s, e,
      |        max(e) OVER (PARTITION BY k ORDER BY s, e
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |      FROM iv),
      |fl AS (SELECT k, s, e, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw FROM w),
      |isl AS (SELECT k, s, e,
      |          sum(nw) OVER (PARTITION BY k ORDER BY s, e
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |        FROM fl),
      |cov AS (SELECT k, island, max(e) - min(s) AS len FROM isl GROUP BY 1, 2)
      |SELECT k AS user_id,
      |  CAST(sum(len) AS BIGINT) // 1000000 AS covered_sec,
      |  CAST(count(*) AS BIGINT) AS n_islands
      |FROM cov GROUP BY k ORDER BY user_id""".stripMargin

  /** DuckDB mirror of the correlation moments (x68): same dollar grid,
    * same additive int64 sums, same fixed-IEEE corr expression. */
  private val duckCorrMoments: String =
    s"""WITH e AS (
       |  SELECT l_returnflag AS g,
       |    ${graft.functions.centsSql("l_extendedprice")} // 100 AS x,
       |    CAST(l_quantity AS BIGINT) AS y
       |  FROM lineitem
       |),
       |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy,
       |        CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy
       |      FROM e GROUP BY g)
       |SELECT g AS l_returnflag, n, sx, sy, sxy, sxx, syy,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
       |        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
       |  THEN floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 10000.0 + 0.5) / 10000.0
       |  END AS corr4
       |FROM m ORDER BY l_returnflag""".stripMargin

  /** DuckDB mirror of uniqUpTo (x71): the saturating cap is just LEAST
    * over the exact distinct count. */
  private val duckUniqUpTo: String =
    """SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |  LEAST(CAST(count(DISTINCT user_id) AS BIGINT), 41) AS uniq_up_to
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  /** DuckDB mirror of the argMax (x70): ROW_NUMBER over the identical
    * (cents DESC, user_id DESC) total order. */
  private val duckArgMax: String =
    s"""WITH e AS (
       |  SELECT event_type, user_id, ${graft.functions.centsSql("value")} AS c
       |  FROM events WHERE value IS NOT NULL
       |),
       |r AS (SELECT event_type, user_id, c,
       |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c DESC, user_id DESC) AS rn
       |      FROM e WHERE c IS NOT NULL)
       |SELECT event_type, user_id AS top_user, c AS top_cents
       |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** DuckDB mirror of the peak concurrency (x72): the same sweep-line
    * deltas under the same `(p, ord)` order; DuckDB's default window
    * frame is the same RANGE cumulative frame, so tie-peers read the
    * identical post-batch count. */
  private val duckMaxIntersections: String =
    """WITH iv AS (
      |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
      |         epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
      |  FROM events
      |),
      |pts AS (
      |  SELECT k, s AS p, 1 AS d, 1 AS ord FROM iv
      |  UNION ALL
      |  SELECT k, e AS p, -1 AS d, 0 AS ord FROM iv
      |),
      |c AS (SELECT k, p, d,
      |        sum(d) OVER (PARTITION BY k ORDER BY p, ord) AS cum
      |      FROM pts),
      |m AS (SELECT k, p, d, cum, max(cum) OVER (PARTITION BY k) AS mx FROM c)
      |SELECT k AS user_id, CAST(max(cum) AS BIGINT) AS max_conc,
      |  CAST(min(CASE WHEN cum = mx AND d = 1 THEN p END) AS BIGINT) AS at_p
      |FROM m GROUP BY k ORDER BY user_id""".stripMargin

  /** DuckDB mirror of the deltaSum (x73): lag under the identical total
    * `(t, id)` order, GREATEST-clamped steps, first row contributes 0. */
  private val duckDeltaSum: String =
    s"""WITH e AS (
       |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
       |    event_id AS id, ${graft.functions.centsSql("value")} AS v
       |  FROM events WHERE value IS NOT NULL
       |),
       |l AS (SELECT k, v, lag(v) OVER (PARTITION BY k ORDER BY t, id) AS prev
       |      FROM e WHERE v IS NOT NULL)
       |SELECT k AS user_id, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN prev IS NULL THEN 0 ELSE GREATEST(v - prev, 0) END) AS BIGINT) AS delta_sum
       |FROM l GROUP BY k ORDER BY user_id""".stripMargin

  /** DuckDB mirror of the higher moments (x74): identical additive
    * power sums, then the identical fixed-IEEE reads — mean computed
    * once, left-to-right products, `m2·sqrt(m2)` (never `pow`). */
  private val duckMomentStats: String =
    s"""WITH e AS (
       |  SELECT event_type AS g, ${graft.functions.centsSql("value")} // 100 AS x
       |  FROM events WHERE value IS NOT NULL
       |),
       |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x*x) AS BIGINT) AS s2,
       |        CAST(sum(x*x*x) AS BIGINT) AS s3, CAST(sum(x*x*x*x) AS BIGINT) AS s4
       |      FROM e GROUP BY g),
       |b AS (SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean FROM a),
       |c AS (SELECT *,
       |        CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean AS m2,
       |        CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
       |          - 3.0 * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
       |          + 2.0 * mean * mean * mean AS m3,
       |        CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
       |          - 4.0 * mean * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
       |          + 6.0 * mean * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
       |          - 3.0 * mean * mean * mean * mean AS m4
       |      FROM b)
       |SELECT g AS event_type, n, s1, s2, s3, s4,
       |  CASE WHEN m2 > 0 THEN ${graft.functions.duckRound("m3 / (m2 * sqrt(m2))", 4)} END AS skew4,
       |  CASE WHEN m2 > 0 THEN ${graft.functions.duckRound("m4 / (m2 * m2)", 4)} END AS kurt4
       |FROM c ORDER BY event_type""".stripMargin

  /** DuckDB mirror of the weighted quantiles (x75): identical per-value
    * weight sums, identical ceil-rank targets, same min-value pick. */
  private val duckWeightedQuantiles: String =
    s"""WITH e AS (
       |  SELECT l_returnflag AS g, ${graft.functions.centsSql("l_extendedprice")} AS v,
       |    CAST(l_quantity AS BIGINT) AS w
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
       |),
       |h AS (SELECT g, v, CAST(sum(w) AS BIGINT) AS cnt FROM e GROUP BY g, v),
       |c AS (SELECT g, v,
       |        CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
       |      FROM h),
       |t AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY g),
       |qv AS (SELECT * FROM (VALUES ('q25', 1, 4), ('q50', 1, 2), ('q75', 3, 4)) AS v(q, nu, de)),
       |tg AS (SELECT g, q, n, (nu * n + de - 1) // de AS target FROM t CROSS JOIN qv)
       |SELECT c.g AS l_returnflag, tg.q, CAST(min(tg.n) AS BIGINT) AS w_total,
       |  min(c.v) AS value_cents
       |FROM c JOIN tg ON c.g = tg.g AND c.cum >= tg.target
       |GROUP BY c.g, tg.q ORDER BY l_returnflag, q""".stripMargin

  /** DuckDB mirror of the linear regression (x76): identical moment
    * sums, identical varx gate, the raw slope chained into the
    * intercept before the boundary round. */
  private val duckLinReg: String =
    s"""WITH e AS (
       |  SELECT l_returnflag AS g,
       |    ${graft.functions.centsSql("l_extendedprice")} // 100 AS x,
       |    CAST(l_quantity AS BIGINT) AS y
       |  FROM lineitem
       |),
       |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy,
       |        CAST(sum(x*x) AS BIGINT) AS sxx
       |      FROM e GROUP BY g),
       |v AS (SELECT *, CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx FROM m),
       |s AS (SELECT *, CASE WHEN varx > 0 THEN
       |        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / varx
       |      END AS slope_raw FROM v)
       |SELECT g AS l_returnflag, n,
       |  ${graft.functions.duckRound("slope_raw", 4)} AS slope4,
       |  ${graft.functions.duckRound("(CAST(sy AS DOUBLE) - slope_raw * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)", 4)} AS icept4
       |FROM s ORDER BY l_returnflag""".stripMargin

  /** DuckDB mirror of the Mann-Whitney U (x77): identical doubled
    * tie-averaged ranks (2·rank + cnt_eq − 1), identical U identities. */
  private val duckMannWhitney: String =
    s"""WITH e AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS g,
       |    event_type AS s, ${graft.functions.centsSql("value")} AS v
       |  FROM events
       |  WHERE event_type IN ('click', 'error') AND value IS NOT NULL
       |),
       |r AS (SELECT g, s,
       |        rank() OVER (PARTITION BY g ORDER BY v) AS rk,
       |        count(*) OVER (PARTITION BY g, v) AS ceq
       |      FROM e),
       |r2 AS (SELECT g, s, 2 * rk + ceq - 1 AS r2 FROM r),
       |a AS (SELECT g,
       |        CAST(sum(CASE WHEN s = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |        CAST(sum(CASE WHEN s = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |        CAST(sum(CASE WHEN s = 'click' THEN r2 ELSE 0 END) AS BIGINT) AS r2_a
       |      FROM r2 GROUP BY g)
       |SELECT g AS day, n_a, n_b,
       |  r2_a - n_a * (n_a + 1) AS u2_a,
       |  2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b
       |FROM a ORDER BY day""".stripMargin

  /** DuckDB mirror of the sorted group-concat (x78): distinct first,
    * numeric ORDER BY inside string_agg, per-element VARCHAR cast. */
  private val duckGroupConcat: String =
    """WITH d AS (
      |  SELECT DISTINCT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id
      |  FROM events
      |)
      |SELECT event_type, day,
      |  string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id) AS users,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM d GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  /** DuckDB mirror of the Spearman rho (x79): identical doubled ranks
    * feeding the identical x68 moment sums and fixed-IEEE corr read. */
  private val duckSpearman: String =
    s"""WITH e AS (
       |  SELECT l_returnflag AS g,
       |    ${graft.functions.centsSql("l_extendedprice")} // 100 AS xv,
       |    CAST(l_quantity AS BIGINT) AS yv
       |  FROM lineitem
       |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
       |),
       |r AS (SELECT g,
       |        2 * rank() OVER (PARTITION BY g ORDER BY xv)
       |          + count(*) OVER (PARTITION BY g, xv) - 1 AS x,
       |        2 * rank() OVER (PARTITION BY g ORDER BY yv)
       |          + count(*) OVER (PARTITION BY g, yv) - 1 AS y
       |      FROM e),
       |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy,
       |        CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy
       |      FROM r GROUP BY g)
       |SELECT g AS l_returnflag, n, sx, sy, sxy, sxx, syy,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
       |        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
       |  THEN floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 10000.0 + 0.5) / 10000.0
       |  END AS rho4
       |FROM m ORDER BY l_returnflag""".stripMargin

  /** DuckDB mirror of the exact MAD (x80): the same ceil-rank lower
    * medians over count cumsums, deviations around the first. */
  private val duckMad: String =
    s"""WITH e AS (
       |  SELECT event_type AS g, ${graft.functions.centsSql("value")} AS c
       |  FROM events WHERE value IS NOT NULL
       |),
       |h1 AS (SELECT g, c AS v, count(*) AS cnt FROM e GROUP BY g, c),
       |c1 AS (SELECT g, v, CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum FROM h1),
       |t1 AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n, (CAST(sum(cnt) AS BIGINT) + 1) // 2 AS target FROM h1 GROUP BY g),
       |m1 AS (SELECT c1.g, min(t1.n) AS n, min(c1.v) AS med
       |       FROM c1 JOIN t1 ON c1.g = t1.g AND c1.cum >= t1.target GROUP BY c1.g),
       |d AS (SELECT e.g, abs(e.c - m1.med) AS dev FROM e JOIN m1 ON e.g = m1.g),
       |h2 AS (SELECT g, dev AS v, count(*) AS cnt FROM d GROUP BY g, dev),
       |c2 AS (SELECT g, v, CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum FROM h2),
       |t2 AS (SELECT g, (CAST(sum(cnt) AS BIGINT) + 1) // 2 AS target FROM h2 GROUP BY g),
       |m2 AS (SELECT c2.g, min(c2.v) AS mad
       |       FROM c2 JOIN t2 ON c2.g = t2.g AND c2.cum >= t2.target GROUP BY c2.g)
       |SELECT m1.g AS event_type, m1.n, m1.med AS median_cents, m2.mad AS mad_cents
       |FROM m1 JOIN m2 ON m1.g = m2.g ORDER BY event_type""".stripMargin

  /** DuckDB mirror of sequenceNextNode (x81): lead under the identical
    * total (t, id) order, `<end>` for terminal anchors. */
  /** DuckDB mirror of the transition matrix (x114): the x81 lead pass
    * without the anchor filter, grouped by both ends. */
  private val duckTransitionMatrix: String =
    """WITH e AS (
      |  SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
      |    event_id AS id, event_type AS et
      |  FROM events
      |),
      |l AS (SELECT u, et,
      |        lead(et) OVER (PARTITION BY u ORDER BY t, id) AS nxt
      |      FROM e)
      |SELECT et AS from_type, COALESCE(nxt, '<end>') AS to_type,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM l GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin

  private val duckNextNode: String =
    """WITH e AS (
      |  SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
      |    event_id AS id, event_type AS et
      |  FROM events
      |),
      |l AS (SELECT u, t, id, et,
      |        lead(et) OVER (PARTITION BY u ORDER BY t, id) AS nxt
      |      FROM e)
      |SELECT COALESCE(nxt, '<end>') AS next_type,
      |  CAST(count(*) AS BIGINT) AS n_anchors
      |FROM l WHERE et = 'signup'
      |GROUP BY 1 ORDER BY next_type""".stripMargin

  /** DuckDB mirror of boundingRatio (x82): identical int64 extrema and
    * the identical guarded IEEE division. */
  private val duckBoundingRatio: String =
    s"""WITH e AS (
       |  SELECT event_type AS g, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS x,
       |    ${graft.functions.centsSql("value")} AS y
       |  FROM events WHERE value IS NOT NULL
       |),
       |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
       |        min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
       |      FROM e GROUP BY g)
       |SELECT g AS event_type, n, min_x, max_x, min_y, max_y,
       |  CASE WHEN max_x > min_x THEN
       |    ${graft.functions.duckRound("CAST(max_y - min_y AS DOUBLE) / CAST(max_x - min_x AS DOUBLE)", 4)}
       |  END AS ratio4
       |FROM a ORDER BY event_type""".stripMargin

  /** DuckDB mirror of the t statistics (x83): identical conditional
    * sums, means computed once, q-terms chained into both reads. */
  private val duckTTest: String =
    s"""WITH e AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS g,
       |    event_type AS s, ${graft.functions.centsSql("value")} // 100 AS v
       |  FROM events
       |  WHERE event_type IN ('click', 'error') AND value IS NOT NULL
       |),
       |m AS (SELECT g,
       |        CAST(sum(CASE WHEN s = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |        CAST(sum(CASE WHEN s = 'click' THEN v ELSE 0 END) AS BIGINT) AS s1_a,
       |        CAST(sum(CASE WHEN s = 'click' THEN v * v ELSE 0 END) AS BIGINT) AS s2_a,
       |        CAST(sum(CASE WHEN s = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |        CAST(sum(CASE WHEN s = 'error' THEN v ELSE 0 END) AS BIGINT) AS s1_b,
       |        CAST(sum(CASE WHEN s = 'error' THEN v * v ELSE 0 END) AS BIGINT) AS s2_b
       |      FROM e GROUP BY g),
       |b AS (SELECT *,
       |        CASE WHEN n_a > 0 THEN CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS ma,
       |        CASE WHEN n_b > 0 THEN CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mb FROM m),
       |q AS (SELECT *, CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * ma AS qa,
       |        CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * mb AS qb FROM b),
       |p AS (SELECT *,
       |        CASE WHEN n_a + n_b > 2 THEN (qa + qb) / CAST(n_a + n_b - 2 AS DOUBLE) END AS sp2,
       |        CASE WHEN n_a > 1 THEN qa / CAST(n_a - 1 AS DOUBLE) / CAST(n_a AS DOUBLE) END AS vna,
       |        CASE WHEN n_b > 1 THEN qb / CAST(n_b - 1 AS DOUBLE) / CAST(n_b AS DOUBLE) END AS vnb
       |      FROM q)
       |SELECT g AS day, n_a, s1_a, s2_a, n_b, s1_b, s2_b,
       |  CASE WHEN n_a > 1 AND n_b > 1 AND sp2 > 0 THEN
       |    ${graft.functions.duckRound("(ma - mb) / sqrt(sp2 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))", 4)}
       |  END AS t_student4,
       |  CASE WHEN vna + vnb > 0 THEN
       |    ${graft.functions.duckRound("(ma - mb) / sqrt(vna + vnb)", 4)}
       |  END AS t_welch4
       |FROM p ORDER BY day""".stripMargin

  /** DuckDB mirror of the strict-order funnel (x84): identical lead
    * pairs under the identical total order, identical nested CASE. */
  private val duckFunnelStrict: String =
    """WITH e AS (
      |  SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
      |    event_id AS id, event_type AS et
      |  FROM events
      |),
      |l AS (SELECT u, t, et,
      |        lead(et, 1) OVER (PARTITION BY u ORDER BY t, id) AS et_1,
      |        lead(t, 1) OVER (PARTITION BY u ORDER BY t, id) AS t_1,
      |        lead(et, 2) OVER (PARTITION BY u ORDER BY t, id) AS et_2,
      |        lead(t, 2) OVER (PARTITION BY u ORDER BY t, id) AS t_2
      |      FROM e),
      |v AS (SELECT u,
      |        CASE WHEN et = 'signup' THEN 1 +
      |          CASE WHEN et_1 = 'click' AND t_1 <= t + 86400000000 THEN 1 +
      |            CASE WHEN et_2 = 'purchase' AND t_2 <= t + 86400000000 THEN 1 ELSE 0 END
      |          ELSE 0 END
      |        ELSE 0 END AS lvl
      |      FROM l),
      |m AS (SELECT u, max(lvl) AS level FROM v GROUP BY u)
      |SELECT level, CAST(count(*) AS BIGINT) AS n_users
      |FROM m GROUP BY level ORDER BY level""".stripMargin

  /** DuckDB mirror of the bit aggregates (x85). */
  private val duckBitOps: String =
    s"""SELECT event_type,
       |  bit_and(${graft.functions.centsSql("value")}) AS band,
       |  bit_or(${graft.functions.centsSql("value")}) AS bor,
       |  bit_xor(${graft.functions.centsSql("value")}) AS bxor
       |FROM events WHERE value IS NOT NULL
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** DuckDB mirror of the ROC-AUC (x86): the x77 doubled-rank machinery
    * with purchase/view classes plus the guarded AUC division. */
  private val duckRocAuc: String =
    s"""WITH e AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS g,
       |    event_type AS s, ${graft.functions.centsSql("value")} AS v
       |  FROM events
       |  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
       |),
       |r AS (SELECT g, s,
       |        rank() OVER (PARTITION BY g ORDER BY v) AS rk,
       |        count(*) OVER (PARTITION BY g, v) AS ceq
       |      FROM e),
       |r2 AS (SELECT g, s, 2 * rk + ceq - 1 AS r2 FROM r),
       |a AS (SELECT g,
       |        CAST(sum(CASE WHEN s = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |        CAST(sum(CASE WHEN s = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |        CAST(sum(CASE WHEN s = 'purchase' THEN r2 ELSE 0 END) AS BIGINT) AS r2_a
       |      FROM r2 GROUP BY g),
       |u AS (SELECT g, n_a, n_b, r2_a - n_a * (n_a + 1) AS u2_a FROM a)
       |SELECT g AS day, n_a, n_b, u2_a, 2 * n_a * n_b - u2_a AS u2_b,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    ${graft.functions.duckRound("CAST(u2_a AS DOUBLE) / CAST(2 * n_a * n_b AS DOUBLE)", 4)}
       |  END AS auc4
       |FROM u ORDER BY day""".stripMargin

  /** DuckDB mirror of the LTTB downsample (x87, B=6): the 4 selection
    * stages unrolled as CTEs — each stage's pick maximizes the same
    * c-multiplied integer doubled-area against the previous stage's pick
    * and the next bucket's sum-average, ties to (min t, min v). */
  private val duckLttb: String = {
    def stage(k: Int, prev: String): String = {
      val nxt =
        if (k < 3) s"(SELECT g, CAST(count(*) AS BIGINT) AS c, CAST(sum(t) AS BIGINT) AS sx, CAST(sum(v) AS BIGINT) AS sy FROM m WHERE bk = ${k + 1} GROUP BY g)"
        else "(SELECT g, CAST(1 AS BIGINT) AS c, t AS sx, v AS sy FROM lN)"
      s"""c$k AS (SELECT m.g, m.t, m.v,
         |  abs(($prev.t * nx.c - nx.sx) * (m.v - $prev.v) - ($prev.t - m.t) * (nx.sy - $prev.v * nx.c)) AS a
         |  FROM m JOIN $prev ON m.g = $prev.g JOIN $nxt nx ON nx.g = m.g
         |  WHERE m.bk = $k),
         |s$k AS (SELECT g, t, v FROM (
         |  SELECT g, t, v, row_number() OVER (PARTITION BY g ORDER BY a DESC, t ASC, v ASC) AS rr
         |  FROM c$k) WHERE rr = 1)""".stripMargin
    }
    s"""WITH e AS (
       |  SELECT event_type AS g, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t,
       |    ${graft.functions.centsSql("value")} AS v, event_id AS id
       |  FROM events WHERE value IS NOT NULL
       |),
       |p AS (SELECT g, t, v,
       |        row_number() OVER (PARTITION BY g ORDER BY t, id) AS rn,
       |        count(*) OVER (PARTITION BY g) AS n
       |      FROM e),
       |m AS (SELECT g, t, v, (rn - 2) * 4 // (n - 2) AS bk FROM p WHERE rn > 1 AND rn < n),
       |f0 AS (SELECT g, t, v FROM p WHERE rn = 1),
       |lN AS (SELECT g, t, v FROM p WHERE rn = n),
       |${stage(0, "f0")},
       |${stage(1, "s0")},
       |${stage(2, "s1")},
       |${stage(3, "s2")}
       |SELECT g AS event_type, sel, t AS sec, v AS cents FROM (
       |  SELECT g, 0 AS sel, t, v FROM f0 UNION ALL
       |  SELECT g, 1, t, v FROM s0 UNION ALL
       |  SELECT g, 2, t, v FROM s1 UNION ALL
       |  SELECT g, 3, t, v FROM s2 UNION ALL
       |  SELECT g, 4, t, v FROM s3 UNION ALL
       |  SELECT g, 5, t, v FROM lN
       |) ORDER BY event_type, sel""".stripMargin
  }

  /** DuckDB mirror of the KS statistic (x88): identical distinct-value
    * cumsums and the identical integer cross-products. */
  private val duckKsTest: String =
    s"""WITH e AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS g,
       |    event_type AS s, ${graft.functions.centsSql("value")} AS v
       |  FROM events
       |  WHERE event_type IN ('click', 'error') AND value IS NOT NULL
       |),
       |h AS (SELECT g, v,
       |        CAST(sum(CASE WHEN s = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |        CAST(sum(CASE WHEN s = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |      FROM e GROUP BY g, v),
       |t AS (SELECT g, CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM h GROUP BY g),
       |c AS (SELECT g, v,
       |        CAST(sum(ca) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum_a,
       |        CAST(sum(cb) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum_b
       |      FROM h),
       |m AS (SELECT c.g, min(t.n_a) AS n_a, min(t.n_b) AS n_b,
       |        max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS d_num
       |      FROM c JOIN t ON c.g = t.g GROUP BY c.g)
       |SELECT g AS day, n_a, n_b, d_num, n_a * n_b AS d_den,
       |  CASE WHEN n_a * n_b > 0 THEN
       |    ${graft.functions.duckRound("CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)", 4)}
       |  END AS d4
       |FROM m ORDER BY day""".stripMargin

  /** DuckDB mirror of the Tukey outliers (x89): identical ceil-rank
    * quartiles and doubled-integer fences. */
  private val duckTukey: String =
    s"""WITH e AS (
       |  SELECT event_type AS g, ${graft.functions.centsSql("value")} AS v
       |  FROM events WHERE value IS NOT NULL
       |),
       |h AS (SELECT g, v, count(*) AS cnt FROM e GROUP BY g, v),
       |c AS (SELECT g, v, CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum FROM h),
       |t AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
       |        (CAST(sum(cnt) AS BIGINT) + 3) // 4 AS t1,
       |        (3 * CAST(sum(cnt) AS BIGINT) + 3) // 4 AS t3
       |      FROM h GROUP BY g),
       |q AS (SELECT c.g, min(t.n) AS n,
       |        min(CASE WHEN c.cum >= t.t1 THEN c.v END) AS q1,
       |        min(CASE WHEN c.cum >= t.t3 THEN c.v END) AS q3
       |      FROM c JOIN t ON c.g = t.g GROUP BY c.g),
       |f AS (SELECT *, 5 * q1 - 3 * q3 AS low2, 5 * q3 - 3 * q1 AS high2 FROM q)
       |SELECT e.g AS event_type, min(f.n) AS n, min(f.q1) AS q1, min(f.q3) AS q3,
       |  CAST(sum(CASE WHEN e.v * 2 < f.low2 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       |  CAST(sum(CASE WHEN e.v * 2 > f.high2 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
       |FROM e JOIN f ON e.g = f.g GROUP BY e.g ORDER BY event_type""".stripMargin

  /** DuckDB mirror of the two-proportion z (x90): identical counts,
    * pool computed once, guards mirrored. */
  private val duckProportionZ: String =
    s"""WITH e AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS g,
       |    event_type AS s,
       |    CASE WHEN ${graft.functions.centsSql("value")} >= 10000 THEN 1 ELSE 0 END AS ok
       |  FROM events
       |  WHERE event_type IN ('view', 'click') AND value IS NOT NULL
       |),
       |m AS (SELECT g,
       |        CAST(sum(CASE WHEN s = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |        CAST(sum(CASE WHEN s = 'view' THEN ok ELSE 0 END) AS BIGINT) AS x_a,
       |        CAST(sum(CASE WHEN s = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |        CAST(sum(CASE WHEN s = 'click' THEN ok ELSE 0 END) AS BIGINT) AS x_b
       |      FROM e GROUP BY g),
       |b AS (SELECT *,
       |        CASE WHEN n_a > 0 THEN CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS p1,
       |        CASE WHEN n_b > 0 THEN CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS p2,
       |        CASE WHEN n_a + n_b > 0 THEN CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) END AS pp
       |      FROM m),
       |v AS (SELECT *,
       |        CASE WHEN n_a > 0 AND n_b > 0 THEN
       |          pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
       |        END AS se2
       |      FROM b)
       |SELECT g AS day, n_a, x_a, n_b, x_b,
       |  CASE WHEN n_a > 0 AND n_b > 0 AND se2 > 0 THEN
       |    ${graft.functions.duckRound("(p1 - p2) / sqrt(se2)", 4)}
       |  END AS z4
       |FROM v ORDER BY day""".stripMargin

  /** DuckDB mirror of the daily pivot (x65): explicit conditional
    * counts — the relational meaning of a fixed-values pivot. */
  private val duckPivotDaily: String =
    """SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** DuckDB mirror of the sumMap rows (x59): the exploded map IS the
    * keyed sum — same day arithmetic, same exact cents. */
  private val duckSumMap: String =
    s"""SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
       |  event_type,
       |  CAST(sum(${graft.functions.centsSql("value")}) AS BIGINT) AS sum_cents
       |FROM events WHERE value IS NOT NULL
       |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** DuckDB mirror of the sequence count (x62): the same bracket
    * identity — RANGE-frame cumsum (both engines' default), same
    * second-before-first tie order. */
  private val duckSequenceCount: String =
    """WITH e AS (
      |  SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS d,
      |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS ord
      |  FROM events WHERE event_type IN ('view', 'purchase')
      |),
      |s AS (SELECT u, d, sum(d) OVER (PARTITION BY u ORDER BY t, ord) AS cum FROM e),
      |m AS (SELECT u, sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS nb,
      |        greatest(max(cum), 0) AS surplus FROM s GROUP BY u)
      |SELECT CAST(nb - surplus AS BIGINT) AS n_matches,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM m GROUP BY 1 ORDER BY n_matches""".stripMargin

  /** DuckDB mirror of the conversion latency (x69): the x54 stage chain
    * kept at (user, t1, tk) granularity, min span per user. */
  private val duckConversionLatency: String =
    """WITH e AS (
      |  SELECT user_id AS u, event_type AS et, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events
      |),
      |s1 AS (SELECT u, t AS t1, t AS tk FROM e WHERE et = 'signup'),
      |s2 AS (
      |  SELECT s1.u, t1, min(e.t) AS tk FROM s1 JOIN e USING (u)
      |  WHERE e.et = 'click' AND e.t > s1.tk AND e.t <= t1 + 86400000000
      |  GROUP BY s1.u, t1
      |),
      |s3 AS (
      |  SELECT s2.u, t1, min(e.t) AS tk FROM s2 JOIN e USING (u)
      |  WHERE e.et = 'purchase' AND e.t > s2.tk AND e.t <= t1 + 86400000000
      |  GROUP BY s2.u, t1
      |)
      |SELECT u AS user_id, CAST(min(tk - t1) AS BIGINT) // 1000000 AS latency_sec,
      |  CAST(count(*) AS BIGINT) AS n_anchors
      |FROM s3 GROUP BY u ORDER BY user_id""".stripMargin

  /** DuckDB mirror of the latency histogram (x100): the x69 read as a
    * subquery, hour-bucketed. */
  private val duckLatencyHistogram: String =
    s"""SELECT latency_sec // 3600 AS hr,
       |  CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(sum(n_anchors) AS BIGINT) AS n_anchors
       |FROM ($duckConversionLatency)
       |GROUP BY 1 ORDER BY hr""".stripMargin

  /** Shared SQL for the synthetic per-event DNS domain (mirror of
    * [[synthDomain]]). */
  private val duckSynthDomain: String =
    "'h'||(event_id%97)||'.d'||(user_id%23)||'.'||event_type||'.net'"

  /** DuckDB mirror of the blocklist match (x101): the label-boundary
    * suffix join replayed as `domain = rule OR domain LIKE '%.'||rule`
    * (LIKE's only wildcard is the leading `%`, so matches stay on label
    * boundaries exactly like the suffix explode). */
  private val duckBlocklistMatch: String =
    s"""WITH d AS (SELECT $duckSynthDomain AS domain, user_id FROM events),
       |r AS (SELECT 'd'||k||'.'||t||'.net' AS rule
       |      FROM generate_series(0,22) AS g(k), (VALUES ('click'),('view')) AS t(t)
       |      WHERE k%4=0
       |      UNION ALL SELECT 'h7.d3.error.net')
       |SELECT r.rule, CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
       |FROM d JOIN r ON d.domain = r.rule OR d.domain LIKE '%.'||r.rule
       |GROUP BY 1 ORDER BY rule""".stripMargin

  /** DuckDB mirror of the per-client domain entropy (x102): identical
    * two-level aggregation on the `length(bin(n))` floor-log₂ grid. */
  private val duckDomainEntropy: String =
    s"""WITH d AS (SELECT user_id, $duckSynthDomain AS domain FROM events),
       |c AS (SELECT user_id, domain, count(*) AS c FROM d GROUP BY 1, 2),
       |u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
       |             CAST(count(*) AS BIGINT) AS n_distinct,
       |             CAST(sum(c*length(bin(c))) AS BIGINT) AS scb
       |      FROM c GROUP BY 1)
       |SELECT user_id, n, n_distinct,
       |  CAST(n*length(bin(n)) - scb AS BIGINT) AS ent_bits
       |FROM u ORDER BY user_id""".stripMargin

  /** Shared SQL for the x103 contingency cells (mirror of
    * `Profiling.contingency` on event_type × day-of-week). */
  private val duckContingencyCells: String =
    """WITH e AS (SELECT event_type AS a, (epoch_us(ts) // 86400000000) % 7 AS b FROM events),
      |cells AS (SELECT a, b, count(*) AS o FROM e GROUP BY 1, 2),
      |m AS (SELECT a, b, o,
      |        CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS r,
      |        CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS c,
      |        CAST(sum(o) OVER () AS BIGINT) AS n FROM cells)
      |SELECT a, b, o, r, c, n,
      |  CAST((o*o // (r*c))*1000000 + ((o*o % (r*c))*1000000) // (r*c) AS BIGINT) AS t_e6
      |FROM m""".stripMargin

  /** DuckDB mirror of the contingency cells (x103). */
  private val duckContingency: String =
    s"$duckContingencyCells ORDER BY a, b"

  /** DuckDB mirror of cramersV (x104): the same clamp-at-0 χ², guarded
    * integer V², and floor-sqrt v_e3 over the x103 cells. */
  private val duckCramersV: String =
    s"""WITH cc AS ($duckContingencyCells),
       |s AS (SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_cells,
       |             CAST(count(DISTINCT a) AS BIGINT) AS ka,
       |             CAST(count(DISTINCT b) AS BIGINT) AS kb,
       |             CAST(sum(t_e6) AS BIGINT) AS st FROM cc),
       |v AS (SELECT n, n_cells,
       |             greatest(st - 1000000, 0) AS chi2_over_n_e6,
       |             CAST(n*greatest(st - 1000000, 0) AS BIGINT) AS chi2_e6,
       |             CASE WHEN least(ka-1, kb-1) > 0
       |                  THEN greatest(st - 1000000, 0) // least(ka-1, kb-1) END AS v2_e6
       |      FROM s)
       |SELECT n, n_cells, chi2_over_n_e6, chi2_e6, CAST(v2_e6 AS BIGINT) AS v2_e6,
       |  CAST(floor(sqrt(v2_e6)) AS BIGINT) AS v_e3
       |FROM v ORDER BY n""".stripMargin

  /** DuckDB mirror of the SGD linear regression (x105): the 4-iteration
    * exact-int recurrence unrolled as CTE stages — `//` and Spark `DIV`
    * both truncate toward zero, so every update replays bit-for-bit. */
  private val duckSgdLinreg: String = {
    val yc = graft.functions.centsSql("l_extendedprice")
    def gStage(g: String, w: String) =
      s"""$g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(max(w.w1) AS BIGINT) AS w1, CAST(max(w.w0) AS BIGINT) AS w0,
         |  CAST(sum(((w.w1*d.x + w.w0) // 1000000 - d.y)*d.x) AS BIGINT) AS g1,
         |  CAST(sum((w.w1*d.x + w.w0) // 1000000 - d.y) AS BIGINT) AS g0
         |  FROM d, $w w)""".stripMargin
    def wStage(w: String, g: String) =
      s"""$w AS (SELECT g.w1 - (g.g1*1000) // g.n AS w1,
         |  g.w0 - (g.g0*1000) // g.n AS w0 FROM $g g)""".stripMargin
    s"""WITH d AS (SELECT CAST(l_quantity AS BIGINT) AS x, $yc AS y FROM lineitem),
       |w0 AS (SELECT CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w0),
       |${gStage("g1s", "w0")}, ${wStage("w1s", "g1s")},
       |${gStage("g2s", "w1s")}, ${wStage("w2s", "g2s")},
       |${gStage("g3s", "w2s")}, ${wStage("w3s", "g3s")},
       |${gStage("g4s", "w3s")}, ${wStage("w4s", "g4s")}
       |SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(max(w.w0) AS BIGINT) AS w0_e6, CAST(max(w.w1) AS BIGINT) AS w1_e6,
       |  CAST(sum(abs((w.w1*d.x + w.w0) // 1000000 - d.y)) // count(*) AS BIGINT) AS mae_cents
       |FROM d, w4s w ORDER BY n""".stripMargin
  }

  /** DuckDB mirror of theilsU (x106): the same floor-log₂ bit-count
    * entropies, clamped MI, integer-ppm U. */
  private val duckTheilsU: String =
    """WITH e AS (SELECT event_type AS a, (epoch_us(ts) // 86400000000) % 7 AS b FROM events),
      |cells AS (SELECT a, b, count(*) AS o FROM e GROUP BY 1, 2),
      |cb AS (SELECT a, b, o, CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS nb FROM cells),
      |na AS (SELECT a, CAST(sum(o) AS BIGINT) AS na FROM cells GROUP BY 1),
      |hx AS (SELECT CAST(sum(na) AS BIGINT) AS n,
      |              CAST(sum(na)*length(bin(CAST(sum(na) AS BIGINT)))
      |                   - sum(na*length(bin(na))) AS BIGINT) AS hx_bits FROM na),
      |hxy AS (SELECT CAST(sum(o*(length(bin(nb)) - length(bin(o)))) AS BIGINT) AS hxy_bits FROM cb),
      |j AS (SELECT n, hx_bits, hxy_bits,
      |             greatest(hx_bits - hxy_bits, 0) AS mi_bits FROM hx, hxy)
      |SELECT n, hx_bits, hxy_bits, mi_bits,
      |  CASE WHEN hx_bits > 0 THEN (mi_bits*1000000) // hx_bits END AS u_e6
      |FROM j ORDER BY n""".stripMargin

  /** DuckDB mirror of the decayed average (x107): the x64 weights
    * accumulated as numerator AND denominator, one integer division. */
  private val duckDecayedAvg: String =
    s"""WITH e AS (
       |  SELECT event_type, ${graft.functions.centsSql("value")} AS c,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
       |  FROM events WHERE value IS NOT NULL
       |),
       |m AS (SELECT max(day) AS mx FROM e),
       |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(c * 1000000 // (1::BIGINT << CAST(LEAST(mx - day, 62) AS INT))) AS BIGINT) AS decayed_e6,
       |  CAST(sum(1000000 // (1::BIGINT << CAST(LEAST(mx - day, 62) AS INT))) AS BIGINT) AS weight_e6
       |  FROM e, m GROUP BY 1)
       |SELECT event_type, n, decayed_e6, weight_e6,
       |  CASE WHEN weight_e6 > 0 THEN decayed_e6 // weight_e6 END AS davg_cents
       |FROM s ORDER BY event_type""".stripMargin

  /** DuckDB mirror of groupArrayIntersect (x108): the counting identity
    * (distinct units containing the item = units in the group), sorted
    * numeric-order string rendering. */
  private val duckGroupIntersect: String =
    """WITH t AS (SELECT DISTINCT event_type AS g,
      |    (epoch_us(ts) // 86400000000) % 7 AS u, user_id AS item FROM events),
      |nu AS (SELECT g, CAST(count(DISTINCT u) AS BIGINT) AS n_units FROM t GROUP BY 1),
      |c AS (SELECT g, item, count(*) AS n_in FROM t GROUP BY 1, 2)
      |SELECT c.g, nu.n_units, CAST(count(*) AS BIGINT) AS n_common,
      |  string_agg(c.item, ',' ORDER BY c.item) AS common_str
      |FROM c JOIN nu USING (g) WHERE c.n_in = nu.n_units
      |GROUP BY 1, 2 ORDER BY g""".stripMargin

  /** DuckDB mirror of the subnet rollup (x109): same synthetic quad,
    * same numeric mask arithmetic (`//`/% on nonneg = Spark shiftright/%). */
  private val duckSubnetRollup: String =
    """WITH e AS (
      |  SELECT user_id, event_id % 251 AS host,
      |    ('10' || '.' || (user_id % 64) || '.' || (user_id // 64) || '.' || (event_id % 251)) AS ip
      |  FROM events),
      |n AS (SELECT user_id, host,
      |    CAST(string_split(ip, '.')[1] AS BIGINT)*16777216
      |      + CAST(string_split(ip, '.')[2] AS BIGINT)*65536
      |      + CAST(string_split(ip, '.')[3] AS BIGINT)*256
      |      + CAST(string_split(ip, '.')[4] AS BIGINT) AS num FROM e),
      |s AS (SELECT user_id, host, num - (num % 256) AS net FROM n)
      |SELECT ((net // 16777216) % 256) || '.' || ((net // 65536) % 256) || '.'
      |    || ((net // 256) % 256) || '.' || (net % 256) || '/24' AS subnet,
      |  CAST(count(*) AS BIGINT) AS n_queries,
      |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM s GROUP BY 1 ORDER BY subnet""".stripMargin

  /** DuckDB mirror of topKWeighted (x110): with the vocabulary inside
    * the counter budget the sketch is exact — the oracle is the exact
    * weighted ranking. */
  private val duckTopKWeighted: String =
    s"""SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, event_type,
       |  CAST(sum(${graft.functions.centsSql("value")}) AS BIGINT) AS w_cents
       |FROM events WHERE value IS NOT NULL
       |  AND ${graft.functions.centsSql("value")} IS NOT NULL
       |GROUP BY 1, 2 ORDER BY day, w_cents DESC, event_type""".stripMargin

  /** DuckDB mirror of minMap/maxMap (x111): per-key extremes, exploded. */
  private val duckMinMaxMap: String =
    s"""SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, event_type,
       |  CAST(min(${graft.functions.centsSql("value")}) AS BIGINT) AS min_cents,
       |  CAST(max(${graft.functions.centsSql("value")}) AS BIGINT) AS max_cents
       |FROM events WHERE value IS NOT NULL
       |  AND ${graft.functions.centsSql("value")} IS NOT NULL
       |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** DuckDB mirror of corrMatrix (x112): one wide sum row, three pair
    * reads applying the identical fixed-IEEE corr expression. */
  private val duckCorrMatrix: String = {
    def pairRead(a: String, b: String) =
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
         |  s_$a AS sx, s_$b AS sy, sp_${a}_$b AS sxy, ss_$a AS sxx, ss_$b AS syy,
         |  CASE WHEN CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE) > 0
         |        AND CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE) > 0
         |  THEN floor(((CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)) /
         |    (sqrt(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) *
         |     sqrt(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))) * 10000.0 + 0.5) / 10000.0
         |  END AS corr4 FROM m""".stripMargin
    s"""WITH e AS (
       |  SELECT ${graft.functions.centsSql("l_extendedprice")} // 100 AS dollars,
       |    CAST(l_quantity AS BIGINT) AS quantity,
       |    ${graft.functions.centsSql("l_discount")} AS disc_c
       |  FROM lineitem
       |),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(dollars) AS BIGINT) AS s_dollars, CAST(sum(quantity) AS BIGINT) AS s_quantity,
       |  CAST(sum(disc_c) AS BIGINT) AS s_disc_c,
       |  CAST(sum(dollars*dollars) AS BIGINT) AS ss_dollars,
       |  CAST(sum(quantity*quantity) AS BIGINT) AS ss_quantity,
       |  CAST(sum(disc_c*disc_c) AS BIGINT) AS ss_disc_c,
       |  CAST(sum(dollars*quantity) AS BIGINT) AS sp_dollars_quantity,
       |  CAST(sum(dollars*disc_c) AS BIGINT) AS sp_dollars_disc_c,
       |  CAST(sum(quantity*disc_c) AS BIGINT) AS sp_quantity_disc_c
       |  FROM e)
       |${pairRead("dollars", "quantity")}
       |UNION ALL ${pairRead("dollars", "disc_c")}
       |UNION ALL ${pairRead("quantity", "disc_c")}
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** DuckDB mirror of the bitmap churn (x113): the same full-outer
    * day-vs-next-day comparison over distinct (day, user) pairs —
    * including the phantom first row (everyone "gained" into day 0). */
  private val duckBitmapChurn: String =
    """WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
      |p AS (SELECT coalesce(a.day, b.day - 1) AS g, a.user_id AS au, b.user_id AS bu
      |      FROM du a FULL JOIN du b ON b.day = a.day + 1 AND b.user_id = a.user_id)
      |SELECT g AS day,
      |  CAST(count(au) FILTER (WHERE bu IS NULL) AS BIGINT) AS lost,
      |  CAST(count(bu) FILTER (WHERE au IS NULL) AS BIGINT) AS gained
      |FROM p GROUP BY 1 ORDER BY day""".stripMargin

  /** DuckDB mirror of the gap fill (x115): same grid from the 1-row
    * range, same zero-fill + IGNORE NULLS carry under an explicit ROWS
    * frame. */
  private val duckGapFill: String =
    s"""WITH p AS (
       |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
       |    CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(max(${graft.functions.centsSql("value")}) AS BIGINT) AS mx
       |  FROM events WHERE value IS NOT NULL
       |    AND ${graft.functions.centsSql("value")} >= 25000
       |  GROUP BY 1, 2),
       |r AS (SELECT min(day) AS mn, max(day) AS mx FROM p),
       |k AS (SELECT DISTINCT event_type FROM p),
       |g AS (SELECT k.event_type, unnest(generate_series(r.mn, r.mx)) AS day FROM k, r)
       |SELECT g.event_type, g.day, coalesce(p.cnt, 0) AS cnt,
       |  last_value(p.mx IGNORE NULLS) OVER (PARTITION BY g.event_type ORDER BY g.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx_filled
       |FROM g LEFT JOIN p USING (event_type, day)
       |ORDER BY event_type, day""".stripMargin

  /** DuckDB mirror of the cohort retention (x55): first-signup cohort day
    * via integer-µs `//`, the same half-open condition windows. */
  private val duckRetention: String =
    """WITH e AS (
      |  SELECT user_id AS u, event_type AS et, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events
      |),
      |a AS (SELECT u, min(t) AS f FROM e WHERE et = 'signup' GROUP BY u),
      |fl AS (
      |  SELECT e.u, f // 86400000000 AS cohort_day,
      |    max(CASE WHEN e.et = 'click'
      |      AND e.t >= f + 86400000000 AND e.t < f + 172800000000
      |      THEN 1 ELSE 0 END) AS ret_click_d1,
      |    max(CASE WHEN e.et = 'purchase'
      |      AND e.t >= f AND e.t < f + 604800000000
      |      THEN 1 ELSE 0 END) AS ret_purchase_d7
      |  FROM e JOIN a USING (u) GROUP BY 1, 2
      |)
      |SELECT cohort_day, CAST(count(*) AS BIGINT) AS users,
      |  CAST(sum(ret_click_d1) AS BIGINT) AS ret_click_d1,
      |  CAST(sum(ret_purchase_d7) AS BIGINT) AS ret_purchase_d7
      |FROM fl GROUP BY 1 ORDER BY cohort_day""".stripMargin

  /** DuckDB mirror of the exact-integer k-means fit (x53): identical e6
    * quantization, unrolled assignment (ROW_NUMBER argmin ≡ the kernel's
    * min(struct(d, cid))), integer-mean updates with empty-cluster carry,
    * final-assignment stats. `//` and Spark `DIV` both truncate toward
    * zero, so the recurrence is engine-identical. */
  private val duckKmeansFit: String = {
    def assignCte(name: String, cdf: String): String =
      s"""$name AS (
         |  SELECT vec_id, cid, d FROM (
         |    SELECT qv.vec_id, $cdf.cid,
         |      CAST(sum((qv.v - $cdf.c) * (qv.v - $cdf.c)) AS BIGINT) AS d,
         |      ROW_NUMBER() OVER (PARTITION BY qv.vec_id
         |        ORDER BY CAST(sum((qv.v - $cdf.c) * (qv.v - $cdf.c)) AS BIGINT), $cdf.cid) AS rn
         |    FROM qv JOIN $cdf USING (i) GROUP BY qv.vec_id, $cdf.cid
         |  ) WHERE rn = 1
         |)""".stripMargin
    def updateCte(name: String, prev: String, a: String): String =
      s"""$name AS (
         |  SELECT $prev.cid, $prev.i, coalesce(s.cnew, $prev.c) AS c
         |  FROM $prev LEFT JOIN (
         |    SELECT $a.cid, qv.i, CAST(sum(qv.v) AS BIGINT) // count(*) AS cnew
         |    FROM qv JOIN $a USING (vec_id) GROUP BY 1, 2
         |  ) s ON $prev.cid = s.cid AND $prev.i = s.i
         |)""".stripMargin
    s"""WITH qv AS (
       |  SELECT vec_id, i,
       |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(768)) AS i)
       |),
       |init AS (
       |  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)
       |),
       |c0 AS (SELECT init.cid, qv.i, qv.v AS c FROM init JOIN qv USING (vec_id)),
       |${assignCte("a1", "c0")},
       |${updateCte("c1", "c0", "a1")},
       |${assignCte("a2", "c1")},
       |${updateCte("c2", "c1", "a2")},
       |${assignCte("af", "c2")},
       |stats AS (
       |  SELECT cid, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(d // 1000000) AS BIGINT) AS inertia_e6
       |  FROM af GROUP BY 1
       |),
       |cs AS (SELECT cid, CAST(sum(c) AS BIGINT) AS centroid_sum FROM c2 GROUP BY 1)
       |SELECT stats.cid, n, centroid_sum, inertia_e6
       |FROM stats JOIN cs ON stats.cid = cs.cid ORDER BY stats.cid""".stripMargin
  }

  /** DuckDB mirror of the PQ trainer (x58): the x53 recurrence with
    * (vec_id, sub) assignment keys — per-subspace argmin partitions,
    * mean updates joined through the assignment's subspace. */
  private val duckPqTrain: String = {
    def assignCte(name: String, cdf: String): String =
      s"""$name AS (
         |  SELECT vec_id, sub, cid, d FROM (
         |    SELECT qv.vec_id, qv.sub, $cdf.cid,
         |      CAST(sum((qv.v - $cdf.c) * (qv.v - $cdf.c)) AS BIGINT) AS d,
         |      ROW_NUMBER() OVER (PARTITION BY qv.vec_id, qv.sub
         |        ORDER BY CAST(sum((qv.v - $cdf.c) * (qv.v - $cdf.c)) AS BIGINT), $cdf.cid) AS rn
         |    FROM qv JOIN $cdf USING (i) GROUP BY qv.vec_id, qv.sub, $cdf.cid
         |  ) WHERE rn = 1
         |)""".stripMargin
    def updateCte(name: String, prev: String, a: String): String =
      s"""$name AS (
         |  SELECT $prev.cid, $prev.i, coalesce(s.cnew, $prev.c) AS c
         |  FROM $prev LEFT JOIN (
         |    SELECT $a.cid, qv.i, CAST(sum(qv.v) AS BIGINT) // count(*) AS cnew
         |    FROM qv JOIN $a ON qv.vec_id = $a.vec_id AND qv.sub = $a.sub
         |    GROUP BY 1, 2
         |  ) s ON $prev.cid = s.cid AND $prev.i = s.i
         |)""".stripMargin
    s"""WITH qv AS (
       |  SELECT vec_id, i, i // 16 AS sub,
       |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS i)
       |),
       |init AS (
       |  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)
       |),
       |c0 AS (SELECT init.cid, qv.i, qv.v AS c FROM init JOIN qv USING (vec_id)),
       |${assignCte("a1", "c0")},
       |${updateCte("c1", "c0", "a1")},
       |${assignCte("a2", "c1")},
       |${updateCte("c2", "c1", "a2")},
       |${assignCte("af", "c2")},
       |stats AS (
       |  SELECT sub, cid, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(d // 1000000) AS BIGINT) AS inertia_e6
       |  FROM af GROUP BY 1, 2
       |),
       |cs AS (SELECT i // 16 AS sub, cid, CAST(sum(c) AS BIGINT) AS centroid_sum
       |       FROM c2 GROUP BY 1, 2)
       |SELECT stats.sub, stats.cid, n, centroid_sum, inertia_e6
       |FROM stats JOIN cs ON stats.sub = cs.sub AND stats.cid = cs.cid
       |ORDER BY stats.sub, stats.cid""".stripMargin
  }

  /** DuckDB mirror of the token PageRank (x52): identical edge shares in
    * ppm, 5 unrolled iteration stages, the same int64 `//` update rule. */
  private val duckTokenPagerank: String = {
    val rIter = (1 to 5).map { i =>
      s"""s$i AS (
         |  SELECT ew.dst, CAST(sum((r.r * ew.share_ppm) // 1000000) AS BIGINT) AS s
         |  FROM ew JOIN r${i - 1} r ON ew.src = r.token GROUP BY 1
         |),
         |r$i AS (
         |  SELECT n.token,
         |    (15 * (1000000000000 // (SELECT n FROM nn))) // 100
         |      + (85 * coalesce(s.s, 0)) // 100 AS r
         |  FROM nodes n LEFT JOIN s$i s ON n.token = s.dst
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
       |pairs AS (SELECT unnest(w[1:len(w)-1]) AS src, unnest(w[2:len(w)]) AS dst FROM toks),
       |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY 1, 2),
       |outw AS (SELECT src, CAST(sum(c) AS BIGINT) AS wout FROM edges GROUP BY 1),
       |ew AS (SELECT e.src, e.dst, (e.c * 1000000) // o.wout AS share_ppm
       |       FROM edges e JOIN outw o ON e.src = o.src),
       |nodes AS (SELECT DISTINCT token FROM
       |  (SELECT src AS token FROM ew UNION ALL SELECT dst FROM ew)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT token, 1000000000000 // (SELECT n FROM nn) AS r FROM nodes),
       |$rIter
       |SELECT token, r AS rank_e12 FROM r5 ORDER BY rank_e12 DESC, token""".stripMargin
  }

  /** DuckDB mirror of the histogram quantiles (x51): identical cents
    * grid, window cumsum per group, and the exact integer rank rule
    * `(nu·n + de − 1) // de`. */
  private val duckHistQuantiles: String =
    """WITH h AS (
      |  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS bucket, count(*) AS cnt
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
      |),
      |c AS (
      |  SELECT event_type, bucket,
      |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum
      |  FROM h
      |),
      |t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
      |qv AS (SELECT * FROM (VALUES ('q25', 1, 4), ('q50', 1, 2), ('q75', 3, 4), ('q95', 19, 20)) AS v(q, nu, de)),
      |tg AS (SELECT event_type, q, n, (nu * n + de - 1) // de AS target FROM t CROSS JOIN qv),
      |r AS (
      |  SELECT c.event_type, tg.q, CAST(min(tg.n) AS BIGINT) AS n, min(c.bucket) AS est_cents
      |  FROM c JOIN tg ON c.event_type = tg.event_type AND c.cum >= tg.target
      |  GROUP BY 1, 2
      |)
      |SELECT event_type, q, n, est_cents FROM r ORDER BY event_type, q""".stripMargin

  /** DuckDB mirror of the phrase search (x50): 1-based positions via
    * struct-literal unnest (the x28 recipe), occurrence = a start whose
    * successor positions carry the remaining phrase terms. */
  private val duckPhraseSearch: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT doc_id, unnest([{'pos': i, 'tok': w[i]} for i in range(1, len(w) + 1)]) AS u FROM t),
      |e AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM p),
      |starts AS (
      |  SELECT a.doc_id, a.pos FROM e a
      |  JOIN e b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.tok = 'hash'
      |  WHERE a.tok = 'table'
      |)
      |SELECT doc_id, count(*) AS occurrences FROM starts
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of the audio near-dup (x49): regenerates every sample
    * from the planting formula, folds 64 window energies (Σ s², exact
    * int64), sets bit w iff 64·energy > total, then the x46 pack + chunk
    * + Hamming tail. */
  private val duckAudioNearDup: String = {
    val pows = (0 until 64).map(c => s"${BigInt(2).pow(c)}::HUGEINT").mkString("[", ", ", "]")
    val hexDig = "'0123456789abcdef'"
    s"""WITH sm0 AS (
       |  SELECT d.doc_id, u.k, (u.k // 4) AS w
       |  FROM documents d CROSS JOIN (SELECT unnest(range(256)) AS k) u
       |),
       |sm1 AS (
       |  SELECT doc_id, k, w,
       |    (instr($hexDig, substr(mh, 1, 1)) - 1) * 16
       |      + (instr($hexDig, substr(mh, 2, 1)) - 1) AS b
       |  FROM (SELECT doc_id, k, w,
       |          md5(CAST(doc_id // 4 AS VARCHAR) || ':' || CAST(w AS VARCHAR)) AS mh
       |        FROM sm0)
       |),
       |sm AS (
       |  SELECT doc_id, w,
       |    b * 8 - 1024 + (k % 4) * 64
       |      + CASE WHEN doc_id % 4 > 0 AND w = doc_id % 4 - 1 THEN 400 ELSE 0 END AS s
       |  FROM sm1
       |),
       |wins AS (SELECT doc_id, w, CAST(sum(s * s) AS BIGINT) AS e FROM sm GROUP BY doc_id, w),
       |tot AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS total FROM wins GROUP BY doc_id),
       |bits AS (
       |  SELECT c.doc_id, c.w AS cell, CASE WHEN c.e * 64 > t.total THEN 1 ELSE 0 END AS bit
       |  FROM wins c JOIN tot t USING (doc_id)
       |),
       |fp AS (
       |  SELECT doc_id, CAST(fph - CASE WHEN fph >= ${BigInt(2).pow(63)}::HUGEINT THEN ${BigInt(2).pow(64)}::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS simhash
       |  FROM (SELECT doc_id, sum(CASE WHEN bit = 1 THEN $pows[cell + 1] ELSE 0::HUGEINT END) AS fph
       |        FROM bits GROUP BY doc_id)
       |),
       |chunk AS (
       |  SELECT doc_id, simhash, i AS chunk_idx, (simhash >> (16*i)) & 65535 AS chunk
       |  FROM fp, (SELECT unnest([0,1,2,3]) AS i)
       |)
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM chunk a JOIN chunk b ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY id1, id2""".stripMargin
  }

  /** DuckDB mirror of the multimodal feature pipeline: the payload is the
    * UTF-8 text bytes ([[Multimodal.synthesize]]) and the declared stub
    * decoder is a mod-8 byte histogram — both exactly expressible in SQL
    * for an ASCII corpus (verified: 0 non-ASCII/empty docs at every sf;
    * there `ord(char) = byte` and `length(text) = octet_length`). This
    * checks the real Spark-side contract (typed mapPartitions batch,
    * schema, normalization, rounding) end-to-end; a real codec would
    * return this query to rows-only. */
  private val duckMmFeatures: String =
    """WITH b AS (
      |  SELECT doc_id, ord(substr(text, CAST(i AS INT), 1)) % 8 AS bucket
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i FROM documents)
      |),
      |h AS (
      |  SELECT doc_id, count(*) AS n,
      |    sum(CASE WHEN bucket=0 THEN 1 ELSE 0 END) AS c0,
      |    sum(CASE WHEN bucket=1 THEN 1 ELSE 0 END) AS c1,
      |    sum(CASE WHEN bucket=2 THEN 1 ELSE 0 END) AS c2
      |  FROM b GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  CASE WHEN d.doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
      |  CAST(length(d.text) AS BIGINT) AS n_bytes,
      |  floor((c0 * 1.0 / n) * 1000000.0 + 0.5) / 1000000.0 AS f0,
      |  floor((c1 * 1.0 / n) * 1000000.0 + 0.5) / 1000000.0 AS f1,
      |  floor((c2 * 1.0 / n) * 1000000.0 + 0.5) / 1000000.0 AS f2
      |FROM documents d JOIN h USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Unsigned HUGEINT value of the first 16 hex chars of a NAMED md5
    * column — each md5 is computed once in an upstream CTE, not inlined
    * per nibble (32 md5 calls per hash otherwise). */
  private def duckNibbleFold(mCol: String): String =
    (0 until 16).map(i =>
      s"CAST(instr('0123456789abcdef', substr($mCol, ${i + 1}, 1))-1 AS HUGEINT) * ${BigInt(16).pow(15 - i)}::HUGEINT")
      .mkString(" + ")

  /** HUGEINT → the signed BIGINT Spark's `md5Hash64` produces. */
  private def duckSigned(hCol: String): String =
    s"CAST($hCol - CASE WHEN $hCol >= ${BigInt(2).pow(63)}::HUGEINT THEN ${BigInt(2).pow(64)}::HUGEINT ELSE 0::HUGEINT END AS BIGINT)"

  /** Signed-int64 → uniform (0,1) fragment — the SQL mirror of
    * [[graft.functions.unitInterval]], shared by the x16 and x18/x19
    * oracles (2⁶³/2⁶⁴ are exactly representable doubles). */
  private def duckUnitInterval(hSql: String): String =
    s"(CAST($hSql AS DOUBLE) + 9223372036854775808.0) / 18446744073709551616.0"

  /** Shard-hash fragments shared by the x13 and x17 oracles — ONE source
    * of truth for Sharding.assignShards' recipe: md5(id||':graft') and
    * `((h%n)+n)%n`, Spark's pmod for negative hashes. */
  private def duckShardMd5(idSql: String): String =
    s"md5(CAST($idSql AS VARCHAR)||':graft')"
  private def duckShardExpr(huCol: String, n: Int): String =
    s"CAST(((${duckSigned(huCol)} % $n) + $n) % $n AS INT)"

  /** Shared shard-assignment CTEs (m → hh → k: shard =
    * pmod(md5Hash64(id||':graft'), 8), sort_key =
    * md5Hash64(id||':graft:order'); md5 once, nibble-fold once, sign-fold
    * once per hash per row) — used by the x13 and x21 oracles.
    * `extraCols` carries payload columns (e.g. ", n_chars") through. */
  private def duckShardCtes(extraCols: String): String =
    s"""m AS (
       |  SELECT doc_id$extraCols,
       |    ${duckShardMd5("doc_id")} AS m1,
       |    md5(CAST(doc_id AS VARCHAR)||':graft:order') AS m2
       |  FROM documents
       |),
       |hh AS (
       |  SELECT doc_id$extraCols, ${duckNibbleFold("m1")} AS h1u, ${duckNibbleFold("m2")} AS h2u FROM m
       |),
       |k AS (
       |  SELECT doc_id$extraCols,
       |    ${duckShardExpr("h1u", 8)} AS shard,
       |    ${duckSigned("h2u")} AS sort_key
       |  FROM hh
       |)""".stripMargin

  /** Oracle for [[x13ShardStats]]. */
  private val duckShardStats: String =
    s"""WITH ${duckShardCtes("")}
       |SELECT shard, count(*) AS docs, min(sort_key) AS min_key, max(sort_key) AS max_key
       |FROM k GROUP BY shard ORDER BY shard""".stripMargin

  /** Oracle for [[x21PackStats]]: shared shard CTEs, then the exact
    * prefix-sum-before-row (ROWS … 1 PRECEDING) integer-divided by the
    * budget — [[graft.operators.Packing.contiguousPack]]'s bin rule. */
  private val duckPackStats: String =
    s"""WITH ${duckShardCtes(", n_chars")},
       |c AS (
       |  SELECT shard, n_chars,
       |    CAST(coalesce(sum(n_chars) OVER (
       |      PARTITION BY shard ORDER BY sort_key, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
       |  FROM k
       |),
       |b AS (SELECT shard, n_chars, CAST(cum_prev // 4000 AS BIGINT) AS bin FROM c)
       |SELECT shard, bin, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM b GROUP BY shard, bin ORDER BY shard, bin""".stripMargin

  /** Shared explicit-term-chain builders for every vector-literal oracle
    * (x7 planes, x12/x15 centroids): ONE implementation of the
    * accumulation-order-critical SQL fragments, so a parenthesization or
    * order change can never diverge one oracle family from another. Chains
    * are left-associated `a[1]*b[1] + a[2]*b[2] + …`, matching
    * [[graft.expressions.VecKernels]]' left-to-right loops bit-for-bit. */
  private object VecSql {
    def dotLit(vCol: String, c: Seq[Double]): String =
      c.zipWithIndex.map { case (w, i) => s"$vCol[${i + 1}]*($w)" }.mkString(" + ")
    def dotVec(a: String, b: String): String =
      (1 to 64).map(i => s"$a[$i]*$b[$i]").mkString(" + ")
    def normSq(a: String): String = (1 to 64).map(i => s"$a[$i]*$a[$i]").mkString(" + ")
  }

  /** DuckDB mirror of the multi-probe hyperplane-LSH top-k
    * ([[Similarity.lshTopK]]). The "seeded planes" are deterministic, so
    * the 8×64 plane matrix is embedded as double literals (shortest-repr
    * round-trip is exact); every dot product / norm is written as an
    * EXPLICIT left-to-right term chain, matching the native kernels'
    * accumulation order bit-for-bit — so bucket sign decisions, probe
    * sets, cosines and ranks all replay exactly. */
  private val duckAnnLsh: String = {
    import VecSql.{dotLit, dotVec, normSq}
    val numBits = 8
    val planes = Similarity.hyperplanes(numBits, 64)
    val bucket = planes
      .map(p => s"CASE WHEN (${dotLit("v", p)}) > 0 THEN 1 ELSE 0 END")
      .foldLeft("0")((acc, bit) => s"($acc)*2 + $bit")
    val probeList = ("qb" +: (0 until numBits).map(b => s"xor(qb, ${1 << b})")).mkString(", ")
    val cos =
      s"floor(((${dotVec("qv", "v")}) / (sqrt(${normSq("qv")}) * sqrt(${normSq("v")}))) * 1000000.0 + 0.5) / 1000000.0"
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE embedding IS NOT NULL
       |),
       |eb AS (SELECT vec_id, v, $bucket AS bucket FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb FROM eb WHERE vec_id < 10),
       |probes AS (SELECT qid, qv, unnest([$probeList]) AS bucket FROM q),
       |scored AS (
       |  SELECT DISTINCT qid, vec_id, $cos AS cos
       |  FROM probes JOIN eb USING (bucket) WHERE vec_id <> qid
       |)
       |SELECT qid, vec_id AS nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn, cos
       |FROM scored QUALIFY rn <= 5 ORDER BY qid, rn""".stripMargin
  }

  /** Shared pinned-codebook SQL fragments (the frozen centroid matrix as
    * literals; every chain in the native kernels' accumulation order) —
    * used by the x12 ANN oracle and the x15 cell-stats oracle. */
  private object IvfSql {
    import VecSql.{dotLit, normSq}
    val centers: Seq[Seq[Double]] = graft.operators.IvfCodebook.centers
    // same accumulation order as DotProductExpr / Similarity.selfDot
    val ccs: Seq[Double] = centers.map(_.foldLeft(0.0)((a, x) => a + x * x))
    def dists(vCol: String): String =
      centers.indices.map(j => s"(${ccs(j)}) - 2.0*(${dotLit(vCol, centers(j))}) AS d$j")
        .mkString(",\n    ")
    val dCols: String = centers.indices.map(j => s"d$j").mkString(", ")
    val caseChain: String = centers.indices.map(j => s"WHEN d$j = m THEN $j").mkString(" ")
    /** CTEs e → f → u → d → a: cleaned corpus, unit vectors, per-cell
      * distances, assignment (CASE = Spark's when-chain, first index at
      * the minimum wins). */
    val assignCtes: String = {
      val unitList = (1 to 64).map(i => s"v[$i]/nrm").mkString(", ")
      s"""e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE embedding IS NOT NULL
         |),
         |f AS (
         |  SELECT vec_id, v, sqrt(${normSq("v")}) AS nrm FROM e
         |  WHERE len(list_filter(v, x -> isnan(x))) = 0 AND sqrt(${normSq("v")}) > 0
         |),
         |u AS (SELECT vec_id, v, [$unitList] AS nv FROM f),
         |d AS (
         |  SELECT vec_id, v, nv,
         |    ${dists("nv")}
         |  FROM u
         |),
         |a AS (
         |  SELECT vec_id, v, nv, CASE $caseChain END AS bucket
         |  FROM (SELECT *, least($dCols) AS m FROM d)
         |)""".stripMargin
    }
  }

  /** DuckDB mirror of [[Similarity.ivfTopKPinned]] (x12): the frozen 16×64
    * centroid matrix embedded as double literals; the |c|² constants are
    * the same Scala `foldLeft` values the Spark side embeds — so
    * unit-normalization, cell assignment (CASE chain = Spark's when-chain,
    * first-index-wins on ties), nprobe probe choice, exact rescoring and
    * ranks all replay bit-for-bit. */
  private val duckAnnIvf: String = {
    import IvfSql._
    import VecSql.{dotVec, normSq}
    val nprobe = 3
    val structList = centers.indices.map(j => s"{'b': $j, 'd': d$j}").mkString(", ")
    val cos =
      s"floor(((${dotVec("qv", "v")}) / (sqrt(${normSq("qv")}) * sqrt(${normSq("v")}))) * 1000000.0 + 0.5) / 1000000.0"
    s"""WITH $assignCtes,
       |q AS (SELECT vec_id AS qid, v AS qv, nv AS qnv FROM a WHERE vec_id < 10),
       |qd AS (
       |  SELECT qid, qv,
       |    ${dists("qnv")}
       |  FROM q
       |),
       |qp AS (SELECT qid, qv, unnest([$structList]) AS u FROM qd),
       |probes AS (
       |  SELECT qid, qv, b AS bucket FROM (
       |    SELECT qid, qv, u.b AS b, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY u.d, u.b) AS rn
       |    FROM qp
       |  ) WHERE rn <= $nprobe
       |),
       |scored AS (
       |  SELECT qid, vec_id, $cos AS cos
       |  FROM probes JOIN a USING (bucket) WHERE vec_id <> qid
       |)
       |SELECT qid, vec_id AS nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn, cos
       |FROM scored QUALIFY rn <= 5 ORDER BY qid, rn""".stripMargin
  }

  /** DuckDB mirror of [[Similarity.ivfPqTopK]] (x33). The 8×256 codebook
    * is DATA on both sides: the Spark expressions carry it as a plan
    * reference object, the oracle reads the identical rows from the
    * parquet [[graft.operators.PqCodebook256.ensureParquet]] writes
    * (parquet round-trips doubles exactly). Replays all three stages:
    * per-(vector, subspace) code assignment as an argmin join against the
    * codebook relation (ROW_NUMBER ORDER BY dist, j = the kernel's
    * first-index-wins strict `<` loop), ADC scoring by joining candidate
    * codes to the query's LUT rows (8 singleton conditional sums pivoted
    * back to columns so the subspace terms add in the kernel's s=0..7
    * left-assoc order), shortlist by e6-rounded ADC with (adc DESC,
    * vec_id) ties, then exact-cosine rescoring of the survivors. */
  private def duckAnnIvfPq: String = {
    import IvfSql.assignCtes
    import VecSql.{dotVec, normSq}
    val m = 8; val ksub = 256; val d = 8
    val nprobe = 3; val refine = 4; val k = 5
    // left-assoc dot of v dims [s*8+1 .. s*8+8] with codebook entry c —
    // matches PqKernels' accumulation order (and DotProductExpr's)
    def sliceDotCb(vCol: String): String =
      (0 until d).map(i => s"$vCol[cb.s*$d + ${i + 1}]*cb.c[${i + 1}]").mkString(" + ")
    val cbSelfDot = (0 until d).map(i => s"cb.c[${i + 1}]*cb.c[${i + 1}]").mkString(" + ")
    // ADC: one lut row per (qid, s) after the code join; singleton
    // conditional sums make per-subspace terms exact, then the 8 columns
    // add left-assoc like the kernel's reduceLeft
    val lutCols = (0 until m).map(s => s"SUM(CASE WHEN pc.s = $s THEN l.lv END) AS l$s")
      .mkString(",\n    ")
    val adcSum = (0 until m).map(s => s"l$s").mkString(" + ")
    val structList = IvfSql.centers.indices.map(j => s"{'b': $j, 'd': d$j}").mkString(", ")
    val cos =
      s"floor(((${dotVec("q.qv", "cv.v")}) / (sqrt(${normSq("q.qv")}) * sqrt(${normSq("cv.v")}))) * 1000000.0 + 0.5) / 1000000.0"
    s"""WITH $assignCtes,
       |${graft.operators.PqCodebook256.oracleCte},
       |pd AS (
       |  SELECT a.vec_id, cb.s, cb.j,
       |    ($cbSelfDot) - 2.0*(${sliceDotCb("a.nv")}) AS dist
       |  FROM a, cb
       |),
       |pcodes AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT vec_id, s, j, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
       |    FROM pd
       |  ) WHERE rn = 1
       |),
       |q AS (SELECT vec_id AS qid, v AS qv, nv AS qnv FROM a WHERE vec_id < 10),
       |lutv AS (
       |  SELECT q.qid, cb.s, cb.j, (${sliceDotCb("q.qnv")}) AS lv
       |  FROM q, cb
       |),
       |qd AS (
       |  SELECT qid, qv, qnv,
       |    ${IvfSql.dists("qnv")}
       |  FROM q
       |),
       |qp AS (SELECT qid, qv, qnv, unnest([$structList]) AS u FROM qd),
       |probes AS (
       |  SELECT qid, b AS bucket FROM (
       |    SELECT qid, u.b AS b, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY u.d, u.b) AS rn
       |    FROM qp
       |  ) WHERE rn <= $nprobe
       |),
       |cand AS (
       |  SELECT p.qid, c.vec_id
       |  FROM probes p JOIN a c USING (bucket) WHERE c.vec_id <> p.qid
       |),
       |adc8 AS (
       |  SELECT cd.qid, cd.vec_id,
       |    $lutCols
       |  FROM cand cd
       |    JOIN pcodes pc ON pc.vec_id = cd.vec_id
       |    JOIN lutv l ON l.qid = cd.qid AND l.s = pc.s AND l.j = pc.code
       |  GROUP BY cd.qid, cd.vec_id
       |),
       |adc AS (
       |  SELECT qid, vec_id, floor(($adcSum) * 1000000.0 + 0.5) / 1000000.0 AS adc
       |  FROM adc8
       |),
       |short AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id) AS arn
       |    FROM adc
       |  ) WHERE arn <= ${refine * k}
       |),
       |resc AS (
       |  SELECT s.qid, s.vec_id, $cos AS cos
       |  FROM short s JOIN a cv ON s.vec_id = cv.vec_id JOIN q ON s.qid = q.qid
       |)
       |SELECT qid, vec_id AS nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn, cos
       |FROM resc QUALIFY rn <= $k ORDER BY qid, rn""".stripMargin
  }

  /** DuckDB mirror of [[Similarity.ivfAdcTopK]] (x48): the x33 recipe
    * with residual encoding — a 16-row literal centroid relation joins
    * on each vector's cell, pd's distance subtracts the centroid
    * component inside each dot term, and the ADC sum gains the
    * per-probe `dot(qnv, c_cell)` base term (64-term literal chain in
    * DotProductExpr's accumulation order). */
  private def duckAnnIvfAdc: String = {
    import IvfSql.assignCtes
    import VecSql.{dotVec, normSq}
    val m = 8; val ksub = 256; val d = 8
    val nprobe = 3; val refine = 4; val k = 5
    def sliceDotResidual(vCol: String, cvCol: String): String =
      (0 until d).map(i =>
        s"($vCol[cbr.s*$d + ${i + 1}] - $cvCol[cbr.s*$d + ${i + 1}])*cbr.c[${i + 1}]")
        .mkString(" + ")
    def sliceDotCb(vCol: String): String =
      (0 until d).map(i => s"$vCol[cbr.s*$d + ${i + 1}]*cbr.c[${i + 1}]").mkString(" + ")
    val cbSelfDot = (0 until d).map(i => s"cbr.c[${i + 1}]*cbr.c[${i + 1}]").mkString(" + ")
    val cvRows = IvfSql.centers.zipWithIndex.map { case (c, j) =>
      s"($j, [${c.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
    val cdot = (1 to 64).map(i => s"q.qnv[$i]*cv.cv[$i]").mkString(" + ")
    val lutCols = (0 until m).map(s => s"SUM(CASE WHEN pc.s = $s THEN l.lv END) AS l$s")
      .mkString(",\n    ")
    val adcSum = "cdot + " + (0 until m).map(s => s"l$s").mkString(" + ")
    val structList = IvfSql.centers.indices.map(j => s"{'b': $j, 'd': d$j}").mkString(", ")
    val cos =
      s"floor(((${dotVec("q.qv", "cv.v")}) / (sqrt(${normSq("q.qv")}) * sqrt(${normSq("cv.v")}))) * 1000000.0 + 0.5) / 1000000.0"
    s"""WITH $assignCtes,
       |${graft.operators.PqCodebookResidual256.oracleCte("cbr")},
       |cvrel AS (SELECT * FROM (VALUES
       |    $cvRows
       |) AS t(bucket, cv)),
       |pd AS (
       |  SELECT a.vec_id, cbr.s, cbr.j,
       |    ($cbSelfDot) - 2.0*(${sliceDotResidual("a.nv", "cvr.cv")}) AS dist
       |  FROM a JOIN cvrel cvr ON a.bucket = cvr.bucket CROSS JOIN cbr
       |),
       |pcodes AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT vec_id, s, j, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
       |    FROM pd
       |  ) WHERE rn = 1
       |),
       |q AS (SELECT vec_id AS qid, v AS qv, nv AS qnv FROM a WHERE vec_id < 10),
       |lutv AS (
       |  SELECT q.qid, cbr.s, cbr.j, (${sliceDotCb("q.qnv")}) AS lv
       |  FROM q, cbr
       |),
       |qd AS (
       |  SELECT qid, qv, qnv,
       |    ${IvfSql.dists("qnv")}
       |  FROM q
       |),
       |qp AS (SELECT qid, qv, qnv, unnest([$structList]) AS u FROM qd),
       |probes AS (
       |  SELECT p.qid, p.bucket, ($cdot) AS cdot
       |  FROM (
       |    SELECT qid, qnv, b AS bucket FROM (
       |      SELECT qid, qnv, u.b AS b, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY u.d, u.b) AS rn
       |      FROM qp
       |    ) WHERE rn <= $nprobe
       |  ) p JOIN q ON p.qid = q.qid JOIN cvrel cv ON p.bucket = cv.bucket
       |),
       |cand AS (
       |  SELECT p.qid, c.vec_id, p.cdot
       |  FROM probes p JOIN a c USING (bucket) WHERE c.vec_id <> p.qid
       |),
       |adc8 AS (
       |  SELECT cd.qid, cd.vec_id, cd.cdot,
       |    $lutCols
       |  FROM cand cd
       |    JOIN pcodes pc ON pc.vec_id = cd.vec_id
       |    JOIN lutv l ON l.qid = cd.qid AND l.s = pc.s AND l.j = pc.code
       |  GROUP BY cd.qid, cd.vec_id, cd.cdot
       |),
       |adc AS (
       |  SELECT qid, vec_id, floor(($adcSum) * 1000000.0 + 0.5) / 1000000.0 AS adc
       |  FROM adc8
       |),
       |short AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id) AS arn
       |    FROM adc
       |  ) WHERE arn <= ${refine * k}
       |),
       |resc AS (
       |  SELECT s.qid, s.vec_id, $cos AS cos
       |  FROM short s JOIN a cv ON s.vec_id = cv.vec_id JOIN q ON s.qid = q.qid
       |)
       |SELECT qid, vec_id AS nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn, cos
       |FROM resc QUALIFY rn <= $k ORDER BY qid, rn""".stripMargin
  }

  /** DuckDB mirror of [[Similarity.semanticPrune]] (x34): shared
    * assignment CTEs, per-row alignment as the x15 CASE of literal
    * chains, then the dominance EXISTS — same-cell neighbor with
    * (align, id)-lower order and e6-rounded unit-dot ≥ threshold. */
  private val duckSemanticPrune: String = {
    import IvfSql.{assignCtes, centers}
    import VecSql.{dotLit, dotVec}
    val alignCase = centers.indices
      .map(j => s"WHEN bucket = $j THEN (${dotLit("nv", centers(j))})")
      .mkString(" ")
    val pairDot = s"floor((${dotVec("x.nv", "y.nv")}) * 1000000.0 + 0.5) / 1000000.0"
    s"""WITH $assignCtes,
       |al AS (
       |  SELECT vec_id, nv, bucket,
       |    CAST(floor((CASE $alignCase END) * 1000000.0 + 0.5) AS BIGINT) AS align_e6
       |  FROM a
       |)
       |SELECT x.vec_id AS vec_id, x.bucket AS bucket, x.align_e6 AS align_e6,
       |  CAST(CASE WHEN EXISTS (
       |    SELECT 1 FROM al y
       |    WHERE y.bucket = x.bucket
       |      AND (y.align_e6 < x.align_e6
       |           OR (y.align_e6 = x.align_e6 AND y.vec_id < x.vec_id))
       |      AND $pairDot >= 0.4
       |  ) THEN 1 ELSE 0 END AS BIGINT) AS pruned
       |FROM al x ORDER BY vec_id""".stripMargin
  }

  /** DuckDB mirror of [[Similarity.cellStats]] (x15): shared assignment
    * CTEs, then per-row alignment = dot(nv, centroid_of_its_cell) as a
    * 16-branch CASE of literal chains, rounded to exact 1e-6 int64 units
    * before the order-insensitive integer sum. */
  private val duckIvfCells: String = {
    import IvfSql._
    import VecSql.dotLit
    val alignCase = centers.indices
      .map(j => s"WHEN bucket = $j THEN (${dotLit("nv", centers(j))})")
      .mkString(" ")
    s"""WITH ${assignCtes},
       |al AS (
       |  SELECT vec_id, bucket,
       |    CAST(floor((CASE $alignCase END) * 1000000.0 + 0.5) AS BIGINT) AS align_e6
       |  FROM a
       |)
       |SELECT bucket, count(*) AS vecs, CAST(sum(align_e6) AS BIGINT) AS align_e6_sum,
       |  min(vec_id) AS min_vec, max(vec_id) AS max_vec
       |FROM al GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** DuckDB mirror of the KMV sketch (x16): distinct md5-derived int64
    * hashes per group (staged nibble-fold like x13), uniform positions
    * via the identical long→double arithmetic (2⁶³/2⁶⁴ exact doubles),
    * k-th smallest position → (k−1)/u₍ₖ₎, exact-count fallback under k.
    * The estimate depends only on u₍ₖ₎'s VALUE, so tie order between
    * equal positions is irrelevant. */
  private val duckKmvDistinct: String = {
    val k = 64
    s"""WITH m AS (
       |  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS mm FROM events
       |  WHERE user_id IS NOT NULL
       |),
       |hh AS (SELECT event_type, ${duckNibbleFold("mm")} AS hu FROM m),
       |dh AS (SELECT DISTINCT event_type, ${duckSigned("hu")} AS h FROM hh),
       |du AS (
       |  SELECT event_type, h,
       |    ${duckUnitInterval("h")} AS u
       |  FROM dh
       |),
       |r AS (
       |  SELECT event_type, u,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u, h) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS cnt
       |  FROM du
       |)
       |SELECT event_type,
       |  CAST(least(max(cnt), $k) AS BIGINT) AS sketch_n,
       |  CASE WHEN max(cnt) < $k THEN CAST(max(cnt) AS DOUBLE)
       |       ELSE ${(k - 1).toDouble} / max(CASE WHEN rn = $k THEN u END) END AS approx_distinct
       |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** Shared split-assignment CTEs (m → hh → uu → sp) used by the x18 and
    * x19 oracles — ONE copy of the hash→uniform→threshold chain (staged
    * md5 fold of doc_id||':split' → [[duckUnitInterval]] → CASE). The val
    * threshold is the SCALA-computed `0.8 + 0.1` (= 0.9000000000000001,
    * NOT 0.9) interpolated at its exact shortest repr, because
    * `Sampling.assignSplit` folds the same IEEE sum into its
    * when-chain. */
  private val duckSplitCtes: String =
    s"""m AS (
       |  SELECT doc_id, lang, text, md5(CAST(doc_id AS VARCHAR)||':split') AS mm FROM documents
       |),
       |hh AS (SELECT doc_id, lang, text, ${duckNibbleFold("mm")} AS hu FROM m),
       |uu AS (
       |  SELECT doc_id, lang, text,
       |    ${duckUnitInterval(duckSigned("hu"))} AS u
       |  FROM hh
       |),
       |sp AS (
       |  SELECT doc_id, lang, text,
       |    CASE WHEN u < 0.8 THEN 'train' WHEN u < ${0.8 + 0.1} THEN 'val' ELSE 'test' END AS split
       |  FROM uu
       |)""".stripMargin

  private val duckSplitStats: String =
    s"""WITH $duckSplitCtes
       |SELECT split, lang, count(*) AS docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM sp GROUP BY split, lang ORDER BY split, lang""".stripMargin

  /** DuckDB mirror of the decontamination check (x19): same split CTEs,
    * then per-lang test-doc totals and how many share an exact text md5
    * with any train doc. */
  private val duckContamination: String =
    s"""WITH $duckSplitCtes,
       |tr AS (SELECT DISTINCT md5(text) AS h FROM sp WHERE split = 'train'),
       |te AS (SELECT lang, md5(text) AS h FROM sp WHERE split = 'test')
       |SELECT lang, count(*) AS test_docs,
       |  CAST(sum(CASE WHEN h IN (SELECT h FROM tr) THEN 1 ELSE 0 END) AS BIGINT) AS contaminated
       |FROM te GROUP BY lang ORDER BY lang""".stripMargin

  /** DuckDB mirror of the Bloom contamination pre-filter (x35): shared
    * split CTEs; two md5-derived int64s per text give double-hashed
    * positions `(pa + i·pb) mod m` (pa, pb already in [0, m)); the train
    * bitmap is its DISTINCT position set; a test doc is a candidate iff
    * all k probes hit; exact overlap restates the x19 check. */
  private val duckBloomContamination: String = {
    val mB = 65536; val k = 3
    val posList = (0 until k).map(i =>
      if (i == 0) "pa" else s"(pa + $i*pb) % $mB").mkString(", ")
    s"""WITH $duckSplitCtes,
       |bm AS (SELECT doc_id, lang, split, md5(text) AS h, md5(text||':b2') AS h2 FROM sp),
       |bh AS (SELECT doc_id, lang, split, h,
       |  ${duckNibbleFold("h")} AS hau, ${duckNibbleFold("h2")} AS hbu FROM bm),
       |bp AS (SELECT doc_id, lang, split, h,
       |  ((${duckSigned("hau")} % $mB) + $mB) % $mB AS pa,
       |  ((${duckSigned("hbu")} % $mB) + $mB) % $mB AS pb FROM bh),
       |bits AS (SELECT DISTINCT unnest([$posList]) AS pos FROM bp WHERE split = 'train'),
       |tr AS (SELECT DISTINCT h FROM bp WHERE split = 'train'),
       |te AS (SELECT lang, doc_id, h, unnest([$posList]) AS pos FROM bp WHERE split = 'test'),
       |pd AS (
       |  SELECT lang, doc_id, h,
       |    CASE WHEN count(CASE WHEN pos IN (SELECT pos FROM bits) THEN 1 END) = $k
       |         THEN 1 ELSE 0 END AS candidate
       |  FROM te GROUP BY lang, doc_id, h)
       |SELECT lang, count(*) AS test_docs,
       |  CAST(sum(candidate) AS BIGINT) AS bloom_candidates,
       |  CAST(sum(CASE WHEN h IN (SELECT h FROM tr) THEN 1 ELSE 0 END) AS BIGINT) AS contaminated,
       |  CAST(sum(candidate) - sum(CASE WHEN h IN (SELECT h FROM tr) THEN 1 ELSE 0 END) AS BIGINT) AS false_positives
       |FROM pd GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** DuckDB mirror of the classifier scoring (x39): the same pround4'd
    * feature fragments as ta_quality, the same left-associated weighted
    * sum, and the rational squash (mul/add/div/abs only — no libm). */
  private val duckQualityClassifier: String = {
    val ntok = "len(string_split(text,' '))"
    val ttr = s"floor((len(list_distinct(string_split(text,' '))) / $ntok) * 10000.0 + 0.5) / 10000.0"
    val avg = s"floor(((length(text) - ($ntok - 1)) / $ntok) * 10000.0 + 0.5) / 10000.0"
    val stop = s"floor((len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','is','to','in'))) / $ntok) * 10000.0 + 0.5) / 10000.0"
    val f1 = s"least($ntok, 100) / 100.0"
    val z = s"(-1.2) + 2.0*($f1) + 0.8*($ttr) + (-1.5)*($stop) + 0.1*($avg)"
    s"""WITH s AS (
       |  SELECT doc_id,
       |    floor((0.5 + 0.5*($z)/(1.0 + abs($z))) * 10000.0 + 0.5) / 10000.0 AS score
       |  FROM documents
       |)
       |SELECT doc_id, score,
       |  CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of the sparkbar (x91): identical integer heights,
    * identical glyph array, bucket-ordered string_agg. */
  private val duckSparkbar: String =
    """WITH c AS (
      |  SELECT event_type AS k, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS b,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |m AS (SELECT k, b, cnt, max(cnt) OVER (PARTITION BY k) AS mx FROM c),
      |h AS (SELECT k, b,
      |        ['▁','▂','▃','▄','▅','▆','▇','█'][CAST(cnt * 7 // mx AS INT) + 1] AS ch
      |      FROM m)
      |SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_buckets,
      |  string_agg(ch, '' ORDER BY b) AS bar
      |FROM h GROUP BY k ORDER BY event_type""".stripMargin

  /** DuckDB mirror of the calibration buckets (x92): the x39 score CTE
    * plus the identical decile floor and exact ppm share. */
  private val duckCalibration: String = {
    val ntok = "len(string_split(text,' '))"
    val ttr = s"floor((len(list_distinct(string_split(text,' '))) / $ntok) * 10000.0 + 0.5) / 10000.0"
    val avg = s"floor(((length(text) - ($ntok - 1)) / $ntok) * 10000.0 + 0.5) / 10000.0"
    val stop = s"floor((len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','is','to','in'))) / $ntok) * 10000.0 + 0.5) / 10000.0"
    val f1 = s"least($ntok, 100) / 100.0"
    val z = s"(-1.2) + 2.0*($f1) + 0.8*($ttr) + (-1.5)*($stop) + 0.1*($avg)"
    s"""WITH s AS (
       |  SELECT doc_id,
       |    floor((0.5 + 0.5*($z)/(1.0 + abs($z))) * 10000.0 + 0.5) / 10000.0 AS score,
       |    CASE WHEN $ntok >= 50 THEN 1 ELSE 0 END AS label
       |  FROM documents
       |)
       |SELECT LEAST(CAST(floor(score * 10) AS BIGINT), 9) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(label) AS BIGINT) AS n_long,
       |  CAST(sum(label) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS long_ppm
       |FROM s GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** DuckDB mirror of the period detector (x93): identical centered
    * integers, banded self-join, (R, −lag) total order. */
  private val duckPeriodDetect: String =
    """WITH c AS (
      |  SELECT event_type AS k, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS b,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |s AS (SELECT k, CAST(count(*) AS BIGINT) AS nb, CAST(sum(cnt) AS BIGINT) AS sm FROM c GROUP BY k),
      |d AS (SELECT c.k, c.b, s.nb * c.cnt - s.sm AS d, s.nb FROM c JOIN s ON c.k = s.k),
      |p AS (SELECT l.k, r.b - l.b AS lag, l.d * r.d AS prod, l.nb
      |      FROM d l JOIN d r ON l.k = r.k AND r.b > l.b AND r.b <= l.b + 10),
      |a AS (SELECT k, lag, min(nb) AS nb, CAST(sum(prod) AS BIGINT) AS r FROM p GROUP BY 1, 2),
      |rk AS (SELECT k, nb, lag, r,
      |         ROW_NUMBER() OVER (PARTITION BY k ORDER BY r DESC, lag ASC) AS rn
      |       FROM a)
      |SELECT k AS event_type, nb AS n_buckets, lag AS best_lag, r AS best_r
      |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** DuckDB mirror of the change point (x94): identical integer CUSUM
    * deviations under the identical (dev, −idx) order. */
  private val duckChangePoint: String =
    """WITH c AS (
      |  SELECT event_type AS k, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS b,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |w AS (SELECT k, b, cnt,
      |        CAST(row_number() OVER (PARTITION BY k ORDER BY b) AS BIGINT) AS idx,
      |        CAST(sum(cnt) OVER (PARTITION BY k ORDER BY b) AS BIGINT) AS cum,
      |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS nb,
      |        CAST(sum(cnt) OVER (PARTITION BY k) AS BIGINT) AS sm
      |      FROM c),
      |dv AS (SELECT k, b, idx, nb, CAST(abs(nb * cum - idx * sm) AS BIGINT) AS dev FROM w),
      |rk AS (SELECT k, nb, b, dev,
      |         ROW_NUMBER() OVER (PARTITION BY k ORDER BY dev DESC, idx ASC) AS rn
      |       FROM dv)
      |SELECT k AS event_type, nb AS n_buckets, b AS cp_bucket, dev AS max_dev
      |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** DuckDB mirror of the trailing actives (x95): identical 7-day
    * fan-out, identical max-day cut. */
  private val duckTrailingActives: String =
    """WITH ev AS (
      |  SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id
      |  FROM events
      |),
      |mx AS (SELECT max(day) AS mx FROM ev),
      |ex AS (SELECT unnest(generate_series(day, day + 6)) AS d, user_id FROM ev)
      |SELECT ex.d AS day, CAST(count(DISTINCT ex.user_id) AS BIGINT) AS active_7d
      |FROM ex, mx WHERE ex.d <= mx.mx
      |GROUP BY 1 ORDER BY day""".stripMargin

  /** DuckDB mirror of the audience overlap (x96): identical distinct
    * pair join and exact ppm Jaccard. */
  private val duckAudienceOverlap: String =
    """WITH tu AS (SELECT DISTINCT event_type AS et, user_id FROM events),
      |sz AS (SELECT et, CAST(count(*) AS BIGINT) AS sz FROM tu GROUP BY et),
      |iv AS (SELECT a.et AS et_a, b.et AS et_b, CAST(count(*) AS BIGINT) AS n_inter
      |       FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.et < b.et
      |       GROUP BY 1, 2)
      |SELECT iv.et_a, iv.et_b, sa.sz AS n_a, sb.sz AS n_b, iv.n_inter,
      |  sa.sz + sb.sz - iv.n_inter AS n_union,
      |  iv.n_inter * 1000000 // (sa.sz + sb.sz - iv.n_inter) AS jac_ppm
      |FROM iv JOIN sz sa ON iv.et_a = sa.et JOIN sz sb ON iv.et_b = sb.et
      |ORDER BY et_a, et_b""".stripMargin

  /** DuckDB mirror of the strict-dedup funnel (x97): the identical
    * scan semantics — earliest continuation per anchor, NOT-EXISTS
    * abort against the union of already-matched steps. */
  private val duckFunnelDedup: String =
    """WITH ev AS (
      |  SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type AS et
      |  FROM events
      |),
      |s1 AS (SELECT u, t AS t1, t AS tk FROM ev WHERE et = 'signup'),
      |x2 AS (SELECT s1.u, s1.t1, s1.tk, min(e.t) AS tn
      |       FROM s1 JOIN ev e ON e.u = s1.u AND e.et = 'click'
      |        AND e.t > s1.tk AND e.t <= s1.t1 + 86400000000
      |       GROUP BY 1, 2, 3),
      |s2 AS (SELECT u, t1, tn AS tk FROM x2
      |       WHERE NOT EXISTS (SELECT 1 FROM ev d WHERE d.u = x2.u
      |        AND d.et = 'signup' AND d.t > x2.tk AND d.t < x2.tn)),
      |x3 AS (SELECT s2.u, s2.t1, s2.tk, min(e.t) AS tn
      |       FROM s2 JOIN ev e ON e.u = s2.u AND e.et = 'purchase'
      |        AND e.t > s2.tk AND e.t <= s2.t1 + 86400000000
      |       GROUP BY 1, 2, 3),
      |s3 AS (SELECT u, t1, tn AS tk FROM x3
      |       WHERE NOT EXISTS (SELECT 1 FROM ev d WHERE d.u = x3.u
      |        AND d.et IN ('signup', 'click') AND d.t > x3.tk AND d.t < x3.tn)),
      |lv AS (
      |  SELECT u, 0 AS level FROM (SELECT DISTINCT u FROM ev)
      |  UNION ALL SELECT DISTINCT u, 1 FROM s1
      |  UNION ALL SELECT DISTINCT u, 2 FROM s2
      |  UNION ALL SELECT DISTINCT u, 3 FROM s3
      |),
      |m AS (SELECT u, max(level) AS level FROM lv GROUP BY u)
      |SELECT level, CAST(count(*) AS BIGINT) AS n_users
      |FROM m GROUP BY level ORDER BY level""".stripMargin

  /** DuckDB mirror of the retention triangle (x98). */
  private val duckRetentionTriangle: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, event_type
      |  FROM events
      |),
      |co AS (SELECT user_id, min(day) AS cohort_day FROM ev
      |       WHERE event_type = 'signup' GROUP BY 1),
      |ad AS (SELECT DISTINCT user_id, day FROM ev)
      |SELECT co.cohort_day, ad.day - co.cohort_day AS "offset",
      |  CAST(count(DISTINCT ad.user_id) AS BIGINT) AS n_active
      |FROM ad JOIN co USING (user_id)
      |WHERE ad.day >= co.cohort_day
      |GROUP BY 1, 2 ORDER BY cohort_day, "offset"""".stripMargin

  /** DuckDB mirror of the RFM segments (x99): identical ceil-rank
    * thresholds per dimension and identical strict-greater scoring. */
  private val duckRfmSegments: String = {
    def thr(d: String) =
      s"""t_$d AS (SELECT
         |  min(CASE WHEN rk = (n + 3) // 4 THEN $d END) AS ${d}_q1,
         |  min(CASE WHEN rk = (n + 1) // 2 THEN $d END) AS ${d}_q2,
         |  min(CASE WHEN rk = (3 * n + 3) // 4 THEN $d END) AS ${d}_q3
         |FROM (SELECT $d, row_number() OVER (ORDER BY $d) AS rk,
         |        count(*) OVER () AS n FROM rfm))""".stripMargin
    def sc(d: String) =
      s"1 + CASE WHEN $d > ${d}_q1 THEN 1 ELSE 0 END + CASE WHEN $d > ${d}_q2 THEN 1 ELSE 0 END + CASE WHEN $d > ${d}_q3 THEN 1 ELSE 0 END"
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
       |    ${graft.functions.centsSql("value")} AS c
       |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
       |),
       |mx AS (SELECT max(day) AS mx FROM ev),
       |rfm AS (SELECT user_id, min(mx.mx) - max(day) AS r,
       |          CAST(count(*) AS BIGINT) AS f, CAST(sum(c) AS BIGINT) AS m
       |        FROM ev, mx GROUP BY user_id),
       |${thr("r")},
       |${thr("f")},
       |${thr("m")},
       |sc AS (SELECT ${sc("r")} AS r_score, ${sc("f")} AS f_score, ${sc("m")} AS m_score
       |       FROM rfm, t_r, t_f, t_m)
       |SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_users
       |FROM sc GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin
  }

  /** DuckDB mirror of the fuzzy match (x37): same 40-char prefixes,
    * lang blocking, levenshtein (identical DP on both engines), and
    * (dist, id) tie-break. */
  private val duckFuzzyMatch: String =
    """WITH d AS (SELECT doc_id, lang, substr(text, 1, 40) AS p FROM documents),
      |q AS (SELECT doc_id AS qid, lang, p AS qp FROM d WHERE doc_id < 20),
      |s AS (
      |  SELECT qid, d.doc_id, CAST(levenshtein(qp, p) AS BIGINT) AS dist,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY levenshtein(qp, p), d.doc_id) AS rn
      |  FROM q JOIN d USING (lang) WHERE d.doc_id <> qid
      |)
      |SELECT qid, doc_id AS best_id, dist FROM s WHERE rn = 1 ORDER BY qid""".stripMargin

  /** DuckDB mirror of the interval join (x36): the range predicate
    * written directly (DuckDB plans it fine at oracle scale); same
    * half-open µs window and exact-cents sum. */
  private val duckIntervalJoin: String =
    """SELECT p.event_id AS event_id, p.user_id AS user_id,
      |  count(*) AS n_clicks,
      |  CAST(sum(CAST(floor(c.value*100.0+0.5) AS BIGINT)) AS BIGINT) AS click_cents
      |FROM events p JOIN events c
      |  ON c.user_id = p.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(p.ts AS TIMESTAMP))
      | AND epoch_us(CAST(c.ts AS TIMESTAMP)) < epoch_us(CAST(p.ts AS TIMESTAMP)) + 600000000
      |GROUP BY 1, 2 ORDER BY event_id""".stripMargin

  /** DuckDB mirror of the repetition metrics (x22): array metrics per doc,
    * word-count-shaped top-token share, the SAME pround4'd ratio fragments
    * reused in the flag so the threshold compares rounded values. */
  private val duckRepetition: String = {
    val dupBi = "floor((1.0 - n_uniq_bigrams / (CASE WHEN n_bigrams > 0 THEN n_bigrams END))" +
      " * 10000.0 + 0.5) / 10000.0"
    val topTok = "floor((top_cnt / n_tokens) * 10000.0 + 0.5) / 10000.0"
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       |base AS (
       |  SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_uniq,
       |    len(w) - 1 AS n_bigrams,
       |    len(list_distinct([w[i]||' '||w[i+1] for i in range(1, len(w))])) AS n_uniq_bigrams
       |  FROM t),
       |freq AS (
       |  SELECT doc_id, max(cnt) AS top_cnt FROM (
       |    SELECT doc_id, tok, count(*) AS cnt
       |    FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok)
       |  GROUP BY doc_id)
       |SELECT b.doc_id, n_tokens,
       |  floor((1.0 - n_uniq / n_tokens) * 10000.0 + 0.5) / 10000.0 AS dup_token_frac,
       |  $dupBi AS dup_bigram_frac,
       |  $topTok AS top_token_frac,
       |  CAST(CASE WHEN $dupBi > 0.2 OR $topTok > 0.2 THEN 1 ELSE 0 END AS BIGINT) AS flag_repetitive
       |FROM base b JOIN freq f ON b.doc_id = f.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  /** DuckDB mirror of the PII pass (x26): the same synthetic-append rule
    * and the SAME regex strings ([[TextAnalysis.emailRe]]/ipv4Re/phoneRe —
    * one source of truth; plain syntax so Java regex and RE2 agree),
    * counts via regexp_extract_all, redaction innermost-email-first with
    * the 'g' flag (Spark replaces all matches by default). */
  private val duckPii: String = {
    import TextAnalysis.{emailRe, ipv4Re, phoneRe}
    s"""WITH p AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' host 10.' || (doc_id % 256) || '.0.1 up' ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199 soon' ELSE '' END
       |    AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$ipv4Re')) AS BIGINT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$emailRe', '[EMAIL]', 'g'), '$ipv4Re', '[IP]', 'g'), '$phoneRe', '[PHONE]', 'g')) AS redacted_md5
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of the TF-IDF top-k (x27): the same log-free
    * `(tf * n_docs) / df` score (exact int64 then one IEEE division —
    * ln() is not cross-engine bit-stable), same window rank. */
  private val duckTfidf: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf, df,
      |    floor(((tf * n_docs) / df) * 10000.0 + 0.5) / 10000.0 AS score
      |  FROM tf JOIN dfreq USING (term), n),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
      |  FROM scored)
      |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score, rn
      |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  /** DuckDB mirror of the CDC chunk dedup (x28): positions via
    * struct-literal unnest, the same last-md5-nibble cut rule, running
    * cut-count window, ordered string_agg re-assembly, dup stats on
    * md5(chunk). */
  private val duckCdcChunks: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT doc_id, unnest([{'pos': i, 'tok': w[i]} for i in range(1, len(w) + 1)]) AS u FROM t),
      |e AS (SELECT doc_id, u.pos AS pos, u.tok AS tok,
      |        CASE WHEN substr(md5(u.tok), 32, 1) = '0' THEN 1 ELSE 0 END AS is_cut FROM p),
      |c AS (SELECT doc_id, pos, tok,
      |        coalesce(sum(is_cut) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx FROM e),
      |ch AS (SELECT doc_id, chunk_idx, count(*) AS n_toks,
      |         string_agg(tok, ' ' ORDER BY pos) AS chunk
      |       FROM c GROUP BY doc_id, chunk_idx)
      |SELECT md5(chunk) AS chunk_md5, CAST(min(n_toks) AS BIGINT) AS n_toks,
      |  count(*) AS occurrences, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS min_doc
      |FROM ch GROUP BY md5(chunk) HAVING count(*) > 1 ORDER BY chunk_md5""".stripMargin

  /** DuckDB mirror of x116: the same 40-char window md5 fingerprints
    * (cross-doc dup rule), the same gap-≤-k island merge, the same
    * exact-ppm normalization; `//` == Spark's `DIV`. */
  private val duckDuplicateSpans: String =
    """WITH docs AS (SELECT doc_id, text, length(text) AS len FROM documents),
      |mx AS (SELECT max(len) AS m FROM docs),
      |idx AS (SELECT CAST(unnest(range(1, (SELECT m FROM mx) + 1)) AS BIGINT) AS i),
      |w AS (SELECT doc_id, i AS pos, md5(substr(text, CAST(i AS INT), 40)) AS h
      |      FROM docs JOIN idx ON i <= len - 39),
      |dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) > 1),
      |dp AS (SELECT doc_id, pos FROM w JOIN dup USING (h)),
      |br AS (SELECT doc_id, pos,
      |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 40
      |              THEN 0 ELSE 1 END AS brk FROM dp),
      |si AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id FROM br),
      |sp AS (SELECT doc_id, span_id, min(pos) AS a, max(pos) AS b, count(*) AS nw
      |       FROM si GROUP BY doc_id, span_id),
      |st AS (SELECT doc_id, CAST(sum(nw) AS BIGINT) AS n_dup_windows,
      |         count(*) AS n_spans, CAST(sum(b - a + 40) AS BIGINT) AS dup_chars
      |       FROM sp GROUP BY doc_id)
      |SELECT st.doc_id, docs.len, n_dup_windows, n_spans, dup_chars,
      |  dup_chars * 1000000 // docs.len AS dup_ppm
      |FROM st JOIN docs USING (doc_id) ORDER BY st.doc_id""".stripMargin

  /** DuckDB mirror of the 8-gram decontamination (x23): same split CTEs as
    * x18/x19, grams via inclusive list slices (w[i:i+7] = the 8 tokens from
    * i), overlap as a distinct-gram join. */
  private val duckNgramContamination: String =
    s"""WITH $duckSplitCtes,
       |g AS (
       |  SELECT doc_id, lang, split,
       |    list_distinct([array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]) AS grams
       |  FROM (SELECT doc_id, lang, split, string_split(text,' ') AS w FROM sp)
       |),
       |tr AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE split = 'train'),
       |te AS (SELECT doc_id, lang, grams FROM g WHERE split = 'test'),
       |hit AS (
       |  SELECT DISTINCT doc_id
       |  FROM (SELECT doc_id, unnest(grams) AS gr FROM te) x JOIN tr USING (gr)
       |)
       |SELECT lang, count(*) AS test_docs,
       |  CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM hit) THEN 1 ELSE 0 END) AS BIGINT) AS contaminated_ngram
       |FROM te GROUP BY lang ORDER BY lang""".stripMargin

  /** DuckDB mirror of the stratified sample (x24): the x18 uniform-position
    * chain under the ':strat' salt, thresholded by a per-lang CASE. */
  private val duckStratStats: String =
    s"""WITH m AS (
       |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)||':strat') AS mm FROM documents
       |),
       |hh AS (SELECT doc_id, lang, ${duckNibbleFold("mm")} AS hu FROM m),
       |uu AS (SELECT doc_id, lang, ${duckUnitInterval(duckSigned("hu"))} AS u FROM hh)
       |SELECT lang, count(*) AS docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM uu
       |WHERE u < (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 WHEN 'fr' THEN 0.1 ELSE 0.05 END)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** DuckDB mirror of the column profile (x20): one UNION ALL branch per
    * column, native-type min/max rendered as VARCHAR afterwards — same
    * as the Spark side's cast-after-aggregate. */
  private val duckProfile: String = {
    val branches = Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         |FROM documents""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** x30 mirror: identical bucket rule to win_tumbling's oracle
    * (epoch_us // window), exact-int spike decisions, pround4'd max z. */
  private val duckAnomaly: String =
    """WITH b AS (
      |  SELECT event_type,
      |    (epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) * 600 AS bucket_start,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2
      |),
      |st AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(cnt) AS BIGINT) AS s, CAST(sum(cnt*cnt) AS BIGINT) AS ss
      |  FROM b GROUP BY 1
      |),
      |j AS (
      |  SELECT b.event_type, n, s,
      |    cnt*n - s AS dev, n*ss - s*s AS varnum
      |  FROM b JOIN st USING (event_type)
      |)
      |SELECT event_type, max(n) AS n_buckets, max(s) AS total_events,
      |  CAST(sum(CASE WHEN dev > 0 AND dev*dev > 4*varnum THEN 1 ELSE 0 END) AS BIGINT) AS z2_cnt,
      |  CAST(sum(CASE WHEN dev > 0 AND dev*dev > 9*varnum THEN 1 ELSE 0 END) AS BIGINT) AS z3_cnt,
      |  max(CASE WHEN varnum > 0
      |      THEN floor((CAST(dev AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE))) * 10000.0 + 0.5) / 10000.0
      |      END) AS max_z4
      |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin

  /** x31 mirror: sqrt is correctly-rounded IEEE on both engines; the
    * weight scaling and ppm normalization are exact int64 (`//` == `DIV`
    * for positive operands). */
  private val duckMixture: String =
    """WITH s AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS docs,
      |    CAST(sum(CASE WHEN text IS NULL THEN 0
      |             ELSE len(string_split(text, ' ')) END) AS BIGINT) AS tokens
      |  FROM documents GROUP BY 1
      |),
      |w AS (
      |  SELECT source, docs, tokens,
      |    CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS w
      |  FROM s
      |)
      |SELECT source, docs, tokens,
      |  (w * 1000000) // CAST((SELECT sum(w) FROM w) AS BIGINT) AS weight_ppm
      |FROM w ORDER BY source""".stripMargin

  /** DuckDB mirror of the mixture-guided sample (x40): the x31 weight
    * CTEs, the exact-int64 budget `T = min(tokens·10⁶ // w_ppm)`, the
    * identical-IEEE rate division, and the ':mix'-salted md5-uniform
    * membership test ([[duckUnitInterval]] chain). */
  private val duckMixtureSample: String = {
    s"""WITH s AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS docs,
       |    CAST(sum(CASE WHEN text IS NULL THEN 0
       |             ELSE len(string_split(text, ' ')) END) AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1
       |),
       |w0 AS (
       |  SELECT source, docs, tokens,
       |    CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS w
       |  FROM s
       |),
       |w AS (
       |  SELECT source, docs, tokens,
       |    (w * 1000000) // CAST((SELECT sum(w) FROM w0) AS BIGINT) AS weight_ppm
       |  FROM w0
       |),
       |wp AS (SELECT * FROM w WHERE weight_ppm > 0),
       |bt AS (SELECT min((tokens * 1000000) // weight_ppm) AS budget_t FROM wp),
       |rates AS (
       |  SELECT source,
       |    least(1.0, CAST(weight_ppm * (SELECT budget_t FROM bt) AS DOUBLE)
       |      / (CAST(tokens AS DOUBLE) * 1000000.0)) AS rate
       |  FROM wp
       |),
       |m AS (
       |  SELECT d.source, d.text, r.rate,
       |    md5(CAST(d.doc_id AS VARCHAR)||':mix') AS mm
       |  FROM documents d JOIN rates r USING (source)
       |),
       |hh AS (SELECT source, text, rate, ${duckNibbleFold("mm")} AS hu FROM m),
       |kept AS (
       |  SELECT source, text FROM hh
       |  WHERE ${duckUnitInterval(duckSigned("hu"))} < rate
       |)
       |SELECT source, count(*) AS kept_docs,
       |  CAST(sum(CASE WHEN text IS NULL THEN 0
       |           ELSE len(string_split(text, ' ')) END) AS BIGINT) AS kept_tokens
       |FROM kept GROUP BY source ORDER BY source""".stripMargin
  }

  /** DuckDB mirror of the codec round-trip (mm2): recomputes the
    * features from the GENERATING formulas (it never parses the binary —
    * that asymmetry is the check: if the Scala decoder misreads padding,
    * offsets, or endianness, the decoded means/energy diverge from the
    * formula and the hash goes red). */
  private val duckMm2Codec: String =
    """WITH img AS (
      |  SELECT doc_id, 4 + (doc_id % 4)*2 AS w, 2 + (doc_id % 3) AS h
      |  FROM documents WHERE doc_id % 2 = 0
      |),
      |ib AS (SELECT doc_id, w, h, unnest(range(0, w*h*3)) AS k FROM img),
      |ia AS (SELECT doc_id, w, h, k % 3 AS c, (doc_id*31 + k*7) % 256 AS v FROM ib),
      |ims AS (
      |  SELECT doc_id, 'image' AS media_type,
      |    CAST(max(w) AS BIGINT) AS m1, CAST(max(h) AS BIGINT) AS m2,
      |    CAST((sum(CASE WHEN c = 0 THEN v ELSE 0 END) * 1000000) // (max(w)*max(h)) AS BIGINT) AS m3,
      |    CAST((sum(CASE WHEN c = 1 THEN v ELSE 0 END) * 1000000) // (max(w)*max(h)) AS BIGINT) AS m4,
      |    CAST((sum(CASE WHEN c = 2 THEN v ELSE 0 END) * 1000000) // (max(w)*max(h)) AS BIGINT) AS m5
      |  FROM ia GROUP BY doc_id
      |),
      |aud AS (
      |  SELECT doc_id, 8 + doc_id % 8 AS n FROM documents WHERE doc_id % 2 = 1
      |),
      |ab AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud),
      |aa AS (SELECT doc_id, n, ((doc_id*13 + i*5) % 2001) - 1000 AS s FROM ab),
      |ams AS (
      |  SELECT doc_id, 'audio' AS media_type,
      |    CAST(16000 AS BIGINT) AS m1, CAST(max(n) AS BIGINT) AS m2,
      |    CAST((max(n) * 1000000) // 16000 AS BIGINT) AS m3,
      |    CAST(sum(s*s) AS BIGINT) AS m4, CAST(0 AS BIGINT) AS m5
      |  FROM aa GROUP BY doc_id
      |)
      |SELECT * FROM ims UNION ALL SELECT * FROM ams ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of the resize + frame-sample round-trip (mm3): like
    * mm2, the oracle recomputes from the GENERATING formulas and never
    * parses bytes — each resized target pixel's value comes from the
    * source-pixel formula at the nearest-neighbor floor mapping, so any
    * addressing slip in the Scala resize (stride, padding, channel
    * interleave) diverges the means; frame energies re-sum the sample
    * formula over each kept frame's exact index range. */
  private val duckMm3Resize: String =
    """WITH img AS (
      |  SELECT doc_id, 8 + (doc_id % 4)*2 AS w0, 4 + (doc_id % 3) AS h0
      |  FROM documents WHERE doc_id % 2 = 0
      |),
      |tp AS (
      |  SELECT doc_id, w0, h0,
      |    unnest(range(0, 3)) AS y
      |  FROM img
      |),
      |tpx AS (
      |  SELECT doc_id, w0, h0, y, unnest(range(0, 5)) AS x FROM tp
      |),
      |tpc AS (
      |  SELECT doc_id, w0, h0, y, x, unnest(range(0, 3)) AS c FROM tpx
      |),
      |pv AS (
      |  SELECT doc_id, c,
      |    (doc_id*31 + (((y*h0) // 3) * w0 * 3 + ((x*w0) // 5) * 3 + c) * 7) % 256 AS v
      |  FROM tpc
      |),
      |ims AS (
      |  SELECT doc_id, 'image' AS media_type, CAST(0 AS BIGINT) AS idx,
      |    CAST(5 AS BIGINT) AS v1, CAST(3 AS BIGINT) AS v2,
      |    CAST((sum(CASE WHEN c = 0 THEN v ELSE 0 END) * 1000000) // 15 AS BIGINT) AS v3,
      |    CAST((sum(CASE WHEN c = 1 THEN v ELSE 0 END) * 1000000) // 15 AS BIGINT) AS v4,
      |    CAST((sum(CASE WHEN c = 2 THEN v ELSE 0 END) * 1000000) // 15 AS BIGINT) AS v5
      |  FROM pv GROUP BY doc_id
      |),
      |aud AS (
      |  SELECT doc_id, 24 + doc_id % 8 AS n FROM documents WHERE doc_id % 2 = 1
      |),
      |fr AS (
      |  SELECT doc_id, n, unnest([0, 2]) AS f FROM aud
      |),
      |fi AS (
      |  SELECT doc_id, f, unnest(range(f*8, f*8 + 8)) AS i FROM fr
      |  WHERE (f + 1) * 8 <= n
      |),
      |fs AS (
      |  SELECT doc_id, f, ((doc_id*13 + i*5) % 2001) - 1000 AS s FROM fi
      |),
      |ams AS (
      |  SELECT doc_id, 'audio' AS media_type, CAST(f AS BIGINT) AS idx,
      |    CAST(sum(s*s) AS BIGINT) AS v1, CAST(8 AS BIGINT) AS v2,
      |    CAST(0 AS BIGINT) AS v3, CAST(0 AS BIGINT) AS v4, CAST(0 AS BIGINT) AS v5
      |  FROM fs GROUP BY doc_id, f
      |)
      |SELECT * FROM ims UNION ALL SELECT * FROM ams ORDER BY doc_id, idx""".stripMargin

  /** DuckDB mirror of the pattern search (x43): same bucket chain as
    * x30, lead() windows with the contiguity check, exact integer
    * distances, (dist2, bucket_start) rank. */
  private val duckTsMatch: String = {
    val pattern = Seq(12L, 12L, 12L, 12L, 12L, 12L, 12L, 12L)
    val L = pattern.size
    val leads = (0 until L).map(i =>
      s"lead(cnt, $i) OVER (PARTITION BY event_type ORDER BY bucket_start) AS c$i").mkString(",\n    ")
    val dist = pattern.zipWithIndex.map { case (p, i) => s"(c$i - $p)*(c$i - $p)" }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT event_type,
       |    (epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) * 600 AS bucket_start,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2
       |),
       |l AS (
       |  SELECT event_type, bucket_start,
       |    $leads,
       |    lead(bucket_start, ${L - 1}) OVER (PARTITION BY event_type ORDER BY bucket_start) AS end_start
       |  FROM b
       |),
       |d AS (
       |  SELECT event_type, bucket_start, CAST($dist AS BIGINT) AS dist2
       |  FROM l WHERE end_start = bucket_start + ${(L - 1) * 600}
       |),
       |r AS (
       |  SELECT event_type, bucket_start, dist2,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dist2, bucket_start) AS rn
       |  FROM d
       |)
       |SELECT event_type, bucket_start, dist2, rn FROM r WHERE rn <= 5
       |ORDER BY event_type, rn""".stripMargin
  }

  /** DuckDB mirror of the z-order key (x44): identical shift/mask/or
    * interleave over the same 16-bit folded bucket. */
  private val duckZOrderKey: String = {
    val terms = (0 until 16).map(i =>
      s"(((user_id >> $i) & 1) << ${2 * i}) | (((b16 >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")
    s"""WITH e AS (
       |  SELECT event_id, user_id,
       |    ((epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) % 65536) AS b16
       |  FROM events WHERE event_id < 5000
       |)
       |SELECT event_id, CAST($terms AS BIGINT) AS z
       |FROM e ORDER BY event_id""".stripMargin
  }

  /** DuckDB mirror of the 3-dim z-order key (x47): identical
    * shift/mask/or interleave with bit i of dim d at position 3i+d; the
    * event-type dim is the md5-fold recipe pmod 256. */
  private val duckZOrder3: String = {
    val terms = (0 until 16).map(i =>
      s"(((user_id >> $i) & 1) << ${3 * i}) | (((tid >> $i) & 1) << ${3 * i + 1})" +
        s" | (((b16 >> $i) & 1) << ${3 * i + 2})")
      .mkString(" | ")
    s"""WITH e0 AS (
       |  SELECT event_id, user_id,
       |    ((epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) % 65536) AS b16,
       |    md5(event_type) AS mm
       |  FROM events WHERE event_id < 5000
       |),
       |e1 AS (SELECT event_id, user_id, b16, ${duckNibbleFold("mm")} AS hu FROM e0),
       |e AS (
       |  SELECT event_id, user_id, b16,
       |    (((${duckSigned("hu")}) % 256 + 256) % 256) AS tid
       |  FROM e1
       |)
       |SELECT event_id, CAST($terms AS BIGINT) AS z
       |FROM e ORDER BY event_id""".stripMargin
  }

  /** DuckDB mirror of the reservoir sample (x42): the ':res'-salted
    * md5-uniform chain, rank by (u, id) per lang, keep 10. */
  private val duckReservoir: String =
    s"""WITH m AS (
       |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)||':res') AS mm FROM documents
       |),
       |hh AS (SELECT lang, doc_id, ${duckNibbleFold("mm")} AS hu FROM m),
       |uu AS (
       |  SELECT lang, doc_id, ${duckUnitInterval(duckSigned("hu"))} AS u FROM hh
       |),
       |r AS (
       |  SELECT lang, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rk
       |  FROM uu
       |)
       |SELECT lang, doc_id FROM r WHERE rk <= 10 ORDER BY lang, doc_id""".stripMargin

  /** DuckDB mirror of the Count-Min estimates (x41): the d=4 salted
    * md5 positions via the nibble-fold chain, counter build as a plain
    * GROUP BY, probe = min over each token's 4 counters. */
  private val duckCms: String = {
    val d = 4; val w = 256
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS t FROM documents
       |),
       |tt AS (SELECT t FROM toks WHERE t <> ''),
       |tm AS (
       |  SELECT t, i, md5(t || ':cms' || CAST(i AS VARCHAR)) AS mm
       |  FROM tt, (SELECT unnest([0, 1, 2, 3]) AS i)
       |),
       |tp AS (
       |  SELECT t, i,
       |    ((${duckSigned(duckNibbleFold("mm"))} % $w) + $w) % $w AS pos
       |  FROM tm
       |),
       |sk AS (SELECT i, pos, count(*) AS cnt FROM tp GROUP BY i, pos),
       |probe AS (SELECT DISTINCT t, i, pos FROM tp),
       |est AS (
       |  SELECT t, min(cnt) AS est
       |  FROM probe JOIN sk USING (i, pos) GROUP BY t
       |)
       |SELECT t AS token, CAST(est AS BIGINT) AS est FROM est ORDER BY token""".stripMargin
  }

  /** x32 mirror: posting fingerprint = bit_xor of each member doc's
    * md5-derived signed int64 (the md5Hash64 nibble-fold recipe) —
    * order-independent, so no ORDER BY inside the aggregate is needed
    * and both engines fold partials in any order. */
  private val duckInvIndex: String =
    s"""WITH occ AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
       |),
       |per AS (
       |  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY 1, 2
       |),
       |m AS (
       |  SELECT token, tf, md5(CAST(doc_id AS VARCHAR)) AS m1 FROM per
       |),
       |hh AS (
       |  SELECT token, tf, ${duckNibbleFold("m1")} AS hu FROM m
       |)
       |SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
       |  bit_xor(${duckSigned("hu")}) AS postings_fp
       |FROM hh GROUP BY token
       |ORDER BY df DESC, token LIMIT 20""".stripMargin

  /** x45 mirror: same postings-detail/doc-length CTEs, the exact-rational
    * BM25 term score — integer numerator/denominator products then ONE
    * IEEE division per (doc, term) (ln() is not cross-engine bit-stable),
    * e6-quantized to BIGINT before the order-insensitive per-doc sum. */
  private val duckBm25: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |detail AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
      |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
      |tot AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len FROM lens),
      |qt AS (SELECT * FROM detail WHERE token IN ('spark', 'vector', 'merge')),
      |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM qt GROUP BY token),
      |term AS (
      |  SELECT qt.doc_id,
      |    CAST(floor(((22*qt.tf*n_docs*total_len)
      |                / (dfq.df*(10*qt.tf*total_len + 3*total_len + 9*l.dl*n_docs)))
      |               * 1000000.0 + 0.5) AS BIGINT) AS term_e6
      |  FROM qt JOIN dfq USING (token) JOIN lens l USING (doc_id), tot
      |),
      |sc AS (SELECT doc_id, count(*) AS matched, CAST(sum(term_e6) AS BIGINT) AS score_e6
      |       FROM term GROUP BY doc_id)
      |SELECT doc_id, matched, score_e6 FROM sc
      |ORDER BY score_e6 DESC, doc_id LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "x45_bm25_topk" -> duckBm25,
    // the SQL TVF surface answers the SAME retrieval (same terms/k), so
    // the x45 mirror is its oracle verbatim
    "x136_sql_bm25" -> duckBm25,
    // the phrase TVF answers the SAME search as x50 (same phrase), so
    // the x50 mirror is its oracle verbatim
    "x137_sql_phrase" -> duckPhraseSearch,
    // NOTE: the segment must resolve per fact over ALL versions BEFORE
    // any vs filter — DuckDB pushes a dim-column equality below its
    // ASOF JOIN (even from an enclosing subquery), which would resolve
    // facts against only the s1 versions and inflate the totals; the
    // correlated latest-version form is pushdown-proof
    "x140_sql_temporal_asof" ->
      s"""WITH d AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
         |    's' || CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) % 5 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'view'
         |),
         |f AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         |    ${graft.functions.centsSql("value")} AS m
         |  FROM events WHERE event_type = 'purchase' AND (event_id % 10) = 0
         |),
         |r AS (
         |  SELECT f.m,
         |    (SELECT d.vs FROM d WHERE d.k = f.k AND d.vf <= f.t
         |     ORDER BY d.vf DESC LIMIT 1) AS seg
         |  FROM f
         |)
         |SELECT seg, CAST(sum(m) AS BIGINT) AS revenue_cents,
         |  count(*) AS purchases
         |FROM r WHERE seg = 's1'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x139_sql_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |  WHERE user_id = 7
        |),
        |b AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e
        |),
        |x AS (
        |  SELECT user_id, us,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM b
        |)
        |SELECT user_id, min(us) AS session_start, max(us) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY session_start""".stripMargin,
    "x138_sql_topk" ->
      """WITH rel AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM orders GROUP BY 1, 2)
        |SELECT g, v, w, rank FROM (
        |  SELECT g, v, w,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY v DESC) AS INT) AS rank
        |  FROM rel)
        |WHERE g = '1-URGENT' AND rank <= 5 ORDER BY rank""".stripMargin,
    "x32_inverted_index" -> duckInvIndex,
    "x31_mixture_weights" -> duckMixture,
    "x40_mixture_sample" -> duckMixtureSample,
    "x41_cms" -> duckCms,
    "x42_reservoir" -> duckReservoir,
    "x43_ts_match" -> duckTsMatch,
    "x44_zorder_key" -> duckZOrderKey,
    "x47_zorder3" -> duckZOrder3,
    "x30_anomaly" -> duckAnomaly,
    "x20_profile" -> duckProfile,
    "x21_pack_stats" -> duckPackStats,
    "x22_repetition" -> duckRepetition,
    "x23_ngram_contamination" -> duckNgramContamination,
    "x24_strat_sample" -> duckStratStats,
    "x26_pii" -> duckPii,
    "x27_tfidf_topk" -> duckTfidf,
    "x28_cdc_chunks" -> duckCdcChunks,
    "x18_split_stats" -> duckSplitStats,
    "x19_contamination" -> duckContamination,
    "x35_bloom_contamination" -> duckBloomContamination,
    "x36_interval_join" -> duckIntervalJoin,
    "x37_fuzzy_match" -> duckFuzzyMatch,
    "x39_quality_classifier" -> duckQualityClassifier,
    "x38_heavy_hitters" ->
      """SELECT t AS token, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |WHERE t <> '' GROUP BY t ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    "x12_ann_ivf" -> duckAnnIvf,
    "x33_ann_ivfpq" -> duckAnnIvfPq,
    "x48_ann_ivfadc" -> duckAnnIvfAdc,
    "x34_semantic_prune" -> duckSemanticPrune,
    "x15_ivf_cells" -> duckIvfCells,
    // x8/x10 (r15): the oracle recomputes the EXACT side and expects the
    // band flags to be 1 — the Spark side computes the sketch, compares
    // it to its exact twin in-plan, and a sketch outside its published
    // error band flips the flag and reds the hash (error-banded check;
    // the raw engine-specific sketch values stay out of the compared
    // columns)
    "x8_approx_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  CAST(1 AS BIGINT) AS within_3rsd
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "x10_approx_pct" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS p50_in_band, CAST(1 AS BIGINT) AS p95_in_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "x16_kmv_distinct" -> duckKmvDistinct,
    "x3_simhash" -> duckSimhashPairs,
    "x46_image_neardup" -> duckImageNearDup,
    "x49_audio_neardup" -> duckAudioNearDup,
    "x50_phrase_search" -> duckPhraseSearch,
    "x51_hist_quantiles" -> duckHistQuantiles,
    "x52_token_pagerank" -> duckTokenPagerank,
    "x53_kmeans_fit" -> duckKmeansFit,
    "x54_window_funnel" -> duckWindowFunnel,
    "x55_retention" -> duckRetention,
    "x56_sequence_match" -> duckSequenceMatch,
    "x57_bitmap_retention" -> duckBitmapRetention,
    "x58_pq_train" -> duckPqTrain,
    "x59_summap" -> duckSumMap,
    "x60_bigram_surprisal" -> duckBigramSurprisal,
    "x62_sequence_count" -> duckSequenceCount,
    "x63_kmv_set_algebra" -> duckKmvSetAlgebra,
    "x64_decayed_sum" -> duckDecayedSum,
    "x65_pivot_daily" -> duckPivotDaily,
    "x66_novelty" -> duckNovelty,
    "x67_interval_coverage" -> duckIntervalCoverage,
    "x68_corr_moments" -> duckCorrMoments,
    "x69_conversion_latency" -> duckConversionLatency,
    "x70_argmax" -> duckArgMax,
    "x71_uniq_up_to" -> duckUniqUpTo,
    "x72_max_intersections" -> duckMaxIntersections,
    "x73_delta_sum" -> duckDeltaSum,
    "x74_moment_stats" -> duckMomentStats,
    "x75_weighted_quantiles" -> duckWeightedQuantiles,
    "x76_linreg" -> duckLinReg,
    "x77_mann_whitney" -> duckMannWhitney,
    "x78_group_concat" -> duckGroupConcat,
    "x79_spearman" -> duckSpearman,
    "x80_mad" -> duckMad,
    "x81_next_node" -> duckNextNode,
    "x82_bounding_ratio" -> duckBoundingRatio,
    "x83_ttest" -> duckTTest,
    "x84_funnel_strict" -> duckFunnelStrict,
    "x85_bit_ops" -> duckBitOps,
    "x86_roc_auc" -> duckRocAuc,
    "x87_lttb" -> duckLttb,
    "x88_ks_test" -> duckKsTest,
    "x89_tukey" -> duckTukey,
    "x90_proportion_z" -> duckProportionZ,
    "x91_sparkbar" -> duckSparkbar,
    "x92_calibration" -> duckCalibration,
    "x93_period_detect" -> duckPeriodDetect,
    "x94_change_point" -> duckChangePoint,
    "x95_trailing_actives" -> duckTrailingActives,
    "x96_audience_overlap" -> duckAudienceOverlap,
    "x97_funnel_dedup" -> duckFunnelDedup,
    "x98_retention_triangle" -> duckRetentionTriangle,
    "x99_rfm_segments" -> duckRfmSegments,
    "x100_latency_histogram" -> duckLatencyHistogram,
    "x101_blocklist_match" -> duckBlocklistMatch,
    "x102_domain_entropy" -> duckDomainEntropy,
    "x103_contingency" -> duckContingency,
    "x104_cramers_v" -> duckCramersV,
    "x105_sgd_linreg" -> duckSgdLinreg,
    "x106_theils_u" -> duckTheilsU,
    "x107_decayed_avg" -> duckDecayedAvg,
    "x108_group_intersect" -> duckGroupIntersect,
    "x109_subnet_rollup" -> duckSubnetRollup,
    "x110_topk_weighted" -> duckTopKWeighted,
    "x111_minmax_map" -> duckMinMaxMap,
    "x112_corr_matrix" -> duckCorrMatrix,
    "x113_bitmap_churn" -> duckBitmapChurn,
    "x114_transition_matrix" -> duckTransitionMatrix,
    "x115_gap_fill" -> duckGapFill,
    "x116_duplicate_spans" -> duckDuplicateSpans,
    "x117_chain_revenue" ->
      s"""SELECT c_mktsegment,
         |  CAST(sum(${graft.functions.centsSql("l_extendedprice")}) AS BIGINT) AS revenue_cents,
         |  count(*) AS triples
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "x118_star_revenue" ->
      s"""SELECT n_name,
         |  CAST(sum(${graft.functions.centsSql("l_extendedprice")}) AS BIGINT) AS revenue_cents,
         |  count(*) AS n_rows
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "x119_segment_order_stats" ->
      s"""WITH o AS (
         |  SELECT c_mktsegment AS seg,
         |         ${graft.functions.centsSql("o_totalprice")} AS v
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |vw AS (SELECT seg, v, count(*) AS w FROM o GROUP BY seg, v),
         |c AS (SELECT seg, v, w,
         |        sum(w) OVER (PARTITION BY seg ORDER BY v) AS cum,
         |        sum(w) OVER (PARTITION BY seg) AS n
         |      FROM vw)
         |SELECT seg, min(v) AS min_cents, max(v) AS max_cents,
         |       CAST(max(n) AS BIGINT) AS n_orders,
         |       min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS median_lo_cents
         |FROM c GROUP BY seg ORDER BY seg""".stripMargin,
    "x120_left_revenue" ->
      s"""SELECT coalesce(n_name, 'UNRESOLVED') AS nation,
         |  CAST(sum(${graft.functions.centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents,
         |  count(*) AS n_orders
         |FROM orders
         |LEFT JOIN (SELECT c_custkey, c_nationkey FROM customer
         |           WHERE c_acctbal >= 0) c ON o_custkey = c_custkey
         |LEFT JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x121_nation_distinct" ->
      s"""SELECT n_name AS nation, count(DISTINCT o_custkey) AS n_cust,
         |  count(*) AS n_orders,
         |  CAST(sum(${graft.functions.centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x122_fanout_revenue" ->
      s"""SELECT l_returnflag AS flag, count(*) AS n_pairs,
         |  CAST(sum(${graft.functions.centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents
         |FROM orders
         |JOIN (SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem) li
         |  ON o_orderkey = l_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x123_asof_revenue" ->
      s"""WITH d AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
         |    's' || CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) % 5 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'view'
         |),
         |f AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         |    ${graft.functions.centsSql("value")} AS m
         |  FROM events WHERE event_type = 'purchase'
         |)
         |SELECT coalesce(d.vs, '(none)') AS seg,
         |  CAST(sum(f.m) AS BIGINT) AS revenue_cents, count(*) AS purchases
         |FROM f ASOF LEFT JOIN d ON f.k = d.k AND f.t >= d.vf
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x129_user_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |),
        |b AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e
        |),
        |x AS (
        |  SELECT user_id, us,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM b
        |),
        |g AS (
        |  SELECT user_id, session_idx, min(us) AS st, max(us) AS en, count(*) AS n
        |  FROM x GROUP BY user_id, session_idx
        |)
        |SELECT user_id, count(*) AS n_sessions, CAST(max(n) AS BIGINT) AS max_events,
        |  max(en - st) AS longest_us, CAST(sum(n) AS BIGINT) AS total_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "x128_attributed_clicks" ->
      s"""SELECT 'b' || CAST(${graft.functions.centsSql("p.value")} % 5 AS VARCHAR) AS band,
         |  CAST(sum(${graft.functions.centsSql("c.value")}) AS BIGINT) AS click_cents,
         |  count(*) AS matches
         |FROM events p JOIN events c
         |  ON c.user_id = p.user_id
         | AND p.event_type = 'purchase' AND c.event_type = 'click'
         | AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(p.ts AS TIMESTAMP))
         | AND epoch_us(CAST(c.ts AS TIMESTAMP)) < epoch_us(CAST(p.ts AS TIMESTAMP)) + 600000000
         |GROUP BY 1 ORDER BY band""".stripMargin,
    "x133_mixed_enriched" ->
      s"""WITH d AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
         |    's' || CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) % 5 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'view'
         |),
         |w AS (
         |  SELECT event_id AS iid, user_id AS k,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         |    epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e,
         |    'b' || CAST(${graft.functions.centsSql("value")} % 5 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'purchase'
         |),
         |f AS (
         |  SELECT event_id AS id, user_id AS k,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         |    ${graft.functions.centsSql("value")} AS m
         |  FROM events WHERE event_type = 'click'
         |),
         |r AS (
         |  SELECT f.id, f.k, f.t, f.m, d.vs AS seg
         |  FROM f ASOF LEFT JOIN d ON f.k = d.k AND f.t >= d.vf
         |)
         |SELECT r.id AS click_id, coalesce(r.seg, '(none)') AS seg,
         |  w.vs AS band, w.iid AS window_id, r.m AS value_cents
         |FROM r JOIN w ON r.k = w.k AND r.t >= w.s AND r.t < w.e
         |ORDER BY click_id, window_id""".stripMargin,
    "x131_sql_catalog" ->
      s"""WITH r AS (
         |  SELECT c_mktsegment AS g,
         |    CAST(sum(${graft.functions.centsSql("o_totalprice")}) AS BIGINT) AS total,
         |    count(*) AS pairs
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE o_orderkey % 10 = 0
         |  GROUP BY 1
         |),
         |c AS (
         |  SELECT c_mktsegment AS g, count(*) AS n_customers
         |  FROM customer GROUP BY 1
         |)
         |SELECT r.g AS segment, r.total AS revenue_cents, r.pairs AS orders,
         |  c.n_customers
         |FROM r JOIN c ON r.g = c.g
         |ORDER BY segment""".stripMargin,
    "x132_sql_pointread" ->
      s"""SELECT c_mktsegment AS segment,
         |  CAST(sum(${graft.functions.centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents,
         |  count(*) AS orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING' AND o_orderkey % 10 = 0
         |GROUP BY 1 ORDER BY segment""".stripMargin,
    "x134_sql_asof" ->
      s"""WITH b0 AS (
         |  SELECT c_mktsegment AS g,
         |    CAST(sum(${graft.functions.centsSql("o_totalprice")}) AS BIGINT) AS total,
         |    count(*) AS n
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE o_orderkey % 10 = 0 GROUP BY 1
         |),
         |live AS (
         |  SELECT c_mktsegment AS g,
         |    CAST(sum(${graft.functions.centsSql("o_totalprice")}) AS BIGINT) AS total,
         |    count(*) AS n
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE o_orderkey % 10 IN (0, 5) GROUP BY 1
         |)
         |SELECT b0.g AS segment, b0.total AS rev_b0, live.total AS rev_live,
         |  b0.n AS orders_b0, live.n AS orders_live
         |FROM b0 JOIN live ON b0.g = live.g
         |ORDER BY segment""".stripMargin,
    "x135_sql_asof_point" ->
      s"""SELECT c_mktsegment AS segment,
         |  CAST(sum(${graft.functions.centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents,
         |  count(*) AS orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING' AND o_orderkey % 10 = 0
         |GROUP BY 1 ORDER BY segment""".stripMargin,
    "x130_mixed_attribution" ->
      s"""WITH d AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
         |    's' || CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) % 5 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'view'
         |),
         |w AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         |    epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e,
         |    'b' || CAST(${graft.functions.centsSql("value")} % 5 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'purchase'
         |),
         |f AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         |    ${graft.functions.centsSql("value")} AS m
         |  FROM events WHERE event_type = 'click'
         |),
         |r AS (
         |  SELECT f.k, f.t, f.m, d.vs AS seg
         |  FROM f ASOF LEFT JOIN d ON f.k = d.k AND f.t >= d.vf
         |)
         |SELECT coalesce(r.seg, '(none)') AS seg, w.vs AS band,
         |  CAST(sum(r.m) AS BIGINT) AS click_cents, count(*) AS matches
         |FROM r JOIN w ON r.k = w.k AND w.s <= r.t AND r.t < w.e
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x127_enriched_facts" ->
      s"""WITH d1 AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
         |    's' || CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) % 5 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'view'
         |),
         |d2 AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
         |    't' || CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) % 3 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'click'
         |),
         |f AS (
         |  SELECT event_id AS id, user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         |    ${graft.functions.centsSql("value")} AS m
         |  FROM events WHERE event_type = 'purchase'
         |),
         |r1 AS (
         |  SELECT f.id, f.k, f.t, f.m, d1.vs AS seg
         |  FROM f ASOF LEFT JOIN d1 ON f.k = d1.k AND f.t >= d1.vf
         |)
         |SELECT r1.id, coalesce(r1.seg, '(none)') AS seg,
         |  coalesce(d2.vs, '(none)') AS tier, r1.m AS value_cents
         |FROM r1 ASOF LEFT JOIN d2 ON r1.k = d2.k AND r1.t >= d2.vf
         |ORDER BY id""".stripMargin,
    "x126_asof_star" ->
      s"""WITH d1 AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
         |    's' || CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) % 5 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'view'
         |),
         |d2 AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
         |    't' || CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) % 3 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'click'
         |),
         |f AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         |    ${graft.functions.centsSql("value")} AS m
         |  FROM events WHERE event_type = 'purchase'
         |),
         |r1 AS (
         |  SELECT f.k, f.t, f.m, d1.vs AS seg
         |  FROM f ASOF LEFT JOIN d1 ON f.k = d1.k AND f.t >= d1.vf
         |)
         |SELECT coalesce(r1.seg, '(none)') AS seg,
         |  coalesce(d2.vs, '(none)') AS tier,
         |  CAST(sum(r1.m) AS BIGINT) AS revenue_cents, count(*) AS purchases
         |FROM r1 ASOF LEFT JOIN d2 ON r1.k = d2.k AND r1.t >= d2.vf
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x125_asof_measures" ->
      s"""WITH d AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
         |    's' || CAST(CAST(json_extract_string(props, '$$.k') AS INTEGER) % 5 AS VARCHAR) AS vs
         |  FROM events WHERE event_type = 'view'
         |),
         |f AS (
         |  SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         |    ${graft.functions.centsSql("value")} AS m,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS m2
         |  FROM events WHERE event_type = 'purchase'
         |)
         |SELECT coalesce(d.vs, '(none)') AS seg,
         |  CAST(sum(f.m) AS BIGINT) AS revenue_cents,
         |  CAST(sum(f.m2) AS BIGINT) AS k_sum, count(*) AS purchases
         |FROM f ASOF LEFT JOIN d ON f.k = d.k AND f.t >= d.vf
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x124_segment_measures" ->
      s"""SELECT c_mktsegment,
         |  CAST(sum(${graft.functions.centsSql("l_extendedprice")}) AS BIGINT) AS revenue_cents,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
         |  count(*) AS n_rows
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "mm_media_features" -> duckMmFeatures,
    "mm2_codec_roundtrip" -> duckMm2Codec,
    "mm3_resize_frames" -> duckMm3Resize,
    // mm4 (r15): the oracle replays the GENERATING pixel formula only —
    // the Scala side must push those pixels through real zlib/filtered
    // PNG bytes and back for the means to agree
    "mm4_png_roundtrip" ->
      """WITH img AS (
        |  SELECT doc_id, 8 + (doc_id % 4)*2 AS w, 4 + (doc_id % 3) AS h
        |  FROM documents
        |),
        |ib AS (SELECT doc_id, w, h, unnest(range(0, w*h*3)) AS k FROM img),
        |ia AS (SELECT doc_id, w, h, k % 3 AS c, (doc_id*31 + k*7) % 256 AS v FROM ib)
        |SELECT doc_id, CAST(max(w) AS BIGINT) AS w, CAST(max(h) AS BIGINT) AS h,
        |  CAST((sum(CASE WHEN c = 0 THEN v ELSE 0 END) * 1000000) // (max(w)*max(h)) AS BIGINT) AS mean_r_e6,
        |  CAST((sum(CASE WHEN c = 1 THEN v ELSE 0 END) * 1000000) // (max(w)*max(h)) AS BIGINT) AS mean_g_e6,
        |  CAST((sum(CASE WHEN c = 2 THEN v ELSE 0 END) * 1000000) // (max(w)*max(h)) AS BIGINT) AS mean_b_e6
        |FROM ia GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // mm5 (r16): JPEG is lossy, so the oracle replays the CLOSED-FORM
    // formula means (Σ over a linear ramp) and expects the in-plan
    // error-band flags — which compare the real decode against the same
    // formula on the Spark side — to all be 1 (the x8/x10 device)
    "mm5_jpeg_roundtrip" ->
      """WITH img AS (
        |  SELECT doc_id, 16 + (doc_id % 3)*8 AS w, 16 + (doc_id % 2)*8 AS h
        |  FROM documents
        |)
        |SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
        |  CAST((w*h*(16 + doc_id % 16) + 4*h*(w*(w-1)//2) + 2*w*(h*(h-1)//2)) * 1000000 // (w*h) AS BIGINT) AS mean_r_e6,
        |  CAST((w*h*(32 + doc_id % 8) + 2*h*(w*(w-1)//2) + 4*w*(h*(h-1)//2)) * 1000000 // (w*h) AS BIGINT) AS mean_g_e6,
        |  CAST((w*h*(64 + doc_id % 32) + 1*h*(w*(w-1)//2) + 3*w*(h*(h-1)//2)) * 1000000 // (w*h) AS BIGINT) AS mean_b_e6,
        |  CAST(1 AS BIGINT) AS band_r, CAST(1 AS BIGINT) AS band_g,
        |  CAST(1 AS BIGINT) AS band_b
        |FROM img ORDER BY doc_id""".stripMargin,
    "x7_ann_lsh" -> duckAnnLsh,
    "x13_shard_stats" -> duckShardStats,
    "x14_embed_clusters" ->
      """WITH RECURSIVE e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |verified AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE floor((list_cosine_similarity(a.v, b.v)) * 1000000.0 + 0.5) / 1000000.0 >= 0.4
        |),
        |und AS (SELECT id1 AS a, id2 AS b FROM verified UNION ALL SELECT id2, id1 FROM verified),
        |reach AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
        |)
        |SELECT n.id, least(n.id, min(r.b)) AS cluster
        |FROM (SELECT DISTINCT a AS id FROM und) n LEFT JOIN reach r ON r.a = n.id
        |GROUP BY n.id ORDER BY n.id""".stripMargin,
    "x1_exact_dedup" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS copies
        |FROM documents GROUP BY text ORDER BY text_md5""".stripMargin,
    "x2_minhash_lsh" ->
      s"""WITH g AS (
         |  SELECT doc_id, $duckGrams AS grams
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         |  WHERE len(w) >= 3
         |),
         |sig AS (
         |  SELECT doc_id, grams,
         |    [list_min([substr(md5(x), 1 + 4*k, 4) for x in grams]) for k in range(0, 8)] AS sig
         |  FROM g
         |),
         |band AS (
         |  SELECT doc_id, i AS band_idx, sig[2*i+1]||sig[2*i+2] AS band_key
         |  FROM sig, (SELECT unnest([0,1,2,3]) AS i)
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM band a JOIN band b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |),
         |verified AS (
         |  SELECT id1, id2,
         |    floor((len(list_intersect(g1.grams, g2.grams)) * 1.0 /
         |          (len(g1.grams) + len(g2.grams) - len(list_intersect(g1.grams, g2.grams)))) * 10000.0 + 0.5) / 10000.0 AS jaccard
         |  FROM cand JOIN g g1 ON g1.doc_id = id1 JOIN g g2 ON g2.doc_id = id2
         |)
         |SELECT * FROM verified WHERE jaccard >= 0.8 ORDER BY id1, id2""".stripMargin,
    "x11_dedup_clusters" ->
      s"""$duckClusterCtes
         |SELECT id, cluster FROM clust ORDER BY id""".stripMargin,
    "x25_cluster_reps" ->
      s"""$duckClusterCtes,
         |q AS (SELECT doc_id, $duckQs AS score FROM documents)
         |SELECT cluster, n_members, id AS rep_id, score AS rep_score FROM (
         |  SELECT c.cluster, c.id, coalesce(q.score, -1.0) AS score,
         |    count(*) OVER (PARTITION BY c.cluster) AS n_members,
         |    row_number() OVER (PARTITION BY c.cluster
         |                       ORDER BY coalesce(q.score, -1.0) DESC, c.id ASC) AS rn
         |  FROM clust c JOIN q ON q.doc_id = c.id) t
         |WHERE rn = 1 ORDER BY cluster""".stripMargin,
    "x4_ngram_jaccard" ->
      s"""WITH g AS (
         |  SELECT doc_id, lang, source, n_chars // 100 AS bucket, $duckGrams AS grams
         |  FROM (SELECT *, string_split(text, ' ') AS w FROM documents)
         |  WHERE len(w) >= 3
         |)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  floor((len(list_intersect(a.grams, b.grams)) * 1.0 /
         |        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))) * 10000.0 + 0.5) / 10000.0 AS jaccard
         |FROM g a JOIN g b
         |  ON a.lang = b.lang AND a.source = b.source AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE floor((len(list_intersect(a.grams, b.grams)) * 1.0 /
         |        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))) * 10000.0 + 0.5) / 10000.0 >= 0.01
         |ORDER BY id1, id2""".stripMargin,
    "x61_ngram_containment" ->
      s"""WITH g AS (
         |  SELECT doc_id, lang, source, $duckGrams AS grams
         |  FROM (SELECT *, string_split(text, ' ') AS w FROM documents)
         |  WHERE len(w) >= 3
         |)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  floor((len(list_intersect(a.grams, b.grams)) * 1.0 / len(a.grams)) * 10000.0 + 0.5) / 10000.0 AS containment
         |FROM g a JOIN g b
         |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
         |WHERE floor((len(list_intersect(a.grams, b.grams)) * 1.0 / len(a.grams)) * 10000.0 + 0.5) / 10000.0 >= 0.5
         |ORDER BY id1, id2""".stripMargin,
    "x5_embed_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10)
        |SELECT qid, vec_id AS nid,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY floor((list_cosine_similarity(qv, v)) * 1000000.0 + 0.5) / 1000000.0 DESC, vec_id) AS rn,
        |  floor((list_cosine_similarity(qv, v)) * 1000000.0 + 0.5) / 1000000.0 AS cos
        |FROM q JOIN e ON vec_id <> qid
        |QUALIFY rn <= 5 ORDER BY qid, rn""".stripMargin,
"x9_topk_agg" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10)
        |SELECT qid, vec_id AS nid,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY floor((list_cosine_similarity(qv, v)) * 1000000.0 + 0.5) / 1000000.0 DESC, vec_id) AS rn,
        |  floor((list_cosine_similarity(qv, v)) * 1000000.0 + 0.5) / 1000000.0 AS cos
        |FROM q JOIN e ON vec_id <> qid
        |QUALIFY rn <= 5 ORDER BY qid, rn""".stripMargin,
    "x6_embed_neardup" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id1, b.vec_id AS id2, floor((list_cosine_similarity(a.v, b.v)) * 1000000.0 + 0.5) / 1000000.0 AS cos
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE floor((list_cosine_similarity(a.v, b.v)) * 1000000.0 + 0.5) / 1000000.0 >= 0.4
        |ORDER BY id1, id2""".stripMargin,
    "ta_lang_stats" ->
      """SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "ta_token_stats" ->
      """SELECT lang, count(*) AS total_tokens, count(DISTINCT token) AS distinct_tokens
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "ta_quality" ->
      s"""SELECT doc_id,
        | len(string_split(text,' ')) AS n_tokens,
        | len(list_distinct(string_split(text,' '))) AS n_uniq,
        | floor((len(list_distinct(string_split(text,' '))) / len(string_split(text,' '))) * 10000.0 + 0.5) / 10000.0 AS ttr,
        | floor(((length(text) - (len(string_split(text,' ')) - 1)) / len(string_split(text,' '))) * 10000.0 + 0.5) / 10000.0 AS avg_token_len,
        | floor((len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','is','to','in'))) / len(string_split(text,' '))) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
        | $duckQs AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x17_curate" ->
      s"""WITH q AS (SELECT doc_id, text, n_chars, $duckQs AS qs FROM documents),
        |k AS (SELECT doc_id, text, n_chars FROM q WHERE qs >= 0.5),
        |dd AS (
        |  SELECT doc_id, n_chars FROM (
        |    SELECT doc_id, n_chars, min(doc_id) OVER (PARTITION BY text) AS keep FROM k
        |  ) WHERE doc_id = keep
        |),
        |m AS (SELECT doc_id, n_chars, ${duckShardMd5("doc_id")} AS m1 FROM dd),
        |hh AS (SELECT n_chars, ${duckNibbleFold("m1")} AS h1u FROM m),
        |sh AS (SELECT ${duckShardExpr("h1u", 8)} AS shard, n_chars FROM hh)
        |SELECT shard, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,
    "ta_langid" ->
      """SELECT doc_id,
        | CASE
        |  WHEN de > 0 AND de >= en AND de >= es AND de >= fr THEN 'de'
        |  WHEN en > 0 AND en >= es AND en >= fr THEN 'en'
        |  WHEN es > 0 AND es >= fr THEN 'es'
        |  WHEN fr > 0 THEN 'fr'
        |  ELSE 'unknown' END AS lang_pred
        |FROM (
        | SELECT doc_id,
        |  len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ist'))) AS de,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','is'))) AS en,
        |  len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','que','y'))) AS es,
        |  len(list_filter(string_split(text,' '), t -> t IN ('le','la','les','et','est'))) AS fr
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "ta_bpe_tokens" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS ws_tokens,
        | len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^ a-zA-Z0-9]+')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_fingerprint" ->
      s"""SELECT doc_id, list_min([md5(x) for x in $duckGrams]) AS fingerprint
         |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         |ORDER BY doc_id""".stripMargin
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_exact_dedup"   -> x1ExactDedup,
    "x2_minhash_lsh"   -> x2MinhashLsh,
    "x3_simhash"       -> x3Simhash, // oracle: md5-derived token hash
    "x4_ngram_jaccard" -> x4NgramJaccard,
    "x11_dedup_clusters" -> x11DedupClusters,
    "x25_cluster_reps" -> x25ClusterReps, // oracle: shared cluster CTE + window argmax
    "x5_embed_topk"    -> x5EmbedTopk,
    "x9_topk_agg"      -> x9TopkAgg,
    "x6_embed_neardup" -> x6EmbedNeardup,
    "x7_ann_lsh"       -> x7AnnLsh, // oracle: plane matrix embedded as literals
    "x12_ann_ivf"      -> x12AnnIvf, // oracle: pinned codebook as literals
    "x33_ann_ivfpq"    -> x33AnnIvfPq, // oracle: pinned cell + PQ codebooks as literals
    "x34_semantic_prune" -> x34SemanticPrune, // oracle: pinned cells + exact align dominance
    "x13_shard_stats"  -> x13ShardStats,
    "x14_embed_clusters" -> x14EmbedClusters,
    "x15_ivf_cells"    -> x15IvfCells, // oracle: pinned codebook as literals
    "x16_kmv_distinct" -> x16KmvDistinct, // oracle: md5-KMV replays exactly
    "x17_curate"       -> x17Curate, // oracle: whole curation chain replayed
    "x18_split_stats"  -> x18SplitStats, // oracle: md5-threshold split replays
    "x19_contamination" -> x19Contamination, // oracle: split + hash-overlap
    "x35_bloom_contamination" -> x35BloomContamination, // oracle: double-hashed bit positions
    "x36_interval_join"  -> x36IntervalJoin, // oracle: direct range predicate
    "x37_fuzzy_match"    -> x37FuzzyMatch, // oracle: levenshtein is the same DP
    "x38_heavy_hitters"  -> x38HeavyHitters, // oracle: vocab < k ⇒ sketch is exact
    "x39_quality_classifier" -> x39QualityClassifier, // oracle: rational sigmoid, no libm
    "x40_mixture_sample" -> x40MixtureSample, // oracle: weights→budget→rates→md5 membership
    "x41_cms"            -> x41Cms, // oracle: additive counters replay exactly
    "x42_reservoir"      -> x42Reservoir, // oracle: md5-uniform rank per group
    "x43_ts_match"       -> x43TsMatch, // oracle: exact int64 window distances
    "x44_zorder_key"     -> x44ZOrderKey, // oracle: bit interleave replays
    "x20_profile"      -> x20Profile, // oracle: UNION ALL per column
    "x21_pack_stats"   -> x21PackStats, // oracle: prefix-sum bin rule replays
    "x22_repetition"   -> x22Repetition, // oracle: array metrics + word-count max
    "x23_ngram_contamination" -> x23NgramContamination, // oracle: split + 8-gram join
    "x24_strat_sample" -> x24StratSample, // oracle: uniform chain + per-lang CASE
    "x26_pii" -> x26Pii, // oracle: shared regex strings, synthetic-append replay
    "x27_tfidf_topk" -> x27TfidfTopk, // oracle: log-free rational idf replays
    "x28_cdc_chunks" -> x28CdcChunks, // oracle: md5-nibble cut rule replays
    "x30_anomaly"      -> x30Anomaly, // oracle: exact-int spike decisions
    "x31_mixture_weights" -> x31MixtureWeights, // oracle: sqrt + int64 ppm
    "x32_inverted_index" -> x32InvertedIndex, // oracle: xor posting-set fingerprint
    "x45_bm25_topk"    -> x45Bm25TopK, // oracle: exact-rational BM25, e6 int sums
    "x46_image_neardup" -> x46ImageNearDup, // oracle: formula-replayed aHash pairs
    "x47_zorder3"      -> x47ZOrder3, // oracle: 3-dim bit interleave replays
    "x48_ann_ivfadc"   -> x48AnnIvfAdc, // oracle: residual PQ + cell-dot ADC replays
    "x49_audio_neardup" -> x49AudioNearDup, // oracle: formula-replayed energy hash pairs
    "x50_phrase_search" -> x50PhraseSearch, // oracle: positional-join phrase counts
    "x51_hist_quantiles" -> x51HistQuantiles, // oracle: exact cents-grid quantiles
    "x52_token_pagerank" -> x52TokenPagerank, // oracle: 5 unrolled exact-int iterations
    "x53_kmeans_fit"   -> x53KmeansFit, // oracle: unrolled exact-int Lloyd's stages
    "x54_window_funnel" -> x54WindowFunnel, // oracle: greedy per-anchor chain replays
    "x55_retention"    -> x55Retention, // oracle: integer-µs cohort windows
    "x56_sequence_match" -> x56SequenceMatch, // oracle: feasible-set stage chain
    "x57_bitmap_retention" -> x57BitmapRetention, // oracle: identical 63-bit words
    "x58_pq_train"     -> x58PqTrain, // oracle: unrolled per-subspace Lloyd's
    "x59_summap"       -> x59SumMap, // oracle: exploded keyed cents sums
    "x60_bigram_surprisal" -> x60BigramSurprisal, // oracle: exact bin-length log2
    "x61_ngram_containment" -> x61NgramContainment, // oracle: directed gram overlap
    "x62_sequence_count" -> x62SequenceCount, // oracle: bracket-identity windows
    "x63_kmv_set_algebra" -> x63KmvSetAlgebra, // oracle: md5-KMV estimator replays
    "x64_decayed_sum"  -> x64DecayedSum, // oracle: power-of-2 decay replays
    "x65_pivot_daily"  -> x65PivotDaily, // oracle: explicit conditional counts
    "x66_novelty"      -> x66Novelty, // oracle: first-occurrence ppm replays
    "x67_interval_coverage" -> x67IntervalCoverage, // oracle: gaps-and-islands replays
    "x68_corr_moments" -> x68CorrMoments, // oracle: additive moments + fixed-IEEE corr
    "x69_conversion_latency" -> x69ConversionLatency, // oracle: stage-chain min spans
    "x70_argmax"       -> x70ArgMax, // oracle: total-order max_by replays
    "x71_uniq_up_to"   -> x71UniqUpTo, // oracle: LEAST-capped exact distinct
    "x72_max_intersections" -> x72MaxIntersections, // oracle: sweep-line replays
    "x73_delta_sum"    -> x73DeltaSum, // oracle: clamped lag steps replay
    "x74_moment_stats" -> x74MomentStats, // oracle: fixed-IEEE moment reads
    "x75_weighted_quantiles" -> x75WeightedQuantiles, // oracle: int64 rank targets
    "x76_linreg"       -> x76LinReg, // oracle: chained fixed-IEEE slope/intercept
    "x77_mann_whitney" -> x77MannWhitney, // oracle: doubled-rank U identities
    "x78_group_concat" -> x78GroupConcat, // oracle: distinct, numeric-sorted join
    "x79_spearman"     -> x79Spearman, // oracle: doubled ranks + x68 corr read
    "x80_mad"          -> x80Mad, // oracle: two ceil-rank median selections
    "x81_next_node"    -> x81NextNode, // oracle: total-order lead replays
    "x82_bounding_ratio" -> x82BoundingRatio, // oracle: extrema + guarded ratio
    "x83_ttest"        -> x83TTest, // oracle: chained fixed-IEEE t reads
    "x84_funnel_strict" -> x84FunnelStrict, // oracle: lead-pair nested CASE
    "x85_bit_ops"      -> x85BitOps, // oracle: exact int64 bitwise folds
    "x86_roc_auc"      -> x86RocAuc, // oracle: doubled-rank U -> AUC read
    "x87_lttb"         -> x87Lttb, // oracle: 4 unrolled integer-area stages
    "x88_ks_test"      -> x88KsTest, // oracle: exact rational D + cross-products
    "x89_tukey"        -> x89Tukey, // oracle: ceil-rank quartiles, doubled fences
    "x90_proportion_z" -> x90ProportionZ, // oracle: pooled guarded z read
    "x91_sparkbar"     -> x91Sparkbar, // oracle: integer heights, ordered glyphs
    "x92_calibration"  -> x92Calibration, // oracle: x39 score CTE + ppm share
    "x93_period_detect" -> x93PeriodDetect, // oracle: integer autocorrelation
    "x94_change_point" -> x94ChangePoint, // oracle: integer CUSUM argmax
    "x95_trailing_actives" -> x95TrailingActives, // oracle: 7-day fan-out distinct
    "x96_audience_overlap" -> x96AudienceOverlap, // oracle: exact ppm Jaccard
    "x97_funnel_dedup" -> x97FunnelDedup, // oracle: scan-semantics NOT-EXISTS frames
    "x98_retention_triangle" -> x98RetentionTriangle, // oracle: integer-day matrix
    "x99_rfm_segments" -> x99RfmSegments, // oracle: ceil-rank quartile scores
    "x100_latency_histogram" -> x100LatencyHistogram, // oracle: x69 read bucketed
    "x101_blocklist_match" -> x101BlocklistMatch, // oracle: boundary-safe LIKE join
    "x102_domain_entropy" -> x102DomainEntropy, // oracle: floor-log2 bin-length grid
    "x103_contingency" -> x103Contingency, // oracle: int64 chi2 cell ingredients
    "x104_cramers_v" -> x104CramersV, // oracle: clamped chi2 + floor-sqrt V
    "x105_sgd_linreg" -> x105SgdLinreg, // oracle: unrolled exact-int GD stages
    "x106_theils_u" -> x106TheilsU, // oracle: floor-log2 entropy ratio
    "x107_decayed_avg" -> x107DecayedAvg, // oracle: like-scaled weight division
    "x108_group_intersect" -> x108GroupIntersect, // oracle: counting identity + sorted concat
    "x109_subnet_rollup" -> x109SubnetRollup, // oracle: numeric mask arithmetic
    "x110_topk_weighted" -> x110TopKWeighted, // oracle: vocab < k ⇒ sketch exact
    "x111_minmax_map" -> x111MinMaxMap, // oracle: per-key extremes exploded
    "x112_corr_matrix" -> x112CorrMatrix, // oracle: one wide row, pair reads
    "x113_bitmap_churn" -> x113BitmapChurn, // oracle: full-outer day-shift sets
    "x114_transition_matrix" -> x114TransitionMatrix, // oracle: total-order lead pass
    "x115_gap_fill" -> x115GapFill, // oracle: grid + IGNORE NULLS carry
    "x116_duplicate_spans" -> x116DuplicateSpans, // oracle: window-hash + island replay
    "x117_chain_revenue" -> x117ChainRevenue, // oracle: 3-way join + exact cents
    "x118_star_revenue" -> x118StarRevenue, // oracle: Q5 star + cross-branch equality
    "x119_segment_order_stats" -> x119SegmentOrderStats, // oracle: multiplicity-relation order stats
    "x120_left_revenue" -> x120LeftRevenue, // oracle: chained LEFT join + null group
    "x121_nation_distinct" -> x121NationDistinct, // oracle: exact COUNT(DISTINCT) over the join
    "x122_fanout_revenue" -> x122FanoutRevenue, // oracle: m:n bridge fan-out join
    "x123_asof_revenue" -> x123AsofRevenue, // oracle: ASOF LEFT join-aggregate (DuckDB ASOF JOIN)
    "x124_segment_measures" -> x124SegmentMeasures, // oracle: multi-measure star (R161)
    "x125_asof_measures" -> x125AsofMeasures, // oracle: multi-measure ASOF join-aggregate
    "x126_asof_star" -> x126AsofStar, // oracle: chained (multi-branch) ASOF join-aggregate
    "x127_enriched_facts" -> x127EnrichedFacts, // oracle: per-fact denormalized as-of resolution
    "x128_attributed_clicks" -> x128AttributedClicks, // oracle: M:N interval-overlap join-aggregate
    "x129_user_sessions" -> x129UserSessions, // oracle: per-user rollup of the session-row set
    "x130_mixed_attribution" -> x130MixedAttribution, // oracle: ASOF LEFT + range join in one query (R167)
    "x131_sql_catalog" -> x131SqlCatalog, // oracle: ad-hoc SQL join of two registered maintained views (R172)
    "x132_sql_pointread" -> x132SqlPointread, // oracle: bucket-pruned SQL TVF point read (R172)
    "x133_mixed_enriched" -> x133MixedEnriched, // oracle: per-(click, window) un-aggregated mixed join (R175)
    "x134_sql_asof" -> x134SqlAsof, // oracle: SQL time-travel (as-of batch 0 vs live) over a 2-batch maintained view (R172)
    "x135_sql_asof_point" -> x135SqlAsofPoint, // oracle: bucket-pruned SQL as-of TVF point read (R172)
    "x136_sql_bm25" -> x136SqlBm25, // oracle: per-query BM25 top-k as a SQL table function (r14)
    "x137_sql_phrase" -> x137SqlPhrase, // oracle: per-query phrase search as a SQL table function (r14)
    "x138_sql_topk" -> x138SqlTopK, // oracle: maintained exact top-k point read as a SQL table function (r14)
    "x139_sql_sessions" -> x139SqlSessions, // oracle: maintained sessions point read as a SQL table function (r14)
    "x140_sql_temporal_asof" -> x140SqlTemporalAsof, // oracle: temporal-star as-of TVF vs DuckDB native ASOF JOIN (r14)
    "x8_approx_users"  -> x8ApproxUsers, // oracled via exact count + 3·rsd band flag (r15)
    "x10_approx_pct"   -> x10ApproxPct, // oracled via exact count + rank-error band flags (r15)
    "ta_lang_stats"    -> taLangStats,
    "ta_token_stats"   -> taTokenStats,
    "ta_quality"       -> taQuality,
    "ta_langid"        -> taLangid,
    "ta_fingerprint"   -> taFingerprint,
    "ta_bpe_tokens"    -> taBpeTokens,
    "mm_media_features" -> mmMediaFeatures, // oracle over the declared stub decode
    "mm2_codec_roundtrip" -> mm2CodecRoundtrip, // oracle: generating formula vs real decode
    "mm3_resize_frames" -> mm3ResizeFrames, // oracle: formula vs real resize + frame walk
    "mm4_png_roundtrip" -> mm4PngRoundtrip, // oracle: formula vs real PNG encode/decode (all 5 filters)
    "mm5_jpeg_roundtrip" -> mm5JpegRoundtrip // oracle: formula means + error-band flags vs real lossy JPEG
  )
}
