package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosineSim, dotProduct, l2Norm, pround6, vecScale}

/** Approximate-nearest-neighbor / similarity search over a dense embedding
  * column (SURVEY.md §2.11 X3). Two paths:
  *
  *  - [[bruteTopK]] — exact: broadcast the (small) query set, score every
  *    (query, candidate) pair with codegen'd higher-order-function dot
  *    products, keep top-k per query via a rank window. At 100 TB the
  *    candidate side streams through map tasks once; per-partition
  *    `TakeOrdered`-style pruning happens in the window's partial sort.
  *  - [[lshTopK]] — scale path: random-hyperplane signatures (8-bit
  *    default) bucket the corpus; each query scores its own bucket plus
  *    every Hamming-1 neighbor (multi-probe). The corpus never shuffles —
  *    the exploded query probe set broadcasts. Recall < 1 by construction;
  *    raise `numBits` (smaller buckets) or probe radius to trade recall
  *    vs. cost; a spec pins recall against [[bruteTopK]].
  *
  * Embeddings are cast to double before any arithmetic so both engines sum
  * with the same precision (float accumulation order would diverge).
  */
object Similarity {

  /** Cast a float-array column to double elements. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Drop degenerate similarity scores (null from zero-norm/dim-mismatch
    * via try_divide, NaN from NaN elements): by contract such vectors never
    * appear as neighbors, identically in the window paths and the native
    * aggregate (which skips null/NaN on insert). Without this the window
    * would rank NaN FIRST (doubles sort NaN highest) while the aggregate
    * excluded it — two "same semantics" paths diverging on garbage input. */
  private def realScore(c: Column): Column = c.isNotNull && !isnan(c)

  /** Shared prep of every unit-sphere path (live-fit IVF, pinned IVF,
    * cell stats): cleaned corpus minus degenerate vectors (a NaN element
    * summed into a centroid poisons the whole cell; zero-norm cannot be
    * normalized), plus the unit vector `nv` via the native [[vecScale]]
    * (one l2Norm per row — the `transform` HOF form re-evaluated it per
    * element). */
  private def normalizedCorpus(embeddings: DataFrame, dim: Int): DataFrame =
    cleanCorpus(embeddings, dim)
      .filter(!exists(col("v"), x => isnan(x)) && l2Norm(col("v")) > 0d)
      .withColumn("nv", vecScale(col("v"), l2Norm(col("v"))))

  /** Shared corpus prep of the bucketed ANN paths: drop null embeddings,
    * fail fast on a dim mismatch (a mismatched dot product is null, which
    * would collapse every vector into one bucket and silently turn the
    * index into a quadratic scan), cast to double. */
  private def cleanCorpus(embeddings: DataFrame, dim: Int): DataFrame =
    embeddings
      .filter(col("embedding").isNotNull) // null vectors are dropped, not an error
      .filter(assert_true(size(col("embedding")) === dim,
        lit(s"embedding dimension must be $dim")).isNull)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** Shared ranking tail: scored (qid, vec_id, cos) → per-query top-k with
    * the deterministic tie-break every path and oracle uses. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("rn").cast("long").as("rn"), col("cos"))

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries (qid, qv) — small, broadcast
    * @param candidates (vec_id, v) — the corpus */
  def bruteTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame =
    rankTopK(
      candidates
        .join(broadcast(queries), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), pround6(cosineSim(col("qv"), col("v"))).as("cos"))
        .filter(realScore(col("cos"))),
      k)

  /** Deterministic 16×dim hyperplane matrix (fixed seed). */
  def hyperplanes(numBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id of a double-vector column — the
    * native [[graft.expressions.LshBucketExpr]] (identical bit order to
    * the former `aggregate`-HOF fold; x7's oracle replays unchanged). */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    graft.functions.lshBucket(v, planes)

  /** LSH-bucketed approximate top-k with MULTI-PROBE: each query scores
    * candidates in its own hyperplane bucket plus every bucket at Hamming
    * distance 1 (flip one signature bit) — the standard recall lever when
    * a single bucket holds only p^bits of a query's true neighbors. With
    * 8-bit signatures a query touches 9/256 of the corpus instead of
    * 1/256, lifting recall ~9× at ~3.5% of brute-force cost; neighbors
    * with higher cosine (the actual ANN regime) land in the probed set
    * with much higher probability still.
    *
    * The bucketed corpus is persisted (tracked by [[Caching]]): `q`
    * derives from `e`, so without it the signature pipeline (numBits dot
    * products per row) runs once per join side. At scale the corpus side
    * never shuffles — probes broadcast. */
  def lshTopK(embeddings: DataFrame, queryPred: Column, k: Int, numBits: Int = 8,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numBits, dim)
    val e = Caching.persisted(cleanCorpus(embeddings, dim)
      .withColumn("bucket", lshBucket(col("v"), planes)))
    // query probe set: own bucket + one-bit flips (1 + numBits rows/query)
    val probeBuckets = array(
      col("bucket") +: (0 until numBits).map(b =>
        col("bucket").bitwiseXOR(lit(1 << b))): _*)
    val q = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(probeBuckets).as("bucket"))
    rankTopK(
      e.join(broadcast(q), Seq("bucket")).filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), pround6(cosineSim(col("qv"), col("v"))).as("cos"))
        .filter(realScore(col("cos")))
        .distinct(), // a candidate can collide with several probes of one query
      k)
  }

  /** Exact top-k via the native bounded-heap aggregate
    * ([[graft.expressions.TopKAggExpr]]) — same results as [[bruteTopK]],
    * different physical shape: partial k-element buffers fold map-side
    * (ObjectHashAggregate partial → final) and only k rows per
    * (query × partition) shuffle, instead of the window's full per-group
    * sort. The scale path for exact top-k.
    *
    * (Round 1 used a typed Dataset `Aggregator` here: `groupByKey` encoder
    * round-trips plus an immutable Seq rebuilt per row made it 45× slower
    * than the window it was meant to beat. The native aggregate stays in
    * the relational plan with a mutable primitive buffer.)
    *
    * Degenerate vectors (zero-norm / null embedding) yield null cosine and
    * are skipped by the aggregate, matching the window path where null
    * scores sort last and never enter the top k when real candidates
    * exist. */
  def bruteTopKAgg(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame =
    candidates
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id"),
        pround6(cosineSim(col("qv"), col("v"))).as("score"))
      .filter(realScore(col("score"))) // prune degenerates before the shuffle too
      .groupBy("qid")
      .agg(graft.functions.topK(col("id"), col("score"), k).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("qid"), col("s.id").as("nid"),
        (col("pos") + 1).cast("long").as("rn"), col("s.score").as("cos"))

  /** Nearest-cell id by (dist², cell-id) — the codegen'd
    * [[graft.expressions.NearestCellExpr]] kernel (centroids as plan
    * data), NOT a window: corpus assignment must stay a pure map pass (no
    * per-row shuffle) at 100 TB. First index achieving the minimum wins
    * and degenerate input yields −1, bit-identical to the literal
    * when-chain this replaces — every oracle CASE chain replays
    * unchanged, but expression size (and driver build cost) is now
    * constant in centroids × dims. */
  def nearestCell(nv: Column, centers: Seq[Seq[Double]]): Column =
    graft.functions.nearestCell(nv, centers)

  /** (qid, qv, qnv) queries → their `nprobe` nearest cells of a pinned
    * codebook, deterministic (dist², cell-id) order — one
    * [[graft.expressions.IvfProbesExpr]] kernel call per query row
    * exploded into probe rows (the former explode-all-cells + window
    * selection, same order including NaN-last and -0.0 == 0.0 ties).
    * Query side only. `keep` selects which query columns ride along. */
  private def probeCells(q: DataFrame, centers: Seq[Seq[Double]], nprobe: Int,
      keep: Seq[Column] = Seq(col("qid"), col("qv"))): DataFrame =
    q.select(keep :+
      explode(graft.functions.ivfProbes(col("qnv"), centers, nprobe)).as("bucket"): _*)

  /** Shared IVF probe+rescore tail: assigned corpus (vec_id, v, bucket) ×
    * probe set → exact cosine on ORIGINAL vectors (cells only select
    * candidates), per-query top-k. Each corpus row lives in exactly one
    * cell, so no distinct is needed (unlike multi-table LSH). */
  private def ivfSearch(assigned: DataFrame, probes: DataFrame, k: Int): DataFrame =
    rankTopK(
      assigned.join(broadcast(probes), Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), pround6(cosineSim(col("qv"), col("v"))).as("cos"))
        .filter(realScore(col("cos"))),
      k)

  /** IVF (inverted-file) approximate top-k — the cluster-pruning
    * alternative to [[lshTopK]]: a KMeans codebook (MLlib, fixed seed)
    * partitions the corpus into `numCentroids` cells; each query scores
    * only its `nprobe` nearest cells. Unlike data-oblivious hyperplanes,
    * the cells ADAPT to the corpus distribution — on clustered real-world
    * embeddings this prunes far better at equal recall; on isotropic
    * random data the two degrade similarly (no structure to exploit).
    *
    * Scale shape: training fits on a bounded SAMPLE (≤ `maxTrain` vectors
    * — a full-corpus 10-iteration fit at 100 TB is a non-starter; the
    * driver holds only the k×dim codebook); assignment is one
    * broadcast-codebook map pass over the full corpus; the corpus never
    * shuffles for queries — the exploded (query × probe) set broadcasts,
    * exactly like lshTopK. At 100 TB: cells ≈ √corpus, assignment stored
    * with the embedding (write-time partitioning), so a query touches
    * nprobe/numCentroids of the data.
    *
    * Live-fit variant → recall pinned against [[bruteTopK]] in the spec;
    * the oracle-checked path is [[ivfTopKPinned]], which replays a frozen
    * codebook exactly (production shape: train offline, query the frozen
    * index). */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, k: Int,
      numCentroids: Int = 16, nprobe: Int = 3, dim: Int = 64,
      seed: Long = 42L, maxTrain: Int = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // The search metric is COSINE, so the codebook must partition on the
    // unit sphere: L2-normalize before fit/assignment (there
    // |a−b|² = 2−2·cos, so euclidean cells == cosine cells). Clustering
    // raw vectors would split cells partly by magnitude and send a
    // query's highest-cosine neighbors into unprobed cells whenever norm
    // correlates with anything (e.g. doc length). Degenerate vectors
    // (zero-norm, NaN element) are dropped HERE: one NaN element summed
    // into a centroid would poison that center to all-NaN — whole-cell
    // recall loss from a single bad row.
    val fitInput = Caching.persisted(normalizedCorpus(embeddings, dim)
      .withColumn("fv", array_to_vector(col("nv"))))
    // bounded training set: sample iff the corpus exceeds maxTrain (the
    // count is one pass over the already-persisted fit input)
    val n = fitInput.count()
    val train =
      if (n > maxTrain) fitInput.sample(withReplacement = false, maxTrain.toDouble / n, seed)
      else fitInput
    val model = new KMeans()
      .setK(numCentroids).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("bucket")
      .fit(train)
    // index = (id, original v for exact scoring, nv for probe geometry,
    // cell). Materialize it, then drop the fit-side cache: keeping both
    // alive would hold ~3 copies of the corpus floats (v + nv + fv).
    val assigned = Caching.persisted(
      model.transform(fitInput).select(col("vec_id"), col("v"), col("nv"), col("bucket")))
    assigned.count()
    fitInput.unpersist(blocking = false)
    // query → its nprobe nearest cells on the sphere
    // (argmin |qnv-c|² ≡ argmin (|c|² − 2·qnv·c); |qnv|² is constant)
    val centers: Seq[Seq[Double]] = model.clusterCenters.map(_.toArray.toSeq).toSeq
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nv").as("qnv"))
    ivfSearch(assigned, probeCells(q, centers, nprobe), k)
  }

  /** IVF top-k over a PINNED codebook ([[IvfCodebook]] by default) — the
    * production IVF shape: training is an offline build step (see
    * `graft.tools.FitIvfCodebook`), queries only ever see the frozen
    * centroid matrix. Because the codebook is literal data, the ENTIRE
    * pipeline — unit-sphere cell assignment, nprobe probe choice, exact
    * rescoring — is deterministic IEEE arithmetic replayable in the DuckDB
    * oracle (x7's pinned-planes recipe), unlike [[ivfTopK]]'s live fit.
    *
    * Scale shape: assignment is a codegen'd when-chain map pass (no
    * shuffle, no driver iteration); the corpus never shuffles for queries
    * — probes broadcast; at 100 TB the cell id would be written with the
    * embedding at ingest (write-time partitioning) and this recomputation
    * disappears entirely. */
  def ivfTopKPinned(embeddings: DataFrame, queryPred: Column, k: Int,
      centers: Seq[Seq[Double]] = IvfCodebook.centers, nprobe: Int = 3,
      dim: Int = 64): DataFrame = {
    val assigned = Caching.persisted(normalizedCorpus(embeddings, dim)
      .withColumn("bucket", nearestCell(col("nv"), centers)))
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nv").as("qnv"))
    ivfSearch(assigned, probeCells(q, centers, nprobe), k)
  }

  /** IVF-PQ: product-quantized candidate scoring with exact rescoring —
    * the 100 TB memory-side refinement of [[ivfTopKPinned]] (VERDICT r5
    * task 2). At scale the full-precision vectors cannot ride the scan of
    * every query: a 64-dim double vector is 512 bytes/candidate, while its
    * PQ code — the per-subspace id of the nearest centroid in a pinned
    * 8×256×8 codebook ([[PqCodebook256]], production PQ geometry, carried
    * as plan DATA not literal expressions) — is 8 bytes, a 64× cut in the
    * bytes the candidate scan touches.
    *
    * Pipeline (all three stages pinned deterministic — the oracle reads
    * the SAME codebook rows from parquet, so the whole thing replays in
    * DuckDB):
    *  1. ENCODE (map pass, no shuffle): each corpus vector gets its IVF
    *     cell ([[nearestCell]]) and 8 PQ codes — per subspace `s`, the
    *     nearest of 256 pinned centroids to dims [8s, 8s+8) of the unit
    *     vector (direct encoding; production systems often encode the
    *     cell RESIDUAL for tighter error — same plumbing, skipped here so
    *     the oracle stays a per-(vector, subspace) argmin join).
    *  2. ADC scan: each query precomputes ONCE its 2048-entry lookup table
    *     `lut[s][j] = dot(qnv[8s..], subCenter(s)(j))`; a candidate's
    *     approximate cosine is then 8 array lookups + 7 adds — no vector
    *     arithmetic per pair, and the scan side carries only
    *     (vec_id, bucket, 8 codes). Top `refine·k` per query survive,
    *     ranked on the e6-rounded ADC score (deterministic tie-break).
    *  3. RESCORE: full vectors are fetched ONLY for the shortlist
    *     (broadcast join back on vec_id — O(queries·refine·k) rows),
    *     exact cosine, final top-k. Output matches [[ivfTopKPinned]]'s
    *     shape; recall vs [[bruteTopK]] is pinned in SimilaritySpec.
    *
    * Scale shape: the corpus never shuffles — probes and the shortlist
    * both broadcast; the ADC scan reads 8-byte codes instead of 512-byte
    * vectors (the entire point); encode is a pure codegen'd projection
    * that at 100 TB would run once at ingest and be stored with the row. */
  def ivfPqTopK(embeddings: DataFrame, queryPred: Column, k: Int,
      centers: Seq[Seq[Double]] = IvfCodebook.centers,
      sub: Seq[Seq[Seq[Double]]] = PqCodebook256.subCenters,
      nprobe: Int = 3, refine: Int = 4, dim: Int = 64): DataFrame =
    searchIvfPqEncoded(
      Caching.persisted(encodeIvfPq(embeddings, centers, sub, dim)),
      queryPred, k, centers, sub, nprobe, refine, dim)

  /** The ENCODE stage of [[ivfPqTopK]] as a standalone index build:
    * (vec_id, v, nv, bucket, code0..code_{m-1}) — the artifact a 100 TB
    * deployment computes once at ingest and stores with the row
    * ([[graft.streaming.IncrementalAnnIndex]] maintains it per
    * micro-batch). The codebook is plan DATA inside the codegen'd
    * [[graft.expressions.PqEncodeExpr]] (round 6 unrolled it into literal
    * distance expressions, which hit janino's 64 KB method ceiling
    * already at k=16 and cost ~0.76s of driver tree construction per
    * query; as a reference-object loop, expression size is constant in k,
    * so the production 256-centroid geometry fits with no ceiling). */
  def encodeIvfPq(embeddings: DataFrame,
      centers: Seq[Seq[Double]] = IvfCodebook.centers,
      sub: Seq[Seq[Seq[Double]]] = PqCodebook256.subCenters,
      dim: Int = 64): DataFrame = {
    val m = sub.size // subspaces
    normalizedCorpus(embeddings, dim)
      .withColumn("bucket", nearestCell(col("nv"), centers))
      .withColumn("codes", graft.functions.pqEncode(col("nv"), sub))
      .select(Seq(col("vec_id"), col("v"), col("nv"), col("bucket")) ++
        (0 until m).map(s => element_at(col("codes"), s + 1).as(s"code$s")): _*)
  }

  /** The SEARCH stages of [[ivfPqTopK]] over an already-encoded index
    * (probe → LUT/ADC shortlist → exact rescore). `assigned` must carry
    * the [[encodeIvfPq]] columns. */
  def searchIvfPqEncoded(assigned: DataFrame, queryPred: Column, k: Int,
      centers: Seq[Seq[Double]] = IvfCodebook.centers,
      sub: Seq[Seq[Seq[Double]]] = PqCodebook256.subCenters,
      nprobe: Int = 3, refine: Int = 4, dim: Int = 64): DataFrame = {
    val m = sub.size
    val ksub = sub.head.size
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nv").as("qnv"))
    // per-query LUT: m·ksub dots of length d, computed once per query row
    // inside one codegen'd kernel (PqLutExpr — codebook as plan data)
    val lut = graft.functions.pqLut(col("qnv"), sub)
    val probes = probeCells(q.withColumn("lut", lut), centers, nprobe,
      keep = Seq(col("qid"), col("lut")))
    // ADC: 8 lookups + 7 adds per candidate, fixed s=0..m-1 fold order
    // (the oracle sums the same CASE-selected terms in the same order)
    val adc = (0 until m).map(s =>
      element_at(col("lut"), lit(s * ksub + 1) + col(s"code$s"))).reduceLeft(_ + _)
    val shortlist = assigned
      .select(col("vec_id") +: col("bucket") +: (0 until m).map(s => col(s"code$s")): _*)
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), pround6(adc).as("adc"))
      .filter(realScore(col("adc")))
      .withColumn("arn", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc").desc, col("vec_id"))))
      .filter(col("arn") <= refine * k)
      .select("qid", "vec_id")
    rankTopK(
      assigned.select(col("vec_id"), col("v"))
        .join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid"))
        .select(col("qid"), col("vec_id"), pround6(cosineSim(col("qv"), col("v"))).as("cos"))
        .filter(realScore(col("cos"))),
      k)
  }

  /** IVFADC — the published production refinement of [[ivfPqTopK]]: PQ
    * codes encode the CELL RESIDUAL `nv − c(bucket)` instead of the raw
    * unit vector. Residuals concentrate around the origin within each
    * cell, so the same 8×256 codebook ([[PqCodebookResidual256]]) spends
    * its resolution on within-cell structure rather than the inter-cell
    * variance the IVF assignment already captured — tighter quantization
    * at identical index bytes (8 codes/vector).
    *
    * ADC changes accordingly: with x ≈ c_cell + r,
    * `dot(q, x) ≈ dot(q, c_cell) + Σₛ lut[s][codeₛ]` — the per-probe
    * `dot(q, c_cell)` term is computed once per (query, probed cell) on
    * the tiny probe set; the LUT is the same [[graft.functions.pqLut]]
    * kernel. Exact rescoring of the shortlist is unchanged, so recall
    * can only differ through shortlist quality. All stages remain
    * pinned-data deterministic → full DuckDB replay (x48). */
  def ivfAdcTopK(embeddings: DataFrame, queryPred: Column, k: Int,
      centers: Seq[Seq[Double]] = IvfCodebook.centers,
      sub: Seq[Seq[Seq[Double]]] = PqCodebookResidual256.subCenters,
      nprobe: Int = 3, refine: Int = 4, dim: Int = 64): DataFrame =
    searchIvfAdcEncoded(
      Caching.persisted(encodeIvfAdc(embeddings, centers, sub, dim)),
      queryPred, k, centers, sub, nprobe, refine, dim)

  /** The ENCODE stage of [[ivfAdcTopK]]: cell + residual PQ codes, one
    * codegen'd kernel pass ([[graft.functions.pqEncodeResidual]]). */
  def encodeIvfAdc(embeddings: DataFrame,
      centers: Seq[Seq[Double]] = IvfCodebook.centers,
      sub: Seq[Seq[Seq[Double]]] = PqCodebookResidual256.subCenters,
      dim: Int = 64): DataFrame = {
    val m = sub.size
    normalizedCorpus(embeddings, dim)
      .withColumn("bucket", nearestCell(col("nv"), centers))
      .withColumn("codes", graft.functions.pqEncodeResidual(col("nv"), col("bucket"), centers, sub))
      .select(Seq(col("vec_id"), col("v"), col("nv"), col("bucket")) ++
        (0 until m).map(s => element_at(col("codes"), s + 1).as(s"code$s")): _*)
  }

  /** The SEARCH stages of [[ivfAdcTopK]] over an already-encoded index:
    * probe → (cell-dot + LUT) ADC shortlist → exact rescore. */
  def searchIvfAdcEncoded(assigned: DataFrame, queryPred: Column, k: Int,
      centers: Seq[Seq[Double]] = IvfCodebook.centers,
      sub: Seq[Seq[Seq[Double]]] = PqCodebookResidual256.subCenters,
      nprobe: Int = 3, refine: Int = 4, dim: Int = 64): DataFrame = {
    val m = sub.size
    val ksub = sub.head.size
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nv").as("qnv"))
    val lut = graft.functions.pqLut(col("qnv"), sub)
    // probes carry the per-(query, cell) dot(q, c_cell) ADC base term —
    // nprobe rows per query, so the literal centroid lookup is tiny
    val probes = probeCells(q.withColumn("lut", lut), centers, nprobe,
      keep = Seq(col("qid"), col("lut"), col("qnv")))
      .withColumn("cdot",
        dotProduct(col("qnv"), element_at(typedLit(centers), col("bucket") + 1)))
      .drop("qnv")
    val adc = (col("cdot") +: (0 until m).map(s =>
      element_at(col("lut"), lit(s * ksub + 1) + col(s"code$s")))).reduceLeft(_ + _)
    val shortlist = assigned
      .select(col("vec_id") +: col("bucket") +: (0 until m).map(s => col(s"code$s")): _*)
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), pround6(adc).as("adc"))
      .filter(realScore(col("adc")))
      .withColumn("arn", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc").desc, col("vec_id"))))
      .filter(col("arn") <= refine * k)
      .select("qid", "vec_id")
    rankTopK(
      assigned.select(col("vec_id"), col("v"))
        .join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid"))
        .select(col("qid"), col("vec_id"), pround6(cosineSim(col("qv"), col("v"))).as("cos"))
        .filter(realScore(col("cos"))),
      k)
  }

  /** Per-cell occupancy/alignment stats of the pinned-codebook IVF index —
    * the embedding CLUSTERING surface (assign every vector to its nearest
    * codebook centroid, then summarize each cell): cell size, summed
    * centroid alignment (dot product of the unit vector with its
    * un-normalized centroid, in exact 1e-6 integer units so per-group
    * addition is order-insensitive int64 — the cents rule applied to
    * similarity scores), and the vec_id range.
    * One codegen'd map pass + one partial+final hash agg; shuffle is
    * O(cells), never the vectors. Replays exactly in the DuckDB oracle
    * (centroids are literal data, see [[IvfCodebook]]). */
  def cellStats(embeddings: DataFrame,
      centers: Seq[Seq[Double]] = IvfCodebook.centers, dim: Int = 64): DataFrame = {
    normalizedCorpus(embeddings, dim)
      .withColumn("bucket", nearestCell(col("nv"), centers))
      .withColumn("cvec", element_at(typedLit(centers), col("bucket") + 1))
      .withColumn("align_e6",
        floor(dotProduct(col("nv"), col("cvec")) * 1000000d + 0.5).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("vecs"), sum("align_e6").as("align_e6_sum"),
        min("vec_id").as("min_vec"), max("vec_id").as("max_vec"))
  }

  /** SemDeDup-style SEMANTIC pruning (the missing member of the dedup
    * family: exact → n-gram → SimHash → MinHash → embedding-pair →
    * semantic cluster prune): assign every vector to its pinned IVF cell,
    * then prune, within each cell, every vector that has a
    * cosine ≥ `threshold` neighbor of LOWER centroid alignment — i.e. of
    * any semantically-redundant group, the member least typical of its
    * cell survives (the published keep-rule: retaining low
    * centroid-similarity examples preserves diversity; made relational
    * and deterministic here via exact int64 alignment compares with
    * vec_id tie-break). A group's minimum-(align, id) member has no
    * dominating neighbor, so at least one member of every group is kept.
    *
    * Returns one row per input vector: (vec_id, bucket, align_e6,
    * pruned 0/1) — downstream keeps `pruned = 0`.
    *
    * Scale shape: cell assignment is the same codegen'd map pass as
    * [[ivfTopKPinned]]; the pair scan is cell-LOCAL (one shuffle on
    * bucket, O(cell²) dot products within) — the published algorithm's
    * cost model, bounded by choosing k ≈ corpus/target-cell-size so cells
    * stay O(10⁴-10⁵). Pinned centroids keep the whole decision —
    * assignment, alignment, pair cosine — replayable in the DuckDB
    * oracle. */
  def semanticPrune(embeddings: DataFrame, threshold: Double,
      centers: Seq[Seq[Double]] = IvfCodebook.centers, dim: Int = 64): DataFrame = {
    val a = Caching.persisted(normalizedCorpus(embeddings, dim)
      .withColumn("bucket", nearestCell(col("nv"), centers))
      .withColumn("cvec", element_at(typedLit(centers), col("bucket") + 1))
      .withColumn("align_e6",
        floor(dotProduct(col("nv"), col("cvec")) * 1000000d + 0.5).cast("long"))
      .select("vec_id", "nv", "bucket", "align_e6"))
    val dominated = a.as("x").join(a.as("y"),
        col("x.bucket") === col("y.bucket") &&
          (col("y.align_e6") < col("x.align_e6") ||
            (col("y.align_e6") === col("x.align_e6") && col("y.vec_id") < col("x.vec_id"))) &&
          pround6(dotProduct(col("x.nv"), col("y.nv"))) >= threshold,
        "left_semi")
      .select(col("vec_id"), lit(1L).as("pruned"))
    a.join(dominated, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"), col("align_e6"),
        coalesce(col("pruned"), lit(0L)).as("pruned"))
  }

  /** All near-duplicate pairs (cosine ≥ threshold on the rounded value)
    * within equal-`label` blocks — embedding-cosine near-dup dedup (X1's
    * embedding variant). EXACT: every qualifying pair is returned. Norms
    * are precomputed per vector (the normalized-vector fan-out point is
    * persisted, shared by both self-join sides), so each pair costs one
    * native codegen'd dot product.
    *
    * Scale shape: O(block²) dot products within each `label` block — the
    * price of exactness at an arbitrary threshold. At thresholds this low
    * (the harness uses 0.4, where qualifying pairs sit in the bulk of the
    * random-cosine distribution, see measured data in ARCHITECTURE §3)
    * NO sublinear candidate scheme can be complete: hyperplane-LSH collision
    * probability per bit is only 1−θ/π ≈ 0.63 at cos 0.4, so any bucketing
    * that shrinks blocks also drops true pairs. For the true near-dup
    * regime (threshold ≥ ~0.8) use [[embeddingNearDupPairsLsh]], which
    * buckets inside blocks and verifies candidates exactly. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = Caching.persisted(embeddings
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2Norm(col("v"))))
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        pround6(dotProduct(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Near-dup pairs for the HIGH-threshold regime (true near-duplicates,
    * cosine ≥ ~0.8): OR-of-`numTables` hyperplane-LSH bucketing *inside*
    * each `label` block proposes candidates, then exact cosine verifies —
    * so precision is exact and recall is 1−(1−p^bits)^tables per pair with
    * p = 1−θ/π. At cos 0.9 with 8 tables × 6 bits: miss ≈ 2e-6. Each block
    * shrinks ~2^bits-fold per table, turning O(block²) into
    * O(tables · block²/2^bits) — the 100 TB path for real dedup thresholds.
    * NOT complete at low thresholds; see [[embeddingNearDupPairs]]. */
  def embeddingNearDupPairsLsh(
      embeddings: DataFrame,
      threshold: Double,
      numTables: Int = 8,
      bitsPerTable: Int = 6,
      dim: Int = 64): DataFrame = {
    val tables = (0 until numTables).map { t =>
      lshBucket(col("v"), hyperplanes(bitsPerTable, dim, seed = 1000L + t))
    }
    val e = Caching.persisted(embeddings
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2Norm(col("v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"),
        posexplode(array(tables: _*)).as(Seq("table_idx", "bucket"))))
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.table_idx") === col("b.table_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        pround6(dotProduct(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct() // a pair may collide in several tables
  }
}
