package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.pround4

/** Deduplication operators for LLM training-data pipelines (SURVEY.md §2.11
  * X1/X2): exact, MinHash+LSH, SimHash. All are pure DataFrame pipelines —
  * shuffles only on hash/band keys, never on document text length, so the
  * shuffle volume at 100 TB is O(docs × signature), not O(corpus bytes).
  *
  * Performance shape: signature computation is explode → scalar hash →
  * vectorized hash-aggregate, and shingling is the native codegen'd
  * [[graft.expressions.ShinglesExpr]] kernel (round 1's nested
  * higher-order functions ran on Spark's interpreted CodegenFallback
  * path). Self-joins are preceded by a `repartition` on the join keys so
  * both branches reuse ONE exchange (ReuseExchange) instead of
  * recomputing the signature pipeline twice.
  */
object Dedup {

  /** Observability: rounds the LAST [[clusters]] call's iterative path ran
    * (0 when the driver union-find handled it). Read by ScaleRehearsal to
    * record convergence evidence; not part of any query contract. */
  @volatile var lastClusterIterations: Int = 0

  /** Exact dedup: one representative (min id) per distinct value of
    * `textCol`, with the duplicate count. 100 TB note: grouping directly on
    * the text column would shuffle full documents; grouping on md5(text)
    * moves 16 bytes per row instead. (md5 rather than xxhash64 so the DuckDB
    * oracle can reproduce the key.) */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** (doc_id, grams) pairs: distinct word-`shingleN`-gram sets per doc.
    * The input is hash-repartitioned on doc_id BEFORE shingling: small
    * corpora arrive as one file split, and the per-doc shingle/hash work
    * (cheap per row since the native kernel, but still the widest map
    * stage) must run on all cores, not one.
    *
    * Deliberately NO `size(grams) > 0` filter here: a filter referencing
    * the shingle expression gets pushed down into the single-split scan,
    * dragging shingling below the repartition (serial, and re-evaluated
    * per branch). Empty gram sets are harmless downstream — explode()
    * drops them and Jaccard on them is null, which every threshold filter
    * rejects. */
  private[graft] def gramSets(docs: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("_text"))
      .repartition(col("doc_id"))
      .select(
        col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("_text")), shingleN).as("grams"))
      // per-doc sorted hash image: pair verification intersects THESE
      // (native sorted-long merge) instead of the string arrays
      .withColumn("gh", TextOps.hashedSet(col("grams")))

  /** MinHash signature columns mh0..mh{n-1}: ONE md5 per shingle, the k-th
    * hash = 4-hex-char window k of the digest (independent bits of one good
    * hash ≈ independent hash functions), min-folded per doc by a codegen'd
    * hash aggregate. Reproducible in any engine with md5+substr — which is
    * what keeps the LSH pipeline oracle-checkable in DuckDB. */
  private[graft] def minhashSigs(g: DataFrame, numHashes: Int): DataFrame = {
    require(numHashes * 4 <= 32, "md5 yields 32 hex chars = max 8 x 4-char hashes")
    val aggs = (0 until numHashes).map(k => min(col("m").substr(k * 4 + 1, 4)).as(s"mh$k"))
    g.select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("m"))
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Near-duplicate pairs via MinHash + LSH banding, then exact-Jaccard
    * verification (the standard two-phase design: LSH proposes candidates in
    * O(docs × bands) shuffle, verification touches only colliding pairs).
    *
    * With numHashes=8, bands=4 (r=2): P(candidate) = 1-(1-j²)⁴ ≈ 1 for the
    * real near-dups (j ≥ 0.95) and ≈ 4e-4 for unrelated docs — candidate
    * count stays near-linear in corpus size.
    *
    * Returns (id1, id2, jaccard) for verified pairs with
    * round(jaccard,4) >= threshold, id1 < id2.
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 8,
      numBands: Int = 4,
      threshold: Double = 0.8
  ): DataFrame = {
    require(numHashes % numBands == 0, "numHashes must divide into bands")
    // persist the two fan-out points: grams feed the signature path and
    // both verification joins; banded feeds both self-join sides. Without
    // this, Catalyst re-derives each branch from its own scan (alias-broken
    // exchange reuse) and the shingle HOF runs 4x. At real scale these are
    // the intermediates a pipeline materializes to storage.
    val g = gramSets(docs, idCol, textCol, shingleN)
      .transform(Caching.persisted)
    // repartition on the join keys → both self-join branches reuse one
    // exchange; the signature pipeline runs once.
    val banded = bandRows(g, numHashes, numBands)
      .transform(Caching.persisted)

    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()

    verifyJaccard(cand, g, threshold)
  }

  /** ONE-job primitive collect of a two-Long-column frame of `n` rows:
    * Rows become two long arrays PER PARTITION executor-side
    * (toLocalIterator would run a sequential job per partition; Row
    * collect would hold ~100 MB of Row objects at 10⁶ rows) — the
    * driver's worst case is 2 × 8n bytes by construction. */
  private[graft] def collectPairsPrimitive(df: DataFrame, n: Int): (Array[Long], Array[Long]) = {
    val parts = df.rdd.mapPartitions { it =>
      val a = Array.newBuilder[Long]; val b = Array.newBuilder[Long]
      it.foreach { r => a += r.getLong(0); b += r.getLong(1) }
      Iterator.single((a.result(), b.result()))
    }.collect()
    val ea = new Array[Long](n); val eb = new Array[Long](n)
    var j = 0
    parts.foreach { case (pa, pb) =>
      System.arraycopy(pa, 0, ea, j, pa.length)
      System.arraycopy(pb, 0, eb, j, pb.length)
      j += pa.length
    }
    (ea, eb)
  }

  /** Min-label union-find over primitive edge arrays: every endpoint →
    * its component's MIN id (path-compressed; min-id kept as root). */
  private[graft] def unionFindMinLabels(ea: Array[Long],
      eb: Array[Long]): scala.collection.mutable.HashMap[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    var e = 0
    while (e < ea.length) {
      val a = ea(e); val b = eb(e)
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
      e += 1
    }
    val out = scala.collection.mutable.HashMap.empty[Long, Long]
    parent.keysIterator.foreach(id => out(id) = find(id))
    out
  }

  /** Banded LSH keys per doc from [[gramSets]] output: one
    * (doc_id, band_idx, band_key) row per band — the SAME key construction
    * for the batch pairs pipeline and the streaming near-dup state, so the
    * two propose identical candidates. */
  private[graft] def bandRows(g: DataFrame, numHashes: Int, numBands: Int): DataFrame = {
    val r = numHashes / numBands
    val bandCols = (0 until numBands).map(b =>
      concat((0 until r).map(i => col(s"mh${b * r + i}")): _*))
    minhashSigs(g, numHashes)
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_key")))
  }

  /** Join candidate pairs back to their (hashed) gram sets and keep those
    * with round(exact-Jaccard, 4) >= threshold. */
  private[graft] def verifyJaccard(cand: DataFrame, g: DataFrame, threshold: Double): DataFrame =
    cand
      .join(g.select(col("doc_id").as("id1"), col("gh").as("g1")), "id1")
      .join(g.select(col("doc_id").as("id2"), col("gh").as("g2")), "id2")
      .select(col("id1"), col("id2"),
        pround4(TextOps.jaccardHashed(col("g1"), col("g2"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Connected components over near-dup pairs → duplicate clusters
    * (SURVEY.md §2.11 X2: "connected components via iterative join, cap
    * iterations"): min-label propagation until fixpoint or `maxIter`.
    * Returns (id, cluster) where cluster = min doc id of the component —
    * the representative a dedup pass keeps.
    *
    * 100 TB notes: each iteration is one join + one aggregation on the
    * (small) pair graph, not the corpus; `localCheckpoint` truncates the
    * growing lineage each round. Dup-cluster diameters are tiny in
    * practice, so convergence is a handful of rounds; the cap bounds
    * pathological chains. On the iterative path the final labels are a
    * tracked `localCheckpoint` — callers own a [[Caching.releaseAll]]
    * after consuming the result. */
  def clusters(pairs: DataFrame, maxIter: Int = 20, driverThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    lastClusterIterations = 0
    // ids normalized to long: both paths then share one output contract
    val edgePairs = pairs.select(col("id1").cast("long"), col("id2").cast("long"))
      .transform(Caching.persisted)
    val nEdges = edgePairs.count()
    // The pair graph is tiny relative to the corpus (it only contains docs
    // in some near-dup pair), so up to `driverThreshold` edges a driver-side
    // union-find beats rounds of distributed jobs by orders of magnitude;
    // the iterative join path below remains for genuinely huge graphs.
    if (nEdges <= driverThreshold) {
      val (ea, eb) = collectPairsPrimitive(edgePairs, nEdges.toInt)
      edgePairs.unpersist()
      val lbl = unionFindMinLabels(ea, eb)
      val rows = lbl.keys.toSeq.sorted.map(id => (id, lbl(id)))
      import spark.implicits._
      return rows.toDF("id", "cluster")
    }
    val edges = edgePairs
      .union(edgePairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .transform(Caching.persisted)
    var labels = edges.select(col("id1").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("id2") === labels("id"))
        .groupBy(edges("id1").as("id"))
        .agg(min("label").as("nlabel"))
      val next = labels.as("l")
        .join(neighborMin.as("n"), Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.as("a").join(labels.as("b"), "id")
        .filter(col("a.label") =!= col("b.label")).isEmpty
      Caching.releaseCheckpoint(labels) // superseded iteration's checkpoint
      labels = next
      i += 1
      lastClusterIterations = i
    }
    Caching.trackCheckpoint(labels) // final labels: released post-query
    edges.unpersist()
    edgePairs.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIter iterations - labels would be wrong; raise maxIter")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Exact n-gram-Jaccard pairs within cheap blocking keys (lang, source,
    * length bucket) — the brute-force exact variant of near-dedup; the
    * blocking bounds the pair count so the quadratic term stays within a
    * block. Complements [[minhashLshPairs]], which finds cross-block dups. */
  def ngramJaccardPairs(
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.01
  ): DataFrame = {
    // repartition (on the blocking keys, pre-shingle) for the same two
    // reasons as gramSets: parallelize the HOF and share the exchange
    // between the self-join branches. No grams-based filter (pushdown trap,
    // see gramSets).
    val g = docs
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars DIV 100").as("bucket"), col("text"))
      .repartition(col("lang"), col("source"), col("bucket"))
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"),
        TextOps.hashedSet(
          TextOps.shingles(TextOps.tokens(col("text")), shingleN)).as("gh"))
      .transform(Caching.persisted)
    g.as("a")
      .join(g.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        pround4(TextOps.jaccardHashed(col("a.gh"), col("b.gh"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Directed n-gram CONTAINMENT pairs — the partial-copy member of the
    * near-dup family: `containment(a→b) = |grams(a) ∩ grams(b)| /
    * |grams(a)|`, so a short document swallowed whole by a long one
    * scores 1.0 where Jaccard (x4) scores near |a|/|b| and slips under
    * any sane threshold. Emits BOTH directions (the measure is
    * asymmetric — that asymmetry is the signal: quote-inclusion, page
    * boilerplate, doc-in-doc concatenation).
    *
    * Blocking is (lang, source) only — deliberately NOT the n_chars
    * size bucket [[ngramJaccardPairs]] adds, because containment's
    * target pairs are precisely the size-ASYMMETRIC ones a size-bucket
    * block would separate. Block sizes are corpus/|lang×source|; pairs
    * stay quadratic-in-block like every verify stage here, with the
    * per-pair kernel the native sorted merge-walk. */
  def ngramContainmentPairs(
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    val g = docs
      .select(col("doc_id"), col("lang"), col("source"),
        TextOps.hashedSet(
          TextOps.shingles(TextOps.tokens(col("text")), shingleN)).as("gh"))
      .filter(size(col("gh")) > 0)
      .repartition(col("lang"), col("source"))
      .transform(Caching.persisted)
    g.as("a")
      .join(g.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        pround4(TextOps.containmentHashed(col("a.gh"), col("b.gh")))
          .as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** doc_id → 64-bit SimHash (Charikar), computed as explode(distinct
    * tokens) → md5-derived 64-bit hash ([[graft.functions.md5Hash64]] —
    * reproducible in the DuckDB oracle, unlike round-1's xxhash64) →
    * packed conditional sums in one vectorized aggregate → bit reassembly.
    * Bit b is set iff more than half the token hashes have bit b set.
    *
    * Counter packing: 8 per-bit set-counts ride in ONE long (8 bits each),
    * so the aggregate has 8 sum columns instead of 64 — an 8× smaller
    * generated-code footprint (the 64-column version spent more wall-clock
    * in janino than in data). Counters are 8-bit, so the signature is built
    * from at most `maxTokens` (≤255) distinct tokens per doc — ample for
    * near-dup detection; longer docs are represented by their first
    * `maxTokens` distinct tokens. */
  def simhashes(docs: DataFrame, maxTokens: Int = 255): DataFrame = {
    require(maxTokens <= 255, "packed counters are 8-bit")
    // packed word w accumulates 8-bit counts for bits 4w..4w+3 — FOUR
    // counters per long, not eight: with eight, a doc whose top byte's
    // bit was set by ≥128 tokens pushed the signed sum past 2^63 and
    // ANSI mode threw mid-query (found by the r15 sf10 decade
    // rehearsal at 500k docs — a probabilistic per-doc event, invisible
    // at 50k). Four counters bound the sum at 255·0x01010101 ≈ 4.3e9.
    val packedSums = (0 until 16).map { w =>
      val addend = (0 until 4).map { i =>
        val b = w * 4 + i
        shiftright(col("h"), b).bitwiseAND(1) * lit(1L << (i * 8))
      }.reduce(_ + _)
      sum(addend).as(s"w$w")
    }
    val sim = (0 until 64).map { b =>
      val w = b / 4; val i = b % 4
      // set-count of bit b; bit set iff count*2 > n (strict majority)
      val cnt = shiftright(col(s"w$w"), i * 8).bitwiseAND(0xffL)
      when(cnt * 2 > col("n"), lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    docs
      .select(col("doc_id"),
        explode(slice(array_distinct(TextOps.tokens(col("text"))), 1, maxTokens)).as("tok"))
      .select(col("doc_id"), graft.functions.md5Hash64(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), packedSums: _*)
      .select(col("doc_id"), sim.as("simhash"))
  }

  /** Hamming-≤-maxHamming pairs over ANY 64-bit fingerprint column —
    * the blocking tail shared by text SimHash ([[simhashPairs]]) and
    * perceptual image hashes ([[imageNearDupPairs]]): candidates blocked
    * on equal 16-bit chunks — complete for maxHamming ≤ 3 by pigeonhole.
    * The Hamming filter runs before the distinct so the dedup shuffle
    * only carries surviving pairs.
    * @param sims (doc_id, simhash) */
  def hammingPairs(sims: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunkCols: Seq[Column] =
      (0 until 4).map(c => shiftright(col("simhash"), 16 * c).bitwiseAND(0xffffL))
    val chunked = sims
      .select(col("doc_id"), col("simhash"),
        posexplode(array(chunkCols: _*)).as(Seq("chunk_idx", "chunk")))
      .transform(Caching.persisted) // shared by both self-join sides
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        TextOps.hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash near-dup pairs: Hamming ≤ maxHamming over the 64-bit text
    * fingerprints, chunk-blocked via [[hammingPairs]]. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingPairs(simhashes(docs), maxHamming)

  /** Perceptual IMAGE near-dup pairs — the multimodal member of the
    * dedup family: decode each BMP payload and compute its 64-bit
    * average-hash in one codegen'd projection
    * ([[graft.functions.imageAHash]] — payload bytes never leave the
    * scan stage; only 8-byte hashes enter the join), then block on
    * 16-bit chunks exactly like SimHash. Malformed payloads hash to
    * null and are dropped, the decoder's per-row barrier.
    * @param media (doc_id, payload: binary BMP) */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingPairs(
      media.select(col("doc_id"),
        graft.functions.imageAHash(col("payload")).as("simhash"))
        .filter(col("simhash").isNotNull),
      maxHamming)

  /** Perceptual AUDIO near-dup pairs — same shape as
    * [[imageNearDupPairs]] with the WAV energy-envelope hash
    * ([[graft.functions.audioHash]]): decode + 64-window energy hash in
    * one codegen'd projection, then the shared 16-bit-chunk Hamming
    * blocking. @param media (doc_id, payload: binary PCM16 WAV) */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingPairs(
      media.select(col("doc_id"),
        graft.functions.audioHash(col("payload")).as("simhash"))
        .filter(col("simhash").isNotNull),
      maxHamming)

  /** Token-level content-defined chunking: a cut point after every token
    * whose md5 ends in nibble '0' (rate 1/16), chunk = the token span up
    * to and including a cut. Because each boundary depends only on the
    * token AT it, chunking is self-synchronizing — an edit perturbs only
    * the chunk it lands in, so shared substrings of different documents
    * produce identical chunks. That makes chunk-hash dedup the scalable
    * stand-in for suffix-array substring dedup (which needs a global
    * sort over all positions): shuffle volume is O(tokens) for the
    * chunking and O(chunk hashes) for the dedup, never O(corpus²).
    *
    * Shape: posexplode → running cut-count window (one shuffle by doc,
    * sort by pos); the chunk re-assembly groupBy reuses the window's
    * doc_id partitioning (no second shuffle). The per-chunk ordered
    * concat sorts the collected (pos, tok) structs — collect_list order
    * is not deterministic on its own. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("is_cut",
        when(substring(md5(col("tok")), 32, 1) === "0", 1L).otherwise(0L))
      .withColumn("chunk_idx", coalesce(sum(col("is_cut")).over(w), lit(0L)))
      .groupBy("doc_id", "chunk_idx")
      .agg(
        count(lit(1)).as("n_toks"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("chunk"))
  }

  /** Chunk-level duplicate stats over [[cdcChunks]] output: per repeated
    * chunk content, its occurrence count, distinct-document spread, and
    * first document. Groups on md5(chunk) so the dedup shuffle carries
    * 16-byte keys, never chunk text. */
  def chunkDupStats(chunks: DataFrame): DataFrame =
    chunks.groupBy(md5(col("chunk")).as("chunk_md5"))
      .agg(
        min(col("n_toks")).as("n_toks"),
        count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc"))
      .filter(col("occurrences") > 1)

  /** EXACT substring-duplication spans (SURVEY.md §2.11 R144) — the
    * character-level counterpart of [[cdcChunks]]+[[chunkDupStats]] and
    * the batch "substring dedup" curation pass for training corpora:
    * every k-char window of every document is fingerprinted, windows
    * whose content occurs in MORE THAN ONE distinct document are
    * flagged, and each document's flagged positions are merged into
    * maximal duplicated SPANS (two windows coalesce iff their character
    * ranges overlap or touch — position gap ≤ k). Per affected doc:
    * flagged-window count, span count, duplicated chars, and the
    * duplicated fraction in exact integer ppm.
    *
    * No reference-engine equivalent — ClickHouse has no corpus-wide
    * substring pass (`/root/reference/README.md` holds per-row DDL
    * only); this is the curation extension the prompt mandates.
    *
    * Shape/scale: window count ∝ total corpus chars; dup detection is
    * ONE shuffle on 16-byte md5 keys (md5 rather than xxhash64 so the
    * DuckDB oracle reproduces the key; uniform by construction, so
    * skew-salting is unnecessary) — "content in >1 distinct doc" reads
    * as min(doc)≠max(doc) over the hash partition, two unordered
    * window aggregates in a single pass, NOT a groupBy + self-join
    * (the first cut re-ran the explode+md5 pipeline on both branches:
    * 10.5 s → 2.9 s at sf0.1). The span merge is one shuffle by doc_id
    * plus an O(doc) sorted walk, and the final length join is
    * doc_id-keyed against a two-column pruned scan. Nothing is
    * all-pairs; nothing collects to the driver. */
  /** Shuffle-partition count for the x116 window-hash sort, derived from
    * the SOURCE size estimate so per-task sort bytes stay roughly
    * constant as the corpus grows (optimization r16 — the knob
    * ARCHITECTURE §3 documented after the sf10 fixed-box spill, now
    * code): every source byte becomes ≈200 bytes of shuffled window row
    * (one ~40 B (doc_id, pos, 16-B digest) row per character × ~5×
    * parquet text compression), and each sort task targets
    * `perTaskBytes` (default 256 MB — inside a default executor's
    * per-task execution memory, so the sort stays in-memory where the
    * r15 16-partition run spilled ~1.3 GB per task at sf10). Never goes
    * BELOW the session default, so small inputs keep the session's
    * parallelism and the local bench is unchanged at sf0.1. Pure
    * function (spec-pinned in DedupSpec). */
  def spanSortPartitions(srcBytes: BigInt, sessionDefault: Int,
      perTaskBytes: Long = 256L << 20): Int = {
    val est = srcBytes * 200
    val byBytes = (est / perTaskBytes).min(BigInt(200000)).toInt
    math.max(sessionDefault, byBytes)
  }

  def duplicateSpanStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 40): DataFrame = {
    require(k >= 2, s"window length k must be >= 2, got $k")
    val d = docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
    // 16-byte BINARY digest, not the 32-char hex string: the hash is
    // only a grouping key (the oracle replays the formula, never reads
    // h), and every window of every char rides the byHash sort on it —
    // at the r15 sf10 rehearsal the hex form crossed the sort's
    // in-memory threshold a decade earlier than the binary one
    // (131 → 103 s at 350M windows)
    val sessionParts = docs.sparkSession.sessionState.conf.numShufflePartitions
    // ADVICE r16: sources without size statistics (LogicalRDD /
    // createDataFrame inputs) estimate sizeInBytes as
    // spark.sql.defaultSizeInBytes (Long.MaxValue-ish) — feeding that to
    // the knob would silently pin the 200k-partition cap on a tiny
    // input. Treat the unestimable sentinel as "unknown": keep the
    // session default (the pre-knob behavior) and say so once on stderr.
    val srcBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val unestimable = srcBytes >= BigInt(
      docs.sparkSession.sessionState.conf.defaultSizeInBytes)
    if (unestimable)
      System.err.println("[dedup] duplicateSpanStats: source size " +
        "unestimable (defaultSizeInBytes sentinel) — keeping the session " +
        s"shuffle-partition count $sessionParts for the window-hash sort")
    val sortParts =
      if (unestimable) sessionParts
      else spanSortPartitions(srcBytes, sessionParts)
    val winsRaw = d.filter(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(sequence(lit(1L), (length(col("text")) - (k - 1)).cast("long"))).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        unhex(md5(col("text").substr(col("pos"), lit(k)))).as("h"))
    // input-proportional sort partitions (see [[spanSortPartitions]]),
    // applied ONLY when the estimate exceeds the session default: the
    // explicit hash repartition then REPLACES the byHash window's
    // exchange (same key) with constant per-task sort bytes. Below the
    // threshold the window keeps its own exchange so AQE stays free to
    // coalesce it — an unconditional repartition pinned 32 partitions at
    // sf0.1 and measured +0.3 s against the r15 plan.
    val wins =
      if (sortParts > sessionParts) winsRaw.repartition(sortParts, col("h"))
      else winsRaw
    // one-shuffle window form — measured best at EVERY scale probed:
    // sf0.1 2.9-3.4 s (vs 4.8 s persist + broadcast semi-join, 10.5 s
    // naive groupBy + self-join) and sf10/350M windows 89 s — where the
    // r15 follow-up experiment's "memory-bounded" groupBy +
    // SHUFFLE_HASH-semi-join form, which avoids the sort by re-deriving
    // the window stream, measured 272 s: re-running 350M md5s costs 3×
    // what the sort's disk spill does. Past the fixed-box spill point
    // the cluster knob is shuffle.partitions ∝ input (holds per-task
    // sort bytes constant), not a different plan.
    val byHash = Window.partitionBy("h")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val spans = wins
      .withColumn("dup",
        min(col("doc_id")).over(byHash) =!= max(col("doc_id")).over(byHash))
      .filter(col("dup")).drop("dup", "h")
      // island break: first row per doc (null lag) or a gap wider than k
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, 0L).otherwise(1L))
      .withColumn("span_id", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "span_id")
      .agg(min(col("pos")).as("a"), max(col("pos")).as("b"), count(lit(1)).as("nw"))
    spans.groupBy("doc_id")
      .agg(sum(col("nw")).as("n_dup_windows"),
        count(lit(1)).as("n_spans"),
        // a span [a, b] of window STARTS covers chars [a, b + k - 1]
        sum(col("b") - col("a") + k).as("dup_chars"))
      .join(d.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
      .withColumn("dup_ppm", expr("dup_chars * 1000000 DIV len"))
      .select("doc_id", "len", "n_dup_windows", "n_spans", "dup_chars", "dup_ppm")
  }

  /** Representative selection — the curation step after near-dup
    * clustering: keep the best-scoring member of each duplicate cluster
    * (ties to the lowest id), one row per cluster with its size and
    * winner. Docs not in any near-dup pair never enter `clusterMap`, so
    * the corpus-level "keep" set is (all docs) minus (cluster members)
    * plus (the reps returned here).
    *
    * Shape: the cluster map only contains docs that occur in some
    * near-dup pair — tiny relative to the corpus — so the score join is
    * cheap; the argmax is one partial+final `max(struct(score, -id))`
    * hash aggregate (map-side combine, no window, no per-cluster sort).
    * Null scores rank below any real score via `coalesce(score, -1)`
    * (callers' scores are bounded ratios in [0, 1]). */
  def representatives(clusterMap: DataFrame, scores: DataFrame,
                      idCol: String, scoreCol: String): DataFrame = {
    val sc = scores.select(col(idCol).cast("long").as("id"),
      coalesce(col(scoreCol).cast("double"), lit(-1.0)).as("score"))
    clusterMap.join(sc, "id")
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("score"), negate(col("id")).as("neg_id"))).as("best"))
      .select(col("cluster"), col("n_members"),
        negate(col("best.neg_id")).cast("long").as("rep_id"),
        col("best.score").as("rep_score"))
  }
}
