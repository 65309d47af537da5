package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (SURVEY.md §2.11
  * X1/X2): exact, MinHash+LSH, SimHash. All are pure DataFrame pipelines —
  * shuffles only on hash/band keys, never on document text length, so the
  * shuffle volume at 100 TB is O(docs × signature), not O(corpus bytes).
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct value of
    * `textCol`, with the duplicate count. 100 TB note: grouping directly on
    * the text column would shuffle full documents; grouping on md5(text)
    * moves 16 bytes per row instead. (md5 rather than xxhash64 so the DuckDB
    * oracle can reproduce the key.) */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Near-duplicate pairs via MinHash + LSH banding, then exact-Jaccard
    * verification (the standard two-phase design: LSH proposes candidates in
    * O(docs × bands) shuffle, verification touches only colliding pairs).
    *
    * Deterministic end-to-end: md5-salted MinHash (see
    * [[TextOps.minhashSig]]) makes the whole pipeline reproducible in the
    * DuckDB oracle. With numHashes=8, bands=4 (r=2), P(candidate) =
    * 1-(1-j²)⁴: ≈1 for j≥0.95 (the real near-dups), ≈4e-4 for unrelated
    * docs (j≈0.01) — candidate count stays linear-ish in corpus size.
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
    val r = numHashes / numBands
    val g = docs.select(
      col(idCol).as("doc_id"),
      TextOps.shingles(TextOps.tokens(col(textCol)), shingleN).as("grams")
    ).filter(size(col("grams")) > 0)

    val banded = g
      .withColumn("sig", TextOps.minhashSig(col("grams"), numHashes))
      .select(col("doc_id"),
        posexplode(TextOps.bandKeys(col("sig"), numBands, r)).as(Seq("band_idx", "band_key")))

    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()

    cand
      .join(g.select(col("doc_id").as("id1"), col("grams").as("g1")), "id1")
      .join(g.select(col("doc_id").as("id2"), col("grams").as("g2")), "id2")
      .select(col("id1"), col("id2"),
        round(TextOps.jaccard(col("g1"), col("g2")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
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
    val g = docs.select(
      col("doc_id"), col("lang"), col("source"),
      expr("n_chars DIV 100").as("bucket"),
      TextOps.shingles(TextOps.tokens(col("text")), shingleN).as("grams")
    ).filter(size(col("grams")) > 0)
    g.as("a")
      .join(g.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        round(TextOps.jaccard(col("a.grams"), col("b.grams")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-doc 64-bit SimHash plus Hamming-LSH near-dup pairs (Hamming ≤
    * maxHamming over the 64-bit fingerprints; candidates blocked on equal
    * 16-bit chunks — complete for maxHamming ≤ 3 by pigeonhole). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sims = simhashes(docs)
    val chunked = sims.select(col("doc_id"), col("simhash"),
      posexplode(TextOps.simhashChunks("simhash")).as(Seq("chunk_idx", "chunk")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        TextOps.hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** doc_id → 64-bit SimHash. */
  def simhashes(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), TextOps.simhash64("toks").as("simhash"))
}
