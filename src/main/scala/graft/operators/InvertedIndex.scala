package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction over a document corpus (SURVEY.md §2.11
  * extension family): token → posting list, the retrieval-side artifact a
  * training-data pipeline builds for exact-match search, contamination
  * probes, and BM25-style scoring.
  *
  * Scale shape: one explode + two hash aggregations, both shuffling only
  * (token, doc_id, count) tuples — never texts. The per-(token, doc)
  * pre-aggregation is the map-side combine that keeps stopword tokens
  * from concentrating raw occurrences on one reducer; the second
  * aggregation concentrates exactly one row per (token, doc). The
  * posting-list fingerprint is the bitwise XOR of each member doc's
  * md5-derived int64 ([[graft.functions.md5Hash64]]): XOR is commutative
  * and associative, so the aggregation state is a single long — head
  * (stopword) tokens cost the same 8 bytes of reducer memory as tail
  * tokens, and partial aggregation combines map-side. (A collect-the-ids
  * fold would materialize the full posting list of every head token in
  * one reducer — unbounded memory at corpus scale.)
  *
  * Fingerprint strength — XOR is LINEAR over GF(2): any two posting sets
  * whose symmetric difference XORs to zero collide (e.g. {a,b}∪S vs
  * {c,d}∪S whenever h(a)⊕h(b)=h(c)⊕h(d)), and such collisions are
  * constructible by Gaussian elimination over ~64 candidate docs — this
  * is materially weaker set-equality detection than hashing the sorted
  * id list. It is sufficient here: the fingerprint's role is an
  * order-independent oracle-parity bit (distinct per-token ids mean no
  * pair self-cancels deterministically, and random collisions are
  * 2⁻⁶⁴). If it is ever promoted to content-addressed dedup, fold each
  * hash through a nonlinear mix (e.g. a murmur finalizer) before the
  * XOR so linear combinations stop aligning.
  */
object InvertedIndex {

  /** Per-(token, document) postings DETAIL: `tf` — the posting lists the
    * ranked-retrieval read path ([[bm25TopK]]) consumes. One explode +
    * one partial+final count, shuffling (token, doc_id) tuples only.
    * Keyed by (token, doc_id) with a purely additive measure, so it
    * incrementally maintains with a SUM merge
    * ([[graft.streaming.IncrementalIndex]]). */
  def postingsDetail(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))

  /** Per-document token count `dl` — the BM25 length-normalization
    * summary; additive by doc_id, so it too maintains with a SUM merge. */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("doc_id").agg(count(lit(1)).as("dl"))

  /** Per-token postings summary: document frequency `df`, total term
    * frequency `total_tf`, and the order-independent XOR fingerprint of
    * the posting set's per-doc md5 hashes. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    postingsDetail(docs, idCol, textCol)
      .withColumn("h", graft.functions.md5Hash64(col("doc_id").cast("string")))
      .groupBy("token")
      .agg(
        count(lit(1)).as("df"),
        sum("tf").as("total_tf"),
        expr("bit_xor(h)").as("postings_fp"))

  /** BM25 ranked retrieval OVER THE MAINTAINED INDEX — the read path the
    * index exists for (the reference's whole economics: maintain a
    * summary so reads are O(summary), `/root/reference/README.md:24-189`
    * — an index nobody queries is half the pattern). The corpus is
    * scanned ZERO times: every input is postings/doc-length state.
    *
    * Scoring is the standard BM25 with k1 = 6/5 and b = 3/4, made
    * EXACT-RATIONAL (the x27 log-free recipe, extended): with
    * avgdl = total_len / n_docs and the rational idf n_docs/df,
    *
    *   idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *     = (22 · tf · n_docs · total_len)
    *       / (df · (10·tf·total_len + 3·total_len + 9·dl·n_docs))
    *
    * — numerator and denominator are exact int64 products, so the only
    * IEEE operation per (doc, term) is ONE division, bit-identical in
    * both engines (ln() and chained float ops are not cross-engine
    * stable). Per-term scores are e6-quantized to int64 BEFORE the
    * per-doc sum (the cents rule applied to scores: int addition is
    * order-insensitive, a double Σ would depend on aggregation order).
    * Int64 bounds: tf·n_docs·total_len ≲ 2⁶³ holds through ~10⁹-token
    * corpora; past that, score in per-shard strata or widen to int128.
    *
    * Scale shape: the `isin` filter on query terms is pushed into the
    * postings scan (token dictionary/row-group pruning at rest — probe
    * cost is O(matched postings), never O(index)); df is a tiny agg over
    * the matched postings; totals are a broadcast 1-row aggregate of the
    * doc-length summary; one shuffle on doc_id sums term scores; top-k is
    * a TakeOrderedAndProject, never a global sort.
    *
    * @param postings (token, doc_id, tf) — [[postingsDetail]] or its
    *                 maintained state
    * @param docLens  (doc_id, dl) — [[docLengths]] or its state */
  def bm25TopK(postings: DataFrame, docLens: DataFrame, queryTerms: Seq[String],
      k: Int): DataFrame = {
    // both fan out into two consumers (totals + join, df + score join):
    // persist the small matched/summary sets so the state scan runs once
    val lens = Caching.persisted(docLens)
    val totals = lens.select(
      count(lit(1)).as("n_docs"),
      sum("dl").as("total_len"))
    val matched = Caching.persisted(postings.filter(col("token").isin(queryTerms: _*)))
    val dfreq = matched.groupBy("token").agg(count(lit(1)).as("df"))
    val num = lit(22L) * col("tf") * col("n_docs") * col("total_len")
    val den = col("df") * (lit(10L) * col("tf") * col("total_len")
      + lit(3L) * col("total_len") + lit(9L) * col("dl") * col("n_docs"))
    matched
      .join(dfreq, "token")
      .join(lens, "doc_id")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        floor((num / den) * lit(1000000.0) + lit(0.5)).cast("long").as("term_e6"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("matched"), sum("term_e6").as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id"))
      .limit(k)
  }

  /** POSITIONAL postings: (token, doc_id, positions) with 1-based token
    * positions sorted ascending — the index detail phrase/proximity
    * queries consume. One posexplode + one partial+final aggregation;
    * shuffle carries (token, doc, pos) tuples, never texts. Keyed by
    * (token, doc_id) with a per-doc-static value, so state maintenance
    * is a disjoint-key union ([[graft.streaming.IncrementalIndex
    * .processBatchPositional]]). */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "token")))
      .groupBy("token", "doc_id")
      .agg(sort_array(collect_list(col("pos") + 1)).as("positions"))

  /** Exact PHRASE search served from positional postings — the second
    * read path over the maintained index (with [[bm25TopK]]): a doc
    * position p starts an occurrence of `phrase` iff p is in term 0's
    * postings, p+1 in term 1's, … Relationally: each term's postings
    * (filter pushed into the index scan — probe cost O(matched
    * postings), never O(index)) explode to candidate starts shifted by
    * the term's offset, then a left-semi equi-join chain keeps starts
    * present for EVERY term. Returns (doc_id, occurrences). */
  def phraseSearch(positional: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val terms = phrase.zipWithIndex.map { case (t, i) =>
      positional.filter(col("token") === t)
        .select(col("doc_id"), explode(col("positions")).as("pp"))
        .select(col("doc_id"), (col("pp") - i).as("p"))
    }
    terms.reduceLeft((a, b) => a.join(b, Seq("doc_id", "p"), "left_semi"))
      .groupBy("doc_id").agg(count(lit(1)).as("occurrences"))
      .orderBy("doc_id")
  }

  /** The `k` highest-df tokens (ties broken by token asc — fully
    * deterministic head of the index). */
  def topPostings(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    postings(docs, idCol, textCol)
      .orderBy(desc("df"), asc("token"))
      .limit(k)
}
