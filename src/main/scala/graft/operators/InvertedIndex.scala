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

  /** Per-token postings summary: document frequency `df`, total term
    * frequency `total_tf`, and the order-independent XOR fingerprint of
    * the posting set's per-doc md5 hashes. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("h", graft.functions.md5Hash64(col("doc_id").cast("string")))
      .groupBy("token")
      .agg(
        count(lit(1)).as("df"),
        sum("tf").as("total_tf"),
        expr("bit_xor(h)").as("postings_fp"))

  /** The `k` highest-df tokens (ties broken by token asc — fully
    * deterministic head of the index). */
  def topPostings(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    postings(docs, idCol, textCol)
      .orderBy(desc("df"), asc("token"))
      .limit(k)
}
