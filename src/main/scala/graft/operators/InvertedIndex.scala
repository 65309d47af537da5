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
  * aggregation concentrates exactly one row per (token, doc). Posting
  * lists for head tokens are still inherently skewed — a production
  * index shards them into fixed-size blocks; here the list is folded to
  * an md5 fingerprint (sorted, comma-joined ids), which both bounds the
  * output and gives the oracle an exact bit to match.
  */
object InvertedIndex {

  /** Per-token postings summary: document frequency `df`, total term
    * frequency `total_tf`, and the md5 fingerprint of the ascending
    * doc-id posting list. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("token")
      .agg(
        count(lit(1)).as("df"),
        sum("tf").as("total_tf"),
        md5(concat_ws(",",
          sort_array(collect_list(col("doc_id"))).cast("array<string>")))
          .as("postings_md5"))

  /** The `k` highest-df tokens (ties broken by token asc — fully
    * deterministic head of the index). */
  def topPostings(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    postings(docs, idCol, textCol)
      .orderBy(desc("df"), asc("token"))
      .limit(k)
}
