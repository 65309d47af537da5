package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators
  * (SURVEY.md §2.11). Everything here is built from codegen'd built-ins and
  * higher-order array functions — no UDFs — so the per-row work stays inside
  * WholeStageCodegen and scales with the scan.
  */
object TextOps {

  /** Whitespace tokenization (the `documents` corpus is single-space
    * separated). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Distinct word n-gram "shingles" of a token-array column. Documents with
    * fewer than n tokens yield an empty set. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Exact Jaccard similarity of two distinct-element array columns.
    * |A∪B| computed as |A|+|B|-|A∩B| (one intersection, no union
    * materialization). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    // null (not ANSI divide-by-zero) when both sets are empty
    inter / when(union === 0, lit(null)).otherwise(union)
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
