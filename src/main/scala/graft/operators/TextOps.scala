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

  /** Distinct word n-gram "shingles" of a token-array column. Documents
    * with fewer than n tokens yield an empty set; null token arrays too
    * (matching the original `when(size >= n, ...)` HOF form, whose
    * semantics the native [[graft.expressions.ShinglesExpr]] kernel
    * replicates gram-for-gram at ~one call per doc instead of an
    * interpreted lambda per gram). */
  def shingles(toks: Column, n: Int): Column = {
    val shim = org.apache.spark.sql.graft.SparkShim
    coalesce(
      shim.column(graft.expressions.ShinglesExpr(shim.expression(toks), n)),
      array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two distinct-element array columns.
    * |A∪B| computed as |A|+|B|-|A∩B| (one intersection, no union
    * materialization). Reference semantics; [[jaccardHashed]] is the
    * hot-path form for pair-heavy verification. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    // null (not ANSI divide-by-zero) when both sets are empty
    inter / when(union === 0, lit(null)).otherwise(union)
  }

  /** Ascending-sorted xxhash64 image of a distinct-string-array column —
    * computed once per DOC (the transform HOF is interpreted, but runs
    * O(docs) times), consumed by [[jaccardHashed]] O(pairs) times. */
  def hashedSet(grams: Column): Column =
    sort_array(transform(grams, g => xxhash64(g)))

  /** Jaccard over [[hashedSet]] columns: the per-pair intersection is a
    * native codegen'd merge walk over sorted longs
    * ([[graft.expressions.SortedIntersectCount]]) instead of
    * `array_intersect` building a per-pair UTF8String hash table. Value is
    * identical to [[jaccard]] on the underlying string sets unless xxhash64
    * collides within one pair's union (P ≈ |union|²/2⁶⁵ ≈ 3e-16 for
    * 100-gram docs — negligible even at 10¹² pairs). */
  def jaccardHashed(a: Column, b: Column): Column = {
    val shim = org.apache.spark.sql.graft.SparkShim
    val inter = shim.column(graft.expressions.SortedIntersectCount(
      shim.expression(a), shim.expression(b)))
    val union = size(a) + size(b) - inter
    inter / when(union === 0, lit(null)).otherwise(union)
  }

  /** DIRECTED containment |A∩B| / |A| over [[hashedSet]] columns — the
    * asymmetric cousin of [[jaccardHashed]]: 1.0 means every element of A
    * appears in B regardless of how much bigger B is, exactly the signal
    * symmetric Jaccard dilutes for size-skewed pairs. Same native sorted
    * merge-walk intersection; null when A is empty. */
  def containmentHashed(a: Column, b: Column): Column = {
    val shim = org.apache.spark.sql.graft.SparkShim
    val inter = shim.column(graft.expressions.SortedIntersectCount(
      shim.expression(a), shim.expression(b)))
    inter / when(size(a) === 0, lit(null)).otherwise(size(a))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
