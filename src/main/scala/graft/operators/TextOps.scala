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

  /** MD5-salted MinHash signature: element k = min over shingles of
    * md5(k || '|' || shingle), k in [0, numHashes). Using md5-of-salted-text
    * (rather than seeded xxhash) keeps the signature reproducible in any
    * engine with an MD5 builtin — which is what makes the LSH pipeline
    * oracle-checkable in DuckDB. Cost: numHashes × |shingles| md5 calls per
    * doc, embarrassingly parallel. */
  def minhashSig(grams: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      k => array_min(transform(grams, g => md5(concat(k.cast("string"), lit("|"), g)))))

  /** LSH band keys from a MinHash signature: `numBands` bands of
    * `rowsPerBand` concatenated signature elements. Two docs collide on a
    * band iff all its rows match — P(collide) = 1-(1-j^r)^b. */
  def bandKeys(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => concat_ws("", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** Exact Jaccard similarity of two distinct-element array columns.
    * |A∪B| computed as |A|+|B|-|A∩B| (one intersection, no union
    * materialization). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }

  /** 64-bit SimHash over the distinct tokens of `toksCol` (a column *name*;
    * built via SQL `expr` because `shiftleft` with a non-literal distance is
    * SQL-only). Bit b is set iff more than half the token hashes have bit b
    * set — Charikar's scheme with unit weights on xxhash64 token hashes. */
  def simhash64(toksColName: String): Column = expr(
    s"""aggregate(
       |  sequence(0, 63),
       |  CAST(0 AS BIGINT),
       |  (acc, b) -> acc + IF(
       |    size(filter(transform(array_distinct($toksColName), t -> xxhash64(t)),
       |                h -> (h >> CAST(b AS INT)) & 1 = 1)) * 2
       |      > size(array_distinct($toksColName)),
       |    shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)),
       |    CAST(0 AS BIGINT)))""".stripMargin)

  /** The 16-bit chunks of a 64-bit SimHash, as `(sim >> 16c) & 0xFFFF` for
    * c in 0..3 — block keys for Hamming-distance LSH: two hashes within
    * Hamming distance 3 share at least one of the 4 chunks (pigeonhole).
    * SQL `expr` because `>>` with a non-literal distance is SQL-only. */
  def simhashChunks(simColName: String): Column = expr(
    s"transform(sequence(0, 3), c -> ($simColName >> CAST(16 * c AS INT)) & 65535)")

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
