package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distinct-set state as packed integer bitmaps — the reference
  * engine family's `groupBitmap` surface (ClickHouse bitmap aggregates:
  * groupBitmapState / bitmapAnd / bitmapOr cardinalities). A group's
  * member set is rows of `(group, word, bits)`: member id `i` sets bit
  * `i mod 63` of word `i div 63`. 63 bits per word, not 64: DuckDB's
  * `<<` raises on `1::BIGINT << 63`, and staying off the sign bit keeps
  * the packed value, `&`, `|` and `bit_count` engine-identical — one
  * word per 63 ids costs 1.6% density for exact cross-engine replay.
  *
  * Why this beats distinct-count queries at scale: the state is a
  * SUMMARY — O(universe/63) words per group, OR-mergeable (commutative,
  * associative, IDEMPOTENT — replayed increments converge), so it
  * maintains incrementally under [[graft.streaming.MvPipeline.upsertWith]]
  * and set-algebra reads (|A|, |A ∩ B|, |A ∪ B|) are joins over word
  * state, never rescans of the fact stream. Cardinalities are EXACT,
  * unlike the HLL path (x8).
  */
object Bitmaps {

  /** `groupBitmapState`: one row per (group, word) with the packed member
    * bits. `idCol` must be a non-negative integer id. One shuffle on
    * (group, word) with map-side OR combine; output is O(ids/63) rows. */
  def bitmapState(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.select(col(groupCol).as("g"),
        expr(s"$idCol DIV 63").as("word"),
        expr(s"shiftleft(1L, CAST($idCol % 63 AS INT))").as("m"))
      .groupBy("g", "word")
      .agg(bit_or(col("m")).as("bits"))

  /** Exact member count per group, served from bitmap state. */
  def cardinality(state: DataFrame): DataFrame =
    state.groupBy("g").agg(sum(bit_count(col("bits"))).as("card"))

  /** Exact `|group ∩ other|` for every group, served from state: word-keyed
    * self-join against `other`'s words, popcount of the AND. Groups sharing
    * no words with `other` still appear, with 0. */
  def andCardinality(state: DataFrame, other: String): DataFrame = {
    val o = state.filter(col("g") === other)
      .select(col("word"), col("bits").as("obits"))
    state.join(o, Seq("word"), "left")
      .groupBy("g")
      .agg(sum(bit_count(coalesce(col("bits").bitwiseAND(col("obits")), lit(0L))))
        .as("card_and"))
  }

  /** Exact `|g ∩ (g+step)|` for every numeric group — e.g. returning
    * users per day from a day-keyed bitmap. One self-join on
    * (g+step, word); both sides are state, the fact stream is never
    * rescanned. */
  def adjacentAndCardinality(state: DataFrame, step: Long): DataFrame = {
    val nxt = state.select((col("g") - lit(step)).as("g"),
      col("word"), col("bits").as("obits"))
    state.join(nxt, Seq("g", "word"), "left")
      .groupBy("g")
      .agg(sum(bit_count(coalesce(col("bits").bitwiseAND(col("obits")), lit(0L))))
        .as("card_and"))
  }

  /** Exact churn between adjacent groups — `bitmapAndnot` both ways in
    * one pass: per g, `lost = |g \ (g+step)|` and `gained =
    * |(g+step) \ g|`. FULL outer join on (g, word) with 0-coalesced
    * sides, because a word can live in only one of the two days (a
    * left join would silently drop bits that exist only in g+step).
    * The sign bit is never set (63-bit packing), so `AND NOT` stays
    * inside nonneg int64 on both engines. The last group compares
    * against the empty set: everyone lost, nobody gained — reported,
    * not hidden. */
  def adjacentChurn(state: DataFrame, step: Long): DataFrame = {
    val nxt = state.select((col("g") - lit(step)).as("g"),
      col("word"), col("bits").as("nbits"))
    state.join(nxt, Seq("g", "word"), "full_outer")
      .select(col("g"),
        coalesce(col("bits"), lit(0L)).as("b"),
        coalesce(col("nbits"), lit(0L)).as("nb"))
      .groupBy("g")
      .agg(
        sum(bit_count(col("b").bitwiseAND(bitwise_not(col("nb"))))).as("lost"),
        sum(bit_count(col("nb").bitwiseAND(bitwise_not(col("b"))))).as("gained"))
  }
}
