package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.pround4

/** Text-analysis operators for training-data curation (SURVEY.md §2.11 X4):
  * language-ID heuristic, quality scoring, token stats, fingerprinting. All
  * pure column pipelines (codegen'd), deterministic, and — except for
  * anything hash-seeded — reproducible in ANSI-ish SQL for the oracle.
  */
object TextAnalysis {

  /** Stopword list used by the quality score (fixed, tiny — broadcast as a
    * literal into codegen). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Marker tokens per language for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with alphabetical tie-break. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est")
  )

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*))).cast("long")

  /** Predicted language of a token-array column: the marker list with the
    * highest hit count (must be > 0), ties broken alphabetically, else
    * "unknown". */
  def langId(toks: Column): Column = {
    val Seq(de, en, es, fr) = langMarkers.map { case (_, m) => markerCount(toks, m) }
    when(de > 0 && de >= en && de >= es && de >= fr, "de")
      .when(en > 0 && en >= es && en >= fr, "en")
      .when(es > 0 && es >= fr, "es")
      .when(fr > 0, "fr")
      .otherwise("unknown")
  }

  /** Per-document quality metrics + composite score. Input df needs
    * (doc_id, text); text is single-space tokenized. All ratios are exact
    * integer divisions evaluated in double — both engines compute identical
    * IEEE results from identical expression shapes. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val sumLen = (length(col("text")) - (nTok - 1)).cast("long") // single-space separated
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    val ttr = nUniq / nTok
    val stopRatio = nStop / nTok
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      nUniq.as("n_uniq"),
      pround4(ttr).as("ttr"),
      pround4(sumLen / nTok).as("avg_token_len"),
      pround4(stopRatio).as("stop_ratio"),
      pround4(least(nTok, lit(100L)) / 100.0 * 0.5 + ttr * 0.3 + (lit(1.0) - stopRatio) * 0.2)
        .as("quality_score")
    )
  }

  /** Per-doc fingerprint: minimum md5 over word 3-grams — a 1-hash MinHash;
    * identical fingerprints are a strong near-dup signal, and min-md5 is
    * reproducible in any engine with md5 (oracle-checkable), unlike a
    * seeded rolling hash. */
  def fingerprint(docs: DataFrame, shingleN: Int = 3): DataFrame =
    docs.select(
      col("doc_id"),
      array_min(transform(
        TextOps.shingles(TextOps.tokens(col("text")), shingleN),
        g => md5(g))).as("fingerprint")
    )
}
