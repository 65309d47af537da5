package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Pinned-weight quality-CLASSIFIER scoring — the "apply a trained
    * quality model to every document" pass of a curation pipeline
    * (fastText-style filters), reduced to its Spark-shaped essence: a
    * broadcast weight vector over per-doc features, one codegen'd
    * projection, zero shuffles. The squash is the RATIONAL sigmoid
    * `p = 0.5 + 0.5·z/(1+|z|)` — multiply/add/divide/abs only, so unlike
    * `exp`-based logistic (libm implementations differ in final ULPs
    * across engines) the score replays bit-for-bit in the oracle.
    * Features are the pround4'd [[quality]] columns (already
    * engine-equal) plus the capped token count; `z` accumulates
    * left-to-right matching the SQL mirror. `keep` thresholds the
    * ROUNDED score (the parity rule). */
  def classifierScore(docs: DataFrame,
      w: Seq[Double] = Seq(-1.2, 2.0, 0.8, -1.5, 0.1)): DataFrame = {
    val q = quality(docs)
    val f1 = least(col("n_tokens"), lit(100L)).cast("double") / lit(100.0)
    val z = lit(w(0)) + lit(w(1)) * f1 + lit(w(2)) * col("ttr") +
      lit(w(3)) * col("stop_ratio") + lit(w(4)) * col("avg_token_len")
    val p = pround4(lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z)))
    q.select(col("doc_id"), p.as("score"),
      when(p >= 0.5, 1L).otherwise(0L).as("keep"))
  }

  /** Classifier CALIBRATION buckets — the model-quality read a curation
    * pipeline runs after [[classifierScore]]: decile-bucket the score
    * and measure, per bucket, the share of documents carrying an
    * independent label (here: length ≥ `labelMinTokens` tokens) in exact
    * integer ppm. A well-calibrated score is monotone in the share; the
    * whole figure is one join of two same-scan projections plus one
    * O(10)-group aggregation. Bucketing floors `score·10` — the score is
    * already a pround4'd engine-equal double, so the floor is identical
    * everywhere; the top bucket absorbs score = 1.0 via LEAST. */
  def calibration(docs: DataFrame, labelMinTokens: Long = 50L): DataFrame =
    classifierScore(docs)
      .join(quality(docs).select(col("doc_id"), col("n_tokens")), "doc_id")
      .withColumn("bucket",
        least(floor(col("score") * 10).cast("long"), lit(9L)))
      .withColumn("label",
        when(col("n_tokens") >= labelMinTokens, 1L).otherwise(0L))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("label").as("n_long"))
      .withColumn("long_ppm", expr("n_long * 1000000 DIV n"))

  /** Per-document repetition metrics (SURVEY.md §2.11 R22) — the
    * MassiveText/Gopher-style repetitious-text filters: duplicate-token
    * fraction, duplicate-bigram fraction, and the most-frequent-token
    * share, plus a composite pass/fail flag. The corpus has no line
    * structure, so the line-level rules collapse to their token/n-gram
    * counterparts.
    *
    * Shape: one scan; array metrics are per-row column ops (distinct
    * bigram count via the native [[graft.expressions.ShinglesExpr]]
    * kernel), the top-token share is the classic word-count shape —
    * explode, partial-agg by (doc, token), max by doc — so the shuffle
    * carries (doc_id, token, count) triples after map-side combine,
    * never texts. All ratios are pround4'd and the flag compares the
    * ROUNDED values (oracle parity rule). */
  def repetition(docs: DataFrame, flagThreshold: Double = 0.2): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    // Two selects, not one: with the metrics and explode(toks) in a single
    // projection the analyzer hoists the metric expressions ABOVE the
    // Generate, recomputing array_distinct/shingles over the full token
    // array once per exploded TOKEN (O(tokens²) per doc — measured 4.9s at
    // sf0.1). Splitting keeps them in the per-document projection below the
    // Generate; results are bit-identical.
    val perDocArrays = docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq"),
      (size(toks) - 1).cast("long").as("n_bigrams"),
      size(TextOps.shingles(toks, 2)).cast("long").as("n_uniq_bigrams"),
      toks.as("toks"))
    val perDoc = perDocArrays.select(
        col("doc_id"), col("n_tokens"), col("n_uniq"), col("n_bigrams"),
        col("n_uniq_bigrams"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "n_tokens", "n_uniq", "n_bigrams", "n_uniq_bigrams", "tok")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "n_tokens", "n_uniq", "n_bigrams", "n_uniq_bigrams")
      .agg(max(col("cnt")).as("top_cnt"))
    // identical IEEE shapes on both engines; n_bigrams <= 0 -> null ratio
    val dupTok = pround4(lit(1.0) - col("n_uniq") / col("n_tokens"))
    val dupBi = pround4(lit(1.0) -
      col("n_uniq_bigrams") / when(col("n_bigrams") > 0, col("n_bigrams")))
    val topTok = pround4(col("top_cnt") / col("n_tokens"))
    perDoc.select(
      col("doc_id"), col("n_tokens"),
      dupTok.as("dup_token_frac"),
      dupBi.as("dup_bigram_frac"),
      topTok.as("top_token_frac"),
      when(dupBi > flagThreshold || topTok > flagThreshold, lit(1L)).otherwise(lit(0L))
        .as("flag_repetitive"))
  }

  /** TF-IDF top-k keywords per document (SURVEY.md §2.11 R26). IDF is the
    * log-free rational form `n_docs / df` — log is only a monotone squash
    * per term and `Math.log`/`std::log` are not guaranteed to round
    * identically across engines, while `(tf * n_docs) / df` is exact int64
    * arithmetic followed by one IEEE division, bit-identical everywhere
    * (the same reasoning as the cents rule for money).
    *
    * Shape: explode → (doc, term) partial+final count (shuffle 1, keys are
    * tokens not texts); the tf aggregate is persisted (tracked
    * [[Caching]]) because both the score join and the df derivation
    * consume it — without the persist each branch re-runs the whole
    * explode+count pipeline; the tf⋈df join is on `term` (AQE broadcasts
    * if the vocabulary is small; at 100 TB vocabulary it stays a shuffle
    * join); n_docs is a broadcast 1-row aggregate, not a driver action;
    * top-k is one window per doc over k′ ≪ vocab candidate rows. */
  def tfidfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .transform(Caching.persisted)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", pround4((col("tf") * col("n_docs")) / col("df")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rn")
  }

  // PII patterns — deliberately plain regex (character classes, counted
  // repetition, no lookaround) so Java's engine (Spark) and RE2 (DuckDB
  // oracle) match identically.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "(\\d{1,3}\\.){3}\\d{1,3}"
  val phoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** Deterministic PII-bearing corpus: appends synthetic contact strings
    * derived from `doc_id` to subsets of docs (the clean synthetic corpus
    * contains none) — the [[Multimodal.synthesize]] precedent, standing in
    * for real dirty text so the detection/redaction path is exercised and
    * oracle-replayable end-to-end. */
  def synthesizePii(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com now")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" host 10."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".0.1 up")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"), lit("-0199 soon")))
          .otherwise(lit(""))
      ).as("text"))

  /** PII detection + redaction (SURVEY.md §2.11 R25) — the corpus-cleaning
    * pass every training pipeline runs before release: per-doc match
    * counts for email / IPv4 / phone patterns and an md5 of the redacted
    * text (emails first, then IPs, then phones — the placeholders contain
    * no digits or `@`, so later passes never re-match earlier ones).
    *
    * Shape: a pure per-row codegen'd projection — no shuffle, no state;
    * at 100 TB this is scan-bound and embarrassingly parallel. The md5
    * keeps the verified output narrow (16 bytes/doc, not redacted
    * bodies). */
  def pii(docs: DataFrame): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), lit(emailRe), lit("[EMAIL]")),
          lit(ipv4Re), lit("[IP]")),
        lit(phoneRe), lit("[PHONE]"))
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(ipv4Re), lit(0))).cast("long").as("n_ipv4"),
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
      md5(redacted).as("redacted_md5"))
  }

  /** Bigram-LM surprisal scoring — the CCNet-style quality filter: score
    * each document by how surprising its token bigrams are under a bigram
    * model trained on the corpus itself (high surprisal ⇒ gibberish /
    * boilerplate-free tail; low ⇒ formulaic text). The classic score is
    * Σ −log₂ p(w₂|w₁) = Σ (log₂ c(w₁) − log₂ c(w₁w₂)) — IEEE logs would
    * be un-oracleable, so the surprisal is taken at integer floor-log₂
    * resolution via `length(bin(count))` (the binary digit count, exact
    * in any engine): bits = len(bin(c₁)) − len(bin(c₁₂)) per bigram,
    * within 1 bit of the real log-ratio and EXACT as arithmetic. Output
    * per doc: bigram count, total bits, and milli-bits/bigram
    * (`total·1000 DIV n` — integer, no IEEE division).
    *
    * Shape (optimization r16): bigrams form INSIDE the scan projection —
    * the adjacent-token zip of [[Graph.tokenEdges]] (two array slices +
    * arrays_zip + one explode), which replaces the r15 pos-window pass
    * and its shuffle-by-doc + per-doc sort outright; the stream is then
    * persisted HASH-PARTITIONED on (w1, w2), so the c12 count, and the
    * model join back onto the stream, reuse that one exchange (guide
    * §2.4). c1 aggregates from the vocab-sized c12 (Σ_w2 c12 = c1 —
    * counted tuples, never the stream again). Remaining corpus-sized
    * exchanges: the (w1, w2) partition and the final per-doc
    * aggregation — down from four (window, two join shuffles, agg) in
    * the r15 form. At 100 TB the model tables are vocab-sized, the
    * per-doc pass is corpus-sized, nothing is quadratic. */
  def bigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bigrams = Caching.persisted(
      docs.select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("w"))
        .select(col("doc_id"),
          slice(col("w"), lit(1), size(col("w")) - 1).as("a"),
          expr("slice(w, 2, size(w) - 1)").as("b"))
        .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("p"))
        .select(col("doc_id"), col("p.a").as("w1"), col("p.b").as("w2"))
        .repartition(col("w1"), col("w2")))
    val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val model = c12.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"),
        (length(bin(col("c1"))) - length(bin(col("c12")))).cast("long").as("bits"))
    bigrams.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("bits").as("total_bits"))
      .withColumn("bits_e3", expr("total_bits * 1000 DIV n_bigrams"))
  }

  /** Document NOVELTY — the marginal-contribution / dedup-priority
    * metric: the share of a document's distinct n-grams whose FIRST
    * corpus occurrence (lowest doc_id — ingestion order) is the document
    * itself. A verbatim copy scores 0, fresh text 1.0; curation keeps
    * high-novelty docs first, which is the principled order for dedup
    * retention and curriculum passes. Exact integer ppm.
    *
    * Shape: one shingle explode (the near-dup family's gram pass), one
    * per-gram min aggregation (the "first seen" table — vocab-sized,
    * map-side combined), one join back. Nothing pairwise: novelty is
    * corpus-relative without comparing documents to each other.
    * (Optimization r16 note: pre-partitioning the gram stream on gram —
    * to share the exchange between the aggregation and the join —
    * REGRESSED min-of-2 sweeps by +0.26 s: the first-seen table is
    * broadcast-joined back, so the r15 plan never re-shuffled the
    * stream and the added repartition was a pure extra exchange;
    * reverted, decision recorded here.) */
  def novelty(docs: DataFrame, shingleN: Int = 3): DataFrame = {
    val g = Caching.persisted(docs.select(col("doc_id"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), shingleN)).as("gram")))
    val fo = g.groupBy("gram").agg(min("doc_id").as("first_doc"))
    g.join(fo, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("novel_grams"))
      .withColumn("novelty_ppm", expr("novel_grams * 1000000 DIV n_grams"))
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
