package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.InvertedIndex

/** Incremental (streaming) maintenance of the inverted index — the
  * reference's push-based MV mechanism (`/root/reference/README.md:31-41`:
  * every insert block incrementally folds into its summary tables) applied
  * to the repo's extension-side index ([[graft.operators.InvertedIndex]]).
  *
  * Why this works as a pure merge: every measure of `postings` is an
  * ABELIAN-GROUP aggregate of per-(token, doc) contributions —
  *  - `df` and `total_tf` are additive counts,
  *  - `postings_fp` is the XOR of per-doc hashes, which is commutative,
  *    associative AND self-inverse,
  * so a micro-batch's postings fold into existing state with `SUM` /
  * `bit_xor` per token, and any arrival order converges to the one-shot
  * batch answer (the incremental == batch contract, tested in
  * IncrementalIndexSpec). Self-inversion buys retraction for free:
  * merging a doc's postings a second time REMOVES it from the
  * fingerprint while [[retract]] subtracts its counts — a deleted doc is
  * an increment with negated df/tf and the same fp.
  *
  * Precondition (same as the reference's MVs over an append-only log):
  * each document id arrives in exactly ONE micro-batch — Spark's
  * checkpointed file/tail sources + the replay-idempotent
  * [[MvPipeline.upsertWith]] marker provide exactly that. Re-ingesting a
  * doc under a NEW batch id would double-count df/tf (and erase it from
  * the fingerprint); dedup upstream ([[StreamingDedup]]) if the source
  * can repeat ids.
  *
  * 100 TB design: identical shape to the batch path — the micro-batch
  * explode shuffles (token, doc, count) tuples only, and the state merge
  * is a partial+final aggregation over O(vocabulary) rows, not O(corpus).
  * Head (stopword) tokens still cost 8 bytes of aggregation state. The
  * parquet swap rewrites O(vocabulary) rows per batch; swap for a
  * transactional MERGE sink when the vocabulary outgrows one table (the
  * merge expressions are sink-portable: SUM + XOR exist everywhere).
  */
object IncrementalIndex {

  /** Per-measure merge aggregates: counts add, the fingerprint XORs. */
  def mergeAgg(c: String): Column = c match {
    case "postings_fp" => expr("bit_xor(postings_fp)")
    case other         => sum(col(other))
  }

  /** Fold one micro-batch of documents into the three index state tables:
    * the per-token stats summary, the per-(token, doc) postings DETAIL,
    * and the per-doc length summary — the latter two are what the BM25
    * read path ([[searchBm25]]) consumes. All three are abelian-group
    * merges, so batching order converges to the batch answer. */
  def processBatch(docs: DataFrame, stateDir: String, batchId: Long = -1L,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    MvPipeline.upsertWith(InvertedIndex.postings(docs, idCol, textCol),
      s"$stateDir/inverted_index", Seq("token"), mergeAgg, batchId)
    MvPipeline.upsertWith(InvertedIndex.postingsDetail(docs, idCol, textCol),
      s"$stateDir/postings", Seq("token", "doc_id"), sum(_), batchId)
    MvPipeline.upsertWith(InvertedIndex.docLengths(docs, idCol, textCol),
      s"$stateDir/doc_lens", Seq("doc_id"), sum(_), batchId)
  }

  /** Remove documents from the index: negate the additive measures, keep
    * the self-inverse fingerprint (XOR-ing a doc's hash again deletes it).
    * Tokens whose df reaches 0 are dropped from state on the next merge
    * read via [[compact]]. */
  def retract(docs: DataFrame, stateDir: String, batchId: Long = -1L,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val negated = InvertedIndex.postings(docs, idCol, textCol)
      .withColumn("df", -col("df"))
      .withColumn("total_tf", -col("total_tf"))
    MvPipeline.upsertWith(negated, s"$stateDir/inverted_index", Seq("token"),
      mergeAgg, batchId)
    MvPipeline.upsertWith(
      InvertedIndex.postingsDetail(docs, idCol, textCol).withColumn("tf", -col("tf")),
      s"$stateDir/postings", Seq("token", "doc_id"), sum(_), batchId)
    MvPipeline.upsertWith(
      InvertedIndex.docLengths(docs, idCol, textCol).withColumn("dl", -col("dl")),
      s"$stateDir/doc_lens", Seq("doc_id"), sum(_), batchId)
  }

  /** Drop fully-retracted rows (df/tf/dl == 0) from the state tables. */
  def compact(spark: SparkSession, stateDir: String): Unit = {
    def sweep(path: String, liveCol: String): Unit = {
      if (!new java.io.File(path).exists()) return
      val live = spark.read.parquet(path).filter(col(liveCol) > 0).persist()
      live.count() // materialize before overwriting the table being read
      try live.write.mode("overwrite").parquet(path + ".tmp")
      finally live.unpersist()
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      require(fs.rename(new org.apache.hadoop.fs.Path(path + ".tmp"),
        new org.apache.hadoop.fs.Path(path)), s"commit compact $path")
    }
    sweep(s"$stateDir/inverted_index", "df")
    sweep(s"$stateDir/postings", "tf")
    sweep(s"$stateDir/doc_lens", "dl")
  }

  /** BM25 ranked retrieval served ENTIRELY from maintained state — the
    * read path the index is maintained for (no corpus anywhere in the
    * plan; postings + doc-length summaries only). */
  def searchBm25(spark: SparkSession, stateDir: String, queryTerms: Seq[String],
      k: Int): DataFrame =
    InvertedIndex.bm25TopK(
      MvPipeline.readState(spark, stateDir, "postings"),
      MvPipeline.readState(spark, stateDir, "doc_lens"),
      queryTerms, k)

  /** [[processBatch]] with the BUCKETED state layout
    * ([[MvPipeline.upsertBucketed]]) for the two tables that grow with
    * the corpus — postings detail (O(vocab × docs), bucketed by token so
    * a query term's postings live in one bucket) and doc lengths
    * (O(docs), bucketed by doc_id). A batch rewrites only the buckets its
    * keys hash into; the O(vocab) stats summary keeps the plain layout.
    * Same abelian merges, same per-bucket marker idempotence. */
  def processBatchBucketed(docs: DataFrame, stateDir: String, batchId: Long = -1L,
      numBuckets: Int = 16, idCol: String = "doc_id", textCol: String = "text"): Unit = {
    MvPipeline.upsertWith(InvertedIndex.postings(docs, idCol, textCol),
      s"$stateDir/inverted_index", Seq("token"), mergeAgg, batchId)
    MvPipeline.upsertBucketed(InvertedIndex.postingsDetail(docs, idCol, textCol),
      s"$stateDir/postings", Seq("token", "doc_id"), sum(_), batchId,
      numBuckets, bucketKeys = Seq("token"))
    MvPipeline.upsertBucketed(InvertedIndex.docLengths(docs, idCol, textCol),
      s"$stateDir/doc_lens", Seq("doc_id"), sum(_), batchId, numBuckets)
  }

  /** [[searchBm25]] over the bucketed layout. */
  def searchBm25Bucketed(spark: SparkSession, stateDir: String,
      queryTerms: Seq[String], k: Int): DataFrame =
    InvertedIndex.bm25TopK(
      MvPipeline.readBucketedState(spark, s"$stateDir/postings"),
      MvPipeline.readBucketedState(spark, s"$stateDir/doc_lens"),
      queryTerms, k)

  /** Maintain the POSITIONAL postings state. A (token, doc) row's
    * position list is static once the doc arrives, and each doc arrives
    * in exactly one batch (the [[IncrementalIndex]] precondition), so
    * increments are key-disjoint from state and the merge is a plain
    * union — no re-aggregation, O(Δ) new rows. No retraction path
    * (position lists aren't abelian); rebuild on delete-heavy sources. */
  def processBatchPositional(docs: DataFrame, stateDir: String, batchId: Long = -1L,
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    MvPipeline.upsertMerge(InvertedIndex.positionalPostings(docs, idCol, textCol),
      s"$stateDir/positional", (old, inc) => old.unionByName(inc), batchId)

  /** Exact phrase search served entirely from the maintained positional
    * state ([[InvertedIndex.phraseSearch]]). */
  def searchPhrase(spark: SparkSession, stateDir: String,
      phrase: Seq[String]): DataFrame =
    InvertedIndex.phraseSearch(
      MvPipeline.readState(spark, stateDir, "positional"), phrase)

  /** [[processBatchPositional]] in the BUCKETED layout, bucketed by
    * token like the BM25 postings — a phrase read opens only its
    * terms' buckets instead of relying on row-group pruning over one
    * table, and the SQL surface ([[SqlCatalog.phraseRead]]) can bind
    * it as a partitioned state table. Same disjoint-key union merge. */
  def processBatchPositionalBucketed(docs: DataFrame, stateDir: String,
      batchId: Long = -1L, numBuckets: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    MvPipeline.upsertBucketedMerge(
      InvertedIndex.positionalPostings(docs, idCol, textCol),
      s"$stateDir/positional", (old, inc) => old.unionByName(inc),
      batchId, numBuckets, bucketKeys = Seq("token"))

  /** [[searchPhrase]] over the bucketed layout: read ONLY the buckets
    * the phrase's terms hash into (≤ terms, never O(index)). */
  def searchPhraseBucketed(spark: SparkSession, stateDir: String,
      phrase: Seq[String], numBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    val path = s"$stateDir/positional"
    MvPipeline.assertReadLayout(spark, path, numBuckets, 1,
      "searchPhraseBucketed")
    val ids = MvPipeline.bucketIdsOf(phrase.distinct.toDF("token"),
      Seq("token"), numBuckets)
    InvertedIndex.phraseSearch(
      MvPipeline.readBuckets(spark, path, ids,
        StructType.fromDDL(
          "token STRING, doc_id BIGINT, positions ARRAY<INT>")),
      phrase)
  }

  /** Start continuous maintenance over a directory of document files
    * (JSON-lines with `schema`; `Trigger.AvailableNow()` for tests). */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      stateDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateDir, batchId, idCol, textCol)
      }
      .start()

  /** Read the maintained index state. */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readState(spark, stateDir, "inverted_index")
}
