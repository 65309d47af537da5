package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Continuously-maintained EXACT substring-duplication spans — the
  * streaming twin of [[graft.operators.Dedup.duplicateSpanStats]]
  * (R144/x116), SURVEY.md §2.11 R148: per doc, every k-char window
  * occurring in >1 DISTINCT document, merged into maximal spans
  * (gap ≤ k), served as exact counts/ppm — maintained at ingest
  * without ever re-sweeping the corpus.
  *
  * The interesting delta is RETROACTIVE: when a new doc's window hash
  * matches a hash seen in exactly ONE older doc, that older doc's
  * windows become flagged months after it was folded — its span stats
  * must be recomputed even though no row of it arrived. Flags are
  * MONOTONE (a hash's distinct-doc count only grows; spans only extend)
  * so maintenance needs no retraction, but it does need per-doc
  * REPLACE of the served stats (spans coalesce — n_spans can go DOWN
  * while dup_chars grows — so no additive merge exists).
  *
  * State under `stateDir/dupspans/` — three bucketed tables fed from
  * ONE staged delta (the inlined multi-table
  * [[MvPipeline.upsertBucketedStaged]] pattern; every merge idempotent):
  *   - `w/` per-doc window rows `(doc_id, pos, h)`, bucketed by doc —
  *     what a retro recompute reads; the O(total windows) bulk, with
  *     the retention trade below;
  *   - `hidx/` per-hash summary `(h, nd, d1)`, bucketed by h: `nd`
  *     SATURATES at 2 (flagging only needs "one doc vs many" — the doc
  *     LIST is never stored, so this table is O(distinct hashes) not
  *     O(windows)); `d1` = the single holder while nd = 1 — exactly the
  *     doc a 1→2 transition must retro-flag. Monotone semilattice merge;
  *   - `s/` kind-discriminated, bucketed by doc: `m` rows = (doc, len)
  *     once per folded doc (retro recomputes need the length); `s` rows
  *     = the served stats, REPLACED per affected doc.
  *
  * Per batch, everything is Δ-against-state and bucket-pruned: the
  * batch's hashes probe `hidx` (by hash buckets) for flag status and
  * 1→2 transitions; transition targets' windows and lengths read from
  * `w`/`s` (by doc buckets); span recomputation runs ONLY over affected
  * docs (batch docs + retro targets) with the SAME window-function
  * island code as the batch operator — identical flags ⇒ identical
  * spans ⇒ the served stats equal the batch sweep over everything
  * folded, after every batch.
  *
  * Retention trade ([[compact]]): freezing docs drops their `w` rows
  * (the corpus-sized bulk). Frozen docs' STATS stay served and their
  * hashes stay in `hidx` — so NEW docs still get flagged against frozen
  * text — but a 1→2 transition whose sole holder is frozen can no
  * longer update that frozen doc's own stats (they freeze at their
  * pre-compaction values; the recompute finds no windows and leaves the
  * old row — the documented horizon loss, mirroring the near-dup
  * compact contract).
  *
  * Contracts: doc ids arrive in exactly one batch (the standing corpus
  * contract; within-batch duplicates keep the max text
  * deterministically); replay re-applies the staged delta byte-
  * identically. Self-repeats within one doc do NOT flag (distinct-DOC
  * rule, as batch). */
object IncrementalDupSpans {

  private val wSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("pos", LongType),
    StructField("h", StringType)))
  private val hSchema = StructType(Seq(
    StructField("h", StringType), StructField("nd", LongType),
    StructField("d1", LongType)))
  private val sSchema = StructType(Seq(
    StructField("kind", StringType), StructField("doc_id", LongType),
    StructField("len", LongType), StructField("n_dup_windows", LongType),
    StructField("n_spans", LongType), StructField("dup_chars", LongType),
    StructField("dup_ppm", LongType)))

  /** Fold one micro-batch of `(idCol, textCol)` docs. `k` must match
    * across batches (the standing parameter contract). */
  def processBatch(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 40, stateDir: String, batchId: Long = -1L,
      numBuckets: Int = 16): Unit = {
    require(k >= 2, s"window length k must be >= 2, got $k")
    val spark = docs.sparkSession
    val path = s"$stateDir/dupspans"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")

    def computeDelta(): DataFrame = {
      val d = docs
        .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
        .groupBy("doc_id").agg(max(col("text")).as("text"))
        .withColumn("len", length(col("text")).cast("long"))
        .transform(graft.operators.Caching.persisted)
      // batch windows — the same explode+md5 kernel as the batch operator
      val winsB = d.filter(col("len") >= k)
        .select(col("doc_id"),
          explode(sequence(lit(1L), col("len") - (k - 1))).as("pos"),
          col("text"))
        .select(col("doc_id"), col("pos"),
          md5(col("text").substr(col("pos"), lit(k))).as("h"))
        .transform(graft.operators.Caching.persisted)
      val hb = winsB.select("h", "doc_id").distinct()
        .groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nbd"), min(col("doc_id")).as("minbd"))
        .transform(graft.operators.Caching.persisted)

      // probe 1 (pruned by the batch's hash buckets): flag status + the
      // 1→2 transitions whose sole holder is an OLD doc
      val probe1 = MvPipeline.readBuckets(spark, s"$path/hidx",
          MvPipeline.bucketIdsOf(hb, Seq("h"), numBuckets), hSchema)
        .transform(graft.operators.Caching.persisted)
      val retroDocs = hb.join(probe1, Seq("h"))
        .filter(col("nd") === 1 &&
          (col("nbd") >= 2 || !(col("minbd") <=> col("d1"))))
        .select(col("d1").as("doc_id")).distinct()
        .join(d.select("doc_id"), Seq("doc_id"), "left_anti")
        .transform(graft.operators.Caching.persisted)

      // retro targets' stored windows + lengths (pruned by doc buckets)
      val retroBuckets = MvPipeline.bucketIdsOf(retroDocs, Seq("doc_id"), numBuckets)
      val wRetro = MvPipeline.readBuckets(spark, s"$path/w", retroBuckets, wSchema)
        .join(retroDocs, Seq("doc_id"), "left_semi")
        .transform(graft.operators.Caching.persisted)
      val winsAff = winsB.unionByName(wRetro)
        .transform(graft.operators.Caching.persisted)

      // probe 2 (superset of probe 1: retro docs' OTHER hashes too) —
      // a window is flagged iff its hash has ≥2 distinct docs across
      // state ∪ batch, computed relationally from (nd, d1) + (nbd, minbd)
      val probe2 = MvPipeline.readBuckets(spark, s"$path/hidx",
          MvPipeline.bucketIdsOf(winsAff.select("h"), Seq("h"), numBuckets), hSchema)
        .transform(graft.operators.Caching.persisted)
      val flagged = winsAff
        .join(probe2, Seq("h"), "left")
        .join(hb, Seq("h"), "left")
        .withColumn("nbd", coalesce(col("nbd"), lit(0L)))
        .filter(
          col("nd") >= 2 ||
          (col("nd") === 1 &&
            (col("nbd") >= 2 || (col("nbd") === 1 && !(col("minbd") <=> col("d1"))))) ||
          (col("nd").isNull && col("nbd") >= 2))
        .select("doc_id", "pos")

      // island merge per affected doc — the batch operator's exact code
      val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      val spans = flagged
        .withColumn("brk",
          when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, 0L).otherwise(1L))
        .withColumn("span_id", sum(col("brk")).over(
          byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("doc_id", "span_id")
        .agg(min(col("pos")).as("a"), max(col("pos")).as("b"), count(lit(1)).as("nw"))
        .groupBy("doc_id")
        .agg(sum(col("nw")).as("n_dup_windows"), count(lit(1)).as("n_spans"),
          sum(col("b") - col("a") + k).as("dup_chars"))
      // lengths: batch docs from the batch, retro docs from their m rows
      val metaRetro = MvPipeline.readBuckets(spark, s"$path/s", retroBuckets, sSchema)
        .filter(col("kind") === "m")
        .join(retroDocs, Seq("doc_id"), "left_semi")
        .select("doc_id", "len")
      val lens = d.select("doc_id", "len").unionByName(metaRetro)
      val stats = spans.join(lens, "doc_id")
        .withColumn("dup_ppm", expr("dup_chars * 1000000 DIV len"))

      val nil = lit(null).cast("long")
      val nils = lit(null).cast("string")
      val wDelta = winsB.select(lit("w").as("tbl"), col("doc_id"), col("pos"),
        col("h"), nil.as("len"), nil.as("nw"), nil.as("ns"), nil.as("dc"), nil.as("ppm"))
      val xDelta = winsB.select("h", "doc_id").distinct()
        .select(lit("x").as("tbl"), col("doc_id"), nil.as("pos"), col("h"),
          nil.as("len"), nil.as("nw"), nil.as("ns"), nil.as("dc"), nil.as("ppm"))
      val mDelta = d.filter(col("len") >= k)
        .select(lit("m").as("tbl"), col("doc_id"), nil.as("pos"), nils.as("h"),
          col("len"), nil.as("nw"), nil.as("ns"), nil.as("dc"), nil.as("ppm"))
      val sDelta = stats.select(lit("s").as("tbl"), col("doc_id"), nil.as("pos"),
        nils.as("h"), col("len"), col("n_dup_windows").as("nw"),
        col("n_spans").as("ns"), col("dup_chars").as("dc"), col("dup_ppm").as("ppm"))
      wDelta.unionByName(xDelta).unionByName(mDelta).unionByName(sDelta)
    }

    try {
      if (!(batchId >= 0 && fs.exists(staged))) {
        val tmp = new Path(s"$path/$stagedName.tmp")
        computeDelta().write.mode("overwrite").parquet(tmp.toString)
        fs.delete(staged, true)
        require(fs.rename(tmp, staged), s"stage delta $staged")
      }
      val delta = spark.read.parquet(staged.toString).persist()
      // three independent marker-guarded tables — applied CONCURRENTLY
      try MvPipeline.applyConcurrently(Seq(
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "w").select("doc_id", "pos", "h"),
          s"$path/w", (old, inc) => old.unionByName(inc).distinct(),
          batchId, numBuckets, Seq("doc_id")),
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl") === "x").select("h", "doc_id"),
          s"$path/hidx", mergeHidx, batchId, numBuckets, Seq("h")),
        () => MvPipeline.upsertBucketedMerge(
          delta.filter(col("tbl").isin("m", "s"))
            .select(col("tbl").as("kind"), col("doc_id"), col("len"),
              col("nw").as("n_dup_windows"), col("ns").as("n_spans"),
              col("dc").as("dup_chars"), col("ppm").as("dup_ppm")),
          s"$path/s", mergeS, batchId, numBuckets, Seq("doc_id"))))
      finally delta.unpersist()
      if (fs.exists(new Path(path)))
        fs.listStatus(new Path(path))
          .filter(s => s.getPath.getName.startsWith("_delta_"))
          .foreach(s => fs.delete(s.getPath, true))
    } finally graft.operators.Caching.releaseAll()
  }

  /** Per-bucket hash-summary merge: the incoming `(h, doc)` pairs fold
    * into the saturating `(nd, d1)` summary — nd only grows (capped at
    * 2), d1 is the min holder while nd = 1. Monotone ⇒ idempotent. */
  private def mergeHidx(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("nd")) old
      else old.select(col("h"), lit(null).cast("long").as("nd"),
        lit(null).cast("long").as("d1")).limit(0)
    val incAgg = inc.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nbd"), min(col("doc_id")).as("minbd"))
    o.join(incAgg, Seq("h"), "full_outer")
      .select(col("h"),
        when(col("nd") >= 2, 2L)
          .when(col("nd") === 1,
            when(col("nbd") >= 2 ||
              (col("nbd") === 1 && !(col("minbd") <=> col("d1"))), 2L).otherwise(1L))
          .otherwise(least(col("nbd"), lit(2L))).as("nd"),
        least(coalesce(col("d1"), col("minbd")),
          coalesce(col("minbd"), col("d1"))).as("d1"))
  }

  /** Per-bucket meta/stats merge: `m` rows are write-once per doc
    * (distinct union), `s` rows REPLACE per doc. */
  private def mergeS(old: DataFrame, inc: DataFrame): DataFrame = {
    val o = if (old.columns.contains("kind")) old else inc.limit(0)
    val m = o.filter(col("kind") === "m")
      .unionByName(inc.filter(col("kind") === "m")).distinct()
    val sDocs = inc.filter(col("kind") === "s").select("doc_id").distinct()
    val s = o.filter(col("kind") === "s")
      .join(sDocs, Seq("doc_id"), "left_anti")
      .unionByName(inc.filter(col("kind") === "s"))
    m.unionByName(s)
  }

  /** The served view — column-identical to the batch
    * [[graft.operators.Dedup.duplicateSpanStats]] (docs with zero
    * flagged windows absent, as batch). */
  def stats(spark: SparkSession, stateDir: String): DataFrame =
    MvPipeline.readBucketedStateOrEmpty(spark, s"$stateDir/dupspans/s", sSchema)
      .filter(col("kind") === "s")
      .select("doc_id", "len", "n_dup_windows", "n_spans", "dup_chars", "dup_ppm")

  /** Retention compaction: drop frozen docs' `w` rows (the corpus-sized
    * bulk; `hidx`/`m`/`s` rows stay — see the class doc's horizon
    * contract). Returns rows dropped. */
  def compact(spark: SparkSession, stateDir: String,
      frozen: org.apache.spark.sql.Column): Long = {
    val base = new Path(s"$stateDir/dupspans/w")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return 0L
    fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
      .map(b => MvPipeline.expireState(spark, b.getPath.toString, !frozen))
      .sum
  }

  /** Doc-local forget — the dup-spans member of the R147 family, with
    * an honest CONSERVATIVE contract: the forgotten docs' window, meta,
    * and stats rows are removed (their text is no longer served or
    * retro-updatable), but the hash summaries deliberately keep
    * counting them — `hidx` stores a saturating count and never a doc
    * list (the design choice that keeps it O(distinct hashes)), so
    * decrementing is impossible without corpus-sized state. The
    * consequence is OVER-flagging relative to a fresh sweep: a doc
    * whose only duplicate partner was forgotten stays flagged, and a
    * future doc matching only forgotten text gets flagged — the safe
    * direction for a dedup curation pass (never under-flags). A 1→2
    * transition that targets a forgotten holder skips gracefully (no
    * rows to recompute, same as the compaction horizon). Ids are
    * collected to the driver — forget requests are operationally
    * bounded, and `maxIds` guards the collect (the
    * collectPairsPrimitive rule: never an unbounded driver fetch);
    * rebuild the view for corpus-scale removals. */
  def forget(spark: SparkSession, stateDir: String, ids: DataFrame,
      numBuckets: Int = 16, maxIds: Long = 1000000L): Long = {
    val f = ids.select(col(ids.columns.head).cast("long").as("doc_id")).distinct()
      .persist()
    try {
      val nIds = f.count()
      require(nIds <= maxIds,
        s"forget request of $nIds ids exceeds the driver-collect guard " +
          s"($maxIds); chunk the request or rebuild the view for " +
          "corpus-scale removals")
    } catch { case e: Throwable => f.unpersist(); throw e }
    val idList = f.collect().map(_.getLong(0)).toSeq
    f.unpersist()
    if (idList.isEmpty) return 0L
    // numBuckets must match the folds' (the standing parameter contract)
    val buckets = MvPipeline.bucketIdsOf(f, Seq("doc_id"), numBuckets)
    def sweep(table: String): Long = {
      val base = new Path(s"$stateDir/dupspans/$table")
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(base)) return 0L
      fs.listStatus(base)
        .filter(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
        .filter(s => buckets.contains(s.getPath.getName.stripPrefix("bucket=").toLong))
        .map(b => MvPipeline.expireState(spark, b.getPath.toString,
          !col("doc_id").isin(idList: _*)))
        .sum
    }
    sweep("w") + sweep("s")
  }

  /** Continuous maintenance over JSON-line files with `schema`. */
  def start(spark: SparkSession, inputDir: String,
      schema: StructType, stateDir: String, checkpointDir: String,
      idCol: String, textCol: String, k: Int = 40,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, idCol, textCol, k, stateDir, batchId)
      }
      .start()
}
