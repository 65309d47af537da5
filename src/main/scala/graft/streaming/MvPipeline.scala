package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.Querylog
import graft.views.Summaries

/** Streaming materialized-view maintenance — the Spark-native form of the
  * reference's insert-triggered MV fan-out (`/root/reference/README.md`:
  * 8 MVs over one `log2` insert stream; SURVEY.md §3.2 design b).
  *
  * One input stream; each micro-batch is parsed once, `persist()`ed, and all
  * 8 summary transforms run against it inside `foreachBatch`, merging their
  * per-batch increments into per-view state tables (parquet). This mirrors
  * ClickHouse exactly — one insert block drives all MVs — and keeps ONE
  * source read and ONE checkpoint instead of 8.
  *
  * Semantics choices (SURVEY.md §7.3):
  *  - No watermark: the reference accepts arbitrarily late rows (a late row
  *    updates its old 10-minute bucket). State lives in the *sink* tables,
  *    which are merged idempotently per batch — not in the streaming state
  *    store, which would grow without bound under no-watermark semantics.
  *  - Delivery: Spark checkpointing + per-batch idempotent merge gives
  *    effectively-once to the summary tables — strictly stronger than the
  *    reference's fire-and-forget inserts (collector.py:52).
  *
  * 100 TB notes: each view merge is a partial+final aggregation whose
  * shuffle is bounded by key cardinality; the micro-batch persist holds only
  * one batch of parsed rows. The parquet upsert rewrites each summary table
  * per batch — fine while summaries are small relative to the log (their
  * whole point); swap [[upsert]] for a transactional MERGE sink (Delta /
  * ClickHouse `SummingMergeTree` via JDBC appends) when summaries get big:
  * the reference's append-only SummingMergeTree contract is exactly
  * [[appendIncrements]].
  */
object MvPipeline {

  /** Start the fan-out over a directory of querylog JSON-line files.
    * @param trigger `Trigger.AvailableNow()` for tests/backfill, a
    *                processing-time trigger for continuous tailing.
    * @param maxFilesPerTrigger cap files per micro-batch (0 = no cap) —
    *                the replay-cadence knob StreamBench uses to measure
    *                per-batch latency at a controlled batch size. */
  def start(
      spark: SparkSession,
      inputDir: String,
      stateDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 0
  ): StreamingQuery = {
    val reader = spark.readStream.format("text")
    (if (maxFilesPerTrigger > 0) reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else reader)
      .load(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateDir, batchId)
      }
      .start()
  }

  /** Start the fan-out over ONE growing querylog file — the reference's
    * literal layout (`tailer.follow`, collector.py:45): appended complete
    * lines stream in via [[TailFileSource]]; byte offsets checkpoint, so
    * restart resumes mid-file. Use [[start]] for rotated-file directories. */
  def startTailFile(
      spark: SparkSession,
      file: String,
      stateDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    spark.readStream
      .format(classOf[TailFileProvider].getName)
      .load(file)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateDir, batchId)
      }
      .start()

  /** Parse one micro-batch and merge every summary view's increment.
    * The parsed batch is computed once (persist + materialize), then the 8
    * view merges run as CONCURRENT Spark jobs — each is a small aggregation
    * that would leave most executors idle if run serially; concurrency
    * overlaps their scheduling and IO, the analogue of ClickHouse firing
    * all MV triggers per inserted block.
    *
    * @param batchId streaming micro-batch id for replay idempotence; pass a
    *                negative id for ad-hoc backfills (always merged). */
  def processBatch(lines: DataFrame, stateDir: String, batchId: Long = -1L): Unit = {
    val log2 = Querylog.parse(lines).persist()
    log2.count() // materialize the cache once before the concurrent fan-out
    val pool = java.util.concurrent.Executors.newFixedThreadPool(Summaries.all.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val merges = Summaries.all.toSeq.map { case (name, view) =>
        scala.concurrent.Future(upsert(view(log2), s"$stateDir/$name", Summaries.keys(name), batchId))
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(merges),
        scala.concurrent.duration.Duration.Inf)
    } finally {
      pool.shutdown()
      log2.unpersist()
    }
  }

  /** Merge an increment into a keyed parquet state table: read old state,
    * union, re-sum all measure columns by key, swap directories.
    *
    * Replay idempotence (the merge is additive, so it must NOT reapply): the
    * committed batch id is stored in a `_graft_batch` marker inside the
    * state dir, written to the tmp dir BEFORE the swap so marker and data
    * commit together. A replayed batch (same non-negative id as the marker)
    * is skipped. Crash safety: the old state is renamed aside (not deleted)
    * until the new state is in place, and a leftover `.old` from a crash
    * between the two renames is restored on the next call. */
  def upsert(increment: DataFrame, path: String, keys: Seq[String], batchId: Long = -1L): Unit =
    upsertWith(increment, path, keys, c => sum(col(c)), batchId)

  /** [[upsert]] with a pluggable per-measure merge aggregate — for state
    * whose measures are mergeable but not all SUMs (e.g. the inverted
    * index's XOR posting fingerprint, [[graft.streaming.IncrementalIndex]]).
    * `mergeAgg(c)` must be commutative and associative over column `c` so
    * that any batch arrival order converges to the batch-recompute answer.
    * Same marker/rename crash-safety protocol as [[upsert]]. */
  def upsertWith(increment: DataFrame, path: String, keys: Seq[String],
      mergeAgg: String => org.apache.spark.sql.Column, batchId: Long = -1L): Unit =
    upsertMerge(increment, path, (old, inc) => {
      val measures = inc.columns.filterNot(keys.contains)
      val merges = measures.map(c => mergeAgg(c).as(c))
      old.unionByName(inc)
        .groupBy(keys.map(col): _*)
        .agg(merges.head, merges.tail: _*)
    }, batchId)

  /** The fully-general form: `mergeFn(oldState, increment)` produces the
    * next state — for summaries whose merge is not a per-column aggregate
    * (e.g. the Misra-Gries trim of [[IncrementalHeavyHitters]], which
    * must subtract a global order statistic after combining). `mergeFn`
    * must be associative-in-effect over increments so replay order
    * converges; the marker/rename crash-safety protocol is unchanged.
    *
    * SINGLE-WRITER contract: one streaming query owns a state directory
    * (Spark enforces this upstream via the checkpoint lock; ad-hoc
    * backfills must not run concurrently with the stream). The protocol
    * additionally DETECTS contract violations instead of silently
    * losing an update: the marker carries a per-writer token, and the
    * state read at merge time is validated — after the old state is
    * renamed aside, a marker that no longer matches the one this merge
    * was computed FROM means another writer committed in between; the
    * old state is restored and the merge aborts (retry folds the newer
    * state). The unstamped-tmp/aside recovery semantics are unchanged. */
  def upsertMerge(increment: DataFrame, path: String,
      mergeFn: (DataFrame, DataFrame) => DataFrame, batchId: Long = -1L,
      initWithMerge: Boolean = false): Unit = {
    val spark = increment.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val aside = new Path(path + ".old")
    // recover from a crash that left state renamed aside
    if (!fs.exists(target) && fs.exists(aside)) require(fs.rename(aside, target), s"recover $aside")
    val marker = new Path(path + "/_graft_batch")
    def readMarker(p: Path): Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in).mkString) finally in.close()
      }
    // the marker state this merge is computed FROM (first line = batch id,
    // optional second line = writer token)
    val observed = readMarker(marker)
    if (batchId >= 0)
      observed.map(_.linesIterator.next().trim.toLong).foreach { committed =>
        if (committed == batchId) return // replayed batch: already merged
      }
    // initWithMerge: a view whose mergeFn NORMALIZES rows (collapses
    // per-key duplicates — the bucketed near-dup/funnel lattice merges)
    // must fold its first increment through the merge against empty
    // state, or a fresh bucket would persist raw un-collapsed delta rows
    val merged =
      if (fs.exists(target)) mergeFn(spark.read.parquet(path), increment)
      else if (initWithMerge) mergeFn(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          increment.schema), increment)
      else increment
    val tmp = new Path(path + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // an AD-HOC merge (negative batch id — backfills, compaction folds)
    // must PRESERVE the committed streaming batch id, not stamp −1 over
    // it: erasing it would disarm replay detection for the owning
    // stream's next restart (the expireState rule, applied uniformly).
    // The fresh token still makes this write visible as a writer to the
    // concurrent-writer check.
    val stampId =
      if (batchId >= 0) batchId.toString
      else observed.map(_.linesIterator.next().trim).getOrElse("-1")
    val token = java.util.UUID.randomUUID.toString
    val out = fs.create(new Path(tmp, "_graft_batch"), true)
    try out.write(s"$stampId\n$token".getBytes("UTF-8")) finally out.close()
    fs.delete(aside, true)
    if (fs.exists(target)) {
      require(fs.rename(target, aside), s"stage out $target")
      // concurrent-writer detection: the state we just staged out must be
      // the state this merge was computed from
      val asideMarker = readMarker(new Path(aside, "_graft_batch"))
      if (asideMarker != observed) {
        require(fs.rename(aside, target), s"restore $aside after collision")
        fs.delete(tmp, true)
        throw new IllegalStateException(
          s"concurrent writer detected on $path: state committed by another " +
            s"writer between merge read and swap (expected marker $observed, " +
            s"found $asideMarker); merge aborted and prior state restored")
      }
    }
    require(fs.rename(tmp, target), s"commit $tmp -> $target")
    fs.delete(aside, true)
  }

  /** O(Δ)-cost merge for BIG-state views (VERDICT r6 task 3): [[upsert]]
    * rewrites the WHOLE state table per micro-batch — fine for the 8
    * small summaries (their point is smallness), but an inverted index at
    * web vocabulary or an ANN index at corpus scale cannot pay O(state)
    * per batch. Here state is laid out as `path/bucket=<hash(key) % B>/`
    * directories and a batch rewrites ONLY the buckets containing
    * touched keys: bytes-rewritten ∝ touched buckets, not total state
    * (the SummingMergeTree economics; the ANN index's bucket-dir scheme
    * generalized to arbitrary keyed merges).
    *
    * Crash safety + replay idempotence come from REUSING the single-dir
    * [[upsertWith]] protocol PER BUCKET — each bucket directory carries
    * its own `_graft_batch` marker and rename-aside swap, so a crash
    * midway through the bucket loop is safe: on replay, buckets already
    * stamped with this batch id skip, the rest merge exactly once, and
    * the state converges to the full-batch answer.
    *
    * @param bucketKeys the key subset to hash for bucket layout (default:
    *        all keys). Choosing the read path's probe key (e.g. `token`)
    *        also buys scan pruning: a point lookup reads one bucket. */
  def upsertBucketed(increment: DataFrame, path: String, keys: Seq[String],
      mergeAgg: String => org.apache.spark.sql.Column, batchId: Long = -1L,
      numBuckets: Int = 16, bucketKeys: Seq[String] = Nil): Unit = {
    val bk = if (bucketKeys.nonEmpty) bucketKeys else keys
    ensureLayout(increment.sparkSession, path, numBuckets, 1, bk)
    val inc = increment
      .withColumn("_gb", pmod(xxhash64(bk.map(col): _*), lit(numBuckets.toLong)))
      .persist()
    try {
      // touched-bucket list is bounded by numBuckets, never by state size
      val touched = inc.select("_gb").distinct()
        .collect().map(_.getLong(0)).sorted
      // per-bucket merges are independent single-dir upserts — run them as
      // concurrent jobs (each is small; serial scheduling would idle the
      // cluster), same pattern as processBatch's 8-view fan-out
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, math.max(1, touched.length)))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(touched.toSeq.map { b =>
            scala.concurrent.Future(upsertWith(inc.filter(col("_gb") === b).drop("_gb"),
              s"$path/bucket=$b", keys, mergeAgg, batchId))
          }),
          scala.concurrent.duration.Duration.Inf)
      } finally pool.shutdown()
    } finally inc.unpersist()
  }

  /** SELF-DESCRIBING BUCKETED-STATE LAYOUT (SURVEY §2.11 R177, r14).
    * Every bucketed read reconstructs the writer's routing — the bucket
    * count, the (order-sensitive, xxhash64) bucket-key columns, and the
    * R173 value sub-bucket fan-out — and a caller repeating the WRONG
    * constants silently answers EMPTY (wrong bucket) or PARTIAL (a
    * fraction of a sub-bucketed group); nothing errors. The `_layout`
    * marker closes that class: the bucket-routing writers write it once
    * at table-root creation and VERIFY it on every later fold (a fold
    * with a different B/S/keys is refused before any bucket moves), and
    * the point-read constructors ([[graft.streaming.SqlCatalog]] TVFs,
    * the engines' `viewFor`s) check their caller's (B, S) against it
    * ([[assertReadLayout]]). A legacy dir without a marker passes every
    * check and ADOPTS the marker on its next fold; reshard writes the
    * destination's marker fresh at the new bucket count. */
  final case class Layout(numBuckets: Int, subBuckets: Int,
      bucketKeys: Seq[String])

  /** The `_layout` marker of a bucketed table root, if present. */
  def readLayoutMarker(spark: SparkSession, path: String): Option[Layout] = {
    val p = new Path(s"$path/_layout")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val kv = txt.linesIterator.map(_.split("=", 2))
      .collect { case Array(k, v) => k.trim -> v.trim }.toMap
    for {
      b <- kv.get("B").filter(_.matches("\\d+")).map(_.toInt)
      s <- kv.get("S").filter(_.matches("\\d+")).map(_.toInt)
    } yield Layout(b, s,
      kv.get("keys").map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil))
  }

  /** Writer-side check-or-adopt: refuse a fold whose routing constants
    * disagree with the store's marker; write the marker (tmp + rename)
    * when absent. Called by the bucket-routing writers before any
    * bucket moves. */
  private def ensureLayout(spark: SparkSession, path: String,
      numBuckets: Int, subBuckets: Int, bucketKeys: Seq[String]): Unit = {
    readLayoutMarker(spark, path) match {
      case Some(l) =>
        require(l.numBuckets == numBuckets && l.subBuckets == subBuckets &&
            (l.bucketKeys.isEmpty || l.bucketKeys == bucketKeys),
          s"bucketed-state layout mismatch on $path: the store was written " +
            s"with (numBuckets=${l.numBuckets}, subBuckets=${l.subBuckets}, " +
            s"keys=${l.bucketKeys.mkString(",")}) but this fold routes with " +
            s"(numBuckets=$numBuckets, subBuckets=$subBuckets, " +
            s"keys=${bucketKeys.mkString(",")}) — rows would land in buckets " +
            "no reader at the recorded layout can find. Reshard to change " +
            "the layout; the marker is `_layout` at the table root")
      case None =>
        val fs = new Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(new Path(path))
        val tmp = new Path(s"$path/_layout.tmp")
        val out = fs.create(tmp, true)
        try out.write(
          s"B=$numBuckets\nS=$subBuckets\nkeys=${bucketKeys.mkString(",")}"
            .getBytes("UTF-8"))
        finally out.close()
        fs.delete(new Path(s"$path/_layout"), false)
        require(fs.rename(tmp, new Path(s"$path/_layout")),
          s"commit layout marker on $path")
    }
  }

  /** Reader-side check: refuse a point read whose (B, S) disagree with
    * the store's marker — a wrong B opens the wrong bucket (silently
    * empty), a wrong S aggregates a fraction of a sub-bucketed group.
    * A store without a marker (legacy, or never folded) passes. */
  def assertReadLayout(spark: SparkSession, path: String,
      numBuckets: Int, subBuckets: Int = 1, context: String = "read"): Unit =
    readLayoutMarker(spark, path).foreach { l =>
      require(l.numBuckets == numBuckets && l.subBuckets == subBuckets,
        s"bucketed-state layout mismatch on $path ($context): the store's " +
          s"marker says (numBuckets=${l.numBuckets}, subBuckets=" +
          s"${l.subBuckets}) but the read was constructed with (numBuckets=" +
          s"$numBuckets, subBuckets=$subBuckets) — it would answer empty or " +
          "a fraction of a group, silently. Re-register with the marker's " +
          "constants")
    }

  /** [[upsertBucketed]] generalized to a whole-frame `mergeFn` per bucket
    * (the [[upsertMerge]] form) — for bucketed state whose merge is not a
    * per-column aggregate (kind-discriminated union tables like the
    * streaming near-dup / funnel state). Same per-bucket marker + rename
    * protocol; `mergeFn` must be idempotent-per-increment OR callers must
    * guarantee the increment is identical on replay (see
    * [[upsertBucketedStaged]]). */
  def upsertBucketedMerge(increment: DataFrame, path: String,
      mergeFn: (DataFrame, DataFrame) => DataFrame, batchId: Long = -1L,
      numBuckets: Int = 16, bucketKeys: Seq[String] = Nil,
      subBuckets: Int = 1): Unit = {
    require(bucketKeys.nonEmpty, "bucketKeys required for upsertBucketedMerge")
    // `subBuckets` is purely DESCRIPTIVE here (the routing already rides
    // in bucketKeys, e.g. the derived `sb` column) — it reaches the
    // `_layout` marker so sub-bucket-aware readers can verify their S
    ensureLayout(increment.sparkSession, path, numBuckets, subBuckets,
      bucketKeys)
    val inc = increment
      .withColumn("_gb", pmod(xxhash64(bucketKeys.map(col): _*), lit(numBuckets.toLong)))
      .persist()
    try {
      val touched = inc.select("_gb").distinct()
        .collect().map(_.getLong(0)).sorted
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, math.max(1, touched.length)))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(touched.toSeq.map { b =>
            scala.concurrent.Future(upsertMerge(inc.filter(col("_gb") === b).drop("_gb"),
              s"$path/bucket=$b", mergeFn, batchId, initWithMerge = true))
          }),
          scala.concurrent.duration.Duration.Inf)
      } finally pool.shutdown()
    } finally inc.unpersist()
  }

  /** Compute-once, apply-per-bucket: the bucketed upsert for views whose
    * per-batch delta is a function of the WHOLE pre-batch state (the
    * streaming near-dup and funnel folds — candidates join the full band
    * index, frames re-min against full retained events). The naive port
    * would recompute the delta on crash-replay AGAINST PARTIALLY-APPLIED
    * buckets: already-merged buckets show post-batch state, so the
    * recomputed delta is SMALLER (e.g. a frame already lowered produces
    * no Δ row), and unstamped buckets would permanently miss their
    * updates. Fix: the delta is MATERIALIZED atomically under the batch
    * id (`<path>/_delta_b<id>`, tmp + rename) BEFORE the bucket loop;
    * a replay finds it and re-applies the EXACT original rows — stamped
    * buckets skip via their marker, unstamped buckets converge. After
    * all buckets commit, staged deltas are swept (a later replay then
    * finds every bucket stamped and skips wholesale). Ad-hoc merges
    * (batchId < 0) stage under a unique name — still materialized first,
    * because the lazy delta plan reads the same state the bucket loop
    * mutates. */
  /** A SECONDARY table fed from the same staged delta — e.g. a blocking
    * index mirrored under a probe-key bucketing so candidate-generation
    * reads prune ([[readBuckets]]). `project` selects/reshapes the delta
    * rows for this table; its merge must be idempotent like the main's
    * (a crash between the main and a secondary apply replays the SAME
    * staged rows — stamped buckets skip, the rest converge). One
    * contract beyond the main table's: the projected rows — INCLUDING
    * the bucket-key columns — must be a deterministic function of the
    * batch input (the views' blocking rows are), because a replay AFTER
    * the staged sweep recomputes the delta and relies on it routing to
    * the same (stamped) buckets. A STATE-derived projection (like the
    * label delta) is admissible under one alternative discharge: the
    * secondary's merge is the same semilattice the main table folds
    * those rows with, so a replay-recomputed delta is absorbed by the
    * merge on ANY bucket regardless of routing (the [[LabelMirror]]
    * per-id min — harmlessness from the lattice, not from stamps). */
  final case class StagedSecondary(path: String,
      project: DataFrame => DataFrame,
      mergeFn: (DataFrame, DataFrame) => DataFrame,
      bucketKeys: Seq[String])

  def upsertBucketedStaged(spark: SparkSession, path: String,
      computeDelta: => DataFrame,
      mergeFn: (DataFrame, DataFrame) => DataFrame, batchId: Long = -1L,
      numBuckets: Int = 16, bucketKeys: Seq[String] = Nil,
      secondaries: Seq[StagedSecondary] = Nil,
      artifacts: Seq[(String, DataFrame => DataFrame)] = Nil): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedName =
      if (batchId >= 0) s"_delta_b$batchId"
      else s"_delta_adhoc_${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = new Path(s"$path/$stagedName")
    val preStaged = batchId >= 0 && fs.exists(staged)
    if (!preStaged) {
      val tmp = new Path(s"$path/$stagedName.tmp")
      computeDelta.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(staged, true)
      require(fs.rename(tmp, staged), s"stage delta $staged")
    }
    val delta = spark.read.parquet(staged.toString)
    // durable per-batch ARTIFACTS (e.g. the moved-keys log a derived
    // consumer reads, R176) stage BEFORE any bucket applies: in the only
    // window where an artifact is missing but the delta exists, NOTHING
    // has been applied yet, so an artifact projection may read pre-batch
    // state. They live OUTSIDE `path`'s `_delta_` sweep and survive the
    // fold; the consumer owns their lifecycle.
    //
    // GUARD (ADVICE r13): "nothing applied yet" holds only when the
    // artifact was configured on the FIRST attempt. A replay that finds
    // a pre-staged delta but a MISSING artifact (the run that staged the
    // delta ran without `artifacts`, or a consumer swept it and this is
    // a replay after the sweep) may be resuming a crash mid-bucket-loop
    // — an artifact computed NOW would be f(delta) against PARTIALLY-
    // applied state (e.g. a half-updated label mirror logs old == new
    // and silently drops the true old coordinate). Refuse exactly that
    // window: pre-staged delta + missing artifact + any target bucket
    // already stamped with this batch (the forget path's staged/mv
    // require, mirrored).
    if (preStaged && artifacts.exists { case (p, _) => !fs.exists(new Path(p)) }) {
      val stamped = fs.exists(new Path(path)) && fs.listStatus(new Path(path))
        .filter(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
        .exists(b => bucketStamp(fs, b.getPath) == batchId)
      require(!stamped,
        s"refusing to stage artifact for batch $batchId of $path: a staged " +
          "delta exists, the artifact does not, and target buckets already " +
          "carry this batch's replay stamp — the artifact would be computed " +
          "against partially-applied state. Finish the bucket applies " +
          "WITHOUT the artifact (re-run with artifacts = Nil), then rebuild " +
          "the consumer from post-state, or restore the swept artifact")
    }
    artifacts.foreach { case (p, f) => stageArtifact(spark, p)(f(delta)) }
    upsertBucketedMerge(delta, path, mergeFn, batchId, numBuckets, bucketKeys)
    secondaries.foreach { s =>
      upsertBucketedMerge(s.project(delta), s.path, s.mergeFn, batchId,
        numBuckets, s.bucketKeys)
    }
    // success: sweep this and any stale staged deltas (single-writer +
    // in-order replay means an older leftover's batch already applied).
    // The sweep runs only after EVERY table applied — a crash before
    // this point leaves the staged delta for the replay to re-apply.
    if (fs.exists(new Path(path)))
      fs.listStatus(new Path(path))
        .filter(s => s.getPath.getName.startsWith("_delta_"))
        .foreach(s => fs.delete(s.getPath, true))
  }

  /** Changelog-prefix compaction for the family's kind-discriminated
    * `a/` tables (shared by the star and temporal engines): fold the
    * `kind = 'c', b <= upTo` rows into ONE baseline row per group
    * stamped `upTo`; measure columns are data-driven (`m, m2..mM` —
    * the R161 multi-measure layout). As-of reads stay exact at and
    * above the floor. */
  def compactChangelogA(spark: SparkSession, aPath: String, upTo: Long): Unit =
    transformBuckets(spark, aPath, old => {
      val pre = old.filter(col("kind") === "c" && col("b") <= upTo)
      val ms = old.columns.filter(c => c == "m" || c.matches("m\\d+")).toSeq
      val aggs = ms.map(c => sum(col(c)).as(c))
      val baseline = pre.groupBy("g")
        .agg(aggs.head, (aggs.tail :+ sum(col("c")).as("c")): _*)
        .filter((ms.map(c => col(c) =!= 0) :+ (col("c") =!= 0)).reduce(_ || _))
        .select(Seq(lit("c").as("kind"), col("g"), lit(upTo).as("b")) ++
          ms.map(col) ++ Seq(col("c")): _*)
      old.filter(!(col("kind") === "c" && col("b") <= upTo))
        .unionByName(baseline)
    })

  /** RESHARD a bucketed table into a FRESH destination at a new bucket
    * count — the WRITE-side half of the bucket-size control knob (the
    * read side is already free: state reads are one multi-path scan
    * over whatever bucket dirs exist, and pruned reads recompute the
    * hash at the caller's bucket count). At 100 TB this is the
    * operational answer to bucket growth: when per-bucket bytes exceed
    * the executor-memory budget, reshard to 2× buckets and resume
    * folding with the new `numBuckets` — per-batch cost per bucket
    * halves, the touched-bucket FRACTION is unchanged. An OFFLINE
    * maintenance op between committed batches: the destination must
    * not exist (the bootstrap rule, crash-safe by construction — a
    * partial destination is deleted and the reshard re-run; the source
    * is never touched). Per-bucket replay stamps do NOT carry over;
    * the ENGINE reshard wrappers therefore stamp the destination with
    * a [[writeResumeFloor]] marker and their `processBatch` refuses
    * batch ids at or below it — callers of this per-table primitive
    * outside those wrappers still own the resume discipline. */
  def reshardBucketed(spark: SparkSession, srcPath: String, dstPath: String,
      newBuckets: Int, bucketKeys: Seq[String]): Unit = {
    val src = new Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(dstPath)),
      s"reshard requires a fresh destination, found $dstPath")
    val any = fs.exists(src) && fs.listStatus(src)
      .exists(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
    if (!any) return // absent table: nothing to reshard
    upsertBucketedMerge(readBucketedState(spark, srcPath), dstPath,
      (old, inc) => old.unionByName(inc), -1L, newBuckets, bucketKeys)
  }

  /** RESHARD RESUME FLOOR (R163 hardening, r12). Resharding wipes the
    * per-bucket replay stamps, so a foreachBatch restart replaying the
    * pre-reshard batch id against the new store would re-apply it with
    * no marker to stop it. The engine reshard wrappers stamp the
    * destination root with the last batch id committed into the source
    * (the signed changelog via [[maxBatchIn]], falling back to the
    * per-bucket replay stamps via [[maxStampUnder]] when the changelog
    * prefix was compacted away), and every
    * engine `processBatch` REFUSES batch ids at or below the floor
    * ([[assertAboveResumeFloor]]) — the bucket-count knob is then safe
    * under the same crash model as everything else instead of trusting
    * the caller's "resume above" discipline. The marker is an empty
    * file whose NAME carries the floor (atomic create; a re-run of the
    * reshard recreates the same name, idempotent). Callers derive the
    * floor as max([[maxBatchIn]], [[maxStampUnder]]) so a fully
    * compacted changelog (no `b`-bearing rows left) still yields the
    * committed floor from the per-bucket replay stamps; floor < 0 then
    * genuinely means nothing was ever committed — no floor needed. */
  def writeResumeFloor(spark: SparkSession, rootDir: String, floor: Long): Unit = {
    if (floor < 0) return // nothing ever committed: no floor needed
    writeFloorMarker(spark, rootDir, "_resume_floor_b", floor)
  }

  /** The highest resume floor stamped on `rootDir`, or -1 if none. */
  def resumeFloor(spark: SparkSession, rootDir: String): Long =
    floorMarker(spark, rootDir, "_resume_floor_b")

  /** FLOOR-MARKER device, shared by the reshard resume floor and the
    * catalog completion floor: an empty file whose NAME carries a
    * monotone id (`<prefix><id>`) — atomic create, idempotent
    * re-create, highest wins (a crash between creating the new marker
    * and pruning old ones leaves several; the max is still right).
    * Only names whose suffix is a pure decimal parse as markers: a
    * foreign file sharing the prefix (a copy-tool's `..._b5.bak`) is
    * ignored, never a NumberFormatException on every later batch. */
  def writeFloorMarker(spark: SparkSession, dir: String, prefix: String,
      id: Long, pruneOlder: Boolean = false): Unit = {
    val p = new Path(s"$dir/$prefix$id")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    fs.create(p, true).close()
    if (pruneOlder)
      fs.listStatus(new Path(dir)).map(_.getPath)
        .filter(q => q.getName.startsWith(prefix) &&
          q.getName.stripPrefix(prefix).matches("\\d+") &&
          q.getName.stripPrefix(prefix).toLong < id)
        .foreach(q => fs.delete(q, false))
  }

  /** The highest `<prefix><id>` marker in `dir`, or -1 if none. */
  def floorMarker(spark: SparkSession, dir: String, prefix: String): Long = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) -1L
    else fs.listStatus(base).map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) &&
          n.stripPrefix(prefix).matches("\\d+") =>
        n.stripPrefix(prefix).toLong }
      .foldLeft(-1L)(math.max)
  }

  /** Stage a DURABLE per-op artifact atomically (tmp + rename), keyed
    * by its full path: if the artifact already exists it is kept
    * byte-identically and `compute` is never evaluated — the replay
    * discipline of the staged deltas, for artifacts that must OUTLIVE
    * the fold that produced them (the moved-keys logs a derived
    * consumer reads, R176). */
  def stageArtifact(spark: SparkSession, artifactPath: String)
      (compute: => DataFrame): Unit = {
    val dst = new Path(artifactPath)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dst)) return
    val tmp = new Path(artifactPath + ".tmp")
    compute.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dst, true)
    require(fs.rename(tmp, dst), s"stage artifact $dst")
  }

  /** Build a bucketed table ATOMICALLY: construct under `<dst>.bf`,
    * then rename into place. The one-time backfills guard on "the
    * mirror exists" — without this, a crash mid-build leaves a PARTIAL
    * mirror that passes the existence check forever and every read
    * silently trusts it (the r12 review catch). A crash anywhere here
    * leaves no `dst`, so the caller's absent⇒rebuild guard stays
    * truthful; the stale `.bf` is deleted on the next attempt. */
  def buildFresh(spark: SparkSession, dstPath: String)
      (build: String => Unit): Unit = {
    val dst = new Path(dstPath)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dstPath + ".bf")
    fs.delete(tmp, true)
    build(tmp.toString)
    require(fs.rename(tmp, dst), s"commit backfill $tmp -> $dst")
  }

  /** Refuse a batch id at or below the reshard resume floor (see
    * [[writeResumeFloor]]). Ad-hoc batches (id < 0) pass. */
  def assertAboveResumeFloor(spark: SparkSession, rootDir: String,
      batchId: Long): Unit = {
    if (batchId < 0) return
    val f = resumeFloor(spark, rootDir)
    require(f < 0 || batchId > f,
      s"batch $batchId is at or below the reshard resume floor $f of " +
        s"$rootDir — a resharded store carries no replay markers; resume " +
        "with batch ids strictly above the floor")
  }

  /** Max committed batch id recorded in a changelog-bearing state table
    * (the `b` column of the star/temporal/interval `a/` tables and the
    * sessions `c/` table); -1 for an absent or batchless table. */
  def maxBatchIn(spark: SparkSession, path: String): Long = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return -1L
    val parts = fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
      .map(_.getPath.toString)
    if (parts.isEmpty) return -1L
    val r = spark.read.parquet(parts.toIndexedSeq: _*)
      .agg(max(col("b"))).collect()(0) // 1-row stat (allowed)
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** Max committed STREAMING batch id across the per-bucket
    * `_graft_batch` replay stamps of every bucketed table under
    * `rootDir` — the fallback floor source for [[writeResumeFloor]]
    * when the changelog yields none ([[maxBatchIn]] = -1): a store
    * whose changelog prefix was fully compacted away (a view netting
    * to zero drops its only `b`-bearing rows) still carries its bucket
    * stamps, which compaction preserves (ad-hoc merges re-stamp the
    * committed id, the [[upsertMerge]] rule). O(#buckets) small-file
    * reads — an offline-maintenance cost, never per-batch. -1 when
    * nothing was ever committed by a non-negative batch. */
  def maxStampUnder(spark: SparkSession, rootDir: String): Long = {
    val base = new Path(rootDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return -1L
    fs.listStatus(base)
      .filter(_.isDirectory)
      .flatMap { t =>
        if (t.getPath.getName.matches("bucket=\\d+")) Seq(t.getPath)
        else fs.listStatus(t.getPath)
          .filter(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
          .map(_.getPath).toSeq
      }
      .map(b => bucketStamp(fs, b))
      .foldLeft(-1L)(math.max)
  }

  /** The per-bucket `_graft_batch` replay stamp's batch id (first
    * line), -1 when absent or ad-hoc — the ONE parse of the stamp
    * format ([[maxStampUnder]] and the catalog ops report both read
    * through here; the writer is [[upsertMerge]]). */
  def bucketStamp(fs: org.apache.hadoop.fs.FileSystem,
      bucket: Path): Long = {
    val m = new Path(bucket, "_graft_batch")
    if (!fs.exists(m)) return -1L
    val in = fs.open(m)
    val first =
      try {
        val it = scala.io.Source.fromInputStream(in).getLines()
        if (it.hasNext) it.next().trim else ""
      } finally in.close()
    if (first.matches("-?\\d+")) first.toLong else -1L
  }

  /** Read bucketed state: union of the live `bucket=<n>` directories
    * (exact-name match — `.tmp`/`.old` swap leftovers are never read). */
  def readBucketedState(spark: SparkSession, path: String): DataFrame =
    // memoized per (session, dir, listing signature) — the serving reads
    // re-list every bucket dir otherwise (optimization r17, StateRead doc)
    StateRead.memo(spark, s"bucketed:$path", path) {
      val base = new Path(path)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val parts = fs.listStatus(base)
        .filter(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
        .map(_.getPath.toString)
      require(parts.nonEmpty, s"no bucket state under $path")
      // ONE multi-path scan, not a union of per-bucket reads: a union
      // carries one relation PER BUCKET into every consumer plan, so at
      // high bucket counts (the 100 TB knob) Catalyst analysis time grows
      // with B in every fold that reads state — measured 4-5x wall on the
      // star fold at B=64 vs B=16 before this collapse
      spark.read.parquet(parts.toIndexedSeq: _*)
    }

  /** BUCKET-PRUNED state read — the read-side O(Δ) counterpart of
    * [[upsertBucketed]]: read ONLY the listed `bucket=<id>` directories
    * (the buckets a batch's keys hash into — bounded by the bucket
    * count, never by state size). Callers must restrict to joins whose
    * probe keys hash into `ids` under the SAME (bucketKeys, numBuckets)
    * the writer used — rows outside those buckets cannot match, so the
    * subset read is exact. Missing buckets (never yet written) and a
    * missing table both yield their share of the empty frame. */
  def readBuckets(spark: SparkSession, path: String, ids: Seq[Long],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(base)) Seq.empty[String]
      else ids.distinct.flatMap { id =>
        val p = new Path(s"$path/bucket=$id")
        if (fs.exists(p)) Some(p.toString) else None
      }
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(parts.toIndexedSeq: _*) // one scan, not one relation per bucket
  }

  /** The bucket ids a frame's key columns hash into under the
    * [[upsertBucketed]] layout — the probe list for [[readBuckets]].
    * One small job; the result is bounded by `numBuckets`, never by
    * data size. Column types must match the writer's bucketKeys
    * exactly (xxhash64 is type-sensitive). */
  def bucketIdsOf(df: DataFrame, keys: Seq[String], numBuckets: Int): Seq[Long] =
    df.select(keys.map(col): _*).distinct()
      .select(pmod(xxhash64(keys.map(col): _*), lit(numBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq

  /** [[readBucketedState]] that tolerates a not-yet-created table (the
    * first micro-batch of a view that reads its own prior state): an
    * empty frame with the caller's schema. */
  def readBucketedStateOrEmpty(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val any = fs.exists(base) && fs.listStatus(base)
      .exists(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
    if (any) readBucketedState(spark, path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The reference's literal storage contract: append raw per-batch
    * increments (SummingMergeTree folds lazily at merge time; readers must
    * re-aggregate — SURVEY.md §3.3). Use with an append-only sink like
    * ClickHouse JDBC. */
  def appendIncrements(increment: DataFrame, path: String): Unit =
    increment.write.mode("append").parquet(path)

  /** Read a summary state table (memoized per listing signature —
    * StateRead doc). */
  def readState(spark: SparkSession, stateDir: String, view: String): DataFrame =
    StateRead.memo(spark, s"state:$stateDir/$view", s"$stateDir/$view") {
      spark.read.parquet(s"$stateDir/$view")
    }

  /** [[readState]] that tolerates a not-yet-created table (the first
    * micro-batch of a view that also READS its own prior state): an
    * empty frame with the caller's schema. */
  def readStateOrEmpty(spark: SparkSession, stateDir: String, view: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new Path(s"$stateDir/$view")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) readState(spark, stateDir, view)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** TTL expiry for a state table — the reference engine family's
    * `TTL ... DELETE` semantics (MergeTree ages rows out at merge time;
    * here it is an explicit maintenance pass, which is also the GDPR
    * deletion path): rewrite the table keeping only rows where `keep`
    * holds, under the SAME tmp/aside rename protocol as the upsert
    * family — a crash mid-expiry leaves either the old or the new state,
    * never neither, and concurrent-writer detection still applies.
    * Returns the number of expired rows. No-op (no rewrite at all) when
    * nothing expires. */
  def expireState(spark: SparkSession, path: String,
      keep: org.apache.spark.sql.Column): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val aside = new Path(path + ".old")
    if (!fs.exists(target) && fs.exists(aside)) require(fs.rename(aside, target), s"recover $aside")
    if (!fs.exists(target)) return 0L
    val marker = new Path(path + "/_graft_batch")
    def readMarker(p: Path): Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in).mkString) finally in.close()
      }
    val observed = readMarker(marker)
    val before = spark.read.parquet(path).count()
    val kept = spark.read.parquet(path).filter(keep)
    val after = kept.count()
    if (after == before) return 0L
    val tmp = new Path(path + ".tmp")
    kept.write.mode("overwrite").parquet(tmp.toString)
    // PRESERVE the committed batch id (erasing it would disarm replay
    // detection for the owning stream's next restart) under a fresh
    // writer token (expiry IS a writer — an in-flight merge computed from
    // pre-expiry state must collide and abort, not last-write-win)
    val committedId = observed.map(_.linesIterator.next().trim).getOrElse("-1")
    val token = java.util.UUID.randomUUID.toString
    val out = fs.create(new Path(tmp, "_graft_batch"), true)
    try out.write(s"$committedId\n$token".getBytes("UTF-8")) finally out.close()
    fs.delete(aside, true)
    require(fs.rename(target, aside), s"stage out $target")
    val asideMarker = readMarker(new Path(aside, "_graft_batch"))
    if (asideMarker != observed) {
      require(fs.rename(aside, target), s"restore $aside after collision")
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"concurrent writer detected on $path during expiry; aborted")
    }
    require(fs.rename(tmp, target), s"commit $tmp -> $target")
    fs.delete(aside, true)
    before - after
  }

  /** Run independent per-TABLE applies of one staged delta concurrently
    * — the multi-table views (join-agg family, dup-spans) commit 3-7
    * bucketed tables per batch, each a self-contained marker-guarded
    * idempotent merge; the staged-delta protocol never relies on table
    * ORDER (the sweep runs only after every apply returns, and a crash
    * replay converges table-by-table), so serializing them only idles
    * the cluster. Measured on the depth-3 chain rehearsal: the seven-table
    * fold's wall-clock is dominated by these applies at toy scale.
    *
    * Failure semantics: every in-flight apply is AWAITED before the
    * first failure is rethrown — a fast-fail here would let sibling
    * applies keep writing their bucket dirs while the caller's retry (a
    * foreachBatch replay) races them for the same directories; the
    * concurrent-writer check would then abort the RETRY instead of the
    * stale writer. Each apply is individually crash-safe, so waiting
    * costs only the slowest sibling. */
  def applyConcurrently(applies: Seq[() => Unit]): Unit = {
    if (applies.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, applies.length))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      // lift each apply into Try so Future.sequence cannot fail fast:
      // Await returns only after EVERY apply finished, then the first
      // failure (if any) is rethrown
      val done = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          applies.map(a => scala.concurrent.Future(scala.util.Try(a())))),
        scala.concurrent.duration.Duration.Inf)
      done.foreach(_.get)
    } finally pool.shutdown()
  }

  /** Rewrite every bucket of a bucketed state dir through `transform`
    * under the ad-hoc (marker-preserving) per-bucket protocol — for
    * maintenance passes that FOLD rows (changelog compaction) rather
    * than just drop them ([[expireState]]). A crash mid-loop re-runs
    * converge when `transform` is idempotent. */
  def transformBuckets(spark: SparkSession, path: String,
      transform: DataFrame => DataFrame): Unit = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return
    fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.matches("bucket=\\d+"))
      .foreach { b =>
        upsertMerge(spark.emptyDataFrame, b.getPath.toString,
          (old, _) => transform(old), -1L)
      }
  }

  /** Order-free content digest of a state table — the anti-entropy
    * primitive for replicated/backfilled state dirs: two replicas of a
    * maintained summary agree iff their digests agree, at the cost of one
    * scan and an 8-byte exchange (vs shipping either table). XOR of
    * per-row md5-derived int64s over a name-sorted JSON canonical form,
    * so partitioning, file layout, row order, and column order are all
    * invisible; XOR's self-inverse also means a retraction (remove one
    * row) shifts the digest by exactly that row's hash. NOTE: a digest
    * treats the table as a SET — duplicate rows in pairs cancel; state
    * tables here are keyed (one row per key), which is the contract. */
  def stateDigest(df: DataFrame): DataFrame = {
    val canon = to_json(struct(df.columns.sorted.map(col): _*))
    df.select(graft.functions.md5Hash64(canon).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L)).as("digest"))
  }
}
