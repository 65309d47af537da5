package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.SparkSession

import graft.streaming.{DerivedView, IncrementalNearDup, MovedLog}

/** Moved-log trigger rehearsal (R176, dev aid): measures the two
  * derived-view triggers for a REPLACE-per-key base against the SAME
  * maintained near-dup state at corpus scale —
  *
  *   - R168 snapshot diff ([[DerivedView.replaceBaseDiff]]): two
  *     null-safe anti-joins between the served label view and its
  *     snapshot, plus a full snapshot rewrite per batch — O(view)
  *     regardless of how little moved;
  *   - R176 moved log ([[MovedLog.pending]]): read the fold's staged
  *     per-batch artifact — O(moved).
  *
  * A tiny steady-state batch (3 near-dup re-sends that merge into
  * existing components) makes the contrast visible: both triggers name
  * the same touched labels, but the diff pays the full corpus while the
  * log reads a handful of rows. Also times the artifact-staging
  * overhead inside the fold (movedDir on vs off is the same fold ± one
  * pruned mirror probe + a tiny parquet write).
  *
  * {{{ sbt "runMain graft.tools.MovedLogRehearsal /root/testdata/sf0.1 3" }}}
  */
object MovedLogRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val state = java.nio.file.Files.createTempDirectory("mlr-state").toString
    val md = java.nio.file.Files.createTempDirectory("mlr-moved").toString
    val mk = java.nio.file.Files.createTempDirectory("mlr-snap").toString
    val movedSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("old_label", LongType), StructField("new_label", LongType)))
    println(s"[rehearsal] $n docs from $dir in $nBatches batches")

    (0 until nBatches).foreach { b =>
      val batch = docs.filter(pmod(col("doc_id"), lit(nBatches)) === b)
      val t0 = System.nanoTime()
      IncrementalNearDup.processBatch(batch, "doc_id", "text",
        threshold = 0.5, stateDir = state, batchId = b.toLong,
        movedDir = Some(md))
      val moved = MovedLog.pending(spark, md, movedSchema).count()
      println(f"[rehearsal] batch $b: folded in " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, moved-log $moved%d rows")
      MovedLog.sweep(spark, md, MovedLog.pendingArtifacts(spark, md))
    }

    def labels() = IncrementalNearDup.labels(spark, state)

    // establish the R168 snapshot at the current state (the fair start:
    // both triggers then observe the SAME tiny batch)
    val tS0 = System.nanoTime()
    DerivedView.commitReplaceBase(labels(), mk, "labels")
    println(f"[rehearsal] snapshot commit (the diff trigger's per-batch " +
      f"write): ${(System.nanoTime() - tS0) / 1e9}%.2f s")

    // the steady-state batch: 3 re-sent texts under fresh ids — each
    // merges into its original's component, so labels genuinely move
    val tiny = docs.limit(3)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
    val tF0 = System.nanoTime()
    IncrementalNearDup.processBatch(tiny, "doc_id", "text",
      threshold = 0.5, stateDir = state, batchId = nBatches.toLong,
      movedDir = Some(md))
    println(f"[rehearsal] 3-doc steady-state fold (+ artifact staging): " +
      f"${(System.nanoTime() - tF0) / 1e9}%.2f s")

    // trigger A — R168 snapshot diff: O(view) anti-joins
    val tA0 = System.nanoTime()
    val diff = DerivedView.replaceBaseDiff(labels(), mk, "labels")
    val touchedA = diff.select(col("label").as("g")).distinct().collect()
      .map(_.getLong(0)).toSet
    val tA = (System.nanoTime() - tA0) / 1e9
    // trigger B — R176 moved log: O(moved) artifact read
    val tB0 = System.nanoTime()
    val moved = MovedLog.pending(spark, md, movedSchema)
      .transform(graft.operators.Caching.persisted)
    val nMoved = moved.count()
    val touchedB = moved.select(col("old_label").as("g"))
      .unionByName(moved.select(col("new_label").as("g")))
      .filter(col("g").isNotNull).distinct().collect()
      .map(_.getLong(0)).toSet
    val tB = (System.nanoTime() - tB0) / 1e9
    println(f"[rehearsal] trigger A (snapshot diff): touched " +
      f"${touchedA.size}%d labels in $tA%.2f s over $n%d-doc view " +
      f"(+ the snapshot commit above EVERY batch)")
    println(f"[rehearsal] trigger B (moved log):    touched " +
      f"${touchedB.size}%d labels in $tB%.2f s over $nMoved%d moved rows")
    println(s"[rehearsal] triggers name the same touched set: " +
      (if (touchedA == touchedB) "YES" else
        s"NO — A-only ${touchedA -- touchedB}, B-only ${touchedB -- touchedA}"))
    graft.operators.Caching.releaseAll()

    // ---- scaled trigger isolation: the sf0.1 corpus view is too small
    // to separate the asymptotics, so measure the BARE triggers against
    // a 2M-key REPLACE base with 10 moved keys — the steady-state shape
    // of a large deployment (big base, tiny move set)
    val mk2 = java.nio.file.Files.createTempDirectory("mlr-snap2").toString
    val md2 = java.nio.file.Files.createTempDirectory("mlr-moved2").toString
    val bigN = 2000000L
    val big = spark.range(bigN)
      .select(col("id").as("doc_id"), col("id").as("label"))
    DerivedView.commitReplaceBase(big, mk2, "labels")
    val after = big.withColumn("label",
      when(col("doc_id").between(1, 10), lit(0L)).otherwise(col("label")))
    val tA2 = {
      val t0 = System.nanoTime()
      val d = DerivedView.replaceBaseDiff(after, mk2, "labels")
      val k = d.select("label").distinct().count()
      require(k == 11, s"diff touched $k labels") // new 0 + the 10 old selves
      (System.nanoTime() - t0) / 1e9
    }
    val tSnap2 = {
      val t0 = System.nanoTime()
      DerivedView.commitReplaceBase(after, mk2, "labels")
      (System.nanoTime() - t0) / 1e9
    }
    graft.streaming.MvPipeline.stageArtifact(spark,
      MovedLog.artifactPath(md2, "b", 0L))(
      spark.range(1, 11).select(col("id").as("doc_id"),
        col("id").as("old_label"), lit(0L).as("new_label")))
    val tB2 = {
      val t0 = System.nanoTime()
      val m = MovedLog.pending(spark, md2, movedSchema)
      val k = m.select(col("old_label").as("g"))
        .unionByName(m.select(col("new_label").as("g")))
        .filter(col("g").isNotNull).distinct().count()
      require(k == 11, s"log touched $k labels")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[rehearsal] scaled ($bigN%d-key base, 10 moved): diff " +
      f"$tA2%.2f s + snapshot rewrite $tSnap2%.2f s EVERY batch vs " +
      f"moved-log $tB2%.2f s — the O(view) vs O(moved) gap")

    // ---- trigger C (r14, R178): the BUCKET-PRUNED diff for bases that
    // cannot name their moved keys at all — same 2M-key REPLACE base,
    // held in the bucketed layout at B=64, 3 keys moved: the diff and
    // the snapshot rewrite restrict to the moved keys' buckets (≤3/64),
    // the middle point between O(view) and O(moved)
    val st3 = java.nio.file.Files.createTempDirectory("mlr-bkt").toString
    val mk3 = java.nio.file.Files.createTempDirectory("mlr-bkt-mk").toString
    val bSchema = StructType(Seq(StructField("g", LongType),
      StructField("v", LongType)))
    val basePath = s"$st3/derived"
    DerivedView.processBatch(spark,
      spark.range(bigN).select(col("id").as("g")),
      spark.range(bigN).select(col("id").as("g"), col("id").as("v")),
      st3, 0L, numBuckets = 64)
    val tC0 = {
      val t0 = System.nanoTime()
      DerivedView.commitReplaceBaseBucketed(spark, basePath, mk3, "base")
      (System.nanoTime() - t0) / 1e9
    }
    DerivedView.processBatch(spark,
      spark.range(1, 4).select(col("id").as("g")),
      spark.range(1, 4).select(col("id").as("g"), lit(0L).as("v")),
      st3, 1L, numBuckets = 64)
    val (tC1, nChanged) = {
      val t0 = System.nanoTime()
      val changed = DerivedView.replaceBaseChangedBuckets(spark, basePath,
        mk3, "base")
      val d = DerivedView.replaceBaseDiffBucketed(spark, basePath, mk3,
        "base", bSchema)
      val k = d.select("g").distinct().count()
      require(k == 3, s"bucketed diff touched $k keys")
      ((System.nanoTime() - t0) / 1e9, changed.size)
    }
    val tC2 = {
      val t0 = System.nanoTime()
      DerivedView.commitReplaceBaseBucketed(spark, basePath, mk3, "base")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[rehearsal] trigger C (R178 bucketed diff, B=64, 3 moved): " +
      f"$nChanged%d/64 buckets flagged, diff $tC1%.2f s + bucket-subset " +
      f"snapshot rewrite $tC2%.2f s (one-time full snapshot $tC0%.2f s) — " +
      f"vs the full diff's $tA2%.2f s + $tSnap2%.2f s every batch")
    spark.stop()
  }
}
