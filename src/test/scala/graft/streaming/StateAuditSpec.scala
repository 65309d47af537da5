package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.tools.StateAudit

/** The audit must pass cleanly over healthy states built by the real
  * folds, and must detect each class of damage: swap leftovers, missing
  * bucket markers, a broken label lattice, and a broken changelog
  * integral. (The audit is read-only — damage detection, not repair.) */
class StateAuditSpec extends SparkTestBase {
  import spark.implicits._

  private def buildHealthy(state: String): Unit = {
    IncrementalNearDup.processBatch(
      Seq(1L -> ("x " * 30).trim, 2L -> ("x " * 29 + "y").trim)
        .toDF("doc_id", "text"),
      "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 4,
      threshold = 0.5, stateDir = state, batchId = 0L, numBuckets = 4)
    IncrementalJoinAgg.processBatch(
      Seq((10L, 1L, 100L)).toDF("jk", "id", "m"), "jk", "id", "m",
      Seq((10L, "A")).toDF("jk", "g"), "jk", "g", state, 0L, numBuckets = 4)
    IncrementalDupSpans.processBatch(
      Seq(1L -> ("a" * 60), 2L -> ("a" * 60)).toDF("doc_id", "text"),
      "doc_id", "text", 40, state, 0L, numBuckets = 4)
  }

  test("healthy states from the real folds audit clean") {
    val state = tmpDir("sa1")
    buildHealthy(state)
    assert(StateAudit.audit(spark, state) === Seq.empty)
  }

  test("each damage class is detected") {
    val state = tmpDir("sa2")
    buildHealthy(state)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // stale rename-aside copy
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$state/joinaggstar/f.old"))
    // missing bucket marker
    val bucket = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/joinaggstar/a"))
      .map(_.getPath).filter(_.getName.startsWith("bucket=")).head
    fs.delete(new org.apache.hadoop.fs.Path(bucket, "_graft_batch"), false)
    // broken lattice: a label ABOVE its doc id, injected as an extra
    // parquet part directly into a neardup bucket (bypassing the fold)
    val ndBucket = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/neardup"))
      .map(_.getPath).filter(_.getName.startsWith("bucket=")).head
    val bad = Seq(("l", 1L, null.asInstanceOf[java.lang.Integer],
        null.asInstanceOf[String], null.asInstanceOf[Seq[Long]], 99L))
      .toDF("kind", "doc_id", "band_idx", "band_key", "gh", "label")
      .select(col("kind"), col("doc_id"),
        col("band_idx").cast("int"), col("band_key"),
        col("gh").cast("array<bigint>"), col("label").cast("bigint"))
    bad.coalesce(1).write.mode("append").parquet(ndBucket.toString)
    // broken integral: an extra changelog row with no matching aggregate
    val aBucket = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/joinaggstar/a"))
      .map(_.getPath).filter(_.getName.startsWith("bucket=")).last
    Seq(("c", "GHOST", 5L, 1L, 1L)).toDF("kind", "g", "b", "m", "c")
      .coalesce(1).write.mode("append").parquet(aBucket.toString)

    val v = StateAudit.audit(spark, state)
    assert(v.exists(_.contains("rename-aside")), s"missing aside finding in $v")
    assert(v.exists(_.contains("without a batch marker")), s"missing marker finding in $v")
    assert(v.exists(_.contains("lattice broken")), s"missing lattice finding in $v")
    assert(v.exists(_.contains("integral(changelog)")), s"missing integral finding in $v")
  }
}
