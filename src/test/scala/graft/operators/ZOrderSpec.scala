package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Z-order clustering must deliver MEASURED multi-dimensional pruning:
  * with files sorted on the lead column only, a filter on the OTHER
  * dimension reads every row (its min/max spans each file); the
  * z-ordered layout bounds both dimensions per file, so parquet
  * row-group stats skip most of the data at read time. Row-group
  * skipping is a runtime effect — asserted on records READ (input
  * metrics), not plan shape. */
class ZOrderSpec extends SparkTestBase {

  test("second-dimension filter reads a fraction of the z-ordered layout vs lead-sort") {
    val read = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        read.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
    })
    val n = 1 << 16
    val df = spark.range(n).select(
      (col("id") % 256).as("uid"),
      (col("id") / 256).cast("long").as("t"),
      col("id").as("payload"))
    val dir = tmpDir("zorder")
    df.repartitionByRange(64, col("uid")).sortWithinPartitions("uid")
      .write.parquet(s"$dir/lead")
    ZOrder.writeZOrdered(df, "uid", "t", s"$dir/z", bits = 8, numFiles = 64)

    def measure(path: String): (Long, Long) = {
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      read.set(0)
      val rows = spark.read.parquet(path)
        .filter(col("t").between(10, 20)).count()
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      (rows, read.get)
    }
    val (leadRows, leadRead) = measure(s"$dir/lead")
    val (zRows, zRead) = measure(s"$dir/z")
    assert(leadRows === zRows) // same answer from both layouts
    assert(leadRows === 11L * 256L)
    // lead-sorted files span the full t range: no pruning, ~all rows read
    assert(leadRead >= n * 9L / 10L, s"expected ~full scan, read $leadRead")
    // z-ordered files bound t per file: most row groups skipped
    assert(zRead <= leadRead / 3L, s"z-order read $zRead vs lead $leadRead")
  }

  test("3-dim z layout prunes on a filter over the two NON-lead dimensions") {
    val read = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        read.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
    })
    // 3 independent 0..63 dimensions (18 z bits), 256k rows
    val n = 1 << 18
    val df = spark.range(n).select(
      (col("id") % 64).as("a"),
      ((col("id") / 64) % 64).cast("long").as("b"),
      (col("id") / 4096).cast("long").as("c"),
      col("id").as("payload"))
    val dir = tmpDir("zorder3")
    df.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$dir/lead")
    ZOrder.writeZOrderedN(df, Seq("a", "b", "c"), s"$dir/z", bits = 6, numFiles = 64)

    def measure(path: String): (Long, Long) = {
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      read.set(0)
      val rows = spark.read.parquet(path)
        .filter(col("b").between(8, 15) && col("c").between(16, 31)).count()
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      (rows, read.get)
    }
    val (leadRows, leadRead) = measure(s"$dir/lead")
    val (zRows, zRead) = measure(s"$dir/z")
    assert(leadRows === zRows)
    assert(leadRows === 64L * 8L * 16L) // 64 a-values x 8 b-values x 16 c-values
    // a-sorted files span the full (b, c) range: no pruning possible
    assert(leadRead >= n * 9L / 10L, s"expected ~full scan, read $leadRead")
    // the 3-dim z layout bounds b AND c per row group
    assert(zRead <= leadRead / 3L, s"3-dim z-order read $zRead vs lead $leadRead")
  }
}
