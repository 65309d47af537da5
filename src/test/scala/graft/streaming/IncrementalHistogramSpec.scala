package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Sketches

/** Incremental == batch for the histogram sketch — additive counters
  * must converge counter-for-counter under any batching, and the
  * quantile read from maintained state must equal the batch read AND
  * bracket the exact percentile within the grid resolution. */
class IncrementalHistogramSpec extends SparkTestBase {
  import spark.implicits._

  private val qs = Seq(("q25", 1, 4), ("q50", 1, 2), ("q75", 3, 4), ("q95", 19, 20))

  test("incremental (2 micro-batches) histogram == batch; quantiles from state") {
    val state = tmpDir("hist-state")
    val all = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("value"))
    val b1 = all.filter(pmod(col("value") * 100, lit(2)) === 0)
    val b2 = all.filter(pmod(col("value") * 100, lit(2)) =!= 0)

    IncrementalHistogram.processBatch(b1, Seq("event_type"), "value", state, batchId = 0L)
    IncrementalHistogram.processBatch(b2, Seq("event_type"), "value", state, batchId = 1L)
    IncrementalHistogram.processBatch(b2, Seq("event_type"), "value", state, batchId = 1L) // replay

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_type", "bucket").as[(String, Long, Long)].collect().toSeq
    assert(canon(MvPipeline.readState(spark, state, "histogram")) ===
      canon(Sketches.histogram(all, Seq("event_type"), "value")))

    val fromState = IncrementalHistogram.quantiles(spark, state, Seq("event_type"), qs)
      .orderBy("event_type", "q").as[(String, String, Long, Long)].collect().toSeq
    val batch = Sketches.histogramQuantiles(
      Sketches.histogram(all, Seq("event_type"), "value"), Seq("event_type"), qs)
      .orderBy("event_type", "q").as[(String, String, Long, Long)].collect().toSeq
    assert(fromState === batch)
    assert(fromState.nonEmpty)

    // accuracy: under rank semantics (k-th smallest, k = ceil(q·n)) the
    // sketch is EXACT on the cents grid — compare the median against a
    // direct rank computation, equality required
    import org.apache.spark.sql.expressions.Window
    val cents = all.select(col("event_type"), graft.functions.cents(col("value")).as("c"))
    val ranked = cents
      .withColumn("rk", row_number().over(Window.partitionBy("event_type").orderBy("c")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rk") === expr("(n + 1) DIV 2")) // = ceil(n/2), the q50 rank
    val exact = ranked.select(col("event_type"), col("c"))
      .as[(String, Long)].collect().toMap
    fromState.filter(_._2 == "q50").foreach { case (t, _, _, est) =>
      assert(est === exact(t), s"median diverged for $t: sketch $est vs rank-exact ${exact(t)}")
    }
  }
}
