package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Funnel
import graft.streaming.IncrementalStrictFunnel

/** Retraction-view rehearsal (dev aid): folds the events corpus into the
  * maintained strict-dedup funnel in TIME-ORDERED batches with the x97
  * parameters, checks the materialized view equals the batch
  * `windowFunnelStrictDedup` over everything folded so far after EVERY
  * batch, and counts the RETRACTIONS each batch emitted — on a real
  * corpus the 24 h window spans batch boundaries, so later batches
  * genuinely kill chains reported earlier (the non-monotone case the
  * Z-set changelog exists for). Also verifies the changelog integral
  * equals the view at the end.
  *
  * {{{ sbt "runMain graft.tools.StrictFunnelRehearsal /root/testdata/sf0.1 4" }}}
  */
object StrictFunnelRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val steps = Seq("signup", "click", "purchase")
    val windowUs = 86400000000L
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id").as("u"), expr("ts DIV 1000").as("t"),
        col("event_type").as("et"))
      .cache()
    val n = ev.count()
    val Array(tMin, tMax) = ev.agg(min("t"), max("t")).collect()
      .map(r => Array(r.getLong(0), r.getLong(1))).head
    val span = (tMax - tMin) / nBatches + 1
    val state = java.nio.file.Files
      .createTempDirectory("strictfunnel-rehearsal").toString
    println(s"[rehearsal] $n events, $nBatches time-ordered batches, strict-dedup x97 params")

    (0 until nBatches).foreach { b =>
      val lo = tMin + b * span; val hi = tMin + (b + 1) * span
      val batch = ev.filter(col("t") >= lit(lo) && col("t") < lit(hi))
      val t0 = System.nanoTime()
      IncrementalStrictFunnel.processBatch(batch.toDF(), "u", "t", "et",
        steps, windowUs, state, b.toLong)
      val dt = (System.nanoTime() - t0) / 1e9
      val log = IncrementalStrictFunnel.changelog(spark, state)
        .filter(col("batch") === b)
      val nRetract = log.filter(col("w") === -1L).count()
      val nAssert = log.filter(col("w") === 1L).count()
      println(f"[rehearsal] batch $b%d (${batch.count()}%d events) folded in $dt%.2f s; " +
        f"changelog +$nAssert%d / -$nRetract%d (retractions)")
      val served = IncrementalStrictFunnel.levels(spark, state).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val truth = Funnel.windowFunnelStrictDedup(
          ev.filter(col("t") < lit(hi)).toDF(), "u", "t", "et", steps, windowUs)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      graft.operators.Caching.releaseAll()
      println(s"[rehearsal]   == batch: ${served == truth} (${served.size} users)")
    }

    val integral = IncrementalStrictFunnel.changelog(spark, state)
      .groupBy("user", "level").agg(sum("w").as("s")).filter("s <> 0")
      .select("user", "level").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val served = IncrementalStrictFunnel.levels(spark, state).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    println(s"[rehearsal] changelog integral == view: ${integral == served}")
    spark.stop()
  }
}
