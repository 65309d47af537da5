package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalExtrema

/** The decade rehearsal's STREAMING-FOLD member (VERDICT r14 task 7):
  * fold the events corpus into a bucketed maintained view (extrema
  * value-multiset, B = 32, S = 4) at sf0.1 and at the scaled corpus,
  * as two batches (initial fold + a 1%-of-rows delta), and print the
  * walls — the claims under test are the initial fold's ~O(batch) and
  * the delta fold's O(Δ + touched buckets), NOT O(state).
  *
  * {{{ sbt "runMain graft.tools.ScaleDecadeFold /root/testdata/sf0.1 /tmp/graft_sf1" }}}
  */
object ScaleDecadeFold {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scale-decade-fold")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm fold: the first fold in a fresh JVM pays all the
    // codegen/scan compilation, which would masquerade as scaling cost
    locally {
      val w = java.nio.file.Files.createTempDirectory("decade-warm").toString
      import spark.implicits._
      IncrementalExtrema.processBatch(
        Seq(("w", 1L, 1L)).toDF("g", "v", "w"), w, 0L,
        numBuckets = 32, subBuckets = 4)
      IncrementalExtrema.processBatch(
        Seq(("w", 2L, 1L)).toDF("g", "v", "w"), w, 1L,
        numBuckets = 32, subBuckets = 4)
    }
    args.foreach { dir =>
      // fold A — event_type-keyed: state is O(distinct (type, value)),
      // which a 10x row replication leaves INVARIANT (same value set);
      // the claim under test is that the fold cost tracks distincts,
      // not scanned rows
      val byType = graft.Tables.events(spark, dir)
        .select(col("event_type").as("g"),
          graft.functions.cents(col("value")).as("v"), lit(1L).as("w"))
      // fold B — user-keyed: 10x rows = 10x groups = 10x state; the
      // claim under test is ~O(batch) for the initial fold and
      // O(Δ + touched buckets) for the delta, never O(state)
      val byUser = graft.Tables.events(spark, dir)
        .select(col("user_id").cast("string").as("g"),
          graft.functions.cents(col("value")).as("v"), lit(1L).as("w"))
      Seq(("by-type", byType), ("by-user", byUser)).foreach { case (tag, ev) =>
        val st = java.nio.file.Files.createTempDirectory("decade-fold").toString
        val t0 = System.nanoTime()
        IncrementalExtrema.processBatch(ev.filter(pmod(col("v"), lit(100L)) =!= 0L),
          st, 0L, numBuckets = 32, subBuckets = 4)
        val fold0 = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        IncrementalExtrema.processBatch(ev.filter(pmod(col("v"), lit(100L)) === 0L),
          st, 1L, numBuckets = 32, subBuckets = 4)
        val fold1 = (System.nanoTime() - t1) / 1e9
        val n = ev.count()
        println(f"[decade-fold] $tag $dir rows=$n%d initial=$fold0%.2fs delta(~1%%)=$fold1%.2fs")
      }
    }
    spark.stop()
  }
}
