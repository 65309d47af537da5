package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalExtrema

/** Adversarial-skew drill for the R173 value sub-buckets (VERDICT r14
  * task 8 / known limit 3): the claimed bound is EXPECTATION-level —
  * with S sub-keys hashed into B physical buckets, two of a group's
  * sub-keys can collide in one bucket, leaving it a small multiple of
  * |group|/S (never |group|). This drill plants the adversarial shape
  * (ONE group = 50% of the table's value multiset) at several (B, S)
  * and measures the thing the claim bounds: the HOT GROUP's worst
  * per-bucket row count vs the |group|/S ideal, the number of distinct
  * physical buckets hosting the group (< S ⟺ a collision happened),
  * and the merge-at-read point-read wall. The numbers feed the
  * ARCHITECTURE §3 decision: accept expectation-level spread, or pay
  * the explicit bucket-id column in the shared upsert device.
  *
  * {{{ sbt "runMain graft.tools.SubBucketRehearsal 2000000" }}}
  */
object SubBucketRehearsal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("subbucket-skew")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the adversarial multiset: group "hot" owns n/2 distinct values;
    // the other half spreads over 10k groups (normal tail)
    val hot = spark.range(n / 2).select(lit("hot").as("g"),
      col("id").as("v"), lit(1L).as("w"))
    val tail = spark.range(n / 2).select(
      concat(lit("g"), pmod(col("id"), lit(10000L))).as("g"),
      (col("id") + 1000000000L).as("v"), lit(1L).as("w"))
    val delta = hot.unionByName(tail)

    println(f"${"B"}%4s ${"S"}%4s ${"fold_s"}%8s ${"hotBkts"}%8s " +
      f"${"worstHot"}%10s ${"grp/S"}%10s ${"ratio"}%6s ${"worstBkt"}%10s " +
      f"${"ideal n/B"}%10s ${"read_s"}%7s")
    for ((b, s) <- Seq((64, 1), (64, 8), (8, 4), (16, 16))) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"sbk-$b-$s").toString
      val t0 = System.nanoTime()
      IncrementalExtrema.processBatch(delta, dir, 0L, numBuckets = b,
        subBuckets = s)
      val foldS = (System.nanoTime() - t0) / 1e9
      val byBucket = spark.read.option("basePath", s"$dir/extrema")
        .parquet(s"$dir/extrema")
        .groupBy("bucket")
        .agg(count(lit(1)).as("rows"),
          sum(when(col("g") === "hot", 1L).otherwise(0L)).as("hot_rows"))
        .collect()
      val worstHot = byBucket.map(_.getAs[Long]("hot_rows")).max
      val hotBuckets = byBucket.count(_.getAs[Long]("hot_rows") > 0)
      val worstBucket = byBucket.map(_.getAs[Long]("rows")).max
      val idealHot = (n / 2).toDouble / s
      val t1 = System.nanoTime()
      val pr = IncrementalExtrema.viewFor(spark, dir, Seq("hot"),
        numBuckets = b, subBuckets = s).collect()
      val readS = (System.nanoTime() - t1) / 1e9
      require(pr.length == 1 && pr.head.getAs[Long]("n") == n / 2,
        s"point read lost rows at (B=$b, S=$s): ${pr.mkString}")
      println(f"$b%4d $s%4d $foldS%8.2f $hotBuckets%8d $worstHot%10d " +
        f"${idealHot}%10.0f ${worstHot / idealHot}%6.2f $worstBucket%10d " +
        f"${n.toDouble / b}%10.0f $readS%7.2f")
    }
    spark.stop()
  }
}
