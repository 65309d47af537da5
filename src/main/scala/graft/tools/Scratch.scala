package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Dedup

/** Ad-hoc profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
    val verified = Dedup.minhashLshPairs(docs, "doc_id", "text")
    time("minhash_full")(verified.count())
    time("minhash_full2")(verified.count())
    time("simhashes")(Dedup.simhashes(docs).count())
    time("simhash_pairs")(Dedup.simhashPairs(docs).count())
    time("ngram_jaccard")(Dedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}
