package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe (dev aid; not part of the shipped surface). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val b0 = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val b1 = docs.filter(pmod(col("doc_id"), lit(5)) === 1)
    val g0 = graft.operators.Dedup.gramSets(b0, "doc_id", "text", 3)
    val g1 = graft.operators.Dedup.gramSets(b1, "doc_id", "text", 3)
    val bands0 = graft.operators.Dedup.bandRows(g0, 8, 4)
      .select(col("doc_id").cast("long"), col("band_idx"), col("band_key"))
    val bands1 = graft.operators.Dedup.bandRows(g1, 8, 4)
      .select(col("doc_id").cast("long"), col("band_idx"), col("band_key"))
    val all = bands0.unionByName(bands1)
    println("bands0=" + bands0.count() + " bands1=" + bands1.count())
    val cand = bands1.as("a").join(all.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id2"))
    println("cand rows (pre-distinct) = " + cand.count())
    println("cand distinct = " + cand.distinct().count())
    // top band-key collision sizes
    all.groupBy("band_idx", "band_key").count().orderBy(desc("count"))
      .show(5, false)
    spark.stop()
  }
}
