package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: explicit two-level (salted) grouped sums.
  *
  * Catalyst's partial+final split already bounds most skew for associative
  * aggregates, and AQE rebalances skewed shuffle partitions. This utility is
  * for the residual case — a single hot key whose FINAL-stage partition
  * still exceeds one task (e.g. one NATed client IP producing 1% of 100 TB):
  * rows are salted into `saltBuckets` sub-keys, summed per (key, salt), then
  * re-summed per key. Two small shuffles instead of one hot one; correctness
  * is unchanged for any commutative-associative aggregate.
  */
object Skew {

  /** Count rows per key with salting. Result column: `cnt`. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16): DataFrame =
    saltedSum(df.withColumn("_one", lit(1L)), keys, Seq("_one" -> "cnt"), saltBuckets)

  /** Sum measure columns per key with salting.
    * @param measures (inputColumn, outputName) pairs */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      measures: Seq[(String, String)],
      saltBuckets: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partialAggs: Seq[Column] =
      measures.map { case (in, out) => sum(col(in)).as(s"_p_$out") }
    val finalAggs: Seq[Column] =
      measures.map { case (_, out) => sum(col(s"_p_$out")).as(out) }
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
