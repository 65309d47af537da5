package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous budget packing (SURVEY.md §2.11 R21) — the batch-construction
  * step of a training pipeline: walk each partition in a deterministic
  * order and cut a new bin every time the running size total crosses a
  * budget multiple. `bin = (prefix sum BEFORE this row) DIV budget`, so a
  * row that straddles a boundary belongs to the bin it started in
  * (contiguous-with-straddle semantics — the greedy streaming packer's
  * output, expressed as a window prefix sum instead of a sequential
  * loop).
  *
  * All arithmetic is exact int64 (window sum + integer division), so the
  * whole assignment replays in SQL (x21). Scale shape: one shuffle by the
  * partition columns + a per-partition sort — identical to any per-shard
  * ordered pass; at 100 TB the shard assignment comes from
  * [[Sharding.assignShards]], which bounds each partition's size.
  */
object Packing {

  def contiguousPack(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
      sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_prev", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum_prev DIV $budget"))
      .drop("__cum_prev")
  }
}
