package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-ORDER write clustering — the multi-dimensional extension of the
  * reference's single-key `ORDER BY` storage layout (SURVEY §2.7 O1 /
  * `Querylog.writeClustered`): range-partition and sort rows by the
  * interleaved-bit z-value of two key columns before writing, so every
  * file and row group carries TIGHT min/max statistics on BOTH
  * dimensions. A query filtering on both (user AND time-range, domain
  * AND day) then skips row groups that a single-column sort could only
  * prune on its leading column — at 100 TB this is the difference
  * between reading a thin diagonal band and reading every file of the
  * matching lead-key range. Measured in ZOrderSpec: records actually
  * READ (row-group skipping is a runtime effect, visible in input
  * metrics, not the plan). */
object ZOrder {

  /** Write `df` z-clustered on (colA, colB) — both must be non-negative
    * longs (scale/offset beforehand; `bits` caps the per-dim range at
    * 2^bits). `filesPerDim²` range partitions ⇒ files tile the z-curve. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      bits: Int = 16, numFiles: Int = 16): Unit =
    writeZOrderedN(df, Seq(colA, colB), path, bits, numFiles)

  /** N-dimensional [[writeZOrdered]] ([[graft.functions.zOrderN]] key):
    * every file/row group carries tight min/max on ALL `cols` — the
    * layout for reads that filter several dimensions at once. */
  def writeZOrderedN(df: DataFrame, cols: Seq[String], path: String,
      bits: Int = 16, numFiles: Int = 16): Unit =
    df.withColumn("_z", graft.functions.zOrderN(cols.map(col), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
