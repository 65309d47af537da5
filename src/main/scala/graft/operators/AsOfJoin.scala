package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single latest right row
  * with equal keys and `rightTs <= leftTs` (the time-series join engines
  * like DuckDB/kdb expose as ASOF JOIN; Spark has no built-in operator).
  *
  * Implemented as the SORT-MERGE CARRY-FORWARD, not a range join: tag and
  * union both sides, sort each key group by (ts, side) with right rows
  * first at equal timestamps (inclusive match), carry the last non-null
  * right payload forward with `last(_, ignoreNulls)` over a running
  * window, keep left rows. One shuffle per side on the keys and one
  * per-key sort — O(n log n) per group with NO candidate-pair explosion,
  * which is why this shape survives 100 TB where an inequality range join
  * (O(left × right) within key) does not. Left rows preceding every right
  * row keep NULL payloads (left-outer semantics, like ASOF LEFT JOIN).
  *
  * Requirements (documented, demo-enforced): `(keys, rightTs)` unique on
  * the right side — with duplicate right timestamps no engine's as-of
  * pick is deterministic; pre-aggregate the right side to one row per
  * (key, ts). Null keys follow LEFT-OUTER join semantics exactly as
  * DuckDB's ASOF LEFT JOIN does: a null-key left row never matches but IS
  * kept with null payload; null-key right rows can never be matched and
  * are dropped up front.
  */
object AsOfJoin {

  /** @param left     probe side; ALL its columns pass through
    * @param right    build side; its non-key columns (including `rightTs`)
    *                 are appended — pre-rename any name colliding with a
    *                 left column
    * @param keys     equality keys present on both sides
    * @param leftTs   left ordering column (numeric/orderable)
    * @param rightTs  right ordering column, same type as `leftTs` */
  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val keyNotNull: Column = keys.map(col(_).isNotNull).reduce(_ && _)
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(keys.contains)

    val lStruct = struct(leftCols.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    // left side keeps null-key rows (left-outer): they form their own
    // window partition, and since null-key RIGHT rows are dropped there is
    // nothing to carry forward in it — payload stays null, like DuckDB's
    // ASOF LEFT JOIN emitting the unmatched row
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val r2 = right.filter(keyNotNull).select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    // right rows order BEFORE left rows at an equal timestamp → inclusive
    // (rightTs <= leftTs) match, exactly DuckDB's `ON l.ts >= r.ts`
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col("__l").getField(c).as(c)) ++
          rightPayload.map(c => col("__asof").getField(c).as(c)): _*)
  }

  /** Bucketed INTERVAL (range) join — all pairs with equal `keys` and
    * `rightTs ∈ [leftTs, leftTs + length)` (half-open; both columns
    * long). The other time-series join Spark lacks: a bare range
    * predicate plans as BroadcastNestedLoopJoin — O(left × right) within
    * key, the 100 TB killer. Here every left row explodes to the ≤ 2
    * `length`-sized buckets its window covers and every right row lives
    * in exactly ONE bucket, so the join is a pure shuffle/broadcast
    * EQUI-join on (keys, bucket); the exact range filter then runs only
    * on bucket-colocated candidates. Each qualifying pair appears
    * exactly once (`array_distinct` collapses the same-bucket case; a
    * right row's single bucket meets each left row once).
    *
    * Right-side non-key columns pass through — pre-rename collisions,
    * same contract as [[asOfBackward]]. Cost model: shuffle is
    * O(left·≤2 + right) rows; candidate pairs are only those within
    * ±length of each other — output-sized for time-local data, never
    * |left|×|right|. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, length: Long): DataFrame = {
    require(length > 0, "interval length must be positive")
    val l2 = left.withColumn("_ij_bucket",
      explode(array_distinct(array(
        expr(s"$leftTs DIV ${length}L"),
        expr(s"($leftTs + ${length - 1}L) DIV ${length}L")))))
    val r2 = right.withColumn("_ij_bucket", expr(s"$rightTs DIV ${length}L"))
    l2.join(r2, keys :+ "_ij_bucket")
      .filter(col(rightTs) >= col(leftTs) && col(rightTs) < col(leftTs) + lit(length))
      .drop("_ij_bucket")
  }
}
