package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling (engine utility): per-column row/null/
  * exact-distinct counts and min/max, computed in ONE aggregation pass
  * over the table (all columns' aggregates in a single `agg`; Spark plans
  * the multi-distinct via Expand) and unpivoted to a row per column.
  * min/max are rendered as strings AFTER native-type aggregation, so
  * numeric columns profile numerically and the output schema stays
  * uniform.
  *
  * At 100 TB: exact distincts make this a heavy statement by design (the
  * cheap daily variant swaps `countDistinct` for `approx_count_distinct`
  * — x8's HLL — with no shape change); everything else is partial+final
  * aggregation with O(columns) state.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
