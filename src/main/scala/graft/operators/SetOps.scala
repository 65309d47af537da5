package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `groupArrayIntersect` — the reference engine family's cross-row set
  * intersection: per group, the items present in EVERY unit (document,
  * day, session…) of that group.
  *
  * Spark-first shape: never materializes per-unit arrays to intersect
  * pairwise (O(units·items) memory per group, order-dependent) — the
  * intersection is the counting identity `item ∈ ∩ units ⟺
  * distinct-units-containing(item) = n_units(group)`: one distinct
  * projection, one (group, item) count, one tiny per-group total joined
  * back. All partial-aggregatable, shuffles counted tuples.
  *
  * Output rows carry the intersection both as a count and as a
  * DETERMINISTIC rendering (sorted, comma-joined — the R96
  * sort-then-concat recipe; a bare collect order is un-oracleable).
  */
object SetOps {

  def groupIntersect(df: DataFrame, groupCol: String, unitCol: String,
      itemCol: String): DataFrame = {
    val triples = df.select(col(groupCol).as("g"), col(unitCol).as("u"),
      col(itemCol).as("item")).distinct()
    val nUnits = triples.select("g", "u").distinct()
      .groupBy("g").agg(count(lit(1)).as("n_units"))
    triples.groupBy("g", "item")
      .agg(count(lit(1)).as("n_in"))
      .join(nUnits, "g")
      .filter(col("n_in") === col("n_units"))
      .groupBy("g", "n_units")
      .agg(count(lit(1)).as("n_common"),
        concat_ws(",", sort_array(collect_list(col("item")))).as("common_str"))
  }
}
