package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.mapAgg

/** Key-wise map aggregation: fold semantics per op, null skipping,
  * key-sorted output, and partial-merge correctness under forced
  * multi-partition input. */
class MapAggSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    ("g1", "a", 1L), ("g1", "a", 2L), ("g1", "b", 5L),
    ("g2", "b", 7L), ("g2", "c", -1L), ("g2", "c", 4L)
  ).toDF("g", "k", "v")

  test("sum/min/max fold key-wise; entries sorted by key") {
    val r = rows.groupBy("g").agg(
        mapAgg($"k", $"v").as("s"),
        mapAgg($"k", $"v", "min").as("mn"),
        mapAgg($"k", $"v", "max").as("mx"))
      .orderBy("g")
      .as[(String, Seq[(String, Long)], Seq[(String, Long)], Seq[(String, Long)])]
      .collect().toSeq
    assert(r === Seq(
      ("g1", Seq(("a", 3L), ("b", 5L)), Seq(("a", 1L), ("b", 5L)), Seq(("a", 2L), ("b", 5L))),
      ("g2", Seq(("b", 7L), ("c", 3L)), Seq(("b", 7L), ("c", -1L)), Seq(("b", 7L), ("c", 4L)))))
  }

  test("null keys and values are skipped; all-null group yields empty map") {
    val withNulls = Seq(
      ("g1", Some("a"), Some(1L)), ("g1", None, Some(9L)),
      ("g1", Some("b"), None), ("g3", None, None)
    ).toDF("g", "k", "v")
    val r = withNulls.groupBy("g").agg(mapAgg($"k", $"v").as("m"))
      .orderBy("g").as[(String, Seq[(String, Long)])].collect().toSeq
    assert(r === Seq(("g1", Seq(("a", 1L))), ("g3", Seq.empty)))
  }

  test("partial merge: 64-partition scatter equals single-partition result") {
    val big = (0 until 1000)
      .map(i => ("g", s"k${i % 7}", i.toLong)).toDF("g", "k", "v")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(mapAgg($"k", $"v").as("m"))
        .as[(String, Seq[(String, Long)])].collect().toSeq
    assert(agg(big.repartition(64)) === agg(big.coalesce(1)))
  }
}
