package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental == batch for the map-combinator family: exploded entry
  * rows folded under SUM/MIN/MAX upserts must serve maps bit-identical
  * to the one-shot batch sumMap/minMap/maxMap. */
class IncrementalMapAggSpec extends SparkTestBase {
  import spark.implicits._

  test("entry rows fold across batches == batch maps; replay no-op; new keys join") {
    val state = tmpDir("ma-state")
    val b1 = Seq(("d1", "click", 5L), ("d1", "view", 2L), ("d2", "click", 7L))
    val b2 = Seq(("d1", "click", 3L), ("d1", "error", 9L), ("d3", "view", 1L))

    def fold(rows: Seq[(String, String, Long)], id: Long): Unit =
      IncrementalMapAgg.processBatch(rows.toDF("g", "mk", "v"), state, "g", "mk",
        col("v"), batchId = id)

    fold(b1, 1L); fold(b2, 2L)

    // mapAgg emits key-SORTED entry arrays (the ClickHouse sorted-maps
    // convention), not a MapType
    def canon(df: org.apache.spark.sql.DataFrame) = df.orderBy("g")
      .as[(String, Seq[(String, Long)], Seq[(String, Long)], Seq[(String, Long)])]
      .collect().toSeq
    val batch = canon((b1 ++ b2).toDF("g", "mk", "v")
      .groupBy("g")
      .agg(graft.functions.mapAgg(col("mk"), col("v")).as("sum_map"),
        graft.functions.mapAgg(col("mk"), col("v"), "min").as("min_map"),
        graft.functions.mapAgg(col("mk"), col("v"), "max").as("max_map")))
    val served = canon(IncrementalMapAgg.read(spark, state))
    assert(served === batch)
    val m = served.map(r => r._1 -> r).toMap
    assert(m("d1")._2.toMap == Map("click" -> 8L, "view" -> 2L, "error" -> 9L))
    assert(m("d1")._3.toMap.apply("click") == 3L &&
      m("d1")._4.toMap.apply("click") == 5L)
    assert(m("d3")._2.toMap == Map("view" -> 1L)) // key born in batch 2

    fold(b2, 2L) // replay: marker no-op
    assert(canon(IncrementalMapAgg.read(spark, state)) === batch)
  }
}
