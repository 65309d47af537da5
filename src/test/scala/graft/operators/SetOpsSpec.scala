package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Cross-row set intersection + decayed-average specs. */
class SetOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("groupIntersect keeps exactly the items present in every unit") {
    val rows = Seq(
      ("g1", "u1", "A"), ("g1", "u1", "B"),
      ("g1", "u2", "B"), ("g1", "u2", "C"),
      // g2: disjoint units -> empty intersection -> group absent
      ("g2", "u1", "A"), ("g2", "u2", "B"))
    val out = SetOps.groupIntersect(rows.toDF("g", "u", "item"), "g", "u", "item")
      .select("g", "n_units", "n_common", "common_str")
      .as[(String, Long, Long, String)].collect()
    assert(out.toSeq == Seq(("g1", 2L, 1L, "B")))
  }

  test("groupIntersect ignores duplicate (unit, item) observations") {
    val rows = Seq(
      ("g", "u1", "A"), ("g", "u1", "A"), ("g", "u1", "A"),
      ("g", "u2", "A"), ("g", "u2", "B"))
    val out = SetOps.groupIntersect(rows.toDF("g", "u", "item"), "g", "u", "item")
      .select("n_common", "common_str").as[(Long, String)].head()
    assert(out == ((1L, "A")))
  }

  test("decayedAvg divides like-scaled sums; fully-decayed group NULLs the avg") {
    val day = 86400000000L
    val rows = Seq(
      // g1: one fresh row (age 0), one 1-day-old row
      ("g1", 100L * day, 100L), ("g1", 99L * day, 200L),
      // g2: only rows >= 62 days stale relative to the global max day
      ("g2", 10L * day, 500L))
    val out = TimeSeries.decayedAvg(rows.toDF("g", "t_us", "c"), "g", "t_us", col("c"))
      .select("g", "n", "decayed_e6", "weight_e6", "davg_cents")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // g1: decayed = 100e6 + 200e6/2 = 2e8; weight = 1e6 + 5e5
    assert(out("g1") == (("g1", 2L, 200000000L, 1500000L, Some(133L))))
    // g2: age capped at 62 -> 1e6 DIV 2^62 = 0 -> weight 0 -> NULL avg
    assert(out("g2") == (("g2", 1L, 0L, 0L, None)))
  }
}
