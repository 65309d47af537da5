package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Planted-fixture semantics for the backward as-of join: inclusive
  * matching, carry-forward across gaps, left-outer nulls before the first
  * right row, per-key isolation, null-key drop. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 5L, "a"),   // after r@3 -> 3
    (1L, 10L, "b"),  // exactly at r@10 -> inclusive match 10
    (1L, 11L, "c"),  // carry 10 forward
    (2L, 4L, "d"),   // key 2 has its own history -> 2
    (3L, 7L, "e")    // key 3 has no right rows -> null
  ).toDF("k", "ts", "tag")

  private lazy val right = Seq(
    (1L, 3L, "r3"), (1L, 10L, "r10"), (1L, 99L, "r99"),
    (2L, 2L, "s2")
  ).toDF("k", "rts", "rtag")

  test("asOfBackward: inclusive latest-at-or-before per key, null when none") {
    val got = AsOfJoin.asOfBackward(left, right, Seq("k"), "ts", "rts")
      .orderBy("k", "ts")
      .as[(Long, Long, String, Option[Long], Option[String])].collect().toSeq
    assert(got === Seq(
      (1L, 5L, "a", Some(3L), Some("r3")),
      (1L, 10L, "b", Some(10L), Some("r10")),
      (1L, 11L, "c", Some(10L), Some("r10")),
      (2L, 4L, "d", Some(2L), Some("s2")),
      (3L, 7L, "e", None, None)))
  }

  test("intervalJoin: half-open window, cross-bucket match, exactly-once pairs") {
    // length 10: left at ts=8 covers buckets 0 and 1 — its window [8, 18)
    // must catch rights in the NEXT bucket (12) but not at the bound (18)
    val l = Seq((1L, 8L, "p1"), (1L, 20L, "p2"), (2L, 8L, "q1"))
      .toDF("k", "lts", "ltag")
    val r = Seq(
      (1L, 8L, "r-eq"),    // == lts: included (closed lower bound)
      (1L, 12L, "r-next"), // next bucket, inside window
      (1L, 18L, "r-end"),  // == lts+len: EXCLUDED (open upper bound)
      (1L, 7L, "r-before"),
      (1L, 25L, "r-p2"),   // only p2's window
      (2L, 9L, "r-k2"))    // other key
      .toDF("k", "rts", "rtag")
    val got = AsOfJoin.intervalJoin(l, r, Seq("k"), "lts", "rts", length = 10L)
      .select("ltag", "rtag").as[(String, String)].collect().sorted.toSeq
    // p1 [8,18): catches 8 (closed lower) and 12 (next bucket), NOT 18
    // (open upper), 7, or 25; p2 [20,30): catches 25 only; q1: its key's 9.
    // Each pair exactly once despite the two-bucket explode.
    assert(got === Seq(
      ("p1", "r-eq"), ("p1", "r-next"), ("p2", "r-p2"), ("q1", "r-k2")))
  }

  test("asOfBackward: null-key left rows kept unmatched; null-key right rows dropped") {
    val l = Seq((Option(1L), 5L), (Option.empty[Long], 6L)).toDF("k", "ts")
    val r = Seq((Option.empty[Long], 1L)).toDF("k", "rts")
    val got = AsOfJoin.asOfBackward(l, r, Seq("k"), "ts", "rts")
      .orderBy(col("k").asc_nulls_last).collect()
    // both left rows survive (left-outer, like DuckDB ASOF LEFT JOIN);
    // neither matches the null-key right row
    assert(got.length === 2)
    assert(got(0).getLong(0) === 1L && got(0).isNullAt(2))
    assert(got(1).isNullAt(0) && got(1).getLong(1) === 6L && got(1).isNullAt(2))
  }
}
