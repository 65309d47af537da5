package graft.operators

import graft.SparkTestBase

/** Bitmap state must reproduce EXACT distinct-set algebra: cardinality
  * == countDistinct, AND-cardinality == exact intersection, word
  * boundaries (63 bits/word) handled. */
class BitmapsSpec extends SparkTestBase {
  import spark.implicits._

  // ids straddling the 62/63 word boundary on purpose
  private val rows = Seq(
    ("a", 0L), ("a", 62L), ("a", 63L), ("a", 126L), ("a", 62L),
    ("b", 62L), ("b", 63L), ("b", 200L),
    ("c", 7L)
  ).toDF("g", "id")

  test("cardinality == exact countDistinct, across word boundaries") {
    val st = Bitmaps.bitmapState(rows, "g", "id")
    val card = Bitmaps.cardinality(st).as[(String, Long)].collect().toMap
    assert(card === Map("a" -> 4L, "b" -> 3L, "c" -> 1L))
    // one row per touched (g, word): a touches words 0,1,2; b 0,1,3; c 0
    assert(st.count() === 7)
  }

  test("andCardinality == exact intersection, 0 for disjoint groups") {
    val st = Bitmaps.bitmapState(rows, "g", "id")
    val a = Bitmaps.andCardinality(st, "b").as[(String, Long)].collect().toMap
    // a ∩ b = {62, 63}; b ∩ b = itself; c ∩ b = ∅
    assert(a === Map("a" -> 2L, "b" -> 3L, "c" -> 0L))
  }

  test("adjacentAndCardinality: numeric groups, |g ∩ g+step|") {
    val days = Seq((1L, 10L), (1L, 11L), (1L, 70L), (2L, 11L), (2L, 70L),
      (2L, 99L), (3L, 99L)).toDF("day", "uid")
    val st = Bitmaps.bitmapState(days, "day", "uid")
    val r = Bitmaps.adjacentAndCardinality(st, 1L)
      .as[(Long, Long)].collect().toMap
    // day1 ∩ day2 = {11, 70}; day2 ∩ day3 = {99}; day3 ∩ day4 = ∅
    assert(r === Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
  }

  test("adjacentChurn: lost/gained both ways, including one-sided words and the phantom row") {
    val days = Seq((1L, 10L), (1L, 11L), (1L, 70L), (2L, 11L), (2L, 70L),
      (2L, 99L), (3L, 199L)).toDF("day", "uid")
    val st = Bitmaps.bitmapState(days, "day", "uid")
    val r = Bitmaps.adjacentChurn(st, 1L)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // day0 (phantom): nothing lost, all of day1 gained
    // day1 -> day2: lost {10}, gained {99}
    // day2 -> day3: lost {11,70,99}, gained {199} (word 3 exists only in day3)
    // day3 -> day4: everyone lost, nothing gained
    assert(r === Map(
      0L -> ((0L, 3L)), 1L -> ((1L, 1L)), 2L -> ((3L, 1L)), 3L -> ((1L, 0L))))
  }
}
