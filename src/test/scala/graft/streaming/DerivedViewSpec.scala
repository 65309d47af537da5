package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** View-over-view maintenance (R164): a derived keyed table recomputed
  * each batch for ONLY the keys the base views' changelogs touched
  * must equal the full per-key recompute over the base views after
  * every batch — through base retractions that move keys, empty them
  * on one side, and empty them everywhere (the row-drop path). */
class DerivedViewSpec extends SparkTestBase {
  import spark.implicits._

  private val dSchema = StructType(Seq(StructField("g", StringType),
    StructField("rev", LongType), StructField("purchases", LongType),
    StructField("views", LongType)))

  // two independently-maintained base views over the SAME segment key:
  // A = revenue + purchase count per segment; B = view count per segment
  private def foldBase(state: String, id: Long,
      facts: Seq[(Long, Long, Long)], dims: Seq[(Long, String)]): Unit =
    IncrementalJoinAgg.processBatch(
      facts.toDF("jk", "id", "m"), "jk", "id", "m",
      dims.toDF("jk", "g"), "jk", "g", state, id, numBuckets = 4)

  test("derived conversion view ≡ per-key recompute after every batch") {
    val sA = tmpDir("dv-a"); val sB = tmpDir("dv-b"); val sD = tmpDir("dv-d")

    def roll(id: Long): Unit = {
      // touched = union of the bases' changelog keys for THIS batch
      val touched = IncrementalJoinAgg.changelog(spark, sA)
        .filter(col("batch") === id).select("g")
        .unionByName(IncrementalJoinAgg.changelog(spark, sB)
          .filter(col("batch") === id).select("g"))
        .distinct()
      // derived rows: bucket-prunable post-state reads of both bases
      val a = IncrementalJoinAgg.view(spark, sA)
        .join(touched, Seq("g"), "left_semi")
        .select(col("g"), col("total").as("rev"),
          col("pairs").as("purchases"))
      val b = IncrementalJoinAgg.view(spark, sB)
        .join(touched, Seq("g"), "left_semi")
        .select(col("g"), col("pairs").as("views"))
      DerivedView.processBatch(spark, touched, a.join(b, Seq("g"), "full_outer"),
        sD, id, numBuckets = 4)
    }
    def served(): Map[String, (Option[Long], Option[Long], Option[Long])] =
      DerivedView.view(spark, sD, dSchema)
        .as[(String, Option[Long], Option[Long], Option[Long])].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def expected(): Map[String, (Option[Long], Option[Long], Option[Long])] = {
      val a = IncrementalJoinAgg.view(spark, sA)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val b = IncrementalJoinAgg.view(spark, sB)
        .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
      (a.keySet ++ b.keySet).map { g =>
        g -> (a.get(g).map(_._1), a.get(g).map(_._2), b.get(g))
      }.toMap
    }

    // batch 0: both bases fill; derived = full outer of their keys
    foldBase(sA, 0L, Seq((10L, 1L, 100L), (20L, 2L, 30L)),
      Seq((10L, "s1"), (20L, "s2")))
    foldBase(sB, 0L, Seq((10L, 1L, 1L), (10L, 2L, 1L), (30L, 3L, 1L)),
      Seq((10L, "s1"), (30L, "s3")))
    roll(0L)
    assert(served() === expected())
    assert(served()("s3") === ((None, None, Some(1L))))
    // batch 1: a re-key in A empties s2 there — its derived row must
    // update (A side nulls); s1 untouched in B stays
    foldBase(sA, 1L, Nil, Seq((20L, "s1")))
    foldBase(sB, 1L, Nil, Nil)
    roll(1L)
    assert(served() === expected())
    assert(!served().contains("s2"), "s2 vanished from BOTH bases -> dropped")
    // batch 2: empty s3 in B too — the derived row DROPS entirely
    foldBase(sA, 2L, Nil, Nil)
    foldBase(sB, 2L, Nil, Seq((30L, "s1")))
    roll(2L)
    assert(served() === expected())
    assert(!served().contains("s3"))
    // replay the last derived fold: a strict no-op (staged protocol)
    val before = served()
    roll(2L)
    assert(served() === before, "replay changed the derived view")
    // point read prunes to the named keys
    val p = DerivedView.viewFor(spark, sD, Seq("s1"), dSchema, numBuckets = 4)
      .as[(String, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(p === served().filter(_._1 == "s1"))
  }
}
