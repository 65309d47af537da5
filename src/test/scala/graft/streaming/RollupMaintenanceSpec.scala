package graft.streaming

import graft.SparkTestBase
import IncrementalJoinAggStar.StarSpec

/** Every rollup table maintained from the base view's changelog must
  * equal the base view re-grouped under its projection after EVERY
  * batch — including batches whose changelog rows are retractions
  * (dim re-attrs that move groups). */
class RollupMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private val specG2 = StarSpec(Seq(2, 1), groupAttrs = Seq((1, 2), (2, 1)))
  private type Dim = (Long, Option[Long], Option[String])
  private val sets = Seq(Seq(0), Seq(1), Seq.empty[Int])

  private def fold(state: String, rollups: String,
      fb: Seq[(Long, Long, Long, Long)], ups: Map[(Int, Int), Seq[Dim]],
      id: Long): Unit = {
    val d = (1 to specG2.B).map { b =>
      (1 to specG2.branchDepths(b - 1)).map { i =>
        ups.getOrElse((b, i), Seq.empty[Dim]).toDF("k", "vl", "vs")
      }
    }
    val dc = (1 to specG2.B).map { b =>
      (1 to specG2.branchDepths(b - 1)).map(_ => ("k", "vl", "vs"))
    }
    IncrementalJoinAggStar.processBatch(specG2,
      fb.toDF("k1", "k2", "id", "m"), Seq("k1", "k2"), "id", "m",
      Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"), Seq("k1", "k2"), "id",
      d, dc, state, id, numBuckets = 4)
    RollupMaintenance.processStarBatch(spark, state, rollups, sets, id,
      numBuckets = 4)
  }

  private def baseView(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAggStar.view(spark, state)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def checkLattice(state: String, rollups: String): Unit = {
    val base = baseView(state)
    sets.foreach { set =>
      val expected = base.toSeq
        .map { case (g, (m, c)) =>
          val parts = g.split("\u0001", -1)
          set.map(parts(_)).mkString("\u0001") -> (m, c)
        }
        .groupBy(_._1)
        .map { case (g, rows) =>
          g -> (rows.map(_._2._1).sum, rows.map(_._2._2).sum)
        }
        .filter(_._2._2 > 0)
      val got = RollupMaintenance.view(spark, rollups, set)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === expected, s"set ${RollupMaintenance.setName(set)}")
    }
  }

  test("lattice ≡ base re-grouped after every batch, through retraction batches; replay no-op") {
    val state = tmpDir("rollup-base"); val rollups = tmpDir("rollup-lat")
    // batch 0: facts + full dims — groups (A,X) (A,Y) (B,X)
    fold(state, rollups,
      Seq((10L, 70L, 1L, 100L), (10L, 71L, 2L, 50L), (20L, 70L, 3L, 7L)),
      Map(
        (1, 1) -> Seq((10L, Some(500L), None), (20L, Some(501L), None)),
        (1, 2) -> Seq((500L, None, Some("A")), (501L, None, Some("B"))),
        (2, 1) -> Seq((70L, None, Some("X")), (71L, None, Some("Y")))), 0L)
    checkLattice(state, rollups)
    // batch 1: retraction — customer 500 re-attrs A→C, every (A,*)
    // group retracts and re-emits under (C,*); the lattice must follow
    // on BOTH axes and the grand total must stay flat
    fold(state, rollups, Nil,
      Map((1, 2) -> Seq((500L, None, Some("C")): Dim)), 1L)
    checkLattice(state, rollups)
    assert(RollupMaintenance.view(spark, rollups, Nil)
      .as[(String, Long, Long)].collect().toSeq === Seq(("", 157L, 3L)))
    // batch 2: more facts for an existing group
    fold(state, rollups, Seq((20L, 71L, 4L, 9L)), Map.empty, 2L)
    checkLattice(state, rollups)
    // replay of the last rollup fold: markers skip, totals unchanged
    RollupMaintenance.processStarBatch(spark, state, rollups, sets, 2L,
      numBuckets = 4)
    checkLattice(state, rollups)
  }

  test("fold order follows the changelog, not current state: late fold of an old batch is rejected by attribution") {
    // the contract is batch-driven: folding batch b reads exactly the
    // changelog rows stamped b — folding them twice under DIFFERENT
    // batch ids would double-count, and the require guards ad-hoc ids
    val state = tmpDir("rollup-base2"); val rollups = tmpDir("rollup-lat2")
    intercept[IllegalArgumentException] {
      RollupMaintenance.processBatch(
        Seq(("A\u0001X", 1L, 1L)).toDF("g", "m", "c"), rollups, sets, -1L)
    }
    intercept[IllegalArgumentException] {
      RollupMaintenance.processBatch(
        Seq(("A\u0001X", 1L, 1L)).toDF("g", "m", "c"), rollups,
        Seq(Seq(0, 0)), 0L)
    }
    // and an empty changelog batch is a clean no-op
    fold(state, rollups, Nil, Map.empty, 0L)
    sets.foreach { set =>
      assert(RollupMaintenance.view(spark, rollups, set).count() === 0L)
    }
  }
}
