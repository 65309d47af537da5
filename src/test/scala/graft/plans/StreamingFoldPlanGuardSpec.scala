package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkTestBase
import graft.streaming.{IncrementalDupSpans, IncrementalFunnel, IncrementalJoinAggChain, IncrementalJoinAggN, IncrementalNearDup, IncrementalStrictFunnel, IncrementalTemporalJoinAgg}
import graft.tools.PlanSweep

/** Plan regression guard for the STREAMING fold plans — the per-batch
  * delta computations run inside `upsertBucketedStaged`, outside
  * [[PlanGuardSpec]]'s harness-query sweep, and they carry their own
  * plan-shape invariants proven the hard way in r10:
  *   1. no CartesianProduct / BroadcastNestedLoopJoin anywhere in a
  *      fold (every join is user-/doc-keyed equi or a broadcast hash);
  *   2. the N-bucket state union MUST be consumed through a cache cut
  *      (InMemoryTableScan) once state exists — without it each state
  *      reference re-serializes the union scan into task binaries
  *      (measured: 2→33 MiB binaries and a driver OOM at 8g on the
  *      sf0.1 rehearsal before the fix).
  * Captures every plan executed during REAL processBatch calls via a
  * QueryExecutionListener, so the guard sees the actual staged-delta
  * write plans, not a reconstruction. */
class StreamingFoldPlanGuardSpec extends SparkTestBase {
  import spark.implicits._

  private def withCapturedPlans(body: => Unit): Seq[QueryExecution] = {
    val captured = mutable.ArrayBuffer.empty[QueryExecution]
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = captured.synchronized { captured += qe }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      body
      // the execution listener rides the async bus — drain before read
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
    } finally spark.listenerManager.unregister(l)
    captured.synchronized { captured.toSeq }
  }

  private def auditAll(plans: Seq[QueryExecution], tag: String): Unit = {
    assert(plans.nonEmpty, s"$tag captured no executed plans")
    plans.foreach { qe =>
      val a = PlanSweep.audit(qe.executedPlan, explainStr = "")
      assert(a.cartesians == 0, s"$tag fold plans a CartesianProduct:\n${qe.executedPlan}")
      assert(a.bnlj == 0, s"$tag fold plans a BroadcastNestedLoopJoin:\n${qe.executedPlan}")
    }
  }

  private def hasCacheCut(plans: Seq[QueryExecution]): Boolean =
    plans.exists(qe => PlanSweep.allNodes(qe.executedPlan)
      .exists(_.getClass.getSimpleName.startsWith("InMemoryTableScan")))

  test("near-dup fold: no cartesian/BNLJ; state consumed through the cache cut") {
    val state = tmpDir("pg-nd")
    val b1 = Seq(1L -> "a b c d e f g", 2L -> "h i j k l m n")
    val b2 = Seq(3L -> "a b c d e f g x")
    IncrementalNearDup.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5, stateDir = state, batchId = 0L)
    val plans = withCapturedPlans {
      IncrementalNearDup.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.5, stateDir = state, batchId = 1L)
    }
    auditAll(plans, "near-dup")
    assert(hasCacheCut(plans),
      "batch-1 near-dup fold read state without an InMemoryTableScan cut " +
        "— the r10 task-binary-explosion regression")
  }

  test("funnel fold: no cartesian/BNLJ; state consumed through the cache cut") {
    val state = tmpDir("pg-fun")
    val steps = Seq("view", "click", "purchase")
    val b1 = Seq((1L, "view", 0L), (1L, "click", 10L))
    val b2 = Seq((1L, "purchase", 20L))
    IncrementalFunnel.processBatch(b1.toDF("u", "et", "t"), "u", "t", "et",
      steps, 100L, state, 0L)
    val plans = withCapturedPlans {
      IncrementalFunnel.processBatch(b2.toDF("u", "et", "t"), "u", "t", "et",
        steps, 100L, state, 1L)
    }
    auditAll(plans, "funnel")
    assert(hasCacheCut(plans), "funnel fold lost its state cache cut")
  }

  test("chain join-agg fold (r10): no cartesian/BNLJ in any executed plan") {
    val state = tmpDir("pg-jac")
    IncrementalJoinAggChain.processBatch(
      Seq((10L, 1L, 100L)).toDF("k1", "id", "m"), "k1", "id", "m",
      Seq.empty[(Long, Long)].toDF("k1", "id"), "k1", "id",
      Seq((10L, 500L)).toDF("k1", "k2"), "k1", "k2",
      Seq((500L, "A")).toDF("k2", "g"), "k2", "g", state, 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      IncrementalJoinAggChain.processBatch(
        Seq((10L, 2L, 50L)).toDF("k1", "id", "m"), "k1", "id", "m",
        Seq((10L, 1L)).toDF("k1", "id"), "k1", "id",
        Seq((10L, 600L)).toDF("k1", "k2"), "k1", "k2",
        Seq((600L, "B")).toDF("k2", "g"), "k2", "g", state, 1L, numBuckets = 4)
    }
    auditAll(plans, "chain join-agg")
  }

  test("depth-generic join-agg fold (r10): no cartesian/BNLJ at depth 3") {
    val state = tmpDir("pg-jn")
    def fold(fb: Seq[(Long, Long, Long)], l1: Seq[(Long, Long)],
        l2: Seq[(Long, Long)], l3: Seq[(Long, String)], id: Long): Unit =
      IncrementalJoinAggN.processBatch(
        fb.toDF("k", "id", "m"), "k", "id", "m",
        Seq.empty[(Long, Long)].toDF("k", "id"), "k", "id",
        Seq(l1.toDF("k", "v"), l2.toDF("k", "v"), l3.toDF("k", "v")),
        Seq(("k", "v"), ("k", "v"), ("k", "v")), state, id, numBuckets = 4)
    fold(Seq((10L, 1L, 100L)), Seq((10L, 500L)), Seq((500L, 900L)),
      Seq((900L, "A")), 0L)
    val plans = withCapturedPlans {
      fold(Seq((20L, 2L, 7L)), Seq((20L, 500L)), Seq((500L, 901L)),
        Seq((901L, "B")), 1L)
    }
    auditAll(plans, "depth-generic join-agg")
  }

  test("dup-spans fold (r10): no cartesian/BNLJ incl. the retro path") {
    val state = tmpDir("pg-ds")
    val run = (1 to 50).map(i => s"t$i").mkString(" ")
    IncrementalDupSpans.processBatch(
      Seq(1L -> s"$run unique one").toDF("doc_id", "text"),
      "doc_id", "text", 40, state, 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      // doc 2 shares the run — triggers the retroactive recompute of doc 1
      IncrementalDupSpans.processBatch(
        Seq(2L -> s"other $run").toDF("doc_id", "text"),
        "doc_id", "text", 40, state, 1L, numBuckets = 4)
    }
    auditAll(plans, "dup-spans")
  }

  test("temporal join-agg fold (r11): no cartesian/BNLJ incl. the interval-diff path") {
    val state = tmpDir("pg-tja")
    IncrementalTemporalJoinAgg.processBatch(
      Seq((1L, 150L, 100L, 10L)).toDF("id", "t", "m", "k"),
      Seq.empty[(Long, Long)].toDF("id", "k"),
      Seq((10L, 100L, "a")).toDF("k", "vf", "vs"),
      Seq.empty[(Long, Long)].toDF("k", "vf"), state, 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      // late version + version delete + fact delete: exercises both delta
      // terms, the interval diff, and the range re-resolution join (which
      // must stay an equi-join on k with a post-filter, never a BNLJ)
      IncrementalTemporalJoinAgg.processBatch(
        Seq((2L, 250L, 7L, 10L)).toDF("id", "t", "m", "k"),
        Seq((1L, 10L)).toDF("id", "k"),
        Seq((10L, 120L, "b")).toDF("k", "vf", "vs"),
        Seq((10L, 100L)).toDF("k", "vf"), state, 1L, numBuckets = 4)
    }
    auditAll(plans, "temporal join-agg")
  }

  test("temporal STAR fold (r11): no cartesian/BNLJ with both branches + facts live") {
    val state = tmpDir("pg-tstar")
    graft.streaming.IncrementalTemporalStar.processBatch(
      Seq((1L, 150L, 100L, 10L, 10L)).toDF("id", "t", "m", "k1", "k2"),
      Seq.empty[(Long, Long, Long)].toDF("id", "k1", "k2"),
      Seq(Seq((10L, 100L, "a")).toDF("k", "vf", "vs"),
        Seq.empty[(Long, Long, String)].toDF("k", "vf", "vs")),
      Seq(Seq.empty[(Long, Long)].toDF("k", "vf"),
        Seq.empty[(Long, Long)].toDF("k", "vf")),
      state, 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      // both branches touched + a new fact + a fact delete in one batch:
      // exercises every delta term, the per-branch interval diffs, and
      // the as-of resolutions (equi-join on k with a post-filter + one
      // max aggregate — never a BNLJ/cartesian)
      graft.streaming.IncrementalTemporalStar.processBatch(
        Seq((2L, 250L, 7L, 10L, 10L)).toDF("id", "t", "m", "k1", "k2"),
        Seq((1L, 10L, 10L)).toDF("id", "k1", "k2"),
        Seq(Seq((10L, 120L, "b")).toDF("k", "vf", "vs"),
          Seq((10L, 50L, "x")).toDF("k", "vf", "vs")),
        Seq(Seq((10L, 100L)).toDF("k", "vf"),
          Seq.empty[(Long, Long)].toDF("k", "vf")),
        state, 1L, numBuckets = 4)
    }
    auditAll(plans, "temporal star")
  }

  test("interval join-agg fold (r11): no cartesian/BNLJ on either range join") {
    val state = tmpDir("pg-ija")
    graft.streaming.IncrementalIntervalJoinAgg.processBatch(
      Seq((1L, 150L, 100L, 10L)).toDF("id", "t", "m", "k"),
      Seq.empty[(Long, Long)].toDF("id", "k"),
      Seq((5L, 10L, 100L, 300L, "a")).toDF("iid", "k", "s", "e", "vs"),
      Seq.empty[(Long, Long)].toDF("iid", "k"), state, 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      // new fact + fact delete + window replace + window delete in one
      // batch: both delta terms run their range joins, which must stay
      // equi-keyed on k with the [s,e) residual — never a BNLJ
      graft.streaming.IncrementalIntervalJoinAgg.processBatch(
        Seq((2L, 250L, 7L, 10L)).toDF("id", "t", "m", "k"),
        Seq((1L, 10L)).toDF("id", "k"),
        Seq((5L, 10L, 100L, 400L, "b"), (6L, 10L, 200L, 500L, "c"))
          .toDF("iid", "k", "s", "e", "vs"),
        Seq((7L, 10L)).toDF("iid", "k"), state, 1L, numBuckets = 4)
    }
    auditAll(plans, "interval join-agg")
  }

  test("sessions fold (r11): no cartesian/BNLJ in the re-derive path") {
    val state = tmpDir("pg-ses")
    graft.streaming.IncrementalSessions.processBatch(
      Seq((1L, 0L, 10L), (2L, 250L, 10L)).toDF("id", "t", "k"),
      Seq.empty[(Long, Long)].toDF("id", "k"),
      gap = 100L, stateDir = state, batchId = 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      // bridge event (cross-batch session merge) + event delete:
      // exercises the touched-user re-derivation and both row diffs
      graft.streaming.IncrementalSessions.processBatch(
        Seq((3L, 100L, 10L), (4L, 180L, 10L)).toDF("id", "t", "k"),
        Seq((2L, 10L)).toDF("id", "k"),
        gap = 100L, stateDir = state, batchId = 1L, numBuckets = 4)
    }
    auditAll(plans, "sessions")
  }

  test("equality star fold (r12): cross-branch equality flip plans no cartesian/BNLJ") {
    import graft.streaming.IncrementalJoinAggStar
    import graft.streaming.IncrementalJoinAggStar.StarSpec
    val spec = StarSpec(Seq(2, 1), groupAttrs = Seq((1, 2)),
      eqAttrs = Seq(((1, 2), (2, 1))))
    val state = tmpDir("pg-stareq")
    def dims(ups: Map[(Int, Int), Seq[(Long, Option[Long], Option[String])]]) = (
      (1 to 2).map(b => (1 to spec.branchDepths(b - 1)).map(i =>
        ups.getOrElse((b, i),
          Seq.empty[(Long, Option[Long], Option[String])]).toDF("k", "vl", "vs"))),
      (1 to 2).map(b => (1 to spec.branchDepths(b - 1)).map(_ => ("k", "vl", "vs"))))
    val (d0, dc) = dims(Map(
      (1, 1) -> Seq((10L, Some(500L), None)),
      (1, 2) -> Seq((500L, None, Some("A"))),
      (2, 1) -> Seq((70L, None, Some("A")))))
    IncrementalJoinAggStar.processBatch(spec,
      Seq((10L, 70L, 1L, 100L)).toDF("k1", "k2", "id", "m"),
      Seq("k1", "k2"), "id", "m",
      Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"),
      Seq("k1", "k2"), "id", d0, dc, state, 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      // flip the OTHER side of the cross-branch equality: the eq-flip
      // delta term walks both branches from the flipped key — every
      // join in it must stay keyed
      val (d1, _) = dims(Map((2, 1) -> Seq((70L, None, Some("B")))))
      IncrementalJoinAggStar.processBatch(spec,
        Seq.empty[(Long, Long, Long, Long)].toDF("k1", "k2", "id", "m"),
        Seq("k1", "k2"), "id", "m",
        Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "id"),
        Seq("k1", "k2"), "id", d1, dc, state, 1L, numBuckets = 4)
    }
    auditAll(plans, "equality star eq-flip")
  }

  test("equality star fold (r12): LEFT branch arrival (virtual-row term) plans no cartesian/BNLJ") {
    import graft.streaming.IncrementalJoinAggStar
    import graft.streaming.IncrementalJoinAggStar.StarSpec
    val spec = StarSpec(Seq(1), groupAttrs = Seq((1, 1)),
      leftBranches = Set(1))
    val state = tmpDir("pg-starl")
    // facts first: they serve from the NULL group via the virtual row
    IncrementalJoinAggStar.processBatch(spec,
      Seq((10L, 1L, 5L), (11L, 2L, 3L)).toDF("k1", "id", "m"),
      Seq("k1"), "id", "m",
      Seq.empty[(Long, Long)].toDF("k1", "id"), Seq("k1"), "id",
      Seq(Seq(Seq.empty[(Long, Long, String)].toDF("k", "vl", "vs"))),
      Seq(Seq(("k", "vl", "vs"))), state, 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      // the dim ARRIVAL displaces the virtual padded row for k1=10 —
      // the completed-relation delta term must stay keyed throughout
      IncrementalJoinAggStar.processBatch(spec,
        Seq.empty[(Long, Long, Long)].toDF("k1", "id", "m"),
        Seq("k1"), "id", "m",
        Seq.empty[(Long, Long)].toDF("k1", "id"), Seq("k1"), "id",
        Seq(Seq(Seq((10L, 0L, "X")).toDF("k", "vl", "vs"))),
        Seq(Seq(("k", "vl", "vs"))), state, 1L, numBuckets = 4)
    }
    auditAll(plans, "equality star LEFT arrival")
  }

  test("equality star fold (r12): multiRows fan-out batch plans no cartesian/BNLJ") {
    import graft.streaming.IncrementalJoinAggStar
    import graft.streaming.IncrementalJoinAggStar.StarSpec
    val spec = StarSpec(Seq(1), groupAttrs = Seq((1, 1)),
      multiRows = Set((1, 1)))
    val state = tmpDir("pg-starmr")
    IncrementalJoinAggStar.processBatch(spec,
      Seq((10L, 1L, 5L)).toDF("k1", "id", "m"), Seq("k1"), "id", "m",
      Seq.empty[(Long, Long)].toDF("k1", "id"), Seq("k1"), "id",
      Seq(Seq(Seq((10L, 0L, "T1")).toDF("k", "vl", "vs"))),
      Seq(Seq(("k", "vl", "vs"))), state, 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      // a SECOND row for the same key: the fan-out delta multiplies the
      // retained fact through the added row — still keyed joins only
      IncrementalJoinAggStar.processBatch(spec,
        Seq((10L, 2L, 7L)).toDF("k1", "id", "m"), Seq("k1"), "id", "m",
        Seq.empty[(Long, Long)].toDF("k1", "id"), Seq("k1"), "id",
        Seq(Seq(Seq((10L, 0L, "T2")).toDF("k", "vl", "vs"))),
        Seq(Seq(("k", "vl", "vs"))), state, 1L, numBuckets = 4)
    }
    auditAll(plans, "equality star multiRows fan-out")
  }

  test("mixed star fold (r12): temporal + interval branches live in one batch — no cartesian/BNLJ") {
    val state = tmpDir("pg-mstar")
    graft.streaming.IncrementalTemporalStar.processBatch(
      Seq((1L, 150L, 100L, 10L, 10L)).toDF("id", "t", "m", "k1", "k2"),
      Seq.empty[(Long, Long, Long)].toDF("id", "k1", "k2"),
      Seq(Seq((10L, 100L, "a")).toDF("k", "vf", "vs"),
        Seq((5L, 10L, 100L, 300L, "p")).toDF("iid", "k", "s", "e", "vs")),
      Seq(Seq.empty[(Long, Long)].toDF("k", "vf"),
        Seq.empty[(Long, Long)].toDF("iid", "k")),
      state, 0L, numBuckets = 4, intervalBranches = Set(2))
    val plans = withCapturedPlans {
      // new fact + fact delete + late version + window replace + window
      // delete in ONE batch: every delta term runs, including the
      // fan-out interval resolve inside the temporal branch's term and
      // the as-of resolve inside the window branch's term — all joins
      // must stay equi-keyed on k with range/max residuals
      graft.streaming.IncrementalTemporalStar.processBatch(
        Seq((2L, 250L, 7L, 10L, 10L)).toDF("id", "t", "m", "k1", "k2"),
        Seq((1L, 10L, 10L)).toDF("id", "k1", "k2"),
        Seq(Seq((10L, 120L, "b")).toDF("k", "vf", "vs"),
          Seq((5L, 10L, 100L, 400L, "q"), (6L, 10L, 200L, 500L, "r"))
            .toDF("iid", "k", "s", "e", "vs")),
        Seq(Seq.empty[(Long, Long)].toDF("k", "vf"),
          Seq((7L, 10L)).toDF("iid", "k")),
        state, 1L, numBuckets = 4, intervalBranches = Set(2))
    }
    auditAll(plans, "mixed star")
  }

  test("equality star CHUNKED fold (r12): factChunks parts plan no cartesian/BNLJ") {
    import graft.streaming.IncrementalJoinAggStar
    import graft.streaming.IncrementalJoinAggStar.StarSpec
    val spec = StarSpec(Seq(2), groupAttrs = Seq((1, 2)))
    val state = tmpDir("pg-starck")
    def dims(l1: Seq[(Long, Option[Long], Option[String])],
        l2: Seq[(Long, Option[Long], Option[String])]) = (
      Seq(Seq(l1.toDF("k", "vl", "vs"), l2.toDF("k", "vl", "vs"))),
      Seq(Seq(("k", "vl", "vs"), ("k", "vl", "vs"))))
    val (d0, dc) = dims(
      (0 to 5).map(o => (o + 10L, Some(500L + o % 2), Option.empty[String])),
      Seq((500L, None, Some("R1")), (501L, None, Some("R2"))))
    IncrementalJoinAggStar.processBatch(spec,
      (1 to 12).map(i => ((i % 6).toLong + 10L, i.toLong, 7L * i))
        .toDF("k1", "id", "m"),
      Seq("k1"), "id", "m",
      Seq.empty[(Long, Long)].toDF("k1", "id"), Seq("k1"), "id",
      d0, dc, state, 0L, numBuckets = 4)
    val plans = withCapturedPlans {
      // the wave (a level-2 literal flip fanning over every fact) folded
      // with factChunks = 3: every per-chunk part job AND the final
      // staged-delta assembly must stay keyed — no cartesian/BNLJ in any
      // captured plan
      val (d1, _) = dims(Nil, Seq((500L, None, Some("R9"))))
      IncrementalJoinAggStar.processBatch(spec,
        Seq.empty[(Long, Long, Long)].toDF("k1", "id", "m"),
        Seq("k1"), "id", "m",
        Seq.empty[(Long, Long)].toDF("k1", "id"), Seq("k1"), "id",
        d1, dc, state, 1L, numBuckets = 4, factChunks = 3)
    }
    auditAll(plans, "equality star chunked wave")
  }

  test("strict-funnel fold: no cartesian/BNLJ; state consumed through the cache cut") {
    val state = tmpDir("pg-sf")
    val steps = Seq("view", "click", "purchase")
    val b1 = Seq((1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"))
    val b2 = Seq((1L, 15L, "click"))
    IncrementalStrictFunnel.processBatch(b1.toDF("u", "t", "et"), "u", "t", "et",
      steps, 100L, state, 0L)
    val plans = withCapturedPlans {
      IncrementalStrictFunnel.processBatch(b2.toDF("u", "t", "et"), "u", "t", "et",
        steps, 100L, state, 1L)
    }
    auditAll(plans, "strict-funnel")
    assert(hasCacheCut(plans), "strict-funnel fold lost its state cache cut")
  }
}
