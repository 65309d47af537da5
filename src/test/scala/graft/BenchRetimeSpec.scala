package graft

import org.scalatest.funsuite.AnyFunSuite

/** Class-envelope retime trigger (VERDICT r13 task 3): the bench's
  * self-adjudication must re-time every query whose in-sequence
  * reading exceeds 2x its recorded class envelope — not just the 4
  * slowest (x98 ran 3.4x its class in BENCH_r13 and escaped the top-4
  * cutoff, leaving the artifact without adjudication evidence). */
class BenchRetimeSpec extends AnyFunSuite {

  private val env = Map("a" -> 1.0, "b" -> 0.5, "c" -> 0.2, "d" -> 0.1,
    "e" -> 0.1, "slow" -> 1.0)

  test("top-4 slowest are always retimed") {
    val res = Seq("a" -> 1.0, "b" -> 0.5, "c" -> 0.2, "d" -> 0.11, "e" -> 0.1)
    assert(Bench.retimeTargets(res, env) === Seq("a", "b", "c", "d"))
  }

  test("a mid-pack outlier above 2x its envelope is retimed even outside the top-4") {
    // the r13 x98 shape: 5 slower queries occupy the top-4, the outlier
    // reads 3.4x its class but would miss the cutoff
    val res = Seq("q1" -> 9.0, "q2" -> 8.0, "q3" -> 7.0, "q4" -> 6.0,
      "b" -> 1.7, "c" -> 0.21)
    val t = Bench.retimeTargets(res, env)
    assert(t.contains("b"), "3.4x-envelope outlier must be retimed")
    assert(t.take(4) === Seq("q1", "q2", "q3", "q4"))
    // c is 1.05x its envelope AND under the 0.3 s floor: not retimed
    assert(!t.contains("c"))
  }

  test("sub-floor jitter and queries without an envelope never trigger") {
    val res = Seq("d" -> 0.25, "unknown" -> 0.29,
      "q1" -> 9.0, "q2" -> 8.0, "q3" -> 7.0, "q4" -> 6.0)
    val t = Bench.retimeTargets(res, env)
    assert(t === Seq("q1", "q2", "q3", "q4"))
  }

  test("failed queries (negative seconds) are never retimed; the list is capped") {
    val res = ("bad" -> -1.0) +: (1 to 30).map(i => s"s$i" -> 10.0 * i)
    val t = Bench.retimeTargets(res,
      (1 to 30).map(i => s"s$i" -> 0.1).toMap)
    assert(!t.contains("bad") && t.size === 12)
  }

  test("outlier adjudication: load vs code is a machine-made call (r15)") {
    // the same code at class speed in a quiet JVM = host contention
    assert(Bench.adjudicateOutlier(1.10, Some(3.0), Some(0.62)) === "load")
    // at the 2x boundary: still load (the trigger threshold itself)
    assert(Bench.adjudicateOutlier(1.24, Some(3.0), Some(0.62)) === "load")
    // slow in BOTH readings = a real plan regression
    assert(Bench.adjudicateOutlier(2.0, Some(3.0), Some(0.62)) === "code")
    // r16: a top-4 pick whose in-sequence reading is IN class must never
    // draw "code" from a contended isolated child alone (the x87 false
    // positive: in-sequence 1.1x class, child 4.4x at 1-min load 9)
    assert(Bench.adjudicateOutlier(8.9, Some(2.2), Some(2.01)) === "load")
    // no recorded class (new query via top-4): no class verdict possible
    assert(Bench.adjudicateOutlier(1.10, Some(3.0), None) === "no_envelope")
    assert(Bench.adjudicateOutlier(1.10, Some(3.0), Some(0.0)) === "no_envelope")
  }

  test("outlier adjudication is load-aware (r17): hot-host readings prove contention, not code") {
    // the r16 ingest_rdatas shape: both readings above 2x class, both
    // taken at 1-min loads 8.3/14.8 on 32 cpus (> cpus/4 = 8) — neither
    // reading can prove a regression
    assert(Bench.adjudicateOutlier(1.90, Some(3.80), Some(0.34),
      loadIsolated = 14.8, loadInSequence = 8.3, cpus = 32) === "contended")
    // same readings on a quiet host: a real regression
    assert(Bench.adjudicateOutlier(1.90, Some(3.80), Some(0.34),
      loadIsolated = 2.1, loadInSequence = 3.0, cpus = 32) === "code")
    // one quiet reading is enough to brand code (the in-sequence one)
    assert(Bench.adjudicateOutlier(1.90, Some(3.80), Some(0.34),
      loadIsolated = 14.8, loadInSequence = 4.0, cpus = 32) === "code")
    // a missing load sample (-1) never proves contention
    assert(Bench.adjudicateOutlier(1.90, Some(3.80), Some(0.34),
      loadIsolated = -1.0, loadInSequence = -1.0, cpus = 32) === "code")
    // in-class readings stay "load" regardless of recorded loads
    assert(Bench.adjudicateOutlier(0.50, Some(3.80), Some(0.34),
      loadIsolated = 14.8, loadInSequence = 14.8, cpus = 32) === "load")
    // ADVICE r16: a MISSING in-sequence reading must not read as
    // "≤ 2x envelope" — isolated-only rule applies
    assert(Bench.adjudicateOutlier(1.90, None, Some(0.34),
      loadIsolated = 2.0, loadInSequence = -1.0, cpus = 32) === "code")
    assert(Bench.adjudicateOutlier(0.50, None, Some(0.34)) === "load")
    // absent in-sequence + hot child: contended (the child alone cannot
    // prove code from a busy box)
    assert(Bench.adjudicateOutlier(1.90, None, Some(0.34),
      loadIsolated = 14.8, cpus = 32) === "contended")
  }

  test("section-scoped bench-line parse: the loads map must not clobber the queries map") {
    val line = """{"metric":"total","value":3.0,"unit":"sec",""" +
      """"queries":{"q1":1.5,"q2":-1.0},"sf":"x",""" +
      """"loads":{"q1":8.25,"q2":9.00},"load_sweep":{"start":1.00,"end":2.00}}"""
    assert(Bench.sectionMap(line, "queries") === Map("q1" -> 1.5, "q2" -> -1.0))
    assert(Bench.sectionMap(line, "loads") === Map("q1" -> 8.25, "q2" -> 9.0))
    assert(Bench.sectionMap(line, "absent") === Map.empty)
    assert(Bench.sectionMap("""no json here""", "queries") === Map.empty)
    // a section that gains a NESTED object must still parse to its full
    // extent (ADVICE r15: first-'}' scanning truncated silently) — and
    // an unclosed section parses to empty, not partially
    val nested = """{"queries":{"q1":1.5,"sub":{"x":9.0},"q2":2.5},""" +
      """"loads":{"q1":3.0}}"""
    assert(Bench.sectionMap(nested, "queries") ===
      Map("q1" -> 1.5, "x" -> 9.0, "q2" -> 2.5))
    assert(Bench.sectionMap("""{"queries":{"q1":1.5""", "queries") === Map.empty)
  }

  test("envelope file parse: flat name->seconds map, tolerant of absence") {
    val f = java.io.File.createTempFile("env", ".json")
    val w = new java.io.PrintWriter(f)
    w.write("""{"note":"x","envelope":{"q1":1.25,"q2_x":0.5}}""")
    w.close()
    assert(Bench.readEnvelope(f.getPath) === Map("q1" -> 1.25, "q2_x" -> 0.5))
    assert(Bench.readEnvelope("/nonexistent/path.json") === Map.empty)
    f.delete()
  }
}
