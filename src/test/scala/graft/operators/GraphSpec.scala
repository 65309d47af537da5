package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PageRank on a hand graph with known mass flow. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenEdges extracts weighted adjacent pairs; single-token docs yield none") {
    val docs = Seq(
      (0L, "a b a b"), // a→b ×2, b→a ×1
      (1L, "a b"),     // a→b ×1
      (2L, "c")        // no edges
    ).toDF("doc_id", "text")
    val edges = Graph.tokenEdges(docs, "text")
      .as[(String, String, Long)].collect().map(e => (e._1, e._2) -> e._3).toMap
    assert(edges === Map(("a", "b") -> 3L, ("b", "a") -> 1L))
  }

  test("pageRank: sink accumulates, ranks follow the exact integer recurrence") {
    // star into a sink: a→c, b→c, c→a — c should outrank a, a outrank b
    val edges = Seq(
      ("a", "c", 1L), ("b", "c", 1L), ("c", "a", 1L)
    ).toDF("src", "dst", "c")
    val r = Graph.pageRank(spark, edges, iters = 5)
      .as[(String, Long)].collect().toMap

    // replay the recurrence in exact Long arithmetic (n = 3)
    val t = Graph.TotalMass; val n = 3L
    val base = 15L * (t / n) / 100L
    val share = 1000000L // every node has a single out-edge: share = 1.0
    var rk = Map("a" -> t / n, "b" -> t / n, "c" -> t / n)
    for (_ <- 1 to 5) {
      def in(v: String) = v match {
        case "c" => (rk("a") * share) / 1000000L + (rk("b") * share) / 1000000L
        case "a" => (rk("c") * share) / 1000000L
        case _   => 0L
      }
      rk = rk.keys.map(v => v -> (base + 85L * in(v) / 100L)).toMap
    }
    assert(r === rk)
    assert(r("c") > r("a") && r("a") > r("b"))
  }

  test("pageRank: broadcast path == shuffle-fallback path, rank for rank") {
    // r16 optimization: the small-V recurrence runs as nested broadcast
    // joins + a no-in-edge union; past broadcastNodesMax it falls back to
    // the r15 shuffle-join + checkpoint form. Same int64 ranks, proven
    // here on a graph with dangling nodes, sinks, and weighted edges.
    val edges = Seq(
      ("a", "c", 2L), ("b", "c", 1L), ("c", "a", 3L),
      ("d", "a", 1L), ("d", "c", 1L) // d dangles (no in-edges)
    ).toDF("src", "dst", "c")
    val broadcastPath = Graph.pageRank(spark, edges, iters = 4)
      .as[(String, Long)].collect().toMap
    Caching.releaseAll()
    val shufflePath = Graph.pageRank(spark, edges, iters = 4,
        broadcastNodesMax = 0L)
      .as[(String, Long)].collect().toMap
    Caching.releaseAll()
    assert(broadcastPath === shufflePath)
  }
}
