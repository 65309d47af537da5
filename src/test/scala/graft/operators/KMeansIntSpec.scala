package graft.operators

import graft.SparkTestBase

/** Exact-integer Lloyd's on planted clusters. */
class KMeansIntSpec extends SparkTestBase {
  import spark.implicits._

  test("fit separates planted clusters; stats follow the exact recurrence") {
    // two tight planted clusters in 2-d; seeds are vec_ids 0 and 1 (one in
    // each cluster), so one iteration already converges
    val embs = Seq(
      (0L, Array(0.10f, 0.00f)),
      (1L, Array(0.90f, 1.00f)),
      (2L, Array(0.00f, 0.10f)),
      (3L, Array(1.00f, 0.90f)),
      (4L, Array(0.05f, 0.05f))
    ).toDF("vec_id", "embedding")

    val r = KMeansInt.fit(spark, embs, "embedding", k = 2, iters = 2)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(r.map(_._1) === Seq(0, 1))
    val byCid = r.map(x => x._1 -> x).toMap
    assert(byCid(0)._2 === 3L && byCid(1)._2 === 2L) // {0,2,4} vs {1,3}

    // centroid of cluster 0 after iter 1: per-dim integer means of
    // (100000,0),(0,100000),(50000,50000) -> (50000,50000); stable at
    // iter 2; centroid_sum = 100000
    assert(byCid(0)._3 === 100000L)
    // cluster 1: (900000,1000000),(1000000,900000) -> (950000,950000)
    assert(byCid(1)._3 === 1900000L)
    // inertia_e6: dists (2500e6+2500e6)=5e9 scaled -> 5000 per member of
    // cluster 0 except... each of the 3 members is at (±50000,∓50000) or
    // (0,0) from the mean: d = 50000^2*2 = 5e9 -> 5000; member 4 d=0
    assert(byCid(0)._4 === 10000L)
    assert(byCid(1)._4 === 10000L)
  }

  test("fitPq: subspaces cluster INDEPENDENTLY in one training pass") {
    // dim 4, subDim 2 -> subspaces {0,1} and {2,3}. Planted so the two
    // subspaces partition the vectors DIFFERENTLY: sub 0 groups {0,2} vs
    // {1,3}; sub 1 groups {0,1} vs {2,3}. A whole-vector k-means cannot
    // produce both splits — only a per-subspace fit can.
    val embs = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")

    val r = KMeansInt.fitPq(spark, embs, "embedding",
        subDim = 2, k = 2, iters = 2)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    // seeds: vec 0 -> cid 0, vec 1 -> cid 1.
    // sub 0: seeds (0,0)/(1e6,1e6) -> immediate split {0,2} vs {1,3}.
    // sub 1: BOTH seeds are (0,0); round 1 ties everything to cid 0,
    //   emptied cid 1 carries (0,0); round 2 cid 0 has drifted to the
    //   global mean, so the carried cid 1 recaptures {0,1} and cid 0
    //   keeps {2,3} — the empty-cluster carry rule converging to the
    //   OTHER split than sub 0. No whole-vector fit produces both.
    val bySub = r.groupBy(_._1)
    assert(bySub(0L).map(x => x._2 -> x._3).toMap === Map(0 -> 2L, 1 -> 2L))
    assert(bySub(1L).map(x => x._2 -> x._3).toMap === Map(0 -> 2L, 1 -> 2L))
    // exact planted means, zero inertia, in both subspaces — but with
    // OPPOSITE cid orientation (sub 0: cid 1 is the ones-corner; sub 1:
    // cid 0 is)
    val s0 = bySub(0L).map(x => x._2 -> x).toMap
    val s1 = bySub(1L).map(x => x._2 -> x).toMap
    assert(s0(0)._4 === 0L && s0(1)._4 === 2000000L)
    assert(s1(0)._4 === 2000000L && s1(1)._4 === 0L)
    assert(r.forall(_._5 === 0L))
  }

  test("emptied cluster keeps its previous centroid and drops from final stats") {
    // identical vectors: every assignment ties to cid 0, so cid 1 empties
    // after the seed round — its centroid must carry (not NULL out), and
    // the output has one row for the single non-empty final cluster
    val same = Seq(
      (0L, Array(0.50f)), (1L, Array(0.50f)), (2L, Array(0.50f))
    ).toDF("vec_id", "embedding")
    val r = KMeansInt.fit(spark, same, "embedding", k = 2, iters = 2)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(r === Seq((0, 3L, 500000L, 0L)))
  }
}
