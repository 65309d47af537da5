package graft.streaming

import graft.SparkTestBase
import graft.operators.{Dedup, Similarity}

/** Deletion-exact forget (R147): after forgetting docs, the served
  * labels must equal the batch pairs→clusters sweep over
  * corpus-minus-forgotten — including component SPLITS (the forgotten
  * doc was the only bridge) and RAISED labels (the forgotten doc was
  * the component's min-id representative), both impossible under the
  * monotone fold; untouched components must not be touched; frozen
  * survivors must make the pass throw rather than guess. */
class ForgetMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  // --- text fixture: a 3-doc chain A–B–C where B is the only bridge.
  // A and C share no vocabulary; B is half of each, J(A,B)=J(B,C)=
  // 38/78≈0.487, J(A,C)=0. One hash per band (8 bands) makes band
  // recall ~1-(1-J)^8≈0.995 at this J — and both the batch sweep and
  // the maintained view use the SAME seeded pipeline, so truth and
  // view agree deterministically regardless.
  private val aTok = (1 to 40).map(i => s"a$i").mkString(" ")
  private val cTok = (1 to 40).map(i => s"c$i").mkString(" ")
  private val bTok = aTok + " " + cTok
  private val thr = 0.4

  private def textTruth(ds: Seq[(Long, String)]): Map[Long, Long] = {
    val pairs = Dedup.minhashLshPairs(ds.toDF("doc_id", "text"),
      "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 8,
      threshold = thr)
    val comp = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    graft.operators.Caching.releaseAll()
    ds.map { case (id, _) => id -> comp.getOrElse(id, id) }.toMap
  }

  private def foldText(state: String, b: Seq[(Long, String)], id: Long): Unit =
    IncrementalNearDup.processBatch(b.toDF("doc_id", "text"),
      "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 8,
      threshold = thr, stateDir = state, batchId = id)

  private def servedText(state: String): Map[Long, Long] =
    IncrementalNearDup.labels(spark, state).as[(Long, Long)].collect().toMap

  test("text: forgetting the bridge SPLITS; the representative RAISES; unknown ids no-op") {
    val state = tmpDir("fg-text")
    val pair = Seq(10L -> ("x " * 30).trim, 11L -> ("x " * 29 + "y").trim)
    val all = Seq(1L -> aTok, 2L -> bTok, 3L -> cTok) ++ pair ++
      Seq(20L -> (1 to 40).map(i => s"z$i").mkString(" "))
    foldText(state, all, 0L)
    assert(servedText(state) === textTruth(all))
    assert(servedText(state) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L), "fixture shape: one chained component")

    // forget the bridge: chain splits into singletons {1} and {3};
    // {10,11} and {20} untouched
    val n = IncrementalNearDup.forget(spark, state, Seq(2L).toDF("doc_id"),
      threshold = thr, opId = 1L)
    assert(n === 1L)
    val remaining = all.filterNot(_._1 == 2L)
    assert(servedText(state) === textTruth(remaining))
    assert(servedText(state) === Map(1L -> 1L, 3L -> 3L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    // the mirror no longer probes the forgotten doc's bands
    val bidx = MvPipeline.readBucketedState(spark, s"$state/neardup_bidx")
    assert(bidx.filter("doc_id = 2").isEmpty,
      "forgotten doc's blocking rows must leave the probe mirror")

    // forget the {10,11} representative: 11's label RAISES 10 → 11
    IncrementalNearDup.forget(spark, state, Seq(10L).toDF("doc_id"),
      threshold = thr, opId = 2L)
    val rem2 = remaining.filterNot(_._1 == 10L)
    assert(servedText(state) === textTruth(rem2))
    assert(servedText(state)(11L) === 11L, "label must raise past the forgotten min")

    // unknown id: no-op, returns 0
    assert(IncrementalNearDup.forget(spark, state, Seq(999L).toDF("doc_id"),
      threshold = thr, opId = 3L) === 0L)
    assert(servedText(state) === textTruth(rem2))
  }

  test("text: a re-sent twin of a forgotten doc re-bridges as a NEW doc; forgotten doc never pairs") {
    val state = tmpDir("fg-text2")
    val all = Seq(1L -> aTok, 2L -> bTok, 3L -> cTok)
    foldText(state, all, 0L)
    IncrementalNearDup.forget(spark, state, Seq(2L).toDF("doc_id"),
      threshold = thr, opId = 1L)
    assert(servedText(state) === Map(1L -> 1L, 3L -> 3L))
    // doc 4 = the same text as forgotten 2: re-bridges {1} and {3};
    // equals the batch sweep over {1, 3, 4} — doc 2 stays gone
    foldText(state, Seq(4L -> bTok), 1L)
    val now = Seq(1L -> aTok, 3L -> cTok, 4L -> bTok)
    assert(servedText(state) === textTruth(now))
    assert(servedText(state) === Map(1L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("text: forget is idempotent under replay with the same opId") {
    val state = tmpDir("fg-text3")
    val all = Seq(1L -> aTok, 2L -> bTok, 3L -> cTok)
    foldText(state, all, 0L)
    IncrementalNearDup.forget(spark, state, Seq(2L).toDF("doc_id"),
      threshold = thr, opId = 7L)
    val after = servedText(state)
    // crash-recovery path: same opId re-applies the staged delta (here
    // already swept — recomputes against post-forget state, still exact)
    IncrementalNearDup.forget(spark, state, Seq(2L).toDF("doc_id"),
      threshold = thr, opId = 7L)
    assert(servedText(state) === after)
  }

  test("text: frozen survivors make forget throw (undecidable split)") {
    val state = tmpDir("fg-text4")
    val pair = Seq(10L -> ("x " * 30).trim, 11L -> ("x " * 29 + "y").trim)
    foldText(state, pair, 0L)
    // freeze doc 11 (drop its payload/blocking rows, keep its label)
    IncrementalNearDup.compact(spark, state,
      org.apache.spark.sql.functions.col("doc_id") === 11L)
    assertThrows[IllegalStateException] {
      IncrementalNearDup.forget(spark, state, Seq(10L).toDF("doc_id"),
        threshold = thr, opId = 1L)
    }
    // but forgetting BOTH (no survivors) is pure tombstones — allowed
    IncrementalNearDup.forget(spark, state,
      Seq(10L, 11L).toDF("doc_id"), threshold = thr, opId = 2L)
    assert(servedText(state) === Map.empty)
  }

  test("bootstrap: batch-sweep initialization, exact continuation, forget composes") {
    val state = tmpDir("fg-boot")
    val initial = Seq(1L -> aTok, 2L -> bTok, 3L -> cTok,
      20L -> (1 to 40).map(i => s"z$i").mkString(" "))
    IncrementalNearDup.bootstrap(initial.toDF("doc_id", "text"),
      "doc_id", "text", shingleN = 3, numHashes = 8, numBands = 8,
      threshold = thr, stateDir = state)
    assert(servedText(state) === textTruth(initial))
    assert(servedText(state) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 20L -> 20L))

    // a fold CONTINUES on the bootstrapped state: candidates probe the
    // bootstrapped mirror, verification reads bootstrapped grams
    val late = Seq(21L -> (1 to 39).map(i => s"z$i").mkString(" "))
    foldText(state, late, 0L)
    assert(servedText(state) === textTruth(initial ++ late))
    assert(servedText(state)(21L) === 20L, "new doc must pair with a bootstrapped doc")

    // forget composes with bootstrapped state (the bridge split)
    IncrementalNearDup.forget(spark, state, Seq(2L).toDF("doc_id"),
      threshold = thr, opId = 1L)
    assert(servedText(state) ===
      textTruth((initial ++ late).filterNot(_._1 == 2L)))

    // bootstrap refuses a live state dir
    assertThrows[IllegalArgumentException] {
      IncrementalNearDup.bootstrap(initial.toDF("doc_id", "text"),
        "doc_id", "text", stateDir = state)
    }
  }

  // --- embedding: the bridged two-cluster fixture from the embed spec
  private val dim = 64
  private def vec(deg: Double, scale: Float = 1f): Array[Float] = {
    val a = Array.fill(dim)(0f)
    val r = math.toRadians(deg)
    a(0) = (math.cos(r) * scale).toFloat
    a(1) = (math.sin(r) * scale).toFloat
    a
  }

  test("embedding: forgetting the bridge splits established angle-clusters") {
    val state = tmpDir("fg-emb")
    val t = 0.95
    val vs = Seq((10L, vec(0), 1L), (11L, vec(3, 2f), 1L),
      (20L, vec(30), 1L), (21L, vec(33, 0.5f), 1L), (15L, vec(15), 1L))
    IncrementalEmbedNearDup.processBatch(
      vs.toDF("vec_id", "embedding", "label"), t, dim = dim,
      stateDir = state, batchId = 0L)
    def served(): Map[Long, Long] =
      IncrementalEmbedNearDup.labels(spark, state).as[(Long, Long)].collect().toMap
    assert(served() === Map(10L -> 10L, 11L -> 10L, 15L -> 10L,
      20L -> 10L, 21L -> 10L), "fixture: bridge merges both clusters")

    val n = IncrementalEmbedNearDup.forget(spark, state,
      Seq(15L).toDF("vec_id"), threshold = t, opId = 1L)
    assert(n === 1L)
    // batch truth over the survivors
    val pairs = Similarity.embeddingNearDupPairsLsh(
      vs.filterNot(_._1 == 15L).toDF("vec_id", "embedding", "label"), t, dim = dim)
      .select("id1", "id2")
    val comp = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    graft.operators.Caching.releaseAll()
    val want = vs.filterNot(_._1 == 15L)
      .map { case (id, _, _) => id -> comp.getOrElse(id, id) }.toMap
    assert(served() === want)
    assert(served() === Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("embedding bootstrap: batch-sweep initialization, exact continuation") {
    val state = tmpDir("fg-emb-boot")
    val t = 0.95
    val init = Seq((10L, vec(0), 1L), (11L, vec(3, 2f), 1L),
      (20L, vec(30), 1L), (21L, vec(33, 0.5f), 1L))
    IncrementalEmbedNearDup.bootstrap(
      init.toDF("vec_id", "embedding", "label"), t, dim = dim,
      stateDir = state, numBuckets = 4)
    def served(): Map[Long, Long] =
      IncrementalEmbedNearDup.labels(spark, state).as[(Long, Long)].collect().toMap
    assert(served() === Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    // the bridge folds ON TOP of bootstrapped state and merges both
    // bootstrapped clusters (probes the bootstrapped mirror)
    IncrementalEmbedNearDup.processBatch(
      Seq((15L, vec(15), 1L)).toDF("vec_id", "embedding", "label"), t,
      dim = dim, stateDir = state, batchId = 0L, numBuckets = 4)
    assert(served() === Map(10L -> 10L, 11L -> 10L, 15L -> 10L,
      20L -> 10L, 21L -> 10L))
    assertThrows[IllegalArgumentException] {
      IncrementalEmbedNearDup.bootstrap(
        init.toDF("vec_id", "embedding", "label"), t, dim = dim,
        stateDir = state, numBuckets = 4)
    }
  }

  test("media: forgetting the Hamming bridge splits; == batch over survivors") {
    val state = tmpDir("fg-med")
    // chain: 0x0 –3– 0x7 –3– 0x3f; ends at Hamming 6 > 3
    val hs = Seq((1L, 0x0L), (2L, 0x7L), (3L, 0x3fL))
    IncrementalMediaNearDup.processHashes(hs.toDF("doc_id", "simhash"),
      "imgneardup", maxHamming = 3, stateDir = state, batchId = 0L)
    def served(): Map[Long, Long] =
      IncrementalMediaNearDup.labels(spark, state, "imgneardup")
        .as[(Long, Long)].collect().toMap
    assert(served() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    IncrementalMediaNearDup.forget(spark, state, "imgneardup",
      Seq(2L).toDF("doc_id"), maxHamming = 3, opId = 1L)
    val pairs = Dedup.hammingPairs(
      hs.filterNot(_._1 == 2L).toDF("doc_id", "simhash"), 3)
    val comp = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    graft.operators.Caching.releaseAll()
    assert(served() === Map(1L -> 1L, 3L -> 3L))
    assert(served() === hs.filterNot(_._1 == 2L)
      .map { case (id, _) => id -> comp.getOrElse(id, id) }.toMap)
  }

  test("label mirror: slim side table ≡ main-table l rows through fold, backfill, and forget") {
    val state = tmpDir("fg-lbl")
    import org.apache.spark.sql.functions.col
    def mainL(): Map[Long, Long] =
      MvPipeline.readBucketedState(spark, s"$state/neardup")
        .filter(col("kind") === "l").select("doc_id", "label")
        .as[(Long, Long)].collect().toMap
    def mirrorL(): Map[Long, Long] =
      MvPipeline.readBucketedState(spark, s"$state/neardup_lbl")
        .select("doc_id", "label").as[(Long, Long)].collect().toMap

    foldText(state, Seq(1L -> aTok, 3L -> cTok), 0L)
    assert(mirrorL() === mainL() && mirrorL() === Map(1L -> 1L, 3L -> 3L))

    // legacy dir: drop the mirror entirely — the next fold backfills it
    // from the main table before folding (idempotent min-merge), and the
    // bridge batch then merges the chain in BOTH tables
    val lblPath = new org.apache.hadoop.fs.Path(s"$state/neardup_lbl")
    val fs = lblPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(lblPath, true)
    foldText(state, Seq(2L -> bTok), 1L)
    val all = Seq(1L -> aTok, 2L -> bTok, 3L -> cTok)
    assert(servedText(state) === textTruth(all))
    assert(mirrorL() === mainL())

    // forget the min-id representative: survivors’ labels RAISE — the
    // REPLACE path of the mirror’s forget apply, not the min-merge
    IncrementalNearDup.forget(spark, state, Seq(1L).toDF("doc_id"),
      threshold = thr, opId = 7L)
    assert(servedText(state) === textTruth(all.filterNot(_._1 == 1L)))
    assert(mirrorL() === mainL() && !mirrorL().contains(1L))
  }
}
