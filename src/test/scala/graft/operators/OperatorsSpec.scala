package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dedup / similarity / text-analysis operator specs on planted fixtures. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private lazy val docs = Seq(
    (0L, base, "en", "src0", base.length.toLong),
    (1L, base, "en", "src1", base.length.toLong), // exact dup of 0
    (2L, base + " extra", "en", "src0", (base.length + 6).toLong), // near dup of 0
    (3L, "completely different words having nothing in common with that sentence at all", "en", "src0", 79L),
    (4L, "one two", "en", "src0", 7L) // < 3 tokens: no shingles
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup groups identical texts, keeps min id") {
    val m = Dedup.exact(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(m(0L) == 2L) // doc 0 + 1 fold together
    assert(m(2L) == 1L && m(3L) == 1L && m(4L) == 1L)
  }

  test("minhash LSH finds exact and near dups, not unrelated pairs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 1L))) // identical: jaccard 1.0
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard within blocks: finds the same-source near-dup pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    // blocking on (lang, source, n_chars DIV 100): 0 and 2 share src0/bucket0
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 2L)))
    assert(pairs.head._3 > 0.5)
  }

  test("ngram containment: directed, catches the size-asymmetric swallow") {
    // doc 2 ⊃ doc 0's text: all 11 of doc 0's 3-grams are in doc 2 ->
    // containment(0→2) = 1.0; the reverse is 11/12 = 0.9167 (doc 2 has
    // one extra gram). doc 1 is doc 0's text in ANOTHER source block:
    // never paired.
    val pairs = Dedup.ngramContainmentPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.keySet === Set((0L, 2L), (2L, 0L)))
    assert(pairs((0L, 2L)) === 1.0)
    assert(pairs((2L, 0L)) === 0.9167)
  }

  test("clusters: connected components with min-id labels, chains merge transitively") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {10,11}; isolated pairs only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val got = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters: distributed label-propagation path agrees with union-find") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val dist = Dedup.clusters(pairs, driverThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(dist == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // non-convergence is an error, not silent wrong labels
    assertThrows[IllegalStateException](
      Dedup.clusters(pairs, maxIter = 1, driverThreshold = 0L).collect())
  }

  test("cdc chunks: cut after md5-nibble-0 tokens, concat restores doc, shared suffix dedups") {
    import spark.implicits._
    def lastNibble(tok: String): Char = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      "%02x".format(d(15) & 0xff).charAt(1)
    }
    val vocab = (0 until 60).map(i => s"w$i")
    val cuts = vocab.filter(t => lastNibble(t) == '0')
    assert(cuts.nonEmpty, "test vocab must contain at least one cut token")
    // doc1/doc2: different prefixes, same suffix that starts right after a
    // cut and contains another cut — the suffix chunks must be identical
    val cut = cuts.head
    val nonCuts = vocab.filterNot(t => lastNibble(t) == '0')
    val suffix = (nonCuts.take(3) :+ cut) ++ nonCuts.slice(3, 6)
    val doc1 = ((nonCuts.slice(6, 9) :+ cut) ++ suffix).mkString(" ")
    val doc2 = ((nonCuts.slice(9, 13) :+ cut) ++ suffix).mkString(" ")
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk"))).toSeq
    // ordered concat of chunks restores each document exactly
    for (id <- Seq(1L, 2L)) {
      val restored = chunks.filter(_._1 == id).sortBy(_._2).map(_._3).mkString(" ")
      assert(restored == (if (id == 1L) doc1 else doc2))
    }
    // every chunk except a doc's last ends with a cut token; no internal cuts
    val lastIdx = chunks.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    for ((id, idx, chunk) <- chunks) {
      val toks = chunk.split(" ")
      if (idx != lastIdx(id)) assert(lastNibble(toks.last) == '0')
      assert(toks.dropRight(1).forall(t => lastNibble(t) != '0'))
    }
    // the shared suffix produces identical chunks in both docs -> dup stats
    val dups = Dedup.chunkDupStats(docs.transform(d => Dedup.cdcChunks(d, "doc_id", "text")))
      .collect()
    val sharedChunks = Seq(suffix.take(4).mkString(" "), suffix.drop(4).mkString(" "))
    assert(dups.length == sharedChunks.length)
    assert(dups.forall(r => r.getAs[Long]("occurrences") == 2L &&
      r.getAs[Long]("n_docs") == 2L && r.getAs[Long]("min_doc") == 1L))
  }

  test("duplicateSpanStats: cross-doc windows only, gap-<=k island merge, vs brute force") {
    import spark.implicits._
    val k = 10
    val shared1 = "QWERTYUIOPASDFG" // 15 chars -> 6 windows at k=10
    val shared2 = "ZXCVBNMLKJHGFDS"
    // doc1: both blocks, separated by a >k unique gap -> TWO spans
    val doc1 = s"aaa${shared1}bbbbbbbbbbbbbb${shared2}cc"
    // doc2: shared1 only, at a different offset
    val doc2 = s"dddddddddddd${shared1}e"
    // doc3: shared2 twice back-to-back -> overlapping flagged windows, ONE span
    val doc3 = s"ffff${shared2}${shared2}gg"
    // doc4: WITHIN-doc repetition only (unique alphabet) -> never flagged
    val doc4 = "hh" + ("ijklmnop" * 4)
    // doc5: shorter than k -> no windows at all
    val doc5 = "tiny"
    val raw = Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4), (5L, doc5))

    // brute-force reference: same rule, computed directly
    val winsByDoc = raw.collect { case (id, t) if t.length >= k =>
      id -> (1 to t.length - k + 1).map(p => p.toLong -> t.substring(p - 1, p - 1 + k))
    }.toMap
    val ownersOf = winsByDoc.toSeq
      .flatMap { case (id, ws) => ws.map { case (_, w) => w -> id } }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = winsByDoc.toSeq.flatMap { case (id, ws) =>
      val flagged = ws.collect { case (p, w) if ownersOf(w).size > 1 => p }.sorted
      if (flagged.isEmpty) None
      else {
        val spans = flagged.tail.foldLeft(List((flagged.head, flagged.head))) {
          case ((a, b) :: rest, p) =>
            if (p - b <= k) (a, p) :: rest else (p, p) :: (a, b) :: rest
          case (Nil, p) => List((p, p))
        }
        val len = raw.find(_._1 == id).get._2.length.toLong
        val dupChars = spans.map { case (a, b) => b - a + k }.sum
        Some((id, len, flagged.size.toLong, spans.size.toLong, dupChars,
          dupChars * 1000000L / len))
      }
    }.sortBy(_._1)

    val got = Dedup.duplicateSpanStats(raw.toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the qualitative contracts the fixture plants
    val byDoc = got.map(r => r._1 -> r).toMap
    assert(!byDoc.contains(4L), "within-doc repeats must not flag")
    assert(!byDoc.contains(5L), "sub-k docs have no windows")
    assert(byDoc(1L)._4 == 2L, "doc1's far-apart blocks stay two spans")
    assert(byDoc(2L)._4 == 1L)
    assert(byDoc(3L)._4 == 1L, "doc3's adjacent repeats merge into one span")
  }

  test("spanSortPartitions: input-proportional, floored at the session default, capped") {
    // r16: the x116 sort-partitions knob as code — per-task sort bytes
    // held constant by scaling partitions with the source size estimate
    val mb = 1L << 20
    // tiny input (sf0.1 class): stays at the session default → the local
    // bench plan is unchanged
    assert(Dedup.spanSortPartitions(BigInt(600 * 1024), 32) == 32)
    // sf10 class (~59 MB source → ~11.5 GB of window rows at x200): 46
    // tasks of ≤256 MB instead of the r15 16 x ~1.3 GB spilling sort
    assert(Dedup.spanSortPartitions(BigInt(59 * mb), 16) == 46)
    // per-task override scales inversely
    assert(Dedup.spanSortPartitions(BigInt(59 * mb), 16, 128L << 20) == 92)
    // absurd inputs cap at 200k tasks rather than overflowing the scheduler
    assert(Dedup.spanSortPartitions(BigInt(1L << 50), 32) == 200000)
  }

  test("representatives: best score wins, ties to lowest id, null score loses") {
    import spark.implicits._
    val clusterMap = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster")
    val scores = Seq(
      (1L, Some(0.2)), (2L, Some(0.9)), (3L, None), // cluster 1: 2 wins, null loses
      (10L, Some(0.5)), (11L, Some(0.5))            // cluster 10: tie -> min id
    ).toDF("doc_id", "quality_score")
    val got = Dedup.representatives(clusterMap, scores, "doc_id", "quality_score")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(1L -> ((3L, 2L, 0.9)), 10L -> ((2L, 10L, 0.5))))
  }

  test("simhash: identical docs get identical hashes; pairs found at hamming 0") {
    val sims = Dedup.simhashes(docs).as[(Long, Long)].collect().toMap
    assert(sims(0L) == sims(1L))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val p01 = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(p01.exists(_._3 == 0))
  }

  test("image near-dup: perturbed copies pair with their base, distinct images don't") {
    import graft.operators.{MediaCodecs, Multimodal}
    // hand-built corpus: 0 = base; 1 = one cell +120 (near-dup of 0);
    // 2 = md5-scattered distinct image; 3 = malformed payload (dropped)
    def bmp(seed: Int, perturbCell: Int): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val cellBase = Array.tabulate(64)(c => md.digest(s"$seed:$c".getBytes)(0) & 0xff)
      MediaCodecs.encodeBmp(16, 16, { k =>
        val cell = ((k / 48) / 2) * 8 + (((k % 48) / 3) / 2)
        val base = (cellBase(cell) + k * 11) % 256
        if (cell == perturbCell) (base + 120) % 256 else base
      })
    }
    val media = Seq(
      (0L, bmp(7, -1)), (1L, bmp(7, 2)), (2L, bmp(99, -1)),
      (3L, "notanimage".getBytes)
    ).toDF("doc_id", "payload")
    val pairs = Dedup.imageNearDupPairs(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((0L, 1L)))
    // aHash invariants: decode barrier nulls malformed; distinct scatter
    assert(MediaCodecs.aHash64("junk".getBytes) == null)
    assert(MediaCodecs.aHash64(bmp(7, -1)) == MediaCodecs.aHash64(bmp(7, -1)))
    val h0 = MediaCodecs.aHash64(bmp(7, -1)).longValue
    val h2 = MediaCodecs.aHash64(bmp(99, -1)).longValue
    assert(java.lang.Long.bitCount(h0 ^ h2) > 3)
    // the end-to-end synthesized corpus finds only planted same-group pairs
    val docs500 = spark.range(0, 80).select(col("id").as("doc_id"), lit("t").as("text"))
    val synth = Dedup.imageNearDupPairs(Multimodal.synthesizeBmpNearDups(docs500))
      .as[(Long, Long, Int)].collect()
    assert(synth.nonEmpty)
    assert(synth.forall(p => p._1 / 4 == p._2 / 4), "cross-group collision")
  }

  test("audio near-dup: perturbed windows pair with their base; malformed dropped") {
    import graft.operators.{MediaCodecs, Multimodal}
    def wav(seed: Int, perturbWin: Int): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val base = Array.tabulate(64)(w => md.digest(s"$seed:$w".getBytes)(0) & 0xff)
      MediaCodecs.encodeWavPcm16(16000, Array.tabulate(256) { k =>
        val w = k / 4
        (base(w) * 8 - 1024 + (k % 4) * 64 + (if (w == perturbWin) 400 else 0)).toShort
      })
    }
    val media = Seq(
      (0L, wav(7, -1)), (1L, wav(7, 5)), (2L, wav(99, -1)),
      (3L, "notawav".getBytes)
    ).toDF("doc_id", "payload")
    val pairs = Dedup.audioNearDupPairs(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((0L, 1L)))
    assert(MediaCodecs.audioHash64("junk".getBytes) == null)
    val h0 = MediaCodecs.audioHash64(wav(7, -1)).longValue
    val h2 = MediaCodecs.audioHash64(wav(99, -1)).longValue
    assert(java.lang.Long.bitCount(h0 ^ h2) > 3)
    // end-to-end synthesized corpus: only planted same-group pairs
    val docs = spark.range(0, 80).select(col("id").as("doc_id"), lit("t").as("text"))
    val synth = Dedup.audioNearDupPairs(Multimodal.synthesizeWavNearDups(docs))
      .as[(Long, Long, Int)].collect()
    assert(synth.nonEmpty)
    assert(synth.forall(p => p._1 / 4 == p._2 / 4), "cross-group collision")
  }
}

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  // orthogonal-ish planted vectors: 0 and 1 nearly parallel, 2 orthogonal
  private lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1),
    (4L, Array(0.0f, 0.0f, 0.98f, 0.2f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("brute top-k ranks the nearly-parallel vector first") {
    val e = emb.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0L).select(col("vec_id").as("qid"), col("v").as("qv"))
    val top = Similarity.bruteTopK(q, e, k = 2).as[(Long, Long, Long, Double)].collect()
    assert(top.find(_._3 == 1L).get._2 == 1L) // rank 1 = vec 1
    assert(top.find(_._3 == 1L).get._4 > 0.99)
  }

  test("embedding near-dup pairs within label blocks") {
    val pairs = Similarity.embeddingNearDupPairs(emb, threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs == Set((0L, 1L), (3L, 4L))) // (0,2) orthogonal, cross-label never compared
  }

  test("TopKBuffer: bounded, deterministic ties, associative merge") {
    import graft.expressions.TopKBuffer
    def fill(items: Seq[(Long, Double)]): TopKBuffer = {
      val b = new TopKBuffer(3)
      items.foreach { case (id, s) => b.insert(id, s) }
      b
    }
    def out(b: TopKBuffer): Seq[(Long, Double)] =
      (0 until b.n).map(i => (b.ids(i), b.scores(i)))
    val items = Seq(
      (5L, 0.9), (1L, 0.7), (9L, 0.9), (2L, 0.5), (3L, 0.95), (4L, 0.1))
    val expected = Seq((3L, 0.95), (5L, 0.9), (9L, 0.9)) // tie: id asc
    assert(out(fill(items)) == expected)
    // merge both orders (partial buffers from two partitions)
    val (p1, p2) = items.splitAt(3)
    val m12 = fill(p1); m12.absorb(fill(p2))
    val m21 = fill(p2); m21.absorb(fill(p1))
    assert(out(m12) == expected && out(m21) == expected)
    // exact duplicate of the floor element at capacity must not grow past k
    val withDup = fill(items ++ Seq((9L, 0.9), (9L, 0.9)))
    assert(out(withDup) == expected)
  }

  test("bruteTopKAgg matches bruteTopK and skips degenerate vectors") {
    val degenerate = Seq(
      (9L, Array(0.0f, 0.0f, 0.0f, 0.0f), 0), // zero-norm: null cosine
      (10L, Array(Float.NaN, 0.0f, 0.0f, 0.0f), 0) // NaN element: NaN cosine
    ).toDF("vec_id", "embedding", "label")
    val all = emb.union(degenerate)
    val e = all.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 2).select(col("vec_id").as("qid"), col("v").as("qv"))
    val win = Similarity.bruteTopK(q, e, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    val agg = Similarity.bruteTopKAgg(q, e, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(agg == win)
    assert(agg.nonEmpty)
    // degenerate vectors never appear as neighbors in EITHER path (a NaN at
    // the aggregate's buffer floor would otherwise block all later inserts;
    // the window would rank NaN first)
    assert(!agg.exists(r => r._2 == 9L || r._2 == 10L))
    assert(!win.exists(r => r._2 == 9L || r._2 == 10L))
  }

  test("lshTopK recall vs exact top-k on the sf0.001 corpus") {
    val embr = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val e = embr.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = Similarity.bruteTopK(q, e, k = 5)
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    val approx = Similarity.lshTopK(embr, col("vec_id") < 10, k = 5, numBits = 8)
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 8-bit buckets on near-random 64-dim vectors: recall is modest by
    // design (the buckets only keep ~1/256 of the corpus per query); the
    // floor pins against silent regression to ~0, not against the theory
    assert(recall >= 0.1, s"LSH recall collapsed: $recall")
    graft.operators.Caching.releaseAll()
  }

  test("ivfTopK recall vs exact top-k on the sf0.001 corpus") {
    val embr = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val e = embr.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = Similarity.bruteTopK(q, e, k = 5)
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    val approx = Similarity.ivfTopK(embr, col("vec_id") < 10, k = 5)
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 3 of 16 kmeans cells probed ⇒ ~19% of the corpus scored; on this
    // near-isotropic corpus expect recall well above that fraction only
    // when neighbors cluster; floor pins against regression to ~0
    assert(recall >= 0.15, s"IVF recall collapsed: $recall")
    graft.operators.Caching.releaseAll()
    // pinned-codebook path: same floor, plus exactly k rows per query
    val pinned = Similarity.ivfTopKPinned(embr, col("vec_id") < 10, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(pinned.groupBy(_._1).forall(_._2.length == 5))
    val recallP = (exact & pinned.map(r => (r._1, r._2)).toSet).size.toDouble / exact.size
    assert(recallP >= 0.15, s"pinned IVF recall collapsed: $recallP")
    graft.operators.Caching.releaseAll()
  }

  test("ivfPqTopK recall vs exact top-k; rescoring restores exact ranks within shortlist") {
    val embr = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val e = embr.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = Similarity.bruteTopK(q, e, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val pq = Similarity.ivfPqTopK(embr, col("vec_id") < 10, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    // exactly k rows per query; PQ recall cannot exceed its probe set, so
    // pin at the pinned-IVF floor (same cells, lossy shortlist)
    assert(pq.groupBy(_._1).forall(_._2.length == 5))
    val recall = (exactSet & pq.map(r => (r._1, r._2)).toSet).size.toDouble / exactSet.size
    assert(recall >= 0.1, s"IVF-PQ recall collapsed: $recall")
    // the rescoring contract: any (qid, nid) the PQ path shares with the
    // exact path carries the EXACT cosine (full-precision rescore, not the
    // ADC approximation)
    val exactCos = exact.map(r => (r._1, r._2) -> r._4).toMap
    pq.foreach { r =>
      exactCos.get((r._1, r._2)).foreach(c => assert(c == r._4,
        s"rescored cosine diverged for ${(r._1, r._2)}: ${r._4} vs $c"))
    }
    graft.operators.Caching.releaseAll()
  }

  test("ivfAdcTopK (residual PQ): recall >= direct PQ; exact rescoring contract") {
    val embr = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val e = embr.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = Similarity.bruteTopK(q, e, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    graft.operators.Caching.releaseAll()
    def pairs(df: org.apache.spark.sql.DataFrame) = {
      val got = df.as[(Long, Long, Long, Double)].collect()
      graft.operators.Caching.releaseAll()
      got
    }
    val adc = pairs(Similarity.ivfAdcTopK(embr, col("vec_id") < 10, k = 5))
    val pq = pairs(Similarity.ivfPqTopK(embr, col("vec_id") < 10, k = 5))
    assert(adc.groupBy(_._1).forall(_._2.length == 5))
    def recall(rs: Array[(Long, Long, Long, Double)]) =
      (exactSet & rs.map(r => (r._1, r._2)).toSet).size.toDouble / exactSet.size
    // residual quantization is strictly tighter at identical index bytes:
    // its shortlist never loses MORE true neighbors than the direct code
    // (measured: adc hits the pinned-IVF probe ceiling at sf0.001/sf0.01
    // where direct PQ drops below it at sf0.01)
    assert(recall(adc) >= recall(pq), s"residual ${recall(adc)} < direct ${recall(pq)}")
    assert(recall(adc) >= 0.1, s"IVFADC recall collapsed: ${recall(adc)}")
    // exact-rescore contract: shared (qid, nid) pairs carry the exact cosine
    val exactCos = exact.map(r => (r._1, r._2) -> r._4).toMap
    adc.foreach { r =>
      exactCos.get((r._1, r._2)).foreach(c => assert(c == r._4,
        s"rescored cosine diverged for ${(r._1, r._2)}: ${r._4} vs $c"))
    }
  }

  test("semanticPrune: planted dup group keeps exactly its least-aligned member") {
    val embr = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.semanticPrune(embr, threshold = 0.4)
      .as[(Long, Int, Long, Long)].collect()
    // total coverage: one decision row per clean input vector
    val n = embr.filter(col("embedding").isNotNull)
      .filter(!exists(Similarity.asDouble(col("embedding")), x => isnan(x))).count()
    assert(out.length.toLong == n)
    // keep-rule invariant: the minimum-(align_e6, vec_id) member of every
    // cell has no dominating neighbor, so it is NEVER pruned — at least
    // one survivor per cell
    out.groupBy(_._2).foreach { case (bucket, rows) =>
      val keeper = rows.minBy(r => (r._3, r._1))
      assert(keeper._4 == 0L, s"cell $bucket pruned its least-aligned member")
    }
    graft.operators.Caching.releaseAll()

    // planted near-identical pair: the HIGHER-aligned member is pruned,
    // the lower-aligned one kept
    val rnd = new scala.util.Random(11)
    val base = (0 until 30).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val v = Array.fill(64)(rnd.nextGaussian().toFloat)
    val w = v.clone(); w(0) = w(0) + 0.01f // cosine ≈ 0.9999: same cell, over any threshold
    val df = (base ++ Seq((100L, v), (101L, w))).toDF("vec_id", "embedding")
    val planted = Similarity.semanticPrune(df, threshold = 0.9)
      .filter(col("vec_id") >= 100L).as[(Long, Int, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(planted(100L)._2 == planted(101L)._2, "planted pair split across cells")
    val Seq(lo, hi) = Seq(planted(100L), planted(101L)).sortBy(r => (r._3, r._1))
    assert(lo._4 == 0L, "least-aligned member of the planted pair was pruned")
    assert(hi._4 == 1L, "higher-aligned member of the planted pair survived")
    graft.operators.Caching.releaseAll()
  }

  test("embeddingNearDupPairsLsh finds planted high-cosine dups (candidates ⊇ true pairs)") {
    // 40 random 64-dim vectors + 5 planted near-identical pairs
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, vec(), i % 2))
    val planted = (0 until 5).flatMap { i =>
      val v = vec()
      val w = v.clone(); w(0) = w(0) + 0.01f // cosine ≈ 0.9999
      Seq((100L + i, v, 0), (200L + i, w, 0))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding", "label")
    val exact = Similarity.embeddingNearDupPairs(df, threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val lsh = Similarity.embeddingNearDupPairsLsh(df, threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(exact.size >= 5)
    assert(lsh == exact, s"LSH path missed pairs: ${exact -- lsh}")
    graft.operators.Caching.releaseAll()
  }

  test("Sharding: deterministic, balanced, write round-trips with order") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val a1 = Sharding.assignShards(docs, "doc_id", 4)
      .select("doc_id", "shard", "sort_key").as[(Long, Int, Long)].collect().sortBy(_._1)
    val a2 = Sharding.assignShards(docs, "doc_id", 4)
      .select("doc_id", "shard", "sort_key").as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a1.toSeq == a2.toSeq) // reproducible regardless of run
    assert(a1.map(_._2).toSet == Set(0, 1, 2, 3)) // every shard populated
    val sizes = a1.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.max <= 2 * sizes.values.min) // md5 spread: no gross skew
    // salt changes the layout
    val salted = Sharding.assignShards(docs, "doc_id", 4, salt = "other")
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(a1.exists { case (id, sh, _) => salted(id) != sh })
    // write: one dir per shard, rows inside each file ordered by sort_key
    // (the property writeShards exists to add — stable loader resume points)
    val out = tmpDir("shards")
    Sharding.writeShards(docs, "doc_id", 4, out)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("shard").distinct().count() == 4)
    val files = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles().filter(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val keys = spark.read.parquet(f.getAbsolutePath)
        .select("sort_key").as[Long].collect().toSeq
      assert(keys == keys.sorted, s"file ${f.getName} not ordered by sort_key")
    }
  }

  test("Caching tracks and releases operator persists") {
    graft.operators.Caching.releaseAll()
    Similarity.embeddingNearDupPairs(emb, threshold = 0.9).collect()
    assert(graft.operators.Caching.trackedCount >= 1)
    graft.operators.Caching.releaseAll()
    assert(graft.operators.Caching.trackedCount == 0)
  }

  test("Caching.isolated: a scope's releaseAll cannot free a sibling's handles; exit releases leftovers") {
    import graft.operators.Caching
    Caching.releaseAll()
    // the "sibling": a frame registered on the global registry (what a
    // concurrent catalog stage's mid-flight persist looks like from
    // another stage's thread)
    val global = spark.range(10).toDF("a")
    Caching.persisted(global)
    global.count()
    assert(Caching.trackedCount == 1)
    @volatile var inside = -1
    @volatile var afterRelease = -1
    val t = new Thread(() => Caching.isolated {
      val own = spark.range(5).toDF("b")
      Caching.persisted(own)
      own.count()
      inside = Caching.trackedCount       // own registry: just `own`
      Caching.releaseAll()                // drains OWN registry only
      afterRelease = Caching.trackedCount
    })
    t.start(); t.join()
    assert(inside == 1 && afterRelease == 0)
    assert(Caching.trackedCount == 1, "sibling's releaseAll crossed scopes")
    assert(global.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "the global frame must still be persisted")
    // scope exit releases whatever the body left tracked
    val leaked = Caching.isolated {
      val d = spark.range(7).toDF("c")
      Caching.persisted(d)
      d.count()
      d
    }
    assert(leaked.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "isolated-scope exit must release leftover handles")
    Caching.releaseAll()
    assert(Caching.trackedCount == 0)
  }

  test("LSH top-k returns only same-bucket neighbors with correct ranks") {
    val res = Similarity.lshTopK(emb, col("vec_id") < 2, k = 3, numBits = 4, dim = 4)
      .as[(Long, Long, Long, Double)].collect()
    // whatever the buckets, ranks must be 1..n per query and cos in [-1,1]
    res.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong))
    }
    assert(res.forall(r => r._4 >= -1.0001 && r._4 <= 1.0001))
  }
}

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("bigramSurprisal: rare continuations cost bits, formulaic ones don't") {
    // corpus bigrams: docA (a,b)×2 (b,a)×2; docB (a,z)×1
    // counts: c1(a)=3, c1(b)=2; c12(a,b)=2, (b,a)=2, (a,z)=1
    // docA bits: (a,b): len(bin 3)−len(bin 2) = 2−2 = 0 (×2);
    //            (b,a): 2−2 = 0 (×2) → total 0
    // docB bits: (a,z): len(bin 3)−len(bin 1) = 2−1 = 1 → 1000 milli-bits
    val docs = Seq((1L, "a b a b a"), (2L, "a z")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramSurprisal(docs)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq((1L, 4L, 0L, 0L), (2L, 1L, 1L, 1000L)))
  }

  test("novelty: copies score 0, fresh text 1.0, partial overlap in between") {
    val base = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, base),          // first occurrence of all 7 grams -> 1.0
      (2L, base),          // verbatim copy -> 0
      (3L, base + " and then something completely new happened")
      // doc 3: 13 tokens -> 11 distinct grams; the 6 containing only base
      // tokens... grams 1-7 are base grams (seen in doc 1), the 6 grams
      // crossing into the new tail are first-seen here
    ).toDF("doc_id", "text")
    val r = TextAnalysis.novelty(docs)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(r(0) === ((1L, 7L, 7L, 1000000L)))
    assert(r(1) === ((2L, 7L, 0L, 0L)))
    val (_, n3, nov3, ppm3) = r(2)
    assert(n3 === 13L && nov3 === 6L && ppm3 === 6L * 1000000L / 13L)
  }

  test("quality metrics on a known document") {
    val docs = Seq((1L, "the cat and the hat")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(docs).collect().head
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Long]("n_uniq") == 4L)
    assert(r.getAs[Double]("ttr") == 0.8)
    assert(r.getAs[Double]("avg_token_len") == 3.0) // (19-4)/5
    assert(r.getAs[Double]("stop_ratio") == 0.6)    // the, and, the
  }

  test("tfidf top-k: rare terms outrank common, ties break on term, k bounds rows") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common common date")
    ).toDF("doc_id", "text")
    // n_docs=3; df: apple 1, banana 2, cherry 1, common 3, date 1
    val got = TextAnalysis.tfidfTopK(docs, k = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rn")) ->
        ((r.getAs[String]("term"), r.getAs[Double]("score")))).toMap
    assert(got((1L, 1L)) == (("apple", 6.0)))   // tf2 * 3/1
    assert(got((1L, 2L)) == (("banana", 1.5)))  // tf1 * 3/2
    assert(got((2L, 1L)) == (("cherry", 3.0)))
    assert(got((2L, 2L)) == (("banana", 1.5)))
    assert(got((3L, 1L)) == (("date", 3.0)))
    assert(got((3L, 2L)) == (("common", 2.0)))  // tf2 * 3/3
    assert(got.size == 6) // k=2 per doc, no spill past k
  }

  test("pii: detects and redacts emails, ipv4, phones; placeholders never re-match") {
    val docs = Seq(
      (1L, "mail bob.smith+x@sub.example.org or 192.168.0.1 and call 555-123-4567 twice 555-000-9999"),
      (2L, "clean text with no contact info at all"),
      (3L, "edge a@b.co near 10.0.0.255x")  // trailing char: ip still matches prefix
    ).toDF("doc_id", "text")
    val m = TextAnalysis.pii(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_emails") == 1L)
    assert(m(1L).getAs[Long]("n_ipv4") == 1L)
    assert(m(1L).getAs[Long]("n_phones") == 2L)
    assert(m(2L).getAs[Long]("n_emails") == 0L && m(2L).getAs[Long]("n_ipv4") == 0L)
    assert(m(3L).getAs[Long]("n_emails") == 1L && m(3L).getAs[Long]("n_ipv4") == 1L)
    // redaction is total: re-running pii on redacted text finds nothing
    val redacted = Seq((1L,
      "mail [EMAIL] or [IP] and call [PHONE] twice [PHONE]")).toDF("doc_id", "text")
    val r2 = TextAnalysis.pii(redacted).collect().head
    assert(r2.getAs[Long]("n_emails") == 0L && r2.getAs[Long]("n_ipv4") == 0L &&
      r2.getAs[Long]("n_phones") == 0L)
  }

  test("synthesizePii appends deterministic contacts only to the keyed subsets") {
    val docs = Seq((0L, "t0"), (1L, "t1"), (15L, "t15")).toDF("doc_id", "text")
    val m = TextAnalysis.synthesizePii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(m(0L) == "t0 contact user0@example.com now host 10.0.0.1 up call 555-000-0199 soon")
    assert(m(1L) == "t1")
    assert(m(15L) == "t15 contact user15@example.com now host 10.15.0.1 up") // 15%7 != 0
  }

  test("repetition metrics on known documents; flag compares rounded ratios") {
    val docs = Seq(
      (1L, "spam spam spam a b spam"), // 6 toks, 3 uniq; 5 bigrams, 4 uniq; top=4
      (2L, "a b c d e f")              // no repetition; top share 1/6
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetition(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_tokens") == 6L)
    assert(m(1L).getAs[Double]("dup_token_frac") == 0.5)
    assert(m(1L).getAs[Double]("dup_bigram_frac") == 0.2)   // 1 - 4/5
    assert(m(1L).getAs[Double]("top_token_frac") == 0.6667) // 4/6 pround4
    assert(m(1L).getAs[Long]("flag_repetitive") == 1L)
    assert(m(2L).getAs[Double]("dup_token_frac") == 0.0)
    assert(m(2L).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(m(2L).getAs[Double]("top_token_frac") == 0.1667)
    assert(m(2L).getAs[Long]("flag_repetitive") == 0L)
  }

  test("langId picks the language with most marker hits, unknown when none") {
    val docs = Seq(
      "der hund und die katze ist da",
      "the cat is a pet of the house",
      "xx yy zz"
    ).toDF("text")
    val got = docs.select(TextAnalysis.langId(TextOps.tokens(col("text"))))
      .as[String].collect().toSeq
    assert(got == Seq("de", "en", "unknown"))
  }

  test("fingerprint: equal texts equal, different texts differ, stable format") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "f g h i j"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs).as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp(1L).matches("[0-9a-f]{32}"))
  }
}

class MultimodalSpec extends SparkTestBase {

  test("MediaCodecs: BMP round-trip with row padding; hand-checked means") {
    // 2×2 image, pixel bytes 0..11 → channel sums B=0+3+6+9=18, G=22, R=26
    val bmp = MediaCodecs.encodeBmp(2, 2, k => k)
    val info = MediaCodecs.decodeBmp(bmp).get
    assert(info.width == 2 && info.height == 2 && info.bpp == 24)
    assert(info.meanE6.toSeq == Seq(18L, 22L, 26L).map(_ * 1000000L / 4))
    // w=6 → rowBytes 18 → stride pads to 20: padding must be SKIPPED by
    // the decoder (including it would drag every mean toward zero)
    val padded = MediaCodecs.encodeBmp(6, 3, _ => 200)
    assert((padded.length - 54) == 20 * 3) // padded stride on disk
    assert(MediaCodecs.decodeBmp(padded).get.meanE6.toSeq == Seq(200000000L, 200000000L, 200000000L))
    // malformed: wrong magic, truncated
    assert(MediaCodecs.decodeBmp("notabmp".getBytes).isEmpty)
    assert(MediaCodecs.decodeBmp(bmp.take(40)).isEmpty)
    // malformed: width large enough that w*3 overflows Int — must be None,
    // not Some(zeroed means) via a negative stride passing the bounds check
    val wide = bmp.clone()
    java.nio.ByteBuffer.wrap(wide).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 716000000)
    assert(MediaCodecs.decodeBmp(wide).isEmpty)
  }

  test("MediaCodecs: WAV PCM16 round-trip; exact energy and duration") {
    val samples = Array[Short](1000, -1000, 500, 0, -500)
    val wav = MediaCodecs.encodeWavPcm16(16000, samples)
    val info = MediaCodecs.decodeWav(wav).get
    assert(info.sampleRate == 16000 && info.channels == 1 && info.nSamples == 5L)
    assert(info.energy == 1000000L + 1000000L + 250000L + 0L + 250000L)
    assert(info.durationUs == 5L * 1000000L / 16000L)
    assert(MediaCodecs.decodeWav("RIFFjunk".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav(wav.take(30)).isEmpty)
    // malformed: negative chunk length would make the RIFF walk's step
    // zero (len = -8) or negative — must return None, not hang the thread
    for (badLen <- Seq(-8, -9, -1, Int.MinValue, Int.MaxValue)) {
      val bad = wav.clone()
      java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(16, badLen) // fmt chunk length field
      assert(MediaCodecs.decodeWav(bad).isEmpty, s"len=$badLen")
    }
  }

  test("MP3 is formally out of scope: every audio entry point refuses MP3-framed payloads (ARCHITECTURE §5.6)") {
    // the descope contract (r16 decision): WAV/PCM16 is the supported
    // audio storage format; MP3 payloads return None/null — never
    // garbage — from every decode surface. Two shapes: a bare MPEG-1
    // Layer III frame header (FFFB sync) and an ID3v2-tagged file.
    val bareFrame = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00) ++
      Array.tabulate[Byte](413)(i => (i * 7).toByte) // plausible 128kbps frame body
    val id3Tagged = "ID3".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 0, 0, 10) ++ Array.fill[Byte](10)(0) ++ bareFrame
    for ((p, name) <- Seq((bareFrame, "bare frame"), (id3Tagged, "ID3-tagged"))) {
      assert(MediaCodecs.decodeWav(p).isEmpty, s"decodeWav accepted $name")
      assert(MediaCodecs.audioHash64(p) == null, s"audioHash64 hashed $name")
      assert(MediaCodecs.wavFrameEnergies(p, 8, 2).isEmpty,
        s"wavFrameEnergies walked $name")
      // not an image either: the format dispatch must not misroute the
      // FFD8-adjacent FFFB sync to the JPEG decoder's garbage path
      assert(MediaCodecs.aHash64(p) == null, s"aHash64 hashed $name")
    }
    // the generic stub still yields deterministic features (the pipeline
    // degrades to byte-histogram features, it does not crash)
    val f1 = Multimodal.decodeStub(bareFrame)
    assert(f1.toSeq == Multimodal.decodeStub(bareFrame).toSeq)
    assert(f1.sum > 0.0)
  }

  test("media synthesis + stubbed decode: schema, determinism, feature range") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
    val media = Multimodal.synthesize(docs)
    val mrow = media.collect().head
    assert(Seq("image", "audio").contains(mrow.getAs[String]("media_type")))
    val feats = Multimodal.features(spark, media)
    val rows = feats.collect()
    assert(rows.length == 20)
    assert(rows.forall { r =>
      val f = Seq(r.getAs[Double]("f0"), r.getAs[Double]("f1"), r.getAs[Double]("f2"))
      f.forall(v => v >= 0.0 && v <= 1.0)
    })
    // decode stub is deterministic
    val again = Multimodal.features(spark, media).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("resize keeps payloads partition-local and shrinks images only") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(10)
    val media = Multimodal.synthesize(docs)
    val resized = Multimodal.resize(spark, media, targetW = 64, targetH = 64).collect()
    resized.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      if (r.getAs[String]("media_type") == "image") {
        assert(r.getAs[Int]("width") <= 64 && r.getAs[Int]("height") <= 64)
        assert(p.nonEmpty)
      } else assert(r.getAs[Int]("sample_rate") == 16000) // audio untouched
    }
  }

  test("REAL BMP nearest-neighbor resize: pixel addressing, up/downscale, malformed") {
    // 4×4 source, pixel byte k = k; downscale to 2×2 picks source pixels
    // (0,0),(0,2),(2,0),(2,2) — floor mapping sy=y*4/2, sx=x*4/2
    val src = MediaCodecs.encodeBmp(4, 4, k => k)
    val down = MediaCodecs.resizeBmpNearest(src, 2, 2).get
    val info = MediaCodecs.decodeBmp(down).get
    assert(info.width == 2 && info.height == 2)
    // expected bytes: src pixel (row sy, col sx) bytes = sy*12 + sx*3 + ch
    val expB = Seq((0, 0), (0, 2), (2, 0), (2, 2)).map { case (sy, sx) => sy * 12 + sx * 3 }
    assert(info.meanE6(0) == expB.sum.toLong * 1000000L / 4)
    assert(info.meanE6(1) == expB.map(_ + 1).sum.toLong * 1000000L / 4)
    assert(info.meanE6(2) == expB.map(_ + 2).sum.toLong * 1000000L / 4)
    // upscale replicates: 1×1 source → 3×3 target, every pixel identical
    val one = MediaCodecs.encodeBmp(1, 1, k => 10 + k)
    val up = MediaCodecs.decodeBmp(MediaCodecs.resizeBmpNearest(one, 3, 3).get).get
    assert(up.width == 3 && up.height == 3)
    assert(up.meanE6.toSeq == Seq(10000000L, 11000000L, 12000000L))
    // source with row padding (w=6 → stride 20): addressing must use the
    // padded stride, not rowBytes
    val padded = MediaCodecs.encodeBmp(6, 3, _ => 200)
    val pr = MediaCodecs.decodeBmp(MediaCodecs.resizeBmpNearest(padded, 2, 2).get).get
    assert(pr.meanE6.toSeq == Seq(200000000L, 200000000L, 200000000L))
    assert(MediaCodecs.resizeBmpNearest("junk".getBytes, 2, 2).isEmpty)
    assert(MediaCodecs.resizeBmpNearest(src, 0, 2).isEmpty)
    // TOP-DOWN source (negative biHeight): orientation must be preserved,
    // not flipped — resizing a 4×4 top-down image to its own size must
    // reproduce the same image as resizing its bottom-up twin. Build the
    // twin by reversing row order and negating the height field.
    val stride4 = 12 // w=4 → rowBytes 12, no padding
    val flipped = src.clone()
    val off = java.nio.ByteBuffer.wrap(src)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
    for (r <- 0 until 4; b <- 0 until stride4)
      flipped(off + r * stride4 + b) = src(off + (3 - r) * stride4 + b)
    val hdr = java.nio.ByteBuffer.wrap(flipped).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(22, -4) // declare top-down
    val fromTopDown = MediaCodecs.resizeBmpNearest(flipped, 4, 4).get
    val fromBottomUp = MediaCodecs.resizeBmpNearest(src, 4, 4).get
    assert(java.util.Arrays.equals(fromTopDown, fromBottomUp))
  }

  test("REAL WAV frame sampling: full frames only, every Nth, exact energies") {
    val samples = Array.tabulate(21)(i => (i * 10).toShort) // 2 full 8-frames + partial
    val wav = MediaCodecs.encodeWavPcm16(16000, samples)
    val all = MediaCodecs.wavFrameEnergies(wav, 8, 1).get
    assert(all.map(_._1) == Seq(0, 1)) // partial frame 2 dropped
    def e(r: Range) = r.map(i => (i * 10L) * (i * 10L)).sum
    assert(all.map(_._2) == Seq(e(0 until 8), e(8 until 16)))
    val every2 = MediaCodecs.wavFrameEnergies(wav, 8, 2).get
    assert(every2 == Seq((0, e(0 until 8))))
    assert(MediaCodecs.wavFrameEnergies("junk".getBytes, 8, 1).isEmpty)
    // real resize wiring: Multimodal.resize routes decodable BMPs through
    // the real codec — width/height update to the exact target
    import spark.implicits._
    val media = Seq(Multimodal.MediaRecord(1L, "image",
      MediaCodecs.encodeBmp(4, 4, k => k), 4, 4, 0)).toDF()
    val out = Multimodal.resize(spark, media, 2, 2).collect().head
    assert(out.getAs[Int]("width") == 2 && out.getAs[Int]("height") == 2)
    assert(MediaCodecs.decodeBmp(out.getAs[Array[Byte]]("payload")).get.width == 2)
    // frameFeatures: one row per kept frame, audio only
    val am = Seq(Multimodal.MediaRecord(2L, "audio", wav, 0, 0, 16000),
      Multimodal.MediaRecord(3L, "image", Array[Byte](1, 2), 1, 1, 0)).toDF()
    val ff = Multimodal.frameFeatures(spark, am, 8, 1).collect()
    assert(ff.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((2L, 0, e(0 until 8)), (2L, 1, e(8 until 16))))
  }

  test("frame sampling keeps every Nth pseudo-frame") {
    val payload = (0 until 100).map(_.toByte).toArray
    val frames = Multimodal.sampleFramesStub(payload, frameSize = 10, everyNth = 3)
    assert(frames.length == 4) // frames 0,3,6,9
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).toSeq == (30 until 40).map(_.toByte))
  }

  test("decodeStub: histogram sums to ~1 and is pure") {
    val payload = "some deterministic bytes".getBytes
    val f1 = Multimodal.decodeStub(payload)
    val f2 = Multimodal.decodeStub(payload)
    assert(f1.toSeq == f2.toSeq)
    assert(math.abs(f1.sum - 1.0) < 1e-9)
    assert(Multimodal.decodeStub(Array.emptyByteArray).forall(_ == 0.0))
  }

  test("invertedIndex postings: df counts docs, tf counts occurrences, fingerprint is xor of id hashes") {
    import spark.implicits._
    val docs = Seq((2L, "b a b"), (1L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val got = InvertedIndex.postings(docs, "doc_id", "text")
      .orderBy("token")
      .as[(String, Long, Long, Long)].collect()
    // JVM replica of graft.functions.md5Hash64: first 16 md5 hex chars as a signed long
    def h64(s: String) = java.lang.Long.parseUnsignedLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes).take(8).map("%02x".format(_)).mkString, 16)
    assert(got === Array(
      ("a", 2L, 2L, h64("1") ^ h64("2")), // one occurrence in each of docs 1,2
      ("b", 2L, 3L, h64("1") ^ h64("2")), // doc 2 has it twice → tf 3, df 2
      ("c", 1L, 1L, h64("3"))))
    // top-1 by df breaks the a/b tie on token asc
    val top = InvertedIndex.topPostings(docs, "doc_id", "text", k = 1)
      .select("token").as[String].collect()
    assert(top === Array("a"))
  }
}

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  test("corrMoments: exact sums; corr ±1 on perfectly (anti)correlated groups") {
    val rows = Seq(
      ("pos", 1L, 2L), ("pos", 2L, 4L), ("pos", 3L, 6L), // y = 2x -> corr 1
      ("neg", 1L, -1L), ("neg", 2L, -2L), ("neg", 3L, -3L), // y = -x -> -1
      ("mix", 0L, 5L), ("mix", 1L, 5L), ("mix", 2L, 5L) // constant y -> NaN/null
    ).toDF("g", "x", "y")
    val r = Profiling.corrMoments(rows, "g",
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"))
      .collect().map(x => x.getString(0) -> x).toMap
    val pos = r("pos")
    assert(pos.getAs[Long]("n") === 3L && pos.getAs[Long]("sx") === 6L &&
      pos.getAs[Long]("sxy") === 28L && pos.getAs[Long]("sxx") === 14L)
    assert(pos.getAs[Double]("corr4") === 1.0)
    assert(r("neg").getAs[Double]("corr4") === -1.0)
    // zero variance -> corr undefined -> NULL by contract
    assert(r("mix").isNullAt(r("mix").fieldIndex("corr4")))
  }

  test("momentStats: exact power sums; symmetric skew 0, two-point kurtosis 1") {
    val rows = Seq(
      // symmetric {1,2,3}: m2=2/3, m3=0 -> skew 0; m4=2/3 -> kurt = 1.5
      ("sym", 1L), ("sym", 2L), ("sym", 3L),
      // two equal-mass points {0,2}: mean 1, m2=1, m3=0, m4=1 -> kurt 1
      ("two", 0L), ("two", 2L),
      // constant -> m2=0 -> NULL reads
      ("const", 5L), ("const", 5L)
    ).toDF("g", "x")
    val r = Profiling.momentStats(rows, "g",
        org.apache.spark.sql.functions.col("x"))
      .collect().map(x => x.getString(0) -> x).toMap
    val sym = r("sym")
    assert(sym.getAs[Long]("n") === 3L && sym.getAs[Long]("s1") === 6L &&
      sym.getAs[Long]("s2") === 14L && sym.getAs[Long]("s3") === 36L &&
      sym.getAs[Long]("s4") === 98L)
    assert(sym.getAs[Double]("skew4") === 0.0)
    assert(sym.getAs[Double]("kurt4") === 1.5)
    assert(r("two").getAs[Double]("skew4") === 0.0)
    assert(r("two").getAs[Double]("kurt4") === 1.0)
    assert(r("const").isNullAt(r("const").fieldIndex("skew4")))
    assert(r("const").isNullAt(r("const").fieldIndex("kurt4")))
  }

  test("linRegRead: exact line recovered; zero x-variance -> NULL") {
    val rows = Seq(
      ("line", 1L, 3L), ("line", 2L, 5L), ("line", 3L, 7L), // y = 2x+1
      ("vert", 4L, 1L), ("vert", 4L, 9L) // constant x -> vertical, undefined
    ).toDF("g", "x", "y")
    val r = Profiling.linRegRead(Profiling.corrMoments(rows, "g",
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y")))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("line").getAs[Double]("slope4") === 2.0)
    assert(r("line").getAs[Double]("icept4") === 1.0)
    assert(r("vert").isNullAt(r("vert").fieldIndex("slope4")))
    assert(r("vert").isNullAt(r("vert").fieldIndex("icept4")))
  }

  test("mannWhitneyU: doubled tie-averaged ranks; off-sample rows excluded") {
    // g1: A={1,2}, B={2,3} -> avg ranks 1, 2.5 | 2.5, 4
    //   r2_a = 2+5 = 7 -> u2_a = 7 - 2·3 = 1 (U_A = 0.5: one tie pair)
    //   u2_b = 2·2·2 - 1 = 7
    val rows = Seq(
      ("g1", "A", 1L), ("g1", "A", 2L), ("g1", "B", 2L), ("g1", "B", 3L),
      // a third label with the smallest value MUST NOT shift the ranks
      ("g1", "C", 0L)
    ).toDF("g", "s", "v")
    val r = Profiling.mannWhitneyU(rows, "g", "v", "s", "A", "B")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq(("g1", 2L, 2L, 1L, 7L)))
  }

  test("spearmanCorr: monotone -> 1; y-ties give the tie-corrected rho") {
    val rows = Seq(
      ("mono", 1L, 1L), ("mono", 2L, 4L), ("mono", 3L, 9L), // nonlinear monotone
      ("anti", 1L, 9L), ("anti", 2L, 4L), ("anti", 3L, 1L),
      // (1,1),(2,1),(3,2): rx=(2,4,6), ry=(3,3,6) -> rho = √3/2 -> 0.866
      ("ties", 1L, 1L), ("ties", 2L, 1L), ("ties", 3L, 2L)
    ).toDF("g", "x", "y")
    val r = Profiling.spearmanCorr(rows, "g",
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"))
      .collect().map(x => x.getString(0) -> x.getAs[Double]("rho4")).toMap
    assert(r("mono") === 1.0)
    assert(r("anti") === -1.0)
    assert(r("ties") === 0.866)
  }

  test("tTestMoments: equal-variance hand case gives -4/sqrt(2) on both reads") {
    // A={0,2}: ma=1, qa=2; B={4,6}: mb=5, qb=2 -> sp2=2
    // t_student = -4/sqrt(2·(1/2+1/2)) = -2.8284; Welch identical here
    val rows = Seq(("g", "A", 0L), ("g", "A", 2L), ("g", "B", 4L), ("g", "B", 6L),
      // single-sample group -> guards nullify both reads
      ("h", "A", 1L), ("h", "A", 2L), ("h", "B", 7L)
    ).toDF("g", "s", "v")
    val r = Profiling.tTestMoments(rows, "g", "v", "s", "A", "B")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("g").getAs[Double]("t_student4") === -2.8284)
    assert(r("g").getAs[Double]("t_welch4") === -2.8284)
    assert(r("h").isNullAt(r("h").fieldIndex("t_student4")))
    assert(r("h").isNullAt(r("h").fieldIndex("t_welch4")))
  }

  test("rocAuc: separable -> 1.0, all-tied -> 0.5 via tie-averaged ranks") {
    val rows = Seq(
      ("sep", "P", 3L), ("sep", "N", 1L), ("sep", "N", 2L),
      ("tie", "P", 2L), ("tie", "N", 2L)
    ).toDF("g", "s", "v")
    val r = Profiling.rocAuc(rows, "g", "v", "s", "P", "N")
      .collect().map(x => x.getString(0) -> x.getAs[Double]("auc4")).toMap
    assert(r("sep") === 1.0)
    assert(r("tie") === 0.5)
  }

  test("ksTest: separated samples -> D=1 exact rational; identical -> 0") {
    val rows = Seq(
      ("sep", "A", 1L), ("sep", "A", 2L), ("sep", "B", 3L), ("sep", "B", 4L),
      ("same", "A", 1L), ("same", "B", 1L)
    ).toDF("g", "s", "v")
    val r = Profiling.ksTest(rows, "g", "v", "s", "A", "B")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("sep").getAs[Long]("d_num") === 4L &&
      r("sep").getAs[Long]("d_den") === 4L &&
      r("sep").getAs[Double]("d4") === 1.0)
    assert(r("same").getAs[Long]("d_num") === 0L &&
      r("same").getAs[Double]("d4") === 0.0)
  }

  test("tukeyOutliers: ceil-rank quartiles, doubled fences catch the planted spike") {
    // {1..8, 100}: n=9 -> q1 = 3 (ceil 9/4 = 3rd), q3 = 7 (ceil 27/4 = 7th)
    // fences: low2 = 15-21 = -6, high2 = 35-9 = 26 -> only 100 breaks high
    val rows = ((1L to 8L) :+ 100L).map(("t", _)).toDF("g", "c")
    val r = graft.operators.Sketches.tukeyOutliers(rows, "g", "c")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq(("t", 9L, 3L, 7L, 0L, 1L)))
  }

  test("proportionZ: equal shares -> 0; missing sample -> NULL") {
    val rows = Seq(
      ("eq", "A", 1L), ("eq", "A", 0L), ("eq", "B", 1L), ("eq", "B", 0L),
      ("solo", "A", 1L)
    ).toDF("g", "s", "ok")
    val r = Profiling.proportionZ(rows, "g", "s", "A", "B",
        org.apache.spark.sql.functions.col("ok") === 1L)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("eq").getAs[Double]("z4") === 0.0)
    assert(r("solo").isNullAt(r("solo").fieldIndex("z4")))
  }

  test("madExact: lower medians, deviation ties collapse, broadcast scalar joins") {
    // g=a {1,3,7,20}: n=4, target=2 -> med=3; devs {2,0,4,17} -> mad=2
    // g=b {5,5,9}: n=3, target=2 -> med=5; devs {0,0,4} -> mad=0
    val rows = Seq(("a", 1L), ("a", 3L), ("a", 7L), ("a", 20L),
      ("b", 5L), ("b", 5L), ("b", 9L)).toDF("g", "c")
    val r = graft.operators.Sketches.madExact(rows, "g", "c")
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    assert(r === Seq(("a", 4L, 3L, 2L), ("b", 3L, 5L, 0L)))
  }

  test("boundingRatio: extrema reads; zero x-extent -> NULL") {
    val rows = Seq(("up", 0L, 10L), ("up", 4L, 30L), ("up", 2L, 50L),
      ("pt", 7L, 1L), ("pt", 7L, 9L)).toDF("g", "x", "y")
    val r = Profiling.boundingRatio(rows, "g",
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("up").getAs[Double]("ratio4") === 10.0) // (50-10)/(4-0)
    assert(r("pt").isNullAt(r("pt").fieldIndex("ratio4")))
  }

  test("quantileExactWeighted: ceil-rank over cumulative weights, duplicates merge") {
    // g=a values(weight): 10(1) 20(3) 30(1), W=5
    //   q50 target=ceil(5/2)=3 -> cum: 10->1, 20->4 >= 3 -> 20
    //   q75 target=ceil(15/4)=4 -> 20 (cum 4); q25 target=2 -> 20
    // g=b duplicate value rows merge weights first: 5(2+2)=4, 7(1), W=5
    //   q50 target=3 -> 5 (cum 4)
    val rows = Seq(
      ("a", 10L, 1L), ("a", 20L, 3L), ("a", 30L, 1L),
      ("b", 5L, 2L), ("b", 5L, 2L), ("b", 7L, 1L)
    ).toDF("g", "v", "w")
    val r = graft.operators.Sketches.quantileExactWeighted(
        rows, Seq("g"), "v", "w",
        Seq(("q25", 1, 4), ("q50", 1, 2), ("q75", 3, 4)))
      .orderBy("g", "q").as[(String, String, Long, Long)].collect().toSeq
    assert(r === Seq(
      ("a", "q25", 5L, 20L), ("a", "q50", 5L, 20L), ("a", "q75", 5L, 20L),
      ("b", "q25", 5L, 5L), ("b", "q50", 5L, 5L), ("b", "q75", 5L, 5L)))
  }
}
