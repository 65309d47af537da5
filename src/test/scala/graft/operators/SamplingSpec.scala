package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Determinism and distribution properties of the hash-based sampler and
  * splitter — the guarantees `df.sample()` does NOT give. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("deterministicSample: same rows on every run and under repartition") {
    val a = Sampling.deterministicSample(ids, "id", 0.3).as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids.repartition(7), "id", 0.3)
      .as[Long].collect().toSet
    assert(a === b)
    // Bernoulli(0.3) over 2000 ids: expect ~600, 5σ ≈ 102
    assert(math.abs(a.size - 600) <= 110, s"sample size ${a.size}")
  }

  test("deterministicSample: nested — a smaller fraction is a subset of a larger one") {
    val small = Sampling.deterministicSample(ids, "id", 0.1).as[Long].collect().toSet
    val large = Sampling.deterministicSample(ids, "id", 0.5).as[Long].collect().toSet
    assert(small.subsetOf(large)) // u < 0.1 implies u < 0.5 — stable sample growth
  }

  test("contaminationStats detects planted cross-split exact duplicates") {
    val docs = (0L until 500L).map(i => (i, s"unique text number $i", "en"))
      .toDF("doc_id", "text", "lang")
    // discover which ids the hash assigns to train/test, then plant ONE
    // test doc carrying a train doc's exact text
    val bySplit = Sampling.assignSplit(docs, "doc_id", 0.8, 0.1)
      .select("doc_id", "split").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val trainId = bySplit("train").head
    val testId = bySplit("test").head
    val planted = docs.withColumn("text",
      when(col("doc_id") === testId, lit(s"unique text number $trainId"))
        .otherwise(col("text")))
    val got = Sampling.contaminationStats(planted, "doc_id", "text", "lang", 0.8, 0.1)
      .as[(String, Long, Long)].collect().map { case (l, t, c) => l -> ((t, c)) }.toMap
    assert(got("en")._1 === bySplit("test").size.toLong)
    assert(got("en")._2 === 1L) // exactly the planted overlap
    Caching.releaseAll()
  }

  test("bloomContaminationStats: no false negatives; fp measured; tiny bitmap saturates") {
    val docs = (0L until 500L).map(i => (i, s"unique text number $i", "en"))
      .toDF("doc_id", "text", "lang")
    val bySplit = Sampling.assignSplit(docs, "doc_id", 0.8, 0.1)
      .select("doc_id", "split").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val trainId = bySplit("train").head
    val testId = bySplit("test").head
    val planted = docs.withColumn("text",
      when(col("doc_id") === testId, lit(s"unique text number $trainId"))
        .otherwise(col("text")))
    val got = Sampling.bloomContaminationStats(planted, "doc_id", "text", "lang", 0.8, 0.1)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, testDocs, candidates, contaminated, fp) = got("en")
    assert(testDocs === bySplit("test").size.toLong)
    assert(contaminated === 1L) // the exact check still sees the plant
    // the Bloom guarantee: a contaminated doc ALWAYS passes the filter
    assert(candidates >= contaminated)
    assert(fp === candidates - contaminated)
    Caching.releaseAll()

    // a saturated bitmap (m=16 slots, ~400 train texts × 3 probes) makes
    // every test doc a candidate — the fill-factor failure mode, visible
    // not silent
    val sat = Sampling.bloomContaminationStats(planted, "doc_id", "text", "lang", 0.8, 0.1,
        mBits = 16)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(sat._3 === sat._2, "tiny bitmap should mark every test doc a candidate")
    Caching.releaseAll()
  }

  test("stratifiedSample: per-stratum rates equal per-group deterministic samples; default applies") {
    val df = (0L until 3000L).map(i => (i, Seq("a", "b", "c")((i % 3).toInt)))
      .toDF("id", "strat")
    val got = Sampling.stratifiedSample(df, "id", "strat",
        Map("a" -> 0.5, "b" -> 0.1), defaultFraction = 0.05)
      .select("id").as[Long].collect().toSet
    // same rows as sampling each stratum alone at its own rate (same salt)
    val expected = Seq("a" -> 0.5, "b" -> 0.1, "c" -> 0.05).flatMap { case (s, f) =>
      Sampling.deterministicSample(df.filter(col("strat") === s), "id", f, ":strat")
        .select("id").as[Long].collect()
    }.toSet
    assert(got === expected)
    // stable under repartition
    val again = Sampling.stratifiedSample(df.repartition(11), "id", "strat",
        Map("a" -> 0.5, "b" -> 0.1), defaultFraction = 0.05)
      .select("id").as[Long].collect().toSet
    assert(again === got)
  }

  test("ngramContaminationStats catches a planted 8-gram overlap that exact-text misses") {
    val docs = (0L until 500L)
      .map(i => (i, s"unique text number $i alpha beta gamma delta epsilon zeta", "en"))
      .toDF("doc_id", "text", "lang")
    val bySplit = Sampling.assignSplit(docs, "doc_id", 0.8, 0.1)
      .select("doc_id", "split").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val trainId = bySplit("train").head
    val testId = bySplit("test").head
    // the planted TEST text is NOT any train text, but its tokens 2-9 equal
    // the train doc's tokens 1-8 — one shared 8-gram
    val planted = docs.withColumn("text",
      when(col("doc_id") === testId,
        lit(s"prefix unique text number $trainId alpha beta gamma delta end"))
        .otherwise(col("text")))
    val got = Sampling.ngramContaminationStats(planted, "doc_id", "text", "lang", 0.8, 0.1, n = 8)
      .as[(String, Long, Long)].collect().map { case (l, t, c) => l -> ((t, c)) }.toMap
    assert(got("en")._1 === bySplit("test").size.toLong)
    assert(got("en")._2 === 1L) // only the planted doc; every other 8-gram embeds its own id
    // the exact-text check cannot see this overlap
    val exact = Sampling.contaminationStats(planted, "doc_id", "text", "lang", 0.8, 0.1)
      .as[(String, Long, Long)].collect().head
    assert(exact._3 === 0L)
    Caching.releaseAll()
  }

  test("contiguousPack: bins cut at budget multiples; straddling row stays in its starting bin") {
    val df = Seq((0, 1L, 3L), (0, 2L, 3L), (0, 3L, 3L), (0, 4L, 10L), (0, 5L, 1L), (1, 6L, 5L))
      .toDF("shard", "ord", "sz")
    val got = Packing.contiguousPack(df, Seq("shard"), Seq("ord"), "sz", budget = 5L)
      .select("shard", "ord", "bin").as[(Int, Long, Long)].collect().toSet
    // shard 0 prefix sums BEFORE each row: 0,3,6,9,19 → bins 0,0,1,1,3
    // (the 10-size row starts in bin 1 and straddles; the next row lands
    // after it at prefix 19 → bin 3); shard 1 restarts at 0
    assert(got === Set((0, 1L, 0L), (0, 2L, 0L), (0, 3L, 1L), (0, 4L, 1L), (0, 5L, 3L), (1, 6L, 0L)))
  }

  test("mixtureWeights: sqrt temperature, exact ppm normalization") {
    // source a: 4 tokens → w = 2e6; source b: 1 token → w = 1e6
    val df = Seq(("a", "t1 t2 t3"), ("a", "t4"), ("b", "t5"))
      .toDF("source", "text")
    val got = Sampling.mixtureWeights(df, "source", "text")
      .orderBy("source").as[(String, Long, Long, Long)].collect()
    // ppm = w*1e6 DIV 3e6 → a: 666666, b: 333333
    assert(got === Array(("a", 2L, 4L, 666666L), ("b", 1L, 1L, 333333L)))
  }

  test("mixtureWeights: null text counts 0 tokens; all-null source stays 0, not NULL") {
    val df = Seq(("a", "t1 t2 t3"), ("a", null), ("b", "t5"), ("c", null))
      .toDF("source", "text")
    val got = Sampling.mixtureWeights(df, "source", "text")
      .orderBy("source").as[(String, Long, Long, Long)].collect()
    // a: 3 tokens + 0 for its null row; c has ONLY null text — without the
    // explicit CASE, sum over zero non-null rows would yield NULL tokens
    // (size(NULL) is NULL under ANSI-on, sum skips it) and this typed
    // decode would fail; the fix pins it to 0 tokens / 0 weight
    assert(got.map(r => (r._1, r._2, r._3)) ===
      Array(("a", 2L, 3L), ("b", 1L, 1L), ("c", 1L, 0L)))
    assert(got.map(_._4).sum >= 999999L) // ppm still normalizes (c adds 0)
  }

  test("reservoirSample: exactly k per group, stable, subset of the group") {
    val df = (0L until 500L).map(i => (s"g${i % 3}", i)).toDF("grp", "id")
    val s1 = Sampling.reservoirSample(df, "grp", "id", k = 7)
      .as[(String, Long)].collect().toSet
    val s2 = Sampling.reservoirSample(df.repartition(7), "grp", "id", k = 7)
      .as[(String, Long)].collect().toSet
    assert(s1 === s2) // stable under repartition (heap merge is associative)
    assert(s1.groupBy(_._1).forall(_._2.size == 7)) // exactly k per group
    assert(s1.forall { case (g, id) => s"g${id % 3}" == g }) // members of their group
    // a different salt draws a different sample
    val s3 = Sampling.reservoirSample(df, "grp", "id", k = 7, salt = ":other")
      .as[(String, Long)].collect().toSet
    assert(s3 != s1)
  }

  test("assignSplit: disjoint, exhaustive, stable, ~80/10/10") {
    val s1 = Sampling.assignSplit(ids, "id", 0.8, 0.1)
      .as[(Long, String)].collect().toMap
    val s2 = Sampling.assignSplit(ids.repartition(5), "id", 0.8, 0.1)
      .as[(Long, String)].collect().toMap
    assert(s1 === s2)                       // stable under repartition
    assert(s1.size === 2000)                // exhaustive, one split per row
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) <= 90, counts.toString)  // 5σ
    assert(math.abs(counts("val") - 200) <= 68, counts.toString)
    assert(math.abs(counts("test") - 200) <= 68, counts.toString)
  }
}
