package graft.operators

import graft.SparkTestBase

/** BPE merge learning against the hand-computable classic corpus
  * (Sennrich-style): merges must come out in exact frequency-then-lex
  * order and encoding must re-segment words with them. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // word freqs: low×5, lower×2, newest×6, widest×3
  private val docs = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    .toDF("text")

  test("learnMerges reproduces the hand-computed merge sequence") {
    val merges = Bpe.learnMerges(docs, "text", numMerges = 4)
    // pair counts round 1: es = 6+3 = 9 (newest, widest), st = 9,
    // lo = 5+2 = 7 … tie es/st broken lexicographically: (e,s) first
    assert(merges.head === (("e", "s")))
    // round 2: (es,t) now 9 — wins over lo=7
    assert(merges(1) === (("es", "t")))
    // round 3: lo = 7 beats (w,est) = 6
    assert(merges(2) === (("l", "o")))
    // round 4: the fresh (lo,w) pair = 7 beats (w,est) = 6
    assert(merges(3) === (("lo", "w")))
  }

  test("encode applies pinned merges leftmost-first, non-overlapping") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("w", "est"))
    val enc = Bpe.encode(docs, "text", merges)
      .select("w", "syms").as[(String, Seq[String])].collect().toMap
    assert(enc("newest") === Seq("n", "e", "west"))
    assert(enc("widest") === Seq("w", "i", "d", "est"))
    assert(enc("low") === Seq("lo", "w"))
    assert(enc("lower") === Seq("lo", "w", "e", "r"))
  }

  test("greedy fold is non-overlapping: aaa under (a,a) → [aa, a]") {
    val d = Seq("aaa").toDF("text")
    val enc = Bpe.encode(d, "text", Seq(("a", "a")))
      .select("syms").as[Seq[String]].collect().head
    assert(enc === Seq("aa", "a"))
  }
}
