package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Blocklist suffix-match + categorical-entropy specs on hand corpora. */
class BlocklistSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val queries = Seq(
    (1L, "d0.click.net"),        // exact rule hit (level == labels)
    (2L, "h9.d0.click.net"),     // subdomain hit via level-3 suffix
    (3L, "a.h9.d0.click.net"),   // deeper subdomain, still level-3 hit
    (4L, "xd0.click.net"),       // non-boundary lookalike: must NOT match
    (5L, "d0.click.org"),        // different TLD: no rule
    (6L, "h7.d3.error.net"),     // exact 4-label rule hit
    (7L, "w.h7.d3.error.net")    // subdomain of the exact rule: matches too
  ).toDF("qid", "domain")

  private lazy val rules = Seq("d0.click.net", "h7.d3.error.net").toDF("rule")

  test("suffix match hits exact domains and subdomains on label boundaries only") {
    val hits = Blocklist.suffixMatch(queries, "domain", rules, "rule", maxLabels = 5)
      .select("qid", "rule").as[(Long, String)].collect().toSet
    // 6/7 also carry the 3-label suffix d3.error.net in their chains, but
    // it is not a rule — nothing else may appear
    assert(hits == Set(
      1L -> "d0.click.net", 2L -> "d0.click.net", 3L -> "d0.click.net",
      6L -> "h7.d3.error.net", 7L -> "h7.d3.error.net"))
  }

  test("maxLabels bounds the match depth: a rule deeper than the bound never joins") {
    val hits = Blocklist.suffixMatch(queries, "domain", rules, "rule", maxLabels = 3)
      .select("qid", "rule").as[(Long, String)].collect().toSet
    // level-4 suffixes are no longer generated: the exact 4-label rule
    // only matches where it IS a <=3-level suffix — never
    assert(hits == Set(1L -> "d0.click.net", 2L -> "d0.click.net", 3L -> "d0.click.net"))
  }

  test("one domain matching several rules yields one row per rule") {
    val r2 = Seq("d0.click.net", "h9.d0.click.net").toDF("rule")
    val hits = Blocklist.suffixMatch(queries, "domain", r2, "rule", maxLabels = 5)
      .filter(col("qid") === 2L).select("rule").as[String].collect().toSet
    assert(hits == Set("d0.click.net", "h9.d0.click.net"))
  }

  test("categorical entropy: DGA-ish uniform client far above single-domain client") {
    // client 1: 8 distinct domains once each -> ent_bits = 8*bits(8) - 8*1 = 24
    // client 2: one domain 8 times          -> ent_bits = 8*4 - 8*4 = 0
    // client 3: 4+4 over two domains        -> ent_bits = 8*4 - 2*(4*3) = 8
    val rows = (1 to 8).map(i => (1L, s"r$i.x.net")) ++
      (1 to 8).map(_ => (2L, "same.x.net")) ++
      (1 to 8).map(i => (3L, s"p${i % 2}.x.net"))
    val out = Profiling.categoricalEntropy(rows.toDF("uid", "domain"), "uid", "domain")
      .select("uid", "n", "n_distinct", "ent_bits")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((8L, 8L, 24L)))
    assert(out(2L) == ((8L, 1L, 0L)))
    assert(out(3L) == ((8L, 2L, 8L)))
  }
}
