package graft.views

import java.sql.Timestamp

import graft.SparkTestBase
import graft.schema.DnsQuery

/** The 8 MV transforms against hand-computed expectations
  * (/root/reference/README.md:24-189 semantics). */
class SummariesSpec extends SparkTestBase {
  import spark.implicits._

  private def q(
      t: String,
      qh: String,
      ip: String = "10.0.0.1",
      filtered: Boolean = false,
      qt: String = "A",
      rcode: Int = 0,
      upstream: String = "1.1.1.1:53"
  ): DnsQuery =
    DnsQuery(Timestamp.valueOf(t), qh, qt, "IN", "", upstream, ip, filtered,
      1000L, Cached = false, rcode, Nil, Nil, Nil)

  private lazy val log2 = Seq(
    q("2024-01-01 00:01:00", "ads.example.com", filtered = true),
    q("2024-01-01 00:04:59", "ads.example.com", filtered = true, ip = "10.0.0.2"),
    q("2024-01-01 00:05:00", "good.example.org"),
    q("2024-01-01 00:09:59", "good.example.org", qt = "AAAA"),
    q("2024-01-01 00:10:00", "localhost", rcode = 3), // single label: no TLD
    q("2024-01-01 00:10:01", "192.168.0.1", qt = "PTR"), // IP literal: no TLD
    q("2024-01-01 23:59:59", "good.example.org", ip = "10.0.0.2", upstream = "")
  ).toDF()

  test("blocked_domains / visited_domains split by IsFiltered") {
    val blocked = Summaries.blockedDomains(log2).as[(String, Long)].collect().toMap
    assert(blocked == Map("ads.example.com" -> 2L))
    val visited = Summaries.visitedDomains(log2).as[(String, Long)].collect().toMap
    assert(visited == Map("good.example.org" -> 3L, "localhost" -> 1L, "192.168.0.1" -> 1L))
  }

  test("clients_stats: conditional counts; invariant visited+blocked == rows") {
    val cs = Summaries.clientsStats(log2).as[(String, Long, Long)].collect()
    assert(cs.toSet == Set(("10.0.0.1", 4L, 1L), ("10.0.0.2", 1L, 1L)))
    assert(cs.map(r => r._2 + r._3).sum == log2.count())
  }

  test("qt_stats and rcode_stats") {
    assert(Summaries.qtStats(log2).as[(String, Long)].collect().toMap ==
      Map("A" -> 5L, "AAAA" -> 1L, "PTR" -> 1L))
    assert(Summaries.rcodeStats(log2).as[(Int, Long)].collect().toMap ==
      Map(0 -> 6L, 3 -> 1L))
  }

  test("stats2: 10-minute buckets on event time, per client") {
    val s = Summaries.stats2(log2)
      .as[(String, Long, Long, Long)].collect()
      .map { case (ip, b, bl, vi) => ((ip, b), (bl, vi)) }.toMap
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(s(("10.0.0.1", t0)) == (1L, 2L))          // 00:01 blocked + 00:05,00:09 visited
    assert(s(("10.0.0.2", t0)) == (1L, 0L))          // 00:04:59 blocked
    assert(s(("10.0.0.1", t0 + 600)) == (0L, 2L))    // 00:10:00, 00:10:01
    assert(s(("10.0.0.2", t0 + 85800)) == (0L, 1L))  // 23:59:59 -> 23:50 bucket
    assert(s.size == 4)
  }

  test("tld_stats: last label, multi-label non-IP hostnames only") {
    val t = Summaries.tldStats(log2).as[(String, Long)].collect().toMap
    assert(t == Map("com" -> 2L, "org" -> 3L)) // localhost + IP literal excluded
  }

  test("upstream_stats counts per upstream incl. empty default") {
    val u = Summaries.upstreamStats(log2).as[(String, Long)].collect().toMap
    assert(u == Map("1.1.1.1:53" -> 6L, "" -> 1L))
  }
}
