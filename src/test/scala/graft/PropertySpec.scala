package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dns.DnsFixtures
import graft.ingest.Querylog
import graft.views.Summaries

/** The SURVEY §5.3 property tests (scalacheck generators, fixed seed so
  * failures reproduce; each property evaluated as ONE Spark job over the
  * generated sample, not a job per case):
  *  1. is_ipv4/is_ipv6 agree with an independent reference model on
  *     valid quads and systematic mutations;
  *  2. querylog render→parse round-trips every generated record;
  *  3. the clients_stats MV invariant — every log row contributes
  *     exactly 1 to exactly one of (visited, blocked). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator exhausted"))

  // ---- 1. IP predicates vs reference model ----------------------------

  /** Independent dotted-quad model (strict: 4 octets, 0-255, no leading
    * zeros) — deliberately regex/split-based where the production kernel
    * is a char loop, so a shared bug is unlikely. */
  private def refIsIpv4(s: String): Boolean = {
    val parts = s.split("\\.", -1)
    parts.length == 4 && parts.forall(p =>
      p.matches("0|[1-9][0-9]{0,2}") && p.toInt <= 255)
  }

  private val octet: Gen[String] = Gen.chooseNum(0, 255).map(_.toString)
  private val validQuad: Gen[String] =
    Gen.listOfN(4, octet).map(_.mkString("."))
  private val mutated: Gen[String] = Gen.oneOf(
    validQuad.map(q => s"0$q"), // leading zero on first octet
    validQuad.map(q => q + "."), // trailing dot
    validQuad.map("." + _), // leading dot
    Gen.listOfN(3, octet).map(_.mkString(".")), // 3 octets
    Gen.listOfN(5, octet).map(_.mkString(".")), // 5 octets
    Gen.chooseNum(256, 999).flatMap(big =>
      Gen.listOfN(3, octet).map(os => (big.toString :: os).mkString("."))), // octet > 255
    validQuad.map(_.replace('.', ':')), // wrong separator
    Gen.alphaStr.suchThat(_.nonEmpty), // letters
    Gen.const(""))

  test("property: is_ipv4 agrees with the reference model on 2000 generated strings") {
    val cases = sample(Gen.oneOf(validQuad, mutated), 2000, seed = 42L)
    val got = cases.toDF("s")
      .select(col("s"), graft.functions.is_ipv4(col("s")).as("v"))
      .as[(String, Boolean)].collect()
    got.foreach { case (s, v) =>
      assert(v == refIsIpv4(s), s"is_ipv4('$s') = $v, reference says ${refIsIpv4(s)}")
    }
    // the generator hit both classes (no vacuous pass)
    assert(got.exists(_._2) && got.exists(!_._2))
  }

  test("property: every valid quad is is_ipv4 and never is_ipv6; ::-forms are is_ipv6") {
    val quads = sample(validQuad, 300, seed = 7L)
    val v6 = quads.map(q => s"::ffff:$q") ++ Seq("::", "::1", "fe80::1", "2001:db8::8a2e:370:7334")
    val rows = (quads.map((_, true)) ++ v6.map((_, false))).toDF("s", "expect_v4")
      .select(col("s"), col("expect_v4"),
        graft.functions.is_ipv4(col("s")).as("v4"),
        graft.functions.is_ipv6(col("s")).as("v6"))
      .as[(String, Boolean, Boolean, Boolean)].collect()
    rows.foreach { case (s, expectV4, v4, v6r) =>
      assert(v4 == expectV4, s"is_ipv4('$s') = $v4")
      assert(v6r == !expectV4, s"is_ipv6('$s') = $v6r")
    }
  }

  // ---- 2. querylog render → parse round-trip --------------------------

  private val aB64 = DnsFixtures.b64(DnsFixtures.aAnswerCompressed)
  // JSON-safe label charset (no escaping needed in the rendered line)
  private val label: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(20))
  private case class Rec(qh: String, qt: String, ip: String, elapsed: Long,
      filtered: Boolean, cached: Boolean, upstream: Option[String])
  private val recGen: Gen[Rec] = for {
    qh <- Gen.listOfN(3, label).map(_.mkString("."))
    qt <- Gen.oneOf("A", "AAAA", "HTTPS", "PTR")
    ip <- validQuad
    elapsed <- Gen.chooseNum(0L, Long.MaxValue / 2)
    filtered <- Gen.oneOf(true, false)
    cached <- Gen.oneOf(true, false)
    upstream <- Gen.option(validQuad.map(_ + ":53"))
  } yield Rec(qh, qt, ip, elapsed, filtered, cached, upstream)

  private def render(r: Rec): String = {
    val up = r.upstream.map(u => s""""Upstream":"$u",""").getOrElse("")
    s"""{"T":"2024-01-01T00:00:00Z","QH":"${r.qh}","QT":"${r.qt}","QC":"IN","CP":"",$up""" +
      s""""IP":"${r.ip}","Elapsed":${r.elapsed},"Cached":${r.cached},""" +
      s""""Result":{"IsFiltered":${r.filtered}},"Answer":"$aB64"}"""
  }

  test("property: 300 generated querylog records render → parse to their fields") {
    val recs = sample(recGen, 300, seed = 11L)
    val parsed = Querylog.parse(recs.map(render).toDF("value"))
      .select("QH", "QT", "IP", "Elapsed", "IsFiltered", "Cached", "Upstream")
      .as[(String, String, String, Long, Boolean, Boolean, String)]
      .collect().sortBy(r => (r._1, r._4))
    val expected = recs.map(r =>
        (r.qh, r.qt, r.ip, r.elapsed, r.filtered, r.cached, r.upstream.getOrElse("")))
      .sortBy(r => (r._1, r._4)).toArray
    assert(parsed.length == recs.length) // nothing dropped to the corrupt channel
    assert(parsed === expected)
  }

  // ---- 3. clients_stats MV invariant ----------------------------------

  test("property: clients_stats visited+blocked == row count, per IP and globally") {
    val recs = sample(recGen, 400, seed = 23L)
    val log2 = Querylog.parse(recs.map(render).toDF("value"))
    val stats = Summaries.all("clients_stats")(log2)
      .select(col("IP"), col("visited"), col("blocked"))
      .as[(String, Long, Long)].collect()
    assert(stats.map(s => s._2 + s._3).sum == recs.length)
    val perIp = recs.groupBy(_.ip).view.mapValues(_.size.toLong).toMap
    stats.foreach { case (ip, v, b) =>
      assert(v + b == perIp(ip), s"IP $ip: visited+blocked != rows")
    }
  }
}
